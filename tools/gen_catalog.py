#!/usr/bin/env python3
"""Generate docs/CATALOG.md from the Entry registry in Queries.scala.

Each gate in `Queries.all` carries its rationale as the contiguous `//`
comment block directly above its `Entry("name", ...)` line (the repo
convention), names its implementation in the entry body, and declares
its oracle inline (`Some(...)` = DuckDB twin, `None` = rows-only check).
This script re-emits that information as a user-facing catalog so the
257-gate surface is discoverable without reading Queries.scala.

Usage: python3 tools/gen_catalog.py   (from the repo root)
"""
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
SRC = ROOT / "src/main/scala/graft/Queries.scala"
OUT = ROOT / "docs/CATALOG.md"

# Implementation-call heuristic: first Operator.method( reference in the
# entry body that is not scaffolding.
SCAFFOLD = {
    "Some", "None", "Seq", "Map", "Set", "Option", "Window", "Entry",
    "StorageLevel", "Files", "TempDirs", "String", "Long", "Int",
}

# Per-family 100 TB scale verdicts, carried from BASELINE.md's plan
# audits and scale rehearsals (VERDICT r12 #7: the catalog named
# implementation + oracle but not the scale posture). Keyed by the
# implementation OBJECT; families without a dedicated audit fall back
# to the Catalyst-default note. Each verdict names its evidence round.
SCALE_NOTES = {
    "Dedup": "bucketed candidate gen (LSH bands / pigeonhole / prefix "
             "router), never all-pairs; 100× rehearsal 2.6× wall for "
             "10× data, zero cap drops (BASELINE r12)",
    "Similarity": "queries broadcast, corpus never shuffles; IVF "
                  "cell-bounded — 100× rehearsal: train 1.6×, probe "
                  "2.6× wall for 10× data (BASELINE r12)",
    "Pq": "codes are data (m bytes/row), codebooks driver metadata; "
          "native codegen assign/ADC (r13) keeps the encode in "
          "whole-stage codegen at any m·ksub",
    "SemDedup": "cluster-bounded pairs only — IVF-cell candidate gen, "
                "no all-pairs (BASELINE r11)",
    "Bm25": "partition-pruned LSM segments, term-pruned posting reads, "
            "O(batch) appends with enforced disjoint ids (r12)",
    "Bpe": "distributed merge learning — corpus-sized aggs per merge, "
           "argmax-only at the driver; 10× rehearsal ~linear "
           "(BASELINE r9)",
    "StreamSync": "watermarked micro-batches; state bounds spec-pinned "
                  "(keys × window, not rows seen) (r12)",
    "Sync": "predicate-pushed scans + one window exchange (max_by "
            "rewrite where legal — plan-gated)",
    "ChangeLog": "CDF time-range predicates push to the scan; commit "
                 "probe is metadata-only",
    "EventStats": "one event-keyed exchange per family; map-side "
                  "partial aggs plan-gated (PlanAuditSpec)",
    "Sketches": "fixed-size mergeable state (HLL/CMS/KMV/GK), one "
                "map-side-combined agg — scale-free by construction",
    "Profile": "single-pass multi-metric agg (one Expand), no "
               "per-column scans",
    "Multimodal": "mapPartitions JVM codecs, binary payloads never "
                  "shuffle; batch shape spec-pinned",
    "Decontaminate": "benchmark side broadcast; corpus side one narrow "
                     "explode + partial agg",
    "Triangles": "degree-ordered orientation halves the join fan-out; "
                 "hubbed-graph rehearsal (BASELINE r11)",
    "Pipeline": "composed one-pass curation — constituent ops keep "
                "their own audited shapes",
    "FileSink": "partitioned compressed parts; coalesce(1) only behind "
                "the reference's single-file CSV contract",
    "SharedSubstrings": "native LCP over sorted suffixes — the r9 "
                        "quadratic fixed in r11 (BASELINE r11)",
    "SortedNeighborhood": "sorted windows, no cross-partition pairs; "
                          "occupancy-repaired slices (r12 spreadBounded)",
}
DEFAULT_SCALE_NOTE = ("one-pass agg / narrow projection — scales with "
                      "Catalyst defaults (plan-audited families: "
                      "PlanAuditSpec)")


def main() -> None:
    text = SRC.read_text()
    lines = text.splitlines()

    # Locate every Entry("name", line with its index.
    entry_rx = re.compile(r'^\s*Entry\("([a-z0-9_]+)"')
    entries = []  # (line_idx, name)
    for i, ln in enumerate(lines):
        m = entry_rx.match(ln)
        if m:
            entries.append((i, m.group(1)))
    if not entries:
        sys.exit("no Entry(...) rows found — wrong file?")

    rows = []
    for pos, (i, name) in enumerate(entries):
        # Comment block: walk upward over contiguous // lines.
        j = i - 1
        comment: list[str] = []
        while j >= 0 and lines[j].strip().startswith("//"):
            comment.append(lines[j].strip().lstrip("/").strip())
            j -= 1
        comment.reverse()
        desc = " ".join(comment) if comment else ""

        # Entry body: from this line to the next Entry (or a fixed window).
        end = entries[pos + 1][0] if pos + 1 < len(entries) else min(
            i + 40, len(lines))
        body = "\n".join(lines[i:end])

        impl = ""
        for m in re.finditer(r"\b([A-Z][A-Za-z0-9]+)\.([a-z][A-Za-z0-9]+)\(",
                             body):
            obj, meth = m.group(1), m.group(2)
            if obj in SCAFFOLD or meth.startswith("duck"):
                continue
            impl = f"{obj}.{meth}"
            break

        # `Some(` and the brace-argument form `Some {` both declare a twin.
        oracle = "DuckDB" if re.search(r"\bSome\s*[({]", body) else "rows-only"
        scale = SCALE_NOTES.get(impl.split(".")[0], DEFAULT_SCALE_NOTE)
        rows.append((name, impl, oracle, scale, desc))

    dup = len(rows) - len({r[0] for r in rows})
    if dup:
        sys.exit(f"duplicate gate names detected: {dup}")

    with OUT.open("w") as f:
        f.write("# Operator catalog\n\n")
        f.write(
            "GENERATED — do not edit by hand. Regenerate with "
            "`python3 tools/gen_catalog.py` after adding gates.\n\n"
            f"Every row is one driver-verified gate from `SparkEntry.queries` "
            f"({len(rows)} total): its implementation entry point, its "
            "oracle kind (DuckDB = bitwise rows/schema/hash parity against "
            "an independent engine; rows-only = non-SQL-expressible), the "
            "family's 100 TB scale verdict (carried from BASELINE.md's "
            "plan audits and scale rehearsals — the round in parentheses "
            "names the evidence), and the gate's own rationale from the "
            "registry. Full operator docs live as Scaladoc on the "
            "implementation; coverage mapping to the reference surface is "
            "SURVEY.md §2.\n\n")
        f.write("| gate | implementation | oracle | scale | notes |\n")
        f.write("|---|---|---|---|---|\n")
        for name, impl, oracle, scale, desc in rows:
            desc = desc.replace("|", "\\|")
            scale = scale.replace("|", "\\|")
            impl_s = f"`{impl}`" if impl else "inline DataFrame"
            f.write(f"| `{name}` | {impl_s} | {oracle} | {scale} | {desc} |\n")
    n_duck = sum(1 for r in rows if r[2] == "DuckDB")
    print(f"wrote {OUT} — {len(rows)} gates ({n_duck} DuckDB, "
          f"{len(rows) - n_duck} rows-only)")


if __name__ == "__main__":
    main()
