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

        oracle = "DuckDB" if re.search(r"\bSome\(", body) else "rows-only"
        rows.append((name, impl, oracle, desc))

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
            "an independent engine; rows-only = non-SQL-expressible), and "
            "the gate's own rationale/scale notes from the registry. "
            "Full operator docs live as Scaladoc on the implementation; "
            "coverage mapping to the reference surface is SURVEY.md §2.\n\n")
        f.write("| gate | implementation | oracle | notes |\n")
        f.write("|---|---|---|---|\n")
        for name, impl, oracle, desc in rows:
            desc = desc.replace("|", "\\|")
            impl_s = f"`{impl}`" if impl else "inline DataFrame"
            f.write(f"| `{name}` | {impl_s} | {oracle} | {desc} |\n")
    n_duck = sum(1 for r in rows if r[2] == "DuckDB")
    print(f"wrote {OUT} — {len(rows)} gates ({n_duck} DuckDB, "
          f"{len(rows) - n_duck} rows-only)")


if __name__ == "__main__":
    main()
