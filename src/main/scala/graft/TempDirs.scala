package graft

import java.nio.file.{Files, Path}

/** JVM-exit cleanup registry for per-run scratch directories.
  *
  * Gate queries that exercise sinks (z-order, compaction, index
  * persistence, sink round-trips) each stage files in a fresh temp
  * dir, and the RETURNED DataFrame lazily re-reads that dir — so the
  * dir cannot be deleted before the caller consumes the result, and
  * Spark offers no consumption callback. Registering here bounds the
  * growth to one process lifetime: every registered dir is removed
  * recursively by a shutdown hook, so repeated Verify/Bench/test runs
  * do not accumulate scratch data under /tmp.
  */
object TempDirs {
  private val dirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    dirs.forEach(p => deleteRecursively(p))
  }, "graft-tempdir-cleanup"))

  /** Create a temp directory that is deleted at JVM exit. */
  def create(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    dirs.add(p)
    p
  }

  private def deleteRecursively(p: Path): Unit =
    try {
      if (Files.exists(p)) {
        val walk = Files.walk(p)
        try {
          walk.sorted(java.util.Comparator.reverseOrder())
            .forEach(f => { Files.deleteIfExists(f); () })
        } finally walk.close()
      }
    } catch { case _: java.io.IOException => () } // best-effort at exit
}
