package graft

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.RawLocalFileSystem

/** Hadoop FileSystem registered under the `gs` scheme for TESTS — turns
  * the GCS sink branch (FileSink.write's `gs://` path + configureGcs,
  * export.py:196–232) from config plumbing into an EXECUTED path
  * (VERDICT r15 #3) without a gcs-connector jar or network.
  *
  * Mapping: `gs://<bucket>/<abs-path>` stores bytes at the local
  * `<abs-path>` — RawLocalFileSystem's own `pathToFile` already ignores
  * the authority, so only the URI identity needs overriding for
  * qualified paths, listings, and committer renames to round-trip under
  * the `gs` scheme. Specs embed a temp directory in the path, so
  * nothing escapes the test sandbox. Register with
  * `spark.conf.set("fs.gs.impl", classOf[GsMockFileSystem].getName)` —
  * deliberately through the SESSION conf, because that exercises the
  * same SQLConf→Hadoop-conf propagation configureGcs's `fs.gs.*` auth
  * keys rely on.
  */
class GsMockFileSystem extends RawLocalFileSystem {
  private var mockUri: URI = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    mockUri = URI.create(
      s"${name.getScheme}://${Option(name.getAuthority).getOrElse("")}")
  }

  // The RawLocalFileSystem CONSTRUCTOR itself calls getUri (via
  // getInitialWorkingDirectory) before initialize() has run — return a
  // bare-scheme placeholder until the real authority is known.
  override def getUri: URI =
    if (mockUri == null) URI.create("gs:///") else mockUri

  override def getScheme: String = "gs"
}
