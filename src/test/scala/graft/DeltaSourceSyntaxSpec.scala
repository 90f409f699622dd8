package graft

import org.scalatest.funsuite.AnyFunSuite

/** Parser-only syntax gate for the compile-gated delta module (VERDICT
  * r13 #6): `delta/compile` is a clean no-op in this sandbox because
  * the module's source set is empty until a delta-spark jar exists
  * (build.sbt), so a bit-rotted drop-in would otherwise hide until the
  * day the gate opens. This spec runs the 2.13 compiler FRONT END
  * (stop after the parser — no delta symbols needed) over every .scala
  * file under delta/src and fails on any syntax error. It cannot catch
  * type errors against the Delta API (that genuinely needs the jar),
  * but it pins the file as well as the sandbox allows.
  */
class DeltaSourceSyntaxSpec extends AnyFunSuite {

  test("delta module sources parse cleanly (syntax-only front end)") {
    val root = java.nio.file.Paths.get("delta/src")
    assert(java.nio.file.Files.isDirectory(root),
      "delta/src missing — the drop-in source should exist even while compile-gated")
    val sources = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(root)
      try s.iterator().asScala.filter(_.toString.endsWith(".scala")).toList
      finally s.close()
    }
    assert(sources.nonEmpty, "no .scala sources under delta/src")

    val settings = new scala.tools.nsc.Settings
    settings.usejavacp.value = true
    settings.stopAfter.value = List("parser")
    val reporter = new scala.tools.nsc.reporters.StoreReporter(settings)
    val global = new scala.tools.nsc.Global(settings, reporter)
    val run = new global.Run
    val files = sources.map { p =>
      new scala.reflect.internal.util.BatchSourceFile(p.toString,
        java.nio.file.Files.readString(p))
    }
    run.compileSources(files)
    val errors = reporter.infos.filter(_.severity == reporter.ERROR)
    assert(errors.isEmpty,
      "delta source syntax errors:\n" + errors.map(i =>
        s"${i.pos.source.file.name}:${i.pos.line}: ${i.msg}").mkString("\n"))
  }
}
