package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source-level staging-path hygiene (VERDICT r14 task 2): the round-14
  * `sink_zorder` false-green happened because a TEST rebuilt an operator's
  * scratch path by string concatenation — when the operator's real path
  * moved (per-JVM isolation), the test kept reading a STALE artifact that
  * happened to survive on tmpfs, and "sbt test green" stopped meaning
  * anything for that gate.
  *
  * This spec makes the defect class unwriteable: no test source may
  * mention the scratch/memo base literals at all. The sanctioned
  * accessors are `SourcesSinks.scratchFor(dir, op)` (sink staging) and
  * `MemoFrames.jvmBaseDir` (memo artifacts) — both resolve the REAL
  * per-JVM path the operator used. A grep-level check is deliberate: it
  * catches the concatenation even when the resulting path is never read,
  * and it needs no classpath tricks.
  */
class ScratchPathHygieneSpec extends AnyFunSuite {

  private val forbidden = Seq("graft_io", "graft-memo", "/dev/shm", "/tmp/graft")

  test("no test source hand-builds a scratch/memo staging path") {
    val root = new java.io.File(sys.props.getOrElse("user.dir", "."),
      "src/test/scala")
    assume(root.isDirectory, s"test sources not at $root — packaged run, skipping")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    val offenders = walk(root)
      .filterNot(_.getName == "ScratchPathHygieneSpec.scala") // the literals above
      .flatMap { f =>
        val text = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        forbidden.collect {
          case lit if text.contains(lit) =>
            val line = text.linesIterator.zipWithIndex
              .collectFirst { case (l, i) if l.contains(lit) => i + 1 }.getOrElse(-1)
            s"${f.getName}:$line contains '$lit'"
        }
      }
    assert(offenders.isEmpty,
      "test sources must locate staging through SourcesSinks.scratchFor / " +
        "MemoFrames.jvmBaseDir, never by rebuilding the path:\n  " +
        offenders.mkString("\n  "))
  }
}
