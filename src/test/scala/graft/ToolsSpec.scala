package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wires the repo's Python tooling self-tests into the sbt gate, so a
  * future edit to `tools/bench_diff.py` cannot silently break the
  * artifact-recovery paths its unit test pins (the round-11 version shipped
  * exactly that way: broken on the real inputs, caught only by a manual
  * run). Skips cleanly if no python3 is on PATH — the tools are driver-side
  * conveniences, not library surface.
  */
class ToolsSpec extends AnyFunSuite {

  private def haveGreenPython: Boolean =
    try {
      new ProcessBuilder("python3", "--version").start().waitFor() == 0
    } catch { case _: java.io.IOException => false }

  test("bench_diff.py passes its artifact-shape unit test") {
    assume(haveGreenPython, "python3 not on PATH — tool test skipped")
    val proc = new ProcessBuilder("python3", "tools/test_bench_diff.py")
      .directory(new java.io.File(sys.props.getOrElse("user.dir", ".")))
      .redirectErrorStream(true)
      .start()
    val out = scala.io.Source.fromInputStream(proc.getInputStream).mkString
    val exit = proc.waitFor()
    assert(exit == 0, s"tools/test_bench_diff.py failed (exit $exit):\n$out")
    assert(out.contains("all shapes OK"), s"unexpected output:\n$out")
  }

  test("bench_diff.py reads both committed driver artifacts and the repo artifact") {
    assume(haveGreenPython, "python3 not on PATH — tool test skipped")
    for ((old, nw) <- Seq("BENCH_r10.json" -> "BENCH_r11.json",
                          "bench/r10.json" -> "bench/r12.json")) {
      val proc = new ProcessBuilder("python3", "tools/bench_diff.py", old, nw)
        .redirectErrorStream(true).start()
      val out = scala.io.Source.fromInputStream(proc.getInputStream).mkString
      proc.waitFor()
      assert(out.contains("shared queries:"),
        s"bench_diff could not diff $old vs $nw:\n$out")
    }
  }
}
