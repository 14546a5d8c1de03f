package graft

import org.scalatest.funsuite.AnyFunSuite

/** The CLI surface (reference C2): invoking the driver main with the
  * reference's own inputs must land the golden file on disk.
  */
class MainSpec extends AnyFunSuite {

  test("Main <in> <out> <stop> <punct> reproduces the golden single file") {
    SparkTestSession.spark // pre-create so Main reuses (and doesn't stop) it
    val out = java.nio.file.Files.createTempDirectory("main_cli").toString
    graft.index.Main.main(Array(
      "/root/reference/input", out,
      "/root/reference/skip/stop-word-list.txt",
      "/root/reference/skip/punctuation.txt"))

    val parts = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(parts.length == 1, "legacy mode must write one part file")
    val written = {
      val src = scala.io.Source.fromFile(parts.head, "UTF-8")
      try src.getLines().toArray finally src.close()
    }
    val want = {
      val src = scala.io.Source.fromFile(
        "/root/reference/output/part-r-00000", "UTF-8")
      try src.getLines().toArray finally src.close()
    }
    assert(written.length == want.length,
      s"line count: got ${written.length}, want ${want.length}")
    written.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"first mismatch at line ${i + 1}:\n  got  $g\n  want $w")
    }
  }

  test("Main <in> <out> writes the modern numeric-ranked index, partitioned") {
    SparkTestSession.spark
    val out = java.nio.file.Files.createTempDirectory("main_cli_modern").toString
    graft.index.Main.main(Array("/root/reference/input", out))
    val parts = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(parts.nonEmpty)
    val lines = parts.flatMap { f =>
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try src.getLines().toArray finally src.close()
    }
    // numeric mode: no stop list → more terms than the legacy run, and
    // every line is `term: doc#cnt, ...`
    assert(lines.length >= 23596)
    assert(lines.forall(_.matches("""\S+: .+#\d+.*""")))
  }
}
