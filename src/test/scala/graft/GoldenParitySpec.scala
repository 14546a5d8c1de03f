package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.InvertedIndex

/** The reference's own oracle: the committed output of the Hadoop job
  * (/root/reference/output/part-r-00000, 23,596 lines) produced from the
  * committed inputs. `buildLegacy` must reproduce it byte-for-byte,
  * including the two quirks: postings ranked by DESCENDING LEXICOGRAPHIC
  * "count#filename" string order (count 10 below count 2), ties by
  * filename descending (InvertedIndexer.java:178,180).
  */
class GoldenParitySpec extends AnyFunSuite {

  test("buildLegacy reproduces the reference output byte-for-byte") {
    val spark = SparkTestSession.spark
    val got = InvertedIndex.buildLegacy(
      spark,
      "/root/reference/input",
      "/root/reference/skip/stop-word-list.txt",
      "/root/reference/skip/punctuation.txt").collect()

    val want = {
      val src = scala.io.Source.fromFile(
        "/root/reference/output/part-r-00000", "UTF-8")
      try src.getLines().toArray finally src.close()
    }

    assert(got.length == want.length,
      s"line count: got ${got.length}, want ${want.length}")
    // Pinpoint the first diff instead of dumping 23k lines on failure.
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"first mismatch at line ${i + 1}:\n  got  $g\n  want $w")
    }
  }

  test("writeIndex single-file sink round-trips the golden output (O4)") {
    val spark = SparkTestSession.spark
    val lines = InvertedIndex.buildLegacy(
      spark,
      "/root/reference/input",
      "/root/reference/skip/stop-word-list.txt",
      "/root/reference/skip/punctuation.txt")
    val out = java.nio.file.Files.createTempDirectory("golden_sink").toString
    InvertedIndex.writeIndex(lines, out, singleFile = true)
    val parts = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-")).sorted
    assert(parts.length == 1, "singleFile=true must produce one part file")
    val written = {
      val src = scala.io.Source.fromFile(parts.head, "UTF-8")
      try src.getLines().toArray finally src.close()
    }
    val want = {
      val src = scala.io.Source.fromFile(
        "/root/reference/output/part-r-00000", "UTF-8")
      try src.getLines().toArray finally src.close()
    }
    assert(written.sameElements(want),
      "written part file must be line-identical to the reference output")
  }
}
