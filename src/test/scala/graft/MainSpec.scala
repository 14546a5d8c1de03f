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

  test("Main <in> <out> --no-skip runs the empty-pattern legacy branch") {
    // the reference WITHOUT -skip (InvertedIndexer.java:53-64): no
    // punctuation scrub, no stop-words — still lowercase + whitespace
    // tokenize + length/numeric filters, single-file sink. There is no
    // golden file for this branch, so the oracle is an independent
    // pure-Scala replication of the reference mapper (StringTokenizer,
    // same regex) over one input document.
    SparkTestSession.spark
    val out = java.nio.file.Files.createTempDirectory("main_cli_noskip").toString
    graft.index.Main.main(Array("/root/reference/input", out, "--no-skip"))

    val parts = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(parts.length == 1, "no-skip legacy mode must write one part file")
    val byTerm = {
      val src = scala.io.Source.fromFile(parts.head, "UTF-8")
      try src.getLines().map { l =>
        val i = l.indexOf(": "); l.substring(0, i) -> l.substring(i + 2)
      }.toMap
      finally src.close()
    }

    // stop-words and punctuation-attached tokens SURVIVE this branch
    assert(byTerm.contains("the"), "stop-words must not be filtered")
    assert(byTerm.keys.exists(_.exists(!_.isLetterOrDigit)),
      "tokens must keep attached punctuation")

    // reference mapper replicated verbatim over one document
    // (InvertedIndexer.java:107-126 with empty pattern sets)
    val doc = "shakespeare-hamlet-25.txt"
    val num = java.util.regex.Pattern.compile("^[-\\+]?[\\d]*$")
    val counts = scala.collection.mutable.Map.empty[String, Int]
    val src = scala.io.Source.fromFile(
      s"/root/reference/input/$doc", "UTF-8")
    try src.getLines().foreach { line =>
      val it = new java.util.StringTokenizer(line.toLowerCase)
      while (it.hasMoreTokens) {
        val w = it.nextToken()
        if (w.length >= 3 && !num.matcher(w).matches())
          counts(w) = counts.getOrElse(w, 0) + 1
      }
    } finally src.close()

    // spot-check punctuated terms end-to-end: the written posting for
    // this doc must carry the mapper's exact count
    val punctTerms = counts.keys
      .filter(t => t.exists(!_.isLetterOrDigit)).toSeq.sorted.take(5)
    assert(punctTerms.nonEmpty, "hamlet must yield punctuated tokens")
    for (t <- punctTerms) {
      val line = byTerm.getOrElse(t, fail(s"term '$t' missing from index"))
      assert(line.split(", ").contains(s"$doc#${counts(t)}"),
        s"term '$t': posting for $doc must be ${counts(t)}, got: $line")
    }
    // and the busiest term of the doc agrees too
    val (top, topCnt) = counts.maxBy(_._2)
    assert(byTerm(top).split(", ").contains(s"$doc#$topCnt"),
      s"top term '$top' posting mismatch")
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
