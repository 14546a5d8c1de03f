package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.{MediaBlob, Multimodal}

/** Pins the decode-seam contract: deterministic fake features, correct
  * batch shape (one output row per blob, fixed dim), partition-local
  * execution, and byte-exact window means.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def blobs(rows: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    rows.map { case (id, b) => MediaBlob(id, b, "application/octet-stream") }
      .toDS()
  }

  test("decodeFeatures: exact window means, fixed dimension") {
    // 8 bytes, dim 4 → windows of 2: means (0+1)/2, (2+3)/2, ...
    val in = blobs(Seq((1L, Array.tabulate(8)(_.toByte))))
    val out = Multimodal.decodeFeatures(in, dim = 4).collect()
    assert(out.length == 1)
    assert(out.head.n_bytes == 8L)
    assert(out.head.features.toSeq == Seq(0.5f, 2.5f, 4.5f, 6.5f))
  }

  test("decodeFeatures: unsigned byte handling and short payloads") {
    // 0xFF must read as 255, not -1
    val out = Multimodal.decodeFeatures(
      blobs(Seq((1L, Array(0xff.toByte)))), dim = 4).collect().head
    // 1 byte across 4 windows: only the window containing it is nonzero
    assert(out.features.count(_ != 0f) == 1)
    assert(out.features.toSeq.contains(255f))
    // empty payload → all-zero features, not a crash
    val empty = Multimodal.decodeFeatures(
      blobs(Seq((2L, Array.empty[Byte]))), dim = 4).collect().head
    assert(empty.features.toSeq == Seq(0f, 0f, 0f, 0f))
  }

  test("decodeFeatures: deterministic and partition-local (no shuffle)") {
    val in = blobs((1L to 100L).map(i =>
      (i, Array.tabulate(64)(j => ((i * 31 + j) % 251).toByte)))).repartition(7)
    val a = Multimodal.decodeFeatures(in, dim = 8).collect()
      .sortBy(_.doc_id).map(_.features.toSeq)
    val b = Multimodal.decodeFeatures(in, dim = 8).collect()
      .sortBy(_.doc_id).map(_.features.toSeq)
    assert(a.toSeq == b.toSeq)
    // the ONLY exchange is the explicit repartition(7) in the input;
    // the decode itself adds no shuffle
    val plan = Multimodal.decodeFeatures(in, dim = 8)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"decode stage must not add a shuffle:\n$plan")
  }

  test("blob column ops: byte length, digest, chunk count") {
    import spark.implicits._
    val df = Seq("hello world").toDF("text")
    val blob = Multimodal.blobOf(col("text"))
    val (n, md, ck) = df.select(
      Multimodal.byteLength(blob),
      Multimodal.contentMd5(blob),
      Multimodal.chunkCount(blob, 4)).as[(Long, String, Long)].head()
    assert(n == 11L)
    assert(md == "5eb63bbbe01eeed093cb22bb8f5acdc3") // md5("hello world")
    assert(ck == 3L) // ceil(11/4)
  }

  test("resize: box-averaged downscale, exact bytes; short payloads verbatim") {
    // 8 bytes → 4: windows of 2, rounded means
    val in = Array[Byte](0, 10, 20, 30, 100, 101, -1, -1) // -1 = 0xff = 255
    val out = Multimodal.resize(blobs(Seq((1L, in))), 4).head().payload
    assert(out.toSeq == Seq[Byte](5, 25, 101 /* (100+101+1)/2=100.5→101 */ ,
      -1 /* (255+255+1)/2 = 255 → 0xff */))
    // 10 → 4: uneven windows 2/3/2/3 still cover every byte exactly once
    val in10 = Array.tabulate(10)(i => (i * 10).toByte)
    val out10 = Multimodal.resize(blobs(Seq((2L, in10))), 4).head().payload
    assert(out10.length == 4)
    assert(out10.toSeq == Seq[Byte](5, 30, 55, 80))
    // at-or-under passes verbatim
    val small = Array[Byte](7, 8)
    assert(Multimodal.resize(blobs(Seq((3L, small))), 4)
      .head().payload.toSeq == small.toSeq)
  }

  test("mm06 frames are a stride+tail subset of mm02's chunks, densely numbered") {
    val dir = "/root/testdata/sf0.001"
    val chunks = SparkEntry.queries("mm02_blob_chunks")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    val nChunks = chunks.keys.groupBy(_._1).map { case (d, ks) => d -> ks.size }
    val frames = SparkEntry.queries("mm06_frame_sample")(spark, dir).collect()
    assert(frames.nonEmpty)
    // every sampled frame carries mm02's digest for that chunk
    frames.foreach { r =>
      val key = (r.getLong(0), r.getAs[Long]("chunk_idx"))
      assert(chunks(key) == r.getString(3), s"digest mismatch at $key")
    }
    val byDoc = frames.groupBy(_.getLong(0))
    assert(byDoc.keySet == nChunks.keySet, "every payload must be sampled")
    byDoc.foreach { case (d, rs) =>
      val idxs = rs.sortBy(_.getAs[Long]("frame_no")).map(_.getAs[Long]("chunk_idx"))
      val nc = nChunks(d).toLong
      val want = ((0L until nc by 4) ++ Seq(nc - 1)).distinct.sorted
      assert(idxs.toSeq == want, s"doc $d sampled $idxs, expected $want")
      assert(rs.map(_.getAs[Long]("frame_no")).sorted.toSeq ==
        (0L until want.length.toLong), s"doc $d frame_no must be dense")
    }
  }

  test("mm10: a monotone payload transform defeats digests, not dHash") {
    // the perceptual-hash claim made precise: case-mapping is a
    // uniform −32 on letters (the brightness-shift analog) — every
    // content digest changes, NO fixed-offset chunk digest survives,
    // yet the dHash words are bit-identical because each bit is the
    // ORDER of adjacent samples and monotone maps preserve order
    import org.apache.spark.sql.functions._
    val docs = tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text")).limit(10)
    val twins = docs.select(col("doc_id"), upper(col("text")).as("text"))
    def hashed(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), expr(
        "transform(sequence(0, 64), w -> ascii(substring(text, " +
          "CAST((w * length(text)) div 66 AS INT) + 1, 1)))").as("s"))
      .select(col("doc_id"), expr(
        "aggregate(sequence(0, 31), CAST(0 AS BIGINT), (acc, w) -> " +
          "acc + IF(element_at(s, w + 2) > element_at(s, w + 1), " +
          "shiftleft(CAST(1 AS BIGINT), w), CAST(0 AS BIGINT)))").as("w0"),
        expr(
        "aggregate(sequence(0, 31), CAST(0 AS BIGINT), (acc, w) -> " +
          "acc + IF(element_at(s, w + 34) > element_at(s, w + 33), " +
          "shiftleft(CAST(1 AS BIGINT), w), CAST(0 AS BIGINT)))").as("w1"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val orig = hashed(docs)
    val up = hashed(twins)
    assert(orig == up, "dHash must be invariant under the monotone map")

    // the compiled expression the query actually runs (DHashWords —
    // one code-point pass) must equal the HOF encoding bit-for-bit:
    // the HOF is the independent twin AND the oracle's formulation
    val native = docs
      .select(col("doc_id"),
        call_function("graft_dhash", col("text")).as("dh"))
      .select(col("doc_id"), col("dh.w0"), col("dh.w1"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(native == orig,
      "DHashWords diverged from the HOF twin encoding")

    // and the digest side genuinely loses the twin: whole-payload md5
    // differs and the fixed-offset chunk digests share NOTHING
    def chunks(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(expr(
        "transform(sequence(0, CAST(ceil(length(text) / 256.0) AS INT) " +
          "- 1), i -> md5(CAST(substring(text, i * 256 + 1, 256) " +
          "AS BINARY)))")).as("ch"))
      .collect().map(_.getString(0)).toSet
    assert(chunks(docs).intersect(chunks(twins)).isEmpty,
      "case-mapped payloads must share zero chunk digests")
  }
}
