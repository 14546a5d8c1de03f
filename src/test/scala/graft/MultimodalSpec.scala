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
}
