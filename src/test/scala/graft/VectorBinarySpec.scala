package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.index.VectorStore

/** The `_bits` artifact surface: packed sign words equal an
  * independent Scala packer bit-for-bit, binary serving hides deleted
  * vectors and finds appended ones, compaction physically purges the
  * bit rows (the ErasureSweepSpec contract — an erased id must not
  * survive in ANY artifact table), and a store predating the surface
  * refuses loudly.
  */
class VectorBinarySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private val vs = "vbin_store"

  private def allTables = Seq("centroids", "stats", "codes", "raw",
    "bits", "version", "tombstones").map(s => s"${vs}_$s")

  private def emb = tables.load(spark, dir, "embeddings")
    .select(col("vec_id"), col("embedding"))

  /** Independent packer: plain Scala bit ops over the float vector. */
  private def packWords(v: Seq[Float]): (Long, Long) = {
    var w0 = 0L; var w1 = 0L
    var i = 0
    while (i < 32) {
      if (v(i) >= 0f) w0 |= (1L << i)
      if (v(i + 32) >= 0f) w1 |= (1L << i)
      i += 1
    }
    (w0, w1)
  }

  private def probes = emb.filter(col("vec_id") % 25 === 0).limit(8)
    .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))

  private def servedIds: Set[Long] = {
    import spark.implicits._
    VectorStore.serveTopKBinary(probes, vs)
      .select("neighbor_id").as[Long].collect().toSet
  }

  test("bits == independent packer; delete/append/compact/legacy seams") {
    import spark.implicits._
    TestWarehouse.reset(spark, allTables: _*)
    VectorStore.build(emb, vs)

    // --- bit parity: every stored word pair equals the Scala packer
    val want = emb.as[(Long, Seq[Float])].collect()
      .map { case (id, v) => id -> packWords(v) }.toMap
    val got = spark.table(s"${vs}_bits")
      .select("vec_id", "w0", "w1").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want, "stored sign words diverged from the packer")

    // --- serve sanity + the refine visibly reorders
    val served = VectorStore.serveTopKBinary(probes, vs)
    assert(served.groupBy("probe_id").count()
      .filter(col("count") =!= 10).isEmpty, "not 10 per probe")
    assert(served.filter(col("rank") =!= col("hrank")).count() > 0,
      "exact rerank never reordered the hamming shortlist")

    // --- delete hides from binary serving immediately
    val victim = servedIds.head
    VectorStore.deleteVecs(spark, Seq(victim), vs)
    assert(!servedIds.contains(victim), "deleted vector still served")

    // --- append lands on the bit side: a near-clone of a probe vector
    // becomes retrievable by the binary path
    val probeVec = emb.filter(col("vec_id") === 0L)
      .as[(Long, Seq[Float])].head()._2
    Seq((9999L, probeVec.map(x => x * 0.999f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
      .pipe(d => VectorStore.append(d, vs))
    assert(servedIds.contains(9999L),
      "appended near-clone not retrieved by the binary path")

    // --- compaction physically purges the victim's bit row, serving
    // unchanged, tombstones cleared
    val before = servedIds
    graft.streaming.VectorMaintenance.compact(spark, vs)
    assert(spark.table(s"${vs}_bits")
      .filter(col("vec_id") === victim).isEmpty,
      "compaction left the deleted vector's bit row on disk")
    assert(!spark.catalog.tableExists(s"${vs}_tombstones"),
      "compaction did not clear the tombstones")
    assert(servedIds == before, "compaction changed binary serving")

    // --- legacy refusal: a store without the bit table refuses the
    // binary surface instead of silently degrading
    spark.sql(s"DROP TABLE IF EXISTS ${vs}_bits")
    val e = intercept[IllegalArgumentException] {
      VectorStore.serveTopKBinary(probes, vs).collect()
    }
    assert(e.getMessage.contains("no bit table"), e.getMessage)
    TestWarehouse.reset(spark, allTables: _*)
  }

  private implicit class Piped[A](a: A) {
    def pipe[B](f: A => B): B = f(a)
  }
}
