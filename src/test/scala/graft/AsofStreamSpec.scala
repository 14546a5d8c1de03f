package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{AsofLeft, AsofRight, EventStreams}

/** The stateful streaming as-of join must give every left event the
  * LATEST right row at or before it (NULL if none), exactly once,
  * including out-of-order cross-batch arrival — and must keep serving
  * correct matches from its COMPACTED single-right state long after
  * the contributing right rows were finalized and dropped.
  */
class AsofStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s)

  /** Independent as-of: for each left, argmax over rights with
    * r.ts <= l.ts by (ts, value) — plain Scala. */
  private def expected(lefts: Seq[AsofLeft], rights: Seq[AsofRight])
      : Set[(Long, Long, java.sql.Timestamp,
             Option[java.sql.Timestamp], Option[Double])] =
    lefts.map { l =>
      val cand = rights.filter(r =>
        r.user_id == l.user_id && !r.ts.after(l.ts))
      if (cand.isEmpty) (l.user_id, l.event_id, l.ts, None, None)
      else {
        val best = cand.maxBy(r => (r.ts.getTime, r.value))
        (l.user_id, l.event_id, l.ts, Some(best.ts), Some(best.value))
      }
    }.toSet

  private def collectOut(table: String) =
    spark.table(table)
      .filter(col("user_id") < 999)
      .as[(Long, Long, java.sql.Timestamp,
           Option[java.sql.Timestamp], Option[Double])](
        org.apache.spark.sql.Encoders.product)
      .collect().toSeq

  test("as-of matches, NULLs, late rights and the compacted row — exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // user 1's timeline: the late-arriving right at 10:10 (batch 2)
    // must win left@10:15 over the earlier 10:00 row; left@09:50
    // precedes every right (NULL); left@10:45 finalizes in batch 3,
    // AFTER rights 10:00/10:10/10:30 were finalized and compacted to
    // one dominant row — it must still match (10:30, 2.0).
    val lefts = Seq(
      AsofLeft(1L, ts("2024-01-01 09:50:00"), 101L),
      AsofLeft(1L, ts("2024-01-01 10:15:00"), 102L),
      AsofLeft(1L, ts("2024-01-01 10:45:00"), 103L))
    val rights = Seq(
      AsofRight(1L, ts("2024-01-01 10:00:00"), 1.0),
      AsofRight(1L, ts("2024-01-01 10:10:00"), 5.0),
      AsofRight(1L, ts("2024-01-01 10:30:00"), 2.0))

    val ls = MemoryStream[AsofLeft]
    val rs = MemoryStream[AsofRight]
    val q = EventStreams.asofJoinStateful(ls.toDS(), rs.toDS(),
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    try {
      // batch 1: wm advances to 10:05 -> finalizes only left@09:50
      ls.addData(lefts(1), lefts(0))
      rs.addData(rights(0))
      q.processAllAvailable()
      // batch 2: the 10:10 right arrives LATE but inside the horizon;
      // wm -> 10:35 finalizes left@10:15 against {10:00, 10:10}
      ls.addData(lefts(2))
      rs.addData(rights(1), rights(2))
      q.processAllAvailable()
      // batch 3: sentinel pushes wm past 10:45; left@10:45 must match
      // the COMPACTED (10:30, 2.0) with pendR long empty
      rs.addData(AsofRight(999L, ts("2024-01-02 12:00:00"), 0.0))
      q.processAllAvailable()
      rs.addData(AsofRight(999L, ts("2024-01-02 12:01:00"), 0.0))
      q.processAllAvailable()

      val got = collectOut("asof_out")
      assert(got.size == got.map(_._2).distinct.size,
        s"duplicate emissions: $got")
      assert(got.toSet == expected(lefts, rights), s"got $got")
      assert(got.toSet.exists(r => r._2 == 101L && r._4.isEmpty),
        "pre-history left must emit a NULL match")
      assert(got.toSet.exists(r => r._2 == 102L &&
        r._5.contains(5.0)), "late right must win the argmax")
      assert(got.toSet.exists(r => r._2 == 103L &&
        r._5.contains(2.0)), "compacted right must serve later lefts")
    } finally q.stop()
  }

  test("corpus slice: streamed as-of equals independent math under shuffled arrival") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = tables.load(spark, "/root/testdata/sf0.001", "events")
    val lefts = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
      .as[AsofLeft].collect().toSeq
    val rights = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
      .as[AsofRight].collect().toSeq
    assert(lefts.nonEmpty && rights.nonEmpty, "test premise: both sides")

    val ls = MemoryStream[AsofLeft]
    val rs = MemoryStream[AsofRight]
    val q = EventStreams.asofJoinStateful(ls.toDS(), rs.toDS())
      .writeStream.format("memory").queryName("asof_corpus_out")
      .outputMode("append").start()
    try {
      // delivery in 3 batches split at SHARED global time terciles
      // (keeps every row inside the union watermark's 2h horizon, so
      // nothing is legitimately droppable), REVERSED within each batch
      // — maximal out-of-order inside the horizon
      val allTs = (lefts.map(_.ts.getTime) ++ rights.map(_.ts.getTime)).sorted
      val (q1, q2) = (allTs(allTs.size / 3), allTs(2 * allTs.size / 3))
      val cuts = Seq(
        (t: Long) => t < q1,
        (t: Long) => t >= q1 && t < q2,
        (t: Long) => t >= q2)
      cuts.foreach { in =>
        ls.addData(lefts.filter(l => in(l.ts.getTime))
          .sortBy(_.ts.getTime).reverse: _*)
        rs.addData(rights.filter(r => in(r.ts.getTime))
          .sortBy(_.ts.getTime).reverse: _*)
        q.processAllAvailable()
      }
      val far1 = new java.sql.Timestamp(
        (lefts.map(_.ts.getTime) ++ rights.map(_.ts.getTime)).max +
          86400000L)
      rs.addData(AsofRight(999L, far1, 0.0)); q.processAllAvailable()
      rs.addData(AsofRight(999L,
        new java.sql.Timestamp(far1.getTime + 60000L), 0.0))
      q.processAllAvailable()

      val got = collectOut("asof_corpus_out")
      assert(got.size == lefts.size,
        s"every left must emit exactly once: ${got.size} vs ${lefts.size}")
      assert(got.toSet == expected(lefts, rights))
    } finally q.stop()
  }

  test("idle TTL reclaims the compacted row: post-TTL lefts see no predecessor") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ls = MemoryStream[AsofLeft]
    val rs = MemoryStream[AsofRight]
    val q = EventStreams.asofJoinStateful(ls.toDS(), rs.toDS(),
        watermarkDelay = "10 minutes", idleTtl = "1 hour")
      .writeStream.format("memory").queryName("asof_ttl_out")
      .outputMode("append").start()
    try {
      rs.addData(AsofRight(1L, ts("2024-01-01 10:00:00"), 7.0))
      q.processAllAvailable()
      // finalize + compact the right, arming the 1h TTL
      rs.addData(AsofRight(999L, ts("2024-01-01 12:00:00"), 0.0))
      q.processAllAvailable()
      // fire the TTL (wm far past armed 11:50+1h)
      rs.addData(AsofRight(999L, ts("2024-01-01 14:00:00"), 0.0))
      q.processAllAvailable()
      // a left 10h later: the documented trade — its predecessor's
      // state was reclaimed after a full TTL of user silence
      ls.addData(AsofLeft(1L, ts("2024-01-01 20:00:00"), 201L))
      q.processAllAvailable()
      rs.addData(AsofRight(999L, ts("2024-01-02 12:00:00"), 0.0))
      q.processAllAvailable()
      rs.addData(AsofRight(999L, ts("2024-01-02 12:01:00"), 0.0))
      q.processAllAvailable()

      val got = collectOut("asof_ttl_out")
      assert(got.map(_._2) == Seq(201L))
      assert(got.head._4.isEmpty && got.head._5.isEmpty,
        s"TTL-reclaimed predecessor must not serve: $got")
    } finally q.stop()
  }
}
