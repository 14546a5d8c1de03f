package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.index.SketchStore

/** The mergeable-sketch artifact: stored day-sketch unions must land
  * inside the HLL error envelope of exact distinct counts, be
  * grouping-invariant (union of per-day sketches == one-shot sketch of
  * the same rows), serve windows off pruned day partitions, fold
  * appends in exactly, and rebuild days deterministically (the
  * erasure/correction seam — including dropping a day whose every row
  * was erased).
  */
class SketchStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def events: DataFrame =
    tables.load(spark, dir, "events")
      .select(col("ts"), col("event_type"), col("user_id"))

  private def withDay(e: DataFrame): DataFrame =
    e.withColumn("day", to_date(date_trunc("DAY", col("ts"))))

  private def exactDistinct(e: DataFrame): Map[String, Long] = {
    import spark.implicits._
    e.groupBy("event_type").agg(count_distinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
  }

  private def served(name: String,
                     from: Option[java.sql.Date] = None): Map[String, Long] = {
    import spark.implicits._
    SketchStore.serveDistinct(spark, name, from.map(lit(_)))
      .as[(String, Long)].collect().toMap
  }

  private def envelope(exact: Long): Double =
    math.max(exact * 0.065, 8.0) // 4 sigma at lgK=12, small-count floor

  test("stored day-sketch unions land in the HLL envelope; " +
      "grouping-invariant vs one-shot sketches") {
    import spark.implicits._
    TestWarehouse.reset(spark, "sks_a_sketches", "sks_a_stats")
    SketchStore.build(events, "sks_a")
    val exact = exactDistinct(events)
    val est = served("sks_a")
    assert(est.keySet == exact.keySet)
    for ((k, e) <- exact)
      assert(math.abs(est(k) - e) <= envelope(e),
        s"$k: day-union estimate ${est(k)} outside envelope of exact $e")
    // mergeability pin: the union of per-day sketches estimates what a
    // ONE-SHOT sketch over the same rows does (registers fold by max,
    // so any partitioning of the stream serves the same summary)
    val oneShot = events.groupBy("event_type")
      .agg(hll_sketch_estimate(
        hll_sketch_agg(col("user_id"), lit(SketchStore.DefaultLgK)))
        .as("n"))
      .as[(String, Long)].collect().toMap
    for ((k, o) <- oneShot)
      assert(est(k) == o,
        s"$k: day-union ${est(k)} != one-shot $o — union not invariant")
  }

  test("day-window serve prunes to the window; append folds in exactly") {
    import spark.implicits._
    TestWarehouse.reset(spark, "sks_w_sketches", "sks_w_stats",
      "sks_f_sketches", "sks_f_stats")
    val e = withDay(events)
    val cut = e.agg(date_sub(max(col("day")), 6)).head().getDate(0)
    val head = e.filter(col("day") < lit(cut))
    val tail = e.filter(col("day") >= lit(cut))

    // build on history only, then append the new days (the nightly load)
    SketchStore.build(head.drop("day"), "sks_w")
    SketchStore.appendDays(tail.drop("day"), "sks_w")
    // full build twin: appended artifact must serve identically
    SketchStore.build(events, "sks_f")
    assert(served("sks_w") == served("sks_f"),
      "append-built store serves differently from one-shot build")

    // trailing-window serve reads only the window's day rows
    val win = served("sks_w", from = Some(cut))
    val exactWin = exactDistinct(tail)
    for ((k, x) <- exactWin)
      assert(math.abs(win(k) - x) <= envelope(x),
        s"$k: windowed estimate ${win(k)} outside envelope of exact $x")
    // the window must actually exclude history (7 of 30 days)
    assert(win.values.sum < served("sks_w").values.sum,
      "window serve did not prune out history")
  }

  test("rebuildDays is the erasure seam: gated rebuild == fresh gated " +
      "build; a fully-erased day drops its partition") {
    import spark.implicits._
    TestWarehouse.reset(spark, "sks_e_sketches", "sks_e_stats",
      "sks_g_sketches", "sks_g_stats")
    val e = withDay(events)
    SketchStore.build(events, "sks_e")

    // forget one user: rebuild exactly the days they appear in, from
    // the gated source
    val victim = e.select("user_id").head().getLong(0)
    val victimDays = e.filter(col("user_id") === victim)
      .select("day").distinct().collect().map(_.getDate(0)).toSeq
    val gated = e.filter(col("user_id") =!= victim)
    SketchStore.rebuildDays(gated.drop("day"), "sks_e", victimDays)
    SketchStore.build(gated.drop("day"), "sks_g")
    assert(served("sks_e") == served("sks_g"),
      "post-erasure rebuild serves differently from a fresh gated build")

    // a day erased whole (a bad-crawl correction) must DROP, not stale
    val lastDay = e.agg(max(col("day"))).head().getDate(0)
    SketchStore.rebuildDays(gated.filter(col("day") < lit(lastDay))
      .drop("day"), "sks_e", Seq(lastDay))
    assert(spark.table("sks_e_sketches")
      .filter(col("day") === lit(lastDay)).isEmpty,
      "fully-erased day still has sketch rows")
  }

  test("eraseUsers: one-call user erasure == fresh gated build; " +
      "replay is a no-op") {
    import spark.implicits._
    TestWarehouse.reset(spark, "sks_u_sketches", "sks_u_stats",
      "sks_ug_sketches", "sks_ug_stats")
    SketchStore.build(events, "sks_u")
    val victims = events.select("user_id").distinct()
      .orderBy("user_id").limit(2).as[Long].collect().toSeq
    SketchStore.eraseUsers(events, "sks_u", victims)
    SketchStore.build(
      events.filter(!col("user_id").isin(victims: _*)), "sks_ug")
    assert(served("sks_u") == served("sks_ug"),
      "eraseUsers serves differently from a fresh gated build")
    // replay against the already-gated source: nothing to rebuild
    SketchStore.eraseUsers(
      events.filter(!col("user_id").isin(victims: _*)), "sks_u", victims)
    assert(served("sks_u") == served("sks_ug"), "replay drifted serving")
  }
}
