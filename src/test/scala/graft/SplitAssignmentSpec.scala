package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.SplitAssignment

/** The streaming split assigner must honor dd19's batch contract where
  * merging is benign and REFUSE it where it isn't: a whole corpus fed
  * as one batch reproduces dd19 exactly; under id-ordered multi-batch
  * arrival every committed side is frozen, the corpus is covered
  * exactly once, and no near-dup pair straddles train/eval without a
  * quarantine; a doc bridging clusters on conflicting sides is
  * quarantined while the frozen sides never flip; and a crash-window
  * replay rewrites its partition deterministically (partition
  * overwrite, never adoption).
  */
class SplitAssignmentSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def reset(name: String): Unit =
    TestWarehouse.reset(spark,
      Seq("shingles", "sigs", "bands", "splits", "marker").map(s => s"${name}_$s") ++
        Seq("bandsc", "shinglesc", "sigsc")
          .flatMap(s => Seq(s"${name}_$s", s"${name}_${s}_staging")): _*)

  private def corpus() = tables.load(spark, dir, "documents")
    .select("doc_id", "text")

  private def rows(name: String): Map[Long, (Long, String)] =
    SplitAssignment.assignments(spark, name)
      .select("doc_id", "grp", "split").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

  /** dd19's side draw, recomputed from first principles in Scala. */
  private def sideOf(id: Long): String = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"split$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    if (java.lang.Long.parseLong(hex, 16) % 10 == 0) "eval" else "train"
  }

  test("a whole corpus fed as ONE batch reproduces dd19 exactly") {
    reset("sp1")
    SplitAssignment.assignBatch(corpus(), 0L, "sp1")
    val got = rows("sp1")
    val want = SparkEntry.queries("dd19_leakage_free_split")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(got == want)
    spark.catalog.clearCache()
  }

  test("id-ordered arrival: frozen, exactly-once, no straddle, dd19 off-bridge") {
    reset("sp2")
    val all = corpus().orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val batches = all.grouped((all.length + 2) / 3).toSeq
    import spark.implicits._
    var frozen = Map.empty[Long, (Long, String)]
    batches.zipWithIndex.foreach { case (b, i) =>
      SplitAssignment.assignBatch(b.toSeq.toDF("doc_id", "text"), i.toLong, "sp2")
      val now = rows("sp2")
      frozen.foreach { case (id, gs) =>
        assert(now(id) == gs, s"committed doc $id must stay frozen")
      }
      frozen = now
    }
    assert(frozen.keySet == all.map(_._1).toSet, "exactly-once corpus cover")
    // the leakage guarantee: every batch near-dup pair agrees on its
    // side or touches a quarantined doc
    val pairs = SparkEntry.queries("dd03_minhash_lsh")(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      val (sa, sb) = (frozen(a)._2, frozen(b)._2)
      assert(sa == sb || sa == "quarantine" || sb == "quarantine",
        s"pair ($a,$b) straddles $sa/$sb")
    }
    // off any bridged component, streamed == batch dd19
    val dd19 = SparkEntry.queries("dd19_leakage_free_split")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    val bridgedComps = frozen.collect {
      case (id, (_, "quarantine")) => dd19(id)._1
    }.toSet
    frozen.foreach { case (id, (_, split)) =>
      if (!bridgedComps.contains(dd19(id)._1))
        assert(split == dd19(id)._2,
          s"doc $id off-bridge must match batch dd19 (${dd19(id)._2}), got $split")
    }
    spark.catalog.clearCache()
  }

  test("a cross-side bridge quarantines the bridge, never flips frozen sides") {
    reset("sp3")
    import spark.implicits._
    // ids with opposing dd19 sides, found from the same draw the
    // assigner uses; c arrives last
    val a = (1L to 300L).find(sideOf(_) == "eval").get
    val b = (a + 1 to a + 300).find(sideOf(_) == "train").get
    val c = 1000L
    val w = (1 to 40).map(i => s"w$i")
    val textA = w.slice(0, 25).mkString(" ")  // w1..w25
    val textB = w.slice(15, 40).mkString(" ") // w16..w40: J(A,B)≈0.21 < τ
    val textC = w.mkString(" ")               // J(C,A)=J(C,B)≈0.61 ≥ τ
    SplitAssignment.assignBatch(Seq((a, textA)).toDF("doc_id", "text"), 0L, "sp3")
    SplitAssignment.assignBatch(Seq((b, textB)).toDF("doc_id", "text"), 1L, "sp3")
    assert(rows("sp3") == Map(a -> (a, "eval"), b -> (b, "train")))
    SplitAssignment.assignBatch(Seq((c, textC)).toDF("doc_id", "text"), 2L, "sp3")
    val after = rows("sp3")
    assert(after(a) == (a, "eval") && after(b) == (b, "train"),
      "frozen sides must survive the bridge")
    assert(after(c) == (a.min(b).min(c), "quarantine"),
      s"the bridging doc must quarantine under the merged grp, got ${after(c)}")
    // replay of the committed batch is a no-op
    SplitAssignment.assignBatch(Seq((c, textC)).toDF("doc_id", "text"), 2L, "sp3")
    assert(rows("sp3") == after)
    spark.catalog.clearCache()
  }

  test("no-straddle holds under ARBITRARY (non-id-ordered) arrival too") {
    reset("sp5")
    import spark.implicits._
    // deterministic shuffle: order by md5 of the id — scrambles arrival
    // completely while staying reproducible
    val all = corpus().orderBy(md5(col("doc_id").cast("string"))).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val batches = all.grouped((all.length + 3) / 4).toSeq
    batches.zipWithIndex.foreach { case (b, i) =>
      SplitAssignment.assignBatch(b.toSeq.toDF("doc_id", "text"), i.toLong, "sp5")
    }
    val got = rows("sp5")
    assert(got.keySet == all.map(_._1).toSet)
    val pairs = SparkEntry.queries("dd03_minhash_lsh")(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      val (sa, sb) = (got(a)._2, got(b)._2)
      assert(sa == sb || sa == "quarantine" || sb == "quarantine",
        s"pair ($a,$b) straddles $sa/$sb under scrambled arrival")
    }
    spark.catalog.clearCache()
  }

  test("ledger compaction changes nothing the assigner can see") {
    import spark.implicits._
    val all = corpus().orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val batches = all.grouped((all.length + 2) / 3).toSeq
    // twin stores: sp6 compacts between batches (plus a deliberately
    // MIXED high-water: only the band ledger after batch 0), sp7 never
    reset("sp6"); reset("sp7")
    batches.zipWithIndex.foreach { case (b, i) =>
      val df = b.toSeq.toDF("doc_id", "text")
      SplitAssignment.assignBatch(df, i.toLong, "sp6")
      if (i == 0) SplitAssignment.compactOne(spark, "sp6", "bands", "key")
      if (i == 1) SplitAssignment.compact(spark, "sp6")
      SplitAssignment.assignBatch(df, i.toLong, "sp7")
    }
    assert(rows("sp6") == rows("sp7"),
      "compaction (even mid-stream, even per-table) must be invisible")
    // folded partitions actually left the partitioned ledger
    assert(spark.table("sp6_bandsc").count() > 0)
    spark.catalog.clearCache()
  }

  test("auto-fold cadence bounds the probe tail; assignments unchanged") {
    import spark.implicits._
    val all = corpus().orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val batches = all.grouped((all.length + 3) / 4).toSeq
    // twin stores: spa folds automatically once any ledger tail
    // exceeds ONE committed partition; spb never folds
    reset("spa"); reset("spb")
    batches.zipWithIndex.foreach { case (b, i) =>
      val df = b.toSeq.toDF("doc_id", "text")
      SplitAssignment.assignBatch(df, i.toLong, "spa", autoCompactParts = 1)
      SplitAssignment.assignBatch(df, i.toLong, "spb",
        autoCompactParts = Int.MaxValue)
    }
    assert(rows("spa") == rows("spb"),
      "auto-folding mid-stream must be invisible to assignments")
    // the fold actually fired: compact tables exist and the live tail
    // is bounded by the threshold+1 (the batch that tripped it plus
    // the one written after the fold)
    assert(spark.catalog.tableExists("spa_bandsc"),
      "auto-fold never created the bands compact table")
    val tail = spark.table("spa_bands").select("batch_id").distinct().count()
    assert(tail <= 2, s"auto-fold left an unbounded tail ($tail partitions)")
    // the never-folding twin kept every partition live (the contrast)
    assert(spark.table("spb_bands").select("batch_id").distinct()
      .count() == batches.size.toLong)
    spark.catalog.clearCache()
  }

  test("a crashed compact swap is adopted from staging at the next probe") {
    import spark.implicits._
    val all = corpus().orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val (b0, b1) = all.splitAt(all.length / 2)
    reset("sp8"); reset("sp9")
    SplitAssignment.assignBatch(b0.toSeq.toDF("doc_id", "text"), 0L, "sp8")
    SplitAssignment.compact(spark, "sp8")
    // simulate the crash between DROP and RENAME: the compact table is
    // gone, its fully-written staging twin remains
    spark.sql("ALTER TABLE sp8_bandsc RENAME TO sp8_bandsc_staging")
    SplitAssignment.assignBatch(b1.toSeq.toDF("doc_id", "text"), 1L, "sp8")
    assert(spark.catalog.tableExists("sp8_bandsc"),
      "the staged compact table must be adopted")
    SplitAssignment.assignBatch(b0.toSeq.toDF("doc_id", "text"), 0L, "sp9")
    SplitAssignment.assignBatch(b1.toSeq.toDF("doc_id", "text"), 1L, "sp9")
    assert(rows("sp8") == rows("sp9"))
    spark.catalog.clearCache()
  }

  test("crash-window replay overwrites a partial partition, never adopts") {
    reset("sp4")
    import spark.implicits._
    val all = corpus().orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val (b0, b1) = all.splitAt(all.length / 2)
    SplitAssignment.assignBatch(b0.toSeq.toDF("doc_id", "text"), 0L, "sp4")
    // simulate batch 1 crashing mid-commit: a partial (wrong) row-set
    // landed in its splits partition, no marker
    // grp = -7 can never be a real component root (roots are doc ids)
    Seq((b1.head._1, -7L, "train", 1L))
      .toDF("doc_id", "grp", "split", "batch_id")
      .write.mode("append").insertInto("sp4_splits")
    assert(!rows("sp4").contains(b1.head._1),
      "uncommitted partial rows must not serve")
    SplitAssignment.assignBatch(b1.toSeq.toDF("doc_id", "text"), 1L, "sp4")
    val part = spark.table("sp4_splits")
      .filter(col("batch_id") === 1L && col("doc_id") === b1.head._1)
      .collect()
    assert(part.length == 1, s"partial row must be overwritten, got ${part.length}")
    assert(part.head.getAs[Long]("grp") != -7L,
      "the partial row must be replaced by the deterministic recompute")
    assert(rows("sp4").keySet == all.map(_._1).toSet)
    spark.catalog.clearCache()
  }
}
