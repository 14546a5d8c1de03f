package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-registry plan audit: NO registered query may plan a
  * CartesianProduct, and a BroadcastNestedLoopJoin is allowed only on
  * the whitelist below — every entry is a 1-row scalar broadcast
  * (corpus-size constants, funnel stage counts, temperature n_min) or
  * a BOUNDED broadcast probe set (sm-family probes, =!= self-pairing),
  * none of which grow quadratically with the corpus. A new query that
  * trips this either needs an equi-join reshape or a conscious,
  * documented whitelist entry — the per-query PlanSpec guards catch
  * specific shapes; this net catches the query nobody guarded.
  */
class GlobalPlanAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  // 1-row scalar broadcast (crossJoin with a single-row aggregate) or
  // bounded broadcast probe sets — reviewed individually
  private val bnljAllowed = Set(
    "tx04_tfidf",             // 1-row corpus doc-count scalar
    "tx17_ranked_search",     // 1-row corpus stats + bounded query terms
    "tx19_ranked_from_index", // same, served from the artifact
    "tx21_bm25",              // 1-row avgdl/N stats
    "tx22_bm25_from_index",   // same, served from the artifact
    "tx23_collocations",      // 1-row total-bigram scalar
    "tx24_keywords",          // 1-row corpus doc-count scalar
    "tx30_salted_join",       // bounded 16-row salt replication frame
    // pl15/pl16/pl47 left the list in round 18: temperatureRates'
    // n_min scalar crossJoin became an unpartitioned window over the
    // ≤|langs|-row rates aggregate (one counting pass) — no BNLJ
    // remains; the window's SinglePartition exchange is whitelisted
    // in the bounded-frame audit below instead
    "pl23_quality_classifier",// 1-row (n_good, n_bad) class-prior scalar
    "pl24_classifier_topq",   // composes pl23's class-prior scalar
    "tx36_kl_drift",          // 1-row corpus token-total scalar
    "tx20_heavy_hitters",     // 1-row token-total scalar (MG bound check)
    "pl36_psi_drift",         // 1-row corpus-total + bucket-count scalars
    "pl27_importance_resample",// 1-row (nt, nc, v) smoothing-total scalar
    "q52_funnel",             // three 1-row stage-count aggregates
    "sm01_cosine_topk",       // bounded broadcast probes, =!= pairing
    "sm16_prefix_rerank",     // same bounded probes, stage-1 =!= pairing
    "sm05_pq_topk",           // bounded probe LUT broadcast
    "sm08_sq_topk",           // bounded probe + 64-row stats broadcast
    "sm17_sq_rerank",         // same bounded probes, stage-1 =!= pairing
    "sm24_binary_rerank",     // same bounded probes over packed bit words
    "sm18_refined_from_store",// 1-row SQ-stats broadcast (serve path)
    "sm19_ivf_recall",        // exact-baseline side = sm01's bounded probes
    "sm22_nprobe_profile",    // same exact-baseline bounded-probe pairing
    "sm26_auto_nprobe",       // shares sm22's stages (same bounded pairing)
    "mm08_crossmodal_topk",   // serveTopK's bounded probe broadcast (sm18 shape)
    "mm09_hard_negatives",    // same serve path, band-filtered (mm08 shape)
    "sm21_diverse_topk",      // sm01's bounded probes; pairs shortlist-bounded
    "sm12_hybrid_rrf",        // 1-row corpus doc-count scalar (tx04 shape)
    "sm13_hybrid_rrf_from_index", // same scalar, from the stats artifact
    "pl30_bootstrap",         // bounded 16-row replicate fan-out frame
    "pl38_token_budget",      // 1-row total + 1-row top-up-count scalars
    "pl41_epoch_waterfill",   // 1-row budget/cutoff/leftover scalars + |caps|-row lattice
    "pl43_pseudonymize",      // 1-row referential-integrity attestation scalar
    "sm27_filtered_from_store",// 1-row SQ-stats broadcast (sm18's serve path)
    "mm10_dhash_neardup")     // 1-row adaptive-band-width scalar (bits(n)+4)
    // dd04/dd13 left the list in round 17: their 15-bit segments ARE
    // the cap, so the adaptive scalar bought no pruning at any n and
    // was reverted to full-width keys (round-16 ADVICE)

  test("no query plans a cartesian; nested-loop joins only on whitelist") {
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.foreach { case (name, fn) =>
      val p = fn(spark, dir).queryExecution.executedPlan.toString
      if (p.contains("CartesianProduct"))
        offenders += s"$name: CartesianProduct"
      if (p.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name))
        offenders += s"$name: unwhitelisted BroadcastNestedLoopJoin"
      spark.catalog.clearCache()
    }
    assert(offenders.isEmpty,
      "quadratic-risk plans found:\n" + offenders.mkString("\n"))
  }

  test("single-partition exchanges only carry bounded frames") {
    // The driver-side-bottleneck class has per-query guards; this is
    // the registry-wide net. An `Exchange SinglePartition` is BENIGN
    // when fed by a partial/partial-merge aggregate (only O(state)
    // buffers cross the wire — the standard scalar-aggregate shape,
    // e.g. tx04's doc-count, q52's stage counts, tx20's sketch maps).
    // Anything else funnels FULL ROWS through one task and must be a
    // reviewed whitelist entry:
    //   pl07_dataset_card — the exchanged frame is the (lang, source)
    //   AGGREGATE result feeding the doc_share total window: group
    //   cardinality (#langs × #sources), never corpus rows.
    // (tx27's post-limit rank window plans a CollectLimit, not a
    // single-partition exchange, so it needs no entry; the golden
    // coalesce(1) sink lives outside the registry in writeIndex.)
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Partial, PartialMerge}

    //   pl38_token_budget — the global remainder-ranking window runs
    //   over the per-SOURCE aggregate (≤ |sources| rows — group
    //   cardinality, never corpus rows), the same class as pl07.
    //   pl41_epoch_waterfill — the cap lattice and remainder-ranking
    //   windows run over per-SOURCE / per-CAP aggregates (≤ |sources|
    //   rows) — the pl38 class.
    //   pl15/pl16/pl47 — temperatureRates' n_min window (round 18: the
    //   scalar crossJoin became min() over an unpartitioned window)
    //   runs over the per-LANG rates aggregate (≤ |langs| rows — group
    //   cardinality), the same class as pl07.
    val fullRowAllowed = Set("pl07_dataset_card", "pl38_token_budget",
      "pl41_epoch_waterfill", "pl15_temperature_sample",
      "pl16_curation_funnel", "pl47_funnel_fate")

    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    val tripped = scala.collection.mutable.Set[String]()
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan
      val root = plan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val fullRowCarriers = root.collect {
        case e: ShuffleExchangeExec
            if e.outputPartitioning == SinglePartition => e.child
      }.filter {
        case agg: BaseAggregateExec =>
          !agg.aggregateExpressions.forall(a =>
            a.mode == Partial || a.mode == PartialMerge)
        case _ => true
      }
      if (fullRowCarriers.nonEmpty) {
        tripped += name
        if (!fullRowAllowed(name))
          offenders += s"$name: Exchange SinglePartition fed by " +
            fullRowCarriers.map(_.nodeName).mkString(", ")
      }
      spark.catalog.clearCache()
    }
    assert(offenders.isEmpty,
      "full rows funneled through one task:\n" + offenders.mkString("\n"))
    val dead = fullRowAllowed -- tripped
    assert(dead.isEmpty, s"single-partition whitelist entries no longer needed: $dead")
  }

  test("whitelist carries no dead entries") {
    // a stale entry means a query was reshaped (good) or renamed —
    // either way the whitelist must shrink with it
    val withBnlj = SparkEntry.queries.keySet.filter { name =>
      val p = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      spark.catalog.clearCache()
      p.contains("BroadcastNestedLoopJoin")
    }
    val dead = bnljAllowed -- withBnlj
    assert(dead.isEmpty, s"whitelist entries no longer needed: $dead")
  }
}
