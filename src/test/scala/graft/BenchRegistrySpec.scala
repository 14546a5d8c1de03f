package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-consistency nets for the bench harness: the exclude set
  * must reference live registry names (a rename would silently
  * un-exclude a documented-quadratic oracle twin and melt the 10x
  * sweep), and every excluded oracle twin must still have its
  * MEASURED scale-path twin registered — excluding the quadratic
  * shape is only honest while the linear shape it oracles for exists
  * and is benched.
  */
class BenchRegistrySpec extends AnyFunSuite {

  test("bench exclude set carries no stale names") {
    val dead = Bench.exclude -- SparkEntry.queries.keySet
    assert(dead.isEmpty, s"excluded names not in the registry: $dead")
  }

  test("steady-state history exists, parses, and covers the round SF") {
    // tools/bench_steady.json is what makes the JSON line's
    // steady/contended self-labels live; round 11 shipped the labeling
    // code but never committed the history, leaving it silently inert.
    // This spec makes that failure loud at `sbt test` time.
    val path = java.nio.file.Paths.get("tools", "bench_steady.json")
    assert(java.nio.file.Files.exists(path),
      "tools/bench_steady.json missing — run Bench once at low load " +
        "(loadavg < 1.5 at start) and commit the file")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(java.nio.file.Files.readAllBytes(path))
    val sf = root.get("sf0.1")
    assert(sf != null && sf.size() > 100,
      s"steady history has no usable sf0.1 section (got ${Option(sf).map(_.size())})")
  }

  test("every excluded oracle twin has a measured scale-path twin") {
    // exclusion rationale, made executable: each test-SF-only shape
    // exists to oracle a banded/survivors-first scale path — that
    // path must be registered AND measured
    val scaleTwin = Map(
      "dd02_ngram_jaccard" -> "dd03_minhash_lsh",
      "dd13_simhash_allpairs" -> "dd04_simhash",
      "mm05_blob_neardup_allpairs" -> "mm04_blob_neardup",
      "sm23_hyperplane_allpairs" -> "sm02_ann_hyperplane",
      "dd23_embedding_neardup_raw" -> "dd07_embedding_neardup")
    assert(scaleTwin.keySet == Bench.exclude,
      "exclude set and twin map out of lockstep — update both")
    scaleTwin.foreach { case (excluded, scale) =>
      assert(SparkEntry.queries.contains(scale),
        s"$excluded's scale twin $scale left the registry")
      assert(!Bench.exclude(scale),
        s"$excluded's scale twin $scale is itself excluded")
    }
  }

  test("excluded twins are plan-fingerprinted (coverage, round-17 #6)") {
    // the twins never run in the timed passes, so without fingerprint
    // coverage a refactor reintroducing a BNLJ in one would have no
    // alarm anywhere — the selection must carry benched AND excluded
    val fp = Bench.fingerprintSelection(SparkEntry.all, Bench.exclude)
      .map(_.name).toSet
    val missing = Bench.exclude -- fp
    assert(missing.isEmpty,
      s"bench-excluded twins not plan-fingerprinted: $missing")
    // ...while a non-exclude skip (index-build failure) stays skipped:
    // fingerprinting tx18/tx19 would rebuild the broken artifact
    val fpSkip = Bench.fingerprintSelection(SparkEntry.all,
      Bench.exclude + "tx18_phrase_from_index").map(_.name).toSet
    assert(!fpSkip("tx18_phrase_from_index"),
      "an index-build-failure skip must not be fingerprinted")
    assert((Bench.exclude -- fpSkip).isEmpty)
  }

  test("every excluded query still runs in the correctness tier") {
    // bench exclusion must never become correctness exclusion: each
    // oracle-only twin needs its oracleSql entry so the driver's
    // CORRECTNESS gate keeps hash-checking it — an excluded query
    // without an oracle would silently drop out of BOTH tiers
    Bench.exclude.foreach { n =>
      assert(SparkEntry.oracleSql.contains(n),
        s"excluded query $n has no oracle — it would verify nowhere")
    }
  }
}

/** Executable contract for Bench.foldSteady — the rules that keep the
  * committed steady history honest: min-ratchet on plausible timings,
  * quarantine-then-confirm on implausible speedups, carry-through for
  * queries a run didn't measure.
  */
class BenchSteadySpec extends org.scalatest.funsuite.AnyFunSuite {
  private def fold(s: Map[String, Double], p: Map[String, Double],
                   o: Map[String, Double]) = Bench.foldSteady(s, p, o)

  test("plausible faster timing ratchets steady down; slower does not") {
    val (m, pend) = fold(Map("q" -> 2.0, "r" -> 1.0), Map.empty,
      Map("q" -> 1.5, "r" -> 4.0))
    assert(m == Map("q" -> 1.5, "r" -> 1.0) && pend.isEmpty)
  }

  test("a >3x speedup parks in pending and does NOT fold") {
    val (m, pend) = fold(Map("q" -> 9.0), Map.empty, Map("q" -> 1.0))
    assert(m == Map("q" -> 9.0),
      "implausible speedup must not poison the baseline on first sight")
    assert(pend == Map("q" -> 1.0))
  }

  test("a second consecutive low-load run within 1.5x confirms the speedup") {
    val (m, pend) = fold(Map("q" -> 9.0), Map("q" -> 1.0), Map("q" -> 1.2))
    assert(m == Map("q" -> 1.2), "confirmed speedup must fold")
    assert(pend.isEmpty)
  }

  test("a non-matching second observation re-parks instead of folding") {
    // first run saw 1.0s, second sees 2.5s (>1.5x apart): neither value
    // is trustworthy yet — steady stands, pending resets to the new one
    val (m, pend) = fold(Map("q" -> 9.0), Map("q" -> 1.0), Map("q" -> 2.5))
    assert(m == Map("q" -> 9.0))
    assert(pend == Map("q" -> 2.5))
  }

  test("unmeasured queries carry through; new queries enter at observed") {
    val (m, pend) = fold(Map("old" -> 3.0), Map.empty, Map("new" -> 0.7))
    assert(m == Map("old" -> 3.0, "new" -> 0.7) && pend.isEmpty)
  }
}

/** Executable contract for the regression window (Bench.regressedOf /
  * foldRecent): the steady min can only ratchet down, so a genuine
  * slowdown used to surface only as a perpetual "contended" label —
  * indistinguishable from machine load. The recent-median rule must
  * label a REPRODUCED slowdown regressed while staying quiet on a
  * one-run burst, a fresh history, and sub-second jitter.
  */
class BenchRegressionSpec extends org.scalatest.funsuite.AnyFunSuite {
  private val steady = Map("q" -> 2.0, "r" -> 1.0)

  test("a slowdown reproduced across the full window labels regressed") {
    // q genuinely went 2.0s -> 4.0s: three consecutive low-load runs
    // all see ~4s; r stays at its steady speed
    val recent = Seq(
      Map("q" -> 4.1, "r" -> 1.0),
      Map("q" -> 3.9, "r" -> 1.1),
      Map("q" -> 4.0, "r" -> 0.9))
    assert(Bench.regressedOf(steady, recent) == Seq("q"),
      "a reproduced slowdown must be labeled regressed, not contended")
  }

  test("a one-run burst cannot move the median: not regressed") {
    val recent = Seq(
      Map("q" -> 9.0), // the burst
      Map("q" -> 2.1),
      Map("q" -> 2.0))
    assert(Bench.regressedOf(steady, recent).isEmpty,
      "a single contended run must not alarm")
  }

  test("fewer than a full window of observations stays quiet") {
    val recent = Seq(Map("q" -> 9.0), Map("q" -> 9.0))
    assert(Bench.regressedOf(steady, recent).isEmpty,
      "a fresh history must not alarm before the window fills")
  }

  test("sub-second absolute jitter is not a regression") {
    // 1.0s -> 1.4s median is >1.5x? no; but 0.3s -> 0.7s IS >1.5x while
    // only 0.4s over — the absolute floor keeps it quiet
    val tiny = Map("s" -> 0.3)
    val recent = Seq(Map("s" -> 0.7), Map("s" -> 0.7), Map("s" -> 0.7))
    assert(Bench.regressedOf(tiny, recent).isEmpty,
      "sub-second jitter must not alarm")
  }

  test("foldRecent rotates newest-first and bounds the window") {
    val r0 = Seq.empty[Map[String, Double]]
    val r1 = Bench.foldRecent(r0, Map("q" -> 1.0))
    val r2 = Bench.foldRecent(r1, Map("q" -> 2.0))
    val r3 = Bench.foldRecent(r2, Map("q" -> 3.0))
    val r4 = Bench.foldRecent(r3, Map("q" -> 4.0))
    assert(r4.map(_("q")) == Seq(4.0, 3.0, 2.0),
      "window must keep the newest RecentKeep observations, newest first")
  }

  test("median is the middle of odd, mean-of-middles of even") {
    assert(Bench.medianOf(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(Bench.medianOf(Seq(4.0, 1.0)) == 2.5)
  }
}

/** Executable contract for the plan-fingerprint regression ledger
  * (round-16 verdict missing #1): a canonicalized physical-plan hash
  * per benched query, stable across constructions of the same code
  * (exprIds differ per construction — the canonicalizer must erase
  * them), so the regression alarm splits into `plan_changed` (hash
  * moved — always code, fires with or without a timing regression)
  * and `time_only` (hash identical — the machine-epoch class). */
class BenchPlanHashSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("plan hash is stable across two constructions of the same query") {
    // two constructions allocate fresh exprIds — the raw plan strings
    // differ, the canonical hashes must not (same binary, same data)
    for (q <- Seq("q01_pricing_summary", "q03_broadcast_join", "tx05_inverted_index")) {
      spark.catalog.clearCache()
      val a = SparkEntry.queries(q)(spark, dir)
      val h1 = Bench.planHash(a)
      spark.catalog.clearCache()
      val b = SparkEntry.queries(q)(spark, dir)
      val h2 = Bench.planHash(b)
      assert(h1 == h2, s"$q: plan hash unstable across constructions")
    }
  }

  test("plan hash survives the JVM-global lambda-variable counter") {
    // higher-order functions name their lambda variables off a global
    // counter (`x_1`, `x_14`, ...): constructing OTHER lambda-bearing
    // plans between two constructions of the same query must not move
    // its hash (the round-17 flap: 40+ queries alarmed plan_changed
    // between two same-binary bench runs)
    spark.catalog.clearCache()
    val h1 = Bench.planHash(SparkEntry.queries("q35_array_hof")(spark, dir))
    // burn a batch of lambda ids
    (1 to 3).foreach { _ =>
      SparkEntry.queries("q35_array_hof")(spark, dir).queryExecution.executedPlan
      SparkEntry.queries("tx07_lang_id")(spark, dir).queryExecution.executedPlan
    }
    spark.catalog.clearCache()
    val h2 = Bench.planHash(SparkEntry.queries("q35_array_hof")(spark, dir))
    assert(h1 == h2, "lambda-counter drift moved the plan hash")
  }

  test("canonicalizer erases exprIds but keeps the operator tree") {
    val raw = SparkEntry.queries("q03_broadcast_join")(spark, dir)
      .queryExecution.executedPlan.toString
    val canon = Bench.canonicalPlan(raw)
    assert(!"#\\d+".r.findFirstIn(canon).isDefined,
      "an exprId survived canonicalization")
    assert(canon.contains("BroadcastHashJoin"),
      "canonicalization erased the join strategy — the hash would " +
        "miss a real plan change")
  }

  test("a deliberate plan change fires plan_changed, regression or not") {
    // different queries stand in for before/after of a code change:
    // their physical plans differ, so their hashes must differ
    val h1 = Bench.planHash(SparkEntry.queries("q01_pricing_summary")(spark, dir))
    val h2 = Bench.planHash(SparkEntry.queries("q02_filter_project")(spark, dir))
    assert(h1 != h2, "distinct plans hashed equal")
    // no timing regression at all — the hash move alone must fire
    val (changed, timeOnly) = Bench.splitAlarms(
      Seq.empty, Map("q" -> h1), Map("q" -> h2))
    assert(changed == Seq("q") && timeOnly.isEmpty)
  }

  test("a timing-only perturbation stays time_only; unknown hashes too") {
    val (c1, t1) = Bench.splitAlarms(
      Seq("q"), Map("q" -> "h"), Map("q" -> "h"))
    assert(c1.isEmpty && t1 == Seq("q"),
      "identical plan + slow median must classify time_only")
    // no recorded baseline yet: nothing to compare — not plan_changed
    val (c2, t2) = Bench.splitAlarms(Seq("q"), Map.empty, Map("q" -> "h"))
    assert(c2.isEmpty && t2 == Seq("q"))
    // a regressed query whose plan ALSO moved is plan_changed only
    val (c3, t3) = Bench.splitAlarms(
      Seq("q"), Map("q" -> "old"), Map("q" -> "new"))
    assert(c3 == Seq("q") && t3.isEmpty)
  }

  test("plan text dump rotates the previous run for diffing") {
    val base = java.nio.file.Files.createTempDirectory("graft-bp")
    val dir = base.resolve("bench_plans")
    Bench.writePlanTexts(dir, Map("q" -> "PLAN A"))
    Bench.writePlanTexts(dir, Map("q" -> "PLAN B", "r" -> "PLAN R"))
    val prev = base.resolve("bench_plans_prev")
    assert(new String(java.nio.file.Files.readAllBytes(
      prev.resolve("q.txt")), "UTF-8") == "PLAN A",
      "previous run's text lost — a plan_changed alarm has nothing to diff")
    assert(new String(java.nio.file.Files.readAllBytes(
      dir.resolve("q.txt")), "UTF-8") == "PLAN B")
    // a third rotation replaces prev wholesale (no stale files linger)
    Bench.writePlanTexts(dir, Map("q" -> "PLAN C"))
    assert(new String(java.nio.file.Files.readAllBytes(
      prev.resolve("q.txt")), "UTF-8") == "PLAN B")
    assert(java.nio.file.Files.exists(prev.resolve("r.txt")),
      "rotation must carry the whole previous dir")
  }

  test("mergeAttempts keeps the min over successful attempts per query") {
    val a = Seq("x" -> (2.0, true), "y" -> (5.0, false), "z" -> (1.0, true))
    val b = Seq("x" -> (3.0, true), "y" -> (4.0, true), "z" -> (9.0, false))
    val m = Bench.mergeAttempts(a, b).toMap
    assert(m("x") == (2.0, true), "min over two successes")
    assert(m("y") == (4.0, true), "a retry success rescues a failed attempt")
    assert(m("z") == (1.0, true), "a failed retry cannot erase a success")
    val allFail = Bench.mergeAttempts(
      Seq("w" -> (7.0, false)), Seq("w" -> (6.0, false))).toMap
    assert(allFail("w") == (6.0, false), "two failures stay failed, min time")
  }
}
