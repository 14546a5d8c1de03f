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
      "mm05_blob_neardup_allpairs" -> "mm04_blob_neardup")
    assert(scaleTwin.keySet == Bench.exclude,
      "exclude set and twin map out of lockstep — update both")
    scaleTwin.foreach { case (excluded, scale) =>
      assert(SparkEntry.queries.contains(scale),
        s"$excluded's scale twin $scale left the registry")
      assert(!Bench.exclude(scale),
        s"$excluded's scale twin $scale is itself excluded")
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
