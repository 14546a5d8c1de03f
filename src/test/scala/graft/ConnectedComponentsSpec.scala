package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ConnectedComponents

/** The dedup-collapse operator behind dd06: min-id label propagation
  * must find TRUE components (transitive closure), not just the pairs
  * that happened to share an LSH band.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def labelsOf(pairs: Seq[(Long, Long)],
                       maxRounds: Int = 20): Map[Long, Long] =
    ConnectedComponents
      .minLabel(pairs.toDF("a", "b"), maxRounds)
      .as[(Long, Long)].collect().toMap

  test("chain collapses transitively to the min id") {
    // 5 ~ 4 ~ 3 ~ 2 ~ 1 but no direct (5, 1) edge — diameter 4
    val m = labelsOf(Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint components keep distinct roots; cycles terminate") {
    val m = labelsOf(Seq(
      (7L, 9L), (9L, 8L), (8L, 7L), // a cycle
      (20L, 30L)))                  // a separate component
    assert(m == Map(7L -> 7L, 8L -> 7L, 9L -> 7L, 20L -> 20L, 30L -> 20L))
  }

  test("edge orientation does not matter") {
    val m = labelsOf(Seq((1L, 10L), (11L, 10L))) // min id on the 'a' side once
    assert(m == Map(1L -> 1L, 10L -> 1L, 11L -> 1L))
  }

  test("non-convergence fails loudly instead of mislabeling") {
    // diameter 3 cannot converge in 1 round
    val e = intercept[IllegalArgumentException] {
      labelsOf(Seq((4L, 3L), (3L, 2L), (2L, 1L)), maxRounds = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("adversarial 1k-node path graph converges within the round cap") {
    // worst case for label propagation: one component of diameter 999.
    // Pointer jumping must close it in O(log n) rounds, well under 20.
    import org.apache.spark.sql.functions.col
    val edges = spark.range(1, 1000).toDF("a").withColumn("b", col("a") + 1)
    val m = ConnectedComponents.minLabel(edges, 20)
      .as[(Long, Long)].collect().toMap
    assert(m.size == 1000 && m.values.forall(_ == 1L))
  }

  // ---- starContract: same contract, diameter-independent rounds ----

  private def starLabelsOf(pairs: Seq[(Long, Long)],
                           maxRounds: Int = 25): Map[Long, Long] =
    ConnectedComponents
      .starContract(pairs.toDF("a", "b"), maxRounds)
      .as[(Long, Long)].collect().toMap

  test("starContract matches minLabel on chains, cycles, orientation") {
    val cases = Seq(
      Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L)),
      Seq((7L, 9L), (9L, 8L), (8L, 7L), (20L, 30L)),
      Seq((1L, 10L), (11L, 10L)))
    cases.foreach { edges =>
      assert(starLabelsOf(edges) == labelsOf(edges), s"edges=$edges")
    }
  }

  test("starContract labels self-loop-only nodes like minLabel") {
    // node 42 appears ONLY as the self-loop (42, 42): canon() drops the
    // edge, but the (node, root) contract still owes it a self-label
    val edges = Seq((1L, 2L), (42L, 42L))
    assert(starLabelsOf(edges) == labelsOf(edges))
    assert(starLabelsOf(edges)(42L) == 42L)
    // degenerate corpus: nothing but self-loops
    assert(starLabelsOf(Seq((7L, 7L), (9L, 9L))) ==
      Map(7L -> 7L, 9L -> 9L))
  }

  test("starContract agrees with minLabel on a random graph") {
    // deterministic seed: the spec must not flake
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (x, y) => x != y }
    assert(starLabelsOf(edges) == labelsOf(edges))
  }

  test("starContract closes a 1k-node path in O(log n) rounds") {
    import org.apache.spark.sql.functions.col
    val edges = spark.range(1, 1000).toDF("a").withColumn("b", col("a") + 1)
    val m = ConnectedComponents.starContract(edges, 25)
      .as[(Long, Long)].collect().toMap
    assert(m.size == 1000 && m.values.forall(_ == 1L))
  }

  test("starContract fails loudly when capped below convergence") {
    val e = intercept[IllegalArgumentException] {
      starLabelsOf(Seq((4L, 3L), (3L, 2L), (2L, 1L), (5L, 4L), (6L, 5L),
        (7L, 6L), (8L, 7L)), maxRounds = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }
}
