package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{HeavyHitters, HHEntry}

/** Pins the Misra–Gries guarantees the sketch's scale story rests on:
  * for stream length n and sketch size k, every item with frequency
  * > n/(k+1) is reported, and every estimate sits in
  * [true − n/(k+1), true]. Contents are order-dependent; the BOUNDS
  * are not — this is the q23-style correctness signal for an operator
  * that can't have a cross-engine oracle.
  */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def checkBounds(est: Seq[HHEntry], exact: Map[String, Long],
                          n: Long, k: Int): Unit = {
    val slack = n / (k + 1)
    val byItem = est.map(e => e.item -> e.est).toMap
    assert(est.size <= k, "sketch exceeded its size bound")
    exact.foreach { case (item, c) =>
      if (c > slack)
        assert(byItem.contains(item),
          s"heavy item '$item' (freq $c > n/(k+1) = $slack) missing")
    }
    byItem.foreach { case (item, e) =>
      val c = exact.getOrElse(item, 0L)
      assert(e <= c, s"'$item' overestimated: est $e > true $c")
      assert(e >= c - slack, s"'$item' est $e below true $c - $slack")
    }
  }

  test("sketch over the corpus token stream honors the MG bounds") {
    import spark.implicits._
    val k = 20
    val toks = tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(explode(split(lower(col("text")), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .select(col("token").as[String])
    val exact = toks.groupBy("token").count()
      .as[(String, Long)].collect().toMap
    val n = exact.values.sum
    val est = toks.select(new HeavyHitters(k).toColumn.name("sketch"))
      .head()
    checkBounds(est, exact, n, k)
  }

  test("hand-built merge keeps the bounds (mergeable-summaries step)") {
    val k = 3
    val hh = new HeavyHitters(k)
    // two partitions with different local skew
    val p1 = "a a a a b b c d e f".split(" ")
    val p2 = "a a g g g g h b b b".split(" ")
    val s1 = p1.foldLeft(hh.zero)(hh.reduce)
    val s2 = p2.foldLeft(hh.zero)(hh.reduce)
    val merged = hh.finish(hh.merge(s1, s2))
    val exact = (p1 ++ p2).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    checkBounds(merged, exact, p1.length + p2.length, k)
    // 'a' (6 of 20 > 20/4 = 5) must be present
    assert(merged.exists(_.item == "a"))
  }
}
