package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Theta-sketch set algebra (Datasketches `theta` — the same library
  * Spark's own HLL functions ship with): where HLL supports only
  * UNION (q61/q62's rollups) and intersections must go through
  * inclusion-exclusion with compounded error (q64), a Theta sketch is
  * a uniform HASH SAMPLE of the set (the k smallest hashes), so
  * INTERSECTION and DIFFERENCE are first-class operations with their
  * own error bounds — the sketch family for retention/overlap/
  * audience questions at 100 TB. Below the nominal-entry count the
  * sketch holds every hash and set ops are EXACT; past it the sample
  * kicks in with RSE ≈ 1/√k on unions (intersections degrade with
  * 1/Jaccard — the reason q65's attested envelope is still wider than
  * the union bound).
  *
  * Build shape: one `mapGroups` pass per group — the sketch is the
  * bounded per-group state (≤ 2^lgK hashes however many rows stream
  * through), exactly the `KeyValueGroupedDataset` custom-state recipe;
  * per-group results are (keys × weeks) tiny binary rows. Determinism:
  * in EXACT mode (≤ 2^lgK distinct values per group) the sketch holds
  * every hash under the library's fixed default seed, so the result is
  * independent of row order and partitioning — the regime the
  * hash-compared oracle path relies on, and `ThetaSketchSpec` pins.
  * ABOVE nominal entries a QuickSelect sketch's retained set and theta
  * DO depend on insertion/merge order, so estimates near the envelope
  * edge can vary run-to-run by a fraction of the RSE — q65's attested
  * envelope is sized for estimate variance (boolean in-envelope
  * columns, never raw estimates, cross the oracle hash).
  */
object ThetaSketch {

  /** Default log2 nominal entries: 4096 retained hashes ≈ 1.6% union
    * RSE — the q61 lgK=12 accuracy point. Below 4096 distinct values
    * the sketch is in exact mode and every set op is exact. */
  val DefaultLgK = 12

  /** Per-(event_type, week) Theta sketches of `user_id`:
    * (event_type, week, sk BINARY). TWO-LEVEL build — the map-side-
    * combine shape a plain mapGroups would lose: each input partition
    * reduces to its own (keys × weeks) sketch rows first
    * (mapPartitions, bounded per-task state: keys × weeks × ~2^lgK
    * hashes), so the ONLY thing that shuffles is sketch rows, never
    * the event stream — the same property hll_sketch_agg gets from
    * partial aggregation for free; the merge level unions per group
    * (Theta union = keep the k smallest of the combined hash sample,
    * associative/commutative/idempotent, so any partitioning serves
    * the same summary). */
  def weeklyUserSketches(events: DataFrame,
                         lgK: Int = DefaultLgK): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val partial = events
      .select(col("event_type"),
        date_trunc("WEEK", col("ts")).as("week"), col("user_id"))
      .as[(String, java.sql.Timestamp, Long)]
      .mapPartitions { rows =>
        val m = scala.collection.mutable.Map
          .empty[(String, java.sql.Timestamp),
            org.apache.datasketches.theta.UpdateSketch]
        rows.foreach { case (t, w, u) =>
          m.getOrElseUpdate((t, w),
            org.apache.datasketches.theta.UpdateSketch.builder()
              .setLogNominalEntries(lgK).build())
            .update(u)
        }
        m.iterator.map { case ((t, w), sk) =>
          (t, w, sk.compact().toByteArray) }
      }
    partial
      .groupByKey(r => (r._1, r._2))
      .mapGroups { (key: (String, java.sql.Timestamp),
                    rows: Iterator[(String, java.sql.Timestamp,
                      Array[Byte])]) =>
        val u = org.apache.datasketches.theta.SetOperation.builder()
          .setLogNominalEntries(lgK).buildUnion()
        rows.foreach { r =>
          u.union(org.apache.datasketches.theta.Sketches.wrapSketch(
            org.apache.datasketches.memory.Memory.wrap(r._3)))
        }
        (key._1, key._2, u.getResult.toByteArray)
      }
      .toDF("event_type", "week", "sk")
  }

  /** Intersection estimate of two serialized compact sketches —
    * runs executor-side over (keys × weeks)-cardinality pair rows. */
  private def intersectEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val sa = org.apache.datasketches.theta.Sketches.wrapSketch(
      org.apache.datasketches.memory.Memory.wrap(a))
    val sb = org.apache.datasketches.theta.Sketches.wrapSketch(
      org.apache.datasketches.memory.Memory.wrap(b))
    org.apache.datasketches.theta.SetOperation.builder()
      .buildIntersection().intersect(sa, sb).getEstimate
  }

  /** Adjacent-week retention estimates from the weekly sketches:
    * (event_type, week, est_retained) — |users(w) ∩ users(w+1)| as a
    * NATIVE sketch intersection (q64's inclusion-exclusion twin with
    * one estimate instead of three). Pairing is an equi-join on a
    * materialized next-week key. */
  def weeklyRetention(events: DataFrame,
                      lgK: Int = DefaultLgK): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val wk = weeklyUserSketches(events, lgK)
    val a = wk.select(col("event_type"), col("week"), col("sk"),
      (col("week") + expr("INTERVAL 7 DAYS")).as("next_week"))
    val b = wk.select(col("event_type").as("b_type"),
      col("week").as("b_week"), col("sk").as("b_sk"))
    a.join(b, col("event_type") === col("b_type") &&
        col("next_week") === col("b_week"))
      .select(col("event_type"), col("week"), col("sk"), col("b_sk"))
      .as[(String, java.sql.Timestamp, Array[Byte], Array[Byte])]
      .map { case (t, w, x, y) => (t, w, intersectEstimate(x, y)) }
      .toDF("event_type", "week", "est_retained")
  }
}
