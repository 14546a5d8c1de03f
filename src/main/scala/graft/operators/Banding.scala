package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The LSH banding candidate-join shared by MinHash (dd03), SimHash
  * (dd04), hyperplane ANN (sm02) and embedding near-dup (dd07):
  * explode each row's band keys, self-join on the (band, key) EQUI-key
  * with an id-ordering predicate, and return distinct unordered
  * candidate pairs. One implementation keeps the scale guarantee in
  * one place — the join is always a shuffle equi-join, never a
  * cartesian product (guarded by PlanSpec for the call sites).
  *
  * Skew note: clustered data makes some band buckets hot (a popular
  * signature byte collects a large bucket, and the self-join on it is
  * quadratic in bucket size). That is the standard AQE skew-join case —
  * the runtime splits the hot partition (mechanism pinned by
  * SkewJoinSpec); the algorithmic fix when one bucket is pathological
  * is more bands × narrower keys, which trades candidate recall work
  * for smaller buckets.
  */
object Banding {

  /** @param df     one row per item
    * @param idCol  unique item id (pairs are id_a < id_b)
    * @param bands  per-band (bandIdx, key) column pairs
    * @param carry  extra columns returned per side as `<name>_a/_b`
    *               (e.g. the signature a verifier needs)
    */
  def candidatePairs(df: DataFrame, idCol: String,
                     bands: Seq[(Column, Column)],
                     carry: Seq[String] = Nil): DataFrame = {
    val bk = explode(array(bands.map { case (b, k) =>
      struct(b.as("band"), k.as("key"))
    }: _*)).as("bk")
    val exploded = df
      .select(col(idCol) +: carry.map(col) :+ bk: _*)
      .select(col(idCol) +: carry.map(col) :+
        col("bk.band").as("band") :+ col("bk.key").as("key"): _*)
    val outCols =
      Seq(col(s"a.$idCol").as(s"${idCol}_a"), col(s"b.$idCol").as(s"${idCol}_b")) ++
        carry.flatMap(c => Seq(col(s"a.$c").as(s"${c}_a"), col(s"b.$c").as(s"${c}_b")))
    exploded.as("a")
      .join(exploded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(outCols: _*)
      .distinct()
  }
}
