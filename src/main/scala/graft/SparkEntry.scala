package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{Relational, Text, Dedup, Similarity, MultimodalQueries, Pipeline, Q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers here as a named query with
  * (when SQL-expressible) a DuckDB oracle; the driver hash-compares the
  * two result sets at sf0.01 (CORRECTNESS gate) and times the queries at
  * sf0.1 (BENCH gate).
  */
object SparkEntry {

  /** All registered queries, in stable declaration order. */
  val all: Seq[Q] =
    Relational.qs ++ Text.qs ++ Dedup.qs ++ Similarity.qs ++
      MultimodalQueries.qs ++ Pipeline.qs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * tx05 = the ranked inverted index, the reference's entire capability
    * as one DataFrame chain.
    */
  def entry(spark: SparkSession): DataFrame = {
    val fn = queries("tx05_inverted_index")
    fn(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case q if q.oracle.isDefined => q.name -> q.oracle.get }.toMap
}
