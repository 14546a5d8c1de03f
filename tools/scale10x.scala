// 10x scale-smoke corpus builder (SURVEY §6): 10 id-offset copies of
// each sf0.1 table → /tmp/scale10x. Run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.sql.shuffle.partitions=64 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes \
//     -I tools/scale10x.scala </dev/null
// Then time queries against dir="/tmp/scale10x" (events has no 10x
// variant — it is copied through unchanged for the q22/q27/q52 family).
import org.apache.spark.sql.functions._
val src = "/root/testdata/sf0.1"
val out = "/tmp/scale10x"
def mk(name: String, idCols: Seq[String]): Unit = {
  val base = graft.tables.load(spark, src, name)
  val u = (0 until 10).map { i =>
    idCols.foldLeft(base)((df, c) => df.withColumn(c, col(c) + lit(i * 10000000L)))
  }.reduce(_ unionByName _)
  u.write.mode("overwrite").parquet(s"$out/$name.parquet")
}
mk("documents", Seq("doc_id"))
mk("embeddings", Seq("vec_id"))
mk("orders", Seq("o_orderkey")) // o_custkey NOT offset: 10x orders/customer
mk("customer", Seq("c_custkey"))
mk("lineitem", Seq("l_orderkey"))
// passthrough tables (dims + events keep their sf0.1 size). RAW file
// copy, NOT a load/rewrite round-trip: graft.tables.load converts
// events.ts from parquet TIMESTAMP(NANOS) to TimestampType, and a
// rewritten (micros) file would then break tables.load's `ts DIV 1000`
// nanos bridge when read back.
for (t <- Seq("region", "nation", "supplier", "part", "events")) {
  val from = java.nio.file.Paths.get(src, s"$t.parquet")
  val to = java.nio.file.Paths.get(out, s"$t.parquet")
  java.nio.file.Files.createDirectories(to.getParent)
  java.nio.file.Files.copy(from, to,
    java.nio.file.StandardCopyOption.REPLACE_EXISTING)
}
println("BUILT " + spark.read.parquet(s"$out/documents.parquet").count() +
  " docs, " + spark.read.parquet(s"$out/lineitem.parquet").count() + " lineitem")
sys.exit(0)
