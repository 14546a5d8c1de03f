// 100x VARIED scale-posture corpus builder (SURVEY §6, round-13 task):
// unlike tools/scale10x.scala (10 exact id-offset copies — which exact
// dedup collapses right back to sf0.1, hiding candidate-volume
// pathologies), this corpus makes every derived document GENUINELY
// DISTINCT, so banding/clustering operators face real 100x content
// cardinality. It is the corpus that exposed the fixed-key-space
// SimHash/hyperplane banding quadratics fixed in rounds 13
// (Dedup.simhashPairs 60-bit/15-bit-band widening, Similarity 60-bit
// hyperplane bands). Run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --conf spark.sql.shuffle.partitions=128 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes \
//     -I tools/scale100x.scala </dev/null
// Then time queries against dir="/tmp/scale100x" (tools/sweep100x.scala).
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.FloatType
val src = "/root/testdata/sf0.1"
val out = "/tmp/scale100x"
val Copies = 100
val Off = 10000000L

// documents: copy i != 0 replaces ~30% of tokens (deterministic per
// (token, i) murmur3 coin) with a copy-unique variant token. Two
// variants then share ~49% of token POSITIONS, so 5-gram shingle
// agreement is ~0.49^5 ≈ 3% and 8-token substring windows ~0.5^8 ≈ 0.4%
// — far below every near-dup threshold in the registry: the corpus is
// 500k distinct docs, not 100 copies of 5k. Vocabulary grows with the
// corpus (each substituted token is new), which is exactly the property
// the exact-copy corpus lacked and vocab-keyed banding needs to face.
{
  val base = graft.tables.load(spark, src, "documents")
  val u = (0 until Copies).map { i =>
    if (i == 0) base
    else base
      .withColumn("doc_id", col("doc_id") + lit(i * Off))
      .withColumn("text", array_join(
        transform(split(col("text"), " "), t =>
          when(pmod(hash(t, lit(i)), lit(10)) < 3,
            concat(t, lit("v"), lit(i))).otherwise(t)), " "))
      .withColumn("n_chars", length(col("text")))
  }.reduce(_ unionByName _)
  u.repartition(64).write.mode("overwrite").parquet(s"$out/documents.parquet")
}

// embeddings: copy i != 0 perturbs every dimension by a deterministic
// uniform in [-0.25, 0.25) keyed by (vec_id, dim, i) — derived vectors
// land in DIFFERENT quantizer cells / LSH buckets instead of stacking
// 100-deep in the same ones (the duplicate-cluster density artifact of
// the copy corpus, SURVEY §6 round-9 notes).
{
  val base = graft.tables.load(spark, src, "embeddings")
  val u = (0 until Copies).map { i =>
    if (i == 0) base
    else base
      .withColumn("vec_id", col("vec_id") + lit(i * Off))
      .withColumn("embedding", transform(col("embedding"), (x, d) =>
        (x + (pmod(hash(col("vec_id"), d, lit(i)), lit(1000))
          .cast("double") / 2000.0 - 0.25)).cast(FloatType)))
  }.reduce(_ unionByName _)
  u.repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
}

// relational: 100 consistent sub-universes — ALL keys offset together
// (unlike scale10x, which left o_custkey unoffset to densify
// orders-per-customer 10x). 100x cardinality everywhere, ratios
// preserved: 60M lineitem, 15M orders, 1.5M customers.
def mk(name: String, idCols: Seq[String]): Unit = {
  val base = graft.tables.load(spark, src, name)
  val u = (0 until Copies).map { i =>
    idCols.foldLeft(base)((df, c) => df.withColumn(c, col(c) + lit(i * Off)))
  }.reduce(_ unionByName _)
  u.repartition(64).write.mode("overwrite").parquet(s"$out/$name.parquet")
}
mk("orders", Seq("o_orderkey", "o_custkey"))
mk("customer", Seq("c_custkey"))
mk("lineitem", Seq("l_orderkey"))

// events: 100 consistent sub-universes (round 15 — the sketch family
// q61/q62 reads events at scale now): event/user ids offset together,
// timestamps unchanged, so the same 30 days carry 100x rows and 100x
// DISTINCT users per (type, day) — real distinct-count cardinality for
// the HLL surface. Read through tables.load (normalizes the nanos
// physical encoding) and rewritten as micros.
{
  val base = graft.tables.load(spark, src, "events")
  val u = (0 until Copies).map { i =>
    base.withColumn("event_id", col("event_id") + lit(i * Off))
      .withColumn("user_id", col("user_id") + lit(i * Off))
  }.reduce(_ unionByName _)
  u.repartition(32).write.mode("overwrite").parquet(s"$out/events.parquet")
}

// passthrough (dims unchanged; no heavy-15 query reads them at
// scale). RAW file copy — see scale10x.scala's nanos-bridge note.
for (t <- Seq("region", "nation", "supplier", "part")) {
  val from = java.nio.file.Paths.get(src, s"$t.parquet")
  val to = java.nio.file.Paths.get(out, s"$t.parquet")
  java.nio.file.Files.createDirectories(to.getParent)
  java.nio.file.Files.copy(from, to,
    java.nio.file.StandardCopyOption.REPLACE_EXISTING)
}
println("BUILT " +
  spark.read.parquet(s"$out/documents.parquet").count() + " docs, " +
  spark.read.parquet(s"$out/embeddings.parquet").count() + " vecs, " +
  spark.read.parquet(s"$out/lineitem.parquet").count() + " lineitem, " +
  "distinct texts " +
  spark.read.parquet(s"$out/documents.parquet")
    .select(countDistinct("text")).first().getLong(0))
sys.exit(0)
