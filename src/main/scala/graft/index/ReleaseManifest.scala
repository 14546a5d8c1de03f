package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-artifact RELEASE manifest — the version-pinning surface a
  * training run reads through (round-14 verdict, missing #2). The
  * stores each version independently behind 1-row pointer flips
  * (`TokenizerStore`/`OrderStore`/`VectorStore`), which makes every
  * SINGLE artifact crash-consistent — but a training run consumes a
  * TUPLE (frozen order + manifest + vocabulary + vector geometry), and
  * nothing asserted the tuple came from one corpus state: a tokenizer
  * rebuild landing between the order read and the vocab read would
  * hand the run sequences packed under one vocabulary and token ids
  * from another, silently.
  *
  * [[publish]] snapshots the three stores' CURRENT versions (plus a
  * caller-named corpus snapshot id) into one 1-row table — the same
  * atomic-1-row-commit primitive the stores' own pointers use.
  * [[readVerified]] brackets any consumer read with a version
  * re-check on BOTH sides, so a concurrent rebuild flipping any store
  * mid-read refuses loudly (the TokenizerStore mixed-vocab precedent)
  * instead of serving a mixed tuple. Convenience readers for the
  * common training inputs sit on top.
  *
  * Scale: the manifest is one row; every check is three 1-row pointer
  * reads. Nothing here touches data paths.
  */
object ReleaseManifest {

  /** The pinned tuple of a published release. */
  final case class Pin(releaseId: Long, corpus: String,
                       tokenizerStore: String, tokenizerV: Long,
                       orderStore: String, orderV: Long,
                       vectorStore: String, vectorV: Long)

  private def table(name: String) = s"${name}_release"

  /** Snapshot the three stores' current versions under `corpus` (a
    * caller-named corpus snapshot id — e.g. the ingest ledger's max
    * committed batch) as the NEXT release. One-row overwrite — the
    * atomic commit; a crash before it leaves the previous release
    * serving, complete. */
  def publish(spark: SparkSession, name: String, corpus: String,
              tokenizerStore: String, orderStore: String,
              vectorStore: String): Pin = {
    import spark.implicits._
    val prev = if (!spark.catalog.tableExists(table(name))) 0L
      else spark.table(table(name)).select("release_id").head.getLong(0)
    val pin = Pin(prev + 1L, corpus,
      tokenizerStore, TokenizerStore.currentVersion(spark, tokenizerStore),
      orderStore, OrderStore.currentVersion(spark, orderStore),
      vectorStore, VectorStore.currentVersion(spark, vectorStore))
    VectorStore.clearOrphanLocation(spark, table(name))
    Seq((pin.releaseId, pin.corpus, pin.tokenizerStore, pin.tokenizerV,
        pin.orderStore, pin.orderV, pin.vectorStore, pin.vectorV))
      .toDF("release_id", "corpus", "tokenizer_store", "tokenizer_v",
        "order_store", "order_v", "vector_store", "vector_v")
      .write.mode("overwrite").saveAsTable(table(name))
    pin
  }

  /** The current release's pinned tuple; refuses when none was
    * published. */
  def resolve(spark: SparkSession, name: String): Pin = {
    require(spark.catalog.tableExists(table(name)),
      s"no release published under '$name': publish one before reading " +
        "training inputs through the manifest")
    val r = spark.table(table(name)).head
    Pin(r.getAs[Long]("release_id"), r.getAs[String]("corpus"),
      r.getAs[String]("tokenizer_store"), r.getAs[Long]("tokenizer_v"),
      r.getAs[String]("order_store"), r.getAs[Long]("order_v"),
      r.getAs[String]("vector_store"), r.getAs[Long]("vector_v"))
  }

  /** Every store whose CURRENT version differs from the pin — empty
    * means the release tuple is intact. */
  private def drifted(spark: SparkSession, pin: Pin): Seq[String] =
    Seq(
      (pin.tokenizerStore, pin.tokenizerV,
        TokenizerStore.currentVersion(spark, pin.tokenizerStore)),
      (pin.orderStore, pin.orderV,
        OrderStore.currentVersion(spark, pin.orderStore)),
      (pin.vectorStore, pin.vectorV,
        VectorStore.currentVersion(spark, pin.vectorStore)))
      .collect { case (s, pinned, cur) if pinned != cur =>
        s"$s (pinned v$pinned, serving v$cur)" }

  /** Refuse unless every store still serves its pinned version. */
  def verify(spark: SparkSession, name: String): Pin = {
    val pin = resolve(spark, name)
    val d = drifted(spark, pin)
    if (d.nonEmpty) throw new IllegalStateException(
      s"release ${pin.releaseId} of '$name' is STALE — rebuilt since " +
        s"publish: ${d.mkString(", ")}. Re-publish a release (or roll " +
        "the training run onto it) rather than mixing artifact versions.")
    pin
  }

  /** Bracket a consumer read with the version check on BOTH sides: a
    * rebuild flipping any store's pointer mid-read (the stores drop
    * old-version tables after their flips, so a mid-read flip is
    * exactly the torn-tuple hazard) refuses after the fact rather
    * than returning mixed data. */
  def readVerified[T](spark: SparkSession, name: String)(
      read: Pin => T): T = {
    val pin = verify(spark, name)
    val result = read(pin)
    verify(spark, name)
    result
  }

  /** The frozen training order of the pinned release. */
  def trainingOrder(spark: SparkSession, name: String): DataFrame =
    readVerified(spark, name)(pin =>
      OrderStore.order(spark, pin.orderStore))

  /** One shard of the pinned release's order (the per-data-loader
    * read). */
  def trainingShard(spark: SparkSession, name: String,
                    shardId: Long): DataFrame =
    readVerified(spark, name)(pin =>
      OrderStore.serveShard(spark, pin.orderStore, shardId))

  /** The pinned release's shard manifest (resume verification). */
  def shardManifest(spark: SparkSession, name: String): DataFrame =
    readVerified(spark, name)(pin =>
      OrderStore.manifest(spark, pin.orderStore))

  /** The pinned release's BPE merge list. */
  def merges(spark: SparkSession,
             name: String): Seq[(Int, String, String, Long)] =
    readVerified(spark, name)(pin =>
      TokenizerStore.merges(spark, pin.tokenizerStore))
}
