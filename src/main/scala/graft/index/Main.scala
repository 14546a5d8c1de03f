package graft.index

import org.apache.spark.sql.SparkSession

/** CLI driver for the index pipeline — the reference's C2 surface
  * (/root/reference/src/InvertedIndexer.java:226-262: parse in/out
  * paths + side files, configure the job, run, exit).
  *
  *   runMain graft.index.Main <inputDir> <outputDir> [stopWordFile punctuationFile]
  *   runMain graft.index.Main <inputDir> <outputDir> --no-skip
  *
  * With the two side files the job is the LEGACY byte-parity pipeline
  * (the reference's exact output contract, single `part-*` file like
  * its one-reducer job — golden-checked by MainSpec). `--no-skip` is
  * the reference's OTHER legacy branch (run without `-skip`,
  * InvertedIndexer.java:53-64: empty pattern sets — no scrub, no
  * stop-words, still lowercase/tokenize/length/numeric), same
  * single-file sink. Without either it is the modern numeric-ranked
  * index with partitioned output — the scale default (one writer task
  * per partition; the single-file sink is parity-only).
  *
  * Master resolution: a cluster deployment passes `--master` via
  * spark-submit (honored — we only default when none is configured);
  * standalone runs default to local[SPARK_GRAFT_CPUS].
  */
object Main {

  def main(args: Array[String]): Unit = {
    args.length match {
      case 2 | 4 => // ok
      case 3 if args(2) == "--no-skip" => // legacy branch, empty pattern sets
      case _ =>
        System.err.println(
          "usage: graft.index.Main <inputDir> <outputDir> " +
            "[stopWordFile punctuationFile | --no-skip]")
        sys.exit(2)
    }
    val Array(in, out) = args.take(2)
    val preexisting = SparkSession.getDefaultSession.isDefined
    val builder = SparkSession.builder().appName("graft-inverted-index")
    val spark =
      (if (preexisting || sys.props.contains("spark.master")) builder
       else builder
         .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
         .config("spark.sql.shuffle.partitions",
           sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
        .getOrCreate()
    try {
      if (args.length == 4) {
        val lines = InvertedIndex.buildLegacy(spark, in, args(2), args(3))
        InvertedIndex.writeIndex(lines, out, singleFile = true)
      } else if (args.length == 3) {
        val lines = InvertedIndex.buildLegacyNoSkip(spark, in)
        InvertedIndex.writeIndex(lines, out, singleFile = true)
      } else {
        import spark.implicits._
        val idx = InvertedIndex.build(spark, in, Nil, Nil)
        InvertedIndex.writeIndex(
          InvertedIndex.formatIndex(idx).as[String], out)
      }
    } finally if (!preexisting) spark.stop()
  }
}
