package graft

import org.apache.spark.sql.SparkSession

/** Shared warehouse cleanup for artifact specs (index / dedup / vector
  * stores and their streaming maintainers): DROP TABLE plus physical
  * warehouse-dir removal. Both steps matter — the catalog is per-JVM
  * but the warehouse dir persists across test runs, and an append-mode
  * CREATE refuses a leftover location.
  */
object TestWarehouse {

  /** Drop `tables` from the catalog and delete their warehouse dirs. */
  def reset(spark: SparkSession, tables: String*): Unit = tables.foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS $t")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
    val dir = new java.io.File(
      if (wh.getScheme == null) wh.toString else wh.getPath, t)
    if (dir.exists()) rm(dir)
  }
}
