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
    val dir = new java.io.File(warehouseDir(spark), t)
    if (dir.exists()) rm(dir)
  }

  /** Sweep EVERY table/dir whose name starts with `prefix` — catalog
    * entries AND orphan warehouse dirs a previous (crashed/failed) JVM
    * left behind without catalog entries, which `reset`-by-listed-name
    * cannot see and which wedge the next `saveAsTable` with
    * LOCATION_ALREADY_EXISTS. */
  def resetPrefix(spark: SparkSession, prefix: String): Unit = {
    spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith(prefix))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val wh = new java.io.File(warehouseDir(spark))
    if (wh.exists())
      wh.listFiles().filter(_.getName.startsWith(prefix)).foreach(rm)
  }

  private def warehouseDir(spark: SparkSession): String = {
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
    if (wh.getScheme == null) wh.toString else wh.getPath
  }

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rm)
    f.delete(); ()
  }
}
