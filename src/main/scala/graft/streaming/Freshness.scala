package graft.streaming

import org.apache.spark.sql.SparkSession

/** Cross-session serve freshness (round-14 finding): maintainers write
  * through foreachBatch's CLONED session, whose post-write refresh
  * does not invalidate OTHER sessions' cached file listings. A session
  * that planned against a ledger/marker table before the latest batch
  * keeps serving the STALE listing and silently misses committed rows
  * — reproduced with `ComponentMaintenance`: a marker append was on
  * disk but invisible to the session that had served between batches
  * (`spark.table` returned 2 of the 3 marker files). Every maintainer
  * serve entry point refreshes its tables before reading; the cost is
  * a metadata relisting of bounded ledger tables, never a data scan.
  */
object Freshness {

  /** Invalidate this session's cached listings for `tables` (absent
    * tables skipped; refresh failures swallowed — a serve must not
    * fail on a metadata race it can recover from by listing). */
  def refresh(spark: SparkSession, tables: String*): Unit =
    tables.foreach { t =>
      if (spark.catalog.tableExists(t))
        try spark.catalog.refreshTable(t)
        catch { case _: Exception => () }
    }
}
