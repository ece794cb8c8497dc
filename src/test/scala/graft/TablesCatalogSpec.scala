package graft

import org.apache.spark.sql.functions._

class TablesCatalogSpec extends SparkSpec {

  test("registerCatalog: ANALYZE fills table + column stats and CBO sees rowCount") {
    Tables.registerCatalog(spark, sfSmoke)
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("lineitem", Some("graft")))
    val stats = meta.stats.get
    assert(stats.rowCount.nonEmpty && stats.rowCount.get.toLong > 0)
    val colStats = stats.colStats
    assert(colStats.contains("l_quantity"))
    assert(colStats("l_quantity").distinctCount.nonEmpty)
    assert(colStats("l_quantity").nullCount.nonEmpty)

    // with CBO on, the optimized plan carries the catalog rowCount
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val plan = spark.table("graft.lineitem").queryExecution.optimizedPlan
      assert(plan.stats.rowCount.nonEmpty)
      assert(plan.stats.rowCount.get.toLong === stats.rowCount.get.toLong)
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("catalog tables answer queries identically to path loads") {
    Tables.registerCatalog(spark, sfSmoke, analyze = false)
    val viaCatalog = spark.table("graft.orders")
      .agg(sum(col("o_totalprice")).cast("string")).head().getString(0)
    val viaPath = Tables.load(spark, sfSmoke, "orders")
      .agg(sum(col("o_totalprice")).cast("string")).head().getString(0)
    assert(viaCatalog === viaPath)
  }
}
