package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Runtime row-level filtering proof (the shuffle-join twin of the DPP
  * test in IngestSpec): when a fact-side scan joins a selectively
  * filtered dim through a shuffle join, Catalyst injects a Bloom
  * filter built from the dim keys into the fact scan — at 100 TB this
  * drops non-matching fact rows at the scan instead of carrying them
  * through the shuffle. Fixture sizes sit under the production
  * thresholds, so the test lowers them; production defaults (10 MB
  * creation side / 10 GB application side) are the right knobs at
  * cluster scale.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("bloom filter from a filtered dim is injected into the fact scan") {
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    // reference answer under the DEFAULT plan (broadcast join, no
    // bloom filter) — computed before any conf changes
    val expected = Tables.load(spark, sfSmoke, "lineitem")
      .join(Tables.load(spark, sfSmoke, "part")
          .filter(col("p_type") === "PROMO"),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand").agg(sum("l_quantity").as("qty"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    try {
      // force the shuffle join (a broadcast join needs no bloom filter)
      // and drop the size gates to fixture scale
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "1KB")
      val li = Tables.load(spark, sfSmoke, "lineitem")
      val dim = Tables.load(spark, sfSmoke, "part")
        .filter(col("p_type") === "PROMO")
      val q = li.join(dim, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(sum("l_quantity").as("qty"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain")
        || optimized.toLowerCase.contains("bloom"),
        "no runtime bloom filter injected:\n" + optimized.take(1500))
      // and the bloom-filtered plan returns the same answer
      val got = q.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got === expected)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
