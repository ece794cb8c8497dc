package graft.sources

import graft.SparkSpec
import java.nio.file.Files

/** Drives the shipped TPC-DS-shaped SQL workload (workloads/tpcds_like)
  * through the §3.1 lifecycle: registered fixture views → spark.sql →
  * drain + time → NDJSON log. Asserts every query parses, plans, and
  * returns rows — the spark.sql() surface twin of the DSL operator
  * queries the oracle gate covers — and that the heavy shapes get the
  * plans you'd want at scale (broadcast dims, pushed filters). */
class TpcdsLikeWorkloadSpec extends SparkSpec {

  private val qdir = "/root/repo/workloads/tpcds_like"

  test("all tpcds_like workload queries run and return rows") {
    graft.Tables.registerAll(spark, sfSmoke)
    val outDir = Files.createTempDirectory("graft_tpcds_like").toFile
    val results = WorkloadRunner.runWorkload(spark, qdir, outDir.getAbsolutePath)
    // name-sorted like the reference's run_workload loop
    val expected = (1 to 99).map(i => s"q$i").sorted
    assert(results.map(_.queryId) === expected)
    results.foreach { r =>
      assert(r.runtimeS >= 0, s"${r.queryId} failed (sentinel -1)")
    }
    // each query actually yields rows on the smoke fixture
    for ((name, sql) <- Ingest.loadQueryFiles(qdir)) {
      val n = spark.sql(sql).count()
      assert(n > 0, s"$name returned no rows")
    }
    val log = spark.read.json(s"$outDir/Workload_log_run_1.ndjson")
    assert(log.filter(log("Runtime (s)") < 0).count() === 0)
  }

  private def planOf(name: String): String = {
    val sql = Ingest.loadQueryFiles(qdir).toMap.apply(name)
    spark.sql(sql).queryExecution.executedPlan.toString
  }

  test("q8 (q64-shape star) broadcasts every dim and scans lineitem pruned") {
    graft.Tables.registerAll(spark, sfSmoke)
    val plan = planOf("q8")
    // nation/region/supplier/part are all broadcast, never shuffled
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
    val broadcasts = "BroadcastExchange".r.findAllIn(plan).length
    assert(broadcasts >= 4, s"expected >=4 dim broadcasts, got $broadcasts")
    // projection pruning reaches the fact scan (no full-width lineitem read)
    val lineitemScan = plan.linesIterator
      .find(l => l.contains("Scan parquet") && l.contains("lineitem"))
    assert(lineitemScan.isDefined)
  }

  test("q8 self-join reuses one exchange for both arms at runtime (AQE)") {
    graft.Tables.registerAll(spark, sfSmoke)
    val df = spark.sql(Ingest.loadQueryFiles(qdir).toMap.apply("q8"))
    df.collect()
    // the year step is a cross-side filter and cust_region re-attaches
    // after the self-join, so the two arms are the SAME aggregate —
    // AQE must materialize the 9-table aggregate once
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("ReusedExchange")
      || finalPlan.contains("ReusedQueryStage"),
      "expected runtime exchange reuse in the self-join:\n" +
        finalPlan.take(1500))
  }

  test("q7 (q88-shape band counts) is a single lineitem scan after the r8 collapse") {
    graft.Tables.registerAll(spark, sfSmoke)
    val plan = planOf("q7")
    assert(plan.contains("PushedFilters: ["), "filters must reach parquet")
    assert(plan.contains("l_quantity"), "quantity range must be pushed")
    // the canon's 8 band subqueries are now conditional aggregates
    // over ONE scan: exactly one lineitem file scan, no cross product
    val lineitemScans = "Scan parquet [^\\n]*lineitem".r
      .findAllIn(plan).size
    assert(lineitemScans === 1,
      s"expected a single lineitem scan, found $lineitemScans:\n" +
        plan.take(1500))
    assert(!plan.contains("BroadcastNestedLoopJoin")
      && !plan.contains("CartesianProduct"),
      "band counts must not cross-join anymore")
  }

  test("q6 (q9-shape) plans all subqueries as reused/independent scalar aggregates") {
    graft.Tables.registerAll(spark, sfSmoke)
    val plan = spark.sql(Ingest.loadQueryFiles(qdir).toMap.apply("q6"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("scalar-subquery"), plan.take(300))
  }

  test("q65 (q28-shape band probes) cross-joins one-row aggregates for free") {
    graft.Tables.registerAll(spark, sfSmoke)
    val plan = planOf("q65")
    // six single-row aggregates combine via nested-loop/cartesian —
    // no shuffle join should appear between them
    assert(plan.contains("BroadcastNestedLoopJoin")
      || plan.contains("CartesianProduct"), plan.take(500))
    // each band's quantity filter reaches its scan
    assert(plan.contains("PushedFilters: ["), "band filters must be pushed")
  }

  test("q84 (funnel interval self-join) keeps user_id as the equi key") {
    graft.Tables.registerAll(spark, sfSmoke)
    val plan = planOf("q84")
    // the time-band condition must ride on an equi join keyed on
    // user_id — NOT degrade to a nested-loop over all event pairs
    assert(!plan.contains("BroadcastNestedLoopJoin")
      && !plan.contains("CartesianProduct"),
      "interval self-join degraded to all-pairs:\n" + plan.take(800))
  }

  test("q93 (NOT IN) plans as a null-aware anti join, not a cartesian") {
    graft.Tables.registerAll(spark, sfSmoke)
    val plan = planOf("q93")
    assert(plan.contains("LeftAnti"), plan.take(800))
  }

  test("q2 (rollup + rank-in-level) expands once and broadcasts the geo dims") {
    graft.Tables.registerAll(spark, sfSmoke)
    val plan = planOf("q2")
    // ROLLUP is ONE Expand over the supplier scan, not a union of
    // re-aggregations; nation/region ride in as broadcasts
    assert("Expand".r.findAllIn(plan).length === 1, plan.take(600))
    val broadcasts = "BroadcastExchange".r.findAllIn(plan).length
    assert(broadcasts >= 2, s"expected >=2 dim broadcasts, got $broadcasts")
    assert(plan.contains("Window"), "rank-within-parent window missing")
  }

  test("q5 (INTERSECT + threshold) plans the avg threshold as a scalar subquery") {
    graft.Tables.registerAll(spark, sfSmoke)
    val plan = spark.sql(Ingest.loadQueryFiles(qdir).toMap.apply("q5"))
      .queryExecution.optimizedPlan.toString
    // the uncorrelated avg-price gate must be a one-row scalar
    // subquery reused by the channel arms, not a per-row join
    assert(plan.contains("scalar-subquery"), plan.take(500))
    // INTERSECT decays to a distinct-preserving semi join, never a
    // cartesian pairing of the two status slices
    val phys = planOf("q5")
    assert(!phys.contains("CartesianProduct"), phys.take(500))
  }

  test("q44 (week-over-week ratio) joins the two tiny year arms by broadcast") {
    graft.Tables.registerAll(spark, sfSmoke)
    val plan = planOf("q44")
    // each arm is a ~nations-sized aggregate; their self-join must be
    // a broadcast hash join on n_name, not a shuffle of the facts
    assert(plan.contains("BroadcastHashJoin"), plan.take(600))
    // the weekday pivot itself is decimal-exact partial aggregation —
    // map-side combine must survive (HashAggregate below the exchange)
    assert(plan.contains("HashAggregate"), "pivot must hash-aggregate")
  }

  test("q99 (kitchen sink) rolls up once and broadcasts all dims") {
    graft.Tables.registerAll(spark, sfSmoke)
    val plan = planOf("q99")
    assert("Expand".r.findAllIn(plan).length >= 1, "rollup must Expand once")
    val broadcasts = "BroadcastExchange".r.findAllIn(plan).length
    assert(broadcasts >= 3, s"expected >=3 dim broadcasts, got $broadcasts")
    assert(plan.contains("Window"), "level-share window missing")
  }
}
