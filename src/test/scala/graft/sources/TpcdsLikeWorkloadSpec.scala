package graft.sources

import graft.SparkSpec
import java.nio.file.Files

/** Drives the shipped TPC-DS-shaped SQL workload (workloads/tpcds_like)
  * through the §3.1 lifecycle: registered fixture views → spark.sql →
  * drain + time → NDJSON log. Asserts every query parses, plans, and
  * returns rows — the spark.sql() surface twin of the DSL operator
  * queries the oracle gate covers. */
class TpcdsLikeWorkloadSpec extends SparkSpec {

  test("all tpcds_like workload queries run and return rows") {
    graft.Tables.registerAll(spark, sfSmoke)
    val outDir = Files.createTempDirectory("graft_tpcds_like").toFile
    val results = WorkloadRunner.runWorkload(spark,
      "/root/repo/workloads/tpcds_like", outDir.getAbsolutePath)
    assert(results.map(_.queryId) === Seq("q1", "q2", "q3", "q4", "q5"))
    results.foreach { r =>
      assert(r.runtimeS >= 0, s"${r.queryId} failed (sentinel -1)")
    }
    // each query actually yields rows on the smoke fixture
    for ((name, sql) <- Ingest.loadQueryFiles("/root/repo/workloads/tpcds_like")) {
      val n = spark.sql(sql).count()
      assert(n > 0, s"$name returned no rows")
    }
    val log = spark.read.json(s"$outDir/Workload_log_run_1.ndjson")
    assert(log.filter(log("Runtime (s)") < 0).count() === 0)
  }
}
