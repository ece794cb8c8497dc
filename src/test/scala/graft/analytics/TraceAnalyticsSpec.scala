package graft.analytics

import graft.SparkSpec
import graft.functions.{Durations, JsonScrub}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class DurationsSpec extends SparkSpec {

  test("suffix units parse per the reference jq table") {
    assert(Durations.parse("15.78s").contains(15.78))
    assert(Durations.parse("1030ms").contains(1.03))
    assert(Durations.parse("250ns").contains(250.0 * 1e-9))
    assert(Durations.parse("42us").contains(42.0 * 1e-6))
    assert(Durations.parse("3µs").contains(3.0 * 1e-6))
    assert(Durations.parse("2.5m").contains(150.0))
    assert(Durations.parse("1.5h").contains(5400.0))
    assert(Durations.parse("2d").contains(172800.0))
  }

  test("long unit names and bare numbers parse per the python parser") {
    assert(Durations.parse("12 seconds").contains(12.0))
    assert(Durations.parse("3 minutes").contains(180.0))
    assert(Durations.parse("1 hours").contains(3600.0))
    assert(Durations.parse("7").contains(7.0))
  }

  test("H:MM:SS clock strings parse") {
    assert(Durations.parse("1:02:03").contains(3723.0))
    assert(Durations.parse("0:00:15.5").contains(15.5))
    assert(Durations.parse("12:00:00").contains(43200.0))
  }

  test("garbage returns None") {
    assert(Durations.parse(null).isEmpty)
    assert(Durations.parse("").isEmpty)
    assert(Durations.parse("fast").isEmpty)
    assert(Durations.parse("12 parsecs").isEmpty)
    assert(Durations.parse("1:2:3:4").isEmpty)
  }

  test("round-trip property: n seconds formatted with any unit parses back") {
    val prop = Prop.forAll(Gen.choose(0L, 100000L)) { n =>
      val secs = n.toDouble
      Durations.parse(s"${secs}s").contains(secs) &&
        Durations.parse(s"${secs * 1000}ms")
          .exists(v => math.abs(v - secs) < 1e-9 * math.max(secs, 1))
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }
}

class JsonScrubSpec extends SparkSpec {
  private val doc =
    """{"queryStats":{"elapsedTime":"15.78s","executionTime":"14.69s"},
      |"session":{"remoteUserAddress":"10.0.0.1"},
      |"self":"http://coord/ui/api/query/x",
      |"outputStage":{"plan":{"splitInfo":{"path":"s3://bucket/file.parquet"},
      |"tableLocation":"s3://bucket/tpcds/store_sales"}},
      |"createTime":"2025-10-04T12:00:00Z"}""".stripMargin

  test("scrub drops, redacts and deletes per scrub.jq semantics") {
    val out = JsonScrub.scrub(doc)
    assert(!out.contains("remoteUserAddress"))
    assert(!out.contains("http://coord"))
    assert(!out.contains("2025-10-04"))
    assert(!out.contains("s3://bucket"))
    assert(out.contains(""""path":"[redacted]""""))
    assert(out.contains(""""tableLocation":"[redacted]""""))
    assert(out.contains(""""elapsedTime":"15.78s""""))
  }

  test("scrub is idempotent") {
    val once = JsonScrub.scrub(doc)
    assert(JsonScrub.scrub(once) == once)
  }

  test("path outside splitInfo is preserved") {
    val out = JsonScrub.scrub("""{"other":{"path":"/keep/me"}}""")
    assert(out.contains("/keep/me"))
  }

  test("invalid JSON yields null, arrays recurse") {
    assert(JsonScrub.scrub("{nope") == null)
    val out = JsonScrub.scrub(
      """{"xs":[{"self":"u","k":1},{"tableLocation":"s3://x"}]}""")
    assert(out == """{"xs":[{"k":1},{"tableLocation":"[redacted]"}]}""")
  }
}

class WorkloadLogsSpec extends SparkSpec {
  private lazy val logsGlob =
    getClass.getResource("/workload_logs").getPath + "/*.ndjson"

  test("loadWorkloadLogs tags runs, normalizes ids, nulls failures") {
    val df = TraceAnalytics.loadWorkloadLogs(spark, logsGlob)
    assert(df.select("run").distinct().count() == 5)
    assert(df.schema("query_id").dataType.typeName == "integer")
    // q4 run2 failed with -1 -> cleaned to null
    assert(df.filter(col("query_id") === 4 && col("elapsed_s").isNull)
      .count() == 1)
    assert(df.filter(col("elapsed_s") < 0).count() == 0)
  }

  test("per-query CV keeps only exactly-5-run queries (gate drops q7, q4)") {
    val df = TraceAnalytics.loadWorkloadLogs(spark, logsGlob)
      .filter(col("elapsed_s").isNotNull)
    val cv = TraceAnalytics.perQueryCv(df, "query_id", "elapsed_s", 5)
    val kept = cv.select("query_id").collect().map(_.getInt(0)).toSet
    assert(!kept.contains(7), "q7 has 4 runs")
    assert(!kept.contains(4), "q4 lost a run to the -1 failure")
    assert(kept.size == 8)
    // CV is positive and Bessel-corrected (spot-check one query vs scala)
    val row = cv.filter(col("query_id") === 1).head
    val samples = df.filter(col("query_id") === 1)
      .select("elapsed_s").collect().map(_.getDouble(0))
    val m = samples.sum / samples.length
    val sd = math.sqrt(samples.map(x => (x - m) * (x - m)).sum / (samples.length - 1))
    assert(math.abs(row.getAs[Double]("cv_pct") - 100 * sd / m) < 1e-9)
  }

  test("summarize produces the 4 reference statistics over run means") {
    val df = TraceAnalytics.loadWorkloadLogs(spark, logsGlob)
      .filter(col("elapsed_s").isNotNull)
    val s = TraceAnalytics.summarize(
      TraceAnalytics.perRunMean(df, "run", "elapsed_s")).head
    assert(s.getAs[Double]("avg_runtime") > 0)
    assert(s.getAs[Double]("std_runtime") >= 0)
    assert(s.getAs[Double]("p50_runtime") <= s.getAs[Double]("p99_runtime"))
  }
}
