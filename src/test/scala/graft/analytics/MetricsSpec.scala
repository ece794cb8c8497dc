package graft.analytics

import graft.SparkSpec
import java.nio.file.Files

/** GNN val-list post-processing (table3.ipynb cell 0): stringified
  * list parsing, row selection, positive masking, metric math. */
class MetricsSpec extends SparkSpec {

  test("qerrorApprox tracks the exact gated percentiles on the fixture") {
    import org.apache.spark.sql.functions._
    val exact = Metrics.queries("metric_qerror")(spark, sfCorrect).head()
    val approx = Metrics.qerrorApprox(spark, sfCorrect).head()
    assert(approx.getLong(2) === exact.getLong(2), "same pair count")
    // sketch rank error at accuracy 10k is far inside 1% on this n
    Seq(0, 1).foreach { i =>
      val (e, a) = (exact.getDouble(i), approx.getDouble(i))
      assert(math.abs(a - e) / e < 0.01, s"col $i: approx $a vs exact $e")
    }
  }

  test("loadValLists parses stringified lists from a CSV row into (idx, label, pred)") {
    val dir = Files.createTempDirectory("graft_gnn_csv")
    val csv = dir.resolve("test_Baseline_TPCDS.csv")
    Files.writeString(csv,
      """run,val_labels,val_preds
        |r0,"[1.5, 2.0, 0.0, 4.25]","[1.0, 2.5, 3.0, 4.0]"
        |r1,"[9.0, 8.0]","[9.5, 7.5]"
        |""".stripMargin)
    val row0 = Metrics.loadValLists(spark, csv.toString).collect()
    assert(row0.map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSeq ===
      Seq((0, 1.5, 1.0), (1, 2.0, 2.5), (2, 0.0, 3.0), (3, 4.25, 4.0)))
    val row1 = Metrics.loadValLists(spark, csv.toString, rowIdx = 1).collect()
    assert(row1.map(r => (r.getDouble(1), r.getDouble(2))).toSeq ===
      Seq((9.0, 9.5), (8.0, 7.5)))
  }

  test("metric_gnn_lists round-trips lists and agrees with the direct metric math") {
    import org.apache.spark.sql.functions._
    // direct metrics over the SAME 1-in-100 fixture subset the
    // stringified round-trip uses (notebook-artifact scale)
    val subset = Metrics.pairs(spark, sfSmoke)
      .filter(col("o_orderkey") % 100 === 0)
      .filter(col("label") > 0 && col("pred") > 0)
      .select(col("label"), col("pred"),
        (greatest(col("pred"), col("label")) /
          greatest(least(col("pred"), col("label")), lit(1e-3))).as("qerr"))
    val direct = subset.agg(
      expr("percentile(qerr, 0.5)").as("p50_qerr"),
      expr("percentile(qerr, 0.99)").as("p99_qerr"),
      count(lit(1)).as("n")).collect()(0)
    val viaLists = Metrics.queries("metric_gnn_lists")(spark, sfSmoke).collect()(0)
    // same positive-mask population
    assert(viaLists.getAs[Long]("n") === direct.getAs[Long]("n"))
    // q-error percentiles agree with the non-stringified path
    assert(math.abs(viaLists.getAs[Double]("p50_qerr") -
      direct.getAs[Double]("p50_qerr")) < 1e-9)
    assert(math.abs(viaLists.getAs[Double]("p99_qerr") -
      direct.getAs[Double]("p99_qerr")) < 1e-9)
    assert(viaLists.getAs[Double]("mae") > 0)
  }
}
