package graft.analytics

import graft.SparkSpec

/** Pins the LaTeX row strings against the reference's formatters
  * (helpers.py:171-316): value formatting, missing-value dashes, the
  * delta sign/zero rules, and the single-row contract. */
class LatexRowsSpec extends SparkSpec {
  import spark.implicits._

  test("table1Row formats the 8-column study-1 row") {
    val t = Seq((5.589, 0.123, 0.44, 0.37, 1.76, 7.94, 6.63, 31.36))
      .toDF("mean_runtime_avg", "mean_runtime_std", "std_avg", "std_p50",
        "std_p99", "cv_avg", "cv_p50", "cv_p99")
    assert(LatexRows.table1Row(t, "AWS") ===
      "AWS &&& \\hspace{5pt} 5.589 & 0.123 & 0.440 & 0.370 & 1.760 & " +
        "7.940 & 6.630 & 31.360 \\\\")
  }

  test("missing values render as dashes") {
    val t = Seq((Double.NaN, 1.0)).toDF("mean_runtime_avg", "cv_avg")
    val row = LatexRows.table1Row(t, "GCP")
    assert(row.startsWith("GCP &&& \\hspace{5pt} - & - &"),
      s"NaN and absent columns must both dash: $row")
    assert(row.contains("& 1.000 &"))
  }

  test("table2 baseline + delta rows match the reference shapes") {
    val base = Seq((17.612, 8.32, 5.46, 40.66))
      .toDF("mean_runtime_avg", "cv_avg", "cv_p50", "cv_p99")
    assert(LatexRows.table2BaselineRow(base) ===
      "\\multicolumn{5}{c}{\\rowcolor{gray!25} (Baseline)} & 17.612 & " +
        "\\multicolumn{1}{c}{\\textbf{—}} & 8.320 & 5.460 & 40.660 & " +
        "\\textbf{—} & \\textbf{—} & \\textbf{—} \\\\")

    val delta = Seq((43.744, 21.314, 19.069, 61.279,
        15.746, 10.479, -10.524, 0.0001))
      .toDF("mean_runtime_avg", "cv_avg", "cv_p50", "cv_p99",
        "delta_mean_runtime_avg", "delta_cv_avg", "delta_cv_p50",
        "delta_cv_p99")
    assert(LatexRows.table2DeltaRow(delta, "External metastore") ===
      "& \\textbullet External metastore & 43.744 & $+~15.746$ & " +
        "21.314 & 19.069 & 61.279 & $+~10.479$ & $-~10.524$ & $0$ \\\\")
  }

  test("multi-row input is rejected") {
    val t = Seq((1.0), (2.0)).toDF("mean_runtime_avg")
    intercept[IllegalArgumentException] {
      LatexRows.table1Row(t, "Azure")
    }
  }

  test("formats the summaries this library's analytics produce") {
    // end-to-end: summarize() output -> a well-formed table-1 prefix
    val runMeans = Seq((1, 2.0), (2, 2.4), (3, 2.2), (4, 2.1), (5, 2.3))
      .toDF("run", "run_mean")
    val s = TraceAnalytics.summarize(runMeans)
      .withColumnRenamed("avg_runtime", "mean_runtime_avg")
      .withColumnRenamed("std_runtime", "mean_runtime_std")
    val row = LatexRows.table1Row(s, "Local",
      cols = Seq("mean_runtime_avg", "mean_runtime_std"))
    assert(row === "Local &&& \\hspace{5pt} 2.200 & 0.158 \\\\")
  }
}
