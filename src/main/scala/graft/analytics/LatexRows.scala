package graft.analytics

import org.apache.spark.sql.{DataFrame, Row}

/** LaTeX table-row formatting for the variance-study summaries — the
  * presentation tier of the reference's trace analytics
  * (`traces/tools/helpers.py:171-316`: `table_1_latex_row_from_table`,
  * `table_2_latex_row_from_table`). Same contract: a SINGLE-row
  * summary frame in, one LaTeX row out; missing values render "-";
  * delta columns render `$+~x$` / `$-~x$` with an exact-zero
  * threshold at 10^-dp.
  *
  * Column names are this library's summary-frame dialect (the caller
  * names the columns; the reference hard-codes its pandas labels), in
  * the same positional order as the reference's `col_order`.
  */
object LatexRows {

  /** table-1 column order (helpers.py:181-185), in this library's
    * naming: across-run mean/std of run means, per-query std stats,
    * per-query CV stats. */
  val Table1Cols: Seq[String] = Seq(
    "mean_runtime_avg", "mean_runtime_std",
    "std_avg", "std_p50", "std_p99",
    "cv_avg", "cv_p50", "cv_p99")

  private def isMissing(row: Row, name: String): Boolean = {
    val i = row.fieldIndex(name)
    row.isNullAt(i) || {
      val v = row.getDouble(i)
      v.isNaN
    }
  }

  private def fmt(row: Row, name: String, dp: Int): String =
    if (!row.schema.fieldNames.contains(name) || isMissing(row, name)) "-"
    else s"%.${dp}f".format(row.getDouble(row.fieldIndex(name)))

  /** `$+~x$` / `$-~x$`, `$0$` below the rounding threshold, "-" when
    * missing (helpers.py:276-284 `fmt_delta`). */
  private def fmtDelta(row: Row, name: String, dp: Int): String =
    if (!row.schema.fieldNames.contains(name) || isMissing(row, name)) "-"
    else {
      val x = row.getDouble(row.fieldIndex(name))
      if (math.abs(x) < math.pow(10, -dp)) "$0$"
      else {
        val sign = if (x > 0) "+" else "-"
        s"$$$sign~%.${dp}f$$".format(math.abs(x))
      }
    }

  private def singleRow(table: DataFrame): Row = {
    val rows = table.take(2)
    require(rows.length == 1,
      s"table must be a single-row frame, got ${rows.length} rows")
    rows(0)
  }

  /** Study-1 row: `platform &&& v1 & ... & v8 \\` with the first value
    * `\hspace{5pt}`-indented (helpers.py:171-195). */
  def table1Row(table: DataFrame, platform: String,
      cols: Seq[String] = Table1Cols, dp: Int = 3): String = {
    val row = singleRow(table)
    val values = cols.map(fmt(row, _, dp)) match {
      case head +: tail => (s"\\hspace{5pt} $head") +: tail
      case empty        => empty
    }
    s"$platform &&& " + values.mkString(" & ") + " \\\\"
  }

  /** Study-2 baseline row: gray header + mean/CV stats with em-dash
    * placeholders in the delta slots (helpers.py:295-297). */
  def table2BaselineRow(table: DataFrame, dp: Int = 3): String = {
    val row = singleRow(table)
    "\\multicolumn{5}{c}{\\rowcolor{gray!25} (Baseline)} & " +
      s"${fmt(row, "mean_runtime_avg", dp)} & " +
      "\\multicolumn{1}{c}{\\textbf{—}} & " +
      s"${fmt(row, "cv_avg", dp)} & " +
      s"${fmt(row, "cv_p50", dp)} & " +
      s"${fmt(row, "cv_p99", dp)} & " +
      "\\textbf{—} & \\textbf{—} & \\textbf{—} \\\\"
  }

  /** Study-2 factor row: bulleted label, absolute values, and the
    * signed percentage deltas (helpers.py:300-316). Expects the
    * columns of [[TraceAnalytics.configDelta]] joined beside the
    * variant's absolute stats. */
  def table2DeltaRow(table: DataFrame, factorName: String,
      dp: Int = 3): String = {
    val row = singleRow(table)
    s"& \\textbullet $factorName & " +
      s"${fmt(row, "mean_runtime_avg", dp)} & " +
      s"${fmtDelta(row, "delta_mean_runtime_avg", dp)} & " +
      s"${fmt(row, "cv_avg", dp)} & " +
      s"${fmt(row, "cv_p50", dp)} & " +
      s"${fmt(row, "cv_p99", dp)} & " +
      s"${fmtDelta(row, "delta_cv_avg", dp)} & " +
      s"${fmtDelta(row, "delta_cv_p50", dp)} & " +
      s"${fmtDelta(row, "delta_cv_p99", dp)} \\\\"
  }
}
