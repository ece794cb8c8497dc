package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.Tables
import graft.functions.Exact._

/** Prediction-quality metrics (SURVEY.md §2.D group 3): MAE and
  * Q-error percentiles exactly as the reference computes them
  * (`models/RF/train.ipynb` cell 0 `evaluate_model` /
  * `percentile_qerror`; identical math in `models/GNN/table3.ipynb`).
  *
  * The fixture queries treat o_totalprice as the "prediction" and the
  * order's summed lineitem extended price as the "label" — same
  * (pred, label) → metric dataflow as the reference's values.csv.
  */
object Metrics {
  type Q = (SparkSession, String) => DataFrame

  private[analytics] def pairs(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    val li = Tables.load(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(dsum(col("l_extendedprice")).as("label"))
    o.join(li, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_totalprice").as("pred"), col("label"))
  }

  /** Mean absolute error over (pred, label) pairs. */
  private val metricMae: Q = (s, dir) =>
    pairs(s, dir).agg(davg(abs(col("pred") - col("label"))).as("mae"))

  /** Q-error = max(y,ŷ)/max(min(y,ŷ),1e-3), positives only, P50/P99 —
    * the EXACT-percentile oracle twin, kept solely for DuckDB parity
    * (`quantile_cont` is exact). Do NOT call this at corpus scale:
    * exact global `percentile` pulls every value into one aggregation
    * buffer (14.7×/decade measured at sf10, the suite's worst step —
    * a documented anti-pattern twin, BASELINE.md). [[qerrorApprox]]
    * is THE default q-error report; this form exists for the gate. */
  private val metricQerror: Q = (s, dir) => {
    val p = pairs(s, dir).filter(col("pred") > 0 && col("label") > 0)
    p.select((greatest(col("pred"), col("label")) /
        greatest(least(col("pred"), col("label")), lit(1e-3))).as("qerr"))
      .agg(
        expr("percentile(qerr, 0.5)").as("p50_qerr"),
        expr("percentile(qerr, 0.99)").as("p99_qerr"),
        count(lit(1)).as("n"))
  }

  /** THE default q-error report (the r7 `simHashNearDups` precedent:
    * sketch form is the production default, exact form stays the
    * oracle twin): `percentile_approx` — a mergeable bounded-state
    * rank sketch — instead of the exact `percentile` the gated twin
    * pays, whose single global aggregation buffer is corpus-sized at
    * 100 TB (measured: 14.7×/decade at sf10 and 112.3 s vs this
    * form's 9.8 s at 5.2×/decade — BASELINE.md r8). Accuracy 10k
    * bounds rank error at ~0.01% — far inside the reference's
    * reported precision. Callers at any real scale use this; the
    * exact `metric_qerror` exists only because DuckDB's
    * `quantile_cont` gate needs a deterministic exact twin. */
  def qerrorApprox(s: SparkSession, dir: String,
      accuracy: Int = 10000): DataFrame = {
    val p = pairs(s, dir).filter(col("pred") > 0 && col("label") > 0)
    p.select((greatest(col("pred"), col("label")) /
        greatest(least(col("pred"), col("label")), lit(1e-3))).as("qerr"))
      .agg(
        percentile_approx(col("qerr"), lit(0.5), lit(accuracy))
          .as("p50_qerr"),
        percentile_approx(col("qerr"), lit(0.99), lit(accuracy))
          .as("p99_qerr"),
        count(lit(1)).as("n"))
  }

  // --------------------------------------------- GNN val-list parsing

  /** Parse a stringified float list `"[1.0, 2.5, …]"` into
    * `array<double>` — the Spark twin of `ast.literal_eval` in
    * `models/GNN/table3.ipynb` cell 0 (`load_val_lists`). */
  def parseValList(c: Column): Column = from_json(c, ArrayType(DoubleType))

  /** Load a GNN results CSV (columns `val_labels`/`val_preds` holding
    * stringified prediction lists), select row `rowIdx`, and explode to
    * one (idx, label, pred) row per element — `load_val_lists` +
    * the zip the notebook's numpy math implies. The CSV is a one-row
    * metadata artifact, so the single-partition coalesce is the
    * legitimate shape (not a distributed scan). */
  def loadValLists(spark: SparkSession, csvPath: String,
      rowIdx: Int = 0): DataFrame =
    spark.read.option("header", "true").option("escape", "\"").csv(csvPath)
      .coalesce(1).withColumn("__rid", monotonically_increasing_id())
      .filter(col("__rid") === rowIdx)
      .select(posexplode(arrays_zip(
          parseValList(col("val_labels")).as("label"),
          parseValList(col("val_preds")).as("pred")))
        .as(Seq("idx", "lp")))
      .select(col("idx"), col("lp.label").as("label"), col("lp.pred").as("pred"))

  /** table3.ipynb `compute_first_three_columns` over exploded val
    * lists: positive-mask → MAE + P50/P99 q-error. The fixture builds
    * the stringified lists from the (pred, label) pairs frame (sorted
    * by order key), round-trips them through [[parseValList]], and
    * computes the metrics — the full parse→explode→metric dataflow. */
  private val metricGnnLists: Q = (s, dir) => {
    // the notebook's val-list artifact holds ~1k values; the 1-in-100
    // order subset keeps the fixture at that scale instead of
    // round-tripping every order through one multi-MB string row
    val p = pairs(s, dir).filter(col("o_orderkey") % 100 === 0)
    def listStr(v: Column, key: Column): Column =
      concat(lit("["), concat_ws(", ",
        transform(
          array_sort(collect_list(struct(key.as("k"), v.cast("double").as("v")))),
          x => x.getField("v").cast("string"))), lit("]"))
    val strs = p.agg(
      listStr(col("label"), col("o_orderkey")).as("val_labels"),
      listStr(col("pred"), col("o_orderkey")).as("val_preds"))
    val exploded = strs.select(posexplode(arrays_zip(
        parseValList(col("val_labels")).as("label"),
        parseValList(col("val_preds")).as("pred"))).as(Seq("idx", "lp")))
      .select(col("lp.label").as("label"), col("lp.pred").as("pred"))
      .filter(col("label") > 0 && col("pred") > 0)
    exploded
      .select(col("label"), col("pred"),
        (greatest(col("pred"), col("label")) /
          greatest(least(col("pred"), col("label")), lit(1e-3))).as("qerr"))
      .agg(
        davg(abs(col("pred") - col("label"))).as("mae"),
        expr("percentile(qerr, 0.5)").as("p50_qerr"),
        expr("percentile(qerr, 0.99)").as("p99_qerr"),
        count(lit(1)).as("n"))
  }

  val queries: Map[String, Q] = Map(
    "metric_mae"       -> metricMae,
    "metric_qerror"    -> metricQerror,
    "metric_gnn_lists" -> metricGnnLists,
  )

  private val pairsSql =
    s"""SELECT o_orderkey, o_totalprice AS pred, label
       |FROM orders JOIN (
       |  SELECT l_orderkey, ${sqlSum("l_extendedprice")} AS label
       |  FROM lineitem GROUP BY l_orderkey) li
       |ON o_orderkey = l_orderkey""".stripMargin

  val oracles: Map[String, String] = Map(
    "metric_mae" ->
      s"""SELECT ${sqlAvg("ABS(pred - label)")} AS mae
         |FROM ($pairsSql)""".stripMargin,

    "metric_qerror" ->
      s"""SELECT quantile_cont(qerr, 0.5) AS p50_qerr,
         |  quantile_cont(qerr, 0.99) AS p99_qerr,
         |  COUNT(*) AS n
         |FROM (
         |  SELECT GREATEST(pred, label)
         |         / GREATEST(LEAST(pred, label), 1e-3) AS qerr
         |  FROM ($pairsSql)
         |  WHERE pred > 0 AND label > 0)""".stripMargin,

    "metric_gnn_lists" ->
      s"""WITH pairs AS (
         |  SELECT * FROM ($pairsSql) WHERE o_orderkey % 100 = 0),
         |strs AS (
         |  SELECT '[' || string_agg(CAST(CAST(label AS DOUBLE) AS VARCHAR),
         |           ', ' ORDER BY o_orderkey) || ']' AS val_labels,
         |         '[' || string_agg(CAST(CAST(pred AS DOUBLE) AS VARCHAR),
         |           ', ' ORDER BY o_orderkey) || ']' AS val_preds
         |  FROM pairs),
         |lists AS (
         |  SELECT list_transform(string_split(trim(val_labels, '[]'), ', '),
         |           x -> CAST(x AS DOUBLE)) AS ll,
         |         list_transform(string_split(trim(val_preds, '[]'), ', '),
         |           x -> CAST(x AS DOUBLE)) AS pl
         |  FROM strs),
         |zipped AS (
         |  SELECT unnest(ll) AS label, unnest(pl) AS pred FROM lists),
         |exploded AS (
         |  SELECT label, pred FROM zipped WHERE label > 0 AND pred > 0)
         |SELECT ${sqlAvg("ABS(pred - label)")} AS mae,
         |  quantile_cont(qerr, 0.5) AS p50_qerr,
         |  quantile_cont(qerr, 0.99) AS p99_qerr,
         |  COUNT(*) AS n
         |FROM (
         |  SELECT label, pred,
         |    GREATEST(pred, label) / GREATEST(LEAST(pred, label), 1e-3) AS qerr
         |  FROM exploded)""".stripMargin,
  )
}
