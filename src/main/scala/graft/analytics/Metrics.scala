package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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

  private def pairs(s: SparkSession, dir: String): DataFrame = {
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

  /** Q-error = max(y,ŷ)/max(min(y,ŷ),1e-3), positives only, P50/P99. */
  private val metricQerror: Q = (s, dir) => {
    val p = pairs(s, dir).filter(col("pred") > 0 && col("label") > 0)
    p.select((greatest(col("pred"), col("label")) /
        greatest(least(col("pred"), col("label")), lit(1e-3))).as("qerr"))
      .agg(
        expr("percentile(qerr, 0.5)").as("p50_qerr"),
        expr("percentile(qerr, 0.99)").as("p99_qerr"),
        count(lit(1)).as("n"))
  }

  val queries: Map[String, Q] = Map(
    "metric_mae"    -> metricMae,
    "metric_qerror" -> metricQerror,
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
  )
}
