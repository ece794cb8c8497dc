package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.functions.Exact._

/** Advanced SQL surface (SURVEY.md §2.A rows 15-23, 31-41): rollup +
  * grouping(), distinct aggregation, stddev, the window-function family,
  * scalar-expression semantics (CASE/CAST/COALESCE/strings/LIKE,
  * decimal math, date+interval ranges), and scalar subqueries
  * (correlated + uncorrelated).
  *
  * Scale notes:
  *  - windows partition by a key before ordering — no global sorts over
  *    fact data except the final (post-reduction) presentation order;
  *  - window aggregates over doubles go through decimal casts so frame
  *    accumulation order (segment trees vs sequential) cannot change
  *    the result;
  *  - the correlated-subquery rewrite is the Catalyst decorrelation
  *    shape: per-key aggregate joined back on the correlation key, so
  *    the fact table is scanned twice but shuffled on the same key
  *    (one exchange reused under AQE).
  */
object Advanced {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String)(name: String): DataFrame =
    Tables.load(s, dir, name)

  // ----------------------------------------------------------- rollup
  /** Rows 17-18: GROUP BY ROLLUP with grouping() disambiguation
    * (q36/q70/q86 shape). Subtotal rows carry null keys; ordering pins
    * nulls first explicitly on both engines. */
  private val aggRollup: Q = (s, dir) => {
    val li = t(s, dir)("lineitem")
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_rows"),
        (grouping(col("l_returnflag")) + grouping(col("l_linestatus")))
          .cast("int").as("lochierarchy"))
      .orderBy(col("lochierarchy").desc,
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  /** Row 18: grouping()/grouping_id() distinguishing subtotal levels
    * (q36.sql:5's `grouping(i_category)+grouping(i_class) AS
    * lochierarchy` and the rank-within-parent partition key). DuckDB
    * mirrors grouping_id() as GROUPING(a)*2+GROUPING(b) — same bit
    * order as Spark's builtin. */
  private val aggGroupingFn: Q = (s, dir) => {
    val o = t(s, dir)("orders")
    o.rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        dsum(col("o_totalprice")).as("sum_price"),
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_prio"),
        grouping_id().cast("int").as("gid"))
      .orderBy(col("gid").desc,
        col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)
  }

  /** HLL++ sketch distinct counts — the scale path where §2.A row 16's
    * exact multi-distinct (Expand ×N shuffle) is too hot: one pass, no
    * Expand, mergeable partials. Not in the reference corpus (SURVEY
    * §2.A notes approx/HLL functions absent), and the sketch value
    * itself is engine-specific — so the DRIVER-GATED columns are the
    * exact counts plus `*_within_tol` booleans asserting the sketch
    * lands within 10% relative error of exact; the DuckDB oracle
    * computes the exact side and expects TRUE. AdvancedSpec bounds the
    * raw sketch error too. */
  private val aggApproxDistinct: Q = (s, dir) => {
    val li = t(s, dir)("lineitem")
    def withinTol(approx: org.apache.spark.sql.Column,
        exact: org.apache.spark.sql.Column) =
      abs(approx.cast("double") - exact.cast("double")) /
        exact.cast("double") < 0.1
    li.groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        approx_count_distinct(col("l_suppkey")).as("approx_supps"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_suppkey")).as("exact_supps"))
      .select(col("l_returnflag"), col("exact_parts"), col("exact_supps"),
        withinTol(col("approx_parts"), col("exact_parts")).as("parts_within_tol"),
        withinTol(col("approx_supps"), col("exact_supps")).as("supps_within_tol"))
      .orderBy("l_returnflag")
  }

  /** Approximate-quantile sketch beside exact rank statistics — the
    * distribution-profiling twin of [[aggApproxDistinct]]: at 100 TB a
    * per-group exact quantile needs a full sort, while
    * `percentile_approx` (Greenwald-Khanna family) is one mergeable
    * sketch pass with rank error ≤ n/accuracy. The sketch VALUE is
    * engine-specific, so the gated columns are the exact rank-selected
    * quantiles (value at rank ⌈q·n⌉, identical on any engine) plus
    * `*_within_tol` booleans asserting the sketch lands between the
    * values at ranks ⌈q·n⌉±4 (accuracy=10000, group n≈20k → rank error
    * ≤ 2, margin ×2); the DuckDB oracle computes the exact side and
    * expects TRUE. The fixture's rank pass is a per-group window —
    * at scale the exact side would route through
    * [[graft.operators.Scale.rowNumberDistributed]]; the sketch is the
    * production path. */
  private val aggApproxQuantile: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val ranked = t(s, dir)("lineitem")
      .select(col("l_returnflag").as("flag"), col("l_quantity").as("v"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("flag").orderBy("v")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("flag")))
    val quantiles = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)
    def target(q: Double) = ceil(col("n") * q).cast("long")
    val aggs = quantiles.flatMap { case (l, q) =>
      Seq(
        max(when(col("rn") === target(q), col("v"))).as(s"exact_$l"),
        max(when(col("rn") === greatest(lit(1L), target(q) - 4), col("v")))
          .as(s"lo_$l"),
        max(when(col("rn") === least(col("n"), target(q) + 4), col("v")))
          .as(s"hi_$l"),
        percentile_approx(col("v"), lit(q), lit(10000)).as(s"approx_$l"))
    }
    ranked.groupBy("flag").agg(aggs.head, aggs.tail: _*)
      .select(col("flag").as("l_returnflag") +:
        quantiles.map { case (l, _) => col(s"exact_$l") } ++:
        quantiles.map { case (l, _) =>
          (col(s"approx_$l") >= col(s"lo_$l") &&
            col(s"approx_$l") <= col(s"hi_$l")).as(s"${l}_within_tol")
        }: _*)
      .orderBy("l_returnflag")
  }

  // ------------------------------------------------------- aggregates
  /** Row 16: multiple COUNT(DISTINCT) in one aggregate (q28 shape —
    * planned via Expand + two-phase aggregation). */
  private val aggCountDistinct: Q = (s, dir) => {
    t(s, dir)("lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        countDistinct(col("l_orderkey"), col("l_linenumber")).as("n_lines"))
      .orderBy("l_returnflag")
  }

  /** Row 15: stddev_samp-style statistics (q17/q39 shape), via exact
    * sums so the result is engine- and partitioning-independent. */
  private val aggStatsStddev: Q = (s, dir) => {
    t(s, dir)("lineitem")
      .groupBy("l_returnflag")
      .agg(
        davg(col("l_quantity")).as("avg_qty"),
        dstddev(col("l_quantity")).as("std_qty"),
        dstddev(col("l_extendedprice")).as("std_price"))
      .orderBy("l_returnflag")
  }

  // ---------------------------------------------------------- windows
  /** Row 20: rank() within partition + filter on the rank (q44/q67
    * top-N-per-group shape). */
  private val windowRank: Q = (s, dir) => {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    t(s, dir)("customer")
      .withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= 3)
      .select("c_nationkey", "rnk", "c_custkey", "c_acctbal")
      .orderBy("c_nationkey", "rnk", "c_custkey")
  }

  /** Row 21: windowed aggregate over an aggregate's output — q47's
    * avg(sum(...)) OVER (PARTITION BY ...) shape: per-supplier monthly
    * sums compared against the supplier's all-months average. */
  private val windowAvgOverAgg: Q = (s, dir) => {
    val li = t(s, dir)("lineitem")
    val monthly = li
      .groupBy(col("l_suppkey"),
        date_trunc("month", col("l_shipdate")).as("month"))
      .agg(dsum(col("l_quantity")).as("sum_qty"))
    val w = Window.partitionBy(col("l_suppkey"))
    monthly
      .withColumn("avg_qty",
        sum(col("sum_qty").cast(DecimalType(18, 6))).over(w).cast("double")
          / count(col("sum_qty")).over(w))
      .withColumn("dev", col("sum_qty") - col("avg_qty"))
      .select("l_suppkey", "month", "sum_qty", "avg_qty", "dev")
      .orderBy("l_suppkey", "month")
  }

  /** Row 22: cumulative frame — running total per customer over order
    * history (q51 shape), ROWS UNBOUNDED PRECEDING..CURRENT. Exact
    * decimal accumulation: segment-tree vs sequential evaluation
    * cannot diverge. */
  private val windowCumulative: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir)("orders")
      .withColumn("running_spent",
        sum(col("o_totalprice").cast(DecimalType(18, 6))).over(w)
          .cast("double"))
      .withColumn("running_max",
        max(col("o_totalprice")).over(w))
      .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice",
        "running_spent", "running_max")
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  /** Row 23: lag/lead — the idiomatic form of q47/q57's
    * self-join-on-rank previous/next-period trick. */
  private val windowLagLead: Q = (s, dir) => {
    // (l_orderkey, l_linenumber) is NOT unique in the fixtures, so
    // l_quantity joins the sort key to make the value sequence total —
    // rows still tied are then identical in every output column, so
    // lag/lead results are engine-independent as a row multiset.
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate").asc, col("l_orderkey").asc,
        col("l_linenumber").asc, col("l_quantity").asc)
    t(s, dir)("lineitem")
      .select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"), col("l_quantity"))
      .withColumn("prev_qty", lag(col("l_quantity"), 1).over(w))
      .withColumn("next_qty", lead(col("l_quantity"), 1).over(w))
      .orderBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber",
        "l_quantity")
  }

  // ------------------------------------------------------ expressions
  /** Rows 31-33: CASE WHEN + CAST + COALESCE (q36/q49/q51 shapes).
    * floor() instead of CAST(double AS INT) — the engines disagree on
    * truncate-vs-round for that cast. */
  private val exprCaseWhen: Q = (s, dir) => {
    val o = t(s, dir)("orders")
    o.select(
        col("o_orderkey"),
        when(col("o_totalprice") > 100000.0, "big")
          .when(col("o_totalprice") > 10000.0, "mid")
          .otherwise("small").as("bucket"),
        coalesce(
          when(col("o_orderstatus") === "F", col("o_totalprice")),
          lit(0.0)).as("finished_price"),
        floor(col("o_totalprice")).cast("long").as("price_floor"))
      .orderBy("o_orderkey")
  }

  /** Rows 34-36: substr / concat / upper (q8's zip-slicing shape). */
  private val stringSubstrConcat: Q = (s, dir) => {
    t(s, dir)("customer")
      .select(
        col("c_custkey"),
        substring(col("c_name"), 10, 9).as("cust_id_str"),
        concat(upper(col("c_mktsegment")), lit("_"),
          substring(col("c_name"), 1, 8)).as("seg_tag"))
      .orderBy("c_custkey")
  }

  /** Row 37: LIKE / NOT LIKE (q13/q23 + synthetic-workload shape). */
  private val stringLike: Q = (s, dir) => {
    t(s, dir)("part")
      .filter(col("p_name").like("%re%") &&
        !col("p_type").like("%ECO%") &&
        col("p_brand").like("Brand#1%"))
      .select("p_partkey", "p_name", "p_brand", "p_type")
      .orderBy("p_partkey")
  }

  /** Row 38: arithmetic with abs/round-free decimal-exact division
    * (q47's abs(sum-avg)/avg and q49-style ratios; rounding of
    * arbitrary doubles is deliberately avoided — the engines' round()
    * disagree on shortest-repr vs binary ties). */
  private val mathDecimalDiv: Q = (s, dir) => {
    t(s, dir)("lineitem")
      .groupBy("l_returnflag")
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
        dsum(col("l_quantity")).as("qty"))
      .withColumn("rev_per_unit", col("revenue") / col("qty"))
      .withColumn("markup",
        abs(col("revenue") - col("qty") * lit(100.0)) / col("revenue"))
      .orderBy("l_returnflag")
  }

  /** Row 39: date BETWEEN literal AND literal + INTERVAL '90' DAY
    * (q98 shape). The predicate pushes to the parquet scan. */
  private val dateIntervalRange: Q = (s, dir) => {
    val lo = to_timestamp(lit("1997-01-01"))
    t(s, dir)("lineitem")
      .filter(col("l_shipdate") >= lo &&
        col("l_shipdate") <= lo + expr("INTERVAL 90 DAY"))
      .groupBy(date_trunc("month", col("l_shipdate")).as("ship_month"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy("ship_month")
  }

  // -------------------------------------------------------- subqueries
  /** Row 11 (and §7.2 flagship): correlated scalar subquery — TPC-DS
    * q1's shape transposed to the fixture schema. Customers whose
    * returned-line revenue for a supplier exceeds 1.2× that supplier's
    * average, decorrelated as per-key aggregate + equi-join (exactly
    * Catalyst's RewriteCorrelatedScalarSubquery output shape). */
  private val correlatedScalarSubquery: Q = (s, dir) => {
    val li = t(s, dir)("lineitem").filter(col("l_returnflag") === "R")
    val o  = t(s, dir)("orders")
    val ctr = li
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("ctr_cust"),
        col("l_suppkey").as("ctr_supp"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("ctr_total"))
    val avgBySupp = ctr
      .groupBy(col("ctr_supp").as("avg_supp"))
      .agg((davg(col("ctr_total")) * 1.2).as("threshold"))
    val c = broadcast(t(s, dir)("customer"))
    ctr.join(avgBySupp, col("ctr_supp") === col("avg_supp"))
      .filter(col("ctr_total") > col("threshold"))
      .join(c, col("ctr_cust") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("ctr_supp"),
        col("ctr_total"))
      .orderBy(col("c_custkey").asc, col("ctr_supp").asc)
      .limit(100)
  }

  /** Row 12: uncorrelated scalar subquery — global average as a
    * one-row broadcast cross join (q32/q14 avg_sales shape). */
  private val uncorrelatedScalarSubquery: Q = (s, dir) => {
    val o = t(s, dir)("orders")
    val globalAvg = o.agg(davg(col("o_totalprice")).as("global_avg"))
    o.crossJoin(broadcast(globalAvg))
      .filter(col("o_totalprice") > col("global_avg") * 1.5)
      .select("o_orderkey", "o_custkey", "o_totalprice", "global_avg")
      .orderBy("o_orderkey")
  }

  val queries: Map[String, Q] = Map(
    "agg_rollup"                    -> aggRollup,
    "agg_grouping_fn"               -> aggGroupingFn,
    "agg_count_distinct"            -> aggCountDistinct,
    "agg_approx_distinct"           -> aggApproxDistinct,
    "agg_approx_quantile"           -> aggApproxQuantile,
    "agg_stats_stddev"              -> aggStatsStddev,
    "window_rank"                   -> windowRank,
    "window_avg_over_agg"           -> windowAvgOverAgg,
    "window_cumulative"             -> windowCumulative,
    "window_lag_lead"               -> windowLagLead,
    "expr_case_when"                -> exprCaseWhen,
    "string_substr_concat"          -> stringSubstrConcat,
    "string_like"                   -> stringLike,
    "math_decimal_div"              -> mathDecimalDiv,
    "date_interval_range"           -> dateIntervalRange,
    "correlated_scalar_subquery"    -> correlatedScalarSubquery,
    "uncorrelated_scalar_subquery"  -> uncorrelatedScalarSubquery,
  )

  val oracles: Map[String, String] = Map(
    "agg_rollup" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlSum("l_quantity")} AS sum_qty,
         |  COUNT(*) AS n_rows,
         |  CAST(GROUPING(l_returnflag) + GROUPING(l_linestatus) AS INT)
         |    AS lochierarchy
         |FROM lineitem
         |GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY lochierarchy DESC,
         |  l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""
        .stripMargin,

    "agg_grouping_fn" ->
      s"""SELECT o_orderstatus, o_orderpriority,
         |  ${sqlSum("o_totalprice")} AS sum_price,
         |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
         |  CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
         |  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
         |    AS INT) AS gid
         |FROM orders
         |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
         |ORDER BY gid DESC,
         |  o_orderstatus ASC NULLS FIRST,
         |  o_orderpriority ASC NULLS FIRST""".stripMargin,

    // The sketch values are engine-specific; the gate checks the exact
    // side plus the within-10%-relative-error contract (TRUE expected).
    // Exact rank-selected quantiles gate the values; the sketch is
    // asserted inside its rank-error contract via the booleans.
    "agg_approx_quantile" ->
      """WITH ranked AS (
        |  SELECT l_returnflag AS flag, l_quantity AS v,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_quantity) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |SELECT flag AS l_returnflag,
        |  MAX(CASE WHEN rn = CAST(CEIL(n * 0.5) AS BIGINT) THEN v END)
        |    AS exact_p50,
        |  MAX(CASE WHEN rn = CAST(CEIL(n * 0.9) AS BIGINT) THEN v END)
        |    AS exact_p90,
        |  MAX(CASE WHEN rn = CAST(CEIL(n * 0.99) AS BIGINT) THEN v END)
        |    AS exact_p99,
        |  TRUE AS p50_within_tol,
        |  TRUE AS p90_within_tol,
        |  TRUE AS p99_within_tol
        |FROM ranked GROUP BY flag ORDER BY flag""".stripMargin,

    "agg_approx_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS exact_parts,
        |  COUNT(DISTINCT l_suppkey) AS exact_supps,
        |  TRUE AS parts_within_tol,
        |  TRUE AS supps_within_tol
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
        .stripMargin,

    "agg_count_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_suppkey) AS n_supp,
        |  COUNT(DISTINCT l_partkey) AS n_part,
        |  COUNT(DISTINCT (l_orderkey, l_linenumber)) AS n_lines
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
        .stripMargin,

    "agg_stats_stddev" ->
      s"""SELECT l_returnflag,
         |  ${sqlAvg("l_quantity")} AS avg_qty,
         |  ${sqlStddev("l_quantity")} AS std_qty,
         |  ${sqlStddev("l_extendedprice")} AS std_price
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
        .stripMargin,

    "window_rank" ->
      """SELECT c_nationkey, rnk, c_custkey, c_acctbal FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    RANK() OVER (PARTITION BY c_nationkey
        |                 ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
        |  FROM customer)
        |WHERE rnk <= 3
        |ORDER BY c_nationkey, rnk, c_custkey""".stripMargin,

    "window_avg_over_agg" ->
      s"""SELECT l_suppkey, month, sum_qty, avg_qty, sum_qty - avg_qty AS dev
         |FROM (
         |  SELECT l_suppkey, month, sum_qty,
         |    CAST(SUM(CAST(sum_qty AS DECIMAL(18,6)))
         |           OVER (PARTITION BY l_suppkey) AS DOUBLE)
         |      / COUNT(sum_qty) OVER (PARTITION BY l_suppkey) AS avg_qty
         |  FROM (
         |    SELECT l_suppkey, date_trunc('month', l_shipdate) AS month,
         |      ${sqlSum("l_quantity")} AS sum_qty
         |    FROM lineitem GROUP BY l_suppkey, date_trunc('month', l_shipdate)))
         |ORDER BY l_suppkey, month""".stripMargin,

    "window_cumulative" ->
      """SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
        |    OVER (PARTITION BY o_custkey
        |          ORDER BY o_orderdate ASC, o_orderkey ASC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS running_spent,
        |  MAX(o_totalprice)
        |    OVER (PARTITION BY o_custkey
        |          ORDER BY o_orderdate ASC, o_orderkey ASC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS running_max
        |FROM orders
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "window_lag_lead" ->
      """SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_quantity,
        |  LAG(l_quantity, 1) OVER w AS prev_qty,
        |  LEAD(l_quantity, 1) OVER w AS next_qty
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey
        |             ORDER BY l_shipdate ASC, l_orderkey ASC,
        |                      l_linenumber ASC, l_quantity ASC)
        |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_quantity"""
        .stripMargin,

    "expr_case_when" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 100000.0 THEN 'big'
        |       WHEN o_totalprice > 10000.0 THEN 'mid'
        |       ELSE 'small' END AS bucket,
        |  COALESCE(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END,
        |           0.0) AS finished_price,
        |  CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "string_substr_concat" ->
      """SELECT c_custkey,
        |  substr(c_name, 10, 9) AS cust_id_str,
        |  concat(upper(c_mktsegment), '_', substr(c_name, 1, 8)) AS seg_tag
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "string_like" ->
      """SELECT p_partkey, p_name, p_brand, p_type
        |FROM part
        |WHERE p_name LIKE '%re%' AND p_type NOT LIKE '%ECO%'
        |  AND p_brand LIKE 'Brand#1%'
        |ORDER BY p_partkey""".stripMargin,

    "math_decimal_div" ->
      s"""SELECT l_returnflag, revenue, qty,
         |  revenue / qty AS rev_per_unit,
         |  ABS(revenue - qty * 100.0) / revenue AS markup
         |FROM (
         |  SELECT l_returnflag,
         |    ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |    ${sqlSum("l_quantity")} AS qty
         |  FROM lineitem GROUP BY l_returnflag)
         |ORDER BY l_returnflag""".stripMargin,

    "date_interval_range" ->
      s"""SELECT date_trunc('month', l_shipdate) AS ship_month,
         |  ${sqlSum("l_quantity")} AS sum_qty, COUNT(*) AS n
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |  AND l_shipdate <= TIMESTAMP '1997-01-01' + INTERVAL 90 DAY
         |GROUP BY date_trunc('month', l_shipdate)
         |ORDER BY ship_month""".stripMargin,

    "correlated_scalar_subquery" ->
      s"""WITH ctr AS (
         |  SELECT o_custkey AS ctr_cust, l_suppkey AS ctr_supp,
         |    ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS ctr_total
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  WHERE l_returnflag = 'R'
         |  GROUP BY o_custkey, l_suppkey)
         |SELECT c_custkey, c_name, ctr_supp, ctr_total
         |FROM ctr ctr1 JOIN customer ON ctr_cust = c_custkey
         |WHERE ctr_total > (
         |  SELECT ${sqlAvg("ctr_total")} * 1.2
         |  FROM ctr ctr2 WHERE ctr2.ctr_supp = ctr1.ctr_supp)
         |ORDER BY c_custkey ASC, ctr_supp ASC
         |LIMIT 100""".stripMargin,

    "uncorrelated_scalar_subquery" ->
      s"""SELECT o_orderkey, o_custkey, o_totalprice,
         |  (SELECT ${sqlAvg("o_totalprice")} FROM orders) AS global_avg
         |FROM orders
         |WHERE o_totalprice >
         |  (SELECT ${sqlAvg("o_totalprice")} FROM orders) * 1.5
         |ORDER BY o_orderkey""".stripMargin,
  )
}
