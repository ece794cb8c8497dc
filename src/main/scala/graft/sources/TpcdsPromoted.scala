package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** TPC-DS-shaped workload queries promoted into the oracle gate
  * (VERDICT r1 item 4): the SQL files are written in the common
  * Spark/DuckDB dialect (decimal-exact sums cast to DOUBLE at the
  * edge, BIGINT years, total ORDER BY under LIMIT), so ONE text is
  * both the Spark query and its own oracle — exactly how the
  * reference runs `q*.sql` against Trino and any checker would run
  * them against DuckDB (reference run_workload.py:26-30).
  */
object TpcdsPromoted {

  type Q = (SparkSession, String) => DataFrame

  /** Resolved like SPARK_GRAFT_SF_DIR: sysprop, then env var, then
    * the in-repo default — so outside this container a caller can
    * point at their checkout instead of hitting a missing-path error
    * at first use. */
  private val qdir = sys.props.get("graft.workload.dir")
    .orElse(sys.env.get("SPARK_GRAFT_WORKLOAD_DIR"))
    .getOrElse("/root/repo/workloads/tpcds_like")

  /** q6 = q9-shape CASE-on-scalar-subqueries; q8 = q64-shape 9-table
    * star self-joined on consecutive years; q9 = q23-shape multi-CTE
    * HAVING + IN. */
  private val promoted = Seq(
    "tpcds_q9_case_subqueries"  -> "q6",
    "tpcds_q64_star_selfjoin"   -> "q8",
    "tpcds_q23_cte_having_in"   -> "q9",
    "tpcds_q44_dual_ranks"      -> "q22",
    "tpcds_q90_count_ratio"     -> "q25",
    "tpcds_q98_revenue_share"   -> "q26",
    "tpcds_q50_shiplag_pivot"   -> "q39",
    "tpcds_q87_except_count"    -> "q40",
    "tpcds_q97_channel_overlap" -> "q41",
    // round-3 promotions from the widened corpus (files q55-q99):
    "tpcds_q3_star_probe"       -> "q55",
    "tpcds_q30_return_outliers" -> "q66",
    "tpcds_q77_channel_net"     -> "q76",
    "sqlx_grouping_sets_mixed"  -> "q88",
    "sqlx_last_status_cohorts"  -> "q92",
    "sqlx_distinct_case_buyers" -> "q97",
    // late-r3 promotions: the plan-asserted heavy shapes
    "tpcds_q88_band_counts"     -> "q7",  // 8-way cross of 1-row counts
    "tpcds_q14_channel_intersect" -> "q10", // INTERSECT + threshold + ROLLUP
    "tpcds_q8_preferred_nations"  -> "q57", // INTERSECT inside IN
    "tpcds_q28_band_probes"     -> "q65", // 6 band probes cross-joined
    "sqlx_funnel_interval_join" -> "q84", // event-time interval self-join
    "sqlx_notin_null_guard"     -> "q93", // null-aware anti join
    "sqlx_kitchen_sink_rollup"  -> "q99", // star + ROLLUP + windows + top-k
    // batch 2: the SQL families the gate didn't cover yet
    "tpcds_q2_week_ratio"       -> "q49", // week-over-year self-join ratio
    "tpcds_q71_hourly_channels" -> "q73", // EXTRACT(HOUR) over unioned slices
    "tpcds_q76_null_channels"   -> "q43", // null-column channel union
    "sqlx_sessionize_gap30"     -> "q83", // LAG-gap sessionization (batch twin)
    "sqlx_rank_filter_topk"     -> "q85", // grouped top-k via rank filter
    "sqlx_range_interval_frame" -> "q91", // RANGE BETWEEN INTERVAL frame
    // batch 3: the canon's remaining headline shapes
    "tpcds_q1_ctr_threshold"    -> "q1",  // CTE + correlated avg threshold
    "tpcds_q16_exists_anti"     -> "q4",  // EXISTS + NOT EXISTS + interval
    "tpcds_q67_rollup_rank"     -> "q12", // rollup hierarchy + rank-in-level
    "tpcds_q95_multi_supplier"  -> "q13", // twin-lineitem EXISTS correlation
    "tpcds_q55_brand_probe"     -> "q54", // minimal dim-agg probe
    "sqlx_named_window_nth"     -> "q96", // named WINDOW first/nth_value
    // round-3 continuation: the full-canon sweep. These files were
    // already written decimal-exact with deterministic output
    // (rows are hash-compared after a column sort, so ORDER BY
    // totality only matters under LIMIT) — promoted verbatim.
    "tpcds_q17_cheap_quantity"    -> "q11", // correlated per-part avg threshold
    "tpcds_q78_return_ratio"      -> "q14", // fact-fact LEFT JOIN null retention
    "tpcds_q5_channel_rollup"     -> "q16", // CASE-channel single scan + ROLLUP (r5 collapse)
    "tpcds_q31_quarter_growth"    -> "q17", // 4-arm consecutive-quarter self-join
    "tpcds_q49_worst_returns"     -> "q19", // dual dense ranks + UNION distinct
    "tpcds_q85_band_refunds"      -> "q20", // disjunctive bands + CASE refund
    "tpcds_q58_equal_share"       -> "q24", // equal-share screen, conditional-agg single scan (r5)
    "tpcds_q35_cond_stats"        -> "q27", // multi-conditional group stats
    "tpcds_q29_sale_return_cycle" -> "q28", // three-arm fact self-join
    "tpcds_q11_growth_segments"   -> "q31", // two-channel two-year growth
    "tpcds_q33_channel_brands"    -> "q32", // channel aggs folded to one scan (r5 collapse)
    "tpcds_q41_attr_bands"        -> "q33", // EXISTS over OR-band attributes
    "tpcds_q34_order_size_band"   -> "q34", // frequency-band cohort
    "tpcds_q6_above_category_avg" -> "q35", // correlated category-avg screen
    "tpcds_q54_cohort_follow"     -> "q36", // cohort + following-window spend
    "tpcds_q93_net_spend"         -> "q37", // return-adjusted spend (twin join)
    "tpcds_q15_geo_or_value"      -> "q38", // geography OR high-value filter
    "tpcds_q32_excess_discount"   -> "q42", // correlated excess-discount sum
    "tpcds_q65_min_avg_screen"    -> "q45", // agg-of-agg min-average screen
    "tpcds_q46_location_mismatch" -> "q46", // customer/supplier nation mismatch
    "tpcds_q80_netted_rollup"     -> "q47", // netted channel ROLLUP
    "tpcds_q96_pinpoint_count"    -> "q48", // selective-scan pinpoint count
    "tpcds_q22_hierarchy_avg"     -> "q50", // product-hierarchy ROLLUP avg
    "tpcds_q27_grouping_sets"     -> "q51", // explicit GROUPING SETS levels
    "tpcds_q37_screened_parts"    -> "q52", // price band + IN-window screen
    "tpcds_q45_geo_membership"    -> "q53", // geo OR part-set membership
    "tpcds_q10_exists_cohort"     -> "q58", // EXISTS over UNION ALL channels
    "tpcds_q19_brand_mismatch_rev" -> "q61", // buyer/supplier nation mismatch
    "tpcds_q40_netted_split"      -> "q67", // before/after netted CASE sums
    "tpcds_q61_promo_ratio"       -> "q71", // one-row cross-join ratio
    "tpcds_q69_exists_gates"      -> "q72", // EXISTS + two NOT EXISTS gates
    "tpcds_q72_demand_jump"       -> "q74", // LAG week supply vs demand
    "tpcds_q74_growth_ratio"      -> "q75", // 4-way per-customer growth join
    "tpcds_q79_max_order_pick"    -> "q77", // ROW_NUMBER per-group max pick
    "tpcds_q83_return_share"      -> "q79", // date-IN-subquery two-arm share
    "tpcds_q84_lookup"            -> "q80", // pure lookup projection + top-k
    "tpcds_q86_rollup_rank"       -> "q81", // ROLLUP + rank-within-level
    "tpcds_q91_loss_bands"        -> "q82", // demographic loss bands
    "sqlx_exact_median"           -> "q86", // dual ROW_NUMBER exact median
    "sqlx_doc_profile"            -> "q87", // documents metadata QA scan
    "sqlx_anti_return_parts"      -> "q89", // NOT EXISTS anti-join screen
    "sqlx_nation_supplier_anti"   -> "q98", // correlated anti join w/ join inside
    // batch 4: the final sweep — every remaining canon file. The
    // FP-risky ones (raw double sums/AVGs, window share over doubles)
    // were first rewritten decimal-exact in the files themselves;
    // q44/q68 carry engine-divergent weekday numbering and are gated
    // via dialect twins below instead.
    "tpcds_q36_hier_rank"         -> "q2",  // ROLLUP + rank within subtotal level
    "tpcds_q51_fullouter_cummax"  -> "q3",  // FULL OUTER aggs + cumulative max
    "tpcds_q38_intersect_union"   -> "q5",  // INTERSECT + threshold + UNION rollup
    "tpcds_q47_monthly_deviation" -> "q15", // month vs year-avg window + lag/lead
    "tpcds_q39_cv_flicker"        -> "q18", // integer-exact CV screen, month pairs
    "tpcds_q21_pivot_ratio"       -> "q21", // before/after pivot-date ratio band
    "tpcds_q66_month_pivot"       -> "q23", // 12-column CASE month pivot
    "tpcds_q75_yoy_decline"       -> "q29", // channel union, consecutive-year drop
    "tpcds_q48_band_sum"          -> "q30", // flat disjunctive band aggregate
    "tpcds_q7_demo_averages"      -> "q56", // per-part averages under demo filters
    "tpcds_q13_disjunct_bands"    -> "q59", // one agg under OR-ed band predicates
    "tpcds_q18_geo_rollup_avg"    -> "q60", // averages at every ROLLUP level
    "tpcds_q20_class_share"       -> "q62", // class revenue share via window
    "tpcds_q24_selfref_threshold" -> "q63", // multi-ref CTE avg threshold
    "tpcds_q26_brand_averages"    -> "q64", // catalog twin of the q7 probe
    "tpcds_q53_quarter_deviation" -> "q69", // quarter vs all-quarter window avg
    "tpcds_q57_brand_deviation"   -> "q70", // monthly lag/lead + year-avg screen
    "tpcds_q81_region_returns"    -> "q78", // returns above 1.01x region average
    "sqlx_chained_cte_ma3"        -> "q90") // 3 chained CTEs, moving average

  // one directory scan for all lookups — queries re-invoke sqlText per
  // bench/verify run, and re-listing 48 files inside the timed window
  // is pure overhead
  private lazy val texts: Map[String, String] =
    Ingest.loadQueryFiles(qdir).toMap

  private def sqlText(file: String): String = texts(file)

  /** Spark's DAYOFWEEK / EXTRACT(DOW) number Sunday=1..7 while DuckDB
    * numbers Sunday=0..6, so the DuckDB twin of a weekday-pivot file is
    * the SAME text with every weekday constant shifted down by one —
    * derived mechanically so the twin can never drift from the file. */
  private def dowShifted(file: String): String = {
    val spark = sqlText(file)
    val pat = """(DAYOFWEEK\(o_orderdate\)|EXTRACT\(DOW FROM o_orderdate\)) = (\d)""".r
    pat.replaceAllIn(spark, m =>
      s"dayofweek(o_orderdate) = ${m.group(2).toInt - 1}")
  }

  /** Dialect-split promotions: the Spark text uses surface DuckDB
    * lacks (RLIKE, LATERAL VIEW posexplode) or numbers differently
    * (weekdays), so the oracle is a DuckDB twin instead of the same
    * text — the bridge a real cross-engine checker needs for
    * non-portable SQL. Both sides keep exact arithmetic (integer sums,
    * micro-int squares, decimal money sums) so the hash gate stays
    * bit-stable. */
  private lazy val dialectPromoted: Seq[(String, String, String)] = Seq(
    ("tpcds_q59_wow_ratio", "q44", dowShifted("q44")),
    ("tpcds_q43_dow_pivot", "q68", dowShifted("q68")),
    ("sqlx_regex_doc_tally", "q94",
      """SELECT lang, COUNT(*) AS matching,
        |  CAST(SUM(CAST(n_chars AS BIGINT)) AS DOUBLE) / COUNT(n_chars)
        |    AS avg_chars
        |FROM documents
        |WHERE regexp_matches(text, 'spark')
        |  AND regexp_matches(text, 'stream|vector')
        |GROUP BY lang
        |ORDER BY lang""".stripMargin),
    ("sqlx_embed_centroid_norm", "q95",
      """SELECT label,
        |  CAST(SQRT(CAST(SUM(CAST(m_num AS DECIMAL(19,0))
        |                     * CAST(m_num AS DECIMAL(19,0))) AS DOUBLE))
        |       / (n * 1e6) AS DOUBLE) AS centroid_norm
        |FROM (
        |  SELECT label, i AS pos,
        |    SUM(CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT))
        |      AS m_num,
        |    COUNT(*) AS n
        |  FROM embeddings, generate_series(1, 64) t(i)
        |  GROUP BY label, i)
        |GROUP BY label, n
        |ORDER BY label""".stripMargin))

  val queries: Map[String, Q] =
    (promoted.map { case (name, file) => name -> file } ++
      dialectPromoted.map { case (name, file, _) => name -> file })
      .map { case (name, file) =>
        name -> ((s: SparkSession, dir: String) => {
          Tables.registerAll(s, dir)
          s.sql(sqlText(file))
        }): (String, Q)
      }.toMap

  val oracles: Map[String, String] =
    promoted.map { case (name, file) => name -> sqlText(file) }.toMap ++
      dialectPromoted.map { case (name, _, oracle) => name -> oracle }.toMap
}
