package graft

/** Suite-wide physical-plan quality gate: every oracle query's plan is
  * asserted free of the two silent scale-killers — cartesian products
  * and nested-loop joins — unless the query is on the explicit
  * allowlist of shapes where an unkeyed join is the CORRECT plan
  * (single-row aggregate combinations, broadcast-small-side ANN
  * scoring, deliberate cross joins). A new query that accidentally
  * drops its equi key fails here at sf0.001 instead of melting at
  * 100 TB.
  */
class PlanQualitySpec extends SparkSpec {

  /** Queries where an unkeyed join IS the intended plan; every entry
    * must keep at least one side tiny (one-row aggregates, a
    * broadcast probe set, or an explicit cross-join fixture). */
  private val intendedUnkeyed: Set[String] = Set(
    "join_cross",            // the CROSS JOIN operator itself (5x3 dims)
    "tpcds_q90_count_ratio", // ratio of two one-row COUNT subqueries
    "carbon_window",         // one-row CI bounds frame attached to the grid
    "config_delta",          // two one-row config aggregates compared
    "sched_realised_carbon", // one-row schedule summary x prefix frame
    "uncorrelated_scalar_subquery", // one-row aggregate attached to the fact
    "tpcds_q88_band_counts", // 8-way cross of one-row COUNT aggregates
    "tpcds_q28_band_probes", // 6 one-row band probes cross-joined
    "tpcds_q61_promo_ratio", // promo/total: two one-row aggregates crossed
    "curate_mix_temperature" // one-row pow-sum normalizer crossed onto per-domain counts
  )

  test("no oracle query plans a cartesian/nested-loop join unintentionally") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sfSmoke).queryExecution.executedPlan.toString
        val unkeyed = plan.contains("CartesianProduct") ||
          plan.contains("BroadcastNestedLoopJoin")
        if (unkeyed && !intendedUnkeyed.contains(name)) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unintended cartesian/nested-loop joins in: $offenders")
  }

  test("allowlist stays minimal: every listed query still plans unkeyed") {
    // if an allowlisted query stops needing the exemption, shrink the
    // list rather than letting it mask future regressions
    val stale = intendedUnkeyed.toSeq.sorted.filterNot { name =>
      val plan = SparkEntry.queries(name)(spark, sfSmoke)
        .queryExecution.executedPlan.toString
      plan.contains("CartesianProduct") ||
        plan.contains("BroadcastNestedLoopJoin")
    }
    assert(stale.isEmpty, s"allowlist entries no longer unkeyed: $stale")
  }

  /** Queries where a single-partition (unpartitioned) window IS the
    * intended plan; every entry must run the global window over an
    * already-aggregated frame bounded by group cardinality, not by raw
    * input rows. */
  private val intendedGlobalWindow: Set[String] = Set(
    "tpcds_q44_dual_ranks",  // dual global ranks over the per-supplier aggregate
    "sqlx_chained_cte_ma3"   // 3-month moving average over the monthly frame
  )

  test("no oracle query plans an unpartitioned WindowExec unintentionally") {
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    def globalWindows(name: String): Seq[String] =
      SparkEntry.queries(name)(spark, sfSmoke)
        .queryExecution.sparkPlan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w.nodeName
          case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w.nodeName
        }
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(intendedGlobalWindow.contains)
      .filter(globalWindows(_).nonEmpty)
    assert(offenders.isEmpty,
      s"unpartitioned global windows (single-task sort at scale) in: $offenders")
    // keep the allowlist honest too
    val stale = intendedGlobalWindow.toSeq.sorted
      .filter(globalWindows(_).isEmpty)
    assert(stale.isEmpty, s"global-window allowlist entries now clean: $stale")
  }

  test("no oracle query caches a stray InMemoryTableScan") {
    val cached = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sfSmoke).queryExecution.executedPlan.toString
        if (plan.contains("InMemoryTableScan")) Some(name) else None
    }
    assert(cached.isEmpty, s"unexpected cached scans in: $cached")
  }
}
