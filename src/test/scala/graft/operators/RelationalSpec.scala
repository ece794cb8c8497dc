package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("all relational queries run non-empty on smoke fixtures") {
    Relational.queries.foreach { case (name, q) =>
      val df = q(spark, sfSmoke)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("every query has a matching oracle") {
    assert(Relational.oracles.keySet == Relational.queries.keySet)
  }

  test("join_semi emits each order at most once") {
    val df = Relational.queries("join_semi")(spark, sfSmoke)
    assert(df.count() == df.select("o_orderkey").distinct().count())
  }

  test("join_anti and inner join partition the filtered key space") {
    val c = graft.Tables.load(spark, sfSmoke, "customer")
    val o = graft.Tables.load(spark, sfSmoke, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val anti = Relational.queries("join_anti")(spark, sfSmoke).count()
    val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .count()
    assert(anti + semi == c.count())
  }

  test("full outer join covers both key sets") {
    val df = Relational.queries("join_full_outer")(spark, sfSmoke)
    val nations = df.select("nationkey").distinct().count()
    assert(nations == df.count())
    assert(df.filter(col("n_cust") === 0 && col("n_supp") === 0).count() == 0)
  }

  test("topk_limit returns exactly 100 ordered rows") {
    val rows = Relational.queries("topk_limit")(spark, sfCorrect)
      .collect()
    assert(rows.length == 100)
    val prices = rows.map(_.getDouble(2))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("broadcast star join plans without shuffling dimension tables") {
    val df = Relational.queries("join_inner_multiway")(spark, sfSmoke)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "dims should broadcast")
  }
}
