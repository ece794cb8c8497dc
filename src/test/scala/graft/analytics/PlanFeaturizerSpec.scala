package graft.analytics

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class PlanFeaturizerSpec extends SparkSpec {

  test("featurize emits reference-vocab nodes for a scan-join-agg plan") {
    val li = Tables.load(spark, sfSmoke, "lineitem")
    val o = Tables.load(spark, sfSmoke, "orders")
    val q = li.join(broadcast(o), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_quantity") > 10)
      .groupBy("l_returnflag").agg(sum("l_quantity").as("s"))
    q.collect() // materialize so executedPlan is final
    val (nodes, edges) = PlanFeaturizer.featurize(spark, q)
    val ops = nodes.select("opname").collect().map(_.getString(0)).toSet
    assert(ops.contains("ScanFilterProject"), s"got $ops")
    assert(ops.contains("InnerJoin_REPLICATED"), s"got $ops")
    assert(ops.exists(_.startsWith("Aggregate")), s"got $ops")
    // edge set forms a tree: n-1 edges for n nodes, no self loops
    val n = nodes.count()
    assert(edges.count() == n - 1)
    assert(edges.filter(col("src") === col("dst")).count() == 0)
  }

  test("full outer join maps to a PARTITIONED join node") {
    val q = graft.operators.Relational.queries("join_full_outer")(spark, sfSmoke)
    q.collect()
    val (nodes, _) = PlanFeaturizer.featurize(spark, q)
    val ops = nodes.select("opname").collect().map(_.getString(0)).toSet
    assert(ops.contains("FullJoin_PARTITIONED"), s"got $ops")
    assert(ops.contains("LocalExchange_HASH"), s"got $ops")
  }

  test("predicate and aggregation vocab extracted per node") {
    val li = Tables.load(spark, sfSmoke, "lineitem")
    val q = li.filter(col("l_quantity") > 10 &&
        (col("l_returnflag") === "R" || col("l_returnflag") === "A"))
      .groupBy("l_linestatus")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("s"))
    val (nodes, _) = PlanFeaturizer.featurize(spark, q)
    val rows = nodes.collect()
    val filterNode = rows.find(_.getString(1) == "FilterProject")
      .orElse(rows.find(_.getString(1) == "ScanFilterProject")).get
    val predOps = filterNode.getMap[String, Int](6)
    assert(predOps.getOrElse("=", 0) >= 2)    // two equality disjuncts
    assert(predOps.getOrElse("OR", 0) >= 1)
    assert(predOps.getOrElse("CMP", 0) >= 1)  // l_quantity > 10
    assert(filterNode.getInt(8) > 0)          // literal_feature
    val aggNode = rows.filter(_.getString(1).startsWith("Aggregate"))
    assert(aggNode.exists(_.getSeq[String](7).contains("COUNT")))
    assert(aggNode.exists(_.getSeq[String](7).contains("SUM")))
  }

  test("node features carry non-negative log1p row estimates") {
    val q = Tables.load(spark, sfSmoke, "customer").filter(col("c_custkey") > 5)
    val (nodes, _) = PlanFeaturizer.featurize(spark, q)
    assert(nodes.filter(col("log1p_est_rows") < 0).count() == 0)
    assert(nodes.filter(col("tuple_width_bytes") <= 0).count() == 0)
  }
}
