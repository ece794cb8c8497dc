package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins._

/** Physical-plan featurizer (SURVEY.md §2.B): walks a query's
  * `executedPlan` and emits node/edge DataFrames carrying the
  * reference's GNN feature vocabulary
  * (models/GNN/Results/&lt;dataset&gt;/feature_stats.json): per-node categorical
  * `opname` mapped onto the reference's Trino operator dictionary plus
  * numeric `log1p_est_rows` / `tuple_width_bytes` from Catalyst
  * statistics. Observer code — no Catalyst rule involved (§7.4).
  */
object PlanFeaturizer {

  final case class PlanNode(id: Int, opname: String, spark_op: String,
    log1p_est_rows: Double, tuple_width_bytes: Long, n_children: Int,
    pred_ops: Map[String, Int], agg_fns: Seq[String], literal_feature: Int)
  final case class PlanEdge(src: Int, dst: Int)

  /** Per-node expression vocabulary — the reference's predicate
    * `operator` dictionary (`<>`,`=`,`AND`,`IN`,`LIKE`,`OR` —
    * feature_stats.json) plus aggregation names and a literal count
    * (`literal_feature`). */
  private def exprVocab(p: SparkPlan)
      : (Map[String, Int], Seq[String], Int) = {
    import org.apache.spark.sql.catalyst.expressions._
    val ops = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    val aggs = scala.collection.mutable.ArrayBuffer.empty[String]
    var literals = 0
    def walk(e: Expression): Unit = {
      e match {
        case Not(_: EqualTo)  => ops("<>") += 1
        case _: EqualTo | _: EqualNullSafe => ops("=") += 1
        case _: And           => ops("AND") += 1
        case _: Or            => ops("OR") += 1
        case _: In | _: InSet => ops("IN") += 1
        case _: Like          => ops("LIKE") += 1
        case _: GreaterThan | _: GreaterThanOrEqual |
             _: LessThan | _: LessThanOrEqual => ops("CMP") += 1
        case _: Literal       => literals += 1
        case ae: aggregate.AggregateExpression =>
          aggs += ae.aggregateFunction.prettyName.toUpperCase
        case _                =>
      }
      e.children.foreach(walk)
    }
    p.expressions.foreach(walk)
    (ops.toMap, aggs.toSeq.sorted, literals)
  }

  /** Map a Spark physical node onto the reference's Trino opname vocab
    * (feature_stats.json `opname_idx`). */
  def opname(p: SparkPlan): String = p match {
    case _: FileSourceScanExec                  => "ScanFilterProject"
    case _: FilterExec                          => "FilterProject"
    case _: ProjectExec                         => "Project"
    case a: HashAggregateExec =>
      if (a.aggregateExpressions.exists(_.mode ==
        org.apache.spark.sql.catalyst.expressions.aggregate.Partial))
        "Aggregate_PARTIAL" else "Aggregate_FINAL"
    case _: SortAggregateExec | _: ObjectHashAggregateExec => "Aggregate"
    case j: BroadcastHashJoinExec  => s"${joinSide(j.joinType)}_REPLICATED"
    case j: ShuffledHashJoinExec   => s"${joinSide(j.joinType)}_PARTITIONED"
    case j: SortMergeJoinExec      => s"${joinSide(j.joinType)}_PARTITIONED"
    case _: CartesianProductExec   => "CrossJoin_PARTITIONED"
    case _: BroadcastNestedLoopJoinExec => "CrossJoin_REPLICATED"
    case _: ShuffleExchangeExec    => "LocalExchange_HASH"
    case _: BroadcastExchangeExec  => "LocalExchange_SINGLE"
    case _: SortExec               => "PartialSort"
    case _: TakeOrderedAndProjectExec => "Output"
    case _: LocalTableScanExec     => "Values"
    // r3: the workload-corpus sweep (StudyReplicationSpec) surfaced
    // these as "Unknown" — all have direct Trino-vocab analogs
    case _: org.apache.spark.sql.execution.window.WindowExec => "Window"
    case _: org.apache.spark.sql.execution.window.WindowGroupLimitExec =>
      "TopNRanking"
    case _: ExpandExec             => "GroupId"
    case _: GenerateExec           => "Unnest"
    case _: UnionExec              => "Union"
    case _: GlobalLimitExec | _: LocalLimitExec => "Limit"
    case _                         => "Unknown"
  }

  private def joinSide(jt: org.apache.spark.sql.catalyst.plans.JoinType): String =
    jt.toString match {
      case "Inner"                      => "InnerJoin"
      case "LeftOuter"                  => "LeftJoin"
      case "RightOuter"                 => "RightJoin"
      case "FullOuter"                  => "FullJoin"
      case "LeftSemi"                   => "SemiJoin"
      case "LeftAnti"                   => "AntiJoin"
      case other                        => other + "Join"
    }

  /** Strip execution wrappers (AQE stages, codegen, reuse, columnar
    * bridges) down to the semantically meaningful operator, so the
    * emitted graph matches the logical operator structure the
    * reference featurizes regardless of adaptive execution. */
  @annotation.tailrec
  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: adaptive.AdaptiveSparkPlanExec => unwrap(a.executedPlan)
    case q: adaptive.QueryStageExec        => unwrap(q.plan)
    case w: WholeStageCodegenExec          => unwrap(w.child)
    case i: InputAdapter                   => unwrap(i.child)
    case r: exchange.ReusedExchangeExec    => unwrap(r.child)
    case c: ColumnarToRowExec              => unwrap(c.child)
    case other                             => other
  }

  private def realChildren(p: SparkPlan): Seq[SparkPlan] =
    p.children.map(unwrap)

  /** Driver-side walk of the executed plan — pure metadata, no Spark
    * job. This is the loop body for corpus-scale featurization
    * ([[graft.ml.CorpusPlanStudy]]): thousands of plans featurize
    * without launching thousands of tiny jobs. */
  def collectGraph(df: DataFrame): (Seq[PlanNode], Seq[PlanEdge]) = {
    val nodes = scala.collection.mutable.ArrayBuffer[PlanNode]()
    val edges = scala.collection.mutable.ArrayBuffer[PlanEdge]()
    var nextId = 0
    def visit(p: SparkPlan): Int = {
      val unwrapped = unwrap(p)
      val id = nextId; nextId += 1
      val stats = unwrapped.logicalLink.map(_.stats)
      val rows = stats.flatMap(_.rowCount).map(_.toDouble)
        .getOrElse(stats.map(_.sizeInBytes.toDouble / math.max(rowWidth(unwrapped), 1))
          .getOrElse(0.0))
      val (predOps, aggFns, literals) = exprVocab(unwrapped)
      nodes += PlanNode(id, opname(unwrapped), unwrapped.nodeName,
        math.log1p(math.max(rows, 0.0)), rowWidth(unwrapped),
        realChildren(unwrapped).size, predOps, aggFns, literals)
      realChildren(unwrapped).foreach { c =>
        val cid = visit(c)
        edges += PlanEdge(cid, id)
      }
      id
    }
    visit(df.queryExecution.executedPlan)
    (nodes.toSeq, edges.toSeq)
  }

  /** Walk the executed plan of `df` and emit (nodes, edges) as
    * DataFrames. Node features: opname (reference vocab), native Spark
    * op, log1p of the estimated row count, estimated tuple width in
    * bytes. */
  def featurize(spark: SparkSession, df: DataFrame): (DataFrame, DataFrame) = {
    import spark.implicits._
    val (nodes, edges) = collectGraph(df)
    (nodes.toDF(), edges.toDF())
  }

  private def rowWidth(p: SparkPlan): Long =
    p.output.map(a => a.dataType.defaultSize.toLong).sum

  /** Rows-only driver query (`plan_featurize`): featurize a
    * representative join+agg plan into its node frame. Not
    * SQL-expressible (reads Spark's own physical plan), so there is no
    * oracle entry — the driver records a rows>0 check and
    * PlanFeaturizerSpec pins the structure. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "plan_featurize" -> { (s, dir) =>
      import org.apache.spark.sql.functions._
      val li = graft.Tables.load(s, dir, "lineitem")
      val o = graft.Tables.load(s, dir, "orders")
      val q = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_quantity") > 10)
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("l_extendedprice")).as("rev"))
      val (nodes, _) = featurize(s, q)
      // Driver's rows-check sorts the frame in pandas: map/array columns
      // are unhashable there, so serialize them to scalars at the edge.
      nodes
        .withColumn("pred_ops", to_json(col("pred_ops")))
        .withColumn("agg_fns", array_join(col("agg_fns"), ","))
        .orderBy("id")
    })
}
