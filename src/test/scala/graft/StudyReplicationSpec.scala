package graft

import graft.analytics.TraceAnalytics
import graft.ml.RuntimePrediction
import graft.sources.{Ingest, WorkloadRunner}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The reference's studies replicated end-to-end on SELF-PRODUCED
  * data: run the full 99-query corpus twice through WorkloadRunner
  * (the reference's run_workload loop), then drive study 1 (runtime
  * variance: per-run means, across-run summary, per-query CV —
  * table_1/table_2 analytics) and study 3 (RF runtime prediction from
  * SQL-text embeddings — models/RF) from the logs this library itself
  * wrote. The unit suites pin each stage on fixtures; this pins the
  * HANDOFFS — log field names, query-id joins, label columns — the
  * way a real user of the reference chains them. */
class StudyReplicationSpec extends SparkSpec {
  import spark.implicits._

  private val qdir = "/root/repo/workloads/tpcds_like"

  test("variance analytics + RF prediction run on self-produced workload logs") {
    graft.Tables.registerAll(spark, sfSmoke)
    val outDir = Files.createTempDirectory("graft_study").toString

    // -- the reference's execution loop, twice (study 1 needs >=2 runs)
    val r1 = WorkloadRunner.runWorkload(spark, qdir, outDir, attempt = 1)
    val r2 = WorkloadRunner.runWorkload(spark, qdir, outDir, attempt = 2)
    assert(r1.size === 99 && r2.size === 99)
    assert((r1 ++ r2).forall(_.runtimeS >= 0), "no query may fail")

    // -- study 1: variance analytics over the run logs
    val logs = TraceAnalytics.withRunId(
      spark.read.json(s"$outDir/Workload_log_run_*.ndjson"))
    val runMeans = TraceAnalytics.perRunMean(logs, "run", "Runtime (s)")
    assert(runMeans.count() === 2)
    val summary = TraceAnalytics.summarize(runMeans).head()
    assert(summary.getDouble(0) > 0, "avg runtime must be positive")
    assert(!summary.getDouble(1).isNaN, "std over 2 runs must exist")
    val cv = TraceAnalytics.perQueryCv(logs, "query_id", "Runtime (s)", 2)
    assert(cv.count() === 99, "every query needs exactly 2 samples")
    assert(cv.filter(col("cv_pct") < 0).isEmpty)

    // -- study 3: RF runtime prediction from (SQL text, measured runtime)
    val texts = Ingest.loadQueryFiles(qdir).toSeq.toDF("query_id", "SQL")
    val data = logs.filter(col("run") === 1).join(texts, "query_id")
      .select(col("query_id"), col("SQL"),
        col("Runtime (s)").as("runtime_s"))
    assert(data.count() === 99, "every log row must find its SQL text")

    val dim = 16
    val emb = RuntimePrediction.flattenEmbedding(
      RuntimePrediction.meanPoolEmbedding(data, "SQL", dim), dim)
    val feats = RuntimePrediction.buildFeatures(emb, dim).fit(emb)
      .transform(emb)
    val model = RuntimePrediction.trainRf(feats, numFolds = 3,
      trees = Seq(20), depths = Seq(5)).fit(feats)
    val scored = model.transform(feats)

    val maeRow = RuntimePrediction.mae(scored, "prediction", "runtime_s")
      .head()
    assert(maeRow.getDouble(0) >= 0 && !maeRow.getDouble(0).isNaN)
    val qe = RuntimePrediction.qerror(scored, "prediction", "runtime_s")
      .head()
    // q-error is >= 1 by construction; in-sample on 99 rows it should
    // be modest — a blown-up P50 means the text/label handoff broke
    assert(qe.getDouble(0) >= 1.0 && qe.getDouble(0) < 10.0,
      s"P50 q-error ${qe.getDouble(0)} out of range")

    // -- the GNN-analog handoff: featurize every workload query's
    // executed plan (the reference scrapes these from Trino's UI; we
    // walk queryExecution directly) and check the node vocabulary
    // stays inside the §2.B opname set across the WHOLE corpus
    import graft.analytics.PlanFeaturizer
    val vocab = scala.collection.mutable.Map[String, Long]()
    var nodeTotal = 0L
    for ((_, sql) <- Ingest.loadQueryFiles(qdir)) {
      val (nodes, edgesDf) = PlanFeaturizer.featurize(spark, spark.sql(sql))
      val ops = nodes.select("opname").collect().map(_.getString(0))
      ops.foreach(o => vocab(o) = vocab.getOrElse(o, 0L) + 1)
      nodeTotal += ops.length
      assert(edgesDf.count() >= ops.length - 1, "plan must be connected")
    }
    assert(nodeTotal > 500, s"corpus-wide node count $nodeTotal too small")
    // the heavy relational shapes must all appear somewhere in 99 plans
    // (Trino-vocab names, PlanFeaturizer.opname)
    Seq("ScanFilterProject", "Aggregate_PARTIAL", "Aggregate_FINAL",
      "InnerJoin_REPLICATED", "Window", "GroupId", "Output")
      .foreach(op => assert(vocab.contains(op), s"missing opname $op"))
    // and the vocabulary actually covers the corpus: un-mapped nodes
    // stay a sliver, not a bucket the GNN analog would starve on
    val unknown = vocab.getOrElse("Unknown", 0L)
    assert(unknown.toDouble / nodeTotal < 0.05,
      s"$unknown of $nodeTotal nodes un-mapped")
  }

  test("reference repetition: 5 runs, exactly-5 CV gate, config delta") {
    import graft.sources.SyntheticWorkload
    graft.Tables.registerAll(spark, sfSmoke)
    val outDir = Files.createTempDirectory("graft_study5").toString
    val corpus = SyntheticWorkload.generate(60, seed = 5L)
    val qd = s"$outDir/queries"
    SyntheticWorkload.writeQueryFiles(qd, corpus)

    // -- study 1 at the reference's repetition count: 5 workload runs
    // (traces/study_1: Workload_log_BASE_{1..5}.ndjson per config)
    val runs = (1 to 5).map(a =>
      WorkloadRunner.runWorkload(spark, qd, outDir, attempt = a))
    assert(runs.forall(r => r.size == 60 && r.forall(_.runtimeS >= 0)))
    val logs = TraceAnalytics.withRunId(
      spark.read.json(s"$outDir/Workload_log_run_*.ndjson"))

    // the reference's exactly-5 repeatability gate (helpers.py:55)
    val cv = TraceAnalytics.perQueryCv(logs, "query_id", "Runtime (s)", 5)
    assert(cv.count() === 60, "every query has exactly 5 samples")
    assert(cv.filter(col("cv_pct") < 0 || col("cv_pct").isNull).isEmpty)
    // a query missing one run must DROP OUT (the heterogeneous-cluster
    // incomplete-set behavior the traces README warns about)
    val damaged = logs.filter(
      !(col("query_id") === corpus.head.queryId && col("run") === 5))
    assert(TraceAnalytics.perQueryCv(
      damaged, "query_id", "Runtime (s)", 5).count() === 59)

    // -- study 2 analog on self-produced logs: same corpus under a
    // variant session config (shuffle=4 vs 32), baseline-vs-variant
    // percentage deltas of the run-summary metrics
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val variantDir = Files.createTempDirectory("graft_study5v").toString
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      // two variant runs: Bessel std needs >=2 run means (ddof=1 over
      // a single run is the reference's NaN; here ANSI division throws)
      (1 to 2).foreach { a =>
        val rv = WorkloadRunner.runWorkload(spark, qd, variantDir, attempt = a)
        assert(rv.size === 60 && rv.forall(_.runtimeS >= 0))
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    val vlogs = TraceAnalytics.withRunId(
      spark.read.json(s"$variantDir/Workload_log_run_*.ndjson"))
    val metrics = Seq("avg_runtime", "std_runtime", "p50_runtime")
    val delta = TraceAnalytics.configDelta(
      TraceAnalytics.summarize(
        TraceAnalytics.perRunMean(logs, "run", "Runtime (s)")),
      TraceAnalytics.summarize(
        TraceAnalytics.perRunMean(vlogs, "run", "Runtime (s)")),
      metrics).head()
    metrics.indices.foreach { i =>
      assert(!delta.getDouble(i).isNaN, s"delta_${metrics(i)} is NaN")
    }
  }
}
