package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection harness: print the formatted physical plan of named
  * queries (all of them with no args) — the iterate-on-the-plan loop
  * that keeps scans pruned, filters pushed, and small sides broadcast.
  *
  * Usage: runMain graft.Explain [sfDir] [queryName ...]
  *
  * Looks up names in [[SparkEntry.queries]] first, then
  * [[BenchExtra.queries]] (bench-only keys — note some of those write
  * standing-index tables as a side effect of plan construction), then
  * the r10 plan-diff [[scenarios]] below.
  *
  * Env knobs (r10, for before/after plan capture):
  *  - SPARK_GRAFT_EXPLAIN_OUT=dir — write each plan to dir/name.txt
  *    instead of stdout;
  *  - SPARK_GRAFT_BROADCAST=int — pin autoBroadcastJoinThreshold in MB
  *    (-1 disables broadcast joins: reproduces at gate scale the
  *    SortMergeJoin shape a dim table crosses into at sf100 under the
  *    10 MB default — the r9 star-probe cliff);
  *  - SPARK_GRAFT_EXPLAIN_CPUS=n — local[n] + shuffle partitions
  *    (default 4).
  */
object Explain {

  /** Plan-diff scenarios that are not reachable through a named query:
    * the r10 BM25 probe-pushdown before-shape (pushdownTermCap = 0
    * forces the pre-r10 broadcast-semi-join fallback; the stored scans
    * then carry NO term IN-set in PushedFilters). The standing index is
    * (re)built on first use — same contract as the bench keys. */
  private def probeBatch(s: SparkSession, dir: String) = {
    import org.apache.spark.sql.functions.col
    Tables.load(s, dir, "documents")
      .filter(col("doc_id") % 100 === 0 && col("doc_id") < 5000)
      .select(col("doc_id").as("query_id"), col("text"))
  }
  private def withIdx(s: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions.col
    graft.llm.Retrieval.writePostingsIndex(
      Tables.load(s, dir, "documents").select(col("doc_id"), col("text")),
      "explain_bm25_idx")
  }
  val scenarios: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
    "bm25_index_probe_nopushdown" -> ((s, dir) => {
      withIdx(s, dir)
      graft.llm.Retrieval.bm25TopKFromIndex("explain_bm25_idx",
        probeBatch(s, dir), 10, pushdownTermCap = 0)
    }),
    "bm25_index_probe_pushdown" -> ((s, dir) => {
      withIdx(s, dir)
      graft.llm.Retrieval.bm25TopKFromIndex("explain_bm25_idx",
        probeBatch(s, dir), 10)
    }),
  )

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val all = SparkEntry.queries ++ BenchExtra.queries ++ scenarios
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // parse as an integer MB count (an optional "MB" suffix tolerated:
    // "10MB" used to become the invalid conf "10MBMB" — r10 ADVICE);
    // non-numeric values fail fast with a clear message
    val spark = sys.env.get("SPARK_GRAFT_BROADCAST")
      .fold(builder) { m =>
        val mb = try m.trim.stripSuffix("MB").stripSuffix("mb").trim.toInt
          catch { case _: NumberFormatException => sys.error(
            s"SPARK_GRAFT_BROADCAST must be an integer MB count " +
              s"(optionally 'MB'-suffixed) or -1, got '$m'") }
        builder.config("spark.sql.autoBroadcastJoinThreshold",
          if (mb == -1) "-1" else s"${mb}MB")
      }
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = sys.env.get("SPARK_GRAFT_EXPLAIN_OUT")
    outDir.foreach(d =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d)))
    names.foreach { name =>
      val body =
        try all(name)(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"explain failed: ${e.getMessage}" }
      outDir match {
        case Some(d) =>
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(d, s"$name.txt"), body + "\n")
          println(s"[explain] wrote $d/$name.txt")
        case None =>
          println(s"\n========== $name ==========")
          println(body)
      }
    }
    spark.stop()
  }
}
