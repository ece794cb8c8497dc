package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.{PCA, VectorAssembler}
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.ml.regression.RandomForestRegressor
import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Runtime-prediction pipeline (SURVEY.md §2.D group 3): the
  * reference's RF-over-SQL-text-embedding regressor
  * (`models/RF/Model/sql_encoder.py:33-41` mean-pooled embeddings,
  * `Dataloader.py:48-102` PCA+concat, `RF/train.ipynb` grid-searched
  * RandomForest with 5-fold CV scored by MAE), rebuilt on spark.ml.
  *
  * The reference's encoder is a frozen LLM token-embedding table; with
  * no model weights available the rebuild substitutes a deterministic
  * feature-hashing token embedding with identical dataflow shape
  * (tokenize → per-token vector → mean pool → fixed-width column).
  * Everything downstream (PCA(4) when wide, assembler, RF, CV, MAE,
  * Q-error) matches the reference's computation graph.
  */
object RuntimePrediction {

  /** Prediction-dataset NDJSON loader (`models/Queries/... .ndjson`:
    * query_id, SQL, "Runtime (s)", Runtime_log). */
  def loadDataset(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)
      .withColumnRenamed("Runtime (s)", "runtime_s")
      .filter(col("runtime_s").isNotNull && col("SQL").isNotNull)

  /** Tokenize SQL text with the reference tokenizer's pre-tokenization
    * rules ([[graft.llm.TextAnalysis.qwen2Pretokenize]] — the shipped
    * tokenizer_config.json declares Qwen2Tokenizer, case-sensitive)
    * and mean-pool per-token hash embeddings into a `dim`-wide array
    * column — the `sql_encoder.py` mean-pool shape, with
    * xxhash64-seeded pseudo-embeddings instead of LLM weights. Pure
    * column expressions (codegen'd, no UDF): at 100 TB this runs as a
    * map-only stage. */
  def meanPoolEmbedding(df: DataFrame, textCol: String, dim: Int): DataFrame = {
    val tokens = graft.llm.TextAnalysis.qwen2Pretokenize(col(textCol))
    val dims = (0 until dim).map { i =>
      // mean over tokens of a per-token deterministic value in [-1, 1]
      val tok = aggregate(
        transform(tokens, t => xxhash64(t, lit(i)).cast("double")),
        lit(0.0), (acc, x) => acc + x / lit(9.223372036854776e18))
      (tok / greatest(size(tokens), lit(1)).cast("double")).as(s"e$i")
    }
    df.withColumn("emb", array(dims: _*))
  }

  /** Assemble [sql ∥ schema ∥ system] feature columns
    * (Dataloader.py:83-102), PCA-compressing the text block to 4 dims
    * when it is wide (Dataloader.py:48-58's dim>5000 rule, threshold
    * parameterized). */
  def buildFeatures(df: DataFrame, embDim: Int, pcaThreshold: Int = 5000,
      extraCols: Seq[String] = Nil): Pipeline = {
    val toVec = new VectorAssembler()
      .setInputCols((0 until embDim).map(i => s"emb_$i").toArray)
      .setOutputCol("emb_vec")
    val stages = scala.collection.mutable.ArrayBuffer[org.apache.spark.ml.PipelineStage](toVec)
    val textOut = if (embDim > pcaThreshold) {
      stages += new PCA().setK(4).setInputCol("emb_vec").setOutputCol("emb_pca")
      "emb_pca"
    } else "emb_vec"
    stages += new VectorAssembler()
      .setInputCols((textOut +: extraCols).toArray)
      .setOutputCol("features")
    new Pipeline().setStages(stages.toArray)
  }

  /** Explode the pooled array into scalar columns for the assembler. */
  def flattenEmbedding(df: DataFrame, dim: Int): DataFrame =
    (0 until dim).foldLeft(df)((d, i) =>
      d.withColumn(s"emb_$i", col("emb").getItem(i)))

  /** RF + 5-fold CV over the reference's grid axes (n_estimators,
    * max_depth, min_samples_leaf — train.ipynb cell 0), scored by MAE. */
  def trainRf(train: DataFrame, labelCol: String = "runtime_s",
      numFolds: Int = 5,
      trees: Seq[Int] = Seq(200, 400),
      depths: Seq[Int] = Seq(5, 10)): CrossValidator = {
    val rf = new RandomForestRegressor()
      .setFeaturesCol("features").setLabelCol(labelCol).setSeed(42L)
    val grid = new ParamGridBuilder()
      .addGrid(rf.numTrees, trees)
      .addGrid(rf.maxDepth, depths)
      .build()
    new CrossValidator()
      .setEstimator(rf)
      .setEvaluator(new RegressionEvaluator()
        .setLabelCol(labelCol).setPredictionCol("prediction")
        .setMetricName("mae"))
      .setEstimatorParamMaps(grid)
      .setNumFolds(numFolds)
      .setSeed(42L)
  }

  /** MAE (train.ipynb evaluate_model). */
  def mae(df: DataFrame, predCol: String, labelCol: String): DataFrame =
    df.agg(avg(abs(col(predCol) - col(labelCol))).as("mae"))

  /** Q-error = max(y,ŷ)/max(min(y,ŷ),1e-3) over positive pairs, P50 +
    * P99 (train.ipynb percentile_qerror, identical in GNN/table3). */
  def qerror(df: DataFrame, predCol: String, labelCol: String): DataFrame = {
    val q = greatest(col(predCol), col(labelCol)) /
      greatest(least(col(predCol), col(labelCol)), lit(1e-3))
    df.filter(col(predCol) > 0 && col(labelCol) > 0)
      .select(q.as("qerr"))
      .agg(
        expr("percentile(qerr, 0.5)").as("p50_qerr"),
        expr("percentile(qerr, 0.99)").as("p99_qerr"),
        count(lit(1)).as("n"))
  }

  /** Optional Runtime_log target handling: exp-invert predictions at
    * eval (train.ipynb evaluate_model). */
  def expInvert(df: DataFrame, c: String): DataFrame =
    df.withColumn(c, exp(col(c)))
}
