package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RuntimePredictionSpec extends SparkSpec {
  import spark.implicits._

  // synthetic prediction dataset: runtime correlates with query length
  private lazy val synth = {
    val rng = new scala.util.Random(42)
    (1 to 120).map { i =>
      val nJoins = rng.nextInt(6)
      val sql = ("SELECT a, COUNT(*) FROM t " +
        (1 to nJoins).map(j => s"JOIN d$j ON t.k$j = d$j.k").mkString(" ") +
        " GROUP BY a")
      val runtime = 0.5 + nJoins * 2.0 + rng.nextGaussian() * 0.3
      (s"q$i", sql, math.max(runtime, 0.05))
    }.toDF("query_id", "SQL", "runtime_s")
  }

  test("mean-pool embedding is deterministic, fixed-width, bounded") {
    val emb = RuntimePrediction.meanPoolEmbedding(synth, "SQL", 8)
    val rows = emb.select("emb").collect().map(_.getSeq[Double](0))
    assert(rows.forall(_.length == 8))
    assert(rows.forall(_.forall(v => v >= -1.0 && v <= 1.0)))
    val again = RuntimePrediction.meanPoolEmbedding(synth, "SQL", 8)
      .select("emb").collect().map(_.getSeq[Double](0))
    assert(rows.zip(again).forall { case (a, b) => a == b })
  }

  test("end-to-end: embed -> assemble -> RF+CV predicts join count signal") {
    val dim = 8
    val emb = RuntimePrediction.flattenEmbedding(
      RuntimePrediction.meanPoolEmbedding(synth, "SQL", dim), dim)
    val feats = RuntimePrediction.buildFeatures(emb, dim).fit(emb)
      .transform(emb)
    val Array(train, test) = feats.randomSplit(Array(0.8, 0.2), seed = 1L)
    val cv = RuntimePrediction.trainRf(train, numFolds = 3,
      trees = Seq(20), depths = Seq(5))
    val model = cv.fit(train)
    val pred = model.transform(test)
    val maeVal = RuntimePrediction.mae(pred, "prediction", "runtime_s")
      .head.getDouble(0)
    // baseline MAE (predicting the mean) is ~1.5; the model must beat it
    assert(maeVal < 1.2, s"MAE $maeVal too high — model learned nothing")
    val qe = RuntimePrediction.qerror(pred, "prediction", "runtime_s").head
    assert(qe.getAs[Double]("p50_qerr") >= 1.0)
    assert(qe.getAs[Double]("p99_qerr") >= qe.getAs[Double]("p50_qerr"))
  }

  test("PCA engages above the width threshold") {
    val dim = 6
    val emb = RuntimePrediction.flattenEmbedding(
      RuntimePrediction.meanPoolEmbedding(synth, "SQL", dim), dim)
    val wide = RuntimePrediction.buildFeatures(emb, dim, pcaThreshold = 4)
      .fit(emb).transform(emb)
    val width = wide.select("features").head
      .getAs[org.apache.spark.ml.linalg.Vector](0).size
    assert(width == 4, "PCA(4) should compress the text block")
  }

  test("expInvert undoes a log label") {
    val df = Seq(0.0, 1.0, 2.0).toDF("p")
    val out = RuntimePrediction.expInvert(df, "p")
      .collect().map(_.getDouble(0))
    assert(out.zip(Seq(1.0, math.E, math.E * math.E))
      .forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }
}
