package graft.ml

import graft.SparkSpec
import graft.scheduling.{Experiment, Schedulers}
import org.apache.spark.sql.functions._

/** The reference's full §2.D chain in one test: train the RF runtime
  * predictor (group 3), emit its (prediction, label) frame — the
  * values.csv handoff — and drive the carbon-scheduling experiment
  * (group 4) with it, including the oracle-overhead comparison the
  * paper's low-carbon study makes. */
class PredictionToSchedulingSpec extends SparkSpec {
  import spark.implicits._

  test("RF predictions feed the scheduler; oracle overhead is computed") {
    // synthetic workload: runtime follows join count
    val rng = new scala.util.Random(7)
    val data = (1 to 150).map { i =>
      val nJoins = rng.nextInt(6)
      val sql = "SELECT a FROM t " +
        (1 to nJoins).map(j => s"JOIN d$j ON t.k$j = d$j.k").mkString(" ")
      (s"q$i", sql, math.max(5.0 + nJoins * 10.0 + rng.nextGaussian(), 1.0))
    }.toDF("query_id", "SQL", "runtime_s")

    val dim = 8
    val emb = RuntimePrediction.flattenEmbedding(
      RuntimePrediction.meanPoolEmbedding(data, "SQL", dim), dim)
    val feats = RuntimePrediction.buildFeatures(emb, dim).fit(emb)
      .transform(emb)
    val Array(train, test) = feats.randomSplit(Array(0.7, 0.3), seed = 1L)
    val model = RuntimePrediction.trainRf(train, numFolds = 3,
      trees = Seq(20), depths = Seq(5)).fit(train)

    // the values.csv handoff: (prediction, label) seconds
    val values = model.transform(test)
      .select(col("prediction"), col("runtime_s").as("label"))
    assert(values.count() > 10)

    // diurnal CI: expensive early, cheap late
    val ci = Array.tabulate(200000)(i => if (i < 100000) 500.0 else 20.0)
    val profile = Schedulers.CarbonProfileMicro.fromCi(ci, slotSec = 1.0)

    val fifo = Experiment.run(values, profile, "fifo", label = "RF")
    val greedy = Experiment.run(values, profile, "greedy", label = "RF",
      searchHours = 40.0, candidateStepSlots = 3600)
    val oracle = Experiment.run(values, profile, "greedy", label = "Oracle",
      oracle = true, searchHours = 40.0, candidateStepSlots = 3600)

    assert(greedy.carbonTotalGco2 < fifo.carbonTotalGco2)
    val frame = Experiment.resultsFrame(spark, Seq(
      (fifo, "local", "Baseline"), (greedy, "local", "Baseline"),
      (oracle, "local", "Baseline")))
    // overhead defined only within the oracle's (scheduler) group
    val byModel = frame.collect().map(r => (r.getAs[String]("model"),
      r.getAs[String]("scheduler")) ->
      Option(r.getAs[java.lang.Double]("overhead_vs_oracle"))).toMap
    assert(byModel(("Oracle", "greedy")).contains(0.0))
    assert(byModel(("RF", "greedy")).exists(_ >= 0.0))
  }
}
