package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {

  // deterministic labeled corpus: fixture word-soup docs (label 1)
  // against planted punctuation junk with zero stopwords (label 0)
  private def labeled() = {
    import spark.implicits._
    val good = graft.Tables.load(spark, sfSmoke, "documents")
      .select(col("doc_id"), col("text"), lit(1.0).as("label"))
    val junk = (0 until 100).map { i =>
      (100000L + i, ("!!@# $%^& **(( ))?? ;;:: " * (3 + i % 5)).trim, 0.0)
    }.toDF("doc_id", "text", "label")
    good.unionByName(junk)
  }

  test("logistic quality classifier separates junk from prose on held-out docs") {
    val all = labeled()
    val train = all.filter(col("doc_id") % 3 =!= 0)
    val holdout = all.filter(col("doc_id") % 3 === 0)
    val model = QualityClassifier.train(train)
    val scored = QualityClassifier.score(model, holdout)
    val agg = scored.groupBy("label")
      .agg(count(lit(1)).as("n"),
        sum(when(col("quality_pred") === col("label"), 1L).otherwise(0L))
          .as("correct"))
      .collect().map(r => r.getDouble(0) -> (r.getLong(1), r.getLong(2))).toMap
    agg.foreach { case (label, (n, correct)) =>
      assert(n > 0, s"empty holdout class $label")
      assert(correct.toDouble / n >= 0.9,
        s"class $label accuracy ${correct.toDouble / n} below 0.9")
    }
    // probabilities are calibrated in direction: junk scores below prose
    val means = scored.groupBy("label")
      .agg(avg("quality_prob").as("p")).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(means(0.0) < means(1.0), "junk must score below prose")
  }

  test("training is deterministic: same seed set, same coefficients") {
    val train = labeled().filter(col("doc_id") % 3 =!= 0)
    val m1 = QualityClassifier.train(train)
    val m2 = QualityClassifier.train(train)
    assert(m1.coefficients === m2.coefficients)
    assert(m1.intercept === m2.intercept)
  }
}
