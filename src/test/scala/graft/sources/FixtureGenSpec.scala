package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FixtureGenSpec extends SparkSpec {

  test("aliasSlots: fills exactly, reproduces weights to 1/slots") {
    val w = Seq(("a", 60L), ("b", 30L), ("c", 10L))
    val slots = FixtureGen.aliasSlots(w, 1000)
    assert(slots.length == 1000)
    val counts = slots.groupBy(identity).view.mapValues(_.length).toMap
    assert(math.abs(counts("a") - 600) <= 2 &&
      math.abs(counts("b") - 300) <= 2 && math.abs(counts("c") - 100) <= 2,
      counts.toString)
    // deterministic: same input, same table
    assert(FixtureGen.aliasSlots(w, 1000).sameElements(slots))
  }

  test("documents: schema-identical to shipped fixture, deterministic, no dups") {
    val shipped = spark.read.parquet(s"$sfCorrect/documents.parquet")
    val gen = FixtureGen.documents(spark, sfCorrect, 2000L)
    assert(gen.schema.map(f => (f.name, f.dataType)) ==
      shipped.schema.map(f => (f.name, f.dataType)),
      s"schema drift: ${gen.schema} vs ${shipped.schema}")
    val rows = gen.collect()
    assert(rows.length == 2000)
    // pure function of (seed, id): a second plan produces identical rows
    val again = FixtureGen.documents(spark, sfCorrect, 2000L).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
    // raw-corpus discipline: no exact duplicate texts (dedup fixtures
    // synthesize their own variants in-query)
    assert(gen.select("text").distinct().count() == 2000)
  }

  test("documents: empirical distributions track the source fixture") {
    val src = spark.read.parquet(s"$sfCorrect/documents.parquet")
    val gen = FixtureGen.documents(spark, sfCorrect, 5000L)
    // vocabulary is exactly the source vocabulary (no invented words)
    val srcVocab = src.select(explode(split(col("text"), " ")).as("w"))
      .distinct().collect().map(_.getString(0)).toSet
    val genVocab = gen.select(explode(split(col("text"), " ")).as("w"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(genVocab.subsetOf(srcVocab), (genVocab -- srcVocab).toString)
    // lang mix within 3 points of the source (alias granularity + sampling)
    def mix(df: org.apache.spark.sql.DataFrame) = {
      val n = df.count().toDouble
      df.groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1) / n).toMap
    }
    val (sm, gm) = (mix(src), mix(gen))
    sm.foreach { case (lang, p) =>
      assert(math.abs(gm.getOrElse(lang, 0.0) - p) < 0.03, s"$lang: $p vs ${gm.get(lang)}")
    }
    // word-count range matches the shipped uniform(10..100) band
    val lens = gen.select(size(split(col("text"), " ")).as("n"))
      .agg(min("n"), max("n")).head()
    assert(lens.getInt(0) >= 10 && lens.getInt(1) <= 100, lens.toString)
  }

  test("embeddings: unit norms, shipped schema, labels 0-9") {
    val shipped = spark.read.parquet(s"$sfCorrect/embeddings.parquet")
    val gen = FixtureGen.embeddings(spark, 1000L)
    assert(gen.schema.map(f => (f.name, f.dataType)) ==
      shipped.schema.map(f => (f.name, f.dataType)),
      s"schema drift: ${gen.schema} vs ${shipped.schema}")
    val normBounds = gen.select(sqrt(aggregate(col("embedding"), lit(0.0),
        (a, x) => a + x.cast("double") * x.cast("double"))).as("n"))
      .agg(min("n"), max("n")).head()
    assert(normBounds.getDouble(0) > 0.999 && normBounds.getDouble(1) < 1.001,
      normBounds.toString)
    val labels = gen.select("label").distinct().collect().map(_.getInt(0)).sorted
    assert(labels.sameElements(0 to 9), labels.mkString(","))
  }
}
