package graft.functions

import graft.SparkSpec
import graft.llm.Dedup
import org.apache.spark.sql.functions._

class MinHashSigAggSpec extends SparkSpec {

  test("typed-imperative signature equals the wide-agg form on the fixture corpus") {
    val corpus = Dedup.fixtureCorpus(
      graft.Tables.load(spark, sfSmoke, "documents").filter(col("doc_id") < 40))
    val shingles = Dedup.charShingles(corpus)
    val n = 16
    val viaAgg = shingles.groupBy("id")
      .agg(MinHashSigAgg.minhashSig(col("shingle"), n).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val viaWide = Dedup.minHashSignaturesWide(shingles, n)
      .collect().map(r => r.getLong(0) ->
        (0 until n).map(i => r.getString(i + 1))).toMap
    assert(viaAgg.keySet === viaWide.keySet)
    viaAgg.foreach { case (id, sig) =>
      assert(sig === viaWide(id), s"doc $id")
    }
  }

  test("merge across partitions: repartitioned input gives the same signature") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i % 7L, s"shingle-$i")).toDF("id", "shingle")
    def sigs(d: org.apache.spark.sql.DataFrame) =
      d.groupBy("id").agg(MinHashSigAgg.minhashSig(col("shingle"), 8).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sigs(df.repartition(1)) === sigs(df.repartition(13)))
  }

  test("null inputs are ignored; empty group yields null mins") {
    import spark.implicits._
    val df = Seq((1L, "a"), (1L, null), (2L, null))
      .toDF("id", "shingle")
    val m = df.groupBy("id")
      .agg(MinHashSigAgg.minhashSig(col("shingle"), 4).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(m(1L).forall(_ != null))
    assert(m(2L).forall(_ == null))
  }
}
