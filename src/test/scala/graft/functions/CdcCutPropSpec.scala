package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Bit-parity pin: the native one-pass CDC cut finder equals the
  * md5Long(substring(...)) DataFrame form it replaced (the DuckDB
  * oracle computes exactly that form), including multi-byte UTF-8
  * where char positions and byte offsets diverge. */
class CdcCutPropSpec extends SparkSpec {

  private def samples[A](gen: Gen[A], n: Int, seed: Long = 11L): Seq[A] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(seed + i)))

  private val piece = Gen.oneOf(
    "the", "quick", "fox", "a", " ", "тест", "漢字", "x y z", "0123456789")
  private val textGen: Gen[String] =
    Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, piece).map(_.mkString(" ")))

  test("native cut positions equal the md5Long-substring DataFrame form") {
    import spark.implicits._
    val k = 9
    val maskBits = 4 // denser cuts than production so matches are exercised
    val m = 1L << maskBits
    val texts = samples(textGen, 120).distinct
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val reference = df.select(col("id"),
      when(length(col("text")) >= k,
        filter(sequence(lit(1), length(col("text")) - (k - 1)), i =>
          graft.llm.Dedup.md5Long(substring(col("text"), i, lit(k)))
            % m === 0))
        .otherwise(array().cast("array<int>")).as("cuts"))
    val native = df.select(col("id"),
      CdcCutPositions.cdcCutPositions(col("text"), k, maskBits).as("cuts"))
    val ref = reference.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val nat = native.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    texts.indices.foreach { i =>
      assert(nat(i.toLong) == ref(i.toLong),
        s"cut mismatch for text '${texts(i)}'")
    }
    assert(nat.values.exists(_.nonEmpty), "fixture must produce some cuts")
  }
}
