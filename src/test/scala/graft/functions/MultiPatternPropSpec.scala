package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the Aho-Corasick multi-pattern counter: the
  * automaton agrees with a per-pattern overlapping indexOf scan on
  * arbitrary inputs (including multi-byte UTF-8), and the codegen
  * column path agrees with the interpreted automaton. */
class MultiPatternPropSpec extends SparkSpec {

  private def samples[A](gen: Gen[A], n: Int, seed: Long = 7L): Seq[A] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(seed + i)))

  /** Overlapping occurrence count by repeated indexOf (start+1). */
  private def naive(text: String, pats: Seq[String]): Long =
    pats.map { p =>
      var n = 0L; var i = text.indexOf(p)
      while (i >= 0) { n += 1; i = text.indexOf(p, i + 1) }
      n
    }.sum

  private val alpha = Gen.oneOf("a", "b", "ab", "aba", "ба", "好", " ")
  private val textGen: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, alpha).map(_.mkString))
  private val patGen: Gen[List[String]] =
    Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "ab", "aba", "aa", "ба", "好", "b a")))

  test("automaton equals overlapping indexOf scan on random input") {
    val texts = samples(textGen, 200)
    val patLists = samples(patGen, 50, seed = 99L).map(_.distinct)
    patLists.foreach { pats =>
      val ac = new MultiPatternCount.AC(pats.toArray)
      texts.foreach { t =>
        assert(ac.countAll(UTF8String.fromString(t)) == naive(t, pats),
          s"mismatch for pats=$pats text='$t'")
      }
    }
  }

  test("self-overlapping pattern counts every occurrence") {
    val ac = new MultiPatternCount.AC(Array("a a"))
    assert(ac.countAll(UTF8String.fromString("a a a a")) == 3L)
    assert(naive("a a a a", Seq("a a")) == 3L)
  }

  test("codegen column path agrees with the interpreted automaton") {
    import spark.implicits._
    val pats = Seq("slow fast", "table value", "a a")
    val texts = samples(textGen, 100) ++
      Seq("slow fast slow fast", "a a a", "table valuetable value x")
    val rows = texts.toDF("s")
      .withColumn("n",
        MultiPatternCount.multiPatternCount(col("s"), pats))
      .collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getLong(r.fieldIndex("n")) == naive(t, pats),
        s"codegen mismatch for '$t'")
    }
  }
}
