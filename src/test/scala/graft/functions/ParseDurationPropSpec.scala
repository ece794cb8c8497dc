package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY.md §5): the duration parser's three
  * implementations — plain Scala, registered UDF, native codegen
  * expression — agree on arbitrary inputs, and unit round-trips hold.
  * Generators are driven with fixed seeds (the offline cache has no
  * scalatest-scalacheck bridge), so failures reproduce exactly. */
class ParseDurationPropSpec extends SparkSpec {

  private def samples[A](gen: Gen[A], n: Int, seed: Long = 42L): Seq[A] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(seed + i)))

  private val unitGen = Gen.oneOf(
    "ns", "us", "µs", "ms", "s", "m", "h", "d",
    "sec", "secs", "seconds", "minutes", "hours", "days", "")
  private val durGen: Gen[String] = for {
    n <- Gen.chooseNum(0.0, 1e6)
    u <- unitGen
    pad <- Gen.oneOf("", " ", "  ")
  } yield s"$pad$n$pad$u$pad"
  private val junkGen: Gen[String] =
    Gen.oneOf(Gen.alphaStr, Gen.const(""), Gen.const("1:2:3:4"),
      Gen.const("12xyz"), Gen.const("--5s"))

  test("scala / UDF / native expression agree on well-formed and junk input") {
    Durations.register(spark)
    import spark.implicits._
    val strs = samples(Gen.oneOf(durGen, junkGen), 300)
    val rows = strs.toDF("s")
      .withColumn("udf", call_udf("parse_duration", col("s")))
      .withColumn("native", ParseDuration.parseDuration(col("s")))
      .collect()
    rows.zip(strs).foreach { case (row, s) =>
      val expect = Durations.parse(s)
      val udf = if (row.isNullAt(1)) None else Some(row.getDouble(1))
      val native = if (row.isNullAt(2)) None else Some(row.getDouble(2))
      assert(udf === expect, s"udf mismatch for '$s'")
      assert(native === expect, s"native mismatch for '$s'")
    }
  }

  test("unit round-trips: n unit == n * factor seconds") {
    val factors = Map("ns" -> 1e-9, "ms" -> 1e-3, "s" -> 1.0,
      "m" -> 60.0, "h" -> 3600.0, "d" -> 86400.0)
    val cases = samples(for {
      n <- Gen.chooseNum(0.0, 1e5)
      u <- Gen.oneOf(factors.keys.toSeq)
    } yield (n, u), 200)
    cases.foreach { case (n, u) =>
      assert(Durations.parse(s"$n$u").get === n * factors(u))
    }
  }

  test("H:MM:SS round-trip") {
    val cases = samples(for {
      h <- Gen.chooseNum(0, 99)
      m <- Gen.chooseNum(0, 59)
      s <- Gen.chooseNum(0, 59)
    } yield (h, m, s), 200)
    cases.foreach { case (h, m, s) =>
      assert(Durations.parse(f"$h:$m%02d:$s%02d").get ===
        h * 3600.0 + m * 60.0 + s)
    }
  }

  test("scrubber idempotence holds on generated query-info documents") {
    val docGen = for {
      k <- Gen.oneOf("a", "b", "queryStats", "nested")
      n <- Gen.chooseNum(0, 1000)
      ts <- Gen.oneOf("2025-01-01T00:00:00Z", "plain", "2024-06-07T10:11:12.333Z")
    } yield s"""{"$k":$n,"self":"x","t":"$ts","outputStage":{"plan":{"splitInfo":{"path":"s3://b/$n"}}}}"""
    samples(docGen, 200).foreach { doc =>
      val once = JsonScrub.scrub(doc)
      assert(once != null)
      assert(JsonScrub.scrub(once) === once)
      assert(!once.contains("self"))
      assert(!once.contains("s3://"))
    }
  }
}
