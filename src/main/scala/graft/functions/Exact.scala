package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Exact-arithmetic aggregate builders.
  *
  * Double-summation order differs between engines (and between Spark
  * partitionings), so a plain `sum(double)` is not bit-reproducible and
  * cannot be hash-compared against an external oracle — and at 1000
  * executors it is not even reproducible run-to-run. These helpers
  * aggregate through fixed-point decimals (exact, associative,
  * commutative) and only convert to double at the very end, so the
  * result is identical regardless of partition count or engine.
  *
  * The decimal cast quantizes inputs to 6 fractional digits; fixture
  * values are generated with fewer, so no information is lost.
  */
object Exact {
  private val D = DecimalType(18, 6)

  /** Exact sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast(DoubleType)

  /** Exact-sum-based average, returned as double. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Sample (Bessel-corrected) stddev computed from exact sums:
    * sqrt((Σx² − (Σx)²/n) / (n−1)). The inner sums are exact decimals;
    * the outer expression is a fixed sequence of IEEE double ops, so
    * the result is deterministic and engine-independent. */
  def dstddev(c: Column): Column = {
    val d  = c.cast(D)
    val n  = count(c).cast(DoubleType)
    // decimal → string → double: the string parse is correctly rounded
    // in both engines, whereas direct decimal→double double-rounds
    // through (int / 10^scale) differently per engine for >2^53 sums.
    val s  = sum(d).cast("string").cast(DoubleType)
    val sq = sum(d * d).cast("string").cast(DoubleType)
    sqrt((sq - s * s / n) / (n - lit(1.0)))
  }

  /** Matching DuckDB SQL fragments for the oracle side. */
  def sqlSum(x: String): String =
    s"CAST(SUM(CAST(($x) AS DECIMAL(18,6))) AS DOUBLE)"
  def sqlAvg(x: String): String =
    s"(${sqlSum(x)} / COUNT($x))"
  def sqlStddev(x: String): String = {
    // DECIMAL(19,6): same scale-6 quantization as the Spark side, but
    // forces DuckDB onto int128 storage so d*d cannot overflow at bind.
    val d = s"CAST(($x) AS DECIMAL(19,6))"
    def dbl(e: String) = s"CAST(CAST($e AS VARCHAR) AS DOUBLE)"
    s"SQRT((${dbl(s"SUM($d * $d)")} - ${dbl(s"SUM($d)")} * ${dbl(s"SUM($d)")} / CAST(COUNT($x) AS DOUBLE)) / (CAST(COUNT($x) AS DOUBLE) - 1.0))"
  }
}
