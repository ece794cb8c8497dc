package graft.functions

import org.apache.spark.sql.SparkSession

/** Duration-string → seconds parser.
  *
  * Mirrors the reference's two parsers (behavior, not code): the jq
  * suffix parser in `traces/tools/make_lakehouse_workload_logs.sh:24-41`
  * (`ns|us|µs|ms|s|m|h` suffixes) and the Python
  * `parse_duration_to_seconds` / `_hms_to_seconds` in
  * `traces/table_2.ipynb` cell 0 (adds `H:MM:SS[.fff]` clock strings and
  * long unit names like "seconds", "minutes").
  *
  * Registered as a Scala UDF — this sits in trace post-processing, not
  * in a hot query path, so UDF (vs custom Expression) is the right
  * cost/benefit (SURVEY.md §7.4).
  */
object Durations {

  private val NumUnit =
    """^\s*([+-]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)\s*([a-zµμ]*)\s*$""".r
  private val Hms =
    """^\s*(\d+):(\d{1,2}):(\d{1,2}(?:\.\d+)?)\s*$""".r

  private val unitFactor: Map[String, Double] = Map(
    "ns" -> 1e-9, "nanos" -> 1e-9, "nanosecond" -> 1e-9,
    "nanoseconds" -> 1e-9,
    "us" -> 1e-6, "µs" -> 1e-6, "μs" -> 1e-6, "micros" -> 1e-6,
    "microsecond" -> 1e-6, "microseconds" -> 1e-6,
    "ms" -> 1e-3, "millis" -> 1e-3, "millisecond" -> 1e-3,
    "milliseconds" -> 1e-3,
    "" -> 1.0, "s" -> 1.0, "sec" -> 1.0, "secs" -> 1.0,
    "second" -> 1.0, "seconds" -> 1.0,
    "m" -> 60.0, "min" -> 60.0, "mins" -> 60.0,
    "minute" -> 60.0, "minutes" -> 60.0,
    "h" -> 3600.0, "hr" -> 3600.0, "hrs" -> 3600.0,
    "hour" -> 3600.0, "hours" -> 3600.0,
    "d" -> 86400.0, "day" -> 86400.0, "days" -> 86400.0)

  /** Parse a duration string to seconds; None when unparseable
    * (unparseable runtimes become null → filtered, like the
    * reference's -1 sentinel handling). */
  def parse(s: String): Option[Double] = s match {
    case null => None
    case Hms(h, m, sec) =>
      Some(h.toDouble * 3600.0 + m.toDouble * 60.0 + sec.toDouble)
    case NumUnit(num, unit) =>
      unitFactor.get(unit.toLowerCase).map(num.toDouble * _)
    case _ => None
  }

  /** Boxed variant for the codegen path ([[ParseDuration]]). */
  def parseBoxed(s: String): java.lang.Double =
    parse(s).map(Double.box).orNull

  def register(spark: SparkSession): Unit =
    spark.udf.register("parse_duration",
      (s: String) => parse(s).map(Double.box).orNull)
}
