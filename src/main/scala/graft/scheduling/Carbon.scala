package graft.scheduling

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Carbon-intensity time-series math (SURVEY.md §2.D group 4,
  * behavior of `low-carbon-scheduling/src/carbon.py`):
  * Electricity-Maps CSV load, window filter, slot-length inference,
  * upsample-by-repetition, prefix sums, and O(1) window-carbon
  * evaluation on top of the prefix sums.
  *
  * Scale note: prefix sums use a single ordered window over the slot
  * axis — at planetary CI-series sizes this would be range-partitioned
  * per zone and day with per-partition offsets; here one time series is
  * at most a few hundred thousand 1-second slots.
  */
object Carbon {

  /** Default simulation constants (low-carbon-scheduling/config.py:28-44). */
  val PowerKw       = 0.150
  val SlotSec       = 1
  val SearchHours   = 12
  val CandidateStep = 3600

  /** Load an Electricity-Maps CSV (`Datetime (UTC)`, direct and
    * lifecycle CI columns — carbon.py:4-46): parse timestamps, filter
    * [start,end), sort, pick the CI flavor, and infer the source slot
    * length from the first two rows via lag. */
  def loadCarbonTimeseries(spark: SparkSession, path: String,
      start: String, end: String, lifecycle: Boolean = true): DataFrame = {
    val ciCol =
      if (lifecycle) "Carbon intensity gCO₂eq/kWh (Life cycle)"
      else "Carbon intensity gCO₂eq/kWh (direct)"
    val raw = spark.read.option("header", "true").csv(path)
      .withColumn("ts", to_timestamp(col("Datetime (UTC)")))
      .withColumn("ci", col(ciCol).cast("double"))
      .filter(col("ts") >= to_timestamp(lit(start)) &&
        col("ts") < to_timestamp(lit(end)))
      .select("ts", "ci")
    val w = Window.orderBy("ts")
    raw.withColumn("slot_len_s",
        (unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w))))
      .withColumn("slot_len_s",
        first(col("slot_len_s"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
  }

  /** Repeat each source slot `factor` times to reach the target slot
    * resolution (carbon.py:49-68; integer ratio enforced there, here by
    * construction). explode(sequence(...)) is a narrow op — no shuffle. */
  def upsample(ci: DataFrame, factor: Int,
      orderCols: Seq[String] = Seq("ts")): DataFrame =
    ci.withColumn("rep", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("slot",
        row_number().over(
          Window.orderBy((orderCols :+ "rep").map(col): _*)) - 1)
      .drop("rep")

  /** Exclusive prefix sums over the slot axis (carbon.py:70-75):
    * prefix(i) = Σ ci[0..i). Decimal-exact so window evaluation
    * order cannot perturb results. */
  def prefixSums(slots: DataFrame, slotCol: String = "slot",
      ciCol: String = "ci"): DataFrame = {
    val w = Window.orderBy(col(slotCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    slots.withColumn("prefix",
      coalesce(sum(col(ciCol).cast(DecimalType(18, 6))).over(w),
        lit(0).cast(DecimalType(18, 6))).cast("double"))
  }

  /** Carbon of running at `powerKw` over slot window [s, e) given the
    * prefix-sum table (carbon.py:78-99): (prefix[e]−prefix[s]) ·
    * power · dt_hours, with both endpoints clipped to the horizon. */
  def windowCarbonExpr(prefixAtEnd: org.apache.spark.sql.Column,
      prefixAtStart: org.apache.spark.sql.Column,
      powerKw: Double = PowerKw, slotSec: Int = SlotSec)
      : org.apache.spark.sql.Column =
    (prefixAtEnd - prefixAtStart) * lit(powerKw) * lit(slotSec / 3600.0)

  /** Driver-side prefix array for the sequential schedulers: the heavy
    * summation ran in Spark; the collect is one double per slot. */
  def collectPrefix(prefix: DataFrame): Array[Double] = {
    val rows = prefix.select("slot", "prefix", "ci")
      .orderBy("slot").collect()
    val n = rows.length
    val out = new Array[Double](n + 1)
    var i = 0
    while (i < n) {
      out(i) = rows(i).getDouble(1)
      i += 1
    }
    out(n) = if (n == 0) 0.0 else rows(n - 1).getDouble(1) + rows(n - 1).getDouble(2)
    out
  }

  /** Window carbon on a collected prefix array (clipped). */
  def windowCarbon(prefix: Array[Double], s: Int, e: Int,
      powerKw: Double = PowerKw, slotSec: Int = SlotSec): Double = {
    val n = prefix.length - 1
    val cs = math.min(math.max(s, 0), n)
    val ce = math.min(math.max(e, 0), n)
    (prefix(ce) - prefix(cs)) * powerKw * (slotSec / 3600.0)
  }
}
