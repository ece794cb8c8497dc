package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew- and scale-management helpers: the patterns a 1000-executor
  * job needs when keys are hot or orderings are global. Everything is
  * deterministic in RESULT; salts only re-route rows, and all sums run
  * decimal-exact so re-association cannot change a bit (see
  * [[graft.functions.Exact]]).
  */
object Scale {
  private val D = DecimalType(18, 6)

  /** Two-phase salted aggregation: a hot grouping key is spread over
    * `saltBuckets` sub-keys for the first (heavy) shuffle, then the
    * tiny per-(key, salt) partials combine in a second, skew-free
    * shuffle. Use when one key owns a large share of the rows and AQE
    * skew handling isn't enough (pre-aggregated pipelines, custom
    * partitioners). */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
      resultCol: String, saltBuckets: Int = 32,
      saltSource: Option[Column] = None): DataFrame = {
    val salt = pmod(
      saltSource.map(hash(_)).getOrElse(spark_partition_id()),
      lit(saltBuckets))
    df.withColumn("__salt", salt)
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol).cast(D)).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial")).cast("double").as(resultCol))
  }

  /** Skew-join by salting: every big-side row picks one of
    * `saltBuckets` sub-keys; the small side replicates once per
    * bucket, so a hot key's rows spread over `saltBuckets` reducers
    * instead of one. Use for skewed keys too large to broadcast and
    * too hot for a plain shuffle join; otherwise prefer broadcast()
    * or AQE's skew-join splitting. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int = 16, saltSource: Option[Column] = None): DataFrame = {
    val salt = pmod(
      saltSource.map(hash(_)).getOrElse(spark_partition_id()),
      lit(saltBuckets))
    val b = big.withColumn("__salt", salt)
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Distributed exclusive prefix sums — the 100 TB path for
    * [[graft.scheduling.Carbon.prefixSums]]'s single-partition global
    * window: (1) bucket the axis by range, (2) per-bucket partial sums
    * (parallel), (3) cumulate the |buckets|-row offsets frame (tiny,
    * single partition is correct there), (4) broadcast offsets back and
    * window only WITHIN each bucket (parallel). Decimal-exact, so the
    * result is bit-identical to the single-window form. */
  def prefixSumsDistributed(slots: DataFrame, slotCol: String = "slot",
      ciCol: String = "ci", numBuckets: Int = 32): DataFrame = {
    val maxSlot = slots.agg(max(col(slotCol))).head().getLong(0)
    val width = math.max(1L, maxSlot / numBuckets + 1)
    val bucketed = slots.withColumn("__bucket", (col(slotCol) / width).cast("long"))
    val partials = bucketed.groupBy("__bucket")
      .agg(sum(col(ciCol).cast(D)).as("__bucket_sum"))
    val offsets = partials.withColumn("__offset",
      coalesce(sum(col("__bucket_sum")).over(
        Window.orderBy("__bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0).cast(D)))
      .select("__bucket", "__offset")
    val withinW = Window.partitionBy("__bucket").orderBy(col(slotCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .join(broadcast(offsets), Seq("__bucket"))
      .withColumn("prefix",
        (col("__offset") +
          coalesce(sum(col(ciCol).cast(D)).over(withinW), lit(0).cast(D)))
          .cast("double"))
      .drop("__bucket", "__offset")
  }
}
