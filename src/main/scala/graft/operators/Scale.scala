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
    * (parallel), (3) fold the ≤`numBuckets` partials into exclusive
    * offsets on the driver (constant-size, so no global WindowExec
    * anywhere in the plan), (4) broadcast offsets back and window only
    * WITHIN each bucket (parallel). Decimal-exact, so the result is
    * bit-identical to the single-window form. */
  def prefixSumsDistributed(slots: DataFrame, slotCol: String = "slot",
      ciCol: String = "ci", numBuckets: Int = 32): DataFrame = {
    val spark = slots.sparkSession
    val maxSlot = slots.agg(max(col(slotCol))).head().getLong(0)
    val width = math.max(1L, maxSlot / numBuckets + 1)
    val bucketed = slots.withColumn("__bucket", (col(slotCol) / width).cast("long"))
    val partials = bucketed.groupBy("__bucket")
      .agg(sum(col(ciCol).cast(D)).as("__bucket_sum"))
      .orderBy("__bucket").collect()
    var running = java.math.BigDecimal.ZERO
    val offsetRows = partials.map { r =>
      val off = running
      val s = r.getDecimal(1)
      if (s != null) running = running.add(s)
      org.apache.spark.sql.Row(r.getLong(0), off)
    }
    val offsets = spark.createDataFrame(
      spark.sparkContext.parallelize(offsetRows.toIndexedSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__bucket",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__offset", D, nullable = false))))
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

  /** Distributed global row_number: the 100 TB path for
    * `row_number().over(Window.orderBy(...))`. `bucketKey` must be a
    * non-null numeric (or castable-to-double) column monotone in the
    * ordering — usually the leading order key. Rows are range-bucketed
    * on it, per-bucket counts fold into exclusive offsets on the driver
    * (≤`numBuckets` rows), and ranks are assigned only WITHIN each
    * bucket, so no single task ever sorts the whole frame. Equal bucket
    * keys always land in the same bucket, so the result matches the
    * global form wherever the full ordering is unique. */
  def rowNumberDistributed(df: DataFrame, bucketKey: Column,
      orderCols: Seq[Column], outCol: String, numBuckets: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val bounds = df.agg(min(bucketKey).cast("double"),
      max(bucketKey).cast("double")).head()
    if (bounds.isNullAt(0))  // empty input: any rank column is vacuous
      return df.withColumn(outCol, lit(0L))
    val lo = bounds.getDouble(0)
    val hi = bounds.getDouble(1)
    val width = if (hi > lo) (hi - lo) / numBuckets else 1.0
    def bucketOf(c: Column): Column =
      least(floor((c.cast("double") - lit(lo)) / lit(width)).cast("int"),
        lit(numBuckets - 1))
    val bucketed = df.withColumn("__bucket", bucketOf(bucketKey))
    val counts = bucketed.groupBy("__bucket").agg(count(lit(1)).as("__cnt"))
      .orderBy("__bucket").collect()
    var running = 0L
    val offsetRows = counts.map { r =>
      val off = running
      running += r.getLong(1)
      org.apache.spark.sql.Row(r.getInt(0), off)
    }
    val offsets = spark.createDataFrame(
      spark.sparkContext.parallelize(offsetRows.toIndexedSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__bucket",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("__offset",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val withinW = Window.partitionBy("__bucket").orderBy(orderCols: _*)
    bucketed
      .join(broadcast(offsets), Seq("__bucket"))
      .withColumn(outCol, col("__offset") + row_number().over(withinW))
      .drop("__bucket", "__offset")
  }

  /** Shuffle-key skew report — the diagnostic that decides WHEN the
    * salting utilities above are needed: the k heaviest values of a
    * prospective join/group key, each with its row count, share of
    * all rows, and skew factor (count ÷ mean-per-key; ~1 is uniform,
    * ≫1 is a hot key that will pin a reducer). One key-groupBy (the
    * count frame is key-cardinality-sized; map-side combine absorbs
    * the very skew being measured) + the TopKPerKey bounded heap —
    * never a global sort of the counts. */
  def keySkewReport(df: DataFrame, keyCol: String, k: Int = 10)
      : DataFrame = {
    val counts = df.groupBy(keyCol).agg(count(lit(1)).as("n"))
    val stats = counts.agg(count(lit(1)).as("n_keys"),
      sum("n").cast("long").as("total"))
    val top = graft.plans.TopKPerKey(counts.withColumn("__g", lit(1)),
      Seq("__g"), Seq(col("n").desc, col(keyCol).asc), k).drop("__g")
    top.crossJoin(broadcast(stats))
      .select(col(keyCol), col("n"),
        (col("n").cast("double") / col("total")).as("share"),
        (col("n").cast("double") * col("n_keys") / col("total"))
          .as("skew_x"))
  }

  /** Physical partition-balance report — the runtime twin of
    * [[keySkewReport]] (that one predicts skew from a key's value
    * distribution; this one measures what the current partitioning
    * actually produced): rows per `spark_partition_id`, folded to
    * (n_partitions, min/max/mean rows, balance = max ÷ mean). A
    * balance ≫ 1 after a repartition or bucketed write means one task
    * will straggle the stage. Engine-specific by construction
    * (partition ids are Spark runtime state, not data), so this is a
    * diagnostic utility outside the oracle set — unit-pinned
    * instead. One map-side-combined groupBy on the partition id plus
    * a one-row fold. */
  def partitionBalanceReport(df: DataFrame): DataFrame = {
    // the groupBy sees only NON-EMPTY partitions; the denominator must
    // be the physical partition count (empty partitions are exactly
    // what imbalance produces), read from the plan — no job triggered
    val nParts = df.rdd.getNumPartitions.toLong
    df.groupBy(spark_partition_id().as("pid"))
      .agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_nonempty"),
        min("n").as("min_rows"), max("n").as("max_rows"),
        sum("n").as("total_rows"))
      .withColumn("n_partitions", lit(nParts))
      .withColumn("mean_rows",
        col("total_rows").cast("double") / col("n_partitions"))
      .withColumn("balance",
        col("max_rows").cast("double") / col("mean_rows"))
  }

  type Q = (org.apache.spark.sql.SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "diag_key_skew" -> ((s, dir) =>
      keySkewReport(graft.Tables.load(s, dir, "lineitem"), "l_suppkey")
        .orderBy(col("n").desc, col("l_suppkey"))),
  )

  val oracles: Map[String, String] = Map(
    "diag_key_skew" ->
      """WITH counts AS (
        |  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM lineitem GROUP BY l_suppkey),
        |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(SUM(n) AS BIGINT) AS total FROM counts)
        |SELECT l_suppkey, n,
        |  CAST(n AS DOUBLE) / total AS share,
        |  CAST(n AS DOUBLE) * n_keys / total AS skew_x
        |FROM counts CROSS JOIN s
        |ORDER BY n DESC, l_suppkey LIMIT 10""".stripMargin,
  )
}
