package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated deterministic parquet fixtures
  * (see TESTDATA.md). One parquet file per table; schemas in FIXTURES.md §A.
  *
  * At 100 TB these would be multi-file partitioned tables; `spark.read
  * .parquet(dir)` handles both transparently, and every query in this
  * library is written against the DataFrame, never the file layout.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Normalize the fixture `ts` column to a session-UTC TimestampType
    // regardless of how the generator wrote it: TIMESTAMP(NANOS) reads
    // as a long (truncate ns→µs, as DuckDB does); plain timestamp[us]
    // with no UTC flag reads as TIMESTAMP_NTZ in Spark 4, which
    // watermarks and tz-aware date functions reject — reinterpret its
    // wall-clock as UTC (the session zone), the same instant DuckDB
    // assigns the naive value.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.name == "ts" && f.dataType == LongType)
        d.withColumn("ts", timestamp_micros(floor(col("ts") / 1000L).cast("long")))
      else if (f.name == "ts" && f.dataType == TimestampNTZType)
        d.withColumn("ts", col("ts").cast(TimestampType))
      else d
    }
  }

  /** Register all fixture tables as temp views so spark.sql(...) can
    * address them by name (mirrors the reference's catalog.schema.table
    * registration, import_tables.py:12-26, without a metastore). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Register as EXTERNAL catalog tables and ANALYZE them — the
    * rebuild of the reference's statistics stance (Iceberg
    * `write.metadata.statistics.enabled=true` + Trino
    * `extended-statistics.enabled`, csv_to_iceberg.py:86): with table
    * and column stats in the catalog and CBO on, Catalyst's join
    * reordering and the §2.B plan features (rowCount, n_distinct,
    * null_frac) run on real numbers instead of size guesses. */
  def registerCatalog(spark: SparkSession, dir: String,
      analyze: Boolean = true, namespace: String = "graft"): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $namespace")
    names.foreach { n =>
      spark.sql(s"DROP TABLE IF EXISTS $namespace.$n")
      spark.sql(
        s"CREATE TABLE $namespace.$n USING parquet LOCATION '$dir/$n.parquet'")
      if (analyze) {
        // column stats only exist for atomic types (arrays — e.g.
        // embeddings — are unsupported by ANALYZE ... FOR COLUMNS)
        val atomic = spark.table(s"$namespace.$n").schema.fields
          .filterNot(f => f.dataType match {
            case _: org.apache.spark.sql.types.ArrayType |
                 _: org.apache.spark.sql.types.MapType |
                 _: org.apache.spark.sql.types.StructType |
                 org.apache.spark.sql.types.BinaryType => true
            case _ => false
          })
          .map(f => s"`${f.name}`")
        if (atomic.nonEmpty)
          spark.sql(s"ANALYZE TABLE $namespace.$n COMPUTE STATISTICS " +
            s"FOR COLUMNS ${atomic.mkString(", ")}")
        else
          spark.sql(s"ANALYZE TABLE $namespace.$n COMPUTE STATISTICS")
      }
    }
  }
}
