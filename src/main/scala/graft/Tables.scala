package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
    // events.ts is parquet TIMESTAMP(NANOS), which Spark only reads as
    // a long; normalize to a microsecond TimestampType column so every
    // consumer (and DuckDB, which truncates ns→µs the same way) agrees.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.name == "ts" && f.dataType == LongType)
        d.withColumn("ts", timestamp_micros(floor(col("ts") / 1000L).cast("long")))
      else d
    }
  }

  /** Register all fixture tables as temp views so spark.sql(...) can
    * address them by name (mirrors the reference's catalog.schema.table
    * registration, import_tables.py:12-26, without a metastore). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
