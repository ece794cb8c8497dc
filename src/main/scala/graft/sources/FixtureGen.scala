package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fixture up-scaler for the scaling-curve evidence.
  *
  * The driver ships sf0.001/sf0.01/sf0.1 fixtures (TESTDATA.md,
  * read-only) — one decade short of the 100× step the 100 TB claims
  * rest on. This generator bootstraps an arbitrary-scale `documents` /
  * `embeddings` pair from the EMPIRICAL distributions of a shipped
  * fixture dir (unigram frequencies, length histogram, lang/source
  * mix, Gaussian-unit-vector embeddings), so the `bench_*` full-corpus
  * families can be measured at sf1 (= 10× sf0.1) and beyond on
  * statistically like-for-like data.
  *
  * Design notes (the generator itself must survive its own scale-up):
  *  - generation is fully distributed: `spark.range(n)` partitions the
  *    id space; every attribute of a row is a pure function of
  *    (seed, id) through xxhash64 — no driver loop, no rand(), no
  *    shuffle at all (the only collects are the metadata-scale
  *    distribution extractions: ~31 vocab rows, 5 langs, 20 sources,
  *    91 length buckets from the source fixture);
  *  - sampling uses 4096-slot largest-remainder alias tables shipped
  *    as array literals — `element_at(lit(table), pmod(hash, slots))`
  *    is O(1) per draw and stays inside whole-stage codegen (no
  *    per-element inverse-CDF search, no UDF);
  *  - duplicate discipline matches the shipped fixtures: the raw
  *    corpus contains no exact duplicates (dedup fixtures synthesize
  *    their own variants in-query), which the generated id-salted hash
  *    stream preserves with overwhelming probability (≥10 draws from a
  *    31-word vocabulary per doc).
  */
object FixtureGen {

  /** Largest-remainder allocation of `slots` alias slots over weighted
    * values — sampling by uniform slot index then reproduces the
    * weights to within 1/slots. */
  private[sources] def aliasSlots[T](weights: Seq[(T, Long)], slots: Int)(
      implicit ct: scala.reflect.ClassTag[T]): Array[T] = {
    require(weights.nonEmpty, "empty weight table")
    val total = weights.map(_._2).sum.toDouble
    val exact = weights.map { case (v, w) => (v, w * slots / total) }
    val floors = exact.map { case (v, e) => (v, e.toInt) }
    var used = floors.map(_._2).sum
    // hand the remaining slots to the largest fractional remainders,
    // ties broken by the (stable) input order for determinism
    val byRemainder = exact.zip(floors).map { case ((v, e), (_, f)) => (v, e - f) }
      .sortBy(-_._2)
    val bonus = scala.collection.mutable.Map.empty[T, Int]
    var i = 0
    while (used < slots) {
      val v = byRemainder(i % byRemainder.size)._1
      bonus(v) = bonus.getOrElse(v, 0) + 1
      used += 1; i += 1
    }
    floors.flatMap { case (v, f) =>
      Seq.fill(f + bonus.getOrElse(v, 0))(v)
    }.toArray
  }

  private val Slots = 4096

  /** One uniform slot index in [1, Slots] as a 1-based element_at
    * index, keyed by (seed, id, stream tag [, extra]). */
  private def slot(seed: Long, tag: String, id: org.apache.spark.sql.Column,
      extra: org.apache.spark.sql.Column*) =
    (pmod(xxhash64((lit(seed) +: lit(tag) +: id +: extra): _*), lit(Slots.toLong))
      .cast("int") + 1)

  /** Generate `nDocs` documents distributed like `srcDir`'s. */
  def documents(spark: SparkSession, srcDir: String, nDocs: Long,
      seed: Long = 61): DataFrame = {
    val src = spark.read.parquet(s"$srcDir/documents.parquet")
    // metadata-scale extractions (vocab ~31, langs 5, sources 20,
    // length buckets ≤91) — documented driver-side collects
    val vocabW = src.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().orderBy("w").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val langW = src.groupBy("lang").count().orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val sourceW = src.groupBy("source").count().orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val lenW = src.select(size(split(col("text"), " ")).as("n"))
      .groupBy("n").count().orderBy("n").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    val vocabLit = lit(aliasSlots(vocabW, Slots))
    val langLit = lit(aliasSlots(langW, Slots))
    val sourceLit = lit(aliasSlots(sourceW, Slots))
    val lenLit = lit(aliasSlots(lenW, Slots))
    spark.range(nDocs).toDF("doc_id")
      .withColumn("n_words", element_at(lenLit, slot(seed, "len", col("doc_id"))))
      .withColumn("text", array_join(
        transform(sequence(lit(0), col("n_words") - 1),
          j => element_at(vocabLit, slot(seed, "word", col("doc_id"), j))),
        " "))
      .withColumn("lang", element_at(langLit, slot(seed, "lang", col("doc_id"))))
      .withColumn("source", element_at(sourceLit, slot(seed, "src", col("doc_id"))))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
  }

  /** Generate `nVecs` unit-norm Gaussian embeddings shaped like the
    * shipped `embeddings` table (ARRAY<FLOAT>[dim], label 0-9). */
  def embeddings(spark: SparkSession, nVecs: Long, dim: Int = 64,
      seed: Long = 61): DataFrame = {
    // Box-Muller from two hash-uniforms; u1 offset by 0.5/2^20 keeps
    // log() off exact zero
    val M = 1048576L
    def unif(tag: String, d: org.apache.spark.sql.Column) =
      (pmod(xxhash64(lit(seed), lit(tag), col("vec_id"), d), lit(M))
        .cast("double") + 0.5) / M.toDouble
    spark.range(nVecs).toDF("vec_id")
      .withColumn("g", transform(sequence(lit(0), lit(dim - 1)), d =>
        sqrt(lit(-2.0) * log(unif("u1", d))) * cos(lit(2.0 * math.Pi) * unif("u2", d))))
      .withColumn("norm", sqrt(aggregate(col("g"), lit(0.0),
        (acc, x) => acc + x * x)))
      .withColumn("embedding",
        transform(col("g"), x => (x / col("norm")).cast("float")))
      .withColumn("label",
        pmod(xxhash64(lit(seed), lit("label"), col("vec_id")), lit(10L)).cast("int"))
      .select("vec_id", "embedding", "label")
  }

  /** Write a scaled fixture dir: documents + embeddings at `mult`× the
    * row counts of `srcDir` (sf0.1 × 10 = the sf1 decade). */
  def writeScaled(spark: SparkSession, srcDir: String, outDir: String,
      mult: Int, seed: Long = 61): Unit = {
    val nDocs = spark.read.parquet(s"$srcDir/documents.parquet").count() * mult
    val nVecs = spark.read.parquet(s"$srcDir/embeddings.parquet").count() * mult
    documents(spark, srcDir, nDocs, seed)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    embeddings(spark, nVecs, seed = seed)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }

  /** CLI: FixtureGen <srcDir> <outDir> <mult>. */
  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, mult) = args.take(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    writeScaled(spark, srcDir, outDir, mult.toInt)
    println(s"[fixturegen] wrote ${mult}x of $srcDir to $outDir")
    spark.stop()
  }
}
