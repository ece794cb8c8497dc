package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Column wrappers over Spark's own bloom-filter expression pair —
  * the mergeable sketch the engine itself builds for runtime join
  * pruning (`InjectRuntimeFilter`), exposed here for DATA-level
  * membership pruning (batch-vs-corpus dedup,
  * `graft.llm.Dedup.bloomProbeDedup`). The pair is not in the public
  * FunctionRegistry, so the library bridges the catalyst classes
  * directly — no sketch code re-implemented, and the aggregate stays
  * mergeable/partial (map-side combine) like every other metric
  * sketch in the suite (HLL distincts, GK quantiles, CMS counts).
  *
  * The sketch travels as a VALUE (one binary row, collected and
  * re-embedded as a literal): `BloomFilterMightContain` requires its
  * filter side constant-foldable, and a literal sketch broadcasts
  * with the task binary — the centroids/offsets pattern used
  * throughout the suite for config-scale artifacts.
  */
object BloomSketch {

  /** One-pass mergeable Bloom aggregate over a LONG column (hash the
    * value first — `xxhash64(text)` — exactly like the engine's
    * runtime filters). Returns the serialized sketch as binary. */
  def bloomAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(c),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Map-only membership probe of a collected sketch: false ⇒
    * definitely not in the corpus (no false negatives), true ⇒
    * might be (verify exactly downstream). */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType), ColumnBridge.expression(c)))
}
