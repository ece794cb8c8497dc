package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as ONE custom `TypedImperativeAggregate`: the
  * buffer holds all `numHashes` running minima, updated per input
  * shingle — the sketch-style aggregate the builder prompt reserves
  * custom Catalyst work for.
  *
  * Semantics are identical to [[graft.llm.Dedup.minHashSignaturesWide]]
  * (seed i = min over the 8-hex slice i%4 of md5((i/4):shingle),
  * hex-lexicographic — four seeds per digest); the buffer form
  * exists for pipelines that want the signature as ONE array column
  * from one aggregate (partial/final merge = element-wise min, so the
  * shuffle carries `numHashes` strings per group per partition —
  * the same map-side-combine shape as the wide form). */
case class MinHashSigAgg(child: Expression, numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[String]] {

  override def createAggregationBuffer(): Array[String] =
    Array.fill(numHashes)(null)

  @transient private lazy val md = MessageDigest.getInstance("MD5")

  private def md5hex(s: String): String = {
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  override def update(buf: Array[String], input: InternalRow): Array[String] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      // seed i = 8-hex slice i%4 of md5((i/4):shingle) — the same
      // sliced family as Dedup.minHashSignaturesWide (one digest
      // serves four seeds; hex slices order like their numeric value)
      var g = 0
      while (g * 4 < numHashes) {
        val h = md5hex(s"$g:$s")
        var j = 0
        while (j < 4 && g * 4 + j < numHashes) {
          val i = g * 4 + j
          val slice = h.substring(8 * j, 8 * j + 8)
          if (buf(i) == null || slice < buf(i)) buf(i) = slice
          j += 1
        }
        g += 1
      }
    }
    buf
  }

  override def merge(b1: Array[String], b2: Array[String]): Array[String] = {
    var i = 0
    while (i < numHashes) {
      if (b1(i) == null || (b2(i) != null && b2(i) < b1(i))) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[String]): Any =
    new GenericArrayData(buf.map(s =>
      if (s == null) null else UTF8String.fromString(s)))

  override def serialize(buf: Array[String]): Array[Byte] =
    buf.map(s => if (s == null) "" else s).mkString("\n")
      .getBytes(StandardCharsets.UTF_8)

  override def deserialize(bytes: Array[Byte]): Array[String] =
    new String(bytes, StandardCharsets.UTF_8).split("\n", -1)
      .map(s => if (s.isEmpty) null else s)

  override def dataType: DataType = ArrayType(StringType)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "minhash_sig"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSigAgg =
    copy(child = newChildren.head)
}

object MinHashSigAgg {
  /** Column API: `minhashSig(col("shingle"), 16)` → array<string>. */
  def minhashSig(c: Column, numHashes: Int): Column =
    ColumnBridge.column(
      MinHashSigAgg(ColumnBridge.expression(c), numHashes)
        .toAggregateExpression())
}
