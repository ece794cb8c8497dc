package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native content-defined-chunking cut finder: the 1-based character
  * positions i where `md5Long(substring(text, i, k)) % 2^maskBits = 0`
  * (bit-identical to [[graft.llm.Dedup]]'s md5Long — the top 60 bits
  * of the window's MD5 — so the DuckDB oracle twin is unchanged), in
  * ONE pass over the UTF-8 bytes.
  *
  * Why an Expression and not the `transform(sequence(...),
  * i => md5Long(substring(text, i, k)))` DataFrame form it replaces:
  * each interpreted `substring(text, i, k)` call walks the string
  * from byte 0 to find character i — O(len) per window, O(len²) per
  * document — and worse, the optimizer's inferred generate filter
  * (`size(spans) > 0` pushed below the projection) re-derives the
  * whole array expression INSIDE a predicate where per-element
  * lambda references re-evaluate it per element: O(len³) per
  * document. Measured: a bench_cdc_full warmup task at sf0.1 burned
  * 35 CPU-minutes on ~2.7k documents (~775 ms/doc for ~1 ms of real
  * hashing). Here character offsets are computed once (O(len)) and
  * each window digests exactly k characters' bytes from its recorded
  * offset — O(len·k) per document, re-entrant, and a duplicated
  * reference in an inferred filter costs one extra linear pass, not
  * a cubic blowup.
  */
case class CdcCutPositions(child: Expression, k: Int, maskBits: Int)
    extends UnaryExpression {
  require(k >= 1 && maskBits >= 1 && maskBits <= 60,
    "cdc_cut_positions requires k >= 1 and maskBits in [1, 60]")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdc_cut_positions requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "cdc_cut_positions"

  override def nullSafeEval(input: Any): Any =
    CdcCutPositions.compute(input.asInstanceOf[UTF8String], k,
      (1L << maskBits) - 1L)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CdcCutPositions.compute($c, $k, ${(1L << maskBits) - 1L}L)")

  override protected def withNewChildInternal(
      newChild: Expression): CdcCutPositions = copy(child = newChild)
}

object CdcCutPositions {

  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Top 60 bits of an MD5 digest as a positive long — the value of
    * `conv(substring(md5hex, 1, 15), 16, 10)`: 15 hex chars = bytes
    * 0..6 plus the high nibble of byte 7. */
  private def top60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  /** Cut positions (1-based char index of each k-gram window whose
    * hash passes the mask). Empty array when the text has fewer than
    * k characters (the whole-doc-chunk case upstream). */
  def compute(s: UTF8String, k: Int, mask: Long): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // one pass: byte offset of every character boundary
    val offs = new Array[Int](n + 1)
    var nChars = 0
    var i = 0
    while (i < n) {
      offs(nChars) = i
      val b = bytes(i) & 0xff
      i += (if (b < 0x80) 1
            else if (b < 0xe0) 2
            else if (b < 0xf0) 3
            else 4)
      nChars += 1
    }
    offs(nChars) = n
    if (nChars < k) return new GenericArrayData(Array.empty[Int])
    val md = md5Local.get()
    val cuts = new java.util.ArrayList[Integer]()
    var c = 0
    while (c + k <= nChars) {
      md.reset()
      md.update(bytes, offs(c), offs(c + k) - offs(c))
      if ((top60(md.digest()) & mask) == 0L) cuts.add(c + 1)
      c += 1
    }
    val out = new Array[Int](cuts.size())
    var j = 0
    while (j < out.length) { out(j) = cuts.get(j); j += 1 }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def cdcCutPositions(c: Column, k: Int, maskBits: Int): Column =
    ColumnBridge.column(
      CdcCutPositions(ColumnBridge.expression(c), k, maskBits))
}
