package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native multi-pattern occurrence counter — the blocklist primitive
  * (C4 §2.2's "bad words" page filter, RefinedWeb's URL/word
  * blocklists): ONE Aho-Corasick pass over the document counts every
  * occurrence of every pattern (overlapping included), however many
  * patterns the list holds — versus N `regexp_count`/`replace` scans
  * for an N-phrase list, the difference between O(len) and O(N·len)
  * per document on the corpus hot path.
  *
  * The automaton is built once per plan (transient lazy on the
  * expression, shipped to executors as a codegen reference object) and
  * walks the raw UTF-8 BYTES: UTF-8 is self-synchronizing, so a byte-
  * level match is exactly a character-level match — no decode, no
  * per-row allocation, and the goto table lookup is two array reads
  * per byte inside whole-stage codegen.
  *
  * The third Expression-tier showcase after [[ParseDuration]] and
  * [[RollingHash]]; interpreted and codegen paths share
  * [[MultiPatternCount.AC.countAll]] (property-tested against a
  * per-pattern indexOf scan).
  */
case class MultiPatternCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "multi_pattern_count requires a non-empty list of non-empty patterns")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"multi_pattern_count requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "multi_pattern_count"

  @transient private lazy val ac = new MultiPatternCount.AC(patterns.toArray)

  override def nullSafeEval(input: Any): Any =
    ac.countAll(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("mpAc", ac,
      classOf[MultiPatternCount.AC].getName)
    defineCodeGen(ctx, ev, c => s"$acRef.countAll($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): MultiPatternCount = copy(child = newChild)
}

object MultiPatternCount {

  /** Byte-level Aho-Corasick automaton with a dense goto table and
    * fail-chain-cumulative output counts: `cum(state)` = number of
    * patterns ending at the current position, so the scan is
    * `state = delta(state, byte); total += cum(state)` per byte. */
  final class AC(patterns: Array[String]) extends Serializable {
    // --- trie build (grow-by-doubling node-major arrays)
    private var cap = 16
    private var next = Array.fill(cap * 256)(-1)
    private var out = new Array[Int](cap)
    private var nNodes = 1

    private def ensure(n: Int): Unit = if (n > cap) {
      val newCap = math.max(cap * 2, n)
      next = java.util.Arrays.copyOf(next, newCap * 256)
      java.util.Arrays.fill(next, cap * 256, newCap * 256, -1)
      out = java.util.Arrays.copyOf(out, newCap)
      cap = newCap
    }

    patterns.foreach { p =>
      val bytes = p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var node = 0
      bytes.foreach { b =>
        val c = b & 0xff
        if (next(node * 256 + c) < 0) {
          ensure(nNodes + 1)
          next(node * 256 + c) = nNodes
          nNodes += 1
        }
        node = next(node * 256 + c)
      }
      out(node) += 1
    }

    // --- BFS: fail links, cumulative counts, dense delta table.
    // After this block only delta/cum are needed for matching; the
    // build arrays are dropped so the serialized automaton shipped to
    // executors carries exactly the two matching tables.
    private val cum = new Array[Long](nNodes)
    private val delta = new Array[Int](nNodes * 256)
    locally {
      val fail = new Array[Int](nNodes)
      val queue = new java.util.ArrayDeque[Integer]()
      var c = 0
      while (c < 256) {
        val v = next(c)
        if (v >= 0) { fail(v) = 0; queue.add(v); delta(c) = v }
        else delta(c) = 0
        c += 1
      }
      while (!queue.isEmpty) {
        val u = queue.poll()
        cum(u) = out(u) + cum(fail(u))
        var ch = 0
        while (ch < 256) {
          val v = next(u * 256 + ch)
          if (v >= 0) {
            fail(v) = delta(fail(u) * 256 + ch)
            delta(u * 256 + ch) = v
            queue.add(v)
          } else {
            delta(u * 256 + ch) = delta(fail(u) * 256 + ch)
          }
          ch += 1
        }
      }
      next = null
      out = null
    }

    /** Total occurrences (overlapping included) of all patterns. */
    def countAll(s: UTF8String): Long = {
      val n = s.numBytes()
      var state = 0
      var total = 0L
      var i = 0
      while (i < n) {
        state = delta(state * 256 + (s.getByte(i) & 0xff))
        total += cum(state)
        i += 1
      }
      total
    }
  }

  /** Column-API entry point. */
  def multiPatternCount(c: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(
      MultiPatternCount(ColumnBridge.expression(c), patterns))
}
