package graft.text

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: exact unigram-LM Viterbi segmentation of
  * one word under a sorted piece-cost table —
  * `graft_viterbi(word, entries)` with
  * `entries: array<struct<piece: string, cost: decimal(18,6)>>` sorted
  * ascending by piece (the 1-row `array_sort(collect_list(...))`
  * broadcast the unigram ops build from their ≤|chars|+64-piece vocab).
  *
  * Replaces the interpreted higher-order `aggregate(sequence(1, len), …)`
  * fold (TokenizerOps.sparkViterbiSt — kept as the NativeExprSpec
  * equality reference): HOFs never enter codegen and the fold copies the
  * whole DP prefix array per position. Here the DP runs as a primitive
  * loop — per position the ≤4 candidate extensions (piece lengths 1–4,
  * the vocab's max), each a binary search over the sorted entries — and
  * whole-stage codegen survives (the MinHashSig static-call recipe).
  *
  * Bit-exact contract with the fold and the DuckDB unrolled-CTE twin
  * (TokenizerOps.duckViterbiStep): costs ride as scale-6 unscaled longs
  * (decimal(18,6) addition of scale-6 addends is exact, so long adds are
  * the same integers); candidates are minimized by (cost, n, seg) —
  * exactly `array_min` / `min(struct)` field order, the seg tie-break
  * compared as a string (words are [a-z]+, so java String order ==
  * UTF8String binary order); the returned seg keeps the fold's leading
  * space. A position with no matching piece makes the word unreachable →
  * NULL, matching `array_min(filter(…))` of an empty array.
  */
case class ViterbiSegment(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_viterbi"

  override def dataType: DataType = ViterbiSegment.OutType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(s: StructType, _))
          if s.length == 2 && s(0).dataType == StringType &&
            s(1).dataType == DecimalType(18, 6) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, array<struct<piece: string, " +
          s"cost: decimal(18,6)>>), got $other")
    }

  override protected def nullSafeEval(word: Any, entries: Any): Any =
    ViterbiSegment.run(word.asInstanceOf[UTF8String],
      entries.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (word, entries) => s"""
       |${ev.value} = graft.text.ViterbiSegment.run($word, $entries);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ViterbiSegment {

  val OutType: StructType = StructType(Seq(
    StructField("cost", DecimalType(18, 6), nullable = false),
    StructField("n", IntegerType, nullable = false),
    StructField("seg", StringType, nullable = false)))

  private val MaxPieceLen = 4

  /** Unscaled scale-6 cost of `piece` in the sorted entries, or
    * Long.MinValue when absent. Binary search on UTF8String binary
    * order — the same order `array_sort` produced the entries in. */
  private def lookup(entries: ArrayData, m: Int, piece: UTF8String): Long = {
    var lo = 0
    var hi = m - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val row = entries.getStruct(mid, 2)
      val c = row.getUTF8String(0).compareTo(piece)
      if (c == 0) return row.getDecimal(1, 18, 6).toUnscaledLong
      else if (c < 0) lo = mid + 1
      else hi = mid - 1
    }
    Long.MinValue
  }

  /** The DP. Called from interpreted eval AND generated code (static
    * forwarder — the MinHashSig recipe). Returns null for an
    * unsegmentable word. */
  def run(word: UTF8String, entries: ArrayData): InternalRow = {
    val w = word.toString
    val len = w.length
    val m = entries.numElements()
    val cost = new Array[Long](len + 1)
    val nPieces = new Array[Int](len + 1)
    val seg = new Array[String](len + 1)
    seg(0) = ""
    var j = 1
    while (j <= len) {
      var bestC = 0L
      var bestN = 0
      var bestS: String = null
      val lmax = if (j < MaxPieceLen) j else MaxPieceLen
      var l = 1
      while (l <= lmax) {
        val from = j - l
        if (seg(from) != null) {
          val piece = w.substring(from, j)
          val c = lookup(entries, m, UTF8String.fromString(piece))
          if (c != Long.MinValue) {
            val nc = cost(from) + c
            val nn = nPieces(from) + 1
            val ns = seg(from) + " " + piece
            // min by (cost, n, seg) — the array_min / min(struct) order
            if (bestS == null || nc < bestC ||
              (nc == bestC && (nn < bestN ||
                (nn == bestN && ns.compareTo(bestS) < 0)))) {
              bestC = nc; bestN = nn; bestS = ns
            }
          }
        }
        l += 1
      }
      cost(j) = bestC
      nPieces(j) = bestN
      seg(j) = bestS
      j += 1
    }
    if (seg(len) == null) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](Decimal.createUnsafe(cost(len), 18, 6), nPieces(len),
        UTF8String.fromString(seg(len))))
  }
}
