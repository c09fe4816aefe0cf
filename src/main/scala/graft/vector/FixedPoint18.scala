package graft.vector

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Scale-18 scalar fixed-point carriers — the rank-mass lane of the
  * iterative graph ops (q_part_pagerank's edge⨝rank exchange).
  *
  * `DECIMAL(38,18)` per-term sums are exact and order-free, but each
  * partial rides the shuffle as a 16-byte unscaled int128 plus null
  * bookkeeping, and the aggregate buffer boxes `Decimal`. When the summed
  * mass is provably bounded (PageRank: total rank mass ≡ 1, every group
  * sum ≤ 1 < 9.2 = Long.MaxValue at scale 18), the SAME integers fit a
  * primitive long lane: `graft_to_scaled18` emits exactly the unscaled
  * value `CAST(x AS DECIMAL(38,18))` would produce, `sum(long)` adds the
  * unscaleds exactly as the decimal sum would (ANSI overflow = loud, and
  * unreachable under the mass bound), and `graft_from_scaled18` reverses
  * it with the same single correctly-rounded conversion
  * `CAST(DECIMAL(38,18) AS DOUBLE)` performs — so swapping the lane
  * cannot move any output bit (pinned in NativeExprSpec against the
  * decimal path). Roughly half the shuffle width, primitive agg buffers.
  *
  * Conversion fidelity: Spark's double→decimal cast goes through
  * `BigDecimal(Double.toString(x))` then HALF_UP to scale 18; decimal→
  * double is `BigDecimal.doubleValue` (one correctly-rounded step). Both
  * are reproduced verbatim below. Values beyond long capacity at scale 18
  * (|x| ≥ 9.223…) throw ArithmeticException — the FixedPointVec loud-
  * failure discipline, not a silent wrap.
  */
case class ToScaled18(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_to_scaled18"
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects double, got ${other.simpleString}")
  }

  override protected def nullSafeEval(x: Any): Any =
    new java.math.BigDecimal(java.lang.Double.toString(x.asInstanceOf[Double]))
      .setScale(18, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => s"""
       |${ev.value} = new java.math.BigDecimal(java.lang.Double.toString($x))
       |  .setScale(18, java.math.RoundingMode.HALF_UP)
       |  .unscaledValue().longValueExact();
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_from_scaled18(l)` → DOUBLE: the exact inverse lane —
  * `CAST(DECIMAL(38,18)-with-unscaled-l AS DOUBLE)`, one correctly-rounded
  * BigDecimal→double conversion (NOT `l / 1e18`, which rounds twice and
  * can drift an ulp above 2⁵³). */
case class FromScaled18(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_from_scaled18"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects bigint, got ${other.simpleString}")
  }

  override protected def nullSafeEval(l: Any): Any =
    new java.math.BigDecimal(
      java.math.BigInteger.valueOf(l.asInstanceOf[Long]), 18).doubleValue()

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, l => s"""
       |${ev.value} = new java.math.BigDecimal(
       |  java.math.BigInteger.valueOf($l), 18).doubleValue();
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
