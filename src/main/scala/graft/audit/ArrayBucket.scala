package graft.audit

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression: number of elements of a SORTED double
  * array that are ≤ the probe value (0 when every element is greater, or
  * the array is empty). Used as an order-preserving range-bucket
  * assigner: with ascending equi-depth boundaries b, `ArrayBucket(b, v)`
  * is monotone in v, and equal values always land in the same bucket —
  * the two properties global-rank reconstruction needs
  * (AuditQueries.auditValueQuantiles).
  *
  * Like ArrayFloorSearch, this exists because the lambda form
  * (`size(filter(b, x -> x <= v))`) is an O(|b|) interpreted HOF per row;
  * this is an O(log |b|) primitive binary search inside whole-stage
  * codegen. Boundaries must be non-null and ascending (approx_percentile
  * output at the call site guarantees both).
  */
case class ArrayBucket(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_array_bucket"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (array<double> sorted ascending, double), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val v = b.asInstanceOf[Double]
    var lo = 0
    var hi = arr.numElements() - 1
    var res = 0
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (arr.getDouble(mid) <= v) { res = mid + 1; lo = mid + 1 }
      else hi = mid - 1
    }
    res
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, v) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0;
         |int $hi = $arr.numElements() - 1;
         |${ev.value} = 0;
         |while ($lo <= $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($arr.getDouble($mid) <= $v) { ${ev.value} = $mid + 1; $lo = $mid + 1; }
         |  else { $hi = $mid - 1; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
