package graft.text

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: space-joined word n-grams over an
  * array<string> column — the shingling primitive under every
  * shingle-based dedup operator (ngram-jaccard, minhash, decontaminate).
  *
  * Why an Expression and not the `zip_with`-slice composition: Spark's
  * higher-order functions always run interpreted (no codegen), and each
  * `slice` materializes an intermediate array, so an n-gram needs n array
  * copies plus boxed lambda calls per element — outside every
  * whole-stage-codegen span. This expression emits one tight generated
  * loop over the unsafe array data (`doGenCode`), producing each shingle
  * with a single `UTF8String.concatWs` and no intermediate arrays, and
  * keeps the surrounding Project inside codegen.
  *
  * Semantics are identical to the composition it replaces (and to the
  * DuckDB oracle's `list_transform(range(...), ...)` twin): documents
  * shorter than n words yield an empty array; output order follows word
  * order; a shingle touching a NULL word is NULL (`concat` semantics —
  * `split()` output never contains nulls, but the function is public).
  * Returns NULL only for NULL input.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def prettyName: String = "graft_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }

  private val sep = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val k = words.numElements()
    val m = if (k < n) 0 else k - n + 1
    val out = new Array[Any](m)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < m) {
      var j = 0
      var hasNull = false
      while (j < n) {
        if (words.isNullAt(i + j)) hasNull = true
        else parts(j) = words.getUTF8String(i + j)
        j += 1
      }
      out(i) = if (hasNull) null else UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, words => {
      val sepRef = ctx.addReferenceObj("sep", sep, classOf[UTF8String].getName)
      val k = ctx.freshName("k")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val parts = ctx.freshName("parts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val u = classOf[UTF8String].getName
      val hasNull = ctx.freshName("hasNull")
      s"""
         |int $k = $words.numElements();
         |int $m = $k < $n ? 0 : $k - $n + 1;
         |$u[] $out = new $u[$m];
         |$u[] $parts = new $u[$n];
         |for (int $i = 0; $i < $m; $i++) {
         |  boolean $hasNull = false;
         |  for (int $j = 0; $j < $n; $j++) {
         |    if ($words.isNullAt($i + $j)) { $hasNull = true; }
         |    else { $parts[$j] = $words.getUTF8String($i + $j); }
         |  }
         |  $out[$i] = $hasNull ? null : $u.concatWs($sepRef, $parts);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
