package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: exact integer dot product of two
  * `array<long>` columns (the int8-quantized-vector domain —
  * [[graft.operators.Similarity.quantizeInt8]]), with whole-stage codegen.
  *
  * Why a custom Expression (SURVEY.md §7.3 preference order (b)): the HOF
  * formulation `aggregate(zip_with(a, b, _*_), 0, _+_)` is a
  * CodegenFallback — the semantic-contamination screen (q138) pays
  * per-element lambda interpretation AND boxing on every candidate pair,
  * on the broadcast-nested-loop hot path. This compiles to a primitive
  * long loop inside the enclosing codegen stage.
  *
  * Semantics mirror the HOF it replaces: dot over the shorter prefix
  * (zip_with truncation... zip_with actually pads with null; the engine
  * contract is equal-length quantized vectors, enforced upstream by
  * quantizeInt8 producing fixed dims — prefix semantics only matter for
  * malformed input), null if either array is null. Overflow follows the
  * session's ANSI posture via Math.multiplyExact/addExact — a quantized
  * dot that exceeds Long range is a caller bug (int8 dims ≤ 64 keep
  * |dot| ≤ 127²·64 ≈ 1.0e6) and must throw, not wrap. */
case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L
    var i = 0
    while (i < n) {
      dot = Math.addExact(dot, Math.multiplyExact(x.getLong(i), y.getLong(i)))
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $dot = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot = java.lang.Math.addExact($dot,
         |    java.lang.Math.multiplyExact($a.getLong($i), $b.getLong($i)));
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLong =
    copy(left = newLeft, right = newRight)
}
