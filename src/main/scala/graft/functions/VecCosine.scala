package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd cosine similarity over two `array<float>` columns.
  *
  * The built-in formulation (`aggregate(zip_with(...))` after an
  * `array<double>` cast) allocates three intermediate arrays per row and
  * walks the vectors four times; embedding scoring is the one hot loop
  * in the similarity-search path (x05/x06) where that overhead is per
  * candidate × per query. This expression is the SURVEY §7.3 "custom
  * `Expression` only where the built-ins genuinely can't express it
  * efficiently" tier: one fused pass, no allocation, whole-stage
  * codegen via `doGenCode` (no UDF boxing, no codegen fence).
  *
  * Accumulation is double, left-to-right — bit-identical to the DuckDB
  * oracle's `list_dot_product` on `DOUBLE[]` casts.
  */
case class VecCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_cosine requires two array<float> arguments, got " +
      s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  /** Must be explicit: the expression returns NULL for length-mismatch
    * and null-element inputs even when both children are non-nullable —
    * without this override the codegen NULL branch is unreachable and a
    * mismatch silently scores 0.0. */
  override def nullable: Boolean = true

  override def prettyName: String = "vec_cosine"

  /** Null semantics match the built-in `aggregate(zip_with(...))`
    * formulation: a null element anywhere — or a length mismatch,
    * which zip_with pads with nulls — yields NULL, never a silently
    * wrong score. */
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val bad = ctx.freshName("bad")
      s"""
        |final int $n = $a.numElements();
        |boolean $bad = $n != $b.numElements();
        |double $dot = 0.0, $na = 0.0, $nb = 0.0;
        |for (int $i = 0; !$bad && $i < $n; $i++) {
        |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
        |  final double $xi = (double) $a.getFloat($i);
        |  final double $yi = (double) $b.getFloat($i);
        |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
        |}
        |if ($bad) {
        |  ${ev.isNull} = true;
        |} else {
        |  ${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosine =
    copy(left = newLeft, right = newRight)
}
