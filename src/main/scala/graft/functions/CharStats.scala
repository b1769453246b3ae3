package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd per-string character statistics:
  * `[code_points, distinct_code_points, Σ n_c·(n_c−1)]` — the inputs to
  * the Simpson concentration index, an integer-exact diversity/
  * repetition signal (x35's quality score).
  *
  * Why an expression and not explode+groupBy: character-grain rows for
  * a 100 TB corpus are a ~100 TB shuffle for a per-document statistic
  * that needs no cross-row information. One fused pass per document,
  * zero shuffle, stays inside whole-stage codegen (same §7.3 tier as
  * [[VecCosine]]). Why no entropy: log is transcendental and
  * last-ulp-dependent across engines — the Simpson numerator is pure
  * integer arithmetic, so the DuckDB oracle hash-matches exactly.
  *
  * Counting is by Unicode code point (matches DuckDB's per-character
  * string indexing), not UTF-16 code unit.
  */
case class CharStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_stats requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "char_stats"

  override protected def nullSafeEval(input: Any): Any =
    CharStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one static-forwarder call per row: the counting loop needs a hash
    // map, which is exactly what generated Java should delegate rather
    // than inline — the call stays inside the codegen'd pipeline (no
    // UDF serialization fence, no boxing of the row)
    defineCodeGen(ctx, ev, c => s"graft.functions.CharStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharStats =
    copy(child = newChild)
}

object CharStats {
  /** Static entry point for generated code (Scala emits a static
    * forwarder on the companion class). */
  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val counts = new java.util.HashMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      counts.merge(cp, 1L, (a, b) => a + b)
    }
    var simpson = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      simpson += c * (c - 1)
    }
    new GenericArrayData(Array[Long](n, counts.size.toLong, simpson))
  }
}
