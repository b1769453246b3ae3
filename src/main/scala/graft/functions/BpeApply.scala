package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native greedy BPE merge application — the fused form of the
  * `aggregate(slice(...), array(head), (acc, sym) -> ...)` fold chain
  * `bpeApplyMerge` used to build per rule. That higher-order chain
  * re-allocates and copies the accumulator array ONCE PER SYMBOL
  * (`concat(slice(acc, 1, size-1), array(m))` and `concat(acc,
  * array(sym))` are full copies), so applying R rules to a word of n
  * symbols costs O(R·n²) array copies through the interpreted lambda
  * evaluator — measured as the single dominant job of x85 (2.3 s of a
  * 4.7 s query: ~125k held-out words × 3 chained folds).
  *
  * Here: all R rules applied in ONE expression, each as a single
  * left-to-right scan over a plain Array[UTF8String] (append-only
  * buffer, no copies). Semantics are exactly the fold's: a freshly
  * merged token never re-matches as the LEFT side of the same rule —
  * in the fold because `m = a + b` with non-empty `b` can never equal
  * `a` (whole-symbol comparison), here structurally because the scan
  * advances past both merged symbols. Rules apply SEQUENTIALLY (one
  * full pass per rule), the published BPE semantics the DuckDB oracle
  * replays with one recursive CTE per rule.
  */
case class BpeApplyRules(child: Expression, rules: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bpe_apply_rules requires array<string>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def prettyName: String = "bpe_apply_rules"

  @transient private lazy val compiled: Array[(UTF8String, UTF8String, UTF8String)] =
    rules.map { case (a, b) =>
      (UTF8String.fromString(a), UTF8String.fromString(b),
        UTF8String.fromString(a + b))
    }.toArray

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n <= 1) return arr
    var cur = new Array[UTF8String](n)
    var i = 0
    while (i < n) { cur(i) = arr.getUTF8String(i); i += 1 }
    var len = n
    var r = 0
    while (r < compiled.length) {
      val (a, b, m) = compiled(r)
      val out = new Array[UTF8String](len)
      var o = 0
      var j = 0
      while (j < len) {
        if (j + 1 < len && cur(j) != null && cur(j).equals(a) &&
            cur(j + 1) != null && cur(j + 1).equals(b)) {
          out(o) = m; o += 1; j += 2
        } else {
          out(o) = cur(j); o += 1; j += 1
        }
      }
      cur = out
      len = o
      r += 1
    }
    val trimmed = new Array[Any](len)
    var k = 0
    while (k < len) { trimmed(k) = cur(k); k += 1 }
    new GenericArrayData(trimmed)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeApply", this,
      classOf[BpeApplyRules].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApplyRules =
    copy(child = newChild)
}
