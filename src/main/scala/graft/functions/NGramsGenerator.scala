package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Generator
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `ngrams(tokens, n)` — a native Catalyst Generator (the UDTF tier of
  * SURVEY §2.9: the reference's per-element JSONArray loops map to
  * built-in explode; THIS is the extension point when a custom fan-out
  * isn't expressible as explode-over-an-expression). One input row
  * yields (size - n + 1) rows of joined n-grams, streamed — the
  * generator never materializes the whole output array the way an
  * explode(transform(...)) pipeline must, which at 100 TB removes one
  * array allocation of output size per row from the hot path.
  *
  * Generators run outside whole-stage codegen (Spark plans them in a
  * dedicated Generate node); CodegenFallback is the supported shape.
  */
case class NGramsGenerator(tokens: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(tokens, n)

  override def checkInputDataTypes(): TypeCheckResult =
    (tokens.dataType, n.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (t, nt) => TypeCheckResult.TypeCheckFailure(
        s"ngrams expects (array<string>, int), got ($t, $nt)")
    }

  override def elementSchema: StructType =
    StructType(StructField("gram", StringType) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = tokens.eval(input).asInstanceOf[ArrayData]
    val nv = n.eval(input)
    if (arr == null || nv == null) return Iterator.empty
    val width = nv.asInstanceOf[Int]
    val len = arr.numElements()
    if (width <= 0 || len < width) return Iterator.empty
    val sep = UTF8String.fromString("_")
    (0 to len - width).iterator.map { i =>
      val parts = (i until i + width).map(arr.getUTF8String)
      // null token anywhere in the window -> null gram (SQL semantics)
      val gram =
        if (parts.contains(null)) null
        else UTF8String.concatWs(sep, parts: _*)
      InternalRow(gram)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NGramsGenerator =
    copy(tokens = newChildren(0), n = newChildren(1))
}
