package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native fused DSIR featurizer: token array → per-doc hashed-bigram
  * bucket counts, `array<struct<b BIGINT, cnt BIGINT>>` sorted by
  * bucket. Replaces the chain
  *
  *   explode(zip_with(slice, slice, concat_ws)) →
  *     pmod(conv(substring(md5(g),1,8),16,10) % B) →
  *       groupBy(doc_id, lang, b).count
  *
  * which materializes one ROW PER BIGRAM INSTANCE (corpus-scale),
  * round-trips every bigram's 16-byte md5 through a 32-char hex string
  * just to re-parse 8 chars back into a long, and then pays a
  * corpus-wide shuffle to count per (doc, bucket). Here the whole
  * feature map is ONE pass per document: one md5 per bigram taken
  * straight off the digest bytes (first 8 hex chars ≡ the big-endian
  * unsigned int over digest bytes 0..3), counts folded in-memory per
  * doc (bounded by the doc's distinct buckets ≤ min(len, B)), and the
  * downstream explode yields the (doc, bucket, cnt) matrix with NO
  * shuffle at all — the measured dominant job of x90 (1.0 s of 2.4 s)
  * was exactly this build. Bit parity with the interpreted chain (and
  * the DuckDB oracle's `('0x' || substr(md5(w1 || ' ' || w2), 1,
  * 8))::BIGINT % B`) is pinned by DsirGateSpec + the x90/x92/x93
  * oracle rows; docs with < 2 tokens yield an empty array (explode
  * drops them — the unscorable contract).
  */
case class DsirBucketCounts(child: Expression, nBuckets: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"dsir_bucket_counts requires array<string>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("b", LongType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "dsir_bucket_counts"

  override protected def nullSafeEval(input: Any): Any =
    DsirBucketCounts.compute(input.asInstanceOf[ArrayData], nBuckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DsirBucketCounts.compute($c, ${nBuckets}L);")

  override protected def withNewChildInternal(newChild: Expression): DsirBucketCounts =
    copy(child = newChild)
}

object DsirBucketCounts {
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def compute(toks: ArrayData, nBuckets: Long): ArrayData = {
    val n = toks.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val d = md5.get()
    val counts = new java.util.TreeMap[java.lang.Long, Array[Long]]()
    var i = 0
    while (i < n - 1) {
      val a = toks.getUTF8String(i)
      val b = toks.getUTF8String(i + 1)
      d.reset()
      d.update(a.getBytes)
      d.update(' '.toByte)
      d.update(b.getBytes)
      val digest = d.digest()
      // first 8 hex chars of md5 = unsigned big-endian int over
      // digest bytes 0..3 (matches conv(substring(md5(g),1,8),16,10))
      val h = ((digest(0) & 0xFFL) << 24) | ((digest(1) & 0xFFL) << 16) |
        ((digest(2) & 0xFFL) << 8) | (digest(3) & 0xFFL)
      val bucket = java.lang.Long.valueOf(h % nBuckets)
      val slot = counts.get(bucket)
      if (slot == null) counts.put(bucket, Array(1L)) else slot(0) += 1L
      i += 1
    }
    val out = new Array[Any](counts.size())
    var k = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(k) = InternalRow(e.getKey.longValue(), e.getValue()(0))
      k += 1
    }
    new GenericArrayData(out)
  }
}
