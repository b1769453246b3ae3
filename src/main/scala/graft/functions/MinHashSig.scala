package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd word-trigram shingle hasher — the fused form of
  * `ops/MinHash.TrigramExpr`'s interpreted chain:
  *
  *   array_distinct(zip_with(zip_with(slice,slice,concat),slice,concat))
  *     |> transform(sh -> conv(substring(md5(sh),1,15),16,10)::bigint)
  *
  * That chain walks the token array three times, allocates two
  * intermediate string arrays plus one distinct pass, and round-trips
  * every shingle's 16-byte md5 through a 32-char hex STRING just to
  * re-parse 15 chars back into a long. Shingling is the front of every
  * near-dup pipeline (x02/x28/x36/x37/x43/x65 + the streaming
  * detector) — per-document × per-shingle work at corpus scale — which
  * makes it the SURVEY §7.3 "custom Expression where the built-ins are
  * genuinely inefficient" tier. Here: one pass over the tokens, one
  * md5 per DISTINCT shingle, and the 60-bit fold taken straight off
  * the first 8 digest bytes ((BE long) >>> 4 ≡ parsing the first 15
  * hex chars) with no hex-string detour.
  *
  * Bit parity with the legacy chain (and so with the DuckDB oracle's
  * `('0x' || substr(md5(sh),1,15))::BIGINT`) is pinned by
  * MinHashSigSpec on randomized corpora: same distinct-shingle SET,
  * same first-occurrence order, same 60-bit values, byte-identical
  * md5 input (the '_'-joined trigram).
  *
  * Precondition (matching the only call site, `split()` output): token
  * elements are non-null. A null ARRAY still yields NULL via the
  * null-safe wrapper; under-3-token docs yield an empty array exactly
  * like the slice-based chain.
  */
case class ShingleHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires array<string>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  private val Underscore = UTF8String.fromString("_")

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 15 hex digits of md5(bytes) as an unsigned 60-bit long —
    * i.e. the big-endian long over digest bytes 0..7, shifted right 4. */
  def hash60(d: MessageDigest, s: UTF8String): Long = {
    d.reset()
    val digest = d.digest(s.getBytes)
    var h = 0L
    var b = 0
    while (b < 8) { h = (h << 8) | (digest(b) & 0xFFL); b += 1 }
    h >>> 4
  }

  def compute(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < 3) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    // distinct by shingle CONTENT in first-occurrence order — exactly
    // array_distinct over the trigram strings (UTF8String hashes and
    // compares by bytes)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= n - 3) {
      seen.add(UTF8String.concat(
        toks.getUTF8String(i), Underscore,
        toks.getUTF8String(i + 1), Underscore,
        toks.getUTF8String(i + 2)))
      i += 1
    }
    val out = new Array[Long](seen.size())
    val d = md5.get()
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = hash60(d, it.next()); j += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Native K-way MinHash signature over a packed shingle-hash array —
  * the fused form of K separate `array_min(transform(hs, h -> h ^
  * seed))` calls, which walk (and materialize) the hash array once per
  * seed. One pass, K running minima, no intermediate arrays. Seeds are
  * a constructor constant (ops/MinHash.Seeds), so the XOR constants
  * fold straight into the loop. Empty input yields NULL (the legacy
  * array_min-of-empty semantics); callers filter size(hs) > 0 first.
  */
case class MinHashSig(child: Expression, seeds: Seq[Long])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) if seeds.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<bigint> (no nulls) and >=1 seed, " +
      s"got ${dt.simpleString} with ${seeds.size} seeds")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** NULL on empty input even when the child is non-nullable. */
  override def nullable: Boolean = true

  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], seeds.toArray)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("seeds", seeds.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.MinHashSig.compute($c, $seedsRef);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
    """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** K running minima of (h ^ seed_k) in one pass; null for empty hs. */
  def compute(hs: ArrayData, seeds: Array[Long]): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return null
    val mins = Array.fill(seeds.length)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var k = 0
      while (k < seeds.length) {
        val v = h ^ seeds(k)
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }
}
