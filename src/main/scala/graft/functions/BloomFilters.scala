package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter build aggregate over a pre-hashed LONG column (pair it
  * with `xxhash64(...)` so one fixed-width value flows through the
  * aggregation, never the raw string).
  *
  * The scale story [Bloom, "Space/time trade-offs in hash coding with
  * allowable errors", CACM 1970; same sketch Spark's own runtime-filter
  * rule injects]: an exact membership set over, say, 10^9 benchmark
  * shingles is tens of GB — too big to broadcast, so a decontamination
  * probe becomes a corpus-sized shuffle join. The bloom summary of the
  * same set at fpp 1% is ~1.2 GB at 10^9 keys and ~1.2 MB at 10^6 —
  * broadcastable control-plane state. Probing it is a narrow map-side
  * filter that discards the overwhelming non-contaminated majority
  * BEFORE any join, leaving the exact confirm join (still required for
  * exactness — blooms have false positives) a candidates-only shuffle.
  *
  * Determinism: bit positions depend only on the inserted value set
  * (insertion is idempotent bit-OR), and `merge` is bitwise OR —
  * commutative, associative, partitioning-independent. The serialized
  * bytes are therefore identical however Spark splits the partial
  * aggregation, which the build-equivalence test pins.
  */
case class BloomFilterBuildAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  require(expectedItems > 0, "bloom_build expectedItems must be positive")
  require(fpp > 0 && fpp < 1, "bloom_build fpp must be in (0, 1)")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_build requires a BIGINT child (hash first with xxhash64), " +
      s"got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buf.putLong(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BloomFilter, other: BloomFilter): BloomFilter = {
    buf.mergeInPlace(other)
    buf
  }

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    buf.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomFilterBuildAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "bloom_build"
}

/** Membership probe against a serialized bloom filter. `left` must be
  * FOLDABLE (a literal of the collected sketch — control-plane state
  * like broadcast centroids) so the filter deserializes once per task,
  * not per row; `right` is the same `xxhash64` the build side used.
  *
  * Codegen keeps the probe inside whole-stage codegen by registering
  * the deserialized filter as a reference object — the generated loop
  * calls `mightContainLong` directly, no boxing, no codegen fence.
  * This mirrors the shape of Spark's own runtime-filter probe
  * expression; built here natively so the decontamination pipeline can
  * apply it to arbitrary columns, not just join keys.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires a BINARY bloom argument, got " +
        s"${left.dataType.simpleString}")
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain requires a foldable (literal) bloom — collect " +
        "the sketch first; per-row blooms would deserialize per row")
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires a BIGINT probe value, got " +
        s"${right.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  /** Deserialized once per task (lazily, after the expression ships in
    * the task closure); null bloom → every probe answers NULL. */
  @transient private lazy val filter: BloomFilter = {
    val bytes = left.eval(null)
    if (bytes == null) null
    else BloomFilter.readFrom(
      new ByteArrayInputStream(bytes.asInstanceOf[Array[Byte]]))
  }

  override def nullable: Boolean = left.nullable || right.nullable

  override def eval(input: InternalRow): Any = {
    if (filter == null) return null
    val v = right.eval(input)
    if (v == null) null else filter.mightContainLong(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // null sketch literal → constant NULL, no code to emit
    if (filter == null) return ExprCode.forNullValue(dataType)
    val bloomRef =
      ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    // the left (foldable) child's generated code is just the literal
    // reference; the probe compiles to one virtual call on the shared
    // deserialized filter object
    nullSafeCodeGen(ctx, ev,
      (_, b) => s"${ev.value} = $bloomRef.mightContainLong($b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
