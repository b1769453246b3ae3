package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** The x93 curation funnel as a CONTINUOUS topology — the workload a
  * production corpus pipeline actually runs: raw docs → quality gates
  * + exact keep-first dedup ([[CurationPipeline]], watermark-bounded
  * fingerprint state) → DSIR gate against a STAGED frozen model
  * ([[DsirGate]], stateless score-at-ingest) → near-dup clustering
  * ([[StreamingNearDup]] anchors maintaining a (id, rep) label table)
  * → per-stage survivor counts. Two chained streaming queries — the
  * reference's layered ODS→DWD→DWS shape (BaseLogApp feeding the DWD
  * topics feeding DWS, app/ods→dwd→dws) — because a
  * flatMapGroupsWithState detector cannot sit downstream of another
  * stateful operator in one query:
  *
  *  - STAGE 1 (gate): [[CurationPipeline.clean]] (lang/length gates +
  *    exact keep-first within the watermark horizon) appending
  *    survivors (with text) to a parquet layer, and — in the same
  *    foreachBatch, stateless and replay-idempotent —
  *    [[DsirGate.scored]] against the frozen ratio, appending accepted
  *    doc ids. The DSIR score is a pure function of (text, model), so
  *    scoring at ingest and intersecting with the dedup survivors
  *    later yields exactly the batch funnel's apply-last semantics.
  *  - STAGE 2 (near-dup): a file stream over the survivor layer →
  *    MinHash LSH anchors → the maintained label table
  *    ([[StreamingClusters.updateBatchMaintained]]). Runs CONCURRENTLY
  *    with stage 1 (the file source discovers new survivor files per
  *    trigger) — the real pipelined deployment, not a batch handoff.
  *  - CONSULTATION: per-stage survivor counts from the three layers;
  *    the near-dup stage keeps ONE doc per cluster (the label rep —
  *    x93's staged cluster-drop semantics, arrival-order-INVARIANT
  *    because connectivity is), singletons keep themselves.
  *
  * Scale shape: every stage is the already-priced operator it names —
  * the only additions are one parquet layer between the queries (the
  * Kafka topic of the reference's layering) and two bounded count
  * consultations. StreamingFunnelSpec pins stream ≡ batch per-stage
  * counts on a replayed fixture.
  */
object StreamingFunnel {

  /** Per-stage survivor counts: `gated` after quality gates + exact
    * keep-first, `neardupKept` after the cluster drop (one per
    * component), `dsirAccepted` after the frozen-model gate over the
    * near-dup survivors. */
  final case class StageCounts(gated: Long, neardupKept: Long,
                               dsirAccepted: Long)

  /** The survivor layer's schema — declared so stage 2's file stream
    * can start before stage 1 has written a single file. */
  private val SurvivorSchema = StructType(Seq(
    StructField("ts", TimestampType), StructField("doc_id", LongType),
    StructField("lang", StringType), StructField("text", StringType)))

  /** Stage 1: gates + exact keep-first + DSIR score-at-ingest.
    * `docs` needs (ts TIMESTAMP, doc_id LONG, lang STRING,
    * text STRING). Survivors land at `dir`/survivors, DSIR-accepted
    * ids at `dir`/accepted.
    *
    * `filesPerBatch` sizes the survivor layer's files per micro-batch
    * — the knob that prices stage 2: the layer is its file-source
    * "topic", and its FILE count, not its row count, sets stage 2's
    * micro-batch count (each trigger pays the label-table maintenance
    * floor). Unparameterized, the shuffle-partition fan-out wrote ~32
    * files per batch and stage 2 degraded to ~16× more micro-batches
    * doing the same work (measured 242 s vs ~40 s at sf0.1). Size it
    * like a topic's partitions: 1 at bench scale, a few at
    * 100 TB/day so a single writer task isn't the bottleneck. */
  def startGateStage(docs: DataFrame, ratio: DataFrame, dir: String,
      langs: Seq[String], minToks: Int, watermark: String,
      minScorePpm: Long, checkpoint: String,
      queryName: Option[String] = None,
      filesPerBatch: Int = 1): StreamingQuery = {
    require(filesPerBatch >= 1,
      s"filesPerBatch must be >= 1, got $filesPerBatch")
    val clean = CurationPipeline
      .clean(docs, langs, minToks, watermark, keep = Seq("text"))
      .select(col("ts"), col("doc_id"), col("lang"), col("text"))
    val w = clean.writeStream.option("checkpointLocation", checkpoint)
    queryName.foreach(w.queryName)
    w.foreachBatch { (batch: Dataset[Row], _: Long) =>
      // the batch feeds two sinks (survivor layer + DSIR verdicts);
      // pin it so the clean topology doesn't recompute per consumer
      val b = batch.persist()
      try {
        // skip empty micro-batches (no-data triggers, all-gated
        // batches): an empty append still writes a part-file, and
        // every survivor-layer file consumes one of stage 2's
        // maxFilesPerTrigger slots — empty files would buy extra
        // downstream micro-batches that each pay the label-table
        // maintenance floor for nothing
        if (!b.isEmpty) {
          b.coalesce(filesPerBatch).write.mode("append")
            .parquet(s"$dir/survivors")
          DsirGate.accepted(DsirGate.scored(b.toDF(), ratio, minScorePpm))
            .select("doc_id").coalesce(filesPerBatch)
            .write.mode("append").parquet(s"$dir/accepted")
        }
      } finally { b.unpersist(); () }
    }.start()
  }

  /** Stage 2: near-dup anchors over the survivor layer's file stream,
    * maintaining the (id, rep) label table at `dir`/labels. Start it
    * alongside stage 1; drain it after stage 1 drains. `ttl = Some(d)`
    * runs the BOUNDED-state detector instead
    * ([[StreamingNearDup.withTtl]] — anchors expire once the
    * watermark passes their last sighting + d, the form a continuous
    * 100 TB/day deployment runs; rows later than `watermarkDelay`
    * behind the max observed survivor `ts` are dropped before the
    * state op). */
  def startNeardupStage(spark: SparkSession, dir: String,
      checkpoint: String, queryName: Option[String] = None,
      maxFilesPerTrigger: Int = 4,
      nBuckets: Int = 16,
      ttl: Option[java.time.Duration] = None,
      watermarkDelay: String = "2 seconds"): StreamingQuery = {
    val survivors = spark.readStream
      .schema(SurvivorSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(s"$dir/survivors")
    val cands = ttl match {
      case Some(t) => StreamingNearDup.withTtl(
        survivors.select(col("doc_id"), col("text"),
            col("ts").as("eventTime"))
          .withWatermark("eventTime", watermarkDelay), t)
      case None =>
        StreamingNearDup(survivors.select(col("doc_id"), col("text")))
    }
    val w = cands
      .toDF().writeStream.option("checkpointLocation", checkpoint)
    queryName.foreach(w.queryName)
    w.foreachBatch { (batch: Dataset[Row], bid: Long) =>
      StreamingClusters.updateBatchMaintained(s"$dir/labels",
        nBuckets = nBuckets)(batch.toDF(), bid)
    }.start()
  }

  private def readLayer(spark: SparkSession, path: String,
                        schema: StructType): DataFrame = {
    // Hadoop FS probe, not java.nio — the layers live wherever the
    // deployment's checkpoint/sink store does (HDFS/S3/ABFS), where a
    // local-filesystem exists() silently reads every layer as absent
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)
  }

  /** The funnel's witness, consulted after both stages drain. DISTINCT
    * doc ids throughout: an at-least-once foreachBatch retry may
    * append a survivor file twice, and the counts must not move. */
  def stageCounts(spark: SparkSession, dir: String): StageCounts = {
    val surv = readLayer(spark, s"$dir/survivors", SurvivorSchema)
      .select(col("doc_id")).distinct()
    val labels = StreamingClusters.maintainedLabels(spark, s"$dir/labels")
    // x93's staged cluster drop: labeled docs keep only their rep;
    // docs no candidate ever touched are singleton survivors
    val kept = surv.join(labels, surv("doc_id") === labels("id"), "left")
      .filter(col("id").isNull || col("rep") === col("doc_id"))
      .select(col("doc_id"))
      .persist()
    try {
      val accepted = readLayer(spark, s"$dir/accepted",
        StructType(Seq(StructField("doc_id", LongType))))
        .select(col("doc_id")).distinct()
      StageCounts(
        gated = surv.count(),
        neardupKept = kept.count(),
        dsirAccepted = kept.join(accepted, "doc_id").count())
    } finally { kept.unpersist(); () }
  }
}
