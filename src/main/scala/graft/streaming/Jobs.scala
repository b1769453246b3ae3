package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The five derived streams of the reference's log fan-out
  * (BaseLogApp side-output tags, app/dwd/BaseLogApp.java:98-162). */
final case class LogStreams(
    dirty: DataFrame,
    err: DataFrame,
    start: DataFrame,
    page: DataFrame,
    display: DataFrame)

/** Job-level facade: one function per reference application, so a user
  * of the reference maps their four `main()`s directly onto this
  * library (plug a Kafka/file/memory source in, pick sinks out).
  *
  * | reference job (gmall-logger/src/main/java) | here |
  * |---|---|
  * | app/dim/DimApp.java                        | [[Jobs.dimApp]] |
  * | app/dwd/BaseLogApp.java                    | [[Jobs.baseLogSplit]] |
  * | app/dwd/DwdTrafficUniqueVisitorDetail.java | [[Jobs.uniqueVisitorDetail]] |
  * | app/dwd/DwdTrafficUserJumpDetail.java      | [[Jobs.userJumpDetail]] |
  */
object Jobs {

  /** BaseLogApp: parse raw JSON lines against `schema`, divert dirty
    * rows (P2), split clean rows into err/start/page (M2), and explode
    * page displays with parent denormalization (M3). Works identically
    * on batch and streaming DataFrames; each returned stream gets its
    * own sink (or one cached foreachBatch writes all five — see
    * StreamingPipelineSpec). Intended semantics, not the reference's
    * tag bugs (SURVEY §7.4). */
  def baseLogSplit(raw: DataFrame, schema: StructType,
                   rawCol: String = "value"): LogStreams = {
    val parsed = Sources.parseJson(raw, schema, rawCol)
    val clean = parsed
      .filter(col("parsed").isNotNull && col("parsed.mid").isNotNull)
      .select("parsed.*")
    val dirty = parsed
      .filter(col("parsed").isNull || col("parsed.mid").isNull)
      .select(col(rawCol).as("raw"))
    val err   = clean.filter(col("err").isNotNull)
    val start = clean.filter(col("err").isNull && col("start").isNotNull)
    val page  = clean.filter(col("err").isNull && col("start").isNull)
    val display = page
      .filter(org.apache.spark.sql.functions.size(col("displays")) > 0)
      .select(col("mid"), col("page_id"), col("ts"), explode(col("displays")).as("d"))
      .select(col("mid"), col("page_id"), col("ts"),
        col("d.pos").as("pos"), col("d.item").as("item"))
    LogStreams(dirty, err, start, page, display)
  }

  /** [[baseLogSplit]] wired to five file topics with CROSS-SINK ATOMIC
    * PUBLISH: every micro-batch lands in all five topics or none.
    *
    * The reference's BaseLogApp writes its five side-output streams to
    * five Kafka topics with independent producer sends — a crash
    * between sends exposes batch N in some topics and N−1 in others.
    * Here each micro-batch stages all five splits as hidden segments
    * (executor-side, one per partition — no driver materialization),
    * then commits ONE batch marker and flips visibility
    * ([[FileTopic.publishBatch]]): readers never see a torn batch, and
    * a replayed batch (Spark's foreachBatch redelivery contract)
    * dedupes to exactly-once visible segments. The parse/split runs
    * once per batch (persisted), not once per sink. */
  def startBaseLogSplitAtomic(raw: DataFrame, schema: StructType,
      baseDir: String, checkpoint: String, rawCol: String = "value",
      queryName: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val names = Seq("dirty", "err", "start", "page", "display")
    val dirs = names.map(n => s"$baseDir/$n")
    val manifestDir = s"$baseDir/_batches"
    val writer = raw.writeStream
    queryName.foreach(writer.queryName)
    writer
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val cached = batch.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val st = baseLogSplit(cached, schema, rawCol)
          Seq(st.dirty, st.err, st.start, st.page, st.display)
            .zip(dirs).foreach { case (df, dir) =>
              df.toJSON.foreachPartition { (it: Iterator[String]) =>
                // skip empty partitions: no zero-byte segment per task
                if (it.hasNext)
                  FileTopic.produceStagedBatch(dir, batchId,
                    org.apache.spark.TaskContext.getPartitionId(), it)
              }
            }
          FileTopic.publishBatch(manifestDir, batchId, dirs)
        } finally { cached.unpersist(); () }
        ()
      }
      .start()
  }

  /** DwdTrafficUniqueVisitorDetail: session-entry pages only (P3), then
    * first visit per device per day (A1). */
  def uniqueVisitorDetail(pages: Dataset[PageLog]): Dataset[PageLog] =
    DedupDaily(pages.filter((e: PageLog) => e.lastPageId.isEmpty))

  /** DwdTrafficUserJumpDetail: the CEP bounce detection (W2). */
  def userJumpDetail(pages: Dataset[PageLog],
                     gapMs: Long = BounceDetector.DefaultGapMs): Dataset[Bounce] =
    BounceDetector(pages, gapMs)

  /** Per-window heavy hitters over an event stream — the streaming
    * form of w16 (tumbling windows × the SpaceSavingTopK native
    * aggregate). The sketch buffer IS the streaming aggregation state:
    * a TypedImperativeAggregate's serialized buffer rides the state
    * store like any partial-agg row, so state per open window is one
    * bounded `capacity`-entry summary — never a per-(window, term)
    * count table. Watermark + append mode emit each window exactly
    * once, on close. Batch parity with the w16 oracle is pinned by
    * StreamingWindowSpec (same counts, same count-then-term
    * tie-break). */
  def windowedHeavyHitters(events: DataFrame, timeCol: String,
      termCol: String, windowDur: String, watermarkDelay: String,
      k: Int, capacity: Int): DataFrame = {
    import org.apache.spark.sql.GraftPlanBridge
    val hh = GraftPlanBridge.col(
      graft.functions.SpaceSavingTopK(
        GraftPlanBridge.expr(array(col(termCol))), capacity)
        .toAggregateExpression())
    events.withWatermark(timeCol, watermarkDelay)
      .groupBy(window(col(timeCol), windowDur).as("w"))
      .agg(count(lit(1)).as("n"), hh.as("hh"))
      .select(col("w.start").cast("long").as("window_start_s"), col("n"),
        concat_ws(",",
          transform(slice(col("hh"), 1, k), h => h.getField("term")))
          .as("top_terms"))
  }

  /** DimApp: CDC stream routed per config row to MERGE-upserted dim
    * tables (J1/P6/K3/K4). */
  def dimApp(cdc: DataFrame,
             loadConfig: org.apache.spark.sql.SparkSession => Seq[TableProcess],
             basePath: String, versionCol: String, checkpoint: String,
             catalogDb: Option[String] = None) =
    DimRouter.start(cdc, loadConfig, basePath, versionCol, checkpoint,
      catalogDb)

  /** DimApp's batch-polling form for a GROWING CHANGELOG TABLE (the
    * reference's `StartupOptions.initial()` after the snapshot phase):
    * each call routes per config row and applies ONLY records past
    * each sink's persisted cursor — [[IncrementalCdc]] composed with
    * [[DimRouter]]'s projection rules, so a high-churn CDC table costs
    * O(new records) per poll instead of a full re-read. Returns
    * applied-record counts per sink table (all zeros ⇒ stores were
    * already current). Idempotent under replay: a crash between a
    * sink's merge and its cursor write redelivers into an LWW merge. */
  def dimAppIncremental(changelog: DataFrame, config: Seq[TableProcess],
                        basePath: String, versionCol: String,
                        nBuckets: Int = graft.ops.DimStore.NumBuckets)
      : Map[String, Long] = {
    val spark = changelog.sparkSession
    config.map { tp =>
      val keep = tp.sinkColumns.split(",").map(_.trim).filter(_.nonEmpty)
      val cols = (keep :+ versionCol).distinct.toIndexedSeq.map(col)
      val routed = changelog
        .filter(col("source_table") === tp.sourceTable)
        .select(cols: _*)
      tp.sinkTable -> IncrementalCdc.applyOnce(spark, routed,
        s"$basePath/${tp.sinkTable}", tp.sinkPk, versionCol,
        nBuckets = nBuckets)
    }.toMap
  }
}
