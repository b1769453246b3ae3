package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, incrementally-maintained IVFADC index (Jégou/Douze/
  * Schmid, TPAMI 2011 §IV) over a versioned [[DimStore]] table — the
  * retrieval family's DIM-layer: train the coarse quantizer + product-
  * quantization codebooks ONCE per dataset version, materialize every
  * vector's (inverted list, PQ codes) row into a committed table, and
  * MAINTAIN it per ingest batch by encoding only the new/changed
  * vectors with the frozen model — the same keyed-store-maintained-
  * once, served-many pattern as the reference's dim sink
  * (gmall-realtime/.../app/func/DimSinkFunction.java:13-33) and this
  * repo's incremental cluster labels (x74). Without it, every query
  * batch re-trains and re-encodes the corpus — the one cost a 100 TB
  * embedding store cannot pay per invocation.
  *
  * Layout under `path` (both tables ride the full commit-log
  * protocol — optimistic commits, snapshot reads, time travel,
  * vacuum):
  *  - `codes/` — one row per vector: (vec_id, list_id,
  *    pq_code0..m-1), pk `vec_id`, LWW by the caller's batch version;
  *    for d=64 floats this is ~32× smaller than the raw vectors.
  *  - `model/` — the FROZEN model as rows: coarse centroids
  *    (kind='cent') and PQ codebook centroids (kind='pq'), written at
  *    [[build]] and never rewritten by [[append]]. Parquet doubles
  *    round-trip exactly, so a model read back scores bit-identically
  *    to the one trained. Freezing is what makes maintenance sound:
  *    codes encoded in different batches remain comparable under one
  *    LUT. Re-training (drift) is a REBUILD — a new [[build]] commit,
  *    exactly like a dim-table full rewrite.
  *
  * Determinism: assignment/encode/scoring reuse
  * [[ProductQuantizer]]'s exact-decimal/left-fold contract, and the
  * coarse ranking is the same cosine fold + struct-sort formulation
  * as the query kit (x12/x75), so an index built here answers
  * byte-identically to the self-contained x75 pipeline (pinned by
  * AnnIndexSpec and the shared x78/x75 oracle).
  */
object AnnIndex {

  /** The frozen model: coarse centroids (id → vector) + PQ codebooks,
    * plus the build-time mean quantization error (the model-fit
    * baseline [[append]] monitors drift against) and the LWW version
    * the build committed at. `buildVer` is the caller's re-floor
    * point: a rebuild commits strictly above every earlier batch, so
    * an ingest counter that predates it must resume at
    * `buildVer + 1` or its post-rebuild batches are absorbed as
    * replays (see [[append]]). */
  final case class Model(centroids: Seq[(Long, Seq[Double])],
                         pq: ProductQuantizer.PqModel,
                         baselineErr: Double,
                         buildVer: Long)

  /** What one ingest batch's model fit looked like: its mean residual
    * quantization error vs the build-time baseline. `rebuildRecommended`
    * fires when the ratio exceeds the caller's drift factor — the
    * batch is drawn from a distribution the frozen codebooks no longer
    * cover, and the honest fix is a new [[build]] (re-train + full
    * re-encode as a fresh version), not more appends. `buildVer`
    * echoes the serving model's build version so a streaming caller
    * can notice a rebuild happened underneath it and re-floor its
    * version counter without a separate model read. */
  final case class IngestDrift(batchMeanErr: Double, baselineErr: Double,
                               ratio: Double, rebuildRecommended: Boolean,
                               buildVer: Long)

  private def codesPath(path: String) = s"$path/codes"
  private def modelPath(path: String) = s"$path/model"

  /** Mean quantization error below which a zero-baseline model is
    * still "perfect fit" — double-precision noise, not drift. */
  private val ZeroBaselineFloor = 1e-9

  /** Coarse assignment/ranking/residual come from the shared
    * [[IvfKit]] — the SAME expressions the query layer (x12/x75)
    * ranks with, single-sourced so index and query sides stay
    * ulp-identical by construction. */
  private def ranked(cents: Seq[(Long, Seq[Double])], v: Column): Column =
    IvfKit.ranked(cents, v)
  private def residual(cents: Seq[(Long, Seq[Double])], listId: Column,
                       v: Column): Column =
    IvfKit.residual(cents, listId, v)

  /** (vec_id, list_id, pq_code0..m-1) for `df` under the FROZEN
    * model — a pure narrow map (assignment + residual + encode fused
    * in one projection chain), shared verbatim by [[build]],
    * [[append]], and the full-re-encode spec oracle. */
  def encodeWith(df: DataFrame, idCol: String, vCol: String,
                 model: Model): DataFrame = {
    val assigned = df
      .withColumn("__cs", ranked(model.centroids, col(vCol)))
      .withColumn("list_id", -element_at(col("__cs"), 1).getField("nid"))
    val withRv = assigned
      .withColumn("__rv", residual(model.centroids, col("list_id"), col(vCol)))
    ProductQuantizer.encode(withRv, "__rv", model.pq)
      .select(col(idCol).as("vec_id") +: col("list_id") +:
        model.pq.codeCols.map(col): _*)
  }

  /** Next LWW version for a (re)build: strictly above every
    * `__batch_ver` already committed to either table, so rebuilt rows
    * dominate ALL earlier build/append batches — including a replayed
    * pre-rebuild append. One bounded agg per table (max over a long
    * column), only on the rebuild path. */
  private def nextBuildVer(spark: SparkSession, path: String): Long = {
    def maxVer(p: String): Long =
      DimStore.readIfExists(spark, p) match {
        case Some(df) if df.columns.contains("__batch_ver") =>
          df.agg(max(col("__batch_ver"))).head() match {
            case r if r.isNullAt(0) => 0L
            case r => r.getLong(0)
          }
        case _ => 0L
      }
    math.max(maxVer(modelPath(path)), maxVer(codesPath(path))) + 1L
  }

  /** Commit `df` as the FULL content of `tablePath`: an upsert when
    * the table doesn't exist yet, a whole-content [[DimStore.rewrite]]
    * when it does — a rebuild must REPLACE, not merge: upserting a new
    * model/codes set over an old one at a tied version would LWW-mix
    * old and new rows per key, and vectors dropped from the new corpus
    * would linger searchable. */
  private def commitFull(spark: SparkSession, tablePath: String,
                         df: DataFrame, pk: String, ver: Long,
                         nBuckets: Int): Unit = {
    val versioned = df.withColumn("__batch_ver", lit(ver))
    if (DimStore.currentVersion(tablePath).isDefined)
      DimStore.rewrite(spark, tablePath, pk)(_ => versioned)
    else
      DimStore.upsert(spark, tablePath, versioned,
        pk = pk, versionCol = "__batch_ver", nBuckets = nBuckets)
  }

  /** Train + materialize one index version: coarse centroids are the
    * corpus rows with the given ids (production swaps in a k-means
    * output — the freeze/maintain contract is identical), PQ codebooks
    * train on the residuals via [[ProductQuantizer.train]]'s
    * exact-decimal Lloyd. On a fresh path this commits both tables at
    * version 1; on an EXISTING index (the drift-triggered rebuild
    * [[append]] recommends) both tables are fully REPLACED at a
    * version above every committed batch. Writes the model table
    * first, then the full codes table — the two tables are separate
    * commit logs, so a crash between the two commits leaves a
    * new-model/old-codes mix (or, on a fresh path, a model with no
    * codes table); the repair for either is re-running [[build]],
    * which replaces both tables whole. [[fsck]] detects the mixed
    * state cheaply. */
  def build(spark: SparkSession, path: String, corpus: DataFrame,
            idCol: String, vCol: String, centroidIds: Seq[Long],
            dim: Int, m: Int, k: Int, rounds: Int,
            nBuckets: Int = 16): Model = {
    import spark.implicits._
    val buildVer = nextBuildVer(spark, path)
    val cents = corpus.filter(col(idCol).isin(centroidIds: _*))
      .orderBy(col(idCol)).select(col(idCol), col(vCol))
      .collect().toSeq.map(r => r.getLong(0) -> r.getSeq[Double](1))
    require(cents.size == centroidIds.size,
      s"coarse centroid ids ${centroidIds.diff(cents.map(_._1))} missing from corpus")
    val assigned = corpus
      .withColumn("__cs", ranked(cents, col(vCol)))
      .withColumn("list_id", -element_at(col("__cs"), 1).getField("nid"))
    val lists = assigned.select(col(idCol), col("list_id"),
      residual(cents, col("list_id"), col(vCol)).as("__rv"))
    val pq = ProductQuantizer.train(lists, idCol, "__rv", dim, m, k, rounds)
    // build-time model fit: corpus mean quantization error — one extra
    // narrow pass (train already scanned the corpus `rounds` times);
    // this is the baseline every later ingest batch's fit is judged
    // against
    val baseline = lists
      .agg(avg(ProductQuantizer.quantizationError(col("__rv"), pq)))
      .head().getDouble(0)
    val model = Model(cents, pq, baseline, buildVer)
    val modelRows =
      cents.map { case (cid, cv) => ("c" + cid, "cent", cid, 0L, cv) } ++
      (for (mi <- 0 until m; ki <- 0 until k) yield
        (s"p$mi-$ki", "pq", mi.toLong, ki.toLong,
          pq.codebooks(mi)(ki).toSeq)) ++
      Seq(("shape", "shape", dim.toLong, m.toLong, Seq(k.toDouble)),
        ("err", "stats", 0L, 0L, Seq(baseline)),
        // the build's LWW version, persisted so [[fsck]] can detect a
        // rebuild that crashed between the two table commits
        ("bver", "bver", buildVer, 0L, Seq.empty[Double]))
    commitFull(spark, modelPath(path),
      modelRows.toDF("key", "kind", "i1", "i2", "vals"),
      pk = "key", ver = buildVer, nBuckets = 4)
    commitFull(spark, codesPath(path),
      encodeWith(corpus, idCol, vCol, model),
      pk = "vec_id", ver = buildVer, nBuckets = nBuckets)
    model
  }

  /** What a consistency check of the two tables found. `staleCodes`
    * counts code rows whose version predates the model's build —
    * rows encoded under a PREVIOUS model that a crashed rebuild never
    * replaced (scored under the wrong codebooks until repaired).
    * `codesTableMissing` is the OTHER crash window: a fresh-path
    * [[build]] that died between the model commit and the first codes
    * commit leaves a model with no codes table at all (an intact
    * empty index has a committed zero-row table, so absence is always
    * a crash, never "empty corpus"). */
  final case class Fsck(buildVer: Long, codeRows: Long, staleCodes: Long,
                        codesTableMissing: Boolean) {
    def consistent: Boolean = staleCodes == 0L && !codesTableMissing
  }

  /** Detect the rebuild crash window: the model and codes tables are
    * separate commit logs, so a crash between [[build]]'s two commits
    * leaves codes encoded under the old model (or, on a fresh path,
    * no codes table at all). One bounded agg over the codes table;
    * repair for either state = re-run [[build]]. A path with no MODEL
    * table is not an index (a fresh build that crashed before its
    * first commit left nothing to serve) and throws, matching
    * [[readModel]]. */
  def fsck(spark: SparkSession, path: String): Fsck = {
    val bver = DimStore.read(spark, modelPath(path))
      .filter(col("kind") === "bver")
      .select(col("i1")).collect().headOption.map(_.getLong(0))
      .getOrElse(1L) // pre-bver index: every build committed at 1
    DimStore.readIfExists(spark, codesPath(path)) match {
      case Some(df) =>
        val stats = df.agg(count(lit(1)),
          sum(when(col("__batch_ver") < bver, 1L).otherwise(0L))).head()
        Fsck(bver, stats.getLong(0),
          if (stats.isNullAt(1)) 0L else stats.getLong(1),
          codesTableMissing = false)
      case None => Fsck(bver, 0L, 0L, codesTableMissing = true)
    }
  }

  /** Incremental maintenance: encode ONLY this batch under the frozen
    * model and merge it into the codes table — one optimistic commit
    * rewriting O(touched buckets), not a corpus re-encode. LWW by
    * `ver`: a re-ingested vector with a newer version replaces its
    * row; the model tables are untouched.
    *
    * Returns the batch's [[IngestDrift]] — mean residual quantization
    * error vs the build-time baseline, computed in the same pass shape
    * as the encode. Freezing the model is what makes maintenance
    * sound, and drift is its failure mode: when the incoming
    * distribution walks away from what the codebooks were trained on,
    * the errors (and therefore ADC ranking noise) grow without any
    * query failing loudly. `driftFactor` is the ratio past which the
    * report recommends a rebuild; the append itself ALWAYS lands
    * (rows must not be dropped while a rebuild is pending — they are
    * searchable at degraded precision, and the rebuild re-encodes
    * them anyway).
    *
    * Versioning vs rebuilds: a rebuild commits strictly ABOVE every
    * earlier batch, so an append whose `ver` predates the serving
    * model's `buildVer` is absorbed as a replay by LWW — deliberate
    * for redelivered pre-rebuild batches (spec-pinned), but a caller
    * ingesting NEW data must keep its counter above `buildVer`
    * (re-floor from the returned drift report after a recommended
    * rebuild ran). `ver == buildVer` exactly is rejected: a tied
    * version would leave new-vs-rebuilt row survival to the LWW
    * tie-break instead of an ordering. */
  def append(spark: SparkSession, path: String, batch: DataFrame,
             idCol: String, vCol: String, ver: Long,
             driftFactor: Double = 2.0): IngestDrift = {
    val model = readModel(spark, path)
    require(ver != model.buildVer,
      s"append version $ver ties the serving build's version — " +
      s"re-floor the ingest counter at ${model.buildVer + 1} " +
      "(a tie makes new-vs-rebuilt survival a hash tie-break, not an ordering)")
    // the ranked+residual projection is the expensive half of the
    // batch; persist it so the drift agg and the encode feeding the
    // upsert share ONE computation instead of running it twice
    val withRv = batch
      .withColumn("__cs", ranked(model.centroids, col(vCol)))
      .withColumn("list_id", -element_at(col("__cs"), 1).getField("nid"))
      .withColumn("__rv", residual(model.centroids, col("list_id"), col(vCol)))
      .persist()
    try {
      val stats = withRv.agg(
        avg(ProductQuantizer.quantizationError(col("__rv"), model.pq)),
        count(lit(1))).head()
      val batchErr = if (stats.getLong(1) == 0L) Double.NaN else stats.getDouble(0)
      DimStore.upsert(spark, codesPath(path),
        ProductQuantizer.encode(withRv, "__rv", model.pq)
          .select(col(idCol).as("vec_id") +: col("list_id") +:
            model.pq.codeCols.map(col): _*)
          .withColumn("__batch_ver", lit(ver)),
        pk = "vec_id", versionCol = "__batch_ver")
      // a baseline of exactly 0.0 (codebooks reproduce every build-time
      // residual — k >= distinct residuals, common on small or tightly
      // clustered corpora) would make ANY nonzero batch error an
      // infinite ratio; below the absolute floor the fit is still
      // double-noise-perfect and no rebuild is warranted
      val ratio =
        if (model.baselineErr > 0.0) batchErr / model.baselineErr
        else if (batchErr <= ZeroBaselineFloor) 1.0
        else Double.PositiveInfinity
      IngestDrift(batchErr, model.baselineErr, ratio,
        rebuildRecommended = !ratio.isNaN && ratio > driftFactor,
        buildVer = model.buildVer)
    } finally { withRv.unpersist(); () }
  }

  /** The frozen model, reconstructed bit-exactly from the model
    * table (one bounded collect: |centroids| + m·k rows). */
  def readModel(spark: SparkSession, path: String): Model = {
    val rows = DimStore.read(spark, modelPath(path))
      .select("key", "kind", "i1", "i2", "vals").collect()
    val shape = rows.find(_.getString(1) == "shape")
      .getOrElse(throw new IllegalStateException(
        s"ANN index at $path has no shape row — not a built index"))
    val dim = shape.getLong(2).toInt
    val m = shape.getLong(3).toInt
    val k = shape.getSeq[Double](4).head.toInt
    val cents = rows.filter(_.getString(1) == "cent")
      .map(r => r.getLong(2) -> r.getSeq[Double](4))
      .sortBy(_._1).toSeq
    val byMk = rows.filter(_.getString(1) == "pq")
      .map(r => (r.getLong(2).toInt, r.getLong(3).toInt) ->
        r.getSeq[Double](4).toArray).toMap
    val cbs = Array.tabulate(m)(mi => Array.tabulate(k)(ki => byMk((mi, ki))))
    val baseline = rows.find(_.getString(1) == "stats")
      .map(_.getSeq[Double](4).head).getOrElse(Double.NaN)
    val bver = rows.find(_.getString(1) == "bver")
      .map(_.getLong(2)).getOrElse(1L) // pre-bver index: built at 1
    Model(cents, ProductQuantizer.PqModel(dim, m, k, cbs), baseline, bver)
  }

  /** The staged codes snapshot: (vec_id, list_id, pq_code0..m-1). */
  def codes(spark: SparkSession, path: String): DataFrame = {
    val df = DimStore.read(spark, codesPath(path))
    df.select(df.columns.filterNot(_ == "__batch_ver").toIndexedSeq.map(col): _*)
  }

  /** Layout + history maintenance for the index, riding the dim-store
    * policy: the codes table accretes one commit generation per
    * [[append]] batch — exactly a streaming dim table's growth shape —
    * so it gets the same measured rebucket/compact policy
    * ([[DimStore.maintain]]); with `vacuumKeepLast > 0` both tables'
    * histories are pruned past the grace window too (the model table
    * is tiny and frozen between rebuilds, so history is its only
    * growth). Returns the codes table's maintenance report. Run it
    * from the same cadence that calls [[append]] (a streaming job's
    * every-N-batches hook, or a maintenance window). */
  def maintain(spark: SparkSession, path: String,
               targetBucketBytes: Long = 256L * 1024 * 1024,
               targetFileBytes: Long = 128L * 1024 * 1024,
               maxFilesPerBucket: Int = 4,
               maxBuckets: Int = 4096,
               apply: Boolean = true,
               vacuumKeepLast: Int = 0,
               vacuumGraceMillis: Long = 24L * 3600 * 1000)
      : DimStore.Maintenance = {
    val m = DimStore.maintain(spark, codesPath(path), "vec_id",
      targetBucketBytes = targetBucketBytes,
      targetFileBytes = targetFileBytes,
      maxFilesPerBucket = maxFilesPerBucket,
      maxBuckets = maxBuckets, apply = apply)
    if (vacuumKeepLast > 0) {
      DimStore.vacuum(spark, codesPath(path), vacuumKeepLast, vacuumGraceMillis)
      DimStore.vacuum(spark, modelPath(path), vacuumKeepLast, vacuumGraceMillis)
    }
    m
  }

  /** Probe frame for a bounded query set: each query's top-`nProbes`
    * lists (ranked through the SAME expression path as assignment, so
    * ordering is ulp-identical), residualized against each probed
    * centroid, carrying the residual's m×k ADC LUT — ready to
    * broadcast against [[codes]] for a single-scan batch ADC. The
    * collect is |queries|·nProbes rows; callers own keeping the query
    * batch driver-bounded (the same contract as every LUT-shipping
    * ANN query in the engine). */
  def queryProbes(queries: DataFrame, idCol: String, vCol: String,
                  model: Model, nProbes: Int): DataFrame = {
    val s = queries.sparkSession
    import s.implicits._
    val centMap = model.centroids.toMap
    val rows = queries
      .withColumn("__cs", ranked(model.centroids, col(vCol)))
      .select(col(idCol), col(vCol),
        explode(slice(col("__cs"), 1, nProbes)).as("__ps"))
      .select(col(idCol), col(vCol), (-col("__ps.nid")).as("list_id"))
      .collect()
      .map { r =>
        val qv = r.getSeq[Double](1).toArray
        val li = r.getLong(2)
        val cv = centMap(li)
        val rq = Array.tabulate(qv.length)(i => qv(i) - cv(i))
        (r.getLong(0), li, ProductQuantizer.adcLutRows(rq, model.pq))
      }
    rows.toSeq.toDF("query_id", "list_id", "__lut")
  }

  /** Batch ADC top-k against the staged codes: ONE scan of the codes
    * table joined with the broadcast probe frame, ranked per query by
    * (adc_ppm asc, vec_id) — the x75 scoring tail served from the
    * index instead of a per-invocation re-encode. */
  def adcTopK(spark: SparkSession, path: String, probes: DataFrame,
              model: Model, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_ppm").asc, col("vec_id"))
    codes(spark, path)
      .join(broadcast(probes), Seq("list_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc_ppm", round(lit(1e6) *
        ProductQuantizer.adcDistanceFromLut(col("__lut"), model.pq))
        .cast("long"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("list_id"),
        col("adc_ppm"), col("rank"))
  }
}
