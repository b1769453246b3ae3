package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.AnnIndex

/** The persisted ANN index: built once, maintained incrementally,
  * answering identically to the self-contained per-invocation
  * pipeline. */
class AnnIndexSpec extends AnyFunSuite with Matchers with SparkFixture {

  private val Cents = Seq(10L, 20L, 30L, 40L)

  private lazy val e = {
    val s = spark
    import s.implicits._
    graft.core.Tables.load(s, sf0001, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .persist()
  }

  private def codeRows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map { r =>
      (0 until r.length).map(i => String.valueOf(r.get(i))).mkString("|")
    }.toSet

  test("staged index (x78) answers byte-identically to the " +
       "self-contained x75 pipeline") {
    graft.queries.Extensions.clearPersistedIntermediates()
    val direct = graft.queries.Extensions.x75.run(spark, sf0001)
      .collect().map(_.toString).toSeq
    val staged = graft.queries.Extensions.x78.run(spark, sf0001)
      .collect().map(_.toString).toSeq
    staged shouldBe direct
    direct should not be empty
  }

  test("staged refine (x80) answers byte-identically to the " +
       "self-contained x79 pipeline") {
    graft.queries.Extensions.clearPersistedIntermediates()
    val direct = graft.queries.Extensions.x79.run(spark, sf0001)
      .collect().map(_.toString).toSeq
    val staged = graft.queries.Extensions.x80.run(spark, sf0001)
      .collect().map(_.toString).toSeq
    staged shouldBe direct
    direct should not be empty
  }

  test("incremental append == full re-encode under the frozen model; " +
       "a re-ingested vector LWW-replaces its row") {
    val s = spark
    import s.implicits._
    val path = Files.createTempDirectory("ann_idx").toString + "/idx"
    // build on a prefix (must contain the coarse centroid ids), then
    // maintain with two later batches
    val base = e.filter($"vec_id" < 300)
    val b1 = e.filter($"vec_id" >= 300 && $"vec_id" < 400)
    val b2 = e.filter($"vec_id" >= 400)
    val model = AnnIndex.build(s, path, base, "vec_id", "v",
      centroidIds = Cents, dim = 64, m = 4, k = 4, rounds = 1)
    AnnIndex.append(s, path, b1, "vec_id", "v", ver = 2L)
    AnnIndex.append(s, path, b2, "vec_id", "v", ver = 3L)
    // staged rows == one-shot encode of the FULL corpus with the same
    // frozen model: per-batch maintenance loses nothing and encodes
    // nothing differently
    codeRows(AnnIndex.codes(s, path)) shouldBe
      codeRows(AnnIndex.encodeWith(e, "vec_id", "v", model))
    // the frozen model round-trips bit-exactly through the store
    val m2 = AnnIndex.readModel(s, path)
    m2.centroids shouldBe model.centroids
    m2.pq.codebooks.flatten.flatten.toSeq shouldBe
      model.pq.codebooks.flatten.flatten.toSeq
    // re-ingest vec 5 with changed content at a newer version: its
    // row is re-encoded and replaces the old one (LWW), everything
    // else untouched
    val updated = e.filter($"vec_id" === 5L)
      .select($"vec_id", reverse($"v").as("v"))
    AnnIndex.append(s, path, updated, "vec_id", "v", ver = 4L)
    val after = AnnIndex.codes(s, path)
    codeRows(after.filter($"vec_id" === 5L)) shouldBe
      codeRows(AnnIndex.encodeWith(updated, "vec_id", "v", model))
    codeRows(after.filter($"vec_id" =!= 5L)) shouldBe
      codeRows(AnnIndex.encodeWith(e.filter($"vec_id" =!= 5L),
        "vec_id", "v", model))
  }

  test("ingest drift: an in-distribution batch reports fit ≈ baseline; " +
       "an out-of-distribution batch recommends a rebuild — and still " +
       "lands (searchable at degraded precision)") {
    val s = spark
    import s.implicits._
    val path = Files.createTempDirectory("ann_drift").toString + "/idx"
    val model = AnnIndex.build(s, path, e.filter($"vec_id" < 400),
      "vec_id", "v", centroidIds = Cents, dim = 64, m = 4, k = 4,
      rounds = 1)
    model.baselineErr should be > 0.0
    // in-distribution: the held-out tail of the same fixture
    val ok = AnnIndex.append(s, path, e.filter($"vec_id" >= 400),
      "vec_id", "v", ver = 2L)
    ok.rebuildRecommended shouldBe false
    ok.ratio should be < 2.0
    // out-of-distribution: scale the vectors 5× — residual magnitudes
    // (and with them quantization error) blow up ~25× past anything
    // the frozen codebooks were trained to cover
    val shifted = e.filter($"vec_id" >= 400)
      .select(($"vec_id" + 10000L).as("vec_id"),
        transform($"v", x => x * 5.0).as("v"))
    val bad = AnnIndex.append(s, path, shifted, "vec_id", "v", ver = 3L)
    bad.rebuildRecommended shouldBe true
    bad.ratio should be > 2.0
    // the drifted rows are IN the index (nothing dropped while the
    // rebuild is pending)
    AnnIndex.codes(s, path).filter($"vec_id" >= 10000L).count() shouldBe
      e.filter($"vec_id" >= 400).count()
    // empty batch: no commit effect needed, NaN fit, no recommendation
    val none = AnnIndex.append(s, path, e.filter($"vec_id" < 0),
      "vec_id", "v", ver = 4L)
    none.rebuildRecommended shouldBe false
    none.batchMeanErr.isNaN shouldBe true
    // baseline round-trips through the model table
    AnnIndex.readModel(s, path).baselineErr shouldBe model.baselineErr
  }

  test("maintenance is O(touched buckets): a one-vector append's commit " +
       "generation holds one bucket dir, not the table fan-out") {
    val s = spark
    import s.implicits._
    val path = Files.createTempDirectory("ann_idx_g").toString + "/idx"
    AnnIndex.build(s, path, e, "vec_id", "v",
      centroidIds = Cents, dim = 64, m = 4, k = 4, rounds = 1,
      nBuckets = 16)
    AnnIndex.append(s, path, e.filter($"vec_id" === 7L), "vec_id", "v",
      ver = 2L)
    val gens = java.nio.file.Paths.get(path, "codes", "_gens")
    val v2gens = {
      val l = Files.list(gens)
      try {
        import scala.jdk.CollectionConverters._
        l.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith(f"g${2L}%020d")).toVector
      } finally l.close()
    }
    v2gens.size shouldBe 1
    val buckets = {
      val l = Files.list(gens.resolve(v2gens.head))
      try {
        import scala.jdk.CollectionConverters._
        l.iterator().asScala.map(_.getFileName.toString)
          .count(_.startsWith("__bucket="))
      } finally l.close()
    }
    buckets shouldBe 1
  }

  test("a rebuild on an existing index path REPLACES both tables: no " +
       "old/new row mixing, dropped vectors gone, and a replayed " +
       "pre-rebuild append cannot resurrect stale rows") {
    val s = spark
    import s.implicits._
    val path = Files.createTempDirectory("ann_rebuild").toString + "/idx"
    AnnIndex.build(s, path, e.filter($"vec_id" < 300), "vec_id", "v",
      centroidIds = Cents, dim = 64, m = 4, k = 4, rounds = 1)
    AnnIndex.append(s, path,
      e.filter($"vec_id" >= 300 && $"vec_id" < 400), "vec_id", "v",
      ver = 2L)
    // drift-triggered rebuild: different corpus slice (0..99 dropped),
    // different coarse centroids — everything about the old model/
    // codes must be replaced, not merged
    val corpus2 = e.filter($"vec_id" >= 100 && $"vec_id" < 500)
    val cents2 = Seq(110L, 120L, 130L, 140L)
    val model2 = AnnIndex.build(s, path, corpus2, "vec_id", "v",
      centroidIds = cents2, dim = 64, m = 4, k = 4, rounds = 1)
    // the model read back is EXACTLY the new one — a version-tied LWW
    // merge would leave a chimera of old and new centroid/codebook rows
    val m2 = AnnIndex.readModel(s, path)
    m2.centroids.map(_._1) shouldBe cents2
    m2.centroids shouldBe model2.centroids
    m2.pq.codebooks.flatten.flatten.toSeq shouldBe
      model2.pq.codebooks.flatten.flatten.toSeq
    // codes are exactly the new corpus under the new model; vectors
    // dropped from the new corpus are no longer searchable
    val expect = codeRows(AnnIndex.encodeWith(corpus2, "vec_id", "v", model2))
    codeRows(AnnIndex.codes(s, path)) shouldBe expect
    AnnIndex.codes(s, path).filter($"vec_id" < 100).count() shouldBe 0L
    // a REPLAYED pre-rebuild append (old batch version, mutated
    // content) loses LWW against the rebuilt rows
    val replay = corpus2.filter($"vec_id" === 150L)
      .select($"vec_id", transform($"v", x => -x).as("v"))
    AnnIndex.append(s, path, replay, "vec_id", "v", ver = 2L)
    codeRows(AnnIndex.codes(s, path)) shouldBe expect
    AnnIndex.fsck(s, path).consistent shouldBe true
  }

  test("index maintenance rides the dim-store policy: per-append " +
       "fragmentation heals, history vacuums, and answers are unchanged") {
    val s = spark
    import s.implicits._
    val path = Files.createTempDirectory("ann_maint").toString + "/idx"
    val model = AnnIndex.build(s, path, e.filter($"vec_id" < 300),
      "vec_id", "v", centroidIds = Cents, dim = 64, m = 4, k = 4,
      rounds = 1, nBuckets = 4)
    // 8 small appends: one commit generation each — the streaming
    // accretion shape the policy exists for
    (0 until 8).foreach { i =>
      AnnIndex.append(s, path,
        e.filter($"vec_id" >= 300 + i * 25 && $"vec_id" < 325 + i * 25),
        "vec_id", "v", ver = (i + 2).toLong)
    }
    val before = codeRows(AnnIndex.codes(s, path))
    // report-only: the tiny fixture at default byte targets reads as
    // over-fanned-out, so the policy has a recommendation — and
    // recommends without committing
    val h0 = graft.ops.DimStore.history(path + "/codes")
    val m0 = AnnIndex.maintain(s, path, maxFilesPerBucket = 2,
      apply = false)
    (m0.rebucketTo.isDefined || m0.compactRecommended) shouldBe true
    graft.ops.DimStore.history(path + "/codes") shouldBe h0
    // applied + vacuum: layout heals, history prunes, content identical
    val m1 = AnnIndex.maintain(s, path, maxFilesPerBucket = 2,
      vacuumKeepLast = 1, vacuumGraceMillis = 0L)
    m1.applied should not be empty
    codeRows(AnnIndex.codes(s, path)) shouldBe before
    graft.ops.DimStore.history(path + "/codes").size shouldBe 1
    // the frozen model survives its vacuum bit-exactly
    val m2 = AnnIndex.readModel(s, path)
    m2.centroids shouldBe model.centroids
    m2.pq.codebooks.flatten.flatten.toSeq shouldBe
      model.pq.codebooks.flatten.flatten.toSeq
  }

  test("fsck detects the rebuild crash window: a new model committed " +
       "without its codes rewrite reports every code row stale") {
    val s = spark
    import s.implicits._
    val path = Files.createTempDirectory("ann_fsck").toString + "/idx"
    AnnIndex.build(s, path, e.filter($"vec_id" < 300), "vec_id", "v",
      centroidIds = Cents, dim = 64, m = 4, k = 4, rounds = 1)
    val clean = AnnIndex.fsck(s, path)
    clean.consistent shouldBe true
    clean.codeRows shouldBe 300L
    // simulate build() crashing between its two commits: the model
    // table carries a NEWER build version than any code row
    graft.ops.DimStore.rewrite(s, path + "/model", "key") { df =>
      df.withColumn("i1",
        when(col("kind") === "bver", col("i1") + 1L).otherwise(col("i1")))
    }
    val torn = AnnIndex.fsck(s, path)
    torn.consistent shouldBe false
    torn.staleCodes shouldBe torn.codeRows
  }

  test("fsck flags the fresh-path crash window: a model committed " +
       "without any codes table is inconsistent, not healthy-empty") {
    val s = spark
    import s.implicits._
    val path = Files.createTempDirectory("ann_fsck_fresh").toString + "/idx"
    AnnIndex.build(s, path, e.filter($"vec_id" < 300), "vec_id", "v",
      centroidIds = Cents, dim = 64, m = 4, k = 4, rounds = 1)
    AnnIndex.fsck(s, path).consistent shouldBe true
    // simulate build() dying between the model commit and the first
    // codes commit on a fresh path: the codes table never existed
    graft.ops.PosixLogStore.deleteTree(path + "/codes")
    val crashed = AnnIndex.fsck(s, path)
    crashed.codesTableMissing shouldBe true
    crashed.consistent shouldBe false
  }

  test("a zero-error baseline never recommends a rebuild for " +
       "double-noise batches, and an append tying the build version " +
       "is rejected") {
    val s = spark
    import s.implicits._
    val path = Files.createTempDirectory("ann_zero_base").toString + "/idx"
    // corpus = exactly the coarse centroids: every residual is the
    // zero vector, so the trained codebooks reproduce the build
    // corpus perfectly and baselineErr is exactly 0.0
    val model = AnnIndex.build(s, path, e.filter($"vec_id".isin(Cents: _*)),
      "vec_id", "v", centroidIds = Cents, dim = 64, m = 4, k = 4,
      rounds = 1)
    model.baselineErr shouldBe 0.0
    model.buildVer shouldBe 1L
    // an append at the build's own version would make new-vs-rebuilt
    // survival a LWW hash tie-break — rejected loudly
    an[IllegalArgumentException] should be thrownBy
      AnnIndex.append(s, path, e.filter($"vec_id" === 10L),
        "vec_id", "v", ver = 1L)
    // ulp-perturbed copies of the centroids: quantization error is
    // nonzero but double-precision noise — a naive batchErr/0.0 ratio
    // would be Infinity and spuriously demand a rebuild
    val noise = e.filter($"vec_id".isin(Cents: _*))
      .select(($"vec_id" + 1000L).as("vec_id"),
        transform($"v", x => x + lit(1e-13)).as("v"))
    val ok = AnnIndex.append(s, path, noise, "vec_id", "v", ver = 2L)
    ok.rebuildRecommended shouldBe false
    ok.buildVer shouldBe 1L
    // genuine drift on the same zero baseline IS still caught
    val drifted = e.filter($"vec_id".isin(Cents: _*))
      .select(($"vec_id" + 2000L).as("vec_id"),
        transform($"v", x => x * 5.0).as("v"))
    val bad = AnnIndex.append(s, path, drifted, "vec_id", "v", ver = 3L)
    bad.rebuildRecommended shouldBe true
    bad.ratio.isPosInfinity shouldBe true
  }
}
