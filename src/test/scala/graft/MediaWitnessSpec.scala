package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the StreamBench media leg's witness STRUCTURE: the three-family
  * template blob corpus ([[StreamBench.mediaBlobs]]) must produce
  * exactly one aHash band pattern per family (any per-line suffix) with
  * every band distinct across families — so the streamed detector's
  * component count reads EXACTLY 3 when healthy, 1 when
  * everything-collides, ~nDocs when nothing matches. The r18
  * single-template corpus read 1 on success AND on the
  * everything-collides failure; this corpus gives the witness structure
  * to lose. */
class MediaWitnessSpec extends AnyFunSuite with Matchers with SparkFixture {

  test("media bench blobs: one band pattern per family regardless of " +
       "suffix, all four bands distinct across families, exactly 3 " +
       "streamed components") {
    val s = spark
    import s.implicits._
    // synthetic "lines" with varied content — the suffix source
    val lines = (0 until 60)
      .map(i => s"""{"mid":"m$i","page_id":"p${i % 7}","ts":${1000 + i}}""")
    val raw = lines.toDF("value")
    val blobs = StreamBench.mediaBlobs(raw)

    val planes = graft.ops.Multimodal.luminancePlane(
      blobs.as[graft.ops.MediaIn])
    val bands = graft.ops.PHash.bandedHashes(planes)
    val fams = raw.select(xxhash64($"value").as("doc_id"),
      pmod(xxhash64($"value"), lit(3)).as("fam"))
    val byFam: Map[Long, Set[Seq[Long]]] = bands.join(fams, "doc_id")
      .select($"fam", $"bv").collect()
      .groupBy(_.getLong(0))
      .map { case (f, rs) => f -> rs.map(_.getSeq[Long](1).toSeq).toSet }

    // fixture sanity: all three families present with ≥ 2 docs each
    // (a singleton family would make the component count vacuous)
    byFam.keySet shouldBe Set(0L, 1L, 2L)
    val famSizes = fams.groupBy($"fam").count()
      .as[(Long, Long)].collect().toMap
    famSizes.values.foreach(_ should be >= 2L)

    // within-family: the template dominates the plane's mean threshold,
    // so every suffix yields the SAME four band values
    byFam.values.foreach(_.size shouldBe 1)
    // cross-family: distinct in EVERY band — no band bucket is ever
    // shared, so families can never merge into one component
    for (pair <- byFam.keys.toSeq.sorted.combinations(2)) {
      val pa = byFam(pair(0)).head
      val pb = byFam(pair(1)).head
      (0 until 4).foreach(j => pa(j) should not be pb(j))
    }

    // end-to-end: the streamed detector (batch mode) + star contraction
    // label exactly 3 components over the mixed corpus — the witness
    // value the bench records
    val edges = graft.streaming.StreamingMediaNearDup
      .image(blobs.as[graft.ops.MediaIn]).toDF()
      .select($"keeperId".as("a"), $"dupId".as("b"))
    val labels = graft.ops.ConnectedComponents.starContraction(edges)
    try {
      labels.select(countDistinct($"rep")).head().getLong(0) shouldBe 3L
      // every doc is in some component (all three families collide
      // internally — the adversarial hot-bucket load is preserved)
      labels.select(countDistinct($"id")).head().getLong(0) shouldBe 60L
    } finally { labels.unpersist(); () }
  }
}
