package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.queries.Extensions

/** Positive-case coverage for the dedup/similarity operators: the
  * driver fixtures contain no engineered duplicates, so these specs
  * write a synthetic documents table WITH exact and near duplicates and
  * assert the operators actually find them. */
class ExtensionsSemanticsSpec extends AnyFunSuite with Matchers with SparkFixture {

  /** A corpus with: docs 0/1 exact dups (modulo case/whitespace),
    * docs 2/3 near-dups (one word changed out of 40), docs 4..13
    * unrelated random-ish texts. */
  private lazy val dir: String = {
    val s = spark
    import s.implicits._
    val base = Seq.tabulate(40)(i => s"tok${i % 13} word$i").mkString(" ")
    val near = base.replace("word20", "changed20")
    val rows =
      Seq((0L, base, "en", "srcA", base.length.toLong),
          (1L, "  " + base.toUpperCase + " ", "en", "srcA", base.length.toLong),
          (2L, base + " tail one", "en", "srcB", base.length.toLong),
          (3L, near + " tail one", "en", "srcB", near.length.toLong)) ++
      Seq.tabulate(10) { i =>
        val txt = Seq.tabulate(30)(j => s"u${i}t$j distinct$i$j").mkString(" ")
        (4L + i, txt, "en", "srcC", txt.length.toLong)
      }
    val d = Files.createTempDirectory("extsem").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("x02/x04 survive short documents (0/1/2 tokens) without crashing") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("extshort").toString
    Seq(
      (0L, "", "en", "srcA", 0L),                 // empty text
      (1L, "one", "en", "srcA", 3L),              // 1 token
      (2L, "two words", "en", "srcA", 9L),        // 2 tokens
      (3L, "a b c d e f g h", "en", "srcA", 15L), // enough for shingles
      (4L, "a b c d e f g h", "en", "srcA", 15L)) // its exact dup
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    // must not throw (sequence(1,0) descends in Spark — guarded), and
    // the long dup pair must still surface
    val x02 = Extensions.x02.run(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    x02 should contain((3L, 4L))
    noException should be thrownBy Extensions.x04.run(s, d).collect()
  }

  test("x01 exact dedup collapses case/whitespace-normalized duplicates") {
    val out = Extensions.x01.run(spark, dir).collect()
    val byKeeper = out.map(r => r.getLong(1) -> r.getLong(2)).toMap
    byKeeper(0L) shouldBe 2L        // doc 1 folded into doc 0
    byKeeper.keySet should not contain 1L
    out.map(_.getLong(2)).sum shouldBe 14L  // every doc accounted for
  }

  test("x02 MinHash+LSH surfaces the engineered near-dup pair without crossJoin") {
    val out = Extensions.x02.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exact dup pair (identical modulo case/whitespace; the stray
    // whitespace tokens cost a few shingles, so just-below 1.0)
    val dup = out.find(p => p._1 == 0L && p._2 == 1L)
    dup should not be empty
    dup.get._3 should be > 900000L
    // near-dup pair: one token change in 40 → jaccard well above 0.5
    val nd = out.find(p => p._1 == 2L && p._2 == 3L)
    nd should not be empty
    nd.get._3 should be > 500000L
    // unrelated docs never pair up
    out.count(p => p._1 >= 4L) shouldBe 0
  }

  test("x03 SimHash: near-dups land within small hamming distance, unrelated far") {
    val fp = Extensions.x03.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    hamming(fp(0L), fp(1L)) shouldBe 0   // same normalized token set
    hamming(fp(2L), fp(3L)) should be <= 8
    hamming(fp(0L), fp(7L)) should be > 8
  }

  test("x04 blocked n-gram Jaccard finds the same-source near-dup pair") {
    val out = Extensions.x04.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pair = out.find(p => p._1 == 2L && p._2 == 3L)
    pair should not be empty
    pair.get._3 should be > 500000L
  }

  test("x05/x06 similarity search agree on a planted nearest neighbor") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("extemb").toString
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    val q = vec()
    val close = q.map(x => x + 0.01f)    // planted neighbor of vec 0
    val rows = (0L, q, 0) +: (1L, close, 0) +:
      Seq.tabulate(48)(i => (2L + i, vec(), 1))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")

    val brute = Extensions.x05.run(s, d).collect()
    brute.head.getLong(0) shouldBe 1L    // planted neighbor ranks first
    brute.head.getLong(2) should be > 990000L

    val ann = Extensions.x06.run(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    // query 0's bucket contains its planted neighbor at rank 1
    ann.find(r => r._1 == 0L && r._3 == 1).map(_._2) shouldBe Some(1L)

    // x13 semantic near-dup: the planted pair is the one bucketed
    // cosine-dup edge, with keeper = lower id
    val nd = Extensions.x13.run(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    nd.map(p => (p._1, p._2)) should contain((0L, 1L))
    nd.find(p => p._1 == 0L && p._2 == 1L).get._3 should be > 990000L
  }

  test("x13 multi-band LSH recall on planted near-dups beats one band") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("extlsh").toString
    val rnd = new scala.util.Random(11)
    def vec(): Array[Double] = Array.fill(64)(rnd.nextGaussian())
    // 40 planted pairs (i, 1000+i) at cos ≈ 0.93 plus 100 distractors
    val bases = Seq.tabulate(40)(_ => vec())
    val dups = bases.map(_.map(x => x + 0.38 * rnd.nextGaussian()))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    // ground truth = planted pairs whose actual cosine clears the 0.9 gate
    val truth = bases.indices.filter(i => cos(bases(i), dups(i)) >= 0.9)
    truth.size should be > 20  // the plant worked
    val rows =
      bases.zipWithIndex.map { case (v, i) => (i.toLong, v.map(_.toFloat), 0) } ++
      dups.zipWithIndex.map { case (v, i) => (1000L + i, v.map(_.toFloat), 0) } ++
      Seq.tabulate(100)(i => (2000L + i, vec().map(_.toFloat), 1))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")

    val found = Extensions.x13.run(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hit = truth.count(i => found((i.toLong, 1000L + i)))
    // single-band expected recall at cos 0.93 is ~0.4; four OR'd bands
    // lift it to ~0.87 — assert comfortably between the two so the test
    // passes only with banding in effect
    hit.toDouble / truth.size should be >= 0.6
    // and strictly more than band 0 alone would surface (computed
    // directly from the sign patterns, no Spark needed)
    def bucket(v: Array[Double], dims: Seq[Int]): String =
      dims.map(i => if (v(i - 1) >= 0) '1' else '0').mkString
    val band0 = Extensions.X13Bands.head
    val band0Hits = truth.count(i =>
      bucket(bases(i), band0) == bucket(dups(i), band0))
    hit should be > band0Hits
  }

  test("x32 span dedup: docs sharing an exact 8-token span are flagged, disjoint docs are not") {
    val s = spark
    import s.implicits._
    val shared = "alpha beta gamma delta epsilon zeta eta theta" // exactly 8 tokens
    val d = Files.createTempDirectory("x32span").toString
    Seq(
      (0L, s"intro words here $shared trailing content one two three"),
      (1L, s"totally different opening $shared and another ending entirely"),
      (2L, "no overlap at all in this document beyond chance words maybe"),
      (3L, "short doc")) // < 8 tokens: excluded from span space
      .map { case (id, t) => (id, t, "en", "srcA", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Extensions.x32.run(s, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    out.keySet shouldBe Set(0L, 1L, 2L) // doc 3 has no spans
    out(0L)._2 should be >= 1L // shares the planted span
    out(1L)._2 should be >= 1L
    out(2L)._2 shouldBe 0L     // disjoint: nothing shared
    // shared spans never exceed total spans
    out.values.foreach { case (n, sh) => sh should be <= n }
  }

  test("x33 packing: bins are monotone per source and never skip; straddle bounded by one doc") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val d = Files.createTempDirectory("x33pack").toString
    val rows = (0L until 200L).map { i =>
      val n = 1 + rnd.nextInt(60)
      val t = Seq.fill(n)("tok").mkString(" ")
      (i, t, "en", s"src${i % 3}", t.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Extensions.x33.run(s, d)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3)))
    out.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._2)
      // monotone, no skipped bins
      sorted.map(_._4).foldLeft(0L) { (prev, b) =>
        b should (be >= prev and be <= prev + 1); b
      }
      // every bin's token load is within capacity + one straddling doc
      val maxDoc = sorted.map(_._3).max
      sorted.groupBy(_._4).values.foreach { bin =>
        bin.map(_._3).sum should be <= (2048L + maxDoc)
      }
    }
  }

  test("x34 overlap matrix: sharing sources surface, disjoint sources do not") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("x34ovl").toString
    val shared = "common phrase tokens appear here repeatedly"
    Seq(
      (0L, s"$shared plus alpha specific words", "en", "srcA"),
      (1L, s"$shared plus beta specific words", "en", "srcB"),
      (2L, "entirely disjoint vocabulary nothing matches anywhere", "en", "srcC"))
      .map { case (id, t, l, src) => (id, t, l, src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Extensions.x34.run(s, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    out.keySet shouldBe Set(("srcA", "srcB")) // only the sharing pair
    val (nShared, jac) = out(("srcA", "srcB"))
    nShared should be >= 4L // the shared phrase's trigrams
    jac should be > 0L
  }

  test("x31 thresholded levenshtein is pure pruning: planted long-vs-short pair never changes results") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // All four docs share the same 16-char block prefix, so every pair
    // is a blocking candidate. Doc 1 is doc 0 with 3 edits (dist 3,
    // must survive); doc 2 appends a 200-char tail to doc 0 (length
    // delta 200 > 25 → the banded DP's O(1) length-delta reject fires,
    // and its true distance is ≥ 200 so rejecting drops nothing a full
    // levenshtein would keep); doc 3 is unrelated beyond the prefix
    // (same length ballpark, so only the DP itself can cut it).
    val prefix = "shared prefix 16" // exactly 16 chars
    val d0 = prefix + " the quick brown fox jumps over the lazy dog again"
    val d1 = prefix + " the quick braun fox jumps over the lazy dug again"
    val d2 = d0 + ("z" * 200)
    val d3 = prefix + " completely different words follow here xxxxxxx yy"
    val d = Files.createTempDirectory("x31gate").toString
    Seq((0L, d0), (1L, d1), (2L, d2), (3L, d3))
      .map { case (id, t) => (id, t, "en", "srcA", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")

    val got = Extensions.x31.run(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    got shouldBe Set((0L, 1L, 3L))

    // Ground truth without either optimization: full unbounded
    // levenshtein over ALL blocked pairs. The gated/banded form must
    // return exactly this set — the gate and the threshold arg are
    // pruning, never semantics.
    val b = s.read.parquet(s"$d/documents.parquet")
      .select($"doc_id", lower($"text").as("t"),
        substring(lower($"text"), 1, 16).as("blk"))
    val full = b.as("a").join(b.as("c"), $"a.blk" === $"c.blk" &&
        $"a.doc_id" < $"c.doc_id")
      .select($"a.doc_id", $"c.doc_id",
        levenshtein($"a.t", $"c.t").cast("long").as("dist"))
      .filter($"dist" <= 25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    got shouldBe full
  }

  test("x37 incremental dedup: batch docs match history only, best match wins") {
    // In the shared corpus, doc 0 (batch: 0 % 10 == 0) has its exact
    // dup at doc 1 (history) and doc 10 (batch) is unrelated — so the
    // incremental pass must reject exactly doc 0, matched to doc 1.
    val out = Extensions.x37.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.map(_._1).toSet shouldBe Set(0L)      // doc 10 sails through
    val m = out.head
    // doc 0's near-dups in history are doc 1 (case/whitespace dup) and
    // doc 2 (two-token tail) — best-match picks whichever scores higher
    Set(1L, 2L) should contain(m._2)
    m._3 should be > 900000L
    // the asymmetric contract: batch ids only on the left, history only
    // on the right — history is never re-paired against itself
    all(out.map(_._1 % 10)) shouldBe 0L
    all(out.map(_._2 % 10)) should not be 0L
  }

  test("x38 int8-quantized ANN preserves the planted neighbor at rank 1") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("extquant").toString
    // same construction as the x05/x06 fixture (seed 7): vec 1 is a
    // planted near-copy of query vec 0, sharing its sign bucket
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    val q = vec()
    val close = q.map(x => x + 0.01f)
    val rows = (0L, q, 0) +: (1L, close, 0) +:
      Seq.tabulate(48)(i => (2L + i, vec(), 1))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")

    val out = Extensions.x38.run(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    // quantization keeps the planted neighbor on top for query 0, and
    // the int8 cosine stays within ~2% of the true (≈0.9999) value
    val top = out.find(r => r._1 == 0L && r._5 == 1).get
    top._2 shouldBe 1L
    top._4 should be > 980000L
    // integer scores are exact: recompute one dot product in Scala
    def quant(v: Array[Float]): Array[Long] = {
      val dv = v.map(_.toDouble)
      val m = dv.map(math.abs).max
      dv.map(x => (x * 127.0 / m).toLong)
    }
    val expectQdot = quant(q).zip(quant(close)).map { case (a, b) => a * b }.sum
    top._3 shouldBe expectQdot
  }

  test("x39 semantic dedup pairs the planted duplicate within one cluster") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("extsem39").toString
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    // the planted pair sits at ids 10/11 — NOT 0..3, which seed the
    // k-means: two near-identical seeds would anchor two different
    // clusters and the pair could never co-block
    val q = vec()
    val close = q.map(x => x + 0.01f)
    val rows = Seq.tabulate(50) { i =>
      if (i == 10) (10L, q, 0)
      else if (i == 11) (11L, close, 0)
      else (i.toLong, vec(), 1)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")

    val out = Extensions.x39.run(s, d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // vectors 10 and 11 are near-identical → same k-means cell → the
    // (keeper=10, dup=11) edge surfaces at cos ≈ 1
    val edge = out.find(r => r._2 == 10L && r._3 == 11L)
    edge should not be empty
    edge.get._4 should be > 990000L
    // keep-first invariant and the gate hold for every emitted pair
    all(out.map(r => r._2 < r._3)) shouldBe true
    all(out.map(_._4)) should be >= 400000L
  }

  test("x40 BM25: higher tf ranks first at equal length; termless docs never score") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("x40bm25").toString
    // equal document length isolates the tf effect from length norm
    def doc(sparkN: Int, filler: String) =
      (Seq.fill(sparkN)("spark") ++ Seq.fill(20 - sparkN)(filler)).mkString(" ")
    Seq(
      (0L, doc(5, "pad")),  // tf=5
      (1L, doc(1, "pad")),  // tf=1
      (2L, doc(0, "pad")),  // no query term: must not appear
      (3L, "vector " + doc(0, "fill").split(' ').drop(1).mkString(" ")))
      .map { case (id, t) => (id, t, "en", "srcA", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Extensions.x40.run(s, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.keySet shouldBe Set(0L, 1L, 3L) // doc 2 matches nothing
    out(0L) should be > out(1L)         // tf monotonicity at equal dl
    all(out.values) should be > 0L
  }

  test("x41 taxonomy: first matching rule wins in priority order; no match falls through") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("x41tax").toString
    Seq(
      (0L, "a stream with a window over events"),        // streaming
      (1L, "hash join build and probe sides"),           // join_engine
      (2L, "stream only no win token plus join hash"),   // not streaming (no 'window') -> join_engine
      (3L, "stream window but also vector and join hash"), // priority: streaming wins
      (4L, "vector embeddings stored columnar"),         // vectors
      (5L, "plain prose about nothing relevant"))        // other
      .map { case (id, t) => (id, t, "en", "srcA", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Extensions.x41.run(s, d).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    out shouldBe Map(
      0L -> "streaming", 1L -> "join_engine", 2L -> "join_engine",
      3L -> "streaming", 4L -> "vectors", 5L -> "other")
  }

  test("x42 chunking: full token coverage, correct stride, short tail") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("x42chunk").toString
    def toks(n: Int) = Seq.tabulate(n)(i => s"t$i").mkString(" ")
    // boundary cases around C=16, S=12: exactly one chunk, one-past,
    // exact two-chunk cover, and a straddling third
    Seq((0L, toks(16)), (1L, toks(17)), (2L, toks(28)), (3L, toks(29)),
        (4L, toks(3)))
      .map { case (id, t) => (id, t, "en", "srcA", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Extensions.x42.run(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byDoc = out.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    byDoc(0L).map(c => (c._3, c._4)) shouldBe Seq((1L, 16L))
    byDoc(1L).map(c => (c._3, c._4)) shouldBe Seq((1L, 16L), (13L, 5L))
    byDoc(2L).map(c => (c._3, c._4)) shouldBe Seq((1L, 16L), (13L, 16L))
    byDoc(3L).map(c => (c._3, c._4)) shouldBe
      Seq((1L, 16L), (13L, 16L), (25L, 5L))
    byDoc(4L).map(c => (c._3, c._4)) shouldBe Seq((1L, 3L))
    // coverage invariant: every token position of every doc falls in
    // at least one [start, start+len) chunk interval
    val lens = Map(0L -> 16L, 1L -> 17L, 2L -> 28L, 3L -> 29L, 4L -> 3L)
    lens.foreach { case (id, n) =>
      val covered = byDoc(id)
        .flatMap(c => c._3 until (c._3 + c._4)).toSet
      covered shouldBe (1L to n).toSet
    }
  }

  test("x43 keep-best picks the longest cluster member, not the min id") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("x43best").toString
    val base = Seq.tabulate(40)(i => s"tok${i % 13} word$i").mkString(" ")
    // three near-dups of increasing length: x36's min-id policy would
    // keep doc 0; the quality policy must keep the LONGEST, doc 2
    Seq(
      (0L, base),
      (1L, base + " extra tail"),
      (2L, base + " extra tail plus more trailing tokens"),
      (3L, Seq.tabulate(30)(j => s"u9t$j distinct$j").mkString(" ")))
      .map { case (id, t) => (id, t, "en", "srcA", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Extensions.x43.run(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.length shouldBe 1 // one cluster; the unrelated doc never clusters
    val (rep, best, _, members) = out.head
    rep shouldBe 0L       // label is still the min id
    best shouldBe 2L      // keeper is the longest member
    members shouldBe 3L
  }

  test("x46 bigram-LM scores match hand-computed conditional ppm") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("x46lm").toString
    // corpus bigrams: (a,b) twice, (a,c) once → c1(a) = 3
    Seq((0L, "a b"), (1L, "a b"), (2L, "a c"))
      .map { case (id, t) => (id, t, "en", "srcA", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Extensions.x46.run(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // P(b|a) = 2/3 → 666666 ppm; P(c|a) = 1/3 → 333333 ppm
    out shouldBe Set((0L, 1L, 666666L), (1L, 1L, 666666L), (2L, 1L, 333333L))
  }

  test("x49 sequences are time-ordered with event_id tie-break, partition-order independent") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("x49seq").toString
    def ts(sec: Int) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    // user 1: c(t=3), a(t=1), b(t=2) → "a,b,c"; user 2: two events at the
    // SAME instant — event_id must break the tie → "x,y"
    val rows = Seq(
      (30L, ts(3), 1L, "c", 0.0, "{}"),
      (10L, ts(1), 1L, "a", 0.0, "{}"),
      (20L, ts(2), 1L, "b", 0.0, "{}"),
      (42L, ts(5), 2L, "y", 0.0, "{}"),
      (41L, ts(5), 2L, "x", 0.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(7) // scramble physical order: output must not care
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = Extensions.x49.run(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    got shouldBe Set((1L, 3L, "a,b,c"), (2L, 2L, "x,y"))
  }

  test("x47 per-source quantiles are the exact nearest-rank order statistics") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("x47q").toString
    val rnd = new scala.util.Random(31)
    val rows = (0 until 100).map { i =>
      val src = s"src${i % 2}"
      (i.toLong, s"doc $i", "en", src, rnd.nextInt(5000).toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val expect = rows.groupBy(_._4).map { case (src, rs) =>
      val sorted = rs.map(_._5).sorted
      val n = sorted.size
      def q(ppm: Long) = sorted((ppm * (n - 1) / 1000000L).toInt)
      src -> ((q(500000L), q(900000L), q(990000L)))
    }
    val got = Extensions.x47.run(s, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    got shouldBe expect
  }

  test("x54 snapshot diff classifies added/removed/changed/unchanged exactly") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("x54diff").toString
    // doc_id 10 → added (only in new), 11 → removed (only in old),
    // 12 → changed (normalization rewrites "A  B"), 13 → unchanged;
    // NULL-text docs pin the presence-vs-fingerprint fix: 14 (in both
    // snapshots) must be 'unchanged' via null-safe fp equality, 21
    // (only in old) must be 'removed' — not 'added', which a
    // fingerprint-nullness membership test would report for both.
    val rows = Seq(
      (10L, Some("ten"), "srcA", 3L),
      (11L, Some("eleven"), "srcA", 6L),
      (12L, Some("A  B"), "srcB", 4L),
      (13L, Some("already clean"), "srcB", 13L),
      (14L, None, "srcB", 0L),
      (21L, None, "srcA", 0L))
    rows.map { case (id, txt, src, n) => (id, txt, "en", src, n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = Extensions.x54.run(s, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    got shouldBe Map(
      ("srcA", "added") -> 1L, ("srcA", "removed") -> 2L,
      ("srcB", "changed") -> 1L, ("srcB", "unchanged") -> 2L)
  }

  test("x55 trims exactly outside the nearest-rank [p05, p95] band") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("x55trim").toString
    // n_chars = 1..100 for one source: lo = rank (50000*99)//1e6+1 = 5,
    // hi = rank (950000*99)//1e6+1 = 95 → kept 91, dropped 9
    (1 to 100).map(i => (i.toLong, s"doc $i", "en", "srcA", i.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = Extensions.x55.run(s, d).collect()
    r.length shouldBe 1
    (r(0).getString(0), r(0).getLong(1), r(0).getLong(2),
      r(0).getLong(3), r(0).getLong(4)) shouldBe ("srcA", 5L, 95L, 91L, 9L)
  }

  test("x56 deciles are the exact boundary-binned equi-depth histogram") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("x56dec").toString
    // n_chars = 1..100: boundary_i = value at rank (i*100000*99)//1e6+1
    // = 10i, ties-to-lower → decile i covers exactly [10(i-1)+1, 10i]
    (1 to 100).map(i => (i.toLong, s"doc $i", "en", "srcA", i.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = Extensions.x56.run(s, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    got shouldBe (1 to 10).map { i =>
      i.toLong -> ((10L, 10L * (i - 1) + 1, 10L * i))
    }.toMap
  }

  test("x57 ranks doc terms by exact rational tf-idf with term tie-break") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("x57tfidf").toString
    // N=3; df: apple=1, banana=2, cherry=1, dog=1
    // doc1: apple tf=2 → 6e6; banana tf=1 → 1.5e6
    // doc2: cherry tf=2 → 6e6; banana tf=1 → 1.5e6
    // doc3: dog tf=3 → 9e6
    Seq((1L, "apple apple banana"), (2L, "banana cherry cherry"),
        (3L, "dog dog dog"))
      .map { case (id, txt) => (id, txt, "en", "srcA", txt.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = Extensions.x57.run(s, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    got shouldBe Set(
      (1L, "apple", 6000000L), (1L, "banana", 1500000L),
      (2L, "cherry", 6000000L), (2L, "banana", 1500000L),
      (3L, "dog", 9000000L))
  }

  test("x58 dispersion: exact centroid cosine stats per label") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("x58disp").toString
    // label 0: (1,0) and (0,1) → centroid (0.5, 0.5); cos(v, c) =
    // 0.5/(1·√0.5) = √0.5 → 707107 ppm for both members.
    // label 1: single (3,4) → centroid is itself → cos = 1 → 1000000.
    Seq((0L, Seq(1f, 0f), 0), (1L, Seq(0f, 1f), 0), (2L, Seq(3f, 4f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val got = Extensions.x58.run(s, d).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    got shouldBe Map(
      0 -> ((2L, 707107L, 707107L)),
      1 -> ((1L, 1000000L, 1000000L)))
  }

  test("x59 votes the 5-NN majority label with deterministic tie-breaks") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("x59knn").toString
    // query vec_id 0 (true label 7), 6 candidates: three exact matches
    // labeled 7 (cos 1e6), one diagonal labeled 3 (707107), two
    // orthogonal labeled 3 (cos 0 — only the lower vec_id makes top-5).
    // Votes: 7×3 vs 3×2 → winner 7 → correct.
    val rows = Seq(
      (0L, Seq(1f, 0f), 7),
      (1L, Seq(1f, 0f), 7), (2L, Seq(1f, 0f), 7), (3L, Seq(1f, 0f), 7),
      (4L, Seq(1f, 1f), 3), (5L, Seq(0f, 1f), 3), (6L, Seq(0f, 1f), 3))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val r = Extensions.x59.run(s, d).collect()
    r.length shouldBe 1
    (r(0).getInt(0), r(0).getLong(1), r(0).getLong(2)) shouldBe (7, 1L, 1L)
  }

  test("x60 collocation lift: exact integer lift, min-count gate") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("x60lift").toString
    // "x y" × 6 → N=12, c_x=c_y=6; bigrams: (x,y)×6, (y,x)×5 — both
    // pass the ≥5 gate. lift(x,y) = 1e6·6·12/36 = 2000000;
    // lift(y,x) = 1e6·5·12/36 = 1666666 (floored).
    val txt = Seq.fill(6)("x y").mkString(" ")
    Seq((1L, txt, "en", "srcA", txt.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = Extensions.x60.run(s, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    got shouldBe Array(
      ("x", "y", 6L, 2000000L), ("y", "x", 5L, 1666666L))
  }

  test("x61 prefix energy: exact ppm fractions of the squared norm") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("x61dim").toString
    // all-ones 64-dim vectors: energy(k) = k/64 exactly →
    // 250000 / 500000 / 750000 ppm for k = 16 / 32 / 48
    Seq((0L, Seq.fill(64)(1f), 0), (1L, Seq.fill(64)(1f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val got = Extensions.x61.run(s, d).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    got shouldBe Map(
      16 -> ((2L, 250000L, 250000L)),
      32 -> ((2L, 500000L, 500000L)),
      48 -> ((2L, 750000L, 750000L)))
  }

  test("x62 frequency spectrum counts vocabulary types per occurrence count") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("x62spec").toString
    // corpus tokens: a×3 (two docs), b×2, c×1 → spectrum {1→1, 2→1, 3→1}
    Seq((1L, "a a b"), (2L, "a b c"))
      .map { case (id, txt) => (id, txt, "en", "srcA", txt.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = Extensions.x62.run(s, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L)
  }

  test("x63 vocab overlap: exact pairwise Jaccard, token-keyed join") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("x63spec").toString
    // srcA vocab {a,b,c}, srcB {b,c,d} → ∩=2, ∪=4 → 500000 ppm;
    // srcC {z} overlaps nothing → no row (inter would be 0)
    Seq((1L, "a b c b", "srcA"), (2L, "b c d", "srcB"), (3L, "z", "srcC"))
      .map { case (id, txt, src) => (id, txt, "en", src, txt.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = Extensions.x63.run(s, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    got shouldBe Array(("srcA", "srcB", 2L, 500000L))
  }

  test("x64 grid: correlated axes land on the diagonal, bins partition the corpus") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("x64grid").toString
    // single-token docs: mtl_ppm = 1e6·n_chars, so both axes rank
    // identically → only diagonal cells, 20 docs each (quintiles of
    // 1..100 split at boundary values 20/40/60/80, ties-to-lower)
    (1 to 100).map(i => (i.toLong, "w", "en", "srcA", i.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = Extensions.x64.run(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    got shouldBe (1 to 5).map(i => (i.toLong, i.toLong) -> 20L).toMap
  }

  test("x65 funnel: raw > exact > neardup with the engineered dup corpus") {
    val s = spark
    // the shared fixture: docs 0/1 exact dups, 2/3 near-dups — and doc 2
    // (= base + " tail one") is itself a near-dup of doc 0 (= base), so
    // LSH links one cluster {0,1,2,3} with rep 0. Funnel: 14 raw, 13
    // after exact (doc 1 folded into 0), 11 after near-dup (docs 2 and
    // 3 are non-rep members of cluster 0)
    val got = Extensions.x65.run(s, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe Map("0_raw" -> 14L, "1_exact" -> 13L, "2_neardup" -> 11L)
  }

  test("x66 BPE pairs: counts weighted by word frequency, ordered cut") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("x66bpe").toString
    // tokens: ab ab cde → distinct words ab(wc=2), cde(wc=1)
    // pairs: "ab"→2, "cd"→1, "de"→1; order (n DESC, pair ASC)
    Seq((0L, "ab ab cde", "en", "srcA", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = Extensions.x66.run(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    got shouldBe Seq(("ab", 2L), ("cd", 1L), ("de", 1L))
  }

  test("x67 embedding health: zero vectors counted, norm bounds exact") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("x67health").toString
    Seq((0L, Array(0f, 0f, 0f, 0f), 0),
        (1L, Array(1f, 0f, 0f, 0f), 0),
        (2L, Array(2f, 0f, 0f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val got = Extensions.x67.run(s, d).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    got shouldBe Map(
      0 -> ((2L, 1L, 0L, 1000000L)),
      1 -> ((1L, 0L, 4000000L, 4000000L)))
  }

  test("x68 vocab coverage: head token covers 90%, tail needs two") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("x68cov").toString
    // srcA: a×9 b×1 → cum(a)=9 ≥ 0.9·10 → v90=1
    // srcB: a×5 b×4 c×1 → cum(a)=5 < 9, cum(a,b)=9 ≥ 9 → v90=2
    Seq((0L, "a a a a a a a a a b", "en", "srcA", 19L),
        (1L, "a a a a a b b b b c", "en", "srcB", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = Extensions.x68.run(s, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    got shouldBe Map(
      "srcA" -> ((2L, 10L, 1L)),
      "srcB" -> ((3L, 10L, 2L)))
  }

  test("w16 per-window top types: exact counts, count-then-term tie-break") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("w16hh").toString
    def ts(hr: Int) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(hr * 3600L))
    // all inside the first 6h window: a×3, b×2, c×1, d×1 → top-3
    // "a,b,c" (c beats d on the term tie-break at cnt=1), n=7
    val rows = Seq(
      (1L, ts(0), 1L, "a"), (2L, ts(1), 1L, "a"), (3L, ts(2), 2L, "a"),
      (4L, ts(3), 2L, "b"), (5L, ts(4), 3L, "b"),
      (6L, ts(5), 3L, "c"), (7L, ts(5), 4L, "d"))
    rows.map { case (id, t, u, et) => (id, t, u, et, 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = graft.queries.Warehouse.w16.run(s, d).collect()
    r.length shouldBe 1
    (r(0).getLong(0), r(0).getLong(1), r(0).getString(2)) shouldBe
      (0L, 7L, "a,b,c")
  }
}
