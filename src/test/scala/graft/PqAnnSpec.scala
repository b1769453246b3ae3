package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.ProductQuantizer

/** Pins [[ProductQuantizer]] beyond x72's oracle row: the oracle grades
  * the unrolled M=4/K=4 shape for cross-engine exactness; these tests
  * exercise the SAME code path at a production shape and assert the
  * properties that make PQ useful — reconstruction beats no
  * reconstruction, ADC ranks correlate with true ranks, and recall@10
  * at (m=8, k=16) clears a measured floor on the real fixture. */
class PqAnnSpec extends AnyFunSuite with Matchers with SparkFixture {

  private lazy val e = {
    val s = spark
    import s.implicits._
    graft.core.Tables.load(s, sf0001, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .persist()
  }

  private def l2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  test("codes are within range and deterministic across two encodes") {
    val model = ProductQuantizer.train(e, "vec_id", "v", 64, m = 4, k = 4, rounds = 1)
    val c1 = ProductQuantizer.encode(e, "v", model)
    val codes = c1.select("pq_code0", "pq_code1", "pq_code2", "pq_code3").collect()
    all(codes.flatMap(r => (0 until 4).map(r.getInt))) should (be >= 0 and be < 4)
    val c2 = ProductQuantizer.encode(e, "v", model)
      .select("vec_id", "pq_code0").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    c1.select("vec_id", "pq_code0").collect()
      .foreach(r => c2(r.getLong(0)) shouldBe r.getInt(1))
  }

  test("one Lloyd round does not increase total quantization error") {
    val m0 = ProductQuantizer.train(e, "vec_id", "v", 64, m = 8, k = 16, rounds = 0)
    val m1 = ProductQuantizer.train(e, "vec_id", "v", 64, m = 8, k = 16, rounds = 1)
    def sqErr(model: ProductQuantizer.PqModel): Double = {
      val rows = ProductQuantizer.encode(e, "v", model).collect()
      rows.map { r =>
        val v = r.getSeq[Double](1).toArray
        (0 until model.m).map { mi =>
          val c = model.codebooks(mi)(r.getInt(2 + mi))
          var s = 0.0; var i = 0
          while (i < model.subDim) { val d = v(mi * model.subDim + i) - c(i); s += d * d; i += 1 }
          s
        }.sum
      }.sum
    }
    sqErr(m1) should be <= sqErr(m0)
  }

  test("ADC of a codebook-reconstructed vector is exactly zero") {
    val s = spark
    import s.implicits._
    val model = ProductQuantizer.train(e, "vec_id", "v", 64, m = 4, k = 4, rounds = 1)
    // synthesize vectors that ARE centroid concatenations: quantizing
    // one must reproduce its own codes, and the ADC LUT against itself
    // must sum exact 0.0 terms — pins that the driver-side LUT fold
    // and the executor-side assignment fold see identical doubles
    val recon = (0 until 4).map { k =>
      (k.toLong, (0 until 4).flatMap(mi => model.codebooks(mi)(k)).toArray.toSeq)
    }.toDF("vec_id", "v")
    val coded = ProductQuantizer.encode(recon, "v", model)
    coded.collect().foreach { r =>
      val k = r.getLong(0).toInt
      (0 until 4).foreach(mi => r.getInt(2 + mi) shouldBe k)
    }
    val q = (0 until 4).flatMap(mi => model.codebooks(mi)(2)).toArray
    val adc = coded.filter($"vec_id" === 2L)
      .select(ProductQuantizer.adcDistance(q, model).as("d"))
      .head().getDouble(0)
    adc shouldBe 0.0
  }

  test("property fuzz: random corpora and shapes — codes in range, " +
       "ADC self-distance zero, Lloyd error monotone") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 3) {
      val (m, k) = Seq((2, 4), (4, 8), (8, 4))(trial - 1)
      val n = 60 + trial * 20
      val rows = Seq.tabulate(n)(i =>
        (i.toLong, Seq.fill(64)(rnd.nextGaussian())))
      val df = rows.toDF("vec_id", "v")
      withClue(s"trial $trial (m=$m, k=$k, n=$n): ") {
        val m0 = ProductQuantizer.train(df, "vec_id", "v", 64, m, k, rounds = 0)
        val m1 = ProductQuantizer.train(df, "vec_id", "v", 64, m, k, rounds = 1)
        val coded = ProductQuantizer.encode(df, "v", m1).collect()
        coded.foreach { r =>
          (0 until m).foreach { mi =>
            val c = r.getInt(2 + mi)
            c should (be >= 0 and be < k)
          }
        }
        // ADC of every codebook-reconstructed vector is exactly 0
        val recon = (0 until k).map(ki =>
          (ki.toLong, (0 until m).flatMap(mi => m1.codebooks(mi)(ki)).toSeq))
          .toDF("vec_id", "v")
        val rc = ProductQuantizer.encode(recon, "v", m1)
        (0 until k).foreach { ki =>
          val q = (0 until m).flatMap(mi => m1.codebooks(mi)(ki)).toArray
          val d = rc.filter($"vec_id" === ki.toLong)
            .select(ProductQuantizer.adcDistance(q, m1).as("d"))
            .head().getDouble(0)
          d shouldBe 0.0
        }
        // one Lloyd round never increases total quantization error
        def sqErr(model: ProductQuantizer.PqModel): Double =
          ProductQuantizer.encode(df, "v", model).collect().map { r =>
            val v = r.getSeq[Double](1).toArray
            (0 until model.m).map { mi =>
              val c = model.codebooks(mi)(r.getInt(2 + mi))
              var sum = 0.0
              var i = 0
              while (i < model.subDim) {
                val dd = v(mi * model.subDim + i) - c(i); sum += dd * dd; i += 1
              }
              sum
            }.sum
          }.sum
        sqErr(m1) should be <= sqErr(m0)
      }
    }
  }

  test("adcLut (executor-side LUT column) is bit-identical to " +
       "adcLutRows (the driver loop) — the distributed probe build " +
       "scores exactly like the literal-shipping form") {
    val s = spark
    import s.implicits._
    val model = ProductQuantizer.train(e, "vec_id", "v", 64, m = 8, k = 16,
      rounds = 1)
    val rows = e.filter($"vec_id" < 5)
      .select($"vec_id", $"v", ProductQuantizer.adcLut($"v", model).as("lut"))
      .collect()
    rows should have length 5
    rows.foreach { r =>
      val v = r.getSeq[Double](1).toArray
      val expect = ProductQuantizer.adcLutRows(v, model)
      r.getSeq[scala.collection.Seq[Double]](2).map(_.toSeq) shouldBe
        expect.map(_.toSeq)
    }
  }

  test("Lloyd-round stats build from ONE corpus scan — no per-subspace " +
       "union branches") {
    val m0 = ProductQuantizer.train(e, "vec_id", "v", 64, m = 8, k = 16, rounds = 0)
    val exec = ProductQuantizer.lloydStats(e, "v", 8, 8, m0.codebooks)
      .queryExecution.executedPlan
    // the branched formulation planned a Union of m slice+posexplode
    // legs — m scans and m× read amplification per training round
    exec.toString should not include "Union"
    withClue(s"plan:\n$exec\n") {
      exec.collectLeaves().size shouldBe 1
    }
  }

  test("exact re-rank (x79) recall@10 strictly beats plain IVFADC (x75) " +
       "on the fixture") {
    val s = spark
    import s.implicits._
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val exact = (0L to 2L).map { qi =>
      qi -> vecs.toSeq.filter(_._1 != qi)
        .sortBy { case (id, v) => (-cos(vecs(qi), v), id) }
        .take(10).map(_._1).toSet
    }.toMap
    def recallOf(rows: Array[org.apache.spark.sql.Row]): Int =
      (0L to 2L).map { qi =>
        val got = rows.filter(_.getLong(0) == qi).map(_.getLong(1)).toSet
        (exact(qi) & got).size
      }.sum
    graft.queries.Extensions.clearPersistedIntermediates()
    val r75 = recallOf(graft.queries.Extensions.x75.run(s, sf0001)
      .select("query_id", "vec_id").collect())
    val r79 = recallOf(graft.queries.Extensions.x79.run(s, sf0001)
      .select("query_id", "vec_id").collect())
    info(s"recall@10 over 3 queries: ivfadc $r75/30, +refine $r79/30")
    // refine re-orders the ADC shortlist by exact cosine, so on a
    // fixture where ADC ordering is noisy it must recover strictly
    // more of the true top-10 (bounded above by probe coverage)
    r79 should be > r75
  }

  test("IVFADC recall@10 from a TRAINED coarse quantizer (buildTrained) " +
       "is not worse than the fixture-row quantizer at (m=8, k=16)") {
    val s = spark
    import s.implicits._
    import graft.ops.AnnIndex
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val exact = (0L to 4L).map { qi =>
      qi -> vecs.toSeq.filter(_._1 != qi)
        .sortBy { case (id, v) => (-cos(vecs(qi), v), id) }
        .take(10).map(_._1).toSet
    }.toMap
    val queries = e.filter($"vec_id" <= 4)
    def recallOf(path: String, model: AnnIndex.Model): Int = {
      val probes = AnnIndex.queryProbes(queries, "vec_id", "v", model, 2)
      val rows = AnnIndex.adcTopK(s, path, probes, model, 10)
        .select("query_id", "vec_id").collect()
      (0L to 4L).map { qi =>
        (exact(qi) & rows.filter(_.getLong(0) == qi).map(_.getLong(1)).toSet).size
      }.sum
    }
    val dirF = java.nio.file.Files.createTempDirectory("ann_fix").toString + "/idx"
    val dirT = java.nio.file.Files.createTempDirectory("ann_tr").toString + "/idx"
    val mF = AnnIndex.build(s, dirF, e, "vec_id", "v",
      centroidIds = Seq(10L, 20L, 30L, 40L), dim = 64, m = 8, k = 16, rounds = 1)
    val mT = AnnIndex.buildTrained(s, dirT, e, "vec_id", "v", nLists = 4,
      dim = 64, m = 8, k = 16, rounds = 1, kmRounds = 2)
    val rF = recallOf(dirF, mF)
    val rT = recallOf(dirT, mT)
    info(s"recall@10 over 5 queries: fixture-rows $rF/50, trained $rT/50")
    // trained centroids cover the corpus by construction (Lloyd means
    // under the SAME cosine assignment the index probes with); four
    // arbitrary corpus rows are the adversarial baseline — training
    // must never lose to it
    rT should be >= rF
  }

  test("recall@10 at (m=8, k=16) clears the measured floor; ADC orders sanely") {
    val s = spark
    import s.implicits._
    val model = ProductQuantizer.train(e, "vec_id", "v", 64, m = 8, k = 16, rounds = 2)
    val codes = ProductQuantizer.encode(e, "v", model)
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val recalls = (0L to 4L).map { qi =>
      val q = vecs(qi)
      val exact = vecs.toSeq.filter(_._1 != qi)
        .sortBy { case (id, v) => (l2(q, v), id) }.take(10).map(_._1).toSet
      val approx = codes.filter($"vec_id" =!= qi)
        .withColumn("adc", ProductQuantizer.adcDistance(q, model))
        .orderBy($"adc".asc, $"vec_id").limit(10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      (exact & approx).size
    }
    info(s"recall@10 per query: ${recalls.mkString(", ")} (mean ${recalls.sum / 5.0})")
    // measured 1,4,1,6,3 (mean 3.0) on the fixture — random-uniform
    // embeddings are vector quantization's worst case (no cluster
    // structure for the codebook to exploit); chance recall is
    // 10·10/499 ≈ 0.2. The floor pins "ranks by genuine proximity"
    // (10× above chance), deliberately below the deterministic
    // measurement so a legitimate seeding change doesn't flip it.
    (recalls.sum / 5.0) should be >= 2.0
  }
}
