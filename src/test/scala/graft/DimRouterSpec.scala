package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.DimStore
import graft.streaming.{DimRouter, TableProcess}

/** The DIM layer end-to-end in batch form: config routing, projection,
  * create-on-first-write (K4), MERGE upsert (K3), last-writer-wins. */
class DimRouterSpec extends AnyFunSuite with Matchers with SparkFixture {

  test("DimStore.upsert keeps the latest record per pk across calls") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("dimstore").toString
    val path = s"$base/dim_user"
    DimStore.upsert(s, path,
      Seq((1L, "alice", 10L), (2L, "bob", 10L)).toDF("id", "name", "ver"),
      "id", "ver")
    DimStore.upsert(s, path,
      Seq((1L, "alice2", 20L), (3L, "carol", 20L)).toDF("id", "name", "ver"),
      "id", "ver")
    val rows = DimStore.read(s, path)
      .select("id", "name").as[(Long, String)].collect().sorted
    rows shouldBe Seq((1L, "alice2"), (2L, "bob"), (3L, "carol"))
  }

  test("DimStore recovers a table stranded at .__old by an interrupted swap") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("dimrecover").toString
    val path = s"$base/dim_x"
    DimStore.upsert(s, path,
      Seq((1L, "v1", 10L)).toDF("id", "v", "ver"), "id", "ver")
    // simulate a crash between the two renames: table lives only at .__old
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(path),
              new org.apache.hadoop.fs.Path(path + ".__old"))
    // read restores the backup transparently...
    DimStore.read(s, path).count() shouldBe 1
    // ...and a subsequent upsert merges against the recovered data
    DimStore.upsert(s, path,
      Seq((2L, "v2", 20L)).toDF("id", "v", "ver"), "id", "ver")
    DimStore.read(s, path).select("id").as[Long].collect().sorted shouldBe
      Seq(1L, 2L)
  }

  test("DimRouter routes per config, projects exact columns, upserts per pk") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("dimrouter").toString
    val config = Seq(
      TableProcess("user_info", "dim_user_info", "id,name", "id"),
      TableProcess("sku_info", "dim_sku_info", "id,price", "id"))
    val batch1 = Seq(
      ("user_info", 1L, "alice", 9.99, 100L),
      ("user_info", 2L, "bob", 0.0, 100L),
      ("sku_info", 7L, "widget", 3.50, 100L),
      ("unconfigured", 9L, "dropme", 1.0, 100L))
      .toDF("source_table", "id", "name", "price", "ver")
    DimRouter.routeBatch(batch1, config, base, "ver")
    val batch2 = Seq(("user_info", 1L, "alice-renamed", 9.99, 200L))
      .toDF("source_table", "id", "name", "price", "ver")
    DimRouter.routeBatch(batch2, config, base, "ver")

    val users = DimStore.read(s, s"$base/dim_user_info")
    users.columns.sorted shouldBe Array("id", "name", "ver")
    users.select("id", "name").as[(Long, String)].collect().sorted shouldBe
      Seq((1L, "alice-renamed"), (2L, "bob"))

    val skus = DimStore.read(s, s"$base/dim_sku_info")
    skus.columns.sorted shouldBe Array("id", "price", "ver")
    skus.select("id", "price").as[(Long, Double)].collect() shouldBe
      Array((7L, 3.50))

    // unconfigured source dropped entirely (reference drops missing-key
    // records, TableProcessFunction.java:118-121)
    new java.io.File(s"$base/dropme").exists() shouldBe false
    new java.io.File(base).listFiles().map(_.getName).sorted shouldBe
      Array("dim_sku_info", "dim_user_info")
  }

  test("K4 dynamic DDL: a new config row creates a catalog table; dims query by name") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("dimddl").toString
    val config = Seq(TableProcess("user_info", "dim_ddl_user", "id,name", "id"))
    val batch = Seq(("user_info", 1L, "alice", 100L))
      .toDF("source_table", "id", "name", "ver")
    DimRouter.routeBatch(batch, config, base, "ver", catalogDb = Some("graft_dim"))
    // table materialized in the catalog and queryable BY NAME
    s.catalog.tableExists("graft_dim.dim_ddl_user") shouldBe true
    s.table("graft_dim.dim_ddl_user").select("id", "name")
      .as[(Long, String)].collect() shouldBe Array((1L, "alice"))
    // a later upsert swaps the directory; the refresh keeps the catalog
    // view consistent
    DimRouter.routeBatch(
      Seq(("user_info", 1L, "alice2", 200L)).toDF("source_table", "id", "name", "ver"),
      config, base, "ver", catalogDb = Some("graft_dim"))
    s.sql("SELECT name FROM graft_dim.dim_ddl_user WHERE id = 1")
      .as[String].collect() shouldBe Array("alice2")
    // idempotent on replay (IF NOT EXISTS at both levels)
    noException should be thrownBy
      DimRouter.ensureTable(s, "graft_dim", config.head, base)
    // malicious config identifiers are rejected, not spliced into SQL
    an[IllegalArgumentException] should be thrownBy
      DimRouter.ensureTable(s, "graft_dim",
        TableProcess("x", "evil`; DROP TABLE t--", "id", "id"), base)
  }

  test("schema evolution: a batch with a new column upserts; old rows read back null") {
    val s = spark
    import s.implicits._
    val path = Files.createTempDirectory("dimevo").toString + "/dim_evo"
    DimStore.upsert(s, path,
      Seq((1L, "alice", 10L)).toDF("id", "name", "ver"), "id", "ver")
    // config adds an email sink column mid-stream
    DimStore.upsert(s, path,
      Seq((2L, "bob", "b@x.io", 20L)).toDF("id", "name", "email", "ver"),
      "id", "ver")
    val rows = DimStore.read(s, path).select("id", "name", "email")
      .as[(Long, String, Option[String])].collect().sortBy(_._1)
    rows shouldBe Seq((1L, "alice", None), (2L, "bob", Some("b@x.io")))
    // and the reverse: a batch MISSING a historical column still lands
    DimStore.upsert(s, path,
      Seq((3L, "carol", 30L)).toDF("id", "name", "ver"), "id", "ver")
    DimStore.read(s, path).count() shouldBe 3
  }

  /** Recursive (dir-relative name, length, CRC-ish content hash) for
    * every parquet data file under a table root. */
  private def fileSignatures(s: org.apache.spark.sql.SparkSession,
                             path: String): Map[String, (Long, Int)] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(root, true)
    val out = scala.collection.mutable.Map[String, (Long, Int)]()
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        val rel = f.getPath.toString.stripPrefix(root.toString)
        val in = fs.open(f.getPath)
        val bytes = new Array[Byte](f.getLen.toInt)
        in.readFully(0, bytes); in.close()
        out(rel) = (f.getLen, java.util.Arrays.hashCode(bytes))
      }
    }
    out.toMap
  }

  test("compact: many per-batch fragments rewrite to one file per bucket, data intact") {
    val s = spark
    import s.implicits._
    val path = Files.createTempDirectory("dimcompact").toString + "/dim_c"
    (1 to 8).foreach { i =>
      DimStore.upsert(s, path,
        Seq((i.toLong, s"u$i", i.toLong)).toDF("id", "name", "ver"),
        "id", "ver")
    }
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    def bucketDirs = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(_.getPath.getName.startsWith("__bucket="))
    val before = DimStore.read(s, path).as[(Long, String, Long)].collect().toSet
    val nBuckets = bucketDirs.length
    DimStore.compact(s, path) shouldBe nBuckets
    // layout survives compaction (upserts stay partition-pruned) and
    // every bucket is down to a single file
    bucketDirs.length shouldBe nBuckets
    bucketDirs.foreach { d =>
      fs.listStatus(d.getPath)
        .count(_.getPath.getName.endsWith(".parquet")) shouldBe 1
    }
    DimStore.read(s, path).as[(Long, String, Long)].collect().toSet shouldBe before
  }

  test("compact honors targetFileBytes WITHIN a bucket: an over-target " +
       "bucket splits across several files (the salt survives writeGen)") {
    val s = spark
    import s.implicits._
    val path = Files.createTempDirectory("dimsplit").toString + "/dim_s"
    // one bucket, ~200 KB of INCOMPRESSIBLE payload (seeded random per
    // row — a constant string would parquet-compress below any target
    // and never split) → a tiny file target must split it
    def payload(i: Long): String = {
      val r = new scala.util.Random(i)
      Array.fill(2000)((r.nextInt(94) + 33).toChar).mkString
    }
    DimStore.upsert(s, path,
      (1L to 100L).map(i => (i, payload(i), 1L)).toDF("id", "name", "ver"),
      "id", "ver", nBuckets = 1)
    DimStore.compact(s, path, targetFileBytes = 16L * 1024)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val bucketDir = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(_.getPath.getName.startsWith("__bucket=")).head.getPath
    fs.listStatus(bucketDir)
      .count(_.getPath.getName.endsWith(".parquet")) should be > 1
    DimStore.read(s, path).count() shouldBe 100
  }

  test("upsert rewrites only touched buckets; untouched buckets stay byte-identical") {
    val s = spark
    import s.implicits._
    val path = Files.createTempDirectory("dimprune").toString + "/dim_p"
    // spread 64 pks over the bucket space in one batch
    DimStore.upsert(s, path,
      (1L to 64L).map(i => (i, s"u$i", 10L)).toDF("id", "name", "ver"),
      "id", "ver")
    val sigBefore = fileSignatures(s, path)
    sigBefore.size should be > 4 // sanity: actually bucketed into many dirs

    // single-pk batch → exactly one bucket may change
    DimStore.upsert(s, path,
      Seq((1L, "u1-renamed", 20L)).toDF("id", "name", "ver"), "id", "ver")
    val sigAfter = fileSignatures(s, path)

    val changed = (sigBefore.keySet ++ sigAfter.keySet).filter { k =>
      sigBefore.get(k) != sigAfter.get(k)
    }
    val changedBuckets = changed.map(_.split('/').find(_.startsWith("__bucket=")).get)
    changedBuckets.size shouldBe 1
    // every untouched bucket's files are byte-identical (same names,
    // lengths, content hashes) — the O(touched) write-amplification
    // contract a Delta MERGE would give
    (sigBefore.keySet -- changed).foreach { k => sigAfter(k) shouldBe sigBefore(k) }
    // and the merge itself is correct
    DimStore.read(s, path).filter($"id" === 1L).select("name")
      .as[String].collect() shouldBe Array("u1-renamed")
    DimStore.read(s, path).count() shouldBe 64
  }

  test("scale probe: micro-batch merge into a 60k-row store touches only " +
       "the batch's buckets; the rest stay byte-identical") {
    val s = spark
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    val path = Files.createTempDirectory("dimscale").toString + "/dim_s"
    // the w18 bench probe's exact shape, verified at sf0.01 cardinality:
    // every pk-collapsed lineitem as a dim row, 256-way fan-out, then
    // a ~95-pk micro-batch (orderkeys ≤ 32 → pk ≤ 263)
    def li(v: Long) = graft.core.Tables
      .load(s, "/root/testdata/sf0.01", "lineitem")
      .select((col("l_orderkey") * 8 + col("l_linenumber")).cast("long")
          .as("pk"),
        col("l_quantity").cast("long").as("qty"))
      .groupBy(col("pk"))
      .agg(org.apache.spark.sql.functions.max(col("qty")).as("qty"))
      .withColumn("ver", lit(v))
    val nPks = li(1L).count()
    DimStore.upsert(s, path, li(1L), "pk", "ver", nBuckets = 256)
    val sigBefore = fileSignatures(s, path)
    val batch = li(2L).filter(col("pk") <= 263L)
    val nBatch = batch.count()
    nBatch should be > 10L
    val touched = batch
      .select(pmod(hash(col("pk")), lit(256)).as("b")).distinct().count()
    DimStore.upsert(s, path, batch, "pk", "ver")
    val sigAfter = fileSignatures(s, path)
    val changed = (sigBefore.keySet ++ sigAfter.keySet)
      .filter(k => sigBefore.get(k) != sigAfter.get(k))
    val changedBuckets =
      changed.map(_.split('/').find(_.startsWith("__bucket=")).get)
    // write amplification is the batch's bucket footprint — a small
    // fraction of the 256-bucket table — never O(table)
    changedBuckets.size.toLong should be <= touched
    touched should be < 128L
    (sigBefore.keySet -- changed).foreach(k => sigAfter(k) shouldBe sigBefore(k))
    // and the merge is exactly right at this scale
    DimStore.read(s, path).count() shouldBe nPks
    DimStore.read(s, path).filter(col("ver") === 2L).count() shouldBe nBatch
  }

  test("empty batch is a no-op: no schema-less table dir, later upserts unaffected") {
    val s = spark
    import s.implicits._
    val path = Files.createTempDirectory("dimempty").toString + "/dim_e"
    val empty = Seq.empty[(Long, String, Long)].toDF("id", "name", "ver")
    // an all-filtered first micro-batch must not create the table
    DimStore.upsert(s, path, empty, "id", "ver")
    new java.io.File(path).exists() shouldBe false
    // real data lands normally afterwards; a later empty batch changes nothing
    DimStore.upsert(s, path,
      Seq((1L, "alice", 10L)).toDF("id", "name", "ver"), "id", "ver")
    DimStore.upsert(s, path, empty, "id", "ver")
    DimStore.read(s, path).count() shouldBe 1
  }

  test("the creation fan-out wins over a later caller's nBuckets parameter") {
    val s = spark
    import s.implicits._
    val path = Files.createTempDirectory("dimfan").toString + "/dim_f"
    DimStore.upsert(s, path,
      (1L to 50L).map(i => (i, s"u$i", 10L)).toDF("id", "name", "ver"),
      "id", "ver", nBuckets = 64)
    // a config drift passes 8: the update must still land in the
    // 64-bucket slot where pk=1 lives, not a phantom 8-bucket slot
    DimStore.upsert(s, path,
      Seq((1L, "u1-new", 20L)).toDF("id", "name", "ver"),
      "id", "ver", nBuckets = 8)
    val rows = DimStore.read(s, path).filter($"id" === 1L)
      .select("name").as[String].collect()
    rows shouldBe Array("u1-new") // exactly one row, the LWW winner
    DimStore.read(s, path).count() shouldBe 50
  }

  test("model fuzz: random upsert sequences match a reference LWW map") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val path = Files.createTempDirectory("dimfuzz").toString + "/dim_z"
    // reference model: pk -> (name, ver); later batches win ties are
    // avoided by construction (strictly increasing versions per step),
    // so the model is unambiguous
    val model = scala.collection.mutable.Map[Long, (String, Long)]()
    (1 to 12).foreach { step =>
      val batch = (1 to (1 + rnd.nextInt(20))).map { _ =>
        val pk = rnd.nextInt(40).toLong
        (pk, s"v$step-$pk", step.toLong)
      }.distinct
      // within a batch one row per pk (dedup like a keyed CDC stream)
      val perPk = batch.groupBy(_._1).map(_._2.head).toSeq
      perPk.foreach { case (pk, n, v) =>
        val keep = model.get(pk).forall(_._2 <= v)
        if (keep) model(pk) = (n, v)
      }
      DimStore.upsert(s, path, perPk.toDF("id", "name", "ver"), "id", "ver")
    }
    val got = DimStore.read(s, path).select("id", "name", "ver")
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    got shouldBe model.toMap
  }

  test("per-bucket crash recovery: a bucket stranded at .__old is restored on read") {
    val s = spark
    import s.implicits._
    val path = Files.createTempDirectory("dimbrec").toString + "/dim_b"
    DimStore.upsert(s, path,
      (1L to 64L).map(i => (i, s"u$i", 10L)).toDF("id", "name", "ver"),
      "id", "ver")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val buckets = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath.getName).filter(_.startsWith("__bucket="))
    // simulate swapBuckets crashing between its two renames: one bucket
    // displaced to .__old/<bucket>, nothing written back yet
    val victim = buckets.head
    fs.mkdirs(new org.apache.hadoop.fs.Path(path + ".__old"))
    fs.rename(new org.apache.hadoop.fs.Path(s"$path/$victim"),
              new org.apache.hadoop.fs.Path(s"$path.__old/$victim")) shouldBe true
    // recover() (run by read) restores the bucket; no rows lost
    DimStore.read(s, path).count() shouldBe 64
    fs.exists(new org.apache.hadoop.fs.Path(s"$path/$victim")) shouldBe true
    fs.exists(new org.apache.hadoop.fs.Path(path + ".__old")) shouldBe false
  }
}
