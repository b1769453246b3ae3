package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.{DimStore, Staging}

/** ops/Staging — the materialized-intermediate layer the dedup
  * composition queries (x36/x43/x65) and w18's merge probe stand on.
  * Contracts: build-once per dataset VERSION (fingerprinted, so a
  * regenerated source at the same path re-stages), atomic publication
  * (a published dir always carries the completeness marker), debris
  * recovery, and hardlink clones that never write through to the
  * staged original. */
class StagingSpec extends AnyFunSuite with Matchers with SparkFixture {

  /** An isolated dataset dir with one tiny parquet "table". */
  private def freshDataset(rows: Seq[(Long, String)]): String = {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("staging_ds").toString
    rows.toDF("id", "v").coalesce(1).write
      .mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("ensure builds exactly once per dataset; second call is a pure read") {
    val s = spark
    import s.implicits._
    val dir = freshDataset(Seq((1L, "a"), (2L, "b")))
    var builds = 0
    def stage() = Staging.ensure("t_once", dir, Seq("documents")) {
      builds += 1
      s.read.parquet(s"$dir/documents.parquet")
    }
    val p1 = stage()
    val p2 = stage()
    builds shouldBe 1
    p2 shouldBe p1
    s.read.parquet(p1).count() shouldBe 2
    Files.exists(Paths.get(p1, "_GRAFT_STAGED")) shouldBe true
  }

  test("a regenerated source (same path, new content) gets a NEW stage") {
    val s = spark
    import s.implicits._
    val dir = freshDataset(Seq((1L, "a")))
    def stage() = Staging.ensure("t_fp", dir, Seq("documents")) {
      s.read.parquet(s"$dir/documents.parquet")
    }
    val p1 = stage()
    // regenerate with different content (different file length) — the
    // metadata fingerprint must change, or stale labels would serve
    Seq((1L, "a"), (2L, "bbbbbbbb"), (3L, "c")).toDF("id", "v")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val p2 = stage()
    p2 should not be p1
    s.read.parquet(p2).count() shouldBe 3
    // the predecessor is unreachable (every lookup keys on the new
    // fingerprint) but retires through a GRACE WINDOW: stamped in
    // place, files intact — a reader that resolved p1 before the
    // republish keeps scanning safely
    Files.exists(Paths.get(p1, "_RETIRED")) shouldBe true
    s.read.parquet(p1).count() shouldBe 1
    // once the stamp ages past the window, the next ensure sweeps it
    Files.setLastModifiedTime(Paths.get(p1, "_RETIRED"),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - Staging.GraceMillis - 60000))
    stage() shouldBe p2
    Files.exists(Paths.get(p1)) shouldBe false
  }

  test("retirement is scoped to the dataset: other datasets' same-named " +
       "stages survive a regeneration") {
    val s = spark
    import s.implicits._
    val dirA = freshDataset(Seq((1L, "a")))
    val dirB = freshDataset(Seq((1L, "b"), (2L, "bb")))
    def stage(dir: String) = Staging.ensure("t_iso", dir, Seq("documents")) {
      s.read.parquet(s"$dir/documents.parquet")
    }
    val pA = stage(dirA)
    val pB = stage(dirB)
    pA should not be pB
    // regenerate A only: A's predecessor retires, B's live stage stays
    Seq((1L, "a"), (9L, "zzz")).toDF("id", "v").coalesce(1).write
      .mode("overwrite").parquet(s"$dirA/documents.parquet")
    val pA2 = stage(dirA)
    pA2 should not be pA
    // A's predecessor is stamped for retirement; B's live stage is not
    Files.exists(Paths.get(pA, "_RETIRED")) shouldBe true
    Files.exists(Paths.get(pB, "_RETIRED")) shouldBe false
    Files.exists(Paths.get(pB, "_GRAFT_STAGED")) shouldBe true
    s.read.parquet(pB).count() shouldBe 2
    // age A's stamp out: only A's predecessor is swept
    Files.setLastModifiedTime(Paths.get(pA, "_RETIRED"),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - Staging.GraceMillis - 60000))
    stage(dirA) shouldBe pA2
    Files.exists(Paths.get(pA)) shouldBe false
    Files.exists(Paths.get(pB, "_GRAFT_STAGED")) shouldBe true
  }

  test("marker-less debris at the stage path is cleared and rebuilt") {
    val s = spark
    import s.implicits._
    val dir = freshDataset(Seq((1L, "a")))
    // discover the key by staging once, then fake a crashed publish:
    // same path, no marker
    val p1 = Staging.ensure("t_debris", dir, Seq("documents")) {
      s.read.parquet(s"$dir/documents.parquet")
    }
    Files.walk(Paths.get(p1)).sorted(java.util.Comparator.reverseOrder())
      .forEach(f => Files.deleteIfExists(f))
    Files.createDirectories(Paths.get(p1, "half-written"))
    val p2 = Staging.ensure("t_debris", dir, Seq("documents")) {
      s.read.parquet(s"$dir/documents.parquet")
    }
    p2 shouldBe p1
    Files.exists(Paths.get(p2, "_GRAFT_STAGED")) shouldBe true
    Files.exists(Paths.get(p2, "half-written")) shouldBe false
    s.read.parquet(p2).count() shouldBe 1
  }

  test("linkClone: mutating the clone never writes through to the stage") {
    val s = spark
    import s.implicits._
    val dir = freshDataset(Seq((1L, "a")))
    val staged = Staging.ensurePath("t_clone", dir, Seq("documents")) { p =>
      DimStore.upsert(s, p.toString,
        (1L to 20L).map(i => (i, s"v$i", 1L)).toDF("id", "v", "ver"),
        "id", "ver", nBuckets = 8)
    }
    val before = s.read.parquet(s"$staged/__bucket=*").count()
    val work = Files.createTempDirectory("staging_clone")
    Staging.linkClone(staged, work.resolve("dim"))
    val clone = work.resolve("dim").toString
    DimStore.upsert(s, clone,
      Seq((1L, "MUTATED", 2L)).toDF("id", "v", "ver"), "id", "ver")
    // clone sees the update; the staged original is untouched
    DimStore.read(s, clone).filter($"id" === 1L)
      .select("v").as[String].collect() shouldBe Array("MUTATED")
    DimStore.read(s, staged).filter($"id" === 1L)
      .select("v").as[String].collect() shouldBe Array("v1")
    s.read.parquet(s"$staged/__bucket=*").count() shouldBe before
  }
}
