package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.sources.TxLog

/** Transaction-log table format: snapshot isolation from log replay,
  * MERGE upsert semantics (CQL UPDATE parity — the reference upserts
  * by PK at will), and copy-on-write file skipping from the log's
  * key-range statistics. */
class TxLogSpec extends SparkSpecBase {
  import spark.implicits._

  test("create/read round-trips and history records the commit") {
    withTempDir("txlog") { dir =>
      val t = s"$dir/t"
      val df = (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v")
      TxLog.create(spark, t, df.repartition(4), Seq("k"))
      val back = TxLog.read(spark, t)
      back.count() shouldBe 100
      back.orderBy($"k").as[(Long, String)].collect() shouldBe
        (1L to 100L).map(i => (i, s"v$i"))
      TxLog.history(t) shouldBe Seq((0L, TxLog.files(t).size, 0, 100L))
    }
  }

  test("merge replaces matched keys, appends the rest (upsert parity)") {
    withTempDir("txlog") { dir =>
      val t = s"$dir/t"
      TxLog.create(spark, t,
        (1L to 50L).map(i => (i, s"old$i")).toDF("k", "v"), Seq("k"))
      // update keys 10..12, insert keys 101..103
      val up = Seq(10L -> "NEW10", 11L -> "NEW11", 12L -> "NEW12",
        101L -> "ins101", 102L -> "ins102", 103L -> "ins103").toDF("k", "v")
      TxLog.merge(spark, t, up, Seq("k"))
      val back = TxLog.read(spark, t).as[(Long, String)].collect().toMap
      back.size shouldBe 53
      back(10L) shouldBe "NEW10"
      back(12L) shouldBe "NEW12"
      back(13L) shouldBe "old13"
      back(101L) shouldBe "ins101"
      // re-merging the same updates is idempotent on content
      TxLog.merge(spark, t, up, Seq("k"))
      TxLog.read(spark, t).as[(Long, String)].collect().toMap shouldBe back
    }
  }

  test("string-key file skipping uses UTF-8 order (supplementary chars)") {
    withTempDir("txlog") { dir =>
      val t = s"$dir/t"
      // One file spanning [U+FFEE, U+10400]. Under UTF-8/code-point
      // order (what Spark's min/max computed the stats in) the update
      // key U+FFEE is INSIDE the range; under Java's UTF-16 code-unit
      // order the U+10400 max (surrogate 0xD801...) compares BELOW it,
      // so a String.compareTo-based pruner would skip the file, append
      // instead of rewrite, and leave two live rows for one key.
      val hi = new String(Character.toChars(0x10400)) + "x"
      val k = "\uffee" + "x"
      val df = Seq((k, "old"), (hi, "keep")).toDF("k", "v").coalesce(1)
      TxLog.create(spark, t, df, Seq("k"))
      TxLog.files(t).size shouldBe 1
      TxLog.merge(spark, t, Seq((k, "NEW")).toDF("k", "v"), Seq("k"))
      val back = TxLog.read(spark, t).as[(String, String)].collect().toMap
      back.size shouldBe 2 // one live row per key — no silent duplicate
      back(k) shouldBe "NEW"
      back(hi) shouldBe "keep"
    }
  }

  test("copy-on-write skips files disjoint from the update key range") {
    withTempDir("txlog") { dir =>
      val t = s"$dir/t"
      // range-clustered files: each of the 5 files owns a key range,
      // so the log statistics can prove 4 of them disjoint
      val df = (1L to 500L).map(i => (i, i * 2)).toDF("k", "v")
        .repartitionByRange(5, $"k").sortWithinPartitions($"k")
      TxLog.create(spark, t, df, Seq("k"))
      val before = TxLog.files(t).map(_.path).toSet
      before.size shouldBe 5
      // a point update inside one file's range
      TxLog.merge(spark, t, Seq(42L -> 9999L).toDF("k", "v"), Seq("k"))
      val after = TxLog.files(t).map(_.path).toSet
      // exactly one original file was rewritten; the other four survive
      (before -- after).size shouldBe 1
      (before & after).size shouldBe 4
      val back = TxLog.read(spark, t).as[(Long, Long)].collect().toMap
      back.size shouldBe 500
      back(42L) shouldBe 9999L
      back(41L) shouldBe 82L
    }
  }

  test("snapshot reads replay the log across sessions and reject dup-key updates") {
    withTempDir("txlog") { dir =>
      val t = s"$dir/t"
      TxLog.create(spark, t, Seq(1L -> "a", 2L -> "b").toDF("k", "v"), Seq("k"))
      TxLog.merge(spark, t, Seq(2L -> "B", 3L -> "c").toDF("k", "v"), Seq("k"))
      TxLog.append(spark, t, Seq(10L -> "x").toDF("k", "v"), Seq("k"))
      // "restart": a reader that only sees the filesystem state
      TxLog.read(spark, t).as[(Long, String)].collect().toMap shouldBe
        Map(1L -> "a", 2L -> "B", 3L -> "c", 10L -> "x")
      TxLog.history(t).map(_._1) shouldBe Seq(0L, 1L, 2L)
      // duplicate keys in one update batch must fail loudly, not
      // nondeterministically pick a winner
      an[IllegalArgumentException] should be thrownBy
        TxLog.merge(spark, t,
          Seq(5L -> "x", 5L -> "y").toDF("k", "v"), Seq("k"))
    }
  }

  test("analysis-history parity: upsert SensorMeta by (name, ts) at will (S8)") {
    withTempDir("txlog") { dir =>
      val t = s"$dir/analysis"
      // the reference's HistoryWriter re-upserts the same (sensor, ts)
      // snapshot row when an analyzer recomputes — last write wins
      val v1 = Seq(("s1", 1000L, 0.2), ("s2", 1000L, 0.4)).toDF("name", "ts", "avg")
      TxLog.create(spark, t, v1, Seq("name", "ts"))
      val recompute = Seq(("s1", 1000L, 0.7), ("s1", 2000L, 0.3))
        .toDF("name", "ts", "avg")
      TxLog.merge(spark, t, recompute, Seq("name", "ts"))
      val back = TxLog.read(spark, t).as[(String, Long, Double)].collect().toSet
      back shouldBe Set(("s1", 1000L, 0.7), ("s2", 1000L, 0.4), ("s1", 2000L, 0.3))
    }
  }

  test("time travel reads any committed version; compaction is content-neutral") {
    withTempDir("txlog") { dir =>
      val t = s"$dir/t"
      TxLog.create(spark, t, Seq(1L -> "a", 2L -> "b").toDF("k", "v"), Seq("k"))
      TxLog.merge(spark, t, Seq(2L -> "B", 3L -> "c").toDF("k", "v"), Seq("k"))
      TxLog.merge(spark, t, Seq(1L -> "A").toDF("k", "v"), Seq("k"))
      // each version is a consistent snapshot
      TxLog.readVersion(spark, t, 0L).as[(Long, String)].collect().toMap shouldBe
        Map(1L -> "a", 2L -> "b")
      TxLog.readVersion(spark, t, 1L).as[(Long, String)].collect().toMap shouldBe
        Map(1L -> "a", 2L -> "B", 3L -> "c")
      TxLog.readVersion(spark, t, 2L).as[(Long, String)].collect().toMap shouldBe
        Map(1L -> "A", 2L -> "B", 3L -> "c")
      an[IllegalArgumentException] should be thrownBy
        TxLog.readVersion(spark, t, 9L)
      // fragmented by the merges → compact to one file, same content
      val before = TxLog.read(spark, t).as[(Long, String)].collect().toMap
      TxLog.files(t).size should be > 1
      TxLog.compact(spark, t, Seq("k"), targetFiles = 1)
      TxLog.files(t).size shouldBe 1
      TxLog.read(spark, t).as[(Long, String)].collect().toMap shouldBe before
      // compaction is itself a version — the pre-compaction snapshot
      // still time-travels
      TxLog.readVersion(spark, t, 2L).as[(Long, String)].collect().toMap shouldBe before
      // and the compacted file's skip stats cover the full key range
      val f = TxLog.files(t).head
      f.minKey shouldBe "1"
      f.maxKey shouldBe "3"
    }
  }

  test("string and timestamp key statistics prune correctly") {
    withTempDir("txlog") { dir =>
      val t = s"$dir/t"
      val df = ('a' to 'z').map(c => (c.toString * 3, c.toInt.toLong)).toDF("k", "v")
        .repartitionByRange(4, $"k").sortWithinPartitions($"k")
      TxLog.create(spark, t, df, Seq("k"))
      val before = TxLog.files(t).map(_.path).toSet
      TxLog.merge(spark, t, Seq(("mmm", 999L)).toDF("k", "v"), Seq("k"))
      val after = TxLog.files(t).map(_.path).toSet
      (before -- after).size shouldBe 1 // only the m-range file rewrote
      TxLog.read(spark, t).as[(String, Long)].collect().toMap.apply("mmm") shouldBe 999L
    }
  }

  test("two concurrent merges both land via optimistic retry (Consumer + HistoryWriter topology)") {
    withTempDir("txlog") { dir =>
      val t = s"$dir/t"
      TxLog.create(spark, t,
        (1L to 40L).map(i => (i, s"old$i")).toDF("k", "v"), Seq("k"))
      // Barrier-synchronized writers: both replay the log at version 0,
      // both target version 1 — exactly one link wins, the other MUST
      // take the conflict→recompute→retry path. Writer A updates keys
      // 1..5 and inserts 101..105; writer B updates 6..10 / inserts
      // 201..205 (disjoint keys, so the serialized result is unique and
      // order-independent).
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      def writer(lo: Long, ins: Long): Thread = {
        val up = ((lo to lo + 4).map(i => (i, s"NEW$i")) ++
          (ins to ins + 4).map(i => (i, s"ins$i"))).toDF("k", "v")
        val th = new Thread(() => {
          try { barrier.await(); TxLog.merge(spark, t, up, Seq("k")) }
          catch { case e: Throwable => errs.add(e) }
        })
        th.start(); th
      }
      val (a, b) = (writer(1L, 101L), writer(6L, 201L))
      a.join(120000); b.join(120000)
      errs.asScala.toSeq shouldBe empty
      // both commits landed as distinct versions
      TxLog.history(t).map(_._1) shouldBe Seq(0L, 1L, 2L)
      // and the snapshot is the unique serialized result of both merges
      val back = TxLog.read(spark, t).as[(Long, String)].collect().toMap
      back.size shouldBe 50
      (1L to 10L).foreach(i => back(i) shouldBe s"NEW$i")
      (11L to 40L).foreach(i => back(i) shouldBe s"old$i")
      (101L to 105L).foreach(i => back(i) shouldBe s"ins$i")
      (201L to 205L).foreach(i => back(i) shouldBe s"ins$i")
    }
  }

  test("two concurrent upserts racing to CREATE: loser re-routes to merge") {
    withTempDir("txlog") { dir =>
      val t = s"$dir/t"
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      def writer(rows: Seq[(Long, String)]): Thread = {
        val df = rows.toDF("k", "v")
        val th = new Thread(() => {
          try { barrier.await(); TxLog.upsert(spark, t, df, Seq("k")) }
          catch { case e: Throwable => errs.add(e) }
        })
        th.start(); th
      }
      val a = writer(Seq(1L -> "a", 2L -> "shared"))
      val b = writer(Seq(2L -> "shared", 3L -> "c"))
      a.join(120000); b.join(120000)
      errs.asScala.toSeq shouldBe empty
      val back = TxLog.read(spark, t).as[(Long, String)].collect().toMap
      back.keySet shouldBe Set(1L, 2L, 3L)
      back(1L) shouldBe "a"
      back(2L) shouldBe "shared" // both wrote the same value — any order wins
      back(3L) shouldBe "c"
    }
  }

  test("replay anomalies: creation-in-progress is retryable; a persistent gap fails loudly") {
    withTempDir("txlog") { dir =>
      // _txlog exists but no version 0 yet — the mid-create window.
      // Un-retried readers surface the typed conflict; a retried merge
      // keeps waiting for the creator and gives up loudly if none lands.
      val t = s"$dir/t"
      Files.createDirectories(Paths.get(t, "_txlog"))
      a[TxLog.CommitConflictException] should be thrownBy TxLog.read(spark, t)
      val e = the[IllegalStateException] thrownBy
        TxLog.merge(spark, t, Seq(1L -> "a").toDF("k", "v"), Seq("k"))
      e.getCause shouldBe a[TxLog.CommitConflictException]
      // a version gap that persists across re-listings is corruption,
      // not a race — loud failure, never a silent partial snapshot
      val t2 = s"$dir/t2"
      TxLog.create(spark, t2, Seq(1L -> "a").toDF("k", "v"), Seq("k"))
      Files.copy(Paths.get(t2, "_txlog", "00000000.json"),
        Paths.get(t2, "_txlog", "00000002.json"))
      an[IllegalStateException] should be thrownBy TxLog.read(spark, t2)
    }
  }

  test("vacuum reclaims aged orphan dirs from lost commit races; live and fresh stay") {
    withTempDir("txlog") { dir =>
      val t = s"$dir/t"
      TxLog.create(spark, t,
        (1L to 40L).map(i => (i, s"old$i")).toDF("k", "v"), Seq("k"))
      def dataDirs: Set[String] = {
        val s = Files.list(Paths.get(t))
        try s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("data-")).toSet
        finally s.close()
      }
      // Barrier-race writer pairs until some loser's first attempt has
      // left an orphan (its data files land BEFORE the version-claim
      // link fails; the retry writes fresh ones). One commit = one data
      // dir here, so orphans = dirs − commits. Usually round 1 races;
      // bounded so a scheduler that serializes the pair can't hang us.
      var round = 0
      while (dataDirs.size == TxLog.history(t).size && round < 10) {
        round += 1
        val barrier = new java.util.concurrent.CyclicBarrier(2)
        val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
        def writer(lo: Long): Thread = {
          val up = (lo to lo + 4).map(i => (i, s"r$round-$i")).toDF("k", "v")
          val th = new Thread(() => {
            try { barrier.await(); TxLog.merge(spark, t, up, Seq("k")) }
            catch { case e: Throwable => errs.add(e) }
          })
          th.start(); th
        }
        val (a, b) = (writer(1L), writer(21L))
        a.join(120000); b.join(120000)
        errs.asScala.toSeq shouldBe empty
      }
      val commits = TxLog.history(t).size
      val orphans = dataDirs.size - commits
      orphans should be >= 1
      val snapshot = TxLog.read(spark, t).as[(Long, String)].collect().toMap
      // FRESH orphans are protected by the in-flight horizon: a writer
      // between write-data and link-commit must not have its files stolen
      TxLog.vacuum(t, retainVersion = 0L) shouldBe empty
      (dataDirs.size - commits) shouldBe orphans
      // aged past the horizon they reclaim — and ONLY they
      val deleted = TxLog.vacuum(t, 0L, orphanOlderThanMs = -60000L)
      deleted.size shouldBe orphans
      dataDirs.size shouldBe commits
      TxLog.read(spark, t).as[(Long, String)].collect().toMap shouldBe snapshot
      // idempotent and honest on repeat
      TxLog.vacuum(t, 0L, orphanOlderThanMs = -60000L) shouldBe empty
    }
  }

  test("vacuum deletes only below-horizon superseded files; window still reads") {
    withTempDir("txlog") { dir =>
      val t = s"$dir/t"
      TxLog.create(spark, t, Seq(1L -> "a", 2L -> "b").toDF("k", "v"), Seq("k")) // v0
      TxLog.merge(spark, t, Seq(2L -> "B").toDF("k", "v"), Seq("k"))            // v1
      TxLog.merge(spark, t, Seq(1L -> "A").toDF("k", "v"), Seq("k"))            // v2
      // horizon v1: v0→v1's superseded files go; v1→v2's survive, so
      // every version IN the retention window (1, 2) still reads
      val deleted = TxLog.vacuum(t, retainVersion = 1L)
      deleted should not be empty
      deleted.foreach(rel => Files.exists(Paths.get(t, rel)) shouldBe false)
      TxLog.readVersion(spark, t, 1L).as[(Long, String)].collect().toMap shouldBe
        Map(1L -> "a", 2L -> "B")
      TxLog.readVersion(spark, t, 2L).as[(Long, String)].collect().toMap shouldBe
        Map(1L -> "A", 2L -> "B")
      // below-horizon time travel is the capability traded away
      an[Exception] should be thrownBy
        TxLog.readVersion(spark, t, 0L).collect()
      // history metadata survives the physical deletion
      TxLog.history(t).map(_._1) shouldBe Seq(0L, 1L, 2L)
      // idempotent AND honest: a second vacuum at the same horizon
      // deletes nothing and REPORTS nothing (no double-counted audit)
      TxLog.vacuum(t, 1L) shouldBe empty
      TxLog.read(spark, t).as[(Long, String)].collect().toMap shouldBe
        Map(1L -> "A", 2L -> "B")
    }
  }
}
