package graft

import org.apache.spark.storage.StorageLevel

import graft.core.PersistedMemo

/** Lifecycle of the shared persisted-intermediate registry (round-2
  * advisory: memoized tables were pinned for the JVM lifetime). */
class MemoSpec extends SparkSpecBase {

  // NOT a shared testdata dir: release(spark, dir) drops EVERY entry for
  // the (session, dir) pair, and the session is shared across suites —
  // releasing sf0.001 here would also evict (and mis-count) intermediates
  // other suites memoized for it, making the size assertions order-dependent
  private val dir = "/tmp/memospec-own"

  test("release(dir) unpersists and drops that dataset's entries") {
    val before = PersistedMemo.size
    val df = PersistedMemo.getOrBuild(spark, dir, "memospec:a")(
      spark.range(100).toDF("id"))
    df.count()
    df.storageLevel should not be StorageLevel.NONE
    PersistedMemo.size shouldBe before + 1

    // a second getOrBuild returns the SAME cached frame, no rebuild
    val again = PersistedMemo.getOrBuild(spark, dir, "memospec:a")(
      fail("memo must not rebuild a live entry"))
    (again eq df) shouldBe true

    PersistedMemo.release(spark, dir)
    df.storageLevel shouldBe StorageLevel.NONE
    PersistedMemo.size shouldBe before
  }

  test("release is scoped to the dataset dir") {
    // distinct plans: Spark's cache manager dedupes plan-identical
    // frames, so unpersisting one would clear a same-plan twin too
    val a = PersistedMemo.getOrBuild(spark, "/tmp/memospec-a", "k")(
      spark.range(10).toDF("id"))
    val b = PersistedMemo.getOrBuild(spark, "/tmp/memospec-b", "k")(
      spark.range(20).toDF("id"))
    a.count(); b.count()
    PersistedMemo.release(spark, "/tmp/memospec-a")
    a.storageLevel shouldBe StorageLevel.NONE
    b.storageLevel should not be StorageLevel.NONE
    PersistedMemo.release(spark, "/tmp/memospec-b")
    b.storageLevel shouldBe StorageLevel.NONE
  }

  test("getOrBuildStage: leaf plan, identical values, release semantics") {
    import spark.implicits._
    val sdir = "/tmp/memospec-stage"
    val build = spark.range(1000).toDF("id")
      .groupBy(($"id" % 7).as("k")).count()
    val staged = PersistedMemo.getOrBuildStage(spark, sdir, "memospec:stage")(build)
    // values: the checkpoint is a pass-through
    staged.orderBy($"k").collect().map(r => (r.getLong(0), r.getLong(1))) shouldBe
      build.orderBy($"k").collect().map(r => (r.getLong(0), r.getLong(1)))
    // THE point of the API: the logical plan is a leaf (no aggregate
    // lineage for the analyzer/AQE to re-chew per reference)
    staged.queryExecution.optimizedPlan.collectLeaves() should have size 1
    (staged.queryExecution.optimizedPlan.toString should not).include("Aggregate")
    // memoized like any entry: second call returns the same frame
    val again = PersistedMemo.getOrBuildStage(spark, sdir, "memospec:stage")(
      fail("stage memo must not rebuild a live entry"))
    (again eq staged) shouldBe true
    // and release drops it like any entry
    PersistedMemo.release(spark, sdir)
    staged.storageLevel shouldBe StorageLevel.NONE
  }

  test("nested builds (candidates <- signatures pattern) are safe") {
    // a build that re-enters the memo: the reentrant build lock makes
    // this safe where nested ConcurrentHashMap.computeIfAbsent threw
    // "Recursive update" intermittently (round-2 lesson)
    val outer = PersistedMemo.getOrBuild(spark, "/tmp/memospec-n", "outer") {
      val inner = PersistedMemo.getOrBuild(spark, "/tmp/memospec-n", "inner")(
        spark.range(5).toDF("id"))
      inner.selectExpr("id * 2 AS id")
    }
    outer.count() shouldBe 5
    PersistedMemo.release(spark, "/tmp/memospec-n")
  }

  test("LRU eviction of a staged entry defers file deletion to release") {
    // round-6 advisory: eviction used to delete the staged leaf's
    // checkpoint files — but unlike unpersist (lineage recomputes), a
    // leaf's files are its only source, so a still-held frame died
    // permanently. Eviction must drop the SLOT, not the FILES; the
    // files go at the explicit end-of-dataset boundary (release).
    val d = "/tmp/memospec-stagelru"
    val cap = PersistedMemo.MaxEntriesPerDataset
    val staged = PersistedMemo.getOrBuildStage(spark, d, "s0")(
      spark.range(50).toDF("id"))
    val ckpt = staged.queryExecution.logical.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.flatMap(_.getCheckpointFile)
    ckpt.isDefined shouldBe true
    val path = new org.apache.hadoop.fs.Path(ckpt.get)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(path) shouldBe true
    // overflow the cap so s0 is LRU-evicted
    (1 to cap).foreach(i =>
      PersistedMemo.getOrBuild(spark, d, s"k$i")(spark.range(10).toDF("id")))
    var rebuilt = false
    PersistedMemo.getOrBuildStage(spark, d, "s0") {
      rebuilt = true; spark.range(50).toDF("id")
    }
    rebuilt shouldBe true // the slot was evicted...
    fs.exists(path) shouldBe true // ...but the files survived, so
    staged.count() shouldBe 50 // the held frame still reads
    PersistedMemo.release(spark, d) // end-of-dataset reclaims deferred files
    fs.exists(path) shouldBe false
  }

  test("deferred files of an unreachable evicted frame are swept without release") {
    // round-7 advisory: deferral alone was unbounded — a session cycling
    // staged keys without ever calling release accumulated rdd-* dirs
    // forever. Now each deferred entry is WeakReference-gated: once no
    // caller can run the evicted frame again, the next locked build
    // sweeps its files; while a caller still holds it (previous test),
    // the files stay, because deleting them would corrupt a live frame.
    val d = "/tmp/memospec-defersweep"
    val cap = PersistedMemo.MaxEntriesPerDataset
    // build in a SEPARATE method frame: a local slot in this test's own
    // frame can stay GC-reachable until the method returns, which would
    // pin the weak ref for the whole test
    def stageAndDrop(): Option[String] = {
      val staged = PersistedMemo.getOrBuildStage(spark, d, "s0")(
        spark.range(40).toDF("id"))
      staged.queryExecution.logical.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.flatMap(_.getCheckpointFile)
    }
    val ckpt = stageAndDrop()
    ckpt.isDefined shouldBe true
    val path = new org.apache.hadoop.fs.Path(ckpt.get)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(path) shouldBe true
    // overflow the cap so s0 is LRU-evicted (defers its files)
    (1 to cap).foreach(i =>
      PersistedMemo.getOrBuild(spark, d, s"dk$i")(spark.range(10).toDF("id")))
    // GC clears the weak ref; a subsequent locked build runs the sweep
    var swept = false
    var tries = 0
    while (!swept && tries < 20) {
      System.gc()
      Thread.sleep(50)
      PersistedMemo.getOrBuild(spark, d, s"sweep$tries")(spark.range(5).toDF("id"))
      swept = !fs.exists(path)
      tries += 1
    }
    swept shouldBe true // files reclaimed with NO release() call
    PersistedMemo.release(spark, d)
  }

  test("a derived frame alone keeps an evicted staged entry's files alive") {
    // round-8 advisory: the deferred sweep used to weak-reference the
    // Dataset WRAPPER — but a caller holding only a DERIVED frame
    // (staged.filter(...)) references the checkpointed RDD through its
    // plan, not the wrapper, so the wrapper could be collected and the
    // sweep would delete the files under the still-runnable derived
    // plan. The referent is now the checkpointed RDD itself, which any
    // derived plan strongly holds.
    val d = "/tmp/memospec-derivedpin"
    val cap = PersistedMemo.MaxEntriesPerDataset
    def stageDerived(): (org.apache.spark.sql.DataFrame, Option[String]) = {
      val staged = PersistedMemo.getOrBuildStage(spark, d, "s0")(
        spark.range(30).toDF("id"))
      val ckpt = staged.queryExecution.logical.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.flatMap(_.getCheckpointFile)
      // only the DERIVED frame escapes this method frame; the wrapper
      // `staged` becomes unreachable when it returns
      (staged.filter("id >= 10").selectExpr("id + 1 AS id2"), ckpt)
    }
    val (derived, ckpt) = stageDerived()
    ckpt.isDefined shouldBe true
    val path = new org.apache.hadoop.fs.Path(ckpt.get)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // overflow the cap so s0 is LRU-evicted (defers its files)
    (1 to cap).foreach(i =>
      PersistedMemo.getOrBuild(spark, d, s"pk$i")(spark.range(10).toDF("id")))
    // push GC + sweeps hard: with the wrapper collected, only the
    // RDD-keyed weak ref keeps the files from being deleted here
    (1 to 10).foreach { i =>
      System.gc(); Thread.sleep(20)
      PersistedMemo.getOrBuild(spark, d, s"psweep$i")(spark.range(5).toDF("id"))
    }
    fs.exists(path) shouldBe true // files survived every sweep...
    derived.count() shouldBe 20 // ...and the derived plan still runs
    PersistedMemo.release(spark, d)
    fs.exists(path) shouldBe false
  }

  test("release reclaims only positively-owned checkpoint files") {
    // round-6 advisory: attribution by before/after directory diff also
    // claimed checkpoints written concurrently by USER code during the
    // build — and destroyed them on release. Attribution is positive
    // now (the staged leaf's own RDD names its file); a user checkpoint
    // written mid-build must survive the dataset's release.
    val d = "/tmp/memospec-attr"
    var outside: org.apache.spark.sql.DataFrame = null
    PersistedMemo.getOrBuildStage(spark, d, "s") {
      outside = spark.range(25).toDF("id").checkpoint()
      spark.range(9).toDF("id")
    }.count() shouldBe 9
    PersistedMemo.release(spark, d)
    outside.count() shouldBe 25 // the unrelated checkpoint was not deleted
  }

  test("the per-dataset working set is LRU-bounded (parameterized facade calls)") {
    val d = "/tmp/memospec-lru"
    val cap = PersistedMemo.MaxEntriesPerDataset
    val first = PersistedMemo.getOrBuild(spark, d, "k0")(spark.range(10).toDF("id"))
    (1 until cap).foreach(i =>
      PersistedMemo.getOrBuild(spark, d, s"k$i")(spark.range(10).toDF("id")))
    // touch k0 so it is the MOST recently used when the cap overflows
    PersistedMemo.getOrBuild(spark, d, "k0")(fail("k0 must still be cached"))
    PersistedMemo.getOrBuild(spark, d, "overflow")(spark.range(10).toDF("id"))
    // k1 (least recently used) was evicted, k0 survived
    var rebuiltK1 = false
    PersistedMemo.getOrBuild(spark, d, "k1") {
      rebuiltK1 = true; spark.range(10).toDF("id")
    }
    rebuiltK1 shouldBe true
    val k0Again = PersistedMemo.getOrBuild(spark, d, "k0")(
      fail("k0 was recently used and must not be evicted"))
    (k0Again eq first) shouldBe true
    PersistedMemo.release(spark, d)
  }
}
