package graft.core

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped registry of persisted shared intermediates (the
  * signature / candidate / normalized-embedding tables the dedup and
  * similarity chains materialize once per (session, dataset) — the
  * in-session analog of the tables a production pipeline persists
  * between stages).
  *
  * Lifecycle (round-2 advisory): entries used to live for the JVM —
  * fine for one-shot Bench/Verify, a leak in a long-lived serving
  * session that cycles datasets or sessions. Now:
  *  - [[release]] unpersists and drops everything for one (session, dir)
  *    — "this dataset is done";
  *  - [[clearAll]] does the same for every entry — Bench/Verify teardown;
  *  - a per-session listener evicts the session's entries on
  *    application end, so a stopped-and-rebuilt session cannot pin dead
  *    persisted frames through the identity-keyed map.
  *
  * Builds run under one reentrant lock rather than
  * `ConcurrentHashMap.computeIfAbsent`: a memoized build that consumes
  * another memoized table (candidates ← signatures) re-enters the map,
  * and nested `computeIfAbsent` on one map throws "Recursive update"
  * whenever the keys share a hash bin — intermittently, since the bin
  * depends on the session's identity hash. A monitor is reentrant, so
  * nested builds are safe by construction; serializing rare multi-second
  * builds is a non-cost next to that failure mode.
  */
object PersistedMemo {

  private val memo = new ConcurrentHashMap[(SparkSession, String, String), DataFrame]()
  private val hooked = ConcurrentHashMap.newKeySet[SparkSession]()
  private val buildLock = new Object
  // LRU bookkeeping: parameterized facade entry points (bm25 per term
  // set, band calibrations) mint one memo entry per parameterization,
  // so an interactive session issuing many distinct searches would
  // accumulate persisted frames without bound. Recency is tracked per
  // key (monotonic counter, touched on every hit) and the
  // least-recently-used entry is evicted once a session×dir exceeds
  // [[MaxEntriesPerDataset]]. The cap protects INTERACTIVE sessions
  // minting per-parameterization entries, not the catalog: the full
  // 221-query bench session holds 32 entries totalling ~180 MB at
  // sf0.1 (per-entry byte report on every Bench run), so the cap sits
  // 2× above the catalog's measured working set — churn-free for the
  // bench, still bounded for a pathological facade loop.
  private[graft] val MaxEntriesPerDataset = 64
  private val tick = new java.util.concurrent.atomic.AtomicLong()
  private val lastUsed = new ConcurrentHashMap[(SparkSession, String, String), Long]()

  def getOrBuild(spark: SparkSession, dir: String, key: String)(
      build: => DataFrame): DataFrame = {
    val k = (spark, dir, key)
    val hit = memo.get(k)
    if (hit != null) { lastUsed.put(k, tick.incrementAndGet()); hit }
    else {
      // (frame, closure seconds if THIS call built it)
      val (df, builtSec) = buildLock.synchronized {
        val again = memo.get(k)
        if (again != null) { lastUsed.put(k, tick.incrementAndGet()); (again, None) }
        else {
          if (hooked.add(spark)) {
            spark.sparkContext.addSparkListener(new SparkListener {
              override def onApplicationEnd(end: SparkListenerApplicationEnd): Unit =
                evictSession(spark)
            })
          }
          val t0 = System.nanoTime()
          buildDepth.set(buildDepth.get + 1)
          val built =
            try build.persist()
            finally buildDepth.set(buildDepth.get - 1)
          memo.put(k, built)
          lastUsed.put(k, tick.incrementAndGet())
          evictLruLocked(spark, dir)
          (built, Some((System.nanoTime() - t0) / 1e9))
        }
      }
      // Per-entry build accounting (round-7 ask: build_sec was ONE
      // unbroken number larger than the timed wall, so a regression in
      // one memo build hid inside it). `persist()` is lazy for plain
      // entries, so the closure time alone under-reports them; the
      // builder thread therefore materializes its own entry eagerly —
      // OUTSIDE buildLock, so concurrent builds of other entries are
      // not serialized, and only at nesting depth 0 (a nested build's
      // materialization is charged to the parent closure that consumes
      // it). First-consumer cost is unchanged: some action was going to
      // materialize this cache; now it is this timed one.
      builtSec match {
        case Some(closureSec) if buildDepth.get == 0 =>
          val t1 = System.nanoTime()
          try df.count() catch { case _: Throwable => () }
          buildSecs.put(k, closureSec + (System.nanoTime() - t1) / 1e9)
        case Some(closureSec) =>
          buildSecs.put(k, closureSec)
        case None => ()
      }
      df
    }
  }

  // per-entry build wall (closure + eager materialization); nesting
  // depth distinguishes a top-level build from one re-entered by a
  // parent's closure under buildLock
  private val buildSecs = new ConcurrentHashMap[(SparkSession, String, String), Double]()
  private val buildDepth = new ThreadLocal[Int] { override def initialValue(): Int = 0 }

  /** Telemetry: (key, build seconds) per entry built this session,
    * slowest first — Bench writes this into BENCH_DETAIL so a
    * regression in one shared build is visible, not smeared into the
    * single build_sec total. */
  private[graft] def buildReport(): Seq[(String, Double)] = {
    import scala.jdk.CollectionConverters._
    buildSecs.asScala.toSeq.map { case ((_, _, key), s) => (key, s) }.sortBy(-_._2)
  }

  /** Like [[getOrBuild]], but materializes the entry as a STAGE
    * OUTPUT: the frame is written once through a reliable checkpoint
    * (files under the session's checkpoint dir, set lazily to a
    * per-application temp dir when unset) so the returned frame's
    * logical plan is a LEAF, not the build lineage.
    *
    * When to prefer this over the lineage-keeping default: entries
    * that downstream queries reference from SEVERAL aggregates. With
    * lineage kept, every reference re-pays analysis and — worse —
    * AQE re-optimization of the full build tree at EVERY stage
    * boundary, all driver-side and single-threaded: PlanCost measured
    * q220 at 9 stages × ~1 s of re-planning around 1 s of actual
    * executor CPU, the same mechanism as round 5's q100 PageRank
    * regression. A reliable checkpoint is also the honest production
    * semantics — a pipeline stage output persisted to shared storage,
    * recoverable after executor loss (which `localCheckpoint`, the
    * cheaper truncation, is not). The storage write is paid once per
    * (session, dataset); keep it for frames that are small relative
    * to their build (qrels, probe tables, calibrated thresholds). */
  def getOrBuildStage(spark: SparkSession, dir: String, key: String)(
      build: => DataFrame): DataFrame =
    getOrBuild(spark, dir, key) {
      val sc = spark.sparkContext
      if (sc.getCheckpointDir.isEmpty) {
        val d = s"${sys.props("java.io.tmpdir")}/graft-ckpt-${sc.applicationId}"
        sc.setCheckpointDir(d)
        ownedCkptDirs.put(spark, d)
      }
      // persist-before-checkpoint: checkpoint(eager) runs TWO jobs (the
      // eager count, then ReliableCheckpointRDD's file write) and the
      // second would recompute every partition from lineage — the
      // documented RDD.checkpoint caveat. Caching first makes the write
      // read from memory; the temp cache is dropped once the files are
      // down (the checkpointed leaf is what getOrBuild persists).
      val tmp = build.persist()
      val staged = tmp.checkpoint()
      tmp.unpersist(false)
      // track THIS entry's checkpoint files so release()/clearAll() can
      // reclaim the disk, not just the cache (without this a long-lived
      // session cycling datasets leaks tmp monotonically —
      // ContextCleaner does not remove reliable checkpoint files).
      // Attribution is POSITIVE: the checkpointed RDD sits under the
      // returned frame's LogicalRDD leaf and names its own file via
      // getCheckpointFile — a before/after directory diff (the round-6
      // shape) would also claim checkpoints written CONCURRENTLY by
      // user code or a sibling session sharing the checkpoint root, and
      // deleting those on eviction destroys data a live unrelated frame
      // still needs. If the leaf can't be located, record nothing: a
      // leaked checkpoint is recoverable, a stolen one is not.
      val ckptFile = staged.queryExecution.logical.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.flatMap(_.getCheckpointFile)
      ckptFile.foreach(f => stagedFiles.put((spark, dir, key), Seq(f)))
      staged
    }

  // checkpoint dirs THIS registry created (lazily, above) — deleted on
  // application end by the same listener that evicts the session's
  // entries, so repeated local runs don't accumulate files in tmp. A
  // caller-configured checkpoint dir is never touched (but staged
  // entries' own rdd-* subdirs are still reclaimed via stagedFiles).
  private val ownedCkptDirs = new ConcurrentHashMap[SparkSession, String]()
  // (session, dataset, key) → the rdd-* checkpoint dir that entry wrote
  private val stagedFiles =
    new ConcurrentHashMap[(SparkSession, String, String), Seq[String]]()
  // checkpoint dirs of staged entries LRU-EVICTED while their dataset is
  // still live: unlike unpersist (lineage recomputes transparently), a
  // staged leaf's files are its ONLY source — deleting them under a
  // still-held frame fails it permanently on the next action. Eviction
  // therefore drops the memo entry but DEFERS file reclamation, keyed by
  // (session, dir) so release reclaims exactly its scope. Deferral is
  // NOT unbounded (round-7 advisory: a session cycling staged keys
  // without ever calling release would otherwise accumulate rdd-* dirs
  // monotonically): each deferred entry carries a WeakReference to the
  // CHECKPOINTED RDD under the evicted frame's LogicalRDD leaf — not to
  // the Dataset wrapper (round-8 advisory: a caller holding only a
  // DERIVED frame, e.g. staged.filter(...).join(...), references that
  // RDD through its plan but not the wrapper object, so a wrapper-keyed
  // weak ref could clear while a derived plan is still runnable and the
  // sweep would delete files under it). Any plan that can still read
  // the files strongly holds that RDD, so its weak-unreachability
  // exactly implies the files are dead. [[sweepDeferredLocked]] — run
  // on every locked build and every drop — deletes the files of entries
  // whose referent has become weakly unreachable.
  private val deferredFiles = new ConcurrentHashMap[
    (SparkSession, String),
    Vector[(java.lang.ref.WeakReference[AnyRef], Seq[String])]]()

  /** The liveness referent for a staged frame's deferred files: the
    * checkpointed RDD under its LogicalRDD leaf (held by EVERY plan —
    * original or derived — that can still read the files). Falls back
    * to the frame itself if the leaf can't be located (never null, so
    * the weak ref stays meaningful). */
  private def stagedReferent(df: DataFrame): AnyRef =
    (try df.queryExecution.logical.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd: AnyRef
    } catch { case _: Throwable => None }).getOrElse(df)

  /** Delete a checkpoint path through the Hadoop FileSystem API so
    * reclamation works for any configured checkpoint filesystem —
    * `getCheckpointFile` returns a URI (`file:/…`, `hdfs://…`), which
    * java.nio would silently fail to resolve and leak. Best-effort. */
  private def deleteRecursively(path: String): Unit =
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      val conf = SparkSession.getDefaultSession
        .map(_.sparkContext.hadoopConfiguration)
        .getOrElse(new org.apache.hadoop.conf.Configuration())
      p.getFileSystem(conf).delete(p, true)
      ()
    } catch { case _: Throwable => () } // reclamation is best-effort

  /** Under buildLock: keep the (session, dir) working set bounded by
    * evicting least-recently-used entries beyond the cap. Staged
    * entries' checkpoint files are NOT deleted here (see
    * [[deferredFiles]]) — only the memo slot and the cache go. */
  private def evictLruLocked(spark: SparkSession, dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val ks = memo.keySet.asScala
      .filter { case (s, d, _) => (s eq spark) && d == dir }.toSeq
    if (ks.size > MaxEntriesPerDataset) {
      ks.sortBy(k => lastUsed.getOrDefault(k, 0L))
        .take(ks.size - MaxEntriesPerDataset)
        .foreach { k =>
          val df = memo.remove(k)
          lastUsed.remove(k)
          Option(stagedFiles.remove(k)).foreach { fs =>
            val entry = Vector(
              (new java.lang.ref.WeakReference(stagedReferent(df)), fs))
            deferredFiles.merge((k._1, k._2), entry, (a, b) => a ++ b)
          }
          if (df != null) try df.unpersist(false) catch { case _: Throwable => () }
        }
    }
    sweepDeferredLocked()
  }

  /** Under buildLock: reclaim the checkpoint files of LRU-evicted staged
    * entries whose frames have become weakly unreachable. Run on every
    * locked build and every drop, so a churning session's deferred set
    * shrinks as fast as the collector clears its dead frames instead of
    * growing until release(). */
  private def sweepDeferredLocked(): Unit = {
    import scala.jdk.CollectionConverters._
    deferredFiles.keySet.asScala.toSeq.foreach { scope =>
      val entries = deferredFiles.get(scope)
      if (entries != null) {
        val (dead, live) = entries.partition(_._1.get() == null)
        dead.foreach(_._2.foreach(deleteRecursively))
        if (live.isEmpty) deferredFiles.remove(scope, entries)
        else if (dead.nonEmpty) deferredFiles.replace(scope, entries, live)
      }
    }
  }

  /** Telemetry: count of deferred (LRU-evicted, still-reachable) staged
    * checkpoint dirs per (dir) scope — a churning session can watch this
    * to see deferred growth instead of discovering it as a tmp leak. */
  private[graft] def deferredCount(): Int = {
    import scala.jdk.CollectionConverters._
    deferredFiles.values.asScala.map(_.size).sum
  }

  /** Unpersist + drop every entry for one (session, dataset dir). */
  def release(spark: SparkSession, dir: String): Unit =
    drop((s, d) => (s eq spark) && d == dir)

  /** Unpersist + drop every entry for a session (application end). */
  private def evictSession(spark: SparkSession): Unit = {
    drop((s, _) => s eq spark)
    hooked.remove(spark)
    val d = ownedCkptDirs.remove(spark)
    if (d != null) deleteRecursively(d)
  }

  /** Unpersist + drop everything (Bench / Verify teardown). */
  def clearAll(): Unit = drop((_, _) => true)

  // scoped by (session, dir) — the explicit end-of-dataset boundary; no
  // caller has key-granular lifecycle, and deferred checkpoint files
  // (LRU-evicted staged entries) are only reclaimable at this boundary
  private def drop(p: (SparkSession, String) => Boolean): Unit =
    // under buildLock: a release racing an in-flight getOrBuild must not
    // interleave with its put — otherwise the build completes after the
    // drop and re-pins a persisted frame for a released dataset
    buildLock.synchronized {
      import scala.jdk.CollectionConverters._
      memo.keySet.asScala.filter(k => p(k._1, k._2)).toSeq.foreach { k =>
        val df = memo.remove(k)
        lastUsed.remove(k)
        // a dropped STAGED entry also reclaims its checkpoint files —
        // "end of dataset" means its consumers are done by contract
        Option(stagedFiles.remove(k)).foreach(_.foreach(deleteRecursively))
        // blocking=false: eviction is bookkeeping, not a barrier
        if (df != null) try df.unpersist(false) catch { case _: Throwable => () }
      }
      // deferred reclamation from earlier LRU evictions in this scope —
      // at the end-of-dataset boundary the frames are dead by contract,
      // so reachability no longer gates deletion
      deferredFiles.keySet.asScala.filter(k => p(k._1, k._2)).toSeq.foreach { k =>
        Option(deferredFiles.remove(k)).foreach(_.foreach(_._2.foreach(deleteRecursively)))
      }
      sweepDeferredLocked()
    }

  /** Test / telemetry hook: live entry count. */
  private[graft] def size: Int = memo.size()

  /** Telemetry: (dir, key, sizeInBytes) per live entry, largest first.
    * Size comes from the entry's own optimized plan statistics — once
    * the cache is materialized the plan is the InMemoryRelation and its
    * stats are the ACTUAL accumulated batch bytes; before that it is
    * the optimizer's estimate (tagged by caller-side judgement, not
    * here — telemetry only, never a correctness input). */
  private[graft] def report(): Seq[(String, String, Long)] = {
    import scala.jdk.CollectionConverters._
    memo.asScala.toSeq.map { case ((_, dir, key), df) =>
      val bytes =
        try df.queryExecution.optimizedPlan.stats.sizeInBytes.toLong
        catch { case _: Throwable => -1L }
      (dir, key, bytes)
    }.sortBy(-_._3)
  }
}
