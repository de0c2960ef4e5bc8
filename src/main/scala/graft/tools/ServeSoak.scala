// Sustained serving soak — the reference's ACTUAL steady state, run for
// minutes and measured end to end over real HTTP:
//
//  - continuous MQTT ingest (producer → MiniBroker → DSv2 source →
//    IngestStream parquet upsert log) at SPARK_GRAFT_SOAK_RATE msg/s
//    (default 200 = 10× the reference's 20 msg/s; the round-12
//    production-pressure artifact runs 2000 = 100×);
//  - the speed layer: AnalysisStream (stateful per-sensor windows)
//    refreshing the serving snapshot every micro-batch with the live RF
//    scorer injected, plus a FULL model refit every ~20 s (T5's
//    continuous refit loop) against the growing entry log;
//  - a memo-churn loop minting per-parameterization retrieval entries
//    (the staged `sim:anchor-probes:<p>` keys) so the LRU is exercised
//    under load, not just in MemoSpec;
//  - 10 HTTP clients against the real HttpShim the whole time: 90%
//    `/stress` (cached snapshot), ~9% `/history`, ~1% `/` (on-demand
//    full analysis — the reference's 5 s ask-timeout SLA route).
//
// ServeBench asserts the SLA once on an idle session; this is the
// wall-clock proof that p99 holds for MINUTES under concurrent ingest +
// refit + memo churn, with the memo footprint still bounded at the end.
// Writes SERVE_SOAK.json and fails loudly on an SLA breach.
//
// Usage: SPARK_GRAFT_SOAK_SEC=300 sbt "runMain graft.tools.ServeSoak"
package graft.tools

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._
import scala.util.Try

import org.apache.spark.sql.SparkSession

import graft.core.{MqttEntry, SensorMeta}
import graft.ml.AnomalyForest
import graft.operators.Anomaly
import graft.serve.HttpShim
import graft.sources.broker._
import graft.streaming.IngestStream

object ServeSoak {

  private def pct(xs: Seq[Double], p: Double): Double = {
    val s = xs.sorted
    s((p * (s.size - 1)).round.toInt)
  }

  def main(args: Array[String]): Unit = {
    val soakSec = sys.env.getOrElse("SPARK_GRAFT_SOAK_SEC", "180").toInt
    val memoDir = sys.env.getOrElse("SPARK_GRAFT_SOAK_MEMO_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      // FAIR across pools: the first soak ran FIFO and serve jobs queued
      // behind whole refit stages (stress p99 13.3 s with a 0.9 ms p50).
      // Background loops pin themselves to the "background" pool below;
      // HTTP workers and the two streaming queries stay in the default
      // pool, which the allocation file below gives weight 4 and a
      // minShare of half the slots — a micro-batch is never parked
      // behind a refit's stages (soak iteration 6 measured 16 s batch
      // stalls under equal-weight pools during refit windows). The
      // Spark-native answer to mixed interactive/batch tenancy, same
      // knobs a shared cluster session would set.
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.scheduler.allocation.file", {
        val p = Files.createTempFile("graft-soak-pools", ".xml")
        Files.write(p,
          """<?xml version="1.0"?>
            |<allocations>
            |  <pool name="default">
            |    <schedulingMode>FAIR</schedulingMode><weight>4</weight><minShare>4</minShare>
            |  </pool>
            |  <pool name="background">
            |    <schedulingMode>FIFO</schedulingMode><weight>1</weight><minShare>0</minShare>
            |  </pool>
            |</allocations>""".stripMargin.getBytes(
            java.nio.charset.StandardCharsets.UTF_8))
        p.toUri.toString
      })
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    // diagnostic: surface any micro-batch that ran long, per query, so a
    // staleness tail can be attributed to THE stalled stream and moment
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val ms = e.progress.batchDuration
        if (ms > 2000)
          System.err.println(s"[soak-slow-batch] sink=${e.progress.sink.description.take(60)} " +
            s"batch=${e.progress.batchId} ${ms} ms " +
            s"rows=${e.progress.numInputRows} @${e.progress.timestamp} " +
            s"durations=${e.progress.durationMs}")
      }
    })

    Broker.clear()
    val broker = new MiniBroker
    val bridge = MqttBridge.start("127.0.0.1", broker.port, "sensors/power")
    Thread.sleep(100)
    val dir = Files.createTempDirectory("graft-soak").toString
    val entryDir = s"$dir/entries"
    val source = spark.readStream.format(classOf[BrokerSourceProvider].getName).load()
    // compact-log shape: one file per micro-batch; the sensor layout is
    // applied by the compactor at fold time (write-fast/cluster-later)
    val ingest = IngestStream.start(source, entryDir, s"$dir/ckpt",
      compactLog = true)
    // round-8: the background compaction tick next to the ingest stream
    // (round 7's one growing number — the cold recompute over the
    // 200 ms sink's file fragments, 42 s after 15 min). Round 9: folds
    // run for ~5/6 of the soak (short initial delay keeps one or two
    // raw-growth samples for the before/after), the threshold is low
    // enough that the FOLD-UP merge path fires repeatedly under live
    // load, and at 2/3 of the soak the compactor is crash-restarted —
    // a fresh instance over the same dirs, no close() — so loadState's
    // marker resume + superseded-dir reclamation run in anger against
    // live readers, not just in CompactorSpec. Tick loop is inline
    // (instead of EntryLogCompactor.start) so the restart can swap the
    // instance.
    val compDir = s"$dir/entries_compacted"
    def newCompactor() = new graft.streaming.EntryLogCompactor(
      spark, entryDir, compDir, foldThreshold = 8,
      layoutPartitionBy = Seq("sensor"))
    @volatile var compactor = newCompactor()
    // cumulative across the restart (the instance counters reset)
    val foldsBase = new AtomicLong(); val foldUpsBase = new AtomicLong()
    val reclaimedBase = new AtomicLong()
    def foldsTotal = foldsBase.get + compactor.folds.get
    def foldUpsTotal = foldUpsBase.get + compactor.foldUps.get
    def reclaimedTotal = reclaimedBase.get + compactor.reclaimedDirs.get
    @volatile var compactorRestartTSec = -1L

    @volatile var done = false
    val sent = new AtomicLong()
    val errors = new ConcurrentLinkedQueue[String]()
    def thread(name: String)(body: => Unit): Thread = {
      val t = new Thread(() => try body catch {
        case e: Throwable => errors.add(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}")
      }, name)
      t.setDaemon(true); t.start(); t
    }
    // interruptible sleep that honors `done` quickly
    def napUnlessDone(ms: Long): Unit = {
      var left = ms
      while (left > 0 && !done) { val s = math.min(left, 200L); Thread.sleep(s); left -= s }
    }

    // background compaction tick loop, with the mid-soak crash-restart
    val compactorTicker = thread("soak-compactor") {
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", "background")
      val started = System.currentTimeMillis()
      napUnlessDone(math.min(soakSec * 1000L / 6, 120000L))
      var restarted = false
      while (!done) {
        if (!restarted &&
            System.currentTimeMillis() - started >= soakSec * 1000L * 2 / 3) {
          // crash-restart: abandon the live instance WITHOUT close().
          // The new instance's loadState must resume the fold point
          // from the marker (no re-fold of history) and reclaim any
          // generation the dead instance had deferred — while readers,
          // refits, and HTTP traffic keep running.
          foldsBase.addAndGet(compactor.folds.get)
          foldUpsBase.addAndGet(compactor.foldUps.get)
          reclaimedBase.addAndGet(compactor.reclaimedDirs.get)
          compactor = newCompactor()
          compactorRestartTSec = (System.currentTimeMillis() - started) / 1000
          restarted = true
        }
        try compactor.tick()
        catch { case e: Throwable => errors.add(s"compactor-tick: ${e.getMessage}") }
        napUnlessDone(15000)
      }
    }

    // ---- producer: 20 sensors, bursty anomaly episodes, rate-targeted.
    // SPARK_GRAFT_SOAK_RATE (msg/s, default 2000 = the round-12
    // production rate, 100× the reference's 20 msg/s — r12 verdict ask
    // #7: the standing artifact must not silently regress to trickle
    // mode) opens the write-pressure axis, exercising the compactor,
    // the tx-log MERGE stream, and the pin census under sf1-scale
    // volume. Pacing is a TOKEN BUCKET against elapsed wall time
    // (send while sent < rate·elapsed) — the old fixed-burst/fixed-
    // sleep loop clamped sub-100 rates up to ~100 msg/s, rounded
    // non-multiples of 100 down, and ignored publish latency, so high
    // targets systematically under-delivered while the artifact
    // recorded the target as if achieved (r12 advisory). The achieved
    // rate is recorded alongside the target in the JSON.
    val rate = sys.env.getOrElse("SPARK_GRAFT_SOAK_RATE", "2000").toInt
    val producer = thread("soak-producer") {
      val c = new MqttClient("127.0.0.1", broker.port, "soak-producer")
      val rnd = new java.util.Random(7)
      val t0 = System.nanoTime()
      var i = 0L
      while (!done) {
        val due = (rate.toDouble * (System.nanoTime() - t0) / 1e9).toLong
        if (i < due) {
          // cap the catch-up burst at 100 ms of rate so a stall never
          // dumps an unbounded backlog into one ingest trigger window
          var b = math.min(due - i, math.max(1L, rate / 10L))
          while (b > 0 && !done) {
            val anomalous = (i / 2000) % 3 == 2 && i % 5 == 0
            val v = rnd.nextGaussian() * 5 + (if (anomalous) 40.0 else 10.0)
            c.publish("sensors/power",
              PayloadCodec.encode(MqttEntry(s"sensor${i % 20}", v, if (anomalous) 1 else 0)))
            sent.incrementAndGet()
            i += 1; b -= 1
          }
        } else Thread.sleep(2)
      }
      c.disconnect()
    }

    // wait for the first micro-batch to land so readers have a log
    val readable = {
      val deadline = System.currentTimeMillis() + 60000
      var ok = false
      while (!ok && System.currentTimeMillis() < deadline) {
        ok = Try(spark.read.parquet(entryDir).count()).toOption.exists(_ > 0)
        if (!ok) Thread.sleep(200)
      }
      ok
    }
    require(readable, "ingest wrote no rows within 60 s — soak cannot start")

    // every batch consumer (fallback recompute, refit training scan)
    // reads the compaction-aware table: compacted dirs ∪ manifest tail,
    // so its cold cost is bounded by the tick cadence, not the sink age
    def entries = compactor.read()

    @volatile var models = Map.empty[String,
      org.apache.spark.ml.classification.RandomForestClassificationModel]
    val refits = new AtomicLong()
    val snaps = new AtomicLong()

    // ---- the batch-layer full analysis over the raw entry log (the
    // reference's literal "GET /" recompute; used as the stale fallback
    // and the 60 s cold-cost sampler — the stream below owns serving)
    def computeMetas(): Seq[SensorMeta] = {
      val fast = Anomaly.fastAnalysis(Anomaly.recentWindow(entries, 200))
        .select(col("sensor"), col("ts"), col("fast_anomaly"))
      val ms = models // volatile read once
      val rows = fast.collect().map { r =>
        (r.getString(0), r.getTimestamp(1), r.getDouble(2))
      }.toSeq
      val latest = entries.groupBy(col("sensor"))
        .agg(max_by(col("value"), col("ts")).as("value"))
      val full: Map[String, Double] =
        if (ms.isEmpty) Map.empty
        else AnomalyForest.scoreLatest(ms, latest)
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      rows.map { case (s, ts, fastScore) =>
        val f = full.getOrElse(s, -1.0)
        val blended = if (f >= 0) 0.35 * fastScore + 0.65 * f else fastScore
        SensorMeta(s, ts, fastScore, f, blended)
      }
    }
    // ---- the speed layer: the STREAM maintains the serving snapshot.
    // Soak archaeology, kept because each step measured a real failure:
    //  (1) recompute-per-"/"-request (the reference's literal topology)
    //      breached the 5 s ask-timeout under load — 8 workers stacking
    //      concurrent multi-job recomputes (p50 8.7 s);
    //  (2) a 2 s batch refresher + single-flight coalescing fixed the
    //      route but the batch recompute ITSELF grew 9 → 43 s over the
    //      soak: it re-lists and re-scans the entry log, which the
    //      200 ms micro-batch sink fragments into ~1500 small files —
    //      the un-compacted-log tax (q173 / TxLog.compact is the
    //      operator that pays it down; measured here, not hidden).
    // The production answer the engine already ships is AnalysisStream:
    // per-sensor bounded windows in flatMapGroupsWithState, snapshot
    // refreshed every micro-batch, the live RF scorer injected — the
    // snapshot is continuously ≤ ~1 s stale at ZERO per-request cost.
    // A single-flight batch recompute stays as the STALE fallback (and
    // its wall is recorded), plus a 60 s sampler keeps measuring the
    // raw-log recompute cost so the report shows what compaction buys.
    val recomputeMs = new ConcurrentLinkedQueue[java.lang.Double]()
    @volatile var lastSnapshotMs = 0L
    val freshHits = new AtomicLong()
    val onDemand = new AtomicLong()
    val staleness = new ConcurrentLinkedQueue[java.lang.Double]()
    def refreshSnapshot(): Unit = {
      val t0 = System.nanoTime()
      graft.streaming.SnapshotStore.update(computeMetas())
      recomputeMs.add((System.nanoTime() - t0) / 1e6)
      lastSnapshotMs = System.currentTimeMillis()
    }
    // stale-while-revalidate: a "/" request NEVER blocks on a recompute
    // (the first soak iteration coalesced waiters onto the in-flight
    // recompute, which still parked requests behind a 13-28 s raw-log
    // scan — worse than serving a 3 s-stale analysis). If the snapshot
    // is stale, ONE async refresh is kicked (CAS single-flight) and the
    // current analysis serves immediately; the staleness distribution
    // is recorded per request and ASSERTED on, so freshness is a gated
    // contract, not a hope. The fallback's batch result may land after
    // newer stream batches — last-write-wins, corrected by the next
    // micro-batch; it exists to recover a dead stream, not to race a
    // live one.
    val refreshing = new java.util.concurrent.atomic.AtomicBoolean(false)
    def currentAnalysis(): Seq[SensorMeta] = {
      staleness.add((System.currentTimeMillis() - lastSnapshotMs).toDouble)
      // fallback only when the freshness CONTRACT (the SLA bound) is at
      // risk — a healthy stream never lets it fire
      if (System.currentTimeMillis() - lastSnapshotMs > ServeBench.SlaMillis &&
          refreshing.compareAndSet(false, true)) {
        thread("soak-stale-refresh") {
          try { refreshSnapshot(); onDemand.incrementAndGet() }
          finally refreshing.set(false)
        }
      } else freshHits.incrementAndGet()
      graft.streaming.SnapshotStore.all
    }
    // live scorer: closes over the @volatile models map, so each refit
    // takes effect in the NEXT micro-batch — the T5 loop feeding the
    // speed layer exactly like the reference's Trainer → Analyzer
    val scorerOn = sys.env.getOrElse("SPARK_GRAFT_SOAK_SCORER", "1") == "1"
    val refitOn = sys.env.getOrElse("SPARK_GRAFT_SOAK_REFIT", "1") == "1"
    val scorer: String => Option[Double => Double] =
      if (!scorerOn) _ => None
      else s => models.get(s).map(m => (v: Double) =>
        m.predictProbability(org.apache.spark.ml.linalg.Vectors.dense(v))(1))
    // the speed layer consumes the TOPIC directly (the reference's
    // Consumer→Analyzer topology), NOT the written entry table: a
    // FileStreamSource over the 200 ms micro-batch sink re-lists the
    // ever-growing file set every trigger (~1500 files by minute five —
    // soak iteration 4 measured staleness p99 16 s from exactly that),
    // while the broker source's offsets are just buffer positions.
    // Stamps are assigned at THIS consumer like IngestStream's (the
    // reference stamps per consumer too, Consumer.scala:64).
    def topicEntries() = {
      import spark.implicits._
      graft.functions.GraftFunctions.register(spark)
      spark.readStream.format(classOf[BrokerSourceProvider].getName).load()
        .withColumn("ts", timestamp_micros(expr(
          "graft_record_stamp(unix_micros(current_timestamp()))")))
        .select($"sensor", $"ts", $"value", $"anomaly")
        .as[graft.core.Entry]
    }
    val analysis = graft.streaming.AnalysisStream.start(
      topicEntries(),
      s"$dir/analysis", s"$dir/ackpt", recentN = 200, scorer = scorer,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds"))
    // round-8: the TRANSACTIONAL history stream next to the fast one —
    // the reference's own two-writer topology (Analyzer → Redis fast
    // path = the 500 ms stream above; HistoryWriter → Cassandra = this
    // one): per-micro-batch keyed MERGE into a TxLog table, so the soak
    // exercises the transactional path under 15 minutes of live
    // contention, not just TxLogSpec's unit race. 3 s trigger — a MERGE
    // commit is a multi-job operation and the serving snapshot is NOT
    // this stream's job (updateSnapshot = false; the fast stream owns
    // freshness at its 500 ms cadence).
    val analysisTable = s"$dir/analysis_tx"
    val history = graft.streaming.AnalysisStream.startTx(
      topicEntries(),
      analysisTable, s"$dir/hckpt", recentN = 200, scorer = scorer,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("3 seconds"),
      updateSnapshot = false)
    // CONTENTION: a backfill writer racing the stream's merges on the
    // SAME table — optimistic-commit losers rewrite their data files and
    // leave the first attempt's dir as an orphan, which the post-soak
    // vacuum must reclaim (and ONLY those). Plus periodic TxLog.compact
    // ticks so the live file count stays bounded under 15 min of
    // one-commit-per-second growth — the same discipline as the entry
    // log's compactor, on the transactional store.
    val backfills = new AtomicLong()
    val backfiller = thread("soak-tx-backfill") {
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", "background")
      var i = 0L
      while (!done) {
        Try {
          if (graft.sources.TxLog.exists(analysisTable)) {
            import spark.implicits._
            val rows = Seq(SensorMeta(s"backfill${i % 3}",
              new java.sql.Timestamp(1700000000000L + i * 1000),
              0.0, 0.0, 0.0))
            graft.sources.TxLog.upsert(spark, analysisTable,
              spark.createDataset(rows).toDF(), Seq("name", "ts"))
            backfills.incrementAndGet()
          }
        }.failed.foreach(e => errors.add(s"backfill: ${e.getMessage}"))
        i += 1
        napUnlessDone(900)
      }
    }
    val txCompacts = new AtomicLong()
    val txCompactor = thread("soak-tx-compact") {
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", "background")
      while (!done) {
        napUnlessDone(120000)
        if (!done) Try {
          if (graft.sources.TxLog.exists(analysisTable)) {
            graft.sources.TxLog.compact(spark, analysisTable, Seq("name", "ts"))
            txCompacts.incrementAndGet()
          }
        }.failed.foreach(e => errors.add(s"tx-compact: ${e.getMessage}"))
      }
    }
    val snapWatcher = thread("soak-snap-watcher") {
      // stamp freshness off the stream's snapshot updates
      var last = Seq.empty[SensorMeta]
      while (!done) {
        val now = graft.streaming.SnapshotStore.all
        if (now != last) { last = now; lastSnapshotMs = System.currentTimeMillis()
          snaps.incrementAndGet() }
        Thread.sleep(100)
      }
    }
    // the cold-recompute cost is sampled as a SERIES during the soak
    // (round-7 ask: a single post-load point showed the un-compacted
    // tax but not its growth or the post-compaction recovery). Cadence
    // is soakSec/5 — r7's every-60 s sampling saturated the box because
    // EVERY sample paid the full raw-log scan; here only the
    // pre-compaction samples do, and there are ~2 of them.
    final case class ColdSample(tSec: Long, ms: Double, rawFiles: Long, folds: Long)
    val coldSeries = new ConcurrentLinkedQueue[ColdSample]()
    val soakStartMs = System.currentTimeMillis()
    def sampleColdRecompute(): Unit = Try {
      val t0 = System.nanoTime()
      computeMetas() // measured, NOT written — the stream owns the snapshot
      val ms = (System.nanoTime() - t0) / 1e6
      recomputeMs.add(ms)
      coldSeries.add(ColdSample((System.currentTimeMillis() - soakStartMs) / 1000,
        ms, Try(compactor.rawFileCount()).getOrElse(-1L), foldsTotal))
    }.failed.foreach(e => errors.add(s"cold-sample: ${e.getMessage}"))
    val coldSampler = thread("soak-cold-sampler") {
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", "background")
      // ~7 samples over the soak: enough pre-compaction points to show
      // the raw-log growth and enough post to show it flat
      val everyMs = math.max(60, soakSec / 7) * 1000L
      while (!done) {
        napUnlessDone(everyMs)
        if (!done) sampleColdRecompute()
      }
    }

    // ---- refit loop (~20 s): T5's continuous retrain over the live log
    val refitter = thread("soak-refitter") {
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", "background")
      while (!done && refitOn) {
        Try {
          val t0 = System.nanoTime()
          val m = AnomalyForest.train(entries, fullWindow = 2000)
          System.err.println(f"[soak-refit] ${(System.nanoTime() - t0) / 1e9}%.1f s " +
            s"models=${m.size} @${java.time.Instant.now()}")
          if (m.nonEmpty) { models = m; refits.incrementAndGet() }
        }.failed.foreach(e => errors.add(s"refit: ${e.getMessage}"))
        napUnlessDone(20000)
      }
    }

    // ---- memo churn: per-parameterization staged retrieval entries
    val churns = new AtomicLong()
    val churner = thread("soak-memo-churn") {
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", "background")
      var p = 0
      while (!done) {
        Try {
          graft.Graft.retrievalEval(spark, memoDir, probes = 1 + (p % 16)).count()
          churns.incrementAndGet()
        }.failed.foreach(e => errors.add(s"churn: ${e.getMessage}"))
        p += 1
        napUnlessDone(1000)
      }
    }

    // gate the load on the speed layer's FIRST snapshot — a request
    // before any analysis exists would measure epoch-sized staleness
    // and trip the fallback on an empty store, neither of which is a
    // serving observation (a deployment warms before taking traffic)
    {
      val deadline = System.currentTimeMillis() + 60000
      while (lastSnapshotMs == 0L && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      require(lastSnapshotMs > 0L, "speed layer produced no snapshot within 60 s")
    }

    // ---- the real HTTP surface under test
    val shim = new HttpShim(
      fullAnalyze = () => currentAnalysis(),
      history = n => graft.streaming.SnapshotStore.all.take(n))
    val port = shim.start()

    final case class Obs(route: String, ms: Double, ok: Boolean)
    val obs = new ConcurrentLinkedQueue[Obs]()
    def get(path: String): Obs = {
      val t0 = System.nanoTime()
      val ok = Try {
        val conn = new java.net.URI(s"http://127.0.0.1:$port$path").toURL
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setConnectTimeout(10000); conn.setReadTimeout(60000)
        val body = new String(conn.getInputStream.readAllBytes())
        conn.disconnect()
        body.startsWith("{")
      }.getOrElse(false)
      Obs(path.takeWhile(_ != '?'), (System.nanoTime() - t0) / 1e6, ok)
    }
    val clients = (1 to 10).map(ci => thread(s"soak-client-$ci") {
      val rnd = new java.util.Random(ci)
      while (!done) {
        val r = rnd.nextInt(100)
        val path = if (r < 90) "/stress" else if (r < 99) "/history?n=10" else "/"
        obs.add(get(path))
        Thread.sleep(20)
      }
    })

    // diagnostic watchdog (env-gated): when the snapshot goes stale past
    // 5 s, dump the streaming/refit thread stacks once per episode —
    // names the lock or loop a stall is actually parked in
    if (sys.env.get("SPARK_GRAFT_SOAK_DUMP").contains("1")) {
      thread("soak-stall-dumper") {
        var dumped = 0L
        while (!done) {
          val stale = System.currentTimeMillis() - lastSnapshotMs
          if (lastSnapshotMs > 0 && stale > 5000 &&
              System.currentTimeMillis() - dumped > 15000) {
            dumped = System.currentTimeMillis()
            import scala.jdk.CollectionConverters._
            Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
              val n = t.getName
              if (n.contains("stream execution") || n.contains("microBatch") ||
                  n.contains("soak-refit") || n.contains("soak-snap")) {
                System.err.println(s"[soak-stall-dump] $n state=${t.getState}")
                st.take(25).foreach(f => System.err.println(s"    at $f"))
              }
            }
          }
          Thread.sleep(500)
        }
      }
    }

    // ---- run the soak
    val t0 = System.currentTimeMillis()
    while (System.currentTimeMillis() - t0 < soakSec * 1000L) Thread.sleep(500)
    done = true
    (clients :+ producer :+ snapWatcher :+ refitter :+ churner
      :+ coldSampler :+ backfiller :+ txCompactor :+ compactorTicker)
      .foreach(_.join(30000))
    sampleColdRecompute() // final point of the series (post-compaction)
    Thread.sleep(3000) // let the streams drain the topic tail
    analysis.stop()
    history.stop()
    ingest.stop()
    shim.stop()
    bridge.disconnect(); broker.close(); Broker.clear()

    // ---- TxLog integration contract (round-8 ask): after 15 min of a
    // merging stream + racing backfiller + concurrent compact ticks,
    // vacuum must reclaim EXACTLY the orphan dirs the lost races left,
    // the snapshot must be byte-stable across it, and the live file
    // count must be bounded by the compact cadence, not the commit count
    import graft.sources.TxLog
    // a short/degenerate run in which the history stream never committed
    // must die with a diagnostic, not an NPE from listFiles()/history().last
    require(TxLog.exists(analysisTable),
      s"history stream never committed a TxLog version under $analysisTable " +
        "— soak too short or the history stream failed; see stream logs above")
    val txDataDirs = Option(new java.io.File(analysisTable).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("data-"))
      .map(_.getName).toSet
    val txReferenced = TxLog.referencedDirs(analysisTable)
    val expectedOrphans = txDataDirs -- txReferenced
    val preVacuumRows = TxLog.read(spark, analysisTable).count()
    val latestVersion = TxLog.history(analysisTable).last._1
    val reclaimed = TxLog.vacuum(analysisTable, latestVersion,
      orphanOlderThanMs = 0L)
    val reclaimedOrphans = reclaimed.filter(txDataDirs.contains).toSet
    val postVacuumRows = TxLog.read(spark, analysisTable).count()
    val txLiveFiles = TxLog.files(analysisTable).size
    val txCommits = TxLog.history(analysisTable).size

    // ---- report
    val all = obs.asScala.toSeq
    val byRoute = all.groupBy(_.route)
    val written = Try(entries.count()).getOrElse(0L)
    val memoEntries = graft.core.PersistedMemo.size
    val memoBytes = graft.core.PersistedMemo.report().map(_._3).filter(_ > 0).sum
    def routeJson(r: String): String = {
      val xs = byRoute.getOrElse(r, Nil).map(_.ms)
      if (xs.isEmpty) s""""$r":{"n":0}"""
      else
        s""""$r":{"n":${xs.size},"p50":${pct(xs, 0.50)},"p99":${pct(xs, 0.99)},"max":${xs.max}}"""
    }
    val failedReqs = all.count(!_.ok)
    val sla = ServeBench.SlaMillis
    val rec = recomputeMs.asScala.map(_.doubleValue).toSeq
    val recJson =
      if (rec.isEmpty) """"recompute_ms":{"n":0}"""
      else s""""recompute_ms":{"n":${rec.size},"p50":${pct(rec, 0.50)},""" +
        s""""p99":${pct(rec, 0.99)},"max":${rec.max}}"""
    val staleSeq = staleness.asScala.map(_.doubleValue).toSeq
    val staleJson =
      if (staleSeq.isEmpty) """"staleness_ms":{"n":0}"""
      else s""""staleness_ms":{"n":${staleSeq.size},"p50":${pct(staleSeq, 0.50)},""" +
        s""""p99":${pct(staleSeq, 0.99)},"max":${staleSeq.max}}"""
    val series = coldSeries.asScala.toSeq.sortBy(_.tSec)
    val seriesJson = series.map(s =>
      s"""{"t_sec":${s.tSec},"ms":${s.ms.round},"raw_files":${s.rawFiles},"folds":${s.folds}}""")
      .mkString(""""recompute_series":[""", ",", "]")
    val txJson =
      s""""txlog":{"commits":$txCommits,"live_files":$txLiveFiles,""" +
        s""""backfills":${backfills.get},"compacts":${txCompacts.get},""" +
        s""""orphans_expected":${expectedOrphans.size},""" +
        s""""orphans_reclaimed":${reclaimedOrphans.size},""" +
        s""""rows_pre_vacuum":$preVacuumRows,"rows_post_vacuum":$postVacuumRows}"""
    // ---- final deferral census (round-9 verdict wrong #2): freeze the
    // LIVE reclamation figure, then run one shutdown sweep and demand
    // every still-deferred dir trace to a reachable reader or an
    // in-flight read. The bare deferred count could not tell healthy
    // deferral (readers pinned it at snapshot time) from a pin that
    // never releases — this census can, and the gate below enforces it.
    val reclaimedLive = reclaimedTotal
    System.gc() // collect dead reader plans so the weak-ref prune is honest
    // ONE atomic sweep+census (round-10 advisory): sweepNow() followed by
    // deferredEvidence() took the lock twice, so a reader plan GC'd
    // between the calls made a dir that was legitimately pinned at sweep
    // time report (0, 0) and spuriously fail the pin-leak require. The
    // atomic form reclaims exactly the unpinned set and returns the
    // survivors' evidence from the SAME reachability snapshot.
    val deferredEv = compactor.sweepWithEvidence()
    val liveReadersEnd = compactor.liveReaderCount()
    deferredEv.foreach { case (d, nr, nf) =>
      System.err.println(s"[soak] deferred $d: $nr reader pins, $nf in-flight refs") }
    val unpinnedEnd = deferredEv.count(e => e._2 == 0 && e._3 == 0)
    val json =
      s"""{"metric":"serve_soak","duration_sec":$soakSec,"sla_ms":$sla,"ingest_rate_target":$rate,"ingest_rate_achieved":${sent.get / math.max(1L, soakSec)},""" +
        s""""requests":${all.size},"failed_requests":$failedReqs,""" +
        s"""${routeJson("/stress")},${routeJson("/history")},${routeJson("/")},""" +
        s"""$recJson,$seriesJson,"entry_folds":$foldsTotal,"entry_fold_ups":$foldUpsTotal,"compactor_restart_t_sec":$compactorRestartTSec,"dirs_reclaimed_live":$reclaimedLive,"deferred_dirs_end":${deferredEv.size},"live_readers_end":$liveReadersEnd,"deferred_unpinned_end":$unpinnedEnd,$txJson,""" +
        s"""$staleJson,"full_fresh_hits":${freshHits.get},"full_recomputes":${onDemand.get},""" +
        s""""msgs_sent":${sent.get},"rows_ingested":$written,""" +
        s""""snapshot_refreshes":${snaps.get},"refits":${refits.get},""" +
        s""""memo_churn_calls":${churns.get},"memo_entries":$memoEntries,""" +
        s""""memo_bytes":$memoBytes,"errors":${errors.size}}"""
    Files.write(java.nio.file.Paths.get("SERVE_SOAK.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    errors.asScala.take(10).foreach(e => System.err.println(s"[soak-error] $e"))

    // the soak's contract — loud failure, never a quietly-bad artifact
    require(failedReqs == 0, s"$failedReqs HTTP requests failed during the soak")
    // background threads must survive the whole run error-free too: the
    // round-9 r1 soak passed every latency gate while its refit thread
    // had died once on a compactor race (PATH_NOT_FOUND on a reclaimed
    // t-dir) — an error queue that is only REPORTED lets a real bug
    // ride a green artifact
    require(errors.isEmpty,
      s"${errors.size} background errors: ${errors.asScala.take(3).mkString(" | ")}")
    val overall = all.map(_.ms)
    require(pct(overall, 0.99) <= sla,
      f"overall p99 ${pct(overall, 0.99)}%.1f ms breaches the $sla%.0f ms SLA")
    val fullXs = byRoute.getOrElse("/", Nil).map(_.ms)
    if (fullXs.nonEmpty) require(pct(fullXs, 0.99) <= sla,
      f"full-analysis p99 ${pct(fullXs, 0.99)}%.1f ms breaches the $sla%.0f ms SLA")
    // the cached path must never hide a STALE analysis: the streaming
    // speed layer has to keep the snapshot fresher than the SLA bound
    // (staleness observed at each "/" request; the raw-log recompute
    // cost is REPORTED in recompute_ms, not asserted — it is the
    // documented un-compacted-log tax, see the speed-layer comment)
    val staleXs = staleness.asScala.map(_.doubleValue).toSeq
    if (staleXs.nonEmpty) require(pct(staleXs, 0.99) <= sla,
      f"snapshot staleness p99 ${pct(staleXs, 0.99)}%.1f ms breaches the $sla%.0f ms bound")
    require(memoEntries <= 2 * graft.core.PersistedMemo.MaxEntriesPerDataset,
      s"memo grew unbounded under churn: $memoEntries entries")
    require((!refitOn || refits.get >= math.max(1, soakSec / 60)) && snaps.get >= soakSec / 5,
      s"background loops starved: refits=${refits.get} snaps=${snaps.get}")
    // the compaction contract: once the tick has run, the cold recompute
    // must DROP below the pre-compaction peak and stay bounded — the
    // linear-forever growth r7 measured (42 s at minute 15) is the
    // failure this gate rejects
    if (foldsTotal > 0 && series.size >= 2) {
      val (pre, post) = series.partition(_.folds == 0)
      require(post.nonEmpty, "compaction ran but no post-fold sample exists")
      // LAST vs pre-max (not post-max vs pre-max): one noisy post
      // sample under a concurrent refit must not fail a real drop.
      // Enforced only once the pre-fold log is big enough for the
      // file tax to clear measurement noise (~1000 files ≈ 8 s of
      // per-file open cost on this box) — a short smoke run proves
      // boundedness, a full soak proves the drop.
      if (pre.exists(_.rawFiles >= 1000))
        require(post.last.ms < pre.map(_.ms).max,
          f"no post-compaction drop: final ${post.last.ms}%.0f ms " +
            f">= pre-compaction max ${pre.map(_.ms).max}%.0f ms")
      require(post.last.ms <= 15000,
        f"cold recompute not bounded after compaction: ${post.last.ms}%.0f ms")
    }
    // round-9 gates (long runs only — a short smoke can't reach them):
    // the fold-up merge path fired under live load, the mid-soak
    // crash-restart happened (loadState ran in anger), and on-disk
    // compacted state is O(live generations), not O(soak age) — the
    // reclamation path, not just the read path, is what stays bounded
    if (soakSec >= 900) {
      require(foldUpsTotal >= 1,
        s"fold-up never fired live: $foldsTotal folds, threshold 8")
      require(compactorRestartTSec >= 0, "mid-soak compactor restart never ran")
      val compDirCount = Option(new java.io.File(compDir).listFiles())
        .getOrElse(Array.empty).count(_.isDirectory)
      require(compDirCount <= 8 + compactor.deferredDirCount() + 4,
        s"compacted dirs not bounded: $compDirCount on disk " +
          s"(${compactor.deferredDirCount()} legitimately deferred)")
    }
    // deferral is only legitimate while something pins it: after the
    // shutdown sweep, a deferred dir with zero reader pins and zero
    // in-flight refs is a pin leak (the sweep reclaims exactly the
    // unpinned set, so such a row should be unreachable — this gate
    // turns "should" into "is"). Runs at every soak length: the
    // invariant holds by construction, not by duration.
    require(unpinnedEnd == 0,
      s"$unpinnedEnd deferred dirs have no reader pin after the final sweep " +
        s"(${deferredEv.size} deferred, $liveReadersEnd live readers) — pin leak")
    // the TxLog contract: vacuum reclaimed exactly the orphan dirs, the
    // snapshot rode through it untouched, and compaction kept the live
    // file count bounded by cadence rather than commit count
    require(reclaimedOrphans == expectedOrphans,
      s"vacuum reclaimed ${reclaimedOrphans.size} orphan dirs, expected " +
        s"${expectedOrphans.size}: diff=${(reclaimedOrphans diff expectedOrphans) ++
          (expectedOrphans diff reclaimedOrphans)}")
    require(postVacuumRows == preVacuumRows,
      s"vacuum changed the snapshot: $preVacuumRows -> $postVacuumRows rows")
    require(txLiveFiles <= 8 + 2 * 60 * 2, // targetFiles + 2 min of 1 s commits
      s"TxLog live files not bounded: $txLiveFiles after ${txCompacts.get} compacts")
    compactor.close()
    graft.core.PersistedMemo.clearAll()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
  }
}
