// Sustained serving soak — the reference's ACTUAL steady state, run for
// minutes and measured end to end over real HTTP:
//
//  - continuous MQTT ingest (producer → MiniBroker → DSv2 source →
//    IngestStream parquet upsert log) at ~10× the reference's 20 msg/s;
//  - the snapshot refresher recomputing the flagship analysis every ~2 s
//    (the dashboard's cadence) and a FULL model refit every ~20 s (T5's
//    continuous refit loop) — both against the growing entry log;
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
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    Broker.clear()
    val broker = new MiniBroker
    val bridge = MqttBridge.start("127.0.0.1", broker.port, "sensors/power")
    Thread.sleep(100)
    val dir = Files.createTempDirectory("graft-soak").toString
    val entryDir = s"$dir/entries"
    val source = spark.readStream.format(classOf[BrokerSourceProvider].getName).load()
    val ingest = IngestStream.start(source, entryDir, s"$dir/ckpt")

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

    // ---- producer: 20 sensors, ~200 msg/s, bursty anomaly episodes
    val producer = thread("soak-producer") {
      val c = new MqttClient("127.0.0.1", broker.port, "soak-producer")
      val rnd = new java.util.Random(7)
      var i = 0L
      while (!done) {
        val anomalous = (i / 2000) % 3 == 2 && i % 5 == 0
        val v = rnd.nextGaussian() * 5 + (if (anomalous) 40.0 else 10.0)
        c.publish("sensors/power",
          PayloadCodec.encode(MqttEntry(s"sensor${i % 20}", v, if (anomalous) 1 else 0)))
        sent.incrementAndGet()
        i += 1
        if (i % 20 == 0) Thread.sleep(95)
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

    def entries = spark.read.parquet(entryDir)

    @volatile var models = Map.empty[String,
      org.apache.spark.ml.classification.RandomForestClassificationModel]
    val refits = new AtomicLong()
    val snaps = new AtomicLong()

    // ---- snapshot refresher (~2 s): the dashboard's "GET /" recompute
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
    val refresher = thread("soak-refresher") {
      while (!done) {
        Try {
          graft.streaming.SnapshotStore.update(computeMetas())
          snaps.incrementAndGet()
        }.failed.foreach(e => errors.add(s"refresh: ${e.getMessage}"))
        napUnlessDone(2000)
      }
    }

    // ---- refit loop (~20 s): T5's continuous retrain over the live log
    val refitter = thread("soak-refitter") {
      while (!done) {
        Try {
          val m = AnomalyForest.train(entries, fullWindow = 2000)
          if (m.nonEmpty) { models = m; refits.incrementAndGet() }
        }.failed.foreach(e => errors.add(s"refit: ${e.getMessage}"))
        napUnlessDone(20000)
      }
    }

    // ---- memo churn: per-parameterization staged retrieval entries
    val churns = new AtomicLong()
    val churner = thread("soak-memo-churn") {
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

    // ---- the real HTTP surface under test
    val shim = new HttpShim(
      fullAnalyze = () => computeMetas(),
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

    // ---- run the soak
    val t0 = System.currentTimeMillis()
    while (System.currentTimeMillis() - t0 < soakSec * 1000L) Thread.sleep(500)
    done = true
    (clients :+ producer :+ refresher :+ refitter :+ churner).foreach(_.join(30000))
    Thread.sleep(3000) // let the ingest stream drain the topic tail
    ingest.stop()
    shim.stop()
    bridge.disconnect(); broker.close(); Broker.clear()

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
    val json =
      s"""{"metric":"serve_soak","duration_sec":$soakSec,"sla_ms":$sla,""" +
        s""""requests":${all.size},"failed_requests":$failedReqs,""" +
        s"""${routeJson("/stress")},${routeJson("/history")},${routeJson("/")},""" +
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
    val overall = all.map(_.ms)
    require(pct(overall, 0.99) <= sla,
      f"overall p99 ${pct(overall, 0.99)}%.1f ms breaches the $sla%.0f ms SLA")
    val fullXs = byRoute.getOrElse("/", Nil).map(_.ms)
    if (fullXs.nonEmpty) require(pct(fullXs, 0.99) <= sla,
      f"full-analysis p99 ${pct(fullXs, 0.99)}%.1f ms breaches the $sla%.0f ms SLA")
    require(memoEntries <= 2 * graft.core.PersistedMemo.MaxEntriesPerDataset,
      s"memo grew unbounded under churn: $memoEntries entries")
    require(refits.get >= math.max(1, soakSec / 30) && snaps.get >= soakSec / 5,
      s"background loops starved: refits=${refits.get} snaps=${snaps.get}")
    graft.core.PersistedMemo.clearAll()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
  }
}
