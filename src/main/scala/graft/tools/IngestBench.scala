// Ingest-path throughput: the measured ceiling of the reference's
// 20 msg/s cadence (BASELINE.md: Producer ticks 20 sensors/s;
// reference mqtt/Producer.scala). Three numbers, one JSON line:
//
//  - transport QoS-0: N messages through real MQTT over loopback TCP
//    (P producer sockets → MiniBroker fan-out → bridge → topic buffer),
//    fire-and-forget — the wire + codec + routing ceiling.
//  - transport QoS-1: same path, each publish blocking on its PUBACK
//    (the reference's Paho default) — the at-least-once RTT-bound rate
//    per producer, scaled by P concurrent producers.
//  - pipeline: the buffered topic drained through the DSv2 source →
//    IngestStream (record-stamping, streaming dedup, parquet upsert
//    log) with Trigger.AvailableNow — the Spark micro-batch write
//    ceiling for the S3 ingest edge.
//
// Usage: sbt "runMain graft.tools.IngestBench [nMsgs] [producers]"
package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.core.MqttEntry
import graft.sources.broker._

object IngestBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 40000
    val producers = if (args.length > 1) args(1).toInt else 4
    val nQos1 = math.max(n / 10, 1000) // RTT-bound tier: smaller N, same story
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def entries(k: Int): IndexedSeq[MqttEntry] =
      (0 until k).map(i => MqttEntry(s"sensor${i % 16}", i * 0.25, if (i % 7 == 0) 1 else 0))

    def drive(count: Int, qos1: Boolean): Double = {
      Broker.clear()
      val broker = new MiniBroker
      try {
        val bridge = MqttBridge.start("127.0.0.1", broker.port, "sensors/power")
        Thread.sleep(100) // let SUBSCRIBE land before the first publish
        val batch = entries(count)
        val per = batch.grouped(math.max(count / producers, 1)).toSeq
        val clients = per.indices.map(i =>
          new MqttClient("127.0.0.1", broker.port, s"producer$i"))
        val t0 = System.nanoTime()
        val threads = per.zip(clients).map { case (slice, c) =>
          val t = new Thread(() => slice.foreach { e =>
            val p = PayloadCodec.encode(e)
            if (qos1) c.publishQos1("sensors/power", p)
            else c.publish("sensors/power", p)
          })
          t.start(); t
        }
        threads.foreach(_.join())
        // QoS-0 has no ack: completion = the topic buffer holds every row
        val deadline = System.currentTimeMillis() + 120000
        while (Broker.size < count && System.currentTimeMillis() < deadline)
          Thread.sleep(5)
        val secs = (System.nanoTime() - t0) / 1e9
        require(Broker.size == count,
          s"transport dropped rows: ${Broker.size} of $count (qos1=$qos1)")
        clients.foreach(_.disconnect()); bridge.disconnect()
        count / secs
      } finally broker.close()
    }

    val qos0Rate = drive(n, qos1 = false)
    val topicForPipeline = { // leave a full buffer for the Spark phase
      Broker.clear()
      val broker = new MiniBroker
      val bridge = MqttBridge.start("127.0.0.1", broker.port, "sensors/power")
      Thread.sleep(100)
      val c = new MqttClient("127.0.0.1", broker.port, "refill")
      entries(n).foreach(e => c.publish("sensors/power", PayloadCodec.encode(e)))
      val deadline = System.currentTimeMillis() + 120000
      while (Broker.size < n && System.currentTimeMillis() < deadline) Thread.sleep(5)
      c.disconnect(); bridge.disconnect(); broker.close()
      Broker.size
    }
    require(topicForPipeline == n, s"refill dropped rows: $topicForPipeline of $n")
    val dir = Files.createTempDirectory("graft-ingestbench").toString
    val source = spark.readStream
      .format(classOf[BrokerSourceProvider].getName).load()
    val t0 = System.nanoTime()
    val q = graft.streaming.IngestStream.start(
      source, s"$dir/entries", s"$dir/ckpt", trigger = Trigger.AvailableNow())
    q.awaitTermination(300000)
    val pipeSecs = (System.nanoTime() - t0) / 1e9
    val written = spark.read.parquet(s"$dir/entries").count()
    require(written == n, s"pipeline dropped rows: $written of $n")
    val qos1Rate = drive(nQos1, qos1 = true)
    Broker.clear()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    def f(x: Double) = math.round(x).toInt
    println(s"""{"metric":"ingest","transport_qos0_msgs_per_s":${f(qos0Rate)},"transport_qos1_msgs_per_s":${f(qos1Rate)},"pipeline_rows_per_s":${f(n / pipeSecs)},"n":$n,"producers":$producers,"reference_msgs_per_s":20}""")
    spark.stop()
  }
}
