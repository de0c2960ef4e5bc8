package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.util.concurrent.{CountDownLatch, TimeUnit}

import graft.core.MqttEntry
import graft.sources.broker._

/** The real MQTT 3.1.1 wire path: codec framing against the spec's
  * examples, broker routing over actual loopback TCP sockets, and the
  * full network → DSv2 micro-batch → typed-decode pipeline. */
class MqttSpec extends SparkSpecBase {
  import spark.implicits._

  test("remaining-length varint matches the spec's boundary table") {
    import MqttCodec._
    // OASIS MQTT 3.1.1 §2.2.3 gives these exact encodings
    encodeRemainingLength(0).toSeq shouldBe Seq(0x00.toByte)
    encodeRemainingLength(127).toSeq shouldBe Seq(0x7f.toByte)
    encodeRemainingLength(128).toSeq shouldBe Seq(0x80.toByte, 0x01.toByte)
    encodeRemainingLength(16383).toSeq shouldBe Seq(0xff.toByte, 0x7f.toByte)
    encodeRemainingLength(16384).toSeq shouldBe
      Seq(0x80.toByte, 0x80.toByte, 0x01.toByte)
    encodeRemainingLength(268435455).toSeq shouldBe
      Seq(0xff.toByte, 0xff.toByte, 0xff.toByte, 0x7f.toByte)
    an[IllegalArgumentException] should be thrownBy encodeRemainingLength(-1)
    an[IllegalArgumentException] should be thrownBy encodeRemainingLength(268435456)
  }

  test("packets round-trip the wire framing byte-exactly") {
    import MqttCodec._
    def roundTrip(p: Packet): Packet = {
      val bos = new ByteArrayOutputStream()
      writePacket(new DataOutputStream(bos), p)
      readPacket(new DataInputStream(new ByteArrayInputStream(bos.toByteArray)))
    }
    val pub = publish("sensors/power", Array[Byte](1, 2, 3, -1))
    val back = roundTrip(pub)
    back.ptype shouldBe PUBLISH
    readPublish(back)._1 shouldBe "sensors/power"
    readPublish(back)._2.toSeq shouldBe Seq[Byte](1, 2, 3, -1)
    // a payload long enough to need a 2-byte remaining length
    val big = publish("t", Array.fill[Byte](300)(7))
    readPublish(roundTrip(big))._2.length shouldBe 300
    val con = roundTrip(connect("client-1"))
    con.ptype shouldBe CONNECT
    readUtf8(con.body, 0)._1 shouldBe "MQTT"
    val sub = roundTrip(subscribe(42, "a/b"))
    sub.ptype shouldBe SUBSCRIBE
    sub.flags shouldBe 0x2 // §3.8.1 reserved bits
    (((sub.body(0) & 0xff) << 8) | (sub.body(1) & 0xff)) shouldBe 42
  }

  test("broker routes QoS-0 publishes to topic subscribers over real TCP") {
    val broker = new MiniBroker
    try {
      val received = new java.util.concurrent.ConcurrentLinkedQueue[(String, Seq[Byte])]()
      val latch = new CountDownLatch(10)
      val consumer = new MqttClient("127.0.0.1", broker.port, "consumer")
      consumer.subscribe("sensors/power") { (t, p) =>
        received.add(t -> p.toSeq); latch.countDown()
      }
      val other = new MqttClient("127.0.0.1", broker.port, "other")
      other.subscribe("other/topic")((_, _) => fail("wrong-topic delivery"))
      Thread.sleep(100) // let SUBSCRIBEs land before publishing
      val producer = new MqttClient("127.0.0.1", broker.port, "producer")
      val messages = (1 to 10).map(i =>
        PayloadCodec.encode(MqttEntry(s"s${i % 3}", i * 1.5, i % 2)))
      messages.foreach(producer.publish("sensors/power", _))
      producer.publish("unrelated", Array[Byte](9)) // no subscriber: dropped
      latch.await(5, TimeUnit.SECONDS) shouldBe true
      import scala.jdk.CollectionConverters._
      val got = received.asScala.toSeq
      got.map(_._1).distinct shouldBe Seq("sensors/power")
      // in-order, byte-exact delivery; decode recovers the records
      got.map(_._2) shouldBe messages.map(_.toSeq)
      got.map(p => PayloadCodec.decode(p._2.toArray)) shouldBe
        (1 to 10).map(i => MqttEntry(s"s${i % 3}", i * 1.5, i % 2))
      producer.disconnect(); consumer.disconnect(); other.disconnect()
    } finally broker.close()
  }

  test("QoS-1 framing: packet id + DUP flag round-trip, PUBACK layout") {
    import MqttCodec._
    def roundTrip(p: Packet): Packet = {
      val bos = new ByteArrayOutputStream()
      writePacket(new DataOutputStream(bos), p)
      readPacket(new DataInputStream(new ByteArrayInputStream(bos.toByteArray)))
    }
    val first = roundTrip(publishQos1("sensors/power", 777, Array[Byte](5, 6)))
    val m = readPublishMsg(first)
    m.topic shouldBe "sensors/power"
    m.qos shouldBe 1
    m.packetId shouldBe 777
    m.dup shouldBe false
    m.payload.toSeq shouldBe Seq[Byte](5, 6)
    // retransmission carries DUP=1 (spec §3.3.1.1), same pid + payload
    val re = readPublishMsg(roundTrip(
      publishQos1("sensors/power", 777, Array[Byte](5, 6), dup = true)))
    re.dup shouldBe true
    re.packetId shouldBe 777
    val ack = roundTrip(puback(777))
    ack.ptype shouldBe PUBACK
    readPid(ack.body, 0) shouldBe 777
    // a QoS-0 PUBLISH parses with qos 0 / pid 0 through the same parser
    val q0 = readPublishMsg(roundTrip(publish("t", Array[Byte](1))))
    q0.qos shouldBe 0
    q0.packetId shouldBe 0
    // truncated bodies fail as clean framing errors, not AIOOBE
    an[java.io.IOException] should be thrownBy
      readPublishMsg(Packet(PUBLISH, 0x02, utf8("t")))
    an[java.io.IOException] should be thrownBy readUtf8(Array[Byte](0, 9), 0)
  }

  test("QoS-1 broker redelivers with DUP after a lost PUBACK (at-least-once)") {
    val broker = new MiniBroker(redeliverAfterMs = 150)
    try {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[MqttCodec.PublishMsg]()
      val latch = new CountDownLatch(4) // 3 messages + 1 redelivery
      val consumer = new MqttClient("127.0.0.1", broker.port, "c-qos1")
      consumer.subscribeMeta("sensors/power") { m => got.add(m); latch.countDown() }
      consumer.dropNextPubacks(1) // "lose" the ack for the first delivery
      Thread.sleep(100)
      val producer = new MqttClient("127.0.0.1", broker.port, "p-qos1")
      val payloads = (1 to 3).map(i => Array[Byte](i.toByte))
      // blocking QoS-1 publish: returns only after the broker's PUBACK
      payloads.foreach(producer.publishQos1("sensors/power", _))
      latch.await(5, TimeUnit.SECONDS) shouldBe true
      import scala.jdk.CollectionConverters._
      val msgs = got.asScala.toSeq
      msgs.count(_.dup) shouldBe 1
      val dup = msgs.find(_.dup).get
      val orig = msgs.filter(!_.dup).find(_.packetId == dup.packetId).get
      dup.payload.toSeq shouldBe orig.payload.toSeq // byte-identical resend
      msgs.filter(!_.dup).map(_.payload.toSeq) shouldBe payloads.map(_.toSeq)
      // the redelivered PUBACK landed: no further retransmissions
      Thread.sleep(500)
      got.size shouldBe 4
      producer.disconnect(); consumer.disconnect()
    } finally broker.close()
  }

  test("publisher DUP retransmission after a late PUBACK re-acks without re-routing") {
    import MqttCodec._
    val broker = new MiniBroker
    try {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[PublishMsg]()
      val latch = new CountDownLatch(2) // message 1 + reused-pid message 2
      val consumer = new MqttClient("127.0.0.1", broker.port, "c-pubdedup")
      consumer.subscribeMeta("sensors/power") { m => got.add(m); latch.countDown() }
      Thread.sleep(100)
      // raw publisher socket — full control of pid and DUP flag
      val sock = new java.net.Socket("127.0.0.1", broker.port)
      val out = new java.io.DataOutputStream(sock.getOutputStream)
      val in = new java.io.DataInputStream(sock.getInputStream)
      writePacket(out, connect("raw-pub"))
      readPacket(in).ptype shouldBe CONNACK
      writePacket(out, publishQos1("sensors/power", 7, Array[Byte](1)))
      readPacket(in).ptype shouldBe PUBACK
      // the producer's view: that PUBACK was late, so it retransmits
      // pid 7 with DUP=1 — the broker must re-ack (retransmit loop
      // stops) but NOT route a second copy to subscribers
      writePacket(out, publishQos1("sensors/power", 7, Array[Byte](1), dup = true))
      readPacket(in).ptype shouldBe PUBACK
      // pid 7 is freed by the ack — a NEW message legitimately reuses
      // it (DUP=0) and MUST route
      writePacket(out, publishQos1("sensors/power", 7, Array[Byte](2)))
      readPacket(in).ptype shouldBe PUBACK
      latch.await(5, TimeUnit.SECONDS) shouldBe true
      Thread.sleep(300) // window in which a wrongly-routed dup would land
      import scala.jdk.CollectionConverters._
      got.asScala.toSeq.map(_.payload.toSeq) shouldBe
        Seq(Seq[Byte](1), Seq[Byte](2))
      sock.close(); consumer.disconnect()
    } finally broker.close()
  }

  test("QoS-1 redelivery → bridge → DSv2 → IngestStream: at-least-once wire, exactly-once table") {
    Broker.clear()
    val broker = new MiniBroker(redeliverAfterMs = 150)
    val dir = java.nio.file.Files.createTempDirectory("mqtt-qos1-e2e").toString
    try {
      val bridge = MqttBridge.start("127.0.0.1", broker.port, "sensors/power")
      bridge.dropNextPubacks(1) // force one broker-level redelivery
      Thread.sleep(100)
      val producer = new MqttClient("127.0.0.1", broker.port, "producer")
      val sent = (1 to 12).map(i => MqttEntry(s"sensor${i % 3}", i * 0.5, i % 2))
      sent.foreach(e => producer.publishQos1("sensors/power", PayloadCodec.encode(e)))
      // wait until the DUP retransmission has arrived at the bridge
      val deadline = System.currentTimeMillis() + 5000
      while (bridge.deliveryCount < sent.size + 1 &&
        System.currentTimeMillis() < deadline) Thread.sleep(20)
      bridge.deliveryCount should be >= sent.size + 1 // duplicate really crossed the wire
      Broker.size shouldBe sent.size // …and the ingest edge absorbed it
      // DSv2 → IngestStream → parquet: the table holds each message once
      val source = spark.readStream
        .format(classOf[BrokerSourceProvider].getName).load()
      val q = graft.streaming.IngestStream.start(
        source, s"$dir/entries", s"$dir/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination(30000) shouldBe true
      val rows = spark.read.parquet(s"$dir/entries")
        .select($"sensor", $"value", $"anomaly").as[MqttEntry].collect().toSeq
      rows.sortBy(e => (e.sensor, e.value)) shouldBe
        sent.sortBy(e => (e.sensor, e.value))
      producer.disconnect(); bridge.disconnect()
    } finally {
      broker.close(); Broker.clear()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("network → bridge → DSv2 micro-batch source → typed decode (S1+S2 end-to-end)") {
    Broker.clear()
    val broker = new MiniBroker
    try {
      val bridge = MqttBridge.start("127.0.0.1", broker.port, "sensors/power")
      val producer = new MqttClient("127.0.0.1", broker.port, "producer")
      val sent = (1 to 20).map(i => MqttEntry(s"sensor${i % 4}", i * 0.25, i % 2))
      Thread.sleep(100)
      sent.foreach(e => producer.publish("sensors/power", PayloadCodec.encode(e)))
      // wait until the bridge has drained the socket into the topic
      val deadline = System.currentTimeMillis() + 5000
      while (Broker.size < sent.size && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      Broker.size shouldBe sent.size
      // the raw DSv2 source now serves bytes that really crossed TCP
      val q = spark.readStream
        .format(classOf[RawBrokerSourceProvider].getName).load()
      val decoded = PayloadCodec.decodeStage(q)
      val sq = decoded.writeStream.format("memory")
        .queryName("mqtt_e2e").outputMode("append").start()
      try {
        sq.processAllAvailable()
        val rows = spark.table("mqtt_e2e").as[MqttEntry].collect().toSeq
        rows.sortBy(e => (e.sensor, e.value)) shouldBe
          sent.sortBy(e => (e.sensor, e.value))
      } finally sq.stop()
      producer.disconnect(); bridge.disconnect()
    } finally { broker.close(); Broker.clear() }
  }
}
