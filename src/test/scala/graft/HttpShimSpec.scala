package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.sql.Timestamp

import graft.core.SensorMeta
import graft.serve.HttpShim
import graft.sources.broker.Broker
import graft.streaming.SnapshotStore

/** The reference endpoint surface over HTTP: `/` (full analysis),
  * `/stress` (snapshot), `/history`, `POST /mqtt` (publish). */
class HttpShimSpec extends SparkSpecBase {

  private val meta = SensorMeta("s1",
    Timestamp.from(java.time.Instant.parse("2017-11-07T08:14:10.001Z")), 0.2, -1.0, 0.2)

  test("all four reference routes respond") {
    SnapshotStore.clear()
    Broker.clear()
    var analyzeCalls = 0
    val shim = new HttpShim(
      fullAnalyze = () => { analyzeCalls += 1; SnapshotStore.update(Seq(meta)); Seq(meta) },
      history = n => Seq.fill(math.min(n, 3))(meta))
    val port = shim.start()
    val client = HttpClient.newHttpClient()
    def get(path: String): HttpResponse[String] =
      client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
    try {
      // full analysis recomputes and refreshes the snapshot
      val root = get("/")
      root.statusCode() shouldBe 200
      root.body() should include(""""name":"s1"""")
      analyzeCalls shouldBe 1

      // stress mode serves the snapshot without recompute
      val stress = get("/stress")
      stress.body() should include(""""name":"s1"""")
      analyzeCalls shouldBe 1

      get("/history?n=2").body().count(_ == '{') shouldBe 3 // envelope + 2

      // publish to the broker topic
      val post = client.send(
        HttpRequest.newBuilder(URI.create(
          s"http://127.0.0.1:$port/mqtt?sensor=s9&value=42.5&anomaly=0"))
          .POST(HttpRequest.BodyPublishers.noBody()).build(),
        HttpResponse.BodyHandlers.ofString())
      post.statusCode() shouldBe 200
      Broker.size shouldBe 1
      Broker.slice(0, 1).head.sensor shouldBe "s9"

      get("/nope").statusCode() shouldBe 404

      // percent-encoded names decode (the reference's sensors have spaces)
      client.send(
        HttpRequest.newBuilder(URI.create(
          s"http://127.0.0.1:$port/mqtt?sensor=Motel%206&value=7.5&anomaly=0"))
          .POST(HttpRequest.BodyPublishers.noBody()).build(),
        HttpResponse.BodyHandlers.ofString()).statusCode() shouldBe 200
      Broker.slice(1, 2).head.sensor shouldBe "Motel 6"

      // malformed numbers yield a 400, not a dropped connection
      get("/history?n=abc").statusCode() shouldBe 400
      client.send(
        HttpRequest.newBuilder(URI.create(
          s"http://127.0.0.1:$port/mqtt?sensor=s&value=abc"))
          .POST(HttpRequest.BodyPublishers.noBody()).build(),
        HttpResponse.BodyHandlers.ofString()).statusCode() shouldBe 400
    } finally {
      shim.stop()
      Broker.clear()
      SnapshotStore.clear()
    }
  }

  test("POST /update flips per-sensor anomaly episodes on the producer") {
    import graft.streaming.ProducerSim
    ProducerSim.reset()
    val shim = new HttpShim(fullAnalyze = () => Seq.empty, history = _ => Seq.empty)
    val port = shim.start()
    val client = HttpClient.newHttpClient()
    def post(path: String): HttpResponse[String] = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())
    try {
      val rnd = new java.util.Random(7)
      post("/update?sensor=s1&anomaly=1").statusCode() shouldBe 200
      // an EPISODE: every tick while the state is on is anomalous, with
      // out-of-band magnitude — not an i.i.d. per-record draw
      (1 to 3).foreach { _ =>
        val ep = ProducerSim.tick(Seq("s1", "s2"), 100.0, rnd)
        val s1 = ep.find(_.sensor == "s1").get
        s1.anomaly shouldBe 1
        math.abs(s1.value) should be >= 100.0
        val s2 = ep.find(_.sensor == "s2").get
        s2.anomaly shouldBe 0
        math.abs(s2.value) should be < 100.0
      }
      post("/update?sensor=s1&anomaly=0").statusCode() shouldBe 200
      val back = ProducerSim.tick(Seq("s1"), 100.0, rnd).head
      back.anomaly shouldBe 0
      math.abs(back.value) should be < 100.0
      // an omitted anomaly param is a 400 and must NOT flip the episode
      // on (round-2 advisory: accidental POST /update?sensor=s1 started
      // an episode under the old default)
      post("/update?sensor=s1").statusCode() shouldBe 400
      ProducerSim.tick(Seq("s1"), 100.0, rnd).head.anomaly shouldBe 0
    } finally {
      shim.stop()
      ProducerSim.reset()
    }
  }

  test("400 bodies stay valid JSON when the exception message has quotes") {
    val shim = new HttpShim(fullAnalyze = () => Seq.empty, history = _ => Seq.empty)
    val port = shim.start()
    val client = HttpClient.newHttpClient()
    try {
      // NumberFormatException's message quotes the input: For input string: "%22"
      val r = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/history?n=%22")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      r.statusCode() shouldBe 400
      r.body() should include("\\\"") // the quote arrived escaped
      // the whole body parses as {"error": <one well-formed JSON string>}
      r.body() should fullyMatch regex """\{"error":"(?:[^"\\]|\\.)*"\}"""
    } finally shim.stop()
  }
}
