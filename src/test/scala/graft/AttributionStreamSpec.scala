package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.AttributionStream

/** Watermarked stream-stream tolerance join: the streamed pairs must
  * equal the batch evaluation of the SAME join expression over the
  * union of all micro-batches (the SessionStream batch-equivalence
  * contract), pairs must keep arriving across micro-batch boundaries
  * (a click buffered in state matches a purchase that arrives later),
  * and the emitted pair set must agree with q183's per-purchase
  * candidate set on the events fixture. */
class AttributionStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def streamMatches(
      pBatches: Seq[Seq[(Long, Long, Timestamp)]],
      cBatches: Seq[Seq[(Long, Long, Timestamp)]]): Seq[(Long, Long, Long)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ps = MemoryStream[(Long, Long, Timestamp)]
    val cs = MemoryStream[(Long, Long, Timestamp)]
    val name = s"attrout${System.nanoTime()}"
    val q = AttributionStream.matches(
        ps.toDS().toDF("user_id", "purchase_id", "p_ts"),
        cs.toDS().toDF("c_user", "click_id", "c_ts"),
        tolerance = "10 minutes", lateness = "1 minute")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    pBatches.zipAll(cBatches, Seq.empty, Seq.empty).foreach { case (pb, cb) =>
      if (pb.nonEmpty) ps.addData(pb)
      if (cb.nonEmpty) cs.addData(cb)
      q.processAllAvailable()
    }
    q.stop()
    spark.table(name).select($"user_id", $"purchase_id", $"click_id")
      .as[(Long, Long, Long)].collect().toSeq.sorted
  }

  test("streamed pairs equal the batch join; state survives micro-batch boundaries") {
    // batch 1: clicks only — they must be BUFFERED in join state
    val c1 = Seq((1L, 101L, ts("2024-01-01 10:00:00")),
      (1L, 102L, ts("2024-01-01 10:08:00")),
      (2L, 201L, ts("2024-01-01 10:00:00")))
    // batch 2: purchases — user 1 in range of both clicks, user 2 in
    // range of its click, user 3 has no clicks at all
    val p2 = Seq((1L, 11L, ts("2024-01-01 10:05:00")),
      (2L, 21L, ts("2024-01-01 10:30:00")), // 30 min after the click: NO match
      (3L, 31L, ts("2024-01-01 10:05:00")))
    // batch 3: a late click for user 3 within tolerance of its purchase
    val c3 = Seq((3L, 301L, ts("2024-01-01 10:10:00")))
    val got = streamMatches(
      Seq(Seq.empty, p2, Seq.empty),
      Seq(c1, Seq.empty, c3))
    // batch recompute with the SAME expression over the unions
    val want = AttributionStream.matches(
        p2.toDF("user_id", "purchase_id", "p_ts"),
        (c1 ++ c3).toDF("c_user", "click_id", "c_ts"),
        tolerance = "10 minutes")
      .select($"user_id", $"purchase_id", $"click_id")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    got shouldBe want
    // the cross-batch matches really happened
    got should contain allOf ((1L, 11L, 101L), (1L, 11L, 102L), (3L, 31L, 301L))
    // and the out-of-tolerance purchase matched nothing
    got.map(_._1) should not contain 2L
  }

  test("batch form of the stream join covers q183's matched pairs on the fixture") {
    val ev = sources.Tables.events(spark, dir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts".as("p_ts"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"event_id".as("click_id"), $"ts".as("c_ts"))
    val all = AttributionStream.matches(purchases, clicks)
      .select($"purchase_id", $"click_id").as[(Long, Long)].collect().toSet
    // q183 picks the NEAREST in-tolerance click per purchase — that
    // choice must be among the stream join's emitted candidates
    val nearest = SparkEntry.queries("q183_nearest_event")(spark, dir)
      .select($"purchase_id", $"click_id").as[(Long, Long)].collect().toSet
    nearest.subsetOf(all) shouldBe true
    // and every stream pair really is in tolerance (no watermark on
    // batch: the predicate alone must bound it)
    val dts = AttributionStream.matches(purchases, clicks)
      .select($"dt_us").as[Long].collect()
    all.size should be >= nearest.size
    dts.foreach(dt => math.abs(dt) should be <= 10L * 60 * 1000000)
  }
}
