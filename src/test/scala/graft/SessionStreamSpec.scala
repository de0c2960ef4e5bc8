package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.SessionStream

/** Native session_window streaming sessionization: closed sessions must
  * equal the batch recompute over the same rows (the DriftStream
  * batch-equivalence contract), emission is append-mode exactly-once
  * (a session only appears after the watermark passes its end), and
  * the session rule agrees with q44's gap formulation on real data. */
class SessionStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def streamSessions(
      batches: Seq[Seq[(Long, Timestamp)]]): Seq[(Long, Long, Long, Long)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp)]
    val name = s"sessout${System.nanoTime()}"
    val q = SessionStream.sessions(
        source.toDS().toDF("user_id", "ts"), gap = "30 minutes",
        lateness = "1 minute")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    batches.foreach { b => source.addData(b); q.processAllAvailable() }
    q.stop()
    spark.table(name)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
  }

  private def us(t: String): Timestamp = Timestamp.valueOf(t)

  test("closed sessions equal the batch recompute; open sessions stay unemitted") {
    val early = Seq(
      (1L, us("2024-01-01 10:00:00")), (1L, us("2024-01-01 10:10:00")),
      (2L, us("2024-01-01 10:05:00")))
    // >30 min after user 1's last event: closes their first session once
    // the watermark (max event time − 1 min) passes its end
    val late = Seq((1L, us("2024-01-01 11:30:00")), (2L, us("2024-01-01 11:40:00")))
    // push the watermark far past everything so all sessions close
    val flush = Seq((99L, us("2024-01-02 00:00:00")), (99L, us("2024-01-03 00:00:00")))
    val got = streamSessions(Seq(early, late, flush))
    // batch recompute with the SAME expression over the union
    val all = (early ++ late ++ flush).toDF("user_id", "ts")
    val want = SessionStream.sessions(all)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    // the stream cannot close user 99's last session (nothing advances
    // the watermark past it) — everything else must match exactly
    val wantClosed = want.filterNot(r => r._1 == 99L && r._2 == us("2024-01-03 00:00:00").getTime * 1000)
    got shouldBe wantClosed
    // session merge semantics: user 1's first two events fused
    got.count(_._1 == 1L) shouldBe 2
    got.find(r => r._1 == 1L && r._4 == 2).get._2 shouldBe
      us("2024-01-01 10:00:00").getTime * 1000
  }

  test("session_window agrees with q44's gap rule on the events fixture") {
    val ev = sources.Tables.events(spark, dir).select($"user_id", $"ts")
    val native = SessionStream.sessions(ev)
      .select($"user_id", $"n_events").as[(Long, Long)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    val q44 = SparkEntry.queries("q44_sessionize")(spark, dir)
      .select($"user_id", $"n_events").as[(Long, Long)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    // same multiset of (user, session size): the > vs >= boundary is
    // measure-zero at micro resolution and absent from this fixture
    native shouldBe q44
  }
}
