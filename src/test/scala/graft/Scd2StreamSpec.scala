package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Scd2Stream
import graft.streaming.Scd2Stream.AttrReading

/** Streaming SCD2 maintenance: closed versions emitted across
  * micro-batches must equal the batch build's closed versions (q110's
  * is_current = 0 rows), late arrivals behind the open version drop,
  * and state never grows with history. */
class Scd2StreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(batches: Seq[Seq[AttrReading]]): Seq[(Long, Int, String, Long, Long, Long)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[AttrReading]
    val name = s"scd2out${System.nanoTime()}"
    val q = Scd2Stream.versions(source.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    batches.foreach { b => source.addData(b); q.processAllAvailable() }
    q.stop()
    spark.table(name)
      .select($"user_id", $"ver", $"attr", $"validFromUs", $"validToUs", $"nObs")
      .as[(Long, Int, String, Long, Long, Long)].collect().toSeq.sorted
  }

  test("closed versions across batches; version open at a batch boundary survives it") {
    val got = run(Seq(
      Seq(AttrReading(1, 10, 100, "a"), AttrReading(1, 20, 101, "a"),
        AttrReading(1, 30, 102, "b")),
      // v2 ("b") spans the batch boundary: grew in batch 1, closed in 2
      Seq(AttrReading(1, 40, 103, "b"), AttrReading(1, 50, 104, "a"),
        // late arrival behind the open version: dropped, never a rewrite
        AttrReading(1, 15, 105, "z"),
        // second key is independent state
        AttrReading(2, 10, 200, "x"))))
    got shouldBe Seq(
      (1L, 1, "a", 10L, 30L, 2L), // closed by the first "b"
      (1L, 2, "b", 30L, 50L, 2L)) // closed by "a" in batch 2, nObs spans batches
    // user 2's open "x" and user 1's open v3 "a" are state, not output
  }

  test("streamed closed versions equal the batch build on real events") {
    val users = sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"user_id").distinct().orderBy($"user_id").limit(3)
      .as[Long].collect().toSet
    val readings = sources.Tables.events(spark, "/root/testdata/sf0.001")
      .filter($"user_id".isin(users.toSeq: _*))
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id",
        $"event_type".as("attr"))
      .as[AttrReading].collect().sortBy(r => (r.us, r.event_id))
    val (b1, b2) = readings.splitAt(readings.length / 2)
    val streamed = run(Seq(b1.toSeq, b2.toSeq))

    val batch = SparkEntry.queries("q110_scd2_history")(spark, "/root/testdata/sf0.001")
      .filter($"user_id".isin(users.toSeq: _*) && $"is_current" === 0)
      .select($"user_id", $"ver", $"attr", $"valid_from_us", $"valid_to_us", $"n_obs")
      .as[(Long, Int, String, Long, Long, Long)].collect().toSeq.sorted
    streamed shouldBe batch
  }
}
