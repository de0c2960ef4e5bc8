package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.DriftStream
import graft.streaming.DriftStream.{RefSpec, ValueReading}

/** Streaming drift monitor: closed windows must score exactly like the
  * batch PSI algebra (q142's formula) over the same rows, window
  * closure is exactly-once across micro-batches, and late readings
  * behind the open window drop instead of rewriting emitted scores. */
class DriftStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(ref: Map[String, RefSpec], windowUs: Long,
      batches: Seq[Seq[ValueReading]]): Seq[(String, Long, Long, Double)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[ValueReading]
    val name = s"driftout${System.nanoTime()}"
    val q = DriftStream.monitor(source.toDS(), ref, windowUs)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    batches.foreach { b => source.addData(b); q.processAllAvailable() }
    q.stop()
    spark.table(name)
      .select($"event_type", $"window_start_us", $"n", $"psi")
      .as[(String, Long, Long, Double)].collect().toSeq.sorted
  }

  private def batchPsi(ref: RefSpec, vals: Seq[Double]): Double = {
    def bin(v: Double): Int =
      if (ref.w == 0) 0
      else math.min(9, math.max(0, math.floor((v - ref.lo) / ref.w).toInt))
    val counts = Array.fill(10)(0L)
    vals.foreach(v => counts(bin(v)) += 1)
    (0 until 10).map { b =>
      val p = math.max(counts(b).toDouble / vals.size, 1e-6)
      val q = math.max(ref.shares(b), 1e-6)
      (p - q) * math.log(p / q)
    }.sum
  }

  test("windows close exactly once on advance; stable ~0, shifted large; late drops") {
    val uniform = RefSpec(0.0, 1.0, Seq.fill(10)(0.1))
    val ref = Map("m" -> uniform)
    // window 0: one value per bin — matches the reference exactly
    val w0 = (0 until 10).map(b => ValueReading("m", b.toLong, b + 0.5))
    // window 1: all mass in bin 9 — maximal drift
    val w1 = (0 until 10).map(i => ValueReading("m", 1000 + i.toLong, 9.5))
    val got = run(ref, 1000L, Seq(
      w0, // batch 1: window 0 stays OPEN — nothing emits
      w1, // batch 2: advance closes w0 and opens window 1
      // batch 3: a reading behind the CLOSED w0 drops (never a rewrite);
      // the t=2000 reading advances past w1 and closes it
      Seq(ValueReading("m", 150, 0.5), ValueReading("m", 2000, 0.5))))
    got.length shouldBe 2
    val (_, s0, n0, psi0) = got(0)
    s0 shouldBe 0L
    n0 shouldBe 10L // the late reading did NOT sneak into the closed window
    psi0 shouldBe 0.0 +- 1e-12 // live shares == reference shares exactly
    val (_, s1, n1, psi1) = got(1)
    s1 shouldBe 1000L
    n1 shouldBe 10L
    psi1 shouldBe batchPsi(uniform, w1.map(_.value)) +- 1e-12
    psi1 should be > 1.0 // total-mass shift is loud, not a rounding blip
  }

  test("streamed windows equal the batch PSI recompute on real events") {
    val cutoffUs = 1705363200000000L
    val ev = sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_type", unix_micros($"ts").as("us"), $"value")
    val ref = DriftStream.referenceOf(
      ev.filter($"us" < cutoffUs).select($"event_type", $"value"))
    ref.keySet should not be empty

    val post = ev.filter($"us" >= cutoffUs)
      .as[ValueReading].collect().sortBy(_.us)
    val windowUs = 7L * 24 * 3600 * 1000000 // weekly windows
    val (b1, b2) = post.splitAt(post.length / 2)
    // a far-future sentinel per type closes every trailing window
    val sentinel = post.map(_.event_type).distinct
      .map(t => ValueReading(t, Long.MaxValue / 2, 0.0))
    val got = run(ref, windowUs, Seq(b1.toSeq, b2.toSeq ++ sentinel))

    val expected = post.groupBy(_.event_type).toSeq.flatMap { case (tpe, rs) =>
      rs.groupBy(r => r.us - java.lang.Math.floorMod(r.us, windowUs))
        .map { case (ws, wrs) =>
          (tpe, ws, wrs.length.toLong, batchPsi(ref(tpe), wrs.map(_.value).toSeq))
        }
    }.sorted
    got.length shouldBe expected.length
    for (((gt, gs, gn, gp), (et, es, en, ep)) <- got.zip(expected)) {
      gt shouldBe et
      gs shouldBe es
      gn shouldBe en
      gp shouldBe ep +- 1e-12
    }
  }
}
