package graft

import org.apache.spark.sql.functions._

import graft.core.Heuristic
import graft.functions.Portable

/** Foundation guards: the portable hash (basis of every MinHash/SimHash/
  * fingerprint oracle) must equal a plain-JVM md5 computation, and the
  * σ=0 heuristic edge keeps its documented semantics. */
class PortableSpec extends SparkSpecBase {
  import spark.implicits._

  test("hash32 equals plain-JVM first-32-md5-bits for varied inputs") {
    def jvmHash32(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    val samples = Seq("", "a", "spark join merge", "the fast key",
      "ünïcode Ω 中文", "0", "a b c", "x" * 500)
    val fromSpark = samples.toDF("s")
      .select($"s", Portable.hash32($"s").as("h")).as[(String, Long)]
      .collect().toMap
    samples.foreach { s =>
      fromSpark(s) shouldBe jvmHash32(s)
      fromSpark(s) should be >= 0L
      fromSpark(s) should be < (1L << 32)
    }
  }

  test("zero-variance window: heuristic is NaN in Scala (reference semantics), NULL in oracle queries") {
    // the plain-Scala reference formula propagates 0/0 = NaN, exactly
    // like the reference's Double arithmetic (Analyzer.scala:54-58)
    Heuristic.score(5.0, 5.0, 0.0).isNaN shouldBe true
    // the serving layer renders that as JSON null (ServingSpec) and the
    // oracle-checked queries CASE it to NULL on both engines — assert
    // the column guard here on a constant-value group
    val df = Seq(("k", 7.0), ("k", 7.0), ("k", 7.0)).toDF("sensor", "value")
      .groupBy($"sensor")
      .agg(avg($"value").as("avg_v"), stddev_pop($"value").as("std_v"), max($"value").as("last_v"))
      .select(when($"std_v" === 0.0, lit(null).cast("double"))
        .otherwise(graft.operators.Anomaly.heuristicScore($"last_v", $"avg_v", $"std_v"))
        .as("fast"))
    df.head().isNullAt(0) shouldBe true
  }

  test("RecordStamp.next: unique + strictly increasing under contention, clamps to base") {
    import graft.functions.RecordStamp
    // clamp: a base ahead of the register is returned verbatim (only
    // +2 s so the shared-JVM register re-syncs with the wall clock
    // moments later and other suites stamp normally)
    val future = System.currentTimeMillis() * 1000L + 2L * 1000000L
    RecordStamp.next(future) shouldBe future
    // uniqueness under contention: 8 threads × 10k stamps off the same
    // (now stale) base must never collide and always move forward
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val all = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val tasks = (1 to 8).map { _ =>
      pool.submit(new Runnable {
        def run(): Unit = (1 to 10000).foreach(_ => all.add(RecordStamp.next(future)))
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    all.size shouldBe 8 * 10000 // every stamp distinct
    import scala.jdk.CollectionConverters._
    all.asScala.min should be > future // all after the clamped probe
  }

  test("detRoundSql: rewrites 2-arg rounds, is opaque to string literals") {
    import graft.functions.Portable.detRoundSql
    // basic rewrite + nested recursion
    detRoundSql("SELECT round(x, 2) AS r") shouldBe
      "SELECT floor((x) * 100.0 + 0.5) / 100.0 AS r"
    detRoundSql("round(round(x, 4) / n, 2)") shouldBe
      "floor((floor((x) * 10000.0 + 0.5) / 10000.0 / n) * 100.0 + 0.5) / 100.0"
    // 1-arg and non-literal scales untouched
    detRoundSql("round(x) + round(x, n)") shouldBe "round(x) + round(x, n)"
    // literals are opaque: 'round(' inside a string must NOT be
    // rewritten, and parens/commas inside literals must not confuse
    // the balance scan of a REAL round around them
    detRoundSql("SELECT 'round(x, 2)' AS s") shouldBe "SELECT 'round(x, 2)' AS s"
    detRoundSql("round(strpos(t, '(,)') + x, 2)") shouldBe
      "floor((strpos(t, '(,)') + x) * 100.0 + 0.5) / 100.0"
    // SQL '' escape inside a literal stays inside the literal
    detRoundSql("SELECT 'it''s round(a, 1)' AS s, round(y, 1) AS r") shouldBe
      "SELECT 'it''s round(a, 1)' AS s, floor((y) * 10.0 + 0.5) / 10.0 AS r"
    // copied-through literals survive byte-for-byte (the append path)
    detRoundSql("date_trunc('day', ts)") shouldBe "date_trunc('day', ts)"
  }
}
