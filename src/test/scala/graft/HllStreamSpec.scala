package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.HllStream

/** Continuous NDV maintenance: the streamed per-source sketches must
  * equal a batch rebuild over the same tokens estimate-for-estimate
  * (register-max is order-independent — the CmsStream batch-equivalence
  * contract in the cardinality domain), state stays at one sketch per
  * source, and the union snapshot tracks the corpus distinct. */
class HllStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streamed per-source estimates equal the batch rebuild across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(String, String)]
    val name = s"hllout${System.nanoTime()}"
    val q = HllStream.perSource(source.toDS().toDF("source", "w"))
      .writeStream.format("memory").queryName(name).outputMode("complete").start()
    val batch1 = Seq("a" -> "the", "a" -> "quick", "b" -> "fox", "a" -> "the")
    val batch2 = Seq("b" -> "fox", "b" -> "dog", "a" -> "lazy", "c" -> "the")
    source.addData(batch1); q.processAllAvailable()
    source.addData(batch2); q.processAllAvailable()
    q.stop()
    val streamed = spark.table(name)
      .as[(String, Long)].collect().toMap
    val batch = HllStream.perSource((batch1 ++ batch2).toDF("source", "w"))
      .as[(String, Long)].collect().toMap
    streamed shouldBe batch
    // small cardinalities: the sparse-mode sketch is exact
    streamed shouldBe Map("a" -> 3L, "b" -> 2L, "c" -> 1L)
  }

  test("union runs AS A STREAMING AGGREGATE and tracks the corpus NDV") {
    // the documented capability — corpus-wide NDV maintained
    // continuously — must actually pass streaming analysis (a chained
    // groupBy→union spelling would throw 'multiple streaming
    // aggregations'); this starts the query and checks the snapshot
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(String, String)]
    val name = s"hllu${System.nanoTime()}"
    val q = HllStream.union(source.toDS().toDF("source", "w"))
      .writeStream.format("memory").queryName(name).outputMode("complete").start()
    source.addData(Seq("a" -> "the", "a" -> "quick", "b" -> "fox"))
    q.processAllAvailable()
    source.addData(Seq("b" -> "dog", "c" -> "the", "c" -> "quick"))
    q.processAllAvailable()
    q.stop()
    // sparse-mode exactness at tiny cardinality: 4 distinct tokens
    spark.table(name).as[Long].head() shouldBe 4L
  }

  test("union snapshot tracks the corpus distinct on the real token stream") {
    val toks = sources.Tables.documents(spark, dir)
      .select($"source", explode(split($"text", "\\s+")).as("w"))
    val est = HllStream.union(toks).as[Long].head()
    val exact = toks.select($"w").distinct().count()
    math.abs(est - exact).toDouble / exact should be <= 0.05
    // and a per-source snapshot is one row per source — the bounded
    // state contract
    HllStream.perSource(toks).count() shouldBe
      toks.select($"source").distinct().count()
  }
}
