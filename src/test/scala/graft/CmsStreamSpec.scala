package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.CmsStream

/** Continuous CMS maintenance: the streamed sketch must equal the batch
  * sketch over the same tokens cell-for-cell (complete-mode snapshot ≡
  * q188's build — the DriftStream batch-equivalence contract), state
  * stays bounded at d·w cells, and estimates read from the streamed
  * sketch keep the one-sided CMS law. */
class CmsStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streamed sketch equals the batch sketch cell-for-cell across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[String]
    val name = s"cmsout${System.nanoTime()}"
    val q = CmsStream.cells(source.toDS().toDF("w"))
      .writeStream.format("memory").queryName(name).outputMode("complete").start()
    val batch1 = Seq("the", "quick", "brown", "fox", "the", "the")
    val batch2 = Seq("jumps", "over", "the", "lazy", "dog", "fox")
    source.addData(batch1); q.processAllAvailable()
    source.addData(batch2); q.processAllAvailable()
    q.stop()
    val streamed = spark.table(name)
      .as[(Int, Long, Long)].collect().toSeq.sorted
    val batch = CmsStream.cells((batch1 ++ batch2).toDF("w"))
      .as[(Int, Long, Long)].collect().toSeq.sorted
    streamed shouldBe batch
    // bounded state: never more than d*w cells, counts conserve tokens
    streamed.size should be <= operators.TextAnalysis.CmsD * operators.TextAnalysis.CmsW
    streamed.map(_._3).sum shouldBe
      (batch1.size + batch2.size).toLong * operators.TextAnalysis.CmsD
  }

  test("estimates from the streamed sketch keep the one-sided CMS law on the corpus") {
    // drive the real corpus token stream through the same expression in
    // batch (the stream/batch identity is proven above) and check that
    // min-over-rows estimates dominate exact counts
    val toks = sources.Tables.documents(spark, dir)
      .select(explode(split($"text", "\\s+")).as("w"))
    val cells = CmsStream.cells(toks).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val exact = toks.groupBy($"w").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"w".asc).limit(10)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val probes = exact.map(_._1).toSeq.toDF("w")
      .select($"w", explode(operators.TextAnalysis.cmsProbes($"w")).as("p"))
      .select($"w", $"p.r", $"p.col")
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    for ((w, c) <- exact) {
      val est = probes(w).map(cells(_)).min
      est should be >= c
    }
  }
}
