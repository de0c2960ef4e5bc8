package graft

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Components, Dedup}

/** Incremental corpus dedup (q57): the daily-append path must agree with
  * the full-batch rebuild (q50) while touching only the new batch and
  * the persisted index — never re-shingling the old corpus. */
class IncrementalSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def q57 = SparkEntry.queries("q57_incremental_dedup")(spark, dir)
  private def q50 = SparkEntry.queries("q50_dup_clusters")(spark, dir)

  test("incremental assignment equals the full-batch rebuild on new docs") {
    import spark.implicits._
    val inc = q57.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    val full = q50.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val newIds = Dedup.newBatch(spark, dir).select($"doc_id").as[Long].collect().toSet
    inc.keySet shouldBe newIds // one row per incoming doc, no more

    newIds.foreach { id =>
      full.get(id) match {
        case Some(lbl) => // clustered in the full batch → same cluster here
          inc(id)._1 shouldBe lbl
        case None => // full-batch singleton → own cluster, joins nothing
          inc(id) shouldBe ((id, 0))
      }
    }
    // and joins_existing is exactly "my full-batch cluster contains an
    // old doc" (old = split bucket < 90)
    val oldIds = Dedup.oldCorpus(spark, dir).select($"doc_id").as[Long].collect().toSet
    val clustersWithOld = full.collect { case (id, lbl) if oldIds(id) => lbl }.toSet
    newIds.filter(full.contains).foreach { id =>
      inc(id)._2 shouldBe (if (clustersWithOld(full(id))) 1 else 0)
    }
  }

  test("warm incremental step never re-shingles: no shingle transform, index from cache") {
    q57.count() // warm the persisted state (index, prior labels, new sigs)
    val p = q57.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // assignment labels come from the persisted intermediate …
    p should include("InMemoryTableScan")
    // … so no branch of the plan tokenizes or shingles ANY document —
    // the shingle explode ("transform(sequence(…)") appears nowhere
    (p should not).include("transform(sequence")
    // the only parquet read is the new-batch id scan for the output join
    // (formatted explain names each node twice: tree line + detail header)
    p.sliding("Scan parquet".length).count(_ == "Scan parquet") shouldBe 2
  }

  test("continuous shard ingestion: streaming micro-batches assign like the one-shot batch") {
    import spark.implicits._
    // the reference's consumer is a CONTINUOUS upsert loop, not a daily
    // batch — this is q57's protocol run per micro-batch: band the
    // arriving shard, edge it against the index state, assign, then
    // APPEND the shard's bands + labels to the state. Arrival order
    // groups docs by their q57 cluster (clusters are connected
    // components, so no edges straddle batches and labels must equal the
    // one-shot q57 assignment exactly); the appended state must not
    // fabricate cross-cluster merges in later batches.
    val q57 = SparkEntry.queries("q57_incremental_dedup")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val texts = Dedup.newBatch(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val batches: Seq[Seq[(Long, String)]] = (0 to 1).map(p =>
      q57.collect { case (id, cl) if (cl % 2 + 2) % 2 == p => id -> texts(id) }.toSeq)

    var indexBands = Dedup.oldBands(spark, dir)
    var priorLabels = Dedup.oldLabels(spark, dir)
    val assigned = scala.collection.mutable.Map[Long, Long]()

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val q = source.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          val docs = batch.persist()
          val bands = Dedup.bandsForDocs(docs).persist()
          val labels = Components.run(
            Dedup.incrementalEdges(bands, indexBands, priorLabels)).labels
          val asg = docs.select($"doc_id")
            .join(labels, Seq("doc_id"), "left_outer")
            .select($"doc_id", coalesce($"lbl", $"doc_id").as("lbl"))
            .as[(Long, Long)].collect()
          asg.foreach { case (id, cl) => assigned(id) = cl }
          // state append — what a production loop persists between runs
          indexBands = indexBands.unionByName(bands)
          priorLabels = priorLabels.unionByName(
            asg.toSeq.toDF("doc_id", "lbl"))
          docs.unpersist()
        }
        ()
      }
      .start()
    batches.foreach { b => source.addData(b); q.processAllAvailable() }
    // a third, fabricated shard: one exact copy of an indexed old doc
    // (must land in that doc's cluster via the appended state) and one
    // novel doc (must stay a singleton)
    val oldDoc = Dedup.oldCorpus(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].head()
    val oldCluster = priorLabels.filter($"doc_id" === oldDoc._1)
      .select($"lbl").as[Long].collect().headOption.getOrElse(oldDoc._1)
    source.addData(Seq(900001L -> oldDoc._2, 900002L -> "zzqx plvnt grotk wfmb yxxo"))
    q.processAllAvailable()
    q.stop()

    q57.foreach { case (id, cl) => assigned(id) shouldBe cl }
    assigned(900001L) shouldBe oldCluster
    assigned(900002L) shouldBe 900002L
  }

  test("the persisted index holds only old docs; new signatures only new docs") {
    import spark.implicits._
    val newIds = Dedup.newBatch(spark, dir).select($"doc_id").as[Long].collect().toSet
    val indexIds = Dedup.oldBands(spark, dir)
      .select($"doc_id").distinct().as[Long].collect().toSet
    indexIds.intersect(newIds) shouldBe empty
    val sigIds = Dedup.sigNew(spark, dir).select($"doc_id").as[Long].collect().toSet
    sigIds.diff(newIds) shouldBe empty
  }
}
