package graft

/** IVF ANN structure checks: probing only the query's inverted list,
  * ranked output shape, and non-degenerate recall vs brute force. */
class IvfSpec extends SparkSpecBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("IVF top-k probes one cluster and ranks by cosine") {
    val ivf = SparkEntry.queries("q41_knn_ivf")(spark, sfDir)
      .as[(Long, Int, Long, Double, Int)].collect()
    ivf should not be empty
    // per query: ≤5 ranked neighbors, one cluster, descending cosine
    ivf.groupBy(_._1).foreach { case (_, rows) =>
      rows.length should be <= 5
      rows.map(_._2).distinct.length shouldBe 1
      val cosines = rows.sortBy(_._5).map(_._4)
      cosines.zip(cosines.tail).foreach { case (hi, lo) => hi should be >= lo }
      rows.foreach(r => r._4 should (be >= -1.0 and be <= 1.0))
    }
  }

  test("IVF neighbors overlap brute-force neighbors (non-degenerate recall)") {
    val brute = SparkEntry.queries("q29_knn_brute_force")(spark, sfDir)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = SparkEntry.queries("q41_knn_ivf")(spark, sfDir)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // at least one query's IVF list intersects its brute-force top-10
    // (random synthetic vectors make clusters weak; zero overlap across
    // ALL queries would mean the probe logic is broken)
    val overlaps = ivf.map { case (q, ns) =>
      brute.getOrElse(q, Set.empty).intersect(ns).size
    }
    overlaps.sum should be > 0
  }

  test("streaming index append equals the batch build row for row") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val out = java.nio.file.Files.createTempDirectory("ivfidx").toString
    val vecs = graft.sources.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val (shard1, shard2) = vecs.splitAt(vecs.length / 2)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(Long, Array[Float])]
    // per micro-batch: pure per-row algebra appended to the index dir —
    // the production maintenance loop of the q96 index
    val q = source.toDS().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.Similarity.indexRows(batch)
          .write.mode("append").parquet(out)
        ()
      }
      .start()
    source.addData(shard1.toSeq); q.processAllAvailable()
    source.addData(shard2.toSeq); q.processAllAvailable()
    q.stop()

    // the streamed index is bit-identical to a batch rebuild: same
    // cells, same packed codes, same affine/norm headers
    val streamed = spark.read.parquet(out).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Int]("cluster"), r.getAs[Array[Byte]]("codes").toSeq,
          r.getAs[Double]("vmin"), r.getAs[Double]("span"),
          r.getAs[Double]("rnrm"), r.getAs[Double]("nrm")))).toMap
    val batchBuilt = graft.operators.Similarity.indexRows(
      graft.sources.Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding"))
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Int]("cluster"), r.getAs[Array[Byte]]("codes").toSeq,
          r.getAs[Double]("vmin"), r.getAs[Double]("span"),
          r.getAs[Double]("rnrm"), r.getAs[Double]("nrm")))).toMap
    streamed.keySet shouldBe batchBuilt.keySet
    streamed.foreach { case (id, row) => row shouldBe batchBuilt(id) }
    // and the cells agree with the catalog's 16-cell probe geometry
    // (indexRows serves q96's pinned-nlist index; q68 now audits the
    // √N geometry, so it is no longer this index's occupancy report)
    val cellCounts = streamed.values.groupBy(_._1).view.mapValues(_.size).toMap
    val assigned = graft.operators.Similarity.assignCells(
      graft.sources.Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding"), 16)
      .groupBy($"cluster").count().as[(Int, Long)].collect().toMap
    cellCounts.foreach { case (cell, n) => assigned(cell) shouldBe n.toLong }
  }
}
