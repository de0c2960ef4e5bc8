package graft

import org.apache.spark.sql.functions._

import graft.functions.{MinHashAggregator, Portable}
import graft.operators.Dedup
import graft.sources.Tables

/** The typed sketch aggregator must produce exactly the signatures of
  * the column-algebra MinHash (q24) — same permutations, one pass,
  * associative merge. */
class MinHashAggregatorSpec extends SparkSpecBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("single-pass Aggregator signatures equal the 8-way min() signatures") {
    val agg = new MinHashAggregator(Dedup.K, Dedup.A, Dedup.B, Dedup.P)
    val hashed = Tables.documents(spark, sfDir)
      .withColumn("t", Portable.tokens($"text"))
      .filter(org.apache.spark.sql.functions.size($"t") >= 3)
      .select($"doc_id", explode(expr(
        "transform(sequence(0, size(t)-3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))")).as("s"))
      .distinct()
      .select($"doc_id", Portable.hash32($"s").as("h"))
      .as[(Long, Long)]

    val viaAggregator = hashed
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn)
      .collect().toMap

    val viaColumns = SparkEntry.queries("q24_minhash_signatures")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> (1 to Dedup.K).map(r.getLong).toArray)
      .toMap

    viaAggregator.keySet shouldBe viaColumns.keySet
    viaAggregator.foreach { case (doc, sig) =>
      sig.toSeq shouldBe viaColumns(doc).toSeq
    }
    // partial-merge associativity: repartitioned input gives identical sketches
    val repartitioned = hashed.repartition(13)
      .groupByKey(_._1).mapValues(_._2).agg(agg.toColumn).collect().toMap
    repartitioned.foreach { case (doc, sig) =>
      sig.toSeq shouldBe viaColumns(doc).toSeq
    }
  }

  test("q92: source signatures are the element-wise min of doc signatures (mergeability)") {
    val docSigs = SparkEntry.queries("q24_minhash_signatures")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (0 until 8).map(j => r.getAs[Long](s"m$j")).toVector).toMap
    val srcOf = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source").as[(Long, String)].collect().toMap
    // docs with <3 tokens have no shingles and no signature row
    val merged = docSigs.toSeq
      .groupBy { case (id, _) => srcOf(id) }
      .map { case (s, sigs) =>
        s -> (0 until 8).map(j => sigs.map(_._2(j)).min).toVector
      }
    val rows = SparkEntry.queries("q92_source_signatures")(spark, sfDir).collect()
    rows.length shouldBe merged.size * (merged.size - 1) / 2
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      a should be < b
      val n = (0 until 8).count(j => merged(a)(j) == merged(b)(j))
      r.getAs[Int]("n_match") shouldBe n
      r.getAs[Double]("est_jaccard") shouldBe n / 8.0
    }
  }
}
