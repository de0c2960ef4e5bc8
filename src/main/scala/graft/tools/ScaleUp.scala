// Salted corpus replication for scale rehearsals.
//
// Usage: sbt "runMain graft.tools.ScaleUp <srcDir> <outDir> <factor>"
//
// Produces a corpus `factor`× the source that BEHAVES like a genuinely
// bigger dataset rather than `factor` interleaved copies of the same
// one — the distinction matters because several catalog families are
// superlinear in collision structure, not row count:
//
//  - Keys (orderkey/custkey/suppkey/partkey/doc_id/vec_id/event_id/
//    user_id) are offset by `replica * stride` with ONE global stride
//    (smallest power of 10 above every key in the source), so every
//    foreign-key edge stays within its replica and join fan-outs scale
//    linearly. doc_id and vec_id share the offset, preserving the
//    documents⋈embeddings linkage.
//  - `region`/`nation` are copied once: TPC-H holds dimension tables
//    constant across scale factors, and so do we.
//  - Document TEXT gets a per-replica injective token rename (every
//    whitespace token suffixed `~r`, r ≥ 1; replica 0 is verbatim).
//    Jaccard over word-shingle sets is invariant under injective token
//    renaming, so each replica reproduces the source's near-dup/
//    containment structure EXACTLY while sharing zero shingles with any
//    other replica — near-dup candidate volume scales ×factor, not
//    ×factor² as naive copying would (every LSH band bucket would hold
//    `factor` identical signatures; pairs grow quadratically in bucket
//    size). `n_chars` is recomputed to stay consistent with the text.
//  - EMBEDDINGS get a per-replica deterministic sign flip per dimension
//    (a reflection — an orthogonal transform), so every intra-replica
//    norm, dot product, and cosine is preserved bit-shape-for-bit-shape
//    while replicas land in different orthants: cross-replica cosines
//    are near zero in expectation, so ANN cell populations and ε-join
//    densities scale ~linearly instead of stacking `factor` coincident
//    points (distance-0 pairs would make every ε-neighborhood and
//    top-k tie quadratically degenerate).
//  - `events` timestamps are left in place: `factor`× more users over
//    the same window models organic traffic growth and keeps per-user
//    session lengths (the stateful-op working set) constant.
//
// Everything is deterministic (murmur3 `hash`, fixed seeds, no RNG), so
// reruns are byte-stable modulo parquet file layout.
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

object ScaleUp {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <srcDir> <outDir> <factor>")
    val (src, out, factor) = (args(0), args(1), args(2).toInt)
    require(factor >= 1, s"factor must be >= 1 (got $factor)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, src, out, factor)
    spark.stop()
  }

  /** Smallest power of 10 strictly above every key value in the source
    * — one shared stride keeps cross-table key references aligned. */
  private[tools] def stride(spark: SparkSession, src: String): Long = {
    val keyCols = Seq(
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))
    val globalMax = keyCols.map { case (t, cols) =>
      Tables.table(spark, src, t)
        .agg(max(greatest((lit(0L) +: cols.map(col)): _*))).head.getLong(0)
    }.max
    Iterator.iterate(10L)(_ * 10).find(_ > globalMax).get
  }

  def run(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    val s = stride(spark, src)
    println(s"[scaleup] $src -> $out x$factor, key stride $s")

    // replica index column; replica 0 rows are the source verbatim
    def replicate(df: DataFrame): DataFrame =
      df.crossJoin(spark.range(factor).select(col("id").cast("int").as("__r")))

    def offset(df: DataFrame, cols: String*): DataFrame =
      cols.foldLeft(df) { (d, c) =>
        d.withColumn(c, col(c) + col("__r").cast("long") * s)
      }

    def write(df: DataFrame, name: String, files: Int): Unit = {
      df.drop("__r").repartition(files)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaleup] wrote $name")
    }

    // dimensions: constant across scale factors (TPC-H convention)
    Tables.region(spark, src).write.mode("overwrite").parquet(s"$out/region.parquet")
    Tables.nation(spark, src).write.mode("overwrite").parquet(s"$out/nation.parquet")

    write(offset(replicate(Tables.customer(spark, src)), "c_custkey"),
      "customer", 4)
    write(offset(replicate(Tables.supplier(spark, src)), "s_suppkey"),
      "supplier", 1)
    write(offset(replicate(Tables.part(spark, src)), "p_partkey"), "part", 2)
    write(offset(replicate(Tables.orders(spark, src)), "o_orderkey", "o_custkey"),
      "orders", 8)
    write(offset(replicate(Tables.lineitem(spark, src)),
      "l_orderkey", "l_partkey", "l_suppkey"), "lineitem", 16)
    write(offset(replicate(Tables.events(spark, src)), "event_id", "user_id"),
      "events", 8)

    // documents: injective per-replica token rename (see header). The
    // rename is injective ONLY if the separator never occurs in source
    // tokens — a verbatim replica-0 token "x~1" would collide with
    // replica 1's renamed "x", reintroducing exactly the cross-replica
    // shingle sharing the scheme exists to prevent. Assert, don't hope.
    val srcDocs = Tables.documents(spark, src)
    val tainted = srcDocs.filter(col("text").contains("~")).count()
    require(tainted == 0,
      s"salt separator '~' occurs in $tainted source document(s) — the " +
        "per-replica token rename would not be injective; use a separator " +
        "absent from the corpus")
    val docs = offset(replicate(srcDocs), "doc_id")
      .withColumn("text", when(col("__r") === 0, col("text")).otherwise(
        array_join(transform(
          filter(split(col("text"), "\\s+"), t => t =!= ""),
          t => concat(t, lit("~"), col("__r"))), " ")))
      .withColumn("n_chars", length(col("text")).cast("long"))
    write(docs, "documents", 8)

    // embeddings: per-replica per-dimension sign flip (a reflection)
    val embs = offset(replicate(Tables.embeddings(spark, src)), "vec_id")
      .withColumn("embedding",
        when(col("__r") === 0, col("embedding")).otherwise(
          expr("transform(embedding, (x, i) -> " +
            "IF(pmod(hash(i, __r), 2) = 0, x, -x))")))
    write(embs, "embeddings", 4)
    println(s"[scaleup] done: $out")
  }
}
