package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.sources.Tables

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Cosine is computed in f64 column algebra (`transform`/`zip_with`/
  * `aggregate` — codegen'd, no UDF):
  * `cos(a,b) = Σ aᵢbᵢ / (‖a‖‖b‖)`. Oracle side uses the identical
  * formula shape via DuckDB list comprehensions (NOT
  * `list_cosine_similarity`, which accumulates in f32 — ~1e-8 drift).
  * All emitted cosines are rounded (4 dp) and ranked on the rounded
  * value with a vec_id tiebreak, so ulp-level association drift can
  * never flip the hash.
  *
  * Scale design (100 TB): brute-force kNN (`q29`) is the per-query
  * baseline — a broadcast of Q query vectors against a partitioned scan,
  * O(N·Q) with no shuffle. The scale path is SRP-LSH bucketing (`q30`):
  * 4 fixed random hyperplanes → 16 buckets; candidates only join within
  * a bucket (equi-join on the bucket id — shuffle width = bucket sizes,
  * not N²). Hyperplane signs are derived from md5 at build time
  * (deterministic, embedded as literals in both engines). Near-dup
  * mining (`q28`) is the all-pairs verifier kept for the oracle; at
  * scale it is replaced by `q30`'s bucketed candidates exactly like
  * MinHash-LSH replaces all-pairs Jaccard.
  */
object Similarity {

  private val Dim = 64
  private val QueryIds = Seq(0L, 1L, 2L, 3L, 4L)

  /** SRP hyperplane signs: HP(j)(i) = ±1 from bit parity of the first 32
    * md5 bits of "j_i" — reproducible from the formula, embedded as
    * literals so both engines share exact values. */
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private val HP: IndexedSeq[IndexedSeq[Int]] = (0 until 4).map { j =>
    (0 until Dim).map { i =>
      (java.lang.Long.parseLong(md5hex(s"${j}_$i").substring(0, 8), 16) % 2).toInt * 2 - 1
    }
  }

  /** embeddings + f64 vector `v` + L2 norm `nrm`. Registers the native
    * vector expressions ([[graft.functions.DotProduct]]) used by the N²
    * stages — fused codegen loop, no per-pair array allocation, same
    * left-to-right accumulation as the algebraic form. */
  private def embNorm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    Tables.embeddings(spark, dir)
      .withColumn("v", transform($"embedding", x => x.cast("double")))
      .withColumn("nrm", sqrt(aggregate($"v", lit(0.0), (acc, x) => acc + x * x)))
  }

  /** Native fused dot product over two array<double> columns (by name). */
  private def dot(a: String, b: String): Column = expr(s"graft_dot($a, $b)")

  private val normsCte =
    """norms AS (
      |  SELECT vec_id, label, embedding,
      |         sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in embedding])) AS nrm
      |  FROM embeddings
      |)""".stripMargin

  private def dotSql(a: String, b: String): String =
    s"list_sum([CAST($a.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE) for i in generate_series(1, $Dim)])"

  // --------------------------------------------------------------- q28
  /** Embedding-cosine near-dup pairs: all pairs (a<b) with rounded
    * cosine ≥ 0.4 (threshold calibrated to the synthetic data — no pair
    * exceeds 0.52). All-pairs is the oracle-checkable verifier; see q30
    * for the bucketed scale path. */
  private def q28(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = embNorm(spark, dir)
    val cos = dot("a.v", "b.v") / (col("a.nrm") * col("b.nrm"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_a"),
        col("b.vec_id").as("vec_b"),
        round(cos, 4).as("cosine"),
        (col("a.label") === col("b.label")).cast("int").as("same_label"))
      .filter($"cosine" >= 0.4)
      .orderBy($"vec_a", $"vec_b")
  }

  private val q28Sql =
    s"""WITH $normsCte
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |       round(${dotSql("a", "b")} / (a.nrm * b.nrm), 4) AS cosine,
       |       CAST(a.label = b.label AS INTEGER) AS same_label
       |FROM norms a JOIN norms b ON a.vec_id < b.vec_id
       |WHERE round(${dotSql("a", "b")} / (a.nrm * b.nrm), 4) >= 0.4
       |ORDER BY vec_a, vec_b""".stripMargin

  // --------------------------------------------------------------- q29
  /** Brute-force cosine top-k: for 5 fixed query vectors, the 10 nearest
    * neighbors ranked on rounded cosine with vec_id tiebreak. */
  private def q29(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = embNorm(spark, dir)
    val queries = e.filter($"vec_id".isin(QueryIds: _*))
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qnrm"))
    val cos = dot("qv", "v") / ($"qnrm" * $"nrm")
    val w = Window.partitionBy($"query_id").orderBy(round(cos, 6).desc, $"vec_id".asc)
    e.join(broadcast(queries), $"vec_id" =!= $"query_id")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 10)
      .select($"query_id", $"vec_id".as("neighbor_id"), round(cos, 4).as("cosine"), $"rn")
      .orderBy($"query_id", $"rn")
  }

  private val q29Sql =
    s"""WITH $normsCte, scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         ${dotSql("q", "c")} / (q.nrm * c.nrm) AS cos
       |  FROM norms q JOIN norms c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id IN (${QueryIds.mkString(", ")})
       |)
       |SELECT query_id, neighbor_id, round(cos, 4) AS cosine, CAST(rn AS INTEGER) AS rn
       |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |                                   ORDER BY round(cos, 6) DESC, neighbor_id ASC) AS rn
       |      FROM scored) t
       |WHERE rn <= 10
       |ORDER BY query_id, rn""".stripMargin

  // --------------------------------------------------------------- q30
  /** SRP-LSH bucketed ANN (the scale path): 4 hyperplanes → 16 buckets;
    * neighbors only searched within the query's bucket (equi-join on
    * bucket id), top-5 by rounded cosine. */
  private def bucketed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = embNorm(spark, dir)
    val bucket = (0 until 4).map { j =>
      val hp = typedlit(HP(j))
      val d = aggregate(zip_with($"v", hp, (x, s) => x * s), lit(0.0), (acc, x) => acc + x)
      when(d > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
    e.withColumn("bucket", bucket)
  }

  private def q30(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = bucketed(spark, dir)
    val queries = e.filter($"vec_id".isin(QueryIds: _*))
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qnrm"), $"bucket")
    val cos = dot("qv", "v") / ($"qnrm" * $"nrm")
    val w = Window.partitionBy($"query_id").orderBy(round(cos, 6).desc, $"vec_id".asc)
    e.join(broadcast(queries), Seq("bucket"))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5)
      .select($"query_id", $"bucket", $"vec_id".as("neighbor_id"),
        round(cos, 4).as("cosine"), $"rn")
      .orderBy($"query_id", $"rn")
  }

  private val q30Sql: String = {
    val hpCte = HP.zipWithIndex.map { case (w, j) =>
      s"  SELECT $j AS j, [${w.mkString(", ")}] AS w"
    }.mkString("\n  UNION ALL\n")
    s"""WITH $normsCte, hp AS (
       |$hpCte
       |), buckets AS (
       |  SELECT e.vec_id,
       |         CAST(sum(CASE WHEN list_sum([CAST(e.embedding[i] AS DOUBLE) * h.w[i]
       |                                      for i in generate_series(1, $Dim)]) > 0
       |                       THEN (1 << h.j) ELSE 0 END) AS INTEGER) AS bucket
       |  FROM norms e CROSS JOIN hp h GROUP BY e.vec_id
       |), nb AS (
       |  SELECT n.vec_id, n.nrm, n.embedding, b.bucket
       |  FROM norms n JOIN buckets b ON n.vec_id = b.vec_id
       |), scored AS (
       |  SELECT q.vec_id AS query_id, q.bucket, c.vec_id AS neighbor_id,
       |         ${dotSql("q", "c")} / (q.nrm * c.nrm) AS cos
       |  FROM nb q JOIN nb c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
       |  WHERE q.vec_id IN (${QueryIds.mkString(", ")})
       |)
       |SELECT query_id, bucket, neighbor_id, round(cos, 4) AS cosine, CAST(rn AS INTEGER) AS rn
       |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |                                   ORDER BY round(cos, 6) DESC, neighbor_id ASC) AS rn
       |      FROM scored) t
       |WHERE rn <= 5
       |ORDER BY query_id, rn""".stripMargin
  }

  // --------------------------------------------------------------- q41
  /** IVF-style ANN (the other scale path, alongside SRP-LSH): MLlib
    * KMeans partitions vectors into 16 inverted lists; a query probes
    * only its own centroid's list, top-5 by rounded cosine. Training is
    * seeded but KMeans assignments are not portable to DuckDB → rows-
    * only check; IvfSpec covers structure + recall against brute force.
    * At 100 TB the fit runs on a sample and `transform` assigns at scan
    * throughput; the candidate join is an equi-join on cluster id. */
  private def q41(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import spark.implicits._
    val e = embNorm(spark, dir).withColumn("features", array_to_vector($"v"))
    val model = new KMeans().setK(16).setSeed(42)
      .setFeaturesCol("features").setPredictionCol("cluster").fit(e)
    val assigned = model.transform(e)
      .select($"vec_id", $"v", $"nrm", $"cluster")
    val queries = assigned.filter($"vec_id".isin(QueryIds: _*))
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qnrm"), $"cluster")
    val cos = dot("qv", "v") / ($"qnrm" * $"nrm")
    val w = Window.partitionBy($"query_id").orderBy(round(cos, 6).desc, $"vec_id".asc)
    assigned.join(broadcast(queries), Seq("cluster"))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5)
      .select($"query_id", $"cluster", $"vec_id".as("neighbor_id"),
        round(cos, 4).as("cosine"), $"rn")
      .orderBy($"query_id", $"rn")
  }

  val all: Seq[Q] = Seq(
    Q("q28_embedding_neardup", q28, Some(q28Sql)),
    Q("q29_knn_brute_force", q29, Some(q29Sql)),
    Q("q30_knn_srp_lsh", q30, Some(q30Sql)),
    Q("q41_knn_ivf", q41, None), // KMeans assignments not oracle-portable
  )
}
