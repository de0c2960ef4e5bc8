package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.Portable
import graft.sources.Tables

/** Deduplication suite over the `documents` table — the operators a
  * large-scale training-data pipeline runs before anything else.
  *
  * All variants are pure DataFrame algebra over an engine-portable hash
  * ([[Portable.hash32]]), so every stage is oracle-checkable in DuckDB
  * and stays inside WholeStageCodegen (no UDFs, no collect).
  *
  * Scale design (100 TB): every stage is a shuffle on `doc_id` or on a
  * bounded-width signature key —
  *  - exact dedup: one hash-aggregate on the content digest; shuffle
  *    width = #distinct digests;
  *  - MinHash: shingle explode is map-side only; the signature is one
  *    aggregate keyed by doc_id; LSH banding joins on (band, h1, h2)
  *    buckets so candidate generation never compares all pairs —
  *    O(sum of bucket sizes squared), not O(n²);
  *  - Jaccard verification joins shingle sets only for LSH candidates;
  *  - SimHash: one aggregate per doc over token hash bit-planes.
  */
object Dedup {

  /** MinHash permutation constants: h_j(x) = (A(j)*x + B(j)) mod P with
    * P prime > 2^32. A,B < 2^17 keep A*x < 2^49 (no Long overflow). */
  private[graft] val P = 4294967311L
  private[graft] val A = IndexedSeq(131L, 521L, 1031L, 2053L, 4099L, 8209L, 16411L, 32771L)
  private[graft] val B = IndexedSeq(7L, 911L, 3571L, 9041L, 17389L, 28657L, 51437L, 75577L)
  private[graft] val K = 8 // signature width; banded 4 × 2 for LSH

  // ---------------------------------------------------------- shingles
  /** Distinct 3-word shingles per document. Spark arrays are 0-indexed
    * (`t[i]`), DuckDB lists 1-indexed — both enumerate all consecutive
    * triples, yielding identical shingle sets. */
  private def shinglesFrom(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("t", Portable.tokens($"text"))
      .filter(size($"t") >= 3)
      .select($"doc_id", explode(expr(
        "transform(sequence(0, size(t)-3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))")).as("s"))
      .distinct()
  }

  private def shingles(spark: SparkSession, dir: String): DataFrame =
    shinglesFrom(Tables.documents(spark, dir))

  /** Memoized, persisted intermediates shared across the dedup chain:
    * q24 (signatures), q25 (candidates), q26 (verification) and q50/q57
    * (clustering) all consume the SAME persisted signature/candidate
    * tables instead of re-exploding the corpus per query — the
    * "persisted signature table" a production pipeline would materialize
    * between stages. `persist` (not `localCheckpoint`) keeps lineage, so
    * an executor loss recomputes the lost partitions instead of failing
    * the query. Entries live in [[graft.core.PersistedMemo]] (keyed per
    * session + dir), which owns the lifecycle: `release`/`clearAll` and
    * eviction on session stop. */
  private def memoized(
      spark: SparkSession, dir: String, key: String)(build: => DataFrame): DataFrame =
    graft.core.PersistedMemo.getOrBuild(spark, dir, s"dedup:$key")(build)

  private val shinglesCte =
    """toks AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents
      |), sh AS (
      |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i
      |        FROM toks WHERE len(t) >= 3)
      |)""".stripMargin

  /** doc_id → m0..m7 MinHash signature over a (possibly cached) shingle
    * set — q26 shares one shingle scan across signature, sizes and
    * intersection instead of re-exploding per consumer. */
  private def signatureFrom(sh: DataFrame): DataFrame = {
    val hs = sh.withColumn("h", Portable.hash32(col("s")))
    val mins = (0 until K).map(j =>
      min((col("h") * lit(A(j)) + lit(B(j))) % lit(P)).as(s"m$j"))
    hs.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  private def signature(spark: SparkSession, dir: String): DataFrame =
    memoized(spark, dir, "sig")(signatureFrom(shingles(spark, dir)))

  private val signatureCte: String = {
    val mins = (0 until K)
      .map(j => s"    min((${A(j)}*h + ${B(j)}) % $P) AS m$j")
      .mkString(",\n")
    s"""$shinglesCte, hs AS (
       |  SELECT doc_id, ${Portable.hash32Sql("s")} AS h FROM sh
       |), sig AS (
       |  SELECT doc_id,
       |$mins
       |  FROM hs GROUP BY doc_id
       |)""".stripMargin
  }

  /** LSH candidate pairs: 4 bands × 2 rows; docs sharing any band bucket
    * become a candidate pair (unsorted — callers order). */
  private def lshCandidatesFrom(sig: DataFrame): DataFrame = {
    val spark = sig.sparkSession
    import spark.implicits._
    val bands = (0 until K / 2).map(bi =>
      sig.select(lit(bi).as("band"),
        col(s"m${2 * bi}").as("h1"), col(s"m${2 * bi + 1}").as("h2"), $"doc_id"))
      .reduce(_ unionByName _)
    bands.as("x")
      .join(bands.as("y"), Seq("band", "h1", "h2"))
      .where($"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"))
      .distinct()
  }

  private[operators] def lshCandidates(spark: SparkSession, dir: String): DataFrame = {
    val sig = signature(spark, dir)
    memoized(spark, dir, "cands")(lshCandidatesFrom(sig))
  }

  private[operators] val lshCandidatesCte: String = {
    val bandSelects = (0 until K / 2)
      .map(bi => s"  SELECT $bi AS band, m${2 * bi} AS h1, m${2 * bi + 1} AS h2, doc_id FROM sig")
      .mkString("\n  UNION ALL\n")
    s"""$signatureCte, bands AS (
       |$bandSelects
       |), cands AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x
       |  JOIN bands y ON x.band = y.band AND x.h1 = y.h1 AND x.h2 = y.h2
       |              AND x.doc_id < y.doc_id
       |)""".stripMargin
  }

  // --------------------------------------------------------------- q23
  /** Exact (content-hash) dedup: one aggregate on md5(text) keyed by the
    * digest. Emits every content group with its canonical keeper and
    * copy count — at 100 TB this is the classic first-pass dedup, and
    * shuffle width is #distinct digests, not rows. */
  private def q23(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .groupBy(md5($"text").as("content_hash"))
      .agg(
        min($"doc_id").as("keep_id"),
        count(lit(1)).as("n_copies"),
        min($"n_chars").as("n_chars"))
      .orderBy($"content_hash")
  }

  private val q23Sql =
    """SELECT md5(text) AS content_hash,
      |       min(doc_id) AS keep_id,
      |       count(*) AS n_copies,
      |       min(n_chars) AS n_chars
      |FROM documents
      |GROUP BY 1
      |ORDER BY content_hash""".stripMargin

  // --------------------------------------------------------------- q24
  /** MinHash signatures (8 permutations over 3-word shingles). */
  private def q24(spark: SparkSession, dir: String): DataFrame =
    signature(spark, dir).orderBy("doc_id")

  private val q24Sql =
    s"""WITH $signatureCte
       |SELECT * FROM sig ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q25
  /** MinHash-LSH near-dup candidate pairs via 4×2 banding. */
  private def q25(spark: SparkSession, dir: String): DataFrame =
    lshCandidates(spark, dir).orderBy("doc_a", "doc_b")

  private val q25Sql =
    s"""WITH $lshCandidatesCte
       |SELECT doc_a, doc_b FROM cands ORDER BY doc_a, doc_b""".stripMargin

  // --------------------------------------------------------------- q26
  /** Exact n-gram Jaccard verification of the LSH candidates: intersect
    * shingle sets per candidate pair (join only on candidates — never
    * all pairs). jaccard = |A∩B| / (|A|+|B|-|A∩B|), exact integer
    * division → bit-identical across engines, no rounding needed. */
  private def q26(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // candidates come from the shared persisted table (tiny — LSH prunes
    // ~all pairs), so the full-corpus shingle explode is not replayed
    // here; the verification stage re-shingles ONLY candidate documents
    // for the intersection.
    val cands = lshCandidates(spark, dir)
    val candDocIds = cands.select($"doc_a".as("doc_id"))
      .union(cands.select($"doc_b".as("doc_id"))).distinct()
    val candDocs = Tables.documents(spark, dir)
      .join(broadcast(candDocIds), Seq("doc_id"), "left_semi")
    val sh = shinglesFrom(candDocs)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cands
      .join(sh.as("sa"), $"doc_a" === $"sa.doc_id")
      .join(sh.as("sb"), $"doc_b" === $"sb.doc_id" && $"sa.s" === $"sb.s", "left_outer")
      .groupBy($"doc_a", $"doc_b")
      .agg(count($"sb.s").as("n_common"))
    inter
      .join(sizes.as("za"), $"doc_a" === $"za.doc_id")
      .join(sizes.as("zb"), $"doc_b" === $"zb.doc_id")
      .select(
        $"doc_a", $"doc_b", $"n_common",
        ($"n_common".cast("double") / ($"za.n" + $"zb.n" - $"n_common")).as("jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }

  private val q26Sql =
    s"""WITH $lshCandidatesCte, sizes AS (
       |  SELECT doc_id, count(*) AS n FROM sh GROUP BY 1
       |), inter AS (
       |  SELECT c.doc_a, c.doc_b, count(sb.s) AS n_common
       |  FROM cands c
       |  JOIN sh sa ON sa.doc_id = c.doc_a
       |  LEFT JOIN sh sb ON sb.doc_id = c.doc_b AND sb.s = sa.s
       |  GROUP BY 1, 2
       |)
       |SELECT i.doc_a, i.doc_b, i.n_common,
       |       CAST(i.n_common AS DOUBLE) / (za.n + zb.n - i.n_common) AS jaccard
       |FROM inter i
       |JOIN sizes za ON za.doc_id = i.doc_a
       |JOIN sizes zb ON zb.doc_id = i.doc_b
       |ORDER BY doc_a, doc_b""".stripMargin

  // --------------------------------------------------------------- q27
  /** 32-bit SimHash over token frequencies: per bit-plane j, sign of
    * Σ_tokens (±1 by bit j of hash32(token)); duplicates count. One
    * aggregate per doc — fully distributed, codegen-friendly. */
  private def q27(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tok = Tables.documents(spark, dir)
      .select($"doc_id", explode(Portable.tokens($"text")).as("w"))
      .withColumn("h", Portable.hash32($"w"))
    val planes = (0 until 32).map(j =>
      sum(when(shiftright($"h", j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b$j"))
    tok.groupBy("doc_id")
      .agg(planes.head, planes.tail: _*)
      .select($"doc_id",
        (0 until 32)
          .map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
      .orderBy("doc_id")
  }

  private val q27Sql: String = {
    val planes = (0 until 32)
      .map(j => s"    sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS b$j")
      .mkString(",\n")
    val combine = (0 until 32)
      .map(j => s"(CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS w FROM documents
       |), hs AS (
       |  SELECT doc_id, ${Portable.hash32Sql("w")} AS h FROM tok
       |), planes AS (
       |  SELECT doc_id,
       |$planes
       |  FROM hs GROUP BY doc_id
       |)
       |SELECT doc_id, CAST($combine AS BIGINT) AS simhash
       |FROM planes ORDER BY doc_id""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q23_dedup_exact", q23, Some(q23Sql)),
    Q("q24_minhash_signatures", q24, Some(q24Sql)),
    Q("q25_minhash_lsh_pairs", q25, Some(q25Sql)),
    Q("q26_ngram_jaccard", q26, Some(q26Sql)),
    Q("q27_simhash", q27, Some(q27Sql)),
  )
}
