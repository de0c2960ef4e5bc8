package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.Q
import graft.sources.Tables

/** Skew-mitigation primitives for hot keys (SCALE.md "Joins"): AQE's
  * runtime skew-split covers sort-merge joins, but a key so hot that
  * one reducer drowns needs layout-level salting — these helpers encode
  * the two standard patterns as reusable, tested operators.
  *
  * Salts derive from a deterministic hash of stable row attributes (not
  * rand()): re-execution of a failed task reproduces the same salt, so
  * the operators stay idempotent under retries — the same reason the
  * engine's oracle queries avoid nondeterminism anywhere.
  */
object Skew extends DetRounding {

  /** Two-phase salted aggregation: partial sums/counts over
    * (key, salt) spread a hot key across `buckets` reducers, the final
    * pass combines the ≤`buckets` partials per key. Algebraic aggs
    * only — exactly the partial/final split Catalyst uses, made
    * explicit one level deeper. */
  def saltedSumCount(
      df: DataFrame,
      key: String,
      valueCol: String,
      buckets: Int,
      saltFrom: Column): DataFrame = {
    val salted = df.withColumn("__salt", pmod(abs(hash(saltFrom)), lit(buckets)))
    salted
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(
        sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n"))
  }

  /** Salted equi-join for a skewed LEFT side: the left side gets a
    * deterministic salt in [0, buckets); the (small) right side is
    * replicated across every salt value, so the hot key's rows spread
    * over `buckets` join tasks instead of one. Semantically identical
    * to `large.join(small, key)` (inner). */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      buckets: Int,
      saltFrom: Column): DataFrame = {
    val saltedLarge = large.withColumn("__salt", pmod(abs(hash(saltFrom)), lit(buckets)))
    val replicatedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    saltedLarge
      .join(replicatedSmall, Seq(key, "__salt"))
      .drop("__salt")
  }

  // -------------------------------------------------------------- q151
  /** Salted two-phase per-supplier quantity profile — the hot-key
    * aggregation discipline promoted into the oracle-gated catalog:
    * the DuckDB twin is the PLAIN one-pass GROUP BY, so the gate
    * proves salt-then-merge ≡ direct for the whole algebraic family
    * (count/sum/min/max merge; mean re-derives from merged sums —
    * q104's merge-≡-recompute contract, applied to intra-key
    * parallelism instead of shard rollup).
    *
    * When this matters at 100 TB: Catalyst's map-side partial
    * aggregate already contracts repeats WITHIN a partition, but the
    * final aggregate still hash-routes each key to ONE reducer — a key
    * holding 30% of the corpus makes that reducer the straggler, and
    * AQE's runtime skew split covers joins, not aggregations. Salting
    * the partial stage by a deterministic row-attribute hash (never
    * rand() — task retries must reproduce the salt) caps any reducer
    * at 1/`buckets` of the hot key before the ≤`buckets`-row merge.
    *
    * Exactness: l_quantity is integer-valued, so double sums are exact
    * in ANY grouping/order and the mean's one divide matches bit-for-
    * bit — the salted split introduces no drift to round away (the
    * terminal round is presentation only, shared by both sides). */
  /** Open-knob salted profile over ANY frame (count/sum/min/max + the
    * derived mean), shared by q151 and [[graft.Graft.saltedProfile]].
    * Output columns: `(key, n_rows, sum_<v>, min_<v>, max_<v>,
    * avg_<v>)` — the mean is UNROUNDED here; presentation rounding is
    * the caller's. */
  def saltedProfile(df: DataFrame, key: String, valueCol: String,
      buckets: Int, saltFrom: Column): DataFrame = {
    require(buckets > 1 && buckets <= 4096,
      s"need 1 < buckets <= 4096 (got $buckets)")
    val partial = df
      .withColumn("__salt", pmod(abs(hash(saltFrom)), lit(buckets)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("pn"), sum(col(valueCol)).as("ps"),
        min(col(valueCol)).as("pmin"), max(col(valueCol)).as("pmax"))
    partial.groupBy(col(key))
      .agg(sum(col("pn")).as("n_rows"), sum(col("ps")).as(s"sum_$valueCol"),
        min(col("pmin")).as(s"min_$valueCol"), max(col("pmax")).as(s"max_$valueCol"))
      .withColumn(s"avg_$valueCol", col(s"sum_$valueCol") / col("n_rows"))
  }

  private def q151(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    saltedProfile(
      Tables.lineitem(spark, dir)
        .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_quantity"),
      key = "l_suppkey", valueCol = "l_quantity", buckets = 16,
      saltFrom = struct($"l_orderkey", $"l_linenumber"))
      .select($"l_suppkey", $"n_rows",
        $"sum_l_quantity".as("sum_qty"), $"min_l_quantity".as("min_qty"),
        $"max_l_quantity".as("max_qty"),
        round($"avg_l_quantity", 6).as("avg_qty"))
      .orderBy($"l_suppkey")
  }

  /** The oracle is deliberately the UNSALTED spelling. */
  private val q151Sql: String =
    """SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_rows,
      |       sum(l_quantity) AS sum_qty,
      |       min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
      |       round(sum(l_quantity) / count(*), 6) AS avg_qty
      |FROM lineitem
      |GROUP BY 1
      |ORDER BY l_suppkey""".stripMargin

  // -------------------------------------------------------------- q207
  /** Rendezvous (highest-random-weight) shard routing + reshard audit —
    * the data-PLACEMENT primitive a 100 TB corpus store runs on
    * (Thaler & Ravishankar '98; the cache/shard router in every large
    * object store): doc d goes to `argmax_s hash(d, s)` over the shard
    * set. The HRW property this query PROVES through the oracle gate:
    * growing the shard set S → S+1 moves ONLY the documents whose new
    * argmax IS the new shard (expected |D|/(S+1)); every other
    * assignment is untouched. A mod-`hash(d) % S` layout would move
    * ~S/(S+1) of the corpus on the same event — at 100 TB that is the
    * difference between ingesting ~11 TB and rewriting ~89 TB.
    *
    * The audit emits, per shard of the GROWN layout: how many docs the
    * old layout placed there (`n_old`), how many the new one does
    * (`n_new`), and how many arrived by moving (`moved_in`). The oracle
    * recomputes routing independently, so a hash-gate pass certifies
    * `moved_in = 0` for every surviving shard — minimal movement as a
    * CHECKED property, not a claim.
    *
    * Scale: routing is one stateless map (S+1 portable hashes per row —
    * [[Portable.hash32]], so re-runs and the DuckDB twin agree
    * bit-for-bit); the audit melts each doc into its two (shard, role)
    * assignments and aggregates in ONE hash shuffle of ≤2(S+1)-row
    * partials. The argmax is `array_position(arr, array_max(arr))` —
    * the catalog's shared first-match tiebreak, portable to DuckDB's
    * `list_position(l, list_max(l))`. */
  private val RvShards = 8 // the audit grows RvShards → RvShards + 1

  private def rvHash(s: Int): Column =
    Portable.hash32(concat(col("doc_id").cast("string"), lit(s"#shard-$s")))

  /** Generic core (the facade's `Graft.rendezvousRoute`): attach the
    * HRW shard in [0, shards) for `idCol` as column `shard`. */
  def rendezvousRoute(df: DataFrame, idCol: String, shards: Int,
      out: String = "shard"): DataFrame = {
    require(shards >= 1 && shards <= 1024, s"need 1 <= shards <= 1024 (got $shards)")
    val arr = array((0 until shards).map(s =>
      Portable.hash32(concat(col(idCol).cast("string"), lit(s"#shard-$s")))): _*)
    df.withColumn(out, (array_position(arr, array_max(arr)) - 1).cast("int"))
  }

  private def q207(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val oldA = array((0 until RvShards).map(rvHash): _*)
    val newA = array((0 to RvShards).map(rvHash): _*)
    val routed = Tables.documents(spark, dir).select(
      (array_position(oldA, array_max(oldA)) - 1).cast("int").as("old_shard"),
      (array_position(newA, array_max(newA)) - 1).cast("int").as("new_shard"))
    // ONE aggregation pass: melt the two roles of each doc into
    // (shard, is_new, moved) legs and hash-aggregate — no second scan,
    // no join of two per-shard aggregates
    routed.select(explode(array(
        struct($"old_shard".as("shard"), lit(0).as("is_new"), lit(0L).as("mv")),
        struct($"new_shard".as("shard"), lit(1).as("is_new"),
          when($"old_shard" =!= $"new_shard", 1L).otherwise(0L).as("mv"))))
        .as("e"))
      .select($"e.*")
      .groupBy($"shard")
      .agg(
        sum(when($"is_new" === 0, 1L).otherwise(0L)).as("n_old"),
        sum(when($"is_new" === 1, 1L).otherwise(0L)).as("n_new"),
        sum(when($"is_new" === 1, $"mv").otherwise(0L)).as("moved_in"))
      .orderBy($"shard")
  }

  private val q207Sql: String = {
    def h(s: Int) = Portable.hash32Sql(s"CAST(doc_id AS VARCHAR) || '#shard-$s'")
    val lo = (0 until RvShards).map(h).mkString("[", ", ", "]")
    val ln = (0 to RvShards).map(h).mkString("[", ", ", "]")
    s"""WITH routed AS (
       |  SELECT CAST(list_position(lo, list_max(lo)) - 1 AS INTEGER) AS old_shard,
       |         CAST(list_position(ln, list_max(ln)) - 1 AS INTEGER) AS new_shard
       |  FROM (SELECT $lo AS lo, $ln AS ln FROM documents)
       |), bn AS (
       |  SELECT new_shard AS shard, CAST(count(*) AS BIGINT) AS n_new,
       |         CAST(sum(CASE WHEN old_shard <> new_shard THEN 1 ELSE 0 END)
       |              AS BIGINT) AS moved_in
       |  FROM routed GROUP BY 1
       |), bo AS (
       |  SELECT old_shard AS shard, CAST(count(*) AS BIGINT) AS n_old
       |  FROM routed GROUP BY 1
       |)
       |SELECT COALESCE(bn.shard, bo.shard) AS shard,
       |       CAST(COALESCE(bo.n_old, 0) AS BIGINT) AS n_old,
       |       CAST(COALESCE(bn.n_new, 0) AS BIGINT) AS n_new,
       |       CAST(COALESCE(bn.moved_in, 0) AS BIGINT) AS moved_in
       |FROM bn FULL JOIN bo ON bn.shard = bo.shard
       |ORDER BY shard""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q151_salted_agg", q151, Some(q151Sql)),
    Q("q207_rendezvous_shards", q207, Some(q207Sql)),
  )
}
