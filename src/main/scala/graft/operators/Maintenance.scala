package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.Q
import graft.sources.Tables

/** Incremental view maintenance over a JOIN — the algebra that keeps a
  * 100 TB materialized aggregate fresh without rescanning history.
  * q104 proved merge ≡ recompute for single-table rollups; the join
  * case needs the bilinear delta expansion
  *
  *   V(A ∪ ΔA, B ∪ ΔB) = V(A,B) + V(ΔA,B) + V(A,ΔB) + V(ΔA,ΔB)
  *
  * (Blakeley et al., "Efficiently Updating Materialized Views",
  * SIGMOD'86 — the foundation every warehouse MV engine implements).
  * The ORACLE is the straight full recompute, so the correctness gate
  * proves the expansion exact, not just self-consistent.
  */
object Maintenance extends DetRounding {

  // -------------------------------------------------------------- q118
  /** Per-nation revenue view maintained incrementally: orders split at
    * an order-date watermark (A = history, ΔA = new orders), lineitem
    * split at a ship-date watermark (B / ΔB) — DIFFERENT columns, so
    * all four delta terms are non-empty (an order placed before the
    * cutoff keeps shipping lines after it; a parity split on the join
    * key would silently empty the cross terms and prove nothing).
    *
    * Each term aggregates to (custkey, partial sums) BEFORE any
    * dimension work — the three delta joins are bounded by delta size ×
    * join fanout; the customer→nation chain joins once, broadcast,
    * against the merged #custkeys-row frame. At 100 TB: V(A,B) is the
    * persisted view, the three delta terms are the daily maintenance
    * transaction, and history is never rescanned. Revenue rounds 2 dp
    * AFTER the merge (q104's discipline: round the merged total, never
    * the partials). */
  private def q118(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cut = "1996-07-01 00:00:00"
    val orders = Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey",
      ($"o_orderdate" < lit(cut).cast("timestamp")).as("is_old"))
    val line = Tables.lineitem(spark, dir).select($"l_orderkey",
      ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"),
      ($"l_shipdate" < lit(cut).cast("timestamp")).as("is_old"))
    def term(oldOrders: Boolean, oldLines: Boolean): DataFrame =
      orders.filter($"is_old" === oldOrders).drop("is_old")
        .join(line.filter($"is_old" === oldLines).drop("is_old"),
          $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_custkey")
        .agg(sum($"rev").as("pr"), count(lit(1)).as("pn"))
    val merged = term(true, true)
      .unionByName(term(false, true))
      .unionByName(term(true, false))
      .unionByName(term(false, false))
      .groupBy($"o_custkey")
      .agg(sum($"pr").as("pr"), sum($"pn").as("pn"))
    merged
      .join(broadcast(Tables.customer(spark, dir)
        .select($"c_custkey", $"c_nationkey")), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, dir)
        .select($"n_nationkey", $"n_name")), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(round(sum($"pr"), 2).as("revenue"), sum($"pn").as("n_items"))
      .orderBy($"n_name")
  }

  /** Straight full recompute — the four merged delta terms must equal
    * it (same final rounding, same nation rollup). */
  private val q118Sql: String =
    """SELECT n.n_name,
      |       round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2) AS revenue,
      |       CAST(count(*) AS BIGINT) AS n_items
      |FROM orders o
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY n.n_name
      |ORDER BY n.n_name""".stripMargin

  // -------------------------------------------------------------- q139
  /** CDC apply — MERGE INTO semantics as set algebra: the base snapshot
    * (each customer's last order BEFORE the cutoff) absorbs a change
    * feed (each customer's last order AFTER it, a tombstone when that
    * order's status is 'F') as
    *
    *   applied = (base ANTI-JOIN feed keys) ∪ (feed upserts)
    *
    * — deletes drop state, upserts replace it, untouched keys carry.
    * This is q113's complement: q113 DIFFS two snapshots, this APPLIES
    * a delta, and the ORACLE is the one-shot rebuild from the full
    * table (latest order per customer, dropped when that order is a
    * post-cutoff 'F'), so the hash gate proves apply ≡ rebuild — the
    * identity a 100 TB nightly MERGE relies on to never rescan history.
    *
    * Because base and feed here derive from the SAME table, the whole
    * merge fuses: a single descending window carries two conditional
    * running counts (q113's fused-rank trick) that pick each side's
    * latest row, ONE conditional aggregate gathers both sides per key,
    * and a CASE applies the merge — one scan, one custkey shuffle, NO
    * join (a naive base ANTI feed ∪ upserts over shared lineage
    * triples the scan — measured; PlanSpec locks the fused shape). At
    * 100 TB, where base is a persisted table and the feed a day's
    * arrivals, the set-algebra form is [[graft.Graft.cdcApply]] — the
    * spec proves it reproduces this query on the same split. */
  private val CdcCutoff = "2001-01-01 00:00:00"

  private def q139(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val oldTop = $"is_old" && $"rn_old" === 1
    val newTop = !$"is_old" && $"rn_new" === 1
    Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"o_orderstatus",
        $"o_orderdate",
        ($"o_orderdate" < lit(CdcCutoff).cast("timestamp")).as("is_old"))
      .withColumn("rn_old", sum(when($"is_old", 1).otherwise(0)).over(running))
      .withColumn("rn_new", sum(when(!$"is_old", 1).otherwise(0)).over(running))
      .groupBy($"o_custkey")
      .agg(
        // exactly one row matches each side's predicate (q113's rule):
        // max over one non-null value selects it order-insensitively
        max(when(oldTop, $"o_orderkey")).as("old_key"),
        max(when(oldTop, $"o_totalprice")).as("old_price"),
        max(when(newTop, $"o_orderkey")).as("new_key"),
        max(when(newTop, $"o_totalprice")).as("new_price"),
        max(when(newTop, $"o_orderstatus")).as("new_status"))
      .filter($"new_key".isNull || $"new_status" =!= "F") // tombstones drop
      .select($"o_custkey",
        coalesce($"new_key", $"old_key").as("last_orderkey"),
        coalesce($"new_price", $"old_price").as("last_price"),
        when($"new_key".isNotNull, "upserted").otherwise("carried").as("src"))
      .orderBy($"o_custkey")
  }

  /** One-shot rebuild: latest order per customer over the FULL table,
    * dropped when that order is a post-cutoff 'F' — the merged
    * base+delta must equal it row for row. Prices pass through raw
    * (compared, never computed with — no rounding needed). */
  private val q139Sql: String =
    s"""WITH ranked AS (
       |  SELECT o_custkey, o_orderkey, o_totalprice, o_orderstatus,
       |         o_orderdate >= TIMESTAMP '$CdcCutoff' AS is_new,
       |         row_number() OVER (PARTITION BY o_custkey
       |                            ORDER BY o_orderdate DESC, o_orderkey DESC)
       |           AS rn
       |  FROM orders
       |)
       |SELECT o_custkey,
       |       o_orderkey AS last_orderkey,
       |       o_totalprice AS last_price,
       |       CASE WHEN is_new THEN 'upserted' ELSE 'carried' END AS src
       |FROM ranked
       |WHERE rn = 1 AND NOT (is_new AND o_orderstatus = 'F')
       |ORDER BY o_custkey""".stripMargin

  // -------------------------------------------------------------- q164
  /** Z-order (Morton) data layout vs. ingestion-order layout — the
    * OPTIMIZE/CLUSTER BY maintenance operator behind multi-dimensional
    * data skipping (Morton '66; the layout Delta/Iceberg clustering
    * writes). Events carry two query dimensions (user bucket, day
    * index); each layout sorts the table, cuts it into 16 equal files,
    * and reports per-file min/max of BOTH dimensions — the footer
    * stats a scan prunes on. The linear layout yields full-span day
    * ranges on every file (a user-filter query prunes nothing); the
    * Z-order layout bounds both spans at ~√files, so point queries on
    * EITHER dimension skip most files. The oracle recomputes the same
    * interleave arithmetic, so the gate proves the bit algebra.
    *
    * Scale: z is per-row integer algebra (6+6 bits interleaved); the
    * global sort here is `row_number` for deterministic file cuts at
    * fixture scale — a production writer replaces it with
    * `repartitionByRange(z)` + per-task files (same boundaries via
    * range sampling, no single-partition window). */
  private val ZBits = 6
  private val ZFiles = 16

  /** Generic core of q164, opened via [[graft.Graft.layoutReport]]:
    * compares the Z-order layout against linear `idCol` order for any
    * frame carrying two non-negative integer dimensions, cutting each
    * into `nFiles` deterministic files and reporting per-file min/max
    * footer stats on both dims. */
  private[graft] def layoutReport(df: DataFrame, idCol: String,
      aCol: String, bCol: String, bits: Int = ZBits,
      nFiles: Int = ZFiles): DataFrame = {
    val (id, a, b) = (col(idCol), col(aCol), col(bCol))
    // the SHARED production interleave (sources.Layout.zorder — what
    // writeZOrdered sorts by); the oracle respells the bit algebra
    // independently, so the gate proves the primitive itself
    val both = df
      .withColumn("__z", graft.sources.Layout.zorder(a, b, bits, bits))
      .select(id.as("__id"), a.as("__a"), b.as("__b"),
        explode(array(
          struct(lit("linear").as("layout"), lit(0L).as("s1")),
          struct(lit("zorder").as("layout"), col("__z").as("s1")))).as("l"))
      .select(col("l.layout").as("layout"), col("l.s1").as("s1"),
        col("__id"), col("__a"), col("__b"))
    val w = Window.partitionBy(col("layout")).orderBy(col("s1"), col("__id"))
    val wn = Window.partitionBy(col("layout"))
    both
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wn))
      .withColumn("file_id", expr(s"((rn - 1) * $nFiles) div n"))
      .groupBy(col("layout"), col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__a")).as("u_lo"), max(col("__a")).as("u_hi"),
        min(col("__b")).as("d_lo"), max(col("__b")).as("d_hi"))
      .orderBy(col("layout"), col("file_id"))
  }

  private def q164(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.events(spark, dir)
      .select($"event_id", $"user_id", to_date($"ts").as("day"))
    val d0 = base.agg(min($"day").as("d0"))
    val feat = base.crossJoin(broadcast(d0))
      .select($"event_id", ($"user_id" % 64).as("ub"),
        least(datediff($"day", $"d0"), lit(63)).cast("long").as("di"))
    layoutReport(feat, "event_id", "ub", "di")
  }

  private val q164Sql: String = {
    val zExpr = (0 until ZBits).map(i =>
      s"((ub // ${1 << i}) % 2) * ${1L << (2 * i + 1)} + ((di // ${1 << i}) % 2) * ${1L << (2 * i)}")
      .mkString(" + ")
    s"""WITH base AS (
       |  SELECT event_id, user_id % 64 AS ub,
       |         CAST(least(date_diff('day',
       |           (SELECT min(CAST(ts AS DATE)) FROM events),
       |           CAST(ts AS DATE)), 63) AS BIGINT) AS di
       |  FROM events
       |), feat AS (
       |  SELECT event_id, ub, di, $zExpr AS z FROM base
       |), both_layouts AS (
       |  SELECT 'linear' AS layout, 0 AS s1, event_id, ub, di FROM feat
       |  UNION ALL
       |  SELECT 'zorder' AS layout, z AS s1, event_id, ub, di FROM feat
       |), cut AS (
       |  SELECT layout, ub, di,
       |         ((row_number() OVER (PARTITION BY layout ORDER BY s1, event_id) - 1)
       |          * $ZFiles) // (count(*) OVER (PARTITION BY layout)) AS file_id
       |  FROM both_layouts
       |)
       |SELECT layout, CAST(file_id AS BIGINT) AS file_id,
       |       CAST(count(*) AS BIGINT) AS n_rows,
       |       CAST(min(ub) AS BIGINT) AS u_lo, CAST(max(ub) AS BIGINT) AS u_hi,
       |       min(di) AS d_lo, max(di) AS d_hi
       |FROM cut
       |GROUP BY layout, file_id
       |ORDER BY layout, file_id""".stripMargin
  }

  // -------------------------------------------------------------- q210
  /** Hilbert-curve layout vs Z-order — the second-generation CLUSTER BY
    * (Hilbert 1891; the layout Delta's liquid clustering moved to after
    * Z-order): both interleave two dimensions into one sort key, but
    * the Hilbert walk never takes the long diagonal jumps Morton's
    * bit-interleave does at quadrant seams, so equal-size file cuts get
    * strictly tighter per-file bounding boxes — smaller footer min/max
    * spans — and a point/range scan on either dimension prunes MORE
    * files at the same file count. This query lays the events grid out
    * BOTH ways (same 64×64 (user-bucket, day) grid as q164, same
    * 16-file cut) and emits the per-file footer stats side by side; at
    * 100 TB the layout choice is purely this table — whichever shows
    * narrower spans skips more of the corpus.
    *
    * The Hilbert index is the standard xy2d walk re-expressed
    * BRANCH-FREE over pure integer arithmetic (rx/ry quadrant bits by
    * div/mod, the rotate-and-flip as multiply-by-indicator — no CASE,
    * no bit intrinsics), 6 unrolled levels; Spark's column fold and the
    * oracle's CTE chain are generated from the SAME level transform,
    * and the hash gate proves the two spellings identical. The
    * reflection uses the FULL grid width (63 − x, not s − 1 − x): both
    * variants trace a valid curve under two's-complement bit tests,
    * but only the full-width one keeps every intermediate coordinate
    * non-negative — and div/mod bit extraction (the portable spelling;
    * engines disagree on nothing here) is only bit-equivalent for
    * non-negative values. Scale: the
    * index is per-row scalar algebra; the deterministic 16-file cut
    * uses the fixture's row_number spelling — a production writer
    * replaces it with `repartitionByRange(h)` exactly as q164
    * documents for z. */
  private val HilbertLevels = Seq(32, 16, 8, 4, 2, 1) // 6 bits/dim = 64×64
  private val HilbertMax = 63 // full-width reflection bound (grid − 1)

  /** Attach the Hilbert d-index of (`xCol`, `yCol`) ∈ [0,64)² as
    * `out` (generic core; the facade's `Graft.hilbertIndex`). */
  private[graft] def withHilbert(df: DataFrame, xCol: String, yCol: String,
      out: String = "hd"): DataFrame = {
    var cur = df
      .withColumn("__hx", col(xCol).cast("long"))
      .withColumn("__hy", col(yCol).cast("long"))
      .withColumn(out, lit(0L))
    for (s <- HilbertLevels) {
      cur = cur
        .withColumn("__rx", expr(s"(__hx div $s) % 2"))
        .withColumn("__ry", expr(s"(__hy div $s) % 2"))
        .withColumn(out,
          expr(s"$out + ${s.toLong * s} * (3 * __rx + __ry * (1 - 2 * __rx))"))
        .withColumn("__fx", expr(s"__rx * ($HilbertMax - __hx) + (1 - __rx) * __hx"))
        .withColumn("__fy", expr(s"__rx * ($HilbertMax - __hy) + (1 - __rx) * __hy"))
        .withColumn("__hx", expr("(1 - __ry) * __fy + __ry * __hx"))
        .withColumn("__hy", expr("(1 - __ry) * __fx + __ry * __hy"))
    }
    cur.drop("__hx", "__hy", "__rx", "__ry", "__fx", "__fy")
  }

  private def q210(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.events(spark, dir)
      .select($"event_id", $"user_id", to_date($"ts").as("day"))
    val d0 = base.agg(min($"day").as("d0"))
    val feat = withHilbert(
      base.crossJoin(broadcast(d0))
        .select($"event_id", ($"user_id" % 64).as("ub"),
          least(datediff($"day", $"d0"), lit(63)).cast("long").as("di"))
        .withColumn("z", graft.sources.Layout.zorder($"ub", $"di", ZBits, ZBits)),
      "ub", "di")
    val both = feat.select($"event_id", $"ub", $"di",
        explode(array(
          struct(lit("hilbert").as("layout"), $"hd".as("s1")),
          struct(lit("zorder").as("layout"), $"z".as("s1")))).as("l"))
      .select($"l.layout".as("layout"), $"l.s1".as("s1"),
        $"event_id", $"ub", $"di")
    val w = Window.partitionBy($"layout").orderBy($"s1", $"event_id")
    val wn = Window.partitionBy($"layout")
    both
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wn))
      .withColumn("file_id", expr(s"((rn - 1) * $ZFiles) div n"))
      .groupBy($"layout", $"file_id")
      .agg(count(lit(1)).as("n_rows"),
        min($"ub").as("u_lo"), max($"ub").as("u_hi"),
        min($"di").as("d_lo"), max($"di").as("d_hi"))
      .orderBy($"layout", $"file_id")
  }

  private val q210Sql: String = {
    val zExpr = (0 until ZBits).map(i =>
      s"((ub // ${1 << i}) % 2) * ${1L << (2 * i + 1)} + ((di // ${1 << i}) % 2) * ${1L << (2 * i)}")
      .mkString(" + ")
    // the SAME branch-free level transform as withHilbert, as a chain
    // of CTEs generated by the same loop structure
    val levels = HilbertLevels.zipWithIndex.map { case (s, i) =>
      s"""lvl${i + 1} AS (
         |  SELECT event_id, ub, di, z,
         |         (1 - ry) * fy + ry * hx AS hx,
         |         (1 - ry) * fx + ry * hy AS hy,
         |         hd + ${s.toLong * s} * (3 * rx + ry * (1 - 2 * rx)) AS hd
         |  FROM (
         |    SELECT *, rx * ($HilbertMax - hx) + (1 - rx) * hx AS fx,
         |              rx * ($HilbertMax - hy) + (1 - rx) * hy AS fy
         |    FROM (
         |      SELECT event_id, ub, di, z, hx, hy, hd,
         |             (hx // $s) % 2 AS rx, (hy // $s) % 2 AS ry
         |      FROM lvl$i))
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH base AS (
       |  SELECT event_id, user_id % 64 AS ub,
       |         CAST(least(date_diff('day',
       |           (SELECT min(CAST(ts AS DATE)) FROM events),
       |           CAST(ts AS DATE)), 63) AS BIGINT) AS di
       |  FROM events
       |), lvl0 AS (
       |  SELECT event_id, ub, di, $zExpr AS z,
       |         CAST(ub AS BIGINT) AS hx, di AS hy, CAST(0 AS BIGINT) AS hd
       |  FROM base
       |),
       |$levels,
       |both_layouts AS (
       |  SELECT 'hilbert' AS layout, hd AS s1, event_id, ub, di FROM lvl6
       |  UNION ALL
       |  SELECT 'zorder' AS layout, z AS s1, event_id, ub, di FROM lvl6
       |), cut AS (
       |  SELECT layout, ub, di,
       |         ((row_number() OVER (PARTITION BY layout ORDER BY s1, event_id) - 1)
       |          * $ZFiles) // (count(*) OVER (PARTITION BY layout)) AS file_id
       |  FROM both_layouts
       |)
       |SELECT layout, CAST(file_id AS BIGINT) AS file_id,
       |       CAST(count(*) AS BIGINT) AS n_rows,
       |       CAST(min(ub) AS BIGINT) AS u_lo, CAST(max(ub) AS BIGINT) AS u_hi,
       |       min(di) AS d_lo, max(di) AS d_hi
       |FROM cut
       |GROUP BY layout, file_id
       |ORDER BY layout, file_id""".stripMargin
  }

  // -------------------------------------------------------------- q173
  /** Small-file compaction plan — the OPTIMIZE sibling of q164's
    * CLUSTER BY: assign every document to a target output file of
    * ~`targetBytes`, packing in (source, doc_id) order with a next-fit
    * cut (a new file starts when the running total crosses a target
    * boundary), and report the per-file manifest a compactor would
    * execute — file count, bytes, doc-id span. Next-fit (not first-fit
    * decreasing) is deliberate: it is a pure prefix-sum, preserves the
    * id-clustered read order (footer min/max stays tight — q164's
    * point), and is deterministic under re-runs; FFD packs ~11% tighter
    * but destroys ordering and needs a sequential bin state.
    *
    * Shape: one ranked window per source (cumulative bytes), one
    * aggregate to the per-file manifest. Bin id derives from the
    * file-START offset (`cum − bytes`), so a document straddling a
    * boundary belongs to the file it started in — every file except a
    * source's last holds ≥ targetBytes − max_doc and < target + max_doc
    * bytes. 100 TB: the window partitions by SOURCE (thousands of
    * independent partitions, not a global sort); a pathologically hot
    * source shards further by the same (source, day) split the ingest
    * layout already carries, offsetting bin ids per shard — the cut
    * arithmetic is unchanged. */
  private[graft] def compactionPlan(docs: DataFrame, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"need targetBytes > 0 (got $targetBytes)")
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    docs
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("cum", sum(col("n_chars")).over(w))
      .withColumn("file_id", expr(s"(cum - n_chars) div ${targetBytes}L"))
      .groupBy(col("source"), col("file_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("bytes"),
        min(col("doc_id")).as("doc_lo"), max(col("doc_id")).as("doc_hi"))
      .orderBy(col("source"), col("file_id"))
  }

  private val CompactTarget = 32768L

  private def q173(spark: SparkSession, dir: String): DataFrame =
    compactionPlan(Tables.documents(spark, dir), CompactTarget)

  private val q173Sql: String =
    s"""WITH cum AS (
       |  SELECT source, doc_id, n_chars,
       |         CAST(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id)
       |              AS BIGINT) AS cum
       |  FROM documents
       |)
       |SELECT source, (cum - n_chars) // $CompactTarget AS file_id,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(n_chars) AS BIGINT) AS bytes,
       |       min(doc_id) AS doc_lo, max(doc_id) AS doc_hi
       |FROM cum
       |GROUP BY 1, 2
       |ORDER BY source, file_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q118_join_view_maintenance", q118, Some(q118Sql)),
    Q("q139_cdc_apply", q139, Some(q139Sql)),
    Q("q164_zorder_layout", q164, Some(q164Sql)),
    Q("q210_hilbert_layout", q210, Some(q210Sql)),
    Q("q173_compaction_plan", q173, Some(q173Sql)),
  )
}
