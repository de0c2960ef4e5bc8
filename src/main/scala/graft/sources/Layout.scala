package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout control for the scan layer — the other half of the
  * 100 TB story next to [[Bucketing]]: HOW the bytes land on disk
  * decides what a petabyte scan can SKIP.
  *
  * Parquet (and every zone-map format) stores per-file/per-row-group
  * min/max statistics; a reader prunes a file whose [min,max] interval
  * misses the predicate. That pruning is only effective if the writer
  * CLUSTERED the data — random placement makes every file's interval
  * span the whole domain and nothing skips. Two layouts:
  *
  *  - [[writeClustered]]: range-partition by a key, sort within
  *    partitions, write — one global shuffle at write time buys
  *    disjoint per-file key ranges forever after (the "sort by
  *    ingest key once, prune every later scan" trade every warehouse
  *    makes). File count is explicit — the small-files knob.
  *  - [[zorder]]: Morton bit-interleaving of TWO keys for multi-
  *    dimensional pruning — sorting by z keeps BOTH dimensions'
  *    per-file ranges bounded (~√F of the domain for F files instead
  *    of one dimension perfect / the other unpruned). Pure column
  *    algebra (shifts and masks, codegen'd), no UDF.
  *
  * [[fileStats]] reads the realized layout back (per-file min/max via
  * `input_file_name`), which is exactly the statistic the scan pruner
  * uses — LayoutSpec asserts disjointness/boundedness on it, making
  * the skip-eligibility a tested property, not a hope.
  */
object Layout {

  /** Range-cluster `df` by `key` into `nFiles` sorted parquet files. */
  def writeClustered(df: DataFrame, outDir: String, key: String, nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(key))
      .sortWithinPartitions(col(key))
      .write.mode("overwrite").parquet(outDir)

  /** Morton (Z-order) code of two non-negative int keys, interleaved
    * MSB-FIRST with per-dimension bit widths. MSB alignment is the part
    * that matters: dimensions with different domain sizes (a 4-bit key
    * against an 8-bit key) must contribute their HIGH bits alternately,
    * or the wider key's top bits dominate the sort order and the layout
    * degenerates to a single-key sort (the narrow dimension's per-file
    * span collapses to the whole domain). Width per dimension is the
    * caller's domain knowledge — production systems derive it from
    * column stats. Pure shift/mask column algebra, codegen'd, no UDF. */
  def zorder(a: Column, b: Column, bitsA: Int = 16, bitsB: Int = 16): Column = {
    val maxBits = math.max(bitsA, bitsB)
    var z: Column = lit(0L)
    for (k <- 0 until maxBits) {
      if (k < bitsA)
        z = z * 2 + shiftright(a.cast("long"), bitsA - 1 - k).bitwiseAND(lit(1L))
      if (k < bitsB)
        z = z * 2 + shiftright(b.cast("long"), bitsB - 1 - k).bitwiseAND(lit(1L))
    }
    z
  }

  /** Z-order-cluster `df` by two keys into `nFiles` sorted files.
    *
    * Validates BEFORE writing that both keys fit their declared bit
    * widths: a key wider than its width would alias (high bits silently
    * dropped — 5 and 261 interleave identically at 4 bits), co-locating
    * far-apart keys and silently degrading every file's zone map to the
    * full domain. One cheap aggregate buys a loud failure instead. */
  def writeZOrdered(df: DataFrame, outDir: String, keyA: String, keyB: String,
      nFiles: Int, bitsA: Int = 16, bitsB: Int = 16): Unit = {
    val r = df.agg(
      count(lit(1)).as("n"),
      min(col(keyA).cast("long")).as("minA"), max(col(keyA).cast("long")).as("maxA"),
      min(col(keyB).cast("long")).as("minB"), max(col(keyB).cast("long")).as("maxB"),
      count(col(keyA).cast("long")).as("nA"), count(col(keyB).cast("long")).as("nB")).head()
    // empty input: nothing to validate (or alias) — write the empty
    // layout, as an unvalidated write would have
    if (r.getLong(0) > 0) {
      // count(cast) skips nulls: ANY row whose key fails the cast (not
      // just all of them) must fail loudly — a null __z row would land
      // in one range partition with an unbounded zone-map interval
      require(r.getLong(5) == r.getLong(0) && r.getLong(6) == r.getLong(0),
        s"zorder keys must cast to integers on every row: " +
          s"$keyA casts on ${r.getLong(5)}/${r.getLong(0)} rows, " +
          s"$keyB on ${r.getLong(6)}/${r.getLong(0)}")
      require(r.getLong(1) >= 0 && r.getLong(3) >= 0,
        s"zorder keys must be non-negative: min($keyA)=${r.getLong(1)}, min($keyB)=${r.getLong(3)}")
      require(r.getLong(2) < (1L << bitsA),
        s"zorder width too narrow: max($keyA)=${r.getLong(2)} needs > $bitsA bits — " +
          "wider keys would alias and defeat pruning")
      require(r.getLong(4) < (1L << bitsB),
        s"zorder width too narrow: max($keyB)=${r.getLong(4)} needs > $bitsB bits — " +
          "wider keys would alias and defeat pruning")
    }
    df.withColumn("__z", zorder(col(keyA), col(keyB), bitsA, bitsB))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
  }

  /** Realized per-file statistics for `key` — the zone map a pruning
    * scan consults: (file, n_rows, key_min, key_max). */
  def fileStats(spark: SparkSession, dir: String, key: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(dir)
      .select(input_file_name().as("file"), col(key).cast("long").as("k"))
      .groupBy($"file")
      .agg(count(lit(1)).as("n_rows"), min($"k").as("key_min"), max($"k").as("key_max"))
  }

  /** Small-file compaction plan: assign each data file to a compaction
    * group so every group holds ≥ `targetRows` (except possibly the
    * last), preserving key order so compacted files KEEP disjoint
    * key ranges (the zone-map property [[writeClustered]] established
    * and LayoutSpec asserts — a size-only bin-packing would interleave
    * ranges and destroy pruning). The maintenance planner every table
    * format runs against small-file buildup from streaming ingest.
    *
    * Group id = running row count up to the PREVIOUS file, div target
    * — a window over the #files-row stats frame (file metadata, never
    * data; the same deliberately-tiny-frame pattern as q111's
    * offsets). The stateless rule means group sizes are target ± one
    * file's rows (a group whose predecessor overshot starts late) —
    * the right trade for a planner: a sequential exact fold would
    * serialize on the driver for a tolerance no compaction job cares
    * about. Execution is then one `spark.read.parquet(files of
    * group).repartition(1).write` per group, embarrassingly parallel
    * across groups. */
  def compactionPlan(spark: SparkSession, dir: String, key: String,
      targetRows: Long): DataFrame = {
    require(targetRows > 0, s"need targetRows > 0 (got $targetRows)")
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"key_min", $"file")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    fileStats(spark, dir, key)
      .withColumn("rows_before", coalesce(sum($"n_rows").over(w), lit(0L)))
      .withColumn("group_id", expr(s"rows_before div $targetRows").cast("int"))
      .select($"file", $"n_rows", $"key_min", $"key_max", $"group_id")
      .orderBy($"key_min", $"file")
  }
}
