package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located fact/fact joins — the 100 TB
  * answer to the orders⋈lineitem shuffle (SCALE.md "Joins").
  *
  * Writing both facts bucketed (and sorted) by the join key lets Spark
  * plan a sort-merge join with ZERO Exchange on either side: at cluster
  * scale that turns the dominant network cost of every key-aligned join
  * into a local merge. BucketingSpec asserts the no-Exchange plan.
  *
  * Uses the session catalog (`saveAsTable` — bucket metadata lives in
  * the catalog, not the files), so callers set `spark.sql.warehouse.dir`
  * to the intended warehouse root.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Co-locate orders and lineitem on the order key (same bucket count
    * on both sides is what makes the join exchange-free). */
  def colocateOrdersLineitem(spark: SparkSession, dir: String, buckets: Int = 8): Unit = {
    writeBucketed(Tables.orders(spark, dir), "orders_bkt", "o_orderkey", buckets)
    writeBucketed(Tables.lineitem(spark, dir), "lineitem_bkt", "l_orderkey", buckets)
  }
}
