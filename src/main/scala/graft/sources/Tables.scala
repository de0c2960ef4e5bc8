package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named loaders for the driver-generated TPC-H-ish parquet tables
  * (TESTDATA.md): `region nation customer supplier part orders lineitem
  * events documents embeddings`, one parquet file per table under the
  * scale-factor directory passed to every catalog query.
  *
  * Design notes for scale (100 TB target):
  *  - Parquet self-describes its schema; we never `inferSchema`. This
  *    mirrors the reference's statically-declared stores (lambda-sample
  *    `resources/cassandra/schema.sql:4-19`) — fixed schemas, no guessing.
  *  - Loaders return the raw scan; each operator applies its own
  *    `select`/`filter` so Catalyst pushes projection and predicates into
  *    the vectorized parquet reader (`PushedFilters`/`ReadSchema` in
  *    `.explain`). Nothing here materializes or caches.
  *  - On a real cluster these would be partitioned/bucketed table roots
  *    (e.g. entry data partitioned by key, sorted by ts — the analog of
  *    the reference's Cassandra clustering); the API shape is identical.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  /** The events table carries TIMESTAMP(NANOS) — Spark has no nanosecond
    * timestamp type, so read nanos as Long and FLOOR to microseconds
    * (DuckDB's nanos→TIMESTAMP conversion floors, so truncate-toward-
    * zero `div` would diverge on pre-epoch timestamps; the floor-div is
    * pure integer algebra — a double round-trip would lose precision
    * above 2^53 ns ≈ 1970+104 days). The `nanosAsLong` conf is also set
    * at session build by Bench/Verify/SparkSpecBase; setting it here too
    * (idempotent — it is read at scan planning, same thread) keeps the
    * loader usable from any entry point, e.g. the driver's smoke check. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr(
          "(ts div 1000) - CAST((ts % 1000) < 0 AS INT)")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
