package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC source/sink — the second columnar interchange format next to
  * parquet (the reference's stores are row stores, lambda-sample
  * `cassandra/schema.sql`; a Spark-native engine exchanges columnar
  * files with warehouse peers, and ORC is the one Spark bundles besides
  * parquet).
  *
  * Same contract as [[Tables]]: ORC self-describes its schema (never
  * inferred), readers return the raw scan so Catalyst pushes projection
  * and predicates into the vectorized ORC reader (`PushedFilters` /
  * pruned `ReadSchema` — OrcSpec locks both), and hive-style
  * `partitionBy` directories give partition pruning on the partition
  * key exactly as the parquet layouts do.
  *
  * Scale note (100 TB): ORC carries per-stride min/max + bloom indexes
  * like parquet's zone maps, so the [[Layout]] discipline — cluster or
  * z-order on the query keys before writing — pays off identically;
  * `write` composes with a pre-sorted frame unchanged. */
object Orc {

  /** Write `df` as ORC under `outDir`, optionally hive-partitioned. */
  def write(df: DataFrame, outDir: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(outDir)
  }

  /** Read an ORC table root (partition columns recovered from the
    * directory layout, schema from the file footers). */
  def read(spark: SparkSession, dir: String): DataFrame = spark.read.orc(dir)
}
