package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Schemas

/** CSV source/sink for the entry table (reference S12/S13: the
  * headerless `entries.csv` REPL flow, lib/EntriesFixture.scala:21-27,
  * and the `cqlsh copy ... to 'list.csv'` export, README.md:163).
  * Schema is always the declared entry StructType — never inferred. */
object Csv {

  /** Reference fixture timestamp shape: `2017-11-07 08:14:10.001+0000`. */
  val TsFormat = "yyyy-MM-dd HH:mm:ss.SSSZ"

  def readEntries(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(Schemas.entry)
      .option("timestampFormat", TsFormat)
      .csv(path)

  def writeEntries(df: DataFrame, path: String): Unit =
    df.select("sensor", "ts", "value", "anomaly")
      .write.mode("overwrite")
      .option("timestampFormat", TsFormat)
      .csv(path)
}
