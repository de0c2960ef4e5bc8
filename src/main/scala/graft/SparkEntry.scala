package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The catalog is assembled from operator modules; each module owns both
  * the Spark-first implementation and (where ANSI-SQL-expressible) the
  * DuckDB oracle used by the driver's correctness gate.
  */
object SparkEntry {

  private def catalog: Seq[Q] =
    // ONE central application of the deterministic-rounding oracle
    // rewrite (round-4 advisory: it used to be repeated in every
    // module's `all`). Idempotent — the floor form it emits contains
    // no `round(` — and a no-op for modules whose oracles never round.
    rawCatalog.map(q => q.copy(oracle = q.oracle.map(
      functions.Portable.detRoundSql)))

  private def rawCatalog: Seq[Q] =
    operators.Relational.all ++
      operators.Dedup.all ++
      operators.Similarity.all ++
      operators.SetSimilarity.all ++
      operators.TextAnalysis.all ++
      operators.Curation.all ++
      operators.Packing.all ++
      operators.Anomaly.all ++
      operators.Behavioral.all ++
      operators.Temporal.all ++
      operators.Stats.all ++
      operators.Segmentation.all ++
      operators.Timeseries.all ++
      operators.Association.all ++
      operators.Allocation.all ++
      operators.Maintenance.all ++
      operators.Graph.all ++
      operators.Skew.all ++
      multimodal.Multimodal.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's flagship analysis (lambda-sample
    * analyzer/Analyzer.scala:47-59) re-expressed as one grouped
    * aggregation over the events table. */
  def entry(spark: SparkSession): DataFrame =
    queries("q35_flagship_analysis")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(s => q.name -> s)).toMap
}
