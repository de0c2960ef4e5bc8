package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.GraftFunctions
import graft.sources.Tables

/** Ad-hoc SQL surface — SURVEY §4's "free in Catalyst if we expose SQL"
  * claim, made concrete. `open` registers the ten driver tables as temp
  * views over a scale-factor directory plus the engine's native
  * functions, so `spark.sql("SELECT ... graft_cosine(...) ...")` runs
  * the SAME optimized plans as the Scala catalog: one parser front-end,
  * one Catalyst pipeline — predicate pushdown, column pruning, constant
  * folding, subquery decorrelation all apply identically
  * (SqlSurfaceSpec asserts plan equality with the DataFrame forms).
  *
  * Reference analog: the HTTP query surface (lambda-sample
  * dashboard/Dashboard.scala routes) — the reference's only ad-hoc
  * entry point is per-sensor REST lookups; SQL over the same tables is
  * the warehouse-grade generalization.
  *
  * Scale note: temp views are metadata only — each references the
  * lazily-planned parquet scan, so registering ten views costs nothing
  * and every SQL query still plans its own pruned, pushed-down scan. On
  * a real cluster these would be external catalog tables over
  * partitioned roots; the query text is identical.
  */
object GraftSession {

  /** The driver-generated tables (TESTDATA.md). */
  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register all tables under `dir` as temp views + graft functions on
    * an existing session. Idempotent; returns the session for chaining.
    * `events` goes through [[Tables.events]] so its TIMESTAMP(NANOS)
    * column is truncated exactly like the Scala catalog sees it. */
  def open(spark: SparkSession, dir: String): SparkSession = {
    GraftFunctions.register(spark)
    TableNames.foreach { n =>
      val df =
        if (n == "events") Tables.events(spark, dir)
        else Tables.table(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
    spark
  }

  /** Core count a master string implies — `local[N]` is N, `local[*]`
    * and anything non-local read the machine (the same default Spark
    * itself uses for local mode). Exposed for the spec. */
  private[graft] def coresFor(master: String): Int = {
    val m = "local\\[(\\d+)\\]".r
    master match {
      case m(n) => n.toInt
      case _    => Runtime.getRuntime.availableProcessors()
    }
  }

  /** Standalone entry point for a pure-SQL user: build a session wired
    * with [[GraftExtensions]] (native `graft_dot`/`graft_cosine`) and
    * the engine's confs, with views over `dir` ready to query.
    *
    * Shuffle parallelism rides the SAME input-scaled full-wave rule as
    * every measurement session ([[ToolSession.shufflePartitionsFor]]) —
    * round-12 pinned 32 here while the tools got the rule, so a
    * pure-SQL user at sf30+ inherited exactly the pin the round proved
    * costs 13% on q140 and measured as a 1.5-1.7× straggler-wave
    * hazard (r12 verdict ask). At ≤ sf10 inputs on 32 cores the rule
    * floors at the same 32 the pin gave, so the committed geometry is
    * bit-identical. */
  def build(dir: String, master: String = "local[*]"): SparkSession = {
    val parts = ToolSession.shufflePartitionsFor(
      coresFor(master), ToolSession.dirBytes(dir))
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft-sql")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .getOrCreate()
    open(spark, dir)
  }

  /** One-shot: ensure views over `dir`, run `query`. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame =
    open(spark, dir).sql(query)
}
