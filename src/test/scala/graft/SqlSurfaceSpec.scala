package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SQL front-end (GraftSession): ad-hoc `spark.sql` over the registered
  * views must hit the SAME Catalyst pipeline as the Scala catalog —
  * asserted as canonicalized-optimized-plan EQUALITY with the DataFrame
  * forms, so pushdown/pruning/folding wins carry over verbatim (SURVEY
  * §4's "free if we expose SQL" claim, closed). */
class SqlSurfaceSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def opened = GraftSession.open(spark, dir)

  private def dfForm(name: String): DataFrame = SparkEntry.queries(name)(spark, dir)

  private def assertSamePlan(sqlDf: DataFrame, df: DataFrame): Unit = {
    val a = sqlDf.queryExecution.optimizedPlan.canonicalized
    val b = df.queryExecution.optimizedPlan.canonicalized
    assert(a == b, s"\n--- SQL plan:\n$a\n--- DataFrame plan:\n$b")
  }

  test("q0 as SQL: identical optimized plan, filters still pushed to parquet") {
    // 1.0D: Spark SQL parses bare 1.0 as DECIMAL(2,1); the catalog uses
    // a double literal, and plan equality demands the same types
    val sqlDf = opened.sql(
      """SELECT l_orderkey, l_linenumber,
        |       l_extendedprice * (1.0D - l_discount) AS net_price
        |FROM lineitem
        |WHERE l_returnflag = 'R' AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)
    assertSamePlan(sqlDf, dfForm("q0_filter_project"))
    val plan = sqlDf.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    plan should include("PushedFilters")
    plan should include("IsNotNull(l_returnflag)")
  }

  test("q1 as SQL: identical optimized plan for the grouped aggregation") {
    // floor(x·10² + 0.5)/10² is the catalog's deterministic cross-engine
    // rounding (Portable.detRound) — the SQL user writes the same
    // formula (with D suffixes: bare decimals parse as DECIMAL) and
    // lands on the identical plan
    val sqlDf = opened.sql(
      """SELECT l_returnflag, l_linestatus,
        |       floor(sum(l_quantity) * 100.0D + 0.5D) / 100.0D       AS sum_qty,
        |       floor(sum(l_extendedprice) * 100.0D + 0.5D) / 100.0D  AS sum_base_price,
        |       floor(sum(l_extendedprice * (1.0D - l_discount)) * 100.0D + 0.5D) / 100.0D AS sum_disc_price,
        |       floor(sum(l_extendedprice * (1.0D - l_discount) * (1.0D + l_tax)) * 100.0D + 0.5D) / 100.0D AS sum_charge,
        |       floor(sum(l_quantity) * 100.0D + 0.5D) / 100.0D / count(1)      AS avg_qty,
        |       floor(sum(l_extendedprice) * 100.0D + 0.5D) / 100.0D / count(1) AS avg_price,
        |       floor(sum(l_discount) * 100.0D + 0.5D) / 100.0D / count(1)      AS avg_disc,
        |       count(1)                        AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-06-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    assertSamePlan(sqlDf, dfForm("q1_pricing_summary"))
  }

  test("q2 as SQL: identical optimized plan for top-N per group") {
    val sqlDf = opened.sql(
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_orderpriority, rn""".stripMargin)
    assertSamePlan(sqlDf, dfForm("q2_topn_per_group"))
  }

  test("native graft_cosine is callable from pure SQL and codegen'd") {
    import spark.implicits._
    val sqlDf = opened.sql(
      """SELECT a.vec_id AS qid, b.vec_id AS cid,
        |       graft_cosine(transform(a.embedding, x -> CAST(x AS DOUBLE)),
        |                    transform(b.embedding, x -> CAST(x AS DOUBLE))) AS cos
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |WHERE a.vec_id < 5
        |ORDER BY qid""".stripMargin)
    val viaColumns = Tables_embeddingPairs()
    val got = sqlDf.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = viaColumns.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    got shouldBe want // bit-identical: same expression, same plan shape
    sqlDf.queryExecution.executedPlan.toString should include("cosinesimilarity")
  }

  private def Tables_embeddingPairs(): DataFrame = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val e = graft.sources.Tables.embeddings(spark, dir)
      .withColumn("emb", transform($"embedding", x => x.cast("double")))
    e.as("a").filter($"a.vec_id" < 5)
      .join(e.as("b"), col("b.vec_id") === col("a.vec_id") + 1)
      .select($"a.vec_id".as("qid"), $"b.vec_id".as("cid"),
        expr("graft_cosine(a.emb, b.emb)").as("cos"))
      .orderBy($"qid")
  }

  test("q93 as SQL: same results and pruned scan for the length histogram") {
    val sqlDf = opened.sql(
      """SELECT source, CAST(length(bin(n)) - 1 AS INT) AS bucket,
        |       shiftleft(CAST(1 AS BIGINT), CAST(length(bin(n)) - 1 AS INT)) AS bucket_lo,
        |       shiftleft(CAST(1 AS BIGINT), CAST(length(bin(n)) - 1 AS INT) + 1) - 1 AS bucket_hi,
        |       count(1) AS n_docs,
        |       sum(CAST(n AS BIGINT)) AS n_tokens
        |FROM (SELECT source, size(split(text, '\\s+')) AS n FROM documents)
        |GROUP BY 1, 2
        |ORDER BY source, bucket""".stripMargin)
    sqlDf.count() shouldBe dfForm("q93_length_histogram").count()
    // same result set, same scan pruning — the SQL user pays no penalty
    val plan = sqlDf.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    plan should include("ReadSchema: struct<text:string,source:string>")
    val sqlRows = sqlDf.collect().map(_.toSeq)
    val dfRows = dfForm("q93_length_histogram").collect().map(_.toSeq)
    sqlRows shouldBe dfRows
  }

  test("q108 as SQL: identical optimized plan for the ordered LISTAGG") {
    val sqlDf = opened.sql(
      """SELECT lang, size(srcs) AS n_sources,
        |       array_join(srcs, ',') AS sources
        |FROM (SELECT lang, array_sort(collect_set(source)) AS srcs
        |      FROM documents
        |      WHERE lang IS NOT NULL AND source IS NOT NULL
        |      GROUP BY lang)
        |ORDER BY lang""".stripMargin)
    assertSamePlan(sqlDf, dfForm("q108_string_agg"))
  }

  test("views are metadata only: each SQL query plans its own pruned scan") {
    val plan = opened.sql("SELECT l_orderkey FROM lineitem WHERE l_orderkey = 1")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    plan should include("ReadSchema: struct<l_orderkey:bigint>")
    plan should include("PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,1)]")
  }
}
