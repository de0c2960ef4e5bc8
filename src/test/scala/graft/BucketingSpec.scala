package graft

import org.apache.spark.sql.functions._

import graft.sources.Bucketing

/** Bucketed co-located join: the orders⋈lineitem sort-merge join over
  * same-bucket-count tables must plan WITHOUT a shuffle Exchange on
  * either side — the layout that removes the dominant network cost of
  * key-aligned fact joins at cluster scale. */
class BucketingSpec extends SparkSpecBase {
  import spark.implicits._

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmTree)
    f.delete()
  }

  test("same-key bucketed fact tables join with zero Exchange") {
    // the in-memory catalog forgets tables between JVMs but their
    // warehouse directories persist — clear both before writing
    val warehouse = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    Seq("orders_bkt", "lineitem_bkt").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(warehouse, t)
      if (loc.exists()) rmTree(loc)
    }
    Bucketing.colocateOrdersLineitem(spark, "/root/testdata/sf0.001", buckets = 8)
    // at test scale Spark would auto-broadcast the tiny fact; disable it
    // so the plan exercises the bucketed sort-merge path a 100 TB
    // fact/fact join would take
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      runAssertions()
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  private def runAssertions(): Unit = {
    val joined = spark.table("orders_bkt")
      .join(spark.table("lineitem_bkt"),
        $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderpriority")
      .agg(sum($"l_quantity").as("qty"))

    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not shuffle either fact side; the only
    // exchange allowed is the post-join aggregation's
    val joinSection = plan.split("HashAggregate").last
    joinSection should include("SortMergeJoin")
    joinSection should not include "Exchange"

    // and it computes the right thing
    val viaBuckets = joined.orderBy($"o_orderpriority").as[(String, Double)].collect()
    val direct = sources.Tables.orders(spark, "/root/testdata/sf0.001")
      .join(sources.Tables.lineitem(spark, "/root/testdata/sf0.001"),
        $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderpriority").agg(sum($"l_quantity").as("qty"))
      .orderBy($"o_orderpriority").as[(String, Double)].collect()
    viaBuckets shouldBe direct
  }
}
