package graft

import org.apache.spark.sql.functions._

import graft.sources.{Layout, Tables}

/** Write-layout proofs: the per-file zone maps a pruning scan consults
  * must actually be skippable after our clustered writes. */
class LayoutSpec extends SparkSpecBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("range-clustered write yields disjoint per-file key ranges (zone-map skippable)") {
    val out = java.nio.file.Files.createTempDirectory("layout").toString
    Layout.writeClustered(Tables.lineitem(spark, sfDir), out, "l_orderkey", 8)
    val stats = Layout.fileStats(spark, out, "l_orderkey")
      .orderBy($"key_min").collect()
    stats.length shouldBe 8 // the small-files knob is exact
    stats.map(_.getAs[Long]("n_rows")).sum shouldBe
      Tables.lineitem(spark, sfDir).count()
    // consecutive files may share at most the boundary key (range
    // partitioning splits on key values); interiors never overlap —
    // a point/range predicate prunes to O(1) files
    stats.sliding(2).foreach { case Array(a, b) =>
      b.getAs[Long]("key_min") should be >= a.getAs[Long]("key_max")
    }
    // an un-clustered write, for contrast, spans ~the whole domain per
    // file: every file would survive pruning. Quantify the win: the
    // average clustered file covers < 1/4 of the key domain (8 files
    // would each cover ~1/8 plus boundary slack).
    val lo = stats.map(_.getAs[Long]("key_min")).min
    val hi = stats.map(_.getAs[Long]("key_max")).max
    val domain = (hi - lo).toDouble
    val avgSpan = stats.map(r => (r.getAs[Long]("key_max") - r.getAs[Long]("key_min")).toDouble)
      .sum / stats.length
    avgSpan / domain should be < 0.25
  }

  test("z-order write bounds BOTH dimensions' per-file ranges") {
    val out = java.nio.file.Files.createTempDirectory("layoutz").toString
    // two independent uniform dimensions: suppkey and partkey
    Layout.writeZOrdered(Tables.lineitem(spark, sfDir), out, "l_suppkey", "l_partkey",
      16, bitsA = 4, bitsB = 8) // suppkey ∈ [0,10), partkey ∈ [0,200)
    val spanOf = { key: String =>
      val st = Layout.fileStats(spark, out, key)
        .withColumn("span", $"key_max" - $"key_min").collect()
      val domain = (st.map(_.getAs[Long]("key_max")).max
        - st.map(_.getAs[Long]("key_min")).min).toDouble
      st.map(_.getAs[Long]("span").toDouble).sum / st.length / domain
    }
    // a single-key sort leaves the OTHER key's per-file span at ~1.0
    // (whole domain); z-order keeps both strictly bounded away from it
    spanOf("l_suppkey") should be < 0.8
    spanOf("l_partkey") should be < 0.8
    // the interleave is injective over in-width pairs: distinct
    // (suppkey, partkey) pairs get distinct codes
    val pairs = Tables.lineitem(spark, sfDir)
      .select($"l_suppkey", $"l_partkey").distinct()
    val nPairs = pairs.count()
    pairs.select(Layout.zorder($"l_suppkey", $"l_partkey", 4, 8).as("z"))
      .distinct().count() shouldBe nPairs
    // and MSB-aligned bit order is exactly Morton: hand-computed codes
    val hand = spark.range(1)
      .select(
        Layout.zorder(lit(5), lit(3), 4, 4).as("z44"),
        Layout.zorder(lit(5), lit(3), 4, 8).as("z48"))
      .head()
    hand.getLong(0) shouldBe 39L // interleave(0101, 0011) = 00 10 01 11
    hand.getLong(1) shouldBe 547L // a's 4 bits lead, b's low bits trail
  }

  test("z-order write of an empty frame succeeds (nothing to validate or alias)") {
    val out = java.nio.file.Files.createTempDirectory("layoutempty").toString
    Layout.writeZOrdered(
      Tables.lineitem(spark, sfDir).filter($"l_orderkey" < 0),
      out, "l_suppkey", "l_partkey", 4, bitsA = 4, bitsB = 8)
    spark.read.parquet(out).count() shouldBe 0L
  }

  test("z-order write refuses keys wider than the declared bit widths") {
    val out = java.nio.file.Files.createTempDirectory("layoutbad").toString
    val e = intercept[IllegalArgumentException] {
      // l_partkey reaches 199 — 4 bits would silently alias 5 and 21
      Layout.writeZOrdered(Tables.lineitem(spark, sfDir), out, "l_suppkey", "l_partkey",
        8, bitsA = 4, bitsB = 4)
    }
    e.getMessage should include("alias")
  }

  test("compaction plan reaches the row target per group and keeps ranges disjoint") {
    val out = java.nio.file.Files.createTempDirectory("layoutcmp").toString
    // 32 deliberately-small files — streaming-ingest buildup
    Layout.writeClustered(Tables.lineitem(spark, sfDir), out, "l_orderkey", 32)
    val total = Tables.lineitem(spark, sfDir).count()
    val target = total / 4
    val plan = Layout.compactionPlan(spark, out, "l_orderkey", target)
      .collect()

    // every file is assigned exactly once; row mass is conserved
    plan.length shouldBe 32
    plan.map(_.getAs[String]("file")).distinct.length shouldBe 32
    plan.map(_.getAs[Long]("n_rows")).sum shouldBe total

    val byGroup = plan.groupBy(_.getAs[Int]("group_id"))
    val maxGroup = byGroup.keys.max
    // each group except possibly the last reaches target within one
    // file's rows (the documented tolerance of the stateless div rule:
    // a group whose predecessor overshot starts late)
    val maxFile = plan.map(_.getAs[Long]("n_rows")).max
    byGroup.foreach { case (g, files) =>
      if (g < maxGroup)
        files.map(_.getAs[Long]("n_rows")).sum should be > target - maxFile
    }
    // key-ordered assignment ⇒ compacted outputs keep disjoint ranges:
    // group g's max key never exceeds group g+1's min key
    val ranges = byGroup.toSeq.sortBy(_._1).map { case (g, files) =>
      (g, files.map(_.getAs[Long]("key_min")).min,
        files.map(_.getAs[Long]("key_max")).max)
    }
    ranges.sliding(2).foreach { r =>
      if (r.length == 2) r(0)._3 should be <= r(1)._2
    }
  }

  test("Hilbert index is the true curve: bijective AND unit-step adjacent") {
    // full 64×64 grid: the d-index must be a permutation of 0..4095 and
    // every consecutive pair of cells along the curve must be Manhattan
    // neighbors — the defining property (Z-order fails it at every
    // quadrant seam), and the reason q210's file bounding boxes tighten
    val grid = spark.range(64L * 64)
      .select(expr("id div 64").as("x"), ($"id" % 64).as("y"))
    val walk = graft.Graft.hilbertIndex(grid, "x", "y")
      .select($"hd", $"x", $"y")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    walk.map(_._1).toSeq shouldBe (0L until 4096L)
    walk.sliding(2).foreach { case Array((_, x1, y1), (_, x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) shouldBe 1L
    }
  }

  test("q210: Hilbert file spans are no looser than Z-order's, both pruned") {
    val rows = SparkEntry.queries("q210_hilbert_layout")(
      spark, "/root/testdata/sf0.001").collect()
    val area = rows.groupBy(_.getAs[String]("layout")).view.mapValues(_.map { r =>
      (r.getAs[Long]("u_hi") - r.getAs[Long]("u_lo") + 1) *
        (r.getAs[Long]("d_hi") - r.getAs[Long]("d_lo") + 1)
    }.sum).toMap
    // the layout claim, measured: total footer bounding-box area
    area("hilbert") should be <= area("zorder")
    // and both beat the 16-files-×-full-grid worst case
    area("hilbert") should be < 16L * 64 * 64
  }
}
