package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.core.MqttEntry
import graft.streaming.{EntryLogCompactor, IngestStream}

/** Live-sink compaction (the round-7 soak's un-compacted-log tax):
  * [[EntryLogCompactor]] folds a streaming parquet sink's micro-batch
  * files into a few large ones using the sink's own manifest, and
  * serves reads as compacted ∪ manifest tail — content-identical to
  * the raw read, with a cold-open file count bounded by the tick
  * cadence instead of the sink's age. */
class CompactorSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  // MULTISET compare (sorted seq, not set): a set compare would hide
  // the double-count a manifest COMPACT batch can introduce when the
  // tail re-includes already-folded files
  private def rowSet(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Double, Int)] =
    df.selectExpr("sensor", "unix_micros(ts)", "value", "anomaly")
      .as[(String, Long, Double, Int)].collect().toSeq.sorted

  private def parquetFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet") || f.getName.startsWith("part-")) Seq(f)
      else Seq.empty
    walk(new java.io.File(dir))
  }

  test("compacted read is content-identical to the raw sink read, with bounded files") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[MqttEntry]
    val entryDir = tmp("graft-centry")
    val compDir = tmp("graft-ccomp")
    val q = IngestStream.start(source.toDF(), entryDir, tmp("graft-cckpt"),
      Trigger.ProcessingTime(0))
    // several micro-batches → several small files per sensor partition
    (1 to 8).foreach { b =>
      source.addData((1 to 10).map(i => MqttEntry(s"s${i % 3}", b * 100.0 + i, i % 2)): _*)
      q.processAllAvailable()
    }
    val c = new EntryLogCompactor(spark, entryDir, compDir)

    // before any tick: read() = manifest tail = exactly the raw table
    rowSet(c.read()) shouldBe rowSet(spark.read.parquet(entryDir))

    // tick folds everything committed so far
    val folded = c.tick()
    folded should be > 0
    rowSet(c.read()) shouldBe rowSet(spark.read.parquet(entryDir))
    // the compacted representation is a few files, not one per batch×partition
    parquetFiles(compDir).size should be <= 2

    // an idle tick is a no-op
    c.tick() shouldBe 0

    // new batches land in the tail, still content-identical — the range
    // deliberately crosses the sink log's 10-batch COMPACT boundary, so
    // the tail manifest re-lists history and the compactor must not
    // double-count the already-folded files
    // 9..31 crosses SEVERAL 10-batch compact boundaries, so in-range
    // files appear repeatedly across manifests — the multiset compare
    // below fails if any repeat is read twice
    (9 to 31).foreach { b =>
      source.addData((1 to 10).map(i => MqttEntry(s"s${i % 3}", b * 100.0 + i, i % 2)): _*)
      q.processAllAvailable()
    }
    rowSet(c.read()) shouldBe rowSet(spark.read.parquet(entryDir))

    // second tick folds only the fresh files; content still identical
    c.tick() should be > 0
    val raw = rowSet(spark.read.parquet(entryDir))
    rowSet(c.read()) shouldBe raw
    raw should not be empty

    // cold-open cost: the compaction-aware read opens far fewer files
    // than the raw dir holds
    val rawFiles = parquetFiles(entryDir).size
    val compactFiles = parquetFiles(compDir).size
    withClue(s"raw=$rawFiles compacted=$compactFiles: ") {
      compactFiles should be < rawFiles
    }
    q.stop()
  }

  test("a restarted compactor resumes from the state marker instead of re-folding history") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[MqttEntry]
    val entryDir = tmp("graft-rentry")
    val compDir = tmp("graft-rcomp")
    val q = IngestStream.start(source.toDF(), entryDir, tmp("graft-rckpt"),
      Trigger.ProcessingTime(0))
    (1 to 4).foreach { b =>
      source.addData((1 to 8).map(i => MqttEntry(s"s${i % 2}", b * 10.0 + i, 0)): _*)
      q.processAllAvailable()
    }
    val c1 = new EntryLogCompactor(spark, entryDir, compDir)
    val folded1 = c1.tick()
    folded1 should be > 0
    val dirsAfterFirst = new java.io.File(compDir).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    // process restart: a NEW instance over the same dirs
    (5 to 6).foreach { b =>
      source.addData((1 to 8).map(i => MqttEntry(s"s${i % 2}", b * 10.0 + i, 0)): _*)
      q.processAllAvailable()
    }
    val c2 = new EntryLogCompactor(spark, entryDir, compDir)
    // resumed state: only the post-restart batches fold (a cold instance
    // would re-fold all 6 batches' files)
    val folded2 = c2.tick()
    folded2 should be > 0
    // 2 post-restart batches fold fewer files than the 4 pre-restart
    // ones did — a cold instance would have re-folded all 6 batches
    folded2 should be < folded1
    // content identical to the raw sink, old tick dir still served
    rowSet(c2.read()) shouldBe rowSet(spark.read.parquet(entryDir))
    val dirsAfterSecond = new java.io.File(compDir).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    dirsAfterFirst.subsetOf(dirsAfterSecond) shouldBe true
    q.stop()
  }

  test("a re-run tick of the same range is idempotent (overwrite keyed by batch id)") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[MqttEntry]
    val entryDir = tmp("graft-ientry")
    val compDir = tmp("graft-icomp")
    val q = IngestStream.start(source.toDF(), entryDir, tmp("graft-ickpt"),
      Trigger.ProcessingTime(0))
    source.addData((1 to 20).map(i => MqttEntry(s"s${i % 2}", i.toDouble, 0)): _*)
    q.processAllAvailable()
    val c1 = new EntryLogCompactor(spark, entryDir, compDir)
    c1.tick()
    val after1 = rowSet(c1.read())
    // a SECOND compactor over the same dirs (crash-restart shape) folds
    // the same manifest range onto the same t<batch> path — no dupes
    val c2 = new EntryLogCompactor(spark, entryDir, compDir)
    c2.tick()
    rowSet(c2.read()) shouldBe after1
    rowSet(c2.read()) shouldBe rowSet(spark.read.parquet(entryDir))
    q.stop()
  }

  test("fold-up merges tick dirs past the threshold and keeps content") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[MqttEntry]
    val entryDir = tmp("graft-fentry")
    val compDir = tmp("graft-fcomp")
    val q = IngestStream.start(source.toDF(), entryDir, tmp("graft-fckpt"),
      Trigger.ProcessingTime(0))
    val c = new EntryLogCompactor(spark, entryDir, compDir, foldThreshold = 3)
    (1 to 5).foreach { b =>
      source.addData((1 to 5).map(i => MqttEntry(s"s$i", b * 10.0 + i, 0)): _*)
      q.processAllAvailable()
      c.tick()
    }
    rowSet(c.read()) shouldBe rowSet(spark.read.parquet(entryDir))
    // after fold-up the live tick dirs collapsed (t*_merged present)
    new java.io.File(compDir).listFiles().map(_.getName).exists(_.endsWith("_merged")) shouldBe true
    c.close() // deletes superseded dirs; content must survive
    rowSet(c.read()) shouldBe rowSet(spark.read.parquet(entryDir))
    q.stop()
  }
}
