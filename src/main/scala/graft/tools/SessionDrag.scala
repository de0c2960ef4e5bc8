// Session-drag bisection: WHY does an iterative graph query cost ~2x
// in the 221-query bench session what it costs isolated (q147 5.1 s
// min-of-3 in-session vs 2.5 s in a fresh JVM — round-6 "graph-family
// drift", which survived the min-of-interleaved-sweeps noise filter,
// so it is real session state, not host steal)?
//
// Method: time the target warm in a FRESH session (phase A), then run
// the whole catalog once (phase B — exactly the bench warmup's session
// fill), then re-time the same target (phase C). A≈C → the drift is
// elsewhere; C≫A → session state, and the per-run codegen-compile and
// GC counters say WHICH state:
//   - compile count delta > 0 per run in C but not A → the generated-
//     class cache is evicting the loop's per-round classes (janino
//     recompiles are driver-side, single-threaded, zero-GC — exactly
//     the observed signature);
//   - GC delta up → heap/cache pressure;
//   - neither → scheduler/listener/cleaner drag, profile further.
//
// Usage: sbt "runMain graft.tools.SessionDrag <sfDir> <query...>"
package graft.tools

import org.apache.spark.sql.SparkSession

object SessionDrag {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val targets =
      if (args.length > 1) args.drop(1).toSeq else Seq("q147_label_propagation")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def compiles: Long =
      org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    val gcBeans = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala.toSeq
    }
    def gcMs: Long = gcBeans.map(_.getCollectionTime).sum

    def time(phase: String, n: String): Unit = {
      val (t0, c0, g0) = (System.nanoTime(), compiles, gcMs)
      graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(f"DRAG $phase $n wall=${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"compiles=${compiles - c0} gc=${(gcMs - g0) / 1e3}%.2f s")
    }

    // phase A: fresh-session warm cost of the targets
    targets.foreach { n =>
      graft.SparkEntry.queries(n)(spark, sfDir).count() // untimed warm
      (1 to 3).foreach(_ => time("A-fresh", n))
    }
    // phase B: fill the session exactly like the bench warmup
    val t0 = System.nanoTime()
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      try fn(spark, sfDir).count()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    println(f"DRAG B-fill all-queries ${(System.nanoTime() - t0) / 1e9}%.1f s")
    // phase C: same targets in the filled session
    targets.foreach(n => (1 to 3).foreach(_ => time("C-filled", n)))
    graft.core.PersistedMemo.clearAll()
    spark.stop()
  }
}
