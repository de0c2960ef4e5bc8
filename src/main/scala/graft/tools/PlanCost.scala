// Scratch: split a catalog query's cost into PLANNING (initial
// analyze + optimize + physical-plan, driver-side, single-threaded)
// vs EXECUTION, with stage/task/executor-CPU accounting.
//
// Reading the output: AQE re-optimization happens LAZILY during
// execution (AdaptiveSparkPlanExec re-plans at each stage boundary
// inside the action), so a per-stage re-planning tax lands in the
// `exec` column, NOT `plan` — the discriminator for that regression
// class (the round-5 q100 / round-6 q220 mechanism) is exec wall
// far above `cpu` with a small task count: executors idle while the
// driver re-plans. `plan` catches the other half (the cost of
// ANALYZING a huge lazy tree once, plus any eager work a query does
// at construction, e.g. q100's per-round localCheckpoint loop).
// Usage: sbt "runMain graft.tools.PlanCost <sfDir> <query...>"
package graft.tools

import org.apache.spark.sql.SparkSession

object PlanCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new java.util.concurrent.atomic.AtomicLong()
    val tasks = new java.util.concurrent.atomic.AtomicLong()
    val taskTime = new java.util.concurrent.atomic.AtomicLong()
    // per-stage accounting so a CPU total attributes to a PLAN NODE:
    // (stage run time, task count, the stage's name = its top call site)
    val stageRows = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Int, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks)
        taskTime.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
        stageRows.add((sc.stageInfo.taskMetrics.executorRunTime,
          sc.stageInfo.numTasks, sc.stageInfo.name.take(90)))
      }
    })
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      fn(spark, sfDir).count() // warm: memos built, codegen cached
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.queryExecution.executedPlan // force analyze+optimize+plan
        val t1 = System.nanoTime()
        val (s0, k0, m0) = (stages.get, tasks.get, taskTime.get)
        stageRows.clear()
        df.count()
        val t2 = System.nanoTime()
        println(f"PLANCOST $n run$i plan=${(t1 - t0) / 1e9}%.2f s " +
          f"exec=${(t2 - t1) / 1e9}%.2f s stages=${stages.get - s0} " +
          f"tasks=${tasks.get - k0} cpu=${(taskTime.get - m0) / 1e3}%.1f s")
        if (i == 2) {
          import scala.jdk.CollectionConverters._
          stageRows.asScala.toSeq.sortBy(-_._1).take(6).foreach { case (ms, k, nm) =>
            println(f"PLANCOST   stage ${ms / 1e3}%7.1f s cpu $k%4d tasks  $nm")
          }
        }
      }
    }
    spark.stop()
  }
}
