// Isolated per-query timing: run the named catalog queries in THIS
// fresh JVM (cold then warm), printing one line each — the tool that
// separates a genuine plan-shape regression from bench-session
// pressure (shared caches, GC drag from earlier queries).
// Usage: sbt "runMain graft.tools.QTime <sfDir> <query...>"
package graft.tools

import org.apache.spark.sql.SparkSession

object QTime {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QTime <sfDir> <query...>")
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = graft.ToolSession.build(sfDir, "graft-qtime")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries.getOrElse(n,
        sys.error(s"no such query: $n"))
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once()
      val warm = once()
      val warm2 = once()
      println(f"QTIME $n cold=$cold%.2f warm=$warm%.2f warm2=$warm2%.2f")
    }
    graft.core.PersistedMemo.clearAll()
    spark.stop()
  }
}
