// Splits the IVF cell-assignment cost into PLAN BUILD (expr parse +
// analysis of the centroid-matrix literal) vs EXECUTION (the N × nlist
// dot products) at a sweep of cell counts — the instrument behind the
// round-9 "√N assignment tax" question: is the q213/q218 sf1 regression
// paid per ROW (real FLOPs) or per PLAN (a driver-side constant that
// only looks like a data cost because nlist rides √N)?
// Usage: sbt "runMain graft.tools.AssignProbe <sfDir> <nlist...>"
package graft.tools

import org.apache.spark.sql.SparkSession

object AssignProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: AssignProbe <sfDir> <nlist...>")
    val sfDir = args(0)
    val nlists = args.drop(1).map(_.toInt).toSeq
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
    val df = graft.sources.Tables.embeddings(spark, sfDir)
    df.count() // warm the scan so exec time is the assignment itself
    nlists.foreach { nl =>
      def once(): (Double, Double) = {
        val t0 = System.nanoTime()
        val a = graft.operators.Similarity.assignCells(df, nl)
        val t1 = System.nanoTime()
        a.count()
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      }
      val (b1, e1) = once()
      val (b2, e2) = once()
      val (b3, e3) = once()
      println(f"ASSIGN nlist=$nl%d build=$b1%.3f/$b2%.3f/$b3%.3f exec=$e1%.3f/$e2%.3f/$e3%.3f")
    }
    graft.core.PersistedMemo.clearAll()
    spark.stop()
  }
}
