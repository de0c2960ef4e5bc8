// Scratch probe for the q167 pipeline stage economics at a given SF.
// Usage: sbt "runMain graft.tools.SetSimProbe [sfDir]"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object SetSimProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val toks = graft.operators.SetSimilarity.tokenSets(spark, sfDir)
    timed("shingles build+count") {
      println("PROBE shingle rows: " + toks.count())
    }
    timed("shingles recount (memo warm)")(toks.count())
    val cands = graft.operators.SetSimilarity.prefixCandidates(toks, 0.5)
    timed("candidates") {
      println("PROBE candidates: " + cands.count())
    }
    timed("candidates again")(cands.count())
    timed("full q167") {
      graft.operators.SetSimilarity.prefixJoin(toks, 0.5).count()
    }
    timed("full q167 again") {
      graft.operators.SetSimilarity.prefixJoin(toks, 0.5).count()
    }
    spark.stop()
  }
}
