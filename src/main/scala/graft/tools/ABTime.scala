// Same-session interleaved A/B timing — the drift-vs-real instrument.
//
// Usage: sbt "runMain graft.tools.ABTime <sfDir> <sweeps> <query...>"
//
// QTime answers "what does this query cost in a fresh JVM" (cold/warm/
// warm2, consecutive). It cannot disambiguate CROSS-ARTIFACT drift: two
// bench artifacts from different sessions/days can disagree 1.3-1.5×
// on the same untouched code (SCALE.md's host-drift note), and a
// consecutive re-run inherits whatever steal window it lands in. This
// tool runs N full INTERLEAVED sweeps over the requested queries in ONE
// session (sweep = q1..qk in order, repeated) after one untimed warmup
// pass, and prints per-query min / median / max plus every observation
// — the same noise-rejection design as Bench, applied to a handful of
// queries so a 5-sweep sf3 A/B finishes in minutes. Read the MIN
// against both artifacts' numbers: if it reproduces artifact A, the B
// number was drift; if it lands between, the truth is the min (a query
// can run slower than its plan by noise, never faster).
package graft.tools

import org.apache.spark.sql.SparkSession

object ABTime {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ABTime <sfDir> <sweeps> <query...>")
    val sfDir = args(0)
    val sweeps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = graft.ToolSession.build(sfDir, "graft-abtime")
    val fns = names.map(n => n -> graft.SparkEntry.queries.getOrElse(n,
      sys.error(s"no such query: $n")))
    // untimed warmup: memo builds + codegen, like Bench pass 1
    fns.foreach { case (_, fn) => fn(spark, sfDir).count() }
    System.gc(); Thread.sleep(2000)
    val obs = (1 to sweeps).map { s =>
      fns.map { case (n, fn) =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val w = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[ab $s/$sweeps] $n%-40s $w%8.2f s")
        n -> w
      }
    }
    names.zipWithIndex.foreach { case (n, i) =>
      val xs = obs.map(_(i)._2).sorted
      val med = if (xs.size % 2 == 1) xs(xs.size / 2)
        else (xs(xs.size / 2 - 1) + xs(xs.size / 2)) / 2.0
      println(f"ABTIME $n min=${xs.head}%.2f med=$med%.2f max=${xs.last}%.2f " +
        s"all=[${xs.map(x => f"$x%.2f").mkString(",")}]")
    }
    graft.core.PersistedMemo.clearAll()
    spark.stop()
  }
}
