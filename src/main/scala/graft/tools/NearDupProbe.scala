// Production-calibration probe for the banded near-dup chain at large
// scale factors.
//
// Usage: sbt "runMain graft.tools.NearDupProbe <sfDir> <bandBits> [threshold]"
//
// q55's catalog calibration (16 bands × 8 bits) is pinned by its oracle
// hash, but a fixed band width has a BIRTHDAY FLOOR: random sign
// collisions put N/2^bandBits vectors in every bucket regardless of
// true similarity, so the raw candidate volume grows N²/2^bandBits while
// the candidate FRACTION stays flat — at the sf30 rehearsal (600k
// vectors) the 8-bit build is ~1.2·10¹⁰ raw rows, refused by the
// pre-flight gate (bandCandidates' raw-volume budget). The production
// response the gate names — widen bandBits as N grows, keeping expected
// bucket occupancy constant — is what this probe measures: the SAME
// facade chain (banding → pre-flight → candidates → exact verify) at a
// caller-chosen band width, timed cold then warm, with the audit row
// count and pass count printed for the capacity-planning readout.
package graft.tools

import org.apache.spark.sql.SparkSession

object NearDupProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: NearDupProbe <sfDir> <bandBits> [threshold]")
    val sfDir = args(0)
    val bandBits = args(1).toInt
    val threshold = if (args.length > 2) args(2).toDouble else 0.85
    val spark = graft.ToolSession.build(sfDir, "graft-neardup-probe")
    def once(): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = graft.Graft.embeddingNearDupPairs(
        spark, sfDir, threshold = threshold, bands = 16, bandBits = bandBits)
        .count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // candidate volume prints from the build telemetry (stderr); the
    // counted output is the passing set at `threshold`
    val (cold, n1) = once()
    val (warm, n2) = once()
    require(n1 == n2, s"non-deterministic passing set: $n1 vs $n2")
    println(f"NEARDUP sf=$sfDir bandBits=$bandBits threshold=$threshold " +
      f"cold=$cold%.2f warm=$warm%.2f passing=$n1")
    graft.core.PersistedMemo.clearAll()
    spark.stop()
  }
}
