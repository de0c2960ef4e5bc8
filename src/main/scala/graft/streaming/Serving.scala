package graft.streaming

import graft.core.SensorMeta

/** JSON serving shim (reference S14: lib/JsonSerializer.scala:13-15 via
  * analyzer/Endpoint.scala:60): renders an AllMeta envelope
  * `{"entries":[...]}` — golden empty shape `{"entries":[]}` asserted
  * exactly as in EndpointSpec.scala:42. Timestamps render as UTC ISO
  * strings; doubles in their shortest Scala form. */
object Serving {

  /** JSON string escaper — shared with every shim that interpolates
    * uncontrolled text (e.g. exception messages) into a JSON body. */
  private[graft] def esc(s: String): String =
    Option(s).getOrElse("").flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** NaN/Infinity are not legal JSON — a zero-variance window makes the
    * heuristic score NaN (0/0), which must render as null, not break
    * every consumer's parser. */
  private def num(d: Double): String =
    if (java.lang.Double.isFinite(d)) d.toString else "null"

  private def one(m: SensorMeta): String = {
    val iso = m.ts.toInstant.toString
    s"""{"name":"${esc(m.name)}","ts":"$iso","fastAnomaly":${num(m.fastAnomaly)},""" +
      s""""fullAnomaly":${num(m.fullAnomaly)},"avgAnomaly":${num(m.avgAnomaly)}}"""
  }

  /** The `GET /` response body: every sensor's latest analysis. */
  def allMetaJson(metas: Seq[SensorMeta]): String =
    metas.sortBy(_.name).map(one).mkString("""{"entries":[""", ",", "]}")

  /** Stress-mode serving (Analyzer.scala:117-121): straight from the
    * snapshot store, no storage round-trip. */
  def serveSnapshot(): String = allMetaJson(SnapshotStore.all)
}
