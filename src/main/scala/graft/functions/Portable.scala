package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable primitives shared by the dedup /
  * similarity / text-analysis operators and their DuckDB oracles.
  *
  * The LLM-pipeline operators (MinHash, SimHash, fingerprints) need a
  * hash both engines compute identically. Neither Spark's murmur3
  * `hash()` nor DuckDB's `hash()` is portable, but md5 of UTF-8 bytes
  * is: both emit the same lowercase hex. We take the first 32 bits as an
  * unsigned value in a signed 64-bit integer, leaving headroom for
  * `(a*h + b) % p` permutations without overflow (a < 2^17, h < 2^32 →
  * a*h < 2^49).
  */
object Portable {

  /** First 32 bits of md5 as an unsigned value in a Long.
    * Spark: `conv(substr(md5(c),1,8),16,10)` cast long;
    * DuckDB: `CAST(concat('0x', substr(md5(e),1,8)) AS BIGINT)`. */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** DuckDB rendering of [[hash32]] over SQL expression `e`. */
  def hash32Sql(e: String): String =
    s"CAST(concat('0x', substr(md5($e), 1, 8)) AS BIGINT)"

  /** Whitespace tokenization — Spark `split(c, "\s+")`, DuckDB
    * `string_split_regex(e, '\s+')`: same token sequences. */
  def tokens(c: Column): Column = split(c, "\\s+")

  /** Deterministic cross-engine decimal rounding:
    * `floor(x·10ᵖ + 0.5) / 10ᵖ` — pure IEEE-754 ops (multiply, add,
    * floor, divide are all correctly-rounded and exactly specified), so
    * both engines produce the SAME double bit-for-bit given the same
    * input. Spark's `functions.round` is NOT portable for per-row
    * doubles: it rounds the value's shortest decimal representation
    * (`BigDecimal.valueOf`, HALF_UP) while DuckDB rounds the binary
    * value — any result whose shortest repr terminates in `…5` at digit
    * p+1 flips between the engines (round-3 q55 hit one such cosine in
    * 8 773 rows). The floor form also never yields `-0.0` (Spark floor
    * → LONG; `-0.5 + 0.5 = +0.0` by IEEE sign rules), so the signed-zero
    * normalization `+ 0.0` is unnecessary. Convention: half-way values
    * round toward +∞ — conventions don't matter for parity, only that
    * both engines share one formula. Use [[detRoundSql]] on the oracle
    * twin. Exact for |x·10ᵖ| < 2⁵³. */
  def detRound(c: Column, scale: Int): Column = {
    require(scale >= 0 && scale <= 9, s"scale $scale out of [0,9]")
    val p = math.pow(10, scale) // exact: 10^p representable through 1e9
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** Rewrite every 2-arg `round(expr, scale)` in a DuckDB oracle SQL
    * string into the [[detRound]] floor form (paren-balanced scan, so
    * nested calls / list comprehensions survive; recursion rewrites
    * rounds inside rounds). 1-arg `round(x)` and non-literal scales are
    * left untouched. Single-quoted string literals are OPAQUE to the
    * scan (honoring the SQL `''` escape): a literal containing
    * `round(` or unbalanced parens is copied through verbatim, never
    * rewritten or counted — safe by construction, not by audit.
    * Applied centrally at catalog exposure so the SQL bodies stay
    * readable in the mathematical `round(…, n)` form. */
  def detRoundSql(sql: String): String = {
    // end index (exclusive) of the single-quoted literal opening at k
    def literalEnd(s: String, k: Int): Int = {
      var j = k + 1
      while (j < s.length) {
        if (s.charAt(j) == '\'') {
          if (j + 1 < s.length && s.charAt(j + 1) == '\'') j += 2 // '' escape
          else return j + 1
        } else j += 1
      }
      j // unterminated literal: treat the rest as opaque
    }
    val out = new StringBuilder(sql.length + 64)
    var i = 0
    while (i < sql.length) {
      if (sql.charAt(i) == '\'') {
        val e = literalEnd(sql, i)
        // NB substring, not append(s, i, e): scala.StringBuilder lacks
        // the 3-arg CharSequence overload and auto-tuples into
        // append(Any) — which stringifies the whole tuple
        out.append(sql.substring(i, e)); i = e
      } else {
      val atBoundary = i == 0 || { val c = sql.charAt(i - 1); !c.isLetterOrDigit && c != '_' }
      if (atBoundary && sql.regionMatches(true, i, "round(", 0, 6)) {
        var depth = 1; var j = i + 6; var comma = -1
        while (depth > 0 && j < sql.length) {
          val c = sql.charAt(j)
          if (c == '\'') j = literalEnd(sql, j) // opaque to depth/comma
          else {
          if (c == '(') depth += 1
          else if (c == ')') depth -= 1
          else if (c == ',' && depth == 1) comma = j
          j += 1
          }
        }
        val scaleStr = if (comma < 0) "" else sql.substring(comma + 1, j - 1).trim
        if (depth == 0 && comma >= 0 && scaleStr.nonEmpty && scaleStr.forall(_.isDigit)) {
          val inner = detRoundSql(sql.substring(i + 6, comma))
          val pw = "1" + "0" * scaleStr.toInt
          out.append(s"floor(($inner) * $pw.0 + 0.5) / $pw.0")
          i = j
        } else { out.append(sql.charAt(i)); i += 1 }
      } else { out.append(sql.charAt(i)); i += 1 }
      }
    }
    out.toString
  }
}
