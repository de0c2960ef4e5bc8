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
}
