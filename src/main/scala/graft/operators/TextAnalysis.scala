package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.Portable
import graft.sources.Tables

/** Text-analysis operators over `documents`: language identification,
  * quality scoring, token statistics, and document fingerprinting — the
  * per-document featurization pass of a training-data pipeline.
  *
  * All four are embarrassingly parallel per-row column algebra (single
  * scan, no shuffle except the final presentation sort) — at 100 TB they
  * run map-side at scan throughput. No UDFs: everything is built-in
  * expressions, so the whole stage codegens.
  */
object TextAnalysis extends DetRounding {

  /** Tiny per-language stopword profiles for the n-gram/stopword
    * language-ID heuristic. Order of `langs` (alphabetical) is the
    * deterministic tiebreak. */
  private val langs = Seq("de", "en", "es", "fr", "zh")
  private val stop: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist", "ich", "mit", "ein", "zu"),
    "en" -> Seq("the", "of", "and", "to", "in", "is", "you", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "se", "no", "por"),
    "fr" -> Seq("le", "la", "de", "et", "un", "que", "pour", "dans", "ce", "il"),
    "zh" -> Seq("的", "一", "是", "不", "了", "人", "我", "在", "有", "他"),
  )
  private def inList(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString(", ")

  private val enList = inList(stop("en"))

  // --------------------------------------------------------------- q31
  /** Stopword-profile language ID: score = #tokens in each language's
    * profile; prediction = argmax with alphabetical tiebreak (expressed
    * as a first-match CASE chain — identical semantics both engines). */
  private def q31(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scored = Tables.documents(spark, dir)
      .withColumn("t", Portable.tokens($"text"))
      .select(
        Seq($"doc_id", $"lang") ++
          langs.map(l => expr(s"size(filter(t, x -> x IN (${inList(stop(l))})))").as(s"s_$l")): _*)
    val predicted = langs.foldRight(lit(langs.last): org.apache.spark.sql.Column) {
      case (l, rest) =>
        val geAll = langs.filter(_ != l)
          .map(o => col(s"s_$l") >= col(s"s_$o"))
          .reduce(_ && _)
        when(geAll, lit(l)).otherwise(rest)
    }
    scored
      .withColumn("predicted_lang", predicted)
      .withColumn("is_correct", ($"predicted_lang" === $"lang").cast("int"))
      .orderBy($"doc_id")
  }

  private val q31Sql: String = {
    val scores = langs
      .map(l => s"         CAST(len(list_filter(t, x -> x IN (${inList(stop(l))}))) AS INTEGER) AS s_$l")
      .mkString(",\n")
    val chain = langs.init.map { l =>
      val cond = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $cond THEN '$l'"
    }.mkString("CASE ", " ", s" ELSE '${langs.last}' END")
    s"""WITH toks AS (
       |  SELECT doc_id, lang, string_split_regex(text, '\\s+') AS t FROM documents
       |), scored AS (
       |  SELECT doc_id, lang,
       |$scores
       |  FROM toks
       |)
       |SELECT doc_id, lang, s_de, s_en, s_es, s_fr, s_zh,
       |       predicted_lang,
       |       CAST(predicted_lang = lang AS INTEGER) AS is_correct
       |FROM (SELECT *, $chain AS predicted_lang FROM scored) p
       |ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------- q32
  /** q32's quality formula over (text, tokens) as ONE shared column
    * expression — consumed by q32 and by the funnel (q66), which
    * computes all its per-row stage flags in a single corpus scan
    * instead of joining the stage frames on doc_id. Sharing the
    * expression (not the frame) is what makes that single-scan shape
    * possible without letting the two definitions drift. */
  private[graft] def qualityExpr(text: org.apache.spark.sql.Column,
      t: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val nTokens = size(t)
    val nPunct = length(text) - length(regexp_replace(text, "[.,!?;:]", ""))
    val nStop = size(filter(t, x => x.isin(stop("en"): _*)))
    lit(0.4) * (nStop.cast("double") / nTokens) +
      lit(0.3) * least(nTokens.cast("double") / 100.0, lit(1.0)) +
      lit(0.3) * (lit(1.0) - nPunct.cast("double") / length(text))
  }

  /** Quality scoring: length/punctuation/stopword ratios blended into a
    * [0,1] score. Pure per-row scalar math on identical inputs → bit-
    * identical doubles in both engines, so nothing is rounded. */
  private def q32(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("t", Portable.tokens($"text"))
      .withColumn("len_chars", length($"text"))
      .withColumn("n_tokens", size($"t"))
      .withColumn("n_punct", length($"text") - length(regexp_replace($"text", "[.,!?;:]", "")))
      .withColumn("n_stop", expr(s"size(filter(t, x -> x IN ($enList)))"))
      .select(
        $"doc_id",
        $"len_chars",
        $"n_tokens",
        ((length(regexp_replace($"text", " ", "")).cast("double")) / $"n_tokens").as("avg_token_len"),
        ($"n_punct".cast("double") / $"len_chars").as("punct_ratio"),
        ($"n_stop".cast("double") / $"n_tokens").as("stopword_ratio"),
        qualityExpr($"text", $"t").as("quality"))
      .orderBy($"doc_id")
  }

  private val q32Sql =
    s"""WITH f AS (
       |  SELECT doc_id,
       |         CAST(length(text) AS INTEGER) AS len_chars,
       |         CAST(len(string_split_regex(text, '\\s+')) AS INTEGER) AS n_tokens,
       |         CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS INTEGER) AS n_punct,
       |         CAST(len(list_filter(string_split_regex(text, '\\s+'),
       |                              x -> x IN ($enList))) AS INTEGER) AS n_stop,
       |         CAST(length(replace(text, ' ', '')) AS INTEGER) AS n_nonspace
       |  FROM documents
       |)
       |SELECT doc_id, len_chars, n_tokens,
       |       CAST(n_nonspace AS DOUBLE) / n_tokens AS avg_token_len,
       |       CAST(n_punct AS DOUBLE) / len_chars AS punct_ratio,
       |       CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
       |       0.4 * (CAST(n_stop AS DOUBLE) / n_tokens)
       |         + 0.3 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
       |         + 0.3 * (1.0 - CAST(n_punct AS DOUBLE) / len_chars) AS quality
       |FROM f
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q33
  /** Token statistics: whitespace tokens, BPE-ish regex pieces
    * (letter runs / digit runs / single symbols), distinct token count. */
  private def q33(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("t", Portable.tokens($"text"))
      .select(
        $"doc_id",
        size($"t").as("n_ws_tokens"),
        expr("size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0))").as("n_bpe_pieces"),
        size(array_distinct($"t")).as("n_distinct_tokens"))
      .orderBy($"doc_id")
  }

  private val q33Sql =
    s"""SELECT doc_id,
       |       CAST(len(string_split_regex(text, '\\s+')) AS INTEGER) AS n_ws_tokens,
       |       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS INTEGER) AS n_bpe_pieces,
       |       CAST(len(list_distinct(string_split_regex(text, '\\s+'))) AS INTEGER) AS n_distinct_tokens
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q34
  /** Position-weighted rolling-hash fingerprint over the first 64
    * tokens: fp = Σ_{i<64} (hash32(tᵢ) mod 1000003)·(i+1) mod 2^31-1.
    * Bounded terms keep the sum well inside int64 on the Spark side
    * (DuckDB promotes to HUGEINT; the final CAST re-aligns types). */
  private def q34(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", posexplode(Portable.tokens($"text")).as(Seq("pos", "w")))
      .filter($"pos" < 64)
      .withColumn("h", Portable.hash32($"w"))
      .groupBy($"doc_id")
      .agg((sum(($"h" % 1000003L) * ($"pos" + 1)) % 2147483647L).as("fp"))
      .orderBy($"doc_id")
  }

  private val q34Sql =
    s"""WITH tok AS (
       |  SELECT doc_id, t[i] AS w, i
       |  FROM (SELECT doc_id, t, unnest(generate_series(1, least(len(t), 64))) AS i
       |        FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents))
       |)
       |SELECT doc_id,
       |       CAST(sum((${Portable.hash32Sql("w")} % 1000003) * i) % 2147483647 AS BIGINT) AS fp
       |FROM tok
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q38
  /** Array-function family (F10): slice/sort/join/contains over the
    * token array — per-row, map-side, codegen'd. */
  private def q38(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("t", Portable.tokens($"text"))
      .select(
        $"doc_id",
        array_join(slice($"t", 1, 3), " ").as("first3"),
        array_join(slice(sort_array($"t"), 1, 3), " ").as("sorted3"),
        array_contains($"t", "spark").cast("int").as("has_spark"),
        element_at($"t", -1).as("last_token"))
      .orderBy($"doc_id")
  }

  private val q38Sql =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
       |)
       |SELECT doc_id,
       |       array_to_string(list_slice(t, 1, 3), ' ') AS first3,
       |       array_to_string(list_slice(list_sort(t), 1, 3), ' ') AS sorted3,
       |       CAST(list_contains(t, 'spark') AS INTEGER) AS has_spark,
       |       t[-1] AS last_token
       |FROM toks
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q59
  /** Repetition quality filters (Gopher/C4-style): fraction of 2-grams
    * taken by the most frequent 2-gram, same for 3-grams, and duplicate-
    * token fraction — the "this document is a degenerate repetition
    * loop" signals a training-data pipeline gates on before tokenizing.
    *
    * Entirely per-row higher-order-function algebra (transform/filter/
    * array_distinct/array_max) — no explode, no shuffle, codegen'd; at
    * 100 TB this runs map-side at scan throughput like q31-q34. Per-row
    * cost is O(n·d) on n-grams × distinct n-grams, bounded by document
    * length. All ratios are integer-over-integer divides of identical
    * operands → bit-identical doubles in both engines (no rounding).
    * Thresholds follow the published Gopher ranges (top-2-gram ≤ 0.20,
    * top-3-gram ≤ 0.18, duplicate-token fraction ≤ 0.30). */
  /** n-gram array over tokens `t` (empty when the doc is too short) —
    * q59's g2/g3 as a composable expression. */
  private def gramsExpr(t: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
    when(size(t) >= n,
      transform(sequence(lit(0), size(t) - n), i =>
        concat_ws(" ", (0 until n).map(k => element_at(t, i + k + 1)): _*)))
      .otherwise(array())

  /** Fraction of gram occurrences held by the most frequent gram. */
  private def topFracExpr(g: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(size(g) === 0, lit(0.0)).otherwise(
      array_max(transform(array_distinct(g), x => size(filter(g, y => y === x))))
        .cast("double") / size(g))

  private def dupFracExpr(t: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (size(t) - size(array_distinct(t))).cast("double") / size(t)

  /** q59's is_repetitive flag as ONE shared column expression — the
    * funnel (q66) evaluates it in its single-scan flag projection. */
  private[graft] def repetitionFlagExpr(t: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    (topFracExpr(gramsExpr(t, 2)) > 0.20 ||
      topFracExpr(gramsExpr(t, 3)) > 0.18 ||
      dupFracExpr(t) > 0.30).cast("int")

  private def q59(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("t", Portable.tokens($"text"))
      .withColumn("top2_frac", topFracExpr(gramsExpr($"t", 2)))
      .withColumn("top3_frac", topFracExpr(gramsExpr($"t", 3)))
      .withColumn("dup_token_frac", dupFracExpr($"t"))
      .select(
        $"doc_id",
        size($"t").as("n_tokens"),
        $"top2_frac", $"top3_frac", $"dup_token_frac",
        ($"top2_frac" > 0.20 || $"top3_frac" > 0.18 || $"dup_token_frac" > 0.30)
          .cast("int").as("is_repetitive"))
      .orderBy($"doc_id")
  }

  private val q59Sql: String = {
    def topFrac(g: String): String =
      s"""CASE WHEN len($g) = 0 THEN 0.0
         |            ELSE CAST(list_max([len(list_filter($g, y -> y = x)) for x in list_distinct($g)]) AS DOUBLE) / len($g)
         |       END""".stripMargin
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
       |), grams AS (
       |  SELECT doc_id, t,
       |         CASE WHEN len(t) >= 2
       |              THEN [t[i] || ' ' || t[i+1] for i in generate_series(1, len(t)-1)]
       |              ELSE [] END AS g2,
       |         CASE WHEN len(t) >= 3
       |              THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in generate_series(1, len(t)-2)]
       |              ELSE [] END AS g3
       |  FROM toks
       |), m AS (
       |  SELECT doc_id,
       |         CAST(len(t) AS INTEGER) AS n_tokens,
       |         ${topFrac("g2")} AS top2_frac,
       |         ${topFrac("g3")} AS top3_frac,
       |         CAST(len(t) - len(list_distinct(t)) AS DOUBLE) / len(t) AS dup_token_frac
       |  FROM grams
       |)
       |SELECT doc_id, n_tokens, top2_frac, top3_frac, dup_token_frac,
       |       CAST(top2_frac > 0.20 OR top3_frac > 0.18 OR dup_token_frac > 0.30 AS INTEGER) AS is_repetitive
       |FROM m
       |ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------- q62
  /** PII detection + redaction: email / US-phone / IPv4 / SSN-style-id
    * patterns counted per document, then masked to typed placeholders —
    * the scrubbing pass a training-data pipeline runs before any text
    * leaves the curation boundary.
    *
    * The synthetic corpus is digit-free, so the query first APPENDS
    * deterministic PII tokens derived from doc_id (email on doc_id%3=0,
    * phone on %4, IP on %5, id on %7 — identical expressions on both
    * engines). That keeps the oracle hash check a REAL exercise of the
    * detect+redact path (non-zero counts, text actually rewritten)
    * instead of an identity pass over clean text; ScrubSpec additionally
    * proves detection on hand-written PII fixtures.
    *
    * Per-row regex algebra (regexp_count + chained regexp_replace), no
    * shuffle except the presentation sort — map-side at scan throughput
    * at 100 TB, like q31-q34. The four patterns use only \b \d {m,n}
    * and literal classes, which Java regex (Spark) and RE2 (DuckDB)
    * interpret identically. Redaction order (email→ip→id→phone) is
    * fixed and collision-free: no pattern matches inside another's
    * replacement or residue. */
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  private val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val IdRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** Detection + redaction columns over a text column — shared by the
    * catalog query (seeded corpus) and ScrubSpec (raw fixtures). Each
    * class is counted on the text as already redacted by the EARLIER
    * classes, so every counted span corresponds to exactly one emitted
    * placeholder (an IP inside an email's domain is part of the
    * `<EMAIL>` redaction, not a separate `n_ips` hit). Placeholders
    * contain no digits or '@', so later patterns can never match inside
    * an earlier replacement. `IdRe` (xxx-xx-xxxx) runs before `PhoneRe`
    * (xxx-xxx-xxxx); the two cannot match the same span. */
  private[graft] def piiColumns(text: org.apache.spark.sql.Column)
      : Seq[org.apache.spark.sql.Column] = {
    val nEmails = regexp_count(text, lit(EmailRe))
    val t1 = regexp_replace(text, EmailRe, "<EMAIL>")
    val nIps = regexp_count(t1, lit(IpRe))
    val t2 = regexp_replace(t1, IpRe, "<IP>")
    val nIds = regexp_count(t2, lit(IdRe))
    val t3 = regexp_replace(t2, IdRe, "<ID>")
    val nPhones = regexp_count(t3, lit(PhoneRe))
    val redacted = regexp_replace(t3, PhoneRe, "<PHONE>")
    Seq(
      nEmails.cast("int").as("n_emails"),
      nPhones.cast("int").as("n_phones"),
      nIps.cast("int").as("n_ips"),
      nIds.cast("int").as("n_ids"),
      (nEmails + nPhones + nIps + nIds > 0).cast("int").as("has_pii"),
      redacted.as("redacted"))
  }

  private def q62(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val seeded = concat(
      $"text",
      when($"doc_id" % 3 === 0,
        concat(lit(" contact user"), $"doc_id".cast("string"), lit("@example.com")))
        .otherwise(lit("")),
      when($"doc_id" % 4 === 0,
        concat(lit(" call 415-555-"), lpad(($"doc_id" % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when($"doc_id" % 5 === 0,
        concat(lit(" host 10."), ($"doc_id" % 256).cast("string"),
          lit(".0."), ($"doc_id" % 100).cast("string")))
        .otherwise(lit("")),
      when($"doc_id" % 7 === 0,
        concat(lit(" id 123-45-"), lpad(($"doc_id" % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")))
    Tables.documents(spark, dir)
      .withColumn("seeded", seeded)
      .select(Seq($"doc_id") ++ piiColumns($"seeded"): _*)
      .orderBy($"doc_id")
  }

  private val q62Sql: String =
    s"""WITH seeded AS (
       |  SELECT doc_id,
       |         text
       |           || CASE WHEN doc_id % 3 = 0
       |                   THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
       |                   ELSE '' END
       |           || CASE WHEN doc_id % 4 = 0
       |                   THEN ' call 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |                   ELSE '' END
       |           || CASE WHEN doc_id % 5 = 0
       |                   THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR)
       |                        || '.0.' || CAST(doc_id % 100 AS VARCHAR)
       |                   ELSE '' END
       |           || CASE WHEN doc_id % 7 = 0
       |                   THEN ' id 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |                   ELSE '' END AS s
       |  FROM documents
       |), r1 AS (
       |  SELECT doc_id,
       |         CAST(len(regexp_extract_all(s, '$EmailRe')) AS INTEGER) AS n_emails,
       |         regexp_replace(s, '$EmailRe', '<EMAIL>', 'g') AS t1
       |  FROM seeded
       |), r2 AS (
       |  SELECT *, CAST(len(regexp_extract_all(t1, '$IpRe')) AS INTEGER) AS n_ips,
       |         regexp_replace(t1, '$IpRe', '<IP>', 'g') AS t2
       |  FROM r1
       |), r3 AS (
       |  SELECT *, CAST(len(regexp_extract_all(t2, '$IdRe')) AS INTEGER) AS n_ids,
       |         regexp_replace(t2, '$IdRe', '<ID>', 'g') AS t3
       |  FROM r2
       |), r4 AS (
       |  SELECT *, CAST(len(regexp_extract_all(t3, '$PhoneRe')) AS INTEGER) AS n_phones,
       |         regexp_replace(t3, '$PhoneRe', '<PHONE>', 'g') AS redacted
       |  FROM r3
       |)
       |SELECT doc_id, n_emails, n_phones, n_ips, n_ids,
       |       CAST(n_emails + n_phones + n_ips + n_ids > 0 AS INTEGER) AS has_pii,
       |       redacted
       |FROM r4
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q69
  /** Vocabulary coverage: the top-[[VocabK]] corpus tokens with per-token
    * and cumulative token-mass share — the report behind every "what
    * vocab size covers X% of my corpus" tokenizer decision (and the
    * OOV-rate estimate for a candidate vocab).
    *
    * Scale shape: the explode is map-side and feeds a partial+final
    * count keyed by token (shuffle width = vocabulary size, not corpus
    * size); the global top-K is TakeOrdered (no full sort of the
    * vocabulary), and the cumulative window runs over the K retained
    * rows only, with the 1-row total broadcast. Ties break (count DESC,
    * token ASC) so the cut at K is deterministic on both engines. */
  private val VocabK = 200

  private def q69(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = Tables.documents(spark, dir)
      .select(explode(Portable.tokens($"text")).as("token"))
      .groupBy($"token").agg(count(lit(1)).as("cnt"))
    // total token mass from a separate NO-EXPLODE pass (per-row size +
    // 1-row sum, no by-token shuffle) — re-deriving it from `counts`
    // would run the widest stage of the query twice
    val total = Tables.documents(spark, dir)
      .agg(sum(size(Portable.tokens($"text"))).as("total"))
    val order = Seq($"cnt".desc, $"token".asc)
    val w = Window.orderBy(order: _*).rowsBetween(Window.unboundedPreceding, 0)
    counts
      .orderBy(order: _*).limit(VocabK)
      .withColumn("rank", row_number().over(Window.orderBy(order: _*)))
      .withColumn("cum_cnt", sum($"cnt").over(w))
      .crossJoin(broadcast(total))
      .select(
        $"rank",
        $"token",
        $"cnt",
        ($"cnt".cast("double") / $"total").as("share"),
        ($"cum_cnt".cast("double") / $"total").as("cum_share"))
      .orderBy($"rank")
  }

  private val q69Sql: String =
    s"""WITH counts AS (
       |  SELECT unnest(string_split_regex(text, '\\s+')) AS token FROM documents
       |), c AS (
       |  SELECT token, count(*) AS cnt FROM counts GROUP BY token
       |), top AS (
       |  SELECT token, cnt FROM c ORDER BY cnt DESC, token ASC LIMIT $VocabK
       |), ranked AS (
       |  SELECT token, CAST(cnt AS BIGINT) AS cnt,
       |         CAST(row_number() OVER (ORDER BY cnt DESC, token ASC) AS INTEGER) AS rank,
       |         CAST(sum(cnt) OVER (ORDER BY cnt DESC, token ASC
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cnt
       |  FROM top
       |), t AS (SELECT sum(len(string_split_regex(text, '\\s+'))) AS total FROM documents)
       |SELECT rank, token, cnt,
       |       CAST(cnt AS DOUBLE) / total AS share,
       |       CAST(cum_cnt AS DOUBLE) / total AS cum_share
       |FROM ranked, t
       |ORDER BY rank""".stripMargin

  /** Shared with [[Curation]]'s funnel oracle (q66Sql): the q32/q59
    * oracle forms, embedded so the funnel counts EXACTLY what the stage
    * queries emit — one formula, two consumers. */
  private[operators] def qualitySql: String = q32Sql
  private[operators] def repetitionSql: String = q59Sql

  // --------------------------------------------------------------- q74
  /** Top-K drift contributors to report. */
  private val DriftK = 100

  /** Token-distribution drift between the train and test splits (q51's
    * buckets, the q58/q65 convention): per-token Laplace-smoothed
    * probabilities on each side and the token's contribution
    * p·ln(p/q) to KL(train‖test), ranked by |contribution| — the
    * corpus-drift report a pipeline runs between snapshots, epochs, or
    * an old index and a new shard before trusting that eval still
    * measures what training saw.
    *
    * Determinism: counts are exact integers; each probability is a
    * single IEEE division (bit-identical cross-engine); the only
    * transcendental is ln, so the q52 pattern applies — output rounded
    * to 4 dp, ranking guarded at 6 dp with token tiebreak, which
    * absorbs ln's last-ulp latitude. The top-K SET is deterministic
    * because the rank order is.
    *
    * Scale shape: ONE corpus scan feeds a conditional partial+final
    * aggregate keyed by token (shuffle width = vocabulary, not corpus
    * — both sides counted in the same pass, no per-side scans, no
    * join); the totals branch re-reads that aggregate's exchange, not
    * the corpus (AQE ReusedExchange, asserted on the executed plan in
    * PlanSpec); totals collapse to 1 broadcast row; the top-K is
    * TakeOrdered, never a full vocabulary sort. */
  /** Per-token conditional split counts — ONE corpus scan feeding one
    * partial+final aggregate keyed by token (both sides counted in the
    * same pass). Shared by q74 (drift) and q78 (surprisal) so the two
    * reports measure the same vocabulary and the same train mass. */
  private def splitTokenCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(Curation.splitBucket($"doc_id").as("bucket"),
        explode(Portable.tokens($"text")).as("token"))
      .groupBy($"token")
      .agg(
        sum(($"bucket" < 80).cast("long")).as("c_train"),
        sum(($"bucket" >= 90).cast("long")).as("c_test"))
  }

  /** DuckDB twin of [[splitTokenCounts]] (`toks` + `counts` CTE bodies). */
  private val splitCountsCtes: String =
    s"""toks AS (
       |  SELECT ${Curation.splitBucketSql("doc_id")} AS bucket,
       |         unnest(string_split_regex(text, '\\s+')) AS token
       |  FROM documents
       |), counts AS (
       |  SELECT token,
       |         CAST(sum(CASE WHEN bucket < 80 THEN 1 ELSE 0 END) AS BIGINT) AS c_train,
       |         CAST(sum(CASE WHEN bucket >= 90 THEN 1 ELSE 0 END) AS BIGINT) AS c_test
       |  FROM toks GROUP BY token
       |)""".stripMargin

  private def q74(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = splitTokenCounts(spark, dir)
    val totals = counts.agg(
      sum($"c_train").as("n_train"), sum($"c_test").as("n_test"),
      count(lit(1)).as("v"))
    counts.crossJoin(broadcast(totals))
      .withColumn("p_train",
        ($"c_train" + 1L).cast("double") / ($"n_train" + $"v").cast("double"))
      .withColumn("p_test",
        ($"c_test" + 1L).cast("double") / ($"n_test" + $"v").cast("double"))
      .withColumn("term", $"p_train" * log($"p_train" / $"p_test"))
      .orderBy(round(abs($"term"), 6).desc, $"token".asc)
      .limit(DriftK)
      .select($"token", $"c_train", $"c_test", $"p_train", $"p_test",
        round($"term", 4).as("kl_term"))
  }

  private val q74Sql: String =
    s"""WITH $splitCountsCtes, tot AS (
       |  SELECT CAST(sum(c_train) AS BIGINT) AS n_train,
       |         CAST(sum(c_test) AS BIGINT) AS n_test,
       |         CAST(count(*) AS BIGINT) AS v
       |  FROM counts
       |), terms AS (
       |  SELECT token, c_train, c_test,
       |         CAST(c_train + 1 AS DOUBLE) / CAST(n_train + v AS DOUBLE) AS p_train,
       |         CAST(c_test + 1 AS DOUBLE) / CAST(n_test + v AS DOUBLE) AS p_test
       |  FROM counts, tot
       |), t2 AS (
       |  SELECT *, p_train * ln(p_train / p_test) AS term FROM terms
       |)
       |SELECT token, c_train, c_test, p_train, p_test, round(term, 4) AS kl_term
       |FROM t2
       |ORDER BY round(abs(term), 6) DESC, token ASC
       |LIMIT $DriftK""".stripMargin

  // --------------------------------------------------------------- q75
  /** A 5-gram counts as boilerplate when it appears in at least this
    * many distinct documents. 2 = "any shared span" on the synthetic
    * corpus (dup clusters are shallow); production raises it so only
    * template/navigation text qualifies — the C4/CCNet line-dedup rule
    * re-expressed for unstructured text. */
  private val BoilerDf = 2

  /** Corpus-level boilerplate detection: distinct 5-grams per document,
    * document frequency over the corpus, and per-document coverage by
    * grams shared with ≥ [[BoilerDf]] documents — the signal behind
    * C4's "discard any three-sentence span seen before" and
    * RefinedWeb's line-dedup, as a measurable per-doc fraction.
    *
    * Scale shape: gram construction is per-row array algebra
    * (`array_distinct` BEFORE exploding, so per-doc dedup never
    * shuffles); document frequency is one partial+final aggregate
    * keyed by gram (shuffle width = distinct grams — the same width
    * the MinHash signature pass already carries); membership flows
    * back through a gram-keyed join of the per-doc gram table against
    * the (much smaller) boilerplate set, which AQE broadcasts when it
    * fits; the final per-doc counts join on doc_id. At 100 TB the
    * gram key would be hash32(gram) with the gram as residual —
    * exactly q65's (hash, gram) convention. */
  private def q75(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docsG = Tables.documents(spark, dir)
      .withColumn("t", Portable.tokens($"text"))
      .select($"doc_id",
        when(size($"t") >= 5, array_distinct(expr(
          "transform(sequence(0, size(t)-5), i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4]))")))
          .otherwise(array().cast("array<string>")).as("g"))
    val edges = docsG.select($"doc_id", explode($"g").as("gram"))
    val boiler = edges.groupBy($"gram").agg(count(lit(1)).as("df"))
      .where($"df" >= BoilerDf).select($"gram")
    val perDoc = edges.join(boiler, "gram")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_boiler"))
    docsG.select($"doc_id", size($"g").as("n_grams"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("n_boiler", coalesce($"n_boiler", lit(0L)))
      .withColumn("boiler_frac",
        when($"n_grams" > 0,
          round($"n_boiler".cast("double") / $"n_grams", 4)).otherwise(lit(0.0)))
      .orderBy($"doc_id")
  }

  private val q75Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
       |), d AS (
       |  SELECT doc_id,
       |         CASE WHEN len(t) >= 5
       |              THEN list_distinct(list_transform(range(len(t)-4),
       |                     i -> array_to_string(t[i+1:i+5], ' ')))
       |              ELSE [] END AS g
       |  FROM t
       |), e AS (
       |  SELECT doc_id, unnest(g) AS gram FROM d
       |), b AS (
       |  SELECT gram FROM (SELECT gram, count(*) AS df FROM e GROUP BY gram)
       |  WHERE df >= $BoilerDf
       |), per AS (
       |  SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_boiler
       |  FROM e JOIN b USING(gram) GROUP BY e.doc_id
       |)
       |SELECT d.doc_id, CAST(len(g) AS INTEGER) AS n_grams,
       |       COALESCE(per.n_boiler, 0) AS n_boiler,
       |       CASE WHEN len(g) > 0
       |            THEN round(CAST(COALESCE(per.n_boiler, 0) AS DOUBLE) / len(g), 4)
       |            ELSE 0.0 END AS boiler_frac
       |FROM d LEFT JOIN per USING(doc_id)
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q78
  /** Unigram-LM surprisal scoring of the held-out split: a Laplace-
    * smoothed unigram model fit on the TRAIN split (q74's exact
    * probabilities — same vocabulary, same train mass) scores every
    * TEST document by mean negative log-likelihood per token — the
    * CCNet/KenLM-style "how unlike the reference corpus is this
    * document" quality signal, with the LM reduced to its public
    * unigram core. Low = in-distribution, high = outlier/noise.
    *
    * Determinism: counts and the smoothed division are exact/bit-
    * identical; ln is the one transcendental, and the per-doc mean
    * averages ≤ a few hundred of them, so the 4-dp output rounding
    * absorbs last-ulp latitude (q52/q74's pattern).
    *
    * Scale shape: the model is the SAME aggregate q74 builds (one
    * corpus scan, shuffle width = vocabulary) plus a broadcast 1-row
    * totals frame; scoring explodes only the test split (tiny by
    * construction — q51 holds out 10%) and joins it to the model on
    * token, which AQE broadcasts when the vocabulary fits and
    * otherwise shuffles by token, never by document. Every test token
    * is in the vocabulary by construction (the vocab spans the whole
    * corpus), so the join is inner with no OOV branch. */
  private def q78(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = splitTokenCounts(spark, dir)
    val totals = counts.agg(sum($"c_train").as("n_train"), count(lit(1)).as("v"))
    val model = counts.crossJoin(broadcast(totals))
      .select($"token",
        (($"c_train" + 1L).cast("double") / ($"n_train" + $"v").cast("double"))
          .as("p_train"))
    Tables.documents(spark, dir)
      .where(Curation.splitBucket($"doc_id") >= 90)
      .select($"doc_id", explode(Portable.tokens($"text")).as("token"))
      .join(model, "token")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(-log($"p_train")), 4).as("avg_nll"))
      .orderBy($"doc_id")
  }

  private val q78Sql: String =
    s"""WITH $splitCountsCtes, tot AS (
       |  SELECT CAST(sum(c_train) AS BIGINT) AS n_train,
       |         CAST(count(*) AS BIGINT) AS v
       |  FROM counts
       |), model AS (
       |  SELECT token,
       |         CAST(c_train + 1 AS DOUBLE) / CAST(n_train + v AS DOUBLE) AS p_train
       |  FROM counts, tot
       |), test AS (
       |  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS token
       |  FROM documents
       |  WHERE ${Curation.splitBucketSql("doc_id")} >= 90
       |)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |       round(avg(-ln(p_train)), 4) AS avg_nll
       |FROM test JOIN model USING(token)
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q84
  /** BM25 keyword search: rank documents for a fixed bag of query terms
    * with the classic Okapi BM25 score
    * `Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`,
    * `idf = ln((N−df+0.5)/(df+0.5) + 1)` — the lexical-retrieval
    * baseline every hybrid (BM25 + vector) stack needs next to
    * q29/q83's dense path.
    *
    * Scale shape: per-document term frequencies are per-row HOF algebra
    * on the scan (no explode, no vocabulary shuffle — only the query's
    * own terms are counted); corpus statistics (N, Σdl, per-term df)
    * collapse to ONE row broadcast back; the final top-10 is a
    * TakeOrdered, never a global sort. Statistics use exact integer
    * sums (`sum(dl)`, conditional counts), so `avgdl`/`idf` are
    * bit-identical on both engines — no averaged-double drift. */
  private val BmTerms = Seq("spark", "join", "window")
  private val BmK1 = 1.2
  private val BmB = 0.75

  /** Per-doc BM25 frame (doc_id, dl, tf_<term>, score6) — shared by q84
    * (lexical top-10) and q94 (hybrid RRF fusion); the underlying
    * scored frame is memoized + persisted inside [[bm25ScoredFor]], the
    * rename to term-named columns is a free projection on top. */
  private def bm25Scored(spark: SparkSession, dir: String): DataFrame =
    bm25Build(spark, dir)

  private def bm25Build(spark: SparkSession, dir: String): DataFrame = {
    // catalog columns carry the term names (the oracle's schema); the
    // shared builder uses POSITIONAL names so ad-hoc terms can never
    // collide with column-name syntax
    val renames = BmTerms.zipWithIndex.map { case (t, i) => col(s"tf_$i").as(s"tf_$t") }
    bm25ScoredFor(spark, dir, BmTerms, BmK1, BmB)
      .select(Seq(col("doc_id"), col("dl")) ++ renames :+ col("score6"): _*)
  }

  /** Parameterized BM25 scoring — the library entry point behind both
    * the fixed-term catalog query (q84) and [[Graft.bm25Search]].
    * Term-frequency columns are POSITIONAL (`tf_0..tf_{n-1}`, in
    * `terms.distinct` order) — raw terms never become column names, so
    * duplicates and metacharacter-bearing terms ("node.js") are safe.
    * Memoized per (terms, k1, b): repeated searches in a session reuse
    * one persisted scored frame per parameterization. */
  private[graft] def bm25ScoredFor(spark: SparkSession, dir: String,
      terms: Seq[String], k1: Double, b: Double): DataFrame = {
    val ts = terms.distinct
    graft.core.PersistedMemo.getOrBuild(spark, dir,
      s"text:bm25:${ts.mkString("\u0000")}|$k1|$b") {
      import spark.implicits._
      val per = Tables.documents(spark, dir)
        .withColumn("t", Portable.tokens($"text"))
        .select(
          $"doc_id" +: size($"t").as("dl") +:
            ts.zipWithIndex.map { case (term, i) =>
              size(filter($"t", x => x === lit(term))).as(s"tf_$i")
            }: _*)
      val dfAggs = ts.indices.map(i =>
        sum((col(s"tf_$i") > 0).cast("long")).as(s"df_$i"))
      val st = per.agg(count(lit(1)).as("n_docs"),
        sum($"dl").as("sum_dl") +: dfAggs: _*)
      val avgdl = $"sum_dl".cast("double") / $"n_docs"
      val score = ts.indices.map { i =>
        val tf = col(s"tf_$i").cast("double")
        val df = col(s"df_$i").cast("double")
        val idf = log(($"n_docs" - df + 0.5) / (df + 0.5) + 1.0)
        idf * (tf * (k1 + 1.0)) / (tf + lit(k1) * (lit(1.0 - b) + lit(b) * ($"dl" / avgdl)))
      }.reduce(_ + _)
      per.crossJoin(broadcast(st)).withColumn("score6", round(score, 6))
    }
  }

  private def q84(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val top = bm25Scored(spark, dir)
      .orderBy($"score6".desc, $"doc_id".asc)
      .limit(10)
    // rn is computed AFTER the TakeOrdered top-10, so the window runs
    // over 10 rows, not the corpus
    val w = Window.orderBy($"score6".desc, $"doc_id".asc)
    val outCols = Seq($"doc_id", $"dl") ++ BmTerms.map(t => col(s"tf_$t")) ++
      Seq(round($"score6", 4).as("score"), $"rn")
    top.withColumn("rn", row_number().over(w))
      .select(outCols: _*)
      .orderBy($"rn")
  }

  /** The per/st/scored CTE chain — q84Sql/q94Sql share it. */
  private val bm25Cte: String = {
    val tfCols = BmTerms.map(t =>
      s"CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x = '$t')) AS INTEGER) AS tf_$t")
      .mkString(",\n       |         ")
    val dfCols = BmTerms.map(t =>
      s"CAST(sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$t")
      .mkString(",\n       |         ")
    val scoreTerms = BmTerms.map { t =>
      s"""ln((n_docs - CAST(df_$t AS DOUBLE) + 0.5) / (CAST(df_$t AS DOUBLE) + 0.5) + 1.0)
       |           * (CAST(tf_$t AS DOUBLE) * ${BmK1 + 1.0}) / (CAST(tf_$t AS DOUBLE)
       |              + $BmK1 * (1.0 - $BmB + $BmB * (dl / (CAST(sum_dl AS DOUBLE) / n_docs))))"""
    }.mkString("\n       |         + ")
    s"""per AS (
       |  SELECT doc_id,
       |         CAST(len(string_split_regex(text, '\\s+')) AS INTEGER) AS dl,
       |         $tfCols
       |  FROM documents
       |), st AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(dl) AS BIGINT) AS sum_dl,
       |         $dfCols
       |  FROM per
       |), scored AS (
       |  SELECT p.doc_id, p.dl, ${BmTerms.map(t => s"p.tf_$t").mkString(", ")},
       |         round($scoreTerms, 6) AS score6
       |  FROM per p CROSS JOIN st
       |)""".stripMargin
  }

  private val q84Sql: String =
    s"""WITH $bm25Cte
       |SELECT doc_id, dl, ${BmTerms.map(t => s"tf_$t").mkString(", ")},
       |       round(score6, 4) AS score, CAST(rn AS INTEGER) AS rn
       |FROM (SELECT *, row_number() OVER (ORDER BY score6 DESC, doc_id ASC) AS rn
       |      FROM scored) t
       |WHERE rn <= 10
       |ORDER BY rn""".stripMargin

  // --------------------------------------------------------------- q94
  /** Hybrid retrieval via Reciprocal Rank Fusion: fuse the BM25 ranking
    * (q84's scored frame, lexical) with a dense cosine ranking (query
    * vector 0 against the embeddings table) as
    * `rrf(d) = Σ_lists 1/(k + rank_list(d))`, k = 60 — the fusion rule
    * hybrid search stacks ship because it needs NO score calibration
    * between modalities (ranks only). A doc missing from one list
    * contributes 0 for that list.
    *
    * Scale shape: each branch ends in a TakeOrdered top-50 (never a
    * global sort), the fusion is a full-outer join of two 50-row
    * frames, and the final top-10 windows over ≤100 rows. The dense
    * branch broadcasts the single query vector over the scan (q29's
    * shape); at production scale it swaps for the IVF/SQ8 path (q88/
    * q83) with the fusion unchanged. */
  private val RrfK = 60
  private val RrfQueryVec = 0L

  private def q94(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wb = Window.orderBy($"score6".desc, $"doc_id".asc)
    val bm = bm25Scored(spark, dir)
      .orderBy($"score6".desc, $"doc_id".asc).limit(50)
      .withColumn("rank_bm25", row_number().over(wb))
      .select($"doc_id", $"rank_bm25")
    // the dense branch starts from the session-wide memoized norms
    // table (Similarity.embNorm) — the same persisted intermediate
    // q28/q29/q30/q41/q55/q83 share; it also registers graft_dot
    val emb = Similarity.embNorm(spark, dir)
    val q = emb.filter($"vec_id" === RrfQueryVec)
      .select($"v".as("qv"), $"nrm".as("qnrm"))
    val cos = expr("graft_dot(v, qv)") / ($"nrm" * $"qnrm")
    val wv = Window.orderBy($"cos6".desc, $"doc_id".asc)
    val vec = emb.filter($"vec_id" =!= RrfQueryVec).crossJoin(broadcast(q))
      .withColumn("cos6", round(cos, 6))
      .select($"vec_id".as("doc_id"), $"cos6")
      .orderBy($"cos6".desc, $"doc_id".asc).limit(50)
      .withColumn("rank_vec", row_number().over(wv))
      .select($"doc_id", $"rank_vec")
    val rrf =
      when($"rank_bm25".isNull, 0.0).otherwise(lit(1.0) / (lit(RrfK) + $"rank_bm25")) +
        when($"rank_vec".isNull, 0.0).otherwise(lit(1.0) / (lit(RrfK) + $"rank_vec"))
    val fused = bm.join(vec, Seq("doc_id"), "full_outer")
      .withColumn("rrf6", round(rrf, 6))
    val wf = Window.orderBy($"rrf6".desc, $"doc_id".asc)
    fused
      .orderBy($"rrf6".desc, $"doc_id".asc).limit(10)
      .withColumn("rn", row_number().over(wf))
      .select($"doc_id",
        coalesce($"rank_bm25", lit(0)).as("rank_bm25"),
        coalesce($"rank_vec", lit(0)).as("rank_vec"),
        $"rrf6".as("rrf_score"), $"rn")
      .orderBy($"rn")
  }

  private val q94Sql: String =
    s"""WITH $bm25Cte, bmr AS (
       |  SELECT doc_id, CAST(rn AS INTEGER) AS rank_bm25
       |  FROM (SELECT doc_id, row_number() OVER (ORDER BY score6 DESC, doc_id ASC) AS rn
       |        FROM scored) t
       |  WHERE rn <= 50
       |), nv AS (
       |  SELECT vec_id, embedding,
       |         sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in embedding])) AS nrm
       |  FROM embeddings
       |), cosd AS (
       |  SELECT e.vec_id AS doc_id,
       |         round(list_sum([CAST(e.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)
       |                         for i in generate_series(1, 64)]) / (e.nrm * q.nrm), 6) AS cos6
       |  FROM nv e CROSS JOIN (SELECT * FROM nv WHERE vec_id = $RrfQueryVec) q
       |  WHERE e.vec_id <> $RrfQueryVec
       |), vr AS (
       |  SELECT doc_id, CAST(rn AS INTEGER) AS rank_vec
       |  FROM (SELECT doc_id, row_number() OVER (ORDER BY cos6 DESC, doc_id ASC) AS rn
       |        FROM cosd) t
       |  WHERE rn <= 50
       |), f AS (
       |  SELECT COALESCE(b.doc_id, v.doc_id) AS doc_id, b.rank_bm25, v.rank_vec,
       |         round(COALESCE(1.0 / ($RrfK + b.rank_bm25), 0.0)
       |               + COALESCE(1.0 / ($RrfK + v.rank_vec), 0.0), 6) AS rrf6
       |  FROM bmr b FULL OUTER JOIN vr v ON b.doc_id = v.doc_id
       |)
       |SELECT doc_id, COALESCE(rank_bm25, 0) AS rank_bm25,
       |       COALESCE(rank_vec, 0) AS rank_vec,
       |       rrf6 AS rrf_score, CAST(rn AS INTEGER) AS rn
       |FROM (SELECT *, row_number() OVER (ORDER BY rrf6 DESC, doc_id ASC) AS rn
       |      FROM f) t
       |WHERE rn <= 10
       |ORDER BY rn""".stripMargin

  // --------------------------------------------------------------- q95
  /** Mergeable distinct-token sketches: a DataSketches HLL per source
    * (`hll_sketch_agg`) plus the UNION of all per-source sketches
    * (`hll_union_agg`) as a corpus-level estimate — the incremental
    * statistics pattern at 100 TB: per-shard sketches are maintained as
    * shards land and merged WITHOUT rescanning history (register-max
    * union, order-independent, deterministic). q39's
    * approx_count_distinct answers one query; this materializes the
    * mergeable state a stats catalog keeps.
    *
    * Round-5 oracle upgrade (q39's pattern): sketch internals stay
    * engine-specific, so the raw estimates never hash — instead the
    * query checks each estimate IN-QUERY against the exact distinct
    * count (|est−exact|/exact ≤ 6.5% = 4·rsd at the default lgK=12,
    * rsd = 1.04/√2¹² ≈ 1.63% — the q39/q54/q206 4·rsd convention; a
    * 3·rsd gate flakes ~1% per scope per corpus regeneration) and
    * emits (scope, exact_distinct, in_bound); the oracle recomputes
    * the exacts and asserts the verdicts as literal 1, so an
    * out-of-tolerance sketch or an unfaithful union merge breaks the
    * hash. FiltersSpec still bounds the raw estimates directly. At
    * 100 TB the production form drops the exact companion and keeps
    * only the mergeable sketch state. */
  private def q95(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"source", explode(Portable.tokens($"text")).as("token"))
    val per = toks.groupBy($"source").agg(
      hll_sketch_agg($"token").as("sk"),
      countDistinct($"token").as("exact_distinct"))
    val bySource = per.select($"source".as("scope"), $"exact_distinct",
      hll_sketch_estimate($"sk").as("est"))
    val union = per.agg(hll_union_agg($"sk").as("u"))
      .crossJoin(broadcast(
        toks.agg(countDistinct($"token").as("exact_distinct"))))
      .select(lit("__ALL__").as("scope"), $"exact_distinct",
        hll_sketch_estimate($"u").as("est"))
    bySource.unionByName(union)
      .select($"scope", $"exact_distinct",
        (abs($"est" - $"exact_distinct").cast("double") / $"exact_distinct"
          <= 0.065).cast("int").as("in_bound"))
      .orderBy($"scope")
  }

  private val q95Sql: String =
    """SELECT source AS scope,
      |       CAST(count(DISTINCT token) AS BIGINT) AS exact_distinct,
      |       CAST(1 AS INTEGER) AS in_bound
      |FROM (SELECT source, unnest(string_split_regex(text, '\s+')) AS token
      |      FROM documents)
      |GROUP BY 1
      |UNION ALL
      |SELECT '__ALL__' AS scope,
      |       CAST(count(DISTINCT token) AS BIGINT) AS exact_distinct,
      |       CAST(1 AS INTEGER) AS in_bound
      |FROM (SELECT unnest(string_split_regex(text, '\s+')) AS token
      |      FROM documents)
      |ORDER BY scope""".stripMargin

  // -------------------------------------------------------------- q196
  /** Pairwise source-vocabulary Jaccard by HLL inclusion–exclusion —
    * the SKETCH tier of cross-source overlap (q89 counts LSH near-dup
    * pairs; this measures vocabulary containment): J(A,B) =
    * |A∩B| / |A∪B| with |A∪B| estimated from the REGISTER-MAX union of
    * the per-source sketches q95 already maintains and |A∩B| recovered
    * by inclusion–exclusion. At 100 TB this is the whole point:
    * per-shard sketches merge pairwise on a #sources²-row frame
    * WITHOUT re-tokenizing anything.
    *
    * Oracle discipline (q39/q54/q95's round-5 pattern): the sketch
    * union estimate is engine-local, so the query verifies it IN-QUERY
    * against the exact union (≤6.5% = 4·rsd at lgK=12 — the q39/q54/
    * q206 convention, flake-safe across corpus regenerations) and
    * emits the
    * exact companions + the verdict; the exact Jaccard is a single
    * integer divide rounded at 6 dp. The exact pairwise intersection
    * is a token-keyed equi-join of the DISTINCT (source, token)
    * dictionary — vocabulary-sized, the gate's companion only. */
  private def q196(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"source", explode(Portable.tokens($"text")).as("token"))
    val per = toks.groupBy($"source").agg(
      hll_sketch_agg($"token").as("sk"),
      countDistinct($"token").as("nd"))
    val dict = toks.distinct()
    val inter = dict.as("a").join(dict.as("b"),
        $"a.token" === $"b.token" && $"a.source" < $"b.source")
      .groupBy($"a.source".as("source_a"), $"b.source".as("source_b"))
      .agg(count(lit(1)).as("exact_inter"))
    val est = per.as("a").join(per.as("b"), $"a.source" < $"b.source")
      .select($"a.source".as("source_a"), $"b.source".as("source_b"),
        $"a.nd".as("exact_a"), $"b.nd".as("exact_b"),
        hll_sketch_estimate(hll_union($"a.sk", $"b.sk")).as("est_union"))
    val exUnion = $"exact_a" + $"exact_b" - $"exact_inter"
    est.join(inter, Seq("source_a", "source_b"), "left_outer")
      .withColumn("exact_inter", coalesce($"exact_inter", lit(0L)))
      .select($"source_a", $"source_b", $"exact_a", $"exact_b", $"exact_inter",
        round($"exact_inter".cast("double") / exUnion, 6).as("jaccard"),
        (abs($"est_union" - exUnion).cast("double") / exUnion <= 0.065)
          .cast("int").as("union_in_bound"))
      .orderBy($"source_a", $"source_b")
  }

  private val q196Sql: String =
    """WITH toks AS (
      |  SELECT DISTINCT source, token FROM (
      |    SELECT source, unnest(string_split_regex(text, '\s+')) AS token
      |    FROM documents)
      |), nd AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS nd FROM toks GROUP BY 1
      |), iv AS (
      |  SELECT a.source AS source_a, b.source AS source_b,
      |         CAST(count(*) AS BIGINT) AS exact_inter
      |  FROM toks a JOIN toks b ON a.token = b.token AND a.source < b.source
      |  GROUP BY 1, 2
      |), pairs AS (
      |  SELECT na.source AS source_a, nb.source AS source_b,
      |         na.nd AS exact_a, nb.nd AS exact_b,
      |         CAST(COALESCE(iv.exact_inter, 0) AS BIGINT) AS exact_inter
      |  FROM nd na JOIN nd nb ON na.source < nb.source
      |  LEFT JOIN iv ON iv.source_a = na.source AND iv.source_b = nb.source
      |)
      |SELECT source_a, source_b, exact_a, exact_b, exact_inter,
      |       round(CAST(exact_inter AS DOUBLE) /
      |             (exact_a + exact_b - exact_inter), 6) AS jaccard,
      |       CAST(1 AS INTEGER) AS union_in_bound
      |FROM pairs
      |ORDER BY source_a, source_b""".stripMargin

  // -------------------------------------------------------------- q198
  /** Zipf rank–frequency fit: OLS of ln(freq) on ln(rank) over the top
    * 1000 vocabulary terms — slope ≈ −1 is Zipf's law, and deviation
    * from it is the classic natural-text-vs-boilerplate diagnostic a
    * corpus monitor tracks per crawl (machine-generated or templated
    * corpora flatten the head and steepen the tail).
    *
    * The top-1000 head is a TakeOrdered (per-partition partial top-k,
    * driver-side K-row merge — never a global sort of the vocabulary;
    * an equi-width rank bucketing would be WRONG here: Zipf frequency
    * is exactly the distribution that collapses equi-width buckets
    * onto one hot cell), and the rank window then runs over the
    * 1000-row limited frame (lock-compliant: Window above GlobalLimit).
    * The fit is q115's raw-sufficient-sum discipline over the head:
    * identical scalar algebra on identically computed sums, terminal
    * 6 dp round. */
  private def q198(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vocab = Tables.documents(spark, dir)
      .select(explode(Portable.tokens($"text")).as("token"))
      .groupBy($"token").agg(count(lit(1)).as("freq"))
    val head = vocab.orderBy($"freq".desc, $"token".asc).limit(1000)
      .withColumn("rank",
        row_number().over(Window.orderBy($"freq".desc, $"token".asc)))
      .select(log($"rank".cast("double")).as("x"),
        log($"freq".cast("double")).as("y"))
    head.agg(count(lit(1)).cast("double").as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"), sum($"x" * $"y").as("sxy"),
        sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"))
      .select($"n".cast("long").as("n_terms"),
        round(($"n" * $"sxy" - $"sx" * $"sy") /
          ($"n" * $"sxx" - $"sx" * $"sx"), 6).as("slope"),
        round(($"sy" - ($"n" * $"sxy" - $"sx" * $"sy") /
          ($"n" * $"sxx" - $"sx" * $"sx") * $"sx") / $"n", 6).as("intercept"),
        round((($"n" * $"sxy" - $"sx" * $"sy") *
          ($"n" * $"sxy" - $"sx" * $"sy")) /
          (($"n" * $"sxx" - $"sx" * $"sx") *
            ($"n" * $"syy" - $"sy" * $"sy")), 6).as("r2"))
  }

  private val q198Sql: String =
    """WITH vocab AS (
      |  SELECT token, CAST(count(*) AS BIGINT) AS freq FROM (
      |    SELECT unnest(string_split_regex(text, '\s+')) AS token
      |    FROM documents)
      |  GROUP BY 1
      |), head AS (
      |  SELECT ln(CAST(row_number() OVER (ORDER BY freq DESC, token) AS DOUBLE)) AS x,
      |         ln(CAST(freq AS DOUBLE)) AS y
      |  FROM vocab
      |  QUALIFY row_number() OVER (ORDER BY freq DESC, token) <= 1000
      |), s AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
      |         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      |  FROM head
      |)
      |SELECT CAST(n AS BIGINT) AS n_terms,
      |       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
      |       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
      |         AS intercept,
      |       round(((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
      |             ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
      |FROM s""".stripMargin

  // --------------------------------------------------------------- q85
  /** BPE first-merge pair statistics: the frequency of every adjacent
    * character pair inside corpus tokens, weighted by token occurrence
    * count — exactly the count a byte-pair-encoding tokenizer trainer
    * computes to pick its next merge (Sennrich et al.'s algorithm, step
    * 1). Emits the top-20 pairs with occurrence-weighted totals and the
    * number of distinct word types containing each pair.
    *
    * Scale shape: the corpus collapses to the WORD-FREQUENCY table
    * first (one token-keyed aggregate — shuffle width = vocabulary,
    * the same contraction a real BPE trainer starts from), pair
    * generation then explodes word TYPES (vocabulary-sized, corpus-
    * independent), and the final aggregate is keyed by pair (≤ |Σ|²).
    * Nothing downstream of the first aggregate scales with corpus
    * size. */
  private def q85(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val words = Tables.documents(spark, dir)
      .select(explode(Portable.tokens($"text")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c"))
      .filter(length($"w") >= 2)
    val pairs = words
      .select($"w", $"c",
        explode(expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("pair"))
    val top = pairs.groupBy($"pair")
      .agg(count_distinct($"w").as("n_types"), sum($"c").as("total"))
      .orderBy($"total".desc, $"pair".asc)
      .limit(20)
    val w = Window.orderBy($"total".desc, $"pair".asc)
    top.withColumn("rn", row_number().over(w))
      .select($"pair", $"n_types", $"total", $"rn")
      .orderBy($"rn")
  }

  private val q85Sql: String =
    """WITH occ AS (
      |  SELECT unnest(string_split_regex(text, '\s+')) AS w FROM documents
      |), words AS (
      |  SELECT w, CAST(count(*) AS BIGINT) AS c FROM occ GROUP BY w
      |), pr AS (
      |  SELECT w, c,
      |         unnest([substr(w, i, 2) for i in generate_series(1, length(w) - 1)]) AS pair
      |  FROM words WHERE length(w) >= 2
      |), agg AS (
      |  SELECT pair, CAST(count(DISTINCT w) AS BIGINT) AS n_types,
      |         CAST(sum(c) AS BIGINT) AS total
      |  FROM pr GROUP BY pair
      |)
      |SELECT pair, n_types, total, CAST(rn AS INTEGER) AS rn
      |FROM (SELECT *, row_number() OVER (ORDER BY total DESC, pair ASC) AS rn
      |      FROM agg) t
      |WHERE rn <= 20
      |ORDER BY rn""".stripMargin

  // -------------------------------------------------------------- q153
  /** Linear quality classifier at scan speed — the model-based rung of
    * the quality ladder above q32's hand-set heuristic and q78's
    * unigram-LM surprisal (the fastText-style filter CCNet/LLaMA-era
    * pipelines run corpus-wide): mean-pooled hashed-unigram features ×
    * a fixed weight vector + bias, per row, zero shuffles.
    *
    * The weight vector stands in for a trained artifact (deterministic
    * pseudo-random literals — training a real model needs labels this
    * corpus lacks); swapping in learned weights changes ONE literal
    * array and no plan shape. What the oracle gate actually proves is
    * the SERVING path: feature hashing ([[Portable.hash32]], the
    * engine-portable md5 bridge), bucket lookup, mean-pool, and
    * thresholding agree bit-for-bit across engines.
    *
    * Determinism — the integer-cents discipline (SCALE.md), not
    * rounding: weights are INTEGER milli-units, so the pooled sum is a
    * BIGINT (exact in any aggregation order), the threshold decides on
    * that integer, and the reported logit is ONE terminal IEEE divide
    * of exact integers — bit-identical across engines with no round()
    * anywhere. The first spelling pooled rounded DOUBLES and fell to
    * the round-half trap the moment a /1000 weight met a power-of-two
    * token count (x.xxxxx5 exactly — Spark's BigDecimal HALF_UP and
    * DuckDB's binary round split; 6 of 500 docs at sf0.01). */
  private val QcBuckets = 64
  private val QcBiasMilli = -20L // −0.02 in milli-units
  private[operators] val QcMilliWeights: IndexedSeq[Long] =
    (0 until QcBuckets).map(j => (j * 2654435761L % 1000) - 500)

  /** Open-knob classifier core shared by q153 and
    * [[graft.Graft.qualityClassify]]: score ANY (idCol, textCol) frame
    * against a caller-supplied milli-unit weight vector — the "swap in
    * the trained export" seam, as a call instead of a code edit. The
    * bucket count is the weight vector's length. */
  private[graft] def qualityClassify(df: DataFrame, idCol: String,
      textCol: String, milliWeights: Seq[Long], biasMilli: Long): DataFrame = {
    require(milliWeights.nonEmpty && milliWeights.size <= (1 << 20),
      s"need 1 <= buckets <= 2^20 (got ${milliWeights.size})")
    val w = typedlit(milliWeights)
    val pooled = aggregate(
      transform(col("t"), tok =>
        element_at(w, (Portable.hash32(tok) % milliWeights.size).cast("int") + 1)),
      lit(0L), (acc, x) => acc + x)
    df.withColumn("t", Portable.tokens(col(textCol)))
      .withColumn("n_tokens", size(col("t")))
      // raw milli-score scaled by n: logit·1000·n, an exact BIGINT
      .withColumn("raw", pooled + lit(biasMilli) * col("n_tokens"))
      .select(col(idCol), col("n_tokens"),
        (col("raw").cast("double") / (lit(1000.0) * col("n_tokens")))
          .as("quality_logit"),
        (col("raw") >= 0).cast("int").as("quality_pass"))
      .orderBy(col(idCol))
  }

  private def q153(spark: SparkSession, dir: String): DataFrame =
    qualityClassify(Tables.documents(spark, dir), "doc_id", "text",
      QcMilliWeights, QcBiasMilli)

  private val q153Sql: String = {
    val wLit = QcMilliWeights.mkString("[", ", ", "]")
    s"""WITH d AS (
       |  SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents
       |), f AS (
       |  SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tokens,
       |         CAST(list_sum([($wLit)[(${Portable.hash32Sql("t")} % $QcBuckets) + 1]
       |                        for t in toks]) + ($QcBiasMilli) * len(toks) AS BIGINT) AS raw
       |  FROM d
       |)
       |SELECT doc_id, n_tokens,
       |       CAST(raw AS DOUBLE) / (1000.0 * n_tokens) AS quality_logit,
       |       CAST(raw >= 0 AS INTEGER) AS quality_pass
       |FROM f
       |ORDER BY doc_id""".stripMargin
  }

  // -------------------------------------------------------------- q200
  /** Calibration audit of the q153 linear quality classifier — the
    * reliability diagram + expected-calibration-error machinery every
    * model-based corpus filter needs before its scores gate anything
    * (Guo et al., ICML'17): bucket the corpus into DECILES of the
    * predicted probability, and per bin compare the mean prediction
    * against the observed rate of a reference outcome. The outcome
    * here is the cheap independent quality signal the catalog already
    * trusts (q32's discipline): English stopword ratio ≥ 15% —
    * "does the learned score track the heuristic gate, and WHERE does
    * it over/under-shoot".
    *
    * Scale shapes: the outcome test is EXACT integer arithmetic
    * (100·n_stop ≥ 15·n_tokens — no float ratio); deciles run through
    * [[Ranks.withGlobalRank]] + [[Ranks.ntileFromRank]] on the
    * corpus-sized score frame (the q49/q192 discipline — never a
    * single-task window; the oracle's naive ntile spelling is the
    * parity proof); per-bin stats are one partial+final aggregate.
    * σ(logit) is libm exp — bin means round at 6 dp (q115's
    * absorbed-ulp argument); the ECE term scales by exact counts. */
  private def q200(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stopEn = typedlit(stop("en"))
    val w = typedlit(QcMilliWeights)
    // classifier score AND outcome label from ONE tokenization pass
    // (the q153 pooled-milli-sum algebra inlined next to the stopword
    // count — two array folds over the same `t`, single corpus scan)
    val pooled = aggregate(
      transform($"t", tok =>
        element_at(w, (Portable.hash32(tok) % QcMilliWeights.size).cast("int") + 1)),
      lit(0L), (acc, x) => acc + x)
    val scored = Tables.documents(spark, dir)
      .withColumn("t", Portable.tokens($"text"))
      .select($"doc_id", size($"t").as("nt"),
        (pooled + lit(QcBiasMilli) * size($"t")).as("raw"),
        size(filter($"t", tok => array_contains(stopEn, tok))).as("nstop"))
      .select($"doc_id",
        ($"raw".cast("double") / (lit(1000.0) * $"nt")).as("quality_logit"),
        ($"nstop" * 100 >= $"nt" * 15).cast("long").as("label"))
    val binned = Ranks.withGlobalRank(scored,
        "quality_logit", "doc_id", rn = "__rn", n = "__n")
      .withColumn("decile", Ranks.ntileFromRank("__rn", "__n", 10))
    val total = binned.agg(count(lit(1)).as("nn"))
    binned
      .withColumn("p", lit(1.0) / (lit(1.0) + exp(-$"quality_logit")))
      .groupBy($"decile")
      .agg(count(lit(1)).as("n"), sum($"p").as("sp"), sum($"label").as("npos"))
      .crossJoin(broadcast(total))
      .select($"decile", $"n",
        round($"sp" / $"n", 6).as("mean_pred"),
        round($"npos".cast("double") / $"n", 6).as("obs_rate"),
        round(abs($"sp" / $"n" - $"npos".cast("double") / $"n") *
          $"n" / $"nn", 6).as("ece_term"))
      .orderBy($"decile")
  }

  private val q200Sql: String = {
    val stopList = stop("en").map(s => s"'$s'").mkString("[", ", ", "]")
    val wLit = QcMilliWeights.mkString("[", ", ", "]")
    s"""WITH d AS (
       |  SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM documents
       |), f AS (
       |  SELECT doc_id,
       |         CAST(list_sum([($wLit)[(${Portable.hash32Sql("t")} % $QcBuckets) + 1]
       |                        for t in toks]) + ($QcBiasMilli) * len(toks) AS BIGINT) AS raw,
       |         CAST(len(toks) AS BIGINT) AS n_tokens,
       |         CAST(len(list_filter(toks, t -> list_contains($stopList, t)))
       |              AS BIGINT) AS n_stop
       |  FROM d
       |), scored AS (
       |  SELECT doc_id,
       |         CAST(raw AS DOUBLE) / (1000.0 * n_tokens) AS quality_logit,
       |         CAST(n_stop * 100 >= n_tokens * 15 AS BIGINT) AS label
       |  FROM f
       |), binned AS (
       |  SELECT *, ntile(10) OVER (ORDER BY quality_logit, doc_id) AS decile,
       |         count(*) OVER () AS nn
       |  FROM scored
       |)
       |SELECT CAST(decile AS INTEGER) AS decile, CAST(count(*) AS BIGINT) AS n,
       |       round(sum(1.0 / (1.0 + exp(-quality_logit))) / count(*), 6) AS mean_pred,
       |       round(CAST(sum(label) AS DOUBLE) / count(*), 6) AS obs_rate,
       |       round(abs(sum(1.0 / (1.0 + exp(-quality_logit))) / count(*)
       |                 - CAST(sum(label) AS DOUBLE) / count(*))
       |             * count(*) / any_value(nn), 6) AS ece_term
       |FROM binned
       |GROUP BY decile
       |ORDER BY decile""".stripMargin
  }

  // -------------------------------------------------------------- q204
  /** Heaps'-law vocabulary growth: V(n) ≈ K·n^β measured at five
    * geometric corpus prefixes (doc_id order: 1/16, 1/8, 1/4, 1/2,
    * all) with the fitted exponent — q198's Zipf twin on the OTHER
    * axis (Zipf: frequency vs rank at fixed size; Heaps: vocabulary vs
    * size), and the projection a corpus plan uses to answer "how much
    * new vocabulary does doubling the crawl buy".
    *
    * ONE-PASS shape: V(prefix) needs no per-prefix rescans — a token's
    * contribution to every prefix is decided by its FIRST-occurrence
    * doc_id, so one vocabulary aggregate (token → min doc_id) plus
    * five conditional counts gives all checkpoints; prefix token
    * masses are five conditional sums over the per-doc token counts.
    * Both are single partial+final aggregates. The β fit is q115's
    * sufficient-sum OLS over the five (ln n, ln V) points, rounded
    * 6 dp; counts are exact integers. */
  private def q204(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", size(Portable.tokens($"text")).as("ntok"))
    val nDocs = docs.agg(count(lit(1)).as("nd"))
    val firstSeen = Tables.documents(spark, dir)
      .select($"doc_id", explode(Portable.tokens($"text")).as("token"))
      .groupBy($"token").agg(min($"doc_id").as("first_doc"))
    val fracs = Seq(16, 8, 4, 2, 1)
    def cut(f: Int) = ($"nd" / f).cast("long")
    val vCols = fracs.map(f =>
      sum(($"first_doc" < cut(f)).cast("long")).as(s"v$f"))
    val tCols = fracs.map(f =>
      sum(when($"doc_id" < cut(f), $"ntok".cast("long")).otherwise(0L)).as(s"t$f"))
    val vocabAtCuts = firstSeen.crossJoin(broadcast(nDocs))
      .agg(vCols.head, vCols.tail: _*)
    val tokensAtCuts = docs.crossJoin(broadcast(nDocs))
      .agg(tCols.head, tCols.tail: _*)
    val long = vocabAtCuts.crossJoin(tokensAtCuts).crossJoin(broadcast(nDocs))
      .select(explode(array(fracs.map(f => struct(
        lit(fracs.indexOf(f) + 1).as("checkpoint"),
        cut(f).as("n_docs"),
        col(s"t$f").as("n_tokens"),
        col(s"v$f").as("vocab"))): _*)).as("p"))
      .select($"p.checkpoint", $"p.n_docs", $"p.n_tokens", $"p.vocab")
    val fit = long
      .select(log($"n_tokens".cast("double")).as("x"),
        log($"vocab".cast("double")).as("y"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"))
      .select(round(($"n" * $"sxy" - $"sx" * $"sy") /
        ($"n" * $"sxx" - $"sx" * $"sx"), 6).as("heaps_beta"))
    long.crossJoin(broadcast(fit))
      .orderBy($"checkpoint")
  }

  private val q204Sql: String = {
    val fracs = Seq(16, 8, 4, 2, 1)
    val vCols = fracs.map(f =>
      s"CAST(sum(CASE WHEN first_doc < nd // $f THEN 1 ELSE 0 END) AS BIGINT) AS v$f")
      .mkString(",\n         ")
    val tCols = fracs.map(f =>
      s"CAST(sum(CASE WHEN doc_id < nd // $f THEN ntok ELSE 0 END) AS BIGINT) AS t$f")
      .mkString(",\n         ")
    val rows = fracs.zipWithIndex.map { case (f, i) =>
      s"SELECT ${i + 1} AS checkpoint, (SELECT nd // $f FROM nd) AS n_docs, " +
        s"t$f AS n_tokens, v$f AS vocab FROM v CROSS JOIN t"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH nd AS (
       |  SELECT CAST(count(*) AS BIGINT) AS nd FROM documents
       |), fs AS (
       |  SELECT token, min(doc_id) AS first_doc FROM (
       |    SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS token
       |    FROM documents)
       |  GROUP BY 1
       |), dt AS (
       |  SELECT doc_id, len(string_split_regex(text, '\\s+')) AS ntok
       |  FROM documents
       |), v AS (
       |  SELECT $vCols
       |  FROM fs CROSS JOIN nd
       |), t AS (
       |  SELECT $tCols
       |  FROM dt CROSS JOIN nd
       |), long AS (
       |  $rows
       |), fit AS (
       |  SELECT round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS heaps_beta
       |  FROM (SELECT CAST(count(*) AS DOUBLE) AS n,
       |               sum(ln(CAST(n_tokens AS DOUBLE))) AS sx,
       |               sum(ln(CAST(vocab AS DOUBLE))) AS sy,
       |               sum(ln(CAST(n_tokens AS DOUBLE)) * ln(CAST(vocab AS DOUBLE))) AS sxy,
       |               sum(ln(CAST(n_tokens AS DOUBLE)) * ln(CAST(n_tokens AS DOUBLE))) AS sxx
       |        FROM long)
       |)
       |SELECT long.checkpoint, CAST(long.n_docs AS BIGINT) AS n_docs,
       |       long.n_tokens, long.vocab, fit.heaps_beta
       |FROM long CROSS JOIN fit
       |ORDER BY checkpoint""".stripMargin
  }

  // -------------------------------------------------------------- q154
  /** Bigram-LM surprisal of the held-out split: an add-1-smoothed
    * CONDITIONAL model `p(w2|w1) = (c(w1 w2)+1)/(c_train(w1)+V)` fit on
    * the train split scores every test document by mean negative
    * log-likelihood per bigram — the context-aware upgrade of q78's
    * unigram signal (a doc of common words in an uncommon ORDER now
    * scores high; CCNet's KenLM filter reduced to its oracle-exact
    * public core — production stacks extend the same shape to
    * interpolated 5-grams).
    *
    * Determinism: all counts and both sides of the division are exact
    * integers; ln is the one transcendental and each per-doc mean
    * averages ≤ a few hundred of them, so 4-dp output rounding absorbs
    * last-ulp latitude (q78's argument verbatim).
    *
    * Scale shape: the model is ONE corpus scan into a partial+final
    * aggregate keyed by (w1, w2) — shuffle width = distinct bigrams,
    * the width a shingle pass already carries; the unigram denominator
    * reuses [[splitTokenCounts]] (same vocabulary, same train mass as
    * q74/q78) and V collapses to one broadcast row. Scoring explodes
    * only the 10 % test split and joins it by bigram key — AQE
    * broadcasts the model when it fits, else shuffles by bigram, never
    * by document; an unseen test bigram left-joins to c=0 and costs
    * `-ln(1/(c(w1)+V))` with no OOV branch (the vocabulary spans the
    * whole corpus by construction). */
  private def q154(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val uni = splitTokenCounts(spark, dir) // (token, c_train, c_test)
    val v = uni.agg(count(lit(1)).as("v"))
    def bigrams(docs: DataFrame): DataFrame =
      docs
        .select($"doc_id", Portable.tokens($"text").as("t"))
        .select($"doc_id",
          explode(zip_with(
            slice($"t", lit(1), size($"t") - 1),
            slice($"t", lit(2), size($"t") - 1),
            (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .select($"doc_id", $"bg.w1", $"bg.w2")
    val docs = Tables.documents(spark, dir)
    val b2 = bigrams(docs.where(Curation.splitBucket($"doc_id") < 80))
      .groupBy($"w1", $"w2").agg(count(lit(1)).as("c2"))
    bigrams(docs.where(Curation.splitBucket($"doc_id") >= 90))
      .join(b2, Seq("w1", "w2"), "left")
      .join(uni.select($"token".as("w1"), $"c_train"), Seq("w1"))
      .crossJoin(broadcast(v))
      .select($"doc_id",
        ((coalesce($"c2", lit(0L)) + 1L).cast("double") /
          ($"c_train" + $"v").cast("double")).as("p"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(-log($"p")), 4).as("avg_nll2"))
      .orderBy($"doc_id")
  }

  private val q154Sql: String =
    s"""WITH $splitCountsCtes, d AS (
       |  SELECT doc_id, ${Curation.splitBucketSql("doc_id")} AS bucket,
       |         string_split_regex(text, '\\s+') AS t
       |  FROM documents
       |), bg AS (
       |  SELECT doc_id, bucket, t[i] AS w1, t[i + 1] AS w2
       |  FROM (SELECT doc_id, bucket, t,
       |               unnest(generate_series(1, len(t) - 1)) AS i
       |        FROM d)
       |), b2 AS (
       |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
       |  FROM bg WHERE bucket < 80 GROUP BY 1, 2
       |), vv AS (
       |  SELECT CAST(count(*) AS BIGINT) AS v FROM counts
       |), scored AS (
       |  SELECT g.doc_id,
       |         CAST(COALESCE(b2.c2, 0) + 1 AS DOUBLE) /
       |           CAST(c.c_train + vv.v AS DOUBLE) AS p
       |  FROM bg g
       |  JOIN counts c ON c.token = g.w1
       |  LEFT JOIN b2 ON b2.w1 = g.w1 AND b2.w2 = g.w2
       |  CROSS JOIN vv
       |  WHERE g.bucket >= 90
       |)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |       round(avg(-ln(p)), 4) AS avg_nll2
       |FROM scored
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- q188
  /** Count-min-sketch heavy hitters (Cormode & Muthukrishnan '05) —
    * the fixed-memory frequency sketch next to q95's HLL (distincts)
    * and q54's KLL (quantiles): d=4 hash rows × w=512 counters hold
    * approximate counts for an UNBOUNDED vocabulary in 2 KiB of cells,
    * with the one-sided guarantee est ≥ exact and est ≤ exact + 2N/w
    * per row (min over 4 rows drives the error probability to
    * (1/2)⁴-ish). The catalog row audits the sketch against exact
    * truth: the top-20 exact tokens with their CMS estimates and
    * overcounts — overcount ≥ 0 is STRUCTURAL (hash collisions only
    * ever add), so the whole report is integer-exact and
    * oracle-checked on both engines via the portable md5 hash family
    * ([[Portable.hash32]] with per-row salts).
    *
    * Scale shape: the sketch build is ONE partial+final aggregate
    * whose shuffle width is d·w = 2 048 cells REGARDLESS of corpus
    * size (map-side combine does the heavy lifting — this is the
    * whole point of sketching at 100 TB); cells are mergeable across
    * shards by cell-wise addition (the same merge q95's HLL union
    * uses), so daily shards sketch independently and union without
    * rescanning history. The probe side is 20 rows × 4 probes joined
    * against the broadcast 2 048-cell table. */
  private[graft] val CmsD = 4
  private[graft] val CmsW = 512

  /** The (r, col) probe family of one token — shared by the batch
    * sketch build, the probe side, and [[graft.streaming.CmsStream]]'s
    * continuous maintenance (one definition ⇒ the streamed cells can
    * never fork from the batch sketch). */
  private[graft] def cmsProbes(w: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    array((0 until CmsD).map(r =>
      struct(lit(r).as("r"),
        (Portable.hash32(concat(lit(s"cms$r|"), w)) % CmsW).as("col"))): _*)

  private[graft] def cmsHeavyHitters(spark: SparkSession, dir: String,
      topK: Int): DataFrame = {
    require(topK > 0, s"need topK > 0 (got $topK)")
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select(explode(Portable.tokens($"text")).as("w"))
    def probeCols(w: org.apache.spark.sql.Column) = cmsProbes(w)
    val cells = toks
      .select(inline(probeCols($"w")))
      .groupBy($"r", $"col").agg(count(lit(1)).as("cell"))
    val exact = toks.groupBy($"w").agg(count(lit(1)).as("exact_cnt"))
      .orderBy($"exact_cnt".desc, $"w".asc).limit(topK)
    exact
      .select($"w", $"exact_cnt", explode(probeCols($"w")).as("p"))
      .select($"w", $"exact_cnt", $"p.r".as("r"), $"p.col".as("col"))
      .join(broadcast(cells), Seq("r", "col"))
      .groupBy($"w", $"exact_cnt").agg(min($"cell").as("cms_est"))
      .select($"w".as("token"), $"exact_cnt", $"cms_est",
        ($"cms_est" - $"exact_cnt").as("overcount"))
      .orderBy($"exact_cnt".desc, $"token".asc)
  }

  private def q188(spark: SparkSession, dir: String): DataFrame =
    cmsHeavyHitters(spark, dir, topK = 20)

  private val q188Sql: String =
    s"""WITH toks AS (
       |  SELECT unnest(string_split_regex(text, '\\s+')) AS w FROM documents
       |), rr AS (SELECT unnest(range(0, $CmsD)) AS r),
       |cells AS (
       |  SELECT rr.r,
       |         ${Portable.hash32Sql(s"concat('cms', rr.r, '|', t.w)")} % $CmsW AS col,
       |         CAST(count(*) AS BIGINT) AS cell
       |  FROM toks t CROSS JOIN rr
       |  GROUP BY 1, 2
       |), exact AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS exact_cnt
       |  FROM toks GROUP BY 1
       |  ORDER BY exact_cnt DESC, w ASC LIMIT 20
       |), probes AS (
       |  SELECT e.w, e.exact_cnt, rr.r,
       |         ${Portable.hash32Sql(s"concat('cms', rr.r, '|', e.w)")} % $CmsW AS col
       |  FROM exact e CROSS JOIN rr
       |)
       |SELECT p.w AS token, p.exact_cnt,
       |       CAST(min(c.cell) AS BIGINT) AS cms_est,
       |       CAST(min(c.cell) - p.exact_cnt AS BIGINT) AS overcount
       |FROM probes p JOIN cells c ON c.r = p.r AND c.col = p.col
       |GROUP BY 1, 2
       |ORDER BY exact_cnt DESC, token ASC""".stripMargin

  // -------------------------------------------------------------- q189
  /** PMI collocations (Church & Hanks '90) — the top adjacent-bigram
    * associations of the corpus: lift(x,y) = P(xy) / (P(x)·P(y)) over
    * adjacent token pairs, PMI = ln(lift). THE collocation detector a
    * tokenizer-training / phrase-mining pass runs before merging
    * multiword units (q85's BPE counts rank raw frequency; PMI ranks
    * statistical surprise — "new york" beats "of the").
    *
    * Determinism: the RANKING key is the raw lift ratio — computed
    * from exact integer counts with one fixed parenthesization
    * `(c_xy/N2) / ((c_x/N1)·(c_y/N1))`, so it is bit-identical across
    * engines and the ln (libm, the one non-portable op) only ever
    * lands in the ROUNDED pmi display column, never in ordering or
    * filtering. A min-support floor (c_xy ≥ 5) applies BEFORE ranking —
    * the standard guard against hapax pairs whose PMI is maximal noise.
    *
    * Scale shape: one token-stream scan explodes to adjacent pairs;
    * bigram and unigram counts are two partial+final aggregates; the
    * unigram re-attach is two equi-joins on the token keys (vocabulary-
    * wide shuffle, corpus-independent); top-20 is TakeOrdered. */
  private[graft] def pmiCollocations(spark: SparkSession, dir: String,
      minCount: Long, topK: Int): DataFrame = {
    require(minCount >= 1 && topK > 0,
      s"need minCount >= 1 and topK > 0 (got $minCount, $topK)")
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", Portable.tokens($"text").as("t"))
    val uni = toks.select(explode($"t").as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c1"))
    val n1 = uni.agg(sum($"c1").as("n1"))
    val bi = toks
      .filter(size($"t") >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(t)-2), i -> struct(t[i] AS w1, t[i+1] AS w2))")).as("b"))
      .select($"b.w1", $"b.w2")
      .groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
      .filter($"c12" >= minCount)
    val n2 = toks.filter(size($"t") >= 2)
      .agg(sum(size($"t") - 1).cast("long").as("n2"))
    val lift = ($"c12".cast("double") / $"n2") /
      (($"ca".cast("double") / $"n1") * ($"cb".cast("double") / $"n1"))
    bi
      .join(uni.select($"w".as("w1"), $"c1".as("ca")), Seq("w1"))
      .join(uni.select($"w".as("w2"), $"c1".as("cb")), Seq("w2"))
      .crossJoin(broadcast(n1.crossJoin(n2)))
      .select($"w1", $"w2", $"c12", $"ca", $"cb", lift.as("lift"))
      .withColumn("pmi", round(log($"lift"), 6))
      .orderBy($"lift".desc, $"w1".asc, $"w2".asc)
      .limit(topK)
  }

  private def q189(spark: SparkSession, dir: String): DataFrame =
    pmiCollocations(spark, dir, minCount = 5L, topK = 20)

  private val q189Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
       |), uni AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS c1
       |  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1
       |), n1t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1 FROM uni),
       |bi AS (
       |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
       |  FROM (SELECT t[i] AS w1, t[i + 1] AS w2
       |        FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
       |              FROM toks WHERE len(t) >= 2))
       |  GROUP BY 1, 2
       |  HAVING count(*) >= 5
       |), n2t AS (
       |  SELECT CAST(sum(len(t) - 1) AS BIGINT) AS n2 FROM toks WHERE len(t) >= 2
       |)
       |SELECT w1, w2, c12, ca, cb, lift, round(ln(lift), 6) AS pmi
       |FROM (
       |  SELECT b.w1, b.w2, b.c12, ua.c1 AS ca, ub.c1 AS cb,
       |         (CAST(b.c12 AS DOUBLE) / n2) /
       |           ((CAST(ua.c1 AS DOUBLE) / n1) * (CAST(ub.c1 AS DOUBLE) / n1)) AS lift
       |  FROM bi b
       |  JOIN uni ua ON ua.w = b.w1
       |  JOIN uni ub ON ub.w = b.w2
       |  CROSS JOIN n1t CROSS JOIN n2t
       |)
       |ORDER BY lift DESC, w1 ASC, w2 ASC
       |LIMIT 20""".stripMargin

  // -------------------------------------------------------------- q194
  /** Byte-entropy quality scoring — the compression-proxy filter
    * (low-entropy text is repetitive boilerplate/padding, maximal
    * entropy is binary junk blown into a text column; real prose sits
    * in a band) used alongside q32's ratio features and q59's
    * repetition filter: per document, Shannon entropy of the UTF-8
    * BYTE distribution via H = ln(n) − (Σ c·ln c)/n over the byte
    * histogram.
    *
    * Scale shape (round 7): the histogram is a native single-pass
    * expression ([[graft.functions.ByteEntropyStats]] — int[256] per
    * row inside the projection, codegen'd), so the operator's row
    * volume is the DOCUMENT count. The previous shape exploded each
    * byte to a row (hex substring + string conv per byte) and paid two
    * aggregates over the corpus BYTE stream — benched 3.3 s at sf0.1
    * and would shuffle the corpus at 100 TB; the fused form is a
    * scan-speed projection (0.3 s). The empty-document filter keeps
    * parity with the exploded form (and the oracle's unnest), where a
    * zero-byte doc produced no rows. H is a rounded float off libm ln
    * (q142's rule); Σ c·ln c accumulates in ascending byte order,
    * within the same 6-dp contract the old partial-agg-ordered sum
    * lived under. */
  private def q194(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    Tables.documents(spark, dir)
      .select($"doc_id", encode($"text", "UTF-8").as("b"))
      .select($"doc_id", length($"b").cast("long").as("n_bytes"),
        expr("graft_byte_entropy(b)").as("st"))
      .filter($"n_bytes" > 0)
      .select($"doc_id", $"n_bytes",
        $"st".getItem(0).cast("long").as("n_distinct_bytes"),
        round(log($"n_bytes") - $"st".getItem(1) / $"n_bytes", 6).as("entropy"))
      .orderBy($"doc_id")
  }

  private val q194Sql: String =
    """WITH b AS (
      |  SELECT doc_id,
      |         CAST(concat('0x', substr(h, 2*i - 1, 2)) AS INTEGER) AS bv
      |  FROM (SELECT doc_id, hex(encode(text)) AS h,
      |               unnest(generate_series(1, octet_length(encode(text)))) AS i
      |        FROM documents)
      |), hist AS (
      |  SELECT doc_id, bv, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2
      |)
      |SELECT doc_id,
      |       CAST(sum(c) AS BIGINT) AS n_bytes,
      |       CAST(count(*) AS BIGINT) AS n_distinct_bytes,
      |       round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS entropy
      |FROM hist
      |GROUP BY 1
      |ORDER BY doc_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q196_hll_jaccard", q196, Some(q196Sql)),
    Q("q200_calibration_bins", q200, Some(q200Sql)),
    Q("q198_zipf_fit", q198, Some(q198Sql)),
    Q("q204_heaps_growth", q204, Some(q204Sql)),
    Q("q31_lang_id", q31, Some(q31Sql)),
    Q("q188_cms_heavy_hitters", q188, Some(q188Sql)),
    Q("q189_pmi_collocations", q189, Some(q189Sql)),
    Q("q194_byte_entropy", q194, Some(q194Sql)),
    Q("q32_quality_score", q32, Some(q32Sql)),
    Q("q33_token_stats", q33, Some(q33Sql)),
    Q("q34_fingerprint", q34, Some(q34Sql)),
    Q("q38_array_funcs", q38, Some(q38Sql)),
    Q("q59_repetition_filter", q59, Some(q59Sql)),
    Q("q62_pii_scrub", q62, Some(q62Sql)),
    Q("q69_vocab_coverage", q69, Some(q69Sql)),
    Q("q74_token_drift", q74, Some(q74Sql)),
    Q("q75_boilerplate_ngrams", q75, Some(q75Sql)),
    Q("q78_unigram_surprisal", q78, Some(q78Sql)),
    Q("q84_bm25_search", q84, Some(q84Sql)),
    Q("q85_bpe_pairs", q85, Some(q85Sql)),
    Q("q94_hybrid_rrf", q94, Some(q94Sql)),
    Q("q95_sketch_union", q95, Some(q95Sql)), // exact companions + in-bound verdicts hash; raw HLL estimates stay engine-local
    Q("q153_quality_classifier", q153, Some(q153Sql)),
    Q("q154_bigram_surprisal", q154, Some(q154Sql)),
  )
}
