package graft.operators

import org.apache.spark.sql.Column

import graft.functions.Portable

/** The catalog-wide deterministic rounding convention, hoisted ONCE
  * (round-4 advisory: the two-overload shadow + its doc comment lived
  * verbatim in 14 operator objects).
  *
  * Shadows `functions.round`: per-row rounded doubles go through the
  * deterministic cross-engine floor form ([[Portable.detRound]]) —
  * Spark's BigDecimal shortest-repr rounding diverges from DuckDB's
  * binary rounding on `…5`-boundary doubles (round-3 q55) — and the
  * catalog assembly ([[graft.SparkEntry]]) rewrites every oracle twin
  * with [[Portable.detRoundSql]] so both engines share one IEEE-only
  * formula. The 1-arg `round` keeps Spark semantics: it only quantizes
  * construction-exact cents.
  *
  * Inherited members outrank the `functions._` wildcard import in
  * Scala's name binding, so mixing this in shadows the built-in
  * everywhere inside the operator object — one place to widen the
  * scale range or change the formula.
  */
private[graft] trait DetRounding {
  protected def round(c: Column, scale: Int): Column = Portable.detRound(c, scale)
  protected def round(c: Column): Column = org.apache.spark.sql.functions.round(c)
}
