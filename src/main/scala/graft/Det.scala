package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers for floating-point aggregates.
  *
  * A double `sum` is evaluated in partition/merge order in Spark and in
  * sequential order in DuckDB; when `round(sum(x), n)` lands within an ulp
  * of a rounding boundary the two engines (or two runs of the same engine
  * with different partitioning) disagree. Casting each value to fixed-point
  * decimal first makes the sum exact and associative — order-independent,
  * so both engines see bit-identical results. At cluster scale this also
  * makes query output byte-stable across executor counts and AQE re-plans,
  * which is what downstream content-hash dedup of result sets requires.
  *
  * Two precision rules make this airtight:
  *
  *  1. **The cast scale must exceed the data's intrinsic decimal
  *     precision.** Monetary columns are 2-decimal; a product of three of
  *     them is a true 6-decimal value. Casting such a value to scale 4
  *     lands *systematically* on a `..50` half-way tie, where the engines'
  *     double→decimal conversions disagree (exact-expansion HALF_UP vs
  *     multiply-and-rint) — measured at ~0.6% of rows. At scale 6 the cast
  *     is exact (the nearest scale-6 decimal IS the true value, ulp-far
  *     from any tie), so both engines produce identical decimals.
  *  2. **Round in decimal space, then cast to double.** The exact scale-6
  *     sum can itself sit precisely on a `..50` tie of the output rounding;
  *     decimal HALF_UP is exact and identical everywhere, double-space
  *     round is not.
  *
  * The SQL twins emit the same expression in the shared ANSI dialect, valid
  * in both Spark SQL and DuckDB. DECIMAL(28,6) leaves 22 integer digits —
  * a 1e5-magnitude measure summed over 1e9 rows uses 14 — and sums extend
  * to 38 digits of precision in both engines before overflow.
  */
object Det {

  private val Fixed = "decimal(28,6)"
  private val FixedSql = "DECIMAL(28,6)"
  private val Fine = "decimal(28,9)"
  private val FineSql = "DECIMAL(28,9)"

  /** Order-independent sum of a double column, surfaced back as DOUBLE.
    * Use this form only as an *input to further double arithmetic*
    * (ratios, averages, thresholds); for a rounded output column use
    * [[dsumRound]]. */
  def dsum(c: Column): Column = sum(c.cast(Fixed)).cast("double")

  /** Oracle/SQL twin of [[dsum]] — same fixed-point, same output type. */
  def dsumSql(x: String): String =
    s"CAST(sum(CAST(($x) AS $FixedSql)) AS DOUBLE)"

  /** Rounded order-independent sum (see rule 2 above: the round happens in
    * DECIMAL space, only then does the value become a double). */
  def dsumRound(c: Column, scale: Int): Column =
    round(sum(c.cast(Fixed)), scale).cast("double")

  def dsumRoundSql(x: String, scale: Int): String =
    s"CAST(round(sum(CAST(($x) AS $FixedSql)), $scale) AS DOUBLE)"

  /** Higher-precision variant for small-magnitude values (embedding
    * coordinates, discount fractions). */
  def dsum9(c: Column): Column = sum(c.cast(Fine)).cast("double")

  def dsum9Sql(x: String): String =
    s"CAST(sum(CAST(($x) AS $FineSql)) AS DOUBLE)"
}
