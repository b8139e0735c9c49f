package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** The exact-integer half-up rounding law for terminating quotients —
  * the shared form behind the cross-engine rounding-tie fixes (SURVEY.md
  * §6/§9e): a terminating quotient (count/count, decimal-sum/count,
  * exact scale reduction) rounded THROUGH A DOUBLE can land on an exact
  * `.xx5` boundary where Spark (BigDecimal half-up on the exact binary
  * expansion) and DuckDB (multiply-then-round on the fp product) split
  * by 1 ulp at the last kept digit. The fix: compute
  * `round(num/den)` on pre-scaled integers as `(2·num + den) div (2·den)`
  * — both engines' integer divisions agree for non-negative operands
  * (Spark `div` truncates toward zero, DuckDB `//` floors), so the
  * signed form runs on |num| and re-applies the sign, giving
  * half-AWAY-FROM-ZERO on both engines (matching what both `round()`s
  * do to exact decimals).
  *
  * Callers stage the scaled numerator/denominator as LONG columns via
  * `withColumn` (overflow audit per site: 2·num + den must stay inside
  * int64 at the target scale, OR both operands stage through
  * decimal(38,0) — in which case the QUOTIENT, a bounded statistic
  * times 10^d, must still fit int64: SQL `div` casts its result to
  * long and wraps silently past it, asserted by ExactRoundSpec) and
  * pass the column NAMES here; the helper
  * returns the integer-valued Column to divide back by the output
  * scale's power of ten. The matching DuckDB oracle uses the identical
  * CASE with `//` in place of `div`.
  */
object ExactRound {

  /** `round(num/den)` half-away-from-zero on pre-scaled longs; `den` > 0,
    * `num` may be negative. Arguments are SQL snippets (column names or
    * integer-literal products). */
  def halfUp(num: String, den: String): Column =
    expr(s"""CASE WHEN ($num) < 0
             THEN -((2 * (-($num)) + ($den)) div (2 * ($den)))
             ELSE (2 * ($num) + ($den)) div (2 * ($den)) END""")

  /** Non-negative fast path — no sign branch; use when the numerator is
    * a count or a sum of non-negative terms. */
  def halfUpPos(num: String, den: String): Column =
    expr(s"(2 * ($num) + ($den)) div (2 * ($den))")

  /** [[halfUpPos]] for quotients that themselves exceed int64 (the sf1
    * catch: Kruskal–Wallis' per-group ×100 squared-rank-sum term reaches
    * ~7·10¹⁹ at 1.5 M orders — SQL `div` wrapped it silently). Floor
    * division rebuilt from exact decimal `%` and `/`:
    * `(a − a mod b) / b` is an exactly-representable integer, so the
    * decimal divide introduces no rounding; operands must already be
    * decimal(38,0)-staged. The matching oracle keeps DuckDB's native
    * HUGEINT `//`. */
  def halfUpPosBig(num: String, den: String): Column =
    expr(s"""CAST(((2 * ($num) + ($den))
             - ((2 * ($num) + ($den)) % (2 * ($den))))
             / (2 * ($den)) AS DECIMAL(38,0))""")

  /** The matching DuckDB oracle snippet for [[halfUp]]. */
  def oracleHalfUp(num: String, den: String): String =
    s"""CASE WHEN ($num) < 0
       | THEN -((2 * (-($num)) + ($den)) // (2 * ($den)))
       | ELSE (2 * ($num) + ($den)) // (2 * ($den)) END""".stripMargin

  /** The matching DuckDB oracle snippet for [[halfUpPos]]. */
  def oracleHalfUpPos(num: String, den: String): String =
    s"(2 * ($num) + ($den)) // (2 * ($den))"
}
