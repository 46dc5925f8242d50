package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Exact integer arithmetic for hashed/ordered output columns — the
  * round-9 cross-engine determinism convention.
  *
  * Why this exists: every red CORRECTNESS row rounds 1–8 shared one
  * root cause — a DOUBLE (a quotient that can land exactly on a .5
  * boundary, or a libm transcendental) inside a hashed, ordered, or
  * grouped column. IEEE division is correctly rounded and therefore
  * bit-identical across engines, but `round()` of a value that sits
  * EXACTLY on a half-boundary is not: HALF_UP vs banker's rounding
  * differs between engines and even between DuckDB versions. The fix
  * is to never round a float at all: compute ratio outputs with pure
  * BIGINT arithmetic, identically spelled in the Spark plan and the
  * DuckDB oracle.
  *
  * The one formula: round-half-up(a / b) = (2a + b) div (2b) for
  * a >= 0, b > 0 — exact at every boundary by construction. DuckDB
  * twin: `(2*(a) + (b)) // (2*(b))` (see SparkEntry.sqlIdivHalfUp).
  *
  * Contract: numerators non-negative, denominators strictly positive.
  * Callers with signed numerators split the sign out first (half-up
  * here means "away from zero" only for the non-negative range we
  * use). Overflow headroom: 2a + b must stay under 2^63 — micro-unit
  * ratios (a = x * 1e6) are safe up to x ≈ 4.6e12, and call sites
  * that could exceed it at 100 TB reduce the denominator first (see
  * q232's even-share form) instead of widening the product.
  */
object IntMath {

  /** Integral division a div b (truncating; operands are non-negative
    * longs in every call site, where truncation == floor == DuckDB
    * `//`).
    */
  def idiv(a: Column, b: Column): Column =
    ColumnBridge.column(
      IntegralDivide(
        ColumnBridge.expression(a.cast("long")),
        ColumnBridge.expression(b.cast("long"))
      )
    )

  /** round-half-up(a / b) as pure BIGINT: (2a + b) div (2b).
    * Requires a >= 0, b > 0.
    */
  def idivHalfUp(a: Column, b: Column): Column =
    idiv(lit(2L) * a.cast("long") + b.cast("long"), lit(2L) * b.cast("long"))

  /** round-half-up(a * 1e6 / b) — the micro-ratio (ppm) convention for
    * hashed ratio columns. Requires a >= 0, b > 0, a <= ~4.6e12.
    */
  def microRatio(a: Column, b: Column): Column =
    idivHalfUp(a.cast("long") * lit(1000000L), b)

  /** Signed round-half-away-from-zero(a / b): sign(a)·halfUp(|a|, b).
    * Requires b > 0. DuckDB twin: SparkEntry.sqlIdivHalfUpSigned.
    */
  def idivHalfUpSigned(a: Column, b: Column): Column = {
    val al = a.cast("long")
    when(al < 0L, -idivHalfUp(-al, b)).otherwise(idivHalfUp(al, b))
  }

  /** FLOOR division for signed numerators (b > 0). Measured DuckDB
    * 1.0.0 behavior: integer `//` TRUNCATES toward zero exactly like
    * Catalyst's IntegralDivide ((-7)//2 = -3 on both) — but DuckDB
    * versions have differed here (newer docs describe `//` as
    * rounding down), so the convention never emits a raw signed
    * integer division in an oracle: subtract the positive modulus
    * first (pmod) and the truncating divide becomes exact floor on
    * ANY engine, whichever signed-division rule it ships.
    * (The earlier note claiming 1.0.0 floors was wrong — the
    * convention was right for the wrong reason; IntMathSpec pins
    * both conventions.)
    */
  def floorDiv(a: Column, b: Column): Column = {
    val al = a.cast("long")
    val bl = b.cast("long")
    idiv(al - pmod(al, bl), bl)
  }
}
