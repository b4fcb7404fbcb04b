package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Statistical aggregate helpers with cross-engine deterministic semantics.
  *
  * Two classes of aggregate:
  *
  *  1. '''Exact''': money-like doubles are cast per-row to DECIMAL and summed
  *     exactly, so the result is identical regardless of partitioning,
  *     accumulation order, or engine (Spark vs the DuckDB oracle). Per-row
  *     double arithmetic (products, differences) is IEEE-deterministic, and
  *     double→decimal rounding is unambiguous because decimal midpoints at
  *     scale ≥ 1 are never exactly representable as binary doubles.
  *  2. '''Floating''': variance-family aggregates accumulate in double and
  *     carry O(n·ε) ordering noise; callers round those to 6 decimals, which
  *     dwarfs the noise (~1e-12 relative) at any realistic group size.
  *
  * The bias-corrected moments reproduce pandas `Series.skew()`/`.kurtosis()`
  * — the estimators the reference uses for window features
  * (`/root/reference/src/data/preprocessing.py:117-120`) — and equal DuckDB's
  * `skewness`/`kurtosis` (verified to ~1e-12 on the test tables). Spark's
  * built-ins are the population estimators g1/g2; the closed-form correction
  * below lifts them to G1/G2 without a custom single-pass UDAF, staying
  * entirely inside whole-stage codegen.
  */
object Stats {

  /** Exact distributed sum of a money-like double: per-row DECIMAL(28,scale)
    * cast, exact decimal sum, final cast to double. Partition-order
    * independent — safe at any scale.
    *
    * Pick `scale` ≥ the true decimal precision of the measure (e.g. 6 for a
    * product of three 2-decimal values) so the per-row cast is exact
    * recovery of the underlying decimal, never a rounding decision: at a
    * rounding tie Spark (shortest-decimal-repr HALF_UP) and DuckDB (binary
    * value) can disagree by one ulp of the scale.
    */
  def dsum(c: Column, scale: Int): Column =
    sum(c.cast(s"decimal(28,$scale)")).cast("double")

  /** Exact mean: exact decimal sum divided by count (one deterministic double
    * division) — unlike avg(), independent of accumulation order.
    */
  def davg(c: Column, scale: Int): Column =
    dsum(c, scale) / count(c)

  /** Sample standard deviation, rounded so accumulation-order noise cannot
    * flip the value; null (not NaN) for groups of size < 2 in both engines.
    */
  def stdRounded(c: Column): Column =
    when(count(c) > 1, round(stddev_samp(c), 6))

  /** Population standard deviation (ddof=0), rounded; 0.0 for singleton
    * groups like numpy, null only when the group is empty. The reference's
    * temporal-delta stats are numpy `ndarray.std()` — population, unlike
    * the pandas `Series.std()` (sample) used for the raw values
    * (`/root/reference/src/data/preprocessing.py:111,125,130`).
    */
  def stdPopRounded(c: Column): Column =
    when(count(c) > 0, round(stddev_pop(c), 6))

  /** Bias-corrected sample skewness G1 = g1 * sqrt(n(n-1))/(n-2)
    * (pandas `skew`, DuckDB `skewness`). Null for n < 3.
    */
  def skewSample(c: Column): Column = {
    val n = count(c).cast("double")
    when(n > 2, skewness(c) * sqrt(n * (n - lit(1.0))) / (n - lit(2.0)))
  }

  /** Bias-corrected sample excess kurtosis
    * G2 = ((n+1)·g2 + 6)·(n-1)/((n-2)(n-3)) (pandas `kurtosis`, DuckDB
    * `kurtosis`). Null for n < 4.
    */
  def kurtSample(c: Column): Column = {
    val n = count(c).cast("double")
    when(n > 3,
      ((n + lit(1.0)) * kurtosis(c) + lit(6.0)) * (n - lit(1.0)) /
        ((n - lit(2.0)) * (n - lit(3.0))))
  }

  /** Portable log-gamma for z > 0 — the Numerical Recipes `gammln`
    * Lanczos form (g=5, 6 coefficients), spelled out as a FIXED
    * expression tree of +, *, / and ln only, so Spark and any ANSI
    * engine replaying the same text produce bit-identical doubles
    * (built-in `lgamma`s differ per engine and are NOT portable).
    * Absolute error ≲ 2e-10 in ln-space — invisible at the 6-decimal
    * rounding every consumer applies. The factorial/binomial workhorse
    * behind exact-test p-values: ln n! = lnGamma(n+1).
    */
  def lnGamma(z: Column): Column = {
    val tmp = z + lit(5.5) - (z + lit(0.5)) * log(z + lit(5.5))
    val ser = lit(1.000000000190015) +
      lit(76.18009172947146) / (z + lit(1.0)) +
      lit(-86.50532032941677) / (z + lit(2.0)) +
      lit(24.01409824083091) / (z + lit(3.0)) +
      lit(-1.231739572450155) / (z + lit(4.0)) +
      lit(1.208650973866179e-3) / (z + lit(5.0)) +
      lit(-5.395239384953e-6) / (z + lit(6.0))
    -tmp + log(lit(2.5066282746310005) * ser / z)
  }

  /** ln(n!) via [[lnGamma]]. */
  def lnFact(n: Column): Column = lnGamma(n + lit(1.0))

  /** Standard normal pdf φ(x) — a fixed exp/÷ expression both engines
    * replay bit-for-bit (√(2π) as one shared literal).
    */
  def normPdf(x: Column): Column =
    exp(lit(-0.5) * x * x) / lit(2.5066282746310002)

  /** Standard normal CDF via the Zelen–Severo rational tail
    * (Abramowitz & Stegun 26.2.17): Φ(x) = 1 − φ(x)·Σbᵢkⁱ with
    * k = 1/(1 + 0.2316419·|x|), reflected for x < 0. |ε| < 7.5e-8 —
    * invisible at the 6-decimal rounding consumers apply — and, like
    * [[lnGamma]], a fixed +,*,/ tree, so it is engine-PORTABLE where
    * built-in erf/normal CDFs are not. The probit / z-test workhorse.
    */
  def normCdf(x: Column): Column = {
    val ax = abs(x)
    val k = lit(1.0) / (lit(1.0) + lit(0.2316419) * ax)
    val poly = lit(0.319381530) * k +
      lit(-0.356563782) * k * k +
      lit(1.781477937) * k * k * k +
      lit(-1.821255978) * k * k * k * k +
      lit(1.330274429) * k * k * k * k * k
    val upper = lit(1.0) - normPdf(ax) * poly
    when(x >= 0.0, upper).otherwise(lit(1.0) - upper)
  }

  /** ln C(n, k) via three [[lnFact]]s — valid for 0 ≤ k ≤ n. */
  def lnChoose(n: Column, k: Column): Column =
    lnFact(n) - lnFact(k) - lnFact(n - k)

  /** Null-skipping horizontal (row-wise) mean over a set of columns —
    * reference computes `mean(axis=1)` over measurement pairs
    * (`/root/reference/src/data/loader.py:252-254`). Null when every input
    * is null.
    */
  def rowMean(cols: Column*): Column = {
    val total = cols.map(c => coalesce(c, lit(0.0))).reduce(_ + _)
    val n = cols.map(c => when(c.isNotNull, 1).otherwise(0)).reduce(_ + _)
    when(n > 0, total / n)
  }
}
