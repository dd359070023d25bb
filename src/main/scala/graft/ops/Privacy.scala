package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Differential-privacy mechanisms + budget accounting (Dwork & Roth
  * 2014, "The Algorithmic Foundations of Differential Privacy" —
  * calibration Thm 3.6/A.1, composition Thm 3.16 / Cor 3.21). This is
  * the accounting layer the r13 honest caveat said `q_dp_counts`
  * lacked: mechanisms are calibrated from (ε, δ, sensitivity) and a
  * ledger composes the spend across releases.
  *
  * The noise columns are SEEDED: the inverse-CDF transform of a
  * keyed-hash md5 uniform (the q_dp_counts device), so releases are
  * reproducible and value-oracle-able. A production ε-DP deployment
  * draws the uniform from a fresh CSPRNG — swap [[saltedUniform]] for
  * one and the calibration, sensitivity and accounting carry over
  * unchanged. With a fixed salt the release is deterministic: the
  * salt IS the mechanism's coin flips, so the guarantee holds against
  * adversaries who don't know it, and replaying a salt re-spends no
  * budget (same release) while a fresh salt is a NEW release that
  * must be recorded in the ledger.
  */
object Privacy {

  /** Laplace scale b = Δ1/ε for an ε-DP release of an L1-sensitivity-Δ1
    * query (Dwork & Roth Thm 3.6). Counting queries have Δ1 = 1. */
  def laplaceScale(epsilon: Double, sensitivity: Double = 1.0): Double = {
    require(epsilon > 0 && sensitivity > 0, "epsilon and sensitivity must be > 0")
    sensitivity / epsilon
  }

  /** Gaussian σ = Δ2·√(2 ln(1.25/δ))/ε for (ε, δ)-DP (Dwork & Roth
    * Thm A.1; valid for ε < 1). */
  def gaussianSigma(epsilon: Double, delta: Double, sensitivity: Double = 1.0): Double = {
    require(epsilon > 0 && epsilon < 1, "the analytic bound needs 0 < epsilon < 1")
    require(delta > 0 && delta < 1 && sensitivity > 0)
    sensitivity * math.sqrt(2.0 * math.log(1.25 / delta)) / epsilon
  }

  /** One recorded release of the budget ledger. */
  final case class Release(epsilon: Double, delta: Double = 0.0) {
    require(epsilon > 0 && delta >= 0)
  }

  /** Basic (sequential) composition: budgets add (Thm 3.16). */
  def composeBasic(releases: Seq[Release]): Release = {
    require(releases.nonEmpty)
    Release(releases.map(_.epsilon).sum, releases.map(_.delta).sum)
  }

  /** Advanced composition (Cor 3.21): k releases at ε each (bounded by
    * the max ε in the ledger) are (ε√(2k ln(1/δ′)) + kε(eᵉ−1), Σδ+δ′)-DP
    * for any δ′ > 0 — the √k regime that makes many small releases
    * affordable where basic composition charges k·ε.
    */
  def composeAdvanced(releases: Seq[Release], deltaPrime: Double): Release = {
    require(releases.nonEmpty && deltaPrime > 0)
    val eps = releases.map(_.epsilon).max
    val k = releases.size
    Release(
      eps * math.sqrt(2.0 * k * math.log(1.0 / deltaPrime))
        + k * eps * (math.exp(eps) - 1.0),
      releases.map(_.delta).sum + deltaPrime)
  }

  /** Keyed-hash uniform in (−1/2, 1/2) — the engine-portable md5
    * inverse-CDF device shared with q_dp_counts/q_stratified_sample. */
  private def saltedUniform(key: Column, salt: String): Column =
    (conv(substring(md5(concat(key.cast("string"), lit("|" + salt))), 1, 8),
      16, 10).cast("long") + lit(0.5)) / lit(4294967296.0) - lit(0.5)

  /** Laplace(b) noise keyed on `key`: −b·sgn(u)·ln(1−2|u|) with the
    * salted uniform u — exact inverse-CDF sampling. One release per
    * distinct salt; record each in the ledger. */
  def laplaceNoise(key: Column, b: Double, salt: String): Column = {
    require(b > 0)
    val u = saltedUniform(key, salt)
    -lit(b) * signum(u) * log(lit(1.0) - lit(2.0) * abs(u))
  }

  /** Inverse standard-normal CDF Φ⁻¹(u) (Moro 1995: the
    * Beasley–Springer central rational on |u−½| < 0.42 plus Moro's
    * ln-ln polynomial tail; |error| < 3e-9 over (0,1), far below the
    * 6-dp output round). Written in EXPLICIT Horner order so the
    * DuckDB oracle runs the identical IEEE operation sequence —
    * that is what lets a Gaussian release value-oracle.
    */
  def invNorm(u: Column): Column = {
    val x = u - lit(0.5)
    val r = x * x
    val central = x * (
      (((lit(-25.44106049637) * r + lit(41.39119773534)) * r
        + lit(-18.61500062529)) * r + lit(2.50662823884))
        / ((((lit(3.13082909833) * r + lit(-21.06224101826)) * r
          + lit(23.08336743743)) * r + lit(-8.47351093090)) * r + lit(1.0)))
    val rr = when(x > 0, lit(1.0) - u).otherwise(u)
    val k = log(-log(rr))
    val tail0 = ((((((((lit(0.0000003960315187) * k
      + lit(0.0000002888167364)) * k + lit(0.0000321767881768)) * k
      + lit(0.0003951896511919)) * k + lit(0.0038405729373609)) * k
      + lit(0.0276438810333863)) * k + lit(0.1607979714918209)) * k
      + lit(0.9761690190917186)) * k + lit(0.3374754822726147))
    val tail = when(x > 0, tail0).otherwise(-tail0)
    when(abs(x) < 0.42, central).otherwise(tail)
  }

  /** Gaussian N(0, σ²) noise keyed on `key` — the (ε, δ)-DP mechanism
    * (calibrate σ with [[gaussianSigma]]) via [[invNorm]] of the
    * salted uniform. Pass σ pre-rounded to 9 dp (the chain-rounding
    * device) so both engines multiply identical doubles. */
  def gaussianNoise(key: Column, sigma: Double, salt: String): Column = {
    require(sigma > 0)
    lit(sigma) * invNorm(saltedUniform(key, salt) + lit(0.5))
  }
}
