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
}
