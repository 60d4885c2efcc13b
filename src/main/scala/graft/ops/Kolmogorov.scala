package graft.ops

/** Exact finite-sample Kolmogorov distribution.
  *
  * `cdf(n, d)` = P(D_n < d) for the one-sample two-sided KS statistic at
  * sample size n, via the Durbin matrix power method as published in
  * Marsaglia, Tsang & Wang, "Evaluating Kolmogorov's Distribution"
  * (Journal of Statistical Software 8(18), 2003) — the same distribution
  * scipy's `kstwo` exposes; the reference's p-value upgrade path
  * (`constraints/stats.py:38-54`) calls `kstwo.sf(d, round(nm/(n+m)))`.
  *
  * The Durbin matrix is (2k-1)×(2k-1) with k = ⌈n·d⌉; for n·d beyond
  * `maxMatrixHalfWidth` the matrix power becomes expensive and the
  * asymptotic Kolmogorov series with Stephens' finite-n correction is used
  * instead (error < 1e-4 in that regime — far below any decision threshold
  * this p-value feeds).
  */
object Kolmogorov {

  private val maxMatrixHalfWidth = 500

  /** Survival function: P(D_n >= d). */
  def sf(n: Long, d: Double): Double = math.max(0.0, math.min(1.0, 1.0 - cdf(n, d)))

  /** P(D_n < d), exact (MTW) for moderate n·d, asymptotic beyond. */
  def cdf(n: Long, d: Double): Double = {
    if (d <= 0.0) return 0.0
    if (d >= 1.0) return 1.0
    val nd = n * d
    if (nd * d > 18.37) return 1.0 // right tail: 1 - cdf < 1e-16 (MTW §3)
    val k = math.ceil(nd).toInt
    // beyond 1e6 samples the corrected asymptotic agrees with the exact
    // distribution to ~1e-7 and the Durbin path would overflow Int / burn
    // O(n) in the factorial fold
    if (k > maxMatrixHalfWidth || n > 1000000L) return asymptoticCdf(n, d)
    durbinCdf(n.toInt, d, k)
  }

  /** MTW exact algorithm: cdf = n!/n^n · (H^n)[k-1][k-1], H the Durbin
    * matrix, with base-1e140 scaling against over/underflow.
    */
  private def durbinCdf(n: Int, d: Double, k: Int): Double = {
    val m = 2 * k - 1
    val h = k - n * d

    val big  = 1e140
    val tiny = 1e-140

    // Durbin matrix
    val H = Array.ofDim[Double](m, m)
    for (i <- 0 until m; j <- 0 until m)
      H(i)(j) = if (i - j + 1 < 0) 0.0 else 1.0
    var hPow = h
    for (i <- 0 until m) {
      H(i)(0) -= hPow
      H(m - 1)(m - 1 - i) -= hPow
      hPow *= h
    }
    // (2h-1)^m correction of the corner when h > 1/2
    H(m - 1)(0) += (if (2 * h - 1 > 0) math.pow(2 * h - 1, m) else 0.0)
    for (i <- 0 until m; j <- 0 until m if i - j + 1 > 0) {
      var f = 1.0
      for (g <- 1 to i - j + 1) f *= g
      H(i)(j) /= f
    }

    // H^n by repeated squaring with exponent tracking
    def matMul(a: Array[Array[Double]], b: Array[Array[Double]]): Array[Array[Double]] = {
      val c = Array.ofDim[Double](m, m)
      var i = 0
      while (i < m) {
        var j = 0
        while (j < m) {
          var s = 0.0
          var l = 0
          while (l < m) { s += a(i)(l) * b(l)(j); l += 1 }
          c(i)(j) = s
          j += 1
        }
        i += 1
      }
      c
    }

    var result   = H
    var eQ       = 0
    var power    = n
    var base     = H
    var eBase    = 0
    var started  = false
    while (power > 0) {
      if ((power & 1) == 1) {
        result = if (!started) base else matMul(result, base)
        eQ += eBase
        started = true
        if (result(k - 1)(k - 1) > big) {
          for (i <- 0 until m; j <- 0 until m) result(i)(j) *= tiny
          eQ += 140
        }
      }
      power >>= 1
      if (power > 0) {
        base = matMul(base, base)
        eBase *= 2
        if (base(k - 1)(k - 1) > big) {
          for (i <- 0 until m; j <- 0 until m) base(i)(j) *= tiny
          eBase += 140
        }
      }
    }

    // s = H^n[k-1][k-1] · n!/n^n, folding the factorial in stepwise to stay
    // in range (MTW's eH bookkeeping)
    var s = result(k - 1)(k - 1)
    for (i <- 1 to n) {
      s = s * i / n
      if (s < tiny) { s *= big; eQ -= 140 }
    }
    val v = s * math.pow(10.0, eQ)
    math.max(0.0, math.min(1.0, v))
  }

  /** Kolmogorov limiting distribution with Stephens' (1970) finite-n
    * correction: K(d·(√n + 0.12 + 0.11/√n)), K(x) = 1 − 2Σ(−1)^{j−1}e^{−2j²x²}.
    */
  private def asymptoticCdf(n: Long, d: Double): Double = {
    val sqrtN = math.sqrt(n.toDouble)
    val x     = d * (sqrtN + 0.12 + 0.11 / sqrtN)
    var sum   = 0.0
    var j     = 1
    var term  = Double.MaxValue
    while (j <= 100 && math.abs(term) > 1e-18) {
      term = (if (j % 2 == 1) 1.0 else -1.0) * math.exp(-2.0 * j * j * x * x)
      sum += term
      j += 1
    }
    math.max(0.0, math.min(1.0, 1.0 - 2.0 * sum))
  }
}
