package graft.analytics

/** Holt–Winters ADDITIVE triple exponential smoothing (Winters 1960; the
  * statsmodels `ExponentialSmoothing(trend='add', seasonal='add')`
  * capability) — level + trend + m-period seasonal state:
  *
  *   l_t = α(y_t − s_{t−m}) + (1−α)(l_{t−1} + b_{t−1})
  *   b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}
  *   s_t = γ(y_t − l_t)     + (1−γ)s_{t−m}
  *
  * Classical initialization over the first two seasons: l_m = mean of
  * season 1, b_m = (mean₂ − mean₁)/m, s_i = y_i − l_m. The recurrence
  * runs from t = m+1; `fitted` is the PRE-update one-step-ahead forecast
  * l_{t−1} + b_{t−1} + s_{t−m}.
  *
  * Distribution contract: this kernel is SEQUENTIAL per key and is
  * applied only to CALENDAR-BOUNDED series (daily aggregates — ≤ a few
  * hundred rows per key regardless of input SF), exactly like the
  * q_mm_* per-group kernels. An unbounded-key deployment lifts the same
  * recurrence to (m+2)-dimensional affine maps and runs the
  * [[graft.plans.HoltScan]] Blelloch scan — the seasonal state rides
  * along as m extra rows of the map; this bounded form keeps the oracle
  * replayable as a recursive CTE carrying the m seasonal columns
  * positionally.
  *
  * Determinism: the two init means are exact decimal sums (values are
  * exact 2-decimal selected closes) cast to double; every recurrence
  * step is plain IEEE ×/+/− on identical operands in the SAME WRITTEN
  * ORDER as the oracle SQL — bit-exact across engines.
  */
object HoltWinters {

  final case class Step(t: Int, level: Double, trend: Double,
    season: Double, fitted: Double)

  /** Fit over `ys` (time-ordered); emits one [[Step]] per t in
    * [m+1, ys.length], 1-indexed to match the oracle's row_number.
    * Returns empty for series shorter than 2m+1 (need two full seasons
    * to initialize plus at least one step).
    */
  def fit(ys: IndexedSeq[Double], m: Int, alpha: Double, beta: Double,
      gamma: Double): Seq[Step] = {
    require(m >= 1, s"season length must be positive: $m")
    if (ys.length < 2 * m + 1) return Seq.empty
    // exact decimal means of the first two seasons (values are exact
    // low-scale decimals; mirrors the SQL DECIMAL(28,6) sum + one cast)
    def mean(lo: Int): Double = {
      var acc = java.math.BigDecimal.ZERO
      var i = lo
      while (i < lo + m) {
        acc = acc.add(new java.math.BigDecimal(
          java.lang.Double.toString(ys(i))).setScale(6,
          java.math.RoundingMode.HALF_UP))
        i += 1
      }
      acc.doubleValue() / m.toDouble
    }
    val m1 = mean(0)
    val m2 = mean(m)
    var l = m1
    var b = (m2 - m1) / m.toDouble
    // seasonal ring, s(i mod m); s_i = y_i − l_m for the first season
    val s = Array.tabulate(m)(i => ys(i) - m1)
    val out = Vector.newBuilder[Step]
    var t = m // 0-indexed position of y_{t+1}
    while (t < ys.length) {
      val y = ys(t)
      val sOld = s(t % m)
      val fitted = l + b + sOld
      val l1 = alpha * (y - sOld) + (1.0 - alpha) * (l + b)
      val b1 = beta * (l1 - l) + (1.0 - beta) * b
      val s1 = gamma * (y - l1) + (1.0 - gamma) * sOld
      s(t % m) = s1
      l = l1
      b = b1
      out += Step(t + 1, l1, b1, s1, fitted)
      t += 1
    }
    out.result()
  }
}
