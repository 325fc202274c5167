package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CUPED — Controlled-experiment Using Pre-Experiment Data (Deng, Xu,
  * Kohavi & Walker, WSDM 2013): reduce the variance of an A/B metric by
  * regressing out each unit's pre-experiment covariate,
  * `y_adj = y − θ·(x − x̄)` with `θ = cov(x, y) / var(x)` estimated on
  * the pooled population (assignment is independent of x, so pooling is
  * unbiased). Variance shrinks by the factor `1 − ρ²`.
  *
  * Factored over a DataFrame parameter because it is measurably VACUOUS
  * on the driver corpus (the [[Funnel]] dormant-branch discipline):
  * per-user pre/post-period value sums correlate at ρ ≈ 0.07 (measured
  * round 7, re-asserted by CupedSpec's corpus probe), so the attainable
  * variance reduction is ρ² ≈ 0.5% — no oracled query could bind.
  * CupedSpec proves the reduction on a synthetic correlated fixture
  * where it genuinely does (ρ ≈ 0.9 → ~80% variance off), and proves
  * partition-order invariance of every output bit.
  *
  * Cross-engine/partition-exact by the q123 integer-moments discipline
  * (invariant 7): covariate and metric quantize as floor(v·10⁶) longs;
  * the whole moment matrix (n, Σx, Σy, Σx², Σxy, Σy²) accumulates in
  * decimal(38) (a long Σx² wraps — ANSI throws — near 2×10⁶-scaled
  * values at ~10⁴ rows, and a long Σx at ~10¹⁰ rows; decimal sums are
  * exact); θ, means, variances are fixed double expressions over
  * identical integers. θ and the variances null out (never divide by
  * zero) when var(x) = 0 or n = 1.
  *
  * Scale shape: ONE scan → one hash agg keyed by arm with conditional
  * partials (map-side combine) + one broadcast 1-row pooled total —
  * 2-row output, no shuffle beyond the aggregate. The 100 TB plan is
  * the same plan.
  */
object Cuped {

  /** Per-arm CUPED readout over `(arm, pre, post)` rows (any unit
    * grain; `arm` ∈ {0, 1} but any small key set works). Returns one
    * row per arm: raw and adjusted mean/variance plus the achieved
    * `var_reduction` (= 1 − var_adj/var_post, ≈ ρ² when arms are
    * balanced).
    */
  def readout(units: DataFrame): DataFrame = {
    val q = units.select(col("arm"),
      floor(col("pre") * 1e6).cast("long").as("x"),
      floor(col("post") * 1e6).cast("long").as("y"))
    // FIRST moments sum through decimal(38) too: a long Σx wraps (ANSI
    // throws) once |x| ~ 2×10⁶-scaled values meet ~10¹⁰+ rows — the
    // same overflow budget that forced decimal second moments, just a
    // later horizon. decimal sums of longs are exact and the one
    // CAST-to-DOUBLE downstream is unchanged, so outputs are
    // bit-identical on any corpus the long path survived.
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val perArm = q.groupBy(col("arm")).agg(
      count(lit(1)).as("n"), sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
      sum(dec(col("x") * col("x"))).as("sxx"),
      sum(dec(col("x") * col("y"))).as("sxy"),
      sum(dec(col("y") * col("y"))).as("syy"))
    val pooled = broadcast(q.agg(
      count(lit(1)).as("np"), sum(dec(col("x"))).as("sxp"), sum(dec(col("y"))).as("syp"),
      sum(dec(col("x") * col("x"))).as("sxxp"),
      sum(dec(col("x") * col("y"))).as("sxyp")))
    perArm.crossJoin(pooled)
      // pooled θ and x̄ (de-quantized once; association fixed).
      // var(x) = 0 (constant covariate) nulls θ and every adjusted
      // column instead of dividing by zero — CUPED is undefined there
      // (deployments fall back to the raw readout; the raw columns in
      // this row remain valid).
      .withColumn("theta",
        expr("(CAST(sxyp AS DOUBLE) / np - (CAST(sxp AS DOUBLE) / np) * (CAST(syp AS DOUBLE) / np))" +
          " / nullif(CAST(sxxp AS DOUBLE) / np - (CAST(sxp AS DOUBLE) / np) * (CAST(sxp AS DOUBLE) / np), 0.0)"))
      .withColumn("xbar_pool", expr("CAST(sxp AS DOUBLE) / np / 1e6"))
      .withColumn("mean_pre", expr("CAST(sx AS DOUBLE) / n / 1e6"))
      .withColumn("mean_post", expr("CAST(sy AS DOUBLE) / n / 1e6"))
      // population moments per arm (de-quantized), Bessel-corrected;
      // n = 1 nulls the variances (Bessel undefined) rather than
      // dividing by zero
      .withColumn("var_post",
        expr("(CAST(syy AS DOUBLE) / n - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)) * n / nullif(n - 1, 0) / 1e12"))
      .withColumn("var_pre",
        expr("(CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)) * n / nullif(n - 1, 0) / 1e12"))
      .withColumn("cov_xy",
        expr("(CAST(sxy AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)) * n / nullif(n - 1, 0) / 1e12"))
      // y_adj = y − θ(x − x̄_pool): mean shifts by −θ(x̄_arm − x̄_pool),
      // variance by −2θcov + θ²var_x (exact algebra, no re-scan)
      .withColumn("mean_adj",
        col("mean_post") - col("theta") * (col("mean_pre") - col("xbar_pool")))
      .withColumn("var_adj",
        col("var_post") - lit(2.0) * col("theta") * col("cov_xy")
          + col("theta") * col("theta") * col("var_pre"))
      .withColumn("var_reduction", lit(1.0) - col("var_adj") / col("var_post"))
      .select(col("arm"), col("n"), col("theta"), col("mean_pre"), col("mean_post"),
        col("mean_adj"), col("var_post"), col("var_adj"), col("var_reduction"))
      .orderBy(col("arm"))
  }

  /** Two-arm z statistics from a [[readout]] frame: the raw and the
    * CUPED-adjusted two-sample z for arm1 − arm0 (1 row). The adjusted
    * z is the one an experimentation platform reports; raw rides along
    * so the sensitivity gain is visible in the same row.
    */
  def zstat(r: DataFrame): DataFrame = {
    def pick(c: String, a: Int) = max(when(col("arm") === a, col(c))).as(s"${c}_$a")
    r.agg(pick("mean_post", 0), pick("mean_post", 1), pick("mean_adj", 0),
        pick("mean_adj", 1), pick("var_post", 0), pick("var_post", 1),
        pick("var_adj", 0), pick("var_adj", 1), pick("n", 0), pick("n", 1))
      .select(
        (col("mean_post_1") - col("mean_post_0")).as("diff_raw"),
        (col("mean_adj_1") - col("mean_adj_0")).as("diff_adj"),
        ((col("mean_post_1") - col("mean_post_0"))
          / sqrt(col("var_post_0") / col("n_0") + col("var_post_1") / col("n_1"))).as("z_raw"),
        ((col("mean_adj_1") - col("mean_adj_0"))
          / sqrt(col("var_adj_0") / col("n_0") + col("var_adj_1") / col("n_1"))).as("z_adj"))
  }

  /** Pearson correlation of (pre, post) — the vacuity probe (a CUPED
    * deployment decision starts here: reduction ≈ ρ²). Same integer
    * moments; 1 double row out.
    */
  def preCorrelation(units: DataFrame): DataFrame = {
    val q = units.select(
      floor(col("pre") * 1e6).cast("long").as("x"),
      floor(col("post") * 1e6).cast("long").as("y"))
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    q.agg(count(lit(1)).as("n"), sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x") * col("x"))).as("sxx"),
        sum(dec(col("x") * col("y"))).as("sxy"),
        sum(dec(col("y") * col("y"))).as("syy"))
      .select(expr(
        "(CAST(sxy AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))" +
          " / sqrt(CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))" +
          " / sqrt(CAST(syy AS DOUBLE) / n - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))")
        .as("rho"))
  }
}
