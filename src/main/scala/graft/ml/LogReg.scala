package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Newton–Raphson logistic regression (one feature + intercept) as a
  * reusable in-engine trainer, shared by the `ml_logreg_newton` entry
  * and the calibration diagnostics built on top of it.
  *
  * Scale shape: each Newton step aggregates SIX exact sufficient
  * statistics (map-side combined — six numbers per partition); the
  * 2×2 solve is closed-form Cramer on the single aggregate row. The
  * per-row sigmoid is rounded to 6 and frozen as DECIMAL(8,6), so
  * every sum is exact decimal and the fitted coefficients are
  * bit-identical on any partitioning/engine.
  */
object LogReg {

  /** σ(b0 + b1·x) as a round-6 DECIMAL(8,6) column; `x` must be an
    * exact DECIMAL column. */
  def sigmoid(b0: java.math.BigDecimal, b1: java.math.BigDecimal,
              x: Column): Column = {
    val tlin = lit(b0).cast(DecimalType(18, 6)) +
      lit(b1).cast(DecimalType(18, 6)) * x
    round(lit(1.0) / (lit(1.0) + exp(negate(tlin.cast("double")))), 6)
      .cast(DecimalType(8, 6))
  }

  /** Fit by `iters` Newton steps from β = 0. `d` needs `y` ∈ {0,1}
    * (long) and `x` exact DECIMAL(9,6). Returns (b0, b1) at scale 6. */
  def fit(d: DataFrame, iters: Int)
      : (java.math.BigDecimal, java.math.BigDecimal) = {
    def r6(v: Double) = new java.math.BigDecimal(v)
      .setScale(6, java.math.RoundingMode.HALF_UP)
    var b0 = java.math.BigDecimal.ZERO.setScale(6)
    var b1 = java.math.BigDecimal.ZERO.setScale(6)
    (1 to iters).foreach { _ =>
      val p = sigmoid(b0, b1, col("x"))
      val w = p * (lit(1).cast(DecimalType(8, 6)) - p)
      val r = d.select(col("y"), col("x"), p.as("p"), w.as("w"))
        .agg(
          sum(col("w")).as("sw"),
          sum(col("w") * col("x")).as("swx"),
          sum(col("w") * col("x") * col("x")).as("swxx"),
          sum(col("y").cast(DecimalType(8, 6)) - col("p")).as("g0"),
          sum(col("x") * (col("y").cast(DecimalType(8, 6)) - col("p")))
            .as("g1"))
        .select(col("sw").cast("double"), col("swx").cast("double"),
          col("swxx").cast("double"), col("g0").cast("double"),
          col("g1").cast("double"))
        .head()
      val (sw, swx, swxx, g0, g1) = (r.getDouble(0), r.getDouble(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val det = sw * swxx - swx * swx
      val nb0 = r6(b0.doubleValue() + (swxx * g0 - swx * g1) / det)
      val nb1 = r6(b1.doubleValue() + (sw * g1 - swx * g0) / det)
      b0 = nb0; b1 = nb1
    }
    (b0, b1)
  }

  /** DuckDB CTE chain replaying `iters` Newton steps from a CTE `d`
    * with columns (y, x); the final coefficients land in CTE `bb`
    * as (b0, b1) DECIMAL(18,6). Mirrors [[fit]] exactly. */
  def sqlSteps(iters: Int): String = {
    def step(bp: String, bn: String) =
      s"""${bn}_p AS (SELECT d.y, d.x,
         |    CAST(round(1.0 / (1.0 + exp(-CAST(CAST($bp.b0 + $bp.b1 * d.x
         |      AS VARCHAR) AS DOUBLE))), 6) AS DECIMAL(8,6)) AS p
         |  FROM d CROSS JOIN $bp),
         |${bn}_m AS (SELECT
         |    CAST(CAST(SUM(p * (CAST(1 AS DECIMAL(8,6)) - p)) AS VARCHAR)
         |      AS DOUBLE) AS sw,
         |    CAST(CAST(SUM(p * (CAST(1 AS DECIMAL(8,6)) - p) * x)
         |      AS VARCHAR) AS DOUBLE) AS swx,
         |    CAST(CAST(SUM(p * (CAST(1 AS DECIMAL(8,6)) - p) * x * x)
         |      AS VARCHAR) AS DOUBLE) AS swxx,
         |    CAST(CAST(SUM(CAST(y AS DECIMAL(8,6)) - p) AS VARCHAR)
         |      AS DOUBLE) AS g0,
         |    CAST(CAST(SUM(x * (CAST(y AS DECIMAL(8,6)) - p)) AS VARCHAR)
         |      AS DOUBLE) AS g1
         |  FROM ${bn}_p),
         |$bn AS (SELECT
         |    CAST(round(CAST(CAST(b.b0 AS VARCHAR) AS DOUBLE)
         |      + (m.swxx * m.g0 - m.swx * m.g1)
         |        / (m.sw * m.swxx - m.swx * m.swx), 6) AS DECIMAL(18,6))
         |      AS b0,
         |    CAST(round(CAST(CAST(b.b1 AS VARCHAR) AS DOUBLE)
         |      + (m.sw * m.g1 - m.swx * m.g0)
         |        / (m.sw * m.swxx - m.swx * m.swx), 6) AS DECIMAL(18,6))
         |      AS b1
         |  FROM ${bn}_m m CROSS JOIN $bp b)""".stripMargin
    require(iters == 2, "sqlSteps currently unrolls exactly 2 steps")
    s"""bz AS (SELECT CAST(0 AS DECIMAL(18,6)) AS b0,
       |              CAST(0 AS DECIMAL(18,6)) AS b1),
       |${step("bz", "ba")},
       |${step("ba", "bb")}""".stripMargin
  }
}
