package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact integer-lattice power iteration for the corpus' TOP PRINCIPAL
  * COMPONENT over an `array<float>` embedding column (SURVEY.md §2.4
  * d83) — the spectral step of embedding hygiene (dominant-direction
  * outliers, anisotropy checks, "all-but-the-top" debiasing) made
  * bit-exact across engines the same way KMeans made Lloyd exact:
  * every iterate lives on an integer lattice, so the whole run is
  * DuckDB-hash-checkable, unlike float power iteration whose matvec
  * depends on FP summation order.
  *
  *   1. quantize onto KMeans' 2^-20 lattice (shared discipline), then
  *      CENTER exactly: μ_j = (2·S_j + n) div (2·n) (round-half-up —
  *      the KMeans centroid rounding), c_ij = q_ij − μ_j. Centering by
  *      the ROUNDED mean keeps |c| ≤ 2^21 independent of n (an
  *      n-scaled centering would overflow at corpus scale).
  *   2. iterate v ← (CᵀC)v in integers: d_i = c_i·v (≤ 64·2^41, BIGINT)
  *      then w_j = Σ_i c_ij·d_i (DECIMAL(38,0)/HUGEINT — ≤ n·2^62).
  *   3. renormalize to the lattice by L∞, exactly and floor-consistent
  *      on NEGATIVES in both engines: v'_j = floor(2^20·w_j / M) is
  *      computed as (2^20·w_j + 2^21·M) div M − 2^21 — the shift makes
  *      the dividend non-negative, where trunc-div (Spark, BigInt)
  *      and floor-div (DuckDB) agree. M = max_j |w_j|.
  *
  * Power iteration converges to the top eigenvector of the covariance
  * (rate λ2/λ1) under any per-round rescaling; the lattice perturbation
  * per round is ≤ one cell, the KMeans argument.
  *
  * Scale shape: each round is TWO passes over the data — a map-side
  * dot against a 64-long literal (no exchange) and one (pos)-keyed
  * 64-cell partial aggregate; the driver holds dim longs per round
  * (the KMeans k·dim discipline). Vectors never shuffle.
  *
  * Reference scope: the reference engine has no linear algebra; this
  * extends the d78 hygiene family with the spectral check large
  * embedding-table pipelines run before ANN indexing.
  */
object PowerIteration {

  private val Scale = 1L << 20

  /** Exact floor division for BigInt (BigInt./ truncates toward zero). */
  private def fdiv(a: BigInt, b: BigInt): BigInt = {
    val q = a / b
    if (a % b != 0 && a.signum * b.signum < 0) q - 1 else q
  }

  /** The centered lattice table (vec_id, c: array<long>) plus the
    * rounded lattice mean it was centered on. */
  private def centered(embs: DataFrame): DataFrame = {
    import embs.sparkSession.implicits._
    val q = embs.select($"vec_id", KMeans.quantize($"embedding").as("q"))
    val mu = q.select(posexplode($"q").as(Seq("pos", "qv")))
      .groupBy($"pos")
      .agg(expr("(2*sum(qv) + count(1)) div (2*count(1))").as("mu"))
      .orderBy($"pos")
      .collect().map(_.getLong(1))
    q.select($"vec_id",
      zip_with($"q", typedLit(mu.toSeq), (a, b) => a - b).as("c"))
  }

  /** `iters` lattice power-iteration rounds from the constant seed
    * v0 = (2^20, …); returns (final direction, projections): the
    * direction as dim lattice longs and a (vec_id, proj) DataFrame,
    * proj_i = c_i · v. */
  def topComponent(spark: SparkSession, embs: DataFrame,
                   iters: Int): (Array[Long], DataFrame) = {
    import spark.implicits._
    require(iters >= 1, s"iters=$iters: need >= 1")
    val c = centered(embs).persist()
    val dim = c.select(size($"c")).head().getInt(0)
    var v = Array.fill(dim)(Scale)
    for (_ <- 1 to iters) {
      val vlit = typedLit(v.toSeq)
      // d_i = c_i · v: map-side fold, no exchange
      val d = c.select($"vec_id", $"c",
        aggregate(zip_with($"c", vlit, (a, b) => a * b), lit(0L), _ + _).as("d"))
      // w_j = Σ_i c_ij · d_i: ONE (pos)-keyed dim-cell aggregate
      val w = d.select(posexplode($"c").as(Seq("pos", "cv")), $"d")
        .groupBy($"pos")
        .agg(sum($"cv".cast(DecimalType(38, 0)) * $"d").as("w"))
        .orderBy($"pos")
        .collect().map(r => BigInt(r.getDecimal(1).toBigInteger))
      val m = w.map(_.abs).max.max(BigInt(1))
      v = w.map(wj => fdiv(Scale * wj, m).toLong)
    }
    val vlit = typedLit(v.toSeq)
    val proj = c.select($"vec_id",
      aggregate(zip_with($"c", vlit, (a, b) => a * b), lit(0L), _ + _).as("proj"))
    // c stays pinned for the caller's consumption of `proj` (the
    // harness clears caches per query); dropping it here would force a
    // full recompute of the centering pass
    (v, proj)
  }
}
