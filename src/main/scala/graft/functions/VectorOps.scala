package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Compiled vector math for the embedding operators. The HOF formulation
  * (`aggregate(zip_with(..))`) evaluates interpreted per element — ~50M
  * boxed lambda calls for a 400k-pair × 128-dim join — so the dot product
  * runs as a tight JVM loop instead. Summation order is identical
  * (left-to-right fold), keeping results bit-compatible with the
  * DuckDB oracle's list_sum. */
object VectorOps {

  // Array[Double] signatures matter: Spark converts ArrayType(DoubleType)
  // to a primitive double[] for Array parameters (toDoubleArray), while
  // Seq[Double] boxes every element — ~100M boxings for a 400k-pair ×
  // 128-dim join.
  def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** Cosine similarity rounded to 6dp (both engines round, so op-order
    * ulps can't flip the oracle comparison). Rounding mimics Spark's
    * `round`: BigDecimal.valueOf (toString repr) + HALF_UP. */
  def cosine6(a: Array[Double], b: Array[Double]): Double = {
    val d = dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    // zero-norm vectors yield NaN; BigDecimal.valueOf(NaN) would throw and
    // kill the job over one degenerate embedding — propagate NaN instead,
    // matching what the precomputed-norm division path produces
    if (d.isNaN || d.isInfinite) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  val cosineUdf: (Column, Column) => Column = { (a, b) =>
    udf(cosine6 _).apply(a, b)
  }

  /** Plain dot product column (compiled). */
  val dotUdf: (Column, Column) => Column = { (a, b) => udf(dot _).apply(a, b) }

  /** L2 norm column (compiled) — precompute per vector BEFORE a pair join
    * so each candidate pair costs one dot product, not three. */
  val normUdf: Column => Column = { v =>
    udf((x: Array[Double]) => math.sqrt(dot(x, x))).apply(v)
  }

  // ── hyperplane LSH ──────────────────────────────────────────────────────
  // Deterministic ±1 hyperplane coefficients from the portable hash family
  // (mirrored exactly by the DuckDB oracle); memoized — at cluster scale
  // the coefficient matrix is built once per executor, not per row.
  private val lshCoefCache = new java.util.concurrent.ConcurrentHashMap[Long, Int]()

  def lshCoef(plane: Int, dim: Int): Int =
    lshCoefCache.computeIfAbsent(plane.toLong << 32 | dim, { k =>
      val p = (k >> 32).toInt; val i = (k & 0xffffffffL).toInt
      ((TextHashes.hash31(s"$p:$i") % 2) * 2 - 1).toInt
    })

  /** 8-bit bucket signature: bit j set iff dot(v, hyperplane_j) > 0. */
  def lshSig(v: Array[Double], planes: Int = 8): Int = {
    var sig = 0
    var j = 0
    while (j < planes) {
      var acc = 0.0
      var i = 0
      while (i < v.length) { acc += v(i) * lshCoef(j, i); i += 1 }
      if (acc > 0) sig |= 1 << j
      j += 1
    }
    sig
  }

  val lshSigUdf8: Column => Column = { v =>
    udf((x: Array[Double]) => lshSig(x, 8)).apply(v)
  }
}
