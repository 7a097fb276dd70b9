package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Merge-safe second-moment accumulator for [[Opq]]: sums the upper triangle
  * of Σ x·xᵀ plus a row count in one fixed-size buffer
  * (`[n, m00, m01 … m_{d-1,d-1}]`, d·(d+1)/2 + 1 doubles ≈ 16 KiB at d = 64).
  * Commutative + associative elementwise adds, so map-side combine applies
  * and a 100 TB corpus reduces to ONE buffer per partition before any
  * shuffle — the same fan-in shape as the sketch aggregators.
  */
final class SecondMoment(dim: Int)
    extends Aggregator[Array[Float], Array[Double], Array[Double]] with Serializable {

  def zero: Array[Double] = new Array[Double](dim * (dim + 1) / 2 + 1)

  def reduce(b: Array[Double], x: Array[Float]): Array[Double] = {
    require(x != null && x.length >= dim,
      s"embedding must have >= $dim dims, got ${if (x == null) "null" else x.length}")
    b(0) += 1d
    var p = 1
    var i = 0
    while (i < dim) {
      val xi = x(i).toDouble
      var j = i
      while (j < dim) { b(p) += xi * x(j).toDouble; p += 1; j += 1 }
      i += 1
    }
    b
  }

  def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  def finish(b: Array[Double]): Array[Double] = b

  def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}

/** OPQ-style rotation for product quantization — the non-parametric
  * eigenvalue-allocation variant of Ge et al., "Optimized Product
  * Quantization" (CVPR 2013): rotate the corpus by the PCA eigenbasis of its
  * (uncentered) second-moment matrix, with the principal directions dealt
  * across the [[Embeddings.PqM]] subspaces so each subspace carries a
  * BALANCED share of the variance (greedy min-Σlog λ allocation). Plain PQ
  * cuts the vector at fixed coordinate boundaries, so one energy-heavy
  * subspace eats the codebook's capacity while the flat ones waste theirs —
  * the dominant avoidable quantization loss on anisotropic embeddings.
  *
  * The rotation is ORTHOGONAL (no centering, no eigenvalue scaling), so every
  * dot product — and therefore every cosine and every exact-KNN ranking — is
  * preserved exactly in real arithmetic; only the coordinate system PQ cuts
  * along changes. That makes it a free pre-step for the whole serving stack:
  * train R once, store rotated vectors (or fold R into the encoder), and
  * every downstream operator is unchanged.
  *
  * Scale shape: moment collection is ONE [[SecondMoment]] aggregation
  * (fixed 16 KiB state, map-side combined); the 64×64 eigenproblem is
  * driver-side (cyclic Jacobi, microseconds — the classic "small dense
  * algebra on the driver, data-parallel everywhere else" split, same as the
  * IVF centroid refinement); applying R is a narrow per-row projection of
  * 64 codegen'd [[graft.functions.DotProductExpression]] literals — no
  * shuffle, no broadcast join, composes with any scan.
  *
  * Float rounding note: R is applied in float32, so preserved dots drift at
  * ~1e-6 relative — irrelevant next to PQ's quantization error, but rotated
  * outputs feed production serving and the recall LADDER, never the
  * hash-checked oracle queries (the [[Embeddings.kmeansRefine]] rule).
  *
  * Measured on the harness corpus (sf0.001, top-10, vs exact KNN): the
  * rotation + balanced allocation extends the PQ training ladder
  * first-C 0.224 → 1 Lloyd pass 0.262 → converged 0.272 →
  * OPQ + converged **0.306**, with the per-subspace log-variance spread
  * tightened 9.33 → 0.16 (`OpqSpec`). The harness spectrum is mild
  * (λ_max/λ_min ≈ 4); production embedding models are far more anisotropic,
  * where the allocation is worth correspondingly more.
  */
object Opq {

  /** Upper-triangle second-moment sums → full symmetric matrix averaged by
    * the row count.
    */
  def secondMoment(vectors: DataFrame, dim: Int = 64): Array[Array[Double]] = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val buf = vectors.select(col("embedding")).as[Array[Float]]
      .select(new SecondMoment(dim).toColumn).head()
    val n = buf(0)
    require(n > 0, "secondMoment needs a non-empty corpus")
    val a = Array.ofDim[Double](dim, dim)
    var p = 1
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        a(i)(j) = buf(p) / n
        a(j)(i) = a(i)(j)
        p += 1
        j += 1
      }
      i += 1
    }
    a
  }

  /** Eigendecomposition of a symmetric matrix by cyclic Jacobi rotations:
    * returns (eigenvalues, eigenvectors-as-rows), sorted by eigenvalue
    * descending. O(d³) per sweep, converges in a handful of sweeps for
    * d ≤ a few hundred — driver-side by design (see the object doc).
    */
  def symEigen(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = m.length
    val a = Array.tabulate(n, n)((i, j) => m(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1d else 0d)
    def offDiag(): Double = {
      var s = 0d
      var i = 0
      while (i < n) { var j = i + 1; while (j < n) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }
    var sweep = 0
    while (sweep < 64 && offDiag() > 1e-20 * n * n) {
      var p = 0
      while (p < n) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2d * apq)
            val sign = if (theta < 0d) -1d else 1d
            val t = sign / (math.abs(theta) + math.sqrt(theta * theta + 1d))
            val c = 1d / math.sqrt(t * t + 1d)
            val s = t * c
            var k = 0
            while (k < n) { // A := JᵀAJ (columns p,q then rows p,q)
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < n) { // V := VJ
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until n).sortBy(i => -a(i)(i))
    val evals = order.map(i => a(i)(i)).toArray
    val evecs = order.map(d => Array.tabulate(n)(i => v(i)(d))).toArray
    (evals, evecs)
  }

  /** Greedy eigenvalue allocation (OPQ-NP): deal the principal directions,
    * largest first, each to the subspace with the smallest running Σ log λ
    * that still has capacity — balancing the per-subspace variance PRODUCT,
    * the quantity PQ's per-subspace codebook capacity is spent against.
    * Returns `m` buckets of `dsub` eigenvector indices.
    *
    * The logs are SHIFTED to non-negative weights (`log λ − min log λ`)
    * before the greedy: every bucket ends with exactly `dsub` entries, so a
    * uniform shift moves every bucket sum equally and the spread objective
    * is unchanged — but the raw (all-negative, λ < 1) logs would make the
    * first touched bucket the running minimum and collapse the greedy to
    * the contiguous identity allocation (measured: spread 9.33 raw-logs vs
    * 0.16 shifted on the harness spectrum).
    */
  def allocate(evals: Array[Double], m: Int, dsub: Int): Array[Array[Int]] = {
    require(evals.length == m * dsub, s"${evals.length} dims != $m x $dsub")
    val logs = evals.map(e => math.log(math.max(e, 1e-12)))
    val shift = logs.min
    val sums = Array.fill(m)(0d)
    val buckets = Array.fill(m)(new ArrayBuffer[Int])
    evals.indices.foreach { d =>
      val open = (0 until m).filter(buckets(_).size < dsub)
      val tgt = open.minBy(i => sums(i))
      buckets(tgt) += d
      sums(tgt) += logs(d) - shift
    }
    buckets.map(_.toArray)
  }

  /** Train the rotation: second moment → eigenbasis → allocation. Row r of
    * the returned matrix is the eigenvector assigned to output coordinate r,
    * so subspace `m` of the rotated vector spans rows
    * `[m·dsub, (m+1)·dsub)` — a balanced slice of the spectrum.
    */
  def train(vectors: DataFrame, dim: Int = 64,
            m: Int = Embeddings.PqM, dsub: Int = Embeddings.PqDsub): Array[Array[Float]] = {
    val (evals, evecs) = symEigen(secondMoment(vectors, dim))
    allocate(evals, m, dsub).flatMap(_.map(d => evecs(d).map(_.toFloat)))
  }

  /** Apply the rotation: 64 codegen'd dot products against literal rows —
    * one narrow projection, same (vec_id, embedding) schema out.
    */
  def rotate(vectors: DataFrame, r: Array[Array[Float]]): DataFrame = {
    val dims = r.map(row =>
      Embeddings.dotD(col("embedding"), typedlit(row)).cast("float"))
    vectors.select(col("vec_id"), array(dims.toIndexedSeq: _*).as("embedding"))
  }
}
