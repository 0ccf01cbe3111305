package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * codegen'd higher-order functions.
  *
  * Determinism contract: every fold is a strict left-to-right
  * `aggregate` with a 0.0 seed, and the DuckDB oracles use the same
  * `list_reduce` order — IEEE doubles then agree bit-for-bit, so a
  * `cos >= τ` filter selects the same pairs in both engines even when
  * a pair sits near τ. Do not "optimize" into reassociated sums.
  */
object VectorFunctions {

  /** array<float> → array<double> (all math in double). A direct
    * array cast — Catalyst's Cast is codegen'd element-wise widening,
    * bit-identical to `transform(_.cast("double"))` but without the
    * interpreted HOF pass that transform costs per row. */
  def toDouble(v: Column): Column = v.cast("array<double>")

  /** Sequential dot product of two double arrays — a native codegen
    * expression with the exact op order of the HOF/list_reduce
    * formulation (see [[DotProductD]]). */
  def dot(a: Column, b: Column): Column = DotProductD(a, b)

  /** L2 norm. */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity given precomputed norms (keeps the op order
    * identical to the oracle: dot / (na * nb)). */
  def cosineWithNorms(dotAb: Column, na: Column, nb: Column): Column =
    dotAb / (na * nb)

  /** Random-hyperplane signature: bit j = sign(v · r_j), packed into
    * per-band bucket keys (banded LSH). Hyperplanes come from a
    * deterministic seed so signatures are stable across runs. Each
    * band key doubles as a bucket id: vectors agreeing on any band
    * are candidates. One fused native loop over the flattened plane
    * matrix ([[HyperplaneSig]]) — bit-identical to the composed
    * per-plane-dot form below (VectorSpec proves it). */
  def hyperplaneBands(v: Column, planes: Seq[Seq[Double]], bandBits: Int): Column = {
    require(planes.nonEmpty && planes.size % bandBits == 0)
    HyperplaneSig(v, planes, bandBits)
  }

  /** Composed-Column reference formulation of [[hyperplaneBands]] —
    * nPlanes independent DotProductD nodes + a packing tree; kept for
    * the bit-equality spec. */
  def hyperplaneBandsRef(v: Column, planes: Seq[Seq[Double]], bandBits: Int): Column = {
    require(planes.nonEmpty && planes.size % bandBits == 0)
    val bits: Seq[Column] = planes.map { p =>
      val pc = array(p.map(lit): _*)
      when(dot(v, pc) >= 0, 1L).otherwise(0L)
    }
    val bands = bits.grouped(bandBits).toSeq.map { group =>
      group.zipWithIndex.map { case (b, i) => b * (1L << i) }
        .reduce(_ + _)
    }
    array(bands: _*)
  }

  /** Deterministic pseudo-random hyperplanes (Gaussian via
    * scala.util.Random with a fixed seed). */
  def randomPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }
}
