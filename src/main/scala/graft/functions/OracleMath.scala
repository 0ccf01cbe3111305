package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{abs, floor, signum, udf}

/** Cross-engine rounding. Spark's `round()` half-ups the shortest
  * DECIMAL representation of the double (BigDecimal.valueOf), while
  * DuckDB rounds the BINARY value half-away-from-zero — they disagree
  * whenever the shortest decimal repr lands exactly on a half
  * boundary: raw 0.72124999999999995 prints as "0.72125", Spark
  * rounds it to 0.7213, DuckDB to 0.7212 (observed: 5 of 5000
  * text_quality rows at sf0.1). `roundDuck` reproduces DuckDB's
  * semantics bit-for-bit: floor(|x|·10^s + 0.5) with the sign
  * restored — validated against DuckDB on half-boundary cases
  * including 0.00025 (binary-above-half → 0.0003) and large
  * magnitudes.
  */
object OracleMath {

  /** Builder-side half-boundary margin tracker (VERDICT r13 #1: catch
    * the next libm flake BEFORE the driver box does). When enabled —
    * only by [[graft.MarginProbe]], never in production or gate runs —
    * every [[roundDuck]] call also measures how far its pre-round
    * value sits from the nearest rounding decision boundary, in ULPs
    * of the scaled value: `t = |x|·10^s + 0.5` flips its floor when t
    * crosses an integer, so `|t − rint(t)| / ulp(t)` is the number of
    * last-place drifts a cross-libm ln/exp would need to flip the
    * rounded output. A small NONZERO minimum is the flake signature
    * (events_survival r13: exp∘Σln landed within drift range of a
    * half boundary on one box); an EXACT zero is usually a rational
    * value sitting on the boundary by construction — deterministic on
    * both engines when the input bits are exact — so it is counted
    * separately rather than folded into the minimum.
    *
    * Static JVM-local state: correct under local[*] (driver and
    * executors share the JVM — the only place the probe runs);
    * concurrent queries would interleave, so the probe main runs
    * queries sequentially. */
  object MarginTracker {
    @volatile var enabled = false
    private val minUlps = new java.util.concurrent.atomic.AtomicLong(
      java.lang.Double.doubleToLongBits(Double.MaxValue))
    private val zeros = new java.util.concurrent.atomic.AtomicLong(0L)
    private val samples = new java.util.concurrent.atomic.AtomicLong(0L)

    def reset(): Unit = {
      minUlps.set(java.lang.Double.doubleToLongBits(Double.MaxValue))
      zeros.set(0L)
      samples.set(0L)
    }
    def minMarginUlps: Double =
      java.lang.Double.longBitsToDouble(minUlps.get())
    def nExactBoundary: Long = zeros.get()
    def nSamples: Long = samples.get()

    private[functions] def record(t: Double): Unit = {
      samples.incrementAndGet()
      val d = math.abs(t - math.rint(t))
      if (d == 0.0) { zeros.incrementAndGet(); () }
      else {
        val m = d / math.ulp(t)
        var cur = minUlps.get()
        while (m < java.lang.Double.longBitsToDouble(cur) &&
            !minUlps.compareAndSet(cur,
              java.lang.Double.doubleToLongBits(m)))
          cur = minUlps.get()
      }
    }
  }

  def roundDuck(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    val in =
      if (!MarginTracker.enabled) c
      else {
        // identity UDF with a measurement side effect — present in the
        // plan ONLY under the probe flag, so production/gate plans are
        // untouched (and stay whole-stage-codegen'd)
        val probe = udf { (x: java.lang.Double) =>
          if (x != null && !x.isNaN && !x.isInfinite)
            MarginTracker.record(math.abs(x) * p + 0.5d)
          x
        }
        probe(c)
      }
    signum(in) * (floor(abs(in) * p + 0.5d) / p)
  }
}
