package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StructField, StructType}

/** One-pass-per-phase int8 symmetric quantization digest over an
  * `array<double>` column — the "compress embeddings to int8 before
  * they hit the vector store" step of an embedding pipeline, as a
  * single generated loop (a HOF chain here would be 4+ interpreted
  * CodegenFallback passes per row — the 200× hot-loop tax in
  * CLAUDE.md).
  *
  * Semantics: scale = max|x| / 127; q_i = clamp(rnd(x_i/scale),
  * ±127) with rnd = half-away-from-zero expressed as
  * `floor(|y| + 0.5)` with the sign restored — the SAME floor algebra
  * the DuckDB oracle spells out (never an engine `round`, so the two
  * sides cannot disagree on a half boundary). An all-zero (or empty)
  * vector has scale 0 and quantizes to all-zero rather than 0/0 NaN.
  * Output is the per-vector digest a QC gate wants: scale, Σq,
  * min/max q, saturated-component and zero-component counts, and the
  * summed squared reconstruction error Σ(x − q·scale)² — the error
  * fold couples every component to its quantized value, so the hash
  * gate covers each position without shipping the q array itself.
  *
  * Determinism contract (as [[DotProductD]]/[[VecStatsD]]): strict
  * left-to-right folds from 0.0 seeds, no reassociation; max|x| is
  * NaN-propagating. q_i, scale and every term of sq_err are then
  * bit-identical to the oracle's list algebra. Precondition: finite
  * components — a NaN/Inf component makes scale NaN/Inf and the
  * integer casts engine-defined; run [[graft.operators.Similarity
  * .embedStats]]' QC (which flags NaN via max_abs) upstream, as a
  * real pipeline would.
  */
case class QuantStatsI8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q_sum", LongType, nullable = false),
    StructField("q_min", IntegerType, nullable = false),
    StructField("q_max", IntegerType, nullable = false),
    StructField("n_sat", IntegerType, nullable = false),
    StructField("n_zero", IntegerType, nullable = false),
    StructField("sq_err", DoubleType, nullable = false)))
  override def prettyName: String = "quant_stats_i8"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      val ax = math.abs(a.getDouble(i))
      if (ax > m || java.lang.Double.isNaN(ax)) m = ax
      i += 1
    }
    val scale = m / 127.0
    var qsum = 0L; var qmin = 0L; var qmax = 0L
    var nsat = 0; var nzero = 0; var sq = 0.0
    var first = true
    i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = if (scale == 0.0) 0.0 else x / scale
      var qd =
        if (y >= 0.0) math.floor(y + 0.5) else -math.floor(-y + 0.5)
      if (qd > 127.0) qd = 127.0
      if (qd < -127.0) qd = -127.0
      val q = qd.toLong
      qsum += q
      if (first || q < qmin) qmin = q
      if (first || q > qmax) qmax = q
      first = false
      if (q == 127L || q == -127L) nsat += 1
      if (q == 0L) nzero += 1
      val e = x - q * scale
      sq += e * e
      i += 1
    }
    InternalRow(scale, qsum, qmin.toInt, qmax.toInt, nsat, nzero, sq)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val ax = ctx.freshName("ax")
      val scale = ctx.freshName("scale")
      val qsum = ctx.freshName("qsum")
      val qmin = ctx.freshName("qmin")
      val qmax = ctx.freshName("qmax")
      val nsat = ctx.freshName("nsat")
      val nzero = ctx.freshName("nzero")
      val sq = ctx.freshName("sq")
      val first = ctx.freshName("first")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val qd = ctx.freshName("qd")
      val q = ctx.freshName("q")
      val e = ctx.freshName("e")
      // Janino: raw Object[] + explicit valueOf boxing only
      // (generics/autoboxing fail to compile at runtime — CLAUDE.md).
      s"""
         |int $n = $a.numElements();
         |double $m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $ax = java.lang.Math.abs($a.getDouble($i));
         |  if ($ax > $m || java.lang.Double.isNaN($ax)) $m = $ax;
         |}
         |double $scale = $m / 127.0;
         |long $qsum = 0L; long $qmin = 0L; long $qmax = 0L;
         |int $nsat = 0; int $nzero = 0; double $sq = 0.0;
         |boolean $first = true;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  double $y = ($scale == 0.0) ? 0.0 : $x / $scale;
         |  double $qd = ($y >= 0.0)
         |    ? java.lang.Math.floor($y + 0.5)
         |    : -java.lang.Math.floor(-$y + 0.5);
         |  if ($qd > 127.0) $qd = 127.0;
         |  if ($qd < -127.0) $qd = -127.0;
         |  long $q = (long) $qd;
         |  $qsum += $q;
         |  if ($first || $q < $qmin) $qmin = $q;
         |  if ($first || $q > $qmax) $qmax = $q;
         |  $first = false;
         |  if ($q == 127L || $q == -127L) $nsat++;
         |  if ($q == 0L) $nzero++;
         |  double $e = $x - $q * $scale;
         |  $sq += $e * $e;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new java.lang.Object[] {
         |    java.lang.Double.valueOf($scale),
         |    java.lang.Long.valueOf($qsum),
         |    java.lang.Integer.valueOf((int) $qmin),
         |    java.lang.Integer.valueOf((int) $qmax),
         |    java.lang.Integer.valueOf($nsat),
         |    java.lang.Integer.valueOf($nzero),
         |    java.lang.Double.valueOf($sq) });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantStatsI8 =
    copy(child = newChild)
}

object QuantStatsI8 {
  def apply(v: Column): Column =
    ColumnBridge.column(QuantStatsI8(ColumnBridge.expression(v)))
}
