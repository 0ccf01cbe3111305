package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StructField, StructType}

/** One-pass per-vector QC stats over an `array<double>` column:
  * struct(norm_sq, sum, max_abs). A single generated loop instead of
  * three interpreted HOF passes (aggregate/transform/array_max are
  * CodegenFallback — the 200× hot-loop tax documented in CLAUDE.md).
  *
  * Determinism contract (same as [[DotProductD]]): strict
  * left-to-right accumulation from a 0.0 seed — `norm_sq += x*x`,
  * `sum += x` in index order, no reassociation, no FMA — matching the
  * DuckDB oracle's `list_reduce` op order bit-for-bit (x²  ≥ 0 and
  * abs ≥ 0 make the 0.0-vs-first-element seed difference vacuous).
  * max_abs is order-independent, and NaN-propagating like both the
  * oracle's `greatest` and Spark's (a bare `if (ax > m)` would
  * silently skip NaN components and diverge cross-engine;
  * VectorSpec's NaN row locks this). norm_sq/sum propagate NaN
  * through `+=` natively.
  */
case class VecStatsD(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("norm_sq", DoubleType, nullable = false),
    StructField("sum", DoubleType, nullable = false),
    StructField("max_abs", DoubleType, nullable = false)))
  override def prettyName: String = "vec_stats_d"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var q = 0.0; var s = 0.0; var m = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      q += x * x
      s += x
      val ax = math.abs(x)
      if (ax > m || java.lang.Double.isNaN(ax)) m = ax
      i += 1
    }
    InternalRow(q, s, m)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val q = ctx.freshName("q")
      val s = ctx.freshName("s")
      val m = ctx.freshName("m")
      val ax = ctx.freshName("ax")
      // Janino: raw Object[] + explicit Double.valueOf boxing only
      // (generics/autoboxing fail to compile at runtime — CLAUDE.md).
      s"""
         |int $n = $a.numElements();
         |double $q = 0.0; double $s = 0.0; double $m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  $q += $x * $x;
         |  $s += $x;
         |  double $ax = java.lang.Math.abs($x);
         |  if ($ax > $m || java.lang.Double.isNaN($ax)) $m = $ax;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new java.lang.Object[] {
         |    java.lang.Double.valueOf($q),
         |    java.lang.Double.valueOf($s),
         |    java.lang.Double.valueOf($m) });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecStatsD =
    copy(child = newChild)
}

object VecStatsD {
  def apply(v: Column): Column =
    ColumnBridge.column(VecStatsD(ColumnBridge.expression(v)))
}
