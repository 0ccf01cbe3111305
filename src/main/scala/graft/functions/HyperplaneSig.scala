package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Banded random-hyperplane signature as ONE native expression:
  * input `array<double>` vector, output `array<long>` of
  * `planes.length / bandBits` band keys, where bit j of band b is
  * `sign(v · plane[b*bandBits + j])` and the key packs the band's
  * bits little-endian (`bit_i << i`).
  *
  * Replaces `nPlanes` separate [[DotProductD]] expression nodes plus
  * a `when/otherwise` packing tree — the per-plane work is identical
  * (the dot is the same strict sequential fold, so signatures are
  * bit-identical to the composed-Column form; VectorSpec proves it),
  * but the whole signature is one generated loop over a flattened
  * plane matrix instead of ~64 independent codegen'd subexpressions
  * each re-reading the vector.
  */
case class HyperplaneSig(child: Expression, planes: Array[Double],
    dim: Int, bandBits: Int) extends UnaryExpression {

  require(dim > 0 && bandBits > 0 && planes.length % dim == 0 &&
    (planes.length / dim) % bandBits == 0)
  private def nPlanes: Int = planes.length / dim

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val keys = new Array[Long](nPlanes / bandBits)
    var p = 0
    while (p < nPlanes) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += v.getDouble(i) * planes(p * dim + i)
        i += 1
      }
      // !(acc < 0), not (acc >= 0): a NaN dot (e.g. Inf * 0 in the
      // fold) must take bit 1 the same way the composed-Column
      // reference does (Spark SQL orders NaN above every double);
      // Java's primitive >= would silently flip it to 0 and the two
      // forms would band NaN vectors differently.
      if (!(acc < 0))
        keys(p / bandBits) |= 1L << (p % bandBits)
      p += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val pl = ctx.addReferenceObj("planes", planes, "double[]")
      val keys = ctx.freshName("keys")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val gad = classOf[GenericArrayData].getName
      s"""
         |long[] $keys = new long[${nPlanes / bandBits}];
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |for (int $p = 0; $p < $nPlanes; $p++) {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $v.getDouble($i) * $pl[$p * $dim + $i];
         |  }
         |  if (!($acc < 0)) { // NaN -> bit 1, matching Spark SQL NaN order
         |    $keys[$p / $bandBits] |= 1L << ($p % $bandBits);
         |  }
         |}
         |${ev.value} = new $gad($keys);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {
  def apply(v: Column, planes: Seq[Seq[Double]], bandBits: Int): Column = {
    val dim = planes.head.size
    require(planes.forall(_.size == dim))
    ColumnBridge.column(HyperplaneSig(ColumnBridge.expression(v),
      planes.flatten.toArray, dim, bandBits))
  }
}
