package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 64-perm MinHash signature as ONE native expression: input is the
  * array of (pmod'd) shingle hashes, output is the n-perm signature
  * `sig[j] = min over h of (a[j]*h + b[j]) mod p`.
  *
  * This replaces `array(64 × array_min(transform(...)))` — 64
  * interpreted lambda passes per row (higher-order functions are
  * CodegenFallback) — with a single fused perms × shingles loop in
  * generated Java. At sf0.1 that turned a 1000-second signature
  * computation into seconds; at 100 TB it is the difference between
  * the minhash stage being CPU-bound on lambda boxing vs running at
  * memory bandwidth.
  *
  * Inputs must already be reduced mod p (< 2³¹) so `a*h + b` stays
  * under 2⁶² — no overflow, matching the HOF formulation exactly.
  */
case class MinHashSig(child: Expression, a: Array[Long], b: Array[Long],
    prime: Long) extends UnaryExpression {

  require(a.length == b.length)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = a.length
    val sig = new Array[Long](n)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val h = arr.getLong(i)
      var j = 0
      while (j < n) {
        val v = (a(j) * h + b(j)) % prime
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val aRef = ctx.addReferenceObj("mhA", a, "long[]")
      val bRef = ctx.addReferenceObj("mhB", b, "long[]")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val gad = classOf[GenericArrayData].getName
      s"""
         |long[] $sig = new long[$aRef.length];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  long $h = $arr.getLong($i);
         |  for (int $j = 0; $j < $aRef.length; $j++) {
         |    long $v = ($aRef[$j] * $h + $bRef[$j]) % ${prime}L;
         |    if ($v < $sig[$j]) $sig[$j] = $v;
         |  }
         |}
         |${ev.value} = new $gad($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def apply(shingleHashes: Column, coeffs: Seq[(Long, Long)], prime: Long): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingleHashes),
      coeffs.map(_._1).toArray, coeffs.map(_._2).toArray, prime))
}
