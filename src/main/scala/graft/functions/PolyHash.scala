package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial hash of a string as a native expression:
  * `h = 0; h = (h*mult + char_i) mod m` over UTF-16 units — the same
  * fold as `aggregate(transform(split(text,''), ascii), 0L, ...)`
  * (identical for ASCII/BMP text; the synthetic corpus is ASCII), but
  * one generated-Java loop instead of ~n_chars interpreted lambda
  * evaluations per row (text_fingerprint: 4.6 s → sub-second at
  * sf0.1).
  */
case class PolyHash(child: Expression, mult: Long, mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      acc = (acc * mult + s.charAt(i).toLong) % mod
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |java.lang.String $s = $str.toString();
         |long $acc = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $acc = ($acc * ${mult}L + (long) $s.charAt($i)) % ${mod}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  def apply(c: Column, mult: Long, mod: Long): Column =
    ColumnBridge.column(PolyHash(ColumnBridge.expression(c), mult, mod))
}
