package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Every `stride`-th `frameLen`-byte block of a binary column as an
  * uppercase-hex string array, in one native loop — replaces
  * `transform(sequence(1, len, stride), p => hex(substr(b, p, n)))`,
  * whose lambda (and the hex/substr inside it) runs interpreted per
  * frame per row. At test scale blobs are ~1 KB (13 frames); on real
  * media a blob is MBs → thousands of frames, exactly the per-row
  * loop class CLAUDE.md sends to `doGenCode`. Bit-identical to the
  * HOF form (MultimodalSpec) — Spark's `hex` is uppercase, and the
  * tail frame is truncated, not padded. */
case class FrameHex(child: Expression, stride: Int, frameLen: Int)
    extends UnaryExpression {

  require(stride > 0 && frameLen > 0)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "frame_hex"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[Array[Byte]]
    val nFrames = (a.length + stride - 1) / stride
    val out = new Array[AnyRef](nFrames)
    val digits = "0123456789ABCDEF"
    var f = 0
    while (f < nFrames) {
      val start = f * stride
      val n = math.min(frameLen, a.length - start)
      val sb = new java.lang.StringBuilder(n * 2)
      var i = 0
      while (i < n) {
        val b = a(start + i) & 0xFF
        sb.append(digits.charAt(b >>> 4)).append(digits.charAt(b & 0xF))
        i += 1
      }
      out(f) = UTF8String.fromString(sb.toString)
      f += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val nFrames = ctx.freshName("nFrames")
      val f = ctx.freshName("f")
      val start = ctx.freshName("start")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val sb = ctx.freshName("sb")
      val gad = classOf[GenericArrayData].getName
      val utf8 = classOf[UTF8String].getName
      s"""
         |int $nFrames = ($a.length + $stride - 1) / $stride;
         |Object[] $out = new Object[$nFrames];
         |for (int $f = 0; $f < $nFrames; $f++) {
         |  int $start = $f * $stride;
         |  int $n = java.lang.Math.min($frameLen, $a.length - $start);
         |  java.lang.StringBuilder $sb = new java.lang.StringBuilder($n * 2);
         |  for (int $i = 0; $i < $n; $i++) {
         |    int $b = $a[$start + $i] & 0xFF;
         |    $sb.append("0123456789ABCDEF".charAt($b >>> 4));
         |    $sb.append("0123456789ABCDEF".charAt($b & 0xF));
         |  }
         |  $out[$f] = $utf8.fromString($sb.toString());
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FrameHex =
    copy(child = newChild)
}

object FrameHex {
  def apply(content: Column, stride: Int, frameLen: Int): Column =
    ColumnBridge.column(
      FrameHex(ColumnBridge.expression(content), stride, frameLen))
}
