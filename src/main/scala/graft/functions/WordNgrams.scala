package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused tokenize → word-n-gram STRINGS as one native expression:
  * text in, `array<string>` of space-joined n-grams out, one per
  * occurrence, in order. The string-producing sibling of
  * [[ShingleHashes]] (which hashes) — for corpus-level n-gram
  * statistics the gram itself is the group key, so it must survive
  * to the aggregate. Replaces the interpreted HOF form
  * `transform(sequence(...), i -> concat_ws(' ', s[i], s[i+1]))`
  * (CodegenFallback per row — CLAUDE.md hot-loop tax) with a single
  * generated loop. Tokenization is the same `\\s+` split-and-compact
  * as ShingleHashes / wsTokenCount; fewer than n tokens yields an
  * empty array.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override protected def nullSafeEval(input: Any): Any = {
    val toks0 = input.asInstanceOf[UTF8String].toString.split("\\s+", -1)
    var nTok = 0
    var t = 0
    while (t < toks0.length) { // compact non-empty tokens in place
      if (!toks0(t).isEmpty) { toks0(nTok) = toks0(t); nTok += 1 }
      t += 1
    }
    if (nTok < n) return new GenericArrayData(new Array[AnyRef](0))
    val arr = new Array[AnyRef](nTok - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= nTok - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks0(i + k))
        k += 1
      }
      arr(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val toks = ctx.freshName("toks")
      val nTok = ctx.freshName("nTok")
      val t = ctx.freshName("t")
      val sb = ctx.freshName("sb")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val arr = ctx.freshName("arr")
      val gad = classOf[GenericArrayData].getName
      val utf8 = classOf[UTF8String].getName
      // Janino: raw arrays, explicit classes, no generics (CLAUDE.md)
      s"""
         |java.lang.String[] $toks = $str.toString().split("\\\\s+", -1);
         |int $nTok = 0;
         |for (int $t = 0; $t < $toks.length; $t++) {
         |  if (!$toks[$t].isEmpty()) { $toks[$nTok] = $toks[$t]; $nTok++; }
         |}
         |java.lang.Object[] $arr;
         |if ($nTok < $n) {
         |  $arr = new java.lang.Object[0];
         |} else {
         |  $arr = new java.lang.Object[$nTok - $n + 1];
         |  java.lang.StringBuilder $sb = new java.lang.StringBuilder();
         |  for (int $i = 0; $i <= $nTok - $n; $i++) {
         |    $sb.setLength(0);
         |    for (int $k = 0; $k < $n; $k++) {
         |      if ($k > 0) $sb.append(' ');
         |      $sb.append($toks[$i + $k]);
         |    }
         |    $arr[$i] = $utf8.fromString($sb.toString());
         |  }
         |}
         |${ev.value} = new $gad($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  /** Per-occurrence word n-gram strings, in order. */
  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(WordNgrams(ColumnBridge.expression(text), n))
}
