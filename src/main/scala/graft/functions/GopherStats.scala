package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** ALL five Gopher rule inputs in ONE generated loop per row:
  * `array<long>` of [n_tok, n_distinct, top_c, n_chars_tok,
  * n_stop_kinds] over the standard non-empty \s+ tokens. Fuses what
  * the per-column form paid as EIGHT text passes (wsTokenCount,
  * four tokenCountIn regexes, the whitespace regexp_count,
  * ShingleHashes, MaxTokenMult) into one split + one HashMap walk —
  * the per-row cost that matters when the quality gate runs on every
  * ingested document. Distinct/top counts are by token STRING (no
  * hash-collision caveat). Stopword kinds = how many of
  * {the, a, is, of} appear at least once (the EnStopwords list,
  * frozen here as code literals — GopherRulesSpec pins equality
  * against the column-expression form on the corpus). */
case class GopherStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gopher_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split("\\s+", -1)
    val m = new java.util.HashMap[String, Integer]()
    var nTok = 0L; var top = 0L; var chars = 0L
    var sThe = false; var sA = false; var sIs = false; var sOf = false
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (!t.isEmpty) {
        nTok += 1; chars += t.length
        val prev = m.get(t)
        val c = if (prev == null) 1 else prev.intValue() + 1
        m.put(t, c)
        if (c > top) top = c
        if (t == "the") sThe = true
        else if (t == "a") sA = true
        else if (t == "is") sIs = true
        else if (t == "of") sOf = true
      }
      i += 1
    }
    val stop = (if (sThe) 1L else 0L) + (if (sA) 1L else 0L) +
      (if (sIs) 1L else 0L) + (if (sOf) 1L else 0L)
    new GenericArrayData(Array(nTok, m.size.toLong, top, chars, stop))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val toks = ctx.freshName("toks")
      val map = ctx.freshName("map")
      val nTok = ctx.freshName("nTok")
      val top = ctx.freshName("top")
      val chars = ctx.freshName("chars")
      val stop = ctx.freshName("stop")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val prev = ctx.freshName("prev")
      val c = ctx.freshName("c")
      val arr = ctx.freshName("arr")
      val gad = classOf[GenericArrayData].getName
      // Janino: raw collection types and explicit boxing only.
      // stop-kind flags ride bits of one int (no boolean[] churn).
      s"""
         |java.lang.String[] $toks = $str.toString().split("\\\\s+", -1);
         |java.util.HashMap $map = new java.util.HashMap();
         |long $nTok = 0L; long $top = 0L; long $chars = 0L;
         |int $stop = 0;
         |for (int $i = 0; $i < $toks.length; $i++) {
         |  java.lang.String $t = $toks[$i];
         |  if (!$t.isEmpty()) {
         |    $nTok++; $chars += $t.length();
         |    java.lang.Integer $prev = (java.lang.Integer) $map.get($t);
         |    int $c = ($prev == null) ? 1 : ($prev.intValue() + 1);
         |    $map.put($t, java.lang.Integer.valueOf($c));
         |    if ((long) $c > $top) $top = (long) $c;
         |    if ($t.equals("the")) $stop |= 1;
         |    else if ($t.equals("a")) $stop |= 2;
         |    else if ($t.equals("is")) $stop |= 4;
         |    else if ($t.equals("of")) $stop |= 8;
         |  }
         |}
         |long[] $arr = new long[] { $nTok, (long) $map.size(), $top,
         |  $chars, (long) java.lang.Integer.bitCount($stop) };
         |${ev.value} = new $gad($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GopherStats =
    copy(child = newChild)
}

object GopherStats {
  def apply(text: Column): Column =
    ColumnBridge.column(GopherStats(ColumnBridge.expression(text)))
}
