package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Max multiplicity of any whitespace token in the string — the
  * top-token count a repetition gate reads, as ONE generated loop
  * per row (text in, int out; 0 for a token-free string).
  *
  * Replaces the explode → groupBy(doc, token) → max(count) shuffle
  * pair of the batch ruleset with a stateless per-row pass, which is
  * what makes the STREAMING quality gate possible with zero state
  * (no stream aggregation, no watermark): multiplicity is counted in
  * a per-row java.util.HashMap over the same non-empty \s+ split
  * every other text operator uses. The HOF alternative
  * (aggregate over array) is CodegenFallback — interpreted per row. */
case class MaxTokenMult(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "max_token_mult"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split("\\s+", -1)
    val m = new java.util.HashMap[String, Integer]()
    var mx = 0
    var i = 0
    while (i < toks.length) {
      if (!toks(i).isEmpty) {
        val prev = m.get(toks(i))
        val c = if (prev == null) 1 else prev.intValue() + 1
        m.put(toks(i), c)
        if (c > mx) mx = c
      }
      i += 1
    }
    mx
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val toks = ctx.freshName("toks")
      val map = ctx.freshName("map")
      val mx = ctx.freshName("mx")
      val i = ctx.freshName("i")
      val prev = ctx.freshName("prev")
      val c = ctx.freshName("c")
      // Janino: raw collection types and explicit boxing only.
      s"""
         |java.lang.String[] $toks = $str.toString().split("\\\\s+", -1);
         |java.util.HashMap $map = new java.util.HashMap();
         |int $mx = 0;
         |for (int $i = 0; $i < $toks.length; $i++) {
         |  if (!$toks[$i].isEmpty()) {
         |    java.lang.Integer $prev = (java.lang.Integer) $map.get($toks[$i]);
         |    int $c = ($prev == null) ? 1 : ($prev.intValue() + 1);
         |    $map.put($toks[$i], java.lang.Integer.valueOf($c));
         |    if ($c > $mx) $mx = $c;
         |  }
         |}
         |${ev.value} = $mx;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MaxTokenMult =
    copy(child = newChild)
}

object MaxTokenMult {
  def apply(text: Column): Column =
    ColumnBridge.column(MaxTokenMult(ColumnBridge.expression(text)))
}
