package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint statistics (Schleimer, Wilkerson, Aiken —
  * "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD 2003; the MOSS selection rule) as ONE fused native
  * expression: text in, `[n_grams, n_fp, fp_xor, fp_min]` out.
  *
  * Pipeline inside the generated loop: whitespace-tokenize → word
  * n-grams per OCCURRENCE in document order → rolling polynomial
  * hash of each gram string ([[PolyHash]]'s `(acc*mult + char) mod m`
  * fold over the space-joined gram, so the DuckDB oracle reproduces
  * every hash with `list_reduce`) → minimum of each sliding window
  * of `w` consecutive gram hashes → the DISTINCT window minima are
  * the document's fingerprint set. Emitted stats are order-free
  * reductions of that set (count, xor-fold, min): the full selection
  * is pinned without shipping the set itself.
  *
  * Winnowing's guarantee — any shared run of `w + n - 1` tokens
  * between two documents contributes at least one common fingerprint
  * — is what makes the SET (not the positions) the interesting
  * artifact; the positional variant only adds offsets.
  *
  * A HOF formulation would be 4 interpreted passes per row
  * (CodegenFallback, the CLAUDE.md hot-loop rule); this is one
  * generated-Java loop. Janino constraints as everywhere: raw
  * collection types, explicit boxing.
  *
  * Output longs: `n_grams` = gram count (m), `n_fp` = |fingerprint
  * set| over the m-w+1 windows, `fp_xor` = xor of the set, `fp_min`
  * = min of the set. Documents with m < w yield `[m, 0, 0, 0]` —
  * callers filter on `n_grams >= w`.
  */
case class WinnowStats(child: Expression, n: Int, w: Int,
    mult: Long, mod: Long) extends UnaryExpression {

  require(n >= 1 && w >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val toks0 = input.asInstanceOf[UTF8String].toString.split("\\s+", -1)
    var nTok = 0
    var t = 0
    while (t < toks0.length) {
      if (!toks0(t).isEmpty) { toks0(nTok) = toks0(t); nTok += 1 }
      t += 1
    }
    val m = nTok - n + 1
    if (m < w)
      return new GenericArrayData(Array(math.max(m, 0).toLong, 0L, 0L, 0L))
    val hs = new Array[Long](m)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks0(i + k))
        k += 1
      }
      var acc = 0L
      var c = 0
      while (c < sb.length) {
        acc = (acc * mult + sb.charAt(c).toLong) % mod
        c += 1
      }
      hs(i) = acc
      i += 1
    }
    val seen = new java.util.HashSet[java.lang.Long]()
    var fpXor = 0L
    var fpMin = Long.MaxValue
    var p = 0
    while (p <= m - w) {
      var mn = hs(p)
      var q = 1
      while (q < w) {
        if (hs(p + q) < mn) mn = hs(p + q)
        q += 1
      }
      if (seen.add(mn)) {
        fpXor ^= mn
        if (mn < fpMin) fpMin = mn
      }
      p += 1
    }
    new GenericArrayData(Array(m.toLong, seen.size.toLong, fpXor, fpMin))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val toks = ctx.freshName("toks")
      val nTok = ctx.freshName("nTok")
      val t = ctx.freshName("t")
      val m = ctx.freshName("m")
      val hs = ctx.freshName("hs")
      val sb = ctx.freshName("sb")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      val c = ctx.freshName("c")
      val seen = ctx.freshName("seen")
      val fpXor = ctx.freshName("fpXor")
      val fpMin = ctx.freshName("fpMin")
      val p = ctx.freshName("p")
      val mn = ctx.freshName("mn")
      val q = ctx.freshName("q")
      val res = ctx.freshName("res")
      val gad = classOf[GenericArrayData].getName
      s"""
         |java.lang.String[] $toks = $str.toString().split("\\\\s+", -1);
         |int $nTok = 0;
         |for (int $t = 0; $t < $toks.length; $t++) {
         |  if (!$toks[$t].isEmpty()) { $toks[$nTok] = $toks[$t]; $nTok++; }
         |}
         |int $m = $nTok - $n + 1;
         |long[] $res;
         |if ($m < $w) {
         |  $res = new long[] { (long) java.lang.Math.max($m, 0), 0L, 0L, 0L };
         |} else {
         |  long[] $hs = new long[$m];
         |  java.lang.StringBuilder $sb = new java.lang.StringBuilder();
         |  for (int $i = 0; $i < $m; $i++) {
         |    $sb.setLength(0);
         |    for (int $k = 0; $k < $n; $k++) {
         |      if ($k > 0) $sb.append(' ');
         |      $sb.append($toks[$i + $k]);
         |    }
         |    long $acc = 0L;
         |    for (int $c = 0; $c < $sb.length(); $c++) {
         |      $acc = ($acc * ${mult}L + (long) $sb.charAt($c)) % ${mod}L;
         |    }
         |    $hs[$i] = $acc;
         |  }
         |  java.util.HashSet $seen = new java.util.HashSet();
         |  long $fpXor = 0L;
         |  long $fpMin = java.lang.Long.MAX_VALUE;
         |  for (int $p = 0; $p <= $m - $w; $p++) {
         |    long $mn = $hs[$p];
         |    for (int $q = 1; $q < $w; $q++) {
         |      if ($hs[$p + $q] < $mn) $mn = $hs[$p + $q];
         |    }
         |    if ($seen.add(java.lang.Long.valueOf($mn))) {
         |      $fpXor ^= $mn;
         |      if ($mn < $fpMin) $fpMin = $mn;
         |    }
         |  }
         |  $res = new long[] { (long) $m, (long) $seen.size(), $fpXor, $fpMin };
         |}
         |${ev.value} = new $gad($res);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowStats =
    copy(child = newChild)
}

object WinnowStats {
  def apply(text: Column, n: Int, w: Int, mult: Long, mod: Long): Column =
    ColumnBridge.column(
      WinnowStats(ColumnBridge.expression(text), n, w, mult, mod))
}
