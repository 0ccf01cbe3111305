package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused tokenize → word-n-gram shingle → xxhash64 as ONE native
  * expression: text in, `array<long>` of shingle hashes out.
  *
  * Replaces the HOF pipeline
  * `transform(array_distinct(transform(sequence(...), i =>
  * concat_ws(" ", element_at(toks, i), ...))), s => xxhash64(s))` —
  * five interpreted CodegenFallback passes per row (split, filter,
  * sequence-transform with 3 element_at + concat_ws each, distinct,
  * hash) — with a single generated-Java loop. Bit-identical output:
  * the hash is Spark's own XXH64 over the UTF-8 bytes of the
  * space-joined shingle with xxhash64's default seed (42), dedup is
  * by raw 64-bit hash (== by string modulo 2⁻⁶⁴ collisions), and
  * `mod > 0` applies the same `pmod` the minhash path used.
  * Input with fewer than n tokens yields an empty array (the HOF
  * form needed a caller-side guard against Spark's descending
  * `sequence`).
  *
  *  - n-gram dedup join keys: `ShingleHashes(text, 3)` (raw hashes)
  *  - minhash shingle field elements: `mod = MinHashPrime`
  *  - simhash token hashes: `n = 1, distinct = false`
  */
case class ShingleHashes(child: Expression, n: Int, mod: Long,
    distinct: Boolean) extends UnaryExpression {

  require(n >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val toks0 = input.asInstanceOf[UTF8String].toString.split("\\s+", -1)
    var nTok = 0
    var t = 0
    while (t < toks0.length) { // compact non-empty tokens in place
      if (!toks0(t).isEmpty) { toks0(nTok) = toks0(t); nTok += 1 }
      t += 1
    }
    if (nTok < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new java.util.ArrayList[java.lang.Long](nTok - n + 1)
    val seen = if (distinct) new java.util.HashSet[java.lang.Long]() else null
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
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUTF8String(UTF8String.fromString(sb.toString), 42L)
      if (seen == null || seen.add(h))
        out.add(if (mod > 0) ((h % mod) + mod) % mod else h)
      i += 1
    }
    val arr = new Array[Long](out.size)
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    new GenericArrayData(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val toks = ctx.freshName("toks")
      val nTok = ctx.freshName("nTok")
      val t = ctx.freshName("t")
      val out = ctx.freshName("out")
      val seen = ctx.freshName("seen")
      val sb = ctx.freshName("sb")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val arr = ctx.freshName("arr")
      val j = ctx.freshName("j")
      val gad = classOf[GenericArrayData].getName
      val utf8 = classOf[UTF8String].getName
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      // Janino compiles the generated code: raw collection types and
      // explicit boxing only (no generics, no autoboxing).
      val seenDecl =
        if (distinct) s"java.util.HashSet $seen = new java.util.HashSet();"
        else ""
      val addCond =
        if (distinct) s"if ($seen.add(java.lang.Long.valueOf($h))) " else ""
      val store =
        if (mod > 0)
          s"$out.add(java.lang.Long.valueOf((($h % ${mod}L) + ${mod}L) % ${mod}L));"
        else s"$out.add(java.lang.Long.valueOf($h));"
      s"""
         |java.lang.String[] $toks = $str.toString().split("\\\\s+", -1);
         |int $nTok = 0;
         |for (int $t = 0; $t < $toks.length; $t++) {
         |  if (!$toks[$t].isEmpty()) { $toks[$nTok] = $toks[$t]; $nTok++; }
         |}
         |long[] $arr;
         |if ($nTok < $n) {
         |  $arr = new long[0];
         |} else {
         |  java.util.ArrayList $out = new java.util.ArrayList($nTok - $n + 1);
         |  $seenDecl
         |  java.lang.StringBuilder $sb = new java.lang.StringBuilder();
         |  for (int $i = 0; $i <= $nTok - $n; $i++) {
         |    $sb.setLength(0);
         |    for (int $k = 0; $k < $n; $k++) {
         |      if ($k > 0) $sb.append(' ');
         |      $sb.append($toks[$i + $k]);
         |    }
         |    long $h = $xxh.hashUTF8String(
         |      $utf8.fromString($sb.toString()), 42L);
         |    $addCond$store
         |  }
         |  $arr = new long[$out.size()];
         |  for (int $j = 0; $j < $arr.length; $j++) {
         |    $arr[$j] = ((java.lang.Long) $out.get($j)).longValue();
         |  }
         |}
         |${ev.value} = new $gad($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  /** Distinct word-n-gram xxhash64 keys (n-gram dedup join keys). */
  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(
      ShingleHashes(ColumnBridge.expression(text), n, 0L, distinct = true))

  /** Distinct shingle hashes reduced mod p (minhash field elements). */
  def modded(text: Column, n: Int, mod: Long): Column =
    ColumnBridge.column(
      ShingleHashes(ColumnBridge.expression(text), n, mod, distinct = true))

  /** Per-token hashes, one per occurrence, in order (simhash input). */
  def tokenHashes(text: Column): Column =
    ColumnBridge.column(
      ShingleHashes(ColumnBridge.expression(text), 1, 0L, distinct = false))
}
