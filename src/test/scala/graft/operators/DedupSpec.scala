package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.{HashFunctions => H, SimHash64}

class DedupSpec extends SparkSuite {

  /** Exact word-trigram Jaccard, driver-side reference. */
  private def jaccard(a: String, b: String): Double = {
    def sh(t: String) =
      t.split("\\s+").filter(_.nonEmpty).sliding(3).map(_.mkString(" ")).toSet
    val (sa, sb) = (sh(a), sh(b))
    if (sa.isEmpty && sb.isEmpty) 0.0
    else sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  /** Synthetic corpus with planted near-dups: doc 2i+1 is doc 2i with
    * one token swapped (J ~ 0.9+); unrelated docs share ~nothing. */
  private def corpus(n: Int): Seq[(Long, String)] = {
    val rng = new scala.util.Random(7)
    val vocab = ('a' to 'z').map(_.toString)
    (0 until n).flatMap { i =>
      val base = Seq.fill(40)(vocab(rng.nextInt(vocab.size)) + i.toString)
      val mutated = base.updated(20, "mut" + i)
      Seq((2L * i, base.mkString(" ")), (2L * i + 1, mutated.mkString(" ")))
    }
  }

  test("minhash LSH finds every planted near-dup pair (J >= 0.8)") {
    val s = spark; import s.implicits._
    val docs = corpus(15).toDF("doc_id", "text")
    val coeffs = H.minhashCoeffs(64)
    val sigs = docs.select(col("doc_id"),
      H.minhashSignature(H.wordShingles(col("text"), 3), coeffs).as("sig"))
    val bands = sigs.select(col("doc_id"), col("sig"),
      posexplode(H.lshBandKeys(col("sig"), 16, 4)).as(Seq("band", "key")))
    val cands = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val trueDups = for {
      a <- texts.keys; b <- texts.keys
      if a < b && jaccard(texts(a), texts(b)) >= 0.8
    } yield (a, b)
    assert(trueDups.nonEmpty, "corpus must contain planted near-dups")
    val missed = trueDups.toSet -- cands
    assert(missed.isEmpty, s"LSH missed true near-dup pairs: $missed")
  }

  test("minhash est_j approximates exact Jaccard within 0.15") {
    val s = spark; import s.implicits._
    val docs = corpus(10).toDF("doc_id", "text")
    val coeffs = H.minhashCoeffs(64)
    val sigs = docs.select(col("doc_id"), col("text"),
      H.minhashSignature(H.wordShingles(col("text"), 3), coeffs).as("sig"))
    val pairs = sigs.as("a").join(sigs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.text"), col("b.text"),
        H.sigSimilarity(col("a.sig"), col("b.sig")).as("est"))
      .collect()
    pairs.foreach { r =>
      val exact = jaccard(r.getString(0), r.getString(1))
      val est = r.getDouble(2)
      assert(math.abs(est - exact) <= 0.15,
        s"est=$est exact=$exact diverge")
    }
  }

  test("simhash: identical docs → hamming 0; near-dups close; random far") {
    val s = spark; import s.implicits._
    val docs = corpus(10).toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"), H.simhash(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // planted pairs (2i, 2i+1) differ by 1 of 40 tokens
    val nearHams = (0 until 10).map(i => ham(sh(2L * i), sh(2L * i + 1)))
    val farHams = for (i <- 0 until 9) yield ham(sh(2L * i), sh(2L * i + 2))
    assert(nearHams.max < farHams.min,
      s"near $nearHams should be closer than far $farHams")
  }

  test("simhash codegen expression agrees with a reference implementation") {
    val s = spark; import s.implicits._
    def refSimhash(hashes: Seq[Long]): Long = {
      val counts = Array.fill(64)(0)
      hashes.foreach { h =>
        (0 until 64).foreach { j =>
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1 }
      }
      (0 until 64).foldLeft(0L)((acc, j) =>
        if (counts(j) > 0) acc | (1L << j) else acc)
    }
    val df = Seq("the quick brown fox", "pack my box", "a").toDF("text")
    val rows = df.select(
        transform(H.tokens(col("text")), t => xxhash64(t)).as("hashes"),
        SimHash64(transform(H.tokens(col("text")), t => xxhash64(t))).as("sh"))
      .collect()
    rows.foreach { r =>
      val hashes = r.getSeq[Long](0)
      assert(r.getLong(1) === refSimhash(hashes))
    }
  }

  test("embed cosine: block-pair equi-join plan, result == naive all-pairs") {
    import graft.Tables
    import graft.functions.{VectorFunctions => V}
    val df = Dedup.dedupEmbedCosine(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"),
      s"block-pair join must not degrade to a nested-loop cartesian:\n$plan")
    // naive O(n²) cartesian reference — correctness baseline only
    val e = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), V.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", V.norm(col("v")))
    val naive = e.as("a")
      .join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", V.cosineWithNorms(V.dot(col("a.v"), col("b.v")),
        col("a.nrm"), col("b.nrm")))
      .filter(col("cos") >= 0.4)
      .select(col("a.vec_id"), col("b.vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = df.select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === naive)
  }

  test("ngram df-cut drops stop-shingle pairs but keeps planted near-dups") {
    val s = spark; import s.implicits._
    def body(i: Int): Seq[String] = {
      val r = new scala.util.Random(1000 + i)
      val vocab = ('a' to 'z').map(_.toString)
      Seq.fill(40)(vocab(r.nextInt(vocab.size)) + "x" + i.toString)
    }
    // 60 docs dominated by a shared 20-token stop phrase (every stop
    // shingle has df = 60 > NgramDfMax = 50): without the cut each
    // unrelated pair has J ≈ 0.83 and the output would hold ~1770
    // pairs; with the cut their intersection is empty. Docs 100/101
    // are planted near-dups through unique bodies (no stop tokens).
    val stop = (1 to 20).map(k => "stopword" + k)
    val stopRich = (0 until 60).map { i =>
      (i.toLong, (stop ++ Seq("uniq" + i, "tail" + i)).mkString(" "))
    }
    val planted = Seq(
      (100L, body(100).mkString(" ")),
      (101L, body(100).updated(10, "mutated").mkString(" ")))
    val dir = java.nio.file.Files.createTempDirectory("graft-dfcut").toString
    (stopRich ++ planted).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = Dedup.dedupNgramJaccard(spark, dir)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((100L, 101L)),
      s"expected only the planted pair to survive the df cut, got " +
        s"${pairs.size} pairs: ${pairs.take(5)}")
  }

  test("Zipfian corpus: posting-list bound holds and pairs equal the " +
      "naive join under the same cut") {
    val s = spark; import s.implicits._
    // Power-law corpus: a hot 12-token phrase lands in ~40% of 240
    // background docs (each of its shingles df ≈ 96 >> NgramDfMax),
    // 20 mid phrases land in ~30 docs each (df below the cut, so they
    // create real sub-τ partial overlaps the naive join must agree
    // on), and a Zipf-ish tail. 8 planted near-dup pairs have unique
    // bodies, so their Jaccard is cut-unaffected and stays >= 0.8.
    val rng = new scala.util.Random(42)
    val hot = (1 to 12).map("hot" + _)
    val mids = (0 until 20).map(k => (1 to 5).map(j => s"mid${k}_$j"))
    val background = (0 until 240).map { i =>
      val h = if (rng.nextDouble() < 0.4) hot else Seq.empty
      val m = Seq.fill(2 + rng.nextInt(3))(mids(rng.nextInt(mids.size))).flatten
      // Zipf-ish tail: token rank ~ 1/sqrt(u), vocab of ~900
      val tail = Seq.fill(10)("t" + (30.0 / math.sqrt(
        rng.nextDouble() max 1e-3)).toInt)
      (i.toLong, (h ++ m ++ tail).mkString(" "))
    }
    val planted = (0 until 8).flatMap { k =>
      val r = new scala.util.Random(9000 + k)
      val base = Seq.fill(30)("uniq" + k + "_" + r.nextInt(100000))
      Seq((800L + 2 * k, base.mkString(" ")),
        (801L + 2 * k, base.updated(15, "planted_mut" + k).mkString(" ")))
    }
    val docs = background ++ planted
    val dir = java.nio.file.Files.createTempDirectory("graft-zipf").toString
    docs.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val d = spark.read.parquet(s"$dir/documents.parquet")
    // (a) the fixture actually stresses: hot shingles exceed the cut…
    val preCut = d.select(col("doc_id"),
        explode(H.shingleHashes(col("text"), 3)).as("s"))
      .groupBy("s").count()
    val maxPre = preCut.agg(max("count")).as[Long].head()
    assert(maxPre > Dedup.NgramDfMax,
      s"fixture must plant a df > ${Dedup.NgramDfMax} shingle, max df $maxPre")
    // …and the surviving index's posting lists are bounded by the cut
    val maxPost = Dedup.shingleIndexOf(d)
      .groupBy("s").count().agg(max("count")).as[Long].head()
    assert(maxPost <= Dedup.NgramDfMax,
      s"df cut must bound every posting list, got $maxPost")

    // (b) engine pairs == naive all-pairs Jaccard under the same cut
    def shingles(t: String): Set[String] =
      t.split("\\s+").filter(_.nonEmpty).sliding(3)
        .filter(_.length == 3).map(_.mkString(" ")).toSet
    val all = docs.map { case (id, t) => id -> shingles(t) }
    val df = all.flatMap(_._2).groupBy(identity).map { case (k, v) =>
      k -> all.count(_._2.contains(k))
    }
    val cutSets = all.map { case (id, sh) =>
      id -> sh.filter(df(_) <= Dedup.NgramDfMax)
    }
    val naive = (for {
      (a, sa) <- cutSets; (b, sb) <- cutSets
      if a < b && sa.nonEmpty && sb.nonEmpty
      inter = sa.intersect(sb).size
      if inter > 0
      j = inter.toDouble / (sa.size + sb.size - inter)
      if j >= 0.5
    } yield (a, b)).toSet
    val engine = Dedup.dedupNgramJaccard(spark, dir)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(engine === naive,
      s"engine minus naive: ${(engine -- naive).take(5)}; " +
        s"naive minus engine: ${(naive -- engine).take(5)}")
    // cut-unaffected planted pairs are all found
    val plantedPairs = (0 until 8).map(k => (800L + 2 * k, 801L + 2 * k)).toSet
    assert(plantedPairs.subsetOf(engine),
      s"planted pairs missing: ${plantedPairs -- engine}")
  }

  test("substring spans equal an independent reference on planted copies") {
    val s = spark; import s.implicits._
    val k = Dedup.SubstrK
    // independent reference: count k-grams, merge consecutive repeated
    // positions, keep maximal spans >= the floor
    def refSpans(docs: Seq[(Long, String)]): Set[(Long, Int, Int, Int)] = {
      val grams = docs.flatMap { case (id, t) =>
        val ws = t.split("\\s+").filter(_.nonEmpty)
        (0 to ws.length - k).map(p => (id, p, ws.slice(p, p + k).mkString(" ")))
      }
      val cnt = grams.groupBy(_._3).view.mapValues(_.size).toMap
      grams.filter(g => cnt(g._3) >= 2).groupBy(_._1).flatMap {
        case (id, gs) =>
          val runs = gs.map(_._2).sorted
            .foldLeft(List.empty[(Int, Int)]) {
              case ((st, en) :: tail, p) if p == en + 1 => (st, p) :: tail
              case (acc, p) => (p, p) :: acc
            }
          runs.map { case (st, en) =>
            (id, st, en + k - 1, en + k - 1 - st + 1) }
      }.filter(_._4 >= Dedup.SubstrMinSpan).toSet
    }
    def uniq(id: Int, n: Int): Seq[String] =
      (0 until n).map(j => s"u${id}_$j")
    val phrase = (0 until 20).map(j => s"x$j")
    val docs: Seq[(Long, String)] =
      // background: globally unique tokens, no spans
      (0 until 10).map(i => (i.toLong, uniq(i, 40).mkString(" "))) ++ Seq(
        // near-dup pair: one token mutated mid-doc → prefix+suffix spans
        (100L, uniq(100, 50).mkString(" ")),
        (101L, uniq(100, 50).updated(25, "mut").mkString(" ")),
        // exact pair → whole-doc spans
        (200L, uniq(200, 30).mkString(" ")),
        (201L, uniq(200, 30).mkString(" ")),
        // within-doc repeat: phrase + filler + same phrase
        (300L, (phrase ++ uniq(300, 5) ++ phrase).mkString(" ")))
    val dir = java.nio.file.Files.createTempDirectory("graft-substr").toString
    docs.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.dedupSubstring(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    val want = refSpans(docs)
    assert(got === want,
      s"engine minus ref: ${(got -- want).take(5)}; " +
        s"ref minus engine: ${(want -- got).take(5)}")
    // sanity on the planted structure itself
    assert(want.contains((100L, 0, 24, 25)) && want.contains((100L, 26, 49, 24)),
      s"expected prefix+suffix spans for the mutated pair in $want")
    assert(want.contains((200L, 0, 29, 30)) && want.contains((201L, 0, 29, 30)))
    assert(want.contains((300L, 0, 19, 20)) && want.contains((300L, 25, 44, 20)))
  }

  test("substring k-gram pipeline runs once, not once per reference") {
    // grams feeds both the repeated-key aggregate and the join probe;
    // the persist makes each reference an InMemoryTableScan with zero
    // parquet scans outside the cached lineage (IncrementalSpec
    // walker — a textual scan count is useless on cached plans).
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def walk(p: SparkPlan): (Int, Int) = p match {
      case _: InMemoryTableScanExec => (0, 1)
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case _: FileSourceScanExec => (1, 0)
      case other =>
        val cs = other.children.map(walk)
        (cs.map(_._1).sum, cs.map(_._2).sum)
    }
    val df = Dedup.dedupSubstring(spark, sfDir)
    df.collect() // fill the cache, finalize AQE
    val (parquetScans, memScans) = walk(df.queryExecution.executedPlan)
    assert(memScans >= 2,
      s"expected >=2 cache reads (aggregate + join probe), got $memScans")
    assert(parquetScans == 0,
      s"expected 0 parquet scans outside the cache, got $parquetScans")
  }

  test("containment catches engulfment pairs Jaccard misses; ratios " +
      "match a driver-side recompute") {
    val s = spark; import s.implicits._
    // doc 1 (12 tokens) is fully QUOTED inside doc 2 (60 tokens):
    // containment from the short side = 1.0, Jaccard ≈ 10/58 ≈ 0.17 —
    // below C2's 0.5 τ, the structural miss this operator exists for.
    val short = (1 to 12).map(i => s"q$i").mkString(" ")
    val long = ((1 to 25).map(i => s"pre$i") ++ (1 to 12).map(i => s"q$i")
      ++ (1 to 23).map(i => s"post$i")).mkString(" ")
    val noise = (1 to 30).map(i => s"z$i").mkString(" ")
    val d = Seq((1L, short), (2L, long), (3L, noise)).toDF("doc_id", "text")
    val got = Dedup.containmentPairsOf(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length === 1, s"exactly the engulfment pair: ${got.toSeq}")
    val (a, b, cab, cba) = got.head
    assert((a, b) === ((1L, 2L)))
    // driver recompute: shingle sets, intersection / each side
    def sh(t: String) = t.split("\\s+").filter(_.nonEmpty)
      .sliding(3).map(_.mkString(" ")).toSet
    val (sa, sb) = (sh(short), sh(long))
    val inter = sa.intersect(sb).size.toDouble
    assert(math.abs(cab - inter / sa.size) < 1e-4, "contain_ab")
    assert(math.abs(cba - inter / sb.size) < 1e-4, "contain_ba")
    assert(cab === 1.0, "short side fully contained")
    assert(cba < 0.5, "long side is NOT mostly the quote")
    assert(jaccard(short, long) < 0.5,
      "fixture must be invisible to the C2 Jaccard cut")
    // and the Jaccard operator indeed misses it
    assert(Dedup.ngramPairsOf(d).collect().isEmpty)
  }

  test("components equal a driver-side union-find over the pair graph") {
    val pairs = Dedup.dedupNgramJaccard(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // reference union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(d => d -> find(d)).toMap
    val expSizes = expected.values.groupBy(identity).map { case (r, v) => r -> v.size }

    val got = Dedup.dedupComponents(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSet === expected.keySet)
    got.foreach { case (doc, rep, n) =>
      assert(rep === expected(doc), s"doc $doc: rep $rep")
      assert(n === expSizes(rep).toLong, s"component $rep size")
    }
  }

  test("components are transitive: a~b~c chains into one cluster") {
    val s = spark; import s.implicits._
    val base = {
      val r = new scala.util.Random(5)
      val vocab = ('a' to 'z').map(_.toString)
      Vector.fill(40)(vocab(r.nextInt(vocab.size)) + "q")
    }
    def swapBlock(t: Vector[String], at: Int, tag: String): Vector[String] =
      (0 until 8).foldLeft(t)((acc, k) => acc.updated(at + k, s"sw$tag$k"))
    // doc1 ~ doc0 and doc2 ~ doc1 (J ≈ 0.58 each), but doc2 !~ doc0
    // (J ≈ 0.31 < τ) — only transitivity links 0 and 2.
    val docs = Seq(
      (0L, base.mkString(" ")),
      (1L, swapBlock(base, 0, "a").mkString(" ")),
      (2L, swapBlock(swapBlock(base, 0, "a"), 20, "b").mkString(" ")),
      (3L, Vector.tabulate(40)(i => "unrelated" + i).mkString(" ")))
    val dir = java.nio.file.Files.createTempDirectory("graft-cc").toString
    docs.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairSet = Dedup.dedupNgramJaccard(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet === Set((0L, 1L), (1L, 2L)),
      s"corpus must form exactly the 0-1-2 chain, got $pairSet")
    val comps = Dedup.dedupComponents(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(comps === Set((0L, 0L, 3L), (1L, 0L, 3L), (2L, 0L, 3L)))
  }

  test("componentLabels: 200-hop chain converges in O(log d) star rounds") {
    val s = spark; import s.implicits._
    val n = 200
    val pairs = (0 until n).map(i => (i.toLong, i + 1L))
      .toDF("doc_a", "doc_b").persist()
    // tailMaxEdges = 0 refuses the driver union-find fast path: this
    // test pins the DISTRIBUTED algorithm's logarithmic round bound
    val (labels, rounds) = Dedup.componentLabelsWithRounds(pairs, 0L)
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
    labels.unpersist()
    assert(got.length === n + 1)
    assert(got.forall(_._2 == 0L),
      s"every chain node must label to 0: ${got.filter(_._2 != 0L).take(5)}")
    // plain min-label propagation needs d = 200 rounds here; the
    // large-star/small-star alternation must be logarithmic
    assert(rounds <= 12,
      s"$rounds star rounds for a $n-hop chain is not O(log d)")
    // the default-cap fast path (driver union-find) must agree with
    // the distributed star rounds row-for-row
    val (labelsFast, roundsFast) = Dedup.componentLabelsWithRounds(pairs)
    assert(roundsFast === 0, "chain fits the cap: fast path expected")
    val gotFast = labelsFast.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    labelsFast.unpersist(); pairs.unpersist()
    assert(gotFast.toSeq === got.sorted.toSeq,
      "driver union-find and star rounds must emit identical labels")
  }

  test("componentLabels: random graph (dups, self-loops, any orientation)" +
      " matches union-find") {
    val s = spark; import s.implicits._
    val rng = new scala.util.Random(11)
    val raw = Seq.fill(250)(
      (rng.nextInt(300).toLong, rng.nextInt(300).toLong))
    val pairs = raw.toDF("doc_a", "doc_b").persist()
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    raw.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(d => d -> find(d)).toMap
    // distributed star rounds (cap 0) and the driver fast path must
    // BOTH match the reference union-find
    val (labelsDist, _) = Dedup.componentLabelsWithRounds(pairs, 0L)
    val gotDist = labelsDist.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    labelsDist.unpersist()
    assert(gotDist === expected)
    val (labels, rounds) = Dedup.componentLabelsWithRounds(pairs)
    assert(rounds === 0, "random graph fits the cap: fast path expected")
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    labels.unpersist(); pairs.unpersist()
    assert(got === expected)
  }

  test("componentsTailCapForHeap: floor, linear region, ceiling, and " +
      "the live cap derives from the actual driver heap") {
    // floor: a tiny heap still affords 100k pairs
    assert(Dedup.componentsTailCapForHeap(64L << 20) === 100000L)
    // linear region: 5% of heap at 96 bytes/pair
    val eightGiB = 8L << 30
    assert(Dedup.componentsTailCapForHeap(eightGiB) ===
      eightGiB / 20 / 96)
    assert(Dedup.componentsTailCapForHeap(eightGiB) > 4000000L)
    // ceiling: an enormous heap is capped at 16M pairs
    assert(Dedup.componentsTailCapForHeap(1L << 50) === 16000000L)
    // the live cap is the derivation applied to the real max heap —
    // both sides of the derived cap are reachable via the
    // tailMaxEdges seam (the two tests above force the distributed
    // path with 0 and take the fast path under the default)
    assert(Dedup.ComponentsTailMaxEdges ===
      Dedup.componentsTailCapForHeap(Runtime.getRuntime.maxMemory()))
  }

  test("dedup queries run against testdata; planted dups found") {
    val ngram = Dedup.dedupNgramJaccard(spark, sfDir)
    assert(ngram.count() > 0, "sf0.001 should contain planted near-dups")
    val lsh = Dedup.dedupMinhashLsh(spark, sfDir)
    val lshPairs = lsh.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ngramPairs = ngram.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // banded LSH at est_j>=0.5 must recover the J>=0.9 planted pairs
    assert(ngramPairs.subsetOf(lshPairs),
      s"LSH missed: ${ngramPairs -- lshPairs}")
  }

  test("dedup_best_rep: same clusters as C6, exactly one rep per " +
      "cluster, and the rep maximizes (quality, -doc_id)") {
    val best = Dedup.dedupBestRep(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(best.nonEmpty, "fixture has planted near-dups")
    // cluster membership must be identical to dedup_components
    // (the election changes WHO represents, never the partition)
    val comp = Dedup.dedupComponents(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap // doc -> min-id label
    assert(best.map(_._1).toSet === comp.keySet, "same clustered docs")
    val byCluster = best.groupBy(b => comp(b._1))
    byCluster.foreach { case (cid, members) =>
      val reps = members.filter(_._4)
      assert(reps.length == 1, s"cluster $cid: ${reps.length} reps")
      val rep = reps.head
      assert(members.forall(_._2 == rep._1),
        s"cluster $cid: every member must point at the elected rep")
      // rep wins on (quality DESC, doc_id ASC) — rounded quality is
      // a valid witness here because ties break toward smaller id
      members.foreach { m =>
        assert(m._3 < rep._3 || (m._3 == rep._3 && m._1 >= rep._1),
          s"cluster $cid: member $m beats rep $rep")
      }
    }
  }

  test("corpus_novelty: the first doc is fully novel, Σ n_novel == " +
    "distinct shingles, exact duplicates read novelty 0") {
    val s = spark; import s.implicits._
    val rows = Dedup.corpusNovelty(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3)))
    val first = rows.minBy(_._1)._2
    assert(first._1 == first._2 && first._3 == 1.0,
      "the lowest doc_id owns every one of its shingles")
    val sh = Dedup.noveltyShingles(
      graft.Tables(spark, sfDir).documents)
    assert(rows.map(_._2._2).sum == sh.select("s").distinct().count(),
      "every distinct shingle is novel in exactly one doc")
    rows.foreach { case (id, (n, nov, ratio)) =>
      assert(nov <= n && ratio >= 0.0 && ratio <= 1.0, s"doc $id")
    }
    // a planted byte-identical copy of an earlier doc reads 0.0
    val fx = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
    val shFx = Dedup.noveltyShingles(fx).persist()
    val firstFx = shFx.groupBy(col("s"))
      .agg(org.apache.spark.sql.functions.min(col("doc_id")).as("fd"))
    val got = Dedup.noveltyScore(shFx, firstFx).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got == Map(1L -> 1.0, 2L -> 0.0, 3L -> 1.0), got.toString)
  }
}
