package graft

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions => H, VectorFunctions}
import graft.operators.{Cluster, Dedup, Graph, Relational, Similarity}

/** Machine-auditable verdicts for the 12 `[R]` registry entries — the
  * sketch/LSH/FP-iteration/BPE queries the DuckDB oracle cannot hash-gate
  * (SURVEY §5). Each gets the SAME property contracts its ScalaTest
  * spec enforces (ApproxSpec / DedupSpec / SimilaritySpec /
  * ClusterSpec / StreamsSpec), evaluated against the given sf dir and
  * written as one JSON artifact (`CORRECTNESS_R.json`, committed per
  * round), plus a double-run determinism check: every query executed
  * twice (cache cleared between) must produce identical canonical
  * hashes (columns sorted by name, rows sorted — the tools/compare.py
  * canonicalization), ruling out partition-order-dependent output.
  *
  * Usage: `sbt "runMain graft.VerifyR /root/testdata/sf0.001 CORRECTNESS_R.json"`
  * (sf0.001: the exact references are driver-side all-pairs
  * recomputes, the spec-scale contract).
  */
object VerifyR {

  final case class Prop(name: String, value: Double, bound: String,
      pass: Boolean)

  /** compare.py-style canonical hash: columns sorted by name, every
    * value rendered deterministically, rows sorted lexicographically.
    * Rendered values are joined with an ESCAPED unit separator
    * (\u001f; backslash-escaped if it ever appears in a value), so
    * the joined line is a bijection of the row — a raw separator
    * could collide distinct rows whose values embed it, and no
    * separator at all collides ("ab","c") with ("a","bc")
    * (ADVICE r11). */
  private def canonicalHash(df: DataFrame): String = {
    val cols = df.columns.sorted
    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("\u001f", "\\u001f")
    def render(v: Any): String = v match {
      case null => "NULL"
      case s: Seq[_] => s.map(render).mkString("[", ",", "]")
      case d: Double => java.lang.Double.toString(d)
      case f: Float => java.lang.Float.toString(f)
      case b: Array[Byte] => b.map("%02x".format(_)).mkString
      case x => x.toString
    }
    val lines = df.select(cols.map(col).toIndexedSeq: _*).collect()
      .map(r => (0 until r.length).map(i => esc(render(r.get(i))))
        .mkString("\u001f"))
      .sorted
    val md = MessageDigest.getInstance("MD5")
    lines.foreach(l => md.update((l + "\n").getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  private def doubleRunEqual(spark: SparkSession, sfDir: String,
      name: String): Boolean = {
    val h1 = canonicalHash(SparkEntry.queries(name)(spark, sfDir))
    spark.catalog.clearCache()
    val h2 = canonicalHash(SparkEntry.queries(name)(spark, sfDir))
    spark.catalog.clearCache()
    h1 == h2
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outPath) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results =
      scala.collection.mutable.LinkedHashMap.empty[String, Seq[Prop]]

    // ---- q23_approx_percentiles: ≤1% relative error per group/quantile
    {
      val exact = Relational.q23Percentiles(spark, sfDir).collect()
        .map(r => r.getString(0) ->
          Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
      val approx = Relational.q23ApproxPercentiles(spark, sfDir).collect()
      val errs = approx.flatMap { r =>
        exact(r.getString(0)).zip(Seq(r.getDouble(1), r.getDouble(2),
          r.getDouble(3))).map { case (e, a) => math.abs(a - e) / math.abs(e) }
      }
      val maxErr = if (errs.isEmpty) Double.NaN else errs.max
      results("q23_approx_percentiles") = Seq(
        Prop("groups_complete", approx.length.toDouble,
          s"== ${exact.size}", approx.length == exact.size),
        Prop("max_rel_err", maxErr, "<= 0.01", maxErr <= 0.01))
    }

    // ---- q12_approx_distinct: ≤5% relative error (rsd = 2%)
    {
      val exact = Relational.q12Distinct(spark, sfDir).collect()
        .map(r => r.getString(0) ->
          Seq(r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val approx = Relational.q12ApproxDistinct(spark, sfDir).collect()
      val errs = approx.flatMap { r =>
        exact(r.getString(0)).zip(Seq(r.getLong(1), r.getLong(2),
          r.getLong(3))).map { case (e, a) =>
            math.abs(a - e).toDouble / math.max(1.0, 0.05 * e) * 0.05 }
      }
      val maxErr = if (errs.isEmpty) Double.NaN else errs.max
      results("q12_approx_distinct") = Seq(
        Prop("groups_complete", approx.length.toDouble,
          s"== ${exact.size}", approx.length == exact.size),
        Prop("max_rel_err", maxErr, "<= 0.05", maxErr <= 0.05))
    }

    // ---- dedup_minhash_lsh: recall of exact J>=0.8 trigram-Jaccard
    // pairs (P(candidate | J=0.8) >= 0.9998 per the banding analysis)
    {
      val exactHi = Dedup.dedupNgramJaccard(spark, sfDir).collect()
        .filter(_.getDouble(2) >= 0.8)
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val lsh = Dedup.dedupMinhashLsh(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall =
        if (exactHi.isEmpty) 1.0
        else (exactHi & lsh).size.toDouble / exactHi.size
      results("dedup_minhash_lsh") = Seq(
        Prop("true_pairs_present", exactHi.size.toDouble, ">= 1",
          exactHi.nonEmpty),
        Prop("recall_of_exact_j08_pairs", recall, ">= 0.95",
          recall >= 0.95))
    }

    // ---- dedup_simhash: the chunk pigeonhole is COMPLETE for
    // hamming<=3 — the reported pair set must EQUAL a driver-side
    // all-pairs hamming scan over the same per-doc signatures.
    {
      val sh = Tables(spark, sfDir).documents
        .select(col("doc_id"), H.simhash(col("text")).as("sh")).collect()
        .map(r => r.getLong(0) -> r.getLong(1))
      val expected = (for {
        (a, ha) <- sh; (b, hb) <- sh
        if a < b && java.lang.Long.bitCount(ha ^ hb) <= 3
      } yield (a, b)).toSet
      val got = Dedup.dedupSimhash(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      results("dedup_simhash") = Seq(
        Prop("pairs_equal_allpairs_scan",
          if (expected == got) 1.0 else 0.0, "== 1 (set equality)",
          expected == got))
    }

    // ---- stream_neardup: batch-mode state machine == dedup_simhash
    {
      val batch = Dedup.dedupSimhash(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val stream = SparkEntry.queries("stream_neardup")(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      results("stream_neardup") = Seq(
        Prop("pairs_equal_batch_simhash",
          if (stream == batch) 1.0 else 0.0, "== 1 (set equality)",
          stream == batch))
    }

    // ---- ann_lsh: recall@5 vs exact brute force
    {
      val bf = Similarity.annBruteforce(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val lsh = Similarity.annLsh(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (bf & lsh).size.toDouble / bf.size
      results("ann_lsh") = Seq(
        Prop("recall_at_5_vs_bruteforce", recall, ">= 0.6", recall >= 0.6))
    }

    // ---- embed_cluster: complete assignment + Lloyd cost descent
    {
      val nVecs = Tables(spark, sfDir).embeddings.count()
      val out = Cluster.embedCluster(spark, sfDir)
      val n = out.count()
      val v = Tables(spark, sfDir).embeddings
        .select(col("vec_id"),
          VectorFunctions.toDouble(col("embedding")).as("v"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
        .toMap
      def d2(a: Array[Double], b: Seq[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
        s
      }
      def cost(assign: Map[Long, Int]): Double = {
        val cents = assign.groupBy(_._2).map { case (c, m) =>
          val members = m.keys.map(v).toSeq
          val dim = members.head.length
          c -> (0 until dim).map(i => members.map(_(i)).sum / members.length)
        }
        assign.map { case (id, c) => d2(v(id), cents(c)) }.sum
      }
      val a1 = Cluster.kmeansAssignments(spark, sfDir, iters = 1)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val a5 = Cluster.kmeansAssignments(spark, sfDir, iters = 5)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val (c1, c5) = (cost(a1), cost(a5))
      results("embed_cluster") = Seq(
        Prop("all_vectors_assigned", n.toDouble, s"== $nVecs", n == nVecs),
        Prop("lloyd_cost_ratio_5_over_1", c5 / c1, "<= 1.001",
          c5 <= c1 * 1.001 + 1e-9))
    }

    // ---- embed_pca: unit direction, dominance, driver-recompute match
    {
      val e = Tables(spark, sfDir).embeddings
        .select(col("vec_id"),
          VectorFunctions.toDouble(col("embedding")).as("v"))
      val xs = e.collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
      val dir = Cluster.powerDirection(e)
      val norm = dir.map(x => x * x).sum
      def rayleigh(vv: Array[Double]): Double = {
        val num = xs.values.map { x =>
          var d = 0.0; var i = 0
          while (i < x.length) { d += x(i) * vv(i); i += 1 }
          d * d
        }.sum
        num / vv.map(x => x * x).sum
      }
      val rv = rayleigh(dir)
      val rnd = new scala.util.Random(11)
      val dominates = (1 to 20).forall { _ =>
        rv >= rayleigh(Array.fill(dir.length)(rnd.nextGaussian())) - 1e-9
      }
      val got = Cluster.embedPca(spark, sfDir).collect()
      val maxDev = got.map { r =>
        val x = xs(r.getLong(0))
        var p = 0.0; var i = 0
        while (i < x.length) { p += x(i) * dir(i); i += 1 }
        var x2 = 0.0; i = 0
        while (i < x.length) { x2 += x(i) * x(i); i += 1 }
        val resid = math.sqrt(math.max(x2 - p * p, 0.0))
        math.max(math.abs(r.getDouble(1) - p), math.abs(r.getDouble(2) - resid))
      }.max
      results("embed_pca") = Seq(
        Prop("direction_unit_norm_dev", math.abs(norm - 1.0), "< 1e-9",
          math.abs(norm - 1.0) < 1e-9),
        Prop("dominates_random_probes", if (dominates) 1.0 else 0.0,
          "== 1", dominates),
        Prop("max_proj_resid_dev_vs_driver", maxDev, "<= 5e-5",
          maxDev <= 5e-5))
    }

    // ---- graph_kcore: set-equality vs an exact sequential peel
    // (the textbook min-degree removal) over the same co-purchase
    // edges, rebuilt driver-side.
    {
      val li = Tables(spark, sfDir).lineitem
        .select(col("l_orderkey"), col("l_partkey")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val adj = scala.collection.mutable.Map
        .empty[Long, scala.collection.mutable.Set[Long]]
      li.groupBy(_._1).values.foreach { grp =>
        val ps = grp.map(_._2).distinct
        for (i <- ps.indices; j <- i + 1 until ps.size) {
          adj.getOrElseUpdate(ps(i),
            scala.collection.mutable.Set.empty) += ps(j)
          adj.getOrElseUpdate(ps(j),
            scala.collection.mutable.Set.empty) += ps(i)
        }
      }
      val deg = scala.collection.mutable.Map(
        adj.toSeq.map { case (n, s) => n -> s.size }: _*)
      val remaining = scala.collection.mutable.Set(adj.keys.toSeq: _*)
      val core = scala.collection.mutable.Map.empty[Long, Long]
      var k = 0
      while (remaining.nonEmpty) {
        val mind = remaining.iterator.map(deg).min
        if (mind > k) k = mind
        val queue = scala.collection.mutable.Queue(
          remaining.filter(deg(_) <= k).toSeq: _*)
        while (queue.nonEmpty) {
          val v = queue.dequeue()
          if (remaining.remove(v)) {
            core(v) = k.toLong
            adj(v).foreach { u =>
              if (remaining.contains(u)) {
                deg(u) -= 1
                if (deg(u) <= k) queue.enqueue(u)
              }
            }
          }
        }
      }
      val got = Graph.graphKcore(spark, sfDir).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      val equal = got == core.toMap
      results("graph_kcore") = Seq(
        Prop("nodes_present", got.size.toDouble, ">= 1", got.nonEmpty),
        Prop("coreness_equals_exact_peel",
          if (equal) 1.0 else 0.0, "== 1 (map equality)", equal))
    }

    // ---- bpe_train: ranks consecutive, merge counts non-increasing
    // (a BPE invariant: no pair's count ever grows, and a new pair
    // (ab, c)'s count is bounded by pre-merge (b, c) ≤ the chosen
    // best), every vocab word reconstructs, weighted piece mass
    // strictly compresses vs chars and is monotone in the merge
    // prefix.
    {
      import graft.functions.{BpeQueries => B}
      val merges = B.bpeTrain(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3)))
      val ranksOk = merges.map(_._1).toSeq == (1L to merges.length).toSeq
      val nonInc = merges.map(_._4).sliding(2).forall {
        case Array(a, b) => b <= a; case _ => true }
      val vocab = B.vocabHead(spark, sfDir).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      val table = merges.map(m => (m._2, m._3)).toSeq
      val recon = vocab.forall { case (w, _) =>
        B.encode(w, table).mkString == w + B.EndMark }
      def mass(k: Int) = vocab.map { case (w, c) =>
        B.encode(w, table.take(k)).length.toLong * c }.sum
      val (m0, mHalf, mAll) =
        (mass(0), mass(table.length / 2), mass(table.length))
      results("bpe_train") = Seq(
        Prop("ranks_consecutive", if (ranksOk) 1.0 else 0.0, "== 1",
          ranksOk),
        Prop("merge_counts_non_increasing", if (nonInc) 1.0 else 0.0,
          "== 1", nonInc),
        Prop("vocab_reconstructs", if (recon) 1.0 else 0.0, "== 1", recon),
        Prop("compression_monotone",
          if (mAll < m0 && mAll <= mHalf && mHalf <= m0) 1.0 else 0.0,
          "== 1 (mass(K) < mass(0), monotone)",
          mAll < m0 && mAll <= mHalf && mHalf <= m0))
    }

    // ---- bpe_apply: exact map-equality vs a driver-side re-encode
    // of every distinct word, plus per-doc piece bounds
    // (tokens ≤ pieces ≤ chars + tokens).
    {
      import graft.functions.{BpeQueries => B}
      val table = B.trainedMerges(spark, sfDir).map(m => (m._1, m._2))
      val docs = Tables(spark, sfDir).documents
        .select(col("doc_id"), col("text")).collect()
        .map(r => r.getLong(0) -> r.getString(1))
      val expected = docs.map { case (id, text) =>
        val ws = text.split("\\s+").toSeq
        id -> (ws.length.toLong,
          ws.map(w => B.encode(w, table).length.toLong).sum)
      }.toMap
      val got = B.bpeApply(spark, sfDir).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val equal = got == expected
      val bounds = got.forall { case (_, (t, p)) => t <= p }
      results("bpe_apply") = Seq(
        Prop("equals_driver_reencode", if (equal) 1.0 else 0.0,
          "== 1 (map equality)", equal),
        Prop("pieces_at_least_tokens", if (bounds) 1.0 else 0.0,
          "== 1", bounds))
    }

    // ---- pack_bestfit: exact equality vs a driver BFD recompute,
    // capacity, the fit property (≤ 1 half-empty bin per shard), and
    // the token-mass lower bound on bin counts.
    {
      import graft.operators.{Sampling => S}
      val got = S.packBestfit(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      val assigns = got.map(x => x._1 -> (x._2, x._3, x._4, x._5)).toMap
      // independent driver recompute from raw text: tokens, shard
      // dial, per-(source, shard) BFD
      val raw = Tables(spark, sfDir).documents
        .select(col("doc_id"), col("source"), col("text")).collect()
        .map(r => (r.getLong(0), r.getString(1),
          "\\S+".r.findAllMatchIn(r.getString(2)).length.toLong))
        .filter(_._3 <= S.PackBudget)
      val nShards = math.max(1L, raw.length.toLong / S.PackShardTarget)
      val expected = raw.groupBy(d => (d._2, d._1 % nShards)).flatMap {
        case ((src, sh), docs) =>
          S.bestFitDecreasing(docs.map(d => (d._1, d._3)).toSeq,
            S.PackBudget).map { case (id, bin) =>
            id -> (src, sh, bin, docs.find(_._1 == id).get._3) }
      }
      val equal = assigns == expected
      val binFills = got.groupBy(x => (x._2, x._3, x._4))
        .map { case (k, docs) => k -> docs.map(_._5).sum }
      val capOk = binFills.values.forall(_ <= S.PackBudget)
      val fitOk = binFills.toSeq.groupBy { case ((s, sh, _), _) => (s, sh) }
        .forall { case (_, bins) =>
          bins.count(_._2 < S.PackBudget / 2) <= 1 }
      val lowerOk = got.groupBy(x => (x._2, x._3)).forall {
        case (k, docs) =>
          val bins = docs.map(_._4).distinct.length.toLong
          val minBins = (docs.map(_._5).sum + S.PackBudget - 1) /
            S.PackBudget
          bins >= minBins
      }
      results("pack_bestfit") = Seq(
        Prop("equals_driver_bfd", if (equal) 1.0 else 0.0,
          "== 1 (map equality)", equal),
        Prop("bins_within_budget", if (capOk) 1.0 else 0.0, "== 1",
          capOk),
        Prop("at_most_one_half_empty_bin_per_shard",
          if (fitOk) 1.0 else 0.0, "== 1", fitOk),
        Prop("bin_count_meets_token_mass_bound",
          if (lowerOk) 1.0 else 0.0, "== 1", lowerOk))
    }

    // ---- double-run determinism for every [R] entry
    val rNames = Seq("q23_approx_percentiles", "q12_approx_distinct",
      "dedup_minhash_lsh", "dedup_simhash", "stream_neardup", "ann_lsh",
      "embed_cluster", "embed_pca", "graph_kcore", "bpe_train",
      "bpe_apply", "pack_bestfit")
    val doubleRun = rNames.map(n => n -> doubleRunEqual(spark, sfDir, n)).toMap

    def jn(d: Double): String =
      if (d.isNaN) "null"
      else if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString
      else f"$d%.6g"
    val json = rNames.map { name =>
      val props = results(name)
      val propJson = props.map(p =>
        s"""{"name":"${p.name}","value":${jn(p.value)},""" +
          s""""bound":"${p.bound}","pass":${p.pass}}""").mkString("[", ",", "]")
      val all = props.forall(_.pass) && doubleRun(name)
      s""""$name":{"properties":$propJson,""" +
        s""""double_run_hash_equal":${doubleRun(name)},"pass":$all}"""
    }.mkString("{", ",", s""","sf_dir":"$sfDir"}""")
    Files.writeString(Paths.get(outPath), json)
    val failed = rNames.filter(n =>
      !(results(n).forall(_.pass) && doubleRun(n)))
    println(s"[verifyR] ${rNames.size - failed.size}/${rNames.size} pass" +
      (if (failed.nonEmpty) s"; FAILED: ${failed.mkString(",")}" else ""))
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
