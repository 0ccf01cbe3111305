package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY §2C adjunct — entity resolution (record linkage): find the
  * near-identical catalog names an exact dedup misses ("cold anvil" /
  * "old anvil"), the blocking + edit-distance-verify pass every
  * master-data pipeline runs before merging records.
  *
  * Scale shape: pair work runs over the DISTINCT-name domain, never
  * the row stream — names aggregate first (two-phase count groupBy),
  * so a 100 TB catalog with a bounded name vocabulary pays pair cost
  * on |vocab|, not |rows|. Blocking is the LENGTH BAND
  * |len_a − len_b| ≤ τ — a COMPLETE filter (an edit distance ≤ τ
  * cannot change length by more than τ), realized as a plain
  * equi-join: the probe side explodes each name to the 2τ+1 lengths
  * it can match and the join keys on the build side's own length, so
  * every candidate pair matches exactly once and the plan is a hash
  * join (no Cartesian, no BNLJ). Verify = `levenshtein` — the
  * standard unit-cost DP in both engines, an exact INTEGER ⇒ full
  * hash gate. */
object EntityRes {

  /** Edit-distance match threshold (and the length-band radius). */
  val ErTau = 3

  /** C: near-identical part-name pairs with row counts per side. */
  def partEr(spark: SparkSession, dir: String): DataFrame =
    erPairsOf(Tables(spark, dir).part.select(col("p_name").as("name")))

  /** Blocked ER pairs over any single-column (name) frame. */
  def erPairsOf(rows: DataFrame): DataFrame = {
    // the distinct-name table feeds both join sides — persist, or the
    // full row scan recomputes per side (no-subtree-dedup)
    val names = rows.groupBy(col("name")).agg(count(lit(1)).as("n"))
      .select(col("name"), length(col("name")).as("len"), col("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probe = names.select(col("name").as("name_b"),
      col("len").as("len_b"), col("n").as("n_b"),
      explode(sequence(col("len") - ErTau, col("len") + ErTau)).as("k"))
    val cand = names.select(col("name").as("name_a"),
        col("len").as("len_a"), col("n").as("n_a"), col("len").as("k"))
      .join(probe, Seq("k"))
      .filter(col("name_a") < col("name_b"))
    cand.withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= ErTau)
      .select(col("name_a"), col("name_b"), col("len_a"), col("len_b"),
        col("n_a"), col("n_b"), col("dist"))
      .orderBy(col("name_a"), col("name_b"))
  }

  /** Safety bound on [[erResolveOf]]'s label-propagation rounds —
    * name-variant clusters have tiny diameter; the throw is the
    * componentLabels non-convergence discipline. */
  val ErResolveMaxIters = 40

  /** C: entity RESOLUTION — er_blocking's matched pairs closed into
    * entities: connected components over the match graph (matching
    * is transitive at merge time even though edit distance is not —
    * "cold anvil" ~ "old anvil" ~ "bold anvil" must land in ONE
    * master record), with the lexicographically smallest name as the
    * canonical representative and per-entity name/row rollups. The
    * merge half of the master-data pipeline er_blocking starts.
    *
    * Shape: min-label propagation over the (vocabulary-sized) match
    * graph — lbl'(v) = min(lbl(v), min of neighbor labels), seeded
    * with each name itself, one equi-join + one groupBy per round
    * (no O(|V|) broadcast — GraphIterSpec class), per-round
    * checkpoint + FULL-action changed-row count probe (string labels
    * can't ride the Σ probe; a count-diff join is the same
    * every-partition action), rounds bounded by cluster diameter
    * (tiny for edit-variants). Components here are SMALL by
    * construction (name variants, never percolation), so the DuckDB
    * reach-CTE oracle is safe (CLAUDE.md) and exact string algebra
    * gives the full hash gate. */
  def partErResolve(spark: SparkSession, dir: String): DataFrame =
    erResolveOf(Tables(spark, dir).part.select(col("p_name").as("name")))

  /** Entity table over any single-column (name) frame. */
  def erResolveOf(rows: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.storage.StorageLevel
    val spark = rows.sparkSession
    val names = rows.groupBy(col("name")).agg(count(lit(1)).as("n_rows"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pairs = erPairsOf(rows).select(col("name_a"), col("name_b"))
    val edges = pairs.select(col("name_a").as("u"), col("name_b").as("v"))
      .unionAll(pairs.select(col("name_b"), col("name_a")))
      .toDF("u", "v")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val reliable = spark.sparkContext.getCheckpointDir.isDefined
    def snap(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
    def freeRdd(df: DataFrame): Unit =
      df.queryExecution.logical.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.foreach { rdd =>
        rdd.unpersist(blocking = false)
        // delete retired rounds' reliable checkpoint FILES too — the
        // Graph.kcore freeRdd discipline (otherwise one O(|V|) frame
        // per round accretes on disk for the application lifetime)
        rdd.getCheckpointFile.foreach { f =>
          try {
            val p = new org.apache.hadoop.fs.Path(f)
            p.getFileSystem(spark.sparkContext.hadoopConfiguration)
              .delete(p, true)
            ()
          } catch { case _: Throwable => () } // best-effort cleanup
        }
      }
    var lbl = snap(names.select(col("name").as("node"),
      col("name").as("lbl")))
    var iter = 0
    var converged = false
    while (!converged && iter < ErResolveMaxIters) {
      val nbrMin = edges
        .join(lbl.select(col("node").as("v"), col("lbl").as("l")), "v")
        .groupBy(col("u").as("node")).agg(min(col("l")).as("nl"))
      val next = snap(lbl.join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("lbl"), coalesce(col("nl"), col("lbl"))).as("lbl")))
      // FULL action over every partition: changed-row count (string
      // labels can't ride the decimal Σ probe componentLabels uses)
      val changed = next.as("n")
        .join(lbl.as("o"), col("n.node") === col("o.node"))
        .filter(col("n.lbl") =!= col("o.lbl")).count()
      freeRdd(lbl)
      converged = changed == 0L
      lbl = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"er_resolve did not converge in $ErResolveMaxIters rounds")
    val w = Window.partitionBy(col("entity_rep"))
    val out = lbl.join(names, col("node") === col("name"))
      .select(col("name"), col("lbl").as("entity_rep"), col("n_rows"))
      .withColumn("grp_names", count(lit(1)).over(w))
      .withColumn("grp_rows", sum(col("n_rows")).over(w))
      .orderBy(col("name"))
    edges.unpersist(blocking = false)
    out
  }
}
