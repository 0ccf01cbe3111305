package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers (SURVEY §4). AQE's skew-join splitting
  * handles *join* skew at runtime, but aggregation skew on a hot key
  * and joins against a non-splittable build side still need salting —
  * the standard 100 TB pattern made reusable here.
  *
  * Correctness note: two-phase double sums reassociate FP addition,
  * so salted results for double columns agree with unsalted ones only
  * up to FP noise — same caveat as any partial aggregation; use exact
  * types (long/decimal) when byte-equality matters.
  */
object Skew {

  /** Two-phase salted sum: phase 1 aggregates (key, salt) — spreading
    * a hot key over `salts` reducers — phase 2 merges per key. The
    * salt derives from a per-row id, not rand(), so plans stay
    * deterministic and re-executable (a failed stage retry with
    * rand() salts would double-count partial rows). */
  def saltedSum(df: DataFrame, key: Column, value: Column,
      salts: Int): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    salted
      .groupBy(key.as("k"), col("_salt"))
      .agg(sum(value).as("_partial"))
      .groupBy(col("k"))
      .agg(sum(col("_partial")).as("sum_value"))
  }

  /** Salted join for a skewed probe side against a small-ish build
    * side that is still too big (or too row-multiplying) to
    * broadcast: the probe side gets a random-ish salt, the build side
    * is replicated once per salt value, and the join key becomes
    * (key, salt) — splitting each hot key's row block across `salts`
    * tasks. Build-side cost: |build| × salts rows through the
    * shuffle, the price of parallelizing the hot keys. */
  def saltedJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String, salts: Int): DataFrame = {
    val saltedProbe = probe.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val replicatedBuild = build.withColumn("_salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    saltedProbe.join(replicatedBuild,
        saltedProbe(probeKey) === replicatedBuild(buildKey) &&
          saltedProbe("_salt") === replicatedBuild("_salt"))
      .drop("_salt")
  }
}
