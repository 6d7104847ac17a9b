package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit SKEW-SALTED inner equi-join — the classic hot-key scatter
  * for fact-dim joins, as a reusable operator: the probe (fact) side
  * gets a deterministic salt shard in `[0, salt)`, the build (dim) side
  * is replicated once per shard, and the join runs on
  * `(key, shard)` — so a hot key's probe rows spread over up to `salt`
  * shuffle partitions instead of hammering one.
  *
  * Results are EXACT for inner equi-joins: every probe row carries ONE
  * shard, and every build row exists in EVERY shard exactly once, so
  * each (probe row, matching build row) pair meets exactly once.
  * Duplicate keys on either side multiply matches exactly as a plain
  * join does (property-tested against one on random multisets).
  *
  * Cost model: build side shuffles ×`salt` (size it like a broadcast
  * decision — salt a MB-scale dim, never a second fact table); probe
  * side cost is unchanged (one shuffle either way). Spark's AQE can
  * split skewed SMJ partitions at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`), but only after the probe
  * shuffle has materialized the hot partition; the explicit salt
  * prevents the hot partition from ever existing, works for shapes AQE
  * won't rewrite, and composes with downstream per-(key, shard)
  * partial aggregation.
  *
  * The salt is a deterministic hash of the probe row's full content
  * (xxhash64, seed 42) rather than a random number: re-executed tasks
  * (stage retries, speculative attempts) must re-derive the SAME shard
  * for every row, or a retry could double- or zero-count pairs. A
  * probe row duplicated n times lands its n copies in one shard —
  * harmless for correctness, and real skew comes from many DISTINCT
  * rows sharing a key, which do scatter. */
object SaltedJoin {

  def innerJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      salt: Int = 8): DataFrame = {
    require(salt > 0, "salt must be positive")
    require(probe.columns.forall(_ != "__salt") && build.columns.forall(_ != "__salt"),
      "__salt is reserved by SaltedJoin")
    val probeS = probe.withColumn("__salt",
      pmod(xxhash64(probe.columns.map(col): _*), lit(salt)).cast("int"))
    val buildS = build.withColumn("__salt",
      explode(array((0 until salt).map(lit(_)): _*)))
    probeS
      .join(buildS,
        probeS(probeKey) === buildS(buildKey) && probeS("__salt") === buildS("__salt"))
      .drop(probeS("__salt")).drop(buildS("__salt"))
  }
}
