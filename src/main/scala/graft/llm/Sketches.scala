package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-Min Sketch over the token stream — the canonical
  * bounded-memory frequency summary (Cormode/Muthukrishnan 2005): a
  * depth × width counter matrix where every token instance increments
  * one counter per row (`bucket_i = hash_i(token) mod width`), and a
  * token's estimate is the MIN over its depth counters — always ≥ the
  * true count, within εN with probability 1−δ for width = e/ε,
  * depth = ln 1/δ.
  *
  * Everything here is exact integer arithmetic on engine-portable
  * hashes: `hash_i(token)` is [[Sampling.hash60]] of the seed-prefixed
  * token (`"cms:<i>:" || token` — one md5 per (row, distinct token),
  * the portable-hash convention), counters are plain sums, and the
  * estimate is an integer min — so the whole sketch, not just its
  * contract, replays bit-for-bit in the DuckDB oracle.
  *
  * Scale shape — the POINT of the sketch: the counter matrix is
  * depth·width rows AT ANY CORPUS SIZE. The instance stream explodes
  * scan-side (narrow), the (row, bucket) aggregate reduces every
  * partition to ≤ depth·width partial rows before the only exchange,
  * and the matrix then BROADCASTS to whatever needs estimates. No
  * vocabulary-sized state exists anywhere — this is what replaces the
  * exact `groupBy(token)` when the vocabulary itself (urls, ids,
  * n-grams) is too large to aggregate at 100 TB. */
object Sketches {

  /** The counter matrix over an arbitrary string-instance frame
    * (`token` column): the shared core of [[cmsCounters]] (text
    * tokens) and [[cmsKeyCounters]] (join keys). */
  private def matrixOf(instances: DataFrame, depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, s"need depth, width > 0; got $depth, $width")
    instances
      .select(posexplode(array((0 until depth).map(i =>
        Sampling.hash60(concat(lit(s"cms:$i:"), col("token"))) % width): _*))
        .as(Seq("i", "bucket")))
      .groupBy("i", "bucket").agg(count(lit(1)).as("c"))
  }

  /** The depth × width counter matrix: (i, bucket, c) — one row per
    * NON-ZERO counter (absent = 0). One tokenized corpus scan; the
    * shuffle carries ≤ depth·width partial rows per partition. */
  def cmsCounters(df: DataFrame, textCol: String,
      depth: Int = 4, width: Int = 256): DataFrame =
    matrixOf(df.select(
        explode(split(TextAnalysis.normalizeText(col(textCol)), " ")).as("token"))
      .filter(length(col("token")) > 0), depth, width)

  /** The counter matrix over a JOIN-KEY column — one instance per row,
    * the key rendered through `CAST(key AS STRING)` (callers with
    * non-integral key types should pre-cast to a canonical form; a
    * DECIMAL's string rendering is not engine-portable). NULL keys are
    * dropped, mirroring equi-join semantics where null never matches.
    * This is the sketch a table scan leaves behind for the PLANNER:
    * depth·width counters summarizing the key distribution. */
  def cmsKeyCounters(df: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 256): DataFrame =
    matrixOf(df.select(col(keyCol).cast("string").as("token"))
      .filter(col("token").isNotNull), depth, width)

  /** Equi-join CARDINALITY estimate from two counter matrices — the
    * classic sketched inner product: per hash row,
    * `Σ_bucket cA[i][b] · cB[i][b]` over-counts the true
    * `Σ_key nA(k) · nB(k)` by only the collision cross-terms
    * (non-negative), so `min` over the depth rows is a ONE-SIDED upper
    * estimate, within `(e/width) · |A| · |B|` of truth with
    * probability 1 − e^−depth. The estimator a planner calls to size a
    * join (pick broadcast vs shuffle, pre-provision partitions) from
    * two depth·width summaries WITHOUT scanning either table again —
    * sharp when the join size is dominated by heavy keys, noise-bound
    * when keys are near-unique (the docplan trade every sketch
    * carries). Both matrices must share (depth, width, hash family) —
    * i.e. come from [[cmsKeyCounters]] with the same dials, and
    * `depth` must be passed again here: a hash row whose bucket sets
    * are DISJOINT has inner product 0 — the sharpest answer the sketch
    * can give ("this join is empty") — but such a row vanishes from
    * the bucket equi-join entirely, so the min must know how many rows
    * it should be over; without the count, near-disjoint key sets
    * would estimate from only their collision rows and overcount
    * without bound. Exact integer arithmetic end to end. Output: one
    * row, (cms_est). */
  def cmsJoinSizeEstimate(a: DataFrame, b: DataFrame, depth: Int = 4): DataFrame = {
    require(depth > 0, "depth must be positive")
    a.select(col("i"), col("bucket"), col("c").as("ca"))
      .join(b.select(col("i"), col("bucket"), col("c").as("cb")), Seq("i", "bucket"))
      .groupBy("i").agg(sum(col("ca") * col("cb")).as("ip"))
      .agg(min("ip").as("m"), count(lit(1)).as("nr"))
      .select(when(col("nr") < depth, lit(0L))
        .otherwise(coalesce(col("m"), lit(0L))).as("cms_est"))
  }

  /** ACT on the estimate — the planner hook [[cmsJoinSizeEstimate]]'s
    * docstring promises: size the `left ⋈ right ON keyCol` join from
    * the two key sketches and CHOOSE the physical strategy before any
    * table is scanned for the join itself. An estimated output at or
    * under `maxBroadcastEst` picks a broadcast hash join (the matched
    * key mass is small — ship the right side); anything larger forces
    * the shuffle merge join (`hint("merge")` — never let a size
    * mis-guess broadcast a side that blows the driver). The sketches
    * are depth·width artifacts, so the decision costs two bounded
    * driver reads, not a scan; at 100 TB this is exactly the
    * re-planning a nightly pipeline does from yesterday's scan
    * leavings. Both regimes are plan-pinned (PlanShapeSpec).
    *
    * Broadcast needs BOTH gates: the join-output estimate says how much
    * matched key mass exists, but says nothing about |right| — a huge
    * right table whose keys barely intersect left's estimates ~0 and
    * would be shipped to every executor in full, the exact driver OOM
    * this hook exists to prevent. The right side's own row count falls
    * out of the SAME sketch for free (every non-null-key row increments
    * exactly one counter per hash row, so Σ_bucket c[i][b] = |right|
    * for any i), so `maxBroadcastRows` bounds |right| from the already
    * collected matrix — still zero extra scans. */
  def joinSizedByCms(left: DataFrame, right: DataFrame, keyCol: String,
      maxBroadcastEst: Long, depth: Int = 4, width: Int = 256,
      maxBroadcastRows: Long = 1000000L): DataFrame = {
    require(maxBroadcastEst >= 0, "maxBroadcastEst must be non-negative")
    require(maxBroadcastRows >= 0, "maxBroadcastRows must be non-negative")
    // one bounded collect per side (≤ depth·width rows each); the
    // estimate is then plain driver arithmetic, so the right matrix is
    // read ONCE and answers both questions
    val lc = cmsKeyCounters(left, keyCol, depth, width).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val rc = cmsKeyCounters(right, keyCol, depth, width).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val rightRows = rc.iterator.filter(_._1 == 0).map(_._3).sum
    // sketched inner product per hash row, min over rows (see
    // cmsJoinSizeEstimate — same math, local because both sides are
    // already bounded driver arrays)
    val ip = Array.fill(depth)(0L)
    rc.foreach { case (i, b, c) => ip(i) += c * lc.getOrElse((i, b), 0L) }
    val est = ip.min
    if (est <= maxBroadcastEst && rightRows <= maxBroadcastRows)
      left.join(broadcast(right), Seq(keyCol))
    else left.join(right.hint("merge"), Seq(keyCol))
  }

  /** Point estimates for a candidate token set: min over the depth
    * counters each candidate hashes into, appended as a `cms_est`
    * column (every other candidate column rides through, so one pass
    * of a candidate frame needs no re-join — `candidates` must be a
    * SET per token). The counter matrix (depth·width rows) BROADCASTS
    * to the probe, so estimating is one narrow pass at any corpus
    * size. Absent counters read as true 0 (a bucket no token ever
    * hit).
    *
    * CMS alone cannot ENUMERATE heavy tokens — production pairs the
    * sketch with a candidate stream (a sample, a prior vocabulary, a
    * per-partition head); the estimate is what the sketch answers. */
  def cmsEstimate(counters: DataFrame, candidates: DataFrame,
      depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth > 0 && width > 0, s"need depth, width > 0; got $depth, $width")
    val candCols = candidates.columns.toSeq
    candidates
      .select(candCols.map(col) :+ posexplode(array((0 until depth).map(i =>
        Sampling.hash60(concat(lit(s"cms:$i:"), col("token"))) % width): _*))
        .as(Seq("i", "bucket")): _*)
      .join(broadcast(counters), Seq("i", "bucket"), "left_outer")
      .groupBy(candCols.map(col): _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_est"))
  }

  /** The AUDIT view — sketch vs truth on the head of the
    * distribution, the `approx_distinct_audit` convention: the exact
    * top-`k` tokens (count desc, token asc) with their true counts
    * next to the sketch's estimate and the signed error. CMS
    * one-sided-ness (`cms_est ≥ exact_c`, equality iff none of the
    * token's depth buckets collides with another token) makes
    * `err = cms_est − exact_c ≥ 0` a structural invariant any engine
    * can re-check. The exact side exists FOR the audit — production
    * keeps only the sketch. */
  def cmsHeavyHitterAudit(df: DataFrame, textCol: String,
      depth: Int = 4, width: Int = 256, k: Int = 20): DataFrame = {
    require(k > 0, "k must be positive")
    val toks = df.select(
        explode(split(TextAnalysis.normalizeText(col(textCol)), " ")).as("token"))
      .filter(length(col("token")) > 0)
    val exact = toks.groupBy("token").agg(count(lit(1)).as("exact_c"))
    // exact_c rides THROUGH the estimate probe (cmsEstimate keeps all
    // candidate columns), so the top frame has exactly one consumer —
    // no re-join, no duplicated vocab aggregate in the plan
    val top = graft.operators.GroupTopK.topK(
        exact.withColumn("__g", lit(1)), Seq("__g"),
        Seq(("exact_c", false), ("token", true)), k)
      .select("token", "exact_c")
    cmsEstimate(cmsCounters(df, textCol, depth, width), top, depth, width)
      .select(col("token"), col("exact_c"), col("cms_est"),
        (col("cms_est") - col("exact_c")).as("err"))
  }
}
