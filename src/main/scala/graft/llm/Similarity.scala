package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, per the scale contract:
  *  - [[bruteForceTopK]]: exact cosine top-k. The (small) query set is
  *    broadcast against the corpus — a map-side nested loop with no
  *    corpus shuffle; cost O(|corpus|·|queries|·dim) spread across
  *    executors, then a per-query top-k window over |corpus| candidate
  *    rows. The baseline and the verifier for the approximate path.
  *  - [[lshTopK]]: random-hyperplane LSH. Signatures are computed
  *    scan-side from deterministic pseudo-random planes (xxhash64-derived
  *    — no RNG state to ship); candidates are corpus rows whose signature
  *    shares a prefix band with the query, re-ranked exactly. At 100 TB
  *    the corpus is bucketed by band key (one shuffle, or pre-bucketed at
  *    write time) and each query probes only its buckets — recall is
  *    tunable via bands/bits, and the drop vs brute force is measured,
  *    not assumed (see SimilaritySpec).
  *
  * All expressions are built-in HOFs (zip_with/aggregate/transform) —
  * codegen'd, no UDFs.
  */
object Similarity {

  /** Dot product of two equal-length float arrays, in double (HOF form —
    * fine for one-off use; hot paths use the compiled cosine below). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 for zero-norm vectors. Compiled expression
    * ([[graft.functions.CosineSimExpr]]) — the interpreted HOF form was
    * the dominant cost of candidate verification (measured 18 s →
    * sub-second on sf0.1 embedding dedup). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosineSim(a, b)

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself). Deterministic tie-break on corpus id. */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val scored = c.join(broadcast(q), col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"), cosine(col("qvec"), col("cvec")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("corpus_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Sign bits of the vector against `nPlanes` deterministic pseudo-
    * random hyperplanes, as a bit string column ("101..."). Prefix bands
    * of this string are LSH bucket keys. `portable = true` (default)
    * uses the quantized ±1-plane signature
    * ([[graft.functions.QuantizedHyperplaneSigExpr]]) whose integer
    * projections the DuckDB oracle replays exactly; `false` the
    * Gaussian-ish xxhash64 planes ([[graft.functions.HyperplaneSigExpr]]). */
  def hyperplaneSignature(vec: Column, nPlanes: Int = 16, portable: Boolean = true): Column =
    if (portable) graft.functions.VectorFunctions.hyperplaneSignatureQ(vec, nPlanes)
    else graft.functions.VectorFunctions.hyperplaneSignature(vec, nPlanes)

  /** IVF-style approximate top-k: a coarse quantizer (deterministically
    * sampled corpus vectors as centroids) partitions the corpus into
    * `nCells` inverted lists; a query scores only the lists of its
    * `nProbe` nearest centroids, then exact cosine re-ranks inside them.
    *
    * Scale shape: centroid assignment is a broadcast nested loop (the
    * centroid set is tiny), the corpus is shuffled ONCE by cell id (or
    * pre-bucketed at write time), and each query touches nProbe/nCells
    * of the data — the standard recall/fan-out dial. */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      nCells: Int = 16,
      nProbe: Int = 4): DataFrame = {
    // deterministic centroids: the nCells corpus vectors with smallest
    // md5(id) — a seed-free pseudo-random sample whose selection rule is
    // engine-portable (md5 hex ordering is identical in DuckDB, so the
    // whole IVF pipeline can be replayed as oracle SQL; xxhash64 is not
    // portable)
    val cents = corpus
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"),
        md5(col(idCol).cast("string")).as("h"))
      .orderBy(col("h"), col("cid")).limit(nCells).drop("h")
    def assign(df: DataFrame, id: String, vec: String, n: Int, out: String): DataFrame = {
      val scored = df.select(col(idCol).as(id), col(vecCol).as(vec))
        .join(broadcast(cents))
        .select(col(id), col(vec), col("cid"), cosine(col(vec), col("cvec")).as("csim"))
      val w = Window.partitionBy(id).orderBy(desc("csim"), asc("cid"))
      scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= n)
        .select(col(id), col(vec), col("cid").as(out))
    }
    val corpusCells = assign(corpus, "corpus_id", "cvec2", 1, "cell")
    val queryCells = assign(queries, "query_id", "qvec", nProbe, "cell")
    val cands = corpusCells.join(broadcast(queryCells), Seq("cell"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"), cosine(col("qvec"), col("cvec2")).as("cos"))
      .groupBy("query_id", "corpus_id").agg(max("cos").as("cos"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("corpus_id"))
    cands.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** The banded corpus: one row per (id, vec, band-key) — the shared
    * first stage of [[cosineNearDupPairs]] and [[embeddingBuckets]]. */
  private def bandedCorpus(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nPlanes: Int,
      bands: Int,
      portable: Boolean): DataFrame = {
    val bits = nPlanes / bands
    corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("sig", hyperplaneSignature(col("vec"), nPlanes, portable))
      .select(col("id"), col("vec"),
        explode(array((0 until bands).map(b =>
          concat_ws(":", lit(b), substring(col("sig"), b * bits + 1, bits))): _*)).as("band"))
  }

  /** Embedding-cosine near-duplicate pairs: candidates are pairs sharing
    * an LSH band (never n²), verified with exact cosine ≥ threshold.
    * The embedding-space sibling of [[Dedup.minHashPairs]], with the
    * same hot-bucket discipline: buckets are collected per band key and
    * CAPPED at `maxBucket` members — a degenerate signature (all-zero
    * vectors, a constant-embedding bug upstream) would otherwise put n
    * docs in one bucket and pair O(n²) inside it. Dropped buckets are
    * never silent: [[embeddingBuckets]] is the audit view (catalog query
    * `embedding_bucket_histogram`). At 100 TB the corpus is bucketed
    * once by band key and each capped bucket pairs independently.
    *
    * `maxBucket` ALSO bounds single-row memory, quadratically: a bucket
    * is one `collect_list` row holding up to `maxBucket` full embedding
    * vectors, and the in-bucket pairing builds the C(maxBucket, 2) pair
    * array (cosines included) as one row value before the explode —
    * ~500k structs at the default 1000. Do not raise it to e.g. 100k
    * without restructuring (that row would hold ~5e9 pair structs);
    * shard the bucket key instead. */
  def cosineNearDupPairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      nPlanes: Int = 16,
      bands: Int = 4,
      maxBucket: Int = 1000,
      portable: Boolean = true): DataFrame = {
    val banded = bandedCorpus(corpus, idCol, vecCol, nPlanes, bands, portable)
    val grouped = banded
      .groupBy("band")
      .agg(collect_list(struct(col("id"), col("vec"))).as("members"))
      .filter(size(col("members")).between(2, maxBucket))
    // pairs within a capped bucket (i<j); cosine is symmetric so the
    // id order swap needs no vector realignment
    grouped.select(explode(
      flatten(transform(col("members"), (m, i) =>
        transform(slice(col("members"), i + 2, size(col("members"))), o =>
          struct(
            least(m.getField("id"), o.getField("id")).as("id_a"),
            greatest(m.getField("id"), o.getField("id")).as("id_b"),
            cosine(m.getField("vec"), o.getField("vec")).as("cos")))))).as("p"))
      .select("p.*")
      .filter(col("cos") >= threshold)
      .groupBy("id_a", "id_b")
      .agg(max("cos").as("cos"))
  }

  /** Embedding-LSH bucket histogram — the audit view for
    * [[cosineNearDupPairs]]' hot-bucket cap: how many band buckets hold
    * n members. A spike at a large n is the signature-collapse signal
    * (and exactly what maxBucket drops). */
  def embeddingBuckets(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nPlanes: Int = 16,
      bands: Int = 4,
      portable: Boolean = true): DataFrame =
    bandedCorpus(corpus, idCol, vecCol, nPlanes, bands, portable)
      .groupBy("band").agg(count(lit(1)).as("n"))

  /** LSH-bucketed approximate top-k: candidates share any of `bands`
    * signature-prefix bands with the query; exact cosine re-rank inside
    * the candidate set. */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      nPlanes: Int = 16,
      bands: Int = 4,
      portable: Boolean = true): DataFrame = {
    val bits = nPlanes / bands
    def withBands(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(vec))
        .withColumn(s"${id}_sig", hyperplaneSignature(col(vec), nPlanes, portable))
        .select(col(id), col(vec),
          explode(array((0 until bands).map(b =>
            concat_ws(":", lit(b), substring(col(s"${id}_sig"), b * bits + 1, bits))): _*)).as(s"${id}_band"))
    val c = withBands(corpus, "corpus_id", "cvec")
    val q = withBands(queries, "query_id", "qvec")
    // A pair can match on several bands — dedup on the id PAIR only (the
    // distinct's shuffle key must never include the float vectors), then
    // rejoin the vectors for exact re-ranking: corpus vectors via one
    // id-keyed join, query vectors via broadcast.
    val cands = c.join(broadcast(q.select("query_id", "query_id_band")),
        col("corpus_id_band") === col("query_id_band") &&
        col("corpus_id") =!= col("query_id"))
      .select("query_id", "corpus_id", "cvec")
      .groupBy("query_id", "corpus_id").agg(first("cvec").as("cvec"))
    val qVecs = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val scored = cands.join(broadcast(qVecs), "query_id")
      .select(col("query_id"), col("corpus_id"), cosine(col("qvec"), col("cvec")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("corpus_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Product-quantization approximate top-k — the MEMORY path for ANN at
    * 100 TB: each corpus vector is reduced once, scan-side, to `nSub`
    * centroid codes (bytes, vs `4·dim` for the raw floats), and scoring
    * a candidate is `nSub` lookups in a per-query table (asymmetric
    * distance, Jégou et al. TPAMI 2011). The raw corpus vectors never
    * enter a join or shuffle; only `(id, codes)` flows. The final
    * per-query top-k runs through [[graft.operators.GroupTopK]] — the
    * map-side-pruned path, so the one shuffle carries at most
    * `k · queries · partitions` candidate rows.
    *
    * Codebook: the `nCent` corpus vectors with smallest `md5(id)` (the
    * same seed-free portable sample as [[ivfTopK]]'s coarse quantizer),
    * split into `nSub` subvectors after integer quantization
    * (`floor(x·1000)` — [[graft.functions.PqEncodeExpr]]). A production
    * build would swap in k-means-trained centroids per subspace; the
    * selection rule here is chosen so a second engine can replay the
    * ENTIRE pipeline — encode, LUT, ADC, ranking — bit-for-bit (all
    * distances are exact BIGINT sums). Collecting the codebook to the
    * driver is bounded: `nCent` rows, KBs — the PQ analogue of
    * collecting an AQE broadcast relation. */
  def pqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      nSub: Int = 8,
      nCent: Int = 16): DataFrame = {
    import graft.functions.PqFunctions._
    val centRows = corpus
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"),
        md5(col(idCol).cast("string")).as("h"))
      .orderBy(col("h"), col("cid")).limit(nCent)
      .select("cvec").collect()
    require(centRows.length == nCent, s"corpus smaller than nCent=$nCent")
    // Quantize driver-side with the same Float-vs-Double branch as
    // VecRead: PqEncodeExpr/PqLutExpr accept either element type, so the
    // codebook collection must too (getSeq[Float] on a double array
    // would throw ClassCastException only at runtime).
    val centVecs: Seq[Seq[Long]] = centRows.toSeq.map(
      _.getSeq[Number](0).map(x => math.floor(x.doubleValue() * 1000.0).toLong))
    val dim = centVecs.head.length
    require(dim % nSub == 0, s"dim $dim not divisible by nSub=$nSub")
    val subDim = dim / nSub
    // codebook(m)(c)(j): centroid c's j-th component in subspace m
    val codebook: Seq[Seq[Seq[Long]]] = (0 until nSub).map(m =>
      centVecs.map(v => v.slice(m * subDim, (m + 1) * subDim)))
    val codes = corpus.select(col(idCol).as("corpus_id"),
      pqEncode(col(vecCol), codebook).as("codes"))
    val qlut = queries.select(col(idCol).as("query_id"),
      pqLut(col(vecCol), codebook).as("lut"))
    val scored = codes.join(broadcast(qlut), col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        pqAdc(col("codes"), col("lut")).as("adc"))
    val top = graft.operators.GroupTopK.topK(
      scored, Seq("query_id"), Seq(("adc", true), ("corpus_id", true)), k)
    // rank over the k survivors only — the heavy pruning already happened
    val w = Window.partitionBy("query_id").orderBy(asc("adc"), asc("corpus_id"))
    top.withColumn("rank", row_number().over(w))
  }
}
