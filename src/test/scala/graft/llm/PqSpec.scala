package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.PqFunctions._

/** Reference-computation differentials for the product-quantization ANN
  * family: codes/ADC against a plain in-memory replay, tie-break rule,
  * and ranking agreement with exact brute force on separable data. */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def quant(v: Seq[Float]): Array[Long] =
    v.map(x => math.floor(x.toDouble * 1000.0).toLong).toArray

  private def refCodes(v: Seq[Float], cb: Seq[Seq[Seq[Long]]]): Seq[Int] = {
    val q = quant(v)
    val subDim = cb.head.head.length
    cb.indices.map { m =>
      cb(m).zipWithIndex.map { case (cent, c) =>
        val d = cent.indices.map { j =>
          val diff = q(m * subDim + j) - cent(j); diff * diff
        }.sum
        (d, c)
      }.min._2 // (dist, id) lexicographic == lowest-id tie-break
    }
  }

  // 4-dim vectors, 2 subspaces x 2 dims, 2 centroids
  private val cb: Seq[Seq[Seq[Long]]] = Seq(
    Seq(Seq(0L, 0L), Seq(1000L, 1000L)),     // subspace 0 centroids
    Seq(Seq(0L, 1000L), Seq(1000L, 0L)))     // subspace 1 centroids

  test("pq codes match the in-memory replay, ties go to the lowest centroid id") {
    val vecs = Seq(
      (1L, Seq(0.1f, 0.2f, 0.9f, 0.1f)),
      (2L, Seq(1.0f, 0.9f, 0.0f, 1.0f)),
      (3L, Seq(0.5f, 0.5f, 0.5f, 0.5f)))     // equidistant in both subspaces
    val got = vecs.toDF("id", "vec")
      .select(col("id"), pqEncode(col("vec"), cb).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    vecs.foreach { case (id, v) =>
      assert(got(id) == refCodes(v, cb), s"codes diverge for vec $id")
    }
    // (500,500) is exactly between both centroid pairs in both subspaces
    assert(got(3L) == Seq(0, 0), "equidistant vector must take centroid 0 (tie-break)")
  }

  test("adc equals the lut-free direct computation") {
    val corpus = Seq((1L, Seq(0.1f, 0.2f, 0.9f, 0.1f)), (2L, Seq(1.0f, 0.9f, 0.0f, 1.0f)))
    val query = Seq((10L, Seq(0.2f, 0.1f, 0.8f, 0.2f)))
    val codes = corpus.toDF("corpus_id", "vec")
      .select(col("corpus_id"), pqEncode(col("vec"), cb).as("codes"))
    val lut = query.toDF("query_id", "qvec")
      .select(col("query_id"), pqLut(col("qvec"), cb).as("lut"))
    val got = codes.crossJoin(lut)
      .select(col("corpus_id"), pqAdc(col("codes"), col("lut")).as("adc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // direct: distance from query subvector to the corpus row's centroid
    val q = quant(query.head._2)
    corpus.foreach { case (id, v) =>
      val expect = refCodes(v, cb).zipWithIndex.map { case (c, m) =>
        cb(m)(c).indices.map { j =>
          val diff = q(m * 2 + j) - cb(m)(c)(j); diff * diff
        }.sum
      }.sum
      assert(got(id) == expect, s"adc diverges for corpus $id")
    }
  }

  test("property: codes and ADC match the in-memory reference on random vectors/codebooks") {
    import org.scalacheck.{Gen, Prop}
    val genCell = Gen.chooseNum(-900L, 900L)
    // 2 subspaces x 3 dims, 3 centroids; vectors as floats in [-0.9, 0.9]
    val genCodebook = Gen.listOfN(2, Gen.listOfN(3, Gen.listOfN(3, genCell)))
      .map(_.map(_.map(_.toSeq).toSeq).toSeq)
    val genVec = Gen.listOfN(6, Gen.chooseNum(-900, 900).map(_ / 1000.0f)).map(_.toSeq)
    val prop = Prop.forAll(genCodebook, genVec, genVec) { (cbR, v, qv) =>
      val df = Seq((1L, v)).toDF("id", "vec")
      val codes = df.select(pqEncode(col("vec"), cbR)).head.getSeq[Int](0)
      val lut = Seq((1L, qv)).toDF("id", "vec")
        .select(pqLut(col("vec"), cbR)).head
        .getSeq[scala.collection.Seq[Long]](0)
      val adc = df.crossJoin(Seq((1L, qv)).toDF("qid", "qvec")
          .select(pqLut(col("qvec"), cbR).as("lut")))
        .select(pqAdc(pqEncode(col("vec"), cbR), col("lut"))).head.getLong(0)
      val expCodes = refCodes(v, cbR)
      val q = quant(qv)
      val expAdc = expCodes.zipWithIndex.map { case (c, m) =>
        cbR(m)(c).indices.map { j =>
          val d = q(m * 3 + j) - cbR(m)(c)(j); d * d
        }.sum
      }.sum
      codes == expCodes && adc == expAdc && lut.length == 2 && lut.forall(_.length == 3)
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("error paths: ragged codebook and dim mismatch fail loudly, null vectors pass through") {
    val ragged: Seq[Seq[Seq[Long]]] = Seq(Seq(Seq(0L, 0L), Seq(1000L)))
    val df = Seq((1L, Seq(0.1f, 0.2f, 0.9f, 0.1f))).toDF("id", "vec")
    val e1 = intercept[Exception] {
      df.select(pqEncode(col("vec"), ragged)).collect()
    }
    assert(e1.getMessage.contains("rectangular"), s"got: ${e1.getMessage}")
    val e2 = intercept[Exception] {
      df.select(pqEncode(col("vec"), cb.map(_.map(_ ++ Seq(0L))))).collect()
    }
    assert(e2.getMessage.contains("codebook"), s"got: ${e2.getMessage}")
    val withNull = Seq((1L, Some(Seq(0.1f, 0.2f, 0.9f, 0.1f))), (2L, None))
      .toDF("id", "vec")
      .select(col("id"), pqEncode(col("vec"), cb).as("codes"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!withNull(1L) && withNull(2L), "null vector must yield null codes, not an error")
  }

  test("measured recall on real embeddings beats random by an order of magnitude") {
    // The fixture embeddings are near-orthogonal (max pairwise cosine
    // ~0.5, no cluster structure) — the worst case for any vector
    // quantizer, so recall here is a MEASURED floor, not a quality
    // claim: PQ@20 vs exact top-5 was 0.40 when pinned (random pulls
    // 20/499 ~ 0.04). On clusterable data (test above) PQ is exact.
    val e = spark.read.parquet(s"${graft.TestSpark.sfDir}/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10L)
    val bf = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"))).toSet
    val pq = Similarity.pqTopK(e, q, "vec_id", "embedding", k = 20)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"))).toSet
    val recall = bf.intersect(pq).size.toDouble / bf.size
    assert(recall >= 0.2, s"PQ@20 recall of exact top-5 fell below the measured floor: $recall")
  }

  test("IVF measured recall on real embeddings at the catalog's nProbe") {
    // Same protocol as the PQ floor above, for ann_ivf's exact
    // parameters (nCells=16, nProbe=4 — the catalog defaults): on the
    // near-orthogonal fixture, IVF@10 recall of exact top-5 was 0.58
    // when pinned; probing 4/16 cells at random would land ~0.25, so
    // the centroid routing measurably beats chance even with no
    // cluster structure to exploit. Floor set at 0.4.
    val e = spark.read.parquet(s"${graft.TestSpark.sfDir}/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10L)
    val bf = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"))).toSet
    val ivf = Similarity.ivfTopK(e, q, "vec_id", "embedding", k = 10, nCells = 16, nProbe = 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"))).toSet
    val recall = bf.intersect(ivf).size.toDouble / bf.size
    assert(recall >= 0.4, s"IVF@10 recall of exact top-5 fell below the measured floor: $recall")
  }

  test("oracle-exact trained variants at the catalog gate parameters (round 11)") {
    // ann_ivf_trained / ann_pq_trained run tiny oracle-tractable
    // codebooks (4 cells / 4 centroids per subspace, 16-sample, 2
    // truncating-update Lloyd rounds) — their EXACTNESS is the driver's
    // hash gate; this spec pins sane behavior floors so a refactor
    // can't silently break the paths between rounds. Measured when
    // pinned: trained-exact IVF (2/4 probe) recall 0.70 (random ~0.5);
    // 4-centroid PQ@20 recall 0.12 (random 20/499 ~ 0.04 — a quarter
    // of the 16-centroid default's codebook resolution, and 3x chance).
    val e = graft.queries.Tables(spark, graft.TestSpark.sfDir, "embeddings")
    val q = e.filter(col("vec_id") < 10L)
    val bf = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"))).toSet
    val ivfT = Similarity.ivfTopKTrained(e, q, "vec_id", "embedding",
        k = 5, nCells = 4, nProbe = 2, sampleN = 16, iters = 2)
    val ivfRows = ivfT.collect()
    assert(ivfRows.length == 50, s"5 per query x 10 queries, got ${ivfRows.length}")
    val ivfPairs = ivfRows.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"))).toSet
    val ivfRecall = bf.intersect(ivfPairs).size.toDouble / bf.size
    assert(ivfRecall >= 0.5, s"trained-exact IVF recall: $ivfRecall (measured 0.70 when pinned)")
    val pqT = Similarity.pqTopK(e, q, "vec_id", "embedding", k = 20,
        nSub = 8, nCent = 4, trained = true, trainIters = 2, trainSample = 16,
        floorUpdate = true)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"))).toSet
    val pqRecall = bf.intersect(pqT).size.toDouble / bf.size
    assert(pqRecall >= 0.08, s"4-centroid trained PQ@20 recall: $pqRecall (measured 0.12 when pinned)")
  }

  // --- trained-quantizer floors (round 9) ---------------------------------
  // Training cannot manufacture structure: on the near-orthogonal fixture
  // the trained mode lands within noise of the sampled mode (parity, both
  // far above chance). Where structure EXISTS — clustered data, and the
  // larger sf0.01 fixture whose md5 sample is big enough to estimate the
  // density — Lloyd's measurably beats the raw md5 sample, and because
  // every step is deterministic (md5-ordered sample, maximin seeding,
  // grid-snapped updates) the measured recalls are exact pins, not
  // statistical floors.

  private def clusteredEmbeddings = {
    // 48 true clusters in 16-dim, 30 members each, fine-grained
    // deterministic jitter (997-level — coarse lattices make memorized
    // sample points unbeatable and prove nothing about training)
    val rows = for (c <- 0 until 48; m <- 0 until 30) yield {
      val id = (c * 30 + m).toLong
      val base = Array.tabulate(16)(d =>
        if ((c + d) % 4 == 0) 0.9f
        else if ((c * 3 + d) % 5 == 0) -0.7f
        else 0.1f * ((c + 2 * d) % 3))
      val v = base.zipWithIndex.map { case (x, d) =>
        x + ((((id * 2654435761L + d * 40503L) % 997L).toFloat / 997f) - 0.5f) * 0.12f }
      (id, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def recallOf(result: org.apache.spark.sql.DataFrame, truth: Set[(Long, Long)]): Double = {
    val got = result.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"))).toSet
    truth.intersect(got).size.toDouble / truth.size
  }

  test("trained IVF/PQ floors on clustered data: IVF >= 0.9, PQ >= 0.85 and above untrained") {
    val e = clusteredEmbeddings
    val q = e.filter(col("vec_id") % 90L === 0L)
    val bf = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"))).toSet
    val ivfT = recallOf(Similarity.ivfTopK(e, q, "vec_id", "embedding",
      k = 10, nCells = 16, nProbe = 4, trained = true), bf)
    assert(ivfT >= 0.9, s"trained IVF recall on clustered data: $ivfT (measured 1.0 when pinned)")
    val pqU = recallOf(Similarity.pqTopK(e, q, "vec_id", "embedding", k = 20), bf)
    val pqT = recallOf(Similarity.pqTopK(e, q, "vec_id", "embedding", k = 20, trained = true), bf)
    assert(pqT >= 0.85, s"trained PQ recall on clustered data: $pqT (measured 0.9125 when pinned)")
    assert(pqT >= pqU, s"training must not lose to the raw md5 sample where structure exists: $pqT < $pqU")
  }

  test("trained quantizers beat the md5 sample on the sf0.01 fixture and are deterministic") {
    // sf0.01: 5000 near-orthogonal vectors — still no planted clusters,
    // but enough sample mass (512) for Lloyd's to estimate the density.
    // Measured when pinned: IVF trained 0.68 vs untrained 0.56; PQ
    // trained 0.50 vs untrained 0.40. All deterministic => exact.
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10L)
    val bf = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"))).toSet
    val ivfU = recallOf(Similarity.ivfTopK(e, q, "vec_id", "embedding", k = 10, nCells = 16, nProbe = 4), bf)
    val ivfT = recallOf(Similarity.ivfTopK(e, q, "vec_id", "embedding",
      k = 10, nCells = 16, nProbe = 4, trained = true), bf)
    assert(ivfT >= 0.6, s"trained IVF recall at sf0.01: $ivfT (measured 0.68 when pinned)")
    assert(ivfT > ivfU, s"trained IVF must beat the md5 sample at sf0.01: $ivfT <= $ivfU")
    val pqU = recallOf(Similarity.pqTopK(e, q, "vec_id", "embedding", k = 20), bf)
    val pqT = recallOf(Similarity.pqTopK(e, q, "vec_id", "embedding", k = 20, trained = true), bf)
    assert(pqT >= 0.45, s"trained PQ recall at sf0.01: $pqT (measured 0.50 when pinned)")
    assert(pqT > pqU, s"trained PQ must beat the md5 sample at sf0.01: $pqT <= $pqU")
    // determinism: a second training run reproduces the result exactly
    val ivfT2 = recallOf(Similarity.ivfTopK(e, q, "vec_id", "embedding",
      k = 10, nCells = 16, nProbe = 4, trained = true), bf)
    assert(ivfT2 == ivfT, "trained IVF must be bit-reproducible")
  }

  test("kmeans trainers: deterministic, grid-snapped, empty-cluster-safe") {
    // duplicate-heavy sample: 3 distinct points, k=4 => one empty slot
    // must keep its seed instead of dividing by zero
    val pts = Array(
      Array(1.0, 0.0), Array(1.0, 0.0), Array(0.0, 1.0),
      Array(0.0, 1.0), Array(-1.0, 0.1), Array(-1.0, 0.1))
    val c1 = Similarity.kmeansCosine(pts, 4, 5)
    val c2 = Similarity.kmeansCosine(pts, 4, 5)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq, "cosine trainer must be deterministic")
    assert(c1.forall(_.forall(x => (x * 1000.0) == math.rint(x * 1000.0))),
      "trained centroids must sit on the 1e-3 grid")
    val lpts = Array(
      Array(1000L, 0L), Array(1000L, 0L), Array(0L, 1000L),
      Array(0L, 1000L), Array(-900L, 100L), Array(-900L, 100L))
    val l1 = Similarity.kmeansL2Long(lpts, 4, 5)
    val l2 = Similarity.kmeansL2Long(lpts, 4, 5)
    assert(l1.map(_.toSeq).toSeq == l2.map(_.toSeq).toSeq, "L2 trainer must be deterministic")
  }

  test("pqTopK ranks the planted nearest cluster first on separable data") {
    // 3 well-separated clusters of 8-dim vectors; query belongs to cluster A
    def jitter(base: Array[Float], id: Long): Seq[Float] =
      base.zipWithIndex.map { case (x, i) => x + ((id * 7 + i) % 5).toFloat * 0.01f }.toSeq
    val a = Array(0.9f, 0.9f, 0.0f, 0.0f, 0.9f, 0.0f, 0.0f, 0.9f)
    val b = Array(0.0f, 0.0f, 0.9f, 0.9f, 0.0f, 0.9f, 0.0f, 0.0f)
    val c = Array(0.4f, 0.0f, 0.0f, 0.4f, 0.0f, 0.0f, 0.9f, 0.0f)
    val rows = (0L until 8L).map(i => (i, jitter(a, i))) ++
      (8L until 16L).map(i => (i, jitter(b, i))) ++
      (16L until 24L).map(i => (i, jitter(c, i)))
    val df = rows.toDF("vec_id", "embedding")
    val top = Similarity.pqTopK(df, df.filter(col("vec_id") === 0L),
        "vec_id", "embedding", k = 5, nSub = 4, nCent = 8)
      .collect().map(r => r.getAs[Long]("corpus_id"))
    assert(top.length == 5)
    assert(top.forall(_ < 8L), s"all top-5 must come from the query's cluster: ${top.toSeq}")
  }

  test("ivfPqTopK with a full probe degenerates to plain pqTopK") {
    // nProbe = nCells makes every inverted list a candidate list, so
    // the composition must reproduce the flat scan's exact ADC
    // ranking — the differential that pins routing correctness
    val e = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "corpus_id", "adc", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val full = rows(Similarity.ivfPqTopK(e, q, "vec_id", "embedding",
      k = 5, nCells = 8, nProbe = 8, nSub = 8, nCent = 16))
    val flat = rows(Similarity.pqTopK(e, q, "vec_id", "embedding",
      k = 5, nSub = 8, nCent = 16))
    assert(full === flat)
  }

  test("ivfRouteCells (streaming router) routes exactly like the ivfAssign window") {
    val e = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
    val cents = Similarity.ivfCentroids(e, "vec_id", "embedding", 16)
    val collected = cents.collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    def cells(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val win = cells(Similarity.ivfAssign(e, cents, "vec_id", "embedding",
      "query_id", "qvec", 4, "cell"))
    val expr = cells(Similarity.ivfRouteCells(e, collected, "vec_id", "embedding",
      "query_id", "qvec", 4, "cell"))
    assert(expr === win)
  }

  test("ivfPqTopK neighbors lie only in the query's probed cells") {
    val e = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    val cents = Similarity.ivfCentroids(e, "vec_id", "embedding", 16)
    val probed = Similarity.ivfAssign(q, cents, "vec_id", "embedding",
        "query_id", "qv", 4, "cell")
      .select("query_id", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val corpusCell = Similarity.ivfAssign(e, cents, "vec_id", "embedding",
        "corpus_id", "cv", 1, "cell")
      .select("corpus_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Similarity.ivfPqTopK(e, q, "vec_id", "embedding",
        k = 5, nCells = 16, nProbe = 4, nSub = 8, nCent = 16)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty)
    got.foreach { case (qid, cid) =>
      assert(probed.contains((qid, corpusCell(cid))),
        s"neighbor $cid of query $qid sits in an unprobed cell")
    }
  }
}
