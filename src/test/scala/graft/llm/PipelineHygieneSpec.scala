package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Training-data hygiene operators: benchmark decontamination and PII
  * redaction. Hand-computed fixtures plus cross-path differentials. */
class PipelineHygieneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "a b c d"),       // eval: grams {a b c, b c d}
    (10L, "a b c d e"),    // train: {a b c, b c d, c d e} -> overlap 2
    (11L, "x y z w"),      // train: {x y z, y z w}        -> overlap 0
    (12L, "q a b c")       // train: {q a b, a b c}        -> overlap 1
  ).toDF("doc_id", "text")

  test("decontamination counts distinct n-gram overlap and flags at the threshold") {
    val got = Decontamination
      .overlapReport(corpus, col("doc_id") < 10, "doc_id", "text", n = 3, minOverlap = 2)
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_overlap"), r.getAs[Int]("contaminated")))
      .toSet
    assert(got == Set((10L, 3L, 2L, 1), (11L, 2L, 0L, 0), (12L, 2L, 1L, 0)),
      s"unexpected overlap report: $got")
  }

  test("decontamination: broadcast and shuffle-join paths agree") {
    def run(bc: Boolean) = Decontamination
      .overlapReport(corpus, col("doc_id") < 10, "doc_id", "text",
        n = 3, minOverlap = 2, broadcastEval = bc)
      .collect().map(_.toSeq).toSet
    assert(run(true) == run(false))
  }

  test("semantic decontamination: broadcast == shuffle eval path; flags only genuine cosine hits") {
    val e = graft.queries.Tables(spark, TestSpark.sfDir, "embeddings")
    val pred = Sampling.hashBucket256(col("vec_id")) < 13
    def run(bc: Boolean) = Decontamination
      .semanticOverlap(e, pred, "vec_id", "embedding", threshold = 0.35, broadcastEval = bc)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = run(true)
    assert(b.nonEmpty, "the fixture must produce at least one semantic hit at 0.35")
    assert(b == run(false), "broadcastEval=false must not change the result set")
    // soundness: every flagged (id, first_eval_id) pair genuinely clears
    // the exact-cosine threshold (LSH banding can only MISS pairs, never
    // invent them; the inline verify must have removed band collisions)
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Number](1).map(_.doubleValue())).toMap
    def cos(a: Seq[Double], c: Seq[Double]): Double = {
      val dot = a.zip(c).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(c.map(x => x * x).sum))
    }
    b.foreach { case (id, _, firstEval) =>
      assert(cos(vecs(id), vecs(firstEval)) >= 0.35 - 1e-9,
        s"flagged pair ($id, $firstEval) below threshold")
    }
  }

  test("duplicated grams in a doc count once (distinct-shingle semantics)") {
    // "a b c a b c a b c" has many 3-gram INSTANCES but only 3 distinct
    val rep = Seq((1L, "a b c d"), (20L, "a b c a b c a b c")).toDF("doc_id", "text")
    val got = Decontamination
      .overlapReport(rep, col("doc_id") < 10, "doc_id", "text", n = 3, minOverlap = 1)
      .collect().map(r => (r.getAs[Long]("n_grams"), r.getAs[Long]("n_overlap"))).toSet
    // distinct grams of doc 20: {a b c, b c a, c a b} -> overlap {a b c}
    assert(got == Set((3L, 1L)), s"distinct semantics violated: $got")
  }

  test("distinctive terms rank by tf/df with deterministic tie-break") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry durian")
    ).toDF("doc_id", "text")
    // tf/df: d1 apple 2/1=2.0, banana 1/2=0.5; d2 banana 0.5, cherry 0.5
    // (tie -> banana first); d3 cherry 3/2=1.5, durian 1/1=1.0
    val got = TextAnalysis.distinctiveTerms(docs, "doc_id", "text", k = 1)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("token"),
        r.getAs[Long]("tf"), r.getAs[Long]("df"), r.getAs[Double]("score"))).toSet
    assert(got == Set((1L, "apple", 2L, 1L, 2.0), (2L, "banana", 1L, 2L, 0.5),
      (3L, "cherry", 3L, 2L, 1.5)), s"unexpected top terms: $got")
  }

  test("temperature sampling flattens group sizes to floor(sqrt(n))*m, capped at n") {
    val rows = (1 to 100).map(i => ("big", i.toLong)) ++
      (101 to 109).map(i => ("mid", i.toLong)) ++ Seq(("tiny", 110L))
    val df = rows.toDF("lang", "doc_id")
    val got = Sampling.temperatureSample(df, "lang", "doc_id", multiplier = 4)
      .groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    // big: floor(sqrt(100))*4 = 40 of 100; mid: floor(3)*4 = 12 > 9 -> all 9
    // tiny: floor(1)*4 = 4 > 1 -> 1. Head compressed 2.5x, tail kept whole.
    assert(got == Map("big" -> 40L, "mid" -> 9L, "tiny" -> 1L), s"targets: $got")
  }

  test("temperature sampling is deterministic and a subset of the corpus") {
    val df = (1 to 50).map(i => ("l" + (i % 3), i.toLong)).toDF("lang", "doc_id")
    val a = Sampling.temperatureSample(df, "lang", "doc_id").collect().map(_.toSeq).toSet
    val b = Sampling.temperatureSample(df, "lang", "doc_id").collect().map(_.toSeq).toSet
    assert(a == b, "resample must be deterministic")
    val ids = a.map(_(1).asInstanceOf[Long])
    assert(ids.subsetOf((1 to 50).map(_.toLong).toSet))
  }

  test("incremental dedup: every status path fires and echoes land where injected") {
    // the echo offset is DERIVED from the fixture (smallest power of 10
    // above max(doc_id)) so echoes can never collide with real ids at
    // any scale factor; the assertions replay the same rule
    val maxId = spark.read.parquet(s"${graft.TestSpark.sfDir}/documents.parquet")
      .agg(org.apache.spark.sql.functions.max("doc_id")).head.getLong(0)
    val base = math.pow(10, maxId.toString.length).toLong
    for (variant <- Seq(
        graft.queries.LlmQueries.dedupIncremental,
        graft.queries.LlmQueries.dedupIncrementalBucketed)) {
      val got = variant(spark, graft.TestSpark.sfDir)
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("status")))
      val byStatus = got.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
      assert(byStatus.keySet == Set("new", "dup_corpus", "dup_batch"),
        s"all three statuses must fire on the gate fixture: ${byStatus.keySet}")
      // the in-plan echoes carry offset ids: re-ingested corpus docs live
      // at +base (must come back dup_corpus), doubled batch docs at
      // +2·base (must come back dup_batch — their original holds `new`)
      assert(byStatus("dup_batch").forall(_ > 2 * base),
        s"dup_batch must be exactly the doubled-batch echoes: ${byStatus("dup_batch").take(5).toList}")
      assert(byStatus("dup_corpus").forall(id => id > base && id <= 2 * base),
        s"dup_corpus must be exactly the corpus echoes: ${byStatus("dup_corpus").take(5).toList}")
      assert(byStatus("new").forall(_ <= maxId), "original batch docs must stay `new`")
    }
  }

  test("boilerplate spans: cross-doc removal hits every holder; unique and tail words behave as documented") {
    // span width 2 for a readable fixture; "ad click here" never forms a
    // full span in doc C (tail words are outside the quantization)
    val docs = Seq(
      (1L, "ad click here now buy one thing extra"), // spans: (ad click)(here now)(buy one)(thing extra)
      (2L, "ad click other words buy one more junk"), // shares (ad click),(buy one) with doc 1
      (3L, "totally unique content right here today x")  // 3 full spans + tail "x"
    ).toDF("id", "text")
    val got = TextAnalysis.boilerplateSpans(docs, "id", "text", spanWords = 2, minDf = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    def md5s(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // doc 1: 4 spans, (ad click) and (buy one) are in 2 docs -> removed from BOTH holders
    assert(got(1L) == ((4L, 2L, md5s("here now thing extra"))), s"doc1: ${got(1L)}")
    assert(got(2L) == ((4L, 2L, md5s("other words more junk"))), s"doc2: ${got(2L)}")
    // doc 3: nothing repeated; tail word "x" is outside the span grid
    assert(got(3L) == ((3L, 0L, md5s("totally unique content right here today"))), s"doc3: ${got(3L)}")
  }

  test("boilerplate spans: docs shorter than one span yield zero spans, not phantom rows") {
    // sub-span docs (1 word < spanWords=2) must vanish from the output —
    // the unguarded sequence(0,-1) used to fabricate two phantom spans
    // per short doc, which would cross-match between short docs and get
    // flagged as boilerplate
    val docs = Seq(
      (1L, "x"), (2L, "y"), (3L, ""),       // all shorter than one span
      (4L, "ad click ad click")             // control: 2 real spans, repeated within one doc only
    ).toDF("id", "text")
    val got = TextAnalysis.boilerplateSpans(docs, "id", "text", spanWords = 2, minDf = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // short docs produce NO output row (zero spans); doc 4's repeat is
    // within one document, so count_distinct(doc_id)=1 < minDf
    assert(got.keySet == Set(4L), s"only the full-span doc may appear: $got")
    assert(got(4L) == ((2L, 0L)), s"doc4 spans: ${got(4L)}")
  }

  test("unigram log-freq score: exact floor-log2 of corpus counts, normalization applied, empty docs drop") {
    val docs = Seq(
      (1L, "a a a a"),   // c(a)=7 -> lg 2 each: n=4 sum=8 mean=2.0
      (2L, "a b"),       // lg(7)=2 + lg(1)=0:   n=2 sum=2 mean=1.0
      (3L, "zz"),        // lg(1)=0:             n=1 sum=0 mean=0.0
      (4L, "A, a!"),     // normalizes to "a a": n=2 sum=4 mean=2.0
      (5L, "!!!")        // normalizes to "" -> no tokens -> absent
    ).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogFreq(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("sum_log2"), r.getAs[Double]("mean_log2")))).toMap
    assert(got == Map(
      1L -> ((4L, 8L, 2.0)), 2L -> ((2L, 2L, 1.0)),
      3L -> ((1L, 0L, 0.0)), 4L -> ((2L, 4L, 2.0))), s"unexpected scores: $got")
  }

  test("unigram log-freq: hybrid (head-broadcast) join == plain join, head boundary crossed both ways") {
    val docs = Seq(
      (1L, "a a a a b b c"), (2L, "a b c d e"), (3L, "d e f g"), (4L, "a f g h i")
    ).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("sum_log2"), r.getAs[Double]("mean_log2"))).toSet
    // headV = 2 puts {a, b} in the head and the rest in the tail, so
    // every doc exercises BOTH paths of the union
    val hybrid = canon(TextAnalysis.unigramLogFreqHybrid(docs, "doc_id", "text", headV = 2))
    val plain = canon(TextAnalysis.unigramLogFreq(docs, "doc_id", "text"))
    assert(hybrid == plain, s"hybrid/plain divergence: ${hybrid.diff(plain)} vs ${plain.diff(hybrid)}")
  }

  test("dedup keep-best: highest quality wins the cluster, ties break to smallest id, singletons keep themselves") {
    val docs = Seq(
      // cluster {1,2}: doc 1 is punct-heavy junk (punctScore 0), doc 2
      // is longer and clean -> doc 2 must win despite the larger id
      (1L, "short junk!!!!!!"),
      (2L, "a longer cleaner sentence with many plain words repeated here"),
      // cluster {3,4}: identical text -> identical quality -> doc 3 by id
      (3L, "identical text"),
      (4L, "identical text"),
      // no edge -> its own component, kept trivially
      (5L, "standalone document")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val scored = Dedup.dedupGroups(docs, "doc_id", pairs).join(
      docs.select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("quality")), "doc_id")
    val keep = graft.operators.GroupTopK.topK(
        scored.select("component", "doc_id", "quality"),
        Seq("component"), Seq(("quality", false), ("doc_id", true)), k = 1)
      .collect().map(r => r.getAs[Long]("component") -> r.getAs[Long]("doc_id")).toMap
    assert(keep == Map(1L -> 2L, 3L -> 3L, 5L -> 5L), s"unexpected representatives: $keep")
  }

  test("pipeline disposition: statuses partition the corpus+echoes, every class fires, drop_exact is echo-only on this corpus") {
    val dir = graft.TestSpark.sfDir
    val rows = graft.queries.LlmQueries.pipelineDisposition(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("status")))
    val maxReal = spark.read.parquet(s"$dir/documents.parquet")
      .agg(max("doc_id")).head.getLong(0)
    val base = math.pow(10, maxReal.toString.length).toLong
    val byStatus = rows.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(byStatus.keySet == Set("kept", "drop_quality", "drop_exact", "drop_neardup"),
      s"all four dispositions must fire: ${byStatus.keySet}")
    assert(rows.map(_._1).distinct.length == rows.length, "exactly one status per doc")
    // the synthetic corpus has no natural whole-doc dups: every
    // drop_exact must be an injected echo (id >= base), and its
    // original must NOT be drop_exact (min-id keeps)
    assert(byStatus("drop_exact").forall(_ >= base),
      s"drop_exact must be echoes only: ${byStatus("drop_exact").take(5).toList}")
    val statusOf = rows.toMap
    assert(byStatus("drop_exact").forall(id => statusOf(id - base) != "drop_exact"),
      "the echo's original must keep the fingerprint (min-id rule)")
    // echoes share their original's text, so quality verdicts agree
    assert(byStatus("drop_quality").filter(_ >= base)
        .forall(id => statusOf(id - base) == "drop_quality"),
      "echo quality verdict must match its original")
  }

  test("PII redaction replaces emails then phones, counts match") {
    val df = Seq(
      (1L, "mail me at john.doe@example.org or call +44 20 7946 0958 now"),
      (2L, "two mails a@b.co and c.d+e@f-g.org, no phone"),
      (3L, "clean text with a plus + and digits 12345 but no pii")
    ).toDF("id", "text")
    val got = df.select(
        col("id"),
        TextAnalysis.redactPii(col("text")).as("red"),
        TextAnalysis.matchCount(col("text"), TextAnalysis.emailPattern).as("ne"),
        TextAnalysis.matchCount(col("text"), TextAnalysis.phonePattern).as("np"))
      .collect().map(r => (r.getAs[Long]("id"),
        (r.getAs[String]("red"), r.getAs[Int]("ne"), r.getAs[Int]("np")))).toMap
    assert(got(1L) == (("mail me at <EMAIL> or call <PHONE> now", 1, 1)), got(1L))
    assert(got(2L) == (("two mails <EMAIL> and <EMAIL>, no phone", 2, 0)), got(2L))
    assert(got(3L) == (("clean text with a plus + and digits 12345 but no pii", 0, 0)), got(3L))
  }
}
