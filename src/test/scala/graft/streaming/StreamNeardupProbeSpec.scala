package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.llm.{Dedup, Sampling}
import graft.queries.StreamingQueries

/** Streaming near-dup probe vs its batch twin on a crafted fixture.
  * Doc ids are chosen for their md5 hash bucket (the query's split
  * rule): 27 and 59 land below 13 (the arriving batch), 1..4 at or
  * above (the static corpus). */
class StreamNeardupProbeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while rain falls on the quiet town square"

  private lazy val fixtureDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft_npfix_").toFile
    sys.addShutdownHook { def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); () }; rm(dir) }
    val docs = Seq(
      (1L, "completely different corpus text about ships and harbors at dawn light"),
      (2L, base),
      (3L, "another unrelated corpus document mentioning mountains rivers and long hiking trails"),
      (4L, "short filler corpus entry with enough words to shingle cleanly today"),
      (27L, base.replace("square", "plaza")), // near-dup of doc 2
      (59L, "totally novel probe content sharing no shingles with any corpus document at all")
    ).toDF("doc_id", "text")
    docs.coalesce(1).write.parquet(new java.io.File(dir, "documents.parquet").toString)
    dir.toString
  }

  test("streaming probe equals the batch probe composition (same split, cap, threshold)") {
    val streamed = StreamingQueries.streamNeardupProbe(spark, fixtureDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

    val docs = spark.read.parquet(s"$fixtureDir/documents.parquet").select("doc_id", "text")
    val isBatch = Sampling.hashBucket256(col("doc_id")) < 13
    val idx = Dedup.bandBuckets(Dedup.shingleHashSets(docs.filter(!isBatch), "doc_id", "text"))
      .select(col("id").as("cand_id"), col("sig").as("cand_sig"), col("bucket"))
    val batch = Dedup.bandBuckets(Dedup.shingleHashSets(docs.filter(isBatch), "doc_id", "text"))
      .join(idx, "bucket")
      .withColumn("est_jaccard", Dedup.signatureSimilarity(col("sig"), col("cand_sig")))
      .filter(col("est_jaccard") >= 0.3)
      .select(col("id"), col("bucket"), col("cand_id"), col("est_jaccard"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

    assert(streamed == batch, s"stream/batch divergence: ${streamed.diff(batch)} vs ${batch.diff(streamed)}")
    // the near-dup is found, the novel doc matches nothing
    assert(streamed.map(_._1).contains(27L) && streamed.forall(_._3 == 2L),
      s"probe 27 must hit corpus doc 2 and nothing else: $streamed")
    assert(!streamed.map(_._1).contains(59L), "novel probe doc must produce no hits")
  }
}
