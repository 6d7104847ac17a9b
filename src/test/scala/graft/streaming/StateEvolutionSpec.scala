package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.StreamingNearDup.BucketState

/** The round-16 state-schema-evolution fix: near-dup bucket state
  * persists as a versioned (version, payload) envelope, so widening
  * the logical state is a decoder branch instead of the checkpoint
  * break the round-14 tuple widening caused. Two layers of proof:
  * codec-level version handling, and a REAL restart — a checkpoint
  * authored by the version-1 writer, reopened by the production
  * reader, with its migrated state observably driving a cross-run
  * near-dup hit. */
class StateEvolutionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val fields = BucketState.Fields(
    ids = List(7L, 3L),
    sigs = List(Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
    secs = List(1000007L, 1000003L),
    admitted = 5L)

  test("codec: v2 round-trips; v1 decodes with admitted defaulted to the list length") {
    assert(BucketState.decode(BucketState.encode(fields)) == fields)
    val v1 = BucketState.encodeV1(fields.ids, fields.sigs, fields.secs)
    assert(v1.version == 1)
    val got = BucketState.decode(v1)
    assert(got.ids == fields.ids && got.sigs == fields.sigs && got.secs == fields.secs)
    assert(got.admitted == 2L,
      "v1 state must reconstruct admitted as the list length (the rule that build gated on)")
    // a FUTURE version must fail loudly — an older library must never
    // silently misread a newer checkpoint
    val future = BucketState(3, BucketState.encode(fields).payload)
    assertThrows[IllegalStateException](BucketState.decode(future))
  }

  test("restart: a v1-written checkpoint reopens under the production reader, state intact") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_stev_").toFile
    sys.addShutdownHook { def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); () }; rm(root) }
    val srcDir = new java.io.File(root, "src"); srcDir.mkdirs()
    val cp = new java.io.File(root, "cp").toString
    val base =
      "the quick brown fox jumps over the lazy dog while rain falls on the quiet town square"

    def addFile(name: String, rows: Seq[(Long, String)]): Unit = {
      val stage = new java.io.File(root, s"stage_$name")
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(stage.toString)
      val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        new java.io.File(srcDir, s"$name.parquet").toPath)
      ()
    }
    addFile("a", Seq(1L -> base,
      2L -> "completely different corpus text about ships and harbors at dawn light"))
    val schema = spark.read.parquet(s"$srcDir/a.parquet").schema

    def run(enc: BucketState.Fields => BucketState): Set[(Long, Long)] = {
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir.toString + "/*.parquet")
      val hits = StreamingNearDup.neardupStatefulVersioned(
        src, horizonSec = 1000000L, maxBucket = 1000, threshold = 0.3, enc)
      val got = scala.collection.mutable.Set.empty[(Long, Long)]
      val q = hits.toDF().writeStream
        .option("checkpointLocation", cp)
        .outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          got.synchronized { got ++= df.collect().map(r => (r.getLong(1), r.getLong(2))) }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      got.toSet
    }

    // run 1: the OLD build (version-1 state writer) indexes docs 1 and 2
    val first = run(f => BucketState.encodeV1(f.ids, f.sigs, f.secs))
    assert(first.isEmpty, s"no near-dups exist within the first batch: $first")

    // run 2: the PRODUCTION build reopens the same checkpoint; a new
    // near-dup of doc 1 arrives and must hit the state written as v1
    addFile("b", Seq(50L -> base.replace("square", "plaza")))
    val second = run(BucketState.encode)
    assert(second.contains((1L, 50L)),
      s"the v1-written state must survive the restart and produce the cross-run hit: $second")
    assert(!second.exists(_._1 == 2L), s"unrelated corpus doc must not match: $second")
  }
}
