package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** ANN RECALL UNDER GROWTH (round-13 item #5): recall@5 of the IVF
  * index against brute force on the BASE corpus and the 10× synthetic
  * corpus, across codebook flavors (untrained md5-rule centroids vs
  * Lloyd's-trained) and nProbe ∈ {1,2,4} — plus, at 10×, the nCells
  * dial (frozen 16 vs cell-size-preserving 160) to answer the actual
  * scale question: does recall COLLAPSE when the corpus grows under a
  * frozen cell count, and does scaling nCells with n (the same k ∝ n
  * family as [[Similarity.autoK]]) restore it?
  *
  * One TSV line per point:
  * `ANNRECALL scale trained nCells nProbe recall_pct probe_sec`.
  * Recall is the exact-overlap definition of the `ann_recall_audit`
  * gate (left-semi join on (query_id, corpus_id), 50 probe queries).
  *
  * Usage: `sbt "runMain graft.AnnRecallProbe [baseDir] [copies]"`.
  */
object AnnRecallProbe {

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir10 = java.nio.file.Files.createTempDirectory("graft_annr_").toString
    ScaleProbe.synthesize(spark, baseDir, dir10, copies)

    println("ANNRECALL\tscale\ttrained\tnCells\tnProbe\trecall_pct\tprobe_sec")
    Seq(("base", s"$baseDir/embeddings.parquet", Seq(16)),
        ("10x", s"$dir10/embeddings.parquet", Seq(16, 160))).foreach {
      case (label, path, cellCounts) =>
        val e = spark.read.parquet(path)
        val q = e.filter(col("vec_id") < 50)
        val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
          .select("query_id", "corpus_id").cache()
        val denom = exact.count()
        def run(nCells: Int, nProbe: Int, trained: Boolean): (Long, Double) = {
          val t0 = System.nanoTime()
          val approx = Similarity.ivfTopK(e, q, "vec_id", "embedding",
            k = 5, nCells = nCells, nProbe = nProbe, trained = trained)
            .select("query_id", "corpus_id")
          val hits = exact.join(approx, Seq("query_id", "corpus_id"), "left_semi").count()
          (hits, (System.nanoTime() - t0) / 1e9)
        }
        for (trained <- Seq(false, true); nCells <- cellCounts;
             // past the base sweep, also scale nProbe WITH nCells — the
             // dial pair: recall tracks the probed fraction nProbe/nCells
             nProbe <- Seq(1, 2, 4) ++ (if (nCells > 16) Seq(8, 16, 40) else Nil)) {
          run(nCells, nProbe, trained) // warm
          val (hits, sec) = run(nCells, nProbe, trained)
          val pct = hits * 100 / denom
          println(f"ANNRECALL\t$label\t$trained\t$nCells\t$nProbe\t$pct\t$sec%.2f")
        }
        // the shipped AUTO dial (autoCells/autoProbe) at this scale —
        // the row that certifies the API helpers land users on the
        // recall-preserving pair, not the measured-wrong naive wiring
        val n = e.count()
        val autoC = Similarity.autoCells(n)
        val autoP = Similarity.autoProbe(autoC)
        for (trained <- Seq(false, true)) {
          run(autoC, autoP, trained) // warm
          val (hits, sec) = run(autoC, autoP, trained)
          val pct = hits * 100 / denom
          println(f"ANNRECALL\t$label-auto\t$trained\t$autoC\t$autoP\t$pct\t$sec%.2f")
        }
        exact.unpersist()
    }
    spark.stop()
  }
}
