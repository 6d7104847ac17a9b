package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ZIPF-SKEW PROBE — measures the hybrid unigram join's WIN CASE, the
  * one scenario `unigram_logfreq_hybrid` exists for and the one the
  * uniform fixture can never produce (VERDICT r9/r10: "the hybrid's
  * win case is unmeasured").
  *
  * The instance⋈vocab join is the textbook hot-key workload: under a
  * Zipf token distribution the head tokens join a CONSTANT FRACTION of
  * all corpus instances, so a plain token-keyed shuffle sends that
  * fraction to a handful of reducers no matter how many there are. The
  * fixture's synthetic documents are near-uniform (no head), so on it
  * the hybrid's extra passes are pure overhead — this probe synthesizes
  * the missing skew and measures the crossover.
  *
  * Skew synthesis (deterministic, no RNG): each document appends a
  * hot-token block of its own token count, the token chosen per doc as
  * `elt(doc_id % 3 + 1, 'zq', 'zx', 'zj')` — afterwards the 3 head
  * tokens carry ~50% of ALL token instances (~16.7% each), the Zipf
  * head profile, while every original token keeps its exact count (the
  * tail distribution is untouched). With 32 shuffle partitions the
  * plain join lands half the corpus on ≤3 reducers; the hybrid
  * broadcasts the head so those instances never shuffle.
  *
  * Usage: `sbt "runMain graft.SkewProbe [baseDir] [copies]"` —
  * synthesizes `copies`× decorrelated uniform AND zipf corpora from
  * baseDir (default sf0.1), times `unigram_logfreq_score` vs
  * `unigram_logfreq_hybrid` on each (Bench methodology: noop sink,
  * min of warm reps, steal telemetry). One `SKEW\t...` line per
  * (corpus, query). Results recorded in SCALE.md §hybrid-crossover. */
object SkewProbe {

  /** Append the per-doc hot block: token count doubles, half the new
    * instances are one of 3 head tokens. */
  private def zipfText(text: org.apache.spark.sql.Column, docId: org.apache.spark.sql.Column) =
    concat(text, lit(" "),
      repeat(
        elt((docId % 3).cast("int") + 1, lit("zq "), lit("zx "), lit("zj ")),
        greatest(size(split(text, " +")), lit(1))))

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tmp = java.nio.file.Files.createTempDirectory("graft_skew_").toString
    val dirU = s"$tmp/uniform"; val dirZ = s"$tmp/zipf"
    val base = spark.read.parquet(s"$baseDir/documents.parquet")
    def spill(out: String, zipf: Boolean): Unit = {
      val all = (0 until copies).map { i =>
        val d = base
          .withColumn("doc_id", col("doc_id") + lit(i * ScaleProbe.KeyOff))
          .withColumn("text", ScaleProbe.remap(col("text"), i))
        if (zipf) d.withColumn("text", zipfText(col("text"), col("doc_id"))) else d
      }.reduce(_ unionAll _)
      all.repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")
    }
    val t0 = System.nanoTime()
    spill(dirU, zipf = false)
    spill(dirZ, zipf = true)
    println(f"SKEW_SYNTH\t${(System.nanoTime() - t0) / 1e9}%.1f s -> $tmp (x$copies)")

    def stealTicks(): Long =
      try {
        val f = scala.io.Source.fromFile("/proc/stat").getLines().next().trim.split("\\s+")
        if (f.length > 8) f(8).toLong else 0L
      } catch { case scala.util.control.NonFatal(_) => 0L }
    def minTime(fn: (SparkSession, String) => DataFrame, dir: String): Double =
      (1 to math.max(1, reps)).map { _ =>
        val t = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t) / 1e9
      }.min

    val queries = Seq("unigram_logfreq_score", "unigram_logfreq_hybrid")
    // JIT warmup on the tiny fixture (the ScaleProbe convention)
    spark.range(1000).selectExpr("sum(id)").collect()
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if (new java.io.File(warmDir).isDirectory)
      queries.foreach { n =>
        try SparkEntry.queries(n)(spark, warmDir).write.mode("overwrite").format("noop").save()
        catch { case scala.util.control.NonFatal(_) => () }
      }
    println("corpus\tquery\tt_s\tsteal_s")
    for (corpus <- Seq("uniform" -> dirU, "zipf" -> dirZ); name <- queries) {
      val st0 = stealTicks()
      val t = minTime(SparkEntry.queries(name), corpus._2)
      println(f"SKEW\t${corpus._1}\t$name\t$t%.2f\t${(stealTicks() - st0) / 100.0}%.1f")
    }
    def rm(f: java.io.File): Unit = { Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); () }
    rm(new java.io.File(tmp))
    spark.stop()
  }
}

/** HOT-KEY AS-OF PROBE — measures `asofLastSalted`'s win case, the one
  * scenario the range-salted variant exists for (VERDICT r11 "perf-weak
  * list: asof_large_order_salted, unmeasured win case"): a customer key
  * owning a constant fraction of the whole orders corpus. In the plain
  * [[graft.operators.AsofJoin.asofLast]] the key-partitioned shuffle
  * lands that customer's ENTIRE timeline (sort + carry) on one task;
  * the salted variant spreads it over `buckets` tasks at the cost of a
  * partial/seed/carry three-stage plan.
  *
  * Skew synthesis (deterministic): `copies`× decorrelated orders
  * (key-offset per copy, the ScaleProbe convention); the HOT corpus
  * additionally reassigns every even o_orderkey to customer 1 — one
  * key then owns 50% of all rows while every other key keeps its
  * timeline. The uniform twin measures the salt's overhead when the
  * skew it defends against is absent (orders' natural key spread:
  * ~10 rows/key).
  *
  * AQE's skew-join split is NOT a comparator here by construction:
  * it splits ShuffledJoin partitions, and the as-of carry is a
  * repartition + sortWithinPartitions + mapPartitions stage AQE must
  * not split (every row of a key must stream through one carry). The
  * SMJ formulation AQE could fix (join on key with r.time <= l.time,
  * then per-row argmax) is O(hot_left × hot_right) on the hot key —
  * the quadratic blowup this operator exists to avoid — and is
  * measured here at 10× only (100× does not finish a rep in bounded
  * time precisely because of that product).
  *
  * Usage: `sbt "runMain graft.AsofSkewProbe [baseDir] [copies...]"` —
  * one `ASOF\t...` line per (scale, corpus, variant). Results recorded
  * in SCALE.md §asof-crossover. */
object AsofSkewProbe {

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copiesList = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(10, 100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def stealTicks(): Long =
      try {
        val f = scala.io.Source.fromFile("/proc/stat").getLines().next().trim.split("\\s+")
        if (f.length > 8) f(8).toLong else 0L
      } catch { case scala.util.control.NonFatal(_) => 0L }

    def variants(dir: String): Seq[(String, () => DataFrame)] = {
      def o = spark.read.parquet(s"$dir/orders.parquet")
      def large = o.filter(col("o_totalprice") > 200000)
        .groupBy("o_custkey", "o_orderdate").agg(max("o_totalprice").as("big_price"))
      def left = o.select("o_custkey", "o_orderdate", "o_orderkey")
      Seq(
        "unsalted" -> (() => graft.operators.AsofJoin.asofLast(
          left, large, Seq("o_custkey"), "o_orderdate", Seq("big_price"))),
        "salted8" -> (() => graft.operators.AsofJoin.asofLastSalted(
          left, large, Seq("o_custkey"), "o_orderdate", Seq("big_price"), buckets = 8)),
        "salted32" -> (() => graft.operators.AsofJoin.asofLastSalted(
          left, large, Seq("o_custkey"), "o_orderdate", Seq("big_price"), buckets = 32)))
    }

    // JIT warm on the tiny fixture
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if (new java.io.File(warmDir).isDirectory)
      variants(warmDir).foreach { case (_, f) =>
        try f().write.mode("overwrite").format("noop").save()
        catch { case scala.util.control.NonFatal(_) => () }
      }

    println("scale\tcorpus\tvariant\tt_s\tsteal_s")
    for (copies <- copiesList) {
      val tmp = java.nio.file.Files.createTempDirectory("graft_asof_").toString
      val base = spark.read.parquet(s"$baseDir/orders.parquet")
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
      /** `hotMod` = 0: uniform; else rows with o_orderkey % hotMod != 0
        * move to customer 1 — hot fraction (hotMod-1)/hotMod. */
      def spill(out: String, hotMod: Int): Unit = {
        val all = (0 until copies).map { i =>
          base
            .withColumn("o_orderkey", col("o_orderkey") + lit(i * ScaleProbe.KeyOff))
            .withColumn("o_custkey", col("o_custkey") + lit(i * ScaleProbe.KeyOff))
        }.reduce(_ unionAll _)
        val skewed =
          if (hotMod > 0) all.withColumn("o_custkey",
            when(col("o_orderkey") % hotMod =!= 0, lit(1L)).otherwise(col("o_custkey")))
          else all
        skewed.repartition(32).write.mode("overwrite").parquet(s"$out/orders.parquet")
      }
      val t0 = System.nanoTime()
      spill(s"$tmp/uniform", hotMod = 0)
      spill(s"$tmp/hot50", hotMod = 2)
      spill(s"$tmp/hot90", hotMod = 10)
      println(f"ASOF_SYNTH\t${copies}x\t${(System.nanoTime() - t0) / 1e9}%.1f s -> $tmp")
      for (corpus <- Seq("uniform", "hot50", "hot90"); (name, f) <- variants(s"$tmp/$corpus")) {
        val st0 = stealTicks()
        val t = (1 to math.max(1, reps)).map { _ =>
          val t1 = System.nanoTime()
          f().write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t1) / 1e9
        }.min
        println(f"ASOF\t${copies}x\t$corpus\t$name\t$t%.2f\t${(stealTicks() - st0) / 100.0}%.1f")
      }
      def rm(f: java.io.File): Unit = { Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); () }
      rm(new java.io.File(tmp))
    }
    spark.stop()
  }
}
