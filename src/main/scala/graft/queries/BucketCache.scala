package graft.queries

import org.apache.spark.sql.SparkSession

/** Shared cache for bucketed-table LAYOUT INVESTMENTS the catalog
  * queries demonstrate amortizing — write once at ingest, join many
  * times with no shuffle on the bucketed side. Tables are written to a
  * temp dir and registered in the session catalog once per cache key
  * (repeated calls — bench reps, verify + tests in one JVM — pay the
  * write once, exactly like a real ingest would).
  *
  * ONE JVM-exit shutdown hook drains every temp dir (registered lazily
  * on first use) — a hook per rebuild would pile up, and a dir already
  * removed by the OS must not make the hook throw at shutdown. */
private[queries] object BucketCache {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()

  private val tmpDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  private lazy val cleanupHook: Unit = {
    sys.addShutdownHook {
      import scala.jdk.CollectionConverters._
      tmpDirs.asScala.foreach { tmp =>
        try {
          if (java.nio.file.Files.exists(tmp)) {
            val walk = java.nio.file.Files.walk(tmp)
            try walk.iterator().asScala.toSeq.sortBy(-_.getNameCount)
              .foreach(p => p.toFile.delete())
            finally walk.close()
          }
        } catch { case _: java.io.IOException => () }
      }
    }
    ()
  }

  /** Get-or-write the bucketed tables for `key`. `write(tag, tmp)`
    * persists the tables (unique names via `tag`, files under `tmp`)
    * and returns their catalog names. compute() (not computeIfAbsent)
    * so a cached entry whose tables were registered in a DIFFERENT
    * SparkSession's catalog (same JVM, new session) is detected via
    * tableExists and rebuilt instead of thrown. */
  def tables(s: SparkSession, key: String,
             write: (String, java.nio.file.Path) => Seq[String]): Seq[String] =
    cache.compute(key, { (_, cached) =>
      if (cached != null && cached.forall(s.catalog.tableExists)) cached
      else {
        val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
        val tmp = java.nio.file.Files.createTempDirectory("graft_bkt_")
        cleanupHook // register the single drain hook (idempotent)
        tmpDirs.add(tmp) // temp bucket dirs must not leak across runs
        write(tag, tmp)
      }
    })
}
