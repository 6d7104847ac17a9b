package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** AQE runtime skew-join demonstration — the REACTIVE half of the skew
  * story next to the proactive operators (`SaltedJoin`,
  * `AsofJoin.asofLastSalted`, `groupScanMergeable`): when a sort-merge
  * join's shuffle materializes a hot partition, adaptive execution
  * splits it into parallel sub-partitions at runtime
  * (`spark.sql.adaptive.skewJoin.*`). This spec pins that the knob
  * actually fires on this build — a 90%-hot-key join, thresholds tuned
  * to the test's data volume, and the executed plan marked
  * `isSkew=true` — so the library's guidance ("salt what you know is
  * hot, let AQE catch what you didn't") is backed by a running test,
  * not folklore. Session-local confs on a cloned session: the shared
  * test session is untouched. */
class AqeSkewJoinSpec extends AnyFunSuite {

  test("AQE splits the hot partition of a skewed sort-merge join at runtime") {
    val s = TestSpark.spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // tuned to the fixture: a partition is "skewed" beyond 64 KB and
    // 2x the median; split target 32 KB. Broadcast disabled so the
    // join genuinely sort-merges (a broadcast would hide the skew).
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    import s.implicits._

    // 200k probe rows, 90% on one key; build side has every key once
    val probe = s.range(0, 200000)
      .selectExpr("CASE WHEN id % 10 = 0 THEN id % 50 ELSE 7777 END AS k", "id AS v")
    val build = s.range(0, 10000).selectExpr("id AS bk", "id * 2 AS w")
    val joined = probe.join(build.hint("merge"), $"k" === $"bk")
    // run THIS DataFrame's own query execution (count() or .rdd would
    // each spawn a separate QueryExecution and the adaptive plan we
    // inspect below would never have executed)
    val n = joined.queryExecution.executedPlan.execute().count()
    assert(n > 0)
    // AQE rewrites show up in the final adaptive plan after execution
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), s"adaptive plan did not finalize:\n$plan")
    assert(plan.contains("isSkew=true") || plan.contains("skew=true"),
      s"expected AQE to mark skewed partitions in the final plan:\n$plan")
  }
}
