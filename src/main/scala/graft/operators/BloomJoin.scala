package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter-accelerated SEMI JOIN — the canonical 100 TB
  * shuffle-reduction pattern, made explicit: build a Bloom filter over
  * the (smaller) build side's keys, broadcast the sketch (KB–MB, far
  * below broadcast-join thresholds for the same key count), pre-filter
  * the probe side BEFORE its shuffle, then run the exact semi join on
  * the survivors.
  *
  * Results are EXACT: the final semi join removes the filter's false
  * positives and Bloom filters have no false negatives — the sketch
  * only reduces how many probe rows reach the shuffle (by ~the
  * non-matching fraction). Spark's AQE can inject runtime filters for
  * some shapes (`spark.sql.optimizer.runtime.bloomFilter.enabled`);
  * this operator is the explicit, always-on version with a documented
  * sizing dial, for pipelines that know their selectivity.
  *
  * `fpp` tunes sketch size vs pruning power; false positives only cost
  * shuffle bytes, never correctness.
  */
object BloomJoin {

  /** `might_contain(key)` against a broadcast Bloom filter, as a
    * compiled expression (long keys) — no UDF, no per-row
    * serialization; each task reads the broadcast sketch once. */
  private[operators] case class BloomMightContain(
      child: Expression, bf: Broadcast[BloomFilter])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "bloom_might_contain"
    override protected def nullSafeEval(input: Any): Any =
      bf.value.mightContainLong(input.asInstanceOf[Long])
    override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
      copy(child = newChild)
  }

  /** Exact left-semi join of `probe` against `build`'s keys, with the
    * probe side Bloom-pruned before its shuffle. Long key columns. */
  def semiJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    require(probe.schema(probeKey).dataType == LongType &&
      build.schema(buildKey).dataType == LongType,
      "bloom semi join supports long keys (the sketch hashes longs)")
    val bf = build.stat.bloomFilter(buildKey, expectedItems, fpp)
    val bfB = probe.sparkSession.sparkContext.broadcast(bf)
    val pruned = probe.filter(ColumnBridge.column(
      BloomMightContain(ColumnBridge.expression(col(probeKey)), bfB)))
    // semi join dedups the build side inherently — no distinct needed
    pruned.join(build.select(col(buildKey).as(probeKey)), Seq(probeKey), "left_semi")
  }
}
