package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
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
  * Key types: any integral (widened to long) or string. Strings cover
  * the real pruning keys of a training-data pipeline — content hashes,
  * URLs, document fingerprints. `DataFrameStatFunctions.bloomFilter`
  * inserts strings as their UTF-8 bytes (`putString` ==
  * `putBinary(utf8)`; pinned empirically and in BloomJoinSpec), so the
  * probe expression tests `mightContainBinary(UTF8String.getBytes)` —
  * zero-copy from Tungsten row memory, no String materialization.
  * Binary columns are excluded by Spark's own `bloom_filter_agg`.
  *
  * `fpp` tunes sketch size vs pruning power; false positives only cost
  * shuffle bytes, never correctness.
  */
object BloomJoin {

  /** `might_contain(key)` against a broadcast Bloom filter, as a
    * compiled expression (long-widened integrals + UTF-8 strings) — no
    * UDF, no per-row serialization; each task reads the broadcast
    * sketch once. Fully codegen'd (this is the one expression on the
    * 100 TB probe-scan hot path, so unlike the kernel-loop expressions
    * it earns a real `doGenCode`): the generated filter stays inside
    * WholeStageCodegen, tests the sketch directly on the primitive /
    * UTF8String value, and resolves the broadcast once per task into a
    * cached field — zero boxing, zero per-row `Broadcast.value()`
    * lookups. */
  private[operators] case class BloomMightContain(
      child: Expression, bf: Broadcast[BloomFilter])
      extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "bloom_might_contain"
    override protected def nullSafeEval(input: Any): Any = child.dataType match {
      case StringType => bf.value.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)
      case _ => bf.value.mightContainLong(input.asInstanceOf[Number].longValue)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bfClass = classOf[BloomFilter].getName
      val bcName = ctx.addReferenceObj("bloomBc", bf, "org.apache.spark.broadcast.Broadcast")
      // one broadcast resolution per generated-class instance (per task)
      val bfName = ctx.addMutableState(bfClass, "bloomFilter",
        v => s"$v = ($bfClass) $bcName.value();")
      child.dataType match {
        case StringType =>
          defineCodeGen(ctx, ev, c => s"$bfName.mightContainBinary($c.getBytes())")
        case _ =>
          defineCodeGen(ctx, ev, c => s"$bfName.mightContainLong((long) $c)")
      }
    }
    override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
      copy(child = newChild)
  }

  private def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType => true
    case _ => false
  }

  /** Exact left-semi join of `probe` against `build`'s keys, with the
    * probe side Bloom-pruned before its shuffle. Integral or string
    * key columns (both sides must agree — a long sketch never matches
    * string probes). */
  def semiJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val pt = probe.schema(probeKey).dataType
    val bt = build.schema(buildKey).dataType
    require(supported(pt) && supported(bt),
      s"bloom semi join supports integral and string keys, got $pt / $bt")
    require((pt == StringType) == (bt == StringType),
      s"probe and build keys must be in the same hash family (both string or both integral), got $pt / $bt")
    val bf = build.stat.bloomFilter(buildKey, expectedItems, fpp)
    val bfB = probe.sparkSession.sparkContext.broadcast(bf)
    val pruned = probe.filter(ColumnBridge.column(
      BloomMightContain(ColumnBridge.expression(col(probeKey)), bfB)))
    // semi join dedups the build side inherently — no distinct needed
    pruned.join(build.select(col(buildKey).as(probeKey)), Seq(probeKey), "left_semi")
  }
}
