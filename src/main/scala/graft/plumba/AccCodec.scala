package graft.plumba

import org.apache.spark.SparkConf
import org.apache.spark.serializer.{KryoSerializer, SerializerInstance}

/** Accumulator byte codec for the salted fold/scan/asof partials —
  * round-21 per-task-work fix (opt guide §1.2 step 2): the original
  * per-value `new ObjectOutputStream(new ByteArrayOutputStream)` costs
  * a stream header + reflection walk PER (group, bucket) partial, and
  * JobProbe measured the partial/seed stages of
  * `group_scan_cummax_salted` spending ~0.6 s of their 1.4 s of
  * executor time in exactly that (24k stream constructions for 1.5k
  * groups × 8 buckets). Spark's KryoSerializer (chill's Scala
  * instantiator — tuples, case classes, Array[Any] payloads all
  * registered) serializes the same values in ~1/20 the time.
  *
  * The bytes are INTERNAL to one query (partial rows between two
  * stages of the same job) — never persisted, never compared across
  * engines — so the wire format is free to change; only round-trip
  * fidelity matters, which KryoRoundTripSpec pins for every
  * accumulator shape the salted operators ship. */
private[graft] object AccCodec {
  private val local = new ThreadLocal[SerializerInstance] {
    override def initialValue(): SerializerInstance = {
      // Build from the live SparkEnv conf when one exists (executor or
      // local-mode task thread) so user kryo settings — custom
      // registrators, spark.kryoserializer.buffer.max — apply to these
      // partials too; a bare SparkConf() only as the no-session
      // fallback (unit tests). With the default conf the per-value
      // ceiling is spark.kryoserializer.buffer.max = 64m — far above
      // any per-(group,bucket) accumulator, but a session that raises
      // it now gets the raise here as well.
      val conf = Option(org.apache.spark.SparkEnv.get)
        .map(_.conf).getOrElse(new SparkConf())
      new KryoSerializer(conf).newInstance()
    }
  }

  def ser(a: Any): Array[Byte] = {
    val bb = local.get().serialize[Any](a)(scala.reflect.ClassTag.Any)
    val out = new Array[Byte](bb.remaining())
    bb.get(out)
    out
  }

  def deser[A](bytes: Array[Byte]): A =
    local.get()
      .deserialize[Any](java.nio.ByteBuffer.wrap(bytes))(scala.reflect.ClassTag.Any)
      .asInstanceOf[A]
}
