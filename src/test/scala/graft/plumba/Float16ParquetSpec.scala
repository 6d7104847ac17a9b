package graft.plumba

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The Float16→Float widening documented in [[Types]] (reference type
  * map src/polars_numba/__init__.py:408–424 lowers Float16 to numpy
  * float16), pinned at a REAL parquet boundary like
  * [[UnsignedParquetSpec]]: a file with a genuine FLOAT16 logical-type
  * column (2-byte little-endian payloads, including the max finite
  * half 65504, a subnormal, and -0.0) is written via parquet-java's
  * Group API, read back through [[graft.sources.HalfFloat.readParquet]]
  * — vanilla Spark REJECTS the FLOAT16 logical type outright
  * (PARQUET_TYPE_ILLEGAL, verified below), which is exactly why the
  * library ships its own widening reader — then schema- and
  * value-asserted and folded through the kernel path. */
class Float16ParquetSpec extends AnyFunSuite {

  import org.apache.parquet.example.data.simple.SimpleGroupFactory
  import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
  import org.apache.parquet.io.api.Binary
  import org.apache.parquet.schema.MessageTypeParser

  // (id, raw half bits, exact widened float) — bit patterns fixed by
  // IEEE 754 binary16, values chosen exactly representable in binary32
  private val fixtures: Seq[(Long, Int, Float)] = Seq(
    (1L, 0x3C00, 1.0f),
    (2L, 0x3E00, 1.5f),
    (3L, 0xC000, -2.0f),
    (4L, 0x7BFF, 65504.0f), // max finite half
    (5L, 0x0001, 5.9604645e-8f), // smallest subnormal = 2^-24
    (6L, 0x8000, -0.0f),
    (7L, 0x7C00, Float.PositiveInfinity),
    (8L, 0xFC00, Float.NegativeInfinity),
    (9L, 0x7E00, Float.NaN)) // canonical quiet NaN

  private def writeHalfFile(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_f16_").toString
    val path = s"$dir/h.parquet"
    val schema = MessageTypeParser.parseMessageType(
      """message half_row {
        |  required int64 id;
        |  required fixed_len_byte_array(2) h (FLOAT16);
        |}""".stripMargin)
    val conf = new org.apache.hadoop.conf.Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(path))
      .withConf(conf)
      .build()
    val f = new SimpleGroupFactory(schema)
    fixtures.foreach { case (id, bits, _) =>
      // FLOAT16 payload is the 2 half bits LITTLE-ENDIAN (parquet spec)
      val b = Array[Byte]((bits & 0xff).toByte, ((bits >> 8) & 0xff).toByte)
      writer.write(f.newGroup().append("id", id)
        .append("h", Binary.fromConstantByteArray(b)))
    }
    writer.close()
    path
  }

  test("FLOAT16 parquet column widens to FloatType with exact values, and folds") {
    val spark = TestSpark.spark
    val path = writeHalfFile()
    // vanilla Spark rejects the type — the condition the reader exists for
    val e = intercept[Exception](spark.read.parquet(path).collect())
    assert(e.getMessage.contains("FLOAT16") || e.getMessage.contains("PARQUET_TYPE_ILLEGAL"),
      s"expected the stock reader to reject FLOAT16, got: ${e.getMessage.take(200)}")

    val df = graft.sources.HalfFloat.readParquet(spark, path)
    assert(df.schema("h").dataType == FloatType,
      s"FLOAT16 must widen to FloatType, got ${df.schema("h").dataType}")
    assert(Types.checkKernelTypes(df.schema, Seq("h")).isEmpty,
      "the widened half column must be inside the kernel type surface")

    val got = df.orderBy("id").collect().map(r => (r.getLong(0), r.getFloat(1)))
    fixtures.foreach { case (id, _, want) =>
      val v = got.find(_._1 == id).get._2
      // exact bit equality — every fixture value is exactly
      // representable in binary32, so widening must not perturb it
      assert(java.lang.Float.floatToIntBits(v) == java.lang.Float.floatToIntBits(want),
        s"id=$id: got $v want $want")
    }

    // fold through the kernel path (finite rows only): binary16 values
    // are dyadic, so the double sum is exact
    val sum = CollectOps.collectFold(
      df.filter("id <= 6"), Seq("h"), Seq("id"),
      Kernel.Fold.of1[Double, Float](0.0,
        merge = Some(Kernel.Merge(0.0, (a: Double, b: Double) => a + b, commutative = true)))(
        (acc, x) => acc + x))
    assert(sum == (1.0 + 1.5 - 2.0 + 65504.0 + math.pow(2, -24) + 0.0),
      s"fold over widened halves diverged: $sum")
  }
}
