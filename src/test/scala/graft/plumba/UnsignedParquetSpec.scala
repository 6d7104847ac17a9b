package graft.plumba

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SURVEY §1.3's unsigned-int widening pinned at a REAL parquet
  * boundary (reference type map src/polars_numba/__init__.py:408–424
  * lowers UInt8/16/32/64; Spark has no unsigned ints, so the documented
  * deviation is the parquet-reader convention UINT_8→Short,
  * UINT_16→Int, UINT_32→Long, UINT_64→Decimal(20,0)): a file with
  * genuine unsigned logical types — values beyond each nominal signed
  * range — is written via parquet-java's Group API (Spark cannot write
  * them, which is exactly why unit tests alone never exercised this),
  * read back, schema- and value-asserted, then FOLDED through the
  * kernel path. */
class UnsignedParquetSpec extends AnyFunSuite {

  import org.apache.parquet.example.data.simple.SimpleGroupFactory
  import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
  import org.apache.parquet.schema.MessageTypeParser

  private def writeUnsignedFile(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_uint_").toString
    val path = s"$dir/u.parquet"
    val schema = MessageTypeParser.parseMessageType(
      """message unsigned_row {
        |  required int32 u8 (INTEGER(8,false));
        |  required int32 u16 (INTEGER(16,false));
        |  required int32 u32 (INTEGER(32,false));
        |  required int64 u64 (INTEGER(64,false));
        |}""".stripMargin)
    val conf = new org.apache.hadoop.conf.Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(path))
      .withConf(conf)
      .build()
    val f = new SimpleGroupFactory(schema)
    // each value exceeds the SIGNED range of its nominal width — raw
    // two's-complement bits on disk, meaningful only under the unsigned
    // annotation (u32 = 3e9 > Int.MaxValue, u64 = 2^63 + 10 > Long.MaxValue)
    writer.write(f.newGroup()
      .append("u8", 200).append("u16", 60000)
      .append("u32", 3000000000L.toInt).append("u64", java.lang.Long.MIN_VALUE + 10L))
    writer.write(f.newGroup()
      .append("u8", 1).append("u16", 2).append("u32", 3).append("u64", 4L))
    writer.close()
    path
  }

  test("UINT_8/16/32/64 widen to Short/Int/Long/Decimal(20,0) and fold") {
    val spark = TestSpark.spark
    val df = spark.read.parquet(writeUnsignedFile())
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("u8") == ShortType)
    assert(types("u16") == IntegerType)
    assert(types("u32") == LongType)
    assert(types("u64") == DecimalType(20, 0))
    // every widened column is inside the kernel type surface
    assert(Types.checkKernelTypes(df.schema, Seq("u8", "u16", "u32", "u64")).isEmpty)

    val rows = df.orderBy("u8").collect()
    assert(rows(0).getShort(0) == 1 && rows(1).getShort(0) == 200)
    assert(rows(1).getInt(1) == 60000)
    assert(rows(1).getLong(2) == 3000000000L)
    assert(rows(1).getDecimal(3) == new java.math.BigDecimal("9223372036854775818"))

    // fold the widened columns through the kernel path: exact sums in
    // Long / BigDecimal accumulators
    val sumU32 = CollectOps.collectFold(
      df, Seq("u32"), Seq("u8"),
      Kernel.Fold.of1[Long, Long](0L,
        merge = Some(Kernel.Merge(0L, (a: Long, b: Long) => a + b, commutative = true)))(_ + _))
    assert(sumU32 == 3000000003L)
    val sumU64 = CollectOps.collectFold(
      df, Seq("u64"), Seq("u8"),
      Kernel.Fold.of1[java.math.BigDecimal, java.math.BigDecimal](java.math.BigDecimal.ZERO,
        merge = Some(Kernel.Merge(java.math.BigDecimal.ZERO,
          (a: java.math.BigDecimal, b: java.math.BigDecimal) => a.add(b), commutative = true)))(
        (a, v) => a.add(v)))
    assert(sumU64 == new java.math.BigDecimal("9223372036854775822"))
  }
}
