package graft.plumba

import org.scalatest.funsuite.AnyFunSuite

/** Round-21 focused spec for the kryo accumulator codec that replaced
  * java serialization in the salted fold/scan/asof partials: every
  * accumulator shape those operators actually ship must round-trip
  * exactly (the bytes are internal to one query — only fidelity
  * matters, not the wire format). */
class AccCodecSpec extends AnyFunSuite {

  private def rt[A](a: A): A = AccCodec.deser[A](AccCodec.ser(a))

  test("primitive accumulators round-trip") {
    assert(rt(42.5: Double) == 42.5)
    assert(rt(7L) == 7L)
    assert(rt(-3: Int) == -3)
    assert(rt(true) == true)
  }

  test("Streak segment state (Long 4-tuple) round-trips") {
    val s: Streak.S = (3L, 9L, 2L, 17L)
    assert(rt(s) == s)
  }

  test("tuple and case-class-ish accumulators round-trip") {
    assert(rt((1.5, 4L)) == ((1.5, 4L)))
    assert(rt(("acc", 2.0, 3L)) == (("acc", 2.0, 3L)))
  }

  test("asof payload Array[Any] with mixed Spark external types round-trips") {
    val pay: Array[Any] = Array(1234L, "o_clerk#42", new java.math.BigDecimal("12345.67"),
      java.sql.Date.valueOf("2026-08-18"), null, 3.25)
    val back = rt(pay)
    assert(back.length == pay.length)
    assert(back(0) == 1234L && back(1) == "o_clerk#42")
    assert(back(2) == new java.math.BigDecimal("12345.67"))
    assert(back(3) == java.sql.Date.valueOf("2026-08-18"))
    assert(back(4) == null && back(5) == 3.25)
  }

  test("null accumulator round-trips (empty-bucket sentinel)") {
    assert(rt(null: Any) == null)
  }
}
