package graft.core

/** Minimal Thrift compact-protocol primitives.
  *
  * A hand-rolled scanner/writer pair (per the Apache Thrift compact protocol
  * spec) is used instead of forking generated code the way the reference does
  * (`/root/reference/python/palletjack/parquet_types_palletjack.cpp:6946-7040`
  * instruments codegen to capture byte offsets). A streaming walker that
  * records offsets for the handful of interesting fields is smaller and
  * survives parquet-format upgrades.
  */
object ThriftCompact {
  // Compact-protocol element type ids (Thrift spec).
  final val TypeBoolTrue = 1
  final val TypeBoolFalse = 2
  final val TypeByte = 3
  final val TypeI16 = 4
  final val TypeI32 = 5
  final val TypeI64 = 6
  final val TypeDouble = 7
  final val TypeBinary = 8
  final val TypeList = 9
  final val TypeSet = 10
  final val TypeMap = 11
  final val TypeStruct = 12

  /** Guard limits mirroring the reference's thrift-bomb protection
    * (`palletjack.cc:82-83`). */
  final val StringSizeLimit: Int = 100 * 1000 * 1000
  final val ContainerSizeLimit: Int = 1000 * 1000

  /** Forward-only cursor over a compact-protocol buffer. `pos` is the
    * running byte offset (the reference's `xfer` counter). */
  final class Reader(val buf: Array[Byte], start: Int, val end: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)
    var pos: Int = start

    def u8(): Int = {
      if (pos >= end) throw new IllegalStateException("Thrift: read past end of buffer")
      val b = buf(pos) & 0xff; pos += 1; b
    }

    def readVarint64(): Long = {
      var result = 0L; var shift = 0
      while (true) {
        val b = u8()
        result |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
        if (shift > 63) throw new IllegalStateException("Thrift: varint too long")
      }
      result // unreachable
    }

    def readZigZag64(): Long = { val n = readVarint64(); (n >>> 1) ^ -(n & 1) }
    def readZigZag32(): Int = readZigZag64().toInt

    def skipBytes(n: Int): Unit = {
      if (n < 0 || pos + n > end) throw new IllegalStateException("Thrift: skip past end of buffer")
      pos += n
    }

    def readBinaryLength(): Int = {
      val len = readVarint64()
      if (len < 0 || len > StringSizeLimit)
        throw new IllegalStateException(s"Thrift: string size $len over limit")
      len.toInt
    }

    /** Read a binary value (varint length + raw bytes). */
    def readBinary(): Array[Byte] = {
      val len = readBinaryLength()
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + len)
      skipBytes(len)
      out
    }

    /** Read a string value (varint length + utf8 bytes). */
    def readString(): String = {
      val len = readBinaryLength()
      val s = new String(buf, pos, len, java.nio.charset.StandardCharsets.UTF_8)
      skipBytes(len)
      s
    }

    /** List/set header: returns (elemType, size). */
    def readListHeader(): (Int, Int) = {
      val b = u8()
      val elemType = b & 0x0f
      var size = (b >> 4) & 0x0f
      if (size == 15) size = readVarint64().toInt
      if (size < 0 || size > ContainerSizeLimit)
        throw new IllegalStateException(s"Thrift: container size $size over limit")
      (elemType, size)
    }

    /** Field header inside a struct. Returns (type, fieldId) or (0, _) at stop.
      * `lastFid` is the caller-maintained previous field id. */
    def readFieldHeader(lastFid: Int): (Int, Int) = {
      val b = u8()
      if (b == 0) return (0, 0)
      val tpe = b & 0x0f
      val delta = (b >> 4) & 0x0f
      val fid = if (delta != 0) lastFid + delta else readZigZag64().toInt
      (tpe, fid)
    }

    /** Skip a value of the given compact type. Bool values inside structs are
      * carried by the field-header type itself (zero bytes). */
    def skipValue(tpe: Int): Unit = tpe match {
      case TypeBoolTrue | TypeBoolFalse => ()
      case TypeByte => skipBytes(1)
      case TypeI16 | TypeI32 | TypeI64 => { readVarint64(); () }
      case TypeDouble => skipBytes(8)
      case TypeBinary => skipBytes(readBinaryLength())
      case TypeList | TypeSet =>
        val (et, n) = readListHeader()
        var i = 0
        while (i < n) { skipListElement(et); i += 1 }
      case TypeMap =>
        val b = u8()
        if (b != 0) {
          // non-empty map: byte was first varint byte of size — rewind and reread
          pos -= 1
          val size = readVarint64().toInt
          if (size > ContainerSizeLimit)
            throw new IllegalStateException(s"Thrift: map size $size over limit")
          val kv = u8()
          val kt = (kv >> 4) & 0x0f; val vt = kv & 0x0f
          var i = 0
          while (i < size) { skipListElement(kt); skipListElement(vt); i += 1 }
        }
      case TypeStruct => skipStruct()
      case other => throw new IllegalStateException(s"Thrift: unknown compact type $other")
    }

    /** List elements encode bools as one byte, unlike struct fields. */
    private def skipListElement(tpe: Int): Unit = tpe match {
      case TypeBoolTrue | TypeBoolFalse => skipBytes(1)
      case _ => skipValue(tpe)
    }

    def skipStruct(): Unit = {
      var lastFid = 0
      var done = false
      while (!done) {
        val (tpe, fid) = readFieldHeader(lastFid)
        if (tpe == 0) done = true
        else { lastFid = fid; skipValue(tpe) }
      }
    }
  }

  /** The three scratch writes the splicer needs (list header / i32 / i64),
    * equivalent to the reference's `ThriftCopier.Write*`
    * (`palletjack.cc:165-193`). */
  object Write {
    def varint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def zigzag(out: java.io.ByteArrayOutputStream, v: Long): Unit =
      varint(out, (v << 1) ^ (v >> 63))

    def listBegin(out: java.io.ByteArrayOutputStream, elemType: Int, size: Int): Unit = {
      if (size < 15) out.write(((size << 4) | elemType) & 0xff)
      else { out.write((0xf0 | elemType) & 0xff); varint(out, size.toLong) }
    }
    def i32(out: java.io.ByteArrayOutputStream, v: Int): Unit = zigzag(out, v.toLong)
    def i64(out: java.io.ByteArrayOutputStream, v: Long): Unit = zigzag(out, v)
  }
}
