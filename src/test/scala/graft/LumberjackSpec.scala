package graft

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, LumberjackCodec}

/** Pins the lumberjack v2 batch codec: a hand-assembled frame (independent
  * of the encoder, following lumberjack_decoder.rs:33-36,121-148 directly)
  * must decode to the expected (seq, payload) rows; expression-level
  * roundtrip; malformed bytes decode to null, never throw.
  */
class LumberjackSpec extends SparkSpec {

  private def u32(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }

  private def handAssembled(payloads: Seq[String]): Array[Byte] = {
    val inner = new ByteArrayOutputStream()
    payloads.zipWithIndex.foreach { case (p, i) =>
      val b = p.getBytes("UTF-8")
      inner.write('2'); inner.write('J'); u32(inner, i + 1); u32(inner, b.length)
      inner.write(b)
    }
    val d = new java.util.zip.Deflater()
    d.setInput(inner.toByteArray); d.finish()
    val z = new ByteArrayOutputStream()
    val buf = new Array[Byte](1024)
    while (!d.finished()) z.write(buf, 0, d.deflate(buf))
    d.end()
    val out = new ByteArrayOutputStream()
    out.write('2'); out.write('W'); u32(out, payloads.size)
    out.write('2'); out.write('C'); u32(out, z.size())
    out.write(z.toByteArray)
    out.toByteArray
  }

  test("decode parses a hand-assembled v2 frame") {
    val frame = handAssembled(Seq("""{"a": 1}""", """{"b": "two"}"""))
    val arr = LumberjackCodec.decode(frame)
    assert(arr != null)
    assert(arr.numElements() === 2)
    val r1 = arr.getStruct(0, 2)
    val r2 = arr.getStruct(1, 2)
    assert(r1.getInt(0) === 1 && r1.getUTF8String(1).toString === """{"a": 1}""")
    assert(r2.getInt(0) === 2 && r2.getUTF8String(1).toString === """{"b": "two"}""")
  }

  test("expression roundtrip inside a DataFrame plan") {
    GraftFunctions.ensureRegistered(spark)
    import graft.functions.GraftFunctions.{lumberjack_decode, lumberjack_encode}
    val out = spark.range(3)
      .select(col("id"),
        explode(lumberjack_decode(lumberjack_encode(array(
          concat(lit("""{"n": """), col("id"), lit("}")),
          lit("plain, not json"))))).as("e"))
      .select(col("id"), col("e.seq"), col("e.payload"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(out.length === 6)
    assert(out.contains((2L, 1, """{"n": 2}""")))
    assert(out.contains((0L, 2, "plain, not json")))
  }

  test("malformed frames decode to null, never throw") {
    assert(LumberjackCodec.decode("garbage bytes".getBytes) == null)
    assert(LumberjackCodec.decode(Array.emptyByteArray) == null)
    val good = handAssembled(Seq("""{"a": 1}"""))
    assert(LumberjackCodec.decode(good.dropRight(3)) == null) // truncated zlib
    val badMagic = good.clone(); badMagic(0) = 'X'
    assert(LumberjackCodec.decode(badMagic) == null)
  }

  test("crafted zlib with FDICT set returns null (no spin, no throw)") {
    // minimal zlib header with FDICT bit set (0x78 0xBB + 4-byte dict id):
    // Inflater.inflate returns 0 with needsDictionary()=true forever —
    // decode must bail to null instead of looping in the task
    val z = Array[Byte](0x78.toByte, 0xBB.toByte, 0, 0, 0, 1, 0, 0)
    val out = new java.io.ByteArrayOutputStream()
    out.write('2'); out.write('W'); out.write(Array[Byte](0, 0, 0, 1), 0, 4)
    out.write('2'); out.write('C')
    out.write(Array[Byte](0, 0, 0, z.length.toByte), 0, 4)
    out.write(z, 0, z.length)
    val t0 = System.nanoTime()
    assert(LumberjackCodec.decode(out.toByteArray) == null)
    assert((System.nanoTime() - t0) < 5e9, "decode must not hang")
  }

  test("encode skips null payload slots with contiguous seq numbers") {
    GraftFunctions.ensureRegistered(spark)
    import graft.functions.GraftFunctions.{lumberjack_decode, lumberjack_encode}
    val out = spark.range(1)
      .select(explode(lumberjack_decode(lumberjack_encode(array(
        lit("first"), lit(null).cast("string"), lit("third"))))).as("e"))
      .select(col("e.seq"), col("e.payload"))
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(out.toSeq === Seq((1, "first"), (2, "third")))
  }
}
