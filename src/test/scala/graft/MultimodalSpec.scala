package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal
import graft.ops.Multimodal.Jpeg

/** Pins for the real half of the media decoder: the JPEG SOF byte scanner
  * (wrap/parse roundtrip, big-endian dims, malformed-bytes fallback) and
  * the end-to-end image rows of media_meta carrying header-parsed dims.
  */
class MultimodalSpec extends SparkSpec {

  test("jpeg wrap -> sofDims roundtrip across dimension byte boundaries") {
    // sizes chosen so width/height cross the 255 boundary (hi byte != 0)
    for (n <- Seq(0, 1, 100, 200, 300, 450, 511, 512, 1000)) {
      val data = Array.tabulate[Byte](n)(i => (i % 251).toByte)
      val jpeg = Jpeg.wrap(data)
      assert(jpeg.length === n + Jpeg.Overhead)
      assert((jpeg(0) & 0xff) === 0xFF && (jpeg(1) & 0xff) === 0xD8)
      assert((jpeg(jpeg.length - 1) & 0xff) === 0xD9)
      val (w, h) = Jpeg.dimsFor(n)
      assert(Jpeg.sofDims(jpeg) === Some((w, h)))
    }
  }

  test("sofDims walks past other segments to reach SOF") {
    // SOI + APP0 (JFIF, 16 bytes) + SOF0 with w=700, h=300
    val app0 = Array(0xFF, 0xE0, 0x00, 0x10) ++ Array.fill(14)(0x4A)
    val sof = Array(0xFF, 0xC0, 0x00, 0x11, 0x08,
      300 >> 8, 300 & 0xff, 700 >> 8, 700 & 0xff,
      0x03, 0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)
    val bytes = (Array(0xFF, 0xD8) ++ app0 ++ sof).map(_.toByte)
    assert(Jpeg.sofDims(bytes) === Some((700, 300)))
  }

  test("malformed bytes yield None (fallback, never a throw)") {
    assert(Jpeg.sofDims(Array.emptyByteArray) === None)
    assert(Jpeg.sofDims("not a jpeg".getBytes) === None)
    // SOI but truncated before any SOF
    assert(Jpeg.sofDims(Array(0xFF, 0xD8, 0xFF).map(_.toByte)) === None)
    // SOS reached without SOF -> None
    assert(Jpeg.sofDims(
      Array(0xFF, 0xD8, 0xFF, 0xDA, 0x00, 0x02).map(_.toByte)) === None)
  }

  test("wav wrap -> rate roundtrip; chunk walk skips unknown chunks") {
    import graft.ops.Multimodal.Wav
    for (n <- Seq(0, 1, 99, 1000); sr <- Seq(8000, 16000, 44100)) {
      val data = Array.tabulate[Byte](n)(i => (i % 251).toByte)
      val wav = Wav.wrap(data, sr)
      assert(wav.length === n + Wav.Overhead)
      assert(Wav.rate(wav) === Some(sr))
    }
    // RIFF + LIST chunk (odd size -> word-aligned skip) before fmt
    val list = Array('L', 'I', 'S', 'T').map(_.toByte) ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](1, 2, 3, 0)
    val tailPart = Wav.wrap(Array[Byte](9), 22050).drop(12)
    val bytes = Wav.wrap(Array.emptyByteArray, 1).take(12) ++ list ++ tailPart
    assert(Wav.rate(bytes) === Some(22050))
  }

  test("malformed wav bytes yield None") {
    import graft.ops.Multimodal.Wav
    assert(Wav.rate(Array.emptyByteArray) === None)
    assert(Wav.rate("RIFFnot a wave file".getBytes) === None)
    assert(Wav.rate("not riff at all........".getBytes) === None)
  }

  test("mp4 wrap -> meta roundtrip across dimension/frame boundaries") {
    import graft.ops.Multimodal.Mp4
    for (n <- Seq(0, 1, 49, 50, 300, 511, 512, 1000)) {
      val data = Array.tabulate[Byte](n)(i => (i % 251).toByte)
      val mp4 = Mp4.wrap(data, 64 + n % 512, 64 + n % 384, n / 50 + 1)
      assert(mp4.length === n + Mp4.Overhead)
      assert(new String(mp4.slice(4, 8)) === "ftyp")
      assert(Mp4.meta(mp4) === Some((64 + n % 512, 64 + n % 384, n / 50 + 1)))
    }
  }

  test("mp4 meta walks past other boxes and honors the timescale") {
    import graft.ops.Multimodal.Mp4
    // a wrap with a free box spliced in before moov still parses, and a
    // doubled timescale halves the derived frame count (duration is real)
    val base = Mp4.wrap(Array.tabulate[Byte](100)(_.toByte), 320, 240, 50)
    val free = Array[Byte](0, 0, 0, 12) ++ "free".getBytes ++ Array[Byte](1, 2, 3, 4)
    val spliced = base.take(16) ++ free ++ base.drop(16)
    assert(Mp4.meta(spliced) === Some((320, 240, 50)))
    // patch mvhd timescale (ftyp 16 + moov hdr 8 + mvhd hdr 8 + 12) to 2*Fps
    val patched = base.clone()
    val tsOff = 16 + 8 + 8 + 12
    patched(tsOff) = 0; patched(tsOff + 1) = 0
    patched(tsOff + 2) = 0; patched(tsOff + 3) = (2 * Mp4.Fps).toByte
    assert(Mp4.meta(patched) === Some((320, 240, 25)))
  }

  test("malformed mp4 bytes yield None (fallback, never a throw)") {
    import graft.ops.Multimodal.Mp4
    assert(Mp4.meta(Array.emptyByteArray) === None)
    assert(Mp4.meta("not an mp4 file at all.........".getBytes) === None)
    // ftyp only, no moov
    assert(Mp4.meta(Mp4.wrap(Array.emptyByteArray, 1, 1, 1).take(16)) === None)
    // box size smaller than its header -> malformed walk
    assert(Mp4.meta(Array[Byte](0, 0, 0, 2, 'm', 'o', 'o', 'v')) === None)
  }

  test("media_meta video rows carry header-parsed dims and frames end-to-end") {
    import graft.ops.Multimodal.Mp4
    val rows = Multimodal.queries("media_meta")(spark, sf("0.001"))
      .filter(col("kind") === "video").limit(5).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val textLen = (r.getAs[Long]("n_bytes") - Mp4.Overhead).toInt
      assert(r.getAs[Int]("width") === 64 + textLen % 512)
      assert(r.getAs[Int]("height") === 64 + textLen % 384)
      assert(r.getAs[Int]("n_frames") === textLen / 50 + 1)
    }
  }

  test("media_meta audio rows carry header-parsed sample rate end-to-end") {
    val rows = Multimodal.queries("media_meta")(spark, sf("0.001"))
      .filter(col("kind") === "audio").limit(5).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("sample_rate") === 16000)
      assert(r.getAs[Long]("n_bytes") >= 44L)
    }
  }

  test("media_meta image rows carry header-parsed dims end-to-end") {
    val rows = Multimodal.queries("media_meta")(spark, sf("0.001"))
      .filter(col("kind") === "image").limit(5).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nBytes = r.getAs[Long]("n_bytes")
      val textLen = (nBytes - Jpeg.Overhead).toInt
      val (w, h) = Jpeg.dimsFor(textLen)
      assert(r.getAs[Int]("width") === w)
      assert(r.getAs[Int]("height") === h)
    }
  }
}
