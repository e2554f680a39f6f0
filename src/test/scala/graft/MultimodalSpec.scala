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
