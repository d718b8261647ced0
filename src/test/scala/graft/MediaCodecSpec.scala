package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.multimodal.Media

/** The real image path of the feature kernel: PNG payloads must come
  * back with pixel-derived features through the distributed pipeline
  * (PNG is lossless, so decode(encode(img)) reproduces the pixels
  * exactly), while non-image payloads keep the stub semantics.
  */
class MediaCodecSpec extends GraftSpec {

  private def png(pixels: Array[Array[Int]]): Array[Byte] = {
    val h = pixels.length
    val w = pixels(0).length
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixels(y)(x))
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def lum(rgb: Int): Long =
    (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000

  test("PNG payloads decode to exact pixel luminance features") {
    val pix = Array(
      Array(0xff0000, 0x00ff00),
      Array(0x0000ff, 0xffffff))
    val bytes = png(pix)
    val expectedSum = pix.flatten.map(lum).sum
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("media", BinaryType, nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, bytes))), schema)
    val r = Media.extractFeatures(df).collect().head
    assert(r.getAs[Long]("n_bytes") === bytes.length.toLong)
    assert(r.getAs[Long]("checksum") === expectedSum)
    val hist = r.getSeq[Double](3)
    assert(hist.sum === 4.0) // one vote per decoded pixel
    // white pixel (lum 255) lands in the top bucket
    assert(hist(7) >= 1.0)
  }

  test("non-image payloads keep the stub byte-sum semantics") {
    val bytes = "plain text payload".getBytes("UTF-8")
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("media", BinaryType, nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, bytes))), schema)
    val r = Media.extractFeatures(df).collect().head
    val (stubSum, stubHist) = Media.stubKernel(bytes)
    assert(r.getAs[Long]("checksum") === stubSum)
    assert(r.getSeq[Double](3) === stubHist)
  }

  test("WAV payloads decode to exact PCM amplitude features") {
    import javax.sound.sampled._
    val samples: Array[Short] = Array(0, 1000, -1000, 32767, -32768, 500, -1)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte          // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    val wav = out.toByteArray
    val expectedSum = samples.map(s => math.abs(s.toInt).toLong).sum
    val got = Media.audioKernel(wav)
    assert(got.isDefined, "WAV did not decode")
    assert(got.get._1 === expectedSum)
    assert(got.get._2.sum === samples.length.toDouble)
    // and through the distributed pipeline
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("media", BinaryType, nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(7L, wav))), schema)
    val r = Media.extractFeatures(df).collect().head
    assert(r.getAs[Long]("checksum") === expectedSum)
  }

  test("imageKernel refuses non-images and truncated images") {
    assert(Media.imageKernel("not an image".getBytes("UTF-8")).isEmpty)
    val valid = png(Array(Array(0x123456)))
    assert(Media.imageKernel(valid).isDefined)
    assert(Media.imageKernel(valid.take(10)).isEmpty)
  }
}
