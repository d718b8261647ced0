package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.multimodal.Media
import graft.syncer.Target

/** ScalaCheck properties for the pure (non-Spark) kernels. */
object PureFunctionProps extends Properties("graft.pure") {

  private val bytesGen: Gen[Array[Byte]] =
    Gen.containerOf[Array, Byte](Gen.chooseNum(-128, 127).map(_.toByte))

  property("stubResize honors the byte budget and is identity when small") =
    forAll(bytesGen, Gen.chooseNum(1, 256)) { (bytes, target) =>
      val out = Media.stubResize(bytes, target)
      if (bytes.length <= target) out.sameElements(bytes)
      else out.length == target
    }

  property("stubResize only emits bytes from the input") =
    forAll(bytesGen.suchThat(_.nonEmpty), Gen.chooseNum(1, 64)) { (bytes, target) =>
      Media.stubResize(bytes, target).forall(bytes.contains)
    }

  property("stubFrameSample spans are in-bounds, ordered, non-empty") =
    forAll(bytesGen.suchThat(_.nonEmpty), Gen.chooseNum(1, 16)) { (bytes, frames) =>
      val fs = Media.stubFrameSample(bytes, frames)
      fs.nonEmpty &&
        fs.map(_._1) == fs.map(_._1).sorted &&
        fs.forall(_._2.nonEmpty) &&
        fs.map(_._2.length).sum <= bytes.length + frames
    }

  property("stubKernel checksum is the unsigned byte sum; histogram conserves mass") =
    forAll(bytesGen) { bytes =>
      val (checksum, hist) = Media.stubKernel(bytes)
      checksum == bytes.map(b => (b & 0xff).toLong).sum &&
        hist.sum == bytes.length.toDouble
    }

  // q_ewma's closed-form weights assume Math.pow(0.8, k) is
  // bit-identical to DuckDB's libm pow (only guaranteed to 1 ulp by
  // the JVM spec; may use platform intrinsics). This pin freezes the
  // raw bits of every exponent the unrolled EWMA can reach before the
  // weight underflows past double precision (~k=160; pinned to 256
  // with margin) against the value validated on this image, where the
  // JVM, CPython, and DuckDB 1.x all agree. A failure here means the
  // platform's pow changed and q_ewma's oracle parity must be
  // re-validated (EventAnalytics.qEwma scaladoc).
  property("Math.pow(0.8, k) bits match the image-validated pin for k<=256") = {
    val bb = java.nio.ByteBuffer.allocate(8 * 257)
    (0 to 256).foreach(k =>
      bb.putLong(java.lang.Double.doubleToLongBits(math.pow(0.8, k))))
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(bb.array())
      .map("%02x".format(_)).mkString
    org.scalacheck.Prop(md5 == "550fe1d17fe4687cf21a3d10866218bc") :|
      s"pow bit digest drifted: $md5"
  }

  property("Target.parse handles both schemes and rejects the rest") =
    forAll(Gen.identifier.suchThat(_.nonEmpty)) { name =>
      Target.parse(s"directory:///x/$name") == Target.DirectoryTarget(s"/x/$name") &&
        Target.parse(s"objectstore://$name") == Target.ObjectStoreTarget(name) &&
        (try { Target.parse(s"ftp://$name"); false }
         catch { case _: IllegalArgumentException => true })
    }
}
