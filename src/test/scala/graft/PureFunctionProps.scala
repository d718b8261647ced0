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

  property("Target.parse handles both schemes and rejects the rest") =
    forAll(Gen.identifier.suchThat(_.nonEmpty)) { name =>
      Target.parse(s"directory:///x/$name") == Target.DirectoryTarget(s"/x/$name") &&
        Target.parse(s"objectstore://$name") == Target.ObjectStoreTarget(name) &&
        (try { Target.parse(s"ftp://$name"); false }
         catch { case _: IllegalArgumentException => true })
    }
}
