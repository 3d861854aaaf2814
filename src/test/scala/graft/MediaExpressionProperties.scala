package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.expressions.{AudioPhash, AudioResample, AudioStats, LumaResize, MediaPhash}

/** ScalaCheck properties for the multimodal native expressions: for
  * ALL blobs/sample streams, each one-pass kernel equals an
  * independently written reference fold, and the structural
  * invariants the operators rely on hold — trailing-odd-byte
  * irrelevance and rail-exact |−32768| (AudioStats), uniform-gain and
  * polarity invariance (AudioPhash), exact-duplication alignment
  * (LumaResize/AudioResample), window partition totals (all grids).
  * Pure Scala — no SparkSession — so these quantified checks run in
  * milliseconds beside the example-based MultimodalSpec pipeline
  * tests.
  */
object MediaExpressionProperties extends Properties("MediaExpressions") {

  private val sample: Gen[Int] = Gen.frequency(
    8 -> Gen.choose(-32768, 32767),
    1 -> Gen.oneOf(-32768, -32767, 32767, 0)) // hit the rails and zero

  private def s16le(samples: Seq[Int]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(s => buf.putShort(s.toShort))
    buf.array()
  }

  private val pcm: Gen[Seq[Int]] =
    Gen.choose(1, 400).flatMap(n => Gen.listOfN(n, sample))

  private val blob: Gen[Array[Byte]] =
    Gen.choose(1, 500).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 255)).map(_.map(_.toByte).toArray))

  property("audio_stats equals the reference fold") = forAll(pcm) { s =>
    val got = AudioStats.stats(s16le(s)).toLongArray().toSeq
    val peak = s.map(v => math.abs(v.toLong)).max
    val want = Seq(
      s.length.toLong,
      peak,
      s.map(v => v.toLong * v).sum,
      s.count(v => math.abs(v.toLong) >= 32767).toLong,
      s.sliding(2).count {
        case Seq(a, b) => (a < 0) != (b < 0)
        case _ => false
      }.toLong)
    got == want
  }

  property("audio_stats ignores a trailing odd byte") = forAll(
    pcm, Gen.choose(0, 255)) { (s, extra) =>
    AudioStats.stats(s16le(s) :+ extra.toByte).toLongArray().toSeq ==
      AudioStats.stats(s16le(s)).toLongArray().toSeq
  }

  private val cellsAndQuietPcm: Gen[(Int, Seq[Int])] =
    Gen.choose(1, 48).flatMap(c =>
      Gen.choose(c, 400).flatMap(n =>
        Gen.listOfN(n, Gen.choose(-16000, 16000)).map(s => (c, s))))

  property("audio_phash equals the reference fold and survives " +
    "gain doubling and polarity inversion") = forAll(cellsAndQuietPcm) {
    case (c, s) =>
    val energies = (0 until c).map { k =>
      val st = k.toLong * s.length / c
      val en = (k + 1).toLong * s.length / c
      (st until en).map(p => math.abs(s(p.toInt).toLong)).sum
    }
    val total = energies.sum
    val want = energies.zipWithIndex.foldLeft(0L) { case (acc, (e, k)) =>
      if (e * c > total) acc | (1L << k) else acc
    }
    AudioPhash.phash(s16le(s), c) == want &&
      AudioPhash.phash(s16le(s.map(_ * 2)), c) == want &&
      AudioPhash.phash(s16le(s.map(v => -v)), c) == want
  }

  property("audio_resample equals the reference fold (truncating " +
    "division) and window partition covers every sample once") = forAll(
    Gen.choose(1, 32).flatMap(c =>
      Gen.choose(c, 400).flatMap(n =>
        Gen.listOfN(n, sample).map(s => (c, s))))) { case (c, s) =>
    val got = AudioResample.resample(s16le(s), c).toLongArray().toSeq
    val bounds = (0 to c).map(k => k.toLong * s.length / c)
    val want = (0 until c).map { k =>
      (bounds(k) until bounds(k + 1))
        .map(p => s(p.toInt).toLong).sum / (bounds(k + 1) - bounds(k))
    }
    got == want &&
      bounds.head == 0L && bounds.last == s.length.toLong &&
      bounds.sliding(2).forall { case Seq(a, b) => a < b; case _ => true }
  }

  private val cellsAndBlob: Gen[(Int, Array[Byte])] =
    Gen.choose(1, 63).flatMap(c =>
      Gen.choose(c, 500).flatMap(n =>
        Gen.listOfN(n, Gen.choose(0, 255)).map(bs =>
          (c, bs.map(_.toByte).toArray))))

  property("luma_resize equals the reference fold; media_phash bit k " +
    "is exactly the above-mean test on the same windows") =
    forAll(cellsAndBlob) { case (c, b) =>
    val got = LumaResize.resize(b, c).toLongArray().toSeq
    val sums = (0 until c).map { k =>
      val st = k.toLong * b.length / c
      val en = (k + 1).toLong * b.length / c
      ((st until en).map(p => (b(p.toInt) & 0xff).toLong).sum, en - st)
    }
    val want = sums.map { case (s, len) => s / len }
    val total = sums.map(_._1).sum
    val wantHash = sums.zipWithIndex.foldLeft(0L) { case (acc, ((s, _), k)) =>
      if (s * c > total) acc | (1L << k) else acc
    }
    got == want && MediaPhash.phash(b, c) == wantHash
  }

  private val dupCase: Gen[(Int, Int, Array[Byte])] =
    Gen.choose(1, 16).flatMap(c =>
      Gen.choose(1, 8).flatMap(mult =>
        Gen.choose(1, 12).flatMap(q =>
          Gen.listOfN(c * q, Gen.choose(0, 255)).map(bs =>
            (c, mult, bs.map(_.toByte).toArray)))))

  property("luma_resize is invariant under m-fold duplication when " +
    "cells divide the length") = forAll(dupCase) { case (c, m, b) =>
    val dup = b.flatMap(x => Array.fill(m)(x))
    LumaResize.resize(b, c).toLongArray().toSeq ==
      LumaResize.resize(dup, c).toLongArray().toSeq
  }
}
