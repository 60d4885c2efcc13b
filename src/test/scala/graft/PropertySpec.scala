package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.ops.{Corpus, Multimodal}

/** ScalaCheck properties for the pure (driver-side) kernels: the WAV
  * round-trip and the split/rate boundary lattice. Spark-plan behavior is
  * pinned by the ScalaTest suites; these cover the input space of the pure
  * functions more densely than example-based cases can.
  */
object PropertySpec extends Properties("graft") {

  private val sampleGen: Gen[Array[Short]] =
    Gen.nonEmptyListOf(Gen.chooseNum(Short.MinValue, Short.MaxValue))
      .map(_.map(_.toShort).toArray)

  property("wav round-trip recovers format and exact amplitude stats") =
    Prop.forAll(
      sampleGen,
      Gen.chooseNum(1, 192000),
      Gen.chooseNum(1, 8)) { (samples, rate, channels) =>
      val wav = Multimodal.encodePcmWav(rate, channels, samples)
      val d = Multimodal.decodeWav(wav, dim = 4).get
      val n = samples.length
      // Long-exact reference stats
      val sumAbs = samples.map(s => math.abs(s.toLong)).sum
      val sumSq = samples.map(s => s.toLong * s).sum
      val signed = samples.map(_.toLong).sum
      val crossings = samples.sliding(2).count {
        case Array(a, b) => (a > 0 && b < 0) || (a < 0 && b > 0)
        case _           => false
      }
      (d.sampleRate == rate) &&
      (d.channels == channels) &&
      (d.nFrames == n / channels) &&
      (d.meanAbs == sumAbs.toDouble / n) &&
      (d.rms == math.sqrt(sumSq.toDouble / n)) &&
      (d.peak == samples.map(s => math.abs(s.toInt)).max) &&
      (d.zeroCrossings == crossings.toLong) &&
      (d.dcOffset == signed.toDouble / n) &&
      d.features.forall(f => f >= 0f && f <= 1f)
    }

  property("wav decode never throws on arbitrary byte payloads") =
    Prop.forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bytes =>
      Multimodal.decodeWav(bytes.map(_.toByte).toArray, dim = 2)
      true // reaching here (Some or None, no exception) is the property
    }

  property("wav decode never throws on corrupted valid headers") =
    Prop.forAll(sampleGen, Gen.chooseNum(0, 60), Gen.chooseNum(Byte.MinValue, Byte.MaxValue)) {
      (samples, pos, b) =>
        val wav = Multimodal.encodePcmWav(8000, 1, samples)
        if (pos < wav.length) wav(pos) = b.toByte
        Multimodal.decodeWav(wav, dim = 2)
        true
    }

  property("adpcm decode never throws on corrupted/truncated payloads") =
    Prop.forAll(
      Gen.nonEmptyListOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)),
      Gen.chooseNum(0, 88),
      Gen.chooseNum(0, 80),
      Gen.chooseNum(Byte.MinValue, Byte.MaxValue)) { (nibbles, sidx, pos, b) =>
      val wav = Multimodal.encodeImaAdpcmWav(
        8000, -3, sidx, nibbles.map(_.toByte).toArray)
      if (pos < wav.length) wav(pos) = b.toByte
      Multimodal.decodeWav(wav, dim = 2)
      Multimodal.decodeWav(wav.take(pos), dim = 2)
      true
    }

  property("adpcm round-trip sample count and clamp invariants") =
    Prop.forAll(
      Gen.nonEmptyListOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)),
      Gen.chooseNum(-32768, 32767),
      Gen.chooseNum(0, 88)) { (nibbles, pred0, sidx) =>
      val wav = Multimodal.encodeImaAdpcmWav(
        8000, pred0, sidx, nibbles.map(_.toByte).toArray)
      val d = Multimodal.decodeWav(wav, dim = 2).get
      (d.nFrames == 1 + 2 * nibbles.size) &&
      (d.peak <= 32768) && // |-32768| after clamping
      (d.sampleRate == 8000)
    }

  // a dirty 100 TB corpus throws every imaginable byte soup at the parsers;
  // None/degraded output is fine, an executor-killing exception is not
  private val garbageGen: Gen[Array[Byte]] =
    Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray)

  property("every binary parser survives arbitrary byte payloads") =
    Prop.forAll(garbageGen) { bytes =>
      Multimodal.parseFlacMeta(bytes)
      Multimodal.parseMp3Meta(bytes)
      Multimodal.parseMp4Meta(bytes)
      Multimodal.decodeAiff(bytes, dim = 2)
      Multimodal.decodeImage(bytes, dim = 2)
      Multimodal.decodeY4m(bytes)
      Multimodal.decodeGifFrames(bytes)
      true // reaching here (Some or None, no exception) is the property
    }

  property("gif animation round-trip recovers frame count and exact gray levels") =
    Prop.forAll(
      Gen.chooseNum(1, 8),
      Gen.chooseNum(1, 6),
      Gen.nonEmptyListOf(Gen.chooseNum(0, 255)),
      Gen.chooseNum(1, 3)) { (w, h, grays, stride) =>
      val payload = Multimodal.encodeGifAnim(w, h, grays)
      val (n, frames) = Multimodal.decodeGifFrames(payload, stride).get
      val expectedIdx = grays.indices.filter(_ % stride == 0)
      (n == grays.size) &&
      (frames.map(_._1) == expectedIdx) &&
      frames.forall { case (idx, fw, fh, luma) =>
        fw == w && fh == h && luma == grays(idx).toDouble
      }
    }

  private val y4mCsGen: Gen[String] = Gen.oneOf(
    "420jpeg", "420mpeg2", "420paldv", "422", "444", "mono")

  property("y4m round-trip recovers meta and exact sampled plane means") =
    Prop.forAll(
      Gen.chooseNum(1, 8), // half-dims so 420/422 geometry is always even
      Gen.chooseNum(1, 6),
      Gen.chooseNum(1, 120),
      Gen.chooseNum(1, 5),
      y4mCsGen,
      Gen.nonEmptyListOf(Gen.zip(
        Gen.chooseNum(0, 255), Gen.chooseNum(0, 255), Gen.chooseNum(0, 255))),
      Gen.chooseNum(1, 3)) { (hw, hh, fn, fd, cs, frames, stride) =>
      val (w, h) = (2 * hw, 2 * hh)
      val payload = Multimodal.encodeY4m(w, h, fn, fd, cs, frames)
      val (meta, stats) = Multimodal.decodeY4m(payload, stride).get
      val expectedIdx = frames.indices.filter(_ % stride == 0)
      (meta == Multimodal.Y4mMeta(w, h, fn, fd, cs, frames.size)) &&
      (stats.map(_.frameIdx) == expectedIdx) &&
      stats.forall { s =>
        val (y, u, v) = frames(s.frameIdx)
        s.meanY == y.toDouble &&
        (if (cs == "mono") s.meanU.isNaN && s.meanV.isNaN
         else s.meanU == u.toDouble && s.meanV == v.toDouble)
      }
    }

  property("y4m decode survives every truncation point, counting only complete frames") =
    Prop.forAll(Gen.chooseNum(0, 200)) { n =>
      val full = Multimodal.encodeY4m(4, 4, 30, 1, "420jpeg", Seq((9, 8, 7), (6, 5, 4)))
      Multimodal.decodeY4m(full.take(n)) match {
        case Some((meta, stats)) =>
          // header "YUV4MPEG2 W4 H4 F30:1 Ip A1:1 C420jpeg\n" = 39 bytes;
          // a complete frame record is 6 (marker) + 24 (planes) bytes
          val complete = math.max(0, (n - 39) / 30)
          meta.nFrames == math.min(2, complete) && stats.size == meta.nFrames
        case None => true // header itself truncated
      }
    }

  property("flac/mp4/aiff parsers survive corrupted valid headers") =
    Prop.forAll(
      Gen.chooseNum(0, 80),
      Gen.chooseNum(Byte.MinValue, Byte.MaxValue)) { (pos, b) =>
      val flac = Multimodal.encodeFlacHeader(44100, 2, 16, 48000L)
      val mp4 = Multimodal.encodeMinimalMp4(600, 1200, Seq((64, 48)))
      val aiff = Multimodal.encodeAiff(8000, 1, Array[Short](5, -5, 7))
      val mp3 = Multimodal.encodeMp3(
        mpeg1 = true, bitrateIdx = 9, rateIdx = 0,
        padding = false, mono = false, nFrames = 2, id3Size = 12)
      for (p <- Seq(flac, mp4, aiff, mp3); if pos < p.length) p(pos) = b.toByte
      Multimodal.parseFlacMeta(flac)
      Multimodal.parseMp4Meta(mp4)
      Multimodal.decodeAiff(aiff, dim = 2)
      Multimodal.parseMp3Meta(mp3)
      true
    }

  // truncation at every prefix length — the mid-chunk/mid-box boundary cases
  property("flac/mp4 parsers survive every truncation point") =
    Prop.forAll(Gen.chooseNum(0, 100)) { n =>
      Multimodal.parseFlacMeta(
        Multimodal.encodeFlacHeader(96000, 8, 24, (5L << 32) + 1).take(n))
      Multimodal.parseMp4Meta(
        Multimodal.encodeMinimalMp4(600, 1200, Seq((64, 48), (32, 32))).take(n))
      true
    }

  private val weightsGen: Gen[List[Double]] =
    Gen.chooseNum(2, 6).flatMap { n =>
      Gen.listOfN(n, Gen.chooseNum(1, 1000)).map { raw =>
        val total = raw.sum.toDouble
        raw.map(_ / total)
      }
    }

  property("split boundaries are strictly increasing 32-hex-digit lattice points") =
    Prop.forAll(weightsGen) { ws0 =>
      // renormalize exactly like callers must (sum within 1e-9 of 1)
      val named = ws0.zipWithIndex.map { case (w, i) => (s"s$i", w) }
      val bounds = Corpus.splitBoundsHex(named)
      bounds.forall(b => b.length == 32 && b.matches("[0-9a-f]{32}")) &&
      bounds.zip(bounds.tail).forall { case (a, b) => a < b }
    }

  property("rate boundary is monotone in the rate") =
    Prop.forAll(Gen.chooseNum(0.0, 1.0), Gen.chooseNum(0.0, 1.0)) { (r1, r2) =>
      val (lo, hi) = if (r1 <= r2) (r1, r2) else (r2, r1)
      Corpus.rateBoundHex(lo) <= Corpus.rateBoundHex(hi)
    }
}
