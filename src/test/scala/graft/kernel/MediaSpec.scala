package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Multimodal codec kernels (Media.scala): roundtrip exactness, seek-only
  * frame sampling, feature arithmetic, and totality on garbage bytes —
  * mirrors the oracle arithmetic of queries m03/m04.
  */
class MediaSpec extends AnyFunSuite {

  private def frame(w: Int, h: Int, v: Int): Raster.Gray =
    Raster.Gray(w, h, Array.fill(w * h)(v.toByte))

  test("video roundtrip: frameCount and per-frame pixels survive encode/decode") {
    val frames = (0 until 7).map(f => frame(8, 4, (f * 37) % 256))
    val blob = Media.writeVideo(frames)
    assert(Media.frameCount(blob) == 7)
    frames.zipWithIndex.foreach { case (f, i) =>
      val g = Media.frameAt(blob, i).get
      assert(g.w == f.w && g.h == f.h && g.px.sameElements(f.px), s"frame $i")
    }
    assert(Media.frameAt(blob, 7).isEmpty && Media.frameAt(blob, -1).isEmpty)
  }

  test("sampleFrames stride semantics: indices 0, k, 2k, ...; ceil(n/k) frames") {
    val frames = (0 until 9).map(f => frame(4, 4, f))
    val blob = Media.writeVideo(frames)
    for (stride <- 1 to 4) {
      val got = Media.sampleFrames(blob, stride)
      val want = (0 until 9 by stride).toSeq
      assert(got.length == (9 + stride - 1) / stride, s"stride $stride")
      assert(got.map(_.px(0).toInt) == want, s"stride $stride picks $want")
    }
    assert(Media.sampleFrames(blob, 0).isEmpty)
    // mixed frame sizes survive the length-prefixed walk
    val mixed = Media.writeVideo(Seq(frame(2, 2, 1), frame(16, 8, 2), frame(3, 5, 3)))
    assert(Media.sampleFrames(mixed, 2).map(_.px(0).toInt) == Seq(1, 3))
  }

  test("audio roundtrip and features: mean|s| and sign flips are exact") {
    val n = 96
    val a: Short = 42
    val samples = Array.tabulate(n)(i => if (i % 4 < 2) a else (-a).toShort)
    val blob = Media.writePcm16(samples)
    val back = Media.readPcm16(blob)
    assert(back.sameElements(samples))
    assert(Media.meanAbsAmplitude(back) == 42L)
    assert(Media.zeroCrossings(back) == (n - 2) / 2) // period-4 ++-- pattern
    // negative extremes don't overflow the amplitude sum
    assert(Media.meanAbsAmplitude(Array[Short](Short.MinValue, Short.MaxValue)) == 32767L)
    assert(Media.zeroCrossings(Array[Short](0, -1, 0, 1)) == 2) // 0 counts as non-negative
    assert(Media.meanAbsAmplitude(Array.emptyShortArray) == 0L)
    assert(Media.zeroCrossings(Array.emptyShortArray) == 0)
  }

  test("totality: malformed bytes decode to empty, never throw") {
    val garbage = Seq(
      null.asInstanceOf[Array[Byte]],
      Array.emptyByteArray,
      Array[Byte](1, 2, 3),
      "GRVD".getBytes("US-ASCII"), // magic but no count
      "GRPCxxxx".getBytes("US-ASCII"))
    garbage.foreach { b =>
      assert(Media.frameCount(b) == 0)
      assert(Media.sampleFrames(b, 2).isEmpty)
      assert(Media.readPcm16(b).isEmpty)
    }
    // count larger than the payload: walk stops at the truncation
    val truncated = Media.writeVideo(Seq(frame(4, 4, 9))).dropRight(3)
    assert(Media.sampleFrames(truncated, 1).isEmpty)
    // frame count claims 2 but only 1 present
    val one = Media.writeVideo(Seq(frame(4, 4, 9)))
    one(7) = 2 // bump big-endian count byte
    assert(Media.sampleFrames(one, 1).length == 1)
    // corrupt inner frame magic -> that frame skipped, no throw
    val two = Media.writeVideo(Seq(frame(4, 4, 1), frame(4, 4, 2)))
    two(12) = 'X' // first frame's GRAS magic
    assert(Media.sampleFrames(two, 1).length == 1)
  }
}
