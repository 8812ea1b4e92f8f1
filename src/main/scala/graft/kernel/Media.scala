package graft.kernel

import java.nio.{ByteBuffer, ByteOrder}

/** Multimodal payload codecs beyond single images (Raster.scala): a video
  * container and a PCM16 audio blob, both deterministic and dependency-free.
  *
  * These model the opaque-binary-column pattern of a training-data pipeline:
  * image/audio/video live as `binary` columns, and decode / frame-sample /
  * feature-extract run inside the partition kernel. No real codec libraries
  * exist in this sandbox (builder brief), so the container formats are our own
  * fixture formats — but the Spark-side plumbing (schema, batching, seeking
  * only the frames that are needed) is real and is what matters at 100 TB.
  *
  * Video container `GRVD` (big-endian):
  *   "GRVD" | nFrames:int32 | repeat nFrames { len:int32 | GRAS gray frame }
  * The length prefix means [[frameAt]]/[[sampleFrames]] SEEK — a stride-k
  * sample of an n-frame video decodes only ceil(n/k) frames, never all n.
  *
  * Audio blob `GRPC` (big-endian header, little-endian samples like WAV):
  *   "GRPC" | nSamples:int32 | PCM16 LE samples
  *
  * All decoders are total: malformed bytes yield empty results, never throw
  * (same totality contract as the extraction kernel, SURVEY.md §2.9 C4).
  */
object Media {

  private val VideoMagic = Array[Byte]('G', 'R', 'V', 'D')
  private val AudioMagic = Array[Byte]('G', 'R', 'P', 'C')

  private def hasMagic(bytes: Array[Byte], magic: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 8 &&
      bytes(0) == magic(0) && bytes(1) == magic(1) &&
      bytes(2) == magic(2) && bytes(3) == magic(3)

  // ---------------------------------------------------------------- video

  def writeVideo(frames: Seq[Raster.Gray]): Array[Byte] = {
    val blobs = frames.map(f => Raster.writeGray(f.w, f.h, f.px))
    val buf = ByteBuffer
      .allocate(8 + blobs.map(4 + _.length).sum)
      .order(ByteOrder.BIG_ENDIAN)
    buf.put(VideoMagic)
    buf.putInt(frames.length)
    blobs.foreach { b => buf.putInt(b.length); buf.put(b) }
    buf.array()
  }

  /** Number of frames; 0 for malformed input. */
  def frameCount(bytes: Array[Byte]): Int =
    if (!hasMagic(bytes, VideoMagic)) 0
    else {
      val n = ByteBuffer.wrap(bytes, 4, 4).order(ByteOrder.BIG_ENDIAN).getInt
      if (n < 0) 0 else n
    }

  /** Byte offsets of each frame blob (after its length prefix), walking the
    * length prefixes only — no pixel decode. Empty on malformed input.
    */
  private def frameOffsets(bytes: Array[Byte]): Array[(Int, Int)] = {
    val n = frameCount(bytes)
    val out = new Array[(Int, Int)](n)
    var off = 8
    var i = 0
    while (i < n) {
      if (off + 4 > bytes.length) return out.take(i)
      val len = ByteBuffer.wrap(bytes, off, 4).order(ByteOrder.BIG_ENDIAN).getInt
      if (len < 0 || off + 4L + len > bytes.length) return out.take(i)
      out(i) = (off + 4, len)
      off += 4 + len
      i += 1
    }
    out
  }

  /** Decode a single frame by index without touching the others. */
  def frameAt(bytes: Array[Byte], idx: Int): Option[Raster.Gray] = {
    val offs = frameOffsets(bytes)
    if (idx < 0 || idx >= offs.length) None
    else {
      val (off, len) = offs(idx)
      val blob = java.util.Arrays.copyOfRange(bytes, off, off + len)
      // decodeGray validates dims and throws; totality contract wants None
      if (!Raster.hasMagic(blob)) None
      else scala.util.Try(Raster.decodeGray(blob)).toOption
    }
  }

  /** Every `stride`-th frame starting at 0 — decodes only the sampled frames
    * (ceil(n/stride) of n). The frame-sampling primitive of a video pipeline.
    * The length-prefix chain is walked ONCE; each sampled frame is then
    * sliced and decoded directly from its (offset, len) — routing through
    * [[frameAt]] would re-walk the chain per sample (O(n^2/stride)).
    */
  def sampleFrames(bytes: Array[Byte], stride: Int): Seq[Raster.Gray] = {
    if (stride <= 0) return Nil
    val offs = frameOffsets(bytes)
    (0 until offs.length by stride).flatMap { i =>
      val (off, len) = offs(i)
      val blob = java.util.Arrays.copyOfRange(bytes, off, off + len)
      if (!Raster.hasMagic(blob)) None
      else scala.util.Try(Raster.decodeGray(blob)).toOption
    }
  }

  // ---------------------------------------------------------------- audio

  def writePcm16(samples: Array[Short]): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + samples.length * 2)
    buf.order(ByteOrder.BIG_ENDIAN).put(AudioMagic).putInt(samples.length)
    buf.order(ByteOrder.LITTLE_ENDIAN)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decode PCM16; empty on malformed input. */
  def readPcm16(bytes: Array[Byte]): Array[Short] = {
    if (!hasMagic(bytes, AudioMagic)) return Array.emptyShortArray
    val n = ByteBuffer.wrap(bytes, 4, 4).order(ByteOrder.BIG_ENDIAN).getInt
    if (n < 0 || 8L + n.toLong * 2 > bytes.length) return Array.emptyShortArray
    val buf = ByteBuffer.wrap(bytes, 8, n * 2).order(ByteOrder.LITTLE_ENDIAN)
    Array.fill(n)(buf.getShort)
  }

  /** floor(mean(|sample|)); 0 for empty. Integer arithmetic — deterministic. */
  def meanAbsAmplitude(samples: Array[Short]): Long = {
    if (samples.isEmpty) return 0L
    var sum = 0L
    var i = 0
    while (i < samples.length) { sum += math.abs(samples(i).toLong); i += 1 }
    sum / samples.length
  }

  /** Sign flips between consecutive samples (negative vs non-negative). */
  def zeroCrossings(samples: Array[Short]): Int = {
    var n = 0
    var i = 1
    while (i < samples.length) {
      if ((samples(i - 1) < 0) != (samples(i) < 0)) n += 1
      i += 1
    }
    n
  }
}
