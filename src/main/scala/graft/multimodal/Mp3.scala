package graft.multimodal

import scala.collection.mutable

/** MPEG audio (MP3) frame-header walk — metadata extraction without
  * audio decode, the shape a corpus pipeline needs from opaque audio
  * blobs: skip the ID3v2 container, walk the frame chain by computed
  * frame lengths, and report per-stream frame count / duration /
  * bitrate profile. Pure-spec (ISO 11172-3 / 13818-3 header layout,
  * public bitrate + samplerate tables); full audio decode (hybrid
  * filterbank) is deliberately out of scope, as with video codecs.
  *
  * Lenient: a malformed byte resyncs to the next 11-bit sync word, a
  * truncated tail yields the frames before it — a poisoned shard never
  * kills the scan task.
  */
object Mp3 {

  /** One parsed frame header. `samples` is per-frame PCM samples
    * (Layer I 384; Layer II 1152; Layer III 1152 MPEG-1 / 576
    * MPEG-2/2.5), so duration_us = samples * 1e6 / sampleRate. */
  final case class Frame(offset: Int, version: Int, layer: Int,
                         bitrateKbps: Int, sampleRate: Int,
                         padding: Boolean, frameLen: Int, samples: Int)

  // bitrate tables (kbps), index 1..14; 0 = free, 15 = bad
  private val BrV1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224,
    256, 288, 320, 352, 384, 416, 448)
  private val BrV1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112,
    128, 160, 192, 224, 256, 320, 384)
  private val BrV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96,
    112, 128, 160, 192, 224, 256, 320)
  private val BrV2L1 = Array(0, 32, 48, 56, 64, 80, 96, 112,
    128, 144, 160, 176, 192, 224, 256)
  private val BrV2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56,
    64, 80, 96, 112, 128, 144, 160)
  private val SrV1 = Array(44100, 48000, 32000)
  private val SrV2 = Array(22050, 24000, 16000)
  private val SrV25 = Array(11025, 12000, 8000)

  /** Parse a frame header at `o`; None unless a valid sync + fields. */
  def header(b: Array[Byte], o: Int): Option[Frame] = {
    if (o + 4 > b.length) return None
    if ((b(o) & 0xff) != 0xff || (b(o + 1) & 0xe0) != 0xe0) return None
    val verBits = (b(o + 1) >> 3) & 3   // 0=2.5, 2=MPEG2, 3=MPEG1
    val layerBits = (b(o + 1) >> 1) & 3 // 1=III, 2=II, 3=I
    if (verBits == 1 || layerBits == 0) return None
    val brIdx = (b(o + 2) >> 4) & 0xf
    val srIdx = (b(o + 2) >> 2) & 3
    val padding = ((b(o + 2) >> 1) & 1) == 1
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None // no free-form
    val v1 = verBits == 3
    val layer = 4 - layerBits // 1, 2, 3
    val br = (if (v1) layer match {
        case 1 => BrV1L1
        case 2 => BrV1L2
        case _ => BrV1L3
      }
      else if (layer == 1) BrV2L1
      else BrV2L23)(brIdx)
    val sr = (verBits match {
      case 3 => SrV1
      case 2 => SrV2
      case _ => SrV25
    })(srIdx)
    val pad = if (padding) 1 else 0
    val frameLen = layer match {
      case 1 => (12 * br * 1000 / sr + pad) * 4
      case 2 => 144 * br * 1000 / sr + pad
      case _ => // Layer III: 144 coefficient for MPEG-1, 72 below
        (if (v1) 144 else 72) * br * 1000 / sr + pad
    }
    val samples = layer match {
      case 1 => 384
      case 2 => 1152
      case _ => if (v1) 1152 else 576
    }
    if (frameLen <= 4) None
    else Some(Frame(o, verBits, layer, br, sr, padding, frameLen,
      samples))
  }

  /** Bytes to skip for a leading ID3v2 tag (0 when absent). */
  def id3v2Len(b: Array[Byte]): Int = {
    if (b.length < 10 || b(0) != 'I' || b(1) != 'D' || b(2) != '3')
      return 0
    if ((b(3) & 0xff) == 0xff || (b(4) & 0xff) == 0xff) return 0
    // syncsafe 28-bit size
    if (((b(6) | b(7) | b(8) | b(9)) & 0x80) != 0) return 0
    val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
      ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
    val footer = if ((b(5) & 0x10) != 0) 10 else 0
    10 + size + footer
  }

  /** Walk every frame: ID3v2 skip, chained frame lengths, resync on
    * garbage. Only complete frames count. */
  def frames(b: Array[Byte]): Seq[Frame] = {
    val out = mutable.ArrayBuffer[Frame]()
    var at = id3v2Len(b)
    while (at + 4 <= b.length) {
      header(b, at) match {
        case Some(f) if at + f.frameLen <= b.length =>
          out += f; at += f.frameLen
        case _ => at += 1 // resync scan
      }
    }
    out.toSeq
  }
}
