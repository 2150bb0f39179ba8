package graft.multimodal

import java.util.zip.Inflater

/** Magic-byte router over the real pixel decoders — the single entry
  * point a mixed-format corpus scan uses. PNG routes through the shared
  * per-partition [[Inflater]]; JPEG and GIF need no native context.
  * Unrecognized
  * or corrupt payloads are None (route-elsewhere, never throw). */
object ImageCodecs {

  /** Container of a payload by magic alone (cheap pre-dispatch). */
  def sniff(b: Array[Byte]): String =
    if (b == null || b.length < 3) "unknown"
    else if ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N') "png"
    else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) "jpeg"
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') "gif"
    else if (b.length >= 4 && b(0) == 'I' && b(1) == 'I' &&
      b(2) == 42 && b(3) == 0) "tiff"
    else if (b.length >= 4 && b(0) == 'M' && b(1) == 'M' &&
      b(2) == 0 && b(3) == 42) "tiff"
    else if (b.length >= 4 && b(0) == 'q' && b(1) == 'o' &&
      b(2) == 'i' && b(3) == 'f') "qoi"
    else "unknown"

  /** Decode any supported image container to packed RGB(A) pixels. */
  def decode(b: Array[Byte], inf: Inflater): Option[PngCodec.Image] =
    sniff(b) match {
      case "png" => PngCodec.decode(b, inf)
      case "jpeg" => JpegCodec.decode(b)
      case "gif" => GifCodec.decode(b)
      case "tiff" => TiffCodec.decode(b)
      case "qoi" => QoiCodec.decode(b)
      case _ => None
    }
}
