package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** EXIF tag extraction for JPEG payloads — the Spark-native analogue of
  * the reference's PIL-based reader (muller/util/exif.py): named tags,
  * human-readable Orientation/ResolutionUnit values, rationals rendered
  * as decimals. No external libs: this walks the JPEG marker stream to
  * the APP1 `Exif` segment and parses TIFF IFD0 directly (both byte
  * orders), defensively — anything malformed yields an empty map, never
  * a crash.
  */
object Exif {

  /** Tag id → reference-style name, for the commonly-read IFD0 tags. */
  private val TagNames: Map[Int, String] = Map(
    0x010e -> "ImageDescription", 0x010f -> "Make", 0x0110 -> "Model",
    0x0112 -> "Orientation", 0x011a -> "XResolution",
    0x011b -> "YResolution", 0x0128 -> "ResolutionUnit",
    0x0131 -> "Software", 0x0132 -> "DateTime", 0x013b -> "Artist",
    0x8298 -> "Copyright")

  /** Same lookup strings as the reference (util/exif.py _LOOKUPS). */
  private val Orientations = Vector("", "Horizontal", "Mirror horizontal",
    "Rotate 180", "Mirror vertical", "Mirror horizontal and rotate 270 CW",
    "Rotate 90 CW", "Mirror horizontal and rotate 90 CW", "Rotate 270 CW")
  private val ResolutionUnits = Vector("", "Undefined", "Inches", "Centimetres")

  /** Parse EXIF IFD0 tags out of a JPEG payload. Empty map when the
    * payload is not a JPEG or carries no (readable) EXIF.
    */
  def exifTags(bytes: Array[Byte]): Map[String, String] =
    try parse(bytes) catch { case _: Exception => Map.empty }

  private def parse(b: Array[Byte]): Map[String, String] = {
    if (b == null || b.length < 4 ||
      (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return Map.empty
    // walk JPEG markers to APP1 "Exif\0\0"
    var i = 2
    while (i + 4 <= b.length && (b(i) & 0xff) == 0xff) {
      val marker = b(i + 1) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) i += 2
      else {
        val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
        if (marker == 0xe1 && i + 10 <= b.length &&
          new String(b, i + 4, 4, "US-ASCII") == "Exif")
          return parseTiff(b, i + 10, len - 8)
        i += 2 + len
      }
    }
    Map.empty
  }

  private def parseTiff(b: Array[Byte], off: Int, len: Int): Map[String, String] = {
    if (len < 8) return Map.empty
    val little = (b(off) & 0xff) == 'I'
    def u16(p: Int): Int =
      if (little) (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
      else ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
    def u32(p: Int): Long =
      if (little) (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
        ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
      else ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
        ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
    if (u16(off + 2) != 42) return Map.empty
    val ifd = off + u32(off + 4).toInt
    if (ifd + 2 > b.length) return Map.empty
    val n = u16(ifd)
    val out = Map.newBuilder[String, String]
    for (e <- 0 until n) {
      val p = ifd + 2 + e * 12
      if (p + 12 <= b.length) {
        val tag = u16(p)
        TagNames.get(tag).foreach { name =>
          val typ = u16(p + 2)
          val count = u32(p + 4).toInt
          val v: Option[String] = typ match {
            case 2 => // ASCII, NUL-terminated; inline when <= 4 bytes
              val at = if (count <= 4) p + 8 else off + u32(p + 8).toInt
              if (at + count <= b.length && count > 0)
                Some(new String(b, at, count, "US-ASCII")
                  .takeWhile(_ != '\u0000').trim)
              else None
            case 3 => // SHORT
              val raw = u16(p + 8)
              Some(tag match {
                case 0x0112 => Orientations.lift(raw).filter(_.nonEmpty)
                  .getOrElse(raw.toString)
                case 0x0128 => ResolutionUnits.lift(raw).filter(_.nonEmpty)
                  .getOrElse(raw.toString)
                case _ => raw.toString
              })
            case 4 => Some(u32(p + 8).toString) // LONG
            case 5 => // RATIONAL at offset
              val at = off + u32(p + 8).toInt
              if (at + 8 <= b.length) {
                val num = u32(at); val den = u32(at + 4)
                Some(if (den == 1 || den == 0) num.toString
                  else (num.toDouble / den).toString)
              } else None
            case _ => None
          }
          v.filter(_.nonEmpty).foreach(s => out += name -> s)
        }
      }
    }
    out.result()
  }

  /** Append an `exif` map<string,string> column extracted from the media
    * payload — same repartition-by-cores + one mapPartitions shape as the
    * decode pass.
    */
  def exifImages(df: DataFrame, prefix: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("exif", MapType(StringType, StringType)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    val bytesIdx = df.schema.fieldIndex(s"${prefix}_bytes")
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .mapPartitions { rows =>
        rows.map(r =>
          Row.fromSeq(r.toSeq :+ exifTags(r.getAs[Array[Byte]](bytesIdx))))
      }
  }
}
