package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.6): media travels as an opaque
  * `binary` column plus a typed metadata struct; decode / feature-extraction
  * runs partition-parallel over the binary payloads.
  *
  * The decode kernels themselves are STUBS — this container ships no
  * image/audio codecs — but deliberately deterministic ones, so the
  * Spark-side contract (schema, batching, partition parallelism, null
  * handling) is real and testable. Swapping in a real codec changes only
  * the function body marked STUB below.
  *
  * Scale notes: binary payloads never enter a shuffle here — decode is a
  * narrow `mapPartitions`; only the small extracted features flow onward.
  * At 100 TB the payloads would live in parquet binary columns read with
  * `spark.sql.parquet.enableVectorizedReader` + large
  * `maxPartitionBytes`, or as object-store paths resolved inside the
  * partition (same operator shape).
  */
object Multimodal {

  /** A media item: id + kind + raw bytes + source metadata. */
  case class MediaRow(id: Long, kind: String, bytes: Array[Byte],
      meta: Map[String, String])

  /** Extracted features per media item. */
  case class MediaFeatures(id: Long, kind: String, width: Int, height: Int,
      nBytes: Long, features: Array[Float])

  /** Wrap any table with a string payload column into media rows (utf-8
    * bytes) — the test-path producer; real pipelines read binary parquet. */
  def fromText(df: DataFrame, idCol: String, textCol: String,
      kind: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id"), lit(kind).as("kind"),
      col(textCol).cast("binary").as("bytes"),
      map(lit("src"), lit("text")).as("meta")).as[MediaRow]
  }

  /** STUB image decode: a real implementation would parse the container
    * format (JPEG/PNG) here. The stub derives deterministic pseudo
    * dimensions and an 8-dim feature vector from the byte content, so
    * tests exercise schema/partitioning/batch shape end-to-end.
    *
    * The derivation hashes the payload with md5 and keeps the top 60
    * bits — the same DuckDB-portable form as
    * [[graft.functions.TextFunctions.hash60]] — which makes the whole
    * stub ANSI-expressible and lets t04 carry a full DuckDB oracle
    * instead of a rows-only check (the real-codec swap point is
    * unchanged: only this body). */
  def decodeAndFeaturize(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // MessageDigest is not thread-safe: one instance per partition
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        // STUB: stand-in for codec decode — deterministic in the bytes
        md.reset()
        val hex = md.digest(m.bytes).map("%02x".format(_)).mkString
        val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
        val w = 64 + (h % 512).toInt
        val ht = 64 + ((h >> 16) % 512).toInt
        val feats = Array.tabulate(8)(i =>
          ((h >> (i * 7)) % 1000).toFloat / 1000f)
        MediaFeatures(m.id, m.kind, w, ht, m.bytes.length.toLong, feats)
      }
    }
  }

  /** STUB frame sampling: every `stride`-th chunk of the payload becomes a
    * "frame" (a real video path would demux + decode keyframes). One input
    * row → many frame rows: the UDTF-ish explode shape. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      m.bytes.grouped(math.max(stride, 1)).zipWithIndex.map {
        case (chunk, i) => (m.id, i, chunk.length, chunk)
      }
    }.toDF("id", "frame_no", "frame_bytes", "payload")
  }

  /** Content fingerprint over the binary payload — pure SQL, oracle-able:
    * sha256 hex + byte length. */
  def fingerprint(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(col(idCol),
      sha2(col(binCol), 256).as("sha256_hex"),
      length(col(binCol)).cast("long").as("n_bytes"))

  /** Exact media dedup by content digest — the image/video counterpart
    * of text exact-dedup: keep the min-id copy of each distinct
    * payload. The digest is computed MAP-SIDE from the binary column,
    * so only (32-byte digest, id) ever shuffles — the media bytes stay
    * where they were scanned, which is the property that makes this
    * viable on a 100-TB binary corpus. Returns one row per distinct
    * payload: (digest, keeper id, copy count). */
  def dedupByDigest(df: DataFrame, idCol: String, binCol: String)
      : DataFrame =
    df.select(sha2(col(binCol), 256).as("digest"),
        col(idCol).cast("long").as("id"))
      .groupBy(col("digest"))
      .agg(min(col("id")).as("keeper"),
        count(lit(1)).as("n_copies"))

  /** Codec-free container-format sniff over a binary column: the
    * magic-byte dispatch every ingest triage runs BEFORE spending a
    * decode (and the only format check possible in an environment
    * with no codecs at all). Reads the first 12 bytes — the binary is
    * sliced FIRST, so a 100-TB scan hexes 12 bytes per row, never the
    * payload — and matches the published signatures: JPEG `FF D8 FF`,
    * PNG `89 50 4E 47`, GIF `GIF8`, RIFF-container WAVE/WEBP (format
    * tag at byte 9), MP4 (`ftyp` at byte 5), PDF `%PDF`, gzip
    * `1F 8B`, zstd `28 B5 2F FD`, else `unknown`. Pure built-ins
    * (slice → hex → CASE), codegen'd, map-only. */
  def sniffFormat(bin: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val h = upper(hex(substring(bin, 1, 12)))
    when(h.startsWith("FFD8FF"), "jpeg")
      .when(h.startsWith("89504E47"), "png")
      .when(h.startsWith("47494638"), "gif")
      .when(h.startsWith("52494646") &&
        substring(h, 17, 8) === "57415645", "wav")
      .when(h.startsWith("52494646") &&
        substring(h, 17, 8) === "57454250", "webp")
      .when(substring(h, 9, 8) === "66747970", "mp4")
      .when(h.startsWith("25504446"), "pdf")
      .when(h.startsWith("424D"), "bmp")
      .when(h.startsWith("1F8B"), "gzip")
      .when(h.startsWith("28B52FFD"), "zstd")
      .otherwise("unknown")
  }

  /** Byte `p` (1-based) of a hex dump occupies chars (2p−1, 2p). */
  private def byteHex(h: org.apache.spark.sql.Column, p: Int) =
    substring(h, 2 * p - 1, 2)

  /** Big-endian u32 at byte `p`: hex order IS byte order. */
  private def beU32(h: org.apache.spark.sql.Column, p: Int) =
    conv(substring(h, 2 * p - 1, 8), 16, 10).cast("long")

  private def leU16(h: org.apache.spark.sql.Column, p: Int) =
    conv(concat(byteHex(h, p + 1), byteHex(h, p)), 16, 10).cast("long")

  private def leU32(h: org.apache.spark.sql.Column, p: Int) =
    conv(concat(byteHex(h, p + 3), byteHex(h, p + 2),
      byteHex(h, p + 1), byteHex(h, p)), 16, 10).cast("long")

  /** LE signed 32-bit, by arithmetic (an ANSI-mode long→int cast
    * would THROW on the reinterpret): u − 2³² when the sign bit is
    * set. */
  private def leS32(h: org.apache.spark.sql.Column, p: Int) = {
    val u = leU32(h, p)
    when(u >= 2147483648L, u - 4294967296L).otherwise(u)
  }

  /** REAL header metadata for the fixed-offset container formats — no
    * codec needed, the fields sit at published byte positions:
    *   - PNG: IHDR width/height, big-endian u32 at bytes 17/21;
    *   - GIF: logical-screen width/height, little-endian u16 at 7/9;
    *   - BMP: BITMAPINFOHEADER width/height, little-endian 32-bit at
    *     19/23 (top-down BMPs store a negative height — abs'd here);
    *   - WAV: channels (LE u16 at 23) and sample rate (LE u32 at 25),
    *     canonical fmt-first layout.
    * The variable-layout formats have their own real parsers now —
    * [[jpegDimensions]] (SOF marker walk) and [[mp4Headers]] (ISO-BMFF
    * box walk); only the pixel/sample DECODE remains the stub's swap
    * point.
    * Returns a struct (width, height, sample_rate, channels), nulls
    * where the format doesn't carry the field or the payload is too
    * short for its own header. Like [[sniffFormat]]: the binary is
    * sliced to 28 bytes BEFORE hexing, pure built-ins, map-only. */
  def mediaHeader(bin: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val h = upper(hex(substring(bin, 1, 28)))
    val kind = sniffFormat(bin)
    val n = length(bin)
    val width =
      when(kind === "png" && n >= 24, beU32(h, 17))
        .when(kind === "gif" && n >= 10, leU16(h, 7))
        .when(kind === "bmp" && n >= 26, abs(leS32(h, 19)))
    val height =
      when(kind === "png" && n >= 24, beU32(h, 21))
        .when(kind === "gif" && n >= 10, leU16(h, 9))
        .when(kind === "bmp" && n >= 26, abs(leS32(h, 23)))
    val rate = when(kind === "wav" && n >= 28, leU32(h, 25))
    val channels = when(kind === "wav" && n >= 24, leU16(h, 23))
    struct(width.as("width"), height.as("height"),
      rate.as("sample_rate"), channels.as("channels"))
  }

  /** SOF markers carry dimensions in every JPEG flavor; C4/C8/CC are
    * DHT/JPG/DAC, not frames. */
  private def isSof(m: Int): Boolean =
    m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC

  /** Bounded JPEG marker walk: (width, height) from the first SOF
    * segment, or None for non-JPEG / truncated / desynced payloads or
    * a scan (SOS) / EOI reached before any frame header. */
  private[graft] def jpegSof(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xFF) != 0xFF ||
        (b(1) & 0xFF) != 0xD8) return None
    var i = 2
    val bound = math.min(b.length, 1 << 16)
    while (i + 3 < bound) {
      if ((b(i) & 0xFF) != 0xFF) return None // marker desync: corrupt
      val m = b(i + 1) & 0xFF
      if (m == 0xFF) i += 1 // fill byte
      else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) i += 2 // standalone
      else if (m == 0xD9 || m == 0xDA) return None // EOI/SOS: no frame
      else {
        val len = ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
        if (len < 2) return None
        if (isSof(m)) {
          if (i + 8 >= b.length) return None // SOF itself truncated
          val h = ((b(i + 5) & 0xFF) << 8) | (b(i + 6) & 0xFF)
          val w = ((b(i + 7) & 0xFF) << 8) | (b(i + 8) & 0xFF)
          return Some((w, h))
        }
        i += 2 + len
      }
    }
    None
  }

  /** REAL JPEG dimensions — the one common image format whose header
    * is NOT fixed-offset: dimensions live in the first SOF segment,
    * behind a variable prefix of APP0/APP1(EXIF)/DQT/… segments, so
    * this is a marker WALK, not a slice — parser work, done as a
    * bounded partition-parallel scan (first 64 KB; a JPEG whose
    * metadata exceeds that reads as unparseable rather than scanning
    * unbounded bytes), the same `mapPartitions` shape as the decode
    * family. NULLs for non-JPEG, truncated, or desynced payloads.
    * Completes the image-header family next to [[mediaHeader]]'s
    * fixed-offset PNG/GIF/BMP. */
  def jpegDimensions(df: DataFrame, idCol: String,
      binCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(binCol).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val dims = if (bytes == null) None else jpegSof(bytes)
        (id, dims.map(_._1.toLong), dims.map(_._2.toLong))
      })
      .toDF(idCol, "width", "height")
  }

  private def mp4U32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)

  private def mp4U64(b: Array[Byte], i: Int): Long =
    (mp4U32(b, i) << 32) | mp4U32(b, i + 4)

  private def mp4Type(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "ISO-8859-1")

  /** One ISO-BMFF box at `i`: (type, payloadStart, boxEnd), or None on
    * a truncated/desynced header. size==1 reads the 64-bit largesize;
    * size==0 extends to EOF; any size below the header's own length is
    * desync. */
  private def mp4Box(b: Array[Byte], i: Int,
      end: Int): Option[(String, Int, Long)] = {
    if (i + 8 > end) return None
    val size = mp4U32(b, i)
    val t = mp4Type(b, i + 4)
    if (size == 0L) Some((t, i + 8, b.length.toLong))
    else if (size == 1L) {
      if (i + 16 > end) None
      else {
        val s64 = mp4U64(b, i + 8)
        if (s64 < 16L) None else Some((t, i + 16, i + s64))
      }
    } else if (size < 8L) None
    else Some((t, i + 8, i + size))
  }

  /** Bounded ISO-BMFF (MP4/MOV) box walk over the payload head:
    * (major_brand, timescale, duration, first video track dims).
    * None for non-MP4 (no leading `ftyp`), truncated, or desynced
    * payloads; dims None for audio-only movies (no track with nonzero
    * tkhd width/height). The `moov` must sit inside the first
    * `bound` bytes — faststart layout; a moov-at-end file reads as
    * unparseable rather than walking unbounded (a production tail
    * fetch passes a larger slice the same way q140's JPEG bound is
    * tuned). Handles mvhd/tkhd version 0 AND 1 (the 64-bit time
    * variants); tkhd dims are 16.16 fixed point, integer part kept. */
  private[graft] def mp4Walk(b: Array[Byte],
      bound: Int = 1 << 16): Option[
      (String, Long, Long, Option[(Long, Long)])] = {
    if (b == null || b.length < 12) return None
    val end = math.min(b.length, bound)
    // the file-type box must lead (the sniff contract): brand at 8..12
    if (mp4Type(b, 4) != "ftyp") return None
    val brand = mp4Type(b, 8)
    var timescale = -1L
    var duration = -1L
    var dims: Option[(Long, Long)] = None

    def parseMvhd(p: Int, boxEnd: Int): Boolean = {
      if (p >= boxEnd) return false
      val v = b(p) & 0xFF
      if (v == 0) {
        if (p + 20 > boxEnd) return false
        timescale = mp4U32(b, p + 12); duration = mp4U32(b, p + 16)
      } else if (v == 1) {
        if (p + 32 > boxEnd) return false
        timescale = mp4U32(b, p + 20); duration = mp4U64(b, p + 24)
        // a u64 duration past Long.MaxValue reads negative — garbage a
        // real movie cannot carry; treat as desync, never emit it
        if (duration < 0L) return false
      } else return false
      true
    }

    def parseTkhd(p: Int, boxEnd: Int): Option[(Long, Long)] = {
      if (p >= boxEnd) return None
      val off = (b(p) & 0xFF) match {
        case 0 => 76
        case 1 => 88
        case _ => return None
      }
      if (p + off + 8 > boxEnd) return None
      // 16.16 fixed point — integer part
      val w = mp4U32(b, p + off) >> 16
      val h = mp4U32(b, p + off + 4) >> 16
      if (w > 0L && h > 0L) Some((w, h)) else None
    }

    // child walks return false on desync/truncation inside a container
    // we committed to parsing — the whole payload then reads as NULL,
    // never as a half-parsed row
    def walkTrak(from: Int, to: Int): Boolean = {
      var i = from
      while (i + 8 <= to) {
        mp4Box(b, i, to) match {
          // e > i also rejects a largesize whose i + s64 wrapped
          // negative — without it a crafted box could jump the walk
          // BACKWARDS (infinite loop in the task) or index negatively
          case Some((t, p, e)) if e > i && e <= to =>
            if (t == "tkhd" && dims.isEmpty)
              dims = parseTkhd(p, e.toInt)
            i = e.toInt
          case _ => return false
        }
      }
      i == to
    }

    def walkMoov(from: Int, to: Int): Boolean = {
      var i = from
      var sawMvhd = false
      while (i + 8 <= to) {
        mp4Box(b, i, to) match {
          case Some((t, p, e)) if e > i && e <= to =>
            if (t == "mvhd") {
              if (!parseMvhd(p, e.toInt)) return false
              sawMvhd = true
            } else if (t == "trak" && dims.isEmpty) {
              if (!walkTrak(p, e.toInt)) return false
            }
            i = e.toInt
          case _ => return false
        }
      }
      sawMvhd && i == to
    }

    var i = 0
    while (i + 8 <= end) {
      mp4Box(b, i, end) match {
        case Some((t, p, e)) =>
          if (t == "moov") {
            // the movie metadata must be COMPLETE inside the bound —
            // a truncated moov reads as NULL, never a partial parse
            if (e > end || !walkMoov(p, e.toInt)) return None
            return Some((brand, timescale, duration, dims))
          }
          if (e <= i) return None // zero-progress guard
          i = if (e > end.toLong) end else e.toInt
        case None => return None
      }
    }
    None // no moov inside the bound (moov-at-end, or truncated)
  }

  /** Size-guided diagnostic for a payload [[mp4Walk]] REFUSED: the
    * bound the caller would need for the walk to reach and complete
    * the `moov`. The box LENGTHS are already parsed, so when the walk
    * gives up (moov beyond `bound`, or extending past it) this
    * second pass skips the top-level boxes through the FULL payload —
    * a handful of 8/16-byte header reads (ftyp/free/mdat/moov is the
    * whole top level of a real movie), never the content — and
    * returns the moov's END offset. A census then runs ONE targeted
    * second pass at `needed_bound` over just the refused rows instead
    * of re-reading the whole corpus at max bound. None when the
    * payload is not walkable at all (no ftyp, desync, a top-level
    * header truncated before moov — a bigger bound would not help
    * THIS payload) or when the moov completes inside `bound` already
    * (the refusal was a desync inside it, not a size problem — a
    * bigger bound changes nothing, so reporting one would mislead).
    * The moov header itself must sit inside the payload; its CONTENT
    * may extend past it (a head-slice fetch) — the returned bound
    * then tells the census how much MORE file to fetch, same
    * arithmetic. */
  private[graft] def mp4NeededBound(b: Array[Byte],
      bound: Int = 1 << 16): Option[Long] = {
    if (b == null || b.length < 12 || mp4Type(b, 4) != "ftyp")
      return None
    val end = b.length
    var i = 0
    while (i + 8 <= end) {
      mp4Box(b, i, end) match {
        // e > i: same wrapped-largesize guard as the main walk
        case Some((t, _, e)) if e > i =>
          if (t == "moov")
            return if (e > bound) Some(e) else None
          if (e > end.toLong) return None // next header out of payload
          i = e.toInt
        case _ => return None
      }
    }
    None
  }

  /** REAL MP4/ISO-BMFF header metadata — the box WALK the container
    * family needs where [[mediaHeader]]'s fixed offsets cannot reach:
    * `ftyp` major brand, `mvhd` timescale + duration (+ the derived
    * integer `duration_ms`), and the first video track's `tkhd`
    * dimensions, parsed from the first `bound` bytes (default 64 KB —
    * raise it when payload columns carry the FULL file and moov sits
    * deep; a tail-only byte-range slice can never parse, because the
    * walk requires the leading `ftyp` and contiguous boxes) with zero
    * codecs in the same bounded `mapPartitions` shape as
    * [[jpegDimensions]]. NULLs
    * for non-MP4, truncated, desynced, or moov-at-end payloads; dims
    * NULL (times kept) for audio-only movies. A refused deep-moov row
    * additionally carries `needed_bound` — the bound a targeted
    * second pass needs to parse it (see [[mp4NeededBound]]); NULL on
    * parsed rows and on payloads no bound can fix. */
  def mp4Headers(df: DataFrame, idCol: String,
      binCol: String, bound: Int = 1 << 16): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(binCol).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val info = mp4Walk(bytes, bound)
        (id, info.map(_._1), info.map(_._2), info.map(_._3),
          info.flatMap { case (_, ts, d, _) =>
            // d * 1000 must not overflow Long (an untrusted 64-bit
            // field): a duration that large is garbage — NULL, never
            // a wrapped negative millisecond count
            if (ts > 0L && d <= Long.MaxValue / 1000L)
              Some(d * 1000L / ts)
            else None },
          info.flatMap(_._4.map(_._1)), info.flatMap(_._4.map(_._2)),
          // the size-guided diagnostic, only for refused payloads —
          // the header skips it costs were already paid by the walk's
          // failure, and the box count at top level is tiny
          if (info.isDefined) None else mp4NeededBound(bytes, bound))
      })
      .toDF(idCol, "major_brand", "timescale", "duration",
        "duration_ms", "width", "height", "needed_bound")
  }

  /** Byte `p` (1-based, as a COLUMN) of a hex dump — the dynamic-
    * offset sibling of [[byteHex]], for headers whose field positions
    * depend on flag bytes (the zstd frame header). */
  private def byteHexAt(h: org.apache.spark.sql.Column,
      p: org.apache.spark.sql.Column) =
    h.substr(p * 2 - 1, lit(2))

  /** Little-endian unsigned integer of `nBytes` at dynamic byte
    * position `p` (1-based column): hex bytes concatenated highest-
    * address first, then one base-16 conv. nBytes ≤ 4 keeps the
    * result inside a non-negative Long with no ANSI overflow. */
  private def leAt(h: org.apache.spark.sql.Column,
      p: org.apache.spark.sql.Column, nBytes: Int) =
    conv(concat((nBytes - 1 to 0 by -1)
      .map(i => byteHexAt(h, p + i)): _*), 16, 10).cast("long")

  /** UNCOMPRESSED-size hint for compressed payloads, with zero
    * decompression — the census a 100-TB compressed drop needs before
    * spending any decode: expansion ratio, downstream storage
    * planning, and the absurd-ratio page (a 1000× "expansion" is a
    * zip-bomb-shaped upload). Sources, both from published container
    * formats, both pure built-ins (slice → hex → CASE), codegen'd,
    * map-only:
    *   - gzip (RFC 1952): `ISIZE`, the little-endian u32 in the LAST
    *     four bytes — the original size MOD 2³² of the final member.
    *     By contract, not a parse gap: sizes ≥ 4 GiB alias (pair with
    *     the compressed length to disambiguate at census scale) and a
    *     multi-member concatenation reports its last member; payloads
    *     shorter than the 18-byte minimal single member read NULL.
    *   - zstd (RFC 8878): the frame header's Frame_Content_Size
    *     field, whose OFFSET depends on the descriptor byte —
    *     magic(4) + FHD(1) + window descriptor(1, absent when
    *     single-segment) + dictionary id(0/1/2/4 by DID flag) + FCS
    *     (fcs flag 0 → 1 byte IF single-segment else ABSENT — a
    *     stream of unknown length reads NULL, correctly; 1 → 2 bytes
    *     PLUS 256; 2 → 4 bytes; 3 → 8 bytes, NULL when the u64 would
    *     not fit a Long — garbage a real file cannot carry). A set
    *     reserved bit (a corrupt or future-format frame) reads NULL,
    *     never a misparse.
    * Everything else (raw text, images, unknown) reads NULL — the
    * `codec` column carries [[sniffFormat]]'s dispatch so the census
    * can split known-uncompressible from unknown. */
  def compressedSizeHint(bin: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val kind = sniffFormat(bin)
    val n = length(bin)
    // gzip: one 4-byte tail slice, hexed — never the payload
    val tailHex = upper(hex(substring(bin, -4, 4)))
    val gzipSize = leU32(tailHex, 1)
    // zstd: max header = magic 4 + FHD 1 + window 1 + did 4 + fcs 8
    val h = upper(hex(substring(bin, 1, 18)))
    val fhd = conv(byteHex(h, 5), 16, 10).cast("int")
    val ss = fhd.bitwiseAND(lit(32)) =!= 0
    val reserved = fhd.bitwiseAND(lit(8)) =!= 0
    val fcsFlag = shiftright(fhd, 6).bitwiseAND(lit(3))
    val didFlag = fhd.bitwiseAND(lit(3))
    val didLen = when(didFlag === 3, 4).otherwise(didFlag)
    // first FCS byte, 1-based: after magic+FHD (5), the window byte
    // (absent when single-segment), and the dictionary id
    val off = lit(6) + when(ss, 0).otherwise(1) + didLen
    val fcsLen = when(fcsFlag === 0, when(ss, 1).otherwise(0))
      .when(fcsFlag === 1, 2).when(fcsFlag === 2, 4).otherwise(8)
    val fits = n >= off + fcsLen - 1
    val hi = leAt(h, off + 4, 4)
    val lo = leAt(h, off, 4)
    val zstdSize =
      when(fcsFlag === 0,
        when(ss, leAt(h, off, 1)).otherwise(lit(null)))
        .when(fcsFlag === 1, leAt(h, off, 2) + 256L)
        .when(fcsFlag === 2, leAt(h, off, 4))
        .otherwise(
          // 8-byte LE assembled from two u32 halves: hi ≤ 2³¹−1
          // keeps hi·2³² + lo ≤ 2⁶³−1 (no ANSI overflow, ever);
          // anything larger is garbage — NULL, never a throw
          when(hi < 2147483648L, hi * 4294967296L + lo))
    when(kind === "gzip" && n >= 18, gzipSize)
      .when(kind === "zstd" && !reserved && fits, zstdSize)
  }

  /** [[compressedSizeHint]] over a table: (id, codec,
    * uncompressed_size) — one row per payload, the compression census
    * next to [[mediaTriage]]. */
  def compressionCensus(df: DataFrame, idCol: String,
      binCol: String): DataFrame =
    df.select(col(idCol), sniffFormat(col(binCol)).as("codec"),
      compressedSizeHint(col(binCol)).as("uncompressed_size"))

  /** Strict RFC 3629 UTF-8 scan from `from`: (first invalid offset —
    * the LEAD byte of the broken sequence — or None when the tail is
    * fully valid, decoded code-point count up to that point).
    * Rejects everything the spec rejects: bare continuation bytes,
    * overlong forms (C0/C1 leads, E0 80-9F, F0 80-8F), surrogate
    * halves (ED A0-BF), planes past U+10FFFF (F4 90+, F5-FF leads),
    * and sequences truncated by the payload end. No String or char
    * buffer is ever materialized — a pure byte walk, so a 100-TB
    * census never pays decode allocation for payloads it only needs
    * to JUDGE. */
  private[graft] def utf8Scan(b: Array[Byte],
      from: Int): (Option[Int], Long) = {
    var i = from; var n = 0L
    while (i < b.length) {
      val c = b(i) & 0xFF
      if (c < 0x80) { i += 1; n += 1 }
      else if (c < 0xC2 || c > 0xF4) return (Some(i), n)
      else {
        val len = if (c < 0xE0) 2 else if (c < 0xF0) 3 else 4
        if (i + len > b.length) return (Some(i), n)
        val c1 = b(i + 1) & 0xFF
        val lo = c match {
          case 0xE0 => 0xA0 // shorter forms encode in 2 bytes
          case 0xF0 => 0x90 // shorter forms encode in 3 bytes
          case _ => 0x80
        }
        val hi = c match {
          case 0xED => 0x9F // D800-DFFF are surrogates, not chars
          case 0xF4 => 0x8F // 10FFFF is the last code point
          case _ => 0xBF
        }
        if (c1 < lo || c1 > hi) return (Some(i), n)
        var j = i + 2
        var bad = false
        while (j < i + len && !bad) {
          val cj = b(j) & 0xFF
          bad = cj < 0x80 || cj > 0xBF
          j += 1
        }
        if (bad) return (Some(i), n)
        i += len; n += 1
      }
    }
    (None, n)
  }

  /** UTF-16 code-unit scan from `from`: (first invalid BYTE offset or
    * None, code-point count). Invalid = a lone or trailing-first
    * surrogate (the offset of the offending unit) or an odd trailing
    * byte (its own offset). */
  private[graft] def utf16Scan(b: Array[Byte], from: Int,
      littleEndian: Boolean): (Option[Int], Long) = {
    def unit(j: Int): Int =
      if (littleEndian) (b(j) & 0xFF) | ((b(j + 1) & 0xFF) << 8)
      else ((b(j) & 0xFF) << 8) | (b(j + 1) & 0xFF)
    var i = from; var n = 0L
    while (i < b.length) {
      if (i + 2 > b.length) return (Some(i), n)
      val u = unit(i)
      if (u >= 0xD800 && u <= 0xDBFF) {
        if (i + 4 > b.length) return (Some(i), n)
        val u2 = unit(i + 2)
        if (u2 < 0xDC00 || u2 > 0xDFFF) return (Some(i), n)
        i += 4; n += 1
      } else if (u >= 0xDC00 && u <= 0xDFFF) return (Some(i), n)
      else { i += 2; n += 1 }
    }
    (None, n)
  }

  /** UTF-32 unit scan from `from`: (first invalid BYTE offset or None,
    * code-point count). Invalid = a unit past U+10FFFF, a surrogate
    * value (D800-DFFF — ill-formed in UTF-32 too), or a trailing
    * fragment shorter than 4 bytes. */
  private[graft] def utf32Scan(b: Array[Byte], from: Int,
      littleEndian: Boolean): (Option[Int], Long) = {
    def unit(j: Int): Long =
      if (littleEndian)
        (b(j) & 0xFFL) | ((b(j + 1) & 0xFFL) << 8) |
          ((b(j + 2) & 0xFFL) << 16) | ((b(j + 3) & 0xFFL) << 24)
      else
        ((b(j) & 0xFFL) << 24) | ((b(j + 1) & 0xFFL) << 16) |
          ((b(j + 2) & 0xFFL) << 8) | (b(j + 3) & 0xFFL)
    var i = from; var n = 0L
    while (i < b.length) {
      if (i + 4 > b.length) return (Some(i), n)
      val u = unit(i)
      if (u > 0x10FFFFL || (u >= 0xD800L && u <= 0xDFFFL))
        return (Some(i), n)
      i += 4; n += 1
    }
    (None, n)
  }

  /** One payload's encoding verdict — see [[encodingCensus]] for the
    * column contract. */
  private[graft] def encodingScan(b: Array[Byte])
      : (String, Boolean, Option[Long], Option[Long], Long) = {
    var nul = 0L
    var i = 0
    while (i < b.length) { if (b(i) == 0) nul += 1; i += 1 }
    def u(j: Int) = b(j) & 0xFF
    val n = b.length
    // BOM dispatch, longest first: FF FE 00 00 is UTF-32LE, not a
    // UTF-16LE BOM followed by U+0000 (the standard tiebreak; a
    // UTF-16LE string genuinely STARTING with NUL is misread — it is
    // byte-identical, no sniffer can do better)
    val bom: Option[(String, Int)] =
      if (n >= 4 && u(0) == 0xFF && u(1) == 0xFE && u(2) == 0 &&
        u(3) == 0) Some(("utf32le", 4))
      else if (n >= 4 && u(0) == 0 && u(1) == 0 && u(2) == 0xFE &&
        u(3) == 0xFF) Some(("utf32be", 4))
      else if (n >= 3 && u(0) == 0xEF && u(1) == 0xBB && u(2) == 0xBF)
        Some(("utf8_bom", 3))
      else if (n >= 2 && u(0) == 0xFF && u(1) == 0xFE)
        Some(("utf16le", 2))
      else if (n >= 2 && u(0) == 0xFE && u(1) == 0xFF)
        Some(("utf16be", 2))
      else None
    bom match {
      case Some((enc, skip)) =>
        val (bad, chars) = enc match {
          case "utf8_bom" => utf8Scan(b, skip)
          case "utf16le" => utf16Scan(b, skip, littleEndian = true)
          case "utf16be" => utf16Scan(b, skip, littleEndian = false)
          case "utf32le" => utf32Scan(b, skip, littleEndian = true)
          case _ => utf32Scan(b, skip, littleEndian = false)
        }
        (enc, bad.isEmpty, bad.map(_.toLong),
          if (bad.isEmpty) Some(chars) else None, nul)
      case None =>
        val (bad, chars) = utf8Scan(b, 0)
        if (bad.isEmpty) {
          val ascii = chars == n // every code point was one byte
          (if (ascii) "ascii" else "utf8", true, None, Some(chars), nul)
        } else ("binary", false, bad.map(_.toLong), None, nul)
    }
  }

  /** ENCODING census over a table of binary payloads — the text-side
    * triage sibling of [[mediaTriage]] and [[compressionCensus]]: a
    * web-scale text drop is full of mislabeled charsets, multibyte
    * tails truncated by byte-range fetches, BOM'd Windows exports and
    * binary masquerading as text, and every tokenizer downstream
    * assumes guaranteed-valid UTF-8. One row per payload:
    *   - `encoding`: `ascii` (valid UTF-8, no byte ≥ 0x80) / `utf8`
    *     (valid, multibyte present) / `utf8_bom` / `utf16le` /
    *     `utf16be` / `utf32le` / `utf32be` (by BOM, longest match
    *     first — `FF FE 00 00` is UTF-32LE by the standard tiebreak)
    *     / `binary` (no BOM and not valid UTF-8).
    *   - `valid`: does the payload body validate under the detected
    *     encoding — strict RFC 3629 for the UTF-8 family (overlongs,
    *     surrogate halves, >U+10FFFF, truncations all rejected),
    *     surrogate PAIRING for UTF-16, range+alignment for UTF-32.
    *     `binary` is false by definition.
    *   - `first_invalid`: byte offset (0-based, BOM included) of the
    *     first offending sequence's first byte — where to look, and
    *     the tail-truncation signature (== a byte-range fetch cut)
    *     reads as first_invalid near n_bytes. NULL when valid.
    *   - `n_chars`: decoded code-point count, BOM excluded; NULL when
    *     invalid (a partial count would read as a real one in
    *     downstream aggregates).
    *   - `n_nul`: raw 0x00 byte count over the whole payload — the
    *     BOM-less UTF-16 / binary-contamination page (ASCII text
    *     exported as UTF-16 without a BOM is byte-alternating NULs
    *     and classifies `ascii`; nonzero n_nul is what flags it).
    * Map-only `mapPartitions` like the media family: no shuffle, no
    * String materialization (pure byte walks), nothing but the five
    * small columns flows onward — the shape that survives 100 TB. */
  def encodingCensus(df: DataFrame, idCol: String,
      binCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(binCol).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        if (bytes == null)
          (id, None: Option[String], None: Option[Boolean],
            None: Option[Long], None: Option[Long], None: Option[Long])
        else {
          val (enc, ok, bad, chars, nul) = encodingScan(bytes)
          (id, Some(enc), Some(ok), bad, chars, Some(nul))
        }
      })
      .toDF(idCol, "encoding", "valid", "first_invalid", "n_chars",
        "n_nul")
  }

  /** One parsed WARC record: header fields + the block's position in
    * the payload. */
  private[graft] case class WarcRec(rec: Long, warcType: Option[String],
      targetUri: Option[String], contentType: Option[String],
      contentLength: Long, blockOffset: Long, blockTruncated: Boolean)

  /** Walk the concatenated WARC records in one payload (ISO 28500 —
    * the web-crawl container): each record is `WARC/1.x` + CRLF
    * header lines + CRLF + a Content-Length byte block + CRLF CRLF.
    * Returns the records parsed IN ORDER; stops at the first
    * malformation (bad magic, header line without a colon, a header
    * larger than `maxHeader`, missing/unparseable Content-Length,
    * missing inter-record CRLF CRLF) — records before the desync are
    * kept, nothing after it is guessed at. A block the payload
    * truncates (a partial fetch) is EMITTED with
    * `blockTruncated = true`, then the walk stops. Header names are
    * case-insensitive per the spec; folded continuation lines (SP/TAB
    * lead) extend the previous value. Headers are ASCII by the spec —
    * read as ISO-8859-1, never a charset guess. */
  private[graft] def warcWalk(b: Array[Byte], maxRecords: Int = 10000,
      maxHeader: Int = 1 << 16): Seq[WarcRec] = {
    if (b == null) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRec]
    var i = 0
    var stopped = false
    while (!stopped && i < b.length && out.size < maxRecords) {
      // magic: WARC/ leading the record's first CRLF-terminated line
      if (i + 5 > b.length ||
        new String(b, i, 5, "ISO-8859-1") != "WARC/") stopped = true
      else {
        val headerEnd = { // index just past the CRLF CRLF
          var j = i
          var found = -1
          val cap = math.min(b.length - 3, i + maxHeader)
          while (found < 0 && j < cap) {
            if (b(j) == '\r' && b(j + 1) == '\n' && b(j + 2) == '\r' &&
              b(j + 3) == '\n') found = j + 4
            j += 1
          }
          found
        }
        if (headerEnd < 0) stopped = true
        else {
          val lines = new String(b, i, headerEnd - 2 - i, "ISO-8859-1")
            .split("\r\n", -1).toSeq.dropRight(1) // drop trailing ""
          // fold continuations (SP/TAB lead extends the previous value)
          val folded = lines.drop(1).foldLeft(List.empty[String]) {
            case (acc, l) if l.nonEmpty &&
              (l.head == ' ' || l.head == '\t') && acc.nonEmpty =>
              (acc.head + " " + l.trim) :: acc.tail
            case (acc, l) => l :: acc
          }.reverse
          if (folded.exists(_.indexOf(':') <= 0)) stopped = true
          else {
            val kvs = folded.map { l =>
              val c = l.indexOf(':')
              (l.take(c).trim.toLowerCase(java.util.Locale.ROOT),
                l.drop(c + 1).trim)
            }.toMap
            kvs.get("content-length").flatMap(_.toLongOption)
              .filter(_ >= 0) match {
              case None => stopped = true
              case Some(len) =>
                // compare without adding: headerEnd + len would wrap
                // negative on a hostile huge Content-Length and walk
                // off the array instead of stopping
                val truncated = len > (b.length - headerEnd).toLong
                out += WarcRec(out.size.toLong, kvs.get("warc-type"),
                  kvs.get("warc-target-uri"), kvs.get("content-type"),
                  len, headerEnd.toLong, truncated)
                val next = headerEnd + len
                // the trailer: exactly CRLF CRLF before the next record
                if (truncated || next + 4 > b.length) stopped = true
                else {
                  val n = next.toInt
                  if (b(n) == '\r' && b(n + 1) == '\n' &&
                    b(n + 2) == '\r' && b(n + 3) == '\n') i = n + 4
                  else stopped = true
                }
            }
          }
        }
      }
    }
    out.toSeq
  }

  /** WARC record census — the ingest walk for web-crawl drops: one
    * OUTPUT row per record in each payload (id, record index, type,
    * target URI, content type, declared block length, the block's
    * byte offset — the field a production reader range-fetches with —
    * and `block_truncated`, the partial-fetch page). Payloads that
    * desync mid-stream keep their already-parsed records; pure
    * garbage yields zero rows. Runs on UNCOMPRESSED record streams —
    * Common-Crawl-style per-record-gzip files pair this with
    * [[compressionCensus]] after member decompression. Same
    * `mapPartitions` discipline as the media family: the payload
    * bytes never enter a shuffle; only the small header fields flow
    * onward (the blocks stay where they are, addressed by offset). */
  def warcHeaders(df: DataFrame, idCol: String, binCol: String,
      maxRecords: Int = 10000): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(binCol).as("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        warcWalk(bytes, maxRecords).map(r => (id, r.rec, r.warcType,
          r.targetUri, r.contentType, r.contentLength, r.blockOffset,
          r.blockTruncated))
      }
      .toDF(idCol, "rec", "warc_type", "target_uri", "content_type",
        "content_length", "block_offset", "block_truncated")
  }

  /** [[warcHeaders]] WITH the block bytes (`block`, a truncated
    * block's available prefix) — the INGEST form: the same single
    * walk slices each record's block in place, so the content reaches
    * downstream per-record operators (encoding census, text
    * extraction) without any join back to the source payload. The
    * caller's discipline stays the family's: compute per-record
    * judgments map-side and PROJECT THE BLOCK AWAY before any
    * shuffle — at 100 TB the alternative for late content access is
    * an offset-addressed range fetch using [[warcHeaders]]'s
    * `block_offset`. */
  def warcRecords(df: DataFrame, idCol: String, binCol: String,
      maxRecords: Int = 10000): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(binCol).as("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        warcWalk(bytes, maxRecords).map { r =>
          val from = r.blockOffset.toInt
          // a truncated record's declared length may be huge (hostile
          // header) — never form offset+length, take the payload tail
          val until = if (r.blockTruncated) bytes.length
            else (r.blockOffset + r.contentLength).toInt
          (id, r.rec, r.warcType, r.targetUri, r.contentType,
            r.contentLength, r.blockOffset, r.blockTruncated,
            java.util.Arrays.copyOfRange(bytes, from, until))
        }
      }
      .toDF(idCol, "rec", "warc_type", "target_uri", "content_type",
        "content_length", "block_offset", "block_truncated", "block")
  }

  /** [[mediaHeader]] over a table: one row per item with the sniffed
    * kind and the parsed fixed-offset fields — the metadata census a
    * media ingest runs right after [[mediaTriage]], still with zero
    * codecs and zero shuffles. JPEG needs the marker walk instead —
    * [[jpegDimensions]]. */
  def mediaHeaders(df: DataFrame, idCol: String,
      binCol: String): DataFrame =
    df.select(col(idCol), sniffFormat(col(binCol)).as("kind"),
        mediaHeader(col(binCol)).as("hdr"))
      .select(col(idCol), col("kind"), col("hdr.width").as("width"),
        col("hdr.height").as("height"),
        col("hdr.sample_rate").as("sample_rate"),
        col("hdr.channels").as("channels"))

  /** Mislabel/corruption triage for a media table: one row per item
    * with the CLAIMED kind (the metadata), the SNIFFED kind (the
    * bytes), the payload size, and `format_ok` — false is the page:
    * a mislabeled asset, a truncated upload, or a payload column fed
    * from the wrong source. The standard first pass over a fresh
    * 100-TB media drop — map-only, no decode, no shuffle. */
  def mediaTriage(df: DataFrame, idCol: String, kindCol: String,
      binCol: String): DataFrame =
    df.select(col(idCol), col(kindCol).as("claimed"),
        sniffFormat(col(binCol)).as("sniffed"),
        length(col(binCol)).cast("long").as("n_bytes"))
      .withColumn("format_ok", col("claimed") === col("sniffed"))

  /** Byte-distribution Shannon entropy (nats) of a binary column via
    * the native [[graft.expressions.ByteEntropy]] kernel — the
    * codec-free "is this payload what it claims" sniff: compressed
    * media ≈ ln 256, text ≈ 4.2, zero-padded/corrupt → 0. Map-only. */
  def byteEntropy(bin: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.expressions.ByteEntropy(
        org.apache.spark.sql.GraftSqlBridge.expression(bin)))
}
