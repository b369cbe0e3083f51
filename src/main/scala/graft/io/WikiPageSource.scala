package graft.io

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * Splittable raw-dump page reader as a DataSource V2 — the Spark-first
 * re-realization of the reference's byte-split ingestion
 * (format/WikipediaPageInputFormat.java:24-186): a multi-gigabyte
 * `<title>…</title> … <text xml:space="preserve">…</text>` dump is
 * read in PARALLEL byte ranges, each range scanning forward to the
 * first record that BEGINS inside it, so a single file fans out to
 * thousands of tasks without a pre-split step.
 *
 * Split-ownership contract (exactly-once): a record belongs to the
 * range containing the FIRST byte of its `<title>` marker. A reader
 * seeks to its range start and scans byte-wise — a marker straddling
 * the range start cannot match (its head bytes were consumed by the
 * previous reader's scan), and a record whose marker begins past the
 * range end is left to the next reader; record BODIES may extend past
 * the range end and are read to completion by their owner. (The
 * reference instead begins a fresh title SEARCH whenever the previous
 * record ended before the split end — readUntilMatch at :77-104 can
 * then claim a record that begins arbitrarily far into the next split,
 * which that split's reader claims again; a dense dump masks it. This
 * re-realization fixes the double-read rather than replicating it.)
 *
 * Content is XML-unescaped exactly as the reference does
 * (StringEscapeUtils.unescapeXml, :92-96 — entity + numeric forms).
 *
 * Usage (opt-in by format name; the north-rule pipelines read tables):
 *   spark.read.format("graft-wikidump")          // or the FQCN
 *     .option("splitBytes", 64 << 20).load("/dumps/enwiki.xml")
 * Schema: (title string, content string). The short name registers via
 * META-INF/services on a spark-submit classpath; under sbt's layered
 * test classloader ServiceLoader may not surface it — use
 * classOf[WikiPageSource].getName there (as the spec does).
 *
 * Listing and reads go through the Hadoop FileSystem API (the
 * reference's FileInputFormat heritage, WikipediaPageInputFormat
 * .java:24-34), so file:/, hdfs:/, s3a:/ … paths all split and read
 * identically. Compression routes by suffix: a SPLITTABLE codec
 * (bzip2 — the format the upstream dumps actually ship) fans out to
 * sub-ranges in COMPRESSED offsets, each reader entering at the first
 * compression block at/after its range start via the codec's BYBLOCK
 * mode (the same splittable-bz2 capability the reference inherits
 * from TextInputFormat); ownership generalizes to "the record's
 * marker starts in a compression block owned by this range" — blocks
 * are the only mid-stream entry points, so block ownership is the
 * exact analog of byte ownership, and adjacent readers agree on it
 * because both see the identical block-start offsets from getPos().
 * A non-splittable codec (gzip) reads as ONE whole-stream range —
 * correct but unsplit, parallel per file.
 */
class WikiPageSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-wikidump"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WikiPageSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = opts.get("path")
    require(path != null && path.nonEmpty, "graft-wikidump requires a path")
    // the schema is FIXED: a caller-supplied schema that differs would
    // otherwise be silently ignored (read as the fixed one anyway)
    require(schema == null || schema.isEmpty || schema == WikiPageSource.schema,
      s"graft-wikidump's schema is fixed to ${WikiPageSource.schema.simpleString}; " +
        s"got ${schema.simpleString}")
    val split = Option(opts.get("splitbytes")).map(_.toLong)
      .getOrElse(WikiPageSource.DefaultSplitBytes)
    new WikiPageTable(path, split)
  }
}

object WikiPageSource {
  val schema: StructType = StructType(Seq(
    StructField("title", StringType, nullable = false),
    StructField("content", StringType, nullable = false)))
  val DefaultSplitBytes: Long = 64L * 1024 * 1024

  private[io] val StartTitle = "<title>".getBytes("UTF-8")
  private[io] val EndTitle = "</title>".getBytes("UTF-8")
  private[io] val StartText = "<text xml:space=\"preserve\">".getBytes("UTF-8")
  private[io] val EndText = "</text>".getBytes("UTF-8")

  /** Drain one byte range directly (no Spark) — the test/diagnostic
    * surface behind the ScalaCheck exactly-once property (a property
    * trial per Spark job would be seconds each; the reader itself is
    * plain IO). */
  private[graft] def readRange(path: String, start: Long, end: Long): Vector[(String, String)] = {
    val r = new WikiPageReader(path, start, end)
    try {
      val buf = Vector.newBuilder[(String, String)]
      while (r.next()) {
        val row = r.get()
        buf += ((row.getUTF8String(0).toString, row.getUTF8String(1).toString))
      }
      buf.result()
    } finally r.close()
  }

  /** Minimal XML entity unescape (named + decimal/hex numeric) — the
    * unescapeXml contract of the reference reader (:92-96). Unknown
    * entities pass through verbatim, as StringEscapeUtils does. */
  def unescapeXml(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val rep: String =
          if (semi > i && semi - i <= 10) {
            val ent = s.substring(i + 1, semi)
            ent match {
              case "lt" => "<"
              case "gt" => ">"
              case "amp" => "&"
              case "quot" => "\""
              case "apos" => "'"
              case e if e.length > 2 && (e.charAt(0) == '#') &&
                  (e.charAt(1) == 'x' || e.charAt(1) == 'X') =>
                try new String(Character.toChars(Integer.parseInt(e.substring(2), 16)))
                catch { case _: Exception => null }
              case e if e.length > 1 && e.charAt(0) == '#' =>
                try new String(Character.toChars(Integer.parseInt(e.substring(1))))
                catch { case _: Exception => null }
              case _ => null
            }
          } else null
        if (rep != null) { sb.append(rep); i = semi + 1 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}

private final class WikiPageTable(path: String, splitBytes: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft-wikidump($path)"
  override def schema(): StructType = WikiPageSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new WikiPageScan(path, splitBytes)
    }
}

/** One byte range of one file; records beginning inside it belong to it. */
private final case class PageRange(path: String, start: Long, end: Long)
  extends InputPartition

private final class WikiPageScan(path: String, splitBytes: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = WikiPageSource.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-wikidump $path (splitBytes=$splitBytes)"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val rootStatus = fs.getFileStatus(root)
    val files =
      if (rootStatus.isDirectory)
        fs.listStatus(root).filter(_.isFile).sortBy(_.getPath.getName).toSeq
      else Seq(rootStatus)
    val codecs = new org.apache.hadoop.io.compress.CompressionCodecFactory(conf)
    files.flatMap { st =>
      val p = st.getPath.toString
      val codec = codecs.getCodec(st.getPath)
      if (codec == null ||
          codec.isInstanceOf[org.apache.hadoop.io.compress.SplittableCompressionCodec]) {
        // plain files split on byte offsets; splittable-codec files
        // (bzip2) split on COMPRESSED offsets — each reader enters at
        // the first compression block at/after its start (BYBLOCK),
        // and ownership compares block starts to the range end
        val len = st.getLen
        val n = math.max(1L, (len + splitBytes - 1) / splitBytes)
        (0L until n).map(i =>
          PageRange(p, i * splitBytes, math.min((i + 1) * splitBytes, len)))
      } else {
        // non-splittable compression (gzip): one whole-stream range
        // (no mid-stream entry points); positions are DECOMPRESSED
        // offsets, end = ∞ claims every record
        Seq(PageRange(p, 0L, Long.MaxValue))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val r = p.asInstanceOf[PageRange]
        new WikiPageReader(r.path, r.start, r.end)
      }
    }
}

/**
 * Byte-range page reader: buffered single-pass scan with the same
 * single-char-restart marker automaton as the reference's
 * readUntilMatch (:129-155) — sufficient for '<'-led markers. Tracks
 * the absolute offset so the ownership test (marker first byte < range
 * end) is exact; the body read past the range end is unbounded-buffered
 * exactly like the reference's DataOutputBuffer.
 *
 * IO is Hadoop-FS (open + seek), so any FileSystem scheme works.
 * Compression routing: a SPLITTABLE codec range (bzip2) opens the
 * codec's BYBLOCK split stream at the first compression block
 * at/after `rangeStart`, and the ownership position is `getPos()` —
 * the COMPRESSED start offset of the block currently being delivered
 * (verified empirically: it flips exactly at block boundaries), so
 * "marker starts in a block before rangeEnd" is the exact
 * block-granular analog of the byte-ownership contract and adjacent
 * readers partition records exactly-once. Split-codec reads are
 * SINGLE-BYTE against the codec stream: a read-ahead buffer would
 * advance getPos() past a block boundary before the automaton
 * consumed the boundary bytes, and a boundary record could be lost by
 * this range without ever being seen by the next. A non-splittable
 * codec gets a single [0, ∞) range (positions count DECOMPRESSED
 * bytes — see planInputPartitions).
 */
private final class WikiPageReader(path: String, rangeStart: Long, rangeEnd: Long)
    extends PartitionReader[InternalRow] {
  import WikiPageSource._

  private var decompressor: org.apache.hadoop.io.compress.Decompressor = _
  private var splitIn: org.apache.hadoop.io.compress.SplitCompressionInputStream = _
  private val in: java.io.InputStream = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val raw = fs.open(p)
    val codec = new org.apache.hadoop.io.compress.CompressionCodecFactory(conf)
      .getCodec(p)
    codec match {
      case null =>
        raw.seek(rangeStart)
        new java.io.BufferedInputStream(raw, 1 << 16)
      case sc: org.apache.hadoop.io.compress.SplittableCompressionCodec
          if rangeEnd != Long.MaxValue =>
        decompressor = org.apache.hadoop.io.compress.CodecPool.getDecompressor(codec)
        // the codec end is the FILE end: a record whose marker starts
        // before rangeEnd may extend past it, and its owner must read
        // the body to completion (the unbounded-body contract of the
        // uncompressed path); rangeEnd is enforced by the ownership
        // test, not by truncating the stream
        splitIn = sc.createInputStream(raw, decompressor, rangeStart,
          fs.getFileStatus(p).getLen,
          org.apache.hadoop.io.compress.SplittableCompressionCodec.READ_MODE.BYBLOCK)
        splitIn
      case _ =>
        require(rangeStart == 0L,
          s"compressed input has no mid-stream entry points: range start $rangeStart")
        new java.io.BufferedInputStream(codec.createInputStream(raw), 1 << 16)
    }
  }
  private var pos: Long = rangeStart
  private var markerOwnPos: Long = -1L
  private var row: InternalRow = _

  /** The position the exactly-once ownership test compares to
    * `rangeEnd`: the absolute offset of the byte JUST CONSUMED for
    * plain/whole-stream reads, the current compression block's
    * compressed start offset for splittable-codec ranges. */
  private def ownPos: Long = if (splitIn != null) splitIn.getPos else pos - 1

  /** Scan to the end of `marker`; optionally capture bytes read
    * (marker excluded). Returns false at EOF. On success `pos` sits
    * just past the marker (marker start = pos - marker.length) and
    * `markerOwnPos` holds the ownership position of the marker's
    * FIRST byte (recorded when the match candidate began, so it is
    * exact even when the marker spans a compression-block boundary). */
  private def readUntilMatch(marker: Array[Byte],
      capture: java.io.ByteArrayOutputStream): Boolean = {
    var i = 0
    while (true) {
      val b = in.read()
      if (b == -1) return false
      pos += 1
      if (capture != null) capture.write(b)
      if (b == marker(i)) {
        if (i == 0) markerOwnPos = ownPos
        i += 1
        if (i >= marker.length) {
          if (capture != null) {
            val data = capture.toByteArray
            capture.reset()
            capture.write(data, 0, data.length - marker.length)
          }
          return true
        }
      } else {
        i = if (b == marker(0)) 1 else 0
        if (i == 1) markerOwnPos = ownPos
      }
    }
    false
  }

  override def next(): Boolean = {
    if (!readUntilMatch(StartTitle, null)) return false
    // ownership: the marker's first byte must lie inside this range
    // (byte offset for plain ranges, compression-block start offset
    // for splittable-codec ranges)
    if (markerOwnPos >= rangeEnd) return false
    val buf = new java.io.ByteArrayOutputStream(4096)
    if (!readUntilMatch(EndTitle, buf)) return false
    val title = new String(buf.toByteArray, "UTF-8")
    buf.reset()
    if (!readUntilMatch(StartText, null)) return false
    if (!readUntilMatch(EndText, buf)) return false
    val content = unescapeXml(new String(buf.toByteArray, "UTF-8"))
    row = new GenericInternalRow(Array[Any](
      UTF8String.fromString(title), UTF8String.fromString(content)))
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = {
    in.close()
    if (decompressor != null)
      org.apache.hadoop.io.compress.CodecPool.returnDecompressor(decompressor)
  }
}
