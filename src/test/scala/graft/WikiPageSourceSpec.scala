package graft

import graft.io.WikiPageSource
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * DSv2 splittable dump reader (S1 re-realization): exactly-once records
 * across arbitrary byte-range boundaries, XML unescape contract, and
 * genuine parallel fan-out from a single file.
 */
class WikiPageSourceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  /** Deterministic dump: variable-length pages so range boundaries land
    * in every structural position (mid-marker, mid-title, mid-body). */
  private def makeDump(n: Int): (String, Seq[(String, String)]) = {
    val rnd = new scala.util.Random(42)
    val pages = (0 until n).map { i =>
      val body = (0 until (1 + rnd.nextInt(40)))
        .map(j => s"w${(i * 31 + j * 7) % 97}").mkString(" ")
      // escaped entities in every 5th page exercise the unescape path
      val esc = if (i % 5 == 0) " a &lt;tag&gt; &amp; entity &#65;" else ""
      (s"Page $i", body + esc)
    }
    val sb = new StringBuilder("<mediawiki>\n")
    pages.foreach { case (t, c) =>
      sb.append("  <page>\n    <title>").append(t)
        .append("</title>\n    <id>9</id>\n    <text xml:space=\"preserve\">")
        .append(c).append("</text>\n  </page>\n")
    }
    sb.append("</mediawiki>\n")
    val f = java.io.File.createTempFile("graft-dump", ".xml")
    f.deleteOnExit()
    java.nio.file.Files.writeString(f.toPath, sb.toString)
    val want = pages.map { case (t, c) => (t, WikiPageSource.unescapeXml(c)) }
    (f.getPath, want)
  }

  test("splittable dump read: exactly-once records across many byte ranges") {
    val (path, want) = makeDump(2000)
    val df = spark.read.format(classOf[graft.io.WikiPageSource].getName)
      .option("splitBytes", 8192).load(path)
    assert(df.rdd.getNumPartitions > 10,
      s"single file must fan out: ${df.rdd.getNumPartitions} partitions")
    val got = df.as[(String, String)].collect()
    // exact multiset equality: no boundary dup, no boundary loss
    assert(got.length == want.size, s"got ${got.length} vs ${want.size}")
    assert(got.toSet == want.toSet)
  }

  test("gzip dump reads through the codec path with identical records") {
    // a .gz file gets ONE whole-stream range (no mid-stream entry
    // points) and must yield exactly the uncompressed multiset
    val (path, want) = makeDump(400)
    val gz = java.io.File.createTempFile("graft-dump", ".xml.gz")
    gz.deleteOnExit()
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(gz))
    try out.write(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    finally out.close()
    val df = spark.read.format(classOf[graft.io.WikiPageSource].getName)
      .option("splitBytes", 4096).load(gz.getPath)
    assert(df.rdd.getNumPartitions == 1, "compressed file must not split")
    val got = df.as[(String, String)].collect()
    assert(got.length == want.size && got.toSet == want.toSet)
  }

  test("splittable bzip2 dump: exactly-once records across compressed sub-ranges") {
    // bzip2 is a SplittableCompressionCodec: the planner fans the file
    // into COMPRESSED-offset sub-ranges and each reader enters at the
    // first compression block at/after its start (BYBLOCK). Ownership
    // is block-granular — a record belongs to the range owning the
    // block its marker starts in — so the multiset must be exact at
    // EVERY split size, including splits smaller than a compression
    // block (such ranges own no block and must yield zero records
    // rather than duplicates).
    val (path, want) = makeDump(30000)
    val bz = java.io.File.createTempFile("graft-dump", ".xml.bz2")
    bz.deleteOnExit()
    val codec = new org.apache.hadoop.io.compress.BZip2Codec()
    codec.setConf(new org.apache.hadoop.conf.Configuration())
    val out = codec.createOutputStream(new java.io.FileOutputStream(bz))
    try out.write(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    finally out.close()
    val clen = bz.length
    assert(clen > 40000, s"need a multi-block bz2 file, got $clen compressed bytes")
    def read(split: Long) = spark.read
      .format(classOf[graft.io.WikiPageSource].getName)
      .option("splitBytes", split).load(bz.getPath)
    for (split <- Seq(clen / 2 + 1, 50000L, 16384L, 7000L)) {
      val got = read(split).as[(String, String)].collect()
      assert(got.length == want.size,
        s"split=$split: ${got.length} records vs ${want.size} (dup or loss at a block boundary)")
      assert(got.toSet == want.toSet, s"split=$split content mismatch")
    }
    // the fan-out is genuine: one compressed file -> many partitions
    assert(read(16384L).rdd.getNumPartitions > 3,
      "compressed sub-ranges must parallelize the single file")
  }

  test("explicit Hadoop file: URI and a directory of files both read") {
    val (p1, w1) = makeDump(50)
    // via an explicit file: scheme (the Hadoop FS routing, not java.io)
    val viaUri = spark.read.format(classOf[graft.io.WikiPageSource].getName)
      .load("file:" + p1).as[(String, String)].collect().toSet
    assert(viaUri == w1.toSet)
    // a directory input lists its files through the FileSystem API
    val dir = java.nio.file.Files.createTempDirectory("graft-dumps")
    dir.toFile.deleteOnExit()
    val (p2, w2) = makeDump(60)
    java.nio.file.Files.copy(java.nio.file.Paths.get(p1), dir.resolve("a.xml"))
    java.nio.file.Files.copy(java.nio.file.Paths.get(p2), dir.resolve("b.xml"))
    val viaDir = spark.read.format(classOf[graft.io.WikiPageSource].getName)
      .option("splitBytes", 2048).load(dir.toString)
      .as[(String, String)].collect()
    assert(viaDir.length == w1.size + w2.size)
    assert(viaDir.toSet == (w1 ++ w2).toSet)
  }

  test("a caller-supplied schema that differs from the fixed one is rejected") {
    val (path, _) = makeDump(5)
    val ex = intercept[Exception] {
      spark.read.format(classOf[graft.io.WikiPageSource].getName)
        .schema("page string, body string").load(path).collect()
    }
    assert(ex.getMessage != null)
  }

  test("range split equals the single-range read (boundary invariance)") {
    val (path, _) = makeDump(300)
    val one = spark.read.format(classOf[graft.io.WikiPageSource].getName)
      .option("splitBytes", 1L << 40).load(path)
      .as[(String, String)].collect().toSet
    val many = spark.read.format(classOf[graft.io.WikiPageSource].getName)
      .option("splitBytes", 1024).load(path)
      .as[(String, String)].collect().toSet
    assert(one == many && one.size == 300)
  }

  test("raw dump -> reader -> full triple pipeline equals the table-input pipeline") {
    // the S1 user journey end-to-end: serialize a synthetic code corpus
    // as a dump (XML-escaped), read it back through the splittable
    // reader in many byte ranges, rebuild CodeFile rows, run the SAME
    // extraction pipeline — identical triples to the table path
    import graft.core.CodeFile
    import graft.fixtures.CorpusGen
    def esc(s: String) =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val files = CorpusGen.generate(256).map(_.file)
    val sb = new StringBuilder("<dump>")
    files.foreach { f =>
      sb.append("<page><title>")
        .append(esc(s"${f.repo}|${f.path}|${f.commit}|${f.lang}"))
        .append("</title><text xml:space=\"preserve\">")
        .append(esc(f.content)).append("</text></page>")
    }
    sb.append("</dump>")
    val dump = java.io.File.createTempFile("graft-e2e-dump", ".xml")
    dump.deleteOnExit()
    java.nio.file.Files.writeString(dump.toPath, sb.toString)
    val fromDump = spark.read.format(classOf[graft.io.WikiPageSource].getName)
      .option("splitBytes", 4096).load(dump.getPath)
      .as[(String, String)].map { case (t, c) =>
        val Array(repo, path, commit, lang) = t.split("\\|", 4)
        CodeFile(repo, path, commit, lang, c)
      }
    val viaDump = graft.pipeline.Triples
      .mentionTriples(fromDump, CorpusGen.dictionary)
      .as[(String, String)].collect().toSet
    val viaTable = graft.pipeline.Triples
      .mentionTriples(spark.createDataset(files), CorpusGen.dictionary)
      .as[(String, String)].collect().toSet
    assert(viaDump == viaTable && viaTable.nonEmpty)
  }

  test("unescapeXml: named, decimal, hex entities; unknown pass through") {
    assert(WikiPageSource.unescapeXml("a &lt;b&gt; &amp;&quot;&apos;") == "a <b> &\"'")
    assert(WikiPageSource.unescapeXml("&#65;&#x42;") == "AB")
    assert(WikiPageSource.unescapeXml("&unknown; &nosemi") == "&unknown; &nosemi")
    assert(WikiPageSource.unescapeXml("plain") == "plain")
  }
}
