package graft

import graft.core.Tables
import graft.pipeline._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Driver contract: one `queries` entry per implemented operator from
 * SURVEY.md §2 (+ the training-data ops), each with a DuckDB-equivalent
 * `oracleSql` over the same parquet tables.
 *
 * Naming convention: q0x relational core, q2x knowledge-graph pipeline
 * (the pignlproc re-realization over the `documents` corpus viewed as
 * `code_files`), q4x training-data ops (dedup / similarity / text /
 * multimodal).
 */
object SparkEntry {

  // ---- anchor dictionary (ner-corpus/dbpedia_to_opennlp_types.tsv analog,
  //      broadcast at every use: the replicated-join pattern J3) ----
  val dict: Seq[(String, String, String)] = Seq(
    ("spark", "Spark", "ENGINE"),
    ("hash", "Hash", "ALGO"),
    ("join", "Join", "OPERATOR"),
    ("merge", "Merge", "OPERATOR"),
    ("scan", "Scan", "ACCESS"),
    ("window", "Window", "OPERATOR"),
    ("stream", "Stream", "MODE"),
    ("vector", "Vector", "DATA"))
  val dictSurfaces: Seq[String] = dict.map(_._1)
  private val dictSqlValues =
    dict.map { case (s, e, t) => s"('$s','$e','$t')" }.mkString(", ")
  private val dictInList = dictSurfaces.map(s => s"'$s'").mkString(", ")

  private def dictDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    dict.toDF("surface", "entity", "etype")
  }

  private def isDictSurface(c: Column): Column =
    c.isin(dictSurfaces.map(s => s: Any): _*)

  /** Cache-scheme version, folded into the stage-cache key: bump
    * whenever the SIGNATURE FORMAT of any cached stage changes (hash
    * family, numHashes, shingle size, …) so a stale index can never be
    * silently reused against a new scheme (the same convention as
    * Bench.runHeavy10x's `graft-sf1-v1` tag). v2 = md5 one-pass
    * minhash, 16 hashes, 3-word shingles. */
  private val StageCacheVersion = "v2"

  /** Per-corpus stage cache for queries that search a PRE-BUILT
    * persistent index (the production shape: sign/build once per batch
    * via Checkpoints.runStage — Main's 07_sig_index discipline — then
    * every search costs only its own increment). Keyed by the corpus
    * path + parquet mtimes (so regenerated testdata self-invalidates)
    * + [[StageCacheVersion]] (so a signature-scheme change does too). */
  private[graft] def stageCacheDir(d: String): String = {
    val src = new java.io.File(s"$d/documents.parquet")
    val mtime =
      if (src.isDirectory)
        Option(src.listFiles()).map(_.map(_.lastModified).max).getOrElse(0L)
      else src.lastModified
    val key = graft.functions.TextFunctions.sha256Hex(
      s"$d|$mtime|$StageCacheVersion").take(12)
    s"/tmp/graft-stage-cache/$key"
  }

  private def stageCache(s: SparkSession, d: String): Checkpoints =
    new Checkpoints(s, stageCacheDir(d))

  /** q82's persistent corpus signature index (docs NOT in the "new
    * batch"), committed once per corpus — the cost a production
    * pipeline pays per ingest batch, not per search. Bench commits it
    * untimed before the sweep for the same reason. */
  private[graft] def q82SigIndex(s: SparkSession, d: String): DataFrame =
    stageCache(s, d).runStage("q82_sig_index") {
      Dedup.minhashSignaturesOnePass(
        Tables.documents(s, d).filter(col("doc_id") % 10 =!= 0))
    }

  /** Token array of the document text (single-space tokenized corpus). */
  private def toks: Column = split(col("text"), " ")

  /** Alias edge list derived deterministically from doc ids:
    * src = doc_id (every 10th doc), dst = (7*doc_id+3) mod N — a
    * functional redirect graph with chains and natural cycles. */
  private def aliasEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()
    docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("src"),
        ((col("doc_id") * 7 + 3) % n).as("dst"))
  }

  private val aliasEdgesSql =
    """edges AS (
      |  SELECT doc_id AS src, (doc_id*7+3) % (SELECT count(*) FROM documents) AS dst
      |  FROM documents WHERE doc_id % 10 = 0
      |)""".stripMargin

  /** Out-degree-2 synthetic graph over ALL doc ids — the shared edge
    * set of q107 (BFS), q108 (walks), q109 (HyperBall); the oracles
    * restate both formulas verbatim: i → ((i mod n)²+3) mod n (the id is
    * reduced BEFORE squaring so the product never wraps a long — Spark
    * wraps silently where the DuckDB oracle errors on BIGINT overflow) and
    * i → (7i+3) mod n. */
  private def degree2Edges(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()
    docs.select(col("doc_id").as("src"),
        (((col("doc_id") % n) * (col("doc_id") % n) + 3) % n).as("dst"))
      .unionByName(docs.select(col("doc_id").as("src"),
        ((col("doc_id") * 7 + 3) % n).as("dst")))
  }

  /** DuckDB oracle for q75: PageRank's fixed 5 iterations unrolled as
    * CTEs r1..r5 (a recursive CTE can't carry re-aggregated rank state
    * under UNION set semantics) — same teleport + dangling-mass math as
    * TopicGraph.pageRank, all literals forced DOUBLE so DuckDB's
    * DECIMAL literal arithmetic never diverges from Spark's IEEE. */
  private val pageRankOracleSql: String = {
    val d = "0.85::DOUBLE"
    val iters = 5
    val head =
      s"""WITH $aliasEdgesSql,
         |nodes AS (SELECT DISTINCT node FROM
         |  (SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges)),
         |outdeg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
         |r0 AS (SELECT node, 1.0/(SELECT n FROM nn) AS rank FROM nodes)""".stripMargin
    val steps = (1 to iters).map { i =>
      val p = s"r${i - 1}"
      s"""r$i AS (
         |  SELECT nd.node, (1 - $d)/(SELECT n FROM nn) + $d * (coalesce(s.in_sum, 0.0)
         |    + (SELECT coalesce(sum(p.rank), 0.0) FROM $p p
         |       LEFT JOIN outdeg o ON p.node = o.node WHERE o.node IS NULL)
         |      /(SELECT n FROM nn)) AS rank
         |  FROM nodes nd LEFT JOIN (
         |    SELECT e.dst AS node, sum(p.rank / o.deg) AS in_sum
         |    FROM edges e JOIN $p p ON e.src = p.node
         |    JOIN outdeg o ON o.node = e.src
         |    GROUP BY 1) s ON nd.node = s.node)""".stripMargin
    }
    (head +: steps).mkString(",\n") +
      s"\nSELECT node, round(rank, 8) AS rank_r8 FROM r$iters"
  }

  /** DuckDB oracle for q122: BM25 restated verbatim — per-term tf via
    * list_filter columns, the 1-row N/avgdl/df aggregate (avgdl as an
    * exact integer sum divided once), the Lucene idf and the
    * left-associated per-query contribution sum, ranking over the
    * ROUNDED score with doc_id tie-break (so a sub-ulp ln() divergence
    * between libms cannot flip ranks). */
  private val bm25OracleSql: String = {
    val qs = Seq(1 -> Seq("hash", "join"), 2 -> Seq("window", "scan", "table"),
      3 -> Seq("spark", "stream"))
    val terms = qs.flatMap(_._2).distinct.sorted
    val tfCols = terms.map(t =>
      s"len(list_filter(toks, x -> x = '$t')) AS tf_$t").mkString(",\n    ")
    val dfCols = terms.map(t =>
      s"sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END)::BIGINT AS df_$t")
      .mkString(",\n    ")
    def contrib(t: String): String =
      s"""ln(1.0::DOUBLE + ((SELECT n FROM st)::DOUBLE - (SELECT df_$t FROM st)::DOUBLE + 0.5::DOUBLE)
         |      / ((SELECT df_$t FROM st)::DOUBLE + 0.5::DOUBLE))
         |    * (tf_$t::DOUBLE * (1.2::DOUBLE + 1.0::DOUBLE))
         |    / (tf_$t::DOUBLE + 1.2::DOUBLE * ((1.0::DOUBLE - 0.75::DOUBLE)
         |        + 0.75::DOUBLE * dl::DOUBLE / (SELECT avgdl FROM st)))""".stripMargin
    val scoredSelects = qs.map { case (qid, qterms) =>
      s"SELECT $qid AS query_id, doc_id,\n  " +
        qterms.map(contrib).mkString("\n  + ") + " AS score\n FROM tf"
    }.mkString("\n UNION ALL\n")
    s"""WITH base AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |tf AS MATERIALIZED (
       |  SELECT doc_id, length(toks) AS dl,
       |    $tfCols
       |  FROM base),
       |st AS MATERIALIZED (
       |  SELECT count(*)::BIGINT AS n,
       |    sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl,
       |    $dfCols
       |  FROM tf),
       |scored AS ($scoredSelects)
       |SELECT query_id, doc_id, round(score, 6) AS score_r6, rank FROM (
       |  SELECT query_id, doc_id, score, row_number() OVER (PARTITION BY query_id
       |    ORDER BY round(score, 6) DESC, doc_id ASC) AS rank FROM scored)
       |WHERE rank <= 10""".stripMargin
  }

  /** DuckDB oracle for q117: HITS unrolled — 4 iterations of the
    * L1-normalized half-steps as CTEs (h_t from a_{t-1}, a_t from
    * h_t), the same IEEE expressions TopicGraph.hits uses; the
    * normalizing totals are 1-row scalar subqueries. Every step CTE is
    * MATERIALIZED — DuckDB inlines plain CTEs, and this 8-level chain
    * references each level ~3× (join + scalar total), which inlining
    * turns into a 3^8 evaluation blow-up. */
  private val hitsOracleSql: String = {
    val iters = 4
    val head =
      s"""WITH $aliasEdgesSql,
         |nodes AS MATERIALIZED (SELECT DISTINCT node FROM
         |  (SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges)),
         |a0 AS (SELECT node, 1.0::DOUBLE AS a FROM nodes)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""h${i}r AS MATERIALIZED (
         |  SELECT e.src AS node, sum(p.a) AS s
         |  FROM edges e JOIN a${i - 1} p ON e.dst = p.node GROUP BY 1),
         |h$i AS MATERIALIZED (
         |  SELECT nd.node, coalesce(r.s, 0.0) / (SELECT sum(s) FROM h${i}r) AS h
         |  FROM nodes nd LEFT JOIN h${i}r r ON nd.node = r.node),
         |a${i}r AS MATERIALIZED (
         |  SELECT e.dst AS node, sum(p.h) AS s
         |  FROM edges e JOIN h$i p ON e.src = p.node GROUP BY 1),
         |a$i AS MATERIALIZED (
         |  SELECT nd.node, coalesce(r.s, 0.0) / (SELECT sum(s) FROM a${i}r) AS a
         |  FROM nodes nd LEFT JOIN a${i}r r ON nd.node = r.node)""".stripMargin
    }
    (head +: steps).mkString(",\n") +
      s"""
         |SELECT h$iters.node, round(h$iters.h, 8) AS hub_r8,
         |  round(a$iters.a, 8) AS auth_r8
         |FROM h$iters JOIN a$iters ON h$iters.node = a$iters.node""".stripMargin
  }

  /** DuckDB oracle for q106: personalized PageRank unrolled like
    * [[pageRankOracleSql]], with the uniform teleport replaced by the
    * per-node seed mass m (1/|S| on the 3 lexicographically-smallest
    * nodes, 0 elsewhere) in BOTH the restart and the dangling term —
    * the same IEEE expressions TopicGraph.personalizedPageRank uses. */
  private val pprOracleSql: String = {
    val d = "0.85::DOUBLE"
    val iters = 5
    val head =
      s"""WITH $aliasEdgesSql,
         |nodes AS (SELECT DISTINCT node FROM
         |  (SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges)),
         |outdeg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1),
         |seeds AS (SELECT node FROM nodes ORDER BY node LIMIT 3),
         |ns AS (SELECT CAST(count(*) AS DOUBLE) AS s FROM seeds),
         |sm AS (SELECT n.node,
         |  CASE WHEN sd.node IS NULL THEN 0.0::DOUBLE
         |       ELSE 1.0::DOUBLE / (SELECT s FROM ns) END AS m
         |  FROM nodes n LEFT JOIN seeds sd ON n.node = sd.node),
         |r0 AS (SELECT node, m AS rank FROM sm)""".stripMargin
    val steps = (1 to iters).map { i =>
      val p = s"r${i - 1}"
      s"""r$i AS (
         |  SELECT sm.node, (1 - $d) * sm.m + $d * (coalesce(s.in_sum, 0.0)
         |    + (SELECT coalesce(sum(p.rank), 0.0) FROM $p p
         |       LEFT JOIN outdeg o ON p.node = o.node WHERE o.node IS NULL)
         |      * sm.m) AS rank
         |  FROM sm LEFT JOIN (
         |    SELECT e.dst AS node, sum(p.rank / o.deg) AS in_sum
         |    FROM edges e JOIN $p p ON e.src = p.node
         |    JOIN outdeg o ON o.node = e.src
         |    GROUP BY 1) s ON sm.node = s.node)""".stripMargin
    }
    (head +: steps).mkString(",\n") +
      s"\nSELECT node, round(rank, 8) AS ppr_r8 FROM r$iters"
  }

  /** DuckDB oracle for q110: the q109 register arithmetic with 6
    * unrolled propagation rounds, then per-round exact-integer
    * read-offs — reg_sum summed corpus-wide in HUGEINT and emitted as
    * a digit STRING (it exceeds BIGINT), the N(r) estimate as
    * Σ ⌊alpha·m²·2^55·10^4 / reg_sum⌋ (the HUGEINT literal is
    * [[graft.pipeline.Sketches.HllEstE4Num]]), fixpoint = consecutive
    * totals equal (reg_sum_total strictly decreases until closure),
    * ed_reached = 10·N(r) ≥ 9·N(horizon). */
  private val neighborhoodFnOracleSql: String = {
    val radius = 6
    val estNum = graft.pipeline.Sketches.HllEstE4Num
    val head =
      """WITH edges AS (
        | SELECT DISTINCT src, dst FROM (
        |  SELECT doc_id AS src,
        |   ((doc_id % (SELECT count(*) FROM documents)) * (doc_id % (SELECT count(*) FROM documents)) + 3) % (SELECT count(*) FROM documents) AS dst
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id,
        |   (doc_id*7 + 3) % (SELECT count(*) FROM documents)
        |  FROM documents)),
        |nodes AS (SELECT DISTINCT node FROM
        |  (SELECT src AS node FROM edges UNION SELECT dst FROM edges)),
        |h AS (SELECT node,
        |  ('0x' || substring(md5(CAST(node AS VARCHAR)), 1, 15))::BIGINT AS h
        | FROM nodes),
        |b0 AS (SELECT node, h % 64 AS bucket,
        |  CASE WHEN (h >> 6) = 0 THEN 55
        |       ELSE 55 - length(bin(h >> 6)) END AS rho FROM h)""".stripMargin
    val rounds = (1 to radius).map { k =>
      s"""b$k AS (SELECT node, bucket, max(rho) AS rho FROM (
         |  SELECT node, bucket, rho FROM b${k - 1}
         |  UNION ALL
         |  SELECT e.src AS node, r.bucket, r.rho
         |  FROM edges e JOIN b${k - 1} r ON r.node = e.dst) GROUP BY 1, 2)""".stripMargin
    }
    val reads = (0 to radius).map { k =>
      s"""r$k AS (
         | SELECT $k AS r, count(*) AS n_nodes,
         |  CAST(CAST(sum(CAST(reg_sum AS HUGEINT)) AS HUGEINT) AS VARCHAR)
         |    AS reg_sum_total,
         |  CAST(sum('$estNum'::HUGEINT // CAST(reg_sum AS HUGEINT)) AS BIGINT)
         |    AS n_sum_est_e4
         | FROM (
         |  SELECT node, CAST(sum(1::BIGINT << (55 - rho))
         |    + (64 - count(*)) * (1::BIGINT << 55) AS BIGINT) AS reg_sum
         |  FROM b$k GROUP BY 1))""".stripMargin
    }
    val unions = (0 to radius).map(k => s"SELECT * FROM r$k").mkString(" UNION ALL ")
    (Seq(head) ++ rounds ++ reads).mkString(",\n") +
      s""",\ntbl AS ($unions)
         |SELECT r, n_nodes, reg_sum_total, n_sum_est_e4,
         | COALESCE(reg_sum_total = lag(reg_sum_total) OVER (ORDER BY r), false)
         |   AS is_fixpoint,
         | n_sum_est_e4 * 10 >= (max(n_sum_est_e4) OVER ()) * 9 AS ed_reached
         |FROM tbl""".stripMargin
  }

  /** DuckDB oracle for q112: the q110 register rounds read off as
    * per-node 1e4-scaled ball estimates, combined with the rearranged
    * telescoping weights w_0 = −L, w_r = L/r − L/(r+1), w_R = L/R
    * (L = lcm(1..R) = 12 at R = 4) — h_scaled is exact integer
    * arithmetic end to end, matching TopicGraph.harmonicCentrality. */
  private val harmonicCentralityOracleSql: String = {
    val radius = 4
    val bigL = 12L
    def weight(r: Int): Long =
      if (r == 0) -bigL
      else if (r == radius) bigL / radius
      else bigL / r - bigL / (r + 1)
    val estNum = graft.pipeline.Sketches.HllEstE4Num
    val head =
      """WITH edges AS (
        | SELECT DISTINCT src, dst FROM (
        |  SELECT doc_id AS src,
        |   ((doc_id % (SELECT count(*) FROM documents)) * (doc_id % (SELECT count(*) FROM documents)) + 3) % (SELECT count(*) FROM documents) AS dst
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id,
        |   (doc_id*7 + 3) % (SELECT count(*) FROM documents)
        |  FROM documents)),
        |nodes AS (SELECT DISTINCT node FROM
        |  (SELECT src AS node FROM edges UNION SELECT dst FROM edges)),
        |h AS (SELECT node,
        |  ('0x' || substring(md5(CAST(node AS VARCHAR)), 1, 15))::BIGINT AS h
        | FROM nodes),
        |b0 AS (SELECT node, h % 64 AS bucket,
        |  CASE WHEN (h >> 6) = 0 THEN 55
        |       ELSE 55 - length(bin(h >> 6)) END AS rho FROM h)""".stripMargin
    val rounds = (1 to radius).map { k =>
      s"""b$k AS (SELECT node, bucket, max(rho) AS rho FROM (
         |  SELECT node, bucket, rho FROM b${k - 1}
         |  UNION ALL
         |  SELECT e.src AS node, r.bucket, r.rho
         |  FROM edges e JOIN b${k - 1} r ON r.node = e.dst) GROUP BY 1, 2)""".stripMargin
    }
    val ests = (0 to radius).map { k =>
      s"""e$k AS (
         | SELECT node, CAST('$estNum'::HUGEINT // CAST(sum(1::BIGINT << (55 - rho))
         |   + (64 - count(*)) * (1::BIGINT << 55) AS HUGEINT) AS BIGINT) AS est
         | FROM b$k GROUP BY 1)""".stripMargin
    }
    val hExpr = (0 to radius)
      .map(k => s"(${weight(k)}) * e$k.est").mkString(" + ")
    val joins = (1 to radius).map(k => s"JOIN e$k USING (node)").mkString(" ")
    (Seq(head) ++ rounds ++ ests).mkString(",\n") +
      s"""\nSELECT node, CAST($hExpr AS BIGINT) AS h_scaled,
         | round(CAST($hExpr AS DOUBLE) / ${1e4 * bigL}, 6) AS h_harmonic
         |FROM e0 $joins
         |ORDER BY h_scaled DESC, node LIMIT 100""".stripMargin
  }

  /** q114's fixed merge table: rank-3 consumes rank-1's and rank-2's
    * outputs — exercises hierarchical subword construction. */
  private val Q114Merges: Seq[(String, String)] =
    Seq(("e", "</w>"), ("t", "h"), ("th", "e</w>"), ("a", "n"))

  /** SQL for one simultaneous BPE merge on a DOUBLE-SPACE-encoded
    * token string expression (Tokenizer scaladoc: the encoding makes
    * plain left-to-right replace exactly the simultaneous merge). */
  private def bpeMergeSql(enc: String, l: String, r: String): String =
    s"replace($enc, ' $l  $r ', ' $l$r ')"

  /** encode / decode between single- and double-space token strings. */
  private def bpeEncSql(toks: String) = s"('  ' || replace($toks, ' ', '  ') || '  ')"
  private def bpeDecSql(enc: String) = s"trim(replace($enc, '  ', ' '))"

  /** DuckDB oracle for q113: 4 unrolled Sennrich rounds over the
    * word-frequency vocab — pair counts via lateral range unnest,
    * argmax with the (cnt DESC, l, r) tie-break, merge applied through
    * the same double-space replace the engine uses. */
  private val bpeMergesOracleSql: String = {
    val k = 4
    val head =
      """WITH words AS (
        | SELECT w AS word, count(*) AS freq
        | FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        | WHERE w <> '' GROUP BY 1),
        |v0 AS (SELECT freq,
        |  array_to_string(string_split(word, ''), ' ') || ' </w>' AS toks
        | FROM words)""".stripMargin
    val rounds = (1 to k).map { i =>
      val merged = bpeMergeSql(bpeEncSql("toks"),
        s"' || (SELECT l FROM m$i) || '", s"' || (SELECT r FROM m$i) || '")
      s"""p$i AS (
         | SELECT s.t[u.i] AS l, s.t[u.i + 1] AS r, sum(s.freq) AS cnt
         | FROM (SELECT freq, string_split(toks, ' ') AS t FROM v${i - 1}) s,
         |      unnest(range(1, len(s.t))) AS u(i)
         | GROUP BY 1, 2),
         |m$i AS (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1),
         |v$i AS (SELECT freq, ${bpeDecSql(merged)} AS toks FROM v${i - 1})""".stripMargin
    }
    val out = (1 to k).map(i =>
      s"""SELECT CAST($i AS INT) AS rank, l AS "left", r AS "right",
         | CAST(cnt AS BIGINT) AS pair_count FROM m$i""".stripMargin)
      .mkString("\nUNION ALL\n")
    (Seq(head) ++ rounds).mkString(",\n") + "\n" + out
  }

  /** DuckDB oracle for q133: the q113 rounds over the BYTE-LEVEL
    * initial vocabulary — every word decomposes to UTF-8 bytes mapped
    * through the literal 256-entry GPT-2 bytes_to_unicode table
    * (restated verbatim as a list literal), so no `<unk>` exists for
    * any input; the merge rounds are byte-identical to q113's. */
  private val bpeBytesOracleSql: String = {
    val k = 4
    def qc(sym: String) = "'" + sym.replace("'", "''") + "'"
    val alphList =
      "[" + graft.pipeline.Tokenizer.ByteToChar.map(qc).mkString(", ") + "]"
    val symsExpr =
      s"""array_to_string(list_transform(
         |   generate_series(1, length(hex(encode(word))) // 2),
         |   i -> $alphList[(('0x' || substring(hex(encode(word)), 2*i - 1, 2))::INT) + 1]), ' ')""".stripMargin
    val head =
      s"""WITH words AS (
         | SELECT w AS word, count(*) AS freq
         | FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         | WHERE w <> '' GROUP BY 1),
         |v0 AS MATERIALIZED (
         | SELECT freq, $symsExpr || ' </w>' AS toks FROM words)""".stripMargin
    val rounds = (1 to k).map { i =>
      val merged = bpeMergeSql(bpeEncSql("toks"),
        s"' || (SELECT l FROM m$i) || '", s"' || (SELECT r FROM m$i) || '")
      s"""p$i AS (
         | SELECT s.t[u.i] AS l, s.t[u.i + 1] AS r, sum(s.freq) AS cnt
         | FROM (SELECT freq, string_split(toks, ' ') AS t FROM v${i - 1}) s,
         |      unnest(range(1, len(s.t))) AS u(i)
         | GROUP BY 1, 2),
         |m$i AS (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1),
         |v$i AS (SELECT freq, ${bpeDecSql(merged)} AS toks FROM v${i - 1})""".stripMargin
    }
    val out = (1 to k).map(i =>
      s"""SELECT CAST($i AS INT) AS rank, l AS "left", r AS "right",
         | CAST(cnt AS BIGINT) AS pair_count FROM m$i""".stripMargin)
      .mkString("\nUNION ALL\n")
    (Seq(head) ++ rounds).mkString(",\n") + "\n" + out
  }

  /** DuckDB oracle for q114: char-split + marker per word, the fixed
    * merge chain as nested replaces, subword histogram. */
  private val bpeTokensOracleSql: String = {
    val chain = Q114Merges.foldLeft(bpeEncSql("toks")) {
      case (e, (l, r)) => bpeMergeSql(e, l, r)
    }
    s"""WITH base AS (
       | SELECT array_to_string(list_transform(
       |   list_filter(string_split(text, ' '), w -> w <> ''),
       |   w -> array_to_string(string_split(w, ''), ' ') || ' </w>'), ' ')
       |  AS toks
       | FROM documents),
       |m AS (SELECT ${bpeDecSql(chain)} AS toks FROM base)
       |SELECT t AS token, count(*) AS cnt
       |FROM (SELECT unnest(string_split(toks, ' ')) AS t FROM m)
       |WHERE t <> '' GROUP BY 1""".stripMargin
  }

  /** DuckDB oracle for q116: Gonzalez greedy k-center unrolled — seed
    * = min vec_id, each round the argmax of the running min cosine
    * distance (vec_id tie-break), the exact engine arithmetic
    * (1 − dot/(‖a‖·‖b‖), zero-norm at distance 1). */
  private val kCenterOracleSql: String = {
    val k = 6
    // dist restated EXPLICITLY as dot/(sqrt(na)*sqrt(nb)) — the same
    // expression shape the engine evaluates (vec_dot / vec_norm) —
    // rather than list_cosine_similarity's internal arithmetic; the
    // argmax ranks on round(d, 6) with vec_id tie-break, mirroring
    // the engine's rounded-then-ranked selection
    def distSql(v: String, c: String): String =
      s"""CASE WHEN $v.nn * (SELECT nn FROM $c) = 0 THEN 1.0
         |   ELSE 1.0 - list_dot_product($v.embedding::DOUBLE[],
         |     (SELECT embedding FROM $c)::DOUBLE[])
         |     / ($v.nn * (SELECT nn FROM $c)) END""".stripMargin
    // every CTE is MATERIALIZED: each dN is referenced by both cN and
    // dN+1, so inlining re-evaluates the whole chain per reference —
    // exponential in k (measured 12+ min at 500 vectors; materialized:
    // sub-second)
    val head =
      """WITH e AS MATERIALIZED (
        | SELECT vec_id, embedding,
        |  sqrt(list_sum(list_transform(embedding::DOUBLE[], v -> v*v))) AS nn
        | FROM embeddings),
        |c1 AS MATERIALIZED (
        | SELECT vec_id, embedding, nn FROM e ORDER BY vec_id LIMIT 1),
        |d1 AS MATERIALIZED (
        | SELECT v.vec_id, v.embedding, v.nn, """.stripMargin +
        distSql("v", "c1") +
        " AS d\n FROM e v WHERE v.vec_id <> (SELECT vec_id FROM c1))"
    val rounds = (2 to k).map { i =>
      val upd =
        if (i == k) ""
        else s""",
           |d$i AS MATERIALIZED (
           | SELECT v.vec_id, v.embedding, v.nn,
           |  least(v.d, ${distSql("v", s"c$i")}) AS d
           | FROM d${i - 1} v
           | WHERE v.vec_id <> (SELECT vec_id FROM c$i))""".stripMargin
      s"""c$i AS MATERIALIZED (SELECT vec_id, embedding, nn, d FROM d${i - 1}
         | ORDER BY round(d, 6) DESC, vec_id LIMIT 1)""".stripMargin + upd
    }
    val out = (s"""SELECT CAST(1 AS INT) AS sel_rank,
       | (SELECT vec_id FROM c1) AS vec_id, 0.0 AS radius_r6""".stripMargin +:
      (2 to k).map(i =>
        s"SELECT CAST($i AS INT), vec_id, round(d, 6) + 0.0 FROM c$i"))
      .mkString("\nUNION ALL\n")
    (Seq(head) ++ rounds).mkString(",\n") + "\n" + out
  }

  /** DuckDB oracle for q108: the seeded-hash walk unrolled step by
    * step — at step t the walk picks the out-neighbor minimizing
    * ('0x'||md5("w:start:t:dst")[1..15])::BIGINT (dst tie-break), the
    * exact TopicGraph.randomWalks score arithmetic. */
  /** DuckDB oracle for q132: SGNS training REPLAYED bit-for-bit — the
    * 3-step seeded walk (q108 arithmetic), window-2 pair extraction,
    * md5-rank negatives, seeded fp6 init, and TWO full-batch epochs of
    * hard-sigmoid gradients unrolled as CTEs. Everything is exact
    * integer arithmetic: HUGEINT sums, floor divisions via the pmod
    * identity (numerator made divisible, so `//` semantics are moot),
    * ±2e6 clamps — no float appears anywhere. */
  private val sgnsOracleSql: String = {
    val steps = 3
    val epochs = 2
    // fd(a, b) = floor(a / b) in exact integer arithmetic
    def fd(a: String, b: String): String =
      s"((($a) - (((($a) % ($b)) + ($b)) % ($b))) // ($b))"
    val head =
      """WITH edges AS MATERIALIZED (
        | SELECT DISTINCT src, dst FROM (
        |  SELECT doc_id AS src,
        |   ((doc_id % (SELECT count(*) FROM documents)) * (doc_id % (SELECT count(*) FROM documents)) + 3) % (SELECT count(*) FROM documents) AS dst
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id,
        |   (doc_id*7 + 3) % (SELECT count(*) FROM documents)
        |  FROM documents)),
        |w0 AS (SELECT DISTINCT src AS start, src AS node FROM edges)""".stripMargin
    val walks = (1 to steps).map { t =>
      s"""w$t AS MATERIALIZED (SELECT start, node FROM (
         |  SELECT w.start, e.dst AS node,
         |   row_number() OVER (PARTITION BY w.start ORDER BY
         |    ('0x' || substring(md5('w:' || w.start || ':$t:' || e.dst), 1, 15))::BIGINT ASC,
         |    e.dst ASC) AS rk
         |  FROM w${t - 1} w JOIN edges e ON w.node = e.src) WHERE rk = 1)""".stripMargin
    }
    val ws = "ws AS MATERIALIZED (\n" + (0 to steps).map(t =>
      s" SELECT start, $t AS step, node FROM w$t").mkString("\n UNION ALL") +
      ")"
    val prep =
      s"""vocab AS MATERIALIZED (
         | SELECT node, row_number() OVER (ORDER BY node) AS rn
         | FROM (SELECT DISTINCT node FROM ws)),
         |nv AS MATERIALIZED (SELECT count(*)::BIGINT AS n FROM vocab),
         |pos AS MATERIALIZED (
         | SELECT a.node AS c, b.node AS x, count(*)::BIGINT AS m
         | FROM ws a JOIN ws b ON a.start = b.start AND a.step <> b.step
         |  AND abs(a.step - b.step) <= 2 AND a.node <> b.node
         | GROUP BY 1, 2),
         |negs AS MATERIALIZED (
         | SELECT p.c, v.node AS x, p.m
         | FROM pos p
         | CROSS JOIN (SELECT unnest(generate_series(1, 2)) AS j) js
         | JOIN vocab v ON v.rn =
         |  ('0x' || substring(md5('sgns:neg:' || p.c || ':' || p.x || ':' || js.j), 1, 15))::BIGINT % (SELECT n FROM nv) + 1),
         |tri AS MATERIALIZED (
         | SELECT c, x, label, sum(m)::BIGINT AS m FROM (
         |  SELECT c, x, 1000000::BIGINT AS label, m FROM pos
         |  UNION ALL SELECT c, x, 0::BIGINT AS label, m FROM negs)
         | GROUP BY 1, 2, 3),
         |dims AS (SELECT unnest(generate_series(0, 3)) AS k),
         |e0i AS MATERIALIZED (
         | SELECT v.node, d.k,
         |  (('0x' || substring(md5('sgns:init:i:' || v.node || ':' || d.k), 1, 15))::BIGINT % 200001 - 100000)::BIGINT AS v
         | FROM vocab v CROSS JOIN dims d),
         |e0o AS MATERIALIZED (
         | SELECT v.node, d.k,
         |  (('0x' || substring(md5('sgns:init:o:' || v.node || ':' || d.k), 1, 15))::BIGINT % 200001 - 100000)::BIGINT AS v
         | FROM vocab v CROSS JOIN dims d)""".stripMargin
    val hs = fd(fd("t.dot12", "1000000"), "4") + " + 500000"
    val delta = fd("g.s * 1", "20000000")
    val epochCtes = (1 to epochs).map { t =>
      val p = t - 1
      s"""d$t AS MATERIALIZED (
         | SELECT t.c, t.x, t.label, t.m, sum(i.v * o.v) AS dot12
         | FROM tri t
         | JOIN e${p}i i ON i.node = t.c
         | JOIN e${p}o o ON o.node = t.x AND o.k = i.k
         | GROUP BY 1, 2, 3, 4),
         |g$t AS MATERIALIZED (
         | SELECT t.c, t.x,
         |  t.m * (t.label - least(1000000, greatest(0, $hs))) AS gm
         | FROM d$t t),
         |gi$t AS MATERIALIZED (
         | SELECT g.c AS node, o.k, sum(g.gm * o.v) AS s
         | FROM g$t g JOIN e${p}o o ON o.node = g.x GROUP BY 1, 2),
         |go$t AS MATERIALIZED (
         | SELECT g.x AS node, i.k, sum(g.gm * i.v) AS s
         | FROM g$t g JOIN e${p}i i ON i.node = g.c GROUP BY 1, 2),
         |e${t}i AS MATERIALIZED (
         | SELECT e.node, e.k,
         |  least(2000000, greatest(-2000000,
         |   e.v + coalesce($delta, 0)))::BIGINT AS v
         | FROM e${p}i e LEFT JOIN gi$t g ON g.node = e.node AND g.k = e.k),
         |e${t}o AS MATERIALIZED (
         | SELECT e.node, e.k,
         |  least(2000000, greatest(-2000000,
         |   e.v + coalesce($delta, 0)))::BIGINT AS v
         | FROM e${p}o e LEFT JOIN go$t g ON g.node = e.node AND g.k = e.k)"""
        .stripMargin
    }
    (Seq(head) ++ walks ++ Seq(ws, prep) ++ epochCtes).mkString(",\n") +
      s"\nSELECT node, k::BIGINT AS k, v AS v_fp FROM e${epochs}i"
  }

  private val randomWalksOracleSql: String = {
    val steps = 5
    val head =
      """WITH edges AS (
        | SELECT DISTINCT src, dst FROM (
        |  SELECT doc_id AS src,
        |   ((doc_id % (SELECT count(*) FROM documents)) * (doc_id % (SELECT count(*) FROM documents)) + 3) % (SELECT count(*) FROM documents) AS dst
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id,
        |   (doc_id*7 + 3) % (SELECT count(*) FROM documents)
        |  FROM documents)),
        |w0 AS (SELECT DISTINCT src AS start, src AS node FROM edges)""".stripMargin
    val walks = (1 to steps).map { t =>
      s"""w$t AS (SELECT start, node FROM (
         |  SELECT w.start, e.dst AS node,
         |   row_number() OVER (PARTITION BY w.start ORDER BY
         |    ('0x' || substring(md5('w:' || w.start || ':$t:' || e.dst), 1, 15))::BIGINT ASC,
         |    e.dst ASC) AS rk
         |  FROM w${t - 1} w JOIN edges e ON w.node = e.src) WHERE rk = 1)""".stripMargin
    }
    val unions = (0 to steps).map(t =>
      s"SELECT start, $t AS step, node FROM w$t").mkString("\nUNION ALL ")
    (head +: walks).mkString(",\n") + "\n" + unions
  }

  /** DuckDB oracle for q126: the node2vec walk unrolled — step 1
    * unbiased (q108 arithmetic, seed n2v), steps ≥ 2 minimize
    * key · class with the EXACT integer class weights (return = 4,
    * triangle = 1, else 2); triangle membership via a LEFT JOIN of
    * (prev, dst) against the edge set. */
  private val node2vecOracleSql: String = {
    val steps = 5
    val head =
      """WITH edges AS (
        | SELECT DISTINCT src, dst FROM (
        |  SELECT doc_id AS src,
        |   ((doc_id % (SELECT count(*) FROM documents)) * (doc_id % (SELECT count(*) FROM documents)) + 3) % (SELECT count(*) FROM documents) AS dst
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id,
        |   (doc_id*7 + 3) % (SELECT count(*) FROM documents)
        |  FROM documents)),
        |w0 AS (SELECT DISTINCT src AS start, src AS node FROM edges),
        |w1 AS (SELECT start, prev, node FROM (
        |  SELECT w.start, w.node AS prev, e.dst AS node,
        |   row_number() OVER (PARTITION BY w.start ORDER BY
        |    ('0x' || substring(md5('n2v:' || w.start || ':1:' || e.dst), 1, 15))::BIGINT ASC,
        |    e.dst ASC) AS rk
        |  FROM w0 w JOIN edges e ON w.node = e.src) WHERE rk = 1)""".stripMargin
    val walks = (2 to steps).map { t =>
      s"""w$t AS (SELECT start, prev, node FROM (
         |  SELECT w.start, w.node AS prev, e.dst AS node,
         |   row_number() OVER (PARTITION BY w.start ORDER BY
         |    ('0x' || substring(md5('n2v:' || w.start || ':$t:' || e.dst), 1, 15))::BIGINT
         |     * (CASE WHEN e.dst = w.prev THEN 4
         |        WHEN tri.src IS NOT NULL THEN 1 ELSE 2 END) ASC,
         |    e.dst ASC) AS rk
         |  FROM w${t - 1} w JOIN edges e ON w.node = e.src
         |  LEFT JOIN edges tri ON tri.src = w.prev AND tri.dst = e.dst)
         | WHERE rk = 1)""".stripMargin
    }
    val unions = (s"SELECT start, 0 AS step, node FROM w0" +:
      (1 to steps).map(t => s"SELECT start, $t AS step, node FROM w$t"))
      .mkString("\nUNION ALL ")
    (Seq(head) ++ walks).mkString(",\n") + "\n" + unions
  }

  /** Shared sentence-window regroup + annotate chain (the q35/q68
    * family — ner-corpus/03's group+merge over this corpus's 10-token
    * window convention): posexplode -> window grouping ->
    * order-restoring struct sort -> per-token annotate -> re-join. */
  private def annotatedSentences(docs: DataFrame, annotate: Column => Column,
      extraAggs: Seq[Column] = Seq.empty): DataFrame =
    docs.select(col("doc_id"), posexplode(toks).as(Seq("pos", "token")))
      .groupBy(col("doc_id"), (col("pos") / 10).cast("int").as("sentence_order"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("token")))),
          x => annotate(x.getField("token"))), " ").as("annotated"),
        extraAggs: _*)

  /** Shared simhash oracle fragments (single source of truth for the
    * q50/q64/q70 family — layout must match Dedup.simhash64 +
    * simhashBandKeys): per-doc 60-bit simhash CTE chain, the 4x15-bit
    * band-match condition, and the verified near-dup edge CTE. */
  private val simhashShCte =
    """h AS (
      | SELECT doc_id, ('0x' || substring(md5(w.word), 1, 15))::BIGINT AS h
      | FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) w
      | WHERE w.word <> ''),
      |bits AS (
      | SELECT doc_id, b, sum(((h >> b) & 1)::INT) AS cnt, count(*) AS total
      | FROM h, range(0, 60) r(b) GROUP BY 1, 2),
      |sh AS (
      | SELECT doc_id,
      |  CAST(sum(CASE WHEN 2*cnt > total THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS sh
      | FROM bits GROUP BY doc_id)""".stripMargin

  private val simhashBandMatch =
    """((a.sh & 32767) = (b.sh & 32767)
      |   OR ((a.sh >> 15) & 32767) = ((b.sh >> 15) & 32767)
      |   OR ((a.sh >> 30) & 32767) = ((b.sh >> 30) & 32767)
      |   OR ((a.sh >> 45) & 32767) = ((b.sh >> 45) & 32767))""".stripMargin

  private def simhashEdgeCte(maxHamming: Int): String =
    s"""e AS (
       | SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
       | FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |  AND $simhashBandMatch
       | WHERE bit_count(xor(a.sh, b.sh)) <= $maxHamming)""".stripMargin

  /** Unrolled k-core peel: `levels` rounds of (degree, keep >= k,
    * restrict) CTEs over the symmetrized `e`. A level past the
    * fixpoint is the identity, so `levels` only needs to be >= the
    * true peel-round count (engine runs to the fixpoint; 12 covers
    * the observed <= 7 at both verify scales with margin). */
  private def kCorePeelCtes(k: Int, levels: Int): String = {
    val sym = """sym AS (SELECT src, dst FROM e
                |  UNION SELECT dst AS src, src AS dst FROM e),
                |e0 AS (SELECT src, dst FROM sym)""".stripMargin
    // each e(i) is referenced twice (d(i+1) and e(i+1)) — MATERIALIZED
    // stops DuckDB inlining the chain into 2^levels base-scan copies
    val peels = (1 to levels).map { i =>
      s"""d$i AS (SELECT src, count(*) AS c FROM e${i - 1} GROUP BY 1),
         |k$i AS (SELECT src AS n FROM d$i WHERE c >= $k),
         |e$i AS MATERIALIZED (SELECT e.src, e.dst FROM e${i - 1} e
         |  JOIN k$i a ON e.src = a.n JOIN k$i b ON e.dst = b.n)""".stripMargin
    }
    (sym +: peels).mkString(",\n")
  }

  /** Unrolled synchronous label propagation: `iters` rounds of
    * (neighbor-label count, top-1 by count DESC / label ASC) CTEs —
    * the window order restates TopicGraph.labelPropagation's
    * deterministic tiebreak verbatim. */
  private def lpaCtes(iters: Int): String = {
    val sym = """sym AS (SELECT src, dst FROM e
                |  UNION SELECT dst AS src, src AS dst FROM e),
                |lab0 AS (SELECT DISTINCT src AS node, src AS community FROM sym)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""nl$i AS (SELECT s.src AS node, l.community, count(*) AS c
         |  FROM sym s JOIN lab${i - 1} l ON l.node = s.dst GROUP BY 1, 2),
         |lab$i AS (SELECT node, community FROM (
         |  SELECT node, community,
         |   row_number() OVER (PARTITION BY node ORDER BY c DESC, community ASC) AS rn
         |  FROM nl$i) WHERE rn = 1)""".stripMargin
    }
    (sym +: rounds).mkString(",\n")
  }

  /** Rademacher hyperplane-list CTE fragment: r(h, d) for hyperplane
    * h = `hExpr` over 64 dims — restates the seeded
    * multiply–xorshift–multiply family of RandProjBitsExpr /
    * Similarity.ProjSeed verbatim (exact int64 arithmetic, no
    * wraparound, so any engine reproduces it bit-for-bit). */
  private def rademacherListSql(hExpr: String): String =
    s"""list_transform(
       |   list_transform(range(0, 64),
       |     d -> ((${Similarity.ProjSeed} + ($hExpr)*4096 + d) * 2654435761) % 2147483648),
       |   x -> CASE WHEN ((((xor(x, x >> 15)) * 1103515245 + 12345)
       |       % 2147483648) >> 16) & 1 = 1
       |     THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END)""".stripMargin

  /** Seeded projection sign bit of one (vector, hyperplane) pair:
    * '1' iff Σ_d r(h,d)·emb[d] ≥ 0 — products in dim order, list_sum's
    * left-to-right double accumulation matching the engine's codegen
    * loop (the FloatDotExpr discipline, bit-identical). */
  private val projBitSql: String =
    """CASE WHEN list_sum(list_transform(range(1, len(e.embedding)+1),
      |     i -> h.r[i] * e.embedding[i]::DOUBLE)) >= 0
      | THEN '1' ELSE '0' END""".stripMargin

  /** Shared q44/q53 oracle CTE: multi-band seeded random-projection
    * LSH buckets — bits auto-derived from the corpus (restates
    * Similarity.signLshAutoBits, ceil(log2(n/8)) clamped [4,16]); band
    * b's key is the sign pattern of seeded hyperplanes
    * [b*bits, (b+1)*bits) (Similarity.signBandKeys over
    * RandProjBitsExpr). */
  private val signLshBkCte: String =
    s"""p AS (
      | SELECT greatest(4, least(16,
      |   CAST(ceil(ln(greatest(count(*), 1) / 8.0) / ln(2) - 1e-9) AS INT))) AS bits
      | FROM embeddings),
      |hp AS (
      | SELECT b, j, ${rademacherListSql("b*p.bits + j")} AS r
      | FROM range(0, 4) t(b), range(0, 16) u(j), p
      | WHERE u.j < p.bits),
      |bk AS (
      | SELECT e.vec_id,
      |  h.b || '|' || string_agg($projBitSql, '' ORDER BY h.j) AS bucket
      | FROM embeddings e, hp h
      | GROUP BY e.vec_id, h.b)""".stripMargin

  /** q93's hot-cell re-split chain (restates Similarity.SplitBits=4 /
    * SplitMaxDepth=3 / SplitFirstPlane=2048 verbatim): `hs` holds the
    * fresh split hyperplanes (index 2048 + lvl·4 + j), `sb` the 4-bit
    * split keys per (vector, level), and cells0→cells3 apply the
    * conditional extension — a cell is extended with '#'+bits iff its
    * CURRENT population exceeds the cap, exactly the engine's
    * per-level broadcast-join rule. */
  private def semDedupSplitCtes(cap: Int): String = {
    val levels = (0 until 3).map { l =>
      s"""cnt$l AS (SELECT cell, count(*) AS n FROM cells$l GROUP BY 1),
         |cells${l + 1} AS (
         | SELECT c.vec_id,
         |  CASE WHEN t.n > $cap THEN c.cell || '#' || s.sbits ELSE c.cell END AS cell
         | FROM cells$l c JOIN cnt$l t USING (cell)
         | JOIN sb s ON s.vec_id = c.vec_id AND s.lvl = $l)""".stripMargin
    }.mkString(",\n")
    s"""hs AS (
       | SELECT lvl, j, ${rademacherListSql("2048 + lvl*4 + j")} AS r
       | FROM range(0, 3) v(lvl), range(0, 4) u(j)),
       |sb AS (
       | SELECT e.vec_id, h.lvl, string_agg($projBitSql, '' ORDER BY h.j) AS sbits
       | FROM embeddings e, hs h GROUP BY e.vec_id, h.lvl),
       |cells0 AS (SELECT vec_id, cell FROM cb),
       |$levels""".stripMargin
  }

  /** Shared q89/q90 PQ oracle fragments: stride CTE, codebook +
    * encode + distance-table chain, and the shortlist → exact-re-rank
    * tail (both queries differ only in the `adc` relation — q90
    * constrains it to co-celled pairs). */
  private val pqStrideCte: String =
    """st AS (
      | SELECT greatest(1, CAST(count(*) AS BIGINT) // 16) AS stride
      | FROM embeddings)""".stripMargin

  /** The codebook → encode → distance-table chain over a source
    * relation `(vec_id, <vcol>)`; `cbPred` selects the codebook sample
    * rows (q89/q90 sample the raw embeddings at stride-0 offset; q91
    * samples RESIDUALS at the half-stride offset so the codebook is
    * disjoint from the centroids — a centroid's own residual is 0). */
  private def pqChainCtes(src: String, vcol: String, cbPred: String): String =
    s"""cb AS (
      | SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, $vcol AS cw
      | FROM $src WHERE $cbPred
      | ORDER BY vec_id LIMIT 16),
      |ncw AS (SELECT CAST(count(*) AS INT) AS c FROM cb),
      |enc AS (
      | SELECT vec_id, s, j AS code FROM (
      |  SELECT e.vec_id, t.s, cb.j,
      |   row_number() OVER (PARTITION BY e.vec_id, t.s ORDER BY
      |     list_sum(list_transform(range(1, 9),
      |       i -> (e.$vcol[t.s*8+i]::DOUBLE - cb.cw[t.s*8+i]::DOUBLE)
      |          * (e.$vcol[t.s*8+i]::DOUBLE - cb.cw[t.s*8+i]::DOUBLE))) ASC,
      |     cb.j ASC) AS rk
      |  FROM $src e, range(0, 8) t(s), cb) WHERE rk = 1),
      |encv AS (SELECT vec_id, list(code ORDER BY s) AS codes FROM enc GROUP BY vec_id),
      |dtab AS (
      | SELECT e.vec_id, t.s, cb.j,
      |  list_sum(list_transform(range(1, 9),
      |    i -> (e.$vcol[t.s*8+i]::DOUBLE - cb.cw[t.s*8+i]::DOUBLE)
      |       * (e.$vcol[t.s*8+i]::DOUBLE - cb.cw[t.s*8+i]::DOUBLE))) AS d2
      | FROM $src e, range(0, 8) t(s), cb
      | WHERE e.vec_id % 50 = 0),
      |dtv AS (SELECT vec_id, list(d2 ORDER BY s, j) AS dt FROM dtab GROUP BY vec_id)""".stripMargin

  private val pqCodebookCtes: String = pqChainCtes("embeddings", "embedding",
    "vec_id % (SELECT stride FROM st) = 0")

  private lazy val pqTailSql: String =
    """short AS (
      | SELECT probe_id, cand_id FROM (
      |  SELECT probe_id, cand_id,
      |   row_number() OVER (PARTITION BY probe_id
      |     ORDER BY adc ASC, cand_id ASC) AS srk
      |  FROM adc) WHERE srk <= 20),
      |scored AS (
      | SELECT short.probe_id, short.cand_id, """.stripMargin +
      safeCosSql("p", "c") +
      """ AS cos
      | FROM short
      | JOIN embeddings p ON short.probe_id = p.vec_id
      | JOIN embeddings c ON short.cand_id = c.vec_id)
      |SELECT probe_id, cand_id, round(cos, 4) AS cos, rank FROM (
      | SELECT probe_id, cand_id, cos,
      |  row_number() OVER (PARTITION BY probe_id
      |    ORDER BY cos DESC, cand_id ASC) AS rank
      | FROM scored) WHERE rank <= 5""".stripMargin

  /** Zero-guarded cosine for the DuckDB oracles: restates the engine's
    * "cosine = 0 for zero vectors" convention (Similarity.cosine) —
    * DuckDB's `list_cosine_similarity` yields NaN there, and NaN sorts
    * ABOVE every threshold/ranking in its total order. */
  private def safeCosSql(a: String, b: String): String =
    s"CASE WHEN list_sum(list_transform($a.embedding::DOUBLE[], v -> v*v)) = 0" +
      s" OR list_sum(list_transform($b.embedding::DOUBLE[], v -> v*v)) = 0" +
      s" THEN 0.0::DOUBLE ELSE list_cosine_similarity(" +
      s"$a.embedding::DOUBLE[], $b.embedding::DOUBLE[]) END"

  /** Entity co-occurrence edges: adjacent token pairs, both dictionary
    * surfaces, self-loops removed, distinct (topic-graph analog). */
  private def entityEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val pairs = zip_with(
      slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (a, b) => struct(a.as("src"), b.as("dst")))
    docs.select(explode(pairs).as("p"))
      .select(col("p.src").as("src"), col("p.dst").as("dst"))
      .filter(isDictSurface(col("src")) && isDictSurface(col("dst")) &&
        col("src") =!= col("dst"))
      .distinct()
  }

  private val entityEdgesSql =
    s"""edges AS (
       |  SELECT DISTINCT z[1] AS src, z[2] AS dst
       |  FROM (SELECT unnest(list_zip(toks[1:length(toks)-1], toks[2:length(toks)])) AS z
       |        FROM (SELECT string_split(text, ' ') AS toks FROM documents))
       |  WHERE z[1] IN ($dictInList) AND z[2] IN ($dictInList) AND z[1] <> z[2]
       |)""".stripMargin

  /** DuckDB CTE chain replicating Dedup.minhashCandidates: 3-word
    * shingles -> 16 md5-chunk minima -> 4-band buckets -> distinct
    * candidate pairs (sh and pairs CTEs are reused by q42 and q73). */
  private val minhashPairsCte: String = {
    val sigExprs = (0 until 16).map(i =>
      s"list_aggregate(list_transform(hx, h -> substring(h, ${i * 8 + 1}, 8)), 'min')")
      .mkString(", ")
    val hexExpr = (0 until 4).map(j => s"md5('$j:' || s)").mkString(" || ")
    val bucketExprs = (0 until 4).map(b =>
      s"'$b|' || md5(array_to_string(sig[${b * 4 + 1}:${b * 4 + 4}], ','))").mkString(", ")
    s"""sh AS (
       | SELECT doc_id,
       |  list_transform(range(1, greatest(length(toks) - 1, 2)),
       |    i -> array_to_string(toks[i:i+2], ' ')) AS sh
       | FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
       |hexes AS (SELECT doc_id, list_transform(sh, s -> $hexExpr) AS hx FROM sh),
       |sig AS (SELECT doc_id, [$sigExprs] AS sig FROM hexes),
       |bk AS (SELECT doc_id, sig, unnest([$bucketExprs]) AS bucket FROM sig),
       |pairs AS (
       | SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |  a.sig AS sig_a, b.sig AS sig_b
       | FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.doc_id < b.doc_id)""".stripMargin
  }

  /** DuckDB CTE: (doc_id, surface, i) per token, 1-based position. */
  private val tokenPosSql =
    """tok AS (
      |  SELECT doc_id, z[1] AS surface, CAST(z[2] AS BIGINT) AS i
      |  FROM (SELECT doc_id,
      |          unnest(list_zip(toks, generate_series(1, length(toks)))) AS z
      |        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))
      |)""".stripMargin

  // =================================================================
  // Flagship: end-to-end triple extraction on the corpus (entry point)
  // =================================================================
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    // the full extraction pipeline: parse -> mentions -> alias closure ->
    // resolved distinct (subj, pred, obj) triples
    val files = Tables.codeFiles(spark, sfDir).as[graft.core.CodeFile]
    val surfaceToEntity = dict.map { case (sf, e, _) => (sf, e) }.toMap
    Triples.mentionTriples(files, surfaceToEntity)
      .select(col("subj"),
        lit("http://graft.dev/ontology#mentions").as("pred"),
        col("obj"))
  }

  // =================================================================
  // q2x knowledge-graph pipeline bodies
  // =================================================================

  /** Dictionary mention extraction with token positions (U1/S3 analog). */
  private def kgMentions(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), posexplode(toks).as(Seq("pos", "surface")))
      .filter(isDictSurface(col("surface")))
      .select(col("doc_id"), col("pos"),
        (col("pos") / 10).cast("int").as("sentence_order"), col("surface"))

  /** Mention counts per doc joined to the broadcast dictionary (J3).
    * `lang` is carried through the aggregation key (it is functionally
    * dependent on doc_id) instead of re-joined afterwards — at corpus
    * scale that second join would be a full shuffle of the corpus; this
    * way the only exchange is the count shuffle and the dictionary join
    * is broadcast. */
  private def kgMentionCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val m = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), explode(toks).as("surface"))
      .filter(isDictSurface(col("surface")))
      .groupBy(col("doc_id"), col("lang"), col("surface"))
      .agg(count(lit(1)).as("n_mentions"))
    m.join(broadcast(dictDf(spark)), Seq("surface"))
      .select(col("doc_id"), col("surface"), col("entity"), col("etype"),
        col("n_mentions"),
        concat(lit("http://graft.dev/"), col("lang"), lit("/entity/"), col("entity")).as("uri"))
  }

  // =================================================================
  // The queries map (driver-gated; names must match oracleSql keys)
  // =================================================================
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- relational core --------------------------------------------
    "q01_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_rows"))
    }),

    "q02_filter_project" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 45 && col("l_discount") <= 0.02)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 2).as("price"))
    }),

    "q03_join_inner" -> ((s, d) => {
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
    }),

    "q04_join_left_coalesce" -> ((s, d) => {
      // left join + bincond coalesce: the redirect-resolution idiom (P5/J2)
      val rich = Tables.customer(s, d).filter(col("c_acctbal") > 5000)
        .select(col("c_custkey"), col("c_mktsegment"))
      Tables.orders(s, d)
        .join(rich, col("o_custkey") === col("c_custkey"), "left_outer")
        .select(col("o_orderkey"),
          coalesce(col("c_mktsegment"), lit("UNSEGMENTED")).as("segment"))
    }),

    "q05_join_broadcast" -> ((s, d) => {
      // replicated join (J3): tiny dims broadcast
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_customers"),
          round(avg(col("c_acctbal")), 2).as("avg_bal"))
    }),

    "q06_semi_anti" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).select(col("o_custkey"))
      val withOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), lit("HAS_ORDERS").as("status"))
      val without = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), lit("NO_ORDERS").as("status"))
      withOrders.unionByName(without)
    }),

    "q07_self_join" -> ((s, d) => {
      // self-join via aliased copy (J5)
      val n = Tables.nation(s, d)
      n.as("a").join(n.as("b"),
          col("a.n_regionkey") === col("b.n_regionkey") &&
            col("a.n_name") < col("b.n_name"))
        .select(col("a.n_name").as("nation_a"), col("b.n_name").as("nation_b"),
          col("a.n_regionkey").as("regionkey"))
    }),

    "q08_cogroup_degrees" -> ((s, d) => {
      // 3-way COGROUP degree counting (G2): per-nation customer/supplier
      // counts via full-outer join + zero-fill (topic-corpus/01 semantics)
      val c = Tables.customer(s, d).groupBy(col("c_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_customers"))
      val p = Tables.supplier(s, d).groupBy(col("s_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_suppliers"))
      c.join(p, Seq("nationkey"), "full_outer")
        .select(col("nationkey"),
          coalesce(col("n_customers"), lit(0L)).as("n_customers"),
          coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
    }),

    "q09_distinct" -> ((s, d) =>
      Tables.lineitem(s, d).select(col("l_returnflag"), col("l_linestatus")).distinct()),

    "q10_union_split" -> ((s, d) => {
      // SPLIT + UNION (O2/O3): one pass, two branches, recombined tagged
      val o = Tables.orders(s, d)
      val hi = o.filter(col("o_totalprice") > 200000)
        .select(col("o_orderkey"), lit("HIGH").as("bucket"))
      val lo = o.filter(col("o_totalprice") <= 200000)
        .select(col("o_orderkey"), lit("LOW").as("bucket"))
      hi.unionByName(lo)
    }),

    "q11_orderby_topk" -> ((s, d) => {
      // total order (O1) with deterministic tiebreak, materialized as rank
      Tables.orders(s, d)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("total"))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("total").desc, col("o_orderkey").asc)))
        .filter(col("rank") <= 100)
    }),

    "q12_window_latest" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey").as("latest_order"))
    }),

    "q14_window_running" -> ((s, d) => {
      // running aggregate over an ordered frame (O1-adjacent; the
      // idiomatic replacement for the reference's in-UDF counters).
      // l_extendedprice is the FINAL tiebreaker: (orderkey, linenumber)
      // is not unique in the synthetic table (sf0.1 carries one
      // colliding pair), and a ROWS frame over a non-total order emits
      // an order-dependent multiset of prefix sums — DuckDB's parallel
      // window then flips values run to run. With the price in the
      // order, tied rows have equal addends, so the prefix multiset is
      // order-invariant even for exact duplicates.
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, d)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          round(sum(col("l_extendedprice")).over(w), 2).as("running_revenue"))
    }),

    "q15_rollup" -> ((s, d) =>
      // hierarchical subtotals (grouping-sets family; absent in the
      // reference, standard in the engine): per (flag, status), per
      // flag, and grand total in one pass
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("n_rows"))),

    "q16_sessionize" -> ((s, d) => {
      // gap-based sessionization (30-min inactivity): lag + running sum
      // of session starts — the batch twin of the stateful streaming
      // sessionizer (graft.streaming.EventStream.sessionize)
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val ev = Tables.events(s, d)
        .withColumn("ts", col("ts").cast("timestamp"))
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          (col("prev_ts").isNull ||
            col("ts").cast("long") - col("prev_ts").cast("long") > 1800).cast("int"))
        .withColumn("session_id",
          sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      ev.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"))
    }),

    "q13_events_window" -> ((s, d) =>
      // batch form of the streaming windowed agg (same transform runs
      // under readStream; see graft.streaming.EventStream)
      Tables.events(s, d)
        .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("window_start"), col("event_type"), col("n"))),

    // ---- knowledge-graph pipeline -----------------------------------
    "q20_kg_codefiles" -> ((s, d) =>
      Tables.codeFiles(s, d)
        .select(col("doc_id"), col("repo"), col("path"), col("commit"), col("lang"))),

    "q21_kg_mentions" -> ((s, d) => kgMentions(s, d)),

    "q22_kg_mention_counts" -> ((s, d) => kgMentionCounts(s, d)),

    "q23_kg_alias_edges" -> ((s, d) => aliasEdges(s, d)),

    "q24_kg_resolve_1hop" -> ((s, d) => {
      // reference one-hop redirect resolution (J2+P5, ner-corpus/02:23-25)
      val docs = Tables.documents(s, d)
      val n = docs.count()
      val refs = docs.select(col("doc_id").as("src_doc"),
        ((col("doc_id") * 3 + 1) % n).as("ref"))
      Redirects.resolveOneHop(refs, aliasEdges(s, d), "ref")
        .select(col("src_doc"), col("ref").as("resolved"))
    }),

    "q25_kg_closure" -> ((s, d) =>
      // iterative self-join transitive closure with cycle guard (J6) —
      // localThreshold=0 pins the DISTRIBUTED loop under the oracle
      // (the adaptive default would take the driver fast path at this
      // graph size; production call sites use the default)
      Redirects.transitiveClosure(aliasEdges(s, d), localThreshold = 0)),

    "q66_heavy_hitters" -> ((s, d) => {
      // hot-key detection for the salted-join path: one Misra-Gries
      // sketch pass (k=64 counters; no false negatives above n/65)
      // that ALSO carries the total count, then an exact recount of
      // only the tiny candidate set, threshold n/40. MG's guarantee
      // covers the threshold, so the result is exactly the full
      // groupBy's — in TWO corpus passes total, the second behind a
      // pushed-down In(candidates) filter (<= 64 strings), with no
      // corpus-wide shuffle of all keys anywhere.
      import org.apache.spark.sql.functions.udaf
      val tokens = Tables.documents(s, d).select(explode(toks).as("tok"))
      val mg = udaf(new graft.functions.Aggregators.MisraGries(64))
      val first = tokens.agg(mg(col("tok")).as("c"), count(lit(1)).as("total")).head()
      val cands = first.getSeq[String](0)
      val total = first.getLong(1)
      tokens.filter(col("tok").isin(cands.map(x => x: Any): _*))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("n_occ"))
        .filter(col("n_occ") >= total / 40.0)
    }),

    "q65_closure_doubling" -> ((s, d) =>
      // pointer-doubling closure (log-depth scale path; same output
      // contract and oracle as q25's per-hop loop) — localThreshold=0
      // pins the DISTRIBUTED doubling loop under the oracle, like q25
      Redirects.transitiveClosureDoubling(aliasEdges(s, d), localThreshold = 0)),

    "q26_kg_degrees" -> ((s, d) => TopicGraph.degrees(entityEdges(s, d))),

    "q27_kg_ancestry" -> ((s, d) => {
      // the literal path-ENUMERATION form of the reference's unrolled
      // ancestry chain (every distinct simple path) — opt-in
      // dedupFrontier = false; the scale-safe default is exercised (and
      // oracle-checked) by q84
      import s.implicits._
      val roots = Seq("spark").toDF("root")
      TopicGraph.groundedAncestry(entityEdges(s, d), roots, maxDepth = 3,
        dedupFrontier = false)
    }),

    "q84_kg_ancestry_dedup" -> ((s, d) => {
      // groundedAncestry at its DEFAULT (dedupFrontier = true): each
      // level keeps the lexicographically-first path per (node, root),
      // bounding every frontier at |V|x|roots| rows on any graph
      // density — the form a dense co-occurrence graph must run
      import s.implicits._
      val roots = Seq("spark").toDF("root")
      TopicGraph.groundedAncestry(entityEdges(s, d), roots, maxDepth = 3)
    }),

    "q28_kg_annotated" -> ((s, d) => {
      // MergeAsOpenNLPAnnotatedText analog (U2): wrap dictionary tokens
      val typeOf = dict.map { case (sf, _, t) => (sf, t) }.toMap
      val annotate = (t: Column) => {
        val cases = typeOf.foldLeft(when(lit(false), t)) { case (acc, (sf, tp)) =>
          acc.when(t === sf, concat(lit(s"<START:$tp> "), t, lit(" <END>")))
        }
        cases.otherwise(t)
      }
      Tables.documents(s, d)
        .select(col("doc_id"),
          array_join(transform(toks, annotate), " ").as("annotated"))
    }),

    "q29_kg_concat_distinct" -> ((s, d) =>
      // ConcatTextBag analog (U4): trim/dedup/sort/join per group
      Tables.documents(s, d)
        .groupBy(col("lang"))
        .agg(array_join(array_sort(array_distinct(collect_list(col("source")))), " ")
          .as("sources"))),

    "q30_kg_quality_gate" -> ((s, d) =>
      // CheckAbstract analog (U5): single-space word count >= 30
      Tables.documents(s, d)
        .select(col("doc_id"), size(split(col("text"), " ")).as("n_words"))
        .filter(col("n_words") >= 30)),

    "q31_kg_tsv_safe" -> ((s, d) =>
      // SafeTsvText analog (U7)
      Tables.documents(s, d)
        .select(col("doc_id"),
          concat(lit("\""),
            regexp_replace(regexp_replace(col("text"), "[\\t\\n]", " "), "\"", "\"\""),
            lit("\"")).as("safe_text"))),

    "q32_kg_triples_nt" -> ((s, d) =>
      // NTriples emission (K2/K3): ASCII corpus -> escape is identity
      kgMentionCounts(s, d)
        .select(concat(
          lit("<http://graft.dev/doc/"), col("doc_id"), lit("> "),
          lit("<http://graft.dev/ontology#mentions> "),
          lit("<"), col("uri"), lit("> .")).as("line"))),

    "q33_kg_noloop_paths" -> ((s, d) => {
      // NoLoopInPath predicate (U6) over synthesized paths
      val docs = Tables.documents(s, d)
      val n = docs.count()
      docs.select(col("doc_id"),
          concat_ws("/",
            (col("doc_id") % 7).cast("string"),
            ((col("doc_id") * 3 + 1) % 7).cast("string"),
            ((col("doc_id") * 5 + 2) % 7).cast("string")).as("path"))
        .withColumn("parts", split(col("path"), "/"))
        .withColumn("no_loop",
          (!array_contains(slice(col("parts"), lit(1), size(col("parts")) - 1),
            element_at(col("parts"), -1))).cast("int"))
        .select(col("doc_id"), col("path"), col("no_loop"))
    }),

    "q34_kg_skew_join" -> ((s, d) => {
      // explicit salted join for the skewed popular-surface linking
      // (north rule): identical result to the plain dict join, hot keys
      // spread over 8 salt buckets
      val m = Tables.documents(s, d)
        .select(col("doc_id"), explode(toks).as("surface"))
        .filter(isDictSurface(col("surface")))
      Skew.saltedJoin(m, dictDf(s), "surface", salts = 8, saltSource = col("doc_id"))
        .groupBy(col("entity"), col("etype"))
        .agg(count(lit(1)).as("n_mentions"))
    }),

    "q35_kg_merge_annotated" -> ((s, d) => {
      // grouped order-sensitive merge (G1+U2): per (doc, sentence) the
      // tokens regrouped and annotated — the ner-corpus/03 group+merge
      val typeOf = dict.map { case (sf, _, t) => (sf, t) }.toMap
      val annotate = (t: Column) => {
        val cases = typeOf.foldLeft(when(lit(false), t)) { case (acc, (sf, tp)) =>
          acc.when(t === sf, concat(lit(s"<START:$tp> "), t, lit(" <END>")))
        }
        cases.otherwise(t)
      }
      annotatedSentences(Tables.documents(s, d), annotate)
    }),

    "q68_kg_onetype_corpus" -> ((s, d) => {
      // ner-corpus/03bis_filter_join_by_type_and_convert.pig:18 analog
      // (`type == '$TYPE_URI'`): the SAME group+annotate chain as q35
      // (shared annotatedSentences), but annotation is filtered to ONE
      // type and only sentences actually mentioning it survive
      val surfaces = dict.filter(_._3 == "OPERATOR").map(_._1)
      val isOne = (t: Column) => t.isin(surfaces.map(x => x: Any): _*)
      val annotate = (t: Column) =>
        when(isOne(t), concat(lit("<START:OPERATOR> "), t, lit(" <END>"))).otherwise(t)
      annotatedSentences(Tables.documents(s, d), annotate,
        Seq(sum(isOne(col("token")).cast("int")).as("n_type_mentions")))
        .filter(col("n_type_mentions") > 0)
    }),

    "q36_kg_capped_abstracts" -> ((s, d) => {
      // AggregateTextBag analog (U3) as a real typed Aggregator with an
      // explicit sort key (doc_id) for determinism (SURVEY §2.10.4)
      val agg = udaf(new graft.functions.Aggregators.CappedConcat(100000))
      Tables.documents(s, d)
        .groupBy(col("lang"))
        .agg(agg(col("doc_id"), col("text")).as("abstracts"))
    }),

    "q38_kg_grounding" -> ((s, d) => {
      // topic grounding with the null-marker projection (P6) + zero-fill
      // (topic-corpus/02 shape): per entity, how many docs mention it and
      // whether any mentioning doc passes the quality gate
      val m = Tables.documents(s, d)
        .select(col("doc_id"), explode(toks).as("surface"),
          (size(toks) >= 30).cast("int").as("quality"))
        .filter(isDictSurface(col("surface")))
        .groupBy(col("surface"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          max(when(col("quality") === 1, lit(1))).as("q_marker")) // null if none
      broadcast(dictDf(s)).join(m, Seq("surface"), "left_outer")
        .select(col("entity"),
          coalesce(col("n_docs"), lit(0L)).as("n_docs"),
          coalesce(col("q_marker"), lit(0)).as("has_quality_doc"))
    }),

    "q37_kg_ner_corpus" -> ((s, d) => {
      // full ner-corpus chain (01->03) through NerCorpus.run: parse ->
      // mentions -> alias-closure-resolved typing -> broadcast type
      // names -> grouped annotated merge, sha256 invariant carried
      import s.implicits._
      val files = Tables.codeFiles(s, d).as[graft.core.CodeFile]
      val docLangs = Seq("de", "en", "es", "fr", "zh")
      val surfaceToEntity = dict.map { case (sf, e, _) => (sf, e) }.toMap
      val entityTypes = (for {
        (_, e, t) <- dict
        lang <- docLangs
      } yield (graft.functions.TextFunctions.nameToUri(e, lang),
        s"http://graft.dev/ontology/$t")).toDF("subject", "object")
      val typeNames = dict.map { case (_, _, t) =>
        (s"http://graft.dev/ontology/$t", t)
      }.distinct.toDF("typeUri", "typeName")
      NerCorpus.run(files, surfaceToEntity, entityTypes, typeNames)
    }),

    // ---- training-data ops ------------------------------------------
    "q39_kg_entity_contexts" -> ((s, d) => {
      // ne-disambiguation-corpus analog: one size-capped context
      // document per entity surface, merged from every sentence window
      // that mentions it, deterministically ordered by (doc, window).
      // ONE corpus scan: the per-window aggregation builds the sentence
      // AND its distinct mention surfaces together (collect_set skips
      // the nulls the when() leaves for non-mentions), then a single
      // explode fans out per (window, surface) — the sent⋈hits
      // self-join form scanned and exploded the corpus twice.
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), posexplode(toks).as(Seq("pos", "token")))
        .withColumn("w", (col("pos") / 10).cast("int"))
      val win = tok.groupBy(col("doc_id"), col("w"))
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("token")))),
            x => x.getField("token")), " ").as("sentence"),
          collect_set(when(isDictSurface(col("token")), col("token"))).as("surfaces"))
      val capped = udaf(new graft.functions.Aggregators.CappedConcat(100000))
      win.select(col("doc_id"), col("w"), col("sentence"),
          explode(col("surfaces")).as("surface"))
        .groupBy(col("surface"))
        .agg(count(lit(1)).as("n_occurrences"),
          capped(col("doc_id") * 100000 + col("w"), col("sentence")).as("context"))
    }),

    "q40_dedup_exact" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("canonical_id"))
        .filter(col("n_dups") > 1)),

    "q41_dedup_jaccard" -> ((s, d) => {
      // the VERIFY stage over the SIMHASH search (the minhash analog is
      // q73): exact n-gram Jaccard computed on the banded Hamming-ball
      // candidate pairs — candidates come only from shared 15-bit
      // simhash chunks, no adjacent-id or all-pairs step anywhere, and
      // the tiny pair relation broadcasts against the shingle sides
      val docs = Tables.documents(s, d)
      val cands = Dedup.simhashCandidates(docs, maxHamming = 20)
        .select(col("id_a"), col("id_b"))
      val sh = docs.select(col("doc_id"), Dedup.wordShingles(col("text"), 3).as("sh"))
      cands
        .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          round(Dedup.jaccard(col("sh_a"), col("sh_b")), 4).as("jaccard"))
    }),

    "q42_dedup_minhash" -> ((s, d) =>
      Dedup.minhashCandidates(Tables.documents(s, d))
        .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 4).as("est_jaccard"))),

    "q73_dedup_verified" -> ((s, d) => {
      // the VERIFY stage of the dedup chain: LSH candidates re-joined
      // to their shingle sets for the exact n-gram Jaccard, thresholded
      // — the candidate relation is tiny next to the corpus, so both
      // text joins broadcast the candidate side under AQE
      val docs = Tables.documents(s, d)
      val cands = Dedup.minhashCandidates(docs).select(col("id_a"), col("id_b"))
      val sh = docs.select(col("doc_id"), Dedup.wordShingles(col("text"), 3).as("sh"))
      cands
        .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          round(Dedup.jaccard(col("sh_a"), col("sh_b")), 4).as("jaccard"))
        .filter(col("jaccard") >= 0.7)
    }),

    // (the xxhash64 FAST minhash family — Dedup.minhashCandidatesFast —
    // has no DuckDB analog, so it is verified in PipelineSpec only:
    // planted-dup recall + family-mismatch guard; every query row here
    // carries a full DuckDB oracle)

    "q43_sim_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val probes = emb.filter(col("vec_id") % 50 === 0)
      Similarity.bruteForceTopK(probes, emb, 5)
        .select(col("probe_id"), col("cand_id"), round(col("cos"), 4).as("cos"),
          col("rank"))
    }),

    "q118_sim_sq8" -> ((s, d) => {
      // SQ8-quantized ANN: per-dimension [min,max] snapped to 256
      // uniform levels (the FAISS/Lucene int8 compression tier — 4×
      // the scan IO reduction at near-exact recall), searched with the
      // same broadcast brute force as the exact q43 path, so the two
      // slots isolate exactly the quantizer's recall cost
      val emb = Tables.embeddings(s, d)
      val rec = Similarity.sq8Reconstruct(emb)
      val probes = rec.filter(col("vec_id") % 50 === 0)
      Similarity.bruteForceTopK(probes, rec, 5)
        .select(col("probe_id"), col("cand_id"), round(col("cos"), 4).as("cos"),
          col("rank"))
    }),

    "q44_sim_lsh" -> ((s, d) => {
      // multi-band sign-LSH ANN: 4 independent hash tables (union of
      // bucket joins), bucket granularity AUTO-DERIVED from the corpus
      // (~8 vectors per bucket per band via signLshAutoBits; the
      // oracle restates the formula) — per-bucket population stays
      // constant as the corpus grows; `bands` is the recall knob
      val emb = Tables.embeddings(s, d)
      val probes = emb.filter(col("vec_id") % 50 === 0)
      Similarity.lshTopK(probes, emb, 5, bands = 4)
        .select(col("probe_id"), col("cand_id"), round(col("cos"), 4).as("cos"),
          col("rank"))
    }),

    "q53_emb_neardup" -> ((s, d) =>
      // embedding-cosine near-duplicate pairs: multi-band sign-LSH
      // candidate join (auto-sized buckets, as q44) + exact-cosine
      // threshold (the embedding analog of minhash near-dup); the
      // synthetic embeddings are near-random, so the demo threshold is
      // low
      Similarity.signLshPairs(Tables.embeddings(s, d), bands = 4)
        .filter(col("cos") >= 0.25)
        .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))),

    "q52_sim_ivf" -> ((s, d) => {
      // IVF-style ANN (Similarity.ivfTopK): coarse cells = nearest of a
      // FIXED-k centroid set (~16 seed vectors at id stride n/16,
      // spread across the corpus — crucially, k does NOT grow with the
      // corpus: assignment is O(n*k) against a broadcast of k rows,
      // where a corpus-proportional centroid set would be O(n^2/c));
      // probes search their own cell (nprobe=1 here; the recall knob
      // is tested in PipelineSpec)
      val emb = Tables.embeddings(s, d)
      val probes = emb.filter(col("vec_id") % 50 === 0)
      Similarity.ivfTopK(probes, emb, 5, kCentroids = 16, nprobe = 1)
        .select(col("probe_id"), col("cand_id"), round(col("cos"), 4).as("cos"), col("rank"))
    }),

    "q45_langid" -> ((s, d) => {
      // long-form marker scores + argmax rank (deterministic tiebreak).
      // ONE corpus scan: all language scores are computed as a struct
      // array in a single projection and exploded — the union-of-
      // branches form re-scans the corpus once per language (5 scans
      // of a 100 TB table for 5 candidate languages)
      val docs = Tables.documents(s, d)
      val toksOnce = split(col("text"), " ")
      val scores = TextAnalysis.langMarkers.toSeq.sortBy(_._1).map { case (lang, words) =>
        struct(lit(lang).as("cand_lang"),
          size(filter(toksOnce, t => t.isin(words.map(w => w: Any): _*)))
            .cast("long").as("hits"))
      }
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("hits").desc, col("cand_lang").asc)
      docs.select(col("doc_id"), explode(array(scores: _*)).as("x"))
        .select(col("doc_id"), col("x.cand_lang").as("cand_lang"), col("x.hits").as("hits"))
        .withColumn("rank", row_number().over(w))
    }),

    "q46_quality" -> ((s, d) =>
      TextAnalysis.qualityFeatures(Tables.documents(s, d))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          col("distinct_ratio"), col("stopword_ratio"), col("mean_token_len"),
          col("long_enough"))),

    "q47_tokens" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
          TextAnalysis.subwordCount(col("text")).as("n_subwords"),
          // BPE-ish regex segmentation: letter runs / digit runs / other
          size(regexp_extract_all(col("text"),
            lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long").as("n_bpe"))),

    "q74_repetition_signals" -> ((s, d) => {
      // Gopher/MassiveText repetition filters (adapted to the 10-token
      // window convention): top-bigram char coverage via per-doc argmax
      // (struct max — deterministic tie-break), duplicate-window
      // fraction in its OWN doc-level projection joined back on doc_id.
      // Projecting dwr alongside the bigram explode re-evaluates the
      // whole windowed HOF once per BIGRAM row (ExtractGenerator hoists
      // the alias above Generate; measured 12.9s -> ~1s at sf0.1)
      val docs = Tables.documents(s, d)
      val dwr = docs.select(col("doc_id"),
        TextAnalysis.dupWindowRatio(col("text")).as("dup_window_ratio"))
      TextAnalysis.topBigramFraction(docs).join(dwr, Seq("doc_id"))
        .select(col("doc_id"), col("dup_window_ratio"),
          col("top_bigram"), col("top_bigram_fraction"))
    }),

    "q75_pagerank" -> ((s, d) =>
      // entity-importance prior for the skewed popular-entity linking
      // stage (north rule): PageRank power iteration, dangling mass
      // redistributed, fixed 5 iterations. Adaptive driver fast path
      // at this graph size; PipelineSpec pins the distributed loop
      // (localThreshold = 0) value-equal to it
      TopicGraph.pageRank(aliasEdges(s, d), iters = 5, damping = 0.85)
        .select(col("node"), round(col("rank"), 8).as("rank_r8"))),

    "q117_hits" -> ((s, d) =>
      // hub/authority split of the q75 importance prior (Kleinberg
      // HITS, L1-normalized, fixed 4 iterations): authorities feed the
      // disambiguation stage, hubs flag index/directory files. Same
      // alias edge set, same adaptive driver fast path discipline;
      // PipelineSpec pins the distributed loop (localThreshold = 0)
      // equal to 1e-9 (normalized double sums agree to summation-
      // order ulps, not bit-for-bit — see TopicGraph.hits scaladoc)
      TopicGraph.hits(aliasEdges(s, d), iters = 4)
        .select(col("node"), round(col("hub"), 8).as("hub_r8"),
          round(col("auth"), 8).as("auth_r8"))),

    "q76_cooccur_pmi" -> ((s, d) => {
      // entity co-occurrence PMI — the relation-extraction signal
      // derived right after mention detection; doc-level pair fan-out
      // is bounded by the broadcast dictionary (TextAnalysis scaladoc)
      val docs = Tables.documents(s, d)
      TextAnalysis.cooccurrencePmi(docs, dictSurfaces, docs.count())
        .select(col("sa"), col("sb"), col("n_ab"),
          round(col("pmi"), 6).as("pmi_r6"))
    }),

    "q77_semdedup" -> ((s, d) =>
      // SemDeDup: exact pairwise cosine ONLY within embedding-space
      // cells (seeded random-projection sign cells; semDedupKMeans is
      // the data-adapted k-means-cell variant), greedy
      // keep-min-id — the embedding-level analog of the q70 keep list.
      // Cell count AUTO-DERIVED from the corpus (cells ≈ √n via
      // semDedupAutoBits; the oracle restates the formula), so the
      // per-cell pairwise stage stays O(n) total at any scale.
      // Demo threshold matches q53 (near-random synthetic embeddings)
      Similarity.semDedup(Tables.embeddings(s, d), tau = 0.25)),

    "q78_source_prior" -> ((s, d) =>
      // per-source curation prior (CCNet/RefinedWeb domain table):
      // doc/token rollup + exact-duplicate rate per source
      Curation.sourceStats(Tables.documents(s, d))),

    "q79_commonness" -> ((s, d) => {
      // commonness prior P(entity|surface) — the ne-disambiguation
      // popularity signal (NerCorpus.commonnessPrior). Ambiguity is
      // synthesized deterministically: each dict surface has 3
      // candidate entities, a mention's target varies by
      // (doc_id + 1-based position) mod 3
      val docs = Tables.documents(s, d)
      val hits = docs
        .select(col("doc_id"), posexplode(toks).as(Seq("i", "surface")))
        .filter(isDictSurface(col("surface")))
      val se = hits.join(broadcast(dictDf(s)), Seq("surface"))
        .select(col("surface"),
          concat(col("entity"), lit("_v"),
            (col("doc_id") + col("i") + 1) % 3).as("entity"))
      NerCorpus.commonnessPrior(se)
        .select(col("surface"), col("entity"), col("n"),
          round(col("prior"), 6).as("prior_r6"), col("rank"))
    }),

    "q85_disambiguation" -> ((s, d) => {
      // the ne-disambiguation DECISION (NerCorpus.disambiguate):
      // commonness count x window-context agreement, integer-scored
      // argmax per mention — the capstone the q39 contexts and q79
      // prior exist for. Ambiguity synthesized as in q79 (3 candidate
      // entities per surface, target varies by (doc_id + pos + 1) % 3)
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), posexplode(toks).as(Seq("pos", "token")))
        .withColumn("w", (col("pos") / 10).cast("int"))
      val mentions = tok.filter(isDictSurface(col("token")))
        .join(broadcast(dictDf(s)), col("token") === col("surface"))
        .select(col("doc_id"), col("w"), col("surface"),
          concat(col("entity"), lit("_v"),
            (col("doc_id") + col("pos") + 1) % 3).as("entity"))
      NerCorpus.disambiguate(mentions,
        tok.select(col("doc_id"), col("w"), col("token")))
    }),

    "q80_unigram_logprob" -> ((s, d) =>
      // unigram-LM quality score (CCNet perplexity-filter shape):
      // mean ln P(token) under the corpus's own unigram LM
      TextAnalysis.unigramLogprob(Tables.documents(s, d))
        .select(col("doc_id"), col("n_tok"),
          round(col("logprob"), 6).as("logprob_r6"))),

    "q86_bigram_logprob" -> ((s, d) =>
      // bigram-LM quality score (one order up the CCNet n-gram ladder
      // from q80; TextAnalysis.bigramLogprob) — conditional
      // P(w2|w1) under the corpus's own bigram LM
      TextAnalysis.bigramLogprob(Tables.documents(s, d))
        .select(col("doc_id"), col("n_bigrams"),
          round(col("logprob"), 6).as("logprob_r6"))),

    "q89_sim_pq" -> ((s, d) => {
      // product-quantization ANN (Similarity.pqTopK): 8 subspaces x
      // ~16 stride-sampled codewords -> 8 small ints per vector; ADC
      // scan over the CODES relation only (per-probe distance table,
      // codegen lookups), ids-only shortlist, exact-cosine re-rank on
      // the gathered originals
      val emb = Tables.embeddings(s, d)
      val probes = emb.filter(col("vec_id") % 50 === 0)
      Similarity.pqTopK(probes, emb, 5)
        .select(col("probe_id"), col("cand_id"), round(col("cos"), 4).as("cos"),
          col("rank"))
    }),

    "q90_sim_ivf_pq" -> ((s, d) => {
      // IVF-PQ (Similarity.ivfPqTopK): cells PRUNE the scan (probe
      // touches its nearest cell only), PQ codes COMPRESS what it
      // reads, exact re-rank restores precision — the composition a
      // web-scale ANN deploys; cells and codebook share the
      // stride-sample convention (q52/q89)
      val emb = Tables.embeddings(s, d)
      val probes = emb.filter(col("vec_id") % 50 === 0)
      Similarity.ivfPqTopK(probes, emb, 5)
        .select(col("probe_id"), col("cand_id"), round(col("cos"), 4).as("cos"),
          col("rank"))
    }),

    "q91_sim_ivf_pq_res" -> ((s, d) => {
      // residual-encoded IVF-PQ (Similarity.ivfPqResidualTopK): the
      // production refinement q90 documents — vectors PQ-encoded as
      // residuals against their own cell centroid, probe tables from
      // probe residuals, codebook = half-stride-offset residual sample
      // (the stride-0 sample IS the centroid set, residuals ≡ 0)
      val emb = Tables.embeddings(s, d)
      val probes = emb.filter(col("vec_id") % 50 === 0)
      Similarity.ivfPqResidualTopK(probes, emb, 5)
        .select(col("probe_id"), col("cand_id"), round(col("cos"), 4).as("cos"),
          col("rank"))
    }),

    "q92_sim_lsh_capped" -> ((s, d) =>
      // hot-BUCKET-capped near-dup pairs (q53 + the skew guard): a
      // band bucket holding more than `maxBucketSize` vectors is
      // dropped as non-discriminative BEFORE the pair join — the
      // embedding twin of the simhash flooded-bucket cap. A
      // template-family corpus puts m near-identical vectors into one
      // bucket in EVERY band; without the cap that band join pays
      // O(m²) pair rows (the skew shape AQE can spread but not
      // shrink). Pairs in rare buckets are untouched; with the cap on
      // the result is a deliberate, oracle-restated subset
      Similarity.signLshPairs(Tables.embeddings(s, d), bands = 4,
          maxBucketSize = 12)
        .filter(col("cos") >= 0.25)
        .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))),

    "q93_semdedup_capped" -> ((s, d) =>
      // hot-CELL re-split SemDeDup (q77 + the skew guard): cells whose
      // population exceeds `maxCellSize` are subdivided by 4 FRESH
      // seeded sign bits per level (up to 3 levels, '#'-marked in the
      // cell key) — SemDeDup emits a verdict per vector, so hot cells
      // split rather than drop; near-duplicates agree on every sign
      // bit and stay co-celled at every level, only cross-subcell
      // recall inside the hub cell is traded for the O(m²) bound
      Similarity.semDedup(Tables.embeddings(s, d), tau = 0.25,
        maxCellSize = 16)),

    "q94_incremental_ann" -> ((s, d) => {
      // batch incremental ANN (the embedding twin of q82's
      // incremental dedup): a NEW batch of vectors (vec_id % 10 = 0)
      // searched against the committed sign-LSH index of the REST of
      // the corpus — O(|new| · bucket population), the corpus is
      // never re-keyed; family (bits/bands/seed) rides the index
      // metadata and is read back, never trusted from the caller
      val emb = Tables.embeddings(s, d)
      val idx = Similarity.signLshIndex(emb.filter(col("vec_id") % 10 =!= 0),
        bits = 8, bands = 4)
      Similarity.incrementalAnnCandidates(
          emb.filter(col("vec_id") % 10 === 0), idx, tau = 0.25)
        .select(col("vec_id"), col("cand_id"), round(col("cos"), 4).as("cos"))
    }),

    "q96_mixture_sample" -> ((s, d) => {
      // deterministic mixture resampling to TARGET source proportions
      // (Pile/DoReMi domain reweighting): srcK is weighted (K+1)/210,
      // the largest downsample-only output keeps rate (K+1)/20 of
      // srcK's docs (uniform 20-source corpus ⇒ the closed form the
      // oracle restates); selection = seeded md5 threshold over 65536
      // buckets — engine/run/cluster-size reproducible, pure map
      // filter after a broadcast rate lookup. Output: per-source kept
      // counts (the mixture manifest)
      val weights = (0 until 20).map(k => s"src$k" -> (k + 1) / 210.0).toMap
      Curation.mixtureSample(Tables.documents(s, d), weights)
        .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
    }),

    "q111_mixture_upsample" -> ((s, d) => {
      // deterministic mixture UP-sampling (DoReMi reweighting with
      // epochs > 1 on rare sources): an explicit target size makes
      // per-source rates exceed 1 — src1 at weight 0.5 with
      // N = 6·n_src1 needs rate 3.0 (three integer replicas), src2
      // rate 1.5 (one replica + a half-probability seeded extra),
      // src3/src4 rate 0.75 (downsample). Replicas carry the `rep`
      // training-copy index; dyadic weights keep every rate exactly
      // representable so the oracle restates the identical IEEE
      // arithmetic. Output: per-(source, rep) counts — the upsampled
      // mixture manifest
      val docs = Tables.documents(s, d)
      val n1 = docs.filter(col("source") === "src1").count()
      Curation.mixtureSample(docs,
        Map("src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.125, "src4" -> 0.125),
        targetN = Some(6L * n1))
        .groupBy(col("source"), col("rep"))
        .agg(count(lit(1)).as("n_docs"))
    }),

    "q95_repeated_passages" -> ((s, d) =>
      // cross-document repeated-PASSAGE detection (the substring-level
      // dedup signal of Lee et al. 2022, "Deduplicating Training Data
      // Makes Language Models Better", via content-defined rolling
      // fingerprints instead of a suffix array): codegen Rabin-Karp
      // window hashes per doc (map-side, ~1 emitted per 2^4 positions,
      // shift-invariant so shared passages fingerprint identically
      // wherever they sit), one (fp, doc_id) longs-only shuffle, keep
      // fingerprints seen in >1 document — O(n·len/16) rows total, no
      // pairwise or suffix structure anywhere
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(graft.functions.GraftFunctions.rolling_fp(col("text"))).as("fp"))
        .groupBy(col("fp"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          min(col("doc_id")).as("first_doc"))
        .filter(col("n_docs") > 1)),

    "q97_kcore" -> ((s, d) => {
      // k-core of the near-dup candidate graph (q64's edge relation):
      // iterative peel to the maximal subgraph of min degree >= 3 —
      // the DENSE template-family cores, where CC (q64) finds any
      // transitively-connected blob and triangles (q81) score locally.
      // Adaptive driver fast path at this graph size; PipelineSpec
      // pins the distributed peel (localThreshold = 0) value-equal
      val edges = Dedup.simhashCandidates(Tables.documents(s, d), maxHamming = 8)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      TopicGraph.kCore(edges, k = 3)
    }),

    "q98_lpa_communities" -> ((s, d) => {
      // community detection over the same near-dup graph: 3 rounds of
      // deterministic synchronous label propagation (majority neighbor
      // label, ties to the smallest) — the cheap clustering that
      // separates template families sharing a weak bridge edge, which
      // single-linkage CC would merge into one blob
      val edges = Dedup.simhashCandidates(Tables.documents(s, d), maxHamming = 8)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      TopicGraph.labelPropagation(edges, iters = 3)
    }),

    "q99_hll_distinct" -> ((s, d) =>
      // per-language distinct-content cardinality as a MERGEABLE
      // HyperLogLog sketch (md5-prefix hash family, exact-integer
      // register math — Sketches scaladoc): registers shuffle at most
      // 64 rows per language however large the corpus, where the exact
      // countDistinct shuffles every distinct hash; n_zero_regs +
      // reg_sum make the register file reconstructible downstream
      Sketches.hllEstimate(Tables.documents(s, d), col("text"), Seq("lang"))),

    "q100_bloom_blocklist" -> ((s, d) => {
      // blocklist filtering, the broadcast way: build a 512-byte Bloom
      // filter from the blocked TEXTS (any source sharing a blocked
      // text is blocked too), test the whole corpus map-side (k md5
      // probes + array lookups, no shuffle), and exact-verify only as
      // accounting — n_fp measures the filter's real fp rate; zero
      // false negatives by construction (the exact anti-join this
      // replaces shuffles the corpus on the key at 100 TB)
      val docs = Tables.documents(s, d)
      val block = docs
        .filter(col("source") === "src0" && col("doc_id") % 7 === 0)
        .select(col("text")).distinct()
      val bits = Sketches.bloomBuild(block, col("text"))
      docs.select(col("source"), col("text"),
          when(Sketches.bloomMightContain(col("text"), bits), 1L)
            .otherwise(0L).as("bloom_hit"))
        .join(broadcast(block.withColumn("exact_hit", lit(1L))), Seq("text"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("bloom_hit")).as("n_bloom"),
          sum(coalesce(col("exact_hit"), lit(0L))).as("n_exact"),
          sum(when(col("bloom_hit") === 1 && col("exact_hit").isNull, 1L)
            .otherwise(0L)).as("n_fp"))
        .orderBy(col("source"))
    }),

    "q101_loghist_quantiles" -> ((s, d) =>
      // per-language p50/p90/p99 doc-length envelope read off MERGEABLE
      // log₂-histogram registers (≤64 rows per language however large
      // the corpus; two shards' registers merge by SUM) — the manifest
      // form of "is doc length drifting", where an exact per-group
      // quantile shuffles every value; read-off is integer arithmetic
      // over the registers, so [lo, hi] provably brackets the exact
      // quantile (Sketches.logHistQuantiles scaladoc)
      Sketches.logHistQuantiles(Tables.documents(s, d),
        length(col("text")).cast("long"), Seq("lang"))),

    "q102_editdist_pairs" -> ((s, d) =>
      // fuzzy entity-name matching for KG canonicalization: EXACT
      // edit-distance-<=1 self-join via deletion-neighborhood blocking
      // (FastSS) — O(L) keys per name instead of the O(n^2) all-pairs
      // join the oracle states directly; the levenshtein verify makes
      // blocking recall irrelevant to correctness (Dedup scaladoc for
      // the completeness argument and the no-flooded-bucket property)
      Dedup.editDistancePairs(Tables.customer(s, d), col("c_name"))),

    "q103_redirect_cycles" -> ((s, d) => {
      // redirect-cycle AUDIT: exactly which nodes of a functional
      // redirect graph sit on a loop and can never canonicalize — the
      // rows the closure operators (q25/q65) silently DROP by
      // NoLoopInPath semantics, surfaced for a data-quality gate.
      // Exact-power pointer doubling: ceil(log2 n) self-joins of a
      // relation that stays functional (<= n rows) throughout —
      // O(n log n) total vs the O(n^2) step-by-step walk
      val docs = Tables.documents(s, d)
      val n = docs.count()
      val edges = docs.select(col("doc_id").as("src"),
        (((col("doc_id") % n) * (col("doc_id") % n) + 3) % n).as("dst"))
      Redirects.cycleMembers(edges)
    }),

    "q104_cms_freq" -> ((s, d) => {
      // Count-Min point-frequency estimates: one register-building pass
      // over the corpus (<= 4x1024 counter rows however large it is,
      // map-side partial counts), then ANY later probe set answers
      // "how often does this text occur" by k broadcast lookups — no
      // corpus access at all. min over rows never underestimates
      // (every occurrence incremented all its counters); the register
      // file merges across shards by SUM (Sketches scaladoc)
      val docs = Tables.documents(s, d)
      val regs = Sketches.cmsRegisters(docs, col("text"))
      val probes = docs.filter(col("source") === "src3")
        .select(col("text")).distinct()
      Sketches.cmsEstimate(probes, col("text"), regs)
    }),

    "q105_jaccard_join_exact" -> ((s, d) =>
      // EXACT thresholded similarity join (AllPairs prefix filtering):
      // every distinct-token-set pair at Jaccard >= 19/20, complete by
      // the first-common-token argument (Dedup scaladoc), rational
      // threshold so all filters are integer cross-multiplication —
      // the auditable counterpart of the recall-lossy LSH tiers.
      // NB the synthetic corpus (31-word vocab, ~23 distinct tokens
      // per doc) is maximally adversarial for ANY exact similarity
      // join: the true result is output-dense (0.9 would emit ~18% of
      // all pairs), so the demo threshold sits at 0.95 where the
      // answer is selective; on a Zipf vocabulary the rarest-first
      // prefixes are what bounds the candidate fan-out
      Dedup.jaccardJoinExact(Tables.documents(s, d), col("doc_id"),
        col("text"), tauNum = 19, tauDen = 20)),

    "q106_ppr" -> ((s, d) => {
      // personalized PageRank from a 3-seed context set (the document's
      // already-resolved entities): restart AND dangling mass go to the
      // seeds, so rank = proximity to this context, not global fame —
      // the disambiguation companion of the q75 prior. Seeds = the 3
      // smallest node ids (deterministic, restated in the oracle)
      val e = aliasEdges(s, d)
      val nodes = e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node"))).distinct()
      val seeds = nodes.orderBy(col("node")).limit(3)
      TopicGraph.personalizedPageRank(e, seeds, iters = 5, damping = 0.85)
        .select(col("node"), round(col("rank"), 8).as("ppr_r8"))
    }),

    "q107_bfs_depth" -> ((s, d) => {
      // multi-source BFS hop distance from a 3-seed canonical set over
      // an out-degree-2 synthetic graph — PPR's exact integer skeleton
      // (first frontier touch = shortest hop; anti-join = the min).
      // Adaptive driver fast path at this size; the distributed
      // frontier loop is spec-pinned value-equal
      val seeds = Tables.documents(s, d)
        .select(col("doc_id").as("node")).orderBy(col("node")).limit(3)
      TopicGraph.hopDistance(degree2Edges(s, d), seeds)
    }),

    "q108_random_walks" -> ((s, d) => {
      // deterministic DeepWalk corpus: one 5-step seeded-hash walk per
      // node of the out-degree-2 graph (the q107 edge set — branching
      // is the point; the functional alias graph would leave the walk
      // no choice). Every engine replays the same walks (md5 scores)
      val edges = degree2Edges(s, d)
      val starts = edges.select(col("src").as("node")).distinct()
      TopicGraph.randomWalks(edges, starts, steps = 5)
    }),

    "q130_adamic_adar" -> ((s, d) =>
      // Adamic-Adar missing-link ranking over the undirected deg-2
      // synthetic graph: top-100 non-adjacent pairs by the
      // rare-common-neighbor score, computed in exact fixed-point
      // longs (each wedge contributes floor(1e9/ln(deg)) — sums are
      // exact integers, order-free); at power-law scale the opt-in
      // maxDeg seeded neighbor cap bounds hub wedge fan-out at f^2
      // (spec-pinned; default exact so the oracle is unchanged)
      TopicGraph.adamicAdar(degree2Edges(s, d), k = 100)),

    "q132_sgns_embeddings" -> ((s, d) => {
      // walks -> embeddings: the consumer that closes the q108/q126
      // walk corpus into trainable vectors (Embeddings scaladoc).
      // Full-batch fixed-point SGNS — hard-sigmoid gradients, exact
      // integer sums, seeded init/negatives — so the oracle replays
      // TRAINING bit-for-bit (2 epochs unrolled over the 3-step walk
      // corpus); output is the input-embedding table in fp6 longs
      val edges = degree2Edges(s, d)
      val starts = edges.select(col("src").as("node")).distinct()
      val walks = TopicGraph.randomWalks(edges, starts, steps = 3)
      Embeddings.sgnsTrain(walks, dim = 4, window = 2, negatives = 2,
          epochs = 2)
        .select(col("node"), col("k").cast("long").as("k"), col("v_fp"))
    }),

    "q134_link_pred_auc" -> ((s, d) => {
      // the KG-completion EVALUATION stage: hold out every 5th edge
      // by seeded hash, score distance-2-in-train candidates with the
      // q130 fixed-point Adamic-Adar arithmetic, and compute the
      // tie-aware ROC-AUC by exact integer rank statistics (the
      // single-partition running sum touches only |distinct scores|
      // rows — the pair relation never globally sorts). Over the
      // triangle-rich q81/q121 token-adjacency graph (the sparse
      // synthetic deg-2 graph leaves no held-out edge at train
      // distance 2 — a degenerate evaluation)
      val docs = Tables.documents(s, d)
      val pairs = zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => struct(a.as("src"), b.as("dst")))
      val edges = docs.select(explode(pairs).as("p"))
        .select(col("p.src").as("src"), col("p.dst").as("dst"))
        .filter(col("src") =!= col("dst"))
      TopicGraph.linkPredictionAuc(edges, testMod = 5)
    }),

    "q131_media_containers" -> ((s, d) => {
      // the container parsers BITE here: payloads are REAL PNG/WAV/
      // GIF/BMP bytes synthesized deterministically from doc_id
      // (every header field a pure formula of the id), then decoded
      // by the byte-level parsers — the oracle restates the formulas,
      // so any construction/parse offset slip mismatches (width !=
      // height by construction rules out swapped-field coincidences)
      val ids = Tables.documents(s, d)
        .select(col("doc_id").cast("long").as("media_id"))
      Multimodal.decodeMeta(Multimodal.syntheticContainers(ids)).toDF()
        .select(col("media_id"), col("format").as("kind"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_frames").cast("long").as("n_frames"),
          col("byte_len"))
    }),

    "q126_node2vec" -> ((s, d) => {
      // deterministic node2vec corpus: the q108 walk upgraded to the
      // second-order (p, q) bias — p=4 discourages returning, q=2
      // biases toward the previous node's neighborhood — realized as
      // an exact integer key·class minimization (no FP, the oracle
      // replays it bit-for-bit); step 1 unbiased per the paper
      val edges = degree2Edges(s, d)
      val starts = edges.select(col("src").as("node")).distinct()
      TopicGraph.node2vecWalks(edges, starts, steps = 5, p = 4, q = 2)
    }),

    "q109_hyperball" -> ((s, d) => {
      // HyperBall: per-node 3-hop neighborhood-size estimates by HLL
      // register propagation (register-wise max along edges = EXACTLY
      // the reachable set's register file, by the merge law) — the
      // neighborhood function N(v,3) at a per-node cost no BFS fleet
      // could afford at graph scale. Same exact-integer read-off as q99
      TopicGraph.hyperBall(degree2Edges(s, d), radius = 3)
    }),

    "q110_neighborhood_fn" -> ((s, d) => {
      // HyperBall's effective-diameter read-off as a RELATION: the
      // per-round neighborhood function N(r) over the q109 edge set,
      // r = 0..6, from the PACKED register propagation (one array<int>
      // row per node — 64x fewer shuffle rows than the row form the
      // oracle restates; value-equal by the max-merge law, spec-pinned).
      // Every column is exact-integer (digit-string totals, floor-
      // divided 1e4-scaled estimate sums — no float summation), the
      // strictly-decreasing reg_sum total is the integer fixpoint test,
      // and ed_reached marks the 0.9-effective-diameter rounds
      TopicGraph.neighborhoodFunction(degree2Edges(s, d), maxRadius = 6)
    }),

    "q112_harmonic_centrality" -> ((s, d) => {
      // harmonic centrality via HyperBall (Boldi & Vigna's headline
      // application): H(v) = Σ 1/d(v,u) from per-round ball sizes,
      // truncated at radius 4 — packed register propagation, the 1/r
      // weights cleared by lcm(1..4) = 12 so h_scaled is a plain long
      // (no float summation; h_harmonic is one per-row division).
      // Top-100 by centrality (node tie-break) — the seed-selection
      // shape this read-off exists for
      TopicGraph.harmonicCentrality(degree2Edges(s, d), radius = 4)
        .orderBy(col("h_scaled").desc, col("node"))
        .limit(100)
    }),

    "q113_bpe_merges" -> ((s, d) =>
      // distributed BPE tokenizer TRAINING (Sennrich 2016), 4 merge
      // rounds: ONE corpus shuffle (word-frequency vocab, map-side
      // partial count), then per round a vocab-sized adjacent-pair
      // SUM (map-side partial) + a single argmax row via TakeOrdered
      // + a map-side codegen `replace` merge on the double-space
      // encoding (Tokenizer scaladoc: the encoding makes plain
      // left-to-right replace EXACTLY the simultaneous BPE merge,
      // consecutive runs included). Ties break (cnt desc, l, r) —
      // engine/partitioning deterministic. Oracle: 4 unrolled rounds
      Tokenizer.learnMerges(Tables.documents(s, d), k = 4)),

    "q133_bpe_bytes" -> ((s, d) =>
      // BYTE-LEVEL BPE training (GPT-2 form, Radford 2019): the q113
      // rounds over the byte alphabet — every word decomposes to
      // UTF-8 bytes mapped through the 256-entry bytes_to_unicode
      // table (a codegen hex-pair + array-literal lookup chain, no
      // UDF), so no <unk> exists for ANY input at any scale; the
      // merge machinery, determinism, and shuffle shape are q113's
      Tokenizer.learnMerges(Tables.documents(s, d), k = 4,
        byteLevel = true)),

    "q114_bpe_tokens" -> ((s, d) =>
      // tokenizer APPLICATION with a fixed merge table (the
      // inference half): char-split + </w> per word, one chained
      // codegen replace per merge — pure map-side, zero shuffle until
      // the vocab-bounded histogram count. The table exercises
      // hierarchical merges (rank-3 consumes rank-1's and rank-2's
      // outputs)
      Tokenizer.bpeHistogram(Tables.documents(s, d), Q114Merges)),

    "q115_dsir_select" -> ((s, d) =>
      // DSIR data selection (Xie et al. 2023): hashed-unigram
      // importance weights of every document against the lang='en'
      // TARGET distribution, fixed-point per-bucket log-ratios
      // (integer per-doc sums — no float-summation hash risk), top-300
      // by score. Two 256-row map-side-combined count aggs, a
      // 256-entry broadcast map literal, zero-shuffle scoring,
      // TakeOrdered selection (Curation.dsirSelect scaladoc)
      Curation.dsirSelect(Tables.documents(s, d),
        target = col("lang") === "en", k = 300)),

    "q116_kcenter_select" -> ((s, d) =>
      // greedy k-center (Gonzalez 1985) DIVERSITY selection over the
      // embedding corpus — the coreset complement to q115's
      // importance selection: 6 centers, each round ONE map-side
      // min-distance update vs the new center + a TakeOrdered(1)
      // argmax; output is the non-increasing coverage-radius sequence
      // (Similarity.kCenterSelect scaladoc)
      Similarity.kCenterSelect(Tables.embeddings(s, d), k = 6)),

    "q120_weighted_sample" -> ((s, d) => {
      // Efraimidis–Spirakis weighted sampling without replacement,
      // length-weighted: key = ln(u)/w with a seeded 65536-grid md5
      // uniform, top-200 keys = an exact prob-∝-weight draw. Plan is
      // map-side scoring + TakeOrderedAndProject (k rows per task, no
      // global sort)
      val docs = Tables.documents(s, d)
      Curation.weightedSample(docs, length(col("text")).cast("double"), k = 200)
        .select(col("doc_id"), col("lang"), length(col("text")).as("w"))
    }),

    "q119_temperature_mix" -> ((s, d) => {
      // temperature-scaled mixture (XLM/mT5 α-smoothing, α = 0.5 over
      // languages): weights DERIVED from corpus counts (w ∝ n^α, the
      // ascending-key left-fold normalizer), realized through the
      // exact-N replica machinery — low-resource langs upsample with
      // integer replicas + a seeded fractional extra. Output: the
      // per-(lang, rep) mixture manifest
      val docs = Tables.documents(s, d)
      Curation.temperatureMixture(docs, "lang", alpha = 0.5, total = 1000)
        .groupBy(col("lang"), col("rep")).agg(count(lit(1)).as("n_docs"))
    }),

    "q88_ccnet_buckets" -> ((s, d) =>
      // CCNet head/middle/tail stratification: per-LANGUAGE terciles of
      // the unigram-LM score (rounded-then-ranked, doc_id tie-break, so
      // the tile is engine-deterministic); the per-lang window sorts an
      // id+score relation only (Curation.ccnetBuckets)
      Curation.ccnetBuckets(Tables.documents(s, d))),

    "q87_semdedup_kmeans" -> ((s, d) =>
      // SemDeDup with DATA-ADAPTED cells (the paper's own k-means
      // form): k ≈ √n sampled centroids (deterministic id stride),
      // broadcast O(n·k) nearest-centroid assignment (the q52 IVF
      // shape), exact pairwise cosine within cells, greedy
      // keep-min-id; q77 is the projection-cell (data-independent)
      // twin — same plan shape, cells trade recall differently
      Similarity.semDedupKMeans(Tables.embeddings(s, d), tau = 0.25)),

    "q83_quality_classifier" -> ((s, d) =>
      // fixed-weight logistic quality filter (fastText-filter stand-in;
      // a trained model is just a different weight vector) over the
      // rounded q46 feature columns — one map-side projection
      TextAnalysis.qualityScore(Tables.documents(s, d))
        .select(col("doc_id"), round(col("score"), 6).as("score_r6"), col("keep"))),

    "q82_incremental_dedup" -> ((s, d) => {
      // incremental dedup: every 10th doc plays the "new daily batch",
      // the rest the accumulated corpus whose SIGNATURE TABLE is the
      // persistent index. The index is a PRE-BUILT stage (one
      // Checkpoints.runStage per corpus — exactly Main's 07_sig_index),
      // so the query body measures what the operator advertises:
      // O(|new|) signature work + one band-bucket join against the
      // index, with the corpus text never re-scanned.
      val docs = Tables.documents(s, d)
      val newDocs = docs.filter(col("doc_id") % 10 === 0)
      Dedup.incrementalCandidates(newDocs, q82SigIndex(s, d))
        .select(col("id_new"), col("id_other"), col("within_batch"),
          round(col("est_jaccard"), 4).as("est_jaccard"))
    }),

    "q81_triangles" -> ((s, d) => {
      // per-node triangle counts over the full token-adjacency graph
      // (degree-ordered compact-forward — see TopicGraph.triangles);
      // community-density vs hub-noise signal for the entity graph
      val docs = Tables.documents(s, d)
      val pairs = zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => struct(a.as("src"), b.as("dst")))
      val edges = docs.select(explode(pairs).as("p"))
        .select(col("p.src").as("src"), col("p.dst").as("dst"))
        .filter(col("src") =!= col("dst"))
      TopicGraph.triangles(edges)
    }),

    "q129_containment_join" -> ((s, d) =>
      // exact asymmetric containment join over 3-shingle sets at
      // >= 0.8: "A quoted inside B" pairs the symmetric q105 Jaccard
      // join structurally misses — rarest-first prefix on the quote
      // side, full posting list on the container side (lossless,
      // proof in scaladoc), integer-arithmetic verify; at boilerplate
      // scale the opt-in maxDf common-code elimination bounds the
      // posting fan-out (spec-pinned; default exact so the oracle is
      // unchanged)
      Dedup.containmentJoinExact(Tables.documents(s, d),
        tauNum = 4, tauDen = 5)),

    "q128_source_kl" -> ((s, d) =>
      // per-source distribution-shift gate: KL(P_source || P_corpus)
      // over unigrams, exact up to the fixed-point ln grid (integer
      // sums — aggregation order can never move the hash); template
      // spam / mislabeled sources surface as outliers
      TextAnalysis.sourceKl(Tables.documents(s, d), "source")
        .withColumnRenamed("grp", "source")),

    "q127_zipf_slope" -> ((s, d) =>
      // per-language Zipf power-law slope over the top-32 terms —
      // corpus-health distribution gate (natural text ≈ −1). The
      // regression runs in exact fixed-point integer sums (the DSIR
      // trick), so aggregation order can never move the hash
      TextAnalysis.zipfSlope(Tables.documents(s, d), "lang", topK = 32)
        .withColumnRenamed("grp", "lang")),

    "q125_winnowing" -> ((s, d) =>
      // MOSS winnowing match report: robust-winnowed 4-gram/4-window
      // fingerprints, common-code elimination at df<=5 (bounds the
      // self-join fan-out at df² per hash), pairs ranked by distinct
      // shared fingerprints — the code-clone complement of q95's
      // content-defined passage mining (winnowing guarantees any
      // shared >=7-token run yields a shared fingerprint)
      Dedup.winnowingPairs(Tables.documents(s, d), k = 4, w = 4,
        maxDf = 5)),

    "q124_neighbor_sample" -> ((s, d) => {
      // GraphSAGE-style 2-hop neighbor sampling with fan-outs (2, 2)
      // over a ragged-degree synthetic graph (out-degree 1–4 by doc_id
      // residue, ids reduced before squaring — the q109/ADVICE
      // overflow rule): seeded-md5 ranked, dst tie-break — the bounded
      // GNN minibatch computation graph, ≤ 6 rows per root at ANY
      // degree skew
      val docs = Tables.documents(s, d)
      val n = docs.count()
      val id = col("doc_id")
      val e = docs.select(id.as("src"), ((id * 7 + 3) % n).as("dst"))
        .unionByName(docs.filter(id % 2 === 0)
          .select(id.as("src"), (((id % n) * (id % n) + 3) % n).as("dst")))
        .unionByName(docs.filter(id % 5 === 0)
          .select(id.as("src"), ((id * 11 + 1) % n).as("dst")))
        .unionByName(docs.filter(id % 10 === 0)
          .select(id.as("src"), ((id * 13 + 7) % n).as("dst")))
      TopicGraph.sampleNeighbors(e, fanouts = Seq(2, 2))
    }),

    "q123_incremental_cc" -> ((s, d) => {
      // incremental component maintenance: the committed alias-graph
      // component index absorbs a batch of new edges via the
      // contracted label graph — never re-reading the base edge set.
      // Output equals a full recompute over the union (the oracle
      // states exactly that recompute)
      val base = aliasEdges(s, d)
      val committed = TopicGraph.connectedComponents(base)
      val docs = Tables.documents(s, d)
      val n = docs.count()
      val delta = docs.filter(col("doc_id") % 25 === 0)
        .select(col("doc_id").as("src"),
          ((col("doc_id") * 13 + 7) % n).as("dst"))
      TopicGraph.incrementalComponents(committed, delta)
    }),

    "q122_bm25" -> ((s, d) =>
      // BM25 top-10 retrieval for a fixed 3-query workload — the
      // benchmark-retrieval/contamination-audit shape. Plan: ONE
      // map-side corpus pass building per-term tf COLUMNS (no
      // explode, no inverted-index shuffle), a 1-row N/avgdl/df
      // aggregate, literal-idf scoring, WindowGroupLimit top-k
      TextAnalysis.bm25TopK(Tables.documents(s, d),
        queries = Seq(
          1 -> Seq("hash", "join"),
          2 -> Seq("window", "scan", "table"),
          3 -> Seq("spark", "stream")),
        k = 10)),

    "q121_ktruss" -> ((s, d) => {
      // 3-round 4-truss peel of the q81 token-adjacency graph: every
      // surviving edge has >= 2 mutual neighbors after each round —
      // the community-core filter one notch above q97's k-core
      // (which keeps bridge edges between dense zones; the truss
      // drops them). Adaptive driver fast path at this graph size;
      // PipelineSpec pins the distributed loop value-equal
      val docs = Tables.documents(s, d)
      val pairs = zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => struct(a.as("src"), b.as("dst")))
      val edges = docs.select(explode(pairs).as("p"))
        .select(col("p.src").as("src"), col("p.dst").as("dst"))
        .filter(col("src") =!= col("dst"))
      TopicGraph.kTrussPeel(edges, k = 4, rounds = 3)
    }),

    "q48_fingerprint" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(TextAnalysis.fingerprint(col("text")).as("fp"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
        .filter(col("n_docs") > 1)),

    "q50_dedup_simhash_pairs" -> ((s, d) =>
      // SimHash near-dup SEARCH: 4x15-bit Hamming-ball banding over the
      // codegen simhash64 expression — candidates share a 15-bit chunk,
      // verified by bit_count(xor) <= 20. No adjacent-id or all-pairs
      // step anywhere; duplicates are found wherever they sit in the
      // corpus (Dedup.simhashCandidates).
      Dedup.simhashCandidates(Tables.documents(s, d), maxHamming = 20)),

    "q51_dedup_simhash" -> ((s, d) =>
      // per-doc 60-bit SimHash (custom Catalyst expression)
      Tables.documents(s, d).select(col("doc_id"),
        graft.functions.GraftFunctions.simhash64(col("text")).as("sh"))),

    "q55_vocab_stats" -> ((s, d) =>
      // corpus vocabulary statistics: exact distinct counting (the HLL
      // approx variant is the scale path; equivalence-within-tolerance
      // is asserted in PipelineSpec)
      Tables.documents(s, d)
        .select(col("lang"), explode(toks).as("tok"))
        .groupBy(col("lang"))
        .agg(countDistinct(col("tok")).as("n_vocab"),
          count(lit(1)).as("n_tokens"))),

    "q49_media_meta" -> ((s, d) => {
      // multimodal plumbing: binary payloads -> typed metadata via the
      // REAL container parsers (PNG IHDR / JPEG SOFn / GIF LSD / WAV
      // RIFF / BMP, Multimodal.parseMeta); this row's fixture payloads
      // are text so only the SQL-reproducible columns are checked here
      // — q131_media_containers oracle-checks the parsers themselves
      // over synthesized real container bytes
      val media = Multimodal.documentsAsMedia(Tables.documents(s, d))
      Multimodal.decodeMeta(media).toDF()
        .select(col("media_id"), col("byte_len"))
    }),

    "q62_asof_join" -> ((s, d) => {
      // as-of join: each purchase gets the user's most recent prior-or-
      // equal click (DuckDB's native ASOF JOIN is the oracle). Build
      // side pre-aggregated per (user, ts) for deterministic ties.
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(round(max(col("value")), 4).as("click_value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      Temporal.asofJoin(purchases, clicks)
        .select(col("event_id"), col("user_id"),
          col("asof_ts").as("click_ts"), col("asof_click_value").as("click_value"))
    }),

    "q64_connected_components" -> ((s, d) => {
      // near-dup components: banded simhash search (hamming <= 8 —
      // tight, so components are real duplicate clusters rather than
      // one giant blob on this template-similar corpus) feeding the
      // adaptive min-label/union-find component labeler
      val edges = Dedup.simhashCandidates(Tables.documents(s, d), maxHamming = 8)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      TopicGraph.connectedComponents(edges)
    }),

    "q70_dedup_keep_list" -> ((s, d) => {
      // the dedup DECISION stage: banded near-dup candidates -> connected
      // components -> canonical election (min doc_id per cluster) ->
      // per-doc keep/drop verdict. This is the row-level output a
      // training pipeline actually consumes (candidates and components
      // are its intermediates, q50/q64)
      val docs = Tables.documents(s, d)
      val edges = Dedup.simhashCandidates(docs, maxHamming = 8)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      val labels = TopicGraph.connectedComponents(edges)
      docs.select(col("doc_id"))
        .join(labels.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("label"), col("doc_id")).as("cluster"),
          (col("label").isNull || col("label") === col("doc_id")).cast("int").as("keep"))
    }),

    "q71_curated_corpus" -> ((s, d) => {
      // end-to-end curation composition: quality gate (>= 30 tokens,
      // distinct ratio >= 0.3) -> exact-dedup canonical only -> secret
      // redaction -> curated manifest row. One corpus scan feeds the
      // gate+redact (map-side); dedup adds the single hash shuffle.
      val docs = Tables.documents(s, d)
      val toksArr = split(col("text"), " ")
      val gated = docs
        .withColumn("n_tokens", size(toksArr).cast("long"))
        .withColumn("distinct_ratio",
          round(size(array_distinct(toksArr)).cast("double") / size(toksArr), 4))
        .filter(col("n_tokens") >= 30 && col("distinct_ratio") >= 0.3)
      val canon = gated
        .withColumn("content_hash", md5(col("text")))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("content_hash")).orderBy(col("doc_id"))))
        .filter(col("rk") === 1)
      canon.select(col("doc_id"), col("lang"), col("n_tokens"), col("distinct_ratio"),
        size(regexp_extract_all(col("text"), lit(Curation.SecretPattern), lit(0)))
          .cast("long").as("n_secrets"),
        md5(regexp_replace(col("text"), Curation.SecretPattern, "[REDACTED]"))
          .as("redacted_hash"))
    }),

    "q63_range_join" -> ((s, d) => {
      // interval-containment join: clicks falling inside a 30-minute
      // window after a signup of the same user (bucketed equi-join,
      // exact containment post-filter)
      val ev = Tables.events(s, d)
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id").as("signup_id"),
          col("ts").as("start_ts"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("end_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts"))
      Temporal.rangeJoin(clicks, signups)
        .select(col("click_id"), col("signup_id"), col("user_id"),
          (unix_timestamp(col("ts")) - unix_timestamp(col("start_ts")))
            .as("delta_sec"))
    }),

    "q61_tfidf_topterms" -> ((s, d) => {
      // per-doc top-3 TF-IDF terms: explode -> per-(doc,term) tf ->
      // per-term document frequency (one groupBy) -> join back ->
      // windowed top-k with deterministic tie-break. The df relation is
      // |vocab| rows — small next to the postings but NOT guaranteed
      // broadcastable at 100 TB (open-vocabulary corpora), so the join
      // strategy is left to AQE: it broadcasts when the runtime size
      // fits and falls back to shuffle when it doesn't, instead of a
      // forced-broadcast OOM.
      val docs = Tables.documents(s, d)
      val nDocs = docs.count()
      val postings = docs
        .select(col("doc_id"), explode(toks).as("term"))
        .groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val df = postings.groupBy(col("term"))
        .agg(countDistinct(col("doc_id")).as("df"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("term").asc)
      postings.join(df, Seq("term"))
        .withColumn("tfidf", round(col("tf") * log(lit(nDocs.toDouble) / col("df")), 6))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("term"), col("tfidf"))
    }),

    "q60_length_quantiles" -> ((s, d) =>
      // corpus length distribution per lang: exact interpolated
      // percentiles (the DuckDB-checkable oracle); approx_percentile is
      // the 100TB path (single-pass sketch, no sort) — equivalence
      // within tolerance asserted in PipelineSpec
      Tables.documents(s, d)
        .groupBy(col("lang"))
        .agg(
          round(expr("percentile(n_chars, 0.5)"), 2).as("p50"),
          round(expr("percentile(n_chars, 0.9)"), 2).as("p90"),
          round(expr("percentile(n_chars, 0.99)"), 2).as("p99"),
          max(col("n_chars")).as("max_chars"))),

    "q67_pack_shards" -> ((s, d) =>
      // sequence packing into 256-token training shards via a
      // distributed two-pass prefix sum (no global window)
      Curation.packShards(Tables.documents(s, d), budgetTokens = 256L)),

    "q56_sample_split" -> ((s, d) =>
      // deterministic md5-bucket train/val/test split + 1.2% sample —
      // reproducible across engines/runs/cluster sizes (no RNG)
      Curation.splitSummary(Tables.documents(s, d))),

    "q72_stratified_sample" -> ((s, d) =>
      // balanced-mix sampling: up to 40 docs per language, picked by
      // seeded-hash rank — deterministic across engines/runs/cluster
      // sizes, never a global sort (Curation.stratifiedSample)
      Curation.stratifiedSample(Tables.documents(s, d), "lang", 40)
        .select(col("doc_id"), col("lang"))),

    "q57_redact" -> ((s, d) =>
      // secret/PII scrubbing: match count + redacted-content hash
      Curation.redact(Tables.documents(s, d))),

    "q58_boilerplate" -> ((s, d) =>
      // CCNet/Gopher-style duplicate-chunk ratio per document
      Curation.boilerplate(Tables.documents(s, d))),

    "q59_contamination" -> ((s, d) => {
      // benchmark-contamination: shared shingles with a held-out set
      val docs = Tables.documents(s, d)
      Curation.contamination(
        docs.filter(col("doc_id") >= 20), docs.filter(col("doc_id") < 20))
    }))

  /** Queries with no DuckDB oracle — empty: every query carries a full
    * oracle (engine-specific hash families live in spec tests instead). */
  val rowsOnlyQueries: Set[String] = Set.empty

  /**
   * Distributed-path twins of the heavy graph queries: the IDENTICAL
   * pipelines with `localThreshold = 0`, forcing the distributed
   * loops that run at real scale. At sweep/sf1 graph sizes the
   * adaptive fast path makes the official rows time driver code for
   * this family (correct, and the right plan at those sizes), so the
   * bench's `graph_dist` leg times THESE — the 100×-scale plans —
   * alongside the default rows. Results are value-equal to the
   * official rows (spec-pinned per operator); q109's propagation is
   * always distributed (no fast path) and is timed in the same leg
   * for completeness.
   */
  def distGraphQueries: Map[String, (SparkSession, String) => DataFrame] = {
    def simhashEdges(s: SparkSession, d: String): DataFrame =
      Dedup.simhashCandidates(Tables.documents(s, d), maxHamming = 8)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
    Map(
      "q64_connected_components" -> ((s, d) =>
        TopicGraph.connectedComponents(simhashEdges(s, d),
          localThreshold = 0L)),
      "q75_pagerank" -> ((s, d) =>
        TopicGraph.pageRank(aliasEdges(s, d), iters = 5, damping = 0.85,
          localThreshold = 0L)
          .select(col("node"), round(col("rank"), 8).as("rank_r8"))),
      "q97_kcore" -> ((s, d) =>
        TopicGraph.kCore(simhashEdges(s, d), k = 3, localThreshold = 0L)),
      "q98_lpa_communities" -> ((s, d) =>
        TopicGraph.labelPropagation(simhashEdges(s, d), iters = 3,
          localThreshold = 0L)),
      "q103_redirect_cycles" -> ((s, d) => {
        val docs = Tables.documents(s, d)
        val n = docs.count()
        val edges = docs.select(col("doc_id").as("src"),
          (((col("doc_id") % n) * (col("doc_id") % n) + 3) % n).as("dst"))
        Redirects.cycleMembers(edges, localThreshold = 0L)
      }),
      "q107_bfs_depth" -> ((s, d) => {
        val seeds = Tables.documents(s, d)
          .select(col("doc_id").as("node")).orderBy(col("node")).limit(3)
        TopicGraph.hopDistance(degree2Edges(s, d), seeds,
          localThreshold = 0L)
      }),
      "q109_hyperball" -> ((s, d) =>
        TopicGraph.hyperBall(degree2Edges(s, d), radius = 3)),
      "q117_hits" -> ((s, d) =>
        TopicGraph.hits(aliasEdges(s, d), iters = 4, localThreshold = 0L)
          .select(col("node"), round(col("hub"), 8).as("hub_r8"),
            round(col("auth"), 8).as("auth_r8"))),
      "q121_ktruss" -> ((s, d) => {
        val docs = Tables.documents(s, d)
        val pairs = zip_with(
          slice(toks, lit(1), size(toks) - 1),
          slice(toks, lit(2), size(toks) - 1),
          (a, b) => struct(a.as("src"), b.as("dst")))
        val edges = docs.select(explode(pairs).as("p"))
          .select(col("p.src").as("src"), col("p.dst").as("dst"))
          .filter(col("src") =!= col("dst"))
        TopicGraph.kTrussPeel(edges, k = 4, rounds = 3,
          localThreshold = 0L)
      }),
      "q123_incremental_cc" -> ((s, d) => {
        val base = aliasEdges(s, d)
        val committed = TopicGraph.connectedComponents(base,
          localThreshold = 0L)
        val docs = Tables.documents(s, d)
        val n = docs.count()
        val delta = docs.filter(col("doc_id") % 25 === 0)
          .select(col("doc_id").as("src"),
            ((col("doc_id") * 13 + 7) % n).as("dst"))
        TopicGraph.incrementalComponents(committed, delta,
          localThreshold = 0L)
      }))
  }

  // =================================================================
  // DuckDB oracles (driver runs these on the same parquet tables)
  // =================================================================
  def oracleSql: Map[String, String] = Map(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY 1, 2""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
        |FROM lineitem WHERE l_quantity > 45 AND l_discount <= 0.02""".stripMargin,

    "q03_join_inner" ->
      """SELECT o_orderpriority, count(*) AS n_items, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,

    "q04_join_left_coalesce" ->
      """SELECT o_orderkey, coalesce(c_mktsegment, 'UNSEGMENTED') AS segment
        |FROM orders LEFT JOIN (SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 5000) c
        |ON o_custkey = c_custkey""".stripMargin,

    "q05_join_broadcast" ->
      """SELECT r_name, count(*) AS n_customers, round(avg(c_acctbal), 2) AS avg_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1""".stripMargin,

    "q06_semi_anti" ->
      """SELECT c_custkey, 'HAS_ORDERS' AS status FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT c_custkey, 'NO_ORDERS' AS status FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q07_self_join" ->
      """SELECT a.n_name AS nation_a, b.n_name AS nation_b, a.n_regionkey AS regionkey
        |FROM nation a JOIN nation b
        |ON a.n_regionkey = b.n_regionkey AND a.n_name < b.n_name""".stripMargin,

    "q08_cogroup_degrees" ->
      """SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
        | coalesce(n_customers, 0) AS n_customers,
        | coalesce(n_suppliers, 0) AS n_suppliers
        |FROM (SELECT c_nationkey AS nationkey, count(*) AS n_customers FROM customer GROUP BY 1) c
        |FULL OUTER JOIN (SELECT s_nationkey AS nationkey, count(*) AS n_suppliers FROM supplier GROUP BY 1) s
        |USING (nationkey)""".stripMargin,

    "q09_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",

    "q10_union_split" ->
      """SELECT o_orderkey, 'HIGH' AS bucket FROM orders WHERE o_totalprice > 200000
        |UNION ALL
        |SELECT o_orderkey, 'LOW' AS bucket FROM orders WHERE o_totalprice <= 200000""".stripMargin,

    "q11_orderby_topk" ->
      """SELECT o_orderkey, total, rank FROM (
        | SELECT o_orderkey, round(o_totalprice, 2) AS total,
        |  row_number() OVER (ORDER BY round(o_totalprice, 2) DESC, o_orderkey ASC) AS rank
        | FROM orders) WHERE rank <= 100""".stripMargin,

    "q12_window_latest" ->
      """SELECT o_custkey, o_orderkey AS latest_order FROM (
        | SELECT o_custkey, o_orderkey,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        | FROM orders) WHERE rn = 1""".stripMargin,

    "q13_events_window" ->
      """SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start, event_type, count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q14_window_running" ->
      // l_extendedprice tiebreaker == the engine's (total order; see
      // the query comment — without it the one colliding key pair at
      // sf0.1 makes the prefix multiset order-dependent)
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        | round(sum(l_extendedprice) OVER (
        |   PARTITION BY l_suppkey
        |   ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_revenue
        |FROM lineitem""".stripMargin,

    "q15_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_rows
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q16_sessionize" ->
      """WITH marked AS (
        | SELECT user_id, event_id, ts,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |       OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_session
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        | SELECT user_id, ts,
        |  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        | FROM marked)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        | count(*) AS n_events, min(ts) AS session_start, max(ts) AS session_end
        |FROM sessions GROUP BY 1, 2""".stripMargin,

    "q20_kg_codefiles" ->
      """SELECT doc_id, source AS repo, 'doc/' || doc_id AS path,
        | md5(text) AS commit, lang
        |FROM documents""".stripMargin,

    "q21_kg_mentions" ->
      s"""WITH $tokenPosSql
         |SELECT doc_id, CAST(i - 1 AS INT) AS pos,
         | CAST((i - 1) // 10 AS INT) AS sentence_order, surface
         |FROM tok WHERE surface IN ($dictInList)""".stripMargin,

    "q22_kg_mention_counts" ->
      s"""WITH $tokenPosSql,
         |m AS (
         |  SELECT doc_id, surface, count(*) AS n_mentions
         |  FROM tok WHERE surface IN ($dictInList)
         |  GROUP BY 1, 2)
         |SELECT m.doc_id, m.surface, dict.entity, dict.etype, m.n_mentions,
         | 'http://graft.dev/' || d.lang || '/entity/' || dict.entity AS uri
         |FROM m
         |JOIN (VALUES $dictSqlValues) dict(surface, entity, etype) ON m.surface = dict.surface
         |JOIN documents d ON m.doc_id = d.doc_id""".stripMargin,

    "q23_kg_alias_edges" ->
      """SELECT doc_id AS src, (doc_id*7+3) % (SELECT count(*) FROM documents) AS dst
        |FROM documents WHERE doc_id % 10 = 0""".stripMargin,

    "q24_kg_resolve_1hop" ->
      s"""WITH $aliasEdgesSql,
         |refs AS (
         |  SELECT doc_id AS src_doc, (doc_id*3+1) % (SELECT count(*) FROM documents) AS ref
         |  FROM documents)
         |SELECT r.src_doc, coalesce(e.dst, r.ref) AS resolved
         |FROM refs r LEFT JOIN edges e ON r.ref = e.src""".stripMargin,

    "q25_kg_closure" ->
      s"""WITH RECURSIVE $aliasEdgesSql,
         |walk AS (
         |  SELECT src, dst, [src] AS path FROM edges
         |  UNION ALL
         |  SELECT w.src, e.dst, list_append(w.path, w.dst)
         |  FROM walk w JOIN edges e ON w.dst = e.src
         |  WHERE NOT list_contains(w.path, w.dst))
         |SELECT DISTINCT w.src, w.dst AS root FROM walk w
         |WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.src = w.dst)""".stripMargin,

    "q66_heavy_hitters" ->
      """WITH t AS (
        | SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |n AS (SELECT count(*) AS c FROM t)
        |SELECT tok, count(*) AS n_occ
        |FROM t, n GROUP BY tok, n.c
        |HAVING count(*) >= c / 40.0""".stripMargin,

    "q65_closure_doubling" ->
      s"""WITH RECURSIVE $aliasEdgesSql,
         |walk AS (
         |  SELECT src, dst, [src] AS path FROM edges
         |  UNION ALL
         |  SELECT w.src, e.dst, list_append(w.path, w.dst)
         |  FROM walk w JOIN edges e ON w.dst = e.src
         |  WHERE NOT list_contains(w.path, w.dst))
         |SELECT DISTINCT w.src, w.dst AS root FROM walk w
         |WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.src = w.dst)""".stripMargin,

    "q26_kg_degrees" ->
      s"""WITH $entityEdgesSql,
         |o AS (SELECT src AS node, count(*) AS broaderCount FROM edges GROUP BY 1),
         |i AS (SELECT dst AS node, count(*) AS narrowerCount FROM edges GROUP BY 1)
         |SELECT coalesce(o.node, i.node) AS node,
         | coalesce(narrowerCount, 0) AS narrowerCount,
         | coalesce(broaderCount, 0) AS broaderCount
         |FROM o FULL OUTER JOIN i USING (node)""".stripMargin,

    "q27_kg_ancestry" ->
      s"""WITH RECURSIVE $entityEdgesSql,
         |down AS (SELECT DISTINCT dst AS parent, src AS child FROM edges),
         |walk AS (
         |  SELECT 'spark' AS node, 'spark' AS root, 0 AS depth, 'spark' AS path
         |  UNION ALL
         |  SELECT d.child, w.root, w.depth + 1, w.path || '/' || d.child
         |  FROM walk w JOIN down d ON w.node = d.parent
         |  WHERE w.depth < 3
         |    AND NOT list_contains(string_split(w.path, '/'), d.child))
         |SELECT node, root, depth, path FROM walk""".stripMargin,

    "q84_kg_ancestry_dedup" ->
      // the frontier-dedup default unrolled level by level (a recursive
      // CTE cannot re-aggregate min(path) per level under UNION
      // semantics — same unrolling trick as the q75 PageRank oracle):
      // each level expands only the previous level's kept min-paths
      s"""WITH $entityEdgesSql,
         |down AS (SELECT DISTINCT dst AS parent, src AS child FROM edges),
         |l0 AS (SELECT 'spark' AS node, 'spark' AS root, 0 AS depth, 'spark' AS path),
         |l1 AS (
         |  SELECT d.child AS node, l.root, 1 AS depth, min(l.path || '/' || d.child) AS path
         |  FROM l0 l JOIN down d ON l.node = d.parent
         |  WHERE NOT list_contains(string_split(l.path, '/'), d.child)
         |  GROUP BY 1, 2),
         |l2 AS (
         |  SELECT d.child AS node, l.root, 2 AS depth, min(l.path || '/' || d.child) AS path
         |  FROM l1 l JOIN down d ON l.node = d.parent
         |  WHERE NOT list_contains(string_split(l.path, '/'), d.child)
         |  GROUP BY 1, 2),
         |l3 AS (
         |  SELECT d.child AS node, l.root, 3 AS depth, min(l.path || '/' || d.child) AS path
         |  FROM l2 l JOIN down d ON l.node = d.parent
         |  WHERE NOT list_contains(string_split(l.path, '/'), d.child)
         |  GROUP BY 1, 2)
         |SELECT node, root, depth, path FROM l0
         |UNION ALL SELECT node, root, depth, path FROM l1
         |UNION ALL SELECT node, root, depth, path FROM l2
         |UNION ALL SELECT node, root, depth, path FROM l3""".stripMargin,

    "q28_kg_annotated" -> {
      val caseExpr = dict.map { case (sf, _, tp) =>
        s"WHEN t = '$sf' THEN '<START:$tp> ' || t || ' <END>'"
      }.mkString(" ")
      s"""SELECT doc_id,
         | array_to_string(list_transform(string_split(text, ' '),
         |   t -> CASE $caseExpr ELSE t END), ' ') AS annotated
         |FROM documents""".stripMargin
    },

    "q29_kg_concat_distinct" ->
      """SELECT lang,
        | array_to_string(list_sort(list_distinct(list(source))), ' ') AS sources
        |FROM documents GROUP BY lang""".stripMargin,

    "q30_kg_quality_gate" ->
      """SELECT doc_id, CAST(length(string_split(text, ' ')) AS INT) AS n_words
        |FROM documents WHERE length(string_split(text, ' ')) >= 30""".stripMargin,

    "q31_kg_tsv_safe" ->
      """SELECT doc_id,
        | '"' || replace(regexp_replace(text, '[\t\n]', ' ', 'g'), '"', '""') || '"' AS safe_text
        |FROM documents""".stripMargin,

    "q32_kg_triples_nt" ->
      s"""WITH $tokenPosSql,
         |m AS (
         |  SELECT DISTINCT doc_id, surface
         |  FROM tok WHERE surface IN ($dictInList))
         |SELECT '<http://graft.dev/doc/' || m.doc_id || '> <http://graft.dev/ontology#mentions> <http://graft.dev/'
         |  || d.lang || '/entity/' || dict.entity || '> .' AS line
         |FROM m
         |JOIN (VALUES $dictSqlValues) dict(surface, entity, etype) ON m.surface = dict.surface
         |JOIN documents d ON m.doc_id = d.doc_id""".stripMargin,

    "q33_kg_noloop_paths" ->
      """SELECT doc_id, path,
        | CAST(NOT list_contains(parts[1:length(parts)-1], parts[length(parts)]) AS INT) AS no_loop
        |FROM (
        | SELECT doc_id,
        |  (doc_id % 7) || '/' || ((doc_id*3+1) % 7) || '/' || ((doc_id*5+2) % 7) AS path,
        |  string_split((doc_id % 7) || '/' || ((doc_id*3+1) % 7) || '/' || ((doc_id*5+2) % 7), '/') AS parts
        | FROM documents)""".stripMargin,

    "q34_kg_skew_join" ->
      s"""WITH $tokenPosSql
         |SELECT dict.entity, dict.etype, count(*) AS n_mentions
         |FROM tok JOIN (VALUES $dictSqlValues) dict(surface, entity, etype)
         |  ON tok.surface = dict.surface
         |GROUP BY 1, 2""".stripMargin,

    "q35_kg_merge_annotated" -> {
      val caseExpr = dict.map { case (sf, _, tp) =>
        s"WHEN surface = '$sf' THEN '<START:$tp> ' || surface || ' <END>'"
      }.mkString(" ")
      s"""WITH $tokenPosSql
         |SELECT doc_id, CAST((i - 1) // 10 AS INT) AS sentence_order,
         | string_agg(CASE $caseExpr ELSE surface END, ' ' ORDER BY i) AS annotated
         |FROM tok GROUP BY 1, 2""".stripMargin
    },

    "q68_kg_onetype_corpus" -> {
      val inList = dict.filter(_._3 == "OPERATOR").map(s => s"'${s._1}'").mkString(", ")
      s"""WITH $tokenPosSql
         |SELECT doc_id, CAST((i - 1) // 10 AS INT) AS sentence_order,
         | string_agg(CASE WHEN surface IN ($inList)
         |   THEN '<START:OPERATOR> ' || surface || ' <END>'
         |   ELSE surface END, ' ' ORDER BY i) AS annotated,
         | CAST(sum(CASE WHEN surface IN ($inList) THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_type_mentions
         |FROM tok GROUP BY 1, 2
         |HAVING sum(CASE WHEN surface IN ($inList) THEN 1 ELSE 0 END) > 0""".stripMargin
    },

    "q36_kg_capped_abstracts" ->
      """WITH sized AS (
        |  SELECT lang, doc_id, text,
        |   greatest(100000 // count(*) OVER (PARTITION BY lang), 200) AS per
        |  FROM documents),
        |cut AS (
        |  SELECT lang, doc_id,
        |   CASE WHEN length(text) <= per THEN text
        |        WHEN strpos(substring(text, per), ' ') > 0
        |          THEN substring(text, 1, per - 2 + strpos(substring(text, per), ' '))
        |        ELSE substring(text, 1, per) END AS t
        |  FROM sized),
        |w AS (
        |  SELECT lang, doc_id, t,
        |   row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS r,
        |   coalesce(sum(length(t)) OVER (PARTITION BY lang ORDER BY doc_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        |  FROM cut)
        |SELECT lang, string_agg(t, ' ' ORDER BY r) AS abstracts
        |FROM w WHERE 100000 - cum - greatest(r - 2, 0) > 0
        |GROUP BY lang""".stripMargin,

    "q38_kg_grounding" ->
      s"""WITH $tokenPosSql,
         |docq AS (
         |  SELECT doc_id, CAST(length(string_split(text, ' ')) >= 30 AS INT) AS quality
         |  FROM documents),
         |m AS (
         |  SELECT surface, count(DISTINCT tok.doc_id) AS n_docs,
         |   max(CASE WHEN quality = 1 THEN 1 END) AS q_marker
         |  FROM tok JOIN docq ON tok.doc_id = docq.doc_id
         |  WHERE surface IN ($dictInList)
         |  GROUP BY surface)
         |SELECT dict.entity,
         | coalesce(m.n_docs, 0) AS n_docs,
         | coalesce(m.q_marker, 0) AS has_quality_doc
         |FROM (VALUES $dictSqlValues) dict(surface, entity, etype)
         |LEFT JOIN m ON dict.surface = m.surface""".stripMargin,

    "q37_kg_ner_corpus" -> {
      val wrapCase = dict.map { case (sf, _, t) =>
        s"WHEN surface = '$sf' THEN '<START:$t> ' || surface || ' <END>'"
      }.mkString(" ")
      s"""WITH tok AS (
         |  SELECT doc_id, lang, source, text, z[1] AS surface, CAST(z[2] AS BIGINT) AS i
         |  FROM (SELECT doc_id, lang, source, text,
         |          unnest(list_zip(toks, generate_series(1, length(toks)))) AS z
         |        FROM (SELECT doc_id, lang, source, text,
         |                string_split(text, ' ') AS toks FROM documents)))
         |SELECT
         | 'http://graft.dev/' || lang || '/entity/' ||
         |   replace(source || '/doc/' || doc_id, '/', '%2F') AS uri,
         | CAST((i - 1) // 10 + 1 AS INT) AS sentenceOrder,
         | string_agg(CASE $wrapCase ELSE surface END, ' ' ORDER BY i) AS annotated,
         | sha256(text) AS sha256
         |FROM tok
         |GROUP BY doc_id, lang, source, text, (i - 1) // 10
         |HAVING sum(CASE WHEN surface IN ($dictInList) THEN 1 ELSE 0 END) > 0""".stripMargin
    },

    "q39_kg_entity_contexts" ->
      s"""WITH $tokenPosSql,
         |sent AS (
         |  SELECT doc_id, CAST((i - 1) // 10 AS INT) AS w,
         |   string_agg(surface, ' ' ORDER BY i) AS sentence
         |  FROM tok GROUP BY 1, 2),
         |hits AS (
         |  SELECT DISTINCT doc_id, CAST((i - 1) // 10 AS INT) AS w, surface
         |  FROM tok WHERE surface IN ($dictInList)),
         |ctx AS (
         |  SELECT h.surface, h.doc_id * 100000 + h.w AS k, s.sentence AS v
         |  FROM hits h JOIN sent s ON h.doc_id = s.doc_id AND h.w = s.w),
         |sized AS (
         |  SELECT surface, k, v,
         |   greatest(100000 // count(*) OVER (PARTITION BY surface), 200) AS per
         |  FROM ctx),
         |cut AS (
         |  SELECT surface, k,
         |   CASE WHEN length(v) <= per THEN v
         |        WHEN strpos(substring(v, per), ' ') > 0
         |          THEN substring(v, 1, per - 2 + strpos(substring(v, per), ' '))
         |        ELSE substring(v, 1, per) END AS t
         |  FROM sized),
         |w AS (
         |  SELECT surface, t,
         |   row_number() OVER (PARTITION BY surface ORDER BY k) AS r,
         |   coalesce(sum(length(t)) OVER (PARTITION BY surface ORDER BY k
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
         |  FROM cut)
         |SELECT w.surface,
         | (SELECT count(*) FROM ctx c WHERE c.surface = w.surface) AS n_occurrences,
         | string_agg(t, ' ' ORDER BY r) AS context
         |FROM w WHERE 100000 - cum - greatest(r - 2, 0) > 0
         |GROUP BY w.surface""".stripMargin,

    "q40_dedup_exact" ->
      """SELECT md5(text) AS content_hash, count(*) AS n_dups, min(doc_id) AS canonical_id
        |FROM documents GROUP BY 1 HAVING count(*) > 1""".stripMargin,

    "q41_dedup_jaccard" ->
      // exact n-gram Jaccard over the SIMHASH banded candidate edges
      // (simhash CTE chain shared with the q50/q64/q70 family; `shg`
      // avoids colliding with the chain's own `sh` CTE)
      s"""WITH $simhashShCte,
         |${simhashEdgeCte(20)},
         |shg AS (
         | SELECT doc_id,
         |  list_transform(range(1, greatest(length(toks) - 1, 2)),
         |    i -> array_to_string(toks[i:i+2], ' ')) AS sh
         | FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))
         |SELECT e.src AS id_a, e.dst AS id_b,
         | round(CASE WHEN length(list_distinct(list_concat(a.sh, b.sh))) = 0 THEN 0.0
         |  ELSE CAST(length(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |    / length(list_distinct(list_concat(a.sh, b.sh))) END, 4) AS jaccard
         |FROM e
         |JOIN shg a ON e.src = a.doc_id
         |JOIN shg b ON e.dst = b.doc_id""".stripMargin,

    "q42_dedup_minhash" ->
      s"""WITH $minhashPairsCte
         |SELECT id_a, id_b,
         | round(length(list_filter(list_zip(sig_a, sig_b), z -> z[1] = z[2])) / 16.0, 4)
         |   AS est_jaccard
         |FROM pairs""".stripMargin,

    "q73_dedup_verified" ->
      s"""WITH $minhashPairsCte
         |SELECT p.id_a, p.id_b,
         | round(CASE WHEN length(list_distinct(list_concat(a.sh, b.sh))) = 0 THEN 0.0
         |  ELSE CAST(length(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |    / length(list_distinct(list_concat(a.sh, b.sh))) END, 4) AS jaccard
         |FROM pairs p
         |JOIN sh a ON p.id_a = a.doc_id
         |JOIN sh b ON p.id_b = b.doc_id
         |WHERE round(CASE WHEN length(list_distinct(list_concat(a.sh, b.sh))) = 0 THEN 0.0
         |  ELSE CAST(length(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |    / length(list_distinct(list_concat(a.sh, b.sh))) END, 4) >= 0.7""".stripMargin,

    "q43_sim_topk" ->
      s"""WITH scored AS (
         | SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
         |  ${safeCosSql("p", "c")} AS cos
         | FROM embeddings p JOIN embeddings c ON p.vec_id <> c.vec_id
         | WHERE p.vec_id % 50 = 0)
         |SELECT probe_id, cand_id, round(cos, 4) AS cos, rank FROM (
         | SELECT probe_id, cand_id, cos,
         |  row_number() OVER (PARTITION BY probe_id
         |    ORDER BY cos DESC, cand_id ASC) AS rank
         | FROM scored) WHERE rank <= 5""".stripMargin,

    "q118_sim_sq8" ->
      // restates sq8Reconstruct verbatim: per-dim min/max, code =
      // round((v−mn)·255/(mx−mn)) clamped [0,255] (round is HALF-UP /
      // ties-away in both engines), decode mn + code·(mx−mn)/255,
      // degenerate dim → mn; then the q43 brute-force top-5 over the
      // reconstructed vectors
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |dims AS (
         | SELECT vec_id, CAST(z[2] AS INT) AS i, CAST(z[1] AS DOUBLE) AS v
         | FROM (SELECT vec_id,
         |   unnest(list_zip(emb, generate_series(1, len(emb)))) AS z FROM e)),
         |stats AS MATERIALIZED (
         | SELECT i, min(v) AS mn, max(v) AS mx FROM dims GROUP BY 1),
         |dec AS MATERIALIZED (
         | SELECT d.vec_id, list(CASE WHEN s.mx = s.mn THEN s.mn
         |   ELSE s.mn + least(greatest(
         |     round((d.v - s.mn) * 255.0::DOUBLE / (s.mx - s.mn)),
         |     0.0::DOUBLE), 255.0::DOUBLE) * (s.mx - s.mn) / 255.0::DOUBLE END
         |   ORDER BY d.i) AS embedding
         | FROM dims d JOIN stats s USING (i) GROUP BY 1),
         |scored AS (
         | SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
         |  ${safeCosSql("p", "c")} AS cos
         | FROM dec p JOIN dec c ON p.vec_id <> c.vec_id
         | WHERE p.vec_id % 50 = 0)
         |SELECT probe_id, cand_id, round(cos, 4) AS cos, rank FROM (
         | SELECT probe_id, cand_id, cos,
         |  row_number() OVER (PARTITION BY probe_id
         |    ORDER BY cos DESC, cand_id ASC) AS rank
         | FROM scored) WHERE rank <= 5""".stripMargin,

    "q44_sim_lsh" ->
      (s"""WITH $signLshBkCte,
        |cand AS (
        | SELECT DISTINCT p.vec_id AS probe_id, c.vec_id AS cand_id
        | FROM bk p JOIN bk c ON p.bucket = c.bucket AND p.vec_id <> c.vec_id
        | WHERE p.vec_id % 50 = 0),
        |scored AS (
        | SELECT cand.probe_id, cand.cand_id, """.stripMargin +
      safeCosSql("p", "c") +
      """ AS cos
        | FROM cand
        | JOIN embeddings p ON cand.probe_id = p.vec_id
        | JOIN embeddings c ON cand.cand_id = c.vec_id)
        |SELECT probe_id, cand_id, round(cos, 4) AS cos, rank FROM (
        | SELECT probe_id, cand_id, cos,
        |  row_number() OVER (PARTITION BY probe_id
        |    ORDER BY cos DESC, cand_id ASC) AS rank
        | FROM scored) WHERE rank <= 5""".stripMargin),

    "q53_emb_neardup" ->
      (s"""WITH $signLshBkCte,
        |cand AS (
        | SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b
        | FROM bk a JOIN bk c ON a.bucket = c.bucket AND a.vec_id < c.vec_id),
        |scored AS (
        | SELECT cand.id_a, cand.id_b, """.stripMargin +
      safeCosSql("a", "c") +
      """ AS cos
        |FROM cand
        |JOIN embeddings a ON cand.id_a = a.vec_id
        |JOIN embeddings c ON cand.id_b = c.vec_id)
        |SELECT id_a, id_b, round(cos, 4) AS cos FROM scored
        |WHERE cos >= 0.25""".stripMargin),

    "q92_sim_lsh_capped" ->
      // q53 + the hot-bucket cap: band buckets holding more than 12
      // vectors are excluded from the pair join (restates
      // Similarity.signLshPairs maxBucketSize — count per exploded
      // band key, keep <= cap, join back)
      (s"""WITH $signLshBkCte,
        |cnt AS (SELECT bucket, count(*) AS n FROM bk GROUP BY 1),
        |ok AS (SELECT bucket FROM cnt WHERE n <= 12),
        |cand AS (
        | SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b
        | FROM bk a JOIN ok USING (bucket)
        | JOIN bk c ON a.bucket = c.bucket AND a.vec_id < c.vec_id),
        |scored AS (
        | SELECT cand.id_a, cand.id_b, """.stripMargin +
      safeCosSql("a", "c") +
      """ AS cos
        |FROM cand
        |JOIN embeddings a ON cand.id_a = a.vec_id
        |JOIN embeddings c ON cand.id_b = c.vec_id)
        |SELECT id_a, id_b, round(cos, 4) AS cos FROM scored
        |WHERE cos >= 0.25""".stripMargin),

    "q52_sim_ivf" ->
      // centroids = vectors at id stride n/16 (Similarity.ivfTopK's
      // spread-sampled seeds, the q87 convention)
      ("""WITH st AS (
        | SELECT greatest(1, CAST(count(*) AS BIGINT) // 16) AS stride
        | FROM embeddings),
        |cents AS (
        | SELECT vec_id AS cent_id, embedding::DOUBLE[] AS cv
        | FROM embeddings WHERE vec_id % (SELECT stride FROM st) = 0),
        |assign AS (
        | SELECT vec_id, embedding, cell FROM (
        |  SELECT e.vec_id, e.embedding, c.cent_id AS cell,
        |   row_number() OVER (PARTITION BY e.vec_id
        |     ORDER BY list_distance(e.embedding::DOUBLE[], c.cv) ASC, c.cent_id ASC) AS rk
        |  FROM embeddings e CROSS JOIN cents c) WHERE rk = 1),
        |scored AS (
        | SELECT p.vec_id AS probe_id, c.vec_id AS cand_id, """.stripMargin +
      safeCosSql("p", "c") +
      """ AS cos
        | FROM assign p JOIN assign c ON p.cell = c.cell AND p.vec_id <> c.vec_id
        | WHERE p.vec_id % 50 = 0)
        |SELECT probe_id, cand_id, round(cos, 4) AS cos, rank FROM (
        | SELECT probe_id, cand_id, cos,
        |  row_number() OVER (PARTITION BY probe_id
        |    ORDER BY cos DESC, cand_id ASC) AS rank
        | FROM scored) WHERE rank <= 5""".stripMargin),

    "q45_langid" -> {
      val branches = TextAnalysis.langMarkers.toSeq.sortBy(_._1).map { case (lang, words) =>
        val inList = words.map(w => s"'$w'").mkString(", ")
        s"""SELECT doc_id, '$lang' AS cand_lang,
           | CAST(length(list_filter(string_split(text, ' '), t -> t IN ($inList))) AS BIGINT) AS hits
           |FROM documents""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""SELECT doc_id, cand_lang, hits,
         | row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, cand_lang ASC) AS rank
         |FROM ($branches)""".stripMargin
    },

    "q46_quality" ->
      """SELECT doc_id,
        | CAST(length(toks) AS BIGINT) AS n_tokens,
        | CAST(length(list_distinct(toks)) AS BIGINT) AS n_distinct,
        | round(CAST(length(list_distinct(toks)) AS DOUBLE) / length(toks), 4) AS distinct_ratio,
        | round(CAST(length(list_filter(toks, t -> t IN ('the','a','of','and'))) AS DOUBLE) / length(toks), 4) AS stopword_ratio,
        | round(CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / length(toks), 4) AS mean_token_len,
        | CAST(length(toks) >= 30 AS INT) AS long_enough
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)""".stripMargin,

    "q47_tokens" ->
      """SELECT doc_id,
        | CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        | CAST(list_sum(list_transform(string_split(text, ' '),
        |   t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS n_subwords,
        | CAST(length(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe
        |FROM documents""".stripMargin,

    "q74_repetition_signals" ->
      """WITH bg AS (
        | SELECT doc_id, length(text) AS len,
        |  unnest(list_transform(range(1, greatest(length(toks), 2)),
        |    i -> array_to_string(toks[i:i+1], ' '))) AS g
        | FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)),
        |cnt AS (SELECT doc_id, len, g, count(*) AS c FROM bg GROUP BY 1, 2, 3),
        |top AS (
        | SELECT doc_id, len, g, c,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g DESC) AS rk
        | FROM cnt),
        |dwr AS (
        | SELECT doc_id,
        |  round(1.0 - CAST(length(list_distinct(w)) AS DOUBLE) / length(w), 4)
        |    AS dup_window_ratio
        | FROM (SELECT doc_id,
        |        list_transform(range(0, CAST(ceil(length(toks) / 10.0) AS INT)),
        |          i -> array_to_string(toks[i*10+1 : i*10+10], ' ')) AS w
        |       FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)))
        |SELECT t.doc_id, d.dup_window_ratio, t.g AS top_bigram,
        | round(least(1.0, t.c * (length(t.g) + 1) / CAST(t.len AS DOUBLE)), 4)
        |   AS top_bigram_fraction
        |FROM top t JOIN dwr d USING (doc_id) WHERE rk = 1""".stripMargin,

    "q75_pagerank" -> pageRankOracleSql,

    "q117_hits" -> hitsOracleSql,

    "q122_bm25" -> bm25OracleSql,

    "q129_containment_join" ->
      // restates containmentJoinExact verbatim: distinct 3-shingle
      // sets, df-rarest-first per-doc arrays, prefix length
      // sz − ((4·sz+4)//5) + 1 on the quote side vs the full posting
      // list, distinct candidates, integer verify 5·|A∩B| ≥ 4·|A|
      """WITH sh0 AS (
        | SELECT doc_id, list_distinct(list_transform(
        |   range(1, greatest(length(toks) - 1, 2)),
        |   i -> array_to_string(toks[i:i+2], ' '))) AS ss
        | FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
        |tk AS MATERIALIZED (SELECT doc_id, unnest(ss) AS tok FROM sh0),
        |dfreq AS MATERIALIZED (
        | SELECT tok, count(*)::BIGINT AS df FROM tk GROUP BY 1),
        |arrs AS MATERIALIZED (
        | SELECT t.doc_id, list(t.tok ORDER BY d.df, t.tok) AS arr,
        |   count(*)::BIGINT AS sz
        | FROM tk t JOIN dfreq d USING (tok) GROUP BY 1),
        |pref AS MATERIALIZED (
        | SELECT doc_id AS doc_a,
        |  unnest(arr[1:CAST(sz - ((4*sz + 4) // 5) + 1 AS INT)]) AS tok
        | FROM arrs),
        |post AS MATERIALIZED (SELECT doc_id AS doc_b, unnest(arr) AS tok FROM arrs),
        |cand AS MATERIALIZED (
        | SELECT DISTINCT doc_a, doc_b FROM pref JOIN post USING (tok)
        | WHERE doc_a <> doc_b)
        |SELECT c.doc_a, c.doc_b,
        | round(len(list_intersect(a.arr, b.arr))::DOUBLE / a.sz::DOUBLE, 6)
        |   AS containment_r6
        |FROM cand c JOIN arrs a ON a.doc_id = c.doc_a
        | JOIN arrs b ON b.doc_id = c.doc_b
        |WHERE 5 * len(list_intersect(a.arr, b.arr)) >= 4 * a.sz""".stripMargin,

    "q128_source_kl" ->
      // restates sourceKl verbatim: exact integer S = sum cs*(lnfp(cs)
      // - lnfp(c)), KL = (S/Ts - lnfp(Ts) + lnfp(T)) / 1e6, pinned
      // expression order, round 6
      """WITH tok AS (
        |  SELECT source AS grp, unnest(string_split(text, ' ')) AS t
        |  FROM documents),
        |bg AS MATERIALIZED (
        |  SELECT grp, t, count(*)::BIGINT AS cs FROM tok
        |  WHERE t <> '' GROUP BY 1, 2),
        |gl AS MATERIALIZED (SELECT t, sum(cs)::BIGINT AS c FROM bg GROUP BY 1),
        |tt AS (SELECT sum(c)::BIGINT AS tt FROM gl),
        |ag AS (
        |  SELECT b.grp, sum(b.cs)::BIGINT AS ts,
        |   sum(b.cs * (CAST(floor(ln(b.cs::DOUBLE) * 1000000.0::DOUBLE) AS BIGINT)
        |             - CAST(floor(ln(g.c::DOUBLE) * 1000000.0::DOUBLE) AS BIGINT)))::BIGINT AS s
        |  FROM bg b JOIN gl g USING (t) GROUP BY 1)
        |SELECT grp AS source, ts AS n_tok,
        | round((s::DOUBLE / ts::DOUBLE
        |   - CAST(floor(ln(ts::DOUBLE) * 1000000.0::DOUBLE) AS BIGINT)::DOUBLE
        |   + CAST(floor(ln((SELECT tt FROM tt)::DOUBLE) * 1000000.0::DOUBLE) AS BIGINT)::DOUBLE)
        |  / 1000000.0::DOUBLE, 6) AS kl_r6
        |FROM ag""".stripMargin,

    "q127_zipf_slope" ->
      // restates zipfSlope verbatim: dense (count DESC, term ASC)
      // rank, fixed-point x/y = floor(ln·1e6) longs, exact integer
      // sums, the least-squares slope materialized once and rounded
      """WITH tok AS (
        |  SELECT lang AS grp, unnest(string_split(text, ' ')) AS t
        |  FROM documents),
        |cnt AS MATERIALIZED (
        |  SELECT grp, t, count(*)::BIGINT AS c FROM tok
        |  WHERE t <> '' GROUP BY 1, 2),
        |top AS MATERIALIZED (
        |  SELECT grp, c, r FROM (
        |   SELECT grp, c,
        |    row_number() OVER (PARTITION BY grp ORDER BY c DESC, t ASC) AS r
        |   FROM cnt) WHERE r <= 32),
        |fp AS (
        |  SELECT grp,
        |   CAST(floor(ln(r::DOUBLE) * 1000000.0::DOUBLE) AS BIGINT) AS x,
        |   CAST(floor(ln(c::DOUBLE) * 1000000.0::DOUBLE) AS BIGINT) AS y
        |  FROM top),
        |ag AS (
        |  SELECT grp, count(*)::BIGINT AS n_terms, sum(x)::BIGINT AS sx,
        |   sum(y)::BIGINT AS sy, sum(x*y)::BIGINT AS sxy,
        |   sum(x*x)::BIGINT AS sxx
        |  FROM fp GROUP BY 1)
        |SELECT grp AS lang, n_terms,
        | round((n_terms * sxy - sx * sy)::DOUBLE
        |   / (n_terms * sxx - sx * sx)::DOUBLE, 6) AS slope_r6
        |FROM ag WHERE n_terms >= 3""".stripMargin,

    "q125_winnowing" ->
      // restates winnowing verbatim: 4-gram 60-bit md5-prefix hashes,
      // per-window-start rightmost-minimal pick (rank by h ASC, pos
      // DESC), full windows only, DISTINCT (doc, h, pos) then
      // (doc, h); df<=5 common-code elimination; pair count of
      // DISTINCT shared hashes
      """WITH tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |grams AS MATERIALIZED (
        |  SELECT doc_id, len(t) - 3 AS ng, u - 1 AS pos,
        |    CAST('0x' || substring(md5(array_to_string(t[u:u+3], ' ')), 1, 15)
        |      AS BIGINT) AS h
        |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 3)) AS u
        |        FROM tk WHERE len(t) >= 7)),
        |win AS MATERIALIZED (
        |  SELECT s.doc_id, g.h, g.pos,
        |    row_number() OVER (PARTITION BY s.doc_id, s.pos
        |      ORDER BY g.h ASC, g.pos DESC) AS rn
        |  FROM grams s JOIN grams g ON g.doc_id = s.doc_id
        |    AND g.pos BETWEEN s.pos AND s.pos + 3
        |  WHERE s.pos <= s.ng - 4),
        |fps AS MATERIALIZED (
        |  SELECT DISTINCT doc_id, h FROM win WHERE rn = 1),
        |rare AS MATERIALIZED (
        |  SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS df
        |                 FROM fps GROUP BY 1) WHERE df <= 5),
        |kept AS MATERIALIZED (SELECT f.doc_id, f.h FROM fps f JOIN rare r ON r.h = f.h)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  count(DISTINCT a.h) AS n_shared
        |FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
        |GROUP BY 1, 2""".stripMargin,

    "q124_neighbor_sample" ->
      // restates sampleNeighbors verbatim: distinct edges, hop-1
      // row_number over md5('nbr:' || root || ':' || src || ':' ||
      // dst) with dst tie-break, frontier = distinct (root, dst),
      // hop-2 the same window after the frontier join
      """WITH ne AS MATERIALIZED (
        | SELECT DISTINCT src, dst FROM (
        |  SELECT doc_id AS src,
        |   (doc_id*7 + 3) % (SELECT count(*) FROM documents) AS dst FROM documents
        |  UNION ALL
        |  SELECT doc_id,
        |   ((doc_id % (SELECT count(*) FROM documents)) * (doc_id % (SELECT count(*) FROM documents)) + 3) % (SELECT count(*) FROM documents)
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, (doc_id*11 + 1) % (SELECT count(*) FROM documents)
        |  FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id, (doc_id*13 + 7) % (SELECT count(*) FROM documents)
        |  FROM documents WHERE doc_id % 10 = 0)),
        |l1 AS MATERIALIZED (
        | SELECT root, src, dst, 1 AS hop FROM (
        |  SELECT src AS root, src, dst,
        |   row_number() OVER (PARTITION BY src
        |     ORDER BY md5('nbr:' || src || ':' || src || ':' || dst), dst) AS rn
        |  FROM ne) WHERE rn <= 2),
        |f1 AS MATERIALIZED (SELECT DISTINCT root, dst AS src FROM l1),
        |l2 AS (
        | SELECT root, src, dst, 2 AS hop FROM (
        |  SELECT f.root, e.src, e.dst,
        |   row_number() OVER (PARTITION BY f.root, e.src
        |     ORDER BY md5('nbr:' || f.root || ':' || e.src || ':' || e.dst), e.dst) AS rn
        |  FROM f1 f JOIN ne e ON e.src = f.src) WHERE rn <= 2)
        |SELECT root, hop, src, dst FROM l1
        |UNION ALL SELECT root, hop, src, dst FROM l2""".stripMargin,

    "q123_incremental_cc" ->
      // the incremental merge must EQUAL a full recompute over the
      // union graph — the oracle states that recompute: recursive
      // min-label reachability closure over alias ∪ delta edges
      s"""WITH RECURSIVE $aliasEdgesSql,
         |extra AS (
         |  SELECT doc_id AS src,
         |    (doc_id*13+7) % (SELECT count(*) FROM documents) AS dst
         |  FROM documents WHERE doc_id % 25 = 0),
         |alle AS (SELECT src, dst FROM edges
         |  UNION ALL SELECT src, dst FROM extra),
         |sym AS (SELECT src, dst FROM alle
         |  UNION SELECT dst AS src, src AS dst FROM alle),
         |reach(n, m) AS (
         | SELECT src, src FROM sym
         | UNION
         | SELECT s.dst, r.m FROM reach r JOIN sym s ON s.src = r.n)
         |SELECT n AS node, min(m) AS label FROM reach GROUP BY n""".stripMargin,

    "q76_cooccur_pmi" ->
      s"""WITH ds AS (
         | SELECT DISTINCT doc_id, tok AS surface
         | FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
         | WHERE tok IN ($dictInList)),
         |m AS (SELECT surface, count(*) AS n FROM ds GROUP BY 1),
         |nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents)
         |SELECT a.surface AS sa, b.surface AS sb, count(*) AS n_ab,
         | round(ln(count(*) * (SELECT n FROM nd) / (ma.n * mb.n)), 6) AS pmi_r6
         |FROM ds a JOIN ds b ON a.doc_id = b.doc_id AND a.surface < b.surface
         |JOIN m ma ON ma.surface = a.surface
         |JOIN m mb ON mb.surface = b.surface
         |GROUP BY a.surface, b.surface, ma.n, mb.n""".stripMargin,

    "q87_semdedup_kmeans" ->
      // restates Similarity.semDedupKMeans: k = max(4, ceil(√n)),
      // centroids = vectors at id stride n/k (integer division),
      // nearest-centroid assignment (L2 asc, cent_id asc tie-break —
      // the q52 pattern), then the q77 in-cell drop rule (nrm guards
      // restate the zero-vector cosine convention)
      """WITH p AS (
        | SELECT greatest(4, CAST(ceil(sqrt(CAST(count(*) AS DOUBLE)) - 1e-9) AS INT)) AS k,
        |   CAST(count(*) AS BIGINT) AS c
        | FROM embeddings),
        |st AS (SELECT greatest(1, c // k) AS stride FROM p),
        |cents AS (
        | SELECT vec_id AS cent_id, embedding::DOUBLE[] AS cv
        | FROM embeddings WHERE vec_id % (SELECT stride FROM st) = 0),
        |assign AS (
        | SELECT vec_id, embedding, cell FROM (
        |  SELECT e.vec_id, e.embedding, c.cent_id AS cell,
        |   row_number() OVER (PARTITION BY e.vec_id
        |     ORDER BY list_distance(e.embedding::DOUBLE[], c.cv) ASC, c.cent_id ASC) AS rk
        |  FROM embeddings e CROSS JOIN cents c) WHERE rk = 1),
        |cc AS (
        | SELECT vec_id, embedding, cell,
        |  sqrt(list_sum(list_transform(embedding::DOUBLE[], v -> v*v))) AS nrm
        | FROM assign),
        |drops AS (
        | SELECT DISTINCT b.vec_id
        | FROM cc a JOIN cc b ON a.cell = b.cell AND a.vec_id < b.vec_id
        | WHERE a.nrm > 0 AND b.nrm > 0
        |   AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.25)
        |SELECT cc.vec_id, cc.cell, CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS kept
        |FROM cc LEFT JOIN drops d ON cc.vec_id = d.vec_id""".stripMargin,

    "q77_semdedup" ->
      // the nrm > 0 guards restate the engine's zero-vector convention
      // (cosine = 0 when either norm is 0, Similarity.cosine) — DuckDB's
      // list_cosine_similarity yields NaN there, which its total order
      // would put ABOVE the threshold. `p.bits` restates
      // Similarity.semDedupAutoBits: ceil(log4 n) clamped to [4, 16];
      // the cell key is the seeded random-projection sign bucket
      // (hyperplanes 0..bits-1 of the ProjSeed Rademacher family)
      s"""WITH p AS (
        | SELECT greatest(4, least(16,
        |   CAST(ceil(ln(count(*)) / ln(4) - 1e-9) AS INT))) AS bits
        | FROM embeddings),
        |hp AS (
        | SELECT j, ${rademacherListSql("j")} AS r
        | FROM range(0, 16) u(j), p WHERE u.j < p.bits),
        |cb AS (
        | SELECT e.vec_id, string_agg($projBitSql, '' ORDER BY h.j) AS cell
        | FROM embeddings e, hp h GROUP BY e.vec_id),
        |c AS (
        | SELECT e.vec_id, e.embedding,
        |  sqrt(list_sum(list_transform(e.embedding::DOUBLE[], v -> v*v))) AS nrm,
        |  cb.cell
        | FROM embeddings e JOIN cb ON e.vec_id = cb.vec_id),
        |drops AS (
        | SELECT DISTINCT b.vec_id
        | FROM c a JOIN c b ON a.cell = b.cell AND a.vec_id < b.vec_id
        | WHERE a.nrm > 0 AND b.nrm > 0
        |   AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.25)
        |SELECT c.vec_id, c.cell, CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS kept
        |FROM c LEFT JOIN drops d ON c.vec_id = d.vec_id""".stripMargin,

    "q93_semdedup_capped" ->
      // q77 + the hot-cell re-split: cells0..cells3 apply up to three
      // conditional 4-bit extensions with fresh hyperplanes (index
      // 2048 + lvl*4 + j); pairwise cosine + keep-min-id then run on
      // the FINAL (split) cells
      s"""WITH p AS (
        | SELECT greatest(4, least(16,
        |   CAST(ceil(ln(count(*)) / ln(4) - 1e-9) AS INT))) AS bits
        | FROM embeddings),
        |hp AS (
        | SELECT j, ${rademacherListSql("j")} AS r
        | FROM range(0, 16) u(j), p WHERE u.j < p.bits),
        |cb AS (
        | SELECT e.vec_id, string_agg($projBitSql, '' ORDER BY h.j) AS cell
        | FROM embeddings e, hp h GROUP BY e.vec_id),
        |${semDedupSplitCtes(16)},
        |c AS (
        | SELECT e.vec_id, e.embedding,
        |  sqrt(list_sum(list_transform(e.embedding::DOUBLE[], v -> v*v))) AS nrm,
        |  k.cell
        | FROM embeddings e JOIN cells3 k ON e.vec_id = k.vec_id),
        |drops AS (
        | SELECT DISTINCT b.vec_id
        | FROM c a JOIN c b ON a.cell = b.cell AND a.vec_id < b.vec_id
        | WHERE a.nrm > 0 AND b.nrm > 0
        |   AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.25)
        |SELECT c.vec_id, c.cell, CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS kept
        |FROM c LEFT JOIN drops d ON c.vec_id = d.vec_id""".stripMargin,

    "q94_incremental_ann" ->
      // new batch (vec_id % 10 = 0) vs the banded index of the rest:
      // 4 bands × 8 fixed bits of the seeded family, exact cosine ≥
      // 0.25, pair dedup across bands (max is a no-op: cos is
      // band-independent)
      (s"""WITH hp AS (
        | SELECT b, j, ${rademacherListSql("b*8 + j")} AS r
        | FROM range(0, 4) t(b), range(0, 8) u(j)),
        |bk AS (
        | SELECT e.vec_id,
        |  h.b || '|' || string_agg($projBitSql, '' ORDER BY h.j) AS bucket
        | FROM embeddings e, hp h
        | GROUP BY e.vec_id, h.b),
        |cand AS (
        | SELECT DISTINCT n.vec_id AS vec_id, i.vec_id AS cand_id
        | FROM bk n JOIN bk i ON n.bucket = i.bucket
        | WHERE n.vec_id % 10 = 0 AND i.vec_id % 10 <> 0
        |   AND n.vec_id <> i.vec_id),
        |scored AS (
        | SELECT cand.vec_id, cand.cand_id, """.stripMargin +
      safeCosSql("p", "c") +
      """ AS cos
        |FROM cand
        |JOIN embeddings p ON cand.vec_id = p.vec_id
        |JOIN embeddings c ON cand.cand_id = c.vec_id)
        |SELECT vec_id, cand_id, round(cos, 4) AS cos FROM scored
        |WHERE cos >= 0.25""".stripMargin),

    "q96_mixture_sample" ->
      // srcK (uniform counts) weighted (K+1)/210 ⇒ keep rate (K+1)/20,
      // threshold = floor(rate·65536), kept iff the seeded md5's first
      // 4 hex < threshold (numeric compare via 0x-cast)
      """WITH kept AS (
        | SELECT source FROM documents
        | WHERE CAST('0x' || substring(md5('mix:' || doc_id::VARCHAR), 1, 4) AS INT)
        |   < floor((CAST(substring(source, 4) AS INT) + 1) / 20.0 * 65536))
        |SELECT source, count(*) AS n_kept FROM kept GROUP BY 1""".stripMargin,

    "q111_mixture_upsample" ->
      // restates mixtureSample's upsampling arithmetic verbatim:
      // rate = (6·n_src1)::DOUBLE · w / n_s (every literal forced
      // DOUBLE — DuckDB decimal-literal math would diverge), whole
      // replicas = floor(rate), one extra iff the seeded md5 threshold
      // draw < floor(frac·65536); replicas exploded as rep = 0..copies−1
      """WITH cnt AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
        |tgt AS (SELECT CAST(6 * n AS DOUBLE) AS t FROM cnt WHERE source = 'src1'),
        |rates AS (
        | SELECT c.source,
        |  (SELECT t FROM tgt) * (CASE c.source
        |     WHEN 'src1' THEN 0.5::DOUBLE WHEN 'src2' THEN 0.25::DOUBLE
        |     WHEN 'src3' THEN 0.125::DOUBLE ELSE 0.125::DOUBLE END) / c.n AS rate
        | FROM cnt c WHERE c.source IN ('src1', 'src2', 'src3', 'src4')),
        |parts AS (
        | SELECT source, CAST(floor(rate) AS INT) AS whole,
        |  CAST(floor((rate - floor(rate)) * 65536.0) AS BIGINT) AS thr
        | FROM rates),
        |docsx AS (
        | SELECT d.source, p.whole + CASE
        |   WHEN CAST('0x' || substring(md5('mix:' || d.doc_id::VARCHAR), 1, 4) AS INT)
        |     < p.thr THEN 1 ELSE 0 END AS ncopies
        | FROM documents d JOIN parts p USING (source))
        |SELECT source, CAST(rep AS INT) AS rep, count(*) AS n_docs
        |FROM (SELECT source, unnest(range(0, ncopies)) AS rep
        |      FROM docsx WHERE ncopies > 0)
        |GROUP BY 1, 2""".stripMargin,

    "q120_weighted_sample" ->
      // restates weightedSample verbatim: u = (md5-h4 + 1)/65536 on
      // DOUBLE, key = ln(u)/length(text), top-200 by key desc with
      // doc_id tie-break
      """SELECT doc_id, lang, length(text) AS w
        |FROM documents
        |WHERE length(text)::DOUBLE > 0.0::DOUBLE
        |ORDER BY ln((CAST('0x' || substring(md5('ws:' || doc_id::VARCHAR), 1, 4)
        |    AS INT) + 1)::DOUBLE / 65536.0::DOUBLE)
        |  / length(text)::DOUBLE DESC, doc_id ASC
        |LIMIT 200""".stripMargin,

    "q119_temperature_mix" ->
      // restates temperatureMixture verbatim: z = ordered list_sum of
      // pow(n, 0.5) over langs (the engine's ascending-key left fold —
      // bitwise-equal, verified), rate = (1000·(pow/z))/n in the exact
      // IEEE order, then q111's whole/thr/md5 replica machinery
      """WITH cnt AS MATERIALIZED (
        |  SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY 1),
        |zz AS (SELECT list_sum(list(pow(n::DOUBLE, 0.5::DOUBLE)
        |         ORDER BY lang)) AS z FROM cnt),
        |rates AS (
        | SELECT lang, (1000.0::DOUBLE * (pow(n::DOUBLE, 0.5::DOUBLE)
        |   / (SELECT z FROM zz))) / n::DOUBLE AS rate
        | FROM cnt),
        |parts AS (
        | SELECT lang, CAST(floor(rate) AS INT) AS whole,
        |  CAST(floor((rate - floor(rate)) * 65536.0::DOUBLE) AS BIGINT) AS thr
        | FROM rates),
        |docsx AS (
        | SELECT d.lang, p.whole + CASE
        |   WHEN CAST('0x' || substring(md5('mix:' || d.doc_id::VARCHAR), 1, 4) AS INT)
        |     < p.thr THEN 1 ELSE 0 END AS ncopies
        | FROM documents d JOIN parts p USING (lang))
        |SELECT lang, CAST(rep AS INT) AS rep, count(*) AS n_docs
        |FROM (SELECT lang, unnest(range(0, ncopies)) AS rep
        |      FROM docsx WHERE ncopies > 0)
        |GROUP BY 1, 2""".stripMargin,

    "q95_repeated_passages" ->
      // restates Dedup.rollingFingerprints verbatim with HUGEINT math:
      // base-257 polynomial mod 2^61−1 over every 32-char window
      // (window ENDING at 1-based position E covers chars E−31..E,
      // char at window offset k carries coefficient 257^(31−k)),
      // emitted when the hash's low 4 bits are zero; texts shorter
      // than the window hash whole and emit unconditionally (no such
      // rows in the synthetic corpus — the arm is parity insurance).
      // Each product is reduced mod M before the 32-term list_sum, so
      // the sum stays < 2^66 inside HUGEINT.
      """WITH RECURSIVE pows(e, p) AS (
        | SELECT 0, 1::HUGEINT
        | UNION ALL
        | SELECT e + 1, (p * 257) % 2305843009213693951 FROM pows WHERE e < 31),
        |pw AS (SELECT list(p ORDER BY e) AS p FROM pows),
        |winpos AS (
        | SELECT doc_id, text, unnest(range(32, length(text) + 1)) AS e
        | FROM documents WHERE length(text) >= 32),
        |wins AS (
        | SELECT w.doc_id,
        |  CAST(list_sum(list_transform(range(0, 32), k ->
        |    (CAST(unicode(w.text[w.e - 31 + k]) AS HUGEINT) * pw.p[32 - k])
        |      % 2305843009213693951))
        |    % 2305843009213693951 AS BIGINT) AS h
        | FROM winpos w, pw),
        |shorts AS (
        | SELECT d.doc_id,
        |  CAST(COALESCE(list_sum(list_transform(range(0, length(d.text)), k ->
        |    (CAST(unicode(d.text[k + 1]) AS HUGEINT) * pw.p[length(d.text) - k])
        |      % 2305843009213693951)), 0)
        |    % 2305843009213693951 AS BIGINT) AS h
        | FROM documents d, pw WHERE length(d.text) < 32),
        |fps AS (
        | SELECT doc_id, h FROM wins WHERE h % 16 = 0
        | UNION ALL SELECT doc_id, h FROM shorts)
        |SELECT h AS fp, count(DISTINCT doc_id) AS n_docs,
        | min(doc_id) AS first_doc
        |FROM fps GROUP BY 1 HAVING count(DISTINCT doc_id) > 1""".stripMargin,

    "q97_kcore" ->
      // 12 unrolled peel levels over the banded-simhash graph; each
      // level past the true fixpoint (<= 7 rounds observed at both
      // verify scales) is the identity, so the unroll depth only
      // bounds, never changes, the result
      s"""WITH $simhashShCte,
         |${simhashEdgeCte(8)},
         |${kCorePeelCtes(3, 12)}
         |SELECT src AS node, count(*) AS core_deg FROM e12 GROUP BY 1""".stripMargin,

    "q98_lpa_communities" ->
      // 3 unrolled synchronous LPA rounds, top-1 window restating the
      // engine's (count DESC, label ASC) deterministic tiebreak
      s"""WITH $simhashShCte,
         |${simhashEdgeCte(8)},
         |${lpaCtes(3)}
         |SELECT node, community FROM lab3""".stripMargin,

    "q99_hll_distinct" ->
      // HLL registers restated exactly: 60-bit md5-prefix hash, bucket
      // = low 6 bits, rho = 55 − bitlength(rest) via bin(); indicator
      // sum as the EXACT integer Σ 2^(55−rho) (+2^55 per empty bucket;
      // DuckDB sum(BIGINT) is HUGEINT — cast back); the only floating
      // step is the final division, with alpha cast to DOUBLE before
      // the power-of-2 scaling so both engines divide the same double
      """WITH h AS (
        | SELECT lang, ('0x' || substring(md5(text), 1, 15))::BIGINT AS h
        | FROM documents),
        |regs AS (
        | SELECT lang, h % 64 AS bucket,
        |  max(CASE WHEN (h >> 6) = 0 THEN 55
        |      ELSE 55 - length(bin(h >> 6)) END) AS rho
        | FROM h GROUP BY 1, 2),
        |agg AS (
        | SELECT lang, 64 - count(*) AS n_zero_regs,
        |  CAST(sum(1::BIGINT << (55 - rho))
        |    + (64 - count(*)) * (1::BIGINT << 55) AS BIGINT) AS reg_sum
        | FROM regs GROUP BY 1)
        |SELECT lang, n_zero_regs, reg_sum,
        | round((0.709::DOUBLE) * 64 * 64 * (1::BIGINT << 55)::DOUBLE
        |   / reg_sum::DOUBLE, 4) AS n_distinct_est
        |FROM agg""".stripMargin,

    "q100_bloom_blocklist" ->
      // the Bloom probe walk restated exactly: h1 = md5 hex[1..15],
      // h2 = 2·hex[16..30] + 1, both mod 4096 BEFORE the multiply-add
      // (every intermediate tiny); the packed-bitset test is
      // position-SET membership, so the oracle checks each of the 3
      // unrolled probe positions against the blocklist's distinct
      // position set — false positives and all
      """WITH block AS (
        | SELECT DISTINCT text FROM documents
        | WHERE source = 'src0' AND doc_id % 7 = 0),
        |bh AS (
        | SELECT ('0x' || substring(md5(text), 1, 15))::BIGINT % 4096 AS h1,
        |  (('0x' || substring(md5(text), 16, 15))::BIGINT * 2 + 1) % 4096 AS h2
        | FROM block),
        |bp AS (
        | SELECT DISTINCT (h1 + i * h2) % 4096 AS pos
        | FROM bh, range(0, 3) t(i)),
        |dm AS (
        | SELECT source,
        |  CASE WHEN h1 IN (SELECT pos FROM bp)
        |    AND (h1 + h2) % 4096 IN (SELECT pos FROM bp)
        |    AND (h1 + 2 * h2) % 4096 IN (SELECT pos FROM bp)
        |   THEN 1 ELSE 0 END AS bloom_hit,
        |  CASE WHEN text IN (SELECT text FROM block) THEN 1 ELSE 0 END AS exact_hit
        | FROM (
        |  SELECT source, text,
        |   ('0x' || substring(md5(text), 1, 15))::BIGINT % 4096 AS h1,
        |   (('0x' || substring(md5(text), 16, 15))::BIGINT * 2 + 1) % 4096 AS h2
        |  FROM documents))
        |SELECT source, count(*) AS n_docs,
        | CAST(sum(bloom_hit) AS BIGINT) AS n_bloom,
        | CAST(sum(exact_hit) AS BIGINT) AS n_exact,
        | CAST(sum(CASE WHEN bloom_hit = 1 AND exact_hit = 0 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_fp
        |FROM dm GROUP BY 1 ORDER BY 1""".stripMargin,

    "q101_loghist_quantiles" ->
      // the register read-off restated: bin = bitlength via bin()
      // string length (DuckDB bin() is minimal-length like Spark's),
      // lower-quantile rank ceil(p·n) with p cast DOUBLE before the
      // multiply so both engines round the same IEEE product; lo/hi
      // reconstructed as 2^(bin−1)..2^bin−1 in exact BIGINT shifts
      """WITH v AS (
        | SELECT lang, CAST(length(text) AS BIGINT) AS val FROM documents),
        |regs AS (
        | SELECT lang,
        |  CASE WHEN val <= 0 THEN 0 ELSE length(bin(val)) END AS bin,
        |  count(*) AS cnt
        | FROM v GROUP BY 1, 2),
        |cum AS (
        | SELECT lang, bin, cnt,
        |  sum(cnt) OVER (PARTITION BY lang ORDER BY bin) AS cum,
        |  sum(cnt) OVER (PARTITION BY lang) AS n
        | FROM regs),
        |q AS (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS p),
        |hit AS (
        | SELECT lang, p, min(bin) AS bin
        | FROM cum, q
        | WHERE cum >= CAST(ceil(p * n) AS BIGINT)
        | GROUP BY 1, 2)
        |SELECT lang, p, CAST(bin AS BIGINT) AS bin,
        | CASE WHEN bin = 0 THEN 0 ELSE (1::BIGINT << (bin - 1)) END AS lo,
        | CASE WHEN bin = 0 THEN 0 ELSE (1::BIGINT << bin) - 1 END AS hi
        |FROM hit""".stripMargin,

    "q102_editdist_pairs" ->
      // the oracle states the DEFINITION the blocking join must equal:
      // all unordered pairs of distinct non-empty names at Levenshtein
      // distance <= 1 (DuckDB's levenshtein is the same classic
      // unit-cost edit distance as Spark's) — deletion-neighborhood
      // completeness is exactly what makes this restatement legal
      """WITH names AS (
        | SELECT DISTINCT c_name AS name FROM customer
        | WHERE c_name IS NOT NULL AND length(c_name) > 0)
        |SELECT a.name AS name_a, b.name AS name_b
        |FROM names a JOIN names b ON a.name < b.name
        |WHERE levenshtein(a.name, b.name) <= 1""".stripMargin,

    "q103_redirect_cycles" ->
      // independent definition: a node is on a cycle iff it is
      // reachable from itself (>= 1 step). The recursive CTE walks
      // (start, cur) pairs under UNION set semantics — at most n^2
      // states, fine at oracle scale; the engine's pointer doubling is
      // the O(n log n) form of the same fixpoint
      """WITH RECURSIVE edges AS (
        | SELECT doc_id AS src,
        |  ((doc_id % (SELECT count(*) FROM documents)) * (doc_id % (SELECT count(*) FROM documents)) + 3) % (SELECT count(*) FROM documents) AS dst
        | FROM documents),
        |walk(start, cur) AS (
        | SELECT src AS start, dst AS cur FROM edges
        | UNION
        | SELECT w.start, e.dst FROM walk w JOIN edges e ON w.cur = e.src)
        |SELECT DISTINCT start AS node FROM walk WHERE start = cur""".stripMargin,

    "q104_cms_freq" ->
      // the Count-Min walk restated exactly (the q100 Bloom family with
      // width 1024): h1 = md5 hex[1..15] mod w, h2 = (2*hex[16..30]+1)
      // mod w, pos_r = (h1 + r*h2) mod w for r in 0..3; registers =
      // occupied-counter counts, estimate = min over the 4 probed
      // counters with absent counters read as 0
      """WITH ph AS (
        | SELECT text,
        |  ('0x' || substring(md5(text), 1, 15))::BIGINT % 1024 AS h1,
        |  (('0x' || substring(md5(text), 16, 15))::BIGINT * 2 + 1) % 1024 AS h2
        | FROM documents),
        |regs AS (
        | SELECT r AS row, (h1 + r * h2) % 1024 AS pos, count(*) AS cnt
        | FROM ph, range(0, 4) t(r) GROUP BY 1, 2),
        |probes AS (SELECT DISTINCT text FROM documents WHERE source = 'src3'),
        |pp AS (
        | SELECT text, t.r AS row,
        |  (('0x' || substring(md5(text), 1, 15))::BIGINT % 1024
        |   + t.r * ((('0x' || substring(md5(text), 16, 15))::BIGINT * 2 + 1)
        |     % 1024)) % 1024 AS pos
        | FROM probes, range(0, 4) t(r))
        |SELECT text, CAST(min(coalesce(cnt, 0)) AS BIGINT) AS n_est
        |FROM pp LEFT JOIN regs USING (row, pos)
        |GROUP BY text""".stripMargin,

    "q105_jaccard_join_exact" ->
      // the oracle states the all-pairs DEFINITION the prefix-filter
      // blocking must equal: every unordered doc pair whose
      // distinct-token sets satisfy 20*|A∩B| >= 19*|A∪B| (integer
      // cross-multiplication, no float boundary), jac as the exact
      // double quotient of the same two integers
      """WITH toks AS (
        | SELECT doc_id, unnest(list_distinct(
        |   list_filter(string_split(text, ' '), x -> x <> ''))) AS tok
        | FROM documents),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY 1),
        |common AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        | FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
        | GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        | CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) AS jac
        |FROM common
        |JOIN sizes sa ON sa.doc_id = doc_a
        |JOIN sizes sb ON sb.doc_id = doc_b
        |WHERE 20 * c >= 19 * (sa.sz + sb.sz - c)""".stripMargin,

    "q106_ppr" -> pprOracleSql,

    "q107_bfs_depth" ->
      // independent definition: dist(v) = min steps from any seed,
      // computed as the min over ALL (node, d) walk states under UNION
      // set semantics; the d < n bound terminates cycles (any shortest
      // path uses < n edges, so the bound never clips a true min)
      """WITH RECURSIVE edges AS (
        | SELECT doc_id AS src,
        |  ((doc_id % (SELECT count(*) FROM documents)) * (doc_id % (SELECT count(*) FROM documents)) + 3) % (SELECT count(*) FROM documents) AS dst
        | FROM documents
        | UNION ALL
        | SELECT doc_id,
        |  (doc_id*7 + 3) % (SELECT count(*) FROM documents)
        | FROM documents),
        |seeds AS (SELECT doc_id AS node FROM documents ORDER BY doc_id LIMIT 3),
        |walk(node, d) AS (
        | SELECT node, 0 FROM seeds
        | UNION
        | SELECT e.dst, w.d + 1 FROM walk w JOIN edges e ON w.node = e.src
        | WHERE w.d < (SELECT count(*) FROM documents))
        |SELECT node, CAST(min(d) AS INT) AS dist FROM walk GROUP BY node""".stripMargin,

    "q108_random_walks" -> randomWalksOracleSql,

    "q126_node2vec" -> node2vecOracleSql,

    "q130_adamic_adar" ->
      // restates adamicAdar verbatim: canonical undirected simple
      // graph, per-wedge fixed-point term floor(1e9/ln(deg_w)) as
      // BIGINT, exact integer score sums, anti-join on existing
      // edges, (score DESC, u, v) top-100
      """WITH e AS (
        | SELECT doc_id AS src,
        |  ((doc_id % (SELECT count(*) FROM documents)) * (doc_id % (SELECT count(*) FROM documents)) + 3) % (SELECT count(*) FROM documents) AS dst
        | FROM documents
        | UNION ALL
        | SELECT doc_id,
        |  (doc_id*7 + 3) % (SELECT count(*) FROM documents)
        | FROM documents),
        |und AS MATERIALIZED (
        | SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        | FROM e WHERE src <> dst),
        |sym AS MATERIALIZED (
        | SELECT u AS w, v AS x FROM und UNION ALL SELECT v AS w, u AS x FROM und),
        |deg AS MATERIALIZED (SELECT w, count(*)::BIGINT AS d FROM sym GROUP BY 1),
        |wedge AS (
        | SELECT a.x AS u, b.x AS v,
        |  CAST(floor(1000000000.0::DOUBLE / ln(d.d::DOUBLE)) AS BIGINT) AS t
        | FROM sym a JOIN sym b ON a.w = b.w AND a.x < b.x
        | JOIN deg d ON d.w = a.w),
        |sc AS MATERIALIZED (
        | SELECT u, v, sum(t)::BIGINT AS aa_fp FROM wedge GROUP BY 1, 2),
        |pred AS (
        | SELECT s.u, s.v, s.aa_fp FROM sc s
        | LEFT JOIN und x ON x.u = s.u AND x.v = s.v WHERE x.u IS NULL)
        |SELECT u, v,
        | round(aa_fp::DOUBLE / 1000000000.0::DOUBLE, 6) AS aa_r6
        |FROM pred ORDER BY aa_fp DESC, u ASC, v ASC LIMIT 100""".stripMargin,

    "q132_sgns_embeddings" -> sgnsOracleSql,

    "q134_link_pred_auc" ->
      // restates linkPredictionAuc verbatim: seeded md5 edge holdout
      // (mod 5), fixed-point AA scoring on the train graph, candidate
      // labeling (train-edge exclusion, holdout = positive), score-
      // group rank statistics with tie-aware doubled average ranks,
      // one exact division at the end
      """WITH raw AS (
        |  SELECT z[1] AS src, z[2] AS dst
        |  FROM (SELECT unnest(list_zip(toks[1:length(toks)-1], toks[2:length(toks)])) AS z
        |        FROM (SELECT string_split(text, ' ') AS toks FROM documents))
        |  WHERE z[1] <> z[2]),
        |und AS MATERIALIZED (
        | SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        | FROM raw),
        |sp AS MATERIALIZED (
        | SELECT u, v,
        |  ('0x' || substring(md5('lp:' || u || ':' || v), 1, 15))::BIGINT % 5 AS m
        | FROM und),
        |test AS MATERIALIZED (SELECT u, v FROM sp WHERE m = 0),
        |train AS MATERIALIZED (SELECT u, v FROM sp WHERE m <> 0),
        |sym AS MATERIALIZED (
        | SELECT u AS w, v AS x FROM train UNION ALL SELECT v, u FROM train),
        |deg AS MATERIALIZED (SELECT w, count(*)::BIGINT AS d FROM sym GROUP BY 1),
        |nbr AS MATERIALIZED (
        | SELECT s.w, s.x,
        |  CAST(floor(1000000000.0::DOUBLE / ln(d.d::DOUBLE)) AS BIGINT) AS t
        | FROM sym s JOIN deg d ON d.w = s.w WHERE d.d >= 2),
        |sc AS MATERIALIZED (
        | SELECT a.x AS u, b.x AS v, sum(a.t)::BIGINT AS aa_fp
        | FROM nbr a JOIN nbr b ON a.w = b.w AND a.x < b.x
        | GROUP BY 1, 2),
        |cand AS MATERIALIZED (
        | SELECT s.aa_fp,
        |  (CASE WHEN t.u IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS lbl
        | FROM sc s
        | LEFT JOIN train tr ON tr.u = s.u AND tr.v = s.v
        | LEFT JOIN test t ON t.u = s.u AND t.v = s.v
        | WHERE tr.u IS NULL),
        |grp AS MATERIALIZED (
        | SELECT aa_fp, count(*)::BIGINT AS cnt, sum(lbl)::BIGINT AS pos
        | FROM cand GROUP BY 1),
        |rk AS MATERIALIZED (
        | SELECT aa_fp, cnt, pos,
        |  coalesce(sum(cnt) OVER (ORDER BY aa_fp ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS below
        | FROM grp)
        |SELECT sum(pos)::BIGINT AS n_pos, sum(cnt - pos)::BIGINT AS n_neg,
        | CASE WHEN sum(pos) > 0 AND sum(cnt - pos) > 0 THEN
        |  round((sum(pos * (2*(below + 1) + cnt - 1)) - sum(pos)*(sum(pos) + 1))::DOUBLE
        |   / (2.0::DOUBLE * sum(pos)::DOUBLE * sum(cnt - pos)::DOUBLE), 6)
        | END AS auc_r6
        |FROM rk""".stripMargin,

    "q131_media_containers" ->
      // restates syntheticContainer's header-field formulas: the Spark
      // side BUILDS real PNG/WAV/GIF/BMP bytes from doc_id and PARSES
      // them back with the byte-level container parsers; equality with
      // these closed forms proves construction and parsing agree on
      // every offset/endianness (kind cycles id%4; wav width=rate,
      // height=channels, n_frames=PCM sample frames; byte_len = the
      // fixed layout sizes)
      """SELECT doc_id AS media_id,
        | CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'wav'
        |  WHEN 2 THEN 'gif' ELSE 'bmp' END AS kind,
        | CAST(CASE WHEN doc_id % 4 = 1 THEN 8000 + 100 * (doc_id % 8)
        |  ELSE 16 + doc_id % 100 END AS BIGINT) AS width,
        | CAST(CASE WHEN doc_id % 4 = 1 THEN 1 + doc_id % 2
        |  ELSE 8 + doc_id % 50 END AS BIGINT) AS height,
        | CAST(CASE doc_id % 4 WHEN 1 THEN 5 + doc_id % 9
        |  WHEN 2 THEN 1 + doc_id % 3 ELSE 1 END AS BIGINT) AS n_frames,
        | CAST(CASE doc_id % 4 WHEN 0 THEN 33
        |  WHEN 1 THEN 44 + (5 + doc_id % 9) * (1 + doc_id % 2) * 2
        |  WHEN 2 THEN 14 + (1 + doc_id % 3) * 15
        |  ELSE 54 END AS BIGINT) AS byte_len
        |FROM documents""".stripMargin,

    "q109_hyperball" ->
      // the q99 register arithmetic (60-bit md5-prefix hash of the node
      // id AS VARCHAR, bucket = low 6 bits, rho = 55 − bitlength) with
      // 3 unrolled propagation rounds: each round register-wise-maxes a
      // node's file with its out-neighbors' files; read-off identical
      // to q99 (exact-integer reg_sum, one final double division)
      """WITH edges AS (
        | SELECT DISTINCT src, dst FROM (
        |  SELECT doc_id AS src,
        |   ((doc_id % (SELECT count(*) FROM documents)) * (doc_id % (SELECT count(*) FROM documents)) + 3) % (SELECT count(*) FROM documents) AS dst
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id,
        |   (doc_id*7 + 3) % (SELECT count(*) FROM documents)
        |  FROM documents)),
        |nodes AS (SELECT DISTINCT node FROM
        |  (SELECT src AS node FROM edges UNION SELECT dst FROM edges)),
        |h AS (SELECT node,
        |  ('0x' || substring(md5(CAST(node AS VARCHAR)), 1, 15))::BIGINT AS h
        | FROM nodes),
        |b0 AS (SELECT node, h % 64 AS bucket,
        |  CASE WHEN (h >> 6) = 0 THEN 55
        |       ELSE 55 - length(bin(h >> 6)) END AS rho FROM h),
        |b1 AS (SELECT node, bucket, max(rho) AS rho FROM (
        |  SELECT node, bucket, rho FROM b0
        |  UNION ALL
        |  SELECT e.src AS node, r.bucket, r.rho
        |  FROM edges e JOIN b0 r ON r.node = e.dst) GROUP BY 1, 2),
        |b2 AS (SELECT node, bucket, max(rho) AS rho FROM (
        |  SELECT node, bucket, rho FROM b1
        |  UNION ALL
        |  SELECT e.src AS node, r.bucket, r.rho
        |  FROM edges e JOIN b1 r ON r.node = e.dst) GROUP BY 1, 2),
        |b3 AS (SELECT node, bucket, max(rho) AS rho FROM (
        |  SELECT node, bucket, rho FROM b2
        |  UNION ALL
        |  SELECT e.src AS node, r.bucket, r.rho
        |  FROM edges e JOIN b2 r ON r.node = e.dst) GROUP BY 1, 2),
        |agg AS (
        | SELECT node, 64 - count(*) AS n_zero_regs,
        |  CAST(sum(1::BIGINT << (55 - rho))
        |    + (64 - count(*)) * (1::BIGINT << 55) AS BIGINT) AS reg_sum
        | FROM b3 GROUP BY 1)
        |SELECT node, n_zero_regs, reg_sum,
        | round((0.709::DOUBLE) * 64 * 64 * (1::BIGINT << 55)::DOUBLE
        |   / reg_sum::DOUBLE, 4) AS ball_est
        |FROM agg""".stripMargin,

    "q110_neighborhood_fn" -> neighborhoodFnOracleSql,

    "q112_harmonic_centrality" -> harmonicCentralityOracleSql,

    "q113_bpe_merges" -> bpeMergesOracleSql,

    "q133_bpe_bytes" -> bpeBytesOracleSql,

    "q114_bpe_tokens" -> bpeTokensOracleSql,

    "q115_dsir_select" ->
      s"""WITH tokb AS (
         | SELECT doc_id, lang = 'en' AS is_t, substring(md5(t), 1, 2) AS bk
         | FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t
         |       FROM documents)
         | WHERE t <> ''),
         |cnts AS (
         | SELECT bk, count(*) AS cr,
         |  sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct
         | FROM tokb GROUP BY 1),
         |tot AS (SELECT sum(cr) AS tr, sum(ct) AS tt FROM cnts),
         |l AS (
         | SELECT bk, CAST(floor((ln(ct + 1) - ln(cr + 1)
         |   - ln((SELECT tt FROM tot) + 256)
         |   + ln((SELECT tr FROM tot) + 256)) * 1e6) AS BIGINT) AS l_fp
         | FROM cnts),
         |sc AS (
         | SELECT doc_id, count(*) AS n_tok, sum(l_fp) AS score_fp
         | FROM tokb JOIN l USING (bk) GROUP BY 1)
         |SELECT d.doc_id, CAST(coalesce(sc.n_tok, 0) AS BIGINT) AS n_tok,
         | CAST(coalesce(sc.score_fp, 0) AS BIGINT) AS score_fp
         |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
         |ORDER BY score_fp DESC, d.doc_id LIMIT 300""".stripMargin,

    "q116_kcenter_select" -> kCenterOracleSql,

    "q78_source_prior" ->
      """WITH base AS (
        | SELECT source, md5(text) AS h,
        |  CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tok
        | FROM documents),
        |freq AS (SELECT h, count(*) AS n_copies FROM base GROUP BY 1)
        |SELECT source, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        | round(avg(n_tok), 4) AS mean_tokens,
        | CAST(sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
        | round(CAST(sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |   / CAST(count(*) AS DOUBLE), 6) AS dup_rate
        |FROM base JOIN freq USING (h)
        |GROUP BY source""".stripMargin,

    "q79_commonness" ->
      s"""WITH $tokenPosSql,
         |se AS (
         | SELECT t.surface,
         |  d.entity || '_v' || CAST((t.doc_id + t.i) % 3 AS VARCHAR) AS entity
         | FROM tok t JOIN (VALUES $dictSqlValues) d(surface, entity, etype)
         |   ON t.surface = d.surface),
         |c AS (SELECT surface, entity, count(*) AS n FROM se GROUP BY 1, 2)
         |SELECT surface, entity, n,
         | round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY surface), 6) AS prior_r6,
         | row_number() OVER (PARTITION BY surface ORDER BY n DESC, entity ASC) AS rank
         |FROM c""".stripMargin,

    "q85_disambiguation" ->
      s"""WITH $tokenPosSql,
         |wt AS (SELECT DISTINCT doc_id, CAST((i - 1) // 10 AS INT) AS w,
         |        surface AS token FROM tok),
         |ma AS (
         | SELECT t.doc_id, CAST((t.i - 1) // 10 AS INT) AS w, t.surface,
         |  d.entity || '_v' || CAST((t.doc_id + t.i) % 3 AS VARCHAR) AS entity
         | FROM tok t JOIN (VALUES $dictSqlValues) d(surface, entity, etype)
         |   ON t.surface = d.surface),
         |cnt AS (SELECT surface, entity, count(*) AS n_se FROM ma GROUP BY 1, 2),
         |prof AS (
         | SELECT DISTINCT mw.entity, wt.token
         | FROM (SELECT DISTINCT doc_id, w, entity FROM ma) mw
         | JOIN wt ON mw.doc_id = wt.doc_id AND mw.w = wt.w),
         |cand AS (
         | SELECT mm.doc_id, mm.w, mm.surface, c.entity, c.n_se
         | FROM (SELECT DISTINCT doc_id, w, surface FROM ma) mm
         | JOIN cnt c ON mm.surface = c.surface),
         |ov AS (
         | SELECT c.doc_id, c.w, c.surface, c.entity,
         |  count(DISTINCT wt.token) AS n_overlap
         | FROM cand c
         | JOIN wt ON c.doc_id = wt.doc_id AND c.w = wt.w
         | JOIN prof p ON p.entity = c.entity AND p.token = wt.token
         | GROUP BY 1, 2, 3, 4),
         |sc AS (
         | SELECT c.doc_id, c.w, c.surface, c.entity,
         |  c.n_se * coalesce(o.n_overlap, 0) AS score
         | FROM cand c LEFT JOIN ov o
         |   ON c.doc_id = o.doc_id AND c.w = o.w
         |  AND c.surface = o.surface AND c.entity = o.entity)
         |SELECT doc_id, w, surface, entity, score FROM (
         | SELECT sc.*, row_number() OVER (PARTITION BY doc_id, w, surface
         |   ORDER BY score DESC, entity ASC) AS rk FROM sc) WHERE rk = 1""".stripMargin,

    "q80_unigram_logprob" ->
      """WITH tok AS (
        | SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |lm AS (SELECT tok, count(*) AS c FROM tok GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM lm)
        |SELECT doc_id, count(*) AS n_tok,
        | round(sum(ln(CAST(c AS DOUBLE) / (SELECT t FROM tot))) / count(*), 6)
        |   AS logprob_r6
        |FROM tok JOIN lm USING (tok)
        |GROUP BY doc_id""".stripMargin,

    "q89_sim_pq" ->
      // restates Similarity.pqTopK end-to-end: stride-sampled codebook
      // (the q52/q87 convention), per-(vector, subspace) nearest
      // codeword with smallest-index ties (d2 computed in dim order,
      // bit-identical to the codegen loop), probe distance tables,
      // ADC = list-ordered sum of table lookups, top-20 shortlist
      // (adc asc, cand_id asc), exact-cosine re-rank
      (s"""WITH $pqStrideCte,
        |$pqCodebookCtes,
        |adc AS (
        | -- ncw joined in as a row column: DuckDB lambdas reject
        | -- subqueries but allow correlated columns
        | SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
        |  list_sum(list_transform(range(1, 9),
        |    u -> p.dt[(u-1)*n.c + c.codes[u] + 1])) AS adc
        | FROM dtv p, encv c, ncw n
        | WHERE p.vec_id <> c.vec_id),
        |$pqTailSql""".stripMargin),

    "q90_sim_ivf_pq" ->
      // the q52 (IVF cell prune) ∘ q89 (PQ compress) composition —
      // Similarity.ivfPqTopK: identical codebook/encode/ADC chain, but
      // the adc relation is constrained to co-celled (probe, candidate)
      // pairs via the stride-centroid assignment
      (s"""WITH $pqStrideCte,
        |cents AS (
        | SELECT vec_id AS cent_id, embedding::DOUBLE[] AS cv
        | FROM embeddings WHERE vec_id % (SELECT stride FROM st) = 0),
        |assign AS (
        | SELECT vec_id, cell FROM (
        |  SELECT e.vec_id, c.cent_id AS cell,
        |   row_number() OVER (PARTITION BY e.vec_id
        |     ORDER BY list_distance(e.embedding::DOUBLE[], c.cv) ASC, c.cent_id ASC) AS rk
        |  FROM embeddings e CROSS JOIN cents c) WHERE rk = 1),
        |$pqCodebookCtes,
        |adc AS (
        | SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
        |  list_sum(list_transform(range(1, 9),
        |    u -> p.dt[(u-1)*n.c + c.codes[u] + 1])) AS adc
        | FROM dtv p, encv c, ncw n, assign pa, assign ca
        | WHERE pa.vec_id = p.vec_id AND ca.vec_id = c.vec_id
        |   AND pa.cell = ca.cell AND p.vec_id <> c.vec_id),
        |$pqTailSql""".stripMargin),

    "q91_sim_ivf_pq_res" ->
      // q90's cell prune, but the PQ chain runs over RESIDUAL lists
      // (elementwise double subtraction — exact, so restated verbatim)
      // with the half-stride-offset residual codebook
      (s"""WITH $pqStrideCte,
        |cents AS (
        | SELECT vec_id AS cent_id, embedding::DOUBLE[] AS cv
        | FROM embeddings WHERE vec_id % (SELECT stride FROM st) = 0),
        |assign AS (
        | SELECT vec_id, cell FROM (
        |  SELECT e.vec_id, c.cent_id AS cell,
        |   row_number() OVER (PARTITION BY e.vec_id
        |     ORDER BY list_distance(e.embedding::DOUBLE[], c.cv) ASC, c.cent_id ASC) AS rk
        |  FROM embeddings e CROSS JOIN cents c) WHERE rk = 1),
        |resv AS (
        | SELECT e.vec_id, a.cell,
        |  list_transform(range(1, len(e.embedding)+1),
        |    i -> e.embedding[i]::DOUBLE - c.cv[i]) AS res
        | FROM embeddings e
        | JOIN assign a ON e.vec_id = a.vec_id
        | JOIN cents c ON a.cell = c.cent_id),
        |${pqChainCtes("resv", "res",
             "vec_id % (SELECT stride FROM st) = (SELECT stride FROM st) // 2")},
        |adc AS (
        | SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
        |  list_sum(list_transform(range(1, 9),
        |    u -> p.dt[(u-1)*n.c + c.codes[u] + 1])) AS adc
        | FROM dtv p, encv c, ncw n, resv pa, resv ca
        | WHERE pa.vec_id = p.vec_id AND ca.vec_id = c.vec_id
        |   AND pa.cell = ca.cell AND p.vec_id <> c.vec_id),
        |$pqTailSql""".stripMargin),

    "q88_ccnet_buckets" ->
      // per-language ntile over the q80 unigram score, rounded BEFORE
      // ranking and tie-broken by doc_id — rank input identical across
      // engines, and ntile's equal-population split is SQL-standard in
      // both
      """WITH tok AS (
        | SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |lm AS (SELECT tok, count(*) AS c FROM tok GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM lm),
        |sc AS (
        | SELECT doc_id,
        |  round(sum(ln(CAST(c AS DOUBLE) / (SELECT t FROM tot))) / count(*), 6)
        |    AS lp_r6
        | FROM tok JOIN lm USING (tok)
        | GROUP BY doc_id)
        |SELECT d.doc_id, d.lang, sc.lp_r6,
        | ntile(3) OVER (PARTITION BY d.lang
        |   ORDER BY sc.lp_r6 DESC, d.doc_id ASC) AS bucket
        |FROM documents d JOIN sc ON d.doc_id = sc.doc_id""".stripMargin,

    "q86_bigram_logprob" ->
      """WITH bg AS (
        | SELECT doc_id, z[1] AS w1, z[2] AS w2
        | FROM (SELECT doc_id,
        |         unnest(list_zip(toks[1:length(toks)-1], toks[2:length(toks)])) AS z
        |       FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))
        | WHERE z[2] IS NOT NULL),
        |lm AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2),
        |ctx AS (SELECT w1, CAST(sum(c) AS DOUBLE) AS t FROM lm GROUP BY 1)
        |SELECT doc_id, count(*) AS n_bigrams,
        | round(sum(ln(CAST(c AS DOUBLE) / t)) / count(*), 6) AS logprob_r6
        |FROM bg JOIN lm USING (w1, w2) JOIN ctx USING (w1)
        |GROUP BY doc_id""".stripMargin,

    "q83_quality_classifier" ->
      """WITH f AS (
        | SELECT doc_id,
        |  CAST(length(toks) AS BIGINT) AS n_tokens,
        |  round(CAST(length(list_distinct(toks)) AS DOUBLE) / length(toks), 4) AS dr,
        |  round(CAST(length(list_filter(toks, t -> t IN ('the','a','of','and'))) AS DOUBLE)
        |    / length(toks), 4) AS sr,
        |  round(CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
        |    / length(toks), 4) AS mtl
        | FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
        |z AS (
        | SELECT doc_id,
        |  -3.0::DOUBLE + 0.5::DOUBLE * ln(CAST(n_tokens AS DOUBLE))
        |   + 3.0::DOUBLE * dr + 4.0::DOUBLE * sr - 0.2::DOUBLE * mtl AS z
        | FROM f)
        |SELECT doc_id,
        | round(1.0::DOUBLE / (1.0::DOUBLE + exp(-z)), 6) AS score_r6,
        | CAST(1.0::DOUBLE / (1.0::DOUBLE + exp(-z)) >= 0.5::DOUBLE AS INT) AS keep
        |FROM z""".stripMargin,

    "q82_incremental_dedup" ->
      s"""WITH $minhashPairsCte,
         |ip AS (
         | SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_other,
         |  a.sig AS sig_a, b.sig AS sig_b, (b.doc_id % 10 = 0) AS within_batch
         | FROM bk a JOIN bk b ON a.bucket = b.bucket
         | WHERE a.doc_id % 10 = 0 AND a.doc_id <> b.doc_id
         |   AND (b.doc_id % 10 <> 0 OR a.doc_id < b.doc_id))
         |SELECT id_new, id_other, within_batch,
         | round(length(list_filter(list_zip(sig_a, sig_b), z -> z[1] = z[2])) / 16.0, 4)
         |   AS est_jaccard
         |FROM ip""".stripMargin,

    "q81_triangles" ->
      // naive a<b<c enumeration — same exact triangle set as the
      // engine's degree-ordered compact-forward
      """WITH raw AS (
        |  SELECT z[1] AS src, z[2] AS dst
        |  FROM (SELECT unnest(list_zip(toks[1:length(toks)-1], toks[2:length(toks)])) AS z
        |        FROM (SELECT string_split(text, ' ') AS toks FROM documents))
        |  WHERE z[1] <> z[2]),
        |e AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM raw),
        |t AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1 JOIN e e2 ON e2.u = e1.v
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |n AS (
        |  SELECT a AS node FROM t
        |  UNION ALL SELECT b FROM t
        |  UNION ALL SELECT c FROM t)
        |SELECT node, count(*) AS n_tri FROM n GROUP BY node""".stripMargin,

    "q121_ktruss" ->
      // restates kTrussPeel verbatim: 3 unrolled peel rounds, support
      // per edge = common-neighbor count via the doubled adjacency
      // join, HAVING >= k-2 = 2 (absent edges have support 0 and
      // drop); MATERIALIZED against DuckDB CTE inlining
      """WITH raw AS (
        |  SELECT z[1] AS src, z[2] AS dst
        |  FROM (SELECT unnest(list_zip(toks[1:length(toks)-1], toks[2:length(toks)])) AS z
        |        FROM (SELECT string_split(text, ' ') AS toks FROM documents))
        |  WHERE z[1] <> z[2]),
        |e0 AS MATERIALIZED (
        |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM raw),
        |a0 AS MATERIALIZED (
        |  SELECT u AS x, v AS y FROM e0 UNION ALL SELECT v AS x, u AS y FROM e0),
        |e1 AS MATERIALIZED (
        |  SELECT e.u, e.v FROM e0 e
        |  JOIN a0 a ON a.x = e.u JOIN a0 b ON b.x = e.v AND a.y = b.y
        |  GROUP BY e.u, e.v HAVING count(*) >= 2),
        |a1 AS MATERIALIZED (
        |  SELECT u AS x, v AS y FROM e1 UNION ALL SELECT v AS x, u AS y FROM e1),
        |e2 AS MATERIALIZED (
        |  SELECT e.u, e.v FROM e1 e
        |  JOIN a1 a ON a.x = e.u JOIN a1 b ON b.x = e.v AND a.y = b.y
        |  GROUP BY e.u, e.v HAVING count(*) >= 2),
        |a2 AS MATERIALIZED (
        |  SELECT u AS x, v AS y FROM e2 UNION ALL SELECT v AS x, u AS y FROM e2),
        |e3 AS MATERIALIZED (
        |  SELECT e.u, e.v FROM e2 e
        |  JOIN a2 a ON a.x = e.u JOIN a2 b ON b.x = e.v AND a.y = b.y
        |  GROUP BY e.u, e.v HAVING count(*) >= 2)
        |SELECT u, v FROM e3""".stripMargin,

    "q48_fingerprint" ->
      """SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp,
        | count(*) AS n_docs, min(doc_id) AS first_doc
        |FROM documents GROUP BY 1 HAVING count(*) > 1""".stripMargin,

    "q49_media_meta" ->
      """SELECT doc_id AS media_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len
        |FROM documents""".stripMargin,

    "q55_vocab_stats" ->
      """SELECT lang, count(DISTINCT tok) AS n_vocab, count(*) AS n_tokens
        |FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
        |GROUP BY lang""".stripMargin,

    "q51_dedup_simhash" ->
      """WITH h AS (
        | SELECT doc_id, ('0x' || substring(md5(w.word), 1, 15))::BIGINT AS h
        | FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) w
        | WHERE w.word <> ''),
        |bits AS (
        | SELECT doc_id, b, sum(((h >> b) & 1)::INT) AS cnt, count(*) AS total
        | FROM h, range(0, 60) r(b) GROUP BY 1, 2)
        |SELECT doc_id,
        | CAST(sum(CASE WHEN 2*cnt > total THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS sh
        |FROM bits GROUP BY doc_id""".stripMargin,

    "q50_dedup_simhash_pairs" ->
      s"""WITH $simhashShCte
         |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         | CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         | AND $simhashBandMatch
         |WHERE bit_count(xor(a.sh, b.sh)) <= 20""".stripMargin,

    "q62_asof_join" ->
      """WITH clicks AS (
        | SELECT user_id, ts, round(max(value), 4) AS click_value
        | FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |purch AS (
        | SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, c.ts AS click_ts, c.click_value
        |FROM purch p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,

    "q64_connected_components" ->
      // components of the banded-simhash near-dup graph via a recursive
      // min-label reachability closure (set semantics terminate it)
      s"""WITH RECURSIVE $simhashShCte,
         |${simhashEdgeCte(8)},
        |sym AS (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e),
        |reach(n, m) AS (
        | SELECT src, src FROM sym
        | UNION
        | SELECT s.dst, r.m FROM reach r JOIN sym s ON s.src = r.n)
        |SELECT n AS node, min(m) AS label FROM reach GROUP BY n""".stripMargin,

    "q70_dedup_keep_list" ->
      s"""WITH RECURSIVE $simhashShCte,
         |${simhashEdgeCte(8)},
        |sym AS (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e),
        |reach(n, m) AS (
        | SELECT src, src FROM sym
        | UNION
        | SELECT s.dst, r.m FROM reach r JOIN sym s ON s.src = r.n),
        |lab AS (SELECT n AS node, min(m) AS label FROM reach GROUP BY n)
        |SELECT d.doc_id, coalesce(lab.label, d.doc_id) AS cluster,
        | CAST(lab.label IS NULL OR lab.label = d.doc_id AS INT) AS keep
        |FROM documents d LEFT JOIN lab ON d.doc_id = lab.node""".stripMargin,

    "q71_curated_corpus" ->
      """WITH gated AS (
        | SELECT doc_id, lang, text,
        |  CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  round(CAST(length(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |    / length(string_split(text, ' ')), 4) AS distinct_ratio
        | FROM documents
        | WHERE length(string_split(text, ' ')) >= 30
        |   AND round(CAST(length(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |     / length(string_split(text, ' ')), 4) >= 0.3),
        |canon AS (
        | SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rk
        | FROM gated)
        |SELECT doc_id, lang, n_tokens, distinct_ratio,
        | CAST(length(regexp_extract_all(text, '\b(key|hash|customer)\b')) AS BIGINT)
        |   AS n_secrets,
        | md5(regexp_replace(text, '\b(key|hash|customer)\b', '[REDACTED]', 'g'))
        |   AS redacted_hash
        |FROM canon WHERE rk = 1""".stripMargin,

    "q63_range_join" ->
      """WITH s AS (
        | SELECT user_id, event_id AS signup_id, ts AS start_ts,
        |  ts + INTERVAL 30 MINUTE AS end_ts
        | FROM events WHERE event_type = 'signup'),
        |c AS (
        | SELECT user_id, event_id AS click_id, ts
        | FROM events WHERE event_type = 'click')
        |SELECT c.click_id, s.signup_id, c.user_id,
        | CAST(date_diff('second', s.start_ts, c.ts) AS BIGINT) AS delta_sec
        |FROM c JOIN s ON c.user_id = s.user_id
        | AND c.ts >= s.start_ts AND c.ts <= s.end_ts""".stripMargin,

    "q61_tfidf_topterms" ->
      """WITH postings AS (
        | SELECT doc_id, term, count(*) AS tf FROM (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        | GROUP BY 1, 2),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM postings GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        | SELECT p.doc_id, p.term,
        |  round(p.tf * ln(n.n_docs / CAST(df.df AS DOUBLE)), 6) AS tfidf
        | FROM postings p JOIN df USING (term) CROSS JOIN n)
        |SELECT doc_id, rank, term, tfidf FROM (
        | SELECT doc_id, term, tfidf,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
        | FROM scored) WHERE rank <= 3""".stripMargin,

    "q60_length_quantiles" ->
      """SELECT lang,
        | round(quantile_cont(n_chars, 0.5), 2) AS p50,
        | round(quantile_cont(n_chars, 0.9), 2) AS p90,
        | round(quantile_cont(n_chars, 0.99), 2) AS p99,
        | max(n_chars) AS max_chars
        |FROM documents GROUP BY lang""".stripMargin,

    "q67_pack_shards" ->
      """SELECT doc_id, n AS n_tokens,
        | CAST(floor((cum - n) / 256.0) AS BIGINT) AS shard_id
        |FROM (
        | SELECT doc_id, n, sum(n) OVER (ORDER BY doc_id) AS cum FROM (
        |  SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents))""".stripMargin,

    "q56_sample_split" ->
      """WITH s AS (
        | SELECT lang,
        |  CASE WHEN substring(md5(doc_id::VARCHAR), 1, 2) <= 'cc' THEN 'train'
        |       WHEN substring(md5(doc_id::VARCHAR), 1, 2) <= 'e5' THEN 'val'
        |       ELSE 'test' END AS split,
        |  CASE WHEN substring(md5('s:' || doc_id::VARCHAR), 1, 2) < '03'
        |       THEN 1 ELSE 0 END AS samp
        | FROM documents)
        |SELECT split, lang, count(*) AS n_docs, CAST(sum(samp) AS BIGINT) AS n_sampled
        |FROM s GROUP BY 1, 2""".stripMargin,

    "q72_stratified_sample" ->
      """SELECT doc_id, lang FROM (
        | SELECT doc_id, lang,
        |  row_number() OVER (PARTITION BY lang
        |    ORDER BY md5('strat:' || doc_id::VARCHAR) ASC, doc_id ASC) AS rk
        | FROM documents) WHERE rk <= 40""".stripMargin,

    "q57_redact" ->
      """SELECT doc_id,
        | CAST(length(regexp_extract_all(text, '\b(key|hash|customer)\b')) AS BIGINT)
        |   AS n_secrets,
        | md5(regexp_replace(text, '\b(key|hash|customer)\b', '[REDACTED]', 'g'))
        |   AS redacted_hash
        |FROM documents""".stripMargin,

    "q58_boilerplate" ->
      """WITH ch AS (
        | SELECT doc_id, md5(c) AS h FROM (
        |  SELECT doc_id, unnest(regexp_extract_all(text, '[^ ]+( [^ ]+){0,4}')) AS c
        |  FROM documents)),
        |freq AS (SELECT h, count(DISTINCT doc_id) AS nd FROM ch GROUP BY 1)
        |SELECT ch.doc_id, count(*) AS n_chunks,
        | CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
        | round(CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |   / CAST(count(*) AS DOUBLE), 4) AS dup_ratio
        |FROM ch JOIN freq USING (h) GROUP BY ch.doc_id""".stripMargin,

    "q59_contamination" ->
      """WITH sh AS (
        | SELECT doc_id,
        |  list_transform(range(1, greatest(length(toks) - 1, 2)),
        |    i -> array_to_string(toks[i:i+2], ' ')) AS sh
        | FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
        |bench AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id < 20),
        |corp AS (SELECT doc_id, unnest(sh) AS s FROM sh WHERE doc_id >= 20)
        |SELECT corp.doc_id, count(DISTINCT corp.s) AS n_shared_shingles
        |FROM corp JOIN bench USING (s) GROUP BY 1""".stripMargin)
}
