package graft.fixtures

import graft.core.{CodeFile, Span}
import graft.functions.TextFunctions
import scala.util.Random

/**
 * Deterministic seeded `code_files` corpus generator (FIXTURES.md §2)
 * with planted ground truth — the analog of the reference's bundled
 * dump samples (src/test/resources/enwiki-20090902-pages-articles-sample.xml).
 *
 * Plants, with known ground truth:
 *  - mention anchors at known offsets (wiki-link analog);
 *  - alias files (`#ALIAS [[T]]`), incl. a name-level 2-hop chain and a
 *    2-cycle that documents actually MENTION (so closure resolution is
 *    exercised by the headline triples, not just by the alias tables);
 *  - one "popular entity" anchor in ~30% of files (skew for salted joins);
 *  - short/boring files failing the min-words check;
 *  - sha256(content) recorded per row.
 */
object CorpusGen {

  val entityNames: Vector[String] = Vector(
    "HashJoin", "SortMerge", "BroadcastExchange", "ShuffleWriter",
    "ColumnPruning", "PredicatePushdown", "TungstenCodegen", "CatalystRule",
    "AdaptivePlan", "SkewSplit", "RangePartitioner", "BloomFilter")

  /** surface form -> entity name; "spark engine" is a 2-word surface.
    * The last three surfaces resolve to planted alias NAMES (not
    * entities), so the headline pipeline's transitive closure has real
    * work: "oldapi" needs two hops, "midapi" one, "cyclic" must stay
    * unresolved (cycle members never settle). */
  val dictionary: Map[String, String] = Map(
    "hashjoin" -> "HashJoin",
    "sortmerge" -> "SortMerge",
    "broadcast" -> "BroadcastExchange",
    "shuffle" -> "ShuffleWriter",
    "prune" -> "ColumnPruning",
    "pushdown" -> "PredicatePushdown",
    "codegen" -> "TungstenCodegen",
    "catalyst" -> "CatalystRule",
    "aqe" -> "AdaptivePlan",
    "skew" -> "SkewSplit",
    "spark engine" -> "RangePartitioner",
    "bloom" -> "BloomFilter",
    "oldapi" -> "aliases/Hop0",
    "midapi" -> "aliases/Hop1",
    "cyclic" -> "aliases/CycleA")

  /**
   * Name-level alias graph, planted as real `#ALIAS` FILES — one copy
   * per lang, because mention URIs are lang-namespaced (titleToUri
   * semantics) and an alias edge only resolves a mention within the
   * same namespace. Gives the corpus a 2-hop chain
   * Hop0 -> Hop1 -> HashJoin and a 2-cycle CycleA <-> CycleB.
   */
  val plantedAliases: Map[String, String] = Map(
    "aliases/Hop0" -> "aliases/Hop1",
    "aliases/Hop1" -> "HashJoin",
    "aliases/CycleA" -> "aliases/CycleB",
    "aliases/CycleB" -> "aliases/CycleA")
  private val plantedNames: Vector[String] = plantedAliases.keys.toVector.sorted

  /**
   * Resolve a mention label through the planted alias graph exactly as
   * the distributed closure does: follow edges to the first non-alias
   * name; members of a cycle never settle, so the label stays as-is.
   * (The name-level oracle for the bench/test P/R `want` sets.)
   */
  def resolveName(n: String): String = {
    var cur = n
    val seen = scala.collection.mutable.HashSet.empty[String]
    while (plantedAliases.contains(cur)) {
      if (!seen.add(cur)) return n // cycle: never settles
      cur = plantedAliases(cur)
    }
    cur
  }

  /** The popular (skewed) surface: lands in ~30% of files. */
  val popularSurface = "shuffle"

  private val fillerVocab = Vector(
    "the", "fast", "key", "order", "sort", "table", "scan", "merge",
    "part", "window", "small", "batch", "stream", "dup", "group",
    "query", "row", "data", "slow", "filter", "customer", "line",
    "value", "agg", "column", "big", "vector")

  val langs = Vector("scala", "java", "py", "md")

  final case class Golden(
      file: CodeFile,
      aliasTarget: Option[String],            // target NAME (entity or alias), not uri
      mentions: Vector[Span])                 // label = entity name here

  /**
   * One file, deterministic from its index alone — safe to call from
   * executors (`spark.range(n).map(i => CorpusGen.file(i))`), so the
   * bench corpus generates in parallel with no driver bottleneck and no
   * cross-partition coupling.
   */
  def file(i: Long, seed: Long = 42L, scale: Int = 1): CodeFile =
    genOne(i.toInt, new Random(seed ^ (i * 0x9e3779b97f4a7c15L)), scale).file

  /** Generate `n` files deterministically (seed fixed). `scale`
    * multiplies per-file content volume (bench corpora use larger
    * files so parse work dominates scheduling overhead). */
  def generate(n: Int, seed: Long = 42L, scale: Int = 1): Vector[Golden] = {
    val out = Vector.newBuilder[Golden]
    var i = 0
    while (i < n) {
      out += genOne(i, new Random(seed ^ (i.toLong * 0x9e3779b97f4a7c15L)), scale)
      i += 1
    }
    out.result()
  }

  private def genOne(i: Int, rnd: Random, scale: Int = 1): Golden = {
    // indices [0, |plantedAliases| x |langs|) are the planted name-level
    // alias files: one per (alias name, lang)
    val nPlanted = plantedNames.length * langs.length
    if (i < nPlanted) {
      val name = plantedNames(i / langs.length)
      val lang = langs(i % langs.length)
      val slash = name.indexOf('/')
      val (repo, path) = (name.substring(0, slash), name.substring(slash + 1))
      val target = plantedAliases(name)
      val cf = CodeFile(repo, path,
        commit = TextFunctions.sha256Hex(s"$repo/$path").take(12),
        lang = lang, content = s"#ALIAS [[$target]]")
      return Golden(cf, Some(target), Vector.empty)
    }
    {
      val lang = langs(rnd.nextInt(langs.length))
      val repo = s"org${i % 37}/proj${i % 11}"
      val path = s"src/pkg${i % 7}/File$i.$lang"
      val kind = i % 101
      val (content, alias, mentions) =
        if (kind == 99) {
          // alias chain member: File i -> entity (i%12), plus a planted 2-cycle pair
          val target = entityNames(i % entityNames.length)
          (s"#ALIAS [[$target]]", Some(target), Vector.empty[Span])
        } else if (kind == 100) {
          (s"#ALIAS [[${entityNames((i + 1) % entityNames.length)}]]",
            Some(entityNames((i + 1) % entityNames.length)), Vector.empty[Span])
        } else if (kind == 98) {
          // boring/short file (fails min-words gate)
          ("tiny file", None, Vector.empty[Span])
        } else {
          val nLines = (2 + rnd.nextInt(4)) * scale
          val sb = new StringBuilder
          val ms = Vector.newBuilder[Span]
          sb.append(s"## File$i header\n")
          var l = 0
          while (l < nLines) {
            val nToks = 8 + rnd.nextInt(12)
            var t = 0
            while (t < nToks) {
              if (t > 0) sb.append(' ')
              val r = rnd.nextDouble()
              val word =
                if (r < 0.04 * (if (l == 0 && t == 3) 8 else 1) && rnd.nextDouble() < 0.3)
                  popularSurface
                else if (r < 0.05 && t < nToks - 1)
                  "spark engine" // the multi-word surface (greedy match)
                else if (r < 0.08) {
                  val keys = dictionary.keysIterator.filterNot(_.contains(' ')).toVector.sorted
                  keys(rnd.nextInt(keys.length))
                } else fillerVocab(rnd.nextInt(fillerVocab.length))
              if (dictionary.contains(word)) {
                val b = sb.length
                ms += Span(b, b + word.length, dictionary(word), word)
              }
              sb.append(word)
              t += 1
            }
            sb.append('\n')
            l += 1
          }
          (sb.toString.stripSuffix("\n"), None, ms.result())
        }
      val cf = CodeFile(repo, path,
        commit = TextFunctions.sha256Hex(s"$repo/$path").take(12),
        lang = lang, content = content)
      Golden(cf, alias, mentions)
    }
  }

  /** Alias edge list planted by `generate`: uri(file) -> uri(entity). */
  def aliasEdges(gs: Vector[Golden]): Vector[(String, String)] =
    gs.collect { case g if g.aliasTarget.isDefined =>
      (TextFunctions.nameToUri(s"${g.file.repo}/${g.file.path}", g.file.lang),
        TextFunctions.nameToUri(g.aliasTarget.get, g.file.lang))
    }
}
