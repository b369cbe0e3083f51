package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Redirect / alias canonicalization — re-realization of
 * examples/extract_redirects.pig + the redirect-resolution joins of
 * ner-corpus/02_dbpedia_article_types.pig:23-25 and
 * topic-corpus/02_create_topics_descriptions.pig:73-80, upgraded per
 * the north rule from the reference's one-hop resolution (§2.10.2) to
 * an iterative self-join transitive closure with cycle guard.
 *
 * Scale notes: each iteration is one shuffle join on `dst`; the frontier
 * is persisted and materialized by the fixpoint `count` (on a cluster:
 * an Iceberg snapshot checkpoint) to cut lineage — without it the plan
 * doubles per iteration and the driver chokes on plan size long before
 * data is the problem. persist+count is ONE job per level where
 * eager-localCheckpoint+isEmpty was two; at small alias-graph sizes the
 * closure is scheduling-latency-bound, not data-bound, so job count is
 * the cost that matters. The edge list (alias graph) is orders of
 * magnitude smaller than the corpus, so on a cluster the final
 * application of the closure to the corpus is a broadcast join.
 */
object Redirects {

  /**
   * One-hop resolution (exact reference semantics,
   * ner-corpus/02_…pig:23-25): left join `rel.key -> edges.src`, coalesce
   * to the redirect target when present.
   */
  def resolveOneHop(rel: DataFrame, edges: DataFrame, key: String): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    rel.join(e, rel(key) === e("src"), "left_outer")
      .withColumn(key, coalesce(col("dst"), col(key)))
      .drop("src", "dst")
  }

  /**
   * Transitive closure of an alias edge list to a fixpoint (depth-capped).
   * Input: edges(src, dst). Output: (src, root) where root is the final
   * non-alias target; members of a cycle never settle and are dropped.
   *
   * Cycle guard = NoLoopInPath semantics (evaluation/NoLoopInPath.java:32-67):
   * each step checks the newly visited node against the accumulated path.
   */
  def transitiveClosure(edges: DataFrame, maxDepth: Int = 16,
      localThreshold: Long = 2000000L): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Adaptive fast path: alias graphs are orders of magnitude smaller
    // than the corpus; below the threshold, a FUNCTIONAL graph (at most
    // one successor per node — what single-#ALIAS-declaration corpora
    // produce) resolves on the driver in linear time with memoization.
    // Memoization is only sound on functional graphs (on general graphs
    // a node's reachable-terminal set depends on the path taken), so
    // non-functional graphs fall through to the distributed loop. Same
    // output contract incl. the maxDepth cap (equivalence tested).
    if (e.count() <= localThreshold) {
      resolveLocalFunctional(e, maxDepth.toLong) match {
        case Some(out) =>
          e.unpersist(false) // collected; the local result reads no cache
          return out
        case None => () // non-functional: fall through to the loop
      }
    }
    // seed: every edge, path = [src] (nodes already visited)
    var frontier = e.select(col("src"), col("dst"), array(col("src")).as("path"))
    val cachedLevels = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var settled: DataFrame = null
    var depth = 0
    var done = false
    while (depth < maxDepth && !done) {
      val step = frontier.as("f")
        .join(e.as("n"), col("f.dst") === col("n.src"), "left_outer")
        .select(
          col("f.src").as("src"),
          col("f.dst").as("cur"),
          col("n.dst").as("next"),
          col("f.path").as("path"))
      // settled: cur is not an alias source -> cur is the root
      val newSettled = step.filter(col("next").isNull)
        .select(col("src"), col("cur").as("root"))
      settled = if (settled == null) newSettled else settled.unionByName(newSettled)
      // continue: visit cur, drop cycles (cur already on the path)
      val cached = step.filter(col("next").isNotNull)
        .filter(!array_contains(col("path"), col("cur")))
        .select(
          col("src"),
          col("next").as("dst"),
          concat(col("path"), array(col("cur"))).as("path"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cachedLevels += cached
      depth += 1
      // persist stops recomputation but the logical plan still nests one
      // level per iteration; truncate it with a real checkpoint every
      // 4 levels so a deep closure can't grow an unplannable tree
      // (checkpoint blocks are auto-freed by the ContextCleaner once
      // unreferenced)
      // lazy checkpoint: the fixpoint count below materializes it (one
      // job on every depth, where the eager form cost two on each 4th)
      frontier = if (depth % 4 == 0) cached.localCheckpoint(eager = false) else cached
      done = frontier.count() == 0
    }
    // the settled plan reads every level's cache, so materialize the
    // (alias-graph-sized) result ONCE, then release all loop caches —
    // previously each level's persist leaked into the session for the
    // app lifetime. Post-call persisted delta: one checkpointed result,
    // independent of depth. (localCheckpoint blocks are executor-local,
    // not fault-tolerant: a multi-hour cluster run should write the
    // closure through a reliable stage snapshot instead —
    // Checkpoints.runStage — and resume from it.)
    val out = settled.distinct().localCheckpoint(true)
    cachedLevels.foreach(_.unpersist(false))
    e.unpersist(false)
    out
  }

  /**
   * Driver-side resolver for a small FUNCTIONAL alias graph (at most
   * one successor per node — what single-#ALIAS-declaration corpora
   * produce): linear time with memoization, cycles dropped, sources
   * more than `maxHops` from their terminal unsettled. Memoization is
   * only sound on functional graphs (on general graphs a node's
   * reachable-terminal set depends on the path taken), so
   * non-functional graphs return None and the caller runs its
   * distributed loop. Shared by [[transitiveClosure]] (hop cap =
   * maxDepth) and [[transitiveClosureDoubling]] (hop cap = 2^maxRounds).
   */
  private def resolveLocalFunctional(e: DataFrame, maxHops: Long): Option[DataFrame] = {
    val rows = e.collect()
    val srcs = rows.map(_.get(0))
    if (srcs.distinct.length != srcs.length) return None
    val succ = rows.map(r => r.get(0) -> r.get(1)).toMap
    // memo: node -> Some((root, hops-to-root)) | None (cycle)
    val memo = scala.collection.mutable.HashMap.empty[Any, Option[(Any, Long)]]
    def resolve(start: Any): Option[(Any, Long)] = memo.get(start) match {
      case Some(r) => r
      case None =>
        val path = scala.collection.mutable.ArrayBuffer[Any](start)
        val onPath = scala.collection.mutable.HashSet[Any](start)
        // res = Some((root, hops from START)) or None for a cycle
        var res: Option[Option[(Any, Long)]] = None
        while (res.isEmpty) {
          val cur = path.last
          succ.get(cur) match {
            case None => res = Some(Some((cur, path.length - 1L)))
            case Some(next) if onPath.contains(next) => res = Some(None)
            case Some(next) => memo.get(next) match {
              case Some(Some((r, d))) => res = Some(Some((r, d + path.length)))
              case Some(None) => res = Some(None)
              case None => path += next; onPath += next
            }
          }
        }
        val out = res.get
        // memoize every node on the walked path: path(i) is i hops
        // past START, so its distance to the root is d - i
        path.indices.foreach { i =>
          memo(path(i)) = out.map { case (r, d) => (r, d - i) }
        }
        out
    }
    val settled = srcs.flatMap { s =>
      resolve(s) match {
        case Some((root, h)) if h <= maxHops => Some((s, root))
        case _ => None
      }
    }
    val spark = e.sparkSession
    val t = e.schema.fields(0).dataType
    Some(spark.createDataFrame(
      spark.sparkContext.parallelize(
        settled.toSeq.map { case (s, r) => org.apache.spark.sql.Row(s, r) }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("src", t),
        org.apache.spark.sql.types.StructField("root", t)))))
  }

  /**
   * Pointer-doubling transitive closure — the SCALE PATH for deep
   * chains on a FUNCTIONAL alias graph (at most one outgoing edge per
   * src, which redirect/alias maps are by construction): after round k
   * every pointer has jumped 2^k hops, so `maxRounds` rounds resolve
   * chains up to 2^maxRounds long with O(|V| log depth) total join work
   * where the per-hop loop does O(|V| · depth). Cycle members never
   * reach a terminal and are dropped by the final anti-join — the same
   * output contract as [[transitiveClosure]] (equivalence tested).
   */
  def transitiveClosureDoubling(edges: DataFrame, maxRounds: Int = 16,
      localThreshold: Long = 2000000L): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edges.select(col("src"), col("dst")).distinct().persist(lvl)
    // same adaptive driver fast path as transitiveClosure (alias graphs
    // are orders of magnitude under the corpus); hop cap = 2^maxRounds,
    // matching what `maxRounds` doubling rounds can resolve
    if (e.count() <= localThreshold) {
      resolveLocalFunctional(e, 1L << math.min(maxRounds, 62)) match {
        case Some(out) => e.unpersist(false); return out
        case None => ()
      }
    }
    var f = e.select(col("src"), col("dst").as("cur")).persist(lvl)
    var prev: DataFrame = f
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val jumped = f.as("a")
        .join(f.as("b"), col("a.cur") === col("b.src"), "left_outer")
        .select(col("a.src").as("src"),
          coalesce(col("b.cur"), col("a.cur")).as("cur"),
          col("b.cur").isNotNull.as("_moved"))
        .persist(lvl)
      // converged when nothing moved. Rows inside a cycle move forever,
      // so a cyclic graph runs all maxRounds — bounded, and each round
      // is one |V|-row self-join (cheap at alias-graph sizes); their
      // rows are dropped by the final anti-join regardless.
      val moved = jumped.filter(col("_moved")).count()
      // the previous level's cache is superseded the moment `jumped` is
      // materialized — unpersist it so a long-running session doesn't
      // accumulate one cached RDD per round
      if (prev ne null) prev.unpersist(false)
      prev = jumped
      f = jumped.drop("_moved")
      // lazy: the next round's moved-count (or the final anti-join's
      // checkpoint) materializes it — saves one job per lineage cut
      if (round % 4 == 3) f = f.localCheckpoint(eager = false)
      round += 1
      converged = moved == 0
    }
    // settled: jump target has no outgoing edge (terminal); cycle
    // members still point at an alias source and are dropped. The
    // result is eagerly checkpointed (it is alias-graph-sized, orders
    // of magnitude under the corpus) so every loop cache can be freed
    // here instead of leaking until the caller drops the result.
    val out = f.join(e.select(col("src").as("cur")).distinct(), Seq("cur"), "left_anti")
      .select(col("src"), col("cur").as("root"))
      .distinct()
      .localCheckpoint(true)
    if (prev ne null) prev.unpersist(false)
    e.unpersist(false)
    out
  }

  /**
   * Cycle membership in a FUNCTIONAL redirect graph — the audit
   * companion to the closures above, which silently DROP cycle members
   * (NoLoopInPath semantics): this reports exactly which redirect
   * targets sit on a loop and therefore can never canonicalize (the
   * rows a data-quality gate should surface, not swallow).
   *
   * Algorithm: exact-power pointer doubling. succ_1 = edges; succ_2k =
   * succ_k ∘ succ_k (inner join, so a walk that exits the domain —
   * reaches a terminal — drops out). Once span > |srcs|, a surviving
   * walk has stepped from more positions than there are distinct alias
   * sources, so some position repeated — it entered a cycle, and its
   * endpoint lies ON that cycle (span > |srcs| strictly: at span =
   * |srcs| exactly, a Hamiltonian chain's TERMINAL still survives in
   * the image); conversely succ_span restricted to a cycle is a rotation
   * (a bijection), so every cycle node appears as an endpoint. Image
   * of the final relation = the cycle nodes, exactly.
   *
   * SCALE: the relation stays FUNCTIONAL throughout (unique src, ≤ one
   * row per source survives composition — no distinct needed, no
   * blow-up possible), so the whole run is ⌈log₂ n⌉ self-joins of an
   * ≤ n-row relation: O(n log n) vs the O(n²) of step-by-step walking.
   * Each round self-joins its own output, which DOUBLES the logical
   * plan per round — checkpoint every round (the ccContraction
   * discipline) or the driver chokes on plan size long before data.
   * Only sound on functional graphs (multi-successor composition
   * enumerates paths, not positions) — enforced with one alias-sized
   * aggregate up front.
   */
  def cycleMembers(edges: DataFrame,
      localThreshold: Long = 4000000L): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint(true)
    // the driver twin compares collected values as boxed Any — an
    // Integer src never equals a Long dst there, while the SQL join
    // casts; demand one id type so the paths cannot silently diverge
    require(e.schema.fields(0).dataType == e.schema.fields(1).dataType,
      s"cycleMembers: src/dst types differ (${e.schema.fields(0).dataType} " +
        s"vs ${e.schema.fields(1).dataType}); cast the edge columns to one id type")
    val n = e.count()
    if (n > 0) {
      val maxOut = e.groupBy(col("src")).agg(count(lit(1)).as("c"))
        .agg(max(col("c"))).head().getLong(0)
      require(maxOut <= 1,
        s"cycleMembers requires a functional graph (max out-degree 1), found $maxOut")
    }
    // adaptive driver fast path (the pageRank/hopDistance convention):
    // ⌈log₂n⌉ checkpointed self-joins are pure scheduling latency at
    // small n, and a functional graph's cycles fall out of one linear
    // color walk over the collected edge list
    if (n <= localThreshold) return cycleMembersLocal(e)
    var f = e
    var span = 1L
    var fCount = n
    while (span <= n && fCount > 0) {
      // strict span > |srcs| exit (see doc); the survivor count doubles
      // as the emptiness check and stops the common acyclic-forest case
      // after ~max-chain-length rounds instead of all ceil(log2 n) of
      // them. LAZY checkpoint + count = ONE job per round (the eager
      // checkpoint + limit(1) probe pair cost two); the checkpoint
      // still cuts the plan every round — the self-join doubles it.
      f = f.as("a").join(f.as("b"), col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"))
        .localCheckpoint(eager = false)
      fCount = f.count()
      span *= 2
    }
    f.select(col("dst").as("node")).distinct()
  }

  /** Driver-side twin: three-color walk over the collected functional
    * edge list — a gray-hit closes a cycle and marks exactly the
    * segment from the hit back to the walk's tip; same (node) schema
    * and semantics as the pointer-doubling loop. */
  private def cycleMembersLocal(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    val succ = scala.collection.mutable.HashMap.empty[Any, Any]
    e.collect().foreach(r => succ(r.get(0)) = r.get(1))
    val color = scala.collection.mutable.HashMap.empty[Any, Int] // 1 gray 2 done
    val onCycle = scala.collection.mutable.LinkedHashSet.empty[Any]
    succ.keys.foreach { start =>
      if (!color.contains(start)) {
        val path = scala.collection.mutable.ArrayBuffer.empty[Any]
        var cur: Any = start
        var halted = false
        while (!halted) {
          color.get(cur) match {
            case Some(1) => // gray: the path from cur's position is a cycle
              onCycle ++= path.drop(path.indexOf(cur))
              halted = true
            case Some(_) => halted = true // done: joins a settled walk
            case None =>
              color(cur) = 1; path += cur
              succ.get(cur) match {
                case Some(nx) => cur = nx
                case None => halted = true // exits the domain
              }
          }
        }
        path.foreach(v => color(v) = 2)
      }
    }
    val nodeType = e.schema.fields(1).dataType
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        onCycle.toSeq.map(org.apache.spark.sql.Row(_)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node", nodeType))))
  }
}
