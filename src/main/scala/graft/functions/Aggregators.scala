package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Typed Aggregators for the holistic bag-aggregation UDFs of the
 * reference (pignlproc evaluation/AggregateTextBag.java,
 * ConcatTextBag.java, MergeAsOpenNLPAnnotatedText.java). These run as
 * real partial/final aggregations (map-side combine) instead of
 * collect_list-then-UDF, so groups never materialize unsorted on one
 * node; determinism comes from an explicit (sortKey, value) input —
 * SURVEY §2.10.4: Pig bag order was nondeterministic, here we mandate a
 * sort key.
 */
object Aggregators {

  /**
   * Size-capped concat (AggregateTextBag.java:53-109 semantics via
   * TextFunctions.cappedConcat). Buffer keeps (sortKey, item) pairs;
   * items are pre-truncated to sizeLimit, and the buffer itself is
   * BOUNDED at O(sizeLimit) total characters: a hot group (one entity
   * mentioned in millions of sentences) can never materialize whole in
   * a partial.
   *
   * Bounding rule (prefix-monotone, so partials may apply it
   * independently and merge stays associative): sort by key, keep items
   * while the running sum of min(len, 199) + 1 over PRIOR items is
   * <= sizeLimit. The +1 is each item's separator — without it a run
   * of zero-length items contributes 0 and the buffer is unbounded in
   * item COUNT (the exact hot-group blowup this class exists to stop);
   * with it the buffer holds at most sizeLimit + 1 items.
   * Soundness: cappedConcat's per-item budget is >= 200 and a
   * word-boundary cut never shrinks an item below budget-1 chars, so
   * k prior items consume >= Σ min(len,199) + (k-1) = acc - 1 output
   * chars; item k+1 can be emitted only while consumption < sizeLimit,
   * i.e. only while acc <= sizeLimit — dropping at acc > sizeLimit
   * never drops an emittable item. Count-consistency: per-item budget
   * = max(sizeLimit/n, 200) depends on the group count n, but whenever
   * the rule drops anything the kept prefix alone has n_kept >=
   * sizeLimit/200 items, which forces the budget to its 200 floor for
   * both the true n and the kept n — identical output.
   */
  final class CappedConcat(sizeLimit: Int = 100000)
      extends Aggregator[(Long, String), Seq[(Long, String)], String] {
    // re-sort + re-trim amortized: only when the buffer grows past this
    private val slack = 256
    private def bound(b: Seq[(Long, String)]): Seq[(Long, String)] = {
      val sorted = b.sortBy(_._1)
      var acc = 0L
      val out = Seq.newBuilder[(Long, String)]
      val it = sorted.iterator
      var stop = false
      while (it.hasNext && !stop) {
        val kv = it.next()
        if (acc > sizeLimit) stop = true
        else { out += kv; acc += math.min(kv._2.length, 199).toLong + 1 }
      }
      out.result()
    }
    private def maybeBound(b: Seq[(Long, String)]): Seq[(Long, String)] = {
      // cheap char-sum test; only pay the sort when something can drop
      if (b.length <= slack) b
      else {
        var chars = 0L
        b.foreach(kv => chars += math.min(kv._2.length, 199).toLong + 1)
        if (chars <= sizeLimit) b else bound(b)
      }
    }
    def zero: Seq[(Long, String)] = Seq.empty
    def reduce(b: Seq[(Long, String)], a: (Long, String)): Seq[(Long, String)] =
      if (a._2 == null) b
      else {
        val nb =
          b :+ (a._1, if (a._2.length > sizeLimit) a._2.substring(0, sizeLimit) else a._2)
        // amortized: the O(n) check runs once per `slack` appends
        if (nb.length % slack == 0) maybeBound(nb) else nb
      }
    def merge(b1: Seq[(Long, String)], b2: Seq[(Long, String)]): Seq[(Long, String)] =
      maybeBound(b1 ++ b2)
    def finish(b: Seq[(Long, String)]): String =
      TextFunctions.cappedConcat(b.sortBy(_._1).map(_._2), sizeLimit)
    def bufferEncoder: Encoder[Seq[(Long, String)]] = ExprEncoders.seqLongString
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Trim-dedup-join (ConcatTextBag.java:44-95) with explicit sort key. */
  final class ConcatDistinct(sep: String = " ")
      extends Aggregator[(Long, String), Seq[(Long, String)], String] {
    def zero: Seq[(Long, String)] = Seq.empty
    def reduce(b: Seq[(Long, String)], a: (Long, String)): Seq[(Long, String)] =
      if (a._2 == null) b else b :+ a
    def merge(b1: Seq[(Long, String)], b2: Seq[(Long, String)]): Seq[(Long, String)] = b1 ++ b2
    def finish(b: Seq[(Long, String)]): String =
      TextFunctions.concatDistinct(b.sortBy(_._1).map(_._2), sep)
    def bufferEncoder: Encoder[Seq[(Long, String)]] = ExprEncoders.seqLongString
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /**
   * Misra-Gries heavy-hitters sketch (mergeable summaries form,
   * Agarwal et al., PODS'12): at most `k` counters; every key whose
   * true frequency exceeds n/(k+1) is GUARANTEED to survive (counts are
   * underestimates, never missing keys above the threshold — which is
   * what makes it composable with an exact recount of the candidate
   * set). `merge` is pointwise sum followed by the (k+1)-th-largest
   * decrement, preserving the guarantee across partials — so this runs
   * as a true map-side-combining aggregation. This is the hot-key
   * DETECTOR that feeds Skew.saltedJoin: find the popular entities in
   * one cheap pass, salt only those.
   */
  final class MisraGries(k: Int = 64)
      extends Aggregator[String, Map[String, Long], Seq[String]] {
    def zero: Map[String, Long] = Map.empty

    private def shrink(m: Map[String, Long]): Map[String, Long] =
      if (m.size <= k) m
      else {
        // subtract the (k+1)-th largest count from everything
        val cut = m.values.toSeq.sortBy(-_)(Ordering.Long)(k)
        m.flatMap { case (key, c) => if (c > cut) Some(key -> (c - cut)) else None }
      }

    def reduce(b: Map[String, Long], a: String): Map[String, Long] =
      if (a == null) b
      else shrink(b.updated(a, b.getOrElse(a, 0L) + 1L))

    def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] =
      shrink(b2.foldLeft(b1) { case (m, (key, c)) =>
        m.updated(key, m.getOrElse(key, 0L) + c)
      })

    def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted
    def bufferEncoder: Encoder[Map[String, Long]] = ExprEncoders.mapStringLong
    def outputEncoder: Encoder[Seq[String]] = ExprEncoders.seqString
  }

  object ExprEncoders {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val seqLongString: Encoder[Seq[(Long, String)]] =
      ExpressionEncoder[Seq[(Long, String)]]()
    implicit val mapStringLong: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    implicit val seqString: Encoder[Seq[String]] =
      ExpressionEncoder[Seq[String]]()
  }
}
