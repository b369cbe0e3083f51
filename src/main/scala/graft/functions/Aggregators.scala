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
   * items are pre-truncated to sizeLimit so a pathological row can never
   * blow the buffer past O(sizeLimit) per pending item.
   */
  final class CappedConcat(sizeLimit: Int = 100000)
      extends Aggregator[(Long, String), Seq[(Long, String)], String] {
    def zero: Seq[(Long, String)] = Seq.empty
    def reduce(b: Seq[(Long, String)], a: (Long, String)): Seq[(Long, String)] =
      if (a._2 == null) b
      else b :+ (a._1, if (a._2.length > sizeLimit) a._2.substring(0, sizeLimit) else a._2)
    def merge(b1: Seq[(Long, String)], b2: Seq[(Long, String)]): Seq[(Long, String)] = b1 ++ b2
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

  object ExprEncoders {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    implicit val seqLongString: Encoder[Seq[(Long, String)]] =
      ExpressionEncoder[Seq[(Long, String)]]()
  }
}
