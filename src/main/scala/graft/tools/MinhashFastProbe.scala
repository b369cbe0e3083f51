// Scratch: relational-md5 vs one-pass-expr vs xxhash64 minhash timing at sf0.1.
package graft.tools
import org.apache.spark.sql.SparkSession
object MinhashFastProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.documents(s, "/root/testdata/sf0.1")
    docs.count()
    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
    }
    import graft.pipeline.Dedup
    for (_ <- 1 to 2) {
      t("sig-relational")(Dedup.minhashSignatures(docs).count())
      t("sig-onepass   ")(Dedup.minhashSignaturesOnePass(docs).count())
      t("cand-onepass  ")(Dedup.minhashCandidates(docs).count())
      t("cand-xxh      ")(Dedup.minhashCandidatesFast(docs).count())
    }
    s.stop()
  }
}
