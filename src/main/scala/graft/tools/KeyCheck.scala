package graft.tools
object KeyCheck {
  def main(a: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"RES queries=${q.size} oracles=${o.size} missingOracles=${(q -- o).toSeq.sorted} extraOracles=${(o -- q).toSeq.sorted}")
  }
}
