package graft.tools
object Keys {
  def main(args: Array[String]): Unit = {
    val oracled = graft.SparkEntry.oracleSql.keySet
    graft.SparkEntry.queries.keys.foreach { k =>
      println(s"$k|${if (oracled(k)) "yes" else "no"}")
    }
    println(s"TOTAL ${graft.SparkEntry.queries.size} oracled ${oracled.size}")
  }
}
