package graft
object PrintKeys {
  def main(args: Array[String]): Unit = {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    println("KEYS=" + qs.size + " ORACLES=" + os.size)
    println("NO_ORACLE=" + (qs -- os).toSeq.sorted.mkString(","))
    qs.toSeq.sorted.foreach(println)
  }
}
