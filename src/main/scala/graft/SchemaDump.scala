package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DoubleType, FloatType, ArrayType}

/** One-off inventory dump for the double-output allowlist spec
  * (r9 verdict #4): prints `key<TAB>col,col,...` for every registry
  * key whose OUTPUT schema carries a floating-point column (top-level
  * or array-of-float element). Run at sf0.001. */
object SchemaDump {
  /** Floating-point output columns of a schema (top-level double/float
    * or array-of-double/float element) — THE definition both the
    * regeneration dump below and DoubleLedgerSpec's drift gate use;
    * a single site so extending the rule (e.g. doubles nested in
    * structs) cannot desynchronize the inventory from the gate. */
  def floatCols(schema: org.apache.spark.sql.types.StructType): Seq[String] =
    schema.fields.collect {
      case f if f.dataType == DoubleType || f.dataType == FloatType =>
        f.name
      case f if (f.dataType match {
        case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
        case _ => false
      }) => f.name
    }.toSeq

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.sql.catalogImplementation", "in-memory")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val cols = floatCols(fn(spark, sfDir).schema)
        if (cols.nonEmpty) println(s"DBLCOL\t$name\t${cols.mkString(",")}")
        else println(s"DBLCOL\t$name\t")
      } catch {
        case e: Throwable => println(s"DBLERR\t$name\t${e.getMessage}")
      }
    }
    spark.stop()
  }
}
