package object graft {
  /** Signature the driver contract imposes on every query:
    * (session, scale-factor dir) => result DataFrame. */
  type QFn = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame
}
