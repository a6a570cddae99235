package object graft {
  /** Driver contract query shape: (session, sf-dir) => result DataFrame. */
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame
}
