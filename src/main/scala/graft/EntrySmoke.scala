package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: replicate the driver's smoke check — a PLAIN session (no
  * extensions, no UTC pin, no tuned confs) calling SparkEntry.entry.
  * Guards against the entry path acquiring a hidden dependency on our
  * tuned session builders. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"[entry-smoke] rows=$n")
    require(n > 0, "entry returned no rows")
    spark.stop()
  }
}
