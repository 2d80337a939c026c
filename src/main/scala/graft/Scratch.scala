package graft
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.props("graft.materialize") = "off"
    val docs = graft.sources.Tables.documentsWide(spark, "/root/testdata/sf0.1")
    val ex = graft.operators.DedupOps.docShingles(docs)
      .select(col("doc_id"), explode_outer(col("shingles")).as("s"))
      .filter(col("s").isNotNull)
    ex.explain("formatted")
    spark.stop()
  }
}
