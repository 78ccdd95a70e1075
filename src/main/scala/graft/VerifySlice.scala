package graft

// scratch plan audit — deleted before commit
import org.apache.spark.sql.SparkSession

object VerifySlice {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (q <- Seq("q_pq_encode", "q_pq_topk", "q_ivfpq_topk")) {
      println(s"===== $q =====")
      graft.queries.Queries.all(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
