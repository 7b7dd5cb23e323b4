package graft
import org.apache.spark.sql.functions._
object QTime {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (name <- args) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"QTIME $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }
    spark.stop()
  }
}
