package graft
import org.apache.spark.sql.functions._
object QTime {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (name <- args) {
      val t0 = System.nanoTime()
      Bench.materialize(SparkEntry.queries(name)(spark, dir))
      val secs = (System.nanoTime() - t0) / 1e9
      val n = SparkEntry.queries(name)(spark, dir).count() // untimed, info only
      println(f"QTIME $name%-24s $secs%7.2fs rows=$n")
    }
    spark.stop()
  }
}
