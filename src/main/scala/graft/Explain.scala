package graft

/** Dev tool: print the formatted physical plan (and codegen stage count)
  * for any SparkEntry query: `sbt 'runMain graft.Explain q07_join_revenue'`.
  * AQE is disabled so the full pre-adaptive plan (with codegen stage
  * markers) is visible. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder().config("spark.sql.adaptive.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for (name <- args) {
      println(s"===== $name =====")
      val df = SparkEntry.queries(name)(spark, dir)
      df.explain("formatted")
      import org.apache.spark.sql.execution.debug._
      println(s"codegen stages: ${df.queryExecution.debug.codegenToSeq().size}")
    }
    spark.stop()
  }
}
