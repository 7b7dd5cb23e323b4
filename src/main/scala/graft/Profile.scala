package graft

import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the hot queries (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"T $label%-30s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }
    val li = graft.sources.Tables.table(spark, dir, "lineitem")
    time("scan only")(li.count())
    time("double sums")(li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")), sum(col("l_extendedprice")), count(lit(1))).count())
    time("decimal sums (q01 form)")(li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double"),
           sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double"),
           sum(col("l_extendedprice").cast("decimal(18,2)") * (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))).cast("double"),
           count(lit(1))).count())
    time("cents sums")(li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg((sum(round(col("l_quantity") * 100).cast("long")) / 100.0),
           (sum(round(col("l_extendedprice") * 100).cast("long")) / 100.0),
           (sum(round(col("l_extendedprice") * 100).cast("long") * (lit(100L) - round(col("l_discount") * 100).cast("long"))) / 10000.0),
           count(lit(1))).count())
    time("decimal sums again")(li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double"),
           sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double"),
           sum(col("l_extendedprice").cast("decimal(18,2)") * (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))).cast("double"),
           count(lit(1))).count())
    spark.stop()
  }
}
