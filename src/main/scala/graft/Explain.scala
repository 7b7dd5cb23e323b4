package graft
import graft.functions.{PortableHash, TextOps}
import graft.plans.ArrayExprs
import org.apache.spark.sql.functions._
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"T $label%-30s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }
    val docs = graft.sources.Tables.table(spark, dir, "documents")
    val prepped = docs.select(col("doc_id"), col("text"))
      .withColumn("hs", ArrayExprs.sticky(array_sort(array_distinct(
        transform(TextOps.wordShingles(col("text"), 1), s => PortableHash.hash32(s))))))
      .withColumn("sz", size(col("hs")))
      .withColumn("block", ArrayExprs.sticky(floor(TextOps.tokenCount(col("text")) / 16)))
      .select("doc_id", "hs", "sz", "block")
    time("prep write")(({prepped.write.mode("overwrite").parquet("/tmp/prep20"); 0L}))
    val p = spark.read.parquet("/tmp/prep20")
    val a = p.select(col("block"), col("doc_id").as("id_a"), col("hs").as("hs_a"), col("sz").as("sz_a"))
    val b = p.select(col("block").as("block_r"), col("doc_id").as("id_b"), col("hs").as("hs_b"), col("sz").as("sz_b"))
    val cond = col("block") === col("block_r") && col("id_a") < col("id_b") &&
      greatest(col("sz_a"), col("sz_b")) > 0 &&
      least(col("sz_a"), col("sz_b")) * lit(1000000L) >= lit(900000L) * greatest(col("sz_a"), col("sz_b"))
    time("pure join count")(a.join(b, cond).count())
    val inter = ArrayExprs.sticky(ArrayExprs.sortedIntersectCount(col("hs_a"), col("hs_b")).cast("long"))
    val j2 = a.join(b, cond)
      .select(col("id_a"), col("id_b"), inter.as("inter"), (col("sz_a").cast("long") + col("sz_b")).as("szsum"))
      .where(col("inter") * 1000000L >= lit(900000L) * (col("szsum") - col("inter")))
    time("join+intersect")(j2.count())
    time("join+intersect again")(j2.count())
    spark.stop()
  }
}
