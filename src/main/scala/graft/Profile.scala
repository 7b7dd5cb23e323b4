package graft

import graft.functions.{PortableHash, TextOps}
import graft.plans.ArrayExprs
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the hot queries (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROFILE $label%-32s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
    }

    val docs = graft.sources.Tables.table(spark, dir, "documents")

    // ---- q20 pipeline ----
    val prepped = docs.select(col("doc_id"), col("text"))
      .withColumn("hs", array_sort(array_distinct(
        transform(TextOps.wordShingles(col("text"), 1), s => PortableHash.hash32(s)))))
      .withColumn("sz", size(col("hs")))
      .withColumn("block", floor(TextOps.tokenCount(col("text")) / 16))
      .select("doc_id", "hs", "sz", "block")

    time("q20 prep only")(prepped.count())

    val a = prepped.select(col("block"), col("doc_id").as("id_a"), col("hs").as("hs_a"), col("sz").as("sz_a"))
    val b = prepped.select(col("block").as("block_r"), col("doc_id").as("id_b"), col("hs").as("hs_b"), col("sz").as("sz_b"))
    val joinCond = col("block") === col("block_r") &&
      col("id_a") < col("id_b") &&
      greatest(col("sz_a"), col("sz_b")) > 0 &&
      least(col("sz_a"), col("sz_b")) * lit(1000000L) >= lit(900000L) * greatest(col("sz_a"), col("sz_b"))

    time("q20 join only")(a.join(b, joinCond).select("id_a", "id_b").count())

    val inter = ArrayExprs.sortedIntersectCount(col("hs_a"), col("hs_b")).cast("long")
    val full = a.join(b, joinCond)
      .select(col("id_a"), col("id_b"), inter.as("inter"),
        (col("sz_a").cast("long") + col("sz_b") - inter).as("uni"))
      .where(col("inter") * 1000000L >= lit(900000L) * col("uni"))
    time("q20 join+sortedIntersect")(full.count())
    time("q20 +quantize+distinct")(
      full.select(col("id_a"), col("id_b"),
        TextOps.quantize6(col("inter").cast("double") / col("uni").cast("double")).as("jaccard"))
        .distinct().count())

    // ---- q18 pipeline ----
    val d2 = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.select((col("doc_id") + 100000).as("doc_id"), col("text")))
    val sig0 = d2
      .withColumn("hs", array_sort(array_distinct(
        transform(TextOps.wordShingles(col("text"), 3), s => PortableHash.hash32(s)))))
      .withColumn("sz", size(col("hs")))
    time("q18 shingle+hash")(sig0.select("doc_id", "sz").count())
    val sig1 = sig0.withColumn("sig", ArrayExprs.minhashSignatureFast(col("hs"), 16))
    time("q18 +minhash sig")(sig1.select(col("doc_id"), element_at(col("sig"), 1)).count())
    val withBand = sig1.withColumn("band_key", explode(TextOps.lshBandKeys(col("sig"), 4, 4)))
    time("q18 +band explode")(withBand.select("doc_id", "band_key").count())

    val a2 = withBand.select(col("band_key"), col("doc_id").as("id_a"), col("hs").as("hs_a"), col("sz").as("sz_a"))
    val b2 = withBand.select(col("band_key").as("band_key_r"), col("doc_id").as("id_b"), col("hs").as("hs_b"), col("sz").as("sz_b"))
    val cond2 = col("band_key") === col("band_key_r") &&
      col("id_a") < col("id_b") &&
      greatest(col("sz_a"), col("sz_b")) > 0 &&
      least(col("sz_a"), col("sz_b")) * lit(1000000L) >= lit(500000L) * greatest(col("sz_a"), col("sz_b"))
    time("q18 band join only")(a2.join(b2, cond2).select("id_a", "id_b").count())

    spark.stop()
  }
}
