package graft

import graft.operators.Chunker
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Chunking boundary cases mirroring the reference's tail-flush branch
  * (`service_layer/service.py:139-145`): 0, 1, 99, 100, 101, 250 rows. */
class ChunkerSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private def mk(n: Int) =
    (1 to n).map(i => (i.toLong, s"doc$i")).toDF("id", "doc")

  for ((n, expChunks) <- Seq(0 -> 0, 1 -> 1, 99 -> 1, 100 -> 1, 101 -> 2, 250 -> 3)) {
    test(s"chunk of $n rows yields $expChunks chunks (size 100)") {
      val out = Chunker.chunkDeterministic(mk(n), col("id"), col("doc"), "t", 100).collect()
      assert(out.length == expChunks)
      assert(out.map(_.getAs[Long]("n_rows")).sum == n)
      // every chunk <= 100 rows; only the last may be partial
      assert(out.forall(_.getAs[Long]("n_rows") <= 100))
    }
  }

  test("chunk contents are in order and space-joined; ids are content hashes") {
    val out = Chunker.chunkDeterministic(mk(101), col("id"), col("doc"), "t", 100)
      .orderBy("chunk_no").collect()
    val first = out(0).getAs[String]("text")
    assert(first.startsWith("doc1 doc2 doc3"))
    assert(first.endsWith("doc100"))
    assert(out(1).getAs[String]("text") == "doc101")
    // id = source#sha256(text) — reference format table#id (service.py:130)
    assert(out.forall(r => r.getAs[String]("id").startsWith("t#")))
    assert(out.forall(r => r.getAs[String]("id").length == 2 + 64))
  }

  test("chunking is deterministic across runs (UUID replacement, SURVEY §7)") {
    val a = Chunker.chunkDeterministic(mk(250), col("id"), col("doc"), "t", 100).collect()
    val b = Chunker.chunkDeterministic(mk(250), col("id"), col("doc"), "t", 100).collect()
    assert(a.map(_.getAs[String]("id")).sorted.sameElements(b.map(_.getAs[String]("id")).sorted))
  }

  test("chunkRowsAsJson is partition-independent (r18 narrow-scan spread)") {
    // the spread re-hashes a degenerate input across the session before
    // the JSON projection; chunk membership is key-derived, so 1-partition
    // and many-partition inputs must produce IDENTICAL chunk ids/texts
    val one = Chunker.chunkRowsAsJson(mk(250).coalesce(1), col("id"), "t", 100)
      .orderBy("chunk_no").collect()
    val many = Chunker.chunkRowsAsJson(mk(250).repartition(7), col("id"), "t", 100)
      .orderBy("chunk_no").collect()
    assert(one.length == 3 && many.length == 3)
    assert(one.map(r => (r.getAs[String]("id"), r.getAs[String]("text")))
      .sameElements(many.map(r => (r.getAs[String]("id"), r.getAs[String]("text")))))
  }

  test("string order key (sampled-range snapshot path) orders and is deterministic") {
    // zero-padded keys: lexicographic order == numeric order, so the
    // expected chunk contents are the same as the numeric-key tests'
    val df = (1 to 250).map(i => (f"k$i%04d", f"doc$i%04d")).toDF("id", "doc")
      .repartition(7) // physical order != key order: the snapshot must sort
    val out = Chunker.chunkDeterministic(df, col("id"), col("doc"), "t", 100)
      .orderBy("chunk_no").collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[Long]("n_rows")).toSeq == Seq(100L, 100L, 50L))
    assert(out(0).getAs[String]("text").startsWith("doc0001 doc0002"))
    assert(out(1).getAs[String]("text").startsWith("doc0101"))
    assert(out(2).getAs[String]("text").endsWith("doc0250"))
    val again = Chunker.chunkDeterministic(df, col("id"), col("doc"), "t", 100)
      .orderBy("chunk_no").collect()
    assert(out.map(_.getAs[String]("id")).sameElements(again.map(_.getAs[String]("id"))))
  }

  test("skewed numeric keys (duplicates + outlier) keep every row, bounded chunks") {
    // 240 rows share key 1, one row at key 1e9: almost everything lands in
    // one value-range block — balance degrades, correctness must not
    val df = ((1 to 240).map(i => (1L, s"d$i")) :+ (1000000000L, "tail")).toDF("id", "doc")
    val out = Chunker.chunkDeterministic(df, col("id"), col("doc"), "t", 100).collect()
    assert(out.map(_.getAs[Long]("n_rows")).sum == 241)
    assert(out.forall(_.getAs[Long]("n_rows") <= 100))
    // the outlier key sorts last, so "tail" is the final doc of the last chunk
    val last = out.maxBy(_.getAs[Long]("chunk_no"))
    assert(last.getAs[String]("text").endsWith("tail"))
  }

  test("scalable chunking covers all rows with bounded chunk size") {
    val out = Chunker.chunkScalable(mk(250).repartition(4), col("doc"), "t", 100).collect()
    assert(out.map(_.getAs[Long]("n_rows")).sum == 250)
    assert(out.forall(_.getAs[Long]("n_rows") <= 100))
  }
}
