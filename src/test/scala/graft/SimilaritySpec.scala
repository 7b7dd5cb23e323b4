package graft

import graft.operators.SimilaritySearch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Similarity-search operators: brute force is ground truth; LSH and IVF
  * must find the planted nearest neighbor. */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  // 50 deterministic pseudo-random vectors + a planted near-dup of vec 7
  private lazy val vecs = {
    val rnd = new scala.util.Random(7)
    val base = (0 until 50).map(i => (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val planted = base(7)._2.clone(); planted(0) += 0.01f
    (base :+ (99L, planted)).toDF("vec_id", "embedding")
  }

  test("brute-force topK: self first, planted near-dup found for probe 7") {
    val probe = vecs.where(col("vec_id") === 7).collect()(0).getSeq[Float](1).toArray
    val top = SimilaritySearch.topK(vecs, "vec_id", "embedding", lit(probe).cast("array<float>"), 3)
      .collect().map(_.getLong(0))
    assert(top(0) == 7L)
    assert(top(1) == 99L)
  }

  test("IVF ANN finds the planted neighbor with nprobe covering its cluster") {
    val centroids = SimilaritySearch.ivfTrain(vecs, "vec_id", "embedding", k = 4, iters = 2)
    assert(centroids.length == 4)
    val probe = vecs.where(col("vec_id") === 7).collect()(0).getSeq[Float](1).toArray
    val top = SimilaritySearch.ivfTopK(vecs, "vec_id", "embedding", centroids, probe, k = 3, nprobe = 1)
      .collect().map(_.getLong(0))
    // probe 7 and its near-dup share a cluster by construction (cosine ~1)
    assert(top.contains(7L) && top.contains(99L))
  }

  test("ivfTopK scans only nprobe clusters (candidate restriction is real)") {
    val centroids = SimilaritySearch.ivfTrain(vecs, "vec_id", "embedding", k = 4, iters = 2)
    val probe = vecs.where(col("vec_id") === 0).collect()(0).getSeq[Float](1).toArray
    val n1 = SimilaritySearch.ivfTopK(vecs, "vec_id", "embedding", centroids, probe, k = 51, nprobe = 1).count()
    val n4 = SimilaritySearch.ivfTopK(vecs, "vec_id", "embedding", centroids, probe, k = 51, nprobe = 4).count()
    assert(n1 < n4)
    assert(n4 == 51)
  }
}
