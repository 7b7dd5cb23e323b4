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

  test("distributed ivfTrain equals a driver-side Lloyd reference (same seed/assignment/mean)") {
    // Reference implementation of the same deterministic Lloyd iteration,
    // entirely on the driver: first-k-by-id seeding, cosine assignment with
    // ties to the lowest index, double-precision mean. The distributed
    // posexplode + avg path must reproduce it (it replaced a
    // collect-the-whole-index formulation; this guards the rewrite).
    val data = vecs.orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var sa = 0.0; var sb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); sa += a(i).toDouble * a(i); sb += b(i).toDouble * b(i); i += 1
      }
      val d = math.sqrt(sa) * math.sqrt(sb)
      if (d == 0.0) 0.0 else dot / d
    }
    val k = 4; val iters = 2
    var ref = data.take(k).map(_._2)
    for (_ <- 0 until iters) {
      val assigned = data.map { case (_, v) =>
        val best = ref.zipWithIndex.map { case (c, i) => (cos(v, c), i) }
          .maxBy { case (s, i) => (s, -i) }._2
        (best, v)
      }
      ref = ref.indices.map { cid =>
        val members = assigned.filter(_._1 == cid).map(_._2)
        if (members.isEmpty) ref(cid)
        else {
          val dim = members.head.length
          Array.tabulate(dim)(d => (members.map(_(d).toDouble).sum / members.size).toFloat)
        }
      }.toArray
    }
    val dist = SimilaritySearch.ivfTrain(vecs, "vec_id", "embedding", k = k, iters = iters)
    assert(dist.length == ref.length)
    dist.zip(ref).foreach { case (dc, rc) =>
      dc.zip(rc).foreach { case (a, b) => assert(math.abs(a - b) < 1e-5f, s"$a vs $b") }
    }
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
