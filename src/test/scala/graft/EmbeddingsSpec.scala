package graft

import graft.functions.{Embeddings, VectorOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Embedding invariants (SURVEY §5.3): determinism, fixed dim 384, unit
  * norm, cosine self-similarity = 1, orthogonal/opposite behavior. */
class EmbeddingsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  test("embedding is deterministic, 384-dim, unit-norm") {
    val a = Embeddings.embed("table scan merge join")
    val b = Embeddings.embed("table scan merge join")
    assert(a.sameElements(b))
    assert(a.length == 384)
    val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("empty/null text embeds to the zero vector") {
    assert(Embeddings.embed("").forall(_ == 0f))
    assert(Embeddings.embed(null).forall(_ == 0f))
  }

  test("single-pass scanner embeds bit-identically to the split-and-hash reference") {
    // the original (allocating) formulation: lowercase, regex-split,
    // MurmurHash3.stringHash per token — the optimized scanner must
    // reproduce it exactly so persisted vectors stay comparable
    import scala.util.hashing.MurmurHash3
    def reference(text: String, dim: Int = 384): Array[Float] = {
      val out = new Array[Float](dim)
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      toks.foreach { t =>
        val idx = math.floorMod(MurmurHash3.stringHash(t), dim)
        val sign = if ((MurmurHash3.stringHash(t, 0x9747b28c) & 1) == 0) 1f else -1f
        out(idx) += sign
      }
      val ss = out.map(x => x.toDouble * x).sum
      if (ss > 0) { val inv = (1.0 / math.sqrt(ss)).toFloat; out.indices.foreach(out(_) *= inv) }
      out
    }
    val samples = Seq(
      "table scan merge join", "a", "ab", "abc", "  leading and trailing  ",
      "UPPER lower MiXeD 123 456", "punct!@#$%^&*()sep", "x" * 501,
      "one-token", "12345", "", "tab\tsep\nnewline", "repeat repeat repeat")
    samples.foreach { s =>
      assert(Embeddings.embed(s).sameElements(reference(s)), s"mismatch for: $s")
    }
  }

  test("identical texts have cosine 1; disjoint-token texts near 0") {
    val df = Seq(
      (1L, "spark table scan"),
      (2L, "spark table scan"),
      (3L, "zzz qqq www yyy")).toDF("id", "text")
      .withColumn("emb", Embeddings.embedCol(col("text")))
    val e = df.collect().map(r => r.getLong(0) -> r.getSeq[Float](2).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    assert(math.abs(cos(e(1L), e(2L)) - 1.0) < 1e-5)
    assert(math.abs(cos(e(1L), e(3L))) < 0.5) // hashed features: small overlap
  }

  test("VectorOps.cosine matches hand-computed values") {
    val df = Seq(
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f), 0.0),   // orthogonal
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f), 1.0),   // identical
      (Array(1f, 0f, 0f), Array(-1f, 0f, 0f), -1.0), // opposite
      (Array(0f, 0f, 0f), Array(1f, 1f, 1f), 0.0)    // zero vector guard
    ).toDF("a", "b", "expected")
    val rows = df.select(VectorOps.cosine(col("a"), col("b")).as("c"), col("expected")).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }

  test("sign-bucket LSH puts identical vectors in the same bucket") {
    val df = Seq(
      (1L, Array(1f, -1f, 1f, 1f, -1f, 1f, 1f, 1f)),
      (2L, Array(1f, -1f, 1f, 1f, -1f, 1f, 1f, 1f)),
      (3L, Array(-1f, 1f, -1f, -1f, 1f, -1f, -1f, -1f))).toDF("id", "v")
      .select(col("id"), VectorOps.signBucket(col("v"), 8).as("bucket"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L))
    assert(m(1L) != m(3L))
  }
}
