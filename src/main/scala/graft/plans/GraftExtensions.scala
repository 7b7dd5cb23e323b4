package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions registration: exposes the engine's custom
  * Catalyst expressions to SQL (the `spark.sql(...)` / JDBC surface), so
  * the vector/dedup primitives are usable without the Scala DSL:
  *
  *   SELECT graft_cosine(a.embedding, b.embedding)        -- F9
  *   SELECT graft_minhash_sig(hashes, 16)                 -- minhash family
  *   SELECT graft_intersect_count(hs_a, hs_b)             -- |A ∩ B| (sorted)
  *   SELECT graft_simhash(token_hashes)                   -- 32-bit simhash
  *
  * Activate with `.withExtensions(new GraftExtensions)` (GraftSession does)
  * or `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[ArrayExprs.type].getName, name, usage)

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinPlan.AsOfStrategy)
    e.injectFunction((
      FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of two float vectors (double, 0.0 for zero vectors)"),
      (args: Seq[Expression]) => ArrayExprs.CosineSimilarity(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("graft_intersect_count"),
      info("graft_intersect_count", "graft_intersect_count(a, b) - |a ∩ b| of two SORTED distinct bigint arrays"),
      (args: Seq[Expression]) => ArrayExprs.SortedIntersectCount(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig", "graft_minhash_sig(hashes, k) - k-permutation minhash signature of a bigint hash array"),
      (args: Seq[Expression]) => ArrayExprs.MinHashSignature(args(0), intLit(args(1), "k"))))
    e.injectFunction((
      FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(token_hashes) - 32-bit simhash of a bigint token-hash array"),
      (args: Seq[Expression]) => ArrayExprs.SimHash32(args(0))))
    e.injectFunction((
      FunctionIdentifier("graft_hash32"),
      info("graft_hash32", "graft_hash32(s) - portable 32-bit hash: first 4 md5 bytes as bigint (= ('0x'||substr(md5(s),1,8))::bigint in ANSI engines)"),
      (args: Seq[Expression]) => ArrayExprs.Md5Hash32(args(0))))
    e.injectFunction((
      FunctionIdentifier("graft_int8_codes"),
      info("graft_int8_codes", "graft_int8_codes(v) - fused int8 quantization of a float vector: clamp(floor(x * 127/maxAbs + 0.5), -127, 127) per element (all zeros when maxAbs = 0)"),
      (args: Seq[Expression]) => ArrayExprs.Int8Codes(args(0))))
    e.injectFunction((
      FunctionIdentifier("graft_byte_dot"),
      info("graft_byte_dot", "graft_byte_dot(a, b) - exact integer dot product of two tinyint arrays (bigint)"),
      (args: Seq[Expression]) => ArrayExprs.ByteDotProduct(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("graft_window_hashes"),
      info("graft_window_hashes", "graft_window_hashes(token_hashes, w) - rolling double Rabin-Karp fingerprints of every w-token window (bigint array, empty when fewer than w tokens)"),
      (args: Seq[Expression]) => ArrayExprs.RollingWindowHash(args(0), intLit(args(1), "w"))))
  }
}
