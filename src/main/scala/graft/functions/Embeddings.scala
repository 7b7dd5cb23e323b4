package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

import scala.util.hashing.MurmurHash3

/** Deterministic hashed-feature text embedding (F7/F8).
  *
  * Reference analog: `model.encode(...)` with all-MiniLM-L6-v2
  * (`utils/embeddings_utils.py:7-14`, `utils/config.py:11`) producing
  * 384-dim vectors (`service_layer/service.py:90`). Model weights are not
  * available in this build (zero-egress), so the engine substitutes a
  * deterministic feature-hashing embedder that preserves every structural
  * property the pipeline depends on: fixed dimension 384, unit L2 norm,
  * cosine-comparable, identical text → identical vector (which also makes
  * re-embedding idempotent, unlike the reference's UUID-keyed upserts —
  * SURVEY §7 hard parts).
  *
  * Scheme: token t → index murmur3(t) mod dim, sign from a second murmur3
  * seed; accumulate ±1 per occurrence; L2-normalize. This is the classic
  * "hashing trick" (Weinberger et al. 2009), so near-identical token
  * streams get high cosine — good enough to exercise every vector operator.
  *
  * Implementation note: a Scala UDF is the one codegen barrier in the
  * engine (SURVEY §4); it is isolated in its own projection so surrounding
  * stages still fuse.
  */
object Embeddings {

  val Dim = 384
  private val SignSeed = 0x9747b28c

  /** Driver- or executor-side embedding of one string (F8 query path). */
  def embed(text: String, dim: Int = Dim): Array[Float] = {
    val out = new Array[Float](dim)
    if (text != null) {
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      var i = 0
      while (i < toks.length) {
        val t = toks(i)
        val idx = math.floorMod(MurmurHash3.stringHash(t), dim)
        val sign = if ((MurmurHash3.stringHash(t, SignSeed) & 1) == 0) 1f else -1f
        out(idx) += sign
        i += 1
      }
      var ss = 0.0
      var j = 0
      while (j < dim) { ss += out(j).toDouble * out(j); j += 1 }
      if (ss > 0) {
        val inv = (1.0 / math.sqrt(ss)).toFloat
        j = 0
        while (j < dim) { out(j) *= inv; j += 1 }
      }
    }
    out
  }

  /** The UDF (F7 batch path): text column → 384-dim unit vector. */
  val embedUdf: UserDefinedFunction = udf((s: String) => embed(s))

  def embedCol(text: Column): Column = embedUdf(text)

  /** F8: embed a literal query string into a literal vector column. */
  def embedQueryCol(query: String): Column =
    lit(embed(query)).cast("array<float>")
}
