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
  private val TokenSeed = MurmurHash3.stringSeed // parity with stringHash(t)'s default
  private val SignSeed = 0x9747b28c

  /** Driver- or executor-side embedding of one string (F8 query path).
    *
    * Single pass over the chars, no intermediate allocations: tokens are
    * delimited by non-alphanumerics and hashed INCREMENTALLY with the same
    * murmur3 block structure `MurmurHash3.stringHash` uses (2 chars per
    * mix), so no lowercase copy, no split array, no token substrings —
    * this is the engine's hottest scalar function (every chunk and every
    * document passes through it) and the one non-codegen stage.
    *
    * Case folding is ASCII-only and locale-INdependent — a deliberate
    * divergence from the previous `String.toLowerCase` formulation, which
    * was default-locale-sensitive (e.g. 'I' under a Turkish locale) and
    * could fold exotic code points (KELVIN SIGN) into ASCII token chars.
    * For pure-ASCII text (all fixtures and the parity test) the two are
    * bit-identical; for Unicode the scanner is the more reproducible
    * definition, which is what a persisted vector sink needs. */
  def embed(text: String, dim: Int = Dim): Array[Float] = {
    val acc = embedRaw(text, dim)
    val out = new Array[Float](dim)
    var ss = 0.0
    var j = 0
    while (j < dim) { ss += acc(j).toDouble * acc(j); j += 1 }
    if (ss > 0) {
      val inv = (1.0 / math.sqrt(ss)).toFloat
      j = 0
      while (j < dim) { out(j) = acc(j) * inv; j += 1 }
    }
    out
  }

  /** The pre-normalization INTEGER accumulator of [[embed]]: index i holds
    * the signed occurrence count of tokens hashing to i. [[embed]] is
    * exactly this, L2-normalized — exposing the integer stage makes the
    * embedding ORACLE-CHECKABLE (the murmur3 token hashing is mirrored
    * bit-exactly in DuckDB SQL; integer outputs can never diverge on
    * float rounding), so q90/q91 hash-verify the vector content. */
  def embedRaw(text: String, dim: Int = Dim): Array[Int] = {
    val out = new Array[Int](dim)
    if (text != null) {
      val n = text.length
      // per-token incremental murmur3 state for both seeds
      var h1 = TokenSeed; var h2 = SignSeed
      var pending = -1 // buffered char awaiting its pair (chars mix in 2s)
      var tokLen = 0
      var k = 0
      while (k <= n) {
        val c0 = if (k < n) text.charAt(k) else ' '
        val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
        // token chars = ASCII lowercase alnum, the same class as the
        // previous `[^a-z0-9]+` split over the lowercased string
        if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
          if (pending < 0) pending = c
          else {
            val data = (pending << 16) + c
            h1 = MurmurHash3.mix(h1, data)
            h2 = MurmurHash3.mix(h2, data)
            pending = -1
          }
          tokLen += 1
        } else if (tokLen > 0) {
          // token boundary: finish both hashes exactly as stringHash does
          var f1 = h1; var f2 = h2
          if (pending >= 0) { f1 = MurmurHash3.mixLast(f1, pending); f2 = MurmurHash3.mixLast(f2, pending) }
          f1 = MurmurHash3.finalizeHash(f1, tokLen)
          f2 = MurmurHash3.finalizeHash(f2, tokLen)
          out(math.floorMod(f1, dim)) += (if ((f2 & 1) == 0) 1 else -1)
          h1 = TokenSeed; h2 = SignSeed; pending = -1; tokLen = 0
        }
        k += 1
      }
    }
    out
  }

  /** The UDF (F7 batch path): text column → 384-dim unit vector. */
  val embedUdf: UserDefinedFunction = udf((s: String) => embed(s))

  def embedCol(text: Column): Column = embedUdf(text)

  /** [[embedRaw]] as a UDF — the oracle-checkable integer surface. */
  val embedRawUdf: UserDefinedFunction = udf((s: String) => embedRaw(s))

  def embedRawCol(text: Column): Column = embedRawUdf(text)

  /** One-pass audit surface for q90: the integer-accumulator fingerprint
    * (nnz, Σacc², 1-based-index-weighted checksum — together they pin the
    * vector content exactly) PLUS the float stage's actual norm (computed
    * exactly as [[embed]] produces it). Computed INSIDE the UDF in the
    * same single text scan: per-row interpreted higher-order array
    * functions over 384 elements cost more than the embedding itself. */
  val embedAuditUdf: UserDefinedFunction = udf { (s: String) =>
    val acc = embedRaw(s)
    var nnz = 0L; var l2sq = 0L; var chk = 0L
    var ss = 0.0
    var j = 0
    while (j < acc.length) {
      val a = acc(j)
      if (a != 0) nnz += 1
      l2sq += a.toLong * a
      chk += (j + 1).toLong * a
      ss += a.toDouble * a
      j += 1
    }
    var fs = 0.0
    if (ss > 0) {
      val inv = (1.0 / math.sqrt(ss)).toFloat
      j = 0
      while (j < acc.length) { val f = acc(j) * inv; fs += f.toDouble * f; j += 1 }
    }
    (nnz, l2sq, chk, math.sqrt(fs).toFloat)
  }

  def embedAuditCol(text: Column): Column = embedAuditUdf(text)

  /** F8: embed a literal query string into a literal vector column. */
  def embedQueryCol(query: String): Column =
    lit(embed(query)).cast("array<float>")
}
