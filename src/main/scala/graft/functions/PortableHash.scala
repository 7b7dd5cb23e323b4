package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashes.
  *
  * Spark's `hash()` (Murmur3/seed 42) and `xxhash64()` are Spark-specific;
  * results would not be reproducible by other SQL engines (the correctness
  * oracle included). All fingerprint/minhash/bucketing operators therefore
  * derive integers from `md5`, which every engine computes identically.
  *
  * `hash32(s)` = first 8 hex chars of md5(s) parsed base-16 → [0, 2^32).
  * ANSI equivalent: `('0x' || substr(md5(s),1,8))::bigint`.
  */
object PortableHash {

  /** 32-bit unsigned hash of a string column, as LongType in [0, 2^32).
    * Fused codegen form (graft.plans.ArrayExprs.Md5Hash32) — value-
    * identical to `conv(substring(md5(c),1,8),16,10)` without the hex
    * string round trip; ExprParitySpec pins the equality. */
  def hash32(c: Column): Column =
    graft.plans.ArrayExprs.md5Hash32(c)

  /** The declarative composition [[hash32]] fuses (kept as the parity
    * reference and for engines reading the layout via plain SQL). */
  def hash32Composed(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Element-wise [[hash32]] over a string-array column in one generated
    * loop — use instead of `transform(arr, s => hash32(s))`:
    * ArrayTransform is CodegenFallback, so the lambda form interprets an
    * expression tree per element (ExprParitySpec pins value equality). */
  def hash32Array(c: Column): Column =
    graft.plans.ArrayExprs.md5Hash32Array(c)

  /** Seeded variant: mixes a seed string in front (used for the k minhash
    * permutation family: h_i(x) = hash32(i || ':' || x)). */
  def hash32(seed: Int, c: Column): Column =
    hash32(concat(lit(s"$seed:"), c))

  /** 64-bit-ish hash from two md5 halves (bits may collide across halves at
    * ~2^-32 per pair — fine for fingerprints, not for crypto). */
  def hash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Full content fingerprint (S9 id-determinism fix): the reference ids
    * chunks with fresh UUIDs (`service_layer/service.py:126`, `:140`) which
    * makes retries duplicate vectors (SURVEY §2.6 T3); a sha256 content hash
    * makes the upsert idempotent while keeping the `table#id` shape
    * (`service_layer/service.py:130`). */
  def contentId(source: String, doc: Column): Column =
    concat(lit(source), lit("#"), sha2(doc, 256))
}
