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

  /** Multi-probe bucket set for [[signBucket]] (column form of
    * SimilaritySearch.multiProbeBuckets, specialized to single-bit flips):
    * the vector's own bucket plus the `nprobe - 1` buckets reached by
    * flipping the sign bit whose component MAGNITUDE is smallest — the
    * hyperplane the vector most plausibly straddles (Lv et al. 2007).
    * Pure array expressions (sort a (|v_i|, i) struct array, XOR the
    * cheapest flips), so it stays inside codegen with no UDF.
    *
    * Single-bit flips suffice for the PAIR-generation use: when both join
    * sides probe, a pair differing in sign bits {i, j} (i cheap for one
    * side, j for the other) meets in the intermediate bucket
    * base_a ^ 2^i == base_b ^ 2^j, so two-bit disagreements are covered
    * without subset enumeration. */
  /** Symmetric int8 quantization scale: 127/max|xᵢ| (0 for the zero or
    * null-max vector). Per-vector scaling keeps full dynamic range per
    * row; the scale rides alongside the quantized vector. All math is
    * IEEE-double with a fixed op order, so any engine reproduces the
    * quantization bit-exactly. */
  def int8Scale(v: Column): Column = {
    val maxAbs = array_max(transform(v, x => abs(x.cast("double"))))
    when(maxAbs.isNull || maxAbs === 0d, lit(0d)).otherwise(lit(127.0) / maxAbs)
  }

  /** int8 code vector: clamp(floor(xᵢ·scale + 0.5), -127, 127) per
    * element — 1/4 the bytes of float32 (the I/O knob that matters when
    * the corpus is 100 TB of vectors); score with
    * [[graft.plans.ArrayExprs.byteDotProduct]] in exact integer math and
    * re-rank survivors on the full-precision floats. */
  def int8Quantize(v: Column, scale: Column): Column =
    transform(v, x =>
      greatest(lit(-127L), least(lit(127L), floor(x.cast("double") * scale + lit(0.5)))).cast("byte"))

  def probeBuckets(v: Column, bits: Int, nprobe: Int): Column = {
    val base = signBucket(v, bits)
    val extra = math.min(math.max(nprobe, 1) - 1, bits)
    if (extra == 0) array(base)
    else {
      val costs = array_sort(array((0 until bits).map { i =>
        struct(abs(element_at(v, i + 1)).as("c"), lit(i).as("i"))
      }: _*))
      val pows = lit((0 until bits).map(i => 1L << i).toArray)
      val flips = transform(slice(costs, 1, extra), s =>
        base.bitwiseXOR(element_at(pows, s.getField("i") + 1)))
      concat(array(base), flips)
    }
  }
}
