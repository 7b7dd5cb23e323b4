package graft

import graft.functions.{PortableHash, TextOps, VectorOps}
import graft.plans.ArrayExprs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Interpreted-eval vs codegen parity for the custom Catalyst expressions:
  * each has BOTH `nullSafeEval` and `doGenCode`, and Spark picks per stage
  * — a divergence would corrupt results silently wherever codegen falls
  * back. Runs every expression under forced-interpreted mode and compares
  * with the default (codegen) run and the declarative composition. */
class ExprParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "completely different content with other words entirely"),
    (3L, "a b"), // shorter than the shingle width
    (4L, "")).toDF("doc_id", "text")

  private lazy val vecs = Seq(
    (1L, Array(0.5f, -0.25f, 0.125f, 1.5f)),
    (2L, Array(-1.0f, 2.0f, 0.0f, 3.0f)),
    (3L, Array(0.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "v")

  private def withInterpreted[T](f: => T): T = {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try f
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  private def withCodegenOnly[T](f: => T): T = {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try f
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("every custom expression COMPILES under forced codegen (no silent interpreted fallback)") {
    // Spark quietly swallows a Janino compile failure and interprets the
    // expression instead — correct results, burned performance, invisible
    // in every parity test above. CODEGEN_ONLY turns the fallback into a
    // thrown error. This pinned a real bug: Md5Hash32's generated code
    // referenced the helper via the source-level nested name
    // (ArrayExprs.Md5Hash32$), which some classloaders resolve and sbt's
    // layered one does not — the engine's hottest expression ran
    // interpreted in exactly the deployments that mattered.
    val out = withCodegenOnly {
      docs.select(
        PortableHash.hash32(col("text")).as("h"),
        ArrayExprs.minhashSignatureFast(
          transform(TextOps.wordShingles(col("text"), 3), s => PortableHash.hash32(s)), 8).as("sig"),
        ArrayExprs.simhash32Fast(
          transform(TextOps.tokens(col("text")), t => PortableHash.hash32(t))).as("sh"),
        ArrayExprs.sortedIntersectCount(
          array_sort(transform(TextOps.tokens(col("text")), t => PortableHash.hash32(t))),
          array_sort(transform(TextOps.tokens(col("text")), t => PortableHash.hash32(t)))).as("ic"),
        ArrayExprs.rollingWindowHash(
          transform(TextOps.tokens(col("text")), t => PortableHash.hash32(t)), 4).as("rwh"))
        .collect()
    }
    val bout = withCodegenOnly {
      vecs.select(ArrayExprs.byteDotProduct(
        ArrayExprs.int8Codes(col("v")),
        ArrayExprs.int8Codes(col("v"))).as("bd")).collect()
    }
    assert(out.length == docs.count())
    val vout = withCodegenOnly {
      vecs.select(VectorOps.cosineFast(col("v"), col("v")).as("c")).collect()
    }
    assert(vout.length == vecs.count())
  }

  test("Md5Hash32: interpreted == codegen == hex-string composition") {
    val strs = Seq("a", "ab", "the quick brown fox", "", "0:shingle words here",
      "ünïcødé ❄ text", "x" * 300).zipWithIndex.map(_.swap).toDF("i", "s")
    def vals() = strs.select(col("i"),
      PortableHash.hash32(col("s")).as("fused"),
      PortableHash.hash32Composed(col("s")).as("composed"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val gen = vals()
    gen.foreach { case (fused, composed) => assert(fused == composed) }
    assert(withInterpreted(vals()).toSeq == gen.toSeq)
  }

  test("MinHashSignature: interpreted == codegen == declarative composition") {
    def sigs() = docs.select(col("doc_id"),
      ArrayExprs.minhashSignatureFast(
        array_sort(array_distinct(transform(TextOps.wordShingles(col("text"), 3), sh => PortableHash.hash32(sh)))), 16).as("sig"),
      TextOps.minhashFromHashes(
        array_distinct(transform(TextOps.wordShingles(col("text"), 3), sh => PortableHash.hash32(sh))), 16).as("ref"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2)))
    val gen = sigs()
    val interp = withInterpreted(sigs())
    gen.foreach { case (_, fast, ref) => assert(fast == ref) }
    assert(gen.map(t => (t._1, t._2)).toSeq == interp.map(t => (t._1, t._2)).toSeq)
  }

  test("RollingWindowHash: interpreted == codegen == naive per-window Horner reference") {
    val rnd = new scala.util.Random(42)
    // includes n < w, n == w, and values up to 2^32 (the md5Hash32 range)
    val arrays = Seq(
      Array.empty[Long], Array(7L), Array(1L, 2L, 3L),
      Array(5L, 6L, 7L, 8L),
      Array.fill(40)(rnd.nextLong(1L << 32)),
      Array.fill(9)(4294967295L)).zipWithIndex.map(_.swap).toDF("i", "ts")
    val w = 4
    def naive(ts: Seq[Long]): Seq[Long] =
      if (ts.length < w) Seq.empty
      else (0 to ts.length - w).map { i =>
        val h1 = ts.slice(i, i + w).foldLeft(0L)((acc, t) => (acc * 31 + t % 2147483647L) % 2147483647L)
        val h2 = ts.slice(i, i + w).foldLeft(0L)((acc, t) => (acc * 37 + t % 2147483629L) % 2147483629L)
        h1 * 2147483629L + h2
      }
    def vals() = arrays.select(col("i"), ArrayExprs.rollingWindowHash(col("ts"), w).as("rh"))
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1))).sortBy(_._1)
    val gen = vals()
    val ref = arrays.collect().map(r => (r.getInt(0), naive(r.getSeq[Long](1)))).sortBy(_._1)
    gen.zip(ref).foreach { case ((i1, fast), (i2, expect)) =>
      assert(i1 == i2 && fast == expect, s"row $i1: $fast != $expect")
    }
    assert(withInterpreted(vals()).map(t => (t._1, t._2)).toSeq == gen.map(t => (t._1, t._2)).toSeq)
  }

  test("ByteDotProduct: interpreted == codegen == declarative zip_with fold; quantization in range") {
    // Array[Byte] maps to BINARY in Spark, so build int arrays and cast
    val qpairs = Seq(
      (Array(1, -2, 3), Array(4, 5, -6)),
      (Array(127, -127, 127, -127), Array(127, 127, -127, -127)),
      (Array.empty[Int], Array(1)),
      (Array(9, 9), Array(2, 2, 2))).toDF("a0", "b0") // truncating tail
      .select(col("a0").cast("array<tinyint>").as("a"), col("b0").cast("array<tinyint>").as("b"))
    def vals() = qpairs.select(
      ArrayExprs.byteDotProduct(col("a"), col("b")).as("fast"),
      coalesce(aggregate(
        zip_with(col("a").cast("array<long>"), col("b").cast("array<long>"),
          (x, y) => coalesce(x * y, lit(0L))),
        lit(0L), (acc, x) => acc + x), lit(0L)).as("ref")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val gen = vals()
    gen.foreach { case (f, r) => assert(f == r, s"$f != $r") }
    assert(withInterpreted(vals()).toSeq == gen.toSeq)
    // int8Quantize stays in [-127, 127] and hits the extremes
    val q = vecs.select(VectorOps.int8Quantize(col("v"), VectorOps.int8Scale(col("v"))).as("q"))
      .collect().flatMap(_.getSeq[Byte](0))
    assert(q.forall(b => b >= -127 && b <= 127))
    assert(q.contains(127.toByte) || q.contains(-127.toByte)) // max-|x| element maps to ±127
  }

  test("Md5Hash32Array: interpreted == codegen == per-element transform composition") {
    val arrays = Seq(
      (1L, Seq("a", "ab", "the quick", "")),
      (2L, Seq.empty[String]),
      (3L, Seq("ünïcødé ❄", "x" * 300)),
      (4L, Seq("0:shingle words here"))).toDF("i", "arr")
    def vals() = arrays.select(col("i"),
      ArrayExprs.md5Hash32Array(col("arr")).as("fused"),
      transform(col("arr"), s => PortableHash.hash32(s)).as("ref"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2))).sortBy(_._1)
    val gen = vals()
    gen.foreach { case (i, fused, ref) => assert(fused == ref, s"row $i") }
    assert(withInterpreted(vals()).toSeq == gen.toSeq)
    val forced = withCodegenOnly {
      arrays.select(ArrayExprs.md5Hash32Array(col("arr")).as("f")).collect().map(_.getSeq[Long](0))
    }
    assert(forced.map(_.sum).sorted.toSeq == gen.map(_._2.sum).sorted.toSeq)
  }

  test("TokenMarkerCount: interpreted == codegen == size(filter(or-chain)) composition") {
    import graft.functions.TextOps
    val cases = docs.unionByName(Seq((7L, "the the the and of unrelated"), (8L, "no markers here at all"))
      .toDF("doc_id", "text"))
    val terms = TextOps.stopwords
    def vals() = cases.select(col("doc_id"),
      TextOps.markerCount(TextOps.tokens(col("text")), terms).as("fused"),
      TextOps.markerCountComposed(TextOps.tokens(col("text")), terms).as("ref"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(_._1)
    val gen = vals()
    gen.foreach { case (i, fused, ref) => assert(fused == ref, s"doc $i: $fused != $ref") }
    assert(withInterpreted(vals()).toSeq == gen.toSeq)
    val forced = withCodegenOnly {
      cases.select(TextOps.markerCount(TextOps.tokens(col("text")), terms).as("f"))
        .collect().map(_.getInt(0))
    }
    assert(forced.sorted.toSeq == gen.map(_._2).sorted.toSeq)
  }

  test("ShingleHash32: interpreted == codegen == hash-of-wordShingles composition") {
    // docs cover: normal text, fewer tokens than the width (empty result),
    // exactly the width, empty text, unicode separators, width 1
    val cases = docs.unionByName(Seq((5L, "a b c"), (6L, "ünïcødé ❄ one two three")).toDF("doc_id", "text"))
    def vals(w: Int) = cases.select(col("doc_id"),
      ArrayExprs.shingleHash32(TextOps.tokens(col("text")), w).as("fused"),
      ArrayExprs.md5Hash32Array(TextOps.wordShingles(col("text"), w)).as("ref"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2))).sortBy(_._1)
    Seq(1, 3, 4).foreach { w =>
      val gen = vals(w)
      gen.foreach { case (i, fused, ref) => assert(fused == ref, s"doc $i width $w: $fused != $ref") }
      assert(withInterpreted(vals(w)).toSeq == gen.toSeq, s"width $w interpreted mismatch")
    }
    val forced = withCodegenOnly {
      cases.select(ArrayExprs.shingleHash32(TextOps.tokens(col("text")), 3).as("f"))
        .collect().map(_.getSeq[Long](0))
    }
    assert(forced.map(_.sum).sorted.toSeq == vals(3).map(_._2.sum).sorted.toSeq)
  }

  test("Int8Codes: interpreted == codegen == int8Quantize(v, int8Scale(v)) composition") {
    // edge cases: empty array, all-zero (scale 0 -> all codes 0),
    // negative max-|x|, plus the shared vecs fixture
    val cases = Seq(
      (1L, Array(0.5f, -0.25f, 0.125f, 1.5f)),
      (2L, Array(-1.0f, 2.0f, 0.0f, 3.0f)),
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (4L, Array.empty[Float]),
      (5L, Array(-3.5f, 1.0f)),
      (6L, Array(Float.MinPositiveValue, 1e30f))).toDF("vec_id", "v")
    def vals() = cases.select(col("vec_id"),
      ArrayExprs.int8Codes(col("v")).as("fused"),
      VectorOps.int8Quantize(col("v"), VectorOps.int8Scale(col("v"))).as("ref"))
      .collect().map(r => (r.getLong(0), r.getSeq[Byte](1), r.getSeq[Byte](2))).sortBy(_._1)
    val gen = vals()
    gen.foreach { case (i, fused, ref) => assert(fused == ref, s"row $i: $fused != $ref") }
    assert(withInterpreted(vals()).toSeq == gen.toSeq)
    val forced = withCodegenOnly {
      cases.select(ArrayExprs.int8Codes(col("v")).as("f")).collect()
        .map(_.getSeq[Byte](0))
    }
    assert(forced.toSeq.sortBy(_.length) == gen.map(_._2).toSeq.sortBy(_.length))
  }

  test("SortedIntersectCount: interpreted == codegen == size(array_intersect)") {
    val pairs = Seq(
      (Array(1L, 3L, 5L, 9L), Array(3L, 4L, 5L)),
      (Array.empty[Long], Array(1L)),
      (Array(2L, 4L), Array(2L, 4L))).toDF("a", "b")
    def counts() = pairs.select(
      ArrayExprs.sortedIntersectCount(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref")).collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    counts().foreach { case (f, r) => assert(f == r) }
    assert(counts().toSeq == withInterpreted(counts()).toSeq)
  }

  test("CosineSimilarity: interpreted == codegen == declarative (bitwise)") {
    def cos() = vecs.crossJoin(vecs.select(col("v").as("w"), col("vec_id").as("wid")))
      .select(
        ArrayExprs.cosineSimilarity(col("v"), col("w")).as("fast"),
        VectorOps.cosine(col("v"), col("w")).as("ref")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    cos().foreach { case (f, r) => assert(f == r) } // bit-identical, not approx
    assert(cos().toSeq == withInterpreted(cos()).toSeq)
  }

  test("SimHash32: interpreted == codegen == declarative composition") {
    def sh() = docs.select(
      ArrayExprs.simhash32Fast(transform(TextOps.tokens(col("text")), tk => PortableHash.hash32(tk))).as("fast"),
      TextOps.simhash32(col("text")).as("ref")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    sh().foreach { case (f, r) => assert(f == r) }
    assert(sh().toSeq == withInterpreted(sh()).toSeq)
  }

  test("CosineSimilarity mismatched lengths: documented divergence from composition") {
    // Composition (zip_with pads with null → aggregate → NULL) vs custom
    // expression (truncated dot, full tails in the norms → finite). The
    // custom behavior must itself be codegen/interpreted-consistent.
    val mixed = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f)),
      (Array(0.5f), Array(0.5f, 0.0f, 0.0f))).toDF("v", "w")
    def both() = mixed.select(
      ArrayExprs.cosineSimilarity(col("v"), col("w")).as("fast"),
      VectorOps.cosine(col("v"), col("w")).as("ref")).collect()
      .map(r => (r.getDouble(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    val gen = both()
    gen.foreach { case (f, ref) =>
      assert(ref.isEmpty, "composition yields NULL on length mismatch")
      assert(!f.isNaN && f.abs <= 1.0, "custom expr yields a finite cosine")
    }
    // hand math for row 1: dot over prefix = 1+4 = 5; norms over FULL vecs
    assert(math.abs(gen(0)._1 - 5.0 / (math.sqrt(14.0) * math.sqrt(5.0))) < 1e-12)
    assert(gen.toSeq == withInterpreted(both()).toSeq)
  }

  test("Sticky is a transparent identity in both modes") {
    def v() = docs.orderBy("doc_id")
      .select(ArrayExprs.sticky(length(col("text")) * 2).as("x"), (length(col("text")) * 2).as("ref"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    v().foreach { case (x, ref) => assert(x == ref) }
    assert(v() == withInterpreted(v()))
  }
}
