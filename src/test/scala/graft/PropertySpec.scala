package graft

import graft.functions.{Embeddings, JsonRows}
import graft.operators.Chunker
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY §5.3): chunking laws, embedding
  * determinism/dim/norm, serialization round-trip, watermark monotonicity.
  * Uses scalacheck generators sampled with fixed seeds (the scalatest
  * bridge artifact isn't available offline). */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  test("chunking: count = ceil(n/size); concat of chunks == concat of inputs; every chunk <= size") {
    for ((n, size) <- samples(Gen.zip(Gen.chooseNum(0, 400), Gen.chooseNum(1, 120)), 12)) {
      val df = (1 to n).map(i => (i.toLong, s"d$i")).toDF("id", "doc")
      val out = Chunker.chunkDeterministic(df, col("id"), col("doc"), "t", size)
        .orderBy("chunk_no").collect()
      assert(out.length == math.ceil(n.toDouble / size).toInt)
      assert(out.forall(_.getAs[Long]("n_rows") <= size))
      val joined = out.map(_.getAs[String]("text")).mkString(" ")
      val expected = (1 to n).map(i => s"d$i").mkString(" ")
      assert(joined == expected)
    }
  }

  test("unit-separator chunking round-trips docs CONTAINING spaces exactly") {
    // the q54 invariant made a property: split(text, UnitSep) must recover
    // the exact doc multiset even when docs embed the old default
    // separator (spaces) — the failure mode the separator fix closed
    val docGen = Gen.listOfN(3, Gen.oneOf("a b", "c", "d  e", "f g h")).map(_.mkString(" "))
    for ((n, size) <- samples(Gen.zip(Gen.chooseNum(1, 120), Gen.chooseNum(1, 40)), 8)) {
      val docs = samples(docGen, n).zipWithIndex.map { case (d, i) => (i.toLong, s"$i:$d") }
      val df = docs.toDF("id", "doc")
      val out = Chunker.chunkScalable(df, col("doc"), "t", size, sep = Chunker.UnitSep).collect()
      assert(out.forall(_.getAs[Long]("n_rows") <= size))
      val recovered = out.flatMap(_.getAs[String]("text").split(java.util.regex.Pattern.quote(Chunker.UnitSep)))
      assert(recovered.sorted.toSeq == docs.map(_._2).sorted, "doc multiset not preserved through chunk+split")
    }
  }

  test("multiProbeBuckets: distinct buckets, base first, nondecreasing flip cost for random probes") {
    import graft.operators.SimilaritySearch
    val probeGen = Gen.listOfN(8, Gen.chooseNum(-1.0f, 1.0f).suchThat(_ != 0f)).map(_.toArray)
    for (probe <- samples(probeGen, 10); nprobe <- Seq(1, 3, 8, 256)) {
      val buckets = SimilaritySearch.multiProbeBuckets(probe, 8, nprobe)
      assert(buckets.size == math.min(math.max(nprobe, 1), 256))
      assert(buckets.distinct.size == buckets.size, s"duplicate buckets: $buckets")
      var base = 0L
      (0 until 8).foreach(i => if (probe(i) > 0f) base |= (1L << i))
      assert(buckets.head == base)
      def cost(b: Long) = (0 until 8).filter(i => ((b ^ base) & (1L << i)) != 0)
        .map(i => math.abs(probe(i).toDouble)).sum
      val costs = buckets.map(cost)
      assert(costs == costs.sorted, s"flip costs not nondecreasing: $costs")
    }
  }

  test("token-budget packing: doc multiset preserved; packs bounded by budget + own largest doc") {
    import org.apache.spark.sql.functions.explode
    for ((n, budget) <- samples(Gen.zip(Gen.chooseNum(0, 200), Gen.chooseNum(5L, 60L)), 8)) {
      val docs = (1 to n).map(i => (i.toLong, s"doc$i", 1L + (i * 7) % 20))
      val df = docs.toDF("id", "doc", "tok")
      val out = Chunker.packByTokenBudget(df, col("doc"), col("tok"), "t", budget, sep = Chunker.UnitSep)
        .select(col("id"), explode(split(col("text"), java.util.regex.Pattern.quote(Chunker.UnitSep))).as("doc"))
        .collect()
      // parity: every doc in exactly one pack
      assert(out.map(_.getAs[String]("doc")).sorted.toSeq == docs.map(_._2).sorted,
        s"doc multiset broken at n=$n budget=$budget")
      // budget law: pack tokens < budget + that pack's largest doc
      val tokOf = docs.map(d => d._2 -> d._3).toMap
      out.groupBy(_.getAs[String]("id")).foreach { case (_, rows) =>
        val toks = rows.map(r => tokOf(r.getAs[String]("doc")))
        assert(toks.sum < budget + toks.max, s"pack overshoot: sum=${toks.sum} budget=$budget max=${toks.max}")
      }
    }
  }

  test("embedding: deterministic, fixed dim, unit norm (or zero) for arbitrary text") {
    for (s <- samples(Gen.asciiPrintableStr, 30)) {
      val a = Embeddings.embed(s)
      val b = Embeddings.embed(s)
      assert(a.sameElements(b))
      assert(a.length == Embeddings.Dim)
      val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
      assert(norm == 0.0 || math.abs(norm - 1.0) < 1e-4)
    }
  }

  test("from_json(to_json(row)) round-trips values (F1 inverse)") {
    val df = Seq(
      (1L, "plain", Some(1.5), Some(java.sql.Timestamp.valueOf("2024-01-02 03:04:05.123456"))),
      (2L, "uniçøde \"quoted\"", None, None),
      (3L, "", Some(-0.0), Some(java.sql.Timestamp.valueOf("1999-12-31 23:59:59")))
    ).toDF("id", "s", "d", "ts")
    val json = df.select(JsonRows.toJsonCol(df).as("j"))
    val back = json.select(JsonRows.fromJsonCol(col("j"), df.schema).as("r")).select("r.*")
    val orig = df.collect().map(_.toSeq).toSeq
    val rt = back.collect().map(_.toSeq).toSeq
    assert(rt == orig)
  }

  test("watermark strict-> is monotone: repeated delta extraction never re-reads") {
    val rows = (1 to 50).map(i => (i.toLong, new java.sql.Timestamp(i * 60000L)))
    val df = rows.toDF("event_id", "ts")
    // simulate batch commits at increasing watermarks
    var wm: Option[java.sql.Timestamp] = None
    var seen = Set.empty[Long]
    for (cut <- Seq(10, 25, 25, 50)) {
      val upTo = df.where(col("event_id") <= cut)
      val delta = graft.operators.Cdc.deltaScan(upTo, "ts", wm)
      val ids = delta.select("event_id").as[Long].collect().toSet
      assert(ids.intersect(seen).isEmpty) // exactly-once per watermark tick
      seen ++= ids
      if (ids.nonEmpty) wm = Some(new java.sql.Timestamp(ids.max * 60000L))
    }
    assert(seen == (1 to 50).map(_.toLong).toSet)
  }

  test("epoch shuffle: positions are a permutation, deterministic, and partitioning-invariant") {
    import graft.operators.EpochShuffle
    // adversarial inputs: skewed sizes, non-contiguous ids, tiny + bigger n
    for (ids <- Seq(Seq(1L), Seq(5L, 9L, 9000L, 3L), (0L until 500L).map(i => i * 7 + 3))) {
      val df = ids.toDF("doc_id")
      def pos(parts: Int, inputParts: Int): Map[Long, Long] =
        EpochShuffle.globalOrderIndex(
          df.repartition(inputParts),
          EpochShuffle.shuffleKey("e1", col("doc_id")), col("doc_id"), "pos", parts = parts)
          .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pos")).toMap
      val p8 = pos(8, 3)
      assert(p8.values.toSeq.sorted == (1L to ids.size).toSeq, s"not a permutation: $p8")
      // same result under different range-partition counts and input layouts
      assert(pos(3, 7) == p8 && pos(1, 1) == p8, "global order must be partitioning-invariant")
      // equals the naive global row_number over the same key
      val naive = df
        .withColumn("k", EpochShuffle.shuffleKey("e1", col("doc_id")))
        .orderBy(col("k"), col("doc_id"))
        .collect().map(_.getAs[Long]("doc_id")).zipWithIndex
        .map { case (id, i) => id -> (i + 1L) }.toMap
      assert(p8 == naive, "distributed index must equal the global row_number order")
    }
  }

  test("connected components: both CC algorithms equal a union-find ground truth on random graphs") {
    // The DedupSpec equality test proves the two algorithms AGREE; this
    // property proves them CORRECT — a driver-side union-find computes
    // the true min-label fixpoint for seeded random graphs spanning the
    // shapes that break naive CC (sparse forests, dense near-cliques,
    // duplicate/self edges, out-of-vocabulary ids never in the edge set).
    import graft.operators.Dedup
    def unionFind(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) // min-label union
      }
      (0L until n).map(i => i -> find(i)).toMap
    }
    val cases = samples(Gen.zip(Gen.chooseNum(5, 60), Gen.chooseNum(0, 120)), 6)
    for (((n, m), i) <- cases.zipWithIndex) {
      val edgeGen = Gen.zip(Gen.chooseNum(0, n - 1), Gen.chooseNum(0, n - 1))
      val edges = samples(edgeGen, m).map { case (a, b) => (a.toLong, b.toLong) }
      val truth = unionFind(n.toLong, edges)
      val ids = spark.range(n.toLong).toDF("doc_id")
      val pairs =
        if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("id_a", "id_b")
        else edges.toDF("id_a", "id_b")
      def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canonical")).toMap
      val iter = asMap(Dedup.dedupClusters(ids, "doc_id", pairs, maxIter = 60))
      val star = asMap(Dedup.dedupClustersStar(ids, "doc_id", pairs))
      assert(iter == truth, s"case $i (n=$n m=$m): pointer-jump CC diverged from union-find")
      assert(star == truth, s"case $i (n=$n m=$m): star-contraction CC diverged from union-find")
    }
  }

  test("epoch shuffle: key-derived block ids handle the 32-bit domain edges") {
    import graft.operators.EpochShuffle
    // keys at the domain extremes and straddling a block boundary:
    // block = (k*parts) >> 32 must stay in [0, parts) with no overflow,
    // and the global order must follow (key, tieBreak) exactly
    val rows = Seq((1L, 0L), (2L, 4294967295L), (3L, 2147483648L),
      (4L, 134217727L), (5L, 134217728L), (6L, 134217728L))
    val df = rows.toDF("doc_id", "k")
    val out = EpochShuffle.globalOrderIndex(df, col("k"), col("doc_id"), "pos", parts = 32)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pos")).toMap
    val expected = rows.sortBy { case (id, k) => (k, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    assert(out == expected, s"$out vs $expected")
  }
}
