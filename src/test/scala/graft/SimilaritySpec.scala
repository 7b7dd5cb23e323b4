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

  test("multiProbeBuckets: distinct, clamped, base-first, full space at nprobe=2^bits") {
    val probe = Array(0.9f, -0.05f, 0.4f, -0.7f)
    val base = SimilaritySearch.multiProbeBuckets(probe, 4, 1)
    assert(base == Seq(5L)) // bits 0 and 2 positive
    val two = SimilaritySearch.multiProbeBuckets(probe, 4, 2)
    assert(two.head == 5L && two(1) == (5L ^ 2L)) // cheapest flip = lowest |mag| dim (i=1)
    val all = SimilaritySearch.multiProbeBuckets(probe, 4, 16)
    assert(all.size == 16 && all.distinct.size == 16) // full 2^bits space, no dups
    // nprobe beyond the space clamps instead of under-delivering silently
    assert(SimilaritySearch.multiProbeBuckets(probe, 4, 99) == all)
    // costs nondecreasing: re-derive each bucket's flip cost from its xor mask
    def flipCost(b: Long) = (0 until 4).filter(i => ((b ^ 5L) & (1L << i)) != 0)
      .map(i => math.abs(probe(i).toDouble)).sum
    val costs = all.map(flipCost)
    assert(costs == costs.sorted, s"perturbation order not by cost: $costs")
    // a probe shorter than bits routes to the -1 (short/null) bucket
    assert(SimilaritySearch.multiProbeBuckets(Array(1f, 2f), 4, 3) == Seq(-1L))
  }

  test("ANN recall@10 vs exact top-k, measured across the nprobe curve (bits=4)") {
    // The fixture's vectors are (near-)random — mutually near-orthogonal,
    // the WORST case for sign-bucket LSH (bucket membership is then weakly
    // correlated with cosine rank). Real embedding corpora are strongly
    // clustered and reach recall 1.0 at nprobe=2 (see the engine test
    // below); this test pins the worst-case curve so the bits/nprobe trade
    // is measured, not assumed: recall must rise monotonically with nprobe
    // and hit exactly 1.0 at nprobe = 2^bits (a full scan by construction).
    val e = graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding"))
    val probes = (0L until 5L).map { pid =>
      pid -> e.where(col("vec_id") === pid).collect()(0).getSeq[Float](1).toArray
    }
    def recallAt10(nprobe: Int): Double = {
      val per = probes.map { case (pid, p) =>
        val rest = e.where(col("vec_id") =!= pid)
        val exact = SimilaritySearch.topK(rest, "vec_id", "embedding",
          lit(p).cast("array<float>"), 10).collect().map(_.getLong(0)).toSet
        val ann = SimilaritySearch.topKByBuckets(rest, "vec_id", "embedding", p, 10,
          bits = 4, nprobe = nprobe).collect().map(_.getLong(0)).toSet
        (exact intersect ann).size / 10.0
      }
      per.sum / per.size
    }
    val curve = Seq(1, 2, 4, 8, 16).map(np => np -> recallAt10(np))
    info("worst-case recall@10 bits=4: " +
      curve.map { case (np, r) => f"nprobe=$np → $r%.2f" }.mkString(", "))
    curve.sliding(2).foreach { case Seq((_, lo), (_, hi)) =>
      assert(lo <= hi + 1e-9, s"recall fell as nprobe rose: $curve")
    }
    assert(curve.last._2 == 1.0, s"nprobe=2^bits must be exact: $curve")
    assert(curve(3)._2 >= 0.8, s"nprobe=8 (half the space) must clear 0.8 even on random vectors: $curve")
  }

  test("Engine.searchSimilar ANN recall vs its own exact (nprobe=0) scan") {
    import graft.operators.Cdc
    import graft.functions.Embeddings
    val scratch = java.nio.file.Files.createTempDirectory("graft_recall").toString
    val sink = s"$scratch/sink"
    Cdc.initVectorSink(spark, sink)
    val batch = (1 to 60).map(i => (s"d#$i", Embeddings.embed(s"alpha beta doc number $i"), "t", s"text $i"))
      .toDF("id", "embedding", "source", "text")
    Cdc.upsertVectors(spark, sink, batch)
    val engine = new Engine(spark, s"$scratch/src", s"$scratch/state", sink)
    val queries = Seq("alpha beta doc number 7", "alpha beta doc number 23", "doc number alpha 40")
    val recalls = queries.map { q =>
      val exact = engine.searchSimilar(q, k = 10).collect().map(_.getAs[String]("id")).toSet
      val ann = engine.searchSimilar(q, k = 10, nprobe = 2).collect().map(_.getAs[String]("id")).toSet
      (exact intersect ann).size / 10.0
    }
    info(f"engine recall@10 (SimBits=4, nprobe=2): ${recalls.mkString(", ")}")
    assert(recalls.sum / recalls.size >= 0.8)
  }

  test("persisted IVF index: pruned search hits partition filters; nprobe=k is exact") {
    import graft.operators.IvfIndex
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    IvfIndex.build(vecs, "vec_id", "embedding", dir, k = 4, iters = 2)
    val probe = vecs.where(col("vec_id") === 7).collect()(0).getSeq[Float](1).toArray

    val pruned = IvfIndex.search(spark, dir, probe, k = 3, nprobe = 1)
    val ids = pruned.collect().map(_.getLong(0))
    assert(ids(0) == 7L && ids.contains(99L), s"planted near-dup missed: ${ids.mkString(",")}")
    // the cluster restriction must prune at the scan (directory pruning),
    // not filter rows after reading everything
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(planStr.matches("(?s).*PartitionFilters: \\[[^\\]]*cluster.*"),
      s"cluster must be a partition filter:\n$planStr")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
    val totalFiles = walk(new java.io.File(s"$dir/data")).count(_.getName.endsWith(".parquet"))
    val scanned = pruned.queryExecution.executedPlan.collectWithSubqueries {
      case s0: org.apache.spark.sql.execution.FileSourceScanExec => s0.metrics("numFiles").value
    }.sum
    assert(scanned > 0 && scanned < totalFiles,
      s"pruned search should read a strict file subset ($scanned of $totalFiles)")

    // nprobe = k scans every cluster → identical to brute force
    val exact = SimilaritySearch.topK(vecs, "vec_id", "embedding",
      lit(probe).cast("array<float>"), 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val full = IvfIndex.search(spark, dir, probe, k = 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full == exact, "nprobe=k must equal the exact scan")
  }

  test("IvfIndex.append: incremental maintenance touches only routed clusters, search stays exact") {
    import graft.operators.IvfIndex
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_app").toString
    IvfIndex.build(vecs, "vec_id", "embedding", dir, k = 4, iters = 2)

    def filesByCluster: Map[String, Set[String]] = {
      val data = new java.io.File(s"$dir/data")
      Option(data.listFiles()).toSeq.flatten.filter(_.getName.startsWith("cluster=")).map { d =>
        d.getName -> Option(d.listFiles()).toSeq.flatten
          .map(_.getName).filter(_.endsWith(".parquet")).toSet
      }.toMap
    }
    val before = filesByCluster

    // new batch: a tight near-dup of vec 3 plus one fresh random vector
    val rnd = new scala.util.Random(11)
    val nearOf3 = vecs.where(col("vec_id") === 3).collect()(0).getSeq[Float](1).toArray.clone()
    nearOf3(1) += 0.01f
    val batch = Seq((200L, nearOf3), (201L, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    IvfIndex.append(batch, "vec_id", "embedding", dir)

    // untouched cluster dirs kept their exact file sets (no rewrite);
    // at most 2 clusters gained files (the two routed vectors)
    val after = filesByCluster
    val changed = after.filter { case (c, fs) => before.getOrElse(c, Set.empty) != fs }
    assert(changed.nonEmpty && changed.size <= 2, s"appended clusters: ${changed.keys}")
    changed.foreach { case (c, fs) =>
      assert(before.getOrElse(c, Set.empty).subsetOf(fs), s"$c lost pre-append files")
    }

    // nprobe=k after append == brute force over base ∪ batch (still exact)
    val all = vecs.unionByName(batch)
    val probe = nearOf3
    val exact = SimilaritySearch.topK(all, "vec_id", "embedding",
      lit(probe).cast("array<float>"), 5).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val appended = IvfIndex.search(spark, dir, probe, k = 5, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(appended == exact, s"append broke exactness: $appended vs $exact")
    assert(appended.head._1 == 200L, "the appended vector itself must rank first")
  }

  test("IvfIndex.repair (r17): splits only the clusters that absorbed appends, " +
      "untouched dirs stay byte-identical, exactness and routing survive " +
      "retired cluster ids, the staleness clock covers the repaired mass") {
    import graft.operators.IvfIndex
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_repair").toString
    IvfIndex.build(vecs, "vec_id", "embedding", dir, k = 4, iters = 2)

    // nothing stale → exact no-op
    val noop = IvfIndex.repair(spark, dir)
    assert(noop.clustersSplit == 0 && noop.centroidsAfter == noop.centroidsBefore)

    // heavy TIGHT batch near one base vector: all 200 rows route to one
    // cluster, which is then far past the per-cluster stale threshold
    val anchor = vecs.where(col("vec_id") === 7).collect()(0).getSeq[Float](1).toArray
    val rnd = new scala.util.Random(5)
    val heavy = (0 until 200).map { i =>
      val v = anchor.clone()
      (0 until v.length).foreach(j => v(j) += (rnd.nextFloat() * 2 - 1) * 0.05f)
      (500L + i, v)
    }.toDF("vec_id", "embedding")
    IvfIndex.append(heavy, "vec_id", "embedding", dir)

    def filesByCluster: Map[String, Set[String]] = {
      val data = new java.io.File(s"$dir/data")
      Option(data.listFiles()).toSeq.flatten.filter(_.getName.startsWith("cluster=")).map { d =>
        d.getName -> Option(d.listFiles()).toSeq.flatten
          .map(_.getName).filter(_.endsWith(".parquet")).toSet
      }.toMap
    }
    val before = filesByCluster
    val fracBefore = IvfIndex.appendedFraction(dir)
    assert(fracBefore > IvfIndex.DefaultRebuildFraction)

    val stats = IvfIndex.repair(spark, dir)
    assert(stats.clustersSplit >= 1, s"absorbed cluster must split: $stats")
    assert(stats.centroidsAfter > stats.centroidsBefore, s"centroid set must grow: $stats")
    assert(stats.filesWritten > 0 && stats.filesRetired > 0 && stats.rowsReclustered >= 200L)

    // untouched dirs byte-identical (same file sets); split dirs retired
    val after = filesByCluster
    before.foreach { case (c, fs) =>
      if (after.contains(c)) assert(after(c) == fs, s"untouched $c was rewritten")
    }
    assert((before.keySet -- after.keySet).nonEmpty, "split dirs must be retired")

    // no rows lost or duplicated across the split
    val data = spark.read.parquet(s"$dir/data")
    val expected = vecs.count() + 200
    assert(data.count() == expected, "repair lost or duplicated rows")
    assert(data.select("id").distinct().count() == expected)
    // repaired mass is trained structure now: the staleness clock resets
    assert(IvfIndex.appendedFraction(dir) < fracBefore)

    // exactness at nprobe = |clusters| against brute force over base ∪ heavy
    val all = vecs.unionByName(heavy)
    val exact = SimilaritySearch.topK(all, "vec_id", "embedding",
      lit(anchor).cast("array<float>"), 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val rep = IvfIndex.search(spark, dir, anchor, k = 10, nprobe = stats.centroidsAfter)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rep == exact, s"repair broke exactness: $rep vs $exact")

    // a later append still routes correctly through NON-CONTIGUOUS ids
    // (the split retired an id; positions != ids from here on). The tail
    // vector is an EXACT anchor clone: append's nearestCentroid and
    // search's rankClusters then agree on its cluster by construction
    // (identical scores, identical lowest-position tie-break)
    val tail = Seq((900L, anchor.clone())).toDF("vec_id", "embedding")
    IvfIndex.append(tail, "vec_id", "embedding", dir)
    val found = IvfIndex.search(spark, dir, anchor, k = 3, nprobe = 1)
      .collect().map(_.getLong(0))
    assert(found.contains(900L),
      s"post-repair append must route to the probed child cluster: ${found.mkString(",")}")

    // and a second repair right away is a no-op (children are base now)
    val again = IvfIndex.repair(spark, dir,
      staleFraction = IvfIndex.DefaultRebuildFraction)
    assert(again.clustersSplit == 0, s"repair must converge: $again")
  }

  test("IVF staleness bound (r16/r18): appended fraction is tracked incrementally " +
      "from sidecar counts, the rebuild trigger fires at the measured threshold, " +
      "rebuild resets it") {
    import graft.operators.IvfIndex
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_stale").toString
    IvfIndex.build(vecs, "vec_id", "embedding", dir, k = 4, iters = 2)
    assert(IvfIndex.appendedFraction(dir) == 0.0)
    assert(!IvfIndex.shouldRebuild(dir))

    val baseN = vecs.count()
    val rnd = new scala.util.Random(23)
    def batchOf(n: Int, idBase: Long) =
      (0 until n).map(i => (idBase + i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
        .toDF("vec_id", "embedding")

    // below the threshold: no advisory, trigger off
    val f1 = IvfIndex.append(batchOf((baseN / 4).toInt, 300L), "vec_id", "embedding", dir)
    assert(math.abs(f1 - 0.25) < 0.05, s"fraction after 1/4 append: $f1")
    assert(!IvfIndex.shouldRebuild(dir))
    // crossing DefaultRebuildFraction: append returns the fraction and the
    // trigger flips — the recall ladder behind the threshold is IvfProbe /
    // BASELINE.md r16 (nprobe=1 recall 0.97 -> ~0.81 under shifted mass)
    val f2 = IvfIndex.append(batchOf((baseN / 2).toInt, 600L), "vec_id", "embedding", dir)
    assert(f2 >= IvfIndex.DefaultRebuildFraction, s"fraction after 3/4 appended: $f2")
    assert(IvfIndex.shouldRebuild(dir))
    // custom threshold wins
    assert(!IvfIndex.shouldRebuild(dir, maxAppendedFraction = 2.0))

    // rebuild over the full current corpus resets the staleness clock
    val dir2 = java.nio.file.Files.createTempDirectory("graft_ivf_stale2").toString
    IvfIndex.build(spark.read.parquet(s"$dir/data")
      .select(col("id").as("vec_id"), col("embedding")),
      "vec_id", "embedding", dir2, k = 4, iters = 2)
    assert(IvfIndex.appendedFraction(dir2) == 0.0 && !IvfIndex.shouldRebuild(dir2))

    // pre-r16 index without bookkeeping: unknown staleness, never advises
    new java.io.File(s"$dir/centroids/_base_counts").delete()
    new java.io.File(s"$dir/centroids/_appended_counts").delete()
    assert(IvfIndex.appendedFraction(dir).isNaN && !IvfIndex.shouldRebuild(dir))
    assert(IvfIndex.staleClusters(dir).isEmpty)
  }

  test("IVF incremental bookkeeping (r18): sidecar counts equal the footer " +
      "recount after mixed append/repair/rebuild, metadata commits as ONE " +
      "directory with the matrix, and the append path never walks the index") {
    import graft.operators.IvfIndex
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_sidecar").toString
    IvfIndex.build(vecs, "vec_id", "embedding", dir, k = 4, iters = 2)

    def sidecarEqualsRecount(tag: String): Unit = {
      val recount = IvfIndex.recountClusterRows(dir)
      assert(IvfIndex.sidecarClusterRows(dir) == recount,
        s"$tag: sidecar diverged from footer truth")
    }
    sidecarEqualsRecount("post-build")
    // the whole metadata snapshot lives inside the centroid dir — one
    // atomic swap commits matrix + counts together (ADVICE r17); no
    // separate root-level commit files exist to disagree with it
    assert(new java.io.File(s"$dir/centroids/_base_counts").exists())
    assert(new java.io.File(s"$dir/centroids/_appended_counts").exists())
    assert(!new java.io.File(s"$dir/base_count").exists())
    assert(!new java.io.File(s"$dir/base_counts").exists())

    val rnd = new scala.util.Random(31)
    val anchor = vecs.where(col("vec_id") === 7).collect()(0).getSeq[Float](1).toArray
    def near(idBase: Long, n: Int, noise: Float) = (0 until n).map { i =>
      val v = anchor.clone()
      (0 until v.length).foreach(j => v(j) += (rnd.nextFloat() * 2 - 1) * noise)
      (idBase + i, v)
    }.toDF("vec_id", "embedding")

    IvfIndex.append(near(1000L, 17, 0.05f), "vec_id", "embedding", dir)
    sidecarEqualsRecount("post-append-1")
    IvfIndex.append(near(1100L, 60, 0.05f), "vec_id", "embedding", dir)
    sidecarEqualsRecount("post-append-2")

    val st = IvfIndex.repair(spark, dir)
    assert(st.clustersSplit >= 1, s"concentrated mass must split: $st")
    sidecarEqualsRecount("post-repair")

    IvfIndex.append(near(1200L, 5, 0.05f), "vec_id", "embedding", dir)
    sidecarEqualsRecount("post-repair-append")

    val kAfter = IvfIndex.rebuildInPlace(spark, dir)
    assert(kAfter > 0)
    sidecarEqualsRecount("post-rebuild")
    assert(IvfIndex.appendedFraction(dir) == 0.0, "rebuild must reset the clock")
    // no rows lost or duplicated through the whole sequence
    val data = spark.read.parquet(s"$dir/data")
    val expected = vecs.count() + 17 + 60 + 5
    assert(data.count() == expected && data.select("id").distinct().count() == expected)
  }

  test("per-cluster staleness advisory (r18): concentrated drift below the " +
      "global rebuild bar advises repair exactly once, naming the absorbed cluster") {
    import graft.operators.IvfIndex
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_adv").toString
    IvfIndex.build(vecs, "vec_id", "embedding", dir, k = 4, iters = 2)

    // the hook is global and suites may run in parallel: capture only this
    // index's advisories (another suite's append must not pollute the count)
    val all = scala.collection.mutable.ArrayBuffer[String]()
    def msgs = all.synchronized { all.filter(_.contains(dir)).toSeq }
    val saved = IvfIndex.onAdvisory
    IvfIndex.onAdvisory = m => { all.synchronized { all += m }; () }
    try {
      val anchor = vecs.where(col("vec_id") === 7).collect()(0).getSeq[Float](1).toArray
      val rnd = new scala.util.Random(41)
      def near(idBase: Long, n: Int) = (0 until n).map { i =>
        val v = anchor.clone()
        (0 until v.length).foreach(j => v(j) += (rnd.nextFloat() * 2 - 1) * 0.03f)
        (idBase + i, v)
      }.toDF("vec_id", "embedding")

      // 10 rows, all near one base vector: ONE cluster absorbs everything —
      // far past its per-cluster bar while the GLOBAL fraction stays ~0.2
      val frac = IvfIndex.append(near(2000L, 10), "vec_id", "embedding", dir)
      assert(frac < IvfIndex.DefaultRebuildFraction, s"global must stay below the bar: $frac")
      val stale = IvfIndex.staleClusters(dir)
      assert(stale.nonEmpty, "the absorbed cluster must be reported stale")
      assert(msgs.size == 1, s"exactly one advisory expected, got: $msgs")
      assert(msgs.head.contains("repair") &&
        msgs.head.contains(s"cluster ${stale.head.cluster} absorbed"),
        s"advisory must name the remedy and the absorbed cluster: ${msgs.head}")

      // a second concentrated batch below the global bar: no re-advise
      // (once per index per EPISODE — the maintenance-loop no-spam rule)
      IvfIndex.append(near(2100L, 3), "vec_id", "embedding", dir)
      assert(msgs.size == 1, s"advisory must fire once per episode: $msgs")

      // acting on the advisory closes the episode: after a repair, a NEW
      // concentrated accumulation must advise again (r18 — the r17
      // once-per-process key silenced every later episode)
      val st = IvfIndex.repair(spark, dir)
      assert(st.clustersSplit >= 1)
      IvfIndex.append(near(2200L, 30), "vec_id", "embedding", dir)
      assert(msgs.size == 2 && msgs.last.contains(dir),
        s"a post-repair drift episode must re-advise: $msgs")
    } finally IvfIndex.onAdvisory = saved
  }

  test("IvfIndex.maintain: no-op when healthy, repair on concentrated drift, " +
      "rebuild on corpus-wide drift — and each branch leaves a consistent index") {
    import graft.operators.IvfIndex
    val dirA = java.nio.file.Files.createTempDirectory("graft_ivf_mntA").toString
    IvfIndex.build(vecs, "vec_id", "embedding", dirA, k = 4, iters = 2)
    assert(IvfIndex.maintain(spark, dirA) == IvfIndex.MaintainNoOp)

    // concentrated: one cluster stale (share 1/4 < 0.5) → repair branch
    val anchor = vecs.where(col("vec_id") === 7).collect()(0).getSeq[Float](1).toArray
    val rnd = new scala.util.Random(43)
    val conc = (0 until 30).map { i =>
      val v = anchor.clone()
      (0 until v.length).foreach(j => v(j) += (rnd.nextFloat() * 2 - 1) * 0.03f)
      (3000L + i, v)
    }.toDF("vec_id", "embedding")
    IvfIndex.append(conc, "vec_id", "embedding", dirA)
    val staleShare = IvfIndex.staleClusters(dirA).size.toDouble /
      IvfIndex.centroidEntries(spark, dirA).size
    assert(staleShare > 0 && staleShare < IvfIndex.DefaultRebuildClusterShare,
      s"fixture must sit in the repair regime: $staleShare")
    IvfIndex.maintain(spark, dirA) match {
      case IvfIndex.MaintainRepaired(st) => assert(st.clustersSplit >= 1)
      case other => fail(s"expected MaintainRepaired, got $other")
    }
    assert(IvfIndex.maintain(spark, dirA) == IvfIndex.MaintainNoOp, "must converge")

    // corpus-wide: appends everywhere (3× the base, at-random) → every
    // cluster crosses the bar → rebuild branch, which retrains globally
    val dirB = java.nio.file.Files.createTempDirectory("graft_ivf_mntB").toString
    IvfIndex.build(vecs, "vec_id", "embedding", dirB, k = 4, iters = 2)
    val wide = (0 until 150).map(i => (4000L + i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    IvfIndex.append(wide, "vec_id", "embedding", dirB)
    val totalB = IvfIndex.centroidEntries(spark, dirB).size
    assert(IvfIndex.staleClusters(dirB).size.toDouble / totalB >=
      IvfIndex.DefaultRebuildClusterShare, "fixture must sit in the rebuild regime")
    IvfIndex.maintain(spark, dirB) match {
      case IvfIndex.MaintainRebuilt(k) => assert(k == totalB, "k=0 keeps the cluster count")
      case other => fail(s"expected MaintainRebuilt, got $other")
    }
    assert(IvfIndex.appendedFraction(dirB) == 0.0)
    // rebuild preserved every row and search stays exact at nprobe=k
    val data = spark.read.parquet(s"$dirB/data")
    val expected = vecs.count() + 150
    assert(data.count() == expected && data.select("id").distinct().count() == expected)
    val all = vecs.unionByName(wide)
    val exact = SimilaritySearch.topK(all, "vec_id", "embedding",
      lit(anchor).cast("array<float>"), 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = IvfIndex.search(spark, dirB, anchor, k = 10,
      nprobe = IvfIndex.centroidEntries(spark, dirB).size)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == exact, s"rebuildInPlace broke exactness: $got vs $exact")
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
