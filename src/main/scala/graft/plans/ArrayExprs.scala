package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{ColumnBridge, TypesBridge}
import org.apache.spark.sql.graftbridge.TypesBridge.AbstractDataType
import org.apache.spark.sql.types._

/** Custom codegen'd Catalyst expressions for the similarity hot path.
  *
  * Why custom: Spark's higher-order functions (`transform`, `aggregate`,
  * `array_intersect`) have no `doGenCode` — they evaluate as interpreted
  * expression trees with per-element lambda dispatch. For pairwise
  * similarity joins that interpret overhead dominates (measured ~10µs per
  * 45-element `array_intersect`, >13s over 1.4M candidate pairs at sf0.1).
  * These expressions generate tight Java loops instead, per the preference
  * order in SURVEY §7.3 / the engine guide: (b) custom `Expression` with
  * codegen before (d) mapPartitions.
  *
  * Parity: both compute set/permutation math whose VALUES are identical to
  * the built-in compositions they replace, so the DuckDB oracle SQL is
  * unchanged.
  */
object ArrayExprs {

  /** |a ∩ b| for two SORTED long arrays (distinct elements), via linear
    * merge — no per-row hash set, no boxing. */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def dataType: DataType = IntegerType
    // declared input types make bad SQL input (these are exposed via
    // GraftExtensions) fail analysis instead of reading misaligned bytes
    // from UnsafeArrayData
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(LongType), ArrayType(LongType))

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      var i = 0; var j = 0; var c = 0
      val xn = x.numElements(); val yn = y.numElements()
      while (i < xn && j < yn) {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
      c
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val j = ctx.freshName("j"); val c = ctx.freshName("c")
        val xn = ctx.freshName("xn"); val yn = ctx.freshName("yn")
        val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
        s"""
        int $i = 0, $j = 0, $c = 0;
        final int $xn = $a.numElements(), $yn = $b.numElements();
        while ($i < $xn && $j < $yn) {
          final long $xv = $a.getLong($i); final long $yv = $b.getLong($j);
          if ($xv == $yv) { $c++; $i++; $j++; }
          else if ($xv < $yv) { $i++; }
          else { $j++; }
        }
        ${ev.value} = $c;
        """
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** k-permutation MinHash signature over pre-hashed shingles: element i =
    * min over h of (aᵢ·h + bᵢ) mod p with aᵢ = 999983·i + 1000003,
    * bᵢ = 999979·i + 12345, p = 4294967291 (same family as
    * TextOps.minhashFromHashes — one fused O(n·k) loop instead of k
    * interpreted transforms). Empty input → all-sentinel (2³²). */
  case class MinHashSignature(child: Expression, k: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))

    final val P = 4294967291L
    final val Sentinel = 4294967296L

    override def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData]
      val mins = Array.fill(k)(Sentinel)
      val n = hs.numElements()
      var i = 0
      while (i < n) {
        val h = hs.getLong(i)
        var j = 0
        while (j < k) {
          val v = (h * (999983L * j + 1000003L) + (999979L * j + 12345L)) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
        i += 1
      }
      new GenericArrayData(mins)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nseCodeGen(ctx, ev)

    private def nseCodeGen(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, hs => {
        val mins = ctx.freshName("mins"); val n = ctx.freshName("n")
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val h = ctx.freshName("h"); val v = ctx.freshName("v")
        val gad = classOf[GenericArrayData].getName
        s"""
        final long[] $mins = new long[$k];
        java.util.Arrays.fill($mins, ${Sentinel}L);
        final int $n = $hs.numElements();
        for (int $i = 0; $i < $n; $i++) {
          final long $h = $hs.getLong($i);
          for (int $j = 0; $j < $k; $j++) {
            final long $v = ($h * (999983L * $j + 1000003L) + (999979L * $j + 12345L)) % ${P}L;
            if ($v < $mins[$j]) $mins[$j] = $v;
          }
        }
        ${ev.value} = new $gad($mins);
        """
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** 32-bit SimHash over a pre-hashed token array (duplicates kept): bit b
    * of the result is set iff Σ over tokens of (±1 by bit b of the token
    * hash) is positive. One fused loop — replaces 32 interpreted
    * `aggregate` folds (each of which re-evaluated the token-hash transform
    * per doc). Value-identical to TextOps.simhash32 / the oracle mirror. */
  case class SimHash32(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
    override def dataType: DataType = LongType
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))

    override def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData]
      val votes = new Array[Long](32)
      val n = hs.numElements()
      var i = 0
      while (i < n) {
        val h = hs.getLong(i)
        var b = 0
        while (b < 32) {
          votes(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L)
          b += 1
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 32) { if (votes(b) > 0) out |= (1L << b); b += 1 }
      out
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, hs => {
        val votes = ctx.freshName("votes"); val n = ctx.freshName("n")
        val i = ctx.freshName("i"); val b = ctx.freshName("b")
        val h = ctx.freshName("h"); val out = ctx.freshName("out")
        s"""
        final long[] $votes = new long[32];
        final int $n = $hs.numElements();
        for (int $i = 0; $i < $n; $i++) {
          final long $h = $hs.getLong($i);
          for (int $b = 0; $b < 32; $b++) {
            $votes[$b] += (((($h >> $b) & 1L) == 1L) ? 1L : -1L);
          }
        }
        long $out = 0L;
        for (int $b = 0; $b < 32; $b++) { if ($votes[$b] > 0) $out |= (1L << $b); }
        ${ev.value} = $out;
        """
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Cosine similarity of two float vectors in double precision (F9 — the
    * reference's Pinecone index metric, `service_layer/service.py:91`).
    * One fused loop accumulates dot, ‖a‖², ‖b‖² with the same strict
    * left-to-right fold order as the declarative
    * `aggregate(zip_with(...))` composition in VectorOps.cosine, so for
    * EQUAL-LENGTH vectors results are bit-identical to it AND to the
    * DuckDB oracle's `list_reduce` mirror. For unequal lengths the
    * composition yields NULL (zip_with pads with null); this expression
    * instead truncates the dot to the common prefix and counts both full
    * tails toward the norms — a finite, still-deterministic value
    * (covered by ExprParitySpec's mismatched-length case). Zero-vector
    * guard: denom == 0 → 0.0. */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def dataType: DataType = DoubleType
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(FloatType), ArrayType(FloatType))

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var sa = 0.0; var sb = 0.0
      var i = 0
      while (i < n) {
        val xi = x.getFloat(i).toDouble; val yi = y.getFloat(i).toDouble
        dot += xi * yi; sa += xi * xi; sb += yi * yi
        i += 1
      }
      // tails contribute only to the norms (zip_with truncates the dot)
      var j = n
      while (j < x.numElements()) { val v = x.getFloat(j).toDouble; sa += v * v; j += 1 }
      j = n
      while (j < y.numElements()) { val v = y.getFloat(j).toDouble; sb += v * v; j += 1 }
      val denom = math.sqrt(sa) * math.sqrt(sb)
      if (denom == 0.0) 0.0 else dot / denom
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val dot = ctx.freshName("dot"); val sa = ctx.freshName("sa"); val sb = ctx.freshName("sb")
        val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi"); val denom = ctx.freshName("denom")
        s"""
        final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0, $sa = 0.0, $sb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          final double $xi = (double) $a.getFloat($i);
          final double $yi = (double) $b.getFloat($i);
          $dot += $xi * $yi; $sa += $xi * $xi; $sb += $yi * $yi;
        }
        for (int $j = $n; $j < $a.numElements(); $j++) {
          final double $xi = (double) $a.getFloat($j); $sa += $xi * $xi;
        }
        for (int $j = $n; $j < $b.numElements(); $j++) {
          final double $yi = (double) $b.getFloat($j); $sb += $yi * $yi;
        }
        final double $denom = java.lang.Math.sqrt($sa) * java.lang.Math.sqrt($sb);
        ${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
        """
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Optimizer-barrier identity: evaluates to its child but reports
    * `deterministic = false`, which stops Catalyst from (a) inlining the
    * child into every downstream use (CollapseProject), (b) duplicating it
    * into inferred IsNotNull filters below the defining Project, and
    * (c) pushing threshold predicates over it into join conditions — the
    * three rewrites that turned the similarity joins from
    * evaluate-once-per-row into evaluate-four-times-per-candidate-pair.
    * The VALUE is fully deterministic; only the optimizer contract changes. */
  case class Sticky(child: Expression) extends UnaryExpression {
    override def dataType: DataType = child.dataType
    override def nullable: Boolean = child.nullable
    override lazy val deterministic: Boolean = false
    override def eval(input: InternalRow): Any = child.eval(input)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val c = child.genCode(ctx)
      ev.copy(code = c.code, isNull = c.isNull, value = c.value)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Engine-portable 32-bit hash, fused: md5 digest → first 4 bytes as an
    * unsigned int in a long. VALUE-identical to the composition
    * `conv(substring(md5(s),1,8),16,10)` (the first 8 hex chars ARE the
    * first 4 digest bytes) but skips materializing the 32-char hex string,
    * the substring copy, and the base-16 reparse — this runs once per
    * SHINGLE in every minhash/Jaccard/decontamination query, the highest
    * call-count site in the engine. */
  case class Md5Hash32(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def dataType: DataType = LongType
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

    protected override def nullSafeEval(input: Any): Any =
      Md5Hash32.hash(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      // the BINARY name (ArrayExprs$Md5Hash32$), not the source-level
      // nested reference (ArrayExprs.Md5Hash32$): Janino resolves member
      // classes through the mirror class's InnerClasses attribute, which
      // scalac doesn't emit there — the source form compiled under some
      // classloaders and silently fell back to interpreted eval under
      // others (this is the hottest expression in the engine; the
      // fallback was a ~burned codegen stage per minhash/Jaccard query)
      defineCodeGen(ctx, ev, c => s"graft.plans.ArrayExprs$$Md5Hash32$$.MODULE$$.hash($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Element-wise [[Md5Hash32]] over a string array — value-identical to
    * `transform(arr, s => md5Hash32(s))`, but a generated loop over the
    * thread-local digest: Spark's `ArrayTransform` is CodegenFallback, so
    * the lambda form interprets an expression tree per ELEMENT. This
    * sits in the prep stage of every minhash/simhash/window pipeline
    * (~35 shingles per doc), where the per-element dispatch overhead
    * rivaled the md5 itself. Null elements hash to null, matching the
    * lambda's null propagation. */
  case class Md5Hash32Array(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def dataType: DataType = ArrayType(LongType, containsNull = true)
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

    override def nullSafeEval(a: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val n = v.numElements()
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        if (!v.isNullAt(i)) out(i) = Md5Hash32.hash(v.getUTF8String(i))
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val out = ctx.freshName("out")
        val gad = classOf[GenericArrayData].getName
        // binary name, not the source-level nested reference — see Md5Hash32
        s"""
        final int $n = $v.numElements();
        final Object[] $out = new Object[$n];
        for (int $i = 0; $i < $n; $i++) {
          if (!$v.isNullAt($i)) {
            $out[$i] = (Object) graft.plans.ArrayExprs$$Md5Hash32$$.MODULE$$.hash($v.getUTF8String($i));
          }
        }
        ${ev.value} = new $gad($out);
        """
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Hashed word n-gram shingles in one pass: for a token array t and
    * width w, emits md5Hash32(t(i) + " " + ... + t(i+w-1)) for every
    * window — value-identical to
    * `md5Hash32Array(TextOps.wordShingles(text, w))` over the same token
    * stream (duplicates kept, in order; fewer than w tokens → empty), but
    * with NO intermediate shingle strings and no interpreted
    * higher-order-function passes (wordShingles runs w-1 zip_with folds,
    * each CodegenFallback, and materializes every w-token concat string;
    * this is the prep stage of every minhash/Jaccard pipeline). A window
    * containing a null token is skipped, matching the composition (its
    * concat is null and wordShingles filters it). */
  case class ShingleHash32(child: Expression, w: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(w >= 1, s"shingle width must be >= 1 token, got $w")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

    override def nullSafeEval(a: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val n = v.numElements()
      if (n < w) return new GenericArrayData(Array.empty[Long])
      val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
      val out = new Array[Long](n - w + 1)
      var filled = 0
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](w)
      var i = 0
      while (i <= n - w) {
        var ok = true
        var j = 0
        while (j < w) {
          if (v.isNullAt(i + j)) ok = false else parts(j) = v.getUTF8String(i + j)
          j += 1
        }
        if (ok) {
          out(filled) = Md5Hash32.hash(
            org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*))
          filled += 1
        }
        i += 1
      }
      new GenericArrayData(if (filled == out.length) out else out.take(filled))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val sep = ctx.addReferenceObj("sep",
        org.apache.spark.unsafe.types.UTF8String.fromString(" "),
        "org.apache.spark.unsafe.types.UTF8String")
      nullSafeCodeGen(ctx, ev, v => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val out = ctx.freshName("out"); val filled = ctx.freshName("filled")
        val parts = ctx.freshName("parts"); val ok = ctx.freshName("ok")
        val trimmed = ctx.freshName("trimmed")
        val gad = classOf[GenericArrayData].getName
        val utf8 = "org.apache.spark.unsafe.types.UTF8String"
        s"""
        final int $n = $v.numElements();
        long[] $out = new long[$n < $w ? 0 : $n - $w + 1];
        int $filled = 0;
        if ($n >= $w) {
          final $utf8[] $parts = new $utf8[$w];
          for (int $i = 0; $i <= $n - $w; $i++) {
            boolean $ok = true;
            for (int $j = 0; $j < $w; $j++) {
              if ($v.isNullAt($i + $j)) { $ok = false; } else { $parts[$j] = $v.getUTF8String($i + $j); }
            }
            if ($ok) {
              $out[$filled++] = graft.plans.ArrayExprs$$Md5Hash32$$.MODULE$$.hash($utf8.concatWs($sep, $parts));
            }
          }
        }
        if ($filled != $out.length) {
          final long[] $trimmed = new long[$filled];
          System.arraycopy($out, 0, $trimmed, 0, $filled);
          $out = $trimmed;
        }
        ${ev.value} = new $gad($out);
        """
      })
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Count of array elements contained in a LITERAL term set — the fused
    * form of `size(filter(toks, t => t === m1 || t === m2 || ...))`
    * (marker/stopword counting): the filter lambda interprets a
    * |terms|-way OR per element; this probes one hash set per element in
    * a generated loop. Null elements count as non-members, matching the
    * composition (a null comparison filters out). */
  case class TokenMarkerCount(child: Expression, terms: Seq[String])
      extends UnaryExpression with ImplicitCastInputTypes {
    require(terms.nonEmpty, "TokenMarkerCount needs at least one term")
    override def dataType: DataType = IntegerType
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

    @transient private lazy val termSet: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] = {
      val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](terms.size * 2)
      terms.foreach(t => s.add(org.apache.spark.unsafe.types.UTF8String.fromString(t)))
      s
    }

    override def nullSafeEval(a: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val n = v.numElements()
      var c = 0
      var i = 0
      while (i < n) {
        if (!v.isNullAt(i) && termSet.contains(v.getUTF8String(i))) c += 1
        i += 1
      }
      c
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val setRef = ctx.addReferenceObj("termSet", termSet, "java.util.HashSet")
      nullSafeCodeGen(ctx, ev, v => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i"); val c = ctx.freshName("c")
        s"""
        final int $n = $v.numElements();
        int $c = 0;
        for (int $i = 0; $i < $n; $i++) {
          if (!$v.isNullAt($i) && $setRef.contains($v.getUTF8String($i))) $c++;
        }
        ${ev.value} = $c;
        """
      })
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Fused int8 quantizer: one pass computes maxAbs, derives
    * scale = 127/maxAbs (0 when the array is empty, all-null, or all-zero),
    * a second pass emits clamp(floor(xᵢ·scale + 0.5), -127, 127) as bytes —
    * value-identical to the declarative
    * `int8Quantize(v, int8Scale(v))` composition (ExprParitySpec pins
    * bit-equality), but in a tight generated loop: the composed form runs
    * TWO `transform` higher-order functions, which are CodegenFallback and
    * interpret ~10 expression nodes per element per row (the measured
    * 3.3 s of q72 at sf0.1 was almost entirely this). Null elements pass
    * through as null codes, matching the lambda's null propagation. */
  case class Int8Codes(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def dataType: DataType = ArrayType(ByteType, containsNull = true)
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))

    override def nullSafeEval(a: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val n = v.numElements()
      var maxAbs = 0d
      var i = 0
      while (i < n) {
        if (!v.isNullAt(i)) {
          val ab = math.abs(v.getFloat(i).toDouble)
          if (ab > maxAbs) maxAbs = ab
        }
        i += 1
      }
      val scale = if (maxAbs == 0d) 0d else 127d / maxAbs
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        if (!v.isNullAt(i))
          out(i) = math.max(-127d, math.min(127d, math.floor(v.getFloat(i).toDouble * scale + 0.5))).toByte
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val maxAbs = ctx.freshName("maxAbs"); val scale = ctx.freshName("scale")
        val ab = ctx.freshName("ab"); val out = ctx.freshName("out")
        val gad = classOf[GenericArrayData].getName
        s"""
        final int $n = $v.numElements();
        double $maxAbs = 0D;
        for (int $i = 0; $i < $n; $i++) {
          if (!$v.isNullAt($i)) {
            final double $ab = java.lang.Math.abs((double) $v.getFloat($i));
            if ($ab > $maxAbs) $maxAbs = $ab;
          }
        }
        final double $scale = $maxAbs == 0D ? 0D : 127D / $maxAbs;
        final Object[] $out = new Object[$n];
        for (int $j = 0; $j < $n; $j++) {
          if (!$v.isNullAt($j)) {
            $out[$j] = (Object) (byte) java.lang.Math.max(-127D,
              java.lang.Math.min(127D, java.lang.Math.floor((double) $v.getFloat($j) * $scale + 0.5D)));
          }
        }
        ${ev.value} = new $gad($out);
        """
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Σ aᵢ·bᵢ over two int8 (byte) vectors as a long — the integer scoring
    * kernel of quantized ANN: exact integer math (identical in any
    * engine), over a representation that costs 1/4 the I/O of float32.
    * Truncates to the shorter length, like [[CosineSimilarity]]. Max
    * magnitude 127²·n — overflow-free below n ≈ 5·10¹⁴ dims. */
  case class ByteDotProduct(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def dataType: DataType = LongType
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(ByteType), ArrayType(ByteType))

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0L
      var i = 0
      while (i < n) { acc += x.getByte(i).toLong * y.getByte(i); i += 1 }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
        final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        long $acc = 0L;
        for (int $i = 0; $i < $n; $i++) {
          $acc += (long) $a.getByte($i) * $b.getByte($i);
        }
        ${ev.value} = $acc;
        """
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Double Rabin–Karp rolling fingerprints of every w-token window over a
    * token-hash array: output(i) = h1(i)·M2 + h2(i), where hb(i) is the
    * Horner fold Σ (t mod Mb)·Bb^(w-1-j) mod Mb over tokens i..i+w-1.
    *
    * Why rolling: all n-w+1 window keys cost O(n) long ops total (one
    * sub/mul/add per modulus per position) and no window STRING is ever
    * materialized — the md5 cost stays per TOKEN, where the per-window-md5
    * alternative hashes every token w times inside concatenated window
    * strings. Why two moduli: a single 31-bit key space floods blocking
    * buckets with birthday collisions at corpus scale; the combined key is
    * effectively 62-bit (~10⁻⁴ expected false pairs per 10⁶ windows).
    * Mirrored in DuckDB by the O(w)-per-window Horner fold (oracle scale
    * is tiny, so the asymptotic gap doesn't matter there). n < w → empty
    * array (matches "no window fits"). */
  case class RollingWindowHash(child: Expression, w: Int)
      extends UnaryExpression with ImplicitCastInputTypes {
    require(w >= 1, s"window must be >= 1 token, got $w")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))

    final val M1 = 2147483647L; final val B1 = 31L
    final val M2 = 2147483629L; final val B2 = 37L

    override def nullSafeEval(input: Any): Any = {
      val ts = input.asInstanceOf[ArrayData]
      val n = ts.numElements()
      if (n < w) return new GenericArrayData(Array.emptyLongArray)
      val out = new Array[Long](n - w + 1)
      var bw1 = 1L; var bw2 = 1L
      var j = 1
      while (j < w) { bw1 = bw1 * B1 % M1; bw2 = bw2 * B2 % M2; j += 1 }
      var h1 = 0L; var h2 = 0L
      var i = 0
      while (i < w) {
        val t = ts.getLong(i)
        h1 = (h1 * B1 + t % M1) % M1
        h2 = (h2 * B2 + t % M2) % M2
        i += 1
      }
      out(0) = h1 * M2 + h2
      i = w
      while (i < n) {
        val tOut = ts.getLong(i - w); val tIn = ts.getLong(i)
        h1 = ((h1 - tOut % M1 * bw1 % M1 + M1) % M1 * B1 + tIn % M1) % M1
        h2 = ((h2 - tOut % M2 * bw2 % M2 + M2) % M2 * B2 + tIn % M2) % M2
        out(i - w + 1) = h1 * M2 + h2
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, ts => {
        val n = ctx.freshName("n"); val out = ctx.freshName("out")
        val bw1 = ctx.freshName("bw1"); val bw2 = ctx.freshName("bw2")
        val h1 = ctx.freshName("h1"); val h2 = ctx.freshName("h2")
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val t = ctx.freshName("t"); val tOut = ctx.freshName("tOut"); val tIn = ctx.freshName("tIn")
        val gad = classOf[GenericArrayData].getName
        s"""
        final int $n = $ts.numElements();
        final long[] $out = new long[$n < $w ? 0 : $n - $w + 1];
        if ($n >= $w) {
          long $bw1 = 1L, $bw2 = 1L;
          for (int $j = 1; $j < $w; $j++) { $bw1 = $bw1 * ${B1}L % ${M1}L; $bw2 = $bw2 * ${B2}L % ${M2}L; }
          long $h1 = 0L, $h2 = 0L;
          for (int $i = 0; $i < $w; $i++) {
            final long $t = $ts.getLong($i);
            $h1 = ($h1 * ${B1}L + $t % ${M1}L) % ${M1}L;
            $h2 = ($h2 * ${B2}L + $t % ${M2}L) % ${M2}L;
          }
          $out[0] = $h1 * ${M2}L + $h2;
          for (int $i = $w; $i < $n; $i++) {
            final long $tOut = $ts.getLong($i - $w); final long $tIn = $ts.getLong($i);
            $h1 = (($h1 - $tOut % ${M1}L * $bw1 % ${M1}L + ${M1}L) % ${M1}L * ${B1}L + $tIn % ${M1}L) % ${M1}L;
            $h2 = (($h2 - $tOut % ${M2}L * $bw2 % ${M2}L + ${M2}L) % ${M2}L * ${B2}L + $tIn % ${M2}L) % ${M2}L;
            $out[$i - $w + 1] = $h1 * ${M2}L + $h2;
          }
        }
        ${ev.value} = new $gad($out);
        """
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  object Md5Hash32 {
    private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

    /** First 4 md5-digest bytes as an unsigned 32-bit value (digest()
      * leaves the thread-local instance reset for the next call). */
    def hash(s: org.apache.spark.unsafe.types.UTF8String): Long = {
      val d = md.get().digest(s.getBytes)
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
  }

  def md5Hash32(c: Column): Column =
    ColumnBridge.column(Md5Hash32(ColumnBridge.expression(c)))

  def md5Hash32Array(c: Column): Column =
    ColumnBridge.column(Md5Hash32Array(ColumnBridge.expression(c)))

  def shingleHash32(tokens: Column, w: Int): Column =
    ColumnBridge.column(ShingleHash32(ColumnBridge.expression(tokens), w))

  def tokenMarkerCount(tokens: Column, terms: Seq[String]): Column =
    ColumnBridge.column(TokenMarkerCount(ColumnBridge.expression(tokens), terms))

  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def minhashSignatureFast(hashes: Column, k: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(hashes), k))

  def cosineSimilarity(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def simhash32Fast(tokenHashes: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(tokenHashes)))

  def rollingWindowHash(tokenHashes: Column, w: Int): Column =
    ColumnBridge.column(RollingWindowHash(ColumnBridge.expression(tokenHashes), w))

  def byteDotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(ByteDotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def int8Codes(v: Column): Column =
    ColumnBridge.column(Int8Codes(ColumnBridge.expression(v)))

  /** Materialization barrier for an expensive column (see [[Sticky]]). */
  def sticky(c: Column): Column =
    ColumnBridge.column(Sticky(ColumnBridge.expression(c)))
}
