package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
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
      extends BinaryExpression {
    override def dataType: DataType = IntegerType

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
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

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

  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def minhashSignatureFast(hashes: Column, k: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(hashes), k))

  /** Materialization barrier for an expensive column (see [[Sticky]]). */
  def sticky(c: Column): Column =
    ColumnBridge.column(Sticky(ColumnBridge.expression(c)))
}
