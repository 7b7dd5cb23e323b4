package graft

import graft.functions.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  import spark.implicits._

  private def strs(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect()(0).getSeq[String](0).toSeq

  test("tokens: lowercase, punctuation-split, empties dropped") {
    val df = Seq("Hello, World!  foo_bar 42").toDF("text")
    assert(strs(df.select(TextOps.tokens(col("text")))) == Seq("hello", "world", "foo", "bar", "42"))
  }

  test("wordShingles: n=3 over 5 tokens gives 3 shingles; short docs empty") {
    val df = Seq("a b c d e").toDF("text")
    assert(strs(df.select(TextOps.wordShingles(col("text"), 3))) == Seq("a b c", "b c d", "c d e"))
    val short = Seq("a b").toDF("text")
    assert(strs(short.select(TextOps.wordShingles(col("text"), 3))).isEmpty)
  }

  test("minhash signature: k elements; identical texts → identical sigs; " +
    "signature element is min over shingle hashes") {
    val df = Seq(("x", "a b c d e f g"), ("y", "a b c d e f g"), ("z", "q w e r t y u"))
      .toDF("id", "text")
      .select(col("id"), TextOps.minhashSignature(TextOps.distinctWordShingles(col("text"), 3), 16).as("sig"))
    val m = df.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(m("x").length == 16)
    assert(m("x") == m("y"))
    assert(m("x") != m("z"))
  }

  test("simhash: identical texts equal; hamming to a different text > 0") {
    val df = Seq(("a", "spark table scan filter"), ("b", "spark table scan filter"), ("c", "totally different words here"))
      .toDF("id", "text")
      .select(col("id"), TextOps.simhash32(col("text")).as("s"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("a") == m("b"))
    assert(m("a") != m("c"))
    assert(m("a") >= 0L && m("a") < (1L << 32))
  }

  test("rolling fingerprint is order-sensitive") {
    val df = Seq(("a", "one two three"), ("b", "three two one")).toDF("id", "text")
      .select(col("id"), TextOps.rollingFingerprint(col("text")).as("f"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("a") != m("b"))
  }

  test("langId picks the marker-heavy language; no markers → und") {
    val df = Seq(
      ("e", "the cat and the dog is a pet of the house"),
      ("d", "der hund und die katze und das haus ist"),
      ("u", "xyzzy plugh qwerty")).toDF("id", "text")
      .select(col("id"), TextOps.langId(col("text")).as("lang"))
    val m = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("e") == "en")
    assert(m("d") == "de")
    assert(m("u") == "und")
  }

  test("quality score in [0,1]; punctuation garbage scores lower than prose") {
    val df = Seq(
      ("good", "the quick brown fox jumps over the lazy dog and it is a fine day in the park"),
      ("bad", "@#$% ^&*() !!! ~~~ ###")).toDF("id", "text")
      .select(col("id"), TextOps.qualityScore(col("text")).as("q"))
    val m = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(m("good") > m("bad"))
  }

  test("qualityMicroOf: integer micro-units, exact boundary at the q78 cut") {
    // 25 tokens (24 spaces), 76 token chars => n_chars = 100; 2 stopwords
    // ("the", "a"); zero punctuation. quality_micro lands EXACTLY on the
    // q78 cut: (4*min(100*2000,1e6) + 3*(5e6*2/25) + 3*1e6)/10
    //        = (800000 + 1200000 + 3000000)/10 = 500000  -> NOT low_quality
    val boundary = (Seq("the", "a") ++ Seq.fill(22)("abc") :+ "abcdef").mkString(" ")
    assert(boundary.length == 100)
    // one stopword instead of two: stop_micro = 5e6*1/25 = 200000 and
    // n_chars = 101 => (4*202000 + 600000 + 3000000)/10 = 440800 -> below
    val below = (Seq("the", "zz") ++ Seq.fill(22)("abc") :+ "abcdef").mkString(" ")
    val df = Seq(("at", boundary), ("under", below)).toDF("id", "text")
      .select(col("id"),
        TextOps.qualityMicroOf(col("text"), TextOps.tokens(col("text"))).as("qm"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("at") == 500000L) // strict `< 500000` keeps the boundary doc
    assert(m("under") == 440800L)
  }

  test("punctHits counts vertical tab as punctuation in both engines' semantics") {
    // Java \s includes \x0B, RE2's does not — NonPunctClass spells the
    // whitespace set explicitly so both sides agree: \x0B IS punctuation.
    val df = Seq("ab\u000Bcd \t\n").toDF("text")
      .select(TextOps.punctHits(col("text")).as("p"))
    assert(df.collect()(0).getInt(0) == 1)
  }

  test("tokenCount and approxBpeCount: bpe >= words (long words add pieces)") {
    val df = Seq("short supercalifragilistic words").toDF("text")
      .select(TextOps.tokenCount(col("text")).as("w"), TextOps.approxBpeCount(col("text")).as("b"))
    val r = df.collect()(0)
    assert(r.getInt(0) == 3)
    assert(r.getInt(1) > 3) // the 22-char word contributes extra pieces
  }
}
