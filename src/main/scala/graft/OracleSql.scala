package graft

/** DuckDB oracle SQL — one ANSI statement per oracle-checkable query in
  * [[SparkEntry.queries]], computing bit-identical results (see the parity
  * conventions on [[SparkEntry]]): decimal-exact aggregates cast to double,
  * strict left folds (`list_reduce` with a prepended zero == Spark
  * `aggregate`), md5-derived portable hashes, matching total ORDER BY and
  * matching output column names/types.
  */
object OracleSql {

  /** Lowercased word tokens of `text` (mirror of TextOps.tokens). */
  private val TOKS =
    "list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), t -> t != '')"

  /** Portable 32-bit hash (mirror of PortableHash.hash32). */
  private def h32(x: String) =
    s"('0x'||substr(md5($x),1,8))::bigint"

  /** Strict left-fold sum of a double list (mirror of Spark `aggregate`). */
  private def foldSum(xs: String) =
    s"list_reduce(list_prepend(0.0::double, $xs), (acc,x) -> acc + x)"

  /** Mirror of VectorOps.normSq: fold acc + x². */
  private def normSq(v: String) =
    s"list_reduce(list_prepend(0.0::double, list_transform($v, x -> x::double)), (acc,x) -> acc + x*x)"

  /** Mirror of VectorOps.dot: zip-multiply then fold-sum. */
  private def dotExpr(a: String, b: String) =
    foldSum(s"list_transform(range(1, length($a)+1), i -> $a[i]::double * $b[i]::double)")

  /** Exact integer dot product of two bigint lists (mirror of
    * ArrayExprs.ByteDotProduct over int8 code vectors; order-free). */
  private def intDot(a: String, b: String) =
    s"list_reduce(list_prepend(0::bigint, list_transform(range(1, least(length($a), length($b))+1), i -> $a[i] * $b[i])), (acc,x) -> acc + x)"

  /** Mirror of VectorOps.signBucket(v, bits). */
  private def bucketN(v: String, bits: Int) =
    (0 until bits).map(i => s"CASE WHEN $v[${i + 1}] > 0 THEN ${1L << i} ELSE 0 END")
      .mkString("(", " + ", ")::bigint")
  private def bucket8(v: String) = bucketN(v, 8)

  /** Mirror of TextOps.quantize6 (floor-quantization, engine-portable). */
  private def qz6(x: String) = s"floor(($x) * 1000000.0) / 1000000.0"

  /** Mirror of TextOps.wordShingles(text, 3) (raw, duplicates kept) over a
    * token-list col `w` — callers hash then list_distinct. */
  private val SHINGLES3RAW =
    "list_transform(range(1, greatest(length(w)-2, 0)+1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])"

  private val DEC1 = "cast(1 AS decimal(18,2))"

  // --- bit-exact mirror of scala.util.hashing.MurmurHash3.stringHash -------
  // (the token hashing inside Embeddings.embedRaw/embed). All arithmetic is
  // unsigned 32-bit emulated on BIGINT with & masks; the two fmix multiplies
  // can exceed INT64 so they route through HUGEINT. Validated token-by-token
  // against the JVM over the full fixture vocabulary.
  private def and32(e: String) = s"($e & 4294967295)"
  private def mul32(a: String, b: Long) = s"((($a)::HUGEINT * $b) % 4294967296)::BIGINT"
  private def rotl32(e: String, r: Int) = and32(s"(($e << $r) | ($e >> ${32 - r}))")
  /** The k-transform both mix and mixLast apply to a 2-char block. */
  private def mmK(d: String) = and32(s"(${rotl32(and32(s"($d * 3432918353)"), 15)} * 461845907)")
  /** One MurmurHash3.mix step: (h, data-block) → h'. */
  private def mmMix(h: String, d: String) =
    and32(s"(${rotl32(s"xor($h, ${mmK(d)})", 13)} * 5 + 3864292196)")
  /** 2-char blocks of token col `t` ((c0 << 16) + c1, stringHash order). */
  private val MmPairs =
    "list_transform(range(1, (length(t) // 2) + 1), i -> (ascii(substr(t, 2*i - 1, 1)) << 16) + ascii(substr(t, 2*i, 1)))"
  private val MmLastK = mmK("ascii(substr(t, length(t), 1))")
  private val MmSeed1 = 4157243346L // stringSeed 0xf7ca7fd2 as unsigned
  private val MmSeed2 = 2538058380L // Embeddings.SignSeed 0x9747b28c as unsigned

  /** CTE chain computing, per distinct token `t` of CTE `src`, the embed
    * accumulator coordinates: `idx` (0-based dimension, floorMod(f1, dim))
    * and `sign` (±1 from f2's low bit). Emits a CTE named `<p>hash`. */
  private def mmTokenHashCtes(p: String, src: String, dim: Int): String = s"""
      ${p}tp AS (SELECT t, length(t) AS n,
        list_reduce(list_prepend($MmSeed1, $MmPairs), (h, d) -> ${mmMix("h", "d")}) AS b1,
        list_reduce(list_prepend($MmSeed2, $MmPairs), (h, d) -> ${mmMix("h", "d")}) AS b2
        FROM (SELECT DISTINCT t FROM $src)),
      ${p}tq AS (SELECT t,
        xor(CASE WHEN n % 2 = 1 THEN xor(b1, $MmLastK) ELSE b1 END, n) AS x1,
        xor(CASE WHEN n % 2 = 1 THEN xor(b2, $MmLastK) ELSE b2 END, n) AS y1
        FROM ${p}tp),
      ${p}u2 AS (SELECT t, ${mul32("xor(x1, x1 >> 16)", 2246822507L)} AS x2,
                           ${mul32("xor(y1, y1 >> 16)", 2246822507L)} AS y2 FROM ${p}tq),
      ${p}u3 AS (SELECT t, ${mul32("xor(x2, x2 >> 13)", 3266489909L)} AS x3,
                           ${mul32("xor(y2, y2 >> 13)", 3266489909L)} AS y3 FROM ${p}u2),
      ${p}u4 AS (SELECT t, xor(x3, x3 >> 16) AS f1u, xor(y3, y3 >> 16) AS f2u FROM ${p}u3),
      ${p}hash AS (SELECT t,
        (((CASE WHEN f1u >= 2147483648 THEN f1u - 4294967296 ELSE f1u END % $dim) + $dim) % $dim)::bigint AS idx,
        (CASE WHEN (f2u & 1) = 0 THEN 1 ELSE -1 END)::bigint AS sign
        FROM ${p}u4)"""

  val all: Map[String, String] = Map(
    "q01_pricing_summary" -> s"""
      SELECT l_returnflag, l_linestatus,
        cast(sum(cast(l_quantity AS decimal(18,2))) AS double) AS sum_qty,
        cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double) AS sum_base_price,
        cast(sum(cast(l_extendedprice AS decimal(18,2)) * ($DEC1 - cast(l_discount AS decimal(18,2)))) AS double) AS sum_disc_price,
        cast(sum(cast(l_quantity AS decimal(18,2))) AS double) / count(1)::double AS avg_qty,
        count(1) AS count_order
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q02_delta_scan" -> """
      SELECT event_id, ts, user_id, event_type, value FROM events
      WHERE ts > TIMESTAMP '2024-01-25 00:00:00' ORDER BY event_id""",

    "q03_watermark_max" -> "SELECT max(ts) AS last_updated FROM events",

    "q04_point_lookup" -> """
      SELECT event_type, max(ts) AS last_updated, count(1) AS n FROM events
      WHERE event_type = 'purchase' GROUP BY event_type""",

    "q05_anti_join" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""",

    "q06_semi_join" -> """
      SELECT s_suppkey, s_name, s_acctbal FROM supplier
      WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
      ORDER BY s_suppkey""",

    "q07_join_revenue" -> s"""
      SELECT r_name, n_name,
        cast(sum(cast(l_extendedprice AS decimal(18,2)) * ($DEC1 - cast(l_discount AS decimal(18,2)))) AS double) AS revenue,
        count(1) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name ORDER BY r_name, n_name""",

    "q08_window_topk" -> """
      SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        FROM orders WHERE o_custkey <= 50) t
      WHERE rnk <= 3 ORDER BY o_custkey, rnk""",

    "q09_running_sum" -> """
      SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
        cast(sum(cast(l_quantity AS decimal(18,2))) OVER (
          PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS double) AS running_qty
      FROM lineitem WHERE l_suppkey <= 3
      ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""",

    "q10_distinct_agg" -> """
      SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers, count(1) AS n_orders,
        cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS total
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q11_setops" -> """
      WITH c AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
           s AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
      SELECT nk, 'both' AS op FROM (SELECT nk FROM c INTERSECT SELECT nk FROM s)
      UNION ALL
      SELECT nk, 'customer_only' AS op FROM (SELECT nk FROM c EXCEPT SELECT nk FROM s)
      ORDER BY op, nk""",

    "q12_rollup" -> """
      SELECT n_name, c_mktsegment, count(1) AS n,
        cast(sum(cast(c_acctbal AS decimal(18,2))) AS double) AS acctbal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY ROLLUP (n_name, c_mktsegment)
      ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""",

    "q13_json_extract" -> """
      SELECT json_extract_string(props, '$.k')::int AS k, count(1) AS n,
        cast(sum(cast(value AS decimal(18,6))) AS double) AS total_value,
        count(1) AS n_parse_agree
      FROM events GROUP BY 1 ORDER BY k""",

    "q14_window_day" -> """
      SELECT date_trunc('day', ts)::timestamp AS day, event_type, count(1) AS n,
        cast(sum(cast(value AS decimal(18,6))) AS double) AS total_value
      FROM events GROUP BY 1, 2 ORDER BY day, event_type""",

    "q15_scalar_funcs" -> """
      SELECT p_partkey, substr(p_name, 1, 5) AS name5, upper(p_brand) AS brand_u,
        p_type || '/' || p_brand AS type_brand, (p_size % 7) AS size_mod,
        sqrt(p_retailprice) AS price_sqrt,
        CASE WHEN p_size > 25 THEN 'big' WHEN p_size > 10 THEN 'mid' ELSE 'small' END AS size_class,
        coalesce(nullif(p_type, 'ECONOMY'), 'CHEAP') AS type_or_cheap
      FROM part ORDER BY p_partkey""",

    "q16_chunk_docs" -> """
      WITH numbered AS (
        SELECT '{"event_id":' || event_id::varchar || ',"ts":"' || strftime(ts, '%Y-%m-%dT%H:%M:%S.%f')
               || '","user_id":' || user_id::varchar || ',"event_type":"' || event_type
               || '","value_cents":' || round(value * 100)::bigint::varchar || '}' AS doc,
               row_number() OVER (ORDER BY event_id) AS rn
        FROM events),
      chunks AS (
        SELECT floor((rn - 1) / 100)::bigint AS chunk_no,
               string_agg(doc, ' ' ORDER BY rn) AS text,
               count(1) AS n_rows
        FROM numbered GROUP BY 1)
      SELECT chunk_no, 'events#' || sha256(text) AS id, 'events' AS source, text, n_rows
      FROM chunks ORDER BY chunk_no""",

    // invariant oracle for the scalable chunker: boundaries are partition-
    // dependent, but the doc multiset must survive chunking intact and
    // every chunk must satisfy its size contract (chunk_ok is computed on
    // the engine side; a violation breaks the hash match on `true`)
    "q54_chunk_scalable" -> """
      SELECT '{"event_id":' || event_id::varchar || ',"ts":"' || strftime(ts, '%Y-%m-%dT%H:%M:%S.%f')
             || '","user_id":' || user_id::varchar || ',"event_type":"' || event_type
             || '","value_cents":' || round(value * 100)::bigint::varchar || '}' AS doc,
             true AS chunk_ok
      FROM events ORDER BY doc""",

    "q55_decimal_roundtrip" -> """
      SELECT l_orderkey, l_linenumber,
        cast(cast(l_extendedprice AS decimal(12,2)) AS double) AS price_rt,
        cast(cast(l_discount AS decimal(12,2)) AS double) AS disc_rt,
        true AS lossy_eq
      FROM lineitem WHERE l_orderkey <= 1000
      ORDER BY l_orderkey, l_linenumber""",

    "q56_salted_join" -> """
      WITH fact AS (
        SELECT CASE WHEN user_id % 4 != 0 THEN user_id % 1000 ELSE 0 END AS k, value
        FROM events),
      dim AS (SELECT c_custkey AS k, c_mktsegment FROM customer WHERE c_custkey < 1000)
      SELECT c_mktsegment, count(1) AS n,
        cast(sum(cast(value AS decimal(18,6))) AS double) AS total_value
      FROM fact JOIN dim USING (k)
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "q57_decontamination" -> s"""
      WITH w AS (SELECT doc_id, $TOKS AS w FROM documents),
      shl AS (SELECT doc_id,
        list_distinct(list_transform($SHINGLES3RAW, s2 -> ${h32("s2")})) AS hs FROM w),
      ex AS (SELECT doc_id, unnest(hs) AS h FROM shl),
      tst AS (SELECT DISTINCT h FROM ex WHERE doc_id % 97 = 0)
      SELECT doc_id, count(DISTINCT h) AS n_contaminated_shingles
      FROM ex JOIN tst USING (h)
      WHERE doc_id % 97 != 0
      GROUP BY doc_id ORDER BY doc_id""",

    "q58_seq_packing" -> s"""
      WITH d AS (SELECT source, doc_id, length($TOKS)::bigint AS tok FROM documents),
      c AS (SELECT source, doc_id, tok,
        coalesce(sum(tok) OVER (PARTITION BY source ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        FROM d)
      SELECT source, floor(cum / 2048)::bigint AS seq_id,
        count(1) AS n_docs, sum(tok)::bigint AS seq_tokens
      FROM c GROUP BY source, seq_id ORDER BY source, seq_id""",

    "q59_repetition" -> s"""
      WITH e AS (SELECT doc_id, unnest($TOKS) AS tk FROM documents),
      tf AS (SELECT doc_id, tk, count(1) AS n FROM e GROUP BY doc_id, tk),
      a AS (SELECT doc_id, sum(n)::bigint AS n_tok, count(1) AS n_types, max(n)::bigint AS top_tok_n
        FROM tf GROUP BY doc_id)
      SELECT doc_id, n_tok, n_types,
        ${qz6("1.0 - n_types::double / n_tok::double")} AS repetition,
        ${qz6("top_tok_n::double / n_tok::double")} AS top_token_share
      FROM a ORDER BY doc_id""",

    "q60_quality_topp" -> s"""
      WITH d AS (SELECT doc_id, source, text, $TOKS AS toks FROM documents),
      m AS (SELECT doc_id, source,
        CASE WHEN length(text) = 0 THEN 0.0
             ELSE length(regexp_replace(text, '[a-zA-Z0-9 \\t\\n\\r\\f]', '', 'g'))::double / length(text) END AS punct_r,
        CASE WHEN length(toks) = 0 THEN 0.0
             ELSE length(list_filter(toks, t -> t='the' OR t='a' OR t='of' OR t='and' OR t='is' OR t='to' OR t='in' OR t='it' OR t='that' OR t='on'))::double / length(toks) END AS stop_r,
        length(text) AS len FROM d),
      q AS (SELECT doc_id, source,
        ${qz6("least(len::double / 500.0, 1.0) * 0.4 + least(stop_r * 5.0, 1.0) * 0.3 + greatest(1.0 - punct_r * 4.0, 0.0) * 0.3")} AS quality
        FROM m),
      rk AS (SELECT source, doc_id, quality,
        row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS rnk,
        count(1) OVER (PARTITION BY source) AS n_src FROM q)
      SELECT source, rnk, doc_id, quality FROM rk
      WHERE rnk * 4 <= n_src + 3 ORDER BY source, rnk""",

    "q61_stratified_sample" -> s"""
      WITH d AS (SELECT doc_id, lang, $TOKS AS toks,
        ${h32("'sample:' || doc_id::varchar")} % 100 AS bucket FROM documents)
      SELECT lang, count(1) AS n_sampled, sum(length(toks))::bigint AS n_tokens
      FROM d WHERE bucket < CASE WHEN lang = 'en' THEN 50 ELSE 20 END
      GROUP BY lang ORDER BY lang""",

    "q62_pii_redaction" -> s"""
      WITH p AS (SELECT doc_id,
        CASE WHEN doc_id % 10 = 0
             THEN text || ' contact user' || doc_id::varchar || '@example.com or 555-0142'
             ELSE text END AS text
        FROM documents),
      r AS (SELECT doc_id,
        length(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}'))::bigint AS n_emails,
        regexp_replace(
          regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>', 'g'),
          '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean
        FROM p)
      SELECT doc_id, n_emails,
        length(regexp_extract_all(clean, '<PHONE>'))::bigint AS n_phones,
        sha256(clean) AS clean_sha256
      FROM r ORDER BY doc_id""",

    // hash-keyed bigram LM (mirror of the engine's feature-hashed model;
    // h32 collisions merge the same keys in both engines)
    "q63_ngram_lm_score" -> s"""
      WITH d AS (SELECT doc_id, $TOKS AS toks FROM documents),
      b AS (SELECT doc_id, unnest(list_transform(range(1, greatest(length(toks)-1, 0)+1),
            i -> toks[i] || ' ' || toks[i+1])) AS bigram FROM d),
      bc AS (SELECT doc_id, ${h32("bigram")} AS bh,
               ${h32("split_part(bigram, ' ', 1)")} AS w1h, count(1) AS cnt
             FROM b GROUP BY 1, 2, 3),
      bg AS (SELECT bh, w1h, sum(cnt)::bigint AS n12 FROM bc GROUP BY 1, 2),
      ug AS (SELECT w1h, sum(n12)::bigint AS n1 FROM bg GROUP BY w1h),
      pr AS (SELECT bh, w1h, n12, ${qz6("n12::double / n1::double")} AS p
             FROM bg JOIN ug USING (w1h))
      SELECT doc_id, sum(cnt)::bigint AS n_bigrams,
        sum(CASE WHEN n12 < 5 THEN cnt ELSE 0 END)::bigint AS n_rare,
        ${qz6("cast(sum(cnt * cast(p AS decimal(18,6))) AS double) / sum(cnt)::double")} AS mean_p
      FROM bc JOIN pr USING (bh, w1h)
      GROUP BY doc_id ORDER BY doc_id""",

    "q64_token_packing" -> """
      SELECT doc_id::varchar AS doc, true AS pack_ok
      FROM documents ORDER BY doc""",

    "q65_curation_pipeline" -> s"""
      WITH kept AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)),
      deduped AS (SELECT d.* FROM documents d JOIN kept USING (doc_id)),
      w AS (SELECT doc_id, source, text, $TOKS AS w FROM deduped),
      shl AS (SELECT doc_id,
        list_distinct(list_transform($SHINGLES3RAW, s2 -> ${h32("s2")})) AS hs FROM w),
      ex AS (SELECT doc_id, unnest(hs) AS h FROM shl),
      tst AS (SELECT DISTINCT h FROM ex WHERE doc_id % 97 = 0),
      contaminated AS (
        SELECT DISTINCT doc_id FROM ex JOIN tst USING (h) WHERE doc_id % 97 != 0),
      clean AS (
        SELECT * FROM w WHERE doc_id % 97 != 0
          AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
      m AS (SELECT doc_id, source, w AS toks,
        CASE WHEN length(text) = 0 THEN 0.0
             ELSE length(regexp_replace(text, '[a-zA-Z0-9 \\t\\n\\r\\f]', '', 'g'))::double / length(text) END AS punct_r,
        CASE WHEN length(w) = 0 THEN 0.0
             ELSE length(list_filter(w, t -> t='the' OR t='a' OR t='of' OR t='and' OR t='is' OR t='to' OR t='in' OR t='it' OR t='that' OR t='on'))::double / length(w) END AS stop_r,
        length(text) AS len FROM clean),
      q AS (SELECT doc_id, source, toks,
        ${qz6("least(len::double / 500.0, 1.0) * 0.4 + least(stop_r * 5.0, 1.0) * 0.3 + greatest(1.0 - punct_r * 4.0, 0.0) * 0.3")} AS quality
        FROM m),
      rk AS (SELECT doc_id, toks, quality,
        row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS rnk,
        count(1) OVER (PARTITION BY source) AS n_src FROM q),
      filtered AS (SELECT doc_id, length(toks)::bigint AS tok,
        CASE WHEN ${h32("'split:' || doc_id::varchar")} % 100 < 90 THEN 'train' ELSE 'val' END AS split
        FROM rk WHERE rnk * 4 <= n_src * 3 + 3),
      packed AS (SELECT split, doc_id, tok,
        floor(coalesce(sum(tok) OVER (PARTITION BY split ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512)::bigint AS pack
        FROM filtered)
      SELECT split, count(1) AS n_docs, sum(tok)::bigint AS n_tokens,
        count(DISTINCT pack) AS n_packs
      FROM packed GROUP BY split ORDER BY split""",

    // the engine reads the >=-adjusted window twice and dedups by id; the
    // absorbed result is a plain >= range scan
    "q66_lateness_scan" -> """
      SELECT event_id, ts, user_id, event_type, value FROM events
      WHERE ts >= TIMESTAMP '2024-01-24 23:00:00' ORDER BY event_id""",

    // the engine routes nation through a live embedded-JDBC database
    // (partitioned read + pushed predicate); relationally it is this
    "q67_jdbc_dim_join" -> """
      SELECT r_name, count(1) AS n_nations, min(n_name) AS first_nation
      FROM nation JOIN region ON n_regionkey = r_regionkey
      WHERE n_regionkey < 3
      GROUP BY r_name ORDER BY r_name""",

    // asymmetric (corpus ⋈ batch) mirror of q18's band pipeline: only
    // cross-side pairs, batch = corpus re-keyed +100000
    "q68_incremental_neardup" -> s"""
      WITH docs2 AS (
        SELECT doc_id, text, 'c' AS side FROM documents
        UNION ALL SELECT doc_id + 100000 AS doc_id, text, 'b' AS side FROM documents),
      w AS (SELECT doc_id, side, $TOKS AS w FROM docs2),
      hsh AS (SELECT doc_id, side,
        list_distinct(list_transform($SHINGLES3RAW, s2 -> ${h32("s2")})) AS hs FROM w),
      sig AS (SELECT doc_id, side, hs, length(hs)::bigint AS sz,
        list_transform(range(16), j -> coalesce(
          list_min(list_transform(hs, h -> (h * (999983*j + 1000003) + (999979*j + 12345)) % 4294967291)),
          4294967296)) AS sig
        FROM hsh),
      bands AS (SELECT doc_id, side, hs, sz,
        b::varchar || '_' || sig[b*4+1]::varchar || '_' || sig[b*4+2]::varchar
          || '_' || sig[b*4+3]::varchar || '_' || sig[b*4+4]::varchar AS band_key
        FROM sig, range(4) t(b)),
      j AS (SELECT a.doc_id AS corpus_id, b.doc_id AS batch_id,
          length(list_intersect(a.hs, b.hs))::bigint AS inter, a.sz + b.sz AS szsum
        FROM bands a JOIN bands b USING (band_key)
        WHERE a.side = 'c' AND b.side = 'b' AND a.doc_id <> b.doc_id
          AND greatest(a.sz, b.sz) > 0
          AND least(a.sz, b.sz) * 1000000 >= 500000 * greatest(a.sz, b.sz))
      SELECT DISTINCT corpus_id, batch_id,
        ${qz6("inter::double / (szsum - inter)::double")} AS jaccard
      FROM j WHERE inter * 1000000 >= 500000 * (szsum - inter)
      ORDER BY corpus_id, batch_id""",

    // exact shared 8-token windows over the doubled corpus
    // window keys = double Rabin–Karp over per-token hashes (mirror of
    // ArrayExprs.RollingWindowHash): key = horner(B=31,M=2147483647) *
    // 2147483629 + horner(B=37,M=2147483629); the oracle recomputes each
    // window's Horner fold directly (O(w) per window — fine at sf0.01)
    "q69_substring_dup" -> s"""
      WITH docs2 AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents),
      w AS (SELECT doc_id, $TOKS AS w FROM docs2),
      th AS (SELECT doc_id, list_transform(w, t2 -> ${h32("t2")}) AS th FROM w),
      wh AS (SELECT doc_id, list_distinct(list_transform(
          range(1, greatest(length(th)-7, 0)+1),
          i -> list_reduce(list_prepend(0::bigint, th[i:i+7]),
                 (acc,x) -> ((acc*31)%2147483647 + x%2147483647)%2147483647) * 2147483629
             + list_reduce(list_prepend(0::bigint, th[i:i+7]),
                 (acc,x) -> ((acc*37)%2147483629 + x%2147483629)%2147483629))) AS whs FROM th),
      e AS (SELECT doc_id, unnest(whs) AS wh FROM wh)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(DISTINCT a.wh) AS n_shared
      FROM e a JOIN e b ON a.wh = b.wh AND a.doc_id < b.doc_id
      GROUP BY 1, 2 ORDER BY id_a, id_b""",

    // equal token budget per source; integer-ppm hash gate
    "q70_token_mix" -> s"""
      WITH d AS (SELECT doc_id, source, length($TOKS)::bigint AS tok FROM documents),
      s AS (SELECT source, sum(tok)::bigint AS src_tokens FROM d GROUP BY source),
      tt AS (SELECT sum(src_tokens)::bigint AS total_tokens, count(1)::bigint AS n_sources FROM s),
      r AS (SELECT source, least(1000000, (total_tokens * 1000000) // (n_sources * src_tokens)) AS keep_ppm
            FROM s, tt),
      k AS (SELECT d.doc_id, d.source, d.tok, r.keep_ppm
            FROM d JOIN r USING (source)
            WHERE ${h32("'mix:' || doc_id::varchar")} % 1000000 < keep_ppm)
      SELECT source, keep_ppm, count(1) AS n_docs, sum(tok)::bigint AS n_tokens
      FROM k GROUP BY 1, 2 ORDER BY source""",

    // The Bloom prefilter is invisible to semantics (no false negatives +
    // exact refine join), so the oracle is the plain ANSI semi-join.
    "q71_bloom_decontamination" -> s"""
      WITH w AS (SELECT doc_id, $TOKS AS w FROM documents),
      shl AS (SELECT doc_id,
        list_distinct(list_transform($SHINGLES3RAW, s2 -> ${h32("s2")})) AS hs FROM w),
      ex AS (SELECT doc_id, unnest(hs) AS h FROM shl),
      tst AS (SELECT DISTINCT h FROM ex WHERE doc_id % 89 = 0)
      SELECT doc_id, count(DISTINCT h) AS n_contaminated_shingles
      FROM ex JOIN tst USING (h)
      WHERE doc_id % 89 != 0
      GROUP BY doc_id ORDER BY doc_id""",

    // int8 quantization + integer dot scoring + exact re-rank — mirror of
    // VectorOps.int8Scale/int8Quantize + ArrayExprs.ByteDotProduct; every
    // step is integer or fixed-order IEEE math, so the candidate cut and
    // the final ranking match the engine exactly
    "q72_quantized_knn" -> s"""
      WITH m AS (SELECT vec_id, embedding,
        list_max(list_transform(embedding, x -> abs(x::double))) AS ma FROM embeddings),
      q AS (SELECT vec_id, embedding,
        CASE WHEN ma IS NULL OR ma = 0 THEN 0.0 ELSE 127.0 / ma END AS scale FROM m),
      qq AS (SELECT vec_id, embedding,
        list_transform(embedding,
          x -> greatest(-127, least(127, floor(x::double * scale + 0.5)))::bigint) AS qv FROM q),
      n AS (SELECT vec_id, embedding, qv, ${intDot("qv", "qv")} AS nq FROM qq),
      p AS (SELECT qv AS pq, nq AS np, embedding AS pe FROM n WHERE vec_id = 0),
      sc AS (SELECT e.vec_id, e.embedding, ${intDot("e.qv", "p.pq")} AS dq, e.nq, p.np, p.pe
             FROM n e, p WHERE e.vec_id != 0 AND e.nq > 0 AND p.np > 0),
      cand AS (SELECT vec_id, embedding, pe,
        dq::double / sqrt(nq::double * np::double) AS score_q
        FROM sc ORDER BY score_q DESC, vec_id LIMIT 50),
      rr AS (SELECT vec_id, score_q,
        ${dotExpr("embedding", "pe")} AS dp,
        sqrt(${normSq("embedding")}) AS na,
        sqrt(${normSq("pe")}) AS nb
        FROM cand)
      SELECT vec_id, round(score_q, 6) AS score_q8,
        round(CASE WHEN na * nb = 0 THEN 0.0 ELSE dp / (na * nb) END, 6) AS score
      FROM rr ORDER BY score DESC, vec_id LIMIT 10""",

    // mirrors Dedup.clusterNearDupPairs at nprobe=1: nearest-centroid
    // assignment (ties -> lowest centroid index, zero-norm cosine -> 0),
    // within-cluster pairs, exact-cosine refine
    "q73_cluster_neardup" -> s"""
      WITH e2 AS (SELECT vec_id, embedding FROM embeddings
                  UNION ALL SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings),
      seeds AS (SELECT (row_number() OVER (ORDER BY vec_id)) - 1 AS cid, embedding AS ce
                FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)),
      sc AS (SELECT e.vec_id, e.embedding, s.cid,
        ${dotExpr("e.embedding", "s.ce")} AS dp,
        sqrt(${normSq("e.embedding")}) AS na,
        sqrt(${normSq("s.ce")}) AS nb
        FROM e2 e CROSS JOIN seeds s),
      sim AS (SELECT vec_id, embedding, cid,
        CASE WHEN na * nb = 0 THEN 0.0 ELSE dp / (na * nb) END AS cs FROM sc),
      asg AS (SELECT vec_id, embedding, cid FROM
        (SELECT vec_id, embedding, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid ASC) AS rn FROM sim)
        WHERE rn = 1),
      pr AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.embedding AS ea, b.embedding AS eb2
             FROM asg a JOIN asg b USING (cid) WHERE a.vec_id < b.vec_id),
      ref AS (SELECT id_a, id_b,
        ${dotExpr("ea", "eb2")} AS dp,
        sqrt(${normSq("ea")}) AS na,
        sqrt(${normSq("eb2")}) AS nb
        FROM pr),
      res AS (SELECT id_a, id_b,
        round(CASE WHEN na * nb = 0 THEN 0.0 ELSE dp / (na * nb) END, 6) AS cosine FROM ref)
      SELECT id_a, id_b, cosine FROM res WHERE cosine >= 0.25 ORDER BY id_a, id_b""",

    // q45's reachability CC + q22's quality mirror + argmax-per-cluster
    "q74_keep_best" -> s"""
      WITH RECURSIVE d AS (SELECT doc_id, $TOKS AS toks FROM documents WHERE doc_id < 500),
      p2 AS (SELECT doc_id, list_distinct(list_transform(toks, t -> ${h32("t")})) AS hs,
             length(list_distinct(list_transform(toks, t -> ${h32("t")})))::bigint AS sz,
             floor(length(toks) / 16)::bigint AS block FROM d),
      j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          length(list_intersect(a.hs, b.hs))::bigint AS inter, a.sz + b.sz AS szsum
        FROM p2 a JOIN p2 b USING (block)
        WHERE a.doc_id < b.doc_id AND greatest(a.sz, b.sz) > 0
          AND least(a.sz, b.sz) * 1000000 >= 900000 * greatest(a.sz, b.sz)),
      pr AS (SELECT id_a, id_b FROM j WHERE inter * 1000000 >= 900000 * (szsum - inter)),
      e AS (SELECT id_a AS src, id_b AS dst FROM pr UNION SELECT id_b, id_a FROM pr),
      r AS (
        SELECT doc_id AS src, doc_id AS dst FROM documents WHERE doc_id < 500
        UNION
        SELECT r.src, e.dst FROM r JOIN e ON e.src = r.dst),
      lab AS (SELECT src AS doc_id, min(dst) AS canonical FROM r GROUP BY src),
      dq AS (SELECT doc_id, text, $TOKS AS toks FROM documents WHERE doc_id < 500),
      m AS (SELECT doc_id,
        CASE WHEN length(text) = 0 THEN 0.0
             ELSE length(regexp_replace(text, '[a-zA-Z0-9 \\t\\n\\r\\f]', '', 'g'))::double / length(text) END AS punct_r,
        CASE WHEN length(toks) = 0 THEN 0.0
             ELSE length(list_filter(toks, t -> t='the' OR t='a' OR t='of' OR t='and' OR t='is' OR t='to' OR t='in' OR t='it' OR t='that' OR t='on'))::double / length(toks) END AS stop_r,
        length(text) AS n_chars
        FROM dq),
      qual AS (SELECT doc_id,
        ${qz6("least(n_chars::double / 500.0, 1.0) * 0.4 + least(stop_r * 5.0, 1.0) * 0.3 + greatest(1.0 - punct_r * 4.0, 0.0) * 0.3")} AS quality
        FROM m)
      SELECT l.doc_id, l.canonical, q2.quality,
        (row_number() OVER (PARTITION BY l.canonical ORDER BY q2.quality DESC, l.doc_id) = 1) AS keep
      FROM lab l JOIN qual q2 USING (doc_id) ORDER BY doc_id""",

    // mirrors q77 at nprobe=1: both sides assign to the q73 seed
    // centroids; pairs cross sides only (batch = corpus ids + 100000)
    "q77_incremental_vector_neardup" -> s"""
      WITH seeds AS (SELECT (row_number() OVER (ORDER BY vec_id)) - 1 AS cid, embedding AS ce
                FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)),
      sc AS (SELECT e.vec_id, e.embedding, s.cid,
        ${dotExpr("e.embedding", "s.ce")} AS dp,
        sqrt(${normSq("e.embedding")}) AS na,
        sqrt(${normSq("s.ce")}) AS nb
        FROM embeddings e CROSS JOIN seeds s),
      sim AS (SELECT vec_id, embedding, cid,
        CASE WHEN na * nb = 0 THEN 0.0 ELSE dp / (na * nb) END AS cs FROM sc),
      asg AS (SELECT vec_id, embedding, cid FROM
        (SELECT vec_id, embedding, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid ASC) AS rn FROM sim)
        WHERE rn = 1),
      pr AS (SELECT c.vec_id AS corpus_id, b.vec_id + 100000 AS batch_id,
                    c.embedding AS ec, b.embedding AS eb2
             FROM asg c JOIN asg b USING (cid)),
      ref AS (SELECT corpus_id, batch_id,
        ${dotExpr("ec", "eb2")} AS dp,
        sqrt(${normSq("ec")}) AS na,
        sqrt(${normSq("eb2")}) AS nb
        FROM pr),
      res AS (SELECT corpus_id, batch_id,
        round(CASE WHEN na * nb = 0 THEN 0.0 ELSE dp / (na * nb) END, 6) AS cosine FROM ref)
      SELECT corpus_id, batch_id, cosine FROM res WHERE cosine >= 0.25
      ORDER BY corpus_id, batch_id""",

    // mirrors q79: q95's ANSI-expressible exact columns, split out of the
    // rows-only sketch query so they get a full hash-checked row
    "q79_sketch_exact" -> """
      SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts, count(1) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    // exact Jaccard over the per-source DISTINCT shingle-hash sets; the
    // self-join on h mirrors the engine's pair generation, and the ratio
    // is computed double-quantized with the identical op order
    "q80_source_overlap" -> s"""
      WITH d AS (SELECT source, $TOKS AS w FROM documents),
      sh AS (SELECT DISTINCT source,
               unnest(list_transform($SHINGLES3RAW, s -> ${h32("s")})) AS h FROM d),
      sz AS (SELECT source, count(1) AS c FROM sh GROUP BY source),
      j AS (SELECT a.source AS src_a, b.source AS src_b, count(1) AS inter
            FROM sh a JOIN sh b USING (h) WHERE a.source < b.source
            GROUP BY a.source, b.source)
      SELECT src_a, src_b, inter,
        ${qz6("inter::double / (za.c + zb.c - inter)::double")} AS jaccard
      FROM j JOIN sz za ON za.source = j.src_a JOIN sz zb ON zb.source = j.src_b
      ORDER BY src_a, src_b""",

    // top-20 3-grams by (occurrences, doc_freq, ngram) — the ngram string
    // is a unique tie-break, so the 20-row cut is deterministic
    "q81_ngram_mining" -> s"""
      WITH d AS (SELECT doc_id, $TOKS AS w FROM documents),
      g AS (SELECT doc_id, unnest($SHINGLES3RAW) AS ngram FROM d),
      agg AS (SELECT ngram, count(1) AS occurrences, count(DISTINCT doc_id) AS doc_freq
              FROM g GROUP BY ngram)
      SELECT ngram, occurrences, doc_freq FROM agg
      ORDER BY occurrences DESC, doc_freq DESC, ngram LIMIT 20""",

    // containment of each candidate doc's DISTINCT shingle hashes in the
    // src0 benchmark set; verdict on integers (n_hit*2 >= n_ngrams) so
    // the 0.5 cut is engine-exact
    "q82_ngram_containment" -> s"""
      WITH d AS (SELECT doc_id, source, $TOKS AS w FROM documents),
      hs AS (SELECT doc_id, source,
               list_distinct(list_transform($SHINGLES3RAW, s -> ${h32("s")})) AS hl FROM d),
      bench AS (SELECT DISTINCT unnest(hl) AS h FROM hs WHERE source = 'src0'),
      g AS (SELECT doc_id, unnest(hl) AS h FROM hs WHERE source <> 'src0'),
      sc AS (SELECT g.doc_id, count(1) AS n_ngrams,
               sum(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END)::bigint AS n_hit
             FROM g LEFT JOIN bench b USING (h) GROUP BY g.doc_id)
      SELECT doc_id, n_ngrams, n_hit,
        ${qz6("n_hit::double / n_ngrams::double")} AS containment,
        (n_hit * 2 >= n_ngrams) AS contaminated
      FROM sc ORDER BY doc_id""",

    // mirrors q78: q21's langid feeding a fixed rule priority, grouped per
    // (source, verdict) with integer-ppm share. The quality cut mirrors
    // TextOps.qualityMicroOf — pure bigint arithmetic over char/token
    // counts, so the verdict is engine-independent by construction (no
    // double rounding, no regex \s divergence on the decision path).
    "q78_filter_funnel" -> s"""
      WITH d AS (SELECT doc_id, source, text, $TOKS AS toks FROM documents),
      sc AS (SELECT doc_id, source, text, toks,
        length(list_filter(toks, t -> t='the' OR t='a' OR t='of' OR t='and' OR t='is')) AS s_en,
        length(list_filter(toks, t -> t='el' OR t='la' OR t='de' OR t='que' OR t='los')) AS s_es,
        length(list_filter(toks, t -> t='der' OR t='die' OR t='das' OR t='und' OR t='ist')) AS s_de,
        length(list_filter(toks, t -> t='le' OR t='la' OR t='les' OR t='et' OR t='est')) AS s_fr,
        length(list_filter(toks, t -> t='de5' OR t='shi4' OR t='le5' OR t='zai4' OR t='he2')) AS s_zh,
        length(text)::bigint AS n_chars,
        length(toks)::bigint AS n_toks,
        length(regexp_replace(text, '[a-zA-Z0-9 \\t\\n\\r\\f]', '', 'g'))::bigint AS punct_hits,
        length(list_filter(toks, t -> t='the' OR t='a' OR t='of' OR t='and' OR t='is' OR t='to' OR t='in' OR t='it' OR t='that' OR t='on'))::bigint AS stop_hits
        FROM d),
      q AS (SELECT source, n_chars, s_en, s_es, s_de, s_fr, s_zh,
        (4 * least(n_chars * 2000, 1000000)
         + 3 * least(CASE WHEN n_toks = 0 THEN 0 ELSE (5000000 * stop_hits) // greatest(n_toks, 1) END, 1000000)
         + 3 * greatest(1000000 - (CASE WHEN n_chars = 0 THEN 0 ELSE (4000000 * punct_hits) // greatest(n_chars, 1) END), 0)) // 10 AS quality_micro
        FROM sc),
      v AS (SELECT source,
        CASE WHEN n_chars < 100 THEN 'too_short'
             WHEN (CASE WHEN greatest(s_en, s_es, s_de, s_fr, s_zh) = 0 THEN 'und'
                   WHEN s_en = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'en'
                   WHEN s_es = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'es'
                   WHEN s_de = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'de'
                   WHEN s_fr = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'fr'
                   ELSE 'zh' END) != 'en' THEN 'non_english'
             WHEN quality_micro < 500000 THEN 'low_quality'
             ELSE 'kept' END AS verdict
        FROM q),
      g AS (SELECT source, verdict, count(1)::bigint AS n_docs FROM v GROUP BY source, verdict)
      SELECT source, verdict, n_docs,
        -- DuckDB's sum(BIGINT) is HUGEINT, which pandas renders as float64;
        -- an un-cast share_ppm therefore hashes as 76233.0 against Spark's
        -- int64 76233 — rows/schema match, hash doesn't. Cast kills it.
        (n_docs * 1000000 // sum(n_docs) OVER (PARTITION BY source))::bigint AS share_ppm
      FROM g ORDER BY source, verdict""",

    // q78's per-doc trace over the FULL corpus: identical scoring CTEs with
    // doc_id and every raw signal carried through — a driver mismatch names
    // the diverging column and doc. All integer outputs cast ::bigint so no
    // HUGEINT/float artifact can leak into the hash.
    "q83_funnel_trace" -> s"""
      WITH d AS (SELECT doc_id, source, text, $TOKS AS toks FROM documents),
      sc AS (SELECT doc_id, source, text, toks,
        length(list_filter(toks, t -> t='the' OR t='a' OR t='of' OR t='and' OR t='is'))::bigint AS s_en,
        length(list_filter(toks, t -> t='el' OR t='la' OR t='de' OR t='que' OR t='los'))::bigint AS s_es,
        length(list_filter(toks, t -> t='der' OR t='die' OR t='das' OR t='und' OR t='ist'))::bigint AS s_de,
        length(list_filter(toks, t -> t='le' OR t='la' OR t='les' OR t='et' OR t='est'))::bigint AS s_fr,
        length(list_filter(toks, t -> t='de5' OR t='shi4' OR t='le5' OR t='zai4' OR t='he2'))::bigint AS s_zh,
        length(text)::bigint AS n_chars,
        length(toks)::bigint AS n_toks,
        length(regexp_replace(text, '[a-zA-Z0-9 \\t\\n\\r\\f]', '', 'g'))::bigint AS punct_hits,
        length(list_filter(toks, t -> t='the' OR t='a' OR t='of' OR t='and' OR t='is' OR t='to' OR t='in' OR t='it' OR t='that' OR t='on'))::bigint AS stop_hits
        FROM d),
      q AS (SELECT doc_id, source, n_chars, n_toks, punct_hits, stop_hits,
        s_en, s_es, s_de, s_fr, s_zh,
        CASE WHEN greatest(s_en, s_es, s_de, s_fr, s_zh) = 0 THEN 'und'
             WHEN s_en = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'en'
             WHEN s_es = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'es'
             WHEN s_de = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'de'
             WHEN s_fr = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'fr'
             ELSE 'zh' END AS pred_lang,
        ((4 * least(n_chars * 2000, 1000000)
         + 3 * least(CASE WHEN n_toks = 0 THEN 0 ELSE (5000000 * stop_hits) // greatest(n_toks, 1) END, 1000000)
         + 3 * greatest(1000000 - (CASE WHEN n_chars = 0 THEN 0 ELSE (4000000 * punct_hits) // greatest(n_chars, 1) END), 0)) // 10)::bigint AS quality_micro
        FROM sc)
      SELECT doc_id, source, n_chars, n_toks, punct_hits, stop_hits,
        s_en, s_es, s_de, s_fr, s_zh, pred_lang, quality_micro,
        CASE WHEN n_chars < 100 THEN 'too_short'
             WHEN pred_lang != 'en' THEN 'non_english'
             WHEN quality_micro < 500000 THEN 'low_quality'
             ELSE 'kept' END AS verdict
      FROM q ORDER BY doc_id""",

    // q78 minus the share window (bisect surface): grouped counts only
    "q84_funnel_counts" -> s"""
      WITH d AS (SELECT doc_id, source, text, $TOKS AS toks FROM documents),
      sc AS (SELECT doc_id, source, text, toks,
        length(list_filter(toks, t -> t='the' OR t='a' OR t='of' OR t='and' OR t='is')) AS s_en,
        length(list_filter(toks, t -> t='el' OR t='la' OR t='de' OR t='que' OR t='los')) AS s_es,
        length(list_filter(toks, t -> t='der' OR t='die' OR t='das' OR t='und' OR t='ist')) AS s_de,
        length(list_filter(toks, t -> t='le' OR t='la' OR t='les' OR t='et' OR t='est')) AS s_fr,
        length(list_filter(toks, t -> t='de5' OR t='shi4' OR t='le5' OR t='zai4' OR t='he2')) AS s_zh,
        length(text)::bigint AS n_chars,
        length(toks)::bigint AS n_toks,
        length(regexp_replace(text, '[a-zA-Z0-9 \\t\\n\\r\\f]', '', 'g'))::bigint AS punct_hits,
        length(list_filter(toks, t -> t='the' OR t='a' OR t='of' OR t='and' OR t='is' OR t='to' OR t='in' OR t='it' OR t='that' OR t='on'))::bigint AS stop_hits
        FROM d),
      q AS (SELECT source, n_chars, s_en, s_es, s_de, s_fr, s_zh,
        (4 * least(n_chars * 2000, 1000000)
         + 3 * least(CASE WHEN n_toks = 0 THEN 0 ELSE (5000000 * stop_hits) // greatest(n_toks, 1) END, 1000000)
         + 3 * greatest(1000000 - (CASE WHEN n_chars = 0 THEN 0 ELSE (4000000 * punct_hits) // greatest(n_chars, 1) END), 0)) // 10 AS quality_micro
        FROM sc),
      v AS (SELECT source,
        CASE WHEN n_chars < 100 THEN 'too_short'
             WHEN (CASE WHEN greatest(s_en, s_es, s_de, s_fr, s_zh) = 0 THEN 'und'
                   WHEN s_en = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'en'
                   WHEN s_es = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'es'
                   WHEN s_de = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'de'
                   WHEN s_fr = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'fr'
                   ELSE 'zh' END) != 'en' THEN 'non_english'
             WHEN quality_micro < 500000 THEN 'low_quality'
             ELSE 'kept' END AS verdict
        FROM q)
      SELECT source, verdict, count(1)::bigint AS n_docs
      FROM v GROUP BY source, verdict ORDER BY source, verdict""",

    // mirrors q76: the engine's range-partition + offset global index
    // equals a plain global row_number over the same (hash, id) order
    "q76_epoch_shuffle" -> s"""
      WITH k AS (SELECT doc_id,
        ${h32("'epoch1:' || doc_id::varchar")} AS k1,
        ${h32("'epoch2:' || doc_id::varchar")} AS k2
        FROM documents)
      SELECT doc_id,
        row_number() OVER (ORDER BY k1, doc_id) AS pos_epoch1,
        row_number() OVER (ORDER BY k2, doc_id) AS pos_epoch2
      FROM k ORDER BY doc_id""",

    // mirrors q75: df over distinct (tok, doc), drop tokens with df > N/2,
    // ordered reassembly of survivors
    "q75_df_prune" -> s"""
      WITH d AS (SELECT doc_id, $TOKS AS toks FROM documents),
      tk AS (SELECT doc_id,
        unnest(list_transform(range(length(toks)), i -> struct_pack(pos := i::int, tok := toks[i+1]))) AS s
        FROM d),
      t2 AS (SELECT doc_id, s.pos AS pos, s.tok AS tok FROM tk),
      dfreq AS (SELECT tok, count(DISTINCT doc_id)::bigint AS df FROM t2 GROUP BY tok),
      tot AS (SELECT count(1)::bigint AS n_docs FROM documents),
      dl AS (SELECT tok FROM dfreq, tot WHERE df * 2 > n_docs),
      k AS (SELECT doc_id, pos, tok FROM t2 WHERE tok NOT IN (SELECT tok FROM dl)),
      o AS (SELECT doc_id, count(1)::bigint AS n_kept,
            string_agg(tok, ' ' ORDER BY pos) AS filtered_text FROM k GROUP BY doc_id)
      SELECT d.doc_id,
        coalesce(o.n_kept, 0)::bigint AS n_kept,
        (length(d.toks) - coalesce(o.n_kept, 0))::bigint AS n_dropped,
        coalesce(o.filtered_text, '') AS filtered_text
      FROM d LEFT JOIN o USING (doc_id) ORDER BY doc_id""",

    "q17_exact_dedup" -> """
      WITH doubled AS (SELECT * FROM documents UNION ALL SELECT * FROM documents)
      SELECT min(doc_id) AS doc_id, sha256(text) AS text_sha256, count(1) AS dup_count
      FROM doubled GROUP BY sha256(text) ORDER BY doc_id""",

    "q18_minhash_lsh" -> s"""
      WITH docs2 AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents),
      w AS (SELECT doc_id, $TOKS AS w FROM docs2),
      hsh AS (SELECT doc_id,
        list_distinct(list_transform($SHINGLES3RAW, s2 -> ${h32("s2")})) AS hs FROM w),
      sig AS (SELECT doc_id, hs, length(hs)::bigint AS sz,
        list_transform(range(16), j -> coalesce(
          list_min(list_transform(hs, h -> (h * (999983*j + 1000003) + (999979*j + 12345)) % 4294967291)),
          4294967296)) AS sig
        FROM hsh),
      bands AS (SELECT doc_id, hs, sz,
        b::varchar || '_' || sig[b*4+1]::varchar || '_' || sig[b*4+2]::varchar
          || '_' || sig[b*4+3]::varchar || '_' || sig[b*4+4]::varchar AS band_key
        FROM sig, range(4) t(b)),
      j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          length(list_intersect(a.hs, b.hs))::bigint AS inter, a.sz + b.sz AS szsum
        FROM bands a JOIN bands b USING (band_key)
        WHERE a.doc_id < b.doc_id AND greatest(a.sz, b.sz) > 0
          AND least(a.sz, b.sz) * 1000000 >= 500000 * greatest(a.sz, b.sz))
      SELECT DISTINCT id_a, id_b,
        ${qz6("inter::double / (szsum - inter)::double")} AS jaccard
      FROM j WHERE inter * 1000000 >= 500000 * (szsum - inter) ORDER BY id_a, id_b""",

    // left join + coalesce(simhash, 0): unnest of an empty token list emits
    // no rows, but the engine emits simhash=0 for zero-token documents —
    // the left join keeps row parity if such a doc ever enters the fixture
    "q19_simhash" -> s"""
      WITH toks AS (SELECT doc_id, unnest($TOKS) AS tok FROM documents),
      h AS (SELECT doc_id, ${h32("tok")} AS h FROM toks),
      bits AS (SELECT doc_id, i, sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
               FROM h, range(32) t(i) GROUP BY doc_id, i),
      sh AS (SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::bigint << i) ELSE 0 END)::bigint AS simhash
             FROM bits GROUP BY doc_id)
      SELECT d.doc_id, coalesce(sh.simhash, 0)::bigint AS simhash
      FROM documents d LEFT JOIN sh USING (doc_id) ORDER BY doc_id""",

    "q20_ngram_jaccard" -> s"""
      WITH d AS (SELECT doc_id, $TOKS AS toks FROM documents),
      p AS (SELECT doc_id,
        list_distinct(list_transform(toks, t -> ${h32("t")})) AS hs,
        floor(length(toks) / 16)::bigint AS block FROM d),
      p2 AS (SELECT doc_id, hs, length(hs)::bigint AS sz, block FROM p),
      j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          length(list_intersect(a.hs, b.hs))::bigint AS inter, a.sz + b.sz AS szsum
        FROM p2 a JOIN p2 b USING (block)
        WHERE a.doc_id < b.doc_id AND greatest(a.sz, b.sz) > 0
          AND least(a.sz, b.sz) * 1000000 >= 900000 * greatest(a.sz, b.sz))
      SELECT DISTINCT id_a, id_b,
        ${qz6("inter::double / (szsum - inter)::double")} AS jaccard
      FROM j WHERE inter * 1000000 >= 900000 * (szsum - inter) ORDER BY id_a, id_b""",

    "q21_langid" -> s"""
      WITH d AS (SELECT doc_id, lang, $TOKS AS toks FROM documents),
      sc AS (SELECT doc_id, lang,
        length(list_filter(toks, t -> t='the' OR t='a' OR t='of' OR t='and' OR t='is')) AS s_en,
        length(list_filter(toks, t -> t='el' OR t='la' OR t='de' OR t='que' OR t='los')) AS s_es,
        length(list_filter(toks, t -> t='der' OR t='die' OR t='das' OR t='und' OR t='ist')) AS s_de,
        length(list_filter(toks, t -> t='le' OR t='la' OR t='les' OR t='et' OR t='est')) AS s_fr,
        length(list_filter(toks, t -> t='de5' OR t='shi4' OR t='le5' OR t='zai4' OR t='he2')) AS s_zh
        FROM d)
      SELECT doc_id, lang,
        CASE WHEN greatest(s_en, s_es, s_de, s_fr, s_zh) = 0 THEN 'und'
             WHEN s_en = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'en'
             WHEN s_es = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'es'
             WHEN s_de = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'de'
             WHEN s_fr = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'fr'
             ELSE 'zh' END AS pred_lang
      FROM sc ORDER BY doc_id""",

    "q22_quality_score" -> s"""
      WITH d AS (SELECT doc_id, text, $TOKS AS toks FROM documents),
      m AS (SELECT doc_id, text, toks,
        CASE WHEN length(text) = 0 THEN 0.0
             ELSE length(regexp_replace(text, '[a-zA-Z0-9 \\t\\n\\r\\f]', '', 'g'))::double / length(text) END AS punct_r,
        CASE WHEN length(toks) = 0 THEN 0.0
             ELSE length(list_filter(toks, t -> t='the' OR t='a' OR t='of' OR t='and' OR t='is' OR t='to' OR t='in' OR t='it' OR t='that' OR t='on'))::double / length(toks) END AS stop_r,
        CASE WHEN length(toks) = 0 THEN 0.0
             ELSE list_sum(list_transform(toks, t -> length(t)))::double / length(toks) END AS mean_len
        FROM d)
      SELECT doc_id, length(toks)::bigint AS n_tokens,
        ${qz6("punct_r")} AS punct_ratio,
        ${qz6("stop_r")} AS stopword_ratio,
        ${qz6("mean_len")} AS mean_token_len,
        ${qz6("least(length(text)::double / 500.0, 1.0) * 0.4 + least(stop_r * 5.0, 1.0) * 0.3 + greatest(1.0 - punct_r * 4.0, 0.0) * 0.3")} AS quality
      FROM m ORDER BY doc_id""",

    "q23_fingerprint" -> s"""
      SELECT doc_id,
        list_reduce(list_prepend(0::bigint, list_transform($TOKS, t -> ${h32("t")})),
          (acc, h2) -> (acc * 1000003 + h2) % 2147483647) AS fingerprint
      FROM documents ORDER BY doc_id""",

    "q24_knn_bruteforce" -> s"""
      WITH p AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0),
      sc AS (SELECT e.vec_id,
        ${dotExpr("e.embedding", "p.pe")} AS dp,
        sqrt(${normSq("e.embedding")}) AS na,
        sqrt(${normSq("p.pe")}) AS nb
        FROM embeddings e, p WHERE e.vec_id != 0)
      SELECT vec_id, round(CASE WHEN na * nb = 0 THEN 0.0 ELSE dp / (na * nb) END, 6) AS score
      FROM sc ORDER BY score DESC, vec_id LIMIT 10""",

    "q25_knn_lsh" -> s"""
      WITH eb AS (SELECT vec_id, embedding, ${bucketN("embedding", 4)} AS bucket FROM embeddings),
      p AS (SELECT embedding AS pe, bucket FROM eb WHERE vec_id = 0),
      sc AS (SELECT e.vec_id,
        ${dotExpr("e.embedding", "p.pe")} AS dp,
        sqrt(${normSq("e.embedding")}) AS na,
        sqrt(${normSq("p.pe")}) AS nb
        FROM eb e JOIN p USING (bucket) WHERE e.vec_id != 0)
      SELECT vec_id, round(CASE WHEN na * nb = 0 THEN 0.0 ELSE dp / (na * nb) END, 6) AS score
      FROM sc ORDER BY score DESC, vec_id LIMIT 10""",

    "q26_embedding_stats" -> s"""
      WITH n AS (SELECT label, round(sqrt(${normSq("embedding")}), 6) AS nrm FROM embeddings)
      SELECT label, count(1) AS n,
        cast(sum(cast(nrm AS decimal(18,6))) AS double) / count(1)::double AS avg_norm
      FROM n GROUP BY label ORDER BY label""",

    "q27_embedding_neardup" -> s"""
      WITH e2 AS (SELECT vec_id, embedding FROM embeddings
                  UNION ALL SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings),
      eb AS (SELECT vec_id, embedding, ${bucket8("embedding")} AS bucket FROM e2),
      pr AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.embedding AS ea, b.embedding AS eb2
             FROM eb a JOIN eb b USING (bucket) WHERE a.vec_id < b.vec_id),
      sc AS (SELECT id_a, id_b,
        ${dotExpr("ea", "eb2")} AS dp,
        sqrt(${normSq("ea")}) AS na,
        sqrt(${normSq("eb2")}) AS nb
        FROM pr),
      res AS (SELECT id_a, id_b,
        round(CASE WHEN na * nb = 0 THEN 0.0 ELSE dp / (na * nb) END, 6) AS cosine FROM sc)
      SELECT id_a, id_b, cosine FROM res WHERE cosine >= 0.25 ORDER BY id_a, id_b""",

    "q28_grouping_sets" -> """
      SELECT event_type, date_trunc('day', ts)::timestamp AS day, count(1) AS n,
        cast(sum(cast(value AS decimal(18,6))) AS double) AS total_value
      FROM events
      GROUP BY GROUPING SETS ((event_type), (date_trunc('day', ts)::timestamp), ())
      ORDER BY event_type ASC NULLS FIRST, day ASC NULLS FIRST""",

    "q29_topk_orders" -> """
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""",

    "q30_asof_watermark" -> """
      SELECT e.event_type, count(1) AS n, max(e.ts) AS new_watermark
      FROM events e
      JOIN (VALUES ('click', TIMESTAMP '2024-01-20 00:00:00'),
                   ('purchase', TIMESTAMP '2024-01-10 00:00:00'),
                   ('signup', TIMESTAMP '2024-01-25 00:00:00')) wm(event_type, last_updated)
        ON e.event_type = wm.event_type
      WHERE e.ts > wm.last_updated
      GROUP BY e.event_type ORDER BY e.event_type""",

    "q31_outer_join" -> """
      SELECT n_nationkey, n_name, count(c_custkey) AS n_customers,
        cast(sum(cast(c_acctbal AS decimal(18,2))) AS double) AS acctbal
      FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
      GROUP BY n_nationkey, n_name ORDER BY n_nationkey""",

    "q32_having" -> """
      SELECT l_partkey, count(1) AS n, cast(sum(cast(l_quantity AS decimal(18,2))) AS double) AS qty
      FROM lineitem GROUP BY l_partkey HAVING count(1) >= 35 ORDER BY l_partkey""",

    "q33_scalar_subquery" -> """
      SELECT c_custkey, c_name, c_acctbal FROM customer
      WHERE c_acctbal > (SELECT cast(sum(cast(c_acctbal AS decimal(18,2))) AS double) / count(1)::double FROM customer)
      ORDER BY c_custkey""",

    "q34_like_filter" -> """
      SELECT p_type, count(1) AS n,
        sum(CASE WHEN p_size > 20 THEN 1 ELSE 0 END)::bigint AS n_large,
        cast(sum(cast(p_retailprice AS decimal(18,2))) AS double) AS price_sum
      FROM part WHERE p_name LIKE '%red%' OR regexp_matches(p_name, '^blue ')
      GROUP BY p_type ORDER BY p_type""",

    "q35_bpe_tokens" -> s"""
      WITH d AS (SELECT doc_id, $TOKS AS toks FROM documents)
      SELECT doc_id, length(toks)::bigint AS ws_tokens,
        list_sum(list_transform(toks, t -> 1 + floor(length(t) / 6)::int))::bigint AS bpe_tokens
      FROM d ORDER BY doc_id""",

    "q36_minhash_sigs" -> s"""
      WITH w AS (SELECT doc_id, $TOKS AS w FROM documents),
      hsh AS (SELECT doc_id, list_distinct(list_transform($SHINGLES3RAW, s2 -> ${h32("s2")})) AS hs FROM w),
      sig AS (SELECT doc_id,
        list_transform(range(16), j -> coalesce(
          list_min(list_transform(hs, h -> (h * (999983*j + 1000003) + (999979*j + 12345)) % 4294967291)),
          4294967296)) AS sig
        FROM hsh)
      SELECT doc_id, sig[1] AS sig_1, sig[8] AS sig_8, sig[16] AS sig_16
      FROM sig ORDER BY doc_id""",

    // left join + coalesce(simhash, 0) for zero-token docs, as in q19 —
    // they must still generate blocked candidate pairs like the engine side
    "q37_simhash_pairs" -> s"""
      WITH docs2 AS (SELECT doc_id, text FROM documents
                     UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents),
      toks AS (SELECT doc_id, unnest($TOKS) AS tok FROM docs2),
      h AS (SELECT doc_id, ${h32("tok")} AS h FROM toks),
      bits AS (SELECT doc_id, i, sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
               FROM h, range(32) t(i) GROUP BY doc_id, i),
      sh0 AS (SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::bigint << i) ELSE 0 END)::bigint AS simhash
              FROM bits GROUP BY doc_id),
      sh AS (SELECT d.doc_id, coalesce(sh0.simhash, 0)::bigint AS simhash
             FROM docs2 d LEFT JOIN sh0 USING (doc_id)),
      blocked AS (SELECT doc_id, simhash,
        b::varchar || ':' || ((simhash >> (b*8)) & 255)::varchar AS block
        FROM sh, range(4) t(b)),
      pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
          bit_count(xor(a.simhash, b.simhash))::bigint AS hamming
        FROM blocked a JOIN blocked b USING (block) WHERE a.doc_id < b.doc_id)
      SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3 ORDER BY id_a, id_b""",

    "q38_knn_join_batch" -> s"""
      WITH eb AS (SELECT vec_id, embedding, ${bucketN("embedding", 4)} AS bucket FROM embeddings),
      p AS (SELECT vec_id AS probe_id, embedding AS pe, bucket FROM eb WHERE vec_id < 20),
      sc AS (SELECT p.probe_id, e.vec_id AS index_id,
        round(CASE WHEN sqrt(${normSq("e.embedding")}) * sqrt(${normSq("p.pe")}) = 0 THEN 0.0
              ELSE ${dotExpr("e.embedding", "p.pe")} / (sqrt(${normSq("e.embedding")}) * sqrt(${normSq("p.pe")}))
              END, 6) AS score
        FROM eb e JOIN p USING (bucket)),
      rk AS (SELECT probe_id, index_id, score,
        row_number() OVER (PARTITION BY probe_id ORDER BY score DESC, index_id) AS rnk FROM sc)
      SELECT probe_id, rnk, index_id, score FROM rk WHERE rnk <= 3 ORDER BY probe_id, rnk""",

    "q39_pivot" -> """
      SELECT n_name,
        cast(sum(CASE WHEN c_mktsegment = 'MACHINERY' THEN cast(c_acctbal AS decimal(18,2)) END) AS double) AS "MACHINERY",
        cast(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN cast(c_acctbal AS decimal(18,2)) END) AS double) AS "AUTOMOBILE",
        cast(sum(CASE WHEN c_mktsegment = 'BUILDING' THEN cast(c_acctbal AS decimal(18,2)) END) AS double) AS "BUILDING"
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name""",

    "q40_posexplode" -> s"""
      WITH d AS (SELECT doc_id, $TOKS AS toks FROM documents WHERE doc_id < 30),
      e AS (SELECT doc_id,
        unnest(list_transform(range(length(toks)), i -> struct_pack(pos := i::int, tok := toks[i+1]))) AS s
        FROM d)
      SELECT doc_id, s.pos AS pos, s.tok AS tok FROM e ORDER BY doc_id, pos""",

    "q41_percentiles" -> s"""
      SELECT p_type,
        ${qz6("quantile_cont(p_size, 0.25)")} AS q1,
        ${qz6("quantile_cont(p_size, 0.5)")} AS med,
        ${qz6("quantile_cont(p_size, 0.75)")} AS q3,
        count(1) AS n
      FROM part GROUP BY p_type ORDER BY p_type""",

    "q42_edit_distance" -> """
      SELECT a.doc_id, levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40))::bigint AS edit_dist
      FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      ORDER BY a.doc_id""",

    "q43_asof_join" -> """
      WITH l AS (SELECT event_id, ts, user_id FROM events WHERE event_id < 2000),
      j AS (SELECT l.event_id, l.user_id, o.o_orderkey, o.o_orderdate, o.o_totalprice,
        row_number() OVER (PARTITION BY l.event_id ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM l LEFT JOIN orders o ON l.user_id = o.o_custkey AND o.o_orderdate <= l.ts)
      SELECT event_id, user_id, o_orderkey, o_orderdate, o_totalprice
      FROM j WHERE rn = 1 ORDER BY event_id""",

    "q49_asof_custom_exec" -> """
      WITH l AS (SELECT event_id, ts, user_id FROM events WHERE event_id < 2000),
      j AS (SELECT l.event_id, l.user_id, o.o_orderkey, o.o_orderdate, o.o_totalprice,
        row_number() OVER (PARTITION BY l.event_id ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM l LEFT JOIN orders o ON l.user_id = o.o_custkey AND o.o_orderdate <= l.ts)
      SELECT event_id, user_id, o_orderkey, o_orderdate, o_totalprice
      FROM j WHERE rn = 1 ORDER BY event_id""",

    "q44_sessionize" -> """
      WITH o AS (SELECT user_id, event_id, ts, value,
        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts FROM events),
      f AS (SELECT *, CASE WHEN pts IS NULL OR epoch_us(ts) - epoch_us(pts) > 1800000000 THEN 1 ELSE 0 END AS brk FROM o),
      s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no FROM f)
      SELECT user_id, session_no::bigint AS session_no, count(1) AS n,
        min(ts) AS start_ts, max(ts) AS end_ts,
        cast(sum(cast(value AS decimal(18,6))) AS double) AS total_value
      FROM s GROUP BY user_id, session_no ORDER BY user_id, session_no""",

    "q45_dedup_clusters" -> s"""
      WITH RECURSIVE d AS (SELECT doc_id, $TOKS AS toks FROM documents WHERE doc_id < 500),
      p2 AS (SELECT doc_id, list_distinct(list_transform(toks, t -> ${h32("t")})) AS hs,
             length(list_distinct(list_transform(toks, t -> ${h32("t")})))::bigint AS sz,
             floor(length(toks) / 16)::bigint AS block FROM d),
      j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          length(list_intersect(a.hs, b.hs))::bigint AS inter, a.sz + b.sz AS szsum
        FROM p2 a JOIN p2 b USING (block)
        WHERE a.doc_id < b.doc_id AND greatest(a.sz, b.sz) > 0
          AND least(a.sz, b.sz) * 1000000 >= 900000 * greatest(a.sz, b.sz)),
      pr AS (SELECT id_a, id_b FROM j WHERE inter * 1000000 >= 900000 * (szsum - inter)),
      e AS (SELECT id_a AS src, id_b AS dst FROM pr UNION SELECT id_b, id_a FROM pr),
      r AS (
        SELECT doc_id AS src, doc_id AS dst FROM documents WHERE doc_id < 500
        UNION
        SELECT r.src, e.dst FROM r JOIN e ON e.src = r.dst)
      SELECT src AS doc_id, min(dst) AS canonical, (src = min(dst)) AS is_canonical
      FROM r GROUP BY src ORDER BY doc_id""",

    // reachability oracle over the FULL corpus, with the PAIR stage
    // mirroring q18's minhash-LSH band pipeline (threshold 0.9, no
    // doubling): the engine side uses star contraction, whose fixpoint
    // (min id per component) is algorithm-independent
    "q53_dedup_clusters_star" -> s"""
      WITH RECURSIVE w AS (SELECT doc_id, $TOKS AS w FROM documents),
      hsh AS (SELECT doc_id,
        list_distinct(list_transform($SHINGLES3RAW, s2 -> ${h32("s2")})) AS hs FROM w),
      sig AS (SELECT doc_id, hs, length(hs)::bigint AS sz,
        list_transform(range(16), j -> coalesce(
          list_min(list_transform(hs, h -> (h * (999983*j + 1000003) + (999979*j + 12345)) % 4294967291)),
          4294967296)) AS sig
        FROM hsh),
      bands AS (SELECT doc_id, hs, sz,
        b::varchar || '_' || sig[b*4+1]::varchar || '_' || sig[b*4+2]::varchar
          || '_' || sig[b*4+3]::varchar || '_' || sig[b*4+4]::varchar AS band_key
        FROM sig, range(4) t(b)),
      j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          length(list_intersect(a.hs, b.hs))::bigint AS inter, a.sz + b.sz AS szsum
        FROM bands a JOIN bands b USING (band_key)
        WHERE a.doc_id < b.doc_id AND greatest(a.sz, b.sz) > 0
          AND least(a.sz, b.sz) * 1000000 >= 900000 * greatest(a.sz, b.sz)),
      pr AS (SELECT DISTINCT id_a, id_b FROM j
        WHERE inter * 1000000 >= 900000 * (szsum - inter)),
      e AS (SELECT id_a AS src, id_b AS dst FROM pr UNION SELECT id_b, id_a FROM pr),
      r AS (
        SELECT doc_id AS src, doc_id AS dst FROM documents
        UNION
        SELECT r.src, e.dst FROM r JOIN e ON e.src = r.dst)
      SELECT src AS doc_id, min(dst) AS canonical, (src = min(dst)) AS is_canonical
      FROM r GROUP BY src ORDER BY doc_id""",

    "q50_heavy_hitters" -> s"""
      WITH d AS (SELECT doc_id, list_distinct($TOKS) AS toks FROM documents),
      e AS (SELECT doc_id, unnest(toks) AS term FROM d)
      SELECT term, count(1) AS df FROM e GROUP BY term
      ORDER BY df DESC, term LIMIT 20""",

    "q51_bigram_lm" -> s"""
      WITH d AS (SELECT $TOKS AS toks FROM documents),
      b AS (SELECT unnest(list_transform(range(1, greatest(length(toks)-1, 0)+1),
            i -> toks[i] || ' ' || toks[i+1])) AS bigram FROM d),
      bg AS (SELECT split_part(bigram, ' ', 1) AS w1, bigram, count(1) AS n12 FROM b GROUP BY 1, 2),
      ug AS (SELECT w1, sum(n12)::bigint AS n1 FROM bg GROUP BY w1)
      SELECT bigram, n12, n1, ${qz6("n12::double / n1::double")} AS p_cond
      FROM bg JOIN ug USING (w1) WHERE n12 >= 10
      ORDER BY n12 DESC, bigram LIMIT 50""",

    "q52_tfidf" -> s"""
      WITH d AS (SELECT doc_id, $TOKS AS toks FROM documents),
      cnt AS (SELECT count(1) AS n_docs FROM documents),
      e AS (SELECT doc_id, unnest(toks) AS term FROM d),
      tfs AS (SELECT doc_id, term, count(1) AS tf FROM e GROUP BY 1, 2),
      dfs AS (SELECT term, count(1) AS df FROM tfs GROUP BY term),
      rk AS (SELECT t.doc_id, t.term, t.tf, f.df,
        row_number() OVER (PARTITION BY t.doc_id ORDER BY t.tf DESC, f.df, t.term) AS rnk
        FROM tfs t JOIN dfs f USING (term))
      SELECT doc_id, term, tf, df,
        ${qz6("tf::double * ln((SELECT n_docs FROM cnt)::double / df::double)")} AS tfidf
      FROM rk WHERE rnk = 1 ORDER BY doc_id""",

    "q46_split" -> s"""
      WITH d AS (SELECT doc_id, $TOKS AS toks,
        ${h32("'split:' || doc_id::varchar")} % 100 AS bucket FROM documents)
      SELECT CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        count(1) AS n_docs, sum(length(toks))::bigint AS n_tokens
      FROM d GROUP BY 1 ORDER BY split""",

    "q47_source_quota" -> s"""
      WITH d AS (SELECT doc_id, source, text, $TOKS AS toks FROM documents),
      m AS (SELECT doc_id, source,
        CASE WHEN length(text) = 0 THEN 0.0
             ELSE length(regexp_replace(text, '[a-zA-Z0-9 \\t\\n\\r\\f]', '', 'g'))::double / length(text) END AS punct_r,
        CASE WHEN length(toks) = 0 THEN 0.0
             ELSE length(list_filter(toks, t -> t='the' OR t='a' OR t='of' OR t='and' OR t='is' OR t='to' OR t='in' OR t='it' OR t='that' OR t='on'))::double / length(toks) END AS stop_r,
        length(text) AS len FROM d),
      q AS (SELECT doc_id, source,
        ${qz6("least(len::double / 500.0, 1.0) * 0.4 + least(stop_r * 5.0, 1.0) * 0.3 + greatest(1.0 - punct_r * 4.0, 0.0) * 0.3")} AS quality
        FROM m),
      rk AS (SELECT source, doc_id, quality,
        row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS rnk FROM q)
      SELECT source, rnk, doc_id, quality FROM rk WHERE rnk <= 5 ORDER BY source, rnk""",

    "q48_corpus_stats" -> s"""
      WITH d AS (SELECT doc_id, lang, text, $TOKS AS toks FROM documents),
      m AS (SELECT lang,
        length(toks)::bigint AS ws,
        list_sum(list_transform(toks, t -> 1 + floor(length(t) / 6)::int))::bigint AS bpe,
        CASE WHEN length(text) = 0 THEN 0.0
             ELSE length(regexp_replace(text, '[a-zA-Z0-9 \\t\\n\\r\\f]', '', 'g'))::double / length(text) END AS punct_r,
        CASE WHEN length(toks) = 0 THEN 0.0
             ELSE length(list_filter(toks, t -> t='the' OR t='a' OR t='of' OR t='and' OR t='is' OR t='to' OR t='in' OR t='it' OR t='that' OR t='on'))::double / length(toks) END AS stop_r,
        length(text) AS len FROM d),
      q AS (SELECT lang, ws, bpe,
        ${qz6("least(len::double / 500.0, 1.0) * 0.4 + least(stop_r * 5.0, 1.0) * 0.3 + greatest(1.0 - punct_r * 4.0, 0.0) * 0.3")} AS quality
        FROM m)
      SELECT lang, count(1) AS n_docs, sum(ws)::bigint AS ws_tokens, sum(bpe)::bigint AS bpe_tokens,
        cast(sum(cast(quality AS decimal(18,6))) AS double) / count(1)::double AS mean_quality
      FROM q GROUP BY lang ORDER BY lang""",

    // the CDC cycle's sink after two cycles (cycle 2 is a no-op delta, so
    // any idempotency violation breaks this hash): deterministic chunks of
    // whole-row JSON over the only ts-bearing fixture table, content-hash
    // ids. The JSON build mirrors JsonRows.toJsonCol byte-for-byte
    // (column order, ISO-µs timestamps, shortest-round-trip doubles,
    // string escaping) — verified exact over the full events table.
    // String-escape parity: backslash first, then quote, then the five
    // JSON short control escapes (\b \t \n \f \r — chr() literals, applied
    // AFTER the backslash pass so their introduced backslashes survive).
    // Remaining gap, loud by construction: any OTHER control char (<0x20)
    // Spark renders \u00XX and this mirror leaves raw — error() on it
    // rather than hash-diverge. `value::varchar` additionally relies on
    // DuckDB double formatting matching Spark's shortest-round-trip
    // rendering (exact on every fixture double to date).
    "q93_cdc_cycle" -> """
      WITH docs AS (
        SELECT '{"event_id":' || event_id::varchar
          || ',"ts":"' || strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') || '"'
          || ',"user_id":' || user_id::varchar
          || ',"event_type":"' || event_type || '"'
          || ',"value":' || value::varchar
          || ',"props":"' ||
             CASE WHEN regexp_matches(props, '[\x00-\x07\x0b\x0e-\x1f]')
                  THEN error('q93 oracle: props contains a control char outside the \b\t\n\f\r escape set for event_id=' || event_id::varchar)
                  ELSE replace(replace(replace(replace(replace(replace(replace(
                         props, '\', '\\'), '"', '\"'),
                         chr(8), '\b'), chr(9), '\t'), chr(10), '\n'),
                         chr(12), '\f'), chr(13), '\r') END
          || '"}' AS doc,
          row_number() OVER (ORDER BY event_id) AS rn
        FROM events),
      chunks AS (
        SELECT string_agg(doc, ' ' ORDER BY rn) AS text
        FROM docs GROUP BY floor((rn - 1) / 100))
      SELECT 'events#' || sha256(text) AS id, 'events' AS source, text
      FROM chunks ORDER BY id""",

    // the hashed-feature embedding, content-verified: per-doc integer
    // accumulator fingerprint (nnz / Σacc² / index-weighted checksum) via
    // the bit-exact murmur3 mirror; nrm is the float stage's unit-norm
    // invariant (1.0 whenever the accumulator is nonzero)
    "q90_embed_documents" -> s"""
      WITH d AS (SELECT doc_id, $TOKS AS toks FROM documents),
      g AS (SELECT doc_id, unnest(toks) AS t FROM d),${mmTokenHashCtes("e", "g", 384)},
      acc AS (SELECT doc_id, idx, sum(sign)::bigint AS acc
              FROM g JOIN ehash USING (t) GROUP BY doc_id, idx HAVING sum(sign) != 0),
      agg AS (SELECT doc_id, count(1)::bigint AS nnz, sum(acc * acc)::bigint AS l2sq,
                     sum((idx + 1) * acc)::bigint AS chk
              FROM acc GROUP BY doc_id)
      SELECT d.doc_id, 384::bigint AS dim, coalesce(nnz, 0)::bigint AS nnz,
        coalesce(l2sq, 0)::bigint AS l2sq, coalesce(chk, 0)::bigint AS chk,
        (CASE WHEN coalesce(l2sq, 0) > 0 THEN 1.0 ELSE 0.0 END)::double AS nrm
      FROM d LEFT JOIN agg USING (doc_id) ORDER BY d.doc_id""",

    // text-query knn on the integer accumulators: dot and norms exact,
    // the single double division + sqrt bit-identical across engines
    "q91_text_query_knn" -> s"""
      WITH d AS (SELECT doc_id, $TOKS AS toks FROM documents),
      g AS (SELECT doc_id, unnest(toks) AS t FROM d),${mmTokenHashCtes("e", "g", 384)},
      acc AS (SELECT doc_id, idx, sum(sign)::bigint AS acc
              FROM g JOIN ehash USING (t) GROUP BY doc_id, idx HAVING sum(sign) != 0),
      qg AS (SELECT unnest(['table', 'scan', 'merge', 'join', 'spark']) AS t),${mmTokenHashCtes("q", "qg", 384)},
      qacc AS (SELECT idx, sum(sign)::bigint AS qa
               FROM qg JOIN qhash USING (t) GROUP BY idx HAVING sum(sign) != 0),
      ql2 AS (SELECT sum(qa * qa)::bigint AS l2q FROM qacc),
      l2 AS (SELECT doc_id, sum(acc * acc)::bigint AS l2d FROM acc GROUP BY doc_id),
      dt AS (SELECT a.doc_id, sum(a.acc * q.qa)::bigint AS dot
             FROM acc a JOIN qacc q USING (idx) GROUP BY a.doc_id),
      sc AS (SELECT l2.doc_id, coalesce(dt.dot, 0)::bigint AS dot, l2.l2d
             FROM l2 LEFT JOIN dt USING (doc_id))
      SELECT doc_id, dot,
        ${qz6("dot::double / sqrt((l2d * l2q)::double)")} AS score
      FROM sc, ql2 ORDER BY score DESC, doc_id LIMIT 10""",

    // multimodal resize plan, content-verified: the synthetic media dims
    // are deterministic formulas of the id (PNG/WAV/MP4 encode→decode
    // round-trips them exactly), and the corrupt-video stub dims mirror
    // java.util.Arrays.hashCode over the ASCII text bytes (31-polynomial,
    // 32-bit wrap — same emulation discipline as the murmur mirror). The
    // scale/target math is one IEEE double division + ceil on both sides.
    "q92_multimodal" -> """
      WITH d AS (SELECT doc_id, text,
        CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality
        FROM documents
        WHERE (SELECT count(*) FROM documents) <= 500 OR doc_id % 10 = 2),
      jh AS (SELECT doc_id,
        list_reduce(list_prepend(1::BIGINT,
          list_transform(range(1, length(text)+1), i -> ascii(substr(text, i, 1))::BIGINT)),
          (h, b) -> ((31 * h + b) & 4294967295)) AS hu
        FROM (SELECT doc_id,
                CASE WHEN strlen(text) = length(text) THEN text
                     ELSE error('q92 oracle requires pure-ASCII text (JVM stub hashes signed UTF-8 bytes, this mirror hashes code points — they agree only on ASCII); non-ASCII doc_id=' || doc_id::varchar) END AS text
              FROM d WHERE modality = 'video' AND doc_id % 9 = 2)),
      stub AS (SELECT doc_id,
        ((((CASE WHEN hu >= 2147483648 THEN hu - 4294967296 ELSE hu END % 1920) + 1920) % 1920) + 1)::int AS sw,
        (((hu >> 16) % 1080) + 1)::int AS sh
        FROM jh),
      dims AS (SELECT d.doc_id, d.modality,
        CASE d.modality
          WHEN 'image' THEN (32 + d.doc_id % 32)::int
          WHEN 'audio' THEN 8000
          ELSE CASE WHEN d.doc_id % 9 = 2 THEN stub.sw ELSE (320 + d.doc_id % 1600)::int END
        END AS width,
        CASE d.modality
          WHEN 'image' THEN (24 + d.doc_id % 24)::int
          WHEN 'audio' THEN (800 + d.doc_id % 400)::int
          ELSE CASE WHEN d.doc_id % 9 = 2 THEN stub.sh ELSE (240 + d.doc_id % 840)::int END
        END AS height,
        (d.modality != 'video' OR d.doc_id % 9 != 2) AS decoded
        FROM d LEFT JOIN stub ON d.doc_id = stub.doc_id)
      SELECT doc_id AS media_id, modality, width, height, decoded,
        least(512 / greatest(width, height)::double, 1.0) AS scale,
        ceil(width * least(512 / greatest(width, height)::double, 1.0))::int AS target_w,
        ceil(height * least(512 / greatest(width, height)::double, 1.0))::int AS target_h
      FROM dims ORDER BY media_id""")

  /** IVF ANN read-path mirror (q94/q96) — a TEMPLATE over the trained
    * centroid matrix, instantiated by SparkEntry.oracleSql after the
    * engine query has run (the centroids are index STATE, like q91's
    * query text — driver-size k×dim floats, inlined as exact
    * shortest-round-trip double literals; a float cast to double and its
    * Double.toString re-parse are the identical IEEE value, so the SQL
    * sees bit-for-bit the numbers the engine's `lit(c).cast("array
    * <float>")` sees). Given those centroids the mirror independently
    * recomputes the ENTIRE read path the engine claims: (1) every corpus
    * vector's nearest-centroid assignment (strict-left-fold double
    * cosine, ties → lowest cid — mirror of SimilaritySearch
    * .nearestCentroid's sorted-struct argmax), (2) the nprobe clusters
    * nearest the probe (mirror of rankClusters), (3) candidate
    * restriction to exactly those clusters (what partition pruning does
    * on disk), and (4) exact cosine top-k with the engine's
    * (score DESC, id) tie-break. k-means TRAINING itself stays
    * spec-verified (SimilaritySpec) — the oracle pins everything the
    * index READ does with the trained state, the same bar q91 sets for
    * the embedding read path.
    *
    * `corpus` must yield (id, embedding); `probe` must yield one row
    * (pe). */
  def ivfSearchMirror(
      centroids: Array[Array[Float]],
      corpus: String,
      probe: String,
      nprobe: Int,
      k: Int): String = {
    val rows = centroids.zipWithIndex.map { case (c, i) =>
      s"($i, [${c.map(_.toDouble.toString).mkString(",")}]::DOUBLE[])"
    }.mkString(",\n        ")
    val cs = "CASE WHEN na * nb = 0 THEN 0.0 ELSE dp / (na * nb) END"
    s"""
      WITH cents(cid, ce) AS (VALUES $rows),
      corpus AS ($corpus),
      probe AS ($probe),
      pcs AS (SELECT c.cid,
          ${dotExpr("c.ce", "p.pe")} AS dp,
          sqrt(${normSq("c.ce")}) AS na,
          sqrt(${normSq("p.pe")}) AS nb
        FROM cents c CROSS JOIN probe p),
      pc AS (SELECT cid FROM (
          SELECT cid, row_number() OVER (ORDER BY ($cs) DESC, cid ASC) AS rn
          FROM pcs) WHERE rn <= $nprobe),
      sc AS (SELECT e.id, e.embedding, c.cid,
          ${dotExpr("e.embedding", "c.ce")} AS dp,
          sqrt(${normSq("e.embedding")}) AS na,
          sqrt(${normSq("c.ce")}) AS nb
        FROM corpus e CROSS JOIN cents c),
      asg AS (SELECT id, embedding, cid FROM (
          SELECT id, embedding, cid,
            row_number() OVER (PARTITION BY id ORDER BY ($cs) DESC, cid ASC) AS rn
          FROM sc) WHERE rn = 1),
      cand AS (SELECT a.id, a.embedding FROM asg a JOIN pc USING (cid)),
      res AS (SELECT id,
          ${dotExpr("embedding", "p.pe")} AS dp,
          sqrt(${normSq("embedding")}) AS na,
          sqrt(${normSq("p.pe")}) AS nb
        FROM cand CROSS JOIN probe p)
      SELECT id, round($cs, 6) AS score
      FROM res ORDER BY score DESC, id LIMIT $k"""
  }
}
