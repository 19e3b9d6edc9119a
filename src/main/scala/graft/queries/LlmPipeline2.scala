package graft.queries

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators, wave 2 (SURVEY §7 item 10): PII
  * redaction, unigram language-model quality scoring, repetition signals
  * (Gopher-style), blocklist filtering, and a composed end-to-end corpus
  * funnel. Reference analogs: text filtering lives in the reference as
  * scalar string/regex functions (src/Functions/ReplaceRegexpImpl.h,
  * countMatches.cpp); the pipeline composition is what a reference user
  * scripts around the engine — here each stage is one declarative plan.
  *
  * Scale notes: every operator below is a scan + codegen'd projection or a
  * shuffle on a bounded key (token vocab, source label). The unigram LM
  * broadcasts the vocabulary (bounded by language, not corpus size) so the
  * document table never shuffles.
  */
object LlmPipeline2 extends QueryPack {

  override def queries: Seq[Q] = Seq(

    // --- PII detection + redaction ------------------------------------
    // The synthetic corpus carries no PII, so both engines derive the SAME
    // PII-bearing text from (doc_id, text) first; what is under test is the
    // redaction regex surface (emails, IPv4s, E.164-ish phones) and the
    // match counting — reference analogs replaceRegexpAll
    // (src/Functions/replaceRegexpAll.cpp) and countMatches
    // (src/Functions/countMatches.cpp). One codegen'd projection, no
    // shuffle: at 100 TB this runs at scan speed per input split.
    Q.df("q_pii_redact", """
      WITH p AS (SELECT doc_id,
          'u' || CAST(doc_id AS VARCHAR) || '@example.com said ' ||
          SUBSTR(text, 1, 40) || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
          || '.0.1 or call +1-555-01' || CAST(doc_id % 10 AS VARCHAR)
          || CAST(doc_id % 10 AS VARCHAR) AS t
        FROM documents)
      SELECT doc_id,
        CAST(LEN(REGEXP_EXTRACT_ALL(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
        CAST(LEN(REGEXP_EXTRACT_ALL(t, '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS BIGINT) AS n_ip,
        CAST(LEN(REGEXP_EXTRACT_ALL(t, '\+\d[\d-]{7,}\d')) AS BIGINT) AS n_phone,
        REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(t,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
          '\+\d[\d-]{7,}\d', '<PHONE>', 'g') AS redacted
      FROM p ORDER BY doc_id""") { (s, dir) =>
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ip = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
      val phone = "\\+\\d[\\d-]{7,}\\d"
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), concat(
          lit("u"), col("doc_id").cast("string"), lit("@example.com said "),
          substring(col("text"), 1, 40),
          lit(" from 10."), (col("doc_id") % 256).cast("string"),
          lit(".0.1 or call +1-555-01"), (col("doc_id") % 10).cast("string"),
          (col("doc_id") % 10).cast("string")).as("t"))
        .select(col("doc_id"),
          regexp_count(col("t"), lit(email)).as("n_email"),
          regexp_count(col("t"), lit(ip)).as("n_ip"),
          regexp_count(col("t"), lit(phone)).as("n_phone"),
          regexp_replace(regexp_replace(regexp_replace(col("t"),
            email, "<EMAIL>"), ip, "<IP>"), phone, "<PHONE>").as("redacted"))
        .orderBy("doc_id")
    },

    // --- PII scrub operator (full class set) --------------------------
    // graft.operators.PiiScrub: the typed-class scrubber over the five
    // regex classes (email, card, SSN, phone, IPv4 — the published
    // BigScience/Dolma tagger classes) with ordered application and a
    // no-double-count total (classes count on the progressively
    // scrubbed text). The corpus carries no PII, so both engines derive
    // the same PII-bearing text first; SSN and card shapes are
    // class-separated from phones by the ordered chain. Per-row codegen
    // only — scan-speed at 100 TB.
    Q.df("q_pii_scrub", """
      WITH p AS (SELECT doc_id,
          SUBSTR(text, 1, 30) || ' u' || CAST(doc_id AS VARCHAR)
          || '@ex.com ssn 123-45-6789 tel 555-123-'
          || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
          || CASE WHEN doc_id % 7 = 0 THEN ' card 4111 1111 1111 1111'
                  ELSE '' END
          || ' ip 10.0.0.' || CAST(doc_id % 256 AS VARCHAR) AS t
        FROM documents)
      SELECT
        CAST(SUM(LEN(REGEXP_EXTRACT_ALL(t,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT) AS n_email,
        CAST(SUM(LEN(REGEXP_EXTRACT_ALL(t,
          '\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b'))) AS BIGINT) AS n_card,
        CAST(SUM(LEN(REGEXP_EXTRACT_ALL(t,
          '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b'))) AS BIGINT) AS n_ssn,
        CAST(SUM(LEN(REGEXP_EXTRACT_ALL(REGEXP_REPLACE(t,
            '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g'),
          '(?:\+[0-9]{1,3}[-. ])?(?:\([0-9]{3}\)|\b[0-9]{3})[-. ][0-9]{3}[-. ][0-9]{4}\b')))
          AS BIGINT) AS n_phone,
        CAST(SUM(LEN(REGEXP_EXTRACT_ALL(t,
          '\b(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\b')))
          AS BIGINT) AS n_ip,
        CAST(SUM(LEN(REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(
          REGEXP_REPLACE(REGEXP_REPLACE(t,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          '\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b', '<CARD>', 'g'),
          '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g'),
          '(?:\+[0-9]{1,3}[-. ])?(?:\([0-9]{3}\)|\b[0-9]{3})[-. ][0-9]{3}[-. ][0-9]{4}\b', '<PHONE>', 'g'),
          '\b(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\b', '<IP>', 'g')))
          AS BIGINT) AS scrubbed_len
      FROM p""") { (s, dir) =>
      import graft.operators.PiiScrub
      val withPii = Tables.load(s, dir, "documents")
        .select(col("doc_id"), concat(
          substring(col("text"), 1, 30),
          lit(" u"), col("doc_id").cast("string"),
          lit("@ex.com ssn 123-45-6789 tel 555-123-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          when(col("doc_id") % 7 === 0, lit(" card 4111 1111 1111 1111"))
            .otherwise(lit("")),
          lit(" ip 10.0.0."), (col("doc_id") % 256).cast("string")).as("t"))
      // phone counted AFTER the SSN class scrubs (the ordered-chain
      // no-double-count contract PiiScrub.totalCount encodes)
      val cnt = PiiScrub.counts(col("t"))
      withPii.select(cnt ++ Seq(
          regexp_count(regexp_replace(col("t"), PiiScrub.SsnRe, "<SSN>"),
            lit(PiiScrub.PhoneRe)).as("pii_phone_after_ssn"),
          PiiScrub.scrub(col("t")).as("scrubbed")): _*)
        .select(
          sum("pii_email").cast("long").as("n_email"),
          sum("pii_card").cast("long").as("n_card"),
          sum("pii_ssn").cast("long").as("n_ssn"),
          sum("pii_phone_after_ssn").cast("long").as("n_phone"),
          sum("pii_ip").cast("long").as("n_ip"),
          sum(length(col("scrubbed"))).cast("long").as("scrubbed_len"))
    },

    // --- Unigram LM quality score -------------------------------------
    // Per-document mean negative log-likelihood under the corpus unigram
    // distribution: nll = ln(T) - (1/n)·Σ ln(c_tok). Classic LM-based
    // corpus filter (low = fluent/common, high = rare/garbled). LN is only
    // ever applied to exact integer counts (both engines call LN on
    // identical integers — the q_agg_theils_u lesson), each term is
    // 1e6-fixed-pointed before the per-doc sum so addition order can't
    // drift, and T is exact.
    // Scale shape: vocab counts are a groupBy on token (bounded by
    // vocabulary, not corpus) and BROADCAST back; the document table never
    // shuffles.
    Q.df("q_text_unigram_lm", """
      WITH tok AS (
        SELECT doc_id, UNNEST(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '),
                                          t -> LEN(t) > 0)) AS tok
        FROM documents),
      vocab AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
      tot AS (SELECT SUM(c) AS t FROM vocab),
      terms AS (
        SELECT tok.doc_id, CAST(ROUND(LN(CAST(v.c AS DOUBLE)) * 1000000) AS BIGINT) AS lnc
        FROM tok JOIN vocab v USING (tok))
      SELECT doc_id,
        CAST(COUNT(*) AS BIGINT) AS n_tokens,
        ROUND(LN((SELECT CAST(t AS DOUBLE) FROM tot))
              - CAST(SUM(lnc) AS DOUBLE) / 1000000.0 / COUNT(*), 6) AS nll
      FROM terms GROUP BY doc_id ORDER BY doc_id""") { (s, dir) =>
      import graft.functions.TextFunctions.tokens
      val tok = Tables.load(s, dir, "documents")
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      val vocab = tok.groupBy("tok").agg(count(lit(1)).as("c"))
      // Corpus total T rides along as a broadcast 1-row cross join — the
      // whole query stays ONE lazy plan (no eager head() action at
      // plan-construction time; round-4 verdict "what's wrong" #5). All
      // rows carry the same T, so max() recovers it exactly post-groupBy.
      val tot = vocab.agg(sum("c").as("t"))
      tok.join(broadcast(vocab), Seq("tok"))
        .crossJoin(broadcast(tot))
        .select(col("doc_id"), col("t"),
          round(log(col("c").cast("double")) * 1e6).cast("long").as("lnc"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          round(log(max(col("t")).cast("double"))
            - sum("lnc").cast("double") / 1e6 / count(lit(1)), 6).as("nll"))
        .orderBy("doc_id")
    },

    // --- Interpolated bigram LM perplexity (CCNet-style filter) --------
    // nll per doc under P(w|p) = ½·c(p,w)/c(p) + ½·c(w)/T — the bigram
    // upgrade of the unigram filter (real pipelines score with a KenLM
    // n-gram model; the interpolation-with-unigram-backoff structure is
    // the same). Determinism: with λ=½, ln P = ln(c2·T + c_w·c_p) −
    // ln(2·c_p·T), so LN only ever sees EXACT integers (< 2^53 up to
    // ~3e9-token corpora), each term is 1e6-fixed-pointed, sums are
    // integer. Scale shape: unigram/bigram count tables are bounded by
    // vocab (broadcast); the token stream shuffles once on the bigram key.
    Q.df("q_text_bigram_lm", """
      WITH w AS (SELECT doc_id,
          LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\s+'), t -> LEN(t) > 0) AS ws
        FROM documents),
      tok AS (SELECT doc_id, UNNEST(ws) AS tok FROM w),
      uni AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
      tot AS (SELECT SUM(c) AS t FROM uni),
      pairs AS (SELECT doc_id, UNNEST(ws[1:LEN(ws)-1]) AS prev, UNNEST(ws[2:LEN(ws)]) AS cur
        FROM w WHERE LEN(ws) >= 2),
      big AS (SELECT prev, cur, COUNT(*) AS c2 FROM pairs GROUP BY prev, cur),
      terms AS (SELECT p.doc_id,
          CAST(ROUND((LN(CAST(b.c2 * t.t + uc.c * up.c AS DOUBLE))
                    - LN(CAST(2 * up.c * t.t AS DOUBLE))) * 1000000) AS BIGINT) AS term
        FROM pairs p
        JOIN big b ON p.prev = b.prev AND p.cur = b.cur
        JOIN uni up ON p.prev = up.tok
        JOIN uni uc ON p.cur = uc.tok
        CROSS JOIN tot t)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        ROUND(-CAST(SUM(term) AS DOUBLE) / 1000000.0 / COUNT(*), 6) AS nll
      FROM terms GROUP BY doc_id ORDER BY doc_id""") { (s, dir) =>
      import graft.functions.TextFunctions.tokens
      // Round-17 measured, left alone: fanning out the scan REGRESSED
      // slightly (1.06 → 1.14 min) — the three consumers (unigram
      // broadcast, bigram broadcast, terms pass) already evaluate
      // concurrently on idle cores, and the exchange is a barrier.
      val w = Tables.load(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("ws"))
      val tok = w.select(explode(col("ws")).as("tok"))
      val uni = tok.groupBy("tok").agg(count(lit(1)).as("c"))
      val tot = uni.agg(sum("c").as("t"))
      val pairs = w.filter(size(col("ws")) >= 2)
        .select(col("doc_id"), explode(arrays_zip(
          expr("slice(ws, 1, size(ws)-1)"),
          expr("slice(ws, 2, size(ws)-1)"))).as("pr"))
        .select(col("doc_id"), col("pr.0").as("prev"), col("pr.1").as("cur"))
      val big = pairs.groupBy("prev", "cur").agg(count(lit(1)).as("c2"))
      pairs
        .join(broadcast(big), Seq("prev", "cur"))
        .join(broadcast(uni.select(col("tok").as("prev"), col("c").as("cp"))), Seq("prev"))
        .join(broadcast(uni.select(col("tok").as("cur"), col("c").as("cc"))), Seq("cur"))
        .crossJoin(broadcast(tot))
        .select(col("doc_id"),
          round((log((col("c2") * col("t") + col("cc") * col("cp")).cast("double"))
            - log((lit(2L) * col("cp") * col("t")).cast("double"))) * 1e6)
            .cast("long").as("term"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_pairs"),
          round(-sum("term").cast("double") / 1e6 / count(lit(1)), 6).as("nll"))
        .orderBy("doc_id")
    },

    // --- Repetition signals (Gopher-style quality filter) --------------
    // Duplicate word-trigram fraction and top-token dominance per document;
    // high values flag boilerplate/spam. Pure integer counting on arrays —
    // exact in both engines. One codegen'd projection, no shuffle.
    Q.df("q_text_repetition", """
      WITH w AS (SELECT doc_id,
          LIST_FILTER(STRING_SPLIT(LOWER(text), ' '), t -> LEN(t) > 0) AS ws
        FROM documents),
      g AS (SELECT doc_id, ws,
          CASE WHEN LEN(ws) >= 3 THEN
            LIST_TRANSFORM(GENERATE_SERIES(1, LEN(ws)-2),
                           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
          ELSE [] END AS tg
        FROM w)
      SELECT doc_id,
        CAST(LEN(tg) AS BIGINT) AS n_trigrams,
        ROUND(CASE WHEN LEN(tg) > 0 THEN
          1.0 - CAST(LEN(LIST_DISTINCT(tg)) AS DOUBLE) / LEN(tg)
          ELSE 0.0 END, 6) AS dup_trigram_frac,
        ROUND(CAST((SELECT MAX(cnt) FROM (
            SELECT COUNT(*) AS cnt FROM UNNEST(ws) AS u(t) GROUP BY t)) AS DOUBLE)
          / GREATEST(LEN(ws), 1), 6) AS top_token_frac
      FROM g ORDER BY doc_id""") { (s, dir) =>
      import graft.functions.TextFunctions.tokens
      val w = Tables.load(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("ws"))
      val g = w.withColumn("tg",
        when(size(col("ws")) >= 3,
          transform(sequence(lit(1), size(col("ws")) - 2),
            i => concat_ws(" ", element_at(col("ws"), i),
              element_at(col("ws"), i + 1), element_at(col("ws"), i + 2))))
          .otherwise(array().cast("array<string>")))
      g.select(col("doc_id"),
        size(col("tg")).cast("long").as("n_trigrams"),
        round(when(size(col("tg")) > 0,
          lit(1.0) - size(array_distinct(col("tg"))).cast("double") / size(col("tg")))
          .otherwise(0.0), 6).as("dup_trigram_frac"),
        round(aggregate(
          // counts of each distinct token, then max — top-token dominance
          transform(array_distinct(col("ws")),
            t => size(filter(col("ws"), x => x === t))),
          lit(0), (m, c) => greatest(m, c)).cast("double")
          / greatest(size(col("ws")), lit(1)), 6).as("top_token_frac"))
        .orderBy("doc_id")
    },

    // --- Gopher-rules keep/drop decision (round 9) ----------------------
    // The COMPOSED document filter of Rae et al. 2021 §A1.1 (the Gopher
    // corpus rules; the published MassiveText pipeline): word-count
    // bounds, mean-word-length band, alphabetic-word fraction, and
    // stop-word presence — each rule a codegen'd per-row expression, the
    // decision their conjunction. Output = per-rule failure counts + the
    // kept-set size, so every rule is individually hash-verified. At
    // 100 TB this runs as a single projection over the corpus scan: no
    // shuffle, no state.
    Q.df("q_quality_gopher_rules", """
      WITH w AS (SELECT doc_id,
          LIST_FILTER(STRING_SPLIT(LOWER(text), ' '), t -> LEN(t) > 0) AS ws,
          LEN(REPLACE(LOWER(text), ' ', '')) AS chars
        FROM documents),
      m AS (SELECT doc_id, LEN(ws) AS wc,
          CAST(chars AS DOUBLE) / GREATEST(LEN(ws), 1) AS mwl,
          CAST(LEN(LIST_FILTER(ws, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE)
            / GREATEST(LEN(ws), 1) AS alpha_frac,
          (CASE WHEN LIST_CONTAINS(ws, 'the') THEN 1 ELSE 0 END
           + CASE WHEN LIST_CONTAINS(ws, 'and') THEN 1 ELSE 0 END
           + CASE WHEN LIST_CONTAINS(ws, 'of') THEN 1 ELSE 0 END
           + CASE WHEN LIST_CONTAINS(ws, 'to') THEN 1 ELSE 0 END
           + CASE WHEN LIST_CONTAINS(ws, 'a') THEN 1 ELSE 0 END) AS stop_hits
        FROM w)
      SELECT
        CAST(SUM(CASE WHEN wc < 50 OR wc > 100000 THEN 1 ELSE 0 END) AS BIGINT)
          AS fail_wc,
        CAST(SUM(CASE WHEN mwl < 3 OR mwl > 10 THEN 1 ELSE 0 END) AS BIGINT)
          AS fail_mwl,
        CAST(SUM(CASE WHEN alpha_frac < 0.8 THEN 1 ELSE 0 END) AS BIGINT)
          AS fail_alpha,
        CAST(SUM(CASE WHEN stop_hits < 2 THEN 1 ELSE 0 END) AS BIGINT)
          AS fail_stop,
        CAST(SUM(CASE WHEN wc BETWEEN 50 AND 100000
                       AND mwl BETWEEN 3 AND 10
                       AND alpha_frac >= 0.8
                       AND stop_hits >= 2 THEN 1 ELSE 0 END) AS BIGINT)
          AS kept,
        CAST(COUNT(*) AS BIGINT) AS total
      FROM m""") { (s, dir) =>
      val ws = filter(split(lower(col("text")), " "), t => length(t) > 0)
      val m = Tables.load(s, dir, "documents").select(
        size(ws).as("wc"),
        (length(regexp_replace(lower(col("text")), " ", "")).cast("double") /
          greatest(size(ws), lit(1))).as("mwl"),
        (size(filter(ws, t => t.rlike("[a-z]"))).cast("double") /
          greatest(size(ws), lit(1))).as("alpha_frac"),
        Seq("the", "and", "of", "to", "a").map(w =>
          when(array_contains(ws, w), 1).otherwise(0))
          .reduce(_ + _).as("stop_hits"))
      m.agg(
        sum(when(col("wc") < 50 || col("wc") > 100000, 1).otherwise(0))
          .cast("long").as("fail_wc"),
        sum(when(col("mwl") < 3 || col("mwl") > 10, 1).otherwise(0))
          .cast("long").as("fail_mwl"),
        sum(when(col("alpha_frac") < 0.8, 1).otherwise(0))
          .cast("long").as("fail_alpha"),
        sum(when(col("stop_hits") < 2, 1).otherwise(0))
          .cast("long").as("fail_stop"),
        sum(when(col("wc").between(50, 100000) &&
          col("mwl").between(3, 10) && col("alpha_frac") >= 0.8 &&
          col("stop_hits") >= 2, 1).otherwise(0)).cast("long").as("kept"),
        count(lit(1)).cast("long").as("total"))
    },

    // --- Blocklist filtering (domain/source exclusion) -----------------
    // The standard "remove banned domains" stage: LEFT ANTI join against a
    // blocklist. The blocklist is tiny → broadcast; the corpus never
    // shuffles (same shape as q_decontaminate). Survivor histogram by
    // source keeps the output small and exactly oracled.
    Q.df("q_filter_blocklist", """
      WITH bl(source) AS (VALUES ('src1'), ('src3')),
      kept AS (SELECT d.* FROM documents d
               WHERE NOT EXISTS (SELECT 1 FROM bl WHERE bl.source = d.source))
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM kept GROUP BY source ORDER BY source""") { (s, dir) =>
      val bl = s.createDataFrame(Seq(Tuple1("src1"), Tuple1("src3")))
        .toDF("source")
      Tables.load(s, dir, "documents")
        .join(broadcast(bl), Seq("source"), "left_anti")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("total_chars"))
        .orderBy("source")
    },

    // --- End-to-end corpus funnel ---------------------------------------
    // The composed pipeline a training-data user actually runs: language
    // filter → quality floor → exact dedup (first doc_id per normalized
    // fingerprint) → blocklist, reporting the stage-by-stage survivor
    // counts in one row. Each stage is a per-row FLAG, the dedup stage a
    // window-min over the fingerprint, and the funnel ONE conditional-count
    // aggregation — a single job, single scan, single shuffle (on fp).
    // (Round-4 verdict "what's wrong" #4: the previous rendering ran five
    // driver count() actions folded into literals.)
    Q.df("q_pipeline_funnel", """
      WITH base AS (SELECT doc_id, lang, source,
          CAST(LENGTH(text) AS DOUBLE) AS len, MD5(text) AS fp
        FROM documents),
      flags AS (SELECT doc_id, source,
          (lang = 'en') AS f1,
          (lang = 'en' AND len >= 100) AS f2,
          (lang = 'en' AND len >= 100 AND doc_id =
             MIN(CASE WHEN lang = 'en' AND len >= 100 THEN doc_id END)
               OVER (PARTITION BY fp)) AS f3
        FROM base)
      SELECT
        CAST(COUNT(*) AS BIGINT) AS n_total,
        CAST(COUNT(*) FILTER (WHERE f1) AS BIGINT) AS n_lang,
        CAST(COUNT(*) FILTER (WHERE f2) AS BIGINT) AS n_quality,
        CAST(COUNT(*) FILTER (WHERE f3) AS BIGINT) AS n_dedup,
        CAST(COUNT(*) FILTER (WHERE f3 AND source <> 'src1') AS BIGINT) AS n_final
      FROM flags""") { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val base = Tables.load(s, dir, "documents").select(col("doc_id"),
        col("lang"), col("source"), length(col("text")).cast("double").as("len"),
        md5(col("text")).as("fp"))
      val f1 = col("lang") === "en"
      val f2 = f1 && col("len") >= 100
      val firstOfFp = min(when(f2, col("doc_id"))).over(Window.partitionBy("fp"))
      val flags = base.select(col("source"),
        f1.as("f1"), f2.as("f2"), (f2 && col("doc_id") === firstOfFp).as("f3"))
      flags.agg(
        count(lit(1)).as("n_total"),
        count_if(col("f1")).as("n_lang"),
        count_if(col("f2")).as("n_quality"),
        count_if(col("f3")).as("n_dedup"),
        count_if(col("f3") && col("source") =!= "src1").as("n_final"))
    }
  )
}
