package graft.queries

import graft.{Q, QueryPack, Tables}
import graft.functions.TextFunctions.{dot, l2norm}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators, wave 3: deterministic stratified
  * sampling, corpus mixture weighting, sentence segmentation statistics,
  * a fixed-weight quality classifier, and nearest-centroid cluster
  * assignment (the k-means assignment step / IVF coarse quantizer).
  *
  * All five are EXACTLY oracled: every derivation (hash, weights, score,
  * cosine) is pure arithmetic both engines state in full, so the driver
  * hash-compares values — no rows-only entries in this wave.
  *
  * Scale notes: sampling and scoring are scan-speed codegen'd projections
  * (no shuffle before the tiny per-group aggregate); the mixer aggregates
  * per source (20 rows) and windows over that tiny table only; clustering
  * broadcasts the centroid table so the embedding scan never shuffles —
  * at 100 TB each is one pass over the corpus plus constant-size state.
  * Reference analogs: SAMPLE BY clause intHash32-style deterministic
  * sampling (src/Storages/MergeTree/MergeTreeDataSelectExecutor.cpp
  * sampling key), scalar math over strings (src/Functions/), vector
  * distance re-rank (MergeTreeIndexVectorSimilarity.cpp).
  */
object LlmPipeline3 extends QueryPack {

  private val knuth = 2654435761L // Knuth multiplicative hash constant
  private val mod32 = 4294967296L

  override def queries: Seq[Q] = Seq(

    // --- Deterministic stratified sampling ----------------------------
    // Keep a per-source rate of documents chosen by a stable multiplicative
    // hash of doc_id — the property that matters at 100 TB: membership is a
    // pure function of the row (re-runs, retries, and different cluster
    // sizes pick the SAME sample; no RNG state, no shuffle). Reference:
    // SAMPLE k relies on the deterministic sampling key the same way.
    // Exact BIGINT sums (not double avgs) keep the oracle hash-stable.
    Q.df("q_sample_stratified", s"""
      WITH h AS (SELECT source, doc_id,
          (doc_id * $knuth) % $mod32 AS hv,
          CASE WHEN source IN ('src0', 'src1') THEN 0.5
               WHEN source IN ('src2', 'src3') THEN 0.25
               ELSE 0.1 END AS rate
        FROM documents)
      SELECT source,
        CAST(COUNT(*) AS BIGINT) AS n_total,
        CAST(COUNT(*) FILTER (WHERE hv < rate * $mod32) AS BIGINT) AS n_kept,
        CAST(COALESCE(SUM(doc_id) FILTER (WHERE hv < rate * $mod32), 0) AS BIGINT) AS id_sum,
        CAST(COALESCE(SUM(hv) FILTER (WHERE hv < rate * $mod32), 0) AS BIGINT) AS hash_sum
      FROM h GROUP BY source ORDER BY source""") { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val hv = (col("doc_id") * lit(knuth)) % lit(mod32)
      val rate = when(col("source").isin("src0", "src1"), 0.5)
        .when(col("source").isin("src2", "src3"), 0.25)
        .otherwise(0.1)
      val kept = hv < rate * lit(mod32)
      d.select(col("source"), col("doc_id"), hv.as("hv"), kept.as("kept"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_total"),
          count(when(col("kept"), 1)).as("n_kept"),
          coalesce(sum(when(col("kept"), col("doc_id"))), lit(0L)).as("id_sum"),
          coalesce(sum(when(col("kept"), col("hv"))), lit(0L)).as("hash_sum"))
        .orderBy("source")
    },

    // --- Corpus mixture weighting -------------------------------------
    // Allocate a 100k-document training mix across sources by weight:
    // per-source counts (one tiny aggregate), weight as a pure function of
    // the source id, allocation = round(share of the target), repeat
    // factor and epoch count per source. The corpus scan happens once; the
    // window runs over the 20-row per-source table.
    Q.df("q_corpus_mix", """
      WITH n AS (SELECT source, COUNT(*) AS n,
          CAST(1.0 + (CAST(SUBSTR(source, 4) AS INT) % 4) * 0.5 AS DOUBLE) AS w
        FROM documents GROUP BY source),
      a AS (SELECT source, n, w,
          CAST(SUM(w) OVER () AS DOUBLE) AS wsum FROM n),
      b AS (SELECT source, n, w, ROUND(100000 * w / wsum) AS alloc FROM a)
      SELECT source, CAST(n AS BIGINT) AS n_docs,
        ROUND(w, 2) AS weight,
        CAST(alloc AS BIGINT) AS alloc,
        ROUND(alloc / n, 6) AS repeat_factor,
        CAST(CEIL(alloc / n) AS BIGINT) AS epochs
      FROM b ORDER BY source""") { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = Tables.load(s, dir, "documents")
      // weights are halves (1.0/1.5/2.0/2.5): their double sum is exact in
      // any accumulation order, so the window total is oracle-stable
      val n = d.groupBy("source").agg(count(lit(1)).as("n"))
        .withColumn("w",
          lit(1.0) + (substring(col("source"), 4, 10).cast("int") % 4) * lit(0.5))
      val wsum = sum(col("w")).over(Window.partitionBy())
      val alloc = round(lit(100000) * col("w") / col("wsum"))
      n.withColumn("wsum", wsum)
        .select(col("source"), col("n").cast("long").as("n_docs"),
          round(col("w"), 2).as("weight"),
          alloc.cast("long").as("alloc"),
          round(alloc / col("n"), 6).as("repeat_factor"),
          ceil(alloc / col("n")).cast("long").as("epochs"))
        .orderBy("source")
    },

    // --- Temperature-sampled corpus mixing ----------------------------
    // The multilingual-pretraining sampling scheme: source shares are
    // raised to 1/T and renormalized, flattening (T>1) or sharpening
    // (T<1) the natural distribution. T = 0.5 here, so the share power is
    // an exact integer square (n_s² / Σn²) — no libm pow in the gate
    // path, keeping the oracle bit-stable. Row membership is the same
    // pure-function-of-the-row multiplicative hash as the stratified
    // sampler: re-runs and cluster resizes pick the identical mix.
    Q.df("q_corpus_mix_temperature", s"""
      WITH n AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
      t AS (SELECT source, n,
          CAST(n AS DOUBLE) * n / SUM(CAST(n AS DOUBLE) * n) OVER () AS p
        FROM n),
      a AS (SELECT source, n, p, ROUND(50000 * p) AS alloc FROM t),
      k AS (SELECT d.source, d.doc_id,
          (d.doc_id * $knuth) % $mod32 AS hv, a.n, a.alloc,
          CASE WHEN a.alloc / a.n > 1.0 THEN 1.0 ELSE a.alloc / a.n END AS keep_rate
        FROM documents d JOIN a ON d.source = a.source)
      SELECT source,
        CAST(MAX(n) AS BIGINT) AS n_docs,
        CAST(MAX(alloc) AS BIGINT) AS alloc,
        CAST(COUNT(*) FILTER (WHERE hv < keep_rate * $mod32) AS BIGINT) AS n_kept,
        CAST(COALESCE(SUM(doc_id) FILTER (WHERE hv < keep_rate * $mod32), 0) AS BIGINT) AS id_sum
      FROM k GROUP BY source ORDER BY source""") { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = Tables.load(s, dir, "documents")
      val counts = d.groupBy("source").agg(count(lit(1)).as("n"))
        .withColumn("p",
          col("n").cast("double") * col("n") /
            sum(col("n").cast("double") * col("n")).over(Window.partitionBy()))
        .withColumn("alloc", round(lit(50000) * col("p")))
        .withColumn("keep_rate",
          when(col("alloc") / col("n") > 1.0, 1.0)
            .otherwise(col("alloc") / col("n")))
      val hv = (col("doc_id") * lit(knuth)) % lit(mod32)
      d.join(broadcast(counts), Seq("source"))
        .select(col("source"), col("doc_id"), hv.as("hv"),
          col("n"), col("alloc"), col("keep_rate"))
        .groupBy("source")
        .agg(max("n").cast("long").as("n_docs"),
          max("alloc").cast("long").as("alloc"),
          count(when(col("hv") < col("keep_rate") * lit(mod32), 1)).as("n_kept"),
          coalesce(sum(when(col("hv") < col("keep_rate") * lit(mod32),
            col("doc_id"))), lit(0L)).as("id_sum"))
        .orderBy("source")
    },

    // --- Label-outlier detection via class prototypes -----------------
    // Mislabeled-example mining (confident-learning shape): per label,
    // the element-wise mean embedding is the class prototype; each
    // vector's cosine to its OWN prototype scores label fit, and the 3
    // worst-fitting vectors per label are flagged for review. Prototype
    // build is one narrow shuffle on (label, dim); the corpus joins the
    // tiny prototype table by broadcast. Exactly oracled: the mean and
    // the cosine are the same fold arithmetic in both engines.
    Q.df("q_label_outliers", """
      WITH e AS (SELECT vec_id, label,
              LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) v
            FROM embeddings),
      sup AS (SELECT label, LIST(v ORDER BY vec_id) AS sv
              FROM e WHERE vec_id < 200 GROUP BY label),
      proto AS (SELECT label, LEN(sv) AS ns,
              LIST_REDUCE(sv, (a, b) ->
                LIST_TRANSFORM(LIST_ZIP(a, b), p -> p[1] + p[2])) AS sumv
            FROM sup),
      pv AS (SELECT label, LIST_TRANSFORM(sumv, x -> x / ns) AS pv FROM proto),
      scored AS (SELECT e.vec_id, e.label,
          LIST_REDUCE(LIST_TRANSFORM(LIST_ZIP(e.v, p.pv), pp -> pp[1] * pp[2]), (a,b) -> a+b)
            / (SQRT(LIST_REDUCE(LIST_TRANSFORM(e.v, q -> q*q), (a,b) -> a+b))
               * SQRT(LIST_REDUCE(LIST_TRANSFORM(p.pv, q -> q*q), (a,b) -> a+b))) AS fit
        FROM e JOIN pv p ON e.label = p.label)
      SELECT label, vec_id, ROUND(fit, 6) AS fit FROM (
        SELECT label, vec_id, fit,
          ROW_NUMBER() OVER (PARTITION BY label ORDER BY fit, vec_id) rn
        FROM scored) t
      WHERE rn <= 3
      ORDER BY label, vec_id""") { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("v"))
      // prototype = sequential id-ordered fold over the support set —
      // bit-identical to the oracle's LIST_REDUCE (a shuffled AVG would
      // be last-ulp order-dependent and flip outlier ranks)
      val sup = e.filter(col("vec_id") < 200)
        .groupBy("label")
        .agg(array_sort(collect_list(struct(col("vec_id"), col("v")))).as("ss"))
        .select(col("label"),
          transform(col("ss"), s0 => s0.getField("v")).as("sv"))
      val proto = sup.select(col("label"), size(col("sv")).as("ns"),
          aggregate(
            slice(col("sv"), lit(2), size(col("sv")) - 1),
            element_at(col("sv"), 1),
            (acc, x) => zip_with(acc, x, _ + _)).as("sumv"))
        .select(col("label"),
          transform(col("sumv"), x => x / col("ns")).as("pv"))
      val scored = e.join(broadcast(proto), Seq("label"))
        .withColumn("fit",
          dot(col("v"), col("pv")) / (l2norm(col("v")) * l2norm(col("pv"))))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("label")).orderBy(col("fit"), col("vec_id"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("label"), col("vec_id"), round(col("fit"), 6).as("fit"))
        .orderBy("label", "vec_id")
    },

    // --- Sentence segmentation statistics -----------------------------
    // Sentences = non-blank runs between [.!?]+ terminators; words by
    // whitespace. Per-language aggregate of document/sentence/word volumes
    // with exact integer sums (ratios derived from the sums, rounded).
    // One scan, codegen'd splits, tiny shuffle on lang.
    Q.df("q_text_sentences", """
      WITH t AS (SELECT lang,
          LEN(LIST_FILTER(STRING_SPLIT_REGEX(text, '[.!?]+'),
                          x -> LEN(TRIM(x)) > 0)) AS n_sent,
          LEN(LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'),
                          x -> LEN(x) > 0)) AS n_words
        FROM documents)
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS docs,
        CAST(SUM(n_sent) AS BIGINT) AS sents,
        CAST(SUM(n_words) AS BIGINT) AS words,
        ROUND(CAST(SUM(n_sent) AS DOUBLE) / COUNT(*), 6) AS sents_per_doc,
        ROUND(CAST(SUM(n_words) AS DOUBLE) / NULLIF(SUM(n_sent), 0), 6)
          AS words_per_sent
      FROM t GROUP BY lang ORDER BY lang""") { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val nSent = size(filter(split(col("text"), "[.!?]+"),
        x => length(trim(x)) > 0))
      val nWords = size(filter(split(col("text"), "\\s+"),
        x => length(x) > 0))
      d.select(col("lang"), nSent.as("n_sent"), nWords.as("n_words"))
        .groupBy("lang")
        .agg(count(lit(1)).as("docs"),
          sum("n_sent").as("sents"), sum("n_words").as("words"))
        .select(col("lang"), col("docs"), col("sents"), col("words"),
          round(col("sents").cast("double") / col("docs"), 6).as("sents_per_doc"),
          round(col("words").cast("double") /
            nullif(col("sents"), lit(0)), 6).as("words_per_sent"))
        .orderBy("lang")
    },

    // --- Fixed-weight quality classifier ------------------------------
    // A hand-weighted linear model over cheap text features (stopword
    // ratio, mean word length, symbol and digit density) → sigmoid score →
    // quartile bucket. The features avoid HOF folds: character-class
    // densities come from codegen'd regexp_replace lengths; only the
    // stopword filter walks the word array (one shallow pass per doc).
    // min/max (order-independent) instead of double avgs keeps the oracle
    // exact. At 100 TB: scan-speed projection + tiny (lang, bucket) agg.
    Q.df("q_quality_classifier", """
      WITH f AS (SELECT lang,
          LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\s+'),
                      x -> LEN(x) > 0) AS ws,
          LEN(REGEXP_REPLACE(text, '[^0-9]', '', 'g')) AS n_digit,
          LEN(REGEXP_REPLACE(text, '[A-Za-z0-9 \t\n]', '', 'g')) AS n_sym,
          LEN(REGEXP_REPLACE(text, '\s', '', 'g')) AS n_nonspace,
          GREATEST(LEN(text), 1) AS n_chars
        FROM documents),
      g AS (SELECT lang,
          GREATEST(LEN(ws), 1) AS n_words,
          LEN(LIST_FILTER(ws, w -> LIST_CONTAINS(
            ['the','a','an','of','to','in','and','is','on','for'], w)))
            AS n_stop,
          n_digit, n_sym, n_nonspace, n_chars FROM f),
      sc AS (SELECT lang,
          1.0 / (1.0 + EXP(-(
            20.0 * (CAST(n_stop AS DOUBLE) / n_words)
            - 4.0 * ABS(CAST(n_nonspace AS DOUBLE) / n_words - 4.5)
            - 10.0 * (CAST(n_sym AS DOUBLE) / n_chars)
            - 8.0 * (CAST(n_digit AS DOUBLE) / n_chars)
            - 0.5))) AS score
        FROM g)
      SELECT lang,
        CAST(LEAST(FLOOR(score * 4), 3) AS INT) AS bucket,
        CAST(COUNT(*) AS BIGINT) AS docs,
        ROUND(MIN(score), 6) AS min_score,
        ROUND(MAX(score), 6) AS max_score
      FROM sc GROUP BY lang, bucket ORDER BY lang, bucket""") { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val stops = array(Seq("the", "a", "an", "of", "to", "in", "and",
        "is", "on", "for").map(lit): _*)
      val ws = filter(split(lower(col("text")), "\\s+"), x => length(x) > 0)
      val f = d.select(col("lang"), ws.as("ws"),
        length(regexp_replace(col("text"), "[^0-9]", "")).as("n_digit"),
        length(regexp_replace(col("text"), "[A-Za-z0-9 \t\n]", "")).as("n_sym"),
        length(regexp_replace(col("text"), "\\s", "")).as("n_nonspace"),
        greatest(length(col("text")), lit(1)).as("n_chars"))
      val g = f.select(col("lang"),
        greatest(size(col("ws")), lit(1)).as("n_words"),
        size(filter(col("ws"), w => array_contains(stops, w))).as("n_stop"),
        col("n_digit"), col("n_sym"), col("n_nonspace"), col("n_chars"))
      // weights sized to the corpus feature ranges (stop ratio 0-0.22,
      // |mwl-4.5| 0-0.8) so the sigmoid actually spans all four buckets
      val score = lit(1.0) / (lit(1.0) + exp(-(
        lit(20.0) * (col("n_stop").cast("double") / col("n_words"))
          - lit(4.0) * abs(col("n_nonspace").cast("double") / col("n_words") - lit(4.5))
          - lit(10.0) * (col("n_sym").cast("double") / col("n_chars"))
          - lit(8.0) * (col("n_digit").cast("double") / col("n_chars"))
          - lit(0.5))))
      g.select(col("lang"), score.as("score"))
        .select(col("lang"),
          least(floor(col("score") * 4), lit(3)).cast("int").as("bucket"),
          col("score"))
        .groupBy("lang", "bucket")
        .agg(count(lit(1)).as("docs"),
          round(min("score"), 6).as("min_score"),
          round(max("score"), 6).as("max_score"))
        .orderBy("lang", "bucket")
    },

    // --- Nearest-centroid assignment (k-means step / IVF quantizer) ---
    // Assign every embedding to the max-cosine centroid among 8 fixed
    // centroids (the vectors of vec_id 0..7 — deterministic, no trained
    // state). The centroid table BROADCASTS: the big scan never shuffles;
    // per-vector work is 8 codegen'd dot products (ArrayDotProduct kernel,
    // left-to-right accumulation = DuckDB LIST_REDUCE, so cosines are
    // bit-identical and the argmax is stable). Ties break on centroid id.
    Q.df("q_doc_clusters", """
      WITH e AS (SELECT vec_id,
          LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      c AS (SELECT vec_id AS k, v AS cv FROM e WHERE vec_id < 8),
      j AS (SELECT e.vec_id, c.k,
          LIST_REDUCE(LIST_TRANSFORM(LIST_ZIP(e.v, c.cv),
                                     p -> p[1] * p[2]), (x, y) -> x + y)
          / (SQRT(LIST_REDUCE(LIST_TRANSFORM(e.v, x -> x * x), (a, b) -> a + b))
             * SQRT(LIST_REDUCE(LIST_TRANSFORM(c.cv, x -> x * x), (a, b) -> a + b)))
            AS cos
        FROM e CROSS JOIN c),
      r AS (SELECT vec_id, k, cos,
          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, k ASC) AS rn
        FROM j)
      SELECT k AS cluster, CAST(COUNT(*) AS BIGINT) AS members,
        CAST(SUM(vec_id) AS BIGINT) AS id_sum,
        ROUND(MIN(cos), 6) AS min_cos, ROUND(MAX(cos), 6) AS max_cos
      FROM r WHERE rn = 1 GROUP BY k ORDER BY k""") { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val c = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("k"), col("v").as("cv"))
      val j = e.crossJoin(broadcast(c))
        .select(col("vec_id"), col("k"),
          (dot(col("v"), col("cv")) / (l2norm(col("v")) * l2norm(col("cv"))))
            .as("cos"))
      // argmax via min_by on (-cos, k): hash-aggregates with map-side
      // combine — no per-vector sort shuffle like a row_number window
      // would need. Struct comparison is lexicographic, so ties on cos
      // break toward the lowest centroid id, matching the oracle's
      // ROW_NUMBER ORDER BY cos DESC, k ASC.
      j.groupBy("vec_id")
        .agg(min_by(struct(col("k"), col("cos")),
          struct(negate(col("cos")).as("nc"), col("k"))).as("win"))
        .select(col("vec_id"), col("win.k").as("k"), col("win.cos").as("cos"))
        .groupBy(col("k").as("cluster"))
        .agg(count(lit(1)).as("members"),
          sum("vec_id").as("id_sum"),
          round(min("cos"), 6).as("min_cos"),
          round(max("cos"), 6).as("max_cos"))
        .orderBy("cluster")
    },

    // --- Sequence packing into fixed context windows ------------------
    // Greedy concatenation packing: within each source shard, order
    // documents by a stable hash (deterministic shuffle), run a token
    // cumsum, and assign each document to the 2048-token bin its start
    // offset lands in. Everything is exact integer arithmetic, so the
    // per-source packing summary (bin count, straddle count, per-doc
    // bin-assignment checksum) hash-matches the oracle cell-for-cell.
    // Scale: the window partitions on source (one shard = one stream),
    // so 100 TB packs as N independent sorted streams — no global sort;
    // the global-cumsum variant is the PrefixSum operator.
    Q.df("q_seq_packing", s"""
      WITH t AS (SELECT source, doc_id,
          (doc_id * $knuth) % $mod32 AS hv,
          LEN(LIST_FILTER(STRING_SPLIT_REGEX(text, '\\s+'),
                          x -> LEN(x) > 0)) AS n_tok
        FROM documents),
      c AS (SELECT source, doc_id, n_tok,
          SUM(n_tok) OVER (PARTITION BY source ORDER BY hv, doc_id
                           ROWS UNBOUNDED PRECEDING) AS cum
        FROM t),
      b AS (SELECT source, doc_id, n_tok,
          (cum - n_tok) // 2048 AS bin,
          CASE WHEN n_tok > 0 AND (cum - 1) // 2048 <> (cum - n_tok) // 2048
               THEN 1 ELSE 0 END AS straddles
        FROM c)
      SELECT source,
        CAST(COUNT(*) AS BIGINT) AS docs,
        CAST(SUM(n_tok) AS BIGINT) AS tokens,
        CAST(MAX(bin) + 1 AS BIGINT) AS bins,
        CAST(SUM(straddles) AS BIGINT) AS straddled,
        CAST(SUM(bin * doc_id) AS BIGINT) AS assign_sum
      FROM b GROUP BY source ORDER BY source""") { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = Tables.load(s, dir, "documents")
      val hv = (col("doc_id") * lit(knuth)) % lit(mod32)
      val nTok = size(filter(split(col("text"), "\\s+"), x => length(x) > 0))
        .cast("long")
      val w = Window.partitionBy("source").orderBy("hv", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val c = d.select(col("source"), col("doc_id"), hv.as("hv"),
          nTok.as("n_tok"))
        .withColumn("cum", sum("n_tok").over(w))
      val bin = floor((col("cum") - col("n_tok")) / 2048)
      val straddles = when(col("n_tok") > 0 &&
        floor((col("cum") - 1) / 2048) =!= bin, 1).otherwise(0)
      c.select(col("source"), col("doc_id"), col("n_tok"),
          bin.as("bin"), straddles.as("straddles"))
        .groupBy("source")
        .agg(count(lit(1)).as("docs"), sum("n_tok").as("tokens"),
          (max("bin") + 1).as("bins"), sum("straddles").as("straddled"),
          sum(col("bin") * col("doc_id")).as("assign_sum"))
        .orderBy("source")
    },

    // --- Deterministic train/val/test split --------------------------
    // hash(doc_id) mod 100 → 90/5/5. A pure row function: re-runs, added
    // shards, and different cluster sizes keep every document in the
    // same split (the property that matters for reproducible training
    // corpora). Scan-speed projection + tiny (split, lang) aggregate.
    Q.df("q_data_split", s"""
      WITH h AS (SELECT lang, doc_id,
          ((doc_id * $knuth) % $mod32) % 100 AS pct,
          LEN(LIST_FILTER(STRING_SPLIT_REGEX(text, '\\s+'),
                          x -> LEN(x) > 0)) AS n_tok
        FROM documents),
      s AS (SELECT lang, doc_id, n_tok,
          CASE WHEN pct < 90 THEN 'train'
               WHEN pct < 95 THEN 'valid' ELSE 'test' END AS split
        FROM h)
      SELECT split, lang,
        CAST(COUNT(*) AS BIGINT) AS docs,
        CAST(SUM(n_tok) AS BIGINT) AS tokens,
        CAST(SUM(doc_id) AS BIGINT) AS id_sum
      FROM s GROUP BY split, lang ORDER BY split, lang""") { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val pct = ((col("doc_id") * lit(knuth)) % lit(mod32)) % 100
      val nTok = size(filter(split(col("text"), "\\s+"), x => length(x) > 0))
        .cast("long")
      val splitCol = when(pct < 90, "train").when(pct < 95, "valid")
        .otherwise("test")
      d.select(col("lang"), col("doc_id"), splitCol.as("split"),
          nTok.as("n_tok"))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("docs"), sum("n_tok").as("tokens"),
          sum("doc_id").as("id_sum"))
        .orderBy("split", "lang")
    }
  )
}
