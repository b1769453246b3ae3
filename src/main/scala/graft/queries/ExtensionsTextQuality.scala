package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Tables

/** Text-quality family: stats, language-ID,
  * token counts, fingerprints, repetition/rarity/diversity filters,
  * n-gram LM scoring, tf-idf, collocations, Gopher rules,
  * boilerplate spans, corpus reports.
  *
  * Split out of the single `Extensions` object along its family seams
  * (the object had grown to 5k lines); mixed back into [[Extensions]],
  * whose self-type gives every family access to the shared corpus /
  * persist / sketch-capacity helpers. Members are `lazy val`s so
  * cross-family references in oracle-SQL interpolations can never hit
  * a trait-initialization-order gap.
  */
private[queries] trait ExtensionsTextQuality { this: Extensions.type =>
  // ---------------------------------------------------------------------
  // x07 — text quality stats: token counts, average token length,
  // punctuation and stopword ratios, and a composite quality flag — the
  // standard pre-training filter columns. Pure narrow map.
  lazy val x07 = Q(
    "x07_text_stats",
    (s, dir) => {
      import s.implicits._
      val stop = Seq("the", "a", "of", "and", "to", "in", "is")
      docs(s, dir)
        .withColumn("toks", split(lower($"text"), " "))
        .withColumn("n_tokens", size($"toks"))
        .withColumn("n_distinct_tokens", size(array_distinct($"toks")))
        .withColumn("sum_tok_len",
          aggregate(transform($"toks", t => length(t)), lit(0), (acc, x) => acc + x))
        .withColumn("avg_tok_len_ppm",
          round(lit(1e6) * $"sum_tok_len" / $"n_tokens").cast("long"))
        .withColumn("n_punct", regexp_count($"text", lit("[^a-zA-Z0-9 ]")))
        .withColumn("n_stop",
          size(filter($"toks", t => t.isin(stop: _*))))
        .withColumn("stop_ratio_ppm",
          round(lit(1e6) * $"n_stop" / $"n_tokens").cast("long"))
        .withColumn("quality_ok",
          ($"n_tokens" >= 10 && $"n_tokens" <= 500 &&
           $"stop_ratio_ppm" <= 500000L).cast("int"))
        .select($"doc_id", $"n_tokens", $"n_distinct_tokens", $"avg_tok_len_ppm",
                $"n_punct", $"stop_ratio_ppm", $"quality_ok")
    },
    Some("""
      SELECT doc_id,
        len(toks) AS n_tokens,
        len(list_distinct(toks)) AS n_distinct_tokens,
        CAST(round(1e6 * list_sum(list_transform(toks, t -> len(t))) / len(toks)) AS BIGINT) AS avg_tok_len_ppm,
        len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS n_punct,
        CAST(round(1e6 * len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is'))) / len(toks)) AS BIGINT) AS stop_ratio_ppm,
        CAST(len(toks) >= 10 AND len(toks) <= 500 AND
             round(1e6 * len(list_filter(toks, t -> t IN ('the','a','of','and','to','in','is'))) / len(toks)) <= 500000 AS INT) AS quality_ok
      FROM (SELECT doc_id, text, string_split(lower(text), ' ') AS toks FROM documents)
    """))

  // ---------------------------------------------------------------------
  // x08 — language identification by marker-token voting (the n-gram
  // heuristic in its simplest deterministic form): score each language's
  // marker set against the token set, argmax with a fixed tie order.
  lazy val x08 = Q(
    "x08_langid_heuristic",
    (s, dir) => {
      import s.implicits._
      val profiles = Seq(
        "en" -> Seq("the", "a", "fast", "small"),
        "de" -> Seq("table", "window", "hash", "order"),
        "fr" -> Seq("query", "row", "line", "part"),
        "es" -> Seq("data", "scan", "merge", "filter"))
      val d = docs(s, dir)
        .withColumn("toks", split(lower($"text"), " "))
      val scored = profiles.foldLeft(d) { case (df, (lang, words)) =>
        df.withColumn(s"score_$lang",
          size(filter($"toks", t => t.isin(words: _*))))
      }
      scored
        .withColumn("predicted_lang",
          when($"score_en" >= $"score_de" && $"score_en" >= $"score_fr" && $"score_en" >= $"score_es", "en")
          .when($"score_de" >= $"score_fr" && $"score_de" >= $"score_es", "de")
          .when($"score_fr" >= $"score_es", "fr")
          .otherwise("es"))
        .select($"doc_id", $"lang".as("labeled_lang"), $"predicted_lang",
          $"score_en", $"score_de", $"score_fr", $"score_es")
    },
    Some("""
      SELECT doc_id, lang AS labeled_lang,
        CASE WHEN score_en >= score_de AND score_en >= score_fr AND score_en >= score_es THEN 'en'
             WHEN score_de >= score_fr AND score_de >= score_es THEN 'de'
             WHEN score_fr >= score_es THEN 'fr'
             ELSE 'es' END AS predicted_lang,
        score_en, score_de, score_fr, score_es
      FROM (SELECT doc_id, lang,
              len(list_filter(toks, t -> t IN ('the','a','fast','small'))) AS score_en,
              len(list_filter(toks, t -> t IN ('table','window','hash','order'))) AS score_de,
              len(list_filter(toks, t -> t IN ('query','row','line','part'))) AS score_fr,
              len(list_filter(toks, t -> t IN ('data','scan','merge','filter'))) AS score_es
            FROM (SELECT doc_id, lang, string_split(lower(text), ' ') AS toks FROM documents))
    """))

  // ---------------------------------------------------------------------
  // x09 — token counting with a BPE-ish greedy regex (≤4-char alpha
  // pieces, digits, punctuation as singletons) next to whitespace
  // counts — the cheap proxy for "how many model tokens is this corpus".
  lazy val x09 = Q(
    "x09_token_count",
    (s, dir) => {
      import s.implicits._
      docs(s, dir)
        .select($"doc_id",
          size(split($"text", " ")).as("n_ws_tokens"),
          regexp_count($"text", lit("[a-zA-Z]{1,4}|[0-9]|[^a-zA-Z0-9\\s]")).as("n_bpe_pieces"),
          regexp_count($"text", lit("[a-zA-Z]+")).as("n_words"),
          regexp_count($"text", lit("[0-9]+")).as("n_numbers"))
    },
    Some("""
      SELECT doc_id,
        len(string_split(text, ' ')) AS n_ws_tokens,
        len(regexp_extract_all(text, '[a-zA-Z]{1,4}|[0-9]|[^a-zA-Z0-9\s]')) AS n_bpe_pieces,
        len(regexp_extract_all(text, '[a-zA-Z]+')) AS n_words,
        len(regexp_extract_all(text, '[0-9]+')) AS n_numbers
      FROM documents
    """))

  // ---------------------------------------------------------------------
  // x10 — document fingerprinting via rolling char 5-grams at stride 4
  // (winnowing's density reduction in its cheap deterministic form —
  // hashing every overlapping gram would cost 4× the md5 budget for the
  // same fingerprint quality): all array-lambda work, no explode, no
  // shuffle beyond the final sort.
  lazy val x10 = Q(
    "x10_fingerprint_rolling",
    (s, dir) => {
      import s.implicits._
      docs(s, dir)
        .filter(length($"text") >= 5)
        .withColumn("grams", expr(
          "transform(sequence(1, length(text) - 4, 4), i -> substr(text, i, 5))"))
        .select($"doc_id",
          array_min(transform($"grams", g => md5(g))).as("min_gram_hash"),
          size($"grams").as("n_grams"),
          size(array_distinct($"grams")).as("n_distinct_grams"))
    },
    Some("""
      SELECT doc_id,
        list_min(list_transform(grams, g -> md5(g))) AS min_gram_hash,
        len(grams) AS n_grams,
        len(list_distinct(grams)) AS n_distinct_grams
      FROM (SELECT doc_id,
              list_transform(range(1, len(text) - 3, 4), i -> substr(text, i, 5)) AS grams
            FROM documents
            WHERE len(text) >= 5)
    """))

  // ---------------------------------------------------------------------
  // x15 — document-length histogram via width_bucket: the corpus-shape
  // profile every filtering pipeline reports. One narrow map + one
  // small agg.
  lazy val x15 = Q(
    "x15_length_histogram",
    (s, dir) => {
      import s.implicits._
      docs(s, dir)
        // explicit 50-char buckets (1..12, 13 = overflow) — DuckDB has
        // no width_bucket, so both engines share the arithmetic form
        .withColumn("bucket",
          least(floor(length($"text") / 50) + 1, lit(13)).cast("int"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_docs"),
             min(length($"text")).as("min_len"),
             max(length($"text")).as("max_len"))
        .orderBy($"bucket")
    },
    Some("""
      SELECT CAST(least(floor(len(text) / 50) + 1, 13) AS INT) AS bucket,
        COUNT(*) AS n_docs, MIN(len(text)) AS min_len, MAX(len(text)) AS max_len
      FROM documents
      GROUP BY 1
      ORDER BY bucket
    """))

  // ---------------------------------------------------------------------
  // x26 — repetition filter (the Gopher/MassiveText duplicate-line and
  // repeated-n-gram quality gates [Rae et al., "Scaling Language Models:
  // Methods, Analysis & Insights from Training Gopher", 2021, §A.1.1]):
  // a document whose single most frequent word bigram covers too much of
  // the text is boilerplate/spam-shaped. Per-doc work is a bounded
  // array and stays inside one narrow map (no explode-shuffle — at
  // 100 TB the exploded bigram table would be ~2x the corpus): sort the
  // doc's bigrams, then ONE aggregate() fold tracks the longest equal
  // run — max multiplicity in O(d log d), vs the O(d²)
  // distinct×filter-count form it replaced (the oracle keeps that
  // quadratic form: oracle cost is irrelevant and only values must
  // match, not plans).
  lazy val x26 = Q(
    "x26_repetition_filter",
    (s, dir) => {
      import s.implicits._
      docs(s, dir)
        .select($"doc_id", split(lower($"text"), " ").as("toks"))
        .withColumn("grams", expr(
          "zip_with(slice(toks, 1, greatest(size(toks) - 1, 0)), " +
          "slice(toks, 2, greatest(size(toks) - 1, 0)), " +
          "(x, y) -> concat(x, '_', y))"))
        .filter(size($"grams") > 0)
        .withColumn("top_n", expr(
          "aggregate(array_sort(grams), " +
          "named_struct('prev', cast(null as string), 'run', 0, 'best', 0), " +
          "(acc, x) -> named_struct(" +
          "  'prev', x, " +
          "  'run', if(x <=> acc.prev, acc.run + 1, 1), " +
          "  'best', greatest(acc.best, if(x <=> acc.prev, acc.run + 1, 1))), " +
          "acc -> acc.best)").cast("long"))
        .select($"doc_id", size($"grams").cast("long").as("n_grams"), $"top_n",
          (round(lit(1e6) * $"top_n" / size($"grams"))).cast("long")
            .as("top_gram_ppm"))
    },
    Some("""
      SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
        CAST(top_n AS BIGINT) AS top_n,
        CAST(round(1e6 * top_n / len(grams)) AS BIGINT) AS top_gram_ppm
      FROM (
        SELECT doc_id, grams,
          list_max(list_transform(list_distinct(grams),
            g -> len(list_filter(grams, x -> x = g)))) AS top_n
        FROM (
          SELECT doc_id, list_transform(
            range(1, greatest(len(t), 1)),
            i -> t[i] || '_' || t[i+1]) AS grams
          FROM (SELECT doc_id, string_split(lower(text), ' ') AS t
                FROM documents))
        WHERE len(grams) > 0)
    """))

  // ---------------------------------------------------------------------
  // x30 — rare-bigram ratio (language-model quality filtering in its
  // deterministic integer form): score each doc by the fraction of its
  // char bigrams that are corpus-rare — the gibberish signal a
  // CCNet-style perplexity filter extracts, but with exact counts
  // instead of log-probs (libm log() is not bit-identical across
  // engines, so a true perplexity can't hash-match; frequency
  // thresholds can). The model is DOC frequency over each doc's
  // DISTINCT bigrams. Two plan choices carry the cost (the previous
  // string-array + per-row array_intersect plan was the bench's 27 s
  // outlier): (a) bigrams come from the native [[graft.functions
  // .CharBigrams]] expression — one fused codegen pass emitting
  // deduped packed-long pairs, no per-char/per-bigram String
  // allocation; (b) scoring is ONE left broadcast-join of the
  // exploded gram table against the rare set plus ONE doc_id
  // aggregation — never a per-row array_intersect, whose probe hash
  // set Spark rebuilds per row (O(docs × |rare set|)). The rare set
  // is bounded by the code-point-pair universe (≪ corpus), so the
  // broadcast holds at 100 TB; if a corpus ever blew past it, the
  // same plan degrades gracefully to a keyed equi-join by dropping
  // the hint. Measured 27.1 s → sub-second at sf0.1.
  lazy val x30 = Q(
    "x30_rare_bigram_ratio",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.catalyst.expressions.Alias
      import org.apache.spark.sql.catalyst.plans.logical.Project
      val dg = persisted(s, "x30_grams", dir) {
        // the graded session has no registry entry for char_bigrams
        // (Verify runs a plain session), so plant the expression
        // straight into the logical plan — same bridge x35 uses
        val base = docs(s, dir).select($"doc_id", lower($"text").as("t"))
        val analyzed = base.queryExecution.analyzed
        val tAttr = analyzed.output.find(_.name == "t").get
        val idAttr = analyzed.output.find(_.name == "doc_id").get
        val proj = Project(
          Seq(idAttr, Alias(graft.functions.CharBigrams(tAttr), "dg")()),
          analyzed)
        org.apache.spark.sql.GraftPlanBridge.ofRows(s, proj)
          .filter(size($"dg") > 0)
      }
      val g = dg.select($"doc_id", explode($"dg").as("bg"))
      val rare = g.groupBy($"bg").agg(count(lit(1)).as("n"))
        .filter($"n" < 50)
        .select($"bg", lit(1L).as("is_rare"))
      g.join(broadcast(rare), Seq("bg"), "left")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_distinct"),
          coalesce(sum($"is_rare"), lit(0L)).as("n_rare"))
        .withColumn("rare_ppm",
          round(lit(1e6) * $"n_rare" / $"n_distinct").cast("long"))
    },
    Some("""
      WITH dg AS (
        SELECT doc_id, list_distinct(list_transform(
          range(1, greatest(len(t), 1)),
          i -> substr(t, i, 2))) AS dgs
        FROM (SELECT doc_id, lower(text) AS t FROM documents)
        WHERE len(t) >= 2
      ),
      g AS (SELECT doc_id, unnest(dgs) AS bg FROM dg),
      rare AS (SELECT bg FROM (SELECT bg, COUNT(*) AS n FROM g GROUP BY bg)
               WHERE n < 50),
      hits AS (SELECT doc_id, COUNT(*) AS nr
               FROM g JOIN rare USING (bg) GROUP BY doc_id)
      SELECT d.doc_id, CAST(len(d.dgs) AS BIGINT) AS n_distinct,
        CAST(COALESCE(h.nr, 0) AS BIGINT) AS n_rare,
        CAST(round(1e6 * COALESCE(h.nr, 0) / len(d.dgs)) AS BIGINT) AS rare_ppm
      FROM dg d LEFT JOIN hits h USING (doc_id)
    """))

  // ---------------------------------------------------------------------
  // x35 — character-diversity quality score via the native
  // [[graft.functions.CharStats]] expression: Simpson concentration
  // Σ n_c(n_c−1) / (n(n−1)) over code points — high values mean
  // few-character repetition (the "aaaa…"/separator-spam failure mode
  // x26 catches at token level). The expression is the 100 TB design
  // choice: char-grain explode+groupBy would shuffle a corpus-sized
  // char table for a per-document statistic; CharStats is one fused
  // codegen pass, zero shuffle (the oracle DOES explode — it only has
  // to be right, not fast). Integer-exact ppm: no log/entropy, whose
  // last-ulp rounding differs across engines.
  lazy val x35 = Q(
    "x35_char_diversity",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.catalyst.expressions.Alias
      import org.apache.spark.sql.catalyst.plans.logical.Project
      val base = docs(s, dir).select($"doc_id", lower($"text").as("t"))
      // the graded session has no function registry entry for
      // char_stats (Verify runs a plain session), so plant the
      // expression straight into the logical plan — same bridge the
      // TopKPerKey node uses
      val analyzed = base.queryExecution.analyzed
      val tAttr = analyzed.output.find(_.name == "t").get
      val idAttr = analyzed.output.find(_.name == "doc_id").get
      val proj = Project(
        Seq(idAttr, Alias(graft.functions.CharStats(tAttr), "cs")()), analyzed)
      org.apache.spark.sql.GraftPlanBridge.ofRows(s, proj)
        .select($"doc_id",
          $"cs".getItem(0).as("n_cp"),
          $"cs".getItem(1).as("n_distinct"),
          expr("CASE WHEN cs[0] >= 2 THEN (1000000L * cs[2]) div (cs[0] * (cs[0] - 1)) ELSE 0L END")
            .as("simpson_ppm"))
    },
    Some("""
      WITH b AS (SELECT doc_id, lower(text) AS t FROM documents),
      c AS (
        SELECT doc_id, unnest(list_transform(range(1, len(t) + 1), i -> t[i])) AS ch
        FROM b WHERE len(t) > 0),
      h AS (SELECT doc_id, ch, COUNT(*) AS n FROM c GROUP BY doc_id, ch),
      a AS (SELECT doc_id, SUM(n) AS ncp, COUNT(*) AS nd,
                   SUM(n * (n - 1)) AS simp
            FROM h GROUP BY doc_id)
      SELECT b.doc_id,
        CAST(COALESCE(a.ncp, 0) AS BIGINT) AS n_cp,
        CAST(COALESCE(a.nd, 0) AS BIGINT) AS n_distinct,
        CAST(COALESCE(CASE WHEN a.ncp >= 2
          THEN (1000000 * a.simp) // (a.ncp * (a.ncp - 1)) ELSE 0 END, 0) AS BIGINT)
          AS simpson_ppm
      FROM b LEFT JOIN a USING (doc_id)
    """))

  // ---------------------------------------------------------------------
  // x46 — bigram-LM quality scoring (the CCNet/RedPajama "perplexity
  // filter" shape [Wenzek et al., "CCNet: Extracting high quality
  // monolingual datasets from web crawl data", LREC 2020]: score each
  // document by how predictable its token sequence is under a language
  // model trained on the corpus itself — boilerplate and fluent text
  // score high, gibberish and mis-extracted markup score low). The LM
  // here is the corpus's own bigram table; the score is the mean
  // conditional probability P(w2|w1) = c(w1 w2)/c(w1 ·) over the doc's
  // bigrams, in ppm fixed-point (x40's determinism trick: a real LM's
  // log-prob sum differs in final-ulp across libm builds, so every step
  // is BIGINT multiply + floor-div, bit-identical in Spark `div` and
  // DuckDB `//`; the fixed-point mean is monotone in the same direction
  // as the per-bigram probability mass).
  //
  // Scale shape: the bigram stream is a narrow map (slice + zip_with —
  // no per-row UDF). The bigram count table c2 aggregates it once
  // (keyed shuffle); the prefix table c1 then derives from c2 by a
  // second vocab²-bounded aggregation — NOT a second pass over the
  // corpus-sized stream. Joining the counts back: c1 is vocab-sized
  // and carries an explicit broadcast hint; c2 is observed-bigram-sized
  // (can reach billions of rows on a web corpus), so it gets NO hint —
  // a forced broadcast would bypass the size threshold and OOM at
  // exactly the scale this file designs for; AQE converts the join to
  // a broadcast at runtime whenever c2's actual size allows (it always
  // does at fixture scale). Two corpus-sized shuffles total (c2 build +
  // final per-doc aggregation), everything else vocab-bounded.
  /** Per-doc bigram stream (doc_id, w1, w2), persisted once per
    * (session, dir) — ONE definition shared by the bigram-LM scorer
    * (x46) and the collocation miner (x60), so the two provably
    * tokenize and pair identically regardless of which runs first in
    * a JVM (the persisted cache serves whichever built it). */
  private[queries] def bigramStream(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    persisted(s, "bigrams", dir) {
      docs(s, dir)
        .select($"doc_id", split(lower($"text"), " ").as("toks"))
        .withColumn("n", size($"toks"))
        .filter($"n" >= 2)
        .select($"doc_id",
          explode(zip_with(
            slice($"toks", lit(1), $"n" - lit(1)),
            slice($"toks", lit(2), $"n" - lit(1)),
            (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .select($"doc_id", $"bg.w1".as("w1"), $"bg.w2".as("w2"))
    }
  }

  lazy val x46 = Q(
    "x46_bigram_lm_quality",
    (s, dir) => {
      import s.implicits._
      val bi = bigramStream(s, dir)
      val c2 = bi.groupBy($"w1", $"w2").agg(count(lit(1)).as("c2"))
      val c1 = c2.groupBy($"w1").agg(sum($"c2").as("c1"))
      bi.join(c2, Seq("w1", "w2"))
        .join(broadcast(c1), Seq("w1"))
        .withColumn("p_ppm", expr("(1000000L * c2) div c1"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          expr("sum(p_ppm) div count(1)").as("avg_p_ppm"))
    },
    Some("""
      WITH b AS (
        SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      b2 AS (SELECT doc_id, t, len(t) AS n FROM b WHERE len(t) >= 2),
      p AS (SELECT doc_id, unnest(t[1:n-1]) AS w1, unnest(t[2:n]) AS w2
            FROM b2),
      c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
             FROM p GROUP BY w1, w2),
      c1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM p GROUP BY w1),
      sc AS (SELECT p.doc_id, (1000000 * c2.c2) // c1.c1 AS p_ppm
             FROM p JOIN c2 USING (w1, w2) JOIN c1 USING (w1))
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        CAST(SUM(p_ppm) // COUNT(*) AS BIGINT) AS avg_p_ppm
      FROM sc GROUP BY doc_id
    """))

  // ---------------------------------------------------------------------
  // x50 — corpus report card: one aggregation pass per source combining
  // both native sketch aggregates — QuantileSketch (p50/p90 length) and
  // SpaceSavingTopK (top-3 tokens) — alongside plain counts. The point
  // is composability: TypedImperativeAggregates ride the standard
  // partial/final aggregate path, so N sketches in one groupBy cost ONE
  // shuffle of bounded summaries, where the naive report (a window
  // rank for top tokens + a percentile sort + a distinct count) costs
  // three corpus-sized shuffles. Both sketches run in their exact
  // regimes (token sketch: 31 distinct « 64 capacity at fixture scale;
  // quantile sketch: capacity derived ≥ corpus rows, enforced by
  // exactSketchCapacity), keeping the SQL oracle valid.
  lazy val x50 = Q(
    "x50_corpus_report",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.GraftPlanBridge
      val base = docs(s, dir)
        .select($"source", $"n_chars",
          split(lower($"text"), " ").as("toks"))
      val quant = GraftPlanBridge.col(
        graft.functions.QuantileSketch(
          GraftPlanBridge.expr($"n_chars"), exactSketchCapacity(s, dir),
          Seq(500000L, 900000L))
          .toAggregateExpression())
      val heavy = GraftPlanBridge.col(
        graft.functions.SpaceSavingTopK(GraftPlanBridge.expr($"toks"), 64)
          .toAggregateExpression())
      base.groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          quant.as("qs"), heavy.as("hh"))
        .select($"source", $"n_docs",
          $"qs".getItem(0).as("p50_chars"), $"qs".getItem(1).as("p90_chars"),
          concat_ws(",",
            transform(slice($"hh", 1, 3), h => h.getField("term")))
            .as("top_terms"))
    },
    Some("""
      WITH q AS (
        SELECT source, CAST(n_chars AS BIGINT) AS v,
          row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
          COUNT(*) OVER (PARTITION BY source) AS n
        FROM documents),
      quant AS (
        SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
          MAX(CASE WHEN rn = (500000 * (n-1)) // 1000000 + 1 THEN v END) AS p50_chars,
          MAX(CASE WHEN rn = (900000 * (n-1)) // 1000000 + 1 THEN v END) AS p90_chars
        FROM q GROUP BY source),
      tok AS (
        SELECT source, unnest(string_split(lower(text), ' ')) AS term
        FROM documents),
      tc AS (
        SELECT source, term, COUNT(*) AS cnt FROM tok GROUP BY source, term),
      tr AS (
        SELECT source, term,
          row_number() OVER (PARTITION BY source ORDER BY cnt DESC, term) AS rk
        FROM tc),
      top AS (
        SELECT source, string_agg(term, ',' ORDER BY rk) AS top_terms
        FROM tr WHERE rk <= 3 GROUP BY source)
      SELECT quant.source, n_docs, p50_chars, p90_chars, top_terms
      FROM quant JOIN top ON quant.source = top.source
    """))

  // ---------------------------------------------------------------------
  // x54 — corpus snapshot diff: the incremental-ingestion audit a crawl
  // pipeline runs daily ("what changed between yesterday's snapshot and
  // today's?"). Two snapshot views of the corpus (deterministic doc_id
  // slices standing in for two crawl dates; the old side fingerprints
  // raw text, the new side the normalized form — so "changed" captures
  // exactly the docs the cleaning pass rewrites), full-outer joined on
  // doc_id and classified added / removed / changed / unchanged. At
  // 100 TB this is ONE keyed shuffle of (id, 32-byte fingerprint)
  // pairs — never of document text — and the classification is a
  // narrow map over the join output.
  lazy val x54 = Q(
    "x54_snapshot_diff",
    (s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
      val old = d.filter(pmod($"doc_id", lit(10)) =!= 0)
        .select($"doc_id", $"source".as("source_old"),
          sha2($"text", 256).as("fp_old"))
      val nw = d.filter(pmod($"doc_id", lit(10)) =!= 1)
        .select($"doc_id", $"source".as("source_new"),
          Q.normFingerprint($"text").as("fp_new"))
      // membership is tested on the carried source columns (never null
      // for a present row), NOT on the fingerprints: a NULL-text doc
      // hashes to NULL and would otherwise masquerade as 'added';
      // <=> (null-safe equality) keeps a NULL-text doc present in both
      // snapshots 'unchanged' rather than 'changed'
      old.join(nw, Seq("doc_id"), "full_outer")
        .select(coalesce($"source_old", $"source_new").as("source"),
          when($"source_old".isNull, "added")
            .when($"source_new".isNull, "removed")
            .when($"fp_old" <=> $"fp_new", "unchanged")
            .otherwise("changed").as("status"))
        .groupBy($"source", $"status")
        .agg(count(lit(1)).as("n"))
    },
    Some("""
      WITH old AS (
        SELECT doc_id, source, sha256(text) AS fp
        FROM documents WHERE doc_id % 10 <> 0),
      nw AS (
        SELECT doc_id, source,
          sha256(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
        FROM documents WHERE doc_id % 10 <> 1)
      SELECT COALESCE(old.source, nw.source) AS source,
        CASE WHEN old.source IS NULL THEN 'added'
             WHEN nw.source IS NULL THEN 'removed'
             WHEN old.fp IS NOT DISTINCT FROM nw.fp THEN 'unchanged'
             ELSE 'changed' END AS status,
        COUNT(*) AS n
      FROM old FULL OUTER JOIN nw ON old.doc_id = nw.doc_id
      GROUP BY 1, 2
    """))

  // ---------------------------------------------------------------------
  // x57 — per-document salient terms by tf-idf: the keyword-extraction
  // pass (doc-level topical fingerprints for mixing/retrieval audits).
  // Scoring is exact integer arithmetic — score_ppm = 1e6·tf·N / df
  // floored — so no libm log and no raw doubles reach the output (the
  // log is monotone in N/df, so rational idf preserves tf-idf's
  // ranking within a fixed tf). The top-3-per-doc filter runs on the
  // native TopKPerKey partial/final heap operator (self-registering
  // planned form, so it plans natively in any session): at 100 TB each
  // map task ships ≤3 candidate rows per doc instead of sorting the
  // full doc×term score table. Tie-break (score desc, term asc) is a
  // total order within a doc, so the heap pick is deterministic.
  lazy val x57 = Q(
    "x57_tfidf_topterms",
    (s, dir) => {
      import s.implicits._
      val tok = docs(s, dir)
        .select($"doc_id", explode(split(lower($"text"), " ")).as("t"))
      val tf = tok.groupBy($"doc_id", $"t").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy($"t").agg(count(lit(1)).as("df"))
      val nd = docs(s, dir).agg(countDistinct($"doc_id").as("nd"))
      val scored = tf.join(df, "t").crossJoin(broadcast(nd))
        .select($"doc_id", $"t".as("term"),
          expr("(1000000L * tf * nd) div df").as("score_ppm"))
      graft.ops.TopK.perKeyPlanned(scored, Seq("doc_id"),
        Seq(("score_ppm", false), ("term", true)), 3)
        .select($"doc_id", $"term", $"score_ppm")
    },
    Some("""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
        FROM documents),
      tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
      df AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
      nd AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM documents),
      sc AS (
        SELECT tf.doc_id, tf.t AS term,
          (1000000 * tf.tf * nd.nd) // df.df AS score_ppm
        FROM tf JOIN df USING (t) CROSS JOIN nd),
      rk AS (
        SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY score_ppm DESC, term) AS rn
        FROM sc)
      SELECT doc_id, term, score_ppm FROM rk WHERE rn <= 3
    """))

  // ---------------------------------------------------------------------
  // x60 — collocation mining by integer lift: bigrams occurring far
  // more often than their unigram frequencies predict (lift =
  // P(w1 w2) / (P(w1)·P(w2)) = c_xy·N / (c_x·c_y)) — the multi-word-
  // expression detector a tokenizer-training or phrase-mining pass
  // runs. PMI's log is monotone in lift, so integer lift_ppm ranks
  // identically with zero libm; the min-count gate (c_xy ≥ 5) is the
  // standard variance guard. Reuses x46's persisted bigram stream (one
  // build serves both queries in a bench JVM). All tables after the
  // two token-grain aggregations are vocab-bounded; the top-20 cut is
  // TakeOrderedAndProject (per-partition heaps), never a global sort.
  // 100 TB overflow note: the numerator 1e6·c_xy·N is bounded by
  // 1e6·N² (since c_xy ≤ N) and crosses 2^63 ≈ 9.2e18 at
  // N ≈ 3.0e6 total corpus tokens — beyond that, compute lift in
  // DECIMAL(38,0) or divide N through first; documented here because
  // the fixture regime (≤3e5 tokens) is provably safe by that bound.
  lazy val x60 = Q(
    "x60_collocation_lift",
    (s, dir) => {
      import s.implicits._
      val bi = bigramStream(s, dir)
      val uni = docs(s, dir)
        .select(explode(split(lower($"text"), " ")).as("w"))
        .groupBy($"w").agg(count(lit(1)).as("c"))
      // total token count derives from the vocab-bounded unigram table
      // (x46's c1-from-c2 lesson) — no second corpus-sized scan+explode
      val n = uni.agg(sum($"c").as("n"))
      val c2 = bi.groupBy($"w1", $"w2").agg(count(lit(1)).as("c_xy"))
        .filter($"c_xy" >= 5)
      c2.join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c_x"), "w1")
        .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c_y"), "w2")
        .crossJoin(broadcast(n))
        .withColumn("lift_ppm", expr("(1000000L * c_xy * n) div (c_x * c_y)"))
        .select($"w1", $"w2", $"c_xy", $"lift_ppm")
        .orderBy($"lift_ppm".desc, $"w1", $"w2")
        .limit(20)
    },
    Some("""
      WITH b AS (
        SELECT string_split(lower(text), ' ') AS t FROM documents),
      tok AS (SELECT unnest(t) AS w FROM b),
      uni AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
      n AS (SELECT COUNT(*) AS n FROM tok),
      b2 AS (SELECT t, len(t) AS ln FROM b WHERE len(t) >= 2),
      bg AS (SELECT unnest(t[1:ln-1]) AS w1, unnest(t[2:ln]) AS w2 FROM b2),
      c2 AS (
        SELECT w1, w2, COUNT(*) AS c_xy FROM bg GROUP BY 1, 2
        HAVING COUNT(*) >= 5),
      sc AS (
        SELECT c2.w1, c2.w2, c_xy,
          (1000000 * c_xy * n.n) // (u1.c * u2.c) AS lift_ppm
        FROM c2 JOIN uni u1 ON c2.w1 = u1.w
                JOIN uni u2 ON c2.w2 = u2.w
                CROSS JOIN n)
      SELECT w1, w2, c_xy, lift_ppm FROM sc
      ORDER BY lift_ppm DESC, w1, w2 LIMIT 20
    """))

  // ---------------------------------------------------------------------
  // x62 — token frequency spectrum (frequency-of-frequencies): how many
  // vocabulary types occur exactly k times — the Zipf/hapax audit that
  // sizes vocabularies, tunes min-count cutoffs, and sanity-checks a
  // crawl for synthetic repetition (a spectrum spike at high k is
  // boilerplate; a hapax explosion is OCR noise). Two keyed
  // aggregations, the second over the vocab-bounded count table —
  // corpus text is scanned once and never shuffled.
  lazy val x62 = Q(
    "x62_freq_spectrum",
    (s, dir) => {
      import s.implicits._
      docs(s, dir)
        .select(explode(split(lower($"text"), " ")).as("t"))
        .groupBy($"t").agg(count(lit(1)).as("freq"))
        .groupBy($"freq").agg(count(lit(1)).as("n_tokens"))
    },
    Some("""
      WITH tok AS (
        SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents),
      uni AS (SELECT t, COUNT(*) AS freq FROM tok GROUP BY t)
      SELECT freq, COUNT(*) AS n_tokens FROM uni GROUP BY freq
    """))

  // ---------------------------------------------------------------------
  // x64 — quality × length equi-depth grid: the 2-D histogram behind
  // "are short documents lower quality?" curation decisions — a 5×5
  // quintile grid over (n_chars, mean-token-length) where BOTH axes'
  // boundaries come from ONE aggregation pass carrying two
  // QuantileSketch columns (the x50 two-sketches-one-shuffle shape),
  // broadcast as a single row. Bin assignment is the x56 narrow map on
  // both axes at once; output is ≤25 cells. Mean token length is ppm
  // integer arithmetic (1e6·chars div tokens), so no doubles anywhere.
  lazy val x64 = Q(
    "x64_quality_length_grid",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.GraftPlanBridge
      val base = docs(s, dir)
        .select($"doc_id", $"n_chars",
          size(split(lower($"text"), " ")).cast("long").as("n_toks"))
        .withColumn("mtl_ppm", expr("(1000000L * n_chars) div n_toks"))
      def qs(c: Column) = GraftPlanBridge.col(
        graft.functions.QuantileSketch(GraftPlanBridge.expr(c),
          exactSketchCapacity(s, dir),
          (1L to 4L).map(_ * 200000L)).toAggregateExpression())
      val b = base.agg(qs($"n_chars").as("bl"), qs($"mtl_ppm").as("bq"))
      base.crossJoin(broadcast(b))
        .withColumn("d_len",
          (lit(1) + size(filter($"bl", x => x < $"n_chars"))).cast("long"))
        .withColumn("d_mtl",
          (lit(1) + size(filter($"bq", x => x < $"mtl_ppm"))).cast("long"))
        .groupBy($"d_len", $"d_mtl")
        .agg(count(lit(1)).as("n_docs"))
    },
    Some("""
      WITH m AS (
        SELECT doc_id, CAST(n_chars AS BIGINT) AS len,
          (1000000 * CAST(n_chars AS BIGINT))
            // CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS mtl
        FROM documents),
      ql AS (
        SELECT len AS v, row_number() OVER (ORDER BY len) AS rn,
               COUNT(*) OVER () AS n
        FROM m),
      bl AS (
        SELECT MAX(CASE WHEN rn = (i * 200000 * (n-1)) // 1000000 + 1
                   THEN v END) AS bv
        FROM ql CROSS JOIN (SELECT unnest(range(1, 5)) AS i) g GROUP BY i),
      qq AS (
        SELECT mtl AS v, row_number() OVER (ORDER BY mtl) AS rn,
               COUNT(*) OVER () AS n
        FROM m),
      bq AS (
        SELECT MAX(CASE WHEN rn = (i * 200000 * (n-1)) // 1000000 + 1
                   THEN v END) AS bv
        FROM qq CROSS JOIN (SELECT unnest(range(1, 5)) AS i) g GROUP BY i),
      d AS (
        SELECT m.doc_id,
          1 + (SELECT COUNT(*) FROM bl WHERE bl.bv < m.len) AS d_len,
          1 + (SELECT COUNT(*) FROM bq WHERE bq.bv < m.mtl) AS d_mtl
        FROM m)
      SELECT CAST(d_len AS BIGINT) AS d_len, CAST(d_mtl AS BIGINT) AS d_mtl,
        COUNT(*) AS n_docs
      FROM d GROUP BY 1, 2
    """))

  // ---------------------------------------------------------------------
  // x81 — Gopher-style document quality rules (Rae et al. 2021, app. A1:
  // word-count bounds, mean word length, repetition caps, stopword
  // presence) — the published rule set next to x08's heuristic scoring
  // and x07's ratio features. The WHOLE query is one narrow projection:
  // even the most-frequent-bigram count stays per-row (max run length
  // in the SORTED bigram array — a fold over ≤|doc| elements), so a
  // quality pass over a 100 TB corpus is a zero-shuffle map. The
  // DuckDB oracle deliberately computes that count the other way
  // (unnest → group → max), cross-checking the run-length formulation
  // against an independent one. Every ratio is integer ppm via floor
  // division (identical in both engines); `keep` is the conjunction of
  // the published bounds.
  /** The x81 Gopher-rules report frame — factored out so the curation
    * funnel (x93) reuses the exact filter the standalone query grades
    * (same columns, same integer-ppm thresholds). PERSISTED through
    * the shared cache: the report's fold expressions (the top-bigram
    * run-length scan especially) are pathological to re-evaluate
    * inside downstream filter/count plan shapes (measured 7.5–10 s per
    * re-plan at sf0.1 vs 0.7 s to materialize the report once), so
    * every consumer — x81's own output and each funnel stage that
    * builds on the quality gate — reads the one columnar copy. */
  private[graft] def gopherReport(s: SparkSession, dir: String): DataFrame =
    persisted(s, "x81_gopher_report", dir) { gopherReportBuild(s, dir) }

  private def gopherReportBuild(s: SparkSession, dir: String): DataFrame = {
      import s.implicits._
      val d = docs(s, dir)
        .withColumn("toks", split($"text", " "))
        .filter(size($"toks") >= 3)
        .withColumn("bigrams", expr(graft.ops.TextGrams.WordBigramExpr))
        .withColumn("trigrams", expr(graft.ops.TextGrams.WordTrigramExpr))
      d.select($"doc_id",
        size($"toks").cast("long").as("n_words"),
        expr("aggregate(toks, 0L, (a, t) -> a + length(t))").as("sum_chars"),
        size($"bigrams").cast("long").as("n_bigrams"),
        size($"trigrams").cast("long").as("n_trigrams"),
        (size($"trigrams") - size(array_distinct($"trigrams")))
          .cast("long").as("dup_trigrams"),
        size(filter($"toks", t => t.isin("the", "a", "and", "of", "to")))
          .cast("long").as("stopword_hits"),
        expr("""aggregate(sort_array(bigrams),
            named_struct('cur', 0L, 'best', 0L, 'prev', cast(null as string)),
            (acc, g) -> named_struct(
              'cur', if(g <=> acc.prev, acc.cur + 1L, 1L),
              'best', greatest(acc.best, if(g <=> acc.prev, acc.cur + 1L, 1L)),
              'prev', g),
            acc -> acc.best)""").as("top_bigram_count"))
        .withColumn("mean_word_len_ppm",
          expr("sum_chars * 1000000 div n_words"))
        .withColumn("top_bigram_ppm",
          expr("top_bigram_count * 1000000 div n_bigrams"))
        .withColumn("dup_trigram_ppm",
          expr("dup_trigrams * 1000000 div n_trigrams"))
        .withColumn("keep",
          $"n_words" >= 50L && $"n_words" <= 100000L &&
          $"mean_word_len_ppm" >= 3000000L &&
          $"mean_word_len_ppm" <= 10000000L &&
          $"top_bigram_ppm" <= 200000L &&
          $"dup_trigram_ppm" <= 300000L &&
          $"stopword_hits" >= 2L)
        .select($"doc_id", $"n_words", $"mean_word_len_ppm",
          $"top_bigram_ppm", $"dup_trigram_ppm", $"stopword_hits", $"keep")
  }

  /** x81's full oracle statement (a self-contained WITH…SELECT) —
    * shared verbatim with the x93 funnel, which embeds it as a nested
    * CTE body so the funnel's quality stage provably applies the same
    * rules the standalone report grades. */
  private[queries] lazy val GopherReportSql: String = """
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        WHERE len(string_split(text, ' ')) >= 3
      ),
      g AS (
        SELECT doc_id, toks,
          list_transform(range(2, len(toks) + 1),
            i -> toks[i-1] || ' ' || toks[i]) AS bigrams,
          list_transform(range(3, len(toks) + 1),
            i -> toks[i-2] || ' ' || toks[i-1] || ' ' || toks[i]) AS trigrams
        FROM t
      ),
      base AS (
        SELECT doc_id,
          len(toks)::BIGINT AS n_words,
          list_sum(list_transform(toks, x -> len(x)))::BIGINT AS sum_chars,
          len(bigrams)::BIGINT AS n_bigrams,
          len(trigrams)::BIGINT AS n_trigrams,
          (len(trigrams) - len(list_distinct(trigrams)))::BIGINT AS dup_trigrams,
          len(list_filter(toks, x -> x IN ('the','a','and','of','to')))::BIGINT
            AS stopword_hits
        FROM g
      ),
      top AS (
        SELECT doc_id, max(c)::BIGINT AS top_bigram_count FROM (
          SELECT doc_id, gg, count(*) AS c
          FROM (SELECT doc_id, unnest(bigrams) AS gg FROM g)
          GROUP BY 1, 2)
        GROUP BY 1
      )
      SELECT doc_id, n_words, mean_word_len_ppm, top_bigram_ppm,
        dup_trigram_ppm, stopword_hits,
        (n_words >= 50 AND n_words <= 100000
         AND mean_word_len_ppm >= 3000000 AND mean_word_len_ppm <= 10000000
         AND top_bigram_ppm <= 200000
         AND dup_trigram_ppm <= 300000
         AND stopword_hits >= 2) AS keep
      FROM (
        SELECT b.doc_id, n_words, stopword_hits,
          (sum_chars * 1000000) // n_words AS mean_word_len_ppm,
          (top_bigram_count * 1000000) // n_bigrams AS top_bigram_ppm,
          (dup_trigrams * 1000000) // n_trigrams AS dup_trigram_ppm
        FROM base b JOIN top USING (doc_id))
    """

  lazy val x81 = Q(
    "x81_gopher_quality",
    (s, dir) => gopherReport(s, dir),
    Some(GopherReportSql))

  // ---------------------------------------------------------------------
  // x82 — corpus-level boilerplate span detection (the repeated-span
  // rule of the C4/RefinedWeb lineage, adapted to the fixture's
  // line-free documents): a word 3-gram occurring in >= 3 DISTINCT
  // documents is boilerplate, and every document reports how much of
  // it the shared spans cover. Two-phase distributed shape: candidate
  // dictionary = explode → per-doc distinct → count keyed by the gram
  // (map-side partial aggregation); per-doc tally = occurrences joined
  // against the dictionary ON THE GRAM KEY — both sides shuffle-
  // partitioned by gram, no broadcast assumption on dictionary size
  // (a 100 TB crawl's boilerplate dictionary is heavy-hitter-bounded
  // but not guaranteed driver-small), no all-pairs comparison.
  lazy val x82 = Q(
    "x82_boilerplate_spans",
    (s, dir) => {
      import s.implicits._
      val occ = docs(s, dir)
        .withColumn("toks", split($"text", " "))
        .filter(size($"toks") >= 3)
        .select($"doc_id",
          explode(expr(graft.ops.TextGrams.WordTrigramExpr)).as("g"))
      val dict = occ.distinct()
        .groupBy($"g").agg(count(lit(1)).as("n_docs"))
        .filter($"n_docs" >= 3)
        .select($"g")
      val perDoc = occ.join(dict, "g")
        .groupBy($"doc_id").agg(
          count(lit(1)).as("boiler_occurrences"),
          countDistinct($"g").as("boiler_spans"))
      docs(s, dir)
        .select($"doc_id",
          (size(split($"text", " ")) - 2).cast("long").as("n_grams"))
        .filter($"n_grams" >= 1)
        .join(perDoc, Seq("doc_id"), "left")
        .select($"doc_id", $"n_grams",
          coalesce($"boiler_occurrences", lit(0L)).as("boiler_occurrences"),
          coalesce($"boiler_spans", lit(0L)).as("boiler_spans"))
        .withColumn("boiler_ppm",
          expr("boiler_occurrences * 1000000 div n_grams"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        WHERE len(string_split(text, ' ')) >= 3
      ),
      occ AS (
        SELECT doc_id, unnest(list_transform(range(3, len(toks) + 1),
          i -> toks[i-2] || ' ' || toks[i-1] || ' ' || toks[i])) AS g
        FROM t
      ),
      dict AS (
        SELECT g FROM (
          SELECT g, count(DISTINCT doc_id) AS n_docs FROM occ GROUP BY 1)
        WHERE n_docs >= 3
      ),
      per AS (
        SELECT o.doc_id, count(*)::BIGINT AS boiler_occurrences,
          count(DISTINCT o.g)::BIGINT AS boiler_spans
        FROM occ o JOIN dict d ON o.g = d.g GROUP BY 1
      )
      SELECT t.doc_id, (len(toks) - 2)::BIGINT AS n_grams,
        coalesce(boiler_occurrences, 0)::BIGINT AS boiler_occurrences,
        coalesce(boiler_spans, 0)::BIGINT AS boiler_spans,
        (coalesce(boiler_occurrences, 0) * 1000000) // (len(toks) - 2)
          AS boiler_ppm
      FROM t LEFT JOIN per ON t.doc_id = per.doc_id
    """))

  // ---------------------------------------------------------------------
  // x90 — DSIR data selection: importance resampling over hashed n-gram
  // features [Xie et al., "Data Selection for Language Models via
  // Importance Resampling", NeurIPS 2023]. The pretraining-curation
  // shape: score every raw document by how much its hashed-bigram
  // feature distribution looks like a TARGET domain (here lang='en' —
  // the stand-in for "wiki-quality" in the paper) relative to the raw
  // pool, then keep the top of the importance ranking. The paper's
  // per-feature weight is log p_target(b) − log p_raw(b); a real log's
  // final ulp differs across libm builds, so (as in x46) every step here
  // is exact fixed-point — the per-bucket LINEAR importance ratio with
  // add-one smoothing,
  //     r_ppm(b) = 1e6 · (c_t(b)+1)(N_r+B) ÷ (c_r(b)+1)(N_t+B)
  // in DECIMAL(38,0)/HUGEINT integer arithmetic (bit-identical in Spark
  // `div` and DuckDB `//`; the 38-digit headroom holds to ~1e13 bigrams
  // per side, i.e. past the 100 TB shape), and a document's score is the
  // exact integer MEAN of its bigrams' ratios — monotone in the same
  // direction as the paper's mean log-weight under smoothing.
  //
  // Scale shape: feature extraction is a narrow map (split + zip_with +
  // md5 — no UDF, no shuffle) that is aggregated ONCE into the per-doc
  // sparse feature matrix (doc_id, bucket, cnt) — the object DSIR
  // materializes anyway — and persisted, so the expensive bigram
  // explode + md5 never runs twice (measured 1.7× at the ×10 probe;
  // both consumers read the matrix). The bucket table derives from the
  // matrix and is B-bounded (4096 rows REGARDLESS of corpus size —
  // that is the point of hashed features), so the corpus totals
  // cross-join and the score join are both broadcasts; the only
  // corpus-sized shuffles are the matrix build and the per-doc mean.
  // Selection is top-K by (score, doc_id) → TakeOrderedAndProject (a
  // per-partition heap + driver merge), never a global sort. The
  // paper's Gumbel-noise sampling variant is seeded-hash noise on the
  // same ranking; the graded query keeps the deterministic top-K so
  // the oracle is exact.
  private[queries] val DsirBuckets = 4096L

  /** Per-doc hashed-bigram counts (doc_id, lang, b, cnt) — the sparse
    * feature matrix DSIR materializes; persisted once per
    * (session, dir), shared by the selector (x90) and the apply/serve
    * pass (x92). */
  private[graft] def dsirMatrix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    persisted(s, "dsir_bucket_counts", dir) {
      graft.streaming.DsirGate.bucketCounts(docs(s, dir), DsirBuckets)
    }
  }

  /** The trained "model": per-bucket linear importance ratio in ppm —
    * exactly B = 4096 rows at ANY corpus size. DENSE over the full
    * bucket range: buckets no training bigram hashed to still get a
    * row, carrying the add-one-smoothed default ratio (c_t = c_r = 0),
    * which is what DSIR's smoothing assigns unseen features. That is
    * the serve contract [[graft.streaming.DsirGate.score]] relies on —
    * a served doc whose bigrams hash outside the trained support joins
    * the default instead of silently losing the feature (or, for an
    * all-unseen doc, being mislabeled unscorable). Dense-vs-sparse is
    * invisible to x90/x92's own oracles (the corpus only ever joins
    * buckets it occupies), so the compare stays exact. */
  private[graft] def dsirRatio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val B = DsirBuckets
    val buckets = s.range(B).select($"id".as("b"))
      .join(
        dsirMatrix(s, dir).groupBy($"b").agg(
          sum($"cnt").as("c_r0"),
          sum(when($"lang" === "en", $"cnt").otherwise(0L)).as("c_t0")),
        Seq("b"), "left")
      .select($"b", coalesce($"c_r0", lit(0L)).as("c_r"),
        coalesce($"c_t0", lit(0L)).as("c_t"))
    val totals = buckets.agg(
      sum($"c_r").as("n_r"), sum($"c_t").as("n_t"))
    buckets
      .crossJoin(broadcast(totals)) // 1-row totals frame
      .withColumn("r_ppm", expr(
        s"cast(1000000 as decimal(38,0)) * (c_t + 1) * (n_r + $B) div " +
        s"(cast(c_r + 1 as decimal(38,0)) * (n_t + $B))"))
      .select($"b", $"r_ppm")
  }

  /** The DSIR train chain as oracle CTEs (bg = per-doc bigram bucket
    * instances, ratio = the smoothed per-bucket importance ratio) —
    * shared verbatim by x90, x92 and the x93 funnel, so every oracle
    * retrains the same model the staged artifact serves. The oracle
    * retrains from the observed buckets only; the Spark-side model is
    * DENSE over [0, B), which is invisible here (docs only join
    * buckets they occupy). */
  private[queries] lazy val DsirRatioSqlCtes: String = """t AS (
        SELECT doc_id, lang, string_split(lower(text), ' ') AS toks
        FROM documents),
      t2 AS (SELECT doc_id, lang, toks, len(toks) AS n FROM t WHERE len(toks) >= 2),
      bg AS (
        SELECT doc_id, lang,
          ('0x' || substr(md5(w1 || ' ' || w2), 1, 8))::BIGINT % 4096 AS b
        FROM (SELECT doc_id, lang, unnest(toks[1:n-1]) AS w1,
                     unnest(toks[2:n]) AS w2 FROM t2)),
      buckets AS (
        SELECT b, COUNT(*)::BIGINT AS c_r,
          SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS c_t
        FROM bg GROUP BY b),
      totals AS (SELECT SUM(c_r)::BIGINT AS n_r, SUM(c_t)::BIGINT AS n_t
                 FROM buckets),
      ratio AS (
        SELECT b, CAST((1000000::HUGEINT * (c_t + 1) * (n_r + 4096)) //
          ((c_r + 1)::HUGEINT * (n_t + 4096)) AS BIGINT) AS r_ppm
        FROM buckets, totals)"""

  lazy val x90 = Q(
    "x90_dsir_select",
    (s, dir) => {
      import s.implicits._
      // Σ over bigram INSTANCES of r_ppm ≡ Σ_b cnt·r_ppm — exact
      dsirMatrix(s, dir)
        .join(broadcast(dsirRatio(s, dir)), Seq("b")) // B-bounded by design
        .groupBy($"doc_id", $"lang")
        .agg(sum($"cnt").as("n_bigrams"),
          expr("sum(cnt * r_ppm) div sum(cnt)").as("score_ppm"))
        .orderBy($"score_ppm".desc, $"doc_id".asc)
        .limit(100)
    },
    Some(s"""
      WITH $DsirRatioSqlCtes
      SELECT doc_id, lang, COUNT(*)::BIGINT AS n_bigrams,
        CAST(SUM(r_ppm) // COUNT(*) AS BIGINT) AS score_ppm
      FROM bg JOIN ratio USING (b)
      GROUP BY doc_id, lang
      ORDER BY score_ppm DESC, doc_id ASC
      LIMIT 100
    """))

  // ---------------------------------------------------------------------
  // x92 — DSIR apply/serve: the other half of the train/serve split
  // (x36's relationship to x01, for curation models). x90 trains and
  // selects in one pass; a production pipeline trains ONCE, stages the
  // 4096-row ratio table as a versioned artifact, and every scoring
  // job — batch backfills and the streaming ingest gate
  // ([[graft.streaming.DsirGate]], spec-pinned to produce identical
  // bits per micro-batch) — reads the frozen model and scores against
  // it. This query runs exactly that shape: the ratio table comes from
  // [[graft.ops.Staging]] (built once per dataset version, every later
  // invocation pays one 4096-row parquet scan, never the train), and
  // scoring is DsirGate.score — a broadcast join plus one per-doc
  // mean, so the corpus side never shuffles for the model. Output is
  // EVERY scorable doc with its score and the keep verdict at the
  // ratio≥1 threshold (score_ppm ≥ 1e6 ⇔ "more target-like than the
  // raw pool"), the table a downstream mixer consumes. The oracle
  // retrains from the same corpus — bit-identical by the fixed-point
  // contract, which is itself the proof the staged model serves the
  // same bits the trainer produced.
  lazy val x92 = Q(
    "x92_dsir_apply",
    (s, dir) => {
      import s.implicits._
      val path = graft.ops.Staging.ensure("x90_ratio", dir,
        Seq("documents"))(dsirRatio(s, dir))
      graft.streaming.DsirGate
        .score(docs(s, dir), s.read.parquet(path), DsirBuckets)
        .withColumn("keep",
          when($"score_ppm" >= 1000000L, 1L).otherwise(0L))
    },
    Some(s"""
      WITH $DsirRatioSqlCtes
      SELECT doc_id, lang, COUNT(*)::BIGINT AS n_bigrams,
        CAST(SUM(r_ppm) // COUNT(*) AS BIGINT) AS score_ppm,
        CAST(CASE WHEN SUM(r_ppm) // COUNT(*) >= 1000000
             THEN 1 ELSE 0 END AS BIGINT) AS keep
      FROM bg JOIN ratio USING (b)
      GROUP BY doc_id, lang
    """))

  // ---------------------------------------------------------------------
  // x93 — the curation funnel END-TO-END: raw → Gopher quality gates →
  // exact dedup → near-dup clusters → DSIR selection, with per-stage
  // survivor counts — the one artifact that composes the pillars the
  // engine grades separately (x81, x01's keep-first rule, the
  // x02→x28 staged clusters, x90's importance selection) into the
  // training-data pipeline a corpus team actually ships. Every stage
  // REUSES the existing machinery and its staged/persisted
  // intermediates, so the funnel adds orchestration, not re-derivation:
  //  - quality = gopherReport's keep column (one definition with x81);
  //  - exact   = keep-first by Q.normFingerprint among quality
  //              survivors (x01/x65's rule);
  //  - neardup = drop non-representatives per the staged full-corpus
  //              cluster table (stagedClusters — the same intermediate
  //              x28/x36/x43/x65 read; clusters are a corpus property,
  //              so membership is judged on the full corpus, not
  //              recomputed per funnel stage);
  //  - dsir    = top-100 by (score_ppm desc, doc_id) among survivors,
  //              scored by DsirGate.score against the STAGED x90_ratio
  //              model (the same frozen artifact x92 serves).
  // Scale shape: each stage is the already-graded operator's plan
  // (narrow maps + keyed shuffles + broadcast model joins + a top-K
  // heap); the funnel itself adds only count aggregates and two
  // left-anti/semi joins on doc_id. The oracle composes the SAME
  // shared CTE chains (GopherReportSql nested, NeardupLabelSqlCtes,
  // DsirRatioSqlCtes) — one definition per stage on both sides.
  lazy val x93 = Q(
    "x93_curation_funnel",
    (s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
      // each survivor frame feeds BOTH its stage count and the next
      // stage's input — persist the (tiny, doc_id-only) frames through
      // the shared cache or the expensive upstream (the Gopher report's
      // trigram HOFs especially) re-executes once per consumer
      val quality = persisted(s, "x93_quality", dir) {
        gopherReport(s, dir).filter($"keep").select($"doc_id")
      }
      val k1 = persisted(s, "x93_exact", dir) {
        d.join(quality, Seq("doc_id"))
          .select($"doc_id", Q.normFingerprint($"text").as("fp"))
          .groupBy($"fp").agg(min($"doc_id").as("doc_id"))
          .select($"doc_id")
      }
      val dup = stagedClusters(s, dir)
        .filter($"doc_id" =!= $"cluster_rep").select($"doc_id")
      val k2 = persisted(s, "x93_neardup", dir) {
        k1.join(dup, Seq("doc_id"), "left_anti")
      }
      val ratioPath = graft.ops.Staging.ensure("x90_ratio", dir,
        Seq("documents"))(dsirRatio(s, dir))
      // score the survivors off the SHARED persisted feature matrix
      // (per-doc rows are independent, so matrix ∩ survivors ≡
      // featurizing the survivor docs — DsirGate.score over the raw
      // join would re-run the bigram-explode + md5 scan the matrix
      // already materialized for x90/x92), against the STAGED model
      val selected = dsirMatrix(s, dir)
        .join(k2, Seq("doc_id"))
        .join(broadcast(s.read.parquet(ratioPath)), Seq("b"))
        .groupBy($"doc_id", $"lang")
        .agg(sum($"cnt").as("n_bigrams"),
          expr("sum(cnt * r_ppm) div sum(cnt)").as("score_ppm"))
        .orderBy($"score_ppm".desc, $"doc_id".asc)
        .limit(100)
      def stage(name: String, df: DataFrame) =
        df.agg(count(lit(1)).as("n_docs"))
          .select(lit(name).as("stage"), $"n_docs")
      stage("0_raw", d)
        .unionByName(stage("1_quality", quality))
        .unionByName(stage("2_exact", k1))
        .unionByName(stage("3_neardup", k2))
        .unionByName(stage("4_dsir", selected))
    },
    Some(s"""
      WITH RECURSIVE $NeardupLabelSqlCtes,
      $DsirRatioSqlCtes,
      rep AS ($GopherReportSql),
      gkeep AS (SELECT doc_id FROM rep WHERE keep),
      k1 AS (
        SELECT MIN(doc_id) AS doc_id FROM (
          SELECT doc_id,
            sha256(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
          FROM documents
          WHERE doc_id IN (SELECT doc_id FROM gkeep))
        GROUP BY fp),
      dup AS (SELECT doc_id FROM lab WHERE doc_id <> cluster_rep),
      k2 AS (
        SELECT doc_id FROM k1
        WHERE doc_id NOT IN (SELECT doc_id FROM dup)),
      scorable AS (
        SELECT DISTINCT doc_id FROM bg
        WHERE doc_id IN (SELECT doc_id FROM k2))
      SELECT '0_raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents
      UNION ALL
      SELECT '1_quality', CAST(COUNT(*) AS BIGINT) FROM gkeep
      UNION ALL
      SELECT '2_exact', CAST(COUNT(*) AS BIGINT) FROM k1
      UNION ALL
      SELECT '3_neardup', CAST(COUNT(*) AS BIGINT) FROM k2
      UNION ALL
      SELECT '4_dsir', CAST(LEAST(100, COUNT(*)) AS BIGINT) FROM scorable
    """))
}
