package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Tables

/** Vocabulary / tokenization / curation family:
  * corpus vocab and coverage, PII redaction, decontamination,
  * curation, chunking, BM25, taxonomy tagging, UniMax budgeting,
  * BPE train/tokenize/apply.
  *
  * Split out of the single `Extensions` object along its family seams
  * (the object had grown to 5k lines); mixed back into [[Extensions]],
  * whose self-type gives every family access to the shared corpus /
  * persist / sketch-capacity helpers. Members are `lazy val`s so
  * cross-family references in oracle-SQL interpolations can never hit
  * a trait-initialization-order gap.
  */
private[queries] trait ExtensionsTextVocab { this: Extensions.type =>
  // ---------------------------------------------------------------------
  // x16 — corpus vocabulary stats: global type/token ratio and
  // per-source vocabulary — the "is this slice diverse enough" check.
  // Token explode shuffles once on the token for the distinct.
  lazy val x16 = Q(
    "x16_corpus_vocab",
    (s, dir) => {
      import s.implicits._
      docs(s, dir)
        .select($"source", explode(split(lower($"text"), " ")).as("tok"))
        .filter(length($"tok") > 0)
        .groupBy($"source")
        .agg(count(lit(1)).as("n_tokens"),
             countDistinct($"tok").as("n_types"),
             round(lit(1e6) * countDistinct($"tok") / count(lit(1)))
               .cast("long").as("type_token_ppm"))
        .orderBy($"source")
    },
    Some("""
      SELECT source, COUNT(*) AS n_tokens, COUNT(DISTINCT tok) AS n_types,
        CAST(round(1e6 * COUNT(DISTINCT tok) / COUNT(*)) AS BIGINT) AS type_token_ppm
      FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS tok FROM documents)
      WHERE len(tok) > 0
      GROUP BY source
      ORDER BY source
    """))

  // ---------------------------------------------------------------------
  // x22 — PII redaction: regex scrub of emails and phone-shaped digit
  // runs before a corpus ships to training. Narrow map, codegen'd
  // regexp_replace — linear scan at 100 TB. The fixture text carries no
  // PII, so a deterministic contact line is appended per doc first;
  // the patterns stay in the RE2-compatible subset so Spark (java.util
  // .regex) and DuckDB (RE2) agree byte-for-byte.
  lazy val x22 = Q(
    "x22_pii_redact",
    (s, dir) => {
      import s.implicits._
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "\\+[0-9][0-9-]{6,}[0-9]"
      docs(s, dir)
        .withColumn("raw", concat($"text",
          lit(" contact user"), $"doc_id", lit("@mail.example +1-202-555-0"),
          pmod($"doc_id", lit(100)), lit(" now")))
        .select($"doc_id",
          regexp_replace(regexp_replace($"raw", email, "[EMAIL]"),
            phone, "[PHONE]").as("clean"),
          regexp_count($"raw", lit(email)).as("n_emails"),
          regexp_count($"raw", lit(phone)).as("n_phones"))
    },
    Some("""
      SELECT doc_id,
        regexp_replace(regexp_replace(raw,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
          '\+[0-9][0-9-]{6,}[0-9]', '[PHONE]', 'g') AS clean,
        len(regexp_extract_all(raw,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        len(regexp_extract_all(raw, '\+[0-9][0-9-]{6,}[0-9]')) AS n_phones
      FROM (SELECT doc_id,
              text || ' contact user' || doc_id || '@mail.example +1-202-555-0'
                   || (doc_id % 100) || ' now' AS raw
            FROM documents)
    """))

  // ---------------------------------------------------------------------
  // x23 — benchmark decontamination: flag training documents sharing any
  // token n-gram with a held-out benchmark set (here 3-grams and the
  // doc_id % 97 slice stand in for the 13-grams and the eval suite of a
  // production pipeline). The benchmark's distinct shingle set is tiny
  // by construction, so the containment probe is a BROADCAST semi-join
  // against the exploded corpus shingles — the corpus never shuffles,
  // which is what makes decontamination affordable at 100 TB.
  lazy val x23 = Q(
    "x23_decontam_overlap",
    (s, dir) => {
      import s.implicits._
      val sh = docs(s, dir)
        .select($"doc_id", split(lower($"text"), " ").as("toks"))
        .select($"doc_id", explode(array_distinct(expr(TrigramExpr))).as("sh"))
      val bench = sh.filter(pmod($"doc_id", lit(97)) === 0)
        .select($"sh").distinct()
      sh.filter(pmod($"doc_id", lit(97)) =!= 0)
        .join(broadcast(bench), "sh")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_hits"))
    },
    Some(s"""
      WITH sh AS (
        SELECT doc_id, unnest($TrigramSql) AS sh
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents)
      ),
      bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0)
      SELECT s.doc_id, COUNT(*) AS n_hits
      FROM sh s JOIN bench b ON s.sh = b.sh
      WHERE s.doc_id % 97 <> 0
      GROUP BY s.doc_id
    """))

  // ---------------------------------------------------------------------
  // x25 — end-to-end corpus curation: the composition a training-data
  // pipeline actually ships — language allowlist + length/token quality
  // gates (narrow pushed-down filters FIRST, so the expensive hash only
  // runs on survivors) + exact dedup keep-first (x01's fingerprint, one
  // keyed shuffle). The filters prune before the shuffle, which is the
  // order that matters at 100 TB: dedup bandwidth scales with the
  // POST-filter corpus.
  lazy val x25 = Q(
    "x25_corpus_curation",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"fingerprint").orderBy($"doc_id")
      docs(s, dir)
        .filter($"lang".isin("en", "de", "fr") &&
                $"n_chars".between(100, 500))
        .withColumn("n_toks", size(split($"text", " ")).cast("long"))
        .filter($"n_toks" >= 20)
        .withColumn("fingerprint", Q.normFingerprint($"text"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"doc_id", $"lang", $"n_toks")
    },
    Some("""
      SELECT doc_id, lang, n_toks
      FROM (SELECT doc_id, lang, n_toks,
              ROW_NUMBER() OVER (
                PARTITION BY sha256(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))
                ORDER BY doc_id) AS rn
            FROM (SELECT *, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
                  FROM documents
                  WHERE lang IN ('en', 'de', 'fr')
                    AND n_chars BETWEEN 100 AND 500)
            WHERE n_toks >= 20)
      WHERE rn = 1
    """))

  // ---------------------------------------------------------------------
  // x34 — cross-source contamination matrix: pairwise shared-trigram
  // counts and Jaccard between sources — the corpus-level complement of
  // x23's per-document decontamination (which sources leak into which).
  // Source-grain distinct trigrams first (one keyed shuffle collapses
  // the fact table to |sources|·|vocab³| rows), then an equi-self-join
  // on the trigram; per-gram fan-out is bounded by |sources|², so the
  // join is Σ|sources-per-gram|², never corpus-quadratic. Jaccard is
  // exact integer arithmetic (ppm), no doubles in the hash-compare.
  lazy val x34 = Q(
    "x34_cross_source_overlap",
    (s, dir) => {
      import s.implicits._
      // grams join/aggregate as 60-bit ints, not strings — same key
      // derivation in the oracle, so collisions (vanishingly rare at
      // 60 bits) would be shared, not a mismatch. Persisted: g feeds
      // both self-join sides and the per-source counts — three
      // consumers of the tokenize+md5+explode+distinct pipeline.
      val g = persisted(s, "x34_grams", dir) {
        import org.apache.spark.sql.GraftPlanBridge
        docs(s, dir)
          .select($"source", split(lower($"text"), " ").as("toks"))
          // native fused shingle→md5-60bit (functions/MinHashSig.scala);
          // legacy hashed-then-distinct vs native distinct-then-hashed
          // collapse to the same gram SET under the explode+distinct
          .select($"source", explode(GraftPlanBridge.col(
            graft.functions.ShingleHashes(GraftPlanBridge.expr($"toks"))))
            .as("gram"))
          .distinct()
      }
      val counts = g.groupBy($"source").agg(count(lit(1)).as("n"))
      g.as("a").join(g.as("b"),
          $"a.gram" === $"b.gram" && $"a.source" < $"b.source")
        .groupBy($"a.source".as("src_a"), $"b.source".as("src_b"))
        .agg(count(lit(1)).as("n_shared"))
        .join(counts.select($"source".as("src_a"), $"n".as("na")), "src_a")
        .join(counts.select($"source".as("src_b"), $"n".as("nb")), "src_b")
        .select($"src_a", $"src_b", $"n_shared",
          expr("1000000L * n_shared div (na + nb - n_shared)").as("jaccard_ppm"))
    },
    Some(s"""
      WITH b AS (
        SELECT source, string_split(lower(text), ' ') AS t FROM documents),
      g AS (
        SELECT DISTINCT source, unnest(list_transform($TrigramSql,
          g -> ('0x' || substr(md5(g), 1, 15))::BIGINT)) AS gram
        FROM b WHERE len(t) >= 3),
      c AS (SELECT source, COUNT(*) AS n FROM g GROUP BY source)
      SELECT a.source AS src_a, b2.source AS src_b,
        CAST(COUNT(*) AS BIGINT) AS n_shared,
        CAST((1000000 * COUNT(*)) // (ca.n + cb.n - COUNT(*)) AS BIGINT) AS jaccard_ppm
      FROM g a
      JOIN g b2 ON a.gram = b2.gram AND a.source < b2.source
      JOIN c ca ON ca.source = a.source
      JOIN c cb ON cb.source = b2.source
      GROUP BY a.source, b2.source, ca.n, cb.n
    """))

  // ---------------------------------------------------------------------
  // x40 — BM25 keyword retrieval [Robertson & Zaragoza, "The
  // Probabilistic Relevance Framework: BM25 and Beyond", 2009]: score
  // the corpus against a fixed query-term set and return the top 20
  // docs. The 100 TB plan is the inverted-index probe: postings are
  // FILTERED to the query terms immediately after the explode (a narrow
  // map — nothing shuffles but matching postings, |terms|·df rows, not
  // the corpus), df and the corpus-wide (N, Σdl) aggregates broadcast,
  // and the final top-k is orderBy+limit → TakeOrderedAndProject (heap
  // per partition, no global sort).
  //
  // Determinism: the classical formula's log() differs in final-ulp
  // across libm implementations, which the driver's exact hash-compare
  // cannot tolerate, so scoring uses the RATIONAL idf
  // (N - df + ½)/(df + ½) and fixed-point ppm integer arithmetic
  // end-to-end (every step BIGINT multiply + floor-div, bit-identical
  // in Spark `div` and DuckDB `//`). Monotone in the same direction as
  // log-idf per term; documented variant, not a float approximation.
  lazy val x40 = {
    val terms = Seq("spark", "vector", "merge")
    val K1 = 1200000L // k1 = 1.2 in ppm
    val Bp = 750000L  // b = 0.75 in ppm
    val termsSql = terms.map(t => s"'$t'").mkString(", ")
    Q(
      "x40_bm25_retrieval",
      (s, dir) => {
        import s.implicits._
        val base = docs(s, dir)
          .select($"doc_id", split(lower($"text"), " ").as("toks"))
          .withColumn("dl", size($"toks").cast("long"))
          .filter($"dl" > 0)
        val tf = base
          .select($"doc_id", $"dl", explode($"toks").as("term"))
          .filter($"term".isin(terms: _*)) // postings pruned pre-shuffle
          .groupBy($"doc_id", $"dl", $"term").agg(count(lit(1)).as("tf"))
        // corpus stats: one-row aggregate, broadcast (q34's scalar
        // subquery pattern — not a cartesian blowup)
        val g = base.agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl"))
        val dfreq = tf.groupBy($"term").agg(count(lit(1)).as("df"))
        tf.join(broadcast(dfreq), "term")
          .crossJoin(broadcast(g))
          .withColumn("ratio_ppm", expr("(1000000L * dl * n_docs) div sum_dl"))
          .withColumn("norm_ppm",
            expr(s"1000000L - $Bp + ($Bp * ratio_ppm) div 1000000"))
          .withColumn("denom_ppm",
            expr(s"1000000L * tf + ($K1 * norm_ppm) div 1000000"))
          .withColumn("tfpart_ppm",
            expr(s"(1000000L * tf * ${1000000L + K1}) div denom_ppm"))
          .withColumn("idf_ppm",
            expr("(1000000L * (2 * n_docs - 2 * df + 1)) div (2 * df + 1)"))
          .withColumn("score_ppm", expr("(idf_ppm * tfpart_ppm) div 1000000"))
          .groupBy($"doc_id").agg(sum($"score_ppm").as("bm25_ppm"))
          .orderBy($"bm25_ppm".desc, $"doc_id")
          .limit(20)
      },
      Some(s"""
        WITH b AS (
          SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        b2 AS (
          SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl
          FROM b WHERE len(toks) > 0),
        post AS (SELECT doc_id, dl, unnest(toks) AS term FROM b2),
        tf AS (
          SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
          FROM post WHERE term IN ($termsSql)
          GROUP BY doc_id, dl, term),
        g AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(dl) AS BIGINT) AS sum_dl FROM b2),
        d AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
        sc AS (
          SELECT tf.doc_id,
            (((1000000 * (2 * g.n_docs - 2 * d.df + 1)) // (2 * d.df + 1))
             * ((1000000 * tf.tf * ${1000000L + K1}) //
                (1000000 * tf.tf +
                 ($K1 * (1000000 - $Bp +
                   ($Bp * ((1000000 * tf.dl * g.n_docs) // g.sum_dl)) // 1000000)) // 1000000)))
            // 1000000 AS score_ppm
          FROM tf JOIN d ON tf.term = d.term CROSS JOIN g)
        SELECT doc_id, CAST(SUM(score_ppm) AS BIGINT) AS bm25_ppm
        FROM sc GROUP BY doc_id
        ORDER BY bm25_ppm DESC, doc_id LIMIT 20
      """))
  }

  // ---------------------------------------------------------------------
  // x41 — config-compiled taxonomy tagging: a priority-ordered rule
  // table (first rule whose terms ALL appear as tokens wins) compiled
  // into a single when-chain — the same config-driven routing idea as
  // the reference's TableProcess dims (`app/dim/DimApp.java:60-80`),
  // but compiled to a codegen'd expression instead of interpreted per
  // row. Zero joins, zero shuffles: rules are control-plane config, so
  // the classifier is a pure narrow map over the corpus; at 100 TB this
  // is a single pass fused into whatever scan feeds it. The oracle SQL
  // builds its CASE chain from the SAME rule Seq, so Spark and DuckDB
  // cannot drift.
  private[queries] lazy val TaxonomyRules: Seq[(String, Seq[String])] = Seq(
    "streaming"   -> Seq("stream", "window"),
    "join_engine" -> Seq("join", "hash"),
    "vectors"     -> Seq("vector"),
    "aggregation" -> Seq("agg", "group"))
  lazy val x41 = Q(
    "x41_taxonomy_tagging",
    (s, dir) => {
      import s.implicits._
      val toks = split(lower($"text"), " ")
      val cat = TaxonomyRules.foldRight(lit("other"): Column) {
        case ((name, ts), els) =>
          when(ts.map(t => array_contains(toks, t)).reduce(_ && _), lit(name))
            .otherwise(els)
      }
      docs(s, dir).select($"doc_id", $"source", cat.as("category"))
    },
    Some {
      val whens = TaxonomyRules.map { case (name, ts) =>
        val cond = ts
          .map(t => s"list_contains(string_split(lower(text), ' '), '$t')")
          .mkString(" AND ")
        s"WHEN $cond THEN '$name'"
      }.mkString(" ")
      s"""
        SELECT doc_id, source,
          CASE $whens ELSE 'other' END AS category
        FROM documents
      """
    })

  // ---------------------------------------------------------------------
  // x42 — sliding-window document chunking (the RAG/context-prep pass:
  // fixed-size token windows with overlap). C = 16 tokens per chunk,
  // stride S = 12 (4-token overlap); chunk count = 1 + ⌈max(n−C,0)/S⌉
  // so every token is covered and the tail chunk may run short. A pure
  // per-doc map (sequence → transform → explode) — no shuffle at all;
  // at 100 TB chunking fuses into the scan and the output is
  // ~n/S × corpus rows, each carrying a 60-bit content key (md5-derived,
  // identical in DuckDB) instead of duplicated text.
  lazy val x42 = {
    val C = 16
    val S = 12
    Q(
      "x42_doc_chunking",
      (s, dir) => {
        import s.implicits._
        docs(s, dir)
          .select($"doc_id", split(lower($"text"), " ").as("toks"))
          .withColumn("n", size($"toks").cast("long"))
          .filter($"n" >= 1)
          .withColumn("nch",
            expr(s"1L + (greatest(n - $C, 0L) + ${S - 1}) div $S"))
          .select($"doc_id", $"n", explode(expr(
            s"""transform(sequence(cast(0 as bigint), nch - 1), i ->
                named_struct(
                  'idx', i,
                  'start', 1L + i * $S,
                  'key', cast(conv(substring(md5(
                    concat_ws(' ', slice(toks, cast(1 + i * $S as int), $C))), 1, 15), 16, 10) as bigint)))"""))
            .as("c"))
          .select($"doc_id",
            $"c.idx".as("chunk_idx"),
            $"c.start".as("start_tok"),
            least(lit(C.toLong), $"n" - $"c.start" + 1L).as("chunk_len"),
            $"c.key".as("chunk_key"))
      },
      Some(s"""
        WITH b AS (
          SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        b2 AS (
          SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n
          FROM b WHERE len(toks) >= 1),
        ch AS (
          SELECT doc_id, n, toks,
            unnest(range(0, 1 + (greatest(n - $C, 0) + ${S - 1}) // $S)) AS i
          FROM b2)
        SELECT doc_id,
          CAST(i AS BIGINT) AS chunk_idx,
          CAST(1 + i * $S AS BIGINT) AS start_tok,
          CAST(least($C, n - (1 + i * $S) + 1) AS BIGINT) AS chunk_len,
          ('0x' || substr(md5(array_to_string(
            toks[(1 + i * $S):(least(n, i * $S + $C))], ' ')), 1, 15))::BIGINT AS chunk_key
        FROM ch
      """))
  }

  // ---------------------------------------------------------------------
  // x51 — vocab-id tokenization with OOV bucketing (the "apply the
  // tokenizer" stage): assign ids 1..16 to the corpus's top tokens by
  // frequency (rank order, term tie-break — the deterministic analogue
  // of a trained vocab), map every token to its id or 0 for
  // out-of-vocabulary, and emit each doc's id sequence as a
  // fingerprint plus OOV telemetry. Fully declarative — the vocab is a
  // 16-row aggregate that BROADCASTS (16, not 32: the fixture corpus
  // has 31 distinct tokens, and a vocab covering all of them would
  // leave the OOV branch forever untested); no driver-side collect, no map
  // literal. Order restoration after the explode is the q24/x49
  // pattern: posexplode carries the position, sort_array over
  // (pos, id) structs rebuilds the sequence deterministically. Two
  // corpus-sized keyed shuffles (vocab count + per-doc reassembly);
  // the probe join is broadcast.
  lazy val x51 = Q(
    "x51_vocab_tokenize",
    (s, dir) => {
      import s.implicits._
      val tok = docs(s, dir)
        .select($"doc_id", posexplode(split(lower($"text"), " ")).as(Seq("pos", "t")))
      // top-16 via orderBy+limit → TakeOrderedAndProject (bounded heap
      // per partition), NOT a global rank window over the whole
      // vocabulary; the id-assigning window then runs over 16 rows
      val vocab = tok.groupBy($"t").agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"t").limit(16)
        .select($"t", row_number().over(
          Window.orderBy($"cnt".desc, $"t")).as("id"))
      tok.join(broadcast(vocab), Seq("t"), "left")
        .withColumn("id", coalesce($"id", lit(0)).cast("long"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when($"id" === 0L, 1L).otherwise(0L)).as("n_oov"),
          md5(concat_ws(",", transform(
            sort_array(collect_list(struct($"pos", $"id"))),
            e => e.getField("id")))).as("ids_fp"))
    },
    Some("""
      WITH b AS (
        SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
      tok AS (
        SELECT doc_id,
          unnest(range(1, len(toks) + 1)) AS pos, unnest(toks) AS t
        FROM b),
      vocab AS (
        SELECT t, id FROM (
          SELECT t, row_number() OVER (ORDER BY COUNT(*) DESC, t) AS id
          FROM tok GROUP BY t)
        WHERE id <= 16),
      m AS (
        SELECT tok.doc_id, tok.pos,
          CAST(COALESCE(vocab.id, 0) AS BIGINT) AS id
        FROM tok LEFT JOIN vocab ON tok.t = vocab.t)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        CAST(SUM(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        md5(string_agg(CAST(id AS VARCHAR), ',' ORDER BY pos)) AS ids_fp
      FROM m GROUP BY doc_id
    """))

  // ---------------------------------------------------------------------
  // x63 — source vocabulary overlap matrix: pairwise Jaccard of the
  // per-source vocabularies — the corpus-diversity audit behind mixing
  // decisions (two sources with ~identical vocabularies are redundant;
  // a source with near-zero overlap is a different register or a
  // different language). Candidate generation is the engine's standard
  // bucketed shape: the self-join is keyed on the TOKEN (each token
  // contributes only its own source pairs, ≤ (#sources choose 2)),
  // never a crossJoin of corpora; vocab sizes broadcast back. At
  // 100 TB the (source, token) distinct table is the only corpus-sized
  // intermediate and it shuffles once.
  lazy val x63 = Q(
    "x63_vocab_overlap",
    (s, dir) => {
      import s.implicits._
      val st = persisted(s, "x63_src_vocab", dir) {
        docs(s, dir)
          .select($"source", explode(split(lower($"text"), " ")).as("t"))
          .distinct()
      }
      val vs = st.groupBy($"source").agg(count(lit(1)).as("nv"))
      val pairs = st.as("a").join(st.as("b"),
          $"a.t" === $"b.t" && $"a.source" < $"b.source")
        .groupBy($"a.source".as("src_a"), $"b.source".as("src_b"))
        .agg(count(lit(1)).as("inter"))
      pairs
        .join(broadcast(vs.select($"source".as("src_a"), $"nv".as("nva"))),
          "src_a")
        .join(broadcast(vs.select($"source".as("src_b"), $"nv".as("nvb"))),
          "src_b")
        .withColumn("jaccard_ppm",
          expr("(1000000L * inter) div (nva + nvb - inter)"))
        .select($"src_a", $"src_b", $"inter", $"jaccard_ppm")
    },
    Some("""
      WITH st AS (
        SELECT DISTINCT source,
          unnest(string_split(lower(text), ' ')) AS t
        FROM documents),
      vs AS (SELECT source, COUNT(*) AS nv FROM st GROUP BY source),
      pairs AS (
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(COUNT(*) AS BIGINT) AS inter
        FROM st a JOIN st b ON a.t = b.t AND a.source < b.source
        GROUP BY 1, 2)
      SELECT src_a, src_b, inter,
        (1000000 * inter) // (va.nv + vb.nv - inter) AS jaccard_ppm
      FROM pairs
      JOIN vs va ON pairs.src_a = va.source
      JOIN vs vb ON pairs.src_b = vb.source
    """))

  // ---------------------------------------------------------------------
  // x66 — BPE merge-candidate counting: the inner step of byte-pair-
  // encoding tokenizer training — count adjacent character pairs across
  // the corpus and surface the top merge candidates. The 100 TB shape:
  // aggregate the token stream down to the DISTINCT-WORD table first
  // (Heap's law: vocabulary grows ~sqrt of corpus), then explode char
  // pairs only over distinct words weighted by their corpus frequency —
  // the explode input is orders of magnitude smaller than the token
  // stream, which is exactly how production BPE trainers batch the
  // pair-count step. Total order on (n DESC, pair ASC) via
  // TakeOrderedAndProject, so the top-30 cut is deterministic.
  lazy val x66 = Q(
    "x66_bpe_merge_pairs",
    (s, dir) => {
      import s.implicits._
      val words = docs(s, dir)
        .select(explode(split(lower($"text"), " ")).as("w"))
        .filter(length($"w") >= 2)
        .groupBy($"w").agg(count(lit(1)).as("wc"))
      words
        .select($"w", $"wc",
          explode(sequence(lit(1), length($"w") - 1)).as("i"))
        .select(expr("substring(w, i, 2)").as("pair"), $"wc")
        .groupBy($"pair").agg(sum($"wc").as("n"))
        .orderBy($"n".desc, $"pair".asc)
        .limit(30)
    },
    Some("""
      WITH words AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS wc
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS w
              FROM documents)
        WHERE len(w) >= 2
        GROUP BY w),
      p AS (
        SELECT substr(w, CAST(i AS INT), 2) AS pair, wc
        FROM (SELECT w, wc, unnest(range(1, len(w))) AS i FROM words))
      SELECT pair, CAST(SUM(wc) AS BIGINT) AS n
      FROM p GROUP BY pair
      ORDER BY n DESC, pair LIMIT 30
    """))

  // ---------------------------------------------------------------------
  // x68 — vocabulary coverage: per source, the number of distinct
  // tokens whose cumulative frequency covers >= 90 % of all token
  // occurrences — the statistic that sizes a tokenizer vocabulary (or
  // flags a source whose long tail is all noise). The running sum
  // windows over the per-source VOCABULARY (sublinear in corpus size),
  // never the token stream, and the 90 % test is integer cross-
  // multiplication (cum*10 >= total*9) — no division, no doubles.
  // Tie-break (count DESC, token ASC) makes rank and cumsum total
  // orders on both engines.
  lazy val x68 = Q(
    "x68_vocab_coverage",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val tok = docs(s, dir)
        .select($"source", explode(split(lower($"text"), " ")).as("w"))
        .filter($"w" =!= "")
        .groupBy($"source", $"w").agg(count(lit(1)).as("c"))
      val tot = tok.groupBy($"source")
        .agg(sum($"c").as("total_tokens"), count(lit(1)).as("n_vocab"))
      val win = Window.partitionBy($"source").orderBy($"c".desc, $"w".asc)
      tok
        .withColumn("rk", row_number().over(win).cast("long"))
        .withColumn("cumt", sum($"c").over(
          win.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .join(broadcast(tot), "source")
        .filter($"cumt" * 10 >= $"total_tokens" * 9)
        .groupBy($"source", $"n_vocab", $"total_tokens")
        .agg(min($"rk").as("v90"))
        .select($"source", $"n_vocab", $"total_tokens", $"v90")
    },
    Some("""
      WITH tok AS (
        SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS w
              FROM documents)
        WHERE w <> ''
        GROUP BY source, w),
      tot AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS total_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_vocab
        FROM tok GROUP BY source),
      cum AS (
        SELECT source,
          row_number() OVER (PARTITION BY source ORDER BY c DESC, w)
            AS rk,
          CAST(SUM(c) OVER (PARTITION BY source ORDER BY c DESC, w
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cumt
        FROM tok)
      SELECT cum.source, n_vocab, total_tokens,
        CAST(MIN(rk) AS BIGINT) AS v90
      FROM cum JOIN tot ON cum.source = tot.source
      WHERE cumt * 10 >= total_tokens * 9
      GROUP BY cum.source, n_vocab, total_tokens
    """))

  // ---------------------------------------------------------------------
  // x76 — UniMax language budgeting (Chung et al., "UniMax: Fairer and
  // More Effective Language Sampling for Large-Scale Multilingual
  // Pretraining", ICLR 2023): allocate a total training budget across
  // languages by greedy ascending scan — each language gets
  // min(cap·its_corpus, floor(remaining budget / languages left)), so
  // small languages are fully used up to the epoch cap and the surplus
  // flows to larger ones — the principled alternative to x29's fixed
  // weights and x20's fixed rates (temperature sampling's known
  // failure: over-epoching tail languages). Budget unit is CHARACTERS
  // (the fixture's n_chars — byte-ish, no tokenizer-semantics risk);
  // budget = 60% of the corpus, cap = 2 epochs. Shape: one tiny keyed
  // aggregate (|languages| rows) feeds a driver-side integer fold (the
  // x18 tiny-state pattern — the sequential dependence is inherent to
  // the greedy scan, and |languages| is dozens at 100 TB, never
  // corpus-sized); the oracle replays the same fold as a recursive CTE
  // stepping the ascending order. All integer arithmetic (floor
  // division on positive longs) — engine-exact; only the final
  // epochs_ppm touches a double, in the usual round-ppm form.
  lazy val x76 = Q(
    "x76_unimax_budget",
    (s, dir) => {
      import s.implicits._
      val EpochCap = 2L
      val counts = docs(s, dir)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("n_chars"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val total = counts.map(_._3).sum
      val budget = total * 3L / 5L
      var rem = budget
      var left = counts.length.toLong
      val alloc = counts.sortBy { case (lang, _, c) => (c, lang) }.map {
        case (lang, nd, c) =>
          val quota = math.min(c * EpochCap, rem / left)
          rem -= quota
          left -= 1
          (lang, nd, c, quota)
      }
      alloc.toSeq.toDF("lang", "n_docs", "n_chars", "budget_chars")
        .withColumn("epochs_ppm",
          round(lit(1e6) * $"budget_chars" / $"n_chars").cast("long"))
        .orderBy($"lang")
    },
    Some("""
      WITH RECURSIVE counts AS (
        SELECT lang, COUNT(*) AS n_docs,
          CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM documents GROUP BY lang
      ),
      ordered AS (
        SELECT lang, n_docs, n_chars,
          ROW_NUMBER() OVER (ORDER BY n_chars, lang) AS rn,
          COUNT(*) OVER () AS k,
          (SELECT CAST(SUM(n_chars) AS BIGINT) * 3 // 5 FROM counts) AS budget
        FROM counts
      ),
      alloc(rn, lang, n_docs, n_chars, quota, rem, lft) AS (
        SELECT rn, lang, n_docs, n_chars,
          LEAST(n_chars * 2, budget // k),
          budget - LEAST(n_chars * 2, budget // k),
          k - 1
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.rn, o.lang, o.n_docs, o.n_chars,
          LEAST(o.n_chars * 2, a.rem // a.lft),
          a.rem - LEAST(o.n_chars * 2, a.rem // a.lft),
          a.lft - 1
        FROM alloc a JOIN ordered o ON o.rn = a.rn + 1
      )
      SELECT lang, n_docs, n_chars,
        CAST(quota AS BIGINT) AS budget_chars,
        CAST(round(1e6 * quota / n_chars) AS BIGINT) AS epochs_ppm
      FROM alloc
      ORDER BY lang
    """))

  // ---------------------------------------------------------------------
  // x83 — BPE merge training (Sennrich/Haddow/Birch 2016 §3.2), the
  // iterative loop x66's single pair count feeds: 3 rounds of
  // (count adjacent symbol pairs weighted by word frequency → pick the
  // most frequent pair, ties broken lexicographically → greedily merge
  // its occurrences left-to-right in every word). Distributed shape per
  // round: pair counting is explode → gram-keyed partial-agg count (the
  // corpus-scale leg); picking the winner collects ONE row; the merge
  // apply is a pure per-row fold (greedy left-to-right, the same
  // non-overlapping semantics as the reference implementation — a
  // freshly merged token never re-matches as the LEFT side because
  // comparison is whole-symbol). The graded output carries each round's
  // rule AND the corpus-level effect of applying it (distinct symbol
  // count, total corpus symbol occurrences), so the oracle grades the
  // application, not just the argmax. The DuckDB oracle replays the
  // fold as a per-word recursive CTE — an independent formulation of
  // the same greedy semantics.
  /** One greedy left-to-right BPE merge pass over a `syms` array
    * column: every adjacent (a, b) becomes the merged symbol, applied
    * as a pure per-row fold — tokenizer SERVING is this map repeated
    * per learned rule, no shuffle, no state. */
  private[queries] def bpeApplyMerge(df: DataFrame, a: String, b: String): DataFrame =
    bpeApplyRules(df, Seq((a, b)))

  /** All rules in ONE native single-pass-per-rule expression
    * ([[graft.functions.BpeApplyRules]]) — the fold chain this
    * replaces copied the accumulator array once per symbol through the
    * interpreted lambda evaluator, O(rules·len²) per word, measured as
    * x85's single dominant job. */
  private[queries] def bpeApplyRules(df: DataFrame,
                                     rules: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.GraftPlanBridge
    df.withColumn("syms", GraftPlanBridge.col(
      graft.functions.BpeApplyRules(
        GraftPlanBridge.expr(col("syms")), rules)))
  }

  /** The shared 3-round trainer behind x83 (rules + per-round corpus
    * effects), x84 (the final per-word symbol sequences it serves
    * tokenization from) and x85 (rules applied to a held-out slice).
    * Trains on `corpus` (a `documents`-shaped frame, so callers can
    * slice). Caller owns unpersisting the returned frame. */
  private[queries] def bpeTrainRoundsOn(s: SparkSession, corpus: DataFrame, rounds: Int)
      : (Seq[(Long, String, String, String, Long, Long, Long)], DataFrame) = {
    import s.implicits._
    val words = corpus
      .select(explode(split($"text", " ")).as("word"))
      .filter($"word" =!= "")
      .groupBy($"word").agg(count(lit(1)).as("wc"))
    var seqs = words.withColumn("syms", expr(
      "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
      .persist()
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long, Long, Long)]
    (1 to rounds).foreach { r =>
      val best = seqs.filter(size($"syms") >= 2)
        .select($"wc", explode(expr(
          "transform(sequence(2, size(syms)), i -> struct(element_at(syms, i-1) as a, element_at(syms, i) as b))"))
          .as("p"))
        .groupBy($"p.a".as("a"), $"p.b".as("b"))
        .agg(sum($"wc").as("cnt"))
        .orderBy(desc("cnt"), $"a", $"b")
        .limit(1).head() // ONE row — the learned rule, never the corpus
      val (a, b, cnt) = (best.getString(0), best.getString(1), best.getLong(2))
      val next = bpeApplyMerge(seqs, a, b).persist()
      // ONE materializing pass for both corpus effects: over the
      // exploded symbols, sum(wc) ≡ sum(wc * size(syms)) (each word
      // contributes wc once per symbol) and countDistinct is the vocab
      // size — this used to be two separate jobs per round
      val eff = next.select($"wc", explode($"syms").as("s"))
        .agg(sum($"wc"), countDistinct($"s")).head()
      val (corpusSyms, vocabSyms) = (eff.getLong(0), eff.getLong(1))
      seqs.unpersist()
      seqs = next
      out += ((r.toLong, a, b, a + b, cnt, vocabSyms, corpusSyms))
    }
    (out.toSeq, seqs)
  }

  private[queries] def bpeTrainRounds(s: SparkSession, dir: String, rounds: Int)
      : (Seq[(Long, String, String, String, Long, Long, Long)], DataFrame) =
    bpeTrainRoundsOn(s, docs(s, dir), rounds)

  /** The words→seqs3 CTE chain shared by the x83/x84/x85 oracles —
    * 3 unrolled rounds of (pair count → best rule → recursive-CTE
    * greedy fold) over the documents matched by `docWhere` (empty =
    * whole corpus). */
  private[queries] def bpeOracleCtes(docWhere: String): String = s"""
      WITH RECURSIVE words AS (
        SELECT word, count(*)::BIGINT AS wc FROM (
          SELECT unnest(string_split(text, ' ')) AS word
          FROM documents $docWhere)
        WHERE word <> '' GROUP BY 1
      ),
      seqs0 AS (
        SELECT word, wc,
          list_transform(range(1, len(word) + 1), i -> word[i]) AS syms
        FROM words
      ),
      pairs1 AS (
        SELECT p['a'] AS a, p['b'] AS b, sum(wc)::BIGINT AS cnt FROM (
          SELECT wc, unnest(list_transform(range(2, len(syms) + 1),
            i -> {'a': syms[i-1], 'b': syms[i]})) AS p
          FROM seqs0 WHERE len(syms) >= 2)
        GROUP BY 1, 2
      ),
      best1 AS (SELECT a, b, cnt FROM pairs1 ORDER BY cnt DESC, a, b LIMIT 1),
      fold1 AS (
        SELECT word, wc, syms, 1 AS i, [syms[1]] AS acc FROM seqs0
        UNION ALL
        SELECT word, wc, syms, i + 1,
          CASE WHEN acc[len(acc)] = (SELECT a FROM best1)
                AND syms[i+1] = (SELECT b FROM best1)
               THEN list_append(acc[1:len(acc)-1],
                      (SELECT a || b FROM best1))
               ELSE list_append(acc, syms[i+1]) END
        FROM fold1 WHERE i < len(syms)
      ),
      seqs1 AS (SELECT word, wc, acc AS syms FROM fold1 WHERE i = len(syms)),
      pairs2 AS (
        SELECT p['a'] AS a, p['b'] AS b, sum(wc)::BIGINT AS cnt FROM (
          SELECT wc, unnest(list_transform(range(2, len(syms) + 1),
            i -> {'a': syms[i-1], 'b': syms[i]})) AS p
          FROM seqs1 WHERE len(syms) >= 2)
        GROUP BY 1, 2
      ),
      best2 AS (SELECT a, b, cnt FROM pairs2 ORDER BY cnt DESC, a, b LIMIT 1),
      fold2 AS (
        SELECT word, wc, syms, 1 AS i, [syms[1]] AS acc FROM seqs1
        UNION ALL
        SELECT word, wc, syms, i + 1,
          CASE WHEN acc[len(acc)] = (SELECT a FROM best2)
                AND syms[i+1] = (SELECT b FROM best2)
               THEN list_append(acc[1:len(acc)-1],
                      (SELECT a || b FROM best2))
               ELSE list_append(acc, syms[i+1]) END
        FROM fold2 WHERE i < len(syms)
      ),
      seqs2 AS (SELECT word, wc, acc AS syms FROM fold2 WHERE i = len(syms)),
      pairs3 AS (
        SELECT p['a'] AS a, p['b'] AS b, sum(wc)::BIGINT AS cnt FROM (
          SELECT wc, unnest(list_transform(range(2, len(syms) + 1),
            i -> {'a': syms[i-1], 'b': syms[i]})) AS p
          FROM seqs2 WHERE len(syms) >= 2)
        GROUP BY 1, 2
      ),
      best3 AS (SELECT a, b, cnt FROM pairs3 ORDER BY cnt DESC, a, b LIMIT 1),
      fold3 AS (
        SELECT word, wc, syms, 1 AS i, [syms[1]] AS acc FROM seqs2
        UNION ALL
        SELECT word, wc, syms, i + 1,
          CASE WHEN acc[len(acc)] = (SELECT a FROM best3)
                AND syms[i+1] = (SELECT b FROM best3)
               THEN list_append(acc[1:len(acc)-1],
                      (SELECT a || b FROM best3))
               ELSE list_append(acc, syms[i+1]) END
        FROM fold3 WHERE i < len(syms)
      ),
      seqs3 AS (SELECT word, wc, acc AS syms FROM fold3 WHERE i = len(syms))
"""

  private[queries] lazy val BpeOracleCtes = bpeOracleCtes("")

  lazy val x83 = Q(
    "x83_bpe_train",
    (s, dir) => {
      import s.implicits._
      val (rules, fin) = bpeTrainRounds(s, dir, 3)
      fin.unpersist()
      rules.toDF("round", "sym_a", "sym_b", "merged", "pair_count",
        "vocab_symbols_after", "corpus_symbols_after")
    },
    Some(BpeOracleCtes + """
      SELECT 1::BIGINT AS round,
        (SELECT a FROM best1) AS sym_a, (SELECT b FROM best1) AS sym_b,
        (SELECT a || b FROM best1) AS merged,
        (SELECT cnt FROM best1) AS pair_count,
        (SELECT count(DISTINCT s) FROM
          (SELECT unnest(syms) AS s FROM seqs1))::BIGINT AS vocab_symbols_after,
        (SELECT sum(wc * len(syms)) FROM seqs1)::BIGINT AS corpus_symbols_after
      UNION ALL
      SELECT 2::BIGINT,
        (SELECT a FROM best2), (SELECT b FROM best2),
        (SELECT a || b FROM best2), (SELECT cnt FROM best2),
        (SELECT count(DISTINCT s) FROM
          (SELECT unnest(syms) AS s FROM seqs2))::BIGINT,
        (SELECT sum(wc * len(syms)) FROM seqs2)::BIGINT
      UNION ALL
      SELECT 3::BIGINT,
        (SELECT a FROM best3), (SELECT b FROM best3),
        (SELECT a || b FROM best3), (SELECT cnt FROM best3),
        (SELECT count(DISTINCT s) FROM
          (SELECT unnest(syms) AS s FROM seqs3))::BIGINT,
        (SELECT sum(wc * len(syms)) FROM seqs3)::BIGINT
    """))

  // ---------------------------------------------------------------------
  // x84 — BPE tokenization with the merges x83 learned: the serving
  // half of the tokenizer loop. The trained vocabulary (word → final
  // symbol sequence) is a small dim frame; each document's token count
  // under the learned merges is one join of its exploded words against
  // it — per doc: whitespace tokens, characters, BPE tokens, and the
  // chars-per-BPE-token compression ratio (the number a tokenizer
  // budget planner actually wants per corpus slice). Oracle reuses the
  // same 3-round recursive-CTE chain and joins documents against its
  // final sequences.
  lazy val x84 = Q(
    "x84_bpe_tokenize",
    (s, dir) => {
      import s.implicits._
      // the returned plan JOINS against the trained sequences, so the
      // frame must stay cached until the caller executes it — route it
      // through the bounded persist (tracked, cleared by the harness
      // between queries, reused across invocations) instead of
      // unpersisting a frame the lazy plan still needs
      val fin = persisted(s, "x84_bpe_seqs", dir)(bpeTrainRounds(s, dir, 3)._2)
      val vocab = fin.select($"word", size($"syms").cast("long").as("bpe_len"),
        length($"word").cast("long").as("w_chars"))
      docs(s, dir)
        .select($"doc_id", explode(split($"text", " ")).as("word"))
        .filter($"word" =!= "")
        .join(vocab, "word")
        .groupBy($"doc_id").agg(
          count(lit(1)).as("ws_tokens"),
          sum($"w_chars").as("chars"),
          sum($"bpe_len").as("bpe_tokens"))
        .withColumn("chars_per_bpe_token_ppm",
          expr("chars * 1000000 div bpe_tokens"))
    },
    Some(BpeOracleCtes + """
      SELECT d.doc_id, count(*)::BIGINT AS ws_tokens,
        sum(len(d.word))::BIGINT AS chars,
        sum(len(s3.syms))::BIGINT AS bpe_tokens,
        ((sum(len(d.word)) * 1000000) // sum(len(s3.syms)))::BIGINT
          AS chars_per_bpe_token_ppm
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents) d
      JOIN seqs3 s3 ON d.word = s3.word
      WHERE d.word <> ''
      GROUP BY 1
    """))

  // ---------------------------------------------------------------------
  // x85 — BPE rule application to HELD-OUT text: train the merges on
  // even doc_ids, tokenize the odd ones by replaying the learned rules
  // in rank order. This is the serving path x84's vocabulary join can't
  // cover — unseen words tokenize fine because the rules are symbol
  // rewrites, not a word lookup. At scale the shape is the one a
  // production tokenizer wants: training touches only the train slice
  // (3 pair-count aggregations); application is a ZERO-shuffle narrow
  // map (the 3 rules are literals folded into one codegen'd expression
  // chain) followed by the per-doc aggregation the caller needed
  // anyway. The oracle retrains on the same slice via the shared
  // recursive-CTE chain and replays the folds over held-out words — an
  // independent implementation of both halves.
  lazy val x85 = Q(
    "x85_bpe_apply_holdout",
    (s, dir) => {
      import s.implicits._
      val (rules, fin) =
        bpeTrainRoundsOn(s, docs(s, dir).filter($"doc_id" % 2 === 0), 3)
      fin.unpersist()
      val holdout = docs(s, dir).filter($"doc_id" % 2 === 1)
        .select($"doc_id", explode(split($"text", " ")).as("word"))
        .filter($"word" =!= "")
        .withColumn("syms", expr(
          "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
      val tokenized = bpeApplyRules(holdout,
        rules.map { case (_, a, b, _, _, _, _) => (a, b) })
      tokenized.groupBy($"doc_id").agg(
          count(lit(1)).as("ws_tokens"),
          sum(length($"word")).cast("long").as("chars"),
          sum(size($"syms")).cast("long").as("bpe_tokens"))
        .withColumn("chars_per_bpe_token_ppm",
          expr("chars * 1000000 div bpe_tokens"))
    },
    Some(bpeOracleCtes("WHERE doc_id % 2 = 0") + """
      , hwords AS (
        SELECT DISTINCT word FROM (
          SELECT unnest(string_split(text, ' ')) AS word
          FROM documents WHERE doc_id % 2 = 1)
        WHERE word <> ''
      ),
      hseqs0 AS (
        SELECT word,
          list_transform(range(1, len(word) + 1), i -> word[i]) AS syms
        FROM hwords
      ),
      hfold1 AS (
        SELECT word, syms, 1 AS i, [syms[1]] AS acc FROM hseqs0
        UNION ALL
        SELECT word, syms, i + 1,
          CASE WHEN acc[len(acc)] = (SELECT a FROM best1)
                AND syms[i+1] = (SELECT b FROM best1)
               THEN list_append(acc[1:len(acc)-1],
                      (SELECT a || b FROM best1))
               ELSE list_append(acc, syms[i+1]) END
        FROM hfold1 WHERE i < len(syms)
      ),
      hseqs1 AS (SELECT word, acc AS syms FROM hfold1 WHERE i = len(syms)),
      hfold2 AS (
        SELECT word, syms, 1 AS i, [syms[1]] AS acc FROM hseqs1
        UNION ALL
        SELECT word, syms, i + 1,
          CASE WHEN acc[len(acc)] = (SELECT a FROM best2)
                AND syms[i+1] = (SELECT b FROM best2)
               THEN list_append(acc[1:len(acc)-1],
                      (SELECT a || b FROM best2))
               ELSE list_append(acc, syms[i+1]) END
        FROM hfold2 WHERE i < len(syms)
      ),
      hseqs2 AS (SELECT word, acc AS syms FROM hfold2 WHERE i = len(syms)),
      hfold3 AS (
        SELECT word, syms, 1 AS i, [syms[1]] AS acc FROM hseqs2
        UNION ALL
        SELECT word, syms, i + 1,
          CASE WHEN acc[len(acc)] = (SELECT a FROM best3)
                AND syms[i+1] = (SELECT b FROM best3)
               THEN list_append(acc[1:len(acc)-1],
                      (SELECT a || b FROM best3))
               ELSE list_append(acc, syms[i+1]) END
        FROM hfold3 WHERE i < len(syms)
      ),
      hseqs3 AS (SELECT word, acc AS syms FROM hfold3 WHERE i = len(syms))
      SELECT d.doc_id, count(*)::BIGINT AS ws_tokens,
        sum(len(d.word))::BIGINT AS chars,
        sum(len(h.syms))::BIGINT AS bpe_tokens,
        ((sum(len(d.word))::BIGINT * 1000000)
          // sum(len(h.syms))::BIGINT)::BIGINT AS chars_per_bpe_token_ppm
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents WHERE doc_id % 2 = 1) d
      JOIN hseqs3 h ON d.word = h.word
      WHERE d.word <> ''
      GROUP BY 1
    """))

}
