"""Text-analysis inventory — SURVEY.md §2.16 north-star.

Also carries the reference's flagship WordCount example
(flink-examples/flink-examples-batch/src/main/java/org/apache/flink/
examples/java/wordcount/WordCount.java) re-expressed as explode+groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.catalog import table
from flink_1_8_sourcecode_spark.operators import text as tx
from flink_1_8_sourcecode_spark.queries import export_path, register

_TOKS = "list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t != '')"


@register(
    "text_wordcount",
    oracle=f"""
    SELECT tok, count(*) AS cnt FROM (
      SELECT unnest({_TOKS}) AS tok FROM documents
    ) GROUP BY tok ORDER BY cnt DESC, tok LIMIT 20
    """,
    doc="WordCount (the reference's flagship batch example): "
    "tokenize -> explode -> groupBy -> top-20.",
    bench=True,
)
def text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tx.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(20)
    )


@register(
    "text_stats",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_distinct,
           CASE WHEN len(toks) > 0
                THEN list_sum(list_transform(toks, t -> length(t)))::DOUBLE / len(toks)
                ELSE 0.0 END AS avg_token_len,
           CASE WHEN len(toks) > 0
                THEN len(list_filter(toks, t -> t IN
                     ('the','a','of','and','to','in','is','it')))::DOUBLE / len(toks)
                ELSE 0.0 END AS stopword_ratio
    FROM tok
    """,
    doc="Per-document token statistics (token count, lexical diversity, "
    "avg token length, stopword ratio).",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        tx.token_count(t).alias("n_tokens"),
        tx.distinct_token_count(t).alias("n_distinct"),
        tx.avg_token_length(t).alias("avg_token_len"),
        tx.stopword_ratio(t).alias("stopword_ratio"),
    )


@register(
    "text_quality_filter",
    oracle=f"""
    WITH tok AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
         scored AS (
           SELECT doc_id, source,
                  ((CASE WHEN len(toks) BETWEEN 20 AND 1000 THEN 1.0
                         WHEN len(toks) > 0 THEN 0.5 ELSE 0.0 END)
                 + (CASE WHEN len(toks) > 0
                         THEN len(list_distinct(toks))::DOUBLE / len(toks)
                         ELSE 0.0 END)
                 + (CASE WHEN len(toks) > 0
                          AND len(list_filter(toks, t -> t IN
                              ('the','a','of','and','to','in','is','it')))::DOUBLE
                              / len(toks) BETWEEN 0.05 AND 0.6
                         THEN 1.0 ELSE 0.5 END)) / 3.0 AS quality
           FROM tok
         )
    SELECT source, count(*) AS n_docs, avg(quality) AS avg_quality,
           sum(CASE WHEN quality >= 0.6 THEN 1 ELSE 0 END)::BIGINT AS n_kept
    FROM scored GROUP BY source
    """,
    doc="Quality scoring + keep/drop filter, reported per source.",
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    scored = d.select("source", tx.quality_score(F.col("text")).alias("quality"))
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("quality").alias("avg_quality"),
        F.sum(F.when(F.col("quality") >= 0.6, 1).otherwise(0)).alias("n_kept"),
    )


@register(
    "text_lang_id",
    oracle=f"""
    WITH tok AS (SELECT lang, {_TOKS} AS toks FROM documents),
         pred AS (
           SELECT lang,
                  CASE WHEN len(toks) > 0 AND
                       len(list_filter(toks, t -> t IN
                           ('the','a','of','and','to','in','is','it')))::DOUBLE
                           / len(toks) >= 0.08
                       THEN 'en' ELSE 'other' END AS predicted
           FROM tok
         )
    SELECT lang, predicted, count(*) AS cnt
    FROM pred GROUP BY lang, predicted
    """,
    doc="Language-ID heuristic (stopword-ratio n-gram proxy) vs labeled lang.",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.select("lang", tx.lang_id(F.col("text")).alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "text_fingerprint",
    oracle=f"""
    SELECT md5(array_to_string({_TOKS}, ' ')) AS fp,
           min(doc_id) AS first_doc, count(*) AS n_docs
    FROM documents GROUP BY 1
    """,
    doc="Document fingerprinting (md5 over normalized token stream) + "
    "collision grouping.",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.select(tx.fingerprint(F.col("text")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("first_doc"), F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "text_subword_count",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(lower(trim(text)), '[a-z]+|[0-9]+|[^a-z0-9\\s]+')) AS subwords,
           len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                           t -> t != '')) AS words
    FROM documents
    """,
    doc="BPE-ish token counting: letter/digit/punctuation runs (the "
    "pre-tokenizer unit a byte-pair encoder merges from) next to the "
    "whitespace word count — the LLM-cost estimate column pair.",
)
def text_subword_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.text import subword_count, token_count

    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        subword_count(F.col("text")).alias("subwords"),
        token_count(F.col("text")).alias("words"),
    )


@register(
    "text_repetition_stats",
    oracle=f"""
    WITH l AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(text, chr(10)), s -> trim(s)),
                         s -> s != '') AS ls
      FROM documents
    ), tok AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    g2 AS (
      SELECT doc_id, unnest(list_transform(range(1, len(t)), i ->
               t[i] || ' ' || t[i + 1])) AS g
      FROM tok WHERE len(t) >= 2
    ), cnt AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
    share AS (SELECT doc_id, max(c)::DOUBLE / sum(c) AS top_ngram_share
              FROM cnt GROUP BY 1)
    SELECT l.doc_id, len(ls) AS n_lines,
           CASE WHEN len(ls) > 0
                THEN 1.0 - len(list_distinct(ls))::DOUBLE / len(ls)
                ELSE 0.0 END AS dup_line_frac,
           coalesce(top_ngram_share, 0.0) AS top_ngram_share
    FROM l LEFT JOIN share USING (doc_id)
    """,
    doc="Gopher-style repetition signals (Rae et al. 2021): duplicate-"
    "line fraction + top-2-gram occurrence share per document — the "
    "published boilerplate/repetition pre-filters for LLM corpora "
    "(operators/text.py:repetition_stats; explode + two partial-agg "
    "groupBys, no per-row Python).",
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return tx.repetition_stats(d, "doc_id", "text", k=2)


@register(
    "text_url_domain_filter",
    oracle="""
    WITH h AS (
      SELECT doc_id,
             list_distinct(list_transform(
               regexp_extract_all(text, 'https?://([^/\\s]+)', 1),
               x -> lower(x))) AS hosts
      FROM documents
    )
    SELECT doc_id,
           len(hosts) AS n_hosts,
           len(list_filter(hosts, h ->
             h = 'spam.example' OR h LIKE '%.spam.example'
             OR h = 'bad.io' OR h LIKE '%.bad.io')) > 0 AS blocked
    FROM h
    """,
    doc="URL/domain blocklist filter (the RefinedWeb-style curation "
    "step): extract every http(s) URL's lowercased host, flag docs "
    "hitting a blocked domain or any subdomain of one — the blocklist "
    "is a literal array, so the whole check is one map-only expression "
    "(operators/text.py:url_hosts/domain_blocklist_flag).",
)
def text_url_domain_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.text import (
        domain_blocklist_flag,
        url_hosts,
    )

    d = table(spark, sf_dir, "documents")
    flagged = domain_blocklist_flag(d, "text", ["spam.example", "bad.io"])
    return flagged.select(
        "doc_id",
        F.size(url_hosts(F.col("text"))).alias("n_hosts"),
        "blocked",
    )


@register(
    "text_char_entropy",
    oracle="""
    WITH c AS (
      SELECT doc_id,
             list_transform(range(1, len(text) + 1), i -> text[i:i]) AS cs
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN len(cs) > 0 THEN
             list_sum(list_transform(list_distinct(cs), ch ->
               -(len(list_filter(cs, x -> x = ch))::DOUBLE / len(cs))
               * log2(len(list_filter(cs, x -> x = ch))::DOUBLE / len(cs))))
           ELSE 0.0 END AS entropy
    FROM c
    """,
    doc="Character-distribution Shannon entropy (bits/char) — the cheap "
    "perplexity proxy that kills repeated-garbage (low) and random "
    "noise (high) documents; distinct-char fold in first-occurrence "
    "order so the float sum is order-identical across engines "
    "(operators/text.py:char_entropy).",
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.text import char_entropy

    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", char_entropy(F.col("text")).alias("entropy"))


@register(
    "text_chunk_documents",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x != '') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id, toks,
             CASE WHEN len(toks) > 0
                  THEN range(0, len(toks), 96) ELSE [] END AS starts
      FROM t
    ), e AS (
      SELECT doc_id, toks, unnest(starts) AS st,
             generate_subscripts(starts, 1) - 1 AS chunk_idx
      FROM s
    )
    SELECT doc_id, chunk_idx::INT AS chunk_idx,
           array_to_string(toks[st + 1 : st + 128], ' ') AS chunk_text,
           least(128, len(toks) - st)::INT AS n_tokens
    FROM e
    """,
    doc="Document chunking for RAG/training prep: 128-token windows "
    "with stride 96 (32-token overlap), final partial window kept — "
    "one map-only tokenize + sequence-of-starts + slice per chunk "
    "(operators/text.py:chunk_documents; no shuffle, no Python).",
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.text import chunk_documents

    d = table(spark, sf_dir, "documents")
    return chunk_documents(d, "doc_id", "text", chunk_tokens=128, stride=96)


@register(
    "text_repeated_spans",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 8),
                i -> array_to_string(toks[i:i+9], ' '))) AS span
          FROM t WHERE len(toks) >= 10)
    SELECT span, count(*) AS occ, count(DISTINCT doc_id) AS ndocs
    FROM s GROUP BY span HAVING count(*) >= 2
    """,
    doc="Repeated-span detection (Lee et al. 2021 exact-substring dedup "
    "approximated at 10-token window granularity, operators/dedup.py:"
    "repeated_ngram_spans): every 10-gram token window, corpus-wide "
    "count + distinct-doc count, spans occurring twice or more.  "
    "Hash pre-pass: the corpus-wide exchange carries xxhash64 values; "
    "span strings materialize only at surviving sites and are recounted "
    "exactly on text.",
)
def text_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.dedup import repeated_ngram_spans

    d = table(spark, sf_dir, "documents")
    return repeated_ngram_spans(d, "doc_id", "text", n=10, min_count=2)


@register(
    "text_repeated_span_intervals",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    w AS (
      SELECT doc_id, pos, array_to_string(toks[pos:pos+9], ' ') AS span
      FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 8)) AS pos
            FROM tok WHERE len(toks) >= 10)
    ), c AS (SELECT span FROM w GROUP BY span HAVING count(*) >= 2),
    s AS (SELECT w.doc_id, w.pos FROM w JOIN c USING (span)),
    b AS (
      SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                    OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) >= 10
                  THEN 1 ELSE 0 END AS brk
      FROM s
    ), isl AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS g
      FROM b
    ), iv AS (
      SELECT doc_id, g, min(pos)::INTEGER AS start_tok,
             (max(pos) + 9)::INTEGER AS end_tok
      FROM isl GROUP BY doc_id, g
    )
    SELECT iv.doc_id, start_tok, end_tok,
           array_to_string(toks[start_tok:end_tok], ' ') AS span
    FROM iv JOIN tok USING (doc_id)
    """,
    doc="MAXIMAL repeated intervals (operators/dedup.py:"
    "repeated_span_intervals): overlapping repeated 10-token windows "
    "merged gaps-and-islands style into [start_tok, end_tok] per doc — "
    "the distributed stand-in for Lee et al. 2021's suffix-array "
    "maximal repeats.  Islands + interval aggregate share one doc-keyed "
    "exchange over the tiny survivor relation.",
)
def text_repeated_span_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.dedup import repeated_span_intervals

    d = table(spark, sf_dir, "documents")
    return repeated_span_intervals(d, "doc_id", "text", n=10, min_count=2)


@register(
    "text_strip_repeated_spans",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    w AS (
      SELECT doc_id, pos, array_to_string(toks[pos:pos+9], ' ') AS span
      FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 8)) AS pos
            FROM tok WHERE len(toks) >= 10)
    ), c AS (SELECT span FROM w GROUP BY span HAVING count(*) >= 2),
    s AS (SELECT w.doc_id, w.pos FROM w JOIN c USING (span)),
    cov AS (SELECT DISTINCT doc_id, unnest(range(pos, pos + 10)) AS t FROM s),
    trow AS (SELECT doc_id, unnest(range(1, len(toks) + 1)) AS i, toks FROM tok),
    kept AS (
      SELECT tr.doc_id, tr.i, tr.toks[tr.i] AS tokn
      FROM trow tr LEFT JOIN cov ON tr.doc_id = cov.doc_id AND tr.i = cov.t
      WHERE cov.t IS NULL
    ), ag AS (
      SELECT doc_id, array_to_string(list(tokn ORDER BY i), ' ') AS ct
      FROM kept GROUP BY doc_id
    )
    SELECT tok.doc_id, coalesce(ag.ct, '') AS clean_text
    FROM tok LEFT JOIN ag USING (doc_id)
    """,
    doc="Repeated-span REMOVAL (operators/dedup.py:strip_repeated_spans, "
    "Lee et al. 2021's dedup action, all-occurrences variant): every "
    "token covered by a corpus-wide repeated 10-gram window dropped, "
    "remaining tokens rejoined.  Survivor sites aggregate to one "
    "covered-index array per doc; the corpus streams through a "
    "broadcastable left join + map-only token filter.",
)
def text_strip_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.dedup import strip_repeated_spans

    d = table(spark, sf_dir, "documents")
    return strip_repeated_spans(d, "doc_id", "text", n=10, min_count=2)


@register(
    "text_repeated_spans_char",
    oracle="""
    WITH s AS (
      SELECT doc_id, substr(text, i, 50) AS span
      FROM documents, UNNEST(range(1, length(text) - 48)) AS u(i)
      WHERE length(text) >= 50
    )
    SELECT span, count(*) AS occ, count(DISTINCT doc_id) AS ndocs
    FROM s GROUP BY span HAVING count(*) >= 2
    """,
    doc="CHARACTER-level exact-substring dedup detection — Lee et al. "
    "2021's actual criterion (>= 50-char repeats, not token windows; "
    "operators/dedup.py:repeated_char_spans).  Catches sub-10-token "
    "repeats (long words, URLs, identifiers) the token-window variant "
    "misses.  Hash pre-pass: the corpus-wide exchange carries "
    "xxhash64(substr) only; survivors recount on text.",
)
def text_repeated_spans_char(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.dedup import repeated_char_spans

    d = table(spark, sf_dir, "documents", spread=True)
    return repeated_char_spans(d, "doc_id", "text", n=50, min_count=2)


@register(
    "text_repeated_char_intervals",
    oracle="""
    WITH w AS (
      SELECT doc_id, i AS pos, text, substr(text, i, 50) AS span
      FROM documents, UNNEST(range(1, length(text) - 48)) AS u(i)
      WHERE length(text) >= 50
    ), c AS (SELECT span FROM w GROUP BY span HAVING count(*) >= 2),
    s AS (SELECT w.doc_id, w.pos, w.text FROM w JOIN c USING (span)),
    b AS (
      SELECT doc_id, pos, text,
             CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                    OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) >= 50
                  THEN 1 ELSE 0 END AS brk
      FROM s
    ), isl AS (
      SELECT doc_id, pos, text,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS g
      FROM b
    )
    SELECT doc_id, min(pos) AS start_char, max(pos) + 49 AS end_char,
           substr(text, min(pos)::INT, (max(pos) + 49 - min(pos) + 1)::INT) AS span
    FROM isl GROUP BY doc_id, g, text
    """,
    doc="MAXIMAL repeated CHARACTER intervals (operators/dedup.py:"
    "repeated_char_span_intervals): overlapping repeated 50-char windows "
    "merged gaps-and-islands style to [start_char, end_char] per doc — "
    "the suffix-array output shape of Lee et al. 2021 at char "
    "granularity.  Survivor recount precedes the island merge, so hash "
    "collisions cannot fuse unrelated intervals.",
)
def text_repeated_char_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.dedup import (
        repeated_char_span_intervals,
    )

    d = table(spark, sf_dir, "documents")
    return repeated_char_span_intervals(d, "doc_id", "text", n=50, min_count=2)


@register(
    "text_lm_perplexity",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(trim(text)), ' '), s -> s != '') AS ts
      FROM documents
    ),
    big AS (
      SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
      FROM toks, UNNEST(range(1, len(ts))) AS u(i)
    ),
    lm AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY w1, w2),
    ctx AS (SELECT w1, sum(c12) AS c1 FROM lm GROUP BY w1),
    vocab AS (
      SELECT count(DISTINCT t) AS v
      FROM (SELECT unnest(ts) AS t FROM toks)
    ),
    scored AS (
      SELECT b.doc_id,
             ln((lm.c12 + 0.5) / (ctx.c1 + 0.5 * vocab.v)) AS lp
      FROM big b
      JOIN lm USING (w1, w2)
      JOIN ctx USING (w1)
      CROSS JOIN vocab
    )
    SELECT doc_id,
           count(*) AS n_bigrams,
           avg(lp) AS avg_logp,
           exp(-avg(lp)) AS ppl
    FROM scored GROUP BY doc_id
    """,
    doc="Per-document bigram LM perplexity (CCNet's quality signal, "
    "Wenzek et al. 2019): add-0.5-smoothed bigram LM trained on the "
    "corpus in the SAME plan, documents scored by mean log-prob and "
    "ppl=exp(-mean).  Bigram extraction is a map-only token-array zip; "
    "LM training is two partial-aggregated groupBys (hot bigrams "
    "collapse map-side); scoring joins doc-bigrams to the "
    "vocab^2-bounded LM (operators/text.py:bigram_lm_score).",
)
def text_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return tx.bigram_lm_score(d, "doc_id", "text", add_k=0.5)


from flink_1_8_sourcecode_spark.queries.dedup import _duck_gram_base

_HEX_BASE = _duck_gram_base("t")


@register(
    "text_feature_hash_embed",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split(lower(trim(text)), ' '),
                                        s -> s != '')) AS t
      FROM documents
    ),
    h AS (SELECT doc_id, {_HEX_BASE} AS base FROM toks),
    f AS (
      SELECT doc_id, base % 64 AS dim,
             CASE WHEN (base // 64) % 2 = 0 THEN 1.0 ELSE -1.0 END AS s
      FROM h
    ),
    agg AS (
      SELECT doc_id, dim, sum(s) AS w FROM f GROUP BY doc_id, dim
      HAVING sum(s) != 0
    ),
    nrm AS (SELECT doc_id, sqrt(sum(w*w)) AS n FROM agg GROUP BY doc_id)
    SELECT a.doc_id, a.dim, a.w / nrm.n AS weight
    FROM agg a JOIN nrm USING (doc_id)
    """,
    doc="Hashed bag-of-words document embeddings (feature hashing, "
    "Weinberger et al. 2009): tokens hash to 64 signed buckets via the "
    "engine-portable md5 base, per-doc sums L2-normalized, emitted "
    "SPARSE as (doc_id, dim, weight) — the vocabulary-free featurizer "
    "bridging documents into the similarity operators.  Map-only hash, "
    "one partial-agg groupBy, per-doc window norm "
    "(operators/text.py:feature_hash_embed).",
)
def text_feature_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return tx.feature_hash_embed(d, "doc_id", "text", dim=64)


@register(
    "text_ppl_buckets",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(trim(text)), ' '), s -> s != '') AS ts
      FROM documents
    ),
    big AS (
      SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
      FROM toks, UNNEST(range(1, len(ts))) AS u(i)
    ),
    lm AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY w1, w2),
    ctx AS (SELECT w1, sum(c12) AS c1 FROM lm GROUP BY w1),
    vocab AS (
      SELECT count(DISTINCT t) AS v FROM (SELECT unnest(ts) AS t FROM toks)
    ),
    scored AS (
      SELECT b.doc_id,
             ln((lm.c12 + 0.5) / (ctx.c1 + 0.5 * vocab.v)) AS lp
      FROM big b JOIN lm USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN vocab
    ),
    ppl AS (SELECT doc_id, exp(-avg(lp)) AS ppl FROM scored GROUP BY doc_id),
    cuts AS (
      SELECT quantile_cont(ppl, 1.0/3) AS c1, quantile_cont(ppl, 2.0/3) AS c2
      FROM ppl
    )
    SELECT doc_id, ppl,
           CASE WHEN ppl <= cuts.c1 THEN 'head'
                WHEN ppl <= cuts.c2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM ppl CROSS JOIN cuts
    """,
    doc="CCNet perplexity bucketing (Wenzek et al. 2019 split the "
    "corpus into head/middle/tail thirds by LM perplexity): cutoffs "
    "are exact interpolated terciles computed as two scalar "
    "aggregates (NOT a global ntile window — no single-task global "
    "sort; at 100 TB the same cutoffs come from percentile_approx or "
    "a sample), bucketing itself is a map-only comparison "
    "(operators/text.py:bigram_lm_score + exact percentile).",
)
def text_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    lm = tx.bigram_lm_score(d, "doc_id", "text", add_k=0.5).select("doc_id", "ppl")
    # cutoffs stay IN the plan as a broadcast 1-row aggregate: one job,
    # and AQE reuses the LM pipeline's exchanges across the two branches
    # (a .first() here would run the whole LM pipeline twice)
    cuts = lm.agg(
        F.percentile("ppl", 1.0 / 3).alias("__c1"),
        F.percentile("ppl", 2.0 / 3).alias("__c2"),
    )
    bucket = (
        F.when(F.col("ppl") <= F.col("__c1"), "head")
        .when(F.col("ppl") <= F.col("__c2"), "middle")
        .otherwise("tail")
    )
    return lm.join(F.broadcast(cuts), F.lit(True)).select(
        "doc_id", "ppl", bucket.alias("bucket")
    )


@register(
    "text_ngram_novelty",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(trim(text)), ' '), s -> s != '') AS ts
      FROM documents
    ),
    dg AS (
      SELECT DISTINCT doc_id, g
      FROM toks,
           UNNEST(list_transform(range(1, greatest(len(ts) - 2, 0) + 1),
                                 i -> array_to_string(ts[i:i+2], ' '))) AS u(g)
    ),
    gdf AS (SELECT g, count(*) AS ndocs FROM dg GROUP BY g),
    scored AS (
      SELECT dg.doc_id,
             count(*) AS n_grams_distinct,
             avg(CASE WHEN gdf.ndocs = 1 THEN 1.0 ELSE 0.0 END) AS novelty
      FROM dg JOIN gdf USING (g) GROUP BY dg.doc_id
    )
    SELECT t.doc_id,
           coalesce(s.n_grams_distinct, 0) AS n_grams_distinct,
           coalesce(s.novelty, 0.0) AS novelty
    FROM toks t LEFT JOIN scored s USING (doc_id)
    """,
    doc="Per-document 3-gram NOVELTY (fraction of the doc's distinct "
    "3-grams occurring in no other document) — the complement of the "
    "repeated-span family; low-novelty docs are corpus boilerplate.  "
    "Distinct (doc,gram) pairs -> partial-agg gram document-frequency "
    "-> join back -> per-doc mean (operators/text.py:ngram_novelty).",
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return tx.ngram_novelty(d, "doc_id", "text", k=3)


@register(
    "text_gopher_rules",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(lower(trim(text)), ' '), s -> s != '') AS ts,
             list_filter(list_transform(string_split(text, chr(10)), s -> trim(s)),
                         s -> s != '') AS ls
      FROM documents
    ),
    sig AS (
      SELECT doc_id,
        len(ts) AS n_words,
        CASE WHEN len(ts) > 0
             THEN list_sum(list_transform(ts, x -> length(x)))::DOUBLE / len(ts)
        END AS mean_word_len,
        CASE WHEN len(ts) > 0
             THEN len(list_filter(ts, x -> contains(x, '#') OR contains(x, '...')))::DOUBLE
                  / len(ts)
        END AS symbol_ratio,
        CASE WHEN len(ts) > 0
             THEN len(list_filter(ts, x -> regexp_matches(x, '[a-z]')))::DOUBLE / len(ts)
        END AS alpha_frac,
        len(list_intersect(ts, ['the','be','to','of','and','that','have','with']))
          AS n_stopwords,
        CASE WHEN len(ls) > 0
             THEN len(list_filter(ls, x -> starts_with(x, '-') OR starts_with(x, '*')))::DOUBLE
                  / len(ls)
        END AS bullet_frac,
        CASE WHEN len(ls) > 0
             THEN len(list_filter(ls, x -> ends_with(x, '...')))::DOUBLE / len(ls)
        END AS ellipsis_frac
      FROM t
    )
    SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac,
           n_stopwords, bullet_frac, ellipsis_frac,
           coalesce(n_words BETWEEN 50 AND 100000
                    AND mean_word_len BETWEEN 3.0 AND 10.0
                    AND symbol_ratio <= 0.1
                    AND bullet_frac < 0.9
                    AND ellipsis_frac < 0.3
                    AND alpha_frac >= 0.8
                    AND n_stopwords >= 2, false) AS keep
    FROM sig
    """,
    doc="The Gopher rule-based quality gate (Rae et al. 2021, Table A1) "
    "with the paper's published thresholds: word-count band, mean word "
    "length band, symbol-to-word ratio, bullet/ellipsis line "
    "fractions, alphabetic-word fraction, >=2 Gopher stopwords — every "
    "signal emitted alongside the conjunction so downstream can "
    "re-threshold without a rescan.  Map-only Column math, tokenize "
    "once via bind_once (operators/text.py:gopher_quality_flags).",
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return tx.gopher_quality_flags(d, "doc_id", "text")


@register(
    "text_zipf_fit",
    oracle="""
    WITH toks AS (
      SELECT unnest(list_filter(string_split(lower(trim(text)), ' '),
                                s -> s != '')) AS t
      FROM documents
    ),
    counts AS (SELECT t, count(*) AS c FROM toks GROUP BY t),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, t) AS r FROM counts
    ),
    top AS (SELECT * FROM ranked WHERE r <= 100)
    SELECT count(*) AS n_ranks,
           regr_slope(ln(c), ln(r)) AS zipf_slope,
           regr_intercept(ln(c), ln(r)) AS zipf_intercept,
           regr_r2(ln(c), ln(r)) AS r2
    FROM top
    """,
    doc="Zipf rank-frequency fit over the corpus vocabulary: OLS slope/"
    "intercept/R^2 of ln(freq) vs ln(rank) on the top-100 tokens — the "
    "classic corpus-health diagnostic (a natural-language corpus fits "
    "slope ~ -1; synthetic or template-heavy data deviates).  The "
    "rank window runs over the VOCAB-bounded count table, never the "
    "corpus; the fit is a closed-form aggregate.",
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(tx.tokens(F.col("text"))).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.orderBy(F.desc("c"), F.asc("t"))  # vocab-bounded window
    top = counts.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= 100)
    lnc, lnr = F.log("c"), F.log("r")
    return top.agg(
        F.count(F.lit(1)).alias("n_ranks"),
        F.regr_slope(lnc, lnr).alias("zipf_slope"),
        F.regr_intercept(lnc, lnr).alias("zipf_intercept"),
        F.regr_r2(lnc, lnr).alias("r2"),
    )


_BM25_TERMS = "'join', 'spark', 'vector', 'window'"  # sorted, matches the Spark call


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH stats AS (
      SELECT doc_id, len(toks) AS dl,
             list_transform([{_BM25_TERMS}],
                            term -> struct_pack(term := term,
                                                tf := len(list_filter(toks, x -> x = term)))) AS tfs
      FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
    ),
    corpus AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM stats),
    hits AS (
      SELECT doc_id, dl, h.term AS term, h.tf AS tf
      FROM stats, UNNEST(tfs) AS u(h) WHERE h.tf > 0
    ),
    dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM hits GROUP BY term),
    scored AS (
      SELECT h.doc_id,
             ln(1 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
               * h.tf * (1.2 + 1) / (h.tf + 1.2 * (1 - 0.75 + 0.75 * h.dl / c.avgdl)) AS s
      FROM hits h JOIN dfreq d USING (term), corpus c
    )
    SELECT doc_id, round(sum(s), 6) AS bm25
    FROM scored GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id LIMIT 15
    """,
    doc="BM25 keyword retrieval (Robertson/Sparck Jones IDF, Lucene "
    "ln(1+...) form): score all documents against a 4-term query, "
    "return the top 15.  Map-only per-doc tf/dl stage (posting-list "
    "shaped: only matching docs survive to the shuffle), broadcast "
    "1-row corpus stats + <=|terms|-row document frequencies, "
    "TakeOrdered top-k.  Scores rounded to 6dp pre-rank for "
    "engine-stable order (operators/text.py:bm25_topk).",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return tx.bm25_topk(
        d, ["join", "spark", "vector", "window"], id_col="doc_id", text_col="text", k=15
    )


@register(
    "text_vocab_oov",
    oracle=f"""
    WITH tok AS (SELECT source, unnest({_TOKS}) AS tok FROM documents),
    counts AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY tok),
    vocab AS (SELECT tok FROM counts ORDER BY cnt DESC, tok LIMIT 10)
    SELECT source, count(*) AS n_tokens,
           sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov,
           avg(CASE WHEN v.tok IS NULL THEN 1.0 ELSE 0.0 END) AS oov_rate
    FROM tok LEFT JOIN vocab v USING (tok)
    GROUP BY source
    """,
    doc="Tokenizer-vocabulary coverage gate: build the top-10 "
    "frequency vocabulary (ties lexicographic), then per-source OOV "
    "token rate via a broadcast probe — one token-level shuffle for "
    "the counts, map-only probe, partial-aggregated per-source rollup "
    "(operators/text.py:build_vocab,oov_stats).",
)
def text_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    vocab = tx.build_vocab(d, "text", vocab_size=10)
    return tx.oov_stats(d, vocab, "source", "text")


@register(
    "text_tfidf_terms",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
    tfs AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*)::DOUBLE AS df FROM tfs GROUP BY term),
    n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
    scored AS (
      SELECT t.doc_id, t.term,
             round((t.tf::DOUBLE / sum(t.tf) OVER (PARTITION BY t.doc_id))
                   * ln((1 + n.n_docs) / (1 + d.df)), 6) AS tfidf
      FROM tfs t JOIN dfreq d USING (term), n
    )
    SELECT doc_id, term, tfidf, rnk FROM (
      SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rnk
      FROM scored
    ) WHERE rnk <= 3
    """,
    doc="Per-document TF-IDF keyword extraction (top-3 terms, smoothed "
    "ln((1+N)/(1+df)) idf, 6dp pre-rank rounding): one (doc, term) "
    "partial-aggregated shuffle, vocabulary-bounded DF table broadcast "
    "back, doc length + rank sharing one doc-keyed exchange "
    "(operators/text.py:tfidf_top_terms).",
)
def text_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return tx.tfidf_top_terms(d, "doc_id", "text", top_n=3)


@register(
    "text_vocab_coverage",
    oracle=f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS tok FROM documents),
    counts AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY tok),
    ranked AS (
      SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rank
      FROM counts
    ),
    tot AS (SELECT sum(cnt)::DOUBLE AS total FROM counts)
    SELECT rank, cnt,
           round(sum(cnt) OVER (ORDER BY rank ROWS UNBOUNDED PRECEDING)
                 / tot.total, 6) AS coverage
    FROM ranked, tot
    WHERE rank <= 20
    """,
    doc="Vocabulary coverage curve: cumulative fraction of all token "
    "occurrences covered by the top-k vocabulary, k = 1..20 — the "
    "diagnostic that sizes a tokenizer vocab (where the curve flattens "
    "is where vocab growth stops paying).  One partial-aggregated "
    "token shuffle; the ranked relation is vocabulary-bounded so the "
    "cumulative window runs over <=|vocab| rows "
    "(operators/text.py:build_vocab's count table + one window).",
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(tx.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ranked = counts.select(
        "cnt",
        F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("tok"))).alias("rank"),
    )
    total = counts.agg(F.sum("cnt").cast("double").alias("total"))
    wcum = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    return (
        ranked.join(F.broadcast(total))
        .withColumn("coverage", F.round(F.sum("cnt").over(wcum) / F.col("total"), 6))
        .filter(F.col("rank") <= 20)
        .select("rank", "cnt", "coverage")
    )


@register(
    "text_langid_confusion",
    oracle="""
    WITH t AS (SELECT doc_id, lang, lower(trim(text)) AS s FROM documents),
    bg AS (
      SELECT doc_id, lang,
             unnest(list_transform(range(1, length(s)), i -> s[i:i+1])) AS b
      FROM t WHERE length(s) >= 2
    ),
    db AS (SELECT doc_id, lang, b, count(*) AS cnt FROM bg GROUP BY doc_id, lang, b),
    prof AS (
      SELECT plang, b, pcnt FROM (
        SELECT lang AS plang, b, sum(cnt) AS pcnt,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY sum(cnt) DESC, b) AS pr
        FROM db GROUP BY lang, b
      ) WHERE pr <= 30
    ),
    scores AS (
      SELECT d.doc_id, d.lang, p.plang, sum(d.cnt * p.pcnt) AS score
      FROM db d JOIN prof p USING (b) GROUP BY d.doc_id, d.lang, p.plang
    ),
    pred AS (
      SELECT doc_id, lang, plang AS predicted FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, plang) AS r
        FROM scores) WHERE r = 1
    ),
    dflt AS (SELECT min(plang) AS d FROM prof)
    SELECT t.lang, coalesce(p.predicted, dflt.d) AS predicted,
           count(*) AS n_docs
    FROM t LEFT JOIN pred p USING (doc_id), dflt
    GROUP BY t.lang, coalesce(p.predicted, dflt.d)
    """,
    doc="TRAINED language ID (Cavnar & Trenkle 1994 char-bigram "
    "profiles, upgrade of the stopword heuristic text_lang_id): top-30 "
    "bigram profiles per labeled language trained and applied in ONE "
    "plan, INTEGER dot-product scoring (no float-argmax cross-engine "
    "risk), ties lexicographic; output is the (true, predicted) "
    "confusion matrix.  On this synthetic corpus the languages share "
    "one vocabulary, so every doc collapses onto the dominant "
    "profile — exactly the degenerate matrix that tells a corpus "
    "owner the labels carry no signal "
    "(operators/text.py:langid_confusion).",
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return tx.langid_confusion(d, "lang", "doc_id", "text", profile_size=30)


@register(
    "text_pii_scrub",
    oracle="""
    WITH built AS (
      SELECT c_custkey,
             c_name || ' email user' || c_custkey::VARCHAR || '@example.com'
             || ' ip 10.0.' || (c_nationkey % 256)::VARCHAR || '.'
                            || (c_custkey % 256)::VARCHAR
             || ' card ' || lpad((c_custkey * 7919)::VARCHAR, 16, '0')
             || ' phone 555-' || lpad((c_custkey % 10000)::VARCHAR, 4, '0')
                   || '-' || lpad((c_custkey % 9999)::VARCHAR, 4, '0')
             || ' segment ' || c_mktsegment AS t
      FROM customer
    ), stages AS (
      SELECT c_custkey, t AS s0,
        regexp_replace(t,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS s1
      FROM built
    ), stages2 AS (
      SELECT *, regexp_replace(s1,
          '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g') AS s2
      FROM stages
    ), stages3 AS (
      SELECT *, regexp_replace(s2, '\\b\\d{13,19}\\b', '<CARDNUM>', 'g') AS s3
      FROM stages2
    )
    SELECT c_custkey,
      regexp_replace(s3,
        '\\b\\d{3}[- ]\\d{3,4}[- ]\\d{4}\\b', '<PHONE>', 'g') AS scrubbed,
      (len(regexp_extract_all(s0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
     + len(regexp_extract_all(s1, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))
     + len(regexp_extract_all(s2, '\\b\\d{13,19}\\b'))
     + len(regexp_extract_all(s3, '\\b\\d{3}[- ]\\d{3,4}[- ]\\d{4}\\b')))::INT
        AS n_masked
    FROM stages3
    """,
    doc="PII scrubbing (operators/text.py:scrub_pii): mask emails, "
    "IPv4s, card-length digit runs and phone-shaped digit groups with "
    "literal sentinels + per-row mask audit count.  Map-only "
    "regexp_replace chain (whole-stage codegen, zero shuffle — runs at "
    "parquet-scan speed at 100 TB); patterns restricted to the "
    "Java-regex/RE2 common dialect.  The PII-laden input is built "
    "deterministically from customer columns IDENTICALLY in both "
    "engines, so the oracle exercises the scrub on every row.",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.text import scrub_pii

    c = table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    built = c.select(
        "c_custkey",
        F.concat(
            F.col("c_name"),
            F.lit(" email user"), k.cast("string"), F.lit("@example.com"),
            F.lit(" ip 10.0."), (F.col("c_nationkey") % 256).cast("string"),
            F.lit("."), (k % 256).cast("string"),
            F.lit(" card "), F.lpad((k * 7919).cast("string"), 16, "0"),
            F.lit(" phone 555-"), F.lpad((k % 10000).cast("string"), 4, "0"),
            F.lit("-"), F.lpad((k % 9999).cast("string"), 4, "0"),
            F.lit(" segment "), F.col("c_mktsegment"),
        ).alias("t"),
    )
    return scrub_pii(built, "t", out_col="scrubbed").select(
        "c_custkey", "scrubbed", "n_masked"
    )


@register(
    "text_strip_repeated_chars_keep_first",
    oracle="""
    WITH w AS (
      SELECT doc_id, i AS pos, substr(text, i, 50) AS span
      FROM documents, UNNEST(range(1, length(text) - 48)) AS u(i)
      WHERE length(text) >= 50
    ), c AS (SELECT span FROM w GROUP BY span HAVING count(*) >= 2),
    s AS (SELECT w.doc_id, w.pos FROM w JOIN c USING (span)),
    b AS (
      SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                    OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) >= 50
                  THEN 1 ELSE 0 END AS brk
      FROM s
    ), isl AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS g
      FROM b
    ), iv AS (
      SELECT isl.doc_id, min(pos) AS start_char, max(pos) + 49 AS end_char,
             substr(d.text, min(pos)::INT, (max(pos) + 49 - min(pos) + 1)::INT)
               AS span
      FROM isl JOIN documents d USING (doc_id)
      GROUP BY isl.doc_id, g, d.text
    ), losers AS (
      SELECT doc_id, start_char, end_char FROM (
        SELECT doc_id, start_char, end_char,
               row_number() OVER (PARTITION BY span
                                  ORDER BY doc_id, start_char) AS rk
        FROM iv
      ) WHERE rk > 1
    ), cov AS (
      SELECT DISTINCT doc_id, unnest(range(start_char, end_char + 1)) AS p
      FROM losers
    ), chars AS (
      SELECT d.doc_id, i, substr(d.text, i::INT, 1) AS ch
      FROM documents d, UNNEST(range(1, length(d.text) + 1)) AS u(i)
    ), kept AS (
      SELECT chars.doc_id, i, ch
      FROM chars LEFT JOIN cov ON chars.doc_id = cov.doc_id AND chars.i = cov.p
      WHERE cov.p IS NULL
    ), rebuilt AS (
      SELECT doc_id, string_agg(ch, '' ORDER BY i) AS ct FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id, coalesce(r.ct, '') AS clean_text
    FROM documents d LEFT JOIN rebuilt r USING (doc_id)
    """,
    doc="Lee et al. 2021's dedup ACTION at char granularity, KEEP-ONE "
    "variant (operators/dedup.py:strip_repeated_char_spans_keep_first): "
    "one keeper occurrence per distinct maximal repeated span "
    "(smallest (doc, start)), every other occurrence cut out; the cut "
    "is a JVM aggregate-HOF fold over each doc's sorted disjoint "
    "removal intervals — no Python, one doc-keyed exchange of the tiny "
    "interval relation.",
)
def text_strip_repeated_chars_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.dedup import (
        strip_repeated_char_spans_keep_first,
    )

    d = table(spark, sf_dir, "documents")
    return strip_repeated_char_spans_keep_first(
        d, "doc_id", "text", n=50, min_count=2
    )


@register(
    "text_heavy_hitters",
    oracle=f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS tok FROM documents),
         n AS (SELECT count(*) AS total FROM tok)
    SELECT tok, count(*) AS cnt
    FROM tok, n
    GROUP BY tok, n.total
    HAVING count(*) > n.total / 64
    """,
    doc="Certified heavy hitters (operators/text.py:"
    "certified_heavy_hitters): exactly the tokens with global count "
    "> N/64, via per-partition Misra-Gries candidate summaries "
    "(vectorized per-Arrow-batch value_counts, <= 64 counters, "
    "mergeable-summaries reduction) + an exact recount of the "
    "broadcast candidate set.  The exchange is bounded by "
    "|candidates| x partitions, never the token key space — the "
    "open-domain-column alternative to a full groupBy count at "
    "100 TB.",
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.text import (
        certified_heavy_hitters,
        tokens,
    )

    d = table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokens(F.col("text"))).alias("tok"))
    return certified_heavy_hitters(toks, "tok", k_capacity=64)


@register(
    "text_normalize_ccnet",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(
             regexp_replace(
               regexp_replace(lower(trim(text)), '[0-9]', '0', 'g'),
               '[^a-z0-9\\s]', '', 'g'),
             '\\s+', ' ', 'g')) AS normalized,
           md5(trim(regexp_replace(
             regexp_replace(
               regexp_replace(lower(trim(text)), '[0-9]', '0', 'g'),
               '[^a-z0-9\\s]', '', 'g'),
             '\\s+', ' ', 'g'))) AS norm_fp
    FROM documents
    """,
    doc="CCNet hashing normalization (Wenzek et al. 2019; operators/"
    "text.py:normalize_ccnet): lowercase, digits->0, punctuation "
    "stripped, whitespace collapsed, plus the md5 fingerprint of the "
    "normalized form — the paragraph-dedup pre-hash step as a "
    "standalone map-only pass.",
)
def text_normalize_ccnet(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.text import normalize_ccnet

    d = table(spark, sf_dir, "documents")
    norm = normalize_ccnet(F.col("text"))
    return d.select("doc_id", norm.alias("normalized"), F.md5(norm).alias("norm_fp"))


@register(
    "text_url_canonicalize",
    oracle="""
    WITH built AS (
      SELECT doc_id,
             'HTTP://WWW.' || upper(source) || '.Example.COM:80/doc/'
               || doc_id::VARCHAR || '?utm_source=feed&id='
               || (doc_id % 7)::VARCHAR || '&utm_campaign=x#frag'
               || doc_id::VARCHAR AS u
      FROM documents
    ), s1 AS (
      SELECT doc_id, regexp_replace(u, '#.*$', '', 'g') AS u FROM built
    ), s2 AS (
      SELECT doc_id,
             CASE WHEN regexp_extract(u, '^([^/]*//[^/?]+)', 1) = '' THEN u
                  ELSE regexp_replace(
                         lower(regexp_extract(u, '^([^/]*//[^/?]+)', 1)),
                         '^(http://[^/:?]+):80$', '\\1', 'g')
                       || regexp_replace(u, '^[^/]*//[^/?]+', '', 'g')
             END AS u
      FROM s1
    ), s4 AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(u,
               '([?&])utm_[^&#]*', '\\1', 'g'), '&&+', '&', 'g'),
               '\\?&', '?', 'g'), '[?&]+$', '', 'g') AS u
      FROM s2
    )
    SELECT doc_id, u AS url_canon,
           regexp_extract(u, '^[^/]*//([^/:?]+)', 1) AS domain
    FROM s4
    """,
    doc="URL canonicalization (operators/text.py:canonicalize_url + "
    "url_domain): lowercase scheme+authority, strip http's default "
    ":80 (authority-scoped), drop fragment, remove utm_* tracking "
    "params — the crawl-curation "
    "normalization before URL dedup / domain mixing.  Map-only "
    "backreference-free regex chain (whole-stage codegen, zero "
    "exchanges); the messy input URL is built deterministically from "
    "document columns IDENTICALLY in both engines, so every row "
    "exercises every rule.",
)
def text_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.text import (
        canonicalize_url,
        url_domain,
    )

    d = table(spark, sf_dir, "documents")
    k = F.col("doc_id")
    messy = F.concat(
        F.lit("HTTP://WWW."), F.upper("source"), F.lit(".Example.COM:80/doc/"),
        k.cast("string"), F.lit("?utm_source=feed&id="),
        (k % 7).cast("string"), F.lit("&utm_campaign=x#frag"), k.cast("string"),
    )
    canon = canonicalize_url(messy)
    return d.select(
        "doc_id", canon.alias("url_canon"), url_domain(canon).alias("domain")
    )


@register(
    "dedup_by_url",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'http://www.' || lower(source) || '.example.com/doc/'
               || (doc_id % 50)::VARCHAR AS url_canon
      FROM documents
    )
    SELECT url_canon, min(doc_id) AS keep_doc, count(*) AS n_dups
    FROM u GROUP BY url_canon
    """,
    doc="URL-level exact dedup (the step after canonicalize_url in a "
    "crawl pipeline): group by canonical URL, keep the lowest doc id, "
    "report the duplicate count.  Collisions planted via doc_id % 50 "
    "so every group is a real multi-doc cluster.  One hash exchange "
    "with map-side partial aggregation (min/count combine).",
)
def dedup_by_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("http://www."), F.lower("source"), F.lit(".example.com/doc/"),
        (F.col("doc_id") % 50).cast("string"),
    )
    return (
        d.select(url.alias("url_canon"), "doc_id")
        .groupBy("url_canon")
        .agg(F.min("doc_id").alias("keep_doc"), F.count(F.lit(1)).alias("n_dups"))
    )


@register(
    "text_blocklist_gate",
    oracle="""
    WITH built AS (
      SELECT doc_id, source, text,
             'http://' || source || '.example.com/doc/' || doc_id::VARCHAR
               AS url
      FROM documents
    ), scored AS (
      SELECT doc_id,
             regexp_extract(url, '^[^/]*//([^/:?]+)', 1) AS domain,
             CASE WHEN len(list_filter(string_split_regex(lower(trim(text)),
                        '\\s+'), x -> x != '')) > 0
                  THEN len(list_filter(list_filter(
                         string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x != ''),
                       x -> list_contains(['slow', 'big'], x)))
                       / len(list_filter(string_split_regex(lower(trim(text)),
                             '\\s+'), x -> x != ''))::DOUBLE
                  ELSE 0.0 END AS badword_ratio
      FROM built
    )
    SELECT doc_id, domain, round(badword_ratio, 4) AS badword_ratio
    FROM scored
    WHERE domain NOT IN ('src0.example.com', 'src7.example.com')
      AND badword_ratio <= 0.07
    """,
    doc="FineWeb/CCNet-style source gate (operators/text.py:"
    "blocklist_gate): synthesized per-source URLs, a 2-domain "
    "blocklist joined BROADCAST LEFT-ANTI on the extracted domain "
    "(corpus never reshuffles), and a bad-word occurrence-ratio cap — "
    "a map-only token filter.  Survivors carry (domain, "
    "badword_ratio) for downstream stratified mixing.",
)
def text_blocklist_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.text import blocklist_gate

    d = table(spark, sf_dir, "documents").withColumn(
        "url",
        F.concat(
            F.lit("http://"), F.col("source"), F.lit(".example.com/doc/"),
            F.col("doc_id").cast("string"),
        ),
    )
    blocked = spark.createDataFrame(
        [("src0.example.com",), ("src7.example.com",)], "domain string"
    )
    out = blocklist_gate(
        d, "url", "text", blocked, badwords=["slow", "big"],
        max_badword_ratio=0.07,
    )
    return out.select(
        "doc_id", "domain", F.round("badword_ratio", 4).alias("badword_ratio")
    )


@register(
    "text_quality_classifier",
    # PROMOTED to the bench headline set in r13: the north-star
    # LLM-pipeline scoring path (explode + partial-agg over every token
    # of the corpus) under the driver's 2x regression gate — the same
    # rationale as the r11 graph/pipeline promotions.  The untrained
    # variant benches: deterministic weights, no training variance.
    bench=True,
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(trim(text)),
                    '\\s+'), x -> x != '')) AS t
      FROM documents
    ), w AS (
      SELECT doc_id,
             ((((""" + _HEX_BASE + """) % 4096) * 2654435761)
              % 2147483648) / 2147483648.0 * 2 - 1 AS wt
      FROM tok
    ), agg AS (
      SELECT doc_id, count(*) AS n_tokens, sum(wt) AS sw FROM w GROUP BY 1
    )
    SELECT doc_id, n_tokens,
           round(1.0 / (1.0 + exp(-4.0 * sw / n_tokens)), 6) AS score,
           (1.0 / (1.0 + exp(-4.0 * sw / n_tokens))) > 0.5 AS keep
    FROM agg
    """,
    doc="FastText-style hashed linear quality classifier "
    "(operators/text.py:quality_classifier_score — the FineWeb-Edu / "
    "CCNet filter shape): per-token bucket hash + fixed weight lookup "
    "as codegen expressions, explode + partial-aggregated groupBy (one "
    "exchange of (doc, partial sums)), logistic of the mean weight, "
    "keep flag at 0.5.  Deterministic hash-derived weights stand in "
    "for trained coefficients; the distributed scoring path is the "
    "deliverable.",
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.text import (
        quality_classifier_score,
    )

    d = table(spark, sf_dir, "documents", spread=True)
    return quality_classifier_score(d, "doc_id", "text")


_QC_WEIGHTS_EXPORT = export_path("quality_classifier_weights")


@register(
    "text_quality_classifier_trained",
    oracle=f"""
    WITH wt AS (
      SELECT bucket, weight
      FROM read_parquet('{_QC_WEIGHTS_EXPORT}/*.parquet') WHERE bucket >= 0
    ), bias AS (
      SELECT weight
      FROM read_parquet('{_QC_WEIGHTS_EXPORT}/*.parquet') WHERE bucket = -1
    ), tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(trim(text)),
                    '\\s+'), x -> x != '')) AS t
      FROM documents
    ), b AS (
      SELECT doc_id, ({_HEX_BASE}) % 4096 AS bucket FROM tok
    ), agg AS (
      SELECT doc_id, count(*) AS n_tokens,
             sum(coalesce(wt.weight, 0.0)) AS sw
      FROM b LEFT JOIN wt USING (bucket) GROUP BY 1
    )
    SELECT doc_id, n_tokens,
           round(1.0 / (1.0 + exp(-(sw / n_tokens
                 + (SELECT weight FROM bias)))), 6) AS score,
           (1.0 / (1.0 + exp(-(sw / n_tokens
                 + (SELECT weight FROM bias))))) > 0.5 AS keep
    FROM agg
    """,
    doc="TRAINED hashed linear quality classifier (operators/text.py:"
    "quality_classifier_train): logistic regression fit IN-ENGINE over "
    "L1-normalized token-bucket frequencies, weak supervision from the "
    "Gopher stopword-density rule (Rae et al. 2021 stopword signal at "
    "a 0.02 occurrence-ratio threshold), 16 full-batch gradient "
    "supersteps via the kmeans broadcast-coefficient pattern — each "
    "superstep ONE pass over the persisted doc-partitioned feature "
    "set, gradients folded per bucket and collected (n_buckets rows). "
    "Scoring reuses the explode + partial-agg plumbing with the fitted "
    "coefficients broadcast in.  Oracle is WEIGHTS-CONDITIONED "
    "(dataset_api_kmeans pattern): the query exports (bucket, weight) "
    "+ bias, DuckDB independently re-scores every document.",
)
def text_quality_classifier_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.text import (
        GOPHER_STOPWORDS,
        quality_classifier_score,
        quality_classifier_train,
        tokens,
    )

    d = table(spark, sf_dir, "documents", spread=True)
    # weak supervision: Gopher stopword-density rule (occurrence count,
    # not distinct membership — the CCNet/Gopher ratio convention)
    t = tokens(F.col("text"))
    stop = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(stop, x)))
    label = (F.size(t) > 0) & ((n_stop / F.size(t)) >= 0.02)
    labeled = d.select("doc_id", "text", label.cast("int").alias("label"))
    weights, bias = quality_classifier_train(labeled, "doc_id", "text", "label")
    spark.createDataFrame(
        list(enumerate(weights)) + [(-1, bias)], "bucket int, weight double"
    ).coalesce(1).write.mode("overwrite").parquet(_QC_WEIGHTS_EXPORT)
    return quality_classifier_score(
        d, "doc_id", "text", weights=weights, bias=bias
    )


def _bpe_train_oracle_batched(
    num_merges: int, min_freq: int, merges_per_round: int
) -> str:
    """INDEPENDENT DuckDB re-derivation of the BATCHED BPE merge loop
    (operators/text.py:bpe_train with ``merges_per_round=m``): per
    round ONE materialized pair-count CTE, then m unrolled greedy
    slots — slot j is the argmax over pairs symbol-DISJOINT from slots
    1..j-1 (exactly the trainer's greedy ranked scan) — and one state
    CTE applying all selected merges as nested guard-wrapped
    ``replace()``.  Slots can be empty (NULL-guarded CASE leaves the
    state untouched); ranks come from a row_number over (round, slot).
    The static unroll assumes every round fills its slots (true
    whenever >= m disjoint pairs clear ``min_freq`` — any real corpus);
    a shortfall would shift the trainer's later rounds off the static
    schedule and surface as a hash mismatch, never a false pass."""
    W = "chr(31)"
    E = "chr(30)"
    parts = [f"""
WITH wf AS MATERIALIZED (
  SELECT w, count(*)::BIGINT AS n FROM (
    SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                  x -> x != '')) AS w
    FROM documents) GROUP BY w
), s0 AS MATERIALIZED (
  SELECT n, list_aggregate(list_transform(string_split(w, ''),
         c -> {W}||c||{E}), 'string_agg', '') AS s
  FROM wf
)"""]
    schedule = []
    left = num_merges
    while left > 0:
        schedule.append(min(merges_per_round, left))
        left -= schedule[-1]
    rank_rows = []
    for i, mi in enumerate(schedule, start=1):
        parts.append(f""", p{i} AS MATERIALIZED (
  SELECT z[1] AS a, z[2] AS b, sum(n)::BIGINT AS freq
  FROM (
    SELECT n, unnest(list_zip(l, l[2:])) AS z
    FROM (SELECT n, string_split(substr(s, 2, length(s) - 2),
                                 {E}||{W}) AS l FROM s{i - 1})
  ) WHERE z[2] IS NOT NULL
  GROUP BY 1, 2 HAVING sum(n) >= {min_freq}
)""")
        for j in range(1, mi + 1):
            excl = " AND ".join(
                f"NOT EXISTS (SELECT 1 FROM b{i}_{jj} s "
                f"WHERE p.a IN (s.a, s.b) OR p.b IN (s.a, s.b))"
                for jj in range(1, j)
            )
            where = f"WHERE {excl}" if excl else ""
            parts.append(f""", b{i}_{j} AS MATERIALIZED (
  SELECT a, b, freq FROM p{i} p {where}
  ORDER BY freq DESC, a, b LIMIT 1
)""")
            rank_rows.append(
                f'SELECT {i} AS rnd, {j} AS slot, a AS "left", '
                f'b AS "right", freq FROM b{i}_{j}'
            )
        joins = " ".join(
            f"LEFT JOIN b{i}_{j} m{j} ON TRUE" for j in range(1, mi + 1)
        )
        expr = "s"
        for j in range(1, mi + 1):
            expr = (
                f"CASE WHEN m{j}.a IS NULL THEN {expr} "
                f"ELSE replace({expr}, {W}||m{j}.a||{E}||{W}||m{j}.b||{E}, "
                f"{W}||m{j}.a||m{j}.b||{E}) END"
            )
        parts.append(f""", s{i} AS MATERIALIZED (
  SELECT n, {expr} AS s FROM s{i - 1} {joins}
)""")
    union = "\nUNION ALL ".join(rank_rows)
    parts.append(f"""
SELECT (row_number() OVER (ORDER BY rnd, slot) - 1)::INT AS rank,
       "left", "right", freq
FROM ({union}) ORDER BY rank
""")
    return "".join(parts)


def _bpe_train_oracle(num_merges: int, min_freq: int) -> str:
    """Fully INDEPENDENT DuckDB re-derivation of the BPE merge loop.

    The merge loop is iterative, but the iteration count is a query
    constant (12), so the oracle unrolls it: per round, one argmax over
    the weighted adjacent-pair counts (same tie-breaks: freq desc, then
    (a, b) lexicographic — both engines compare binary) followed by a
    merge application.  Symbol lists are carried as guard-wrapped
    strings ``chr(31)||sym||chr(30)`` so SQL ``replace()`` — which
    substitutes left-to-right non-overlapping — implements exactly the
    trainer's fold semantics (``[a,a,a]`` with pair ``(a,a)`` ->
    ``[aa,a]``).  Every CTE is MATERIALIZED so the 12 rounds cost 12
    vocab scans, not an exponential inline blow-up.  Early stop: best
    pair frequency is non-increasing across rounds (a merge can only
    create pairs no more frequent than itself), so filtering the final
    rows to ``freq >= min_freq`` — with a CASE that leaves the state
    unmodified on a sub-threshold round — is equivalent to the
    trainer's break.
    """
    W = "chr(31)"  # symbol-open guard
    E = "chr(30)"  # symbol-close guard
    parts = [f"""
WITH wf AS MATERIALIZED (
  SELECT w, count(*)::BIGINT AS n FROM (
    SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                  x -> x != '')) AS w
    FROM documents) GROUP BY w
), s0 AS MATERIALIZED (
  SELECT n, list_aggregate(list_transform(string_split(w, ''),
         c -> {W}||c||{E}), 'string_agg', '') AS s
  FROM wf
)"""]
    for i in range(1, num_merges + 1):
        parts.append(f""", b{i} AS MATERIALIZED (
  SELECT z[1] AS a, z[2] AS b, sum(n)::BIGINT AS freq
  FROM (
    SELECT n, unnest(list_zip(l, l[2:])) AS z
    FROM (SELECT n, string_split(substr(s, 2, length(s) - 2),
                                 {E}||{W}) AS l FROM s{i - 1})
  ) WHERE z[2] IS NOT NULL
  GROUP BY 1, 2 ORDER BY freq DESC, a, b LIMIT 1
), s{i} AS MATERIALIZED (
  SELECT n, CASE WHEN bst.freq >= {min_freq}
    THEN replace(s, {W}||bst.a||{E}||{W}||bst.b||{E}, {W}||bst.a||bst.b||{E})
    ELSE s END AS s
  FROM s{i - 1} LEFT JOIN b{i} bst ON TRUE
)""")
    rows = "\nUNION ALL ".join(
        f'SELECT {i - 1} AS rank, a AS "left", b AS "right", freq FROM b{i}'
        for i in range(1, num_merges + 1)
    )
    parts.append(f"""
SELECT * FROM ({rows}) WHERE freq >= {min_freq} ORDER BY rank
""")
    return "".join(parts)


@register(
    "text_bpe_train",
    oracle=_bpe_train_oracle(num_merges=12, min_freq=2),
    doc="IN-ENGINE BPE tokenizer training (operators/text.py:"
    "bpe_train — Sennrich et al. 2016): ONE corpus-sized pass builds "
    "the distinct-word frequency table, then each merge round is one "
    "pair-count shuffle of VOCAB rows (never the corpus) + a top-1 to "
    "the driver + a map-only fold applying the merge.  Deterministic "
    "tie-breaks (freq desc, pair lexicographic).  Returns the learned "
    "merge table in order.  INDEPENDENT oracle: DuckDB re-derives the "
    "full merge sequence from the raw corpus (unrolled per-round "
    "argmax + guard-wrapped replace()), no conditioning export needed.",
)
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.text import bpe_train

    d = table(spark, sf_dir, "documents")
    merges, vocab = bpe_train(d, "text", num_merges=12, min_freq=2)
    vocab.unpersist()
    return spark.createDataFrame(
        [(i, a, b, f) for i, (a, b, f) in enumerate(merges)],
        "rank int, left string, right string, freq long",
    )


@register(
    "text_bpe_train_batched",
    oracle=_bpe_train_oracle_batched(
        num_merges=12, min_freq=2, merges_per_round=3
    ),
    doc="BATCHED BPE training (operators/text.py:bpe_train with "
    "merges_per_round=3 — the standard production batching trick): "
    "per round ONE pair-count shuffle + greedy top-m SYMBOL-DISJOINT "
    "selection + one fold applying all m, cutting the driver-job "
    "count per vocab from num_merges to ceil(num_merges/m) — a 32k "
    "vocab goes from 32k jobs to ~10.7k at m=3 (and m scales up). "
    "Disjoint merges cannot perturb each other's adjacency counts, "
    "so within a round every selection's frequency is exact; the "
    "divergence vs sequential BPE (a merge creating a new pair that "
    "outranks a later same-round pick) is the documented, bounded "
    "approximation.  INDEPENDENT oracle: DuckDB re-derives the full "
    "batched schedule — per-round pair counts, m unrolled greedy "
    "disjoint-argmax slots, nested replace() application.",
)
def text_bpe_train_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.text import bpe_train

    d = table(spark, sf_dir, "documents")
    merges, vocab = bpe_train(
        d, "text", num_merges=12, min_freq=2, merges_per_round=3
    )
    vocab.unpersist()
    return spark.createDataFrame(
        [(i, a, b, f) for i, (a, b, f) in enumerate(merges)],
        "rank int, left string, right string, freq long",
    )


_BPE_VOCAB_EXPORT = export_path("bpe_vocab")


@register(
    "text_bpe_tokenize",
    oracle=f"""
    WITH voc AS (
      SELECT word, n_sym FROM read_parquet('{_BPE_VOCAB_EXPORT}/*.parquet')
    ), tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(trim(text)),
                    '\\s+'), x -> x != '')) AS w
      FROM documents
    )
    SELECT doc_id, count(*) AS n_words,
           sum(coalesce(v.n_sym, len(w)))::BIGINT AS n_bpe_tokens
    FROM tok LEFT JOIN voc v ON v.word = tok.w
    GROUP BY doc_id
    """,
    doc="Tokenize the corpus with the in-engine-trained BPE vocab "
    "(operators/text.py:bpe_tokenize): tokenization is a JOIN against "
    "the word -> symbols table (explode + equi-join + partial-agg "
    "groupBy(doc)), never a re-run of the merge loop; OOV words fall "
    "back to the character base alphabet.  VOCAB-CONDITIONED oracle "
    "(the kmeans/classifier pattern): the query exports "
    "(word, n_sym), DuckDB independently recomputes every document's "
    "BPE token count from it.",
)
def text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.text import (
        bpe_tokenize,
        bpe_train,
    )

    d = table(spark, sf_dir, "documents")
    _, vocab = bpe_train(d, "text", num_merges=12, min_freq=2)
    vocab.select(
        F.col("__w").alias("word"), F.size("__sym").alias("n_sym")
    ).coalesce(1).write.mode("overwrite").parquet(_BPE_VOCAB_EXPORT)
    out = bpe_tokenize(d, "doc_id", "text", vocab)
    vocab.unpersist()
    return out


@register(
    "text_pmi_collocations",
    oracle="""
    WITH toks AS (
      SELECT list_filter(string_split_regex(lower(trim(text)), '\\s+'),
             x -> x != '') AS ts
      FROM documents
    ), pairs AS (
      SELECT z[1] AS a, z[2] AS b
      FROM (
        SELECT unnest(list_zip(ts, ts[2:])) AS z FROM toks
      ) WHERE z[2] IS NOT NULL
    ), pc AS (
      SELECT a, b, count(*) AS c_ab FROM pairs GROUP BY 1, 2
    ), lm AS (SELECT a, count(*) AS c_a FROM pairs GROUP BY 1),
    rm AS (SELECT b, count(*) AS c_b FROM pairs GROUP BY 1),
    tot AS (SELECT count(*) AS n FROM pairs),
    scored AS (
      SELECT pc.a, pc.b, c_ab,
             round(ln(c_ab::DOUBLE * n / (c_a::DOUBLE * c_b)), 6) AS pmi
      FROM pc JOIN lm ON pc.a = lm.a JOIN rm ON pc.b = rm.b CROSS JOIN tot
      WHERE c_ab >= 5
    )
    SELECT a, b, c_ab, pmi FROM (
      SELECT *, row_number() OVER (
        ORDER BY pmi DESC, c_ab DESC, a, b) AS rn
      FROM scored
    ) WHERE rn <= 50
    """,
    doc="Collocation mining by pointwise mutual information "
    "(operators/text.py:pmi_collocations — Church & Hanks 1990): "
    "top-50 adjacent-token pairs by log(p(ab)/(p(a)p(b))) with "
    "min_count 5.  Map-only bigram extraction, three partial-agg "
    "groupBys (Zipf-skew-immune), min_count pruning BEFORE the margin "
    "joins, global top-k.",
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return tx.pmi_collocations(d, "text", min_count=5, top_k=50)
