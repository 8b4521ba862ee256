"""Text-analysis operators for large-scale training-data pipelines.

North-star extensions (SURVEY.md §2.16): tokenization, shingling,
quality scoring, language-ID heuristic, fingerprinting.  All pure
Column expressions (JVM-side, whole-stage-codegen) — no Python in the
hot path, so these scale linearly with input splits at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

# A tiny deterministic English stopword set for quality/lang heuristics.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(text: Column) -> Column:
    """Whitespace tokenization of lower-cased text (empty tokens dropped)."""
    return F.filter(F.split(F.lower(F.trim(text)), r"\s+"), lambda t: t != "")


def md5_base28(c: Column) -> Column:
    """Repo-standard engine-portable hash base: the first 7 hex digits
    of md5 as a 28-bit integer.  Every corpus-hashing operator (MinHash
    family, winnowing grams, feature hashing) derives from this one
    definition; the DuckDB mirror is ``queries/dedup._duck_gram_base``
    — change them in lockstep or every hash oracle diverges."""
    return F.conv(F.substring(F.md5(c), 1, 7), 16, 10).cast("long")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def distinct_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def avg_token_length(text: Column) -> Column:
    t = tokens(text)
    return F.when(
        F.size(t) > 0,
        F.aggregate(t, F.lit(0).cast("double"), lambda acc, x: acc + F.length(x)) / F.size(t),
    ).otherwise(F.lit(0.0))


def stopword_ratio(text: Column) -> Column:
    t = tokens(text)
    stop = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS)))
    return F.when(F.size(t) > 0, stop / F.size(t)).otherwise(F.lit(0.0))


def word_ngrams(text: Column, k: int = 3) -> Column:
    """Word k-grams in document order (duplicates kept), space-joined.

    Built from zip_with over shifted slices rather than
    ``transform(sequence, i -> element_at(t, i+j))``: an outer array
    captured inside a HOF lambda is re-evaluated PER ELEMENT (the whole
    tokenize pipeline, O(n^2) per row — measured ~10x on the minhash
    bench); zip_with's inputs are direct children evaluated once per row.
    """
    t = tokens(text)
    acc = t
    for j in range(1, k):
        shifted = F.slice(t, j + 1, F.greatest(F.size(t) - j, F.lit(0)))
        acc = F.zip_with(
            acc,
            shifted,
            lambda x, y: F.when(
                x.isNull() | y.isNull(), F.lit(None)
            ).otherwise(F.concat(x, F.lit(" "), y)),
        )
    return F.filter(acc, lambda s: s.isNotNull())


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-grams, joined with single spaces."""
    return F.array_distinct(word_ngrams(text, k))


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality score: length band + lexical diversity
    + stopword presence (the classic cheap pre-filter for LLM corpora)."""
    n = token_count(text)
    div = F.when(n > 0, distinct_token_count(text) / n).otherwise(F.lit(0.0))
    len_band = F.when((n >= 20) & (n <= 1000), F.lit(1.0)).otherwise(
        F.when(n > 0, F.lit(0.5)).otherwise(F.lit(0.0))
    )
    stop = stopword_ratio(text)
    stop_band = F.when((stop >= 0.05) & (stop <= 0.6), F.lit(1.0)).otherwise(F.lit(0.5))
    return (len_band + div + stop_band) / F.lit(3.0)


def lang_id(text: Column) -> Column:
    """N-gram/stopword language heuristic: predict 'en' when English
    stopword ratio clears a threshold, else 'other'. (Deterministic;
    a real model would be a broadcast n-gram table lookup.)"""
    return F.when(stopword_ratio(text) >= 0.08, F.lit("en")).otherwise(F.lit("other"))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 over whitespace-normalized lower-cased
    text — identical content (modulo spacing/case) collides by design."""
    return F.md5(F.concat_ws(" ", tokens(text)))


# engine-portable subword split: letter runs, digit runs, punctuation runs
# (the GPT-2-style pre-tokenizer shape, without unicode categories so the
# same pattern means the same thing in Spark's Java regex and DuckDB's RE2)
SUBWORD_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9\\s]+"


def subword_tokens(text: Column) -> Column:
    """BPE-ish pre-tokenization: split lower-cased text into letter /
    digit / punctuation runs — the unit a byte-pair tokenizer merges
    from, and a far better LLM-cost proxy than whitespace words."""
    return F.regexp_extract_all(F.lower(F.trim(text)), F.lit(SUBWORD_PATTERN), 0)


def subword_count(text: Column) -> Column:
    return F.size(subword_tokens(text))


# PII-shaped scrubbing patterns.  Engine-portable (Java regex == RE2
# here: no lookarounds, no unicode classes) so oracles run them verbatim.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "phone": r"\+?[0-9][0-9()\-\s]{7,}[0-9]",
}


def scrub_count(text: Column, pattern: str) -> Column:
    """How many pattern occurrences a scrub of ``text`` would redact."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0))


def scrub(text: Column, pattern: str, replacement: str = "[REDACTED]") -> Column:
    """Redact every occurrence of ``pattern`` (a PII regex from
    ``PII_PATTERNS``, or any blocklist regex) with ``replacement``.

    Pure Column (regexp_replace — JVM, whole-stage-codegen, map-only):
    the standard PII / blocklist scrub pass of a corpus pipeline costs
    one linear scan at 100 TB, no shuffle.
    """
    return F.regexp_replace(text, pattern, replacement)


def lines(text: Column) -> Column:
    """Non-empty trimmed lines of a document."""
    return F.filter(
        F.transform(F.split(text, "\n"), lambda s: F.trim(s)), lambda s: s != ""
    )


def duplicate_line_fraction(text: Column) -> Column:
    """Fraction of a document's lines that repeat an earlier line — the
    Gopher repetition filter family (Rae et al. 2021, public): pages
    dominated by repeated lines (menus, boilerplate) score high and get
    dropped before LLM training."""
    ls = lines(text)
    return F.when(
        F.size(ls) > 0,
        1.0 - F.size(F.array_distinct(ls)) / F.size(ls),
    ).otherwise(F.lit(0.0))


def repetition_stats(df, id_col: str, text_col: str, k: int = 2):
    """Gopher-style per-document repetition signals (Rae et al. 2021):
    ``(id, n_lines, dup_line_frac, top_ngram_share)`` where
    ``top_ngram_share`` is the fraction of all word-k-gram occurrences
    taken by the document's single most frequent k-gram.

    Scale: the k-gram mode runs as explode -> two partial-aggregated
    groupBys keyed by (doc, gram) then doc — fully distributed, no
    per-row Python, and no O(n^2) HOF re-evaluation (an outer array
    captured in a higher-order-function lambda re-evaluates per
    element; the explode path reads each gram once)."""
    ident = F.col(id_col)
    base = df.select(
        ident,
        F.size(lines(F.col(text_col))).alias("n_lines"),
        duplicate_line_fraction(F.col(text_col)).alias("dup_line_frac"),
    )
    share = (
        df.select(ident, F.explode(word_ngrams(F.col(text_col), k)).alias("__g"))
        .groupBy(id_col, "__g")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(id_col)
        .agg((F.max("__c") / F.sum("__c")).alias("top_ngram_share"))
    )
    return base.join(share, id_col, "left").select(
        ident,
        F.col("n_lines"),
        F.col("dup_line_frac"),
        F.coalesce(F.col("top_ngram_share"), F.lit(0.0)).alias("top_ngram_share"),
    )


def decontaminate(df, benchmark, id_col: str, text_col: str,
                  bench_text_col: str | None = None, n: int = 5):
    """Benchmark decontamination: flag training documents sharing any
    word n-gram with a (small) benchmark/eval corpus — the published
    GPT-3-style n-gram overlap filter (Brown et al. 2020 used 13-grams;
    ``n`` is a parameter because synthetic test docs are short).

    Returns ``df`` + a boolean ``contaminated`` column.  Scale: the
    benchmark's distinct n-grams are a SMALL relation — the overlap
    check is a broadcast LEFT SEMI join against the exploded training
    n-grams (no shuffle of the big side), then a semi-join back on
    doc id; the corpus is never collected or replicated."""
    bench_text = bench_text_col or text_col
    bench_grams = (
        benchmark.select(F.explode(shingles(F.col(bench_text), n)).alias("__g"))
        .distinct()
    )
    hit_ids = (
        df.select(F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("__g"))
        .join(F.broadcast(bench_grams), "__g", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("__contaminated", F.lit(True))
    )
    return (
        df.join(hit_ids, id_col, "left")
        .withColumn("contaminated", F.coalesce(F.col("__contaminated"), F.lit(False)))
        .drop("__contaminated")
    )


def dedup_lines(text: Column) -> Column:
    """Within-document line dedup (the REMOVAL counterpart of the
    Gopher dup_line_frac signal, Rae et al. 2021): keep each trimmed
    non-empty line's FIRST occurrence, drop later repeats, rejoin with
    newlines.  Boilerplate headers/footers repeated inside a page
    collapse to one copy.

    Pure Column math (split/filter with index/array_join — JVM,
    map-only, no shuffle); O(lines^2) per document, bounded by document
    size, never by corpus size.
    """
    ls = lines(text)
    kept = F.filter(ls, lambda x, i: F.array_position(ls, x) == i + 1)
    return F.array_join(kept, "\n")


URL_HOST_PATTERN = r"https?://([^/\s]+)"


def url_hosts(text: Column) -> Column:
    """Distinct lowercased hostnames of every http(s) URL in the text —
    the per-document signal URL/domain filtering keys on (RefinedWeb-
    style blocklist curation).  Map-only regexp, engine-portable."""
    return F.array_distinct(
        F.transform(
            F.regexp_extract_all(text, F.lit(URL_HOST_PATTERN), 1),
            lambda h: F.lower(h),
        )
    )


def domain_blocklist_flag(
    df, text_col: str, blocked_domains: list[str], flag_col: str = "blocked"
):
    """Flag documents containing a URL on a blocked domain (exact host
    match OR a subdomain of a blocked domain) — the standard corpus
    domain filter.  The blocklist is a literal array (broadcast-sized
    by definition: a curated list, not data), so the whole check is one
    map-only expression: no join, no shuffle, linear scan at 100 TB.
    """
    hosts = url_hosts(F.col(text_col))
    blocked = F.array(*[F.lit(d.lower()) for d in blocked_domains])
    hit = F.exists(
        hosts,
        lambda h: F.exists(
            blocked, lambda b: (h == b) | h.endswith(F.concat(F.lit("."), b))
        ),
    )
    return df.withColumn(flag_col, hit)


def char_entropy(text: Column) -> Column:
    """Shannon entropy (bits/char) of the document's character
    distribution — the cheap perplexity proxy corpus filters use to
    kill binary-ish / repeated-garbage text (low entropy) and random
    noise (entropy near log2(alphabet)).

    Pure Column math, map-only, no shuffle: per document, iterate the
    DISTINCT characters (first-occurrence order — the same order
    DuckDB's list_distinct walks, so the float sum is
    order-identical in the oracle) and fold -p*log2(p) over exact
    integer counts.  O(distinct_chars x doc_len) JVM work per doc,
    bounded by the alphabet, never by the corpus.
    """
    chars = F.split(text, "")
    n = F.size(chars)
    distinct = F.array_distinct(chars)
    return F.when(
        n > 0,
        F.aggregate(
            distinct,
            F.lit(0.0),
            lambda acc, ch: acc
            - (
                F.size(F.filter(chars, lambda x: x == ch)) / n
            )
            * F.log2(F.size(F.filter(chars, lambda x: x == ch)) / n),
        ),
    ).otherwise(F.lit(0.0))


def chunk_documents(
    df,
    id_col: str,
    text_col: str,
    chunk_tokens: int,
    stride: int | None = None,
):
    """Split documents into fixed-size whitespace-token windows with
    optional overlap — the chunking step RAG indexing and long-document
    training prep run on every corpus.  ``stride`` defaults to
    ``chunk_tokens`` (disjoint chunks); a smaller stride overlaps
    neighbors.  The final partial window is kept (last chunk may be
    short); empty docs yield no chunks.

    Map-only Column math: tokenize once, ``sequence`` over window
    starts, ``slice``+``array_join`` per chunk — one linear scan, no
    shuffle, no Python.  Returns (id, chunk_idx, chunk_text, n_tokens).
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    stride = chunk_tokens if stride is None else stride
    if stride <= 0:
        raise ValueError(f"stride must be positive, got {stride}")
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
    )

    # bind_once: without it the tokenizer re-splits per chunk (Catalyst
    # inlines captured expressions into HOF lambdas)
    def chunks_of(t):
        n = F.size(t)
        starts = F.when(
            n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(
            starts,
            lambda s, i: F.struct(
                i.alias("chunk_idx"),
                F.array_join(F.slice(t, s + 1, chunk_tokens), " ").alias("chunk_text"),
                F.least(F.lit(chunk_tokens), n - s).alias("n_tokens"),
            ),
        )

    chunks = bind_once(toks, chunks_of)
    return (
        df.select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(id_col, "c.chunk_idx", "c.chunk_text", "c.n_tokens")
    )


def bigram_lm_score(
    df,
    id_col: str,
    text_col: str,
    add_k: float = 0.5,
):
    """Per-document bigram language-model score — the CCNet quality
    signal (Wenzek et al. 2019 score documents with a KenLM n-gram
    model and bucket the corpus by perplexity; public paper).  Here the
    LM is trained on the corpus itself in the SAME plan: add-k-smoothed
    bigram probabilities ``p(w2|w1) = (c(w1,w2)+k) / (c(w1)+k*V)`` with
    ``c(w1)`` = occurrences of ``w1`` as a bigram context and ``V`` =
    corpus vocabulary size, then each document is scored with the mean
    log-probability of its bigrams and ``ppl = exp(-mean)``.

    Returns (id, n_bigrams, avg_logp, ppl) — documents with fewer than
    2 tokens have no bigrams and yield no row (same convention both
    engines tokenize to).

    Scale shape: bigram extraction is map-only Column math (zip of the
    token array with its shift — no Python, no shuffle), materialized
    ONCE via lazy lineage truncation and shared by the LM build and the
    scoring probe; LM training is one partial-aggregated groupBy
    (duplicate bigrams collapse map-side, so hot bigrams like "of the"
    are skew-immune) with context counts folded in as a window over the
    distinct-bigram table (per-w1 fan-out bounded by vocabulary —
    skew-safe); scoring joins doc-bigrams to the LM on (w1, w2) — the
    LM side is bounded by vocabulary squared, broadcast when small,
    AQE-skew-split shuffle join otherwise; the vocabulary size is a
    one-row aggregate broadcast into the plan.
    """
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    pair_len = F.greatest(n - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(toks, 1, pair_len),
        F.slice(toks, 2, pair_len),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    big = df.select(
        F.col(id_col).alias("__id"), F.explode(pairs).alias("__b")
    ).select("__id", F.col("__b.w1").alias("w1"), F.col("__b.w2").alias("w2"))
    # Materialize the bigram rows ONCE (lazy truncation — the LM build
    # job finalizes the blocks, the probe then reads them): without it
    # the LM-build and probe branches each re-tokenize and re-explode
    # the whole corpus (r16, guide §1.2 "don't compute things twice").
    from flink_1_8_sourcecode_spark.operators.lineage import truncate_lineage

    big = truncate_lineage(big, eager=False)
    lm = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__c12"))
    # context counts as a window over the DISTINCT-bigram LM table
    # (bounded by vocab fan-out per w1 — skew-safe at any scale), not a
    # third corpus-derived aggregate + join: same integer sum, one less
    # pass and one less join
    from pyspark.sql import Window as _W

    lm = lm.withColumn("__c1", F.sum("__c12").over(_W.partitionBy("w1")))
    # vocabulary size: a one-row aggregate broadcast-cross-joined into the
    # plan (r16, guide §1.2/§5 — it was a separate driver `.first()`
    # action before, i.e. a second full tokenize+explode pass over the
    # corpus that had to finish before the main plan could even start;
    # folding it in keeps one plan, lets the scheduler overlap the two
    # subtrees, and drops a barrier).  Value and result floats identical:
    # countDistinct long -> double in the same expression.
    vocab_row = F.broadcast(
        df.select(F.explode(tokens(F.col(text_col))).alias("__t")).agg(
            F.countDistinct("__t").cast("double").alias("__vocab")
        )
    )
    logp = F.log(
        (F.col("__c12") + add_k) / (F.col("__c1") + add_k * F.col("__vocab"))
    )
    return (
        big.join(lm, ["w1", "w2"])
        .crossJoin(vocab_row)
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg(logp).alias("avg_logp"),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_bigrams",
            "avg_logp",
            F.exp(-F.col("avg_logp")).alias("ppl"),
        )
    )


def feature_hash_embed(
    df,
    id_col: str,
    text_col: str,
    dim: int = 64,
):
    """Hashed bag-of-words document embeddings (feature hashing /
    "the hashing trick", Weinberger et al. 2009 — public paper): each
    token hashes to one of ``dim`` buckets with a +/-1 sign drawn from
    the next hash bit, per-document bucket sums are L2-normalized, and
    the result is emitted SPARSE as (id, dim, weight) rows with
    zero-sum buckets dropped.  This is the deterministic,
    vocabulary-free featurizer that bridges the documents table into
    every embedding operator downstream (cosine top-k, range search,
    SemDeDup) without a model.

    Hash family: the repo-standard engine-portable md5 base
    (first 7 hex digits as an integer) — bucket = base mod dim, sign =
    bit (base div dim) mod 2.

    Scale shape: tokenize+hash is map-only Column math; the bucket-sum
    groupBy is partial-aggregated (hot tokens collapse map-side); the
    L2 norm is a per-document window over at most ``dim`` rows.  Two
    exchanges total, output bounded by |docs| x dim.
    """
    ex = df.select(
        F.col(id_col).alias("__id"), F.explode(tokens(F.col(text_col))).alias("__t")
    )
    base = md5_base28(F.col("__t"))
    f = ex.select(
        "__id",
        (base % dim).alias("dim"),
        F.when((base / dim).cast("long") % 2 == 0, F.lit(1.0))
        .otherwise(F.lit(-1.0))
        .alias("__s"),
    )
    agg = (
        f.groupBy("__id", "dim")
        .agg(F.sum("__s").alias("__w"))
        .filter(F.col("__w") != 0)
    )
    w = Window.partitionBy("__id")
    return (
        agg.withColumn("__n", F.sqrt(F.sum(F.col("__w") * F.col("__w")).over(w)))
        .select(
            F.col("__id").alias(id_col),
            "dim",
            (F.col("__w") / F.col("__n")).alias("weight"),
        )
    )


def bind_once(expr, fn):
    """Evaluate a Column expression ONCE and bind it as a higher-order-
    function lambda variable inside ``fn``.

    Catalyst's CollapseProject inlines a referenced expression into
    every use site inside HOF lambdas — an expression used N times in a
    ``transform`` body is EVALUATED N times (whole-stage codegen's
    subexpression elimination does not reach across lambda scopes).
    Wrapping the expression in a 1-element array and `transform`-ing
    over it turns the value into a bound lambda variable, which IS
    shared: measured 2.4x on winnowing fingerprints at sf0.1 (the
    token array was being re-split per gram, the gram array re-hashed
    per window).  Same trick `minhash_band_rows` documents via its
    explode/groupBy detour — this is the map-only form.
    """
    return F.element_at(F.transform(F.array(expr), fn), 1)


def ngram_novelty(df, id_col: str, text_col: str, k: int = 3):
    """Per-document n-gram NOVELTY: the fraction of a document's
    distinct word k-grams that occur in NO other document — the
    complement of the repeated-span family (a doc scoring ~1.0 is
    original content; ~0.0 is assembled from corpus boilerplate).
    Used as a memorization/quality signal alongside Lee et al. 2021
    dedup: low-novelty docs are the ones whose removal the paper shows
    hurts least.

    Returns (id, n_grams_distinct, novelty) — docs shorter than k
    tokens have no k-grams and yield n_grams_distinct=0, novelty=0.0.

    Scale shape: distinct (doc, gram) pairs -> gram document-frequency
    via one partial-aggregated groupBy (hot boilerplate grams collapse
    map-side) -> join back (AQE-skew-split; the DF table is bounded by
    distinct grams, not occurrences) -> per-doc mean.  No Python, no
    all-pairs anything.
    """
    dg = df.select(
        F.col(id_col).alias("__id"),
        F.explode(shingles(F.col(text_col), k)).alias("__g"),
    )
    gdf = dg.groupBy("__g").agg(F.count(F.lit(1)).alias("__ndocs"))
    scored = (
        dg.join(gdf, "__g")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_grams_distinct"),
            F.avg((F.col("__ndocs") == 1).cast("double")).alias("novelty"),
        )
    )
    base = df.select(F.col(id_col))
    return base.join(
        scored, base[id_col] == scored["__id"], "left"
    ).select(
        id_col,
        F.coalesce("n_grams_distinct", F.lit(0)).alias("n_grams_distinct"),
        F.coalesce("novelty", F.lit(0.0)).alias("novelty"),
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    df,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100000,
    min_stopwords: int = 2,
):
    """The Gopher rule-based quality filter (Rae et al. 2021, "Scaling
    Language Models: ... Gopher", Table A1 — public paper): the
    standard pre-LLM-training document gate, applied per document with
    the paper's published thresholds:

    - 50 <= word count <= 100000
    - 3 <= mean word length <= 10
    - symbol-to-word ratio (# or ellipsis) <= 0.1
    - < 90% of lines starting with a bullet; < 30% ending in ellipsis
    - >= 80% of words contain at least one alphabetic character
    - document contains >= 2 of the 8-word Gopher stopword list

    Returns every signal plus the conjunction ``keep`` — keep the
    signals, not just the verdict, so downstream can re-threshold
    without a rescan.

    The paper's word-count and stopword thresholds are parameters
    (defaults = published values).  On the synthetic test corpus most
    documents fail the stopword rule by construction — the emitted
    signals, not the verdict, carry the information there.

    Map-only Column math end to end (tokenize once via ``bind_once``,
    ratios as array folds): one linear scan, zero shuffles at 100 TB.
    """

    def signals(t):
        n = F.size(t)
        nd = F.lit(None).cast("double")
        mean_len = F.when(
            n > 0,
            F.aggregate(t, F.lit(0.0), lambda a, x: a + F.length(x)) / n,
        ).otherwise(nd)
        n_sym = F.size(
            F.filter(t, lambda x: x.contains("#") | x.contains("..."))
        )
        sym_ratio = F.when(n > 0, n_sym / n).otherwise(nd)
        alpha_frac = F.when(
            n > 0, F.size(F.filter(t, lambda x: x.rlike("[a-z]"))) / n
        ).otherwise(nd)
        n_stop = F.size(
            F.array_intersect(t, F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]))
        )
        return F.struct(
            n.alias("n_words"),
            mean_len.alias("mean_word_len"),
            sym_ratio.alias("symbol_ratio"),
            alpha_frac.alias("alpha_frac"),
            n_stop.alias("n_stopwords"),
        )

    def line_signals(ls):
        m = F.size(ls)
        nd = F.lit(None).cast("double")
        bullet = F.when(
            m > 0,
            F.size(
                F.filter(ls, lambda x: x.startswith("-") | x.startswith("*"))
            )
            / m,
        ).otherwise(nd)
        ellipsis = F.when(
            m > 0, F.size(F.filter(ls, lambda x: x.endswith("..."))) / m
        ).otherwise(nd)
        return F.struct(bullet.alias("bullet_frac"), ellipsis.alias("ellipsis_frac"))

    s = bind_once(tokens(F.col(text_col)), signals)
    l = bind_once(lines(F.col(text_col)), line_signals)
    out = df.select(F.col(id_col), s.alias("__s"), l.alias("__l")).select(
        id_col, "__s.*", "__l.*"
    )
    keep = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(3.0, 10.0)
        & (F.col("symbol_ratio") <= 0.1)
        & (F.col("bullet_frac") < 0.9)
        & (F.col("ellipsis_frac") < 0.3)
        & (F.col("alpha_frac") >= 0.8)
        & (F.col("n_stopwords") >= min_stopwords)
    )
    return out.withColumn("keep", F.coalesce(keep, F.lit(False)))


def bm25_topk(
    df,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
):
    """BM25 keyword retrieval: score every document against a bag of
    query terms (Robertson/Sparck Jones probabilistic IDF, Lucene's
    always-positive ``ln(1 + (N-df+0.5)/(df+0.5))`` form) and return
    the top-k ``(id, bm25)`` rows.

    Reference parity: the reference's batch relational stack expresses
    this as scan->filter->agg->join->topn (WordCount-family plans,
    flink-examples WordCount.java); here it is the corpus-side half of
    a search/training-data relevance pipeline.

    Scale shape (100 TB discipline):
    - The per-doc stage is MAP-ONLY: tokenization binds once
      (``bind_once``), doc length and the per-term term frequencies are
      computed inside the row via array ops, and non-matching docs are
      dropped before anything shuffles — the exploded (doc, term, tf)
      stream carries only |query_terms| rows per MATCHING doc, never
      the corpus token stream (a posting-list read, not a full scan
      shuffle).
    - Corpus stats (N, avgdl) are one 1-row aggregate; document
      frequencies are a <=|query_terms|-row aggregate — both broadcast
      back, so the matching-docs stream joins without moving.
    - The final per-doc sum partial-aggregates map-side and the top-k
      is a TakeOrdered, not a global sort.
    - Scores are rounded to 6 dp BEFORE ranking so the (score, id)
      order is engine-stable; ties break by id ascending.
    """
    from pyspark.sql.functions import broadcast

    terms = sorted(set(query_terms))
    doc = F.col(id_col)

    def eq(term):  # closure factory: a default-arg lambda would change arity
        return lambda x: x == term

    def per_doc(t):
        tfs = F.array(
            *[
                F.struct(
                    F.lit(term).alias("term"),
                    F.size(F.filter(t, eq(term))).alias("tf"),
                )
                for term in terms
            ]
        )
        return F.struct(F.size(t).alias("dl"), tfs.alias("tfs"))

    stats = df.select(
        doc.alias("__id"), bind_once(tokens(F.col(text_col)), per_doc).alias("__s")
    ).select("__id", F.col("__s.dl").alias("__dl"), F.col("__s.tfs").alias("__tfs"))

    corpus = stats.agg(
        F.count(F.lit(1)).cast("double").alias("__n_docs"),
        F.avg("__dl").alias("__avgdl"),
    )

    hits = (
        stats.select("__id", "__dl", F.explode("__tfs").alias("__h"))
        .select("__id", "__dl", F.col("__h.term").alias("__term"), F.col("__h.tf").alias("__tf"))
        .filter(F.col("__tf") > 0)
    )

    dfreq = hits.groupBy("__term").agg(F.count(F.lit(1)).cast("double").alias("__df"))

    idf = F.log(
        F.lit(1.0) + (F.col("__n_docs") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    tf_part = (F.col("__tf") * (k1 + 1)) / (
        F.col("__tf") + k1 * (1 - b + b * F.col("__dl") / F.col("__avgdl"))
    )
    return (
        hits.join(broadcast(dfreq), "__term")
        .join(broadcast(corpus))
        .select("__id", (idf * tf_part).alias("__s"))
        .groupBy("__id")
        .agg(F.round(F.sum("__s"), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("__id"))
        .limit(k)
        .select(F.col("__id").alias(id_col), "bm25")
    )


def bloom_bit_positions(gram: Column, n_bits: int, n_hashes: int) -> list[Column]:
    """The k deterministic Bloom bit positions of one n-gram: seed-
    prefixed md5_base28 mod the filter width.  Engine-portable (md5
    arithmetic only) so a SQL oracle reproduces every bit exactly."""
    return [
        (md5_base28(F.concat(F.lit(f"bloom{s}|"), gram)) % n_bits).cast("long")
        for s in range(n_hashes)
    ]


def decontaminate_bloom(
    df,
    benchmark,
    id_col: str,
    text_col: str,
    bench_text_col: str | None = None,
    n: int = 3,
    n_bits: int = 1 << 18,
    n_hashes: int = 3,
):
    """Bloom-filter benchmark decontamination (Bloom 1970): the holdout
    corpus compresses to a deterministic bit-set (k seed-prefixed
    md5-derived positions per distinct n-gram); a training document is
    flagged when any of its n-grams has ALL k bits present.

    Same contract as :func:`decontaminate` but the broadcast side is
    the BIT SET, not the gram strings — at 100 TB the holdout's grams
    can be far larger than an executor's broadcast budget while the bit
    positions stay bounded by ``n_bits`` (here 2^18 bits => at most
    ~256k distinct longs regardless of holdout size; a production
    deployment packs them into an actual bitmap via
    ``spark.util.sketch.BloomFilter`` — the deterministic long-set form
    keeps the oracle exact).  False positives are possible BY DESIGN
    and identical in both engines because the hash arithmetic mirrors.

    Scale shape: the corpus side is map-only up to a chain of k
    broadcast LEFT SEMI joins (no shuffle of the big side, the bloom
    exchange is reused across the k probes), then one distinct on hit
    doc ids.

    Returns ``df`` + boolean ``bloom_contaminated``.
    """
    bench_text = bench_text_col or text_col
    bloom = (
        benchmark.select(F.explode(shingles(F.col(bench_text), n)).alias("__g"))
        .distinct()
        .select(
            F.explode(
                F.array(*bloom_bit_positions(F.col("__g"), n_bits, n_hashes))
            ).alias("__bloom_bit")
        )
        .distinct()
    )
    probe = df.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("__g")
    )
    bits = bloom_bit_positions(F.col("__g"), n_bits, n_hashes)
    for s, b in enumerate(bits):
        probe = probe.join(
            F.broadcast(bloom), b == F.col("__bloom_bit"), "left_semi"
        )
    hit_ids = (
        probe.select(id_col).distinct().withColumn("__hit", F.lit(True))
    )
    return (
        df.join(hit_ids, id_col, "left")
        .withColumn("bloom_contaminated", F.coalesce(F.col("__hit"), F.lit(False)))
        .drop("__hit")
    )


def build_vocab(df, text_col: str, vocab_size: int) -> "DataFrame":
    """Frequency-ranked vocabulary: the ``vocab_size`` most frequent
    tokens (ties broken lexicographically) with counts and 1-based
    ranks — the vocabulary-construction half of tokenizer training
    (a WordPiece/BPE trainer starts from exactly this table).

    Scale: explode -> one partial-aggregated groupBy (hot tokens
    collapse map-side) -> TakeOrdered top-V (never a global sort); the
    result is bounded by ``vocab_size`` and broadcastable by
    construction.
    """
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(vocab_size)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("cnt"), F.asc("token"))
            ),
        )
    )


def oov_stats(df, vocab, group_col: str, text_col: str) -> "DataFrame":
    """Per-group out-of-vocabulary rate against a (small) vocabulary
    table: ``(group, n_tokens, n_oov, oov_rate)`` — the coverage gate
    run before committing to a tokenizer vocab, and a drift monitor
    for incremental corpus ingests.

    Scale: probe side explodes tokens map-only into a BROADCAST left
    join (the vocab is bounded), then one partial-aggregated groupBy
    on the group key — token occurrences never shuffle.
    """
    v = vocab.select(F.col("token"), F.lit(True).alias("__in_vocab"))
    probe = df.select(
        F.col(group_col), F.explode(tokens(F.col(text_col))).alias("token")
    )
    return (
        probe.join(F.broadcast(v), "token", "left")
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("__in_vocab").isNull().cast("long")).alias("n_oov"),
            F.avg(F.col("__in_vocab").isNull().cast("double")).alias("oov_rate"),
        )
    )


def tfidf_top_terms(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 3,
):
    """Per-document keyword extraction: the ``top_n`` highest TF-IDF
    terms of each document — tf normalized by document length, idf the
    smoothed ``ln((1+N)/(1+df))`` — with scores rounded to 6 dp BEFORE
    ranking and ties broken lexicographically, so the per-doc order is
    engine-stable.  Returns ``(id, term, tfidf, rnk)``.

    The retrieval complement of :func:`bm25_topk`: BM25 ranks documents
    for a query; this ranks terms within each document (tagging /
    faceting / near-dup explanation in a corpus pipeline).

    Scale shape: one (doc, term) shuffle builds term frequencies
    (partial-aggregated — repeated tokens collapse map-side); document
    frequencies are a vocabulary-bounded aggregate joined back
    broadcast; doc length and the final rank share ONE doc-keyed
    exchange (two window functions over the same partitioning).
    """
    from pyspark.sql.functions import broadcast

    tfs = (
        df.select(F.col(id_col).alias("__id"),
                  F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("__id", "term")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    # the __tf > 0 filter is vacuous but keeps __tf referenced, so column
    # pruning cannot specialize this branch's aggregate subtree — both
    # consumers then share ONE (doc, term) exchange (AQE ReusedExchange)
    # instead of re-running scan+tokenize+explode for the DF side
    dfreq = (
        tfs.filter(F.col("__tf") > 0)
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("__df"))
    )
    n_docs = df.select(
        F.count(F.lit(1)).cast("double").alias("__n_docs")
    )
    wdoc = Window.partitionBy("__id")
    worder = Window.partitionBy("__id").orderBy(
        F.desc("__score"), F.asc("term")
    )
    scored = (
        tfs.join(broadcast(dfreq), "term")
        .join(broadcast(n_docs))
        .withColumn("__dl", F.sum("__tf").over(wdoc))
        .withColumn(
            "__score",
            F.round(
                (F.col("__tf") / F.col("__dl"))
                * F.log((F.lit(1.0) + F.col("__n_docs")) / (F.lit(1.0) + F.col("__df"))),
                6,
            ),
        )
    )
    return (
        scored.withColumn("rnk", F.row_number().over(worder))
        .filter(F.col("rnk") <= top_n)
        .select(F.col("__id").alias(id_col), "term",
                F.col("__score").alias("tfidf"), "rnk")
    )


def char_bigrams(text: Column) -> Column:
    """Character bigrams of lower-cased trimmed text, in order
    (duplicates kept) — the unit of classic n-gram language ID
    (Cavnar & Trenkle 1994).  The normalized string binds ONCE
    (bind_once — lower/trim would otherwise re-evaluate per element
    inside the transform lambda, O(n^2) chars per row); texts shorter
    than 2 chars yield an empty array (sequence(1, 0) would DESCEND)."""

    def grams(s: Column) -> Column:
        return F.when(
            F.length(s) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.length(s) - 1),
                lambda i: s.substr(i, F.lit(2)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return bind_once(F.lower(F.trim(text)), grams)


def langid_confusion(
    df,
    lang_col: str,
    id_col: str,
    text_col: str,
    profile_size: int = 30,
):
    """Trained character-bigram language ID (Cavnar & Trenkle 1994),
    upgraded from the stopword heuristic ``lang_id``: per-language
    bigram-count profiles are TRAINED from the labeled corpus (top
    ``profile_size`` bigrams per language, ties lexicographic), every
    document is classified by the INTEGER dot product of its bigram
    counts with each profile (exact in any engine — no float argmax
    risk), and the (true, predicted) confusion matrix comes back:
    ``(lang, predicted, n_docs)``.

    Ties in the argmax break by language ascending; documents too short
    for bigrams score 0 against every profile and land on the
    lexicographically first language.

    Scale shape: ONE (doc, bigram) shuffle is shared by training and
    classification (the lang column rides along — it is functionally
    dependent on the doc id); profiles are a languages x profile_size
    bounded table broadcast into the scoring join; the per-doc argmax
    is a window over |langs| candidate rows.
    """
    db = (
        df.select(
            F.col(id_col).alias("__id"),
            F.col(lang_col).alias("__lang"),
            F.explode(char_bigrams(F.col(text_col))).alias("__bg"),
        )
        .groupBy("__id", "__lang", "__bg")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    wtop = Window.partitionBy("__plang").orderBy(
        F.desc("__pcnt"), F.asc("__bg")
    )
    profiles = (
        db.groupBy(F.col("__lang").alias("__plang"), "__bg")
        .agg(F.sum("__cnt").alias("__pcnt"))
        .withColumn("__pr", F.row_number().over(wtop))
        .filter(F.col("__pr") <= profile_size)
        .select("__plang", "__bg", "__pcnt")
    )
    scores = (
        db.join(F.broadcast(profiles), "__bg")
        .groupBy("__id", "__lang", "__plang")
        .agg(F.sum(F.col("__cnt") * F.col("__pcnt")).alias("__score"))
    )
    wbest = Window.partitionBy("__id").orderBy(
        F.desc("__score"), F.asc("__plang")
    )
    predicted = (
        scores.withColumn("__r", F.row_number().over(wbest))
        .filter(F.col("__r") == 1)
        .select("__id", "__lang", F.col("__plang").alias("predicted"))
    )
    # docs with no scoring rows (too short / no profile overlap) default
    # to the lexicographically first trained language
    first_lang = profiles.agg(F.min("__plang").alias("__default"))
    base = df.select(F.col(id_col).alias("__id"), F.col(lang_col).alias("__lang"))
    full = (
        base.join(predicted.select("__id", "predicted"), "__id", "left")
        .join(F.broadcast(first_lang))
        .select(
            "__lang",
            F.coalesce("predicted", F.col("__default")).alias("predicted"),
        )
    )
    return (
        full.groupBy(F.col("__lang").alias(lang_col), "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# Default PII MASKS: ordered (pattern, replacement) pairs applied left
# to right — the multi-mask, typed-sentinel counterpart of the single-
# pattern ``scrub``/``PII_PATTERNS`` helpers above.  Patterns stay
# inside the Java-regex / RE2 COMMON dialect (no lookaround, no
# backrefs) so the same strings drive Spark and any RE2-based engine
# identically.
PII_MASKS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{13,19}\b", "<CARDNUM>"),
    (r"\b\d{3}[- ]\d{3,4}[- ]\d{4}\b", "<PHONE>"),
]


def scrub_pii(
    df: "DataFrame",
    text_col: str,
    out_col: str = "scrubbed",
    patterns: list[tuple[str, str]] | None = None,
    count_col: str | None = "n_masked",
) -> "DataFrame":
    """Mask PII-shaped spans (emails, IPv4s, card-length digit runs,
    phone-shaped digit groups) — the standard pre-training scrub pass.
    Map-only: a chain of ``regexp_replace`` Columns, one scan, no
    shuffle, whole-stage codegen; at 100 TB this runs at parquet-read
    speed.  ``count_col`` (optional) reports how many masks landed per
    row — the audit column a scrub job logs.

    Pattern order matters (earlier masks eat their text before later
    patterns see it); the defaults are ordered most-specific first.
    Extends the reference-surface text functions (SURVEY §2.16 text
    analysis) with the redaction step of a training-data pipeline.
    """
    pats = PII_MASKS if patterns is None else patterns
    col = F.col(text_col)
    n = F.lit(0)
    for pat, repl in pats:
        # audit count = matches of the pattern on the text the pattern
        # actually saw (after earlier masks), counted PRE-replacement —
        # counting sentinels post-scrub overcounts when the input
        # already contains the literal sentinel, and breaks outright
        # for replacements holding regex metacharacters
        n = n + F.regexp_count(col, F.lit(pat))
        col = F.regexp_replace(col, pat, repl)
    out = df.withColumn(out_col, col)
    if count_col is not None:
        out = out.withColumn(count_col, n.cast("int"))
    return out


def certified_heavy_hitters(
    df: "DataFrame",
    item_col: str,
    k_capacity: int = 256,
    count_col: str = "cnt",
) -> "DataFrame":
    """EXACT heavy hitters with bounded memory: every item whose global
    frequency exceeds N / ``k_capacity``, with its exact count —
    Misra-Gries candidate generation (public classic; summaries merged
    per the mergeable-summaries result of Agarwal et al. 2012) followed
    by an exact recount of the candidate set.

    Why not a plain groupBy-count: at 100 TB an open-domain item column
    (URLs, user ids, shingles) has a key space that makes the full
    count exchange the dominant cost when only the heavy tail matters.
    Here pass 1 is map-only: each partition keeps <= ``k_capacity``
    decremented counters (per-Arrow-batch ``value_counts`` — vectorized,
    no per-row Python — merged under the MG decrement rule), emitting
    <= k_capacity candidate rows per partition.  The pigeonhole
    guarantee makes the union COMPLETE: a global count > N/k implies a
    local count > n_p/k in at least one partition, and MG never drops
    such an item.  Pass 2 semi-joins the corpus against the broadcast
    candidates and exactly recounts ONLY them — the exchange is bounded
    by |candidates| x partitions, never the key space.  The final
    filter re-applies the exact threshold, so false candidates are
    harmless and the output is exactly { item : cnt > N/k }.
    """
    from collections.abc import Iterator

    import pandas as pd

    spark = df.sparkSession
    col = df.select(F.col(item_col).alias("__item"))
    cap = int(k_capacity)

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: pd.Series | None = None
        for pdf in batches:
            vc = pdf["__item"].value_counts()  # vectorized per batch
            counters = vc if counters is None else counters.add(vc, fill_value=0)
            if len(counters) > cap:
                # MG reduction: subtract the (cap+1)-th largest count
                # from everyone, drop the non-positive — the mergeable-
                # summary step (error stays <= n_p / cap)
                kth = counters.nlargest(cap + 1).iloc[-1]
                counters = counters - kth
                counters = counters[counters > 0]
        if counters is not None and len(counters):
            yield pd.DataFrame({"__item": counters.index})

    cands = col.mapInPandas(mg, f"__item {df.schema[item_col].dataType.simpleString()}")
    # no distinct(): the left-semi build side dedups keys inherently,
    # and a distinct here would add a shuffle of the candidate rows
    total = col.count()
    exact = (
        col.join(F.broadcast(cands), "__item", "left_semi")
        .groupBy("__item")
        .agg(F.count(F.lit(1)).alias(count_col))
        .filter(F.col(count_col) > total / cap)
    )
    return exact.select(F.col("__item").alias(item_col), count_col)


def normalize_ccnet(text: Column) -> Column:
    """CCNet-style hashing normalization (Wenzek et al. 2019, public):
    lowercase, every digit mapped to 0, punctuation stripped,
    whitespace collapsed — the canonical pre-fingerprint normalizer
    that makes '3 Items for $5!' and '8 items for $9' collide.  Pure
    Column regexp chain (map-only, codegen, RE2-common dialect)."""
    t = F.lower(F.trim(text))
    t = F.regexp_replace(t, "[0-9]", "0")
    t = F.regexp_replace(t, "[^a-z0-9\\s]", "")
    return F.trim(F.regexp_replace(t, "\\s+", " "))


def canonicalize_url(url: "Column") -> "Column":
    """Canonical URL form for dedup / domain mixing — the standard
    crawl-curation normalization (cf. the URL-dedup step of CommonCrawl
    pipelines): lowercase scheme+authority, strip the default :80
    port, drop the fragment, remove utm_* tracking params, and tidy
    the separators the removals leave behind.

    Pure Column regex chain — map-only, whole-stage codegen.  The
    PATTERNS are engine-portable (Java regex == RE2 here) and shared
    verbatim with the DuckDB oracle; the one rule needing a
    replacement backreference (utm removal keeps its separator) spells
    it ``$1`` here and ``\\1`` in the oracle — replacement syntax is
    the engines' only divergence.
    """
    u = url
    # 1. drop the fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 2. lowercase scheme + authority (everything before the first
    #    path slash), keep the rest as-is — concat(extract, strip)
    #    instead of a backref replacement
    auth = F.lower(F.regexp_extract(u, r"^([^/]*//[^/?]+)", 1))
    # 3. strip the default port INSIDE the extracted authority only
    #    (never query-param values) and only for http, whose default
    #    is 80 — https:443 stays untouched
    auth = F.regexp_replace(auth, r"^(http://[^/:?]+):80$", "$1")
    rest = F.regexp_replace(u, r"^[^/]*//[^/?]+", "")
    u = F.when(auth == "", u).otherwise(F.concat(auth, rest))
    # 4. drop utm_* tracking params KEEPING the separator (so a
    #    following param inherits it), then tidy: collapse runs of
    #    '&' FIRST (consecutive removed params leave '&&'), and only
    #    then fold the leading '?&' — the reverse order leaves a
    #    stray '?&' when >=2 utm params precede a kept one
    u = F.regexp_replace(u, r"([?&])utm_[^&#]*", "$1")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"\?&", "?")
    u = F.regexp_replace(u, r"[?&]+$", "")
    return u


def url_domain(url: "Column") -> "Column":
    """Registered-host extraction from a canonical URL (the grouping
    key of domain mixing / blocklist joins)."""
    return F.regexp_extract(url, r"^[^/]*//([^/:?]+)", 1)


def blocklist_gate(
    df: "DataFrame",
    url_col: str,
    text_col: str,
    blocked_domains: "DataFrame",
    badwords: list[str],
    max_badword_ratio: float = 0.1,
) -> "DataFrame":
    """FineWeb/CCNet-style source gate: drop documents whose URL domain
    is on a blocklist or whose bad-word token ratio exceeds the cap.

    Scale shape: the blocklist (thousands of domains vs billions of
    docs) joins as a BROADCAST left-anti on the extracted domain — the
    corpus is never reshuffled; the bad-word ratio is a map-only
    array_intersect over the token array (bad-word lists are small
    enough to live in the plan as a literal array).  Survivors carry
    (domain, badword_ratio) so downstream mixing can stratify on them.
    """
    dom = url_domain(F.col(url_col))
    toks = tokens(F.col(text_col))
    bad = F.array(*[F.lit(w) for w in badwords])
    # occurrence count (not distinct membership): repeated bad tokens
    # raise the ratio, matching the CCNet/Gopher convention
    n_bad = F.size(F.filter(toks, lambda t: F.array_contains(bad, t)))
    # 0 tokens => ratio 0 (kept)
    n_tok = F.size(toks)
    ratio = F.when(n_tok > 0, n_bad / n_tok).otherwise(F.lit(0.0))
    out = (
        df.withColumn("domain", dom)
        .withColumn("badword_ratio", ratio)
        .join(F.broadcast(blocked_domains), on="domain", how="left_anti")
        .filter(F.col("badword_ratio") <= max_badword_ratio)
    )
    return out


def quality_classifier_train(
    df: "DataFrame",
    id_col: str,
    text_col: str,
    label_col: str,
    n_buckets: int = 4096,
    n_iters: int = 16,
    lr_w: float = 800.0,
    lr_b: float = 4.0,
) -> tuple[list[float], float]:
    """Fit the hashed linear quality classifier IN-ENGINE: logistic
    regression over L1-normalized token-bucket frequencies (x_b =
    count_b / n_tokens), full-batch gradient ascent on the
    log-likelihood — the training half of the FastText-style filter
    whose scoring half is ``quality_classifier_score``.

    Distributed shape (the kmeans broadcast-coefficient pattern,
    queries/rowops.py:dataset_api_kmeans): the featurized seed set
    (doc, bucket, x, label) is built once — explode + one
    groupBy(doc, bucket) — pre-partitioned by doc and persisted; each
    superstep is ONE pass over it: the current coefficient vector
    (n_buckets rows) broadcast-joins in, per-doc margins come from a
    window sum on the persisted partitioning (no extra exchange), and
    one groupBy(bucket) emits n_buckets gradient rows collected to the
    driver for the update.  Plans stay superstep-local (weights are
    re-literalized each round), so lineage never grows.

    Scale: training runs on a bounded labeled SEED SET (thousands to
    millions of docs — sample upstream), never the full corpus; the
    full-corpus pass is the scoring half.  Separate weight/bias rates
    because the bias feature (1.0) is ~2 orders larger than the
    normalized bucket features.

    Returns ``(weights, bias)`` — weights[b] is bucket b's coefficient.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    tok = df.select(
        F.col(id_col).alias("__id"),
        F.col(label_col).cast("double").alias("__y"),
        F.explode(tokens(F.col(text_col))).alias("__tok"),
    )
    bucket = (md5_base28(F.col("__tok")) % n_buckets).alias("bucket")
    cnt = tok.groupBy("__id", "__y", bucket).agg(F.count(F.lit(1)).alias("__cnt"))
    w_doc = Window.partitionBy("__id")
    feat = (
        cnt.withColumn("__x", F.col("__cnt") / F.sum("__cnt").over(w_doc))
        .drop("__cnt")
        .repartition("__id")
        .persist()
    )
    n_docs = feat.select("__id").distinct().count()  # materializes the cache
    if n_docs == 0:
        feat.unpersist()
        return [0.0] * n_buckets, 0.0

    weights = [0.0] * n_buckets
    bias = 0.0
    w_rn = Window.partitionBy("__id").orderBy("bucket")
    for _ in range(n_iters):
        wdf = spark.createDataFrame(
            list(enumerate(weights)), "bucket int, __w double"
        )
        j = feat.join(F.broadcast(wdf), "bucket", "left")
        margin = F.sum(F.col("__x") * F.col("__w")).over(w_doc)
        resid = F.col("__y") - 1.0 / (1.0 + F.exp(-(margin + F.lit(bias))))
        # per-bucket gradient + (via the doc's first row only) the bias
        # gradient, in ONE aggregation pass
        grads = (
            j.select(
                "bucket",
                (resid * F.col("__x")).alias("__g"),
                F.when(F.row_number().over(w_rn) == 1, resid)
                .otherwise(F.lit(0.0))
                .alias("__gb"),
            )
            .groupBy("bucket")
            .agg(F.sum("__g").alias("g"), F.sum("__gb").alias("gb"))
            .collect()
        )
        gb_total = 0.0
        for r in grads:
            weights[r["bucket"]] += lr_w / n_docs * r["g"]
            gb_total += r["gb"]
        bias += lr_b / n_docs * gb_total
    feat.unpersist()
    return weights, bias


def quality_classifier_score(
    df: "DataFrame",
    id_col: str,
    text_col: str,
    n_buckets: int = 4096,
    threshold: float = 0.5,
    weights: "list[float] | None" = None,
    bias: float = 0.0,
) -> "DataFrame":
    """FastText-style hashed LINEAR quality classifier (the shape of
    FineWeb-Edu / CCNet LM filtering): tokens hash into ``n_buckets``
    feature buckets, each bucket carries a fixed weight, and the doc
    score is the logistic of the mean token weight.

    With ``weights`` (a ``quality_classifier_train`` fit) the bucket
    coefficients broadcast-join in and the doc score is the logistic of
    the model margin ``mean-token-weight + bias``.  Without, a
    deterministic hash-derived stand-in weighs each bucket — the
    untrained but fully-plumbed default.  Either way the hot path is
    the same: per-token hashing and weight lookup JVM-side, explode +
    partial-aggregated groupBy (the scale-proof path: HOF lambdas
    evaluate interpreted per element, measured 9x slower on exactly
    this shape), one exchange carrying (id, partial sums) only.

    Output: (id, n_tokens, score, keep).
    """
    tok = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__tok")
    )
    bucket = md5_base28(F.col("__tok")) % n_buckets
    if weights is not None:
        wdf = df.sparkSession.createDataFrame(
            list(enumerate(weights)), "bucket int, __w double"
        )
        per_tok = tok.select(F.col(id_col), bucket.alias("bucket")).join(
            F.broadcast(wdf), "bucket", "left"
        )
        scale = 1.0  # margin is already model-calibrated
    else:
        # deterministic weight in [-1, 1): Knuth multiplicative hash of
        # the bucket id, exact in 64-bit integer arithmetic in both
        # engines
        w = ((bucket * F.lit(2654435761)) % F.lit(2147483648)) / 2147483648.0 * 2 - 1
        per_tok = tok.select(F.col(id_col), w.alias("__w"))
        scale = 4.0  # spreads the stand-in's mean weight over the logistic
    scored = per_tok.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.coalesce(F.col("__w"), F.lit(0.0))).alias("__sw"),
    )
    score = 1.0 / (
        1.0 + F.exp(-(scale * F.col("__sw") / F.col("n_tokens") + F.lit(bias)))
    )
    return scored.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.round(score, 6).alias("score"),
        (score > threshold).alias("keep"),
    )


def _apply_bpe_merge(sym: Column, a: str, b: str) -> Column:
    """Apply ONE BPE merge (a, b) -> a+b to a symbol array, left-to-
    right non-overlapping — the classic merge-application semantics
    (Sennrich et al. 2016): a left fold that joins the current symbol
    into the previous one when they form the pair."""
    merged = a + b
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _greedy_disjoint(ranked, m: int) -> "list":
    """Greedy scan of the (freq desc, a, b) ranked pair list: select up
    to ``m`` pairs whose symbols are pairwise DISJOINT — disjoint
    merges neither create nor destroy each other's adjacencies, so one
    fold applies them all and their counts were already exact at
    selection time.  (A merge CAN create new pairs ranking above a
    later disjoint selection — that is the documented, standard
    batching approximation; ``merges_per_round=1`` recovers exact
    sequential BPE.)"""
    sel: list = []
    used: set = set()
    for row in ranked:
        if row["a"] in used or row["b"] in used:
            continue
        sel.append(row)
        used.update((row["a"], row["b"]))
        if len(sel) >= m:
            break
    return sel


def bpe_train(
    df: "DataFrame",
    text_col: str,
    num_merges: int,
    min_freq: int = 2,
    merges_per_round: int = 1,
) -> "tuple[list[tuple[str, str, int]], DataFrame]":
    """Train a byte-pair-encoding tokenizer IN-ENGINE (Sennrich et al.
    2016 — the word-level BPE of GPT-2-family pre-tokenizers): learn
    ``num_merges`` merge rules by repeatedly fusing the most frequent
    adjacent symbol pair, weighted by corpus word frequency.

    Distributed shape — the one that works at 100 TB:

    1. ONE corpus-sized pass: explode tokens, groupBy word -> the
       distinct-word frequency table (map-side combined; this is the
       only exchange whose size scales with the corpus).  Every real
       BPE trainer reduces to this table first — merges depend only on
       word frequencies, never on document structure.
    2. The merge loop runs over that vocab-bounded table (persisted,
       re-symbolized in place): each round is one pair-count shuffle
       of vocab rows (explode adjacent pairs, groupBy(a, b) weighted
       sum) + a top-1 to the driver, then a map-only fold applying the
       chosen merge.  Lineage is truncated every few rounds (the
       kmeans/classifier superstep pattern) so plans stay round-local.

    Ties break deterministically: highest frequency, then (a, b)
    lexicographic — pinned against the independent Python reference in
    tests.  Training stops early when the best pair's frequency drops
    below ``min_freq``.

    Practical bound: each merge round is one driver-coordinated Spark
    job (the pair-count argmax), so a production 32k-merge vocabulary
    at ``merges_per_round=1`` means 32k sequential jobs over the
    (vocab-bounded, persisted) frequency table.  ``merges_per_round=m``
    applies the STANDARD BATCHING TRICK: per round, greedily take the
    top-m SYMBOL-DISJOINT pairs from the one ranked pair count —
    disjoint merges cannot create or destroy each other's adjacencies,
    so their selection-time counts stay exact and one fold applies all
    m — cutting the job count to ``ceil(32k / m)``.  The approximation
    vs sequential BPE: a merge may create a NEW pair (x, ab) ranking
    above a later same-round selection; sequential training would take
    the new pair first.  ``merges_per_round=1`` (the default) is exact
    classic BPE.  For very large merge counts the standard practice
    remains shrinking the vocab table to the driver once it fits (it
    is distinct-words-sized, not corpus-sized) and finishing locally;
    this implementation keeps every round in-engine so the trainer
    works even when the distinct-word table itself exceeds driver
    memory.

    Returns ``(merges, vocab)``: merges as ``(a, b, freq)`` in learned
    order, and the symbolized vocab frame ``(__w, __n, __sym)`` — the
    word -> BPE-tokens table that :func:`bpe_tokenize` joins against
    (the tokenizer's application cache; tokenization never re-runs the
    merge loop).
    """
    if merges_per_round < 1:
        raise ValueError(
            f"merges_per_round must be >= 1, got {merges_per_round}"
        )
    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("__w"))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    # NB Spark's split keeps a trailing empty element — drop it or the
    # empty string becomes a phantom symbol in every word
    chars = F.filter(F.split(F.col("__w"), "(?!^)"), lambda x: x != "")
    cur = words.withColumn("__sym", chars).persist()
    cur.count()  # materialize before the loop
    merges: list[tuple[str, str, int]] = []
    r = 0
    while len(merges) < num_merges:
        m = min(merges_per_round, num_merges - len(merges))
        pair = F.explode(
            F.zip_with(
                F.slice(F.col("__sym"), 1, F.size("__sym") - 1),
                F.slice(F.col("__sym"), 2, F.size("__sym") - 1),
                lambda x, y: F.struct(x.alias("a"), y.alias("b")),
            )
        ).alias("__p")
        ranked_df = (
            cur.select(F.col("__n"), pair)
            .groupBy(F.col("__p")["a"].alias("a"), F.col("__p")["b"].alias("b"))
            .agg(F.sum("__n").alias("freq"))
            .filter(F.col("freq") >= min_freq)
            .orderBy(F.col("freq").desc(), F.col("a"), F.col("b"))
        )
        # fetch a ranked prefix big enough for the greedy disjoint scan;
        # grow it in the (rare) case conflicts exhaust the prefix while
        # more eligible pairs exist
        limit = 8 * m + 16
        while True:
            ranked = ranked_df.take(limit)
            sel = _greedy_disjoint(ranked, m)
            if len(sel) >= m or len(ranked) < limit:
                break
            limit *= 4
        if not sel:
            break
        sym = F.col("__sym")
        for row in sel:
            merges.append((row["a"], row["b"], int(row["freq"])))
            # disjoint merges commute; compose in selection order
            sym = _apply_bpe_merge(sym, row["a"], row["b"])
        nxt = cur.withColumn("__sym", sym)
        # truncate lineage every few rounds; otherwise each round's
        # fold nests inside the previous plan
        r += 1
        if r % 4 == 0:
            nxt = nxt.persist()
            nxt.count()
            cur.unpersist()
        cur = nxt
    final = cur.persist()
    final.count()
    return merges, final


def bpe_tokenize(
    df: "DataFrame",
    id_col: str,
    text_col: str,
    vocab: "DataFrame",
) -> "DataFrame":
    """Tokenize documents with a trained BPE vocab
    (:func:`bpe_train`'s word -> symbols table): per-doc word and
    BPE-token counts.

    Scale shape: tokenization is a JOIN against the vocab table on the
    word — never a re-run of the merge loop — so the corpus-side plan
    is explode + one equi-join (broadcast when the vocab fits, shuffle
    hash otherwise) + partial-aggregated groupBy(doc).  Out-of-vocab
    words fall back to character splitting (the untrained base
    alphabet), so the operator is total over any input corpus.

    Output: ``(id, n_words, n_bpe_tokens)``.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__w")
    )
    j = toks.join(vocab.select("__w", "__sym"), "__w", "left")
    per_tok = F.when(
        F.col("__sym").isNotNull(), F.size("__sym")
    ).otherwise(F.length(F.col("__w")))  # OOV: base-alphabet chars
    return j.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(per_tok).cast("long").alias("n_bpe_tokens"),
    )



def pmi_collocations(
    df: "DataFrame",
    text_col: str,
    min_count: int = 5,
    top_k: int = 100,
) -> "DataFrame":
    """Collocation mining by pointwise mutual information: the top-k
    adjacent-token pairs by ``PMI = log(p(a,b) / (p(a) * p(b)))``
    among pairs seen at least ``min_count`` times — the standard
    multi-word-expression detector ("new york", "machine learning")
    of corpus analysis (Church & Hanks 1990, public).

    Probabilities are corpus-frequency ratios over the SAME bigram
    population: ``p(a, b) = c(a, b) / N``, ``p(a) = c(a as left) / N``,
    ``p(b) = c(b as right) / N`` with ``N`` = total bigram count — the
    directional-margin convention, exactly reproducible in SQL.

    Scale shape: bigram extraction is map-only (zip of the token array
    with its tail), then three partial-aggregated groupBys (pairs,
    left margins, right margins — hot tokens collapse map-side so
    Zipf skew never concentrates a partition), two equi-joins on the
    margin keys, and a global top-k (rank over a single ordered
    column, limit-pushed).  The min_count filter prunes the pair table
    BEFORE the joins — at 100 TB that is the difference between
    joining the Zipf tail and joining a vocabulary-sized table.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    toks = tokens(F.col(text_col))
    pairs = df.select(
        F.explode(
            F.zip_with(
                F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            )
        ).alias("__p")
    ).select(F.col("__p.a").alias("a"), F.col("__p.b").alias("b"))
    pair_counts = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    left = pairs.groupBy("a").agg(F.count(F.lit(1)).alias("c_a"))
    right = pairs.groupBy("b").agg(F.count(F.lit(1)).alias("c_b"))
    total = pairs.agg(F.count(F.lit(1)).alias("n_total"))
    scored = (
        pair_counts.filter(F.col("c_ab") >= min_count)
        .join(left, "a")
        .join(right, "b")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    F.col("c_ab").cast("double") * F.col("n_total")
                    / (F.col("c_a").cast("double") * F.col("c_b"))
                ),
                6,
            ),
        )
    )
    # global top-k via orderBy+limit = TakeOrderedAndProject (each
    # partition keeps its local top-k, driver merges k) — never a
    # SinglePartition row_number funnel
    return (
        scored.orderBy(
            F.col("pmi").desc(), F.col("c_ab").desc(), F.col("a"), F.col("b")
        )
        .limit(top_k)
        .select("a", "b", "c_ab", "pmi")
    )
