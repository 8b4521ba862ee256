"""Golden-plan tests (analogue of the reference's ExplainTest /
plan-regression suites, SURVEY.md §5.3): assert the physical plan shape
we designed for — broadcasts where intended, pushdown reaching the scan,
no Python in JVM-only pipelines.
"""

from __future__ import annotations

from flink_1_8_sourcecode_spark.queries import load_all
from tests.conftest import SF_DIR

REGISTRY = load_all()


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].spark(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q3_broadcasts_dimensions(spark):
    # no forced hint on customer — the size-based threshold must still
    # pick a broadcast join at this sf, proving auto-selection works
    plan = _plan(spark, "tpch_q3")
    assert "BroadcastHashJoin" in plan


def _hint_count(spark, name: str) -> int:
    df = REGISTRY[name].spark(spark, SF_DIR)
    return df._jdf.queryExecution().analyzed().toString().count("ResolvedHint")


def test_no_forced_broadcast_on_scaling_tables(spark):
    """customer/supplier/part grow with sf; a forced broadcast hint is
    honored regardless of size and fails past the 8 GB limit instead of
    demoting.  Only bounded dims (nation 25 rows, region 5 rows) and
    single-row aggregates may carry explicit hints."""
    expected_bounded_hints = {
        "tpch_q3": 0,   # customer join: size-based only
        "tpch_q14": 0,  # part join: size-based only
        "tpch_q18": 0,  # customer join: size-based only
        "join_inner": 0,
        "tpch_q5": 2,   # nation + region
        "tpch_q10": 1,  # nation
        "join_single_row": 1,  # single-row aggregate broadcast NL join
        "tpch_q9": 1,   # nation only; part/supplier/orders: size-based
        "tpch_q21": 0,  # lineitem/orders/supplier all scale with sf
        "tpch_q2": 2,   # nation + region; supply/supplier: size-based
        "tpch_q17": 0,  # lineitem/part both scale with sf
    }
    for name, n in expected_bounded_hints.items():
        assert _hint_count(spark, name) == n, f"{name}: unexpected broadcast hints"


def test_q6_pushes_filters_to_scan(spark):
    plan = _plan(spark, "tpch_q6")
    assert "PushedFilters" in plan
    # the shipdate range must reach the parquet reader, not a post-filter only
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]


def test_q1_prunes_columns(spark):
    plan = _plan(spark, "tpch_q1")
    read = plan.split("ReadSchema")[1][:500]
    assert "l_comment" not in read  # never read what the query doesn't touch
    assert "l_partkey" not in read  # q1 doesn't use partkey


def test_dedup_minhash_has_partial_aggregation(spark):
    # the groupBy-min signature agg must have a map-side partial step
    plan = _plan(spark, "dedup_minhash_lsh")
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_jvm_only_queries_have_no_python_stage(spark):
    for name in ("tpch_q1", "tpch_q5", "dedup_minhash_lsh", "text_wordcount", "sim_topk_bruteforce"):
        plan = _plan(spark, name)
        assert "Python" not in plan, f"{name} unexpectedly leaves the JVM"


def test_whole_stage_codegen_active(spark):
    df = REGISTRY["tpch_q1"].spark(spark, SF_DIR)
    df.collect()  # AQE only finalizes (and shows codegen spans) after execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # '*(n)' node prefixes mark WholeStageCodegen spans in the final plan
    assert "*(" in plan


def test_q19_or_of_ands_pushes_to_scan(spark):
    """The disjunction of conjunctive ranges must reach the lineitem
    parquet scan (Catalyst keeps the l_quantity arms of each conjunct),
    not evaluate only post-join."""
    plan = _plan(spark, "tpch_q19")
    pushed = plan.split("PushedFilters: [")[1][:400]
    assert "l_quantity" in pushed
    assert "Or(" in pushed


def test_lsh_reuses_signature_exchange(spark):
    """The hot-bucket guard branches (small self-join sides + hot
    filter) must share the signature pipeline via ReusedExchange in the
    final AQE plan — a stats-join variant silently recomputed it per
    branch (~2x slower)."""
    df = REGISTRY["dedup_minhash_lsh"].spark(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ReusedExchange") >= 1


def test_pq_train_broadcast_assign_no_corpus_shuffle_join(spark):
    """PQ training's assign step must never shuffle the corpus-derived
    side per Lloyd iteration.  Since r16 the whole m x k codebook rides
    as ONE broadcast array row (BroadcastNestedLoopJoin with a 1-row
    build side) and the argmin is a map-only array_min over
    (distance, cluster) structs — there is no per-id ranking Window and
    no equi-join at all; a sort-merge, cartesian, or id-partitioned
    Window would mean the corpus moves every round."""
    from flink_1_8_sourcecode_spark.catalog import table
    from flink_1_8_sourcecode_spark.operators.similarity import pq_train

    emb = table(spark, SF_DIR, "embeddings")
    codes, _cb = pq_train(emb, "vec_id", "embedding", m=8, k=16, iterations=1)
    plan = codes._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    # the old lowering ranked corpus x k rows with a window — gone
    assert "Window" not in plan


def test_join_with_tiny_huge_hint_sides(spark):
    """joinWithTiny/joinWithHuge parity: the declared-small side is the
    broadcast build side in the physical plan."""
    from flink_1_8_sourcecode_spark.catalog import table
    from flink_1_8_sourcecode_spark.operators.joins import (
        join_with_huge,
        join_with_tiny,
    )

    nation = table(spark, SF_DIR, "nation")
    region = table(spark, SF_DIR, "region")
    t = join_with_tiny(nation, region, nation.n_regionkey == region.r_regionkey)
    pt = t._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in pt and "BuildRight" in pt, pt[:600]
    h = join_with_huge(region, nation, region.r_regionkey == nation.n_regionkey)
    ph = h._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in ph and "BuildLeft" in ph, ph[:600]


def test_text_signal_ops_are_map_only(spark):
    """The corpus text signals (entropy, URL filter, chunking, line
    dedup) must stay map-only — a shuffle in any of them turns a
    linear 100 TB scan into a repartition of the corpus."""
    from flink_1_8_sourcecode_spark.catalog import table
    from flink_1_8_sourcecode_spark.operators.text import (
        char_entropy,
        chunk_documents,
        dedup_lines,
        domain_blocklist_flag,
    )
    from pyspark.sql import functions as F

    d = table(spark, SF_DIR, "documents")
    plans = {
        "entropy": d.select(char_entropy(F.col("text"))),
        "urls": domain_blocklist_flag(d, "text", ["x.example"]),
        "chunks": chunk_documents(d, "doc_id", "text", 128, 96),
        "dedup_lines": d.select(dedup_lines(F.col("text"))),
    }
    for name, df in plans.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"{name} must not shuffle:\n{plan[:800]}"


def test_cross_with_tiny_huge_hint_sides(spark):
    """crossWithTiny/crossWithHuge parity (DataSet.java:1068,1090): the
    declared-small side is the broadcast side of the nested-loop."""
    from flink_1_8_sourcecode_spark.catalog import table
    from flink_1_8_sourcecode_spark.operators.joins import (
        cross_with_huge,
        cross_with_tiny,
    )

    nation = table(spark, SF_DIR, "nation")
    region = table(spark, SF_DIR, "region")
    t = cross_with_tiny(nation, region)
    pt = t._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in pt and "BuildRight" in pt, pt[:600]
    h = cross_with_huge(region, nation)
    ph = h._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in ph and "BuildLeft" in ph, ph[:600]


def test_repeated_spans_single_span_exchange(spark):
    """repeated_ngram_spans: window generation is map-side; the only
    exchanges belong to the span aggregate (count + countDistinct) —
    the corpus text itself is never repartitioned twice."""
    from flink_1_8_sourcecode_spark.catalog import table
    from flink_1_8_sourcecode_spark.operators.dedup import repeated_ngram_spans

    d = table(spark, SF_DIR, "documents")
    out = repeated_ngram_spans(d, "doc_id", "text", n=10, min_count=2,
                              hash_prepass=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 2, f"{n_exchanges} exchanges\n{plan[:1500]}"
    assert "Generate explode" in plan  # map-side window generation


def test_repeated_spans_hash_prepass_exchanges_carry_hashes(spark):
    """Default repeated_ngram_spans: the corpus-wide count exchange
    carries xxhash64 values, never span strings — array_join (string
    materialization) happens only after the survivor semi-join."""
    from flink_1_8_sourcecode_spark.catalog import table
    from flink_1_8_sourcecode_spark.operators.dedup import repeated_ngram_spans

    d = table(spark, SF_DIR, "documents")
    out = repeated_ngram_spans(d, "doc_id", "text", n=10, min_count=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan, plan[:1500]
    # string spans are built exactly once (the survivor-site pass), not
    # inside the window-generation explode
    assert plan.count("array_join") == 1, plan[:2000]


def test_stream_static_temporal_join_is_stateless(spark):
    """temporal_join with a streaming probe and static history must
    plan NO stateful operator — pure per-batch mapInPandas."""
    import tempfile

    import datetime as dt

    from pyspark.sql import functions as F

    from flink_1_8_sourcecode_spark.operators.joins import (
        create_temporal_table_function,
        temporal_join,
    )

    hist = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1.0)], "k long, vt timestamp, payload double"
    )
    d = tempfile.mkdtemp(prefix="tj_plan_")
    hist.write.mode("overwrite").parquet(d)
    probe = spark.readStream.schema(hist.schema).parquet(d).select(
        "k", F.col("vt").alias("pt")
    )
    ttf = create_temporal_table_function(hist, "vt", "k")
    out = temporal_join(probe, ttf, probe_time="pt", how="inner")
    s = out._jdf.queryExecution().analyzed().toString()
    assert "FlatMapGroupsWithState" not in s and "statestore" not in s.lower()


def _final_plan(df):
    df.collect()  # AQE: the final plan only materializes after execution
    return df._jdf.queryExecution().executedPlan().toString().split(
        "+- == Initial Plan =="
    )[0]


def test_paragraph_dedup_two_shuffles_plus_broadcast(spark, sf_dir):
    """The CCNet paragraph dedup's 100 TB claim: exactly two hash
    exchanges (md5-keeper groupBy + keeper-doc groupBy, both
    partial-aggregated) and the keep-empty-docs join back broadcasts."""
    import re

    from flink_1_8_sourcecode_spark.queries import load_all

    plan = _final_plan(load_all()["dedup_paragraphs_global"].spark(spark, sf_dir))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2, plan[:3000]
    assert "BroadcastHashJoin" in plan, plan[:3000]


def test_feature_hash_embed_two_shuffles(spark, sf_dir):
    """Feature hashing: one partial-agg bucket-sum groupBy + the per-doc
    norm window — two hash exchanges, nothing else."""
    import re

    from flink_1_8_sourcecode_spark.queries import load_all

    plan = _final_plan(load_all()["text_feature_hash_embed"].spark(spark, sf_dir))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2, plan[:3000]


def test_dsir_lm_joins_broadcast_at_small_scale(spark, sf_dir):
    """DSIR: the vocab-bounded LM tables broadcast into the scoring
    joins (two BroadcastHashJoins); the corpus-side token explode pays
    two partial-agg exchanges, never a cartesian."""
    from flink_1_8_sourcecode_spark.queries import load_all

    plan = _final_plan(load_all()["sample_dsir"].spark(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") == 2, plan[:3000]
    assert "CartesianProduct" not in plan


def test_sessionization_single_user_exchange(spark, sf_dir):
    """The gaps-and-islands sessionization's 100 TB claim: ONE hash
    exchange on user_id feeds both windows and both aggregations
    (hashpartitioning(user_id) satisfies the (user_id, session_id)
    clustering), plus only AQE coalesce/single-partition reads."""
    import re

    from flink_1_8_sourcecode_spark.queries import load_all

    plan = _final_plan(load_all()["agg_sessionization"].spark(spark, sf_dir))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan[:3000]


def test_tfidf_reuses_tf_exchange_single_scan(spark, sf_dir):
    """TF-IDF's 100 TB claim: the (doc, term) tf exchange is computed
    once and REUSED by the document-frequency branch (no second
    scan+tokenize+explode of the corpus); final plan = tf exchange +
    vocab-bounded term exchange + one doc-keyed exchange."""
    import re

    from flink_1_8_sourcecode_spark.queries import load_all

    plan = _final_plan(load_all()["text_tfidf_terms"].spark(spark, sf_dir))
    assert "ReusedExchange" in plan, plan[:3000]
    # count real exchange operators, not the ReusedExchange line's
    # textual reference to the exchange it reuses
    assert len(re.findall(r"\+- Exchange hashpartitioning", plan)) == 3, plan[:3000]
    # exactly one scan reads the text column (the n_docs count scan is
    # column-pruned to an empty schema)
    assert plan.count("text:string") == 1, plan[:3000]


def test_pii_scrub_is_map_only(spark, sf_dir):
    """scrub_pii's 100 TB claim: a regexp_replace chain is one map-only
    stage — zero exchanges, runs at parquet-scan speed."""
    from flink_1_8_sourcecode_spark.catalog import table
    from flink_1_8_sourcecode_spark.operators.text import scrub_pii

    d = table(spark, sf_dir, "documents")
    plan = _final_plan(scrub_pii(d, "text").select("doc_id", "scrubbed", "n_masked"))
    assert "Exchange" not in plan, plan[:2000]
    # codegen prints as "*(n)" stage markers in the executed-plan string
    assert "*(1)" in plan, plan[:2000]


def test_char_spans_exchange_carries_hashes_not_substrings(spark):
    """repeated_char_spans: the corpus-wide count exchange carries
    xxhash64(substr) values; real substrings materialize only at the
    survivor-site recount — same discipline as the token family."""
    from flink_1_8_sourcecode_spark.catalog import table
    from flink_1_8_sourcecode_spark.operators.dedup import repeated_char_spans

    d = table(spark, SF_DIR, "documents")
    plan = (
        repeated_char_spans(d, "doc_id", "text", n=50, min_count=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "xxhash64" in plan, plan[:1500]
    # the span-text substr appears exactly once (survivor pass), not in
    # the window-hash explode
    assert plan.count("substr(__text") == 1, plan[:2500]


def test_table_api_filter_reaches_parquet_pushdown(spark, sf_dir):
    """The string-expression facade lowers to Catalyst Columns, so a
    .filter() string lands in the parquet scan's PushedFilters like any
    native DataFrame predicate."""
    from flink_1_8_sourcecode_spark.catalog import table
    from flink_1_8_sourcecode_spark.table_api import Table

    li = Table(table(spark, sf_dir, "lineitem"))
    out = li.filter("l_quantity > 45").select("l_orderkey, l_quantity")
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "l_quantity" in plan.split(
        "PushedFilters"
    )[1][:200], plan[:2000]
    # column pruning: only the two referenced columns are read
    assert "ReadSchema" in plan and "l_extendedprice" not in plan.split(
        "ReadSchema"
    )[1][:300], plan[:2000]


def test_cap_per_key_single_exchange(spark, sf_dir):
    """cap_per_key: one key-hash exchange feeds the per-key rank."""
    import re

    from flink_1_8_sourcecode_spark.queries import load_all

    plan = _final_plan(load_all()["sample_cap_per_key"].spark(spark, sf_dir))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan[:2500]


def test_heavy_hitters_single_exchange_broadcast_candidates(spark, sf_dir):
    """certified_heavy_hitters' 100 TB claim: the corpus is never
    shuffled on the item key space — candidates broadcast into the
    semi-join and the only hash exchange is the candidate recount."""
    import re

    from flink_1_8_sourcecode_spark.queries import load_all

    plan = _final_plan(load_all()["text_heavy_hitters"].spark(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan[:2500]
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan[:2500]


def test_pack_interleave_no_per_source_window_funnel(spark):
    """pack_sequences / interleave_sources / token_budget_mix must NOT
    compute their per-source order with Window.partitionBy(source) —
    that funnels every row of a source through ONE task (parallelism <=
    #sources; a 100 TB corpus has 5-20 sources).  The two-pass
    prefix_sum_per_key shape leaves a Window only over the bounded
    per-(partition, key) counts table (partitioned by __pid sums)."""
    import re

    for name in (
        "pipeline_pack_sequences",
        "pipeline_curriculum_pack",
        "sample_interleave_sources",
        "mix_token_budget",
    ):
        plan = _plan(spark, name)
        # every Window node in the plan must be the bounded-offsets one
        # (operates on the __psn per-partition sums), never a full-row
        # window keyed on the source column
        for m in re.finditer(r"Window \[[^\]]*\]", plan):
            frag = m.group(0)
            # allowed: the bounded per-(partition,key) offsets window
            # (__psn sums) and interleave's one-row-per-source index
            # window (__s) — both operate on aggregate-bounded tables
            assert "__psn" in frag or "__s#" in frag, (
                f"{name}: full-row window funnel back in plan:\n{frag}"
            )
        # and the distributed labeler must be present
        assert "MapInPandas" in plan or "mapInPandas" in plan, name


def test_blocklist_gate_broadcast_anti_no_corpus_shuffle(spark, sf_dir):
    """text_blocklist_gate: the blocklist joins as a BROADCAST left-anti
    on the domain — the corpus side must show NO Exchange
    hashpartitioning (a shuffled anti-join on billions of docs would be
    the bottleneck at 100 TB)."""
    plan = _plan(spark, "text_blocklist_gate")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_multimodal_exact_dedup_hashes_not_payloads(spark, sf_dir):
    """multimodal_exact_dedup: one partial-aggregated exchange keyed on
    the sha256 digest — the shuffle carries 32-byte hashes, never media
    payload bytes (the 'content' column must not survive into the
    exchange)."""
    import re

    plan = _plan(spark, "multimodal_exact_dedup")
    exchanges = re.findall(r"Exchange hashpartitioning\([^)]*\)", plan)
    assert len(exchanges) == 1, plan
    # the key is the computed digest (_groupingexpression), never the
    # payload column
    assert "content#" not in exchanges[0], exchanges[0]
    assert "sha2(" in plan, plan
    # partial aggregation before the exchange (map-side combine)
    assert plan.count("HashAggregate") >= 2, plan


def test_table_api_interval_arithmetic_map_only(spark, sf_dir):
    """Interval-literal projection: zero exchanges, single WSCG span
    over the scan."""
    plan = _plan(spark, "table_api_interval_arithmetic")
    assert "Exchange" not in plan, plan
    # '*(1)' is the WholeStageCodegen stage marker in executedPlan text
    assert "*(1)" in plan, plan


def test_join_lateral_is_generate_over_scan(spark, sf_dir):
    """table_api_join_lateral lowers to the same Generate (explode)
    plan as the native posexplode form — no Python in the hot path,
    no exchange."""
    plan = _plan(spark, "table_api_join_lateral")
    assert "Generate" in plan, plan
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_curate_gate_stateless_broadcast_anti(spark, sf_dir):
    """curate_gate (the streaming ingestion gate): the ENTIRE gate —
    blocklist + bad-word ratio + classifier margin — must be map-only
    plus one broadcast LEFT-ANTI: zero hash exchanges on the corpus,
    which is what makes it safe to run stateless on a live stream."""
    from pyspark.sql import functions as F

    from flink_1_8_sourcecode_spark.catalog import table
    from flink_1_8_sourcecode_spark.operators.pipeline import curate_gate

    d = table(spark, SF_DIR, "documents").withColumn(
        "url", F.concat(F.lit("http://"), F.col("source"), F.lit(".x.com/d"))
    )
    blocked = spark.createDataFrame([("src0.x.com",)], "domain string")
    out = curate_gate(
        d, "url", "text", blocked, badwords=["slow"],
        weights=[0.1] * 4096, bias=0.0,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    # the coefficient vector rides in the plan, not as a join
    assert plan.count("BroadcastHashJoin") == 1, plan


def test_cogroup_batch_two_copartition_exchanges(spark, sf_dir):
    """DataStream facade windowed coGroup, batch path: native
    cogroup(applyInPandas) — exactly one co-partitioning exchange per
    side feeding FlatMapCoGroupsInPandas, nothing else."""
    import re

    import pandas as pd
    from pyspark.sql import functions as F

    from flink_1_8_sourcecode_spark.catalog import table
    from flink_1_8_sourcecode_spark.datastream_api import DataStream

    ev = table(spark, SF_DIR, "events")
    l = DataStream(ev.select(F.col("user_id").alias("u"),
                             F.col("ts").alias("lt")))
    r = DataStream(ev.select(F.col("user_id").alias("u2"),
                             F.col("ts").alias("rt")))
    out = (
        l.co_group(r).where("u").equal_to("u2").window("lt", "rt", "1 day")
        .apply(lambda lp, rp: pd.DataFrame({"n": [len(lp) + len(rp)]}),
               "n long")
    )
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan, plan
    exchanges = re.findall(r"Exchange hashpartitioning", plan)
    assert len(exchanges) == 2, plan


def test_trained_classifier_broadcasts_coefficients(spark, sf_dir):
    """quality_classifier_score with a trained fit: the coefficient
    table joins BROADCAST (n_buckets rows vs a corpus of tokens) and
    the only hash exchange is the per-doc partial aggregation."""
    import re

    from flink_1_8_sourcecode_spark.catalog import table
    from flink_1_8_sourcecode_spark.operators.text import (
        quality_classifier_score,
    )

    d = table(spark, SF_DIR, "documents")
    out = quality_classifier_score(
        d, "doc_id", "text", weights=[0.1] * 4096, bias=0.2
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    exchanges = re.findall(r"Exchange hashpartitioning\(([^,]*)", plan)
    assert len(exchanges) == 1 and "doc_id" in exchanges[0], plan
    assert plan.count("HashAggregate") >= 2, plan  # map-side combine


def test_embedding_ingest_dedup_no_incoming_shuffle(spark, sf_dir):
    """embedding_ingest_dedup (nprobe=1): the incoming side must show
    NO hash exchange — centroid probe is map-only and the candidate
    check joins the frozen index without reshuffling the stream side
    (the property that makes it stateless at ingestion)."""
    from pyspark.sql import functions as F

    from flink_1_8_sourcecode_spark.catalog import table
    from flink_1_8_sourcecode_spark.operators.dedup import (
        embedding_ingest_dedup,
    )

    emb = table(spark, SF_DIR, "embeddings")
    out = embedding_ingest_dedup(
        emb.filter(F.col("vec_id") < 50), emb.filter(F.col("vec_id") >= 50),
        "vec_id", "embedding", "label", threshold=0.3,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_snapshot_diff_exchanges_digests_not_payload(spark, sf_dir):
    """pipeline_snapshot_diff: the full-outer join must exchange
    (id, md5 digest) rows — the text payload column is projected away
    before every exchange."""
    import re

    plan = _plan(spark, "pipeline_snapshot_diff")
    for ex in re.findall(r"Exchange hashpartitioning[^\n]*", plan):
        assert "text#" not in ex, ex
    assert "md5(" in plan, plan
    assert "FullOuter" in plan or "full_outer" in plan, plan


def test_grammar_tail_queries_are_map_only(spark, sf_dir):
    """The temporal/math and string grammar-tail queries must lower to
    pure Catalyst projections: zero exchanges, zero Python evals."""
    for name in ("table_api_temporal_functions", "table_api_string_functions",
                 "table_api_string_concat"):
        plan = _plan(spark, name)
        assert "Exchange" not in plan, (name, plan)
        assert "EvalPython" not in plan, (name, plan)


def test_kmv_sketch_single_truncated_exchange(spark, sf_dir):
    """sketch_kmv_distinct: exactly ONE exchange, fed by the map-side
    k-truncation (mapInPandas) — and the scan reads only the two
    needed columns."""
    import re

    plan = _plan(spark, "sketch_kmv_distinct")
    assert len(re.findall(r"Exchange ", plan)) == 1, plan
    assert "MapInPandas" in plan, plan
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m and set(re.findall(r"(\w+):", m.group(1))) <= {
        "event_type", "user_id"
    }, m and m.group(1)


def test_cms_probe_join_broadcasts_counters(spark, sf_dir):
    """sketch_cms_frequency: the probe join must broadcast the bounded
    depth x width counter table, never shuffle the token stream into
    the join."""
    plan = _plan(spark, "sketch_cms_frequency")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_weighted_sample_no_single_partition_funnel(spark, sf_dir):
    """sample_weighted_noreplace: the per-group rank comes from the
    two-pass machinery — no global SinglePartition exchange, no
    partition-by-group Window funnel over the corpus."""
    plan = _plan(spark, "sample_weighted_noreplace")
    assert "Exchange SinglePartition" not in plan, plan


def test_descriptor_source_prunes_and_filters(spark, tmp_path):
    """A descriptor/environment-registered CSV source is a real file
    scan Catalyst optimizes: column pruning reaches ReadSchema and the
    query filter sits on the scan side, not a driver loop."""
    from flink_1_8_sourcecode_spark.descriptors import (
        FileSystem,
        OldCsv,
        Schema,
    )
    from flink_1_8_sourcecode_spark.engine import Engine

    d = str(tmp_path / "plan_csv")
    spark.range(100).selectExpr(
        "id as a", "id * 2 as b", "repeat('x', 10) as c"
    ).write.mode("overwrite").option("sep", "|").csv(d)
    eng = Engine(spark)
    (
        eng.connect(FileSystem().path(d))
        .with_format(
            OldCsv().field("a", "BIGINT").field("b", "BIGINT")
            .field("c", "STRING").field_delimiter("|")
        )
        .with_schema(
            Schema().field("a", "BIGINT").field("b", "BIGINT")
            .field("c", "STRING")
        )
        .register_table_source("plan_csv_t")
    )
    df = eng.sql("SELECT a FROM plan_csv_t WHERE a > 50")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan csv" in plan
    read = plan.split("ReadSchema")[1][:300]
    assert "c" not in read.replace("struct<", "")  # pruned
    assert "PushedFilters" in plan
    assert df.count() == 49


def test_environment_view_folds_into_scan_plan(spark, tmp_path):
    """A YAML-environment view is a plain Catalyst plan — the view's
    filter and the outer aggregation collapse into one scan +
    partial/final agg, no materialization boundary."""
    from flink_1_8_sourcecode_spark.engine import Engine
    from flink_1_8_sourcecode_spark.environment import load_environment

    d = str(tmp_path / "env_plan_csv")
    spark.range(1000).selectExpr(
        "id as a", "cast(id % 7 as string) as g"
    ).write.mode("overwrite").option("sep", "|").csv(d)
    eng = Engine(spark)
    fields = [{"name": "a", "type": "BIGINT"}, {"name": "g", "type": "VARCHAR"}]
    load_environment(eng, {
        "tables": [
            {"name": "envp_t", "type": "source-table",
             "schema": fields,
             "connector": {"type": "filesystem", "path": d},
             "format": {"type": "csv", "fields": fields,
                        "field-delimiter": "|"}},
            {"name": "envp_v", "type": "view",
             "query": "SELECT g, a FROM envp_t WHERE a >= 100"},
        ],
    })
    df = eng.sql("SELECT g, sum(a) AS s FROM envp_v GROUP BY g")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan csv" in plan
    assert plan.count("Exchange") == 1  # one agg shuffle, nothing else
    assert "HashAggregate" in plan  # partial+final pair present
