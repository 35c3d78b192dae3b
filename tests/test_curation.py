"""Curation-operator semantics on planted inputs (the synthetic corpus is
uniform enough that the oracle gate alone can't show contamination detection
or budget cutoffs doing their job)."""

from __future__ import annotations

from pyspark.sql import functions as F

import pyspark_retention_pipeline_spark.operators.curation as cu


def _docs(spark, monkeypatch, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    monkeypatch.setattr(cu, "load_table", lambda *_, **__: docs)
    return docs


def test_ngram_contamination_flags_eval_overlap(spark, monkeypatch):
    eval_text = "alpha beta gamma delta epsilon zeta eta theta"
    # doc 5 copies a full 5-gram from the eval doc; doc 1 shares no 5-gram.
    contaminated = "xx alpha beta gamma delta epsilon yy zz ww vv"
    clean = "one two three four five six seven eight nine ten"
    _docs(
        spark,
        monkeypatch,
        [(0, eval_text, 1), (5, contaminated, 1), (1, clean, 1)],
    )
    out = {r["doc_id"]: r for r in cu.ngram_contamination(spark, "ignored").collect()}
    # eval docs (doc_id % 97 == 0) are scanned against, never scored
    assert set(out) == {5, 1}
    assert out[5]["n_contaminated"] >= 1
    assert out[5]["contaminated_frac"] > 0.0
    assert out[1]["n_contaminated"] == 0
    assert out[1]["contaminated_frac"] == 0.0


def test_token_budget_selects_whole_bins_top_down(spark, monkeypatch):
    # Three quality bins (n_chars 150 / 100 / 50 → bins 3 / 2 / 1), each doc
    # 10 tokens. Budget 25 tokens: bin 3 (20 tokens above = 0 < 25 for bin 3,
    # 20 < 25 for bin 2 → selected; bin 1 has 40 tokens above ≥ 25 → cut).
    text = " ".join(f"t{i}" for i in range(10))
    rows = [
        (1, text, 150),
        (2, text, 150),
        (3, text, 100),
        (4, text, 100),
        (5, text, 50),
        (6, text, 50),
    ]
    _docs(spark, monkeypatch, rows)
    monkeypatch.setattr(cu, "TOKEN_BUDGET", 25)
    got = sorted(r["doc_id"] for r in cu.token_budget_select(spark, "ignored").collect())
    assert got == [1, 2, 3, 4]


def test_token_budget_window_runs_on_bins_not_corpus(spark, sf_dir):
    """The only window in the plan consumes the per-bin aggregate (rows =
    distinct bins), never the corpus — the scale contract that distinguishes
    this from the single-partition running-sum formulation."""
    from pyspark_retention_pipeline_spark.plans.inspect import explain_str

    plan = explain_str(cu.token_budget_select(spark, sf_dir))
    assert "Window" in plan
    # The bin frame reaching the window is an aggregate (one row per bin)...
    assert "HashAggregate" in plan
    # ...and the corpus-side join against the selected bins is a broadcast —
    # the corpus itself never re-partitions for the selection.
    assert "BroadcastHashJoin" in plan


def test_lang_mix_sample_downweights_target(spark, sf_dir):
    """The mixture sampler keeps ~50% of 'en' docs and 100% of every other
    language, deterministically."""
    from pyspark.sql import functions as F

    from pyspark_retention_pipeline_spark.registry import all_queries
    from pyspark_retention_pipeline_spark.tables import load_table

    qs = all_queries()
    before = {
        r["lang"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    after = {
        r["lang"]: r["n"]
        for r in qs["lang_mix_sample"](spark, sf_dir)
        .groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, n in before.items():
        if lang == "en":
            assert after["en"] < n, "en must be downsampled"
        else:
            assert after[lang] == n, f"{lang} must be kept whole"
    # determinism: a second evaluation selects the identical doc set
    a = {r["doc_id"] for r in qs["lang_mix_sample"](spark, sf_dir).collect()}
    b = {r["doc_id"] for r in qs["lang_mix_sample"](spark, sf_dir).collect()}
    assert a == b


def test_train_val_test_split_partitions_corpus(spark, sf_dir):
    """Every doc lands in exactly one split, proportions are ~90/5/5, and
    assignment is stable across evaluations."""
    from pyspark_retention_pipeline_spark.registry import all_queries
    from pyspark_retention_pipeline_spark.tables import load_table

    qs = all_queries()
    rows = qs["train_val_test_split"](spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    by_split = {}
    for r in rows:
        by_split.setdefault(r["split"], set()).add(r["doc_id"])
    assert set(by_split) == {"train", "val", "test"}
    total = sum(len(v) for v in by_split.values())
    assert total == n_docs
    assert 0.8 < len(by_split["train"]) / total < 0.97
    again = {(r["doc_id"], r["split"]) for r in qs["train_val_test_split"](spark, sf_dir).collect()}
    assert {(d, s) for s, ds in by_split.items() for d in ds} == again


def test_group_aware_split_keeps_groups_together(spark):
    """Splitting on a group key (e.g. dedup-cluster canonical id) must put
    every member of a group in the same split — the near-dup leakage
    guard — while doc-keyed splitting of the same frame may not."""
    from pyspark_retention_pipeline_spark.operators.sampling import (
        split_assignment_frame,
    )

    rows = [(i, i % 7) for i in range(200)]  # 7 clusters of ~29 docs
    df = spark.createDataFrame(rows, "doc_id long, cluster_id long")
    out = split_assignment_frame(df, "cluster_id").collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values()), by_cluster
    # sanity: the same frame split per-doc spreads docs over several splits
    per_doc = {r["split"] for r in split_assignment_frame(df, "doc_id").collect()}
    assert len(per_doc) > 1


def test_curate_corpus_stage_invariants(spark, sf_dir):
    """The end-to-end pipeline's stage contracts: output is deduplicated,
    excludes the held-out eval slice, honors the integer contamination
    keep-rule, and assigns exactly one split per doc."""
    from pyspark_retention_pipeline_spark.registry import all_queries

    rows = all_queries()["curate_corpus"](spark, sf_dir).collect()
    assert rows
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    for r in rows:
        assert r["doc_id"] % cu.EVAL_MOD != 0
        assert r["n_contaminated"] * cu.CONTAM_KEEP_DEN <= r["n_grams"]
        assert r["split"] in {"train", "val", "test"}


def test_curate_corpus_neardup_no_cluster_straddles_split(spark, sf_dir):
    """Round-3 verdict item 2's leakage guard: in the near-dup-aware
    pipeline, no connected-component cluster — and no raw minhash candidate
    pair — ends up with members on different sides of train/val/test."""
    from pyspark_retention_pipeline_spark.operators.text import (
        minhash_candidate_pairs,
    )
    from pyspark_retention_pipeline_spark.registry import all_queries
    from pyspark_retention_pipeline_spark.tables import load_table

    out = all_queries()["curate_corpus_neardup"](spark, sf_dir).localCheckpoint()
    straddlers = (
        out.groupBy("canonical_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert straddlers == 0
    # the direct leakage property: both endpoints of every candidate pair
    # land on the same side
    pairs = minhash_candidate_pairs(load_table(spark, sf_dir, "documents"))
    s1 = out.select(F.col("doc_id").alias("d1"), F.col("split").alias("split1"))
    s2 = out.select(F.col("doc_id").alias("d2"), F.col("split").alias("split2"))
    crossers = (
        pairs.join(s1, "d1")
        .join(s2, "d2")
        .filter(F.col("split1") != F.col("split2"))
        .count()
    )
    assert crossers == 0
    # a cluster genuinely exists (otherwise the guard is vacuous)
    assert out.filter(F.col("doc_id") != F.col("canonical_id")).count() > 0


def test_incremental_dedup_drops_only_known_fingerprints(spark, monkeypatch):
    """A batch doc whose text already exists in the historical corpus is
    dropped; novel batch docs survive; history docs are never emitted."""
    docs = spark.createDataFrame(
        [
            (1, "seen before", "en", "web", 11),   # history
            (2, "only in history", "en", "web", 15),
            (7, "seen before", "en", "web", 11),   # batch dup of doc 1
            (17, "genuinely new", "en", "web", 13),  # batch, novel
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(cu, "load_table", lambda *_, **__: docs)
    out = {r["doc_id"] for r in cu.incremental_dedup(spark, "ignored").collect()}
    assert out == {17}


def test_epoch_shuffle_orders_are_independent_and_stable(spark, sf_dir):
    """Each epoch is a different permutation (bucket assignments differ
    between epochs for a meaningful fraction of docs), every (doc, epoch)
    appears exactly once, and re-evaluation reproduces the assignment."""
    from pyspark_retention_pipeline_spark.operators.sampling import (
        N_EPOCHS,
        SHUFFLE_BUCKETS,
        epoch_shuffle,
    )
    from pyspark_retention_pipeline_spark.tables import load_table

    rows = epoch_shuffle(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs * N_EPOCHS
    by_epoch = {}
    for r in rows:
        assert 0 <= r["shuffle_bucket"] < SHUFFLE_BUCKETS
        by_epoch.setdefault(r["epoch"], {})[r["doc_id"]] = r["shuffle_bucket"]
    assert set(by_epoch) == set(range(N_EPOCHS))
    e0, e1 = by_epoch[0], by_epoch[1]
    moved = sum(1 for d in e0 if e0[d] != e1[d])
    assert moved > n_docs // 2  # epochs are genuinely different orders
    again = {
        (r["doc_id"], r["epoch"]): r["shuffle_bucket"]
        for r in epoch_shuffle(spark, sf_dir).collect()
    }
    assert all(again[(d, e)] == b for e, m in by_epoch.items() for d, b in m.items())


def test_source_cap_select_respects_cap(spark, sf_dir):
    """Every source keeps at least min(cap, available) docs and overshoots
    the cap by at most the boundary bin's occupancy (whole-bin selection)."""
    from pyspark.sql import functions as F

    from pyspark_retention_pipeline_spark.operators.curation import (
        SOURCE_CAP_DOCS,
        source_cap_select,
    )
    from pyspark_retention_pipeline_spark.tables import load_table

    out = source_cap_select(spark, sf_dir)
    kept = {r["source"]: r["n"] for r in
            out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    totals = {r["source"]: r["n"] for r in
              load_table(spark, sf_dir, "documents")
              .groupBy("source").agg(F.count("*").alias("n")).collect()}
    # boundary-bin occupancy per source = max docs in one kept (source, qbin)
    worst_bin = {r["source"]: r["m"] for r in
                 out.groupBy("source", "qbin").agg(F.count("*").alias("b"))
                 .groupBy("source").agg(F.max("b").alias("m")).collect()}
    assert set(kept) == set(totals)  # no source dropped entirely
    for src, n in kept.items():
        assert n >= min(SOURCE_CAP_DOCS, totals[src]), (src, n)
        assert n <= SOURCE_CAP_DOCS + worst_bin[src] - 1, (src, n, worst_bin[src])


def test_weighted_doc_sample_biases_toward_weight(spark, sf_dir):
    """A-ES sampling: exactly K rows (or all docs), stable across
    partitionings, and the char-weighted draw over-represents long docs
    relative to the corpus mean."""
    import pyspark.sql.functions as F

    from pyspark_retention_pipeline_spark.operators.sampling import (
        WSAMPLE_K,
        weighted_doc_sample,
    )
    from pyspark_retention_pipeline_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    rows = weighted_doc_sample(spark, sf_dir).collect()
    assert len(rows) == min(WSAMPLE_K, n_docs)
    assert len({r.doc_id for r in rows}) == len(rows)

    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    sample_mean = sum(r.n_chars for r in rows) / len(rows)
    assert sample_mean > corpus_mean

    again = weighted_doc_sample(spark, sf_dir).collect()
    assert {r.doc_id for r in again} == {r.doc_id for r in rows}


def test_ngram_dup_rate_identities(spark, sf_dir):
    """total = dup + unique occurrences; rate consistent; duplication is
    present in the synthetic corpus (31-token vocab guarantees repeats)."""
    from pyspark_retention_pipeline_spark.operators.curation import ngram_dup_rate

    row = ngram_dup_rate(spark, sf_dir).collect()[0]
    assert row.distinct_grams <= row.total_grams
    assert 0 <= row.dup_occurrences <= row.total_grams
    unique_occ = row.total_grams - row.dup_occurrences
    # unique occurrences = # grams with count 1 <= distinct grams
    assert unique_occ <= row.distinct_grams
    assert abs(row.dup_rate - round(row.dup_occurrences / row.total_grams, 6)) < 1e-9
    assert row.dup_rate > 0


def test_source_overlap_matrix_cell_invariants(spark, sf_dir):
    from pyspark_retention_pipeline_spark.operators.curation import (
        source_overlap_matrix,
    )

    rows = source_overlap_matrix(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.source_a <= r.source_b
        assert 0 <= r.n_identical <= r.n_pairs
        assert 0 <= r.min_hamming <= 3


def test_group_aware_split_eliminates_leakage(spark, sf_dir):
    """The whole point of the cluster-keyed split: zero hamming<=3 pairs
    straddle a split boundary (the doc_id-keyed split leaks hundreds)."""
    from pyspark.sql import functions as F

    from pyspark_retention_pipeline_spark.operators.components import (
        group_aware_split,
    )
    from pyspark_retention_pipeline_spark.operators.text import (
        simhash_candidate_frame,
    )
    from pyspark_retention_pipeline_spark.tables import load_table

    splits = group_aware_split(spark, sf_dir)
    pairs = simhash_candidate_frame(load_table(spark, sf_dir, "documents"))
    leaked = (
        pairs.join(
            splits.select(F.col("doc_id").alias("doc_id_a"), F.col("split").alias("sa")),
            "doc_id_a",
        )
        .join(
            splits.select(F.col("doc_id").alias("doc_id_b"), F.col("split").alias("sb")),
            "doc_id_b",
        )
        .where(F.col("sa") != F.col("sb"))
        .count()
    )
    assert leaked == 0
    # and it is still a split: all three labels present, every doc labeled
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert splits.count() == n_docs
    labels = {r.split for r in splits.select("split").distinct().collect()}
    assert labels == {"train", "val", "test"}


def test_dsir_importance_select_prefers_target_like_docs(spark, monkeypatch):
    """DSIR semantics on a planted corpus: tokens that dominate the TARGET
    (en) slice carry positive log-ratio, so an off-target doc written in
    target-typical tokens must outscore one written in raw-only tokens —
    Also pins add-1 smoothing (raw-only tokens get a finite negative
    weight, not -inf) and that the weight is a pure function of the token
    bag (identical text ⇒ identical score regardless of the doc's own
    lang). Docs are equal-length: the weight is a SUM over tokens, so
    cross-length comparisons would mix selection signal with length."""
    rows = [
        # target slice: 'good'-family tokens
        (0, "good fine nice good fine nice", "en"),
        (1, "good good fine fine nice nice", "en"),
        # candidate A: target-typical tokens, non-target lang (same bag as 0)
        (2, "good fine nice good fine nice", "de"),
        # candidate B: tokens the target never uses
        (3, "spam junk noise spam junk noise", "de"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    monkeypatch.setattr(cu, "load_table", lambda *_, **__: docs)
    out = {
        r["doc_id"]: r["dsir_logratio"]
        for r in cu.dsir_importance_select(spark, "ignored").collect()
    }
    assert set(out) == {0, 1, 2, 3}  # top-k >> corpus here
    assert out[2] > out[3], "target-like doc must outscore raw-only doc"
    assert out[3] < 0  # raw-only tokens: negative but finite (smoothed)
    assert out[0] == out[2]  # score depends on the token bag alone


def _span_rows():
    """Planted corpus shared by the span-stats and span-rewrite tests:
    docs 0/1 share ONE verbatim 8-token span around unique filler; 2 is
    all-unique; 3/4 are exact 20-token duplicates; 5/6 are identical
    SHORT docs (5 tokens < SPAN — they hash one truncated span, the
    _gram_hash_frame NULL-skip convention mirroring the oracle's
    truncated list_slice, the ADVICE-r11 short-doc coupling); 7 is a
    distinct short doc."""
    shared = " ".join(f"s{i}" for i in range(8))  # one exact 8-token span
    return [
        (0, shared + " " + " ".join(f"a{i}" for i in range(10))),
        (1, " ".join(f"b{i}" for i in range(10)) + " " + shared),
        (2, " ".join(f"c{i}" for i in range(20))),
        (3, " ".join(f"d{i}" for i in range(20))),
        (4, " ".join(f"d{i}" for i in range(20))),  # exact dup of 3
        (5, "w0 w1 w2 w3 w4"),  # short (< SPAN tokens)
        (6, "w0 w1 w2 w3 w4"),  # exact short dup of 5
        (7, "v0 v1 v2 v3 v4"),  # distinct short doc
    ]


def test_crossdoc_span_stats_planted_shared_span(spark, monkeypatch):
    """A span copied verbatim between two documents must be flagged in
    BOTH (n_dup_spans >= 1), an all-unique document must score 0, an
    exact duplicate pair must score dup_span_frac == 1.0 on both sides,
    and a sub-SPAN-length duplicate pair must be flagged via its one
    truncated span (pins the short-doc hash/oracle equivalence)."""
    docs = spark.createDataFrame(_span_rows(), "doc_id long, text string")
    monkeypatch.setattr(cu, "load_table", lambda *_, **__: docs)
    out = {r["doc_id"]: r for r in cu.crossdoc_span_stats(spark, "x").collect()}
    assert out[0]["n_dup_spans"] >= 1 and out[1]["n_dup_spans"] >= 1
    assert out[2]["n_dup_spans"] == 0 and out[2]["dup_span_frac"] == 0.0
    assert out[3]["dup_span_frac"] == 1.0 and out[4]["dup_span_frac"] == 1.0
    # the shared span is ONE of doc 0's spans, not all of them
    assert 0 < out[0]["dup_span_frac"] < 1
    # short docs: one truncated span each; the identical pair is flagged,
    # the distinct one is clean
    assert out[5]["n_spans"] == 1 and out[6]["n_spans"] == 1
    assert out[5]["dup_span_frac"] == 1.0 and out[6]["dup_span_frac"] == 1.0
    assert out[7]["n_spans"] == 1 and out[7]["dup_span_frac"] == 0.0


def test_crossdoc_span_rewrite_planted(spark, monkeypatch):
    """Rewrite semantics: the canonical (lowest-doc_id) occurrence of a
    repeated span is untouched; every other document drops exactly the
    covered tokens; unique docs pass through; a non-canonical exact dup
    (full-length or sub-SPAN short) rewrites to ''."""
    docs = spark.createDataFrame(_span_rows(), "doc_id long, text string")
    monkeypatch.setattr(cu, "load_table", lambda *_, **__: docs)
    out = {
        r["doc_id"]: r for r in cu.crossdoc_span_rewrite(spark, "x").collect()
    }
    rows = dict(_span_rows())
    # canonical / unique docs untouched
    for i in (0, 2, 3, 5, 7):
        assert out[i]["text_rewritten"] == rows[i], f"doc {i} must be kept"
        assert out[i]["n_removed"] == 0
    # doc 1 drops exactly the 8 shared-span tokens, keeps its filler
    assert out[1]["text_rewritten"] == " ".join(f"b{i}" for i in range(10))
    assert out[1]["n_removed"] == 8 and out[1]["n_tokens"] == 18
    # non-canonical exact dups (long and short) rewrite to ''
    assert out[4]["text_rewritten"] == "" and out[4]["n_removed"] == 20
    assert out[6]["text_rewritten"] == "" and out[6]["n_removed"] == 5


def test_crossdoc_span_rewrite_idempotent(spark, monkeypatch):
    """Rewriting twice = rewriting once: after the first pass every
    surviving span occurs in at most one document (canonical copies are
    untouched, victims no longer contain the span), so a second pass
    removes nothing."""
    docs = spark.createDataFrame(_span_rows(), "doc_id long, text string")
    monkeypatch.setattr(cu, "load_table", lambda *_, **__: docs)
    first = cu.crossdoc_span_rewrite(spark, "x").collect()
    again = spark.createDataFrame(
        [(r["doc_id"], r["text_rewritten"]) for r in first],
        "doc_id long, text string",
    )
    monkeypatch.setattr(cu, "load_table", lambda *_, **__: again)
    second = {
        r["doc_id"]: r for r in cu.crossdoc_span_rewrite(spark, "x").collect()
    }
    for r in first:
        assert second[r["doc_id"]]["text_rewritten"] == r["text_rewritten"]
        # n_removed == 0 for every non-degenerate doc; docs already
        # rewritten to '' split to one empty token and (being identical)
        # re-flag each other — the text is '' either way, and a real
        # pipeline drops empties between passes
        if r["text_rewritten"]:
            assert second[r["doc_id"]]["n_removed"] == 0


def test_crossdoc_span_profile_hand_checked(spark, monkeypatch):
    """Corpus-level span-length profile on the planted corpus,
    hand-computed. Distinct spans per doc at each k (docs: 0 = shared8 +
    10 filler = 18 toks; 1 = 10 filler + shared8; 2 = 20 unique; 3,4 =
    identical 20; 5,6 = identical 5; 7 = distinct 5):
    k=4: n_spans = 15+15+17+17+17+2+2+2 = 87; dups = 5+5+17+17+2+2 = 48
         (docs 0/1 share the five 4-grams inside the 8-token span);
         affected = {0,1,3,4,5,6}.
    k=8: n_spans = 11+11+13+13+13+1+1+1 = 64; dups = 1+1+13+13+1+1 = 30;
         affected unchanged (the full shared span + the exact dups).
    k=16: n_spans = 3+3+5+5+5+1+1+1 = 24; dups = 5+5+1+1 = 12; docs 0/1
         drop out (no 16-token window fits inside their 8-token overlap)
         -> affected = {3,4,5,6}."""
    docs = spark.createDataFrame(_span_rows(), "doc_id long, text string")
    monkeypatch.setattr(cu, "load_table", lambda *_, **__: docs)
    rows = {
        r["span_k"]: (
            r["n_spans"],
            r["n_dup_spans"],
            r["dup_span_frac"],
            r["n_docs_affected"],
        )
        for r in cu.crossdoc_span_profile(spark, "x").collect()
    }
    assert rows[4] == (87, 48, round(48 / 87, 6), 6)
    assert rows[8] == (64, 30, 0.46875, 6)
    assert rows[16] == (24, 12, 0.5, 4)


def test_crossdoc_span_rewrite_maximal_longest_level_wins(spark, monkeypatch):
    """The over-removal case the cascade exists for (round-12 verdict
    item 2): docs 10 < 11 share a verbatim 16-token region R, and an
    8-token sub-span of R also occurs standalone in doc 9 (a LOWER id).
    Fixed-k=8 ownership mangles every copy of R — doc 11 loses all of it
    and doc 10 loses the sub-window owned by doc 9 — so no intact copy
    survives. The cascade decides doc 10's R positions at the 16 level
    (canonical → untouched), doc 11's at 16 (victim → dropped), and doc
    9's at 8 (canonical → untouched): exactly one intact copy of R plus
    the standalone sub-span survive."""
    region = " ".join(f"r{i}" for i in range(16))
    sub = " ".join(f"r{i}" for i in range(4, 12))  # 8-token sub-span of R
    rows = [
        (9, "m0 m1 " + sub + " m2 m3"),
        (10, "x0 x1 " + region + " y0 y1"),
        (11, "u0 u1 u2 " + region + " v0"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    monkeypatch.setattr(cu, "load_table", lambda *_, **__: docs)
    out = {
        r["doc_id"]: r
        for r in cu.crossdoc_span_rewrite_maximal(spark, "x").collect()
    }
    assert out[9]["n_removed"] == 0 and out[9]["text_rewritten"] == rows[0][1]
    assert out[10]["n_removed"] == 0 and out[10]["text_rewritten"] == rows[1][1]
    assert out[11]["n_removed"] == 16
    assert out[11]["text_rewritten"] == "u0 u1 u2 v0"
    # pin the distinction: the fixed-k=8 rewrite DOES carve the sub-window
    # owned by doc 9 out of doc 10's canonical copy of R
    fixed = {
        r["doc_id"]: r for r in cu.crossdoc_span_rewrite(spark, "x").collect()
    }
    assert fixed[10]["n_removed"] == 8


def test_crossdoc_span_rewrite_maximal_short_level_fallback(spark, monkeypatch):
    """Shorter cascade levels apply exactly where every longer level found
    nothing: a pair sharing only a 4-gram dedups at the 4 grain (victim
    loses those 4 tokens), and on the standard planted corpus the cascade
    reproduces the fixed-k expectations (no 16-token dup exists between
    docs 0/1, so the 8-level decides; exact dups fall at 16)."""
    rows = [
        (20, "p0 p1 q0 q1 q2 q3 p2 p3"),
        (21, "z0 z1 z2 q0 q1 q2 q3 z3 z4"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    monkeypatch.setattr(cu, "load_table", lambda *_, **__: docs)
    out = {
        r["doc_id"]: r
        for r in cu.crossdoc_span_rewrite_maximal(spark, "x").collect()
    }
    assert out[20]["n_removed"] == 0 and out[20]["text_rewritten"] == rows[0][1]
    assert out[21]["n_removed"] == 4
    assert out[21]["text_rewritten"] == "z0 z1 z2 z3 z4"

    docs = spark.createDataFrame(_span_rows(), "doc_id long, text string")
    monkeypatch.setattr(cu, "load_table", lambda *_, **__: docs)
    out = {
        r["doc_id"]: r
        for r in cu.crossdoc_span_rewrite_maximal(spark, "x").collect()
    }
    src = dict(_span_rows())
    for i in (0, 2, 3, 5, 7):  # canonical / unique docs untouched
        assert out[i]["text_rewritten"] == src[i] and out[i]["n_removed"] == 0
    assert out[1]["text_rewritten"] == " ".join(f"b{i}" for i in range(10))
    assert out[4]["text_rewritten"] == "" and out[4]["n_removed"] == 20
    assert out[6]["text_rewritten"] == "" and out[6]["n_removed"] == 5


def _cascade_reference(rows, ks=cu.CASCADE_KS):
    """Pure-python reimplementation of the cascade definition (string
    spans, longest-covering-level decision, victim-over-canonical within
    the level) — the agreement baseline for the randomized test."""
    toks = {d: t.split(" ") for d, t in rows}
    codes: dict[tuple[int, int], int] = {}
    for k in ks:
        occ: dict[tuple, list[tuple[int, int]]] = {}
        for d, t in toks.items():
            for s in range(0, max(len(t) - k, 0) + 1):
                occ.setdefault(tuple(t[s : s + k]), []).append((d, s))
        for g, sites in occ.items():
            owners = {d for d, _ in sites}
            if len(owners) < 2:
                continue
            lo = min(owners)
            for d, s in sites:
                code = 2 * k + (1 if d > lo else 0)
                for p in range(s, s + k):
                    if codes.get((d, p), -1) < code:
                        codes[(d, p)] = code
    out = {}
    for d, t in toks.items():
        kept = [
            tok
            for p, tok in enumerate(t)
            if codes.get((d, p), 0) % 2 == 0
        ]
        out[d] = (" ".join(kept), len(t), len(t) - len(kept))
    return out


def test_crossdoc_span_rewrite_maximal_matches_reference(spark, monkeypatch):
    """Randomized agreement with the pure-python cascade reference: a
    small vocabulary forces dense span collisions at every level, so the
    longest-wins tie-breaking, victim attribution, and truncated-span
    conventions are all exercised beyond the hand-planted cases."""
    import random

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(9)]
    rows = [
        (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 28))))
        for d in range(14)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    monkeypatch.setattr(cu, "load_table", lambda *_, **__: docs)
    got = {
        r["doc_id"]: (r["text_rewritten"], r["n_tokens"], r["n_removed"])
        for r in cu.crossdoc_span_rewrite_maximal(spark, "x").collect()
    }
    assert got == _cascade_reference(rows)


def test_doc_novelty_score_planted(spark, monkeypatch):
    """Planted corpus: a verbatim duplicate owns nothing (novelty 0), the
    first copy owns everything it contains (novelty 1), a distinct doc is
    fully novel, and a doc sharing a prefix with doc 0 owns only the grams
    past the shared span. Also: summed n_novel equals the corpus's distinct
    gram count (every gram has exactly one owner)."""
    import pyspark_retention_pipeline_spark.operators.curation as cur

    base = "a b c d e f"  # 2 distinct 5-grams: abcde, bcdef
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base),  # verbatim dup of 0
            (2, "x y z w v u"),  # fully novel
            (3, "a b c d e zz"),  # shares gram 'a b c d e' with doc 0
        ],
        "doc_id long, text string",
    )
    monkeypatch.setattr(cur, "load_table", lambda *_, **__: docs)
    out = {r.doc_id: r for r in cur.doc_novelty_score(spark, "x").collect()}
    assert out[0].n_grams == 2 and out[0].n_novel == 2 and out[0].novelty == 1.0
    assert out[1].n_grams == 2 and out[1].n_novel == 0 and out[1].novelty == 0.0
    assert out[2].n_grams == 2 and out[2].novelty == 1.0
    assert out[3].n_grams == 2 and out[3].n_novel == 1 and out[3].novelty == 0.5
    total_novel = sum(r.n_novel for r in out.values())
    distinct_grams = 5  # abcde, bcdef, xyzwv, yzwvu, bcde-zz
    assert total_novel == distinct_grams


def test_heaps_vocab_growth_planted(spark, monkeypatch):
    """Planted 10-doc corpus (doc_ids 0..9 → one per bin): cumulative
    token and type counts are hand-checkable; a type repeated in a later
    bin counts only at its first-occurrence bin, and the final row equals
    the corpus totals."""
    import pyspark_retention_pipeline_spark.operators.curation as cur

    texts = {
        0: "a b c",      # 3 toks, 3 new types
        1: "a b",        # 2 toks, 0 new
        2: "d d d d",    # 4 toks, 1 new
        3: "a c d",      # 3 toks, 0 new
        4: "e",          # 1 tok, 1 new
        5: "e e a",      # 3 toks, 0 new
        6: "f g",        # 2 toks, 2 new
        7: "g",          # 1 tok, 0 new
        8: "h",          # 1 tok, 1 new
        9: "a h i",      # 3 toks, 1 new
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    monkeypatch.setattr(cur, "load_table", lambda *_, **__: docs)
    got = sorted(
        cur.heaps_vocab_growth(spark, "x").collect(), key=lambda r: r.bin
    )
    toks = [3, 2, 4, 3, 1, 3, 2, 1, 1, 3]
    news = [3, 0, 1, 0, 1, 0, 2, 0, 1, 1]
    want = []
    ct = cy = 0
    for b in range(10):
        ct += toks[b]
        cy += news[b]
        want.append((b, ct, cy))
    assert [(r.bin, r.cum_tokens, r.cum_types) for r in got] == want
    assert got[-1].cum_tokens == 23 and got[-1].cum_types == 9
