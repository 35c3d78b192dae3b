"""Unit + property tests for the tokenizer-tier ops (operators/tokenizer.py).

Oracle parity runs registry-wide in test_oracle_parity.py; these pin the
SEMANTICS on hand-checkable corpora (monkeypatched in-memory frames, the
same pattern as test_similarity's planted-twin tests).
"""

from __future__ import annotations

from pyspark_retention_pipeline_spark.registry import all_queries

QUERIES = all_queries()


def _docs(spark, texts):
    rows = [(i, t, "en", "src0") for i, t in enumerate(texts)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def test_bpe_pair_counts_hand_checked(spark, monkeypatch):
    """Adjacent char pairs weighted by WORD frequency: 'aab aab cd' has
    aab twice -> pairs aa, ab each weight 2; cd once -> cd weight 1;
    single-char words are excluded before the explode."""
    import pyspark_retention_pipeline_spark.operators.tokenizer as tok

    docs = _docs(spark, ["aab aab cd", "a b c"])  # 1-char words drop out
    monkeypatch.setattr(tok, "load_table", lambda *_: docs)
    rows = {r["pair"]: r["pair_count"] for r in QUERIES["bpe_pair_counts"](spark, "x").collect()}
    assert rows == {"aa": 2, "ab": 2, "cd": 1}


def test_bpe_pair_counts_vocab_weighting(spark, monkeypatch):
    """The explode runs over the VOCAB: a word repeated across documents
    contributes its corpus frequency, not one count per distinct doc."""
    import pyspark_retention_pipeline_spark.operators.tokenizer as tok

    docs = _docs(spark, ["xy"] * 7 + ["xy xy xy"])
    monkeypatch.setattr(tok, "load_table", lambda *_: docs)
    rows = {r["pair"]: r["pair_count"] for r in QUERIES["bpe_pair_counts"](spark, "x").collect()}
    assert rows == {"xy": 10}


def test_bpe_pair_counts_deterministic_tiebreak(spark, monkeypatch):
    """Equal-count pairs at the LIMIT cut must rank by pair string — the
    cross-engine tie rule the oracle mirrors."""
    import pyspark_retention_pipeline_spark.operators.tokenizer as tok

    # every pair appears exactly once -> full ordering is lexicographic
    docs = _docs(spark, ["zz yy xx ww"])
    monkeypatch.setattr(tok, "load_table", lambda *_: docs)
    got = [r["pair"] for r in QUERIES["bpe_pair_counts"](spark, "x").collect()]
    assert got == ["ww", "xx", "yy", "zz"]


def test_intradoc_dedup_rewrite_hand_checked(spark, monkeypatch):
    import pyspark_retention_pipeline_spark.operators.tokenizer as tok

    docs = _docs(spark, ["a b a c b a", "x x x", "solo"])
    monkeypatch.setattr(tok, "load_table", lambda *_: docs)
    rows = {
        r["doc_id"]: r for r in QUERIES["intradoc_dedup_rewrite"](spark, "x").collect()
    }
    assert rows[0]["text_dedup"] == "a b c"
    assert (rows[0]["n_tokens"], rows[0]["n_kept"]) == (6, 3)
    assert rows[1]["text_dedup"] == "x"
    assert rows[2]["text_dedup"] == "solo"


def test_intradoc_dedup_rewrite_idempotent(spark, monkeypatch, sf_dir):
    """Rewriting the rewrite changes nothing: feed the op's own output back
    through it (on the real corpus) and every document must be a fixpoint."""
    import pyspark_retention_pipeline_spark.operators.tokenizer as tok
    from pyspark.sql import functions as F

    first = QUERIES["intradoc_dedup_rewrite"](spark, sf_dir)
    as_docs = first.select(
        "doc_id",
        F.col("text_dedup").alias("text"),
        F.lit("en").alias("lang"),
        F.lit("src0").alias("source"),
    )
    monkeypatch.setattr(tok, "load_table", lambda *_: as_docs)
    second = QUERIES["intradoc_dedup_rewrite"](spark, "x")
    changed = (
        first.select("doc_id", F.col("text_dedup").alias("t1"))
        .join(second.select("doc_id", F.col("text_dedup").alias("t2")), "doc_id")
        .filter(F.col("t1") != F.col("t2"))
        .count()
    )
    assert changed == 0
