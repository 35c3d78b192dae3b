"""Spark 4 Python UDTF coverage — the one lateral-generator API surface the
registry didn't exercise (VARIANT, transformWithStateInPandas, and LATERAL
correlated subqueries are covered elsewhere).

A UDTF is row-at-a-time Python: the SLOW path, never the production form
when an expression can do the job. It exists in the registry for API parity
and for the genuinely procedural generators (custom tokenizers, parsers)
that have no expression twin; the codegen equivalent
(``posexplode(split(...))``) is asserted equal in tests, which is exactly
the discipline for deciding a UDTF away at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table


def sentence_split_expr(docs: DataFrame) -> DataFrame:
    """Codegen twin of the UDTF: posexplode over a '. ' split."""
    return docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), r"\. ")).alias("sent_idx", "sentence"),
    ).select("doc_id", (F.col("sent_idx") + 1).alias("sent_idx"), "sentence")


@query(
    "udtf_sentence_split",
    oracle="""
    SELECT doc_id,
           CAST(generate_subscripts(string_split(text, '. '), 1) AS BIGINT)
             AS sent_idx,
           unnest(string_split(text, '. ')) AS sentence
    FROM documents
    """,
    tags=("udtf", "spark4", "lateral"),
)
def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation through a Python UDTF consumed as a LATERAL
    table function — Spark 4's arbitrary-arity row generator (public API:
    ``pyspark.sql.functions.udtf``). Each input row yields its '. '-split
    sentences with a 1-based index; the LATERAL join streams the generator
    per row, so memory is bounded by one document regardless of fan-out.
    Oracle-checkable because the generator is a pure function of the row.
    The expression twin :func:`sentence_split_expr` produces identical
    output inside whole-stage codegen (agreement-tested) — at scale you
    ship the twin; the UDTF is the API demo and the template for
    generators expressions can't write."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx bigint, sentence string")
    class SplitSentences:
        def eval(self, text: str):
            if text is None:  # match the codegen twin: NULL emits nothing
                return
            for i, s in enumerate(text.split(". ")):
                yield i + 1, s

    spark.udtf.register("prp_split_sentences", SplitSentences)
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("prp_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence
        FROM prp_udtf_docs d, LATERAL prp_split_sentences(d.text) s
        """
    )
