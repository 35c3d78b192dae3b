"""Context-window preparation: document chunking and sequence packing — the
two structural transforms between a cleaned corpus and a training batch.

Both are pure built-in expressions (sequence / slice / explode / window
cumsum), no UDFs:

  * chunking fans each document out into overlapping token windows
    (map-side explode — no shuffle at all);
  * packing assigns documents to fixed-token-budget bins with a running-sum
    window — one shuffle on the deterministic ordering, and at 100 TB the
    ordering column can be a partition-local composite (shard_id, doc_id) so
    packs form within shards without a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

CHUNK_TOKENS = 50
CHUNK_STRIDE = 25
PACK_BUDGET = 256


@query(
    "chunk_documents",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), chunks AS (
      SELECT doc_id,
             CAST(s.i AS BIGINT) AS chunk_id,
             list_slice(toks, s.i * {CHUNK_STRIDE} + 1,
                        s.i * {CHUNK_STRIDE} + {CHUNK_TOKENS}) AS chunk_toks
      FROM t, UNNEST(range(0, greatest((len(toks) - 1) // {CHUNK_STRIDE}, 0) + 1)) AS s(i)
    )
    SELECT doc_id, chunk_id,
           CAST(len(chunk_toks) AS BIGINT) AS n_tokens,
           md5(array_to_string(chunk_toks, ' ')) AS chunk_md5
    FROM chunks
    """,
    tags=("chunking", "training-data"),
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (window {CHUNK_TOKENS}, stride
    {CHUNK_STRIDE}) — the fan-out that turns documents into model-sized
    samples. One map-side explode per document: chunk starts are a
    ``sequence`` over the token count, the chunk itself a ``slice`` — no
    shuffle, no UDF; content is surfaced as md5 so the oracle compares
    chunk text without shipping it."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_chunks_m1 = F.greatest(
        (F.size(toks) - 1) / F.lit(CHUNK_STRIDE), F.lit(0)
    ).cast("long")
    starts = F.sequence(F.lit(0).cast("long"), n_chunks_m1)
    chunk_toks = F.slice(
        F.col("toks"), F.col("chunk_id").cast("int") * CHUNK_STRIDE + 1, CHUNK_TOKENS
    )
    return (
        d.select("doc_id", toks.alias("toks"), F.explode(starts).alias("chunk_id"))
        .select(
            "doc_id",
            "chunk_id",
            F.size(chunk_toks).cast("long").alias("n_tokens"),
            F.md5(F.concat_ws(" ", chunk_toks).cast("binary")).alias("chunk_md5"),
        )
    )


@query(
    "pack_documents",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), cum AS (
      SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id) AS cum_tokens
      FROM sized
    )
    SELECT doc_id, n_tokens,
           CAST((cum_tokens - 1) // {PACK_BUDGET} AS BIGINT) AS pack_id
    FROM cum
    """,
    tags=("packing", "training-data"),
)
def pack_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: documents (in deterministic doc_id order)
    are assigned to consecutive packs by bucketing the running token count
    at a {PACK_BUDGET}-token budget — the batch-construction transform that
    minimizes padding. A single running-sum window over exact integer
    counts; the unique ordering key makes the assignment engine-identical.
    (Packs can overflow by at most one document's tokens — the standard
    contiguous-greedy trade; an exact bin packer would serialize.)"""
    d = load_table(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    cum = sized.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return cum.select(
        "doc_id",
        "n_tokens",
        ((F.col("cum_tokens") - 1) / F.lit(PACK_BUDGET)).cast("long").alias("pack_id"),
    )
