"""Public expression-function surface of the engine.

Re-exports the cross-engine-deterministic expression helpers (implemented in
:mod:`..exprs`) plus the reusable frame-level function families, so library
users import from one place:

    from pyspark_retention_pipeline_spark.functions import dot, scaled_sum
"""

from ..exprs import as_double_array, bigint, dot, money_sum, scaled_sum, ts_lit
from ..operators.text import (
    minhash_signature_frame,
    portable_simhash60,
    quality_zscore_frame,
    simhash_bits_frame,
    winnowing_fingerprint_frame,
)
from ..operators.similarity import lsh_signature_frame
from ..operators.upsert import scd2_apply, upsert
from ..operators.sampling import hash_sample_frame

__all__ = [
    "as_double_array",
    "bigint",
    "dot",
    "money_sum",
    "scaled_sum",
    "ts_lit",
    "minhash_signature_frame",
    "portable_simhash60",
    "simhash_bits_frame",
    "winnowing_fingerprint_frame",
    "quality_zscore_frame",
    "lsh_signature_frame",
    "scd2_apply",
    "upsert",
    "hash_sample_frame",
]
