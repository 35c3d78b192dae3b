"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

The testdata has no true image/audio tables, so the binary payload is
synthesized from ``documents.text`` (UTF-8 bytes) — the *plumbing* is the
deliverable: binary columns with typed metadata structs, Arrow-batched
``mapInPandas`` decode stages with explicit output schemas, and partition-
sized batches. The decode boundary is real-decoder-optional: each payload is
first offered to PIL when the import succeeds (it is not installed in this
container) and falls back to a deterministic fake — derived from the
payload's md5, stable across partitionings — when PIL is absent or the
payload doesn't parse. Both paths are unit-tested (tests/test_operators_unit.py).
"""

from __future__ import annotations

import hashlib
import io
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

try:  # pragma: no cover - not installed in this container
    from PIL import Image as _PILImage
except ImportError:
    _PILImage = None

MEDIA_META_SCHEMA = (
    "doc_id long, payload binary, media_type string, payload_len long, width int, "
    "height int, n_frames int"
)


@query(
    "binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_len,
           md5(text) AS payload_md5
    FROM documents
    """,
    tags=("multimodal",),
)
def binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload length + content hash — metadata extraction stays
    JVM-side (no UDF) even when the payload itself is opaque."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    return d.select(
        "doc_id",
        F.length(payload).cast("long").alias("payload_len"),
        F.md5(payload).alias("payload_md5"),
    )


def media_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, payload binary, media_type) — the canonical shape
    of a multimodal ingest table: opaque bytes + a type tag."""
    d = load_table(spark, sf_dir, "documents")
    media_type = F.when(F.col("doc_id") % 3 == 0, "image/png").when(
        F.col("doc_id") % 3 == 1, "audio/wav"
    ).otherwise("video/mp4")
    return d.select(
        "doc_id", F.col("text").cast("binary").alias("payload"), media_type.alias("media_type")
    )


def _pil_decode(payload: bytes) -> tuple[int, int, int] | None:
    """(width, height, n_frames) via PIL when it's importable AND the payload
    actually parses as an image; None otherwise. Audio/video decoders
    (torchaudio/ffmpeg) would slot in the same way."""
    if _PILImage is None:
        return None
    try:
        img = _PILImage.open(io.BytesIO(bytes(payload)))
        return int(img.width), int(img.height), int(getattr(img, "n_frames", 1))
    except Exception:
        return None


def _fake_decode(payload: bytes, media_type: str) -> tuple[int, int, int]:
    """Deterministic fallback: dimensions derive from the payload's md5
    digest, so results are stable across partitionings and engines."""
    d = hashlib.md5(payload).digest()
    n_frames = 1 if media_type == "image/png" else 1 + d[2] % 300
    return 16 + d[0] % 240, 16 + d[1] % 240, n_frames


def _decode_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Decode one Arrow batch of payloads into media metadata — real decoder
    when available, deterministic fake otherwise."""
    decoded = [
        _pil_decode(p) or _fake_decode(p, mt)
        for p, mt in zip(batch["payload"], batch["media_type"])
    ]
    batch = batch.copy()
    batch["payload_len"] = [len(p) for p in batch["payload"]]
    batch["width"] = [w for w, _, _ in decoded]
    batch["height"] = [h for _, h, _ in decoded]
    batch["n_frames"] = [n for _, _, n in decoded]
    return batch


def decode_media(df: DataFrame) -> DataFrame:
    """Arrow-batched decode stage: ``mapInPandas`` keeps the data partitioned
    and streams record batches through Python — the sanctioned slow path for
    logic Spark expressions can't cover (SURVEY §2.10 / driver guide)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _decode_batch(b)

    return df.mapInPandas(run, schema=MEDIA_META_SCHEMA)


FRAME_SAMPLE_K = 8  # frames sampled per video
FRAME_MS = 40  # frame period at the assumed 25 fps
RESIZE_MAX = 224  # max output dimension of the resize stage
FRAME_SCHEMA = (
    "doc_id long, frame_idx int, ts_ms long, out_width int, out_height int, "
    "frame_md5 string"
)


def sample_frames(decoded: DataFrame) -> DataFrame:
    """Uniform frame sampling + resize metadata over decoded video rows —
    the frame-sample / resize stages of a multimodal ingest, as a second
    Arrow-batched ``mapInPandas`` stage. Each video yields
    ``min({FRAME_SAMPLE_K}, n_frames)`` frames at uniformly spaced indices
    (``floor(j * n_frames / k)`` — deterministic, order-free); the "frame
    bytes" are a stub (md5 of payload + frame index — a real extractor
    slots into the same loop), while the resize arithmetic is real: the
    longer side scales to {RESIZE_MAX}px, aspect preserved, integer math.
    Output is bounded fan-out (≤ {FRAME_SAMPLE_K} rows per video), so the
    stage is embarrassingly parallel per input split at any corpus size."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "ts_ms": [],
                "out_width": [], "out_height": [], "frame_md5": [],
            }
            for doc_id, payload, n_frames, w, h in zip(
                b["doc_id"], b["payload"], b["n_frames"], b["width"], b["height"]
            ):
                k = min(FRAME_SAMPLE_K, int(n_frames))
                scale_den = max(int(w), int(h))
                out_w = max(1, int(w) * RESIZE_MAX // scale_den)
                out_h = max(1, int(h) * RESIZE_MAX // scale_den)
                for j in range(k):
                    idx = j * int(n_frames) // k
                    digest = hashlib.md5(
                        bytes(payload) + idx.to_bytes(4, "big")
                    ).hexdigest()
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["ts_ms"].append(idx * FRAME_MS)
                    out["out_width"].append(out_w)
                    out["out_height"].append(out_h)
                    out["frame_md5"].append(digest)
            yield pd.DataFrame(out)

    return decoded.mapInPandas(run, schema=FRAME_SCHEMA)


@query("media_frame_sample", tags=("multimodal", "mapInPandas", "frame-sample"))
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video ingest → decode → uniform frame sample → resize metadata: the
    full multimodal chain (ingest/decode/frame-sample/resize from the
    training-data brief) as two Arrow-batched stages with typed schemas.
    Rows-only check (the extractors are stubs; the Spark-side plumbing —
    schema, batch shape, bounded fan-out, partitioning — is the real
    deliverable, as with ``media_decode_stub``)."""
    videos = decode_media(media_frame(spark, sf_dir)).filter(
        F.col("media_type") == "video/mp4"
    )
    return sample_frames(videos)


@query("media_decode_stub", tags=("multimodal", "mapInPandas"))
def media_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline: binary ingest → Arrow-batched decode →
    typed metadata, aggregated per media type (rows-only check: the decode is
    a stub, but the plumbing — schema, batching, partitioning — is real)."""
    decoded = decode_media(media_frame(spark, sf_dir))
    return decoded.groupBy("media_type").agg(
        F.count("*").alias("n_items"),
        F.sum("payload_len").alias("total_bytes"),
        F.avg(F.col("width") * F.col("height")).alias("avg_pixels"),
        F.max("n_frames").alias("max_frames"),
    )
