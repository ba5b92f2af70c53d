"""Multimodal column plumbing (north-star extension, SURVEY.md §7
Step 6): image/audio/video as opaque `binary` columns with typed
metadata structs, processed by Arrow-batched Pandas UDFs.

The container has no image/audio libraries, so the decode kernels are
STUBS (clearly marked, import-gated) — but everything Spark-side is
real and tested: the schema convention, the mapInPandas batch shape,
the partitioning, and a deterministic feature extractor that exercises
the exact same plumbing real decoders would use.

Scale notes:
- binary payloads ride ordinary parquet columns; `mapInPandas` moves
  them executor→Python in Arrow record batches (no per-row pickling).
- decode/feature-extract is per-row work → embarrassingly parallel;
  the only knob that matters is partition sizing so a batch of blobs
  fits in worker memory (spark.sql.files.maxPartitionBytes, and
  `maxRecordsPerBatch` for Arrow batches of large blobs).
- metadata lives in a sibling struct column so filters on it (mime,
  dimensions) prune *before* any blob is decoded.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "media_id long, n_bytes long, content_md5 string, mime string"


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapt the documents table into the binary-media convention
    (content = utf-8 bytes) so the multimodal plumbing is exercised on
    real driver data."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Deterministic per-blob features via mapInPandas — the real
    decode pipeline's shape (Arrow batch in, Arrow batch out, one
    Python worker per partition), with a trivially verifiable kernel
    (byte count + md5) instead of an image decode."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0),
                    "content_md5": content.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    "mime": pdf["meta"].map(lambda m: m["mime"] if m else None),
                }
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def decode_image(media: DataFrame, target_size: tuple[int, int] = (224, 224)) -> DataFrame:
    """STUB — real image decode/resize. The container ships no imaging
    library; the Spark-side contract (signature, schema, batching) is
    final, only the kernel body is gated.

    Returns (media_id, pixels array<float>, width, height) when a
    decoder is available."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "image decode requires an imaging library (PIL/opencv); "
            "not available in this container — plumbing is exercised via "
            "extract_features instead"
        ) from exc

    out_schema = "media_id long, width int, height int, pixels array<float>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        import io

        import numpy as np
        from PIL import Image

        w, h = target_size
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                img = Image.open(io.BytesIO(blob)).convert("L").resize((w, h))
                rows.append((mid, w, h, np.asarray(img, dtype="float32").ravel().tolist()))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "pixels"])

    return media.mapInPandas(kernel, out_schema)


THUMB_PIXELS = 16  # fake-decoder thumbnail size (evenly sampled bytes)
THUMB_SCHEMA = "media_id long, px_idx int, byte_val int"


def byte_thumbnail(media: DataFrame, n_pixels: int = THUMB_PIXELS) -> DataFrame:
    """Deterministic stand-in for decode_image's decode+resize: sample
    n_pixels bytes at evenly spaced offsets floor(j·len/n) from each
    blob and emit them as (media_id, px_idx, byte_val) rows — a
    "thumbnail" whose pixel values are exactly checkable without an
    imaging library. Same production plumbing as the gated real kernel:
    mapInPandas over Arrow batches, per-row work only, zero shuffles.
    Empty/null blobs produce no rows (nothing to decode)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, vals = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                if not blob:
                    continue
                n = len(blob)
                for j in range(n_pixels):
                    ids.append(mid)
                    idxs.append(j)
                    vals.append(blob[j * n // n_pixels])
            yield pd.DataFrame({"media_id": ids, "px_idx": idxs, "byte_val": vals})

    return media.mapInPandas(kernel, THUMB_SCHEMA)


WINDOW_BYTES = 256  # fake-DSP analysis window (a real pipeline uses PCM samples)
ENERGY_SCHEMA = "media_id long, window_idx int, peak_byte int, byte_sum long"


def audio_energy(media: DataFrame, window: int = WINDOW_BYTES) -> DataFrame:
    """Audio-style windowed energy with a DETERMINISTIC FAKE DSP: the
    blob is cut into fixed `window`-byte analysis windows and each
    window reports its peak byte value and byte sum — stand-ins for
    peak amplitude / energy over PCM samples. A real pipeline swaps the
    byte reader for a PCM decoder (gated like decode_image); the Spark
    side is the production shape: mapInPandas over Arrow batches, one
    row per window, zero shuffles. Empty/null blobs emit nothing;
    a trailing partial window is a window."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, peaks, sums = [], [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                if not blob:
                    continue
                for wi in range(0, (len(blob) + window - 1) // window):
                    chunk = blob[wi * window : (wi + 1) * window]
                    ids.append(mid)
                    idxs.append(wi)
                    peaks.append(max(chunk))
                    sums.append(sum(chunk))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "window_idx": idxs,
                    "peak_byte": peaks,
                    "byte_sum": sums,
                }
            )

    return media.mapInPandas(kernel, ENERGY_SCHEMA)


FRAME_BYTES = 256  # fake-codec frame size; a real codec yields variable frames
FRAME_SCHEMA = "media_id long, frame_idx int, n_bytes int, frame_md5 string"


def frame_sample(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Video frame sampling with a DETERMINISTIC FAKE codec: the binary
    content is treated as a stream of fixed FRAME_BYTES-byte frames and
    every_n-th frame is emitted with its byte length and md5. The real
    pipeline would swap the chunker for an actual demuxer (gated like
    decode_image); everything Spark-side is the production shape and
    runs for real — mapInPandas over Arrow batches, one output row per
    sampled frame, no shuffle (frame extraction is per-blob), schema
    fixed by FRAME_SCHEMA.

    Sampling keeps frames 0, every_n, 2·every_n, … of each blob's
    frame sequence; a trailing partial frame is a frame."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes, hashes = [], [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                if blob is None:
                    continue
                n_frames = (len(blob) + FRAME_BYTES - 1) // FRAME_BYTES
                for fi in range(0, n_frames, every_n):
                    chunk = blob[fi * FRAME_BYTES : (fi + 1) * FRAME_BYTES]
                    ids.append(mid)
                    idxs.append(fi)
                    sizes.append(len(chunk))
                    hashes.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "n_bytes": sizes,
                    "frame_md5": hashes,
                }
            )

    return media.mapInPandas(kernel, FRAME_SCHEMA)
