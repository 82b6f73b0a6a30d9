"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched kernels over ``mapInPandas``. The codec step itself is
STUBBED (no PIL/ffmpeg in this environment): ``decode_media`` either
raises ``NotImplementedError`` (strict mode) or produces a
deterministic fake decode derived from the bytes — the Spark-side
contract (schema, batching, partition sizing) is real and tested.

Scale notes: binary payloads dominate partition size — callers should
size ``spark.sql.files.maxPartitionBytes`` down (payload-aware) and
keep ``spark.sql.execution.arrow.maxRecordsPerBatch`` small so a batch
of decoded frames fits executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, sha256 string, feature array<float>"

_FEATURE_DIM = 16
_HAVE_CODECS = False  # flip when PIL/av are installed
try:  # pragma: no cover - not present in this environment
    import PIL.Image  # noqa: F401

    _HAVE_CODECS = True
except Exception:
    pass


def synthesize_media(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic fake media table (fixture generator)."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
        kind = kinds[i % 3]
        rows.append(
            (
                i,
                kind,
                bytes(h * ((64 + i) // len(h) + 1))[: 64 + i],
                ("application/octet-stream", 32 + i % 64, 32 + (i * 7) % 64, 1000 + i),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_media(payload: bytes, kind: str, strict: bool = False) -> np.ndarray:
    """STUB decode: real codecs are unavailable in this container.

    strict=True raises (production posture when codecs are expected);
    otherwise returns a deterministic fake "decoded" array derived
    from the payload bytes, so downstream shape/typing is exercised.
    """
    if strict and not _HAVE_CODECS:
        raise NotImplementedError(
            f"no codec available for kind={kind!r}; install PIL/av to decode"
        )
    if not payload:
        return np.zeros(_FEATURE_DIM, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    pad = (-len(arr)) % _FEATURE_DIM
    if pad:
        arr = np.pad(arr, (0, pad))
    return arr.reshape(-1, _FEATURE_DIM)


def extract_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """media table → per-item feature vector (Arrow-batched kernel)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, shas, sizes = [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                b = bytes(payload) if payload is not None else b""
                shas.append(hashlib.sha256(b).hexdigest())
                sizes.append(len(b))
                decoded = decode_media(b, kind, strict=strict)
                feats.append(decoded.mean(axis=0).astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": sizes,
                    "sha256": shas,
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "media_id long, kind string, out_w int, out_h int, n_bytes_in int, resized binary"
)


def resize_media(media: DataFrame, out_w: int = 16, out_h: int = 16) -> DataFrame:
    """Resize plan: Arrow-batched kernel producing fixed-size thumbnails.

    The real pixel decode is stubbed (no PIL in this container): the
    deterministic fake treats the payload as a row-major byte image
    and strided-subsamples it to (out_w × out_h) bytes — the
    Spark-side contract (schema, batching, binary output column,
    partition sizing) is real and tested; swap the kernel body for
    PIL's ``Image.resize`` when codecs are present.
    """
    import numpy as np
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        size = out_w * out_h
        for pdf in batches:
            outs, sizes = [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                sizes.append(len(b))
                if not b:
                    outs.append(bytes(size))
                    continue
                arr = np.frombuffer(b, dtype=np.uint8)
                idx = (np.arange(size) * len(arr)) // size
                outs.append(arr[idx].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "out_w": out_w,
                    "out_h": out_h,
                    "n_bytes_in": sizes,
                    "resized": outs,
                }
            )

    return media.mapInPandas(run, schema=RESIZE_SCHEMA)


def sample_video_frames(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Frame-sampling plan: one output row per sampled timestamp.

    The decode is stubbed; the *plan* (explode of a timestamp grid,
    payload passthrough, partition shape) is the real, tested part.
    """
    vids = media.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
        "payload",
    )
