"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual media DECODE is stubbed behind
``decoder=`` because the sandbox image has no PIL/soundfile/av. At
deploy time you inject a real decoder with the same signature
(bytes -> np.ndarray) and nothing else changes.

The deterministic fake decoder makes the pipeline testable end-to-end:
it derives a fixed-shape float array from the payload bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
        T.StructField("meta_sr", T.IntegerType(), True),  # audio sample rate
        T.StructField("meta_frames", T.IntegerType(), True),
    ]
)

Decoder = Callable[[bytes, str], np.ndarray]

# Optional-import wiring (caits/loading/_audio.py:16-72 analog): each media
# kind decodes with its library IF the deploy image has it; this sandbox
# has none, so everything falls back to the deterministic fake and behavior
# is unchanged. A deploy with PIL/soundfile/av needs ZERO code changes.


def _try_import(name: str):
    try:
        return __import__(name)
    except ImportError:
        return None


_PIL_IMAGE = None
if _try_import("PIL") is not None:  # pragma: no cover - not in sandbox image
    from PIL import Image as _PIL_IMAGE  # type: ignore[no-redef]
_SOUNDFILE = _try_import("soundfile")
_AV = _try_import("av")

_KIND_LIB = {"image": "PIL", "audio": "soundfile", "video": "av"}


def has_real_decoder(kind: str) -> bool:
    return {
        "image": _PIL_IMAGE is not None,
        "audio": _SOUNDFILE is not None,
        "video": _AV is not None,
    }.get(kind, False)


def real_decoder(payload: bytes, kind: str) -> np.ndarray:
    """Decode with the kind's library (PIL / soundfile / av) when present.

    image -> float32 HxWxC array /255; audio -> mono float32 waveform;
    video -> first frame as float32 HxWxC /255. Raises with injection
    instructions when the library is missing (sandbox case).
    """
    import io

    if kind == "image" and _PIL_IMAGE is not None:  # pragma: no cover
        img = _PIL_IMAGE.open(io.BytesIO(payload))
        return np.asarray(img, dtype=np.float32) / 255.0
    if kind == "audio" and _SOUNDFILE is not None:  # pragma: no cover
        wave, _sr = _SOUNDFILE.read(io.BytesIO(payload), dtype="float32")
        return wave.mean(axis=1) if wave.ndim == 2 else wave
    if kind == "video" and _AV is not None:  # pragma: no cover
        with _AV.open(io.BytesIO(payload)) as container:
            for frame in container.decode(video=0):
                return frame.to_ndarray(format="rgb24").astype(np.float32) / 255.0
        raise ValueError("video payload contains no frames")
    raise NotImplementedError(
        f"decoding kind={kind!r} requires {_KIND_LIB.get(kind, 'a media lib')}; "
        "install it or inject a decoder with signature (bytes, kind) -> np.ndarray"
    )


def auto_decoder(payload: bytes, kind: str) -> np.ndarray:
    """real_decoder when the kind's library exists, fake_decoder otherwise —
    the decode path upgrades itself on a fully-provisioned image."""
    if has_real_decoder(kind):  # pragma: no cover - not in sandbox image
        return real_decoder(payload, kind)
    return fake_decoder(payload, kind)


def fake_decoder(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in: 64 float32 features from a payload digest."""
    h = hashlib.sha256(payload).digest()
    seed = int.from_bytes(h[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.normal(0, 1, 64).astype(np.float32)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rng = np.random.default_rng([seed, int(i)])
                kind = kinds[int(i) % 3]
                payload = rng.bytes(256 + int(i) % 512)
                rows.append(
                    {
                        "media_id": f"m-{int(i):06d}",
                        "kind": kind,
                        "payload": payload,
                        "meta_width": 64 if kind == "image" else None,
                        "meta_height": 64 if kind == "image" else None,
                        "meta_sr": 16000 if kind == "audio" else None,
                        "meta_frames": 30 if kind == "video" else None,
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def extract_features(
    media: DataFrame,
    decoder: Decoder = auto_decoder,
    max_batch_bytes: int = 64 << 20,
) -> DataFrame:
    """binary payload -> embedding via Arrow-batched kernel.

    mapInPandas keeps payloads off the driver and lets the decoder run
    per batch; partitioning is whatever the upstream scan gives (binary
    payloads dominate size, so files are the natural unit).

    Arrow's maxRecordsPerBatch is ROW-count based — 256 rows of multi-MB
    payloads is gigabytes resident — so the kernel re-slices each incoming
    batch on CUMULATIVE PAYLOAD BYTES (max_batch_bytes) and yields per
    slice, bounding peak decode memory regardless of payload size."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def emit(pdf: pd.DataFrame) -> pd.DataFrame:
            feats = [decoder(bytes(p), k) for p, k in zip(pdf["payload"], pdf["kind"])]
            return pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "embedding": [f.astype(np.float32).ravel() for f in feats],
                    "payload_bytes": pdf["payload"].map(len).astype("int64"),
                }
            )

        for pdf in batches:
            if len(pdf) == 0:
                continue
            sizes = pdf["payload"].map(len).to_numpy(dtype=np.int64)
            cum = np.cumsum(sizes)
            start = 0
            base = 0
            for i in range(len(pdf)):
                if cum[i] - base > max_batch_bytes and i > start:
                    yield emit(pdf.iloc[start:i])
                    start = i
                    base = cum[i - 1]
            yield emit(pdf.iloc[start:])

    return media.mapInPandas(
        kernel,
        schema="media_id string, kind string, embedding array<float>, payload_bytes long",
    )


def frame_sample(media: DataFrame, every: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_idx) rows from
    metadata; the per-frame decode plugs into extract_features."""
    v = media.filter(F.col("kind") == "video")
    return v.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta_frames") - 1, F.lit(every))
        ).alias("frame_idx"),
    )


def load_audio_resampled(media: DataFrame, target_sr: int = 8000,
                         decoder: Decoder = auto_decoder) -> DataFrame:
    """wav_loader parity (caits/loading/_audio.py:55-62): decode audio then
    resample to target_sr AT LOAD TIME via the real polyphase resampler
    (functions/dsp2.resample_signal). The decode step is the sandbox stub
    (no soundfile); the resample path, schema, and batch shape are real."""
    from ..functions.dsp2 import resample_signal

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, kind, sr in zip(
                pdf["media_id"], pdf["payload"], pdf["kind"], pdf["meta_sr"]
            ):
                if kind != "audio":
                    continue
                wave = decoder(bytes(payload), kind).astype(np.float64)
                sr = int(sr)
                out = resample_signal(wave, sr, target_sr) if sr != target_sr else wave
                rows.append((mid, target_sr, int(out.size), float(np.abs(out).max())))
            yield pd.DataFrame(rows, columns=["media_id", "sr", "n_samples", "peak"])

    return media.mapInPandas(
        kernel, schema="media_id string, sr int, n_samples int, peak double"
    )
