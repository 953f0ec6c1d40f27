"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested.  Image decode/resize use Pillow when the
environment provides it (import-gated); in codec-less environments (this
container: no Pillow/ffmpeg/torchaudio, and installs unavailable) a
deterministic digest-based fake stands in so tests pin exact values.
Audio decode stays ``NotImplementedError`` — there is no stdlib fallback
worth faking beyond the metadata path.

Design for 100 TB of media:
- binary payloads stay in parquet binary columns; metadata is columnar so
  filters (mime, size, duration) push down WITHOUT touching payload bytes.
- decode/feature-extract runs in ``mapInPandas`` (Arrow batches), sized by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a partition of large
  blobs doesn't blow executor memory.
- frame sampling / resize emit 1->N rows via the same iterator — no
  collect, no Python loop over rows outside Arrow.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from kafka_connect_morphlines_spark.functions import ensure_parallelism

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = "media_id long, mime string, byte_len int, sha256 string, feature array<float>"
FRAME_SCHEMA = "media_id long, frame_idx int, frame_payload binary"


def media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap columnar metadata — pure JVM expressions, no decode."""
    return df.withColumns(
        {
            "byte_len": F.octet_length(F.col(payload_col)),
            "sha256": F.sha2(F.col(payload_col), 256),
        }
    )


try:  # Pillow is the real image decoder when the environment provides it
    from PIL import Image as _PILImage  # noqa: N812

    _HAVE_PIL = True
except ImportError:  # this container ships no codec libs and installs are
    _HAVE_PIL = False  # unavailable (verified 2026-08-13: `import PIL` fails)


def _decode_image(payload: bytes) -> list[float]:
    """Image -> 8 grayscale features.

    With Pillow present the payload is really decoded (grayscale, 8x1
    resample — a tiny but real pixel feature); without it, or for bytes
    Pillow can't parse, a deterministic digest-based fake stands in so
    tests pin exact values in codec-less environments.  Both paths return
    the same shape; swapping in a bigger model-backed featurizer changes
    only this function.
    """
    if _HAVE_PIL and payload:
        import io  # noqa: PLC0415

        try:
            img = _PILImage.open(io.BytesIO(payload)).convert("L").resize((8, 1))
            return [p / 255.0 for p in img.getdata()]
        except Exception:  # noqa: BLE001 — not decodable image bytes: fall through
            pass
    h = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in h[:8]]


def _decode_audio(payload: bytes) -> dict:
    """Decode PCM WAV audio with the stdlib ``wave`` module (no external
    codec needed) into scalar features: sample rate, channel count, frame
    count, duration, RMS level and zero-crossing rate of the first channel.

    Compressed formats (mp3/ogg/flac/aac) still raise — decoding those
    requires ffmpeg/torchaudio, which this container doesn't ship, and a
    fake would be dishonest about codec support.  WAV is the honest subset:
    the byte layout is fully specified and stdlib-parseable.
    """
    import io
    import struct
    import wave

    try:
        w = wave.open(io.BytesIO(payload))
    except (wave.Error, EOFError) as e:
        raise NotImplementedError(
            "non-WAV audio decode requires ffmpeg/torchaudio — not in this container"
        ) from e
    with w:
        rate, channels, width, nframes = w.getframerate(), w.getnchannels(), w.getsampwidth(), w.getnframes()
        if width != 2:
            raise NotImplementedError(f"only PCM16 WAV supported (got sample width {width})")
        frames = w.readframes(nframes)
    samples = struct.unpack(f"<{len(frames) // 2}h", frames)[::channels]  # first channel
    n = len(samples)
    rms = (sum(s * s for s in samples) / n) ** 0.5 / 32768.0 if n else 0.0
    zc = sum(1 for a, b in zip(samples, samples[1:]) if (a >= 0) != (b >= 0))
    return {
        "sample_rate": rate,
        "channels": channels,
        "n_frames": nframes,
        "duration_s": nframes / rate if rate else 0.0,
        "rms": rms,
        "zero_crossing_rate": zc / (n - 1) if n > 1 else 0.0,
    }


AUDIO_SCHEMA = (
    "media_id long, sample_rate int, channels int, n_frames long, "
    "duration_s double, rms double, zero_crossing_rate double"
)


def extract_audio_features(df: DataFrame, payload_col: str = "payload", id_col: str = "media_id") -> DataFrame:
    """WAV decode + feature extraction via Arrow-batched ``mapInPandas``
    (1 row -> 1 row), the audio face of ``extract_features``."""

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in ("media_id", "sample_rate", "channels", "n_frames", "duration_s", "rms", "zero_crossing_rate")}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                feats = _decode_audio(bytes(payload) if payload is not None else b"")
                out["media_id"].append(mid)
                for k, v in feats.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return ensure_parallelism(df).mapInPandas(mapper, AUDIO_SCHEMA)


def extract_features(df: DataFrame, payload_col: str = "payload", id_col: str = "media_id", mime_col: str = "mime") -> DataFrame:
    """Decode + featurize via Arrow-batched ``mapInPandas`` (1 row -> 1 row)."""

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, lens, digests = [], [], []
            for payload in pdf[payload_col]:
                raw = bytes(payload) if payload is not None else b""
                lens.append(len(raw))
                digests.append(hashlib.sha256(raw).hexdigest())
                feats.append(_decode_image(raw))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].values,
                    "mime": pdf[mime_col].values,
                    "byte_len": lens,
                    "sha256": digests,
                    "feature": feats,
                }
            )

    return ensure_parallelism(df).mapInPandas(mapper, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 1024, payload_col: str = "payload", id_col: str = "media_id") -> DataFrame:
    """Frame-sampling plumbing (1 row -> N rows) via ``mapInPandas``.

    STUB decode: 'frames' are fixed-size payload slices — the real version
    replaces the slicer with an ffmpeg keyframe iterator; the distributed
    shape (Arrow batches in, exploded rows out) is identical.
    """

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                for i in range(0, max(len(raw), 1), every_n_bytes):
                    ids.append(mid)
                    idxs.append(i // every_n_bytes)
                    frames.append(raw[i : i + every_n_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_payload": frames})

    return ensure_parallelism(df).mapInPandas(mapper, FRAME_SCHEMA)


RESIZE_SCHEMA = "media_id long, width int, height int, resized binary"


def resize_images(
    df: DataFrame,
    width: int = 64,
    height: int = 64,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Image resize (1 row -> 1 row) via ``mapInPandas``.

    With Pillow: a real grayscale ``resize((w, h)).tobytes()``.  Without it
    (or for undecodable bytes) the 'resized image' is a deterministic
    width*height-byte buffer expanded from the payload digest, so tests pin
    exact bytes in codec-less environments — schema, Arrow batch shape, and
    partitioning are identical on both paths.
    """

    def _resize(raw: bytes) -> bytes:
        if _HAVE_PIL and raw:
            import io  # noqa: PLC0415

            try:
                return _PILImage.open(io.BytesIO(raw)).convert("L").resize((width, height)).tobytes()
            except Exception:  # noqa: BLE001 — undecodable bytes: digest fallback
                pass
        seed = hashlib.sha256(raw or b"").digest()
        reps = (width * height) // len(seed) + 1
        return (seed * reps)[: width * height]

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, resized = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                ids.append(mid)
                resized.append(_resize(raw))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": [width] * len(ids),
                    "height": [height] * len(ids),
                    "resized": resized,
                }
            )

    return ensure_parallelism(df).mapInPandas(mapper, RESIZE_SCHEMA)
