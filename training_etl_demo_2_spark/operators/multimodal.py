"""Multimodal column plumbing (north-star, SURVEY §2.12).

Images/audio/video are carried as opaque ``binary`` payload columns
with a typed metadata struct alongside. The Spark-side plumbing —
schema, partition-friendly batch shape, Arrow transfer through
``mapInPandas`` — is real and tested; the actual codec step is a SOFT
dependency: ``decode_fn=None`` → deterministic fake features (the
default for every registered/oracle-checked query), ``decode_fn="auto"``
→ try-import Pillow / soundfile and use them when the host ships them
(``NotImplementedError`` only when the lib is genuinely absent), or any
user callable ``bytes -> np.ndarray`` which is used as-is.

At 100 TB: binary payloads dominate row size, so the pattern is
(1) keep payloads OUT of shuffles — derive features first, then drop
the blob; (2) size ``spark.sql.files.maxPartitionBytes`` so a task's
Arrow batch of blobs fits executor memory; (3) pushdown-friendly
metadata columns (width/height/codec) live beside the blob, so
filters never touch bytes.
"""

from __future__ import annotations

import math
from collections.abc import Callable, Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, payload binary, media_type string, nbytes long"
)

FEATURE_SCHEMA = (
    "doc_id long, media_type string, nbytes long, width int, height int, "
    "feature array<float>"
)


def load_image_decoder():
    """Soft codec dependency (Pillow). Returns ``bytes -> np.uint8 2-D
    grayscale array`` when PIL imports, else ``None``. Executors
    re-import inside the closure, so the returned callable is
    serialization-safe."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError:
        return None

    def decode(blob: bytes) -> np.ndarray:
        import io as _io

        from PIL import Image

        with Image.open(_io.BytesIO(blob)) as img:
            return np.asarray(img.convert("L"), dtype=np.uint8)

    return decode


def load_audio_decoder():
    """Soft codec dependency (soundfile). Returns ``bytes -> float64
    sample array`` (first channel) when soundfile imports, else
    ``None``."""
    try:
        import soundfile  # noqa: F401
    except ImportError:
        return None

    def decode(blob: bytes) -> np.ndarray:
        import io as _io

        import soundfile as sf

        data, _sr = sf.read(_io.BytesIO(blob), dtype="float64")
        if data.ndim > 1:
            data = data[:, 0]
        return np.asarray(data, dtype=np.float64)

    return decode


def _resolve_decoder(decode_fn, loader, what: str):
    """None → fake path; "auto" → loader() or NotImplementedError;
    callable → as-is."""
    if decode_fn is None:
        return None
    if decode_fn == "auto":
        real = loader()
        if real is None:
            raise NotImplementedError(
                f"real {what} decoding requested (decode_fn='auto') but the "
                "codec library is not installed in this environment; use "
                "decode_fn=None for the deterministic fake path"
            )
        return real
    if not callable(decode_fn):
        raise TypeError("decode_fn must be None, 'auto', or a callable")
    return decode_fn


def attach_fake_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fake media: UTF-8 bytes of the text as the payload
    (stands in for image bytes; same schema and flow as real media)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("image/fake").alias("media_type"),
        F.length(payload).cast("long").alias("nbytes"),
    )


def media_metadata(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Pure-JVM metadata extraction over the payload: byte length and a
    hex magic prefix — the filter columns that let 100 TB queries prune
    without touching blobs."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        "doc_id",
        F.length(payload).cast("long").alias("nbytes"),
        F.upper(F.hex(F.substring(payload, 1, 4))).alias("magic_hex"),
    )


RESIZED_SCHEMA = "doc_id long, media_type string, width int, height int, payload binary"

FRAME_SCHEMA = "doc_id long, frame_idx int, n_frames int, frame binary"

AUDIO_SCHEMA = (
    "doc_id long, n_samples long, mean double, std double, zero_crossings long"
)

FRAME_BYTES = 64  # fake codec: fixed-size frames inside the payload


def resize_images(
    media: DataFrame, out_w: int = 8, out_h: int = 8, decode_fn=None
) -> DataFrame:
    """Resize plumbing: payload → decode → nearest-neighbor resample →
    re-encoded payload. Fake decode (``decode_fn=None``) = interpret
    bytes as a √n×√n grayscale grid (same convention as
    extract_features); ``decode_fn="auto"`` activates Pillow when the
    host has it; any callable ``bytes -> 2-D uint8 array`` is used
    directly.

    Scale shape: narrow 1→1 transform, blobs never shuffle — the
    resized (smaller) payload replaces the original in the projection.
    """
    decode_fn = _resolve_decoder(decode_fn, load_image_decoder, "image")

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for blob in pdf["payload"]:
                if decode_fn is not None:
                    img = np.atleast_2d(decode_fn(bytes(blob)))
                    h, w = img.shape
                else:
                    arr = np.frombuffer(bytes(blob), dtype=np.uint8)
                    w = int(max(1, np.floor(np.sqrt(arr.size))))
                    h = int(arr.size // w) or 1
                    img = arr[: w * h].reshape(h, w)
                yy = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xx = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                out.append(img[np.ix_(yy, xx)].tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": out_w,
                    "height": out_h,
                    "payload": out,
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling (video path): payload → fixed-size fake frames →
    keep every ``every_n``-th. A 1→N expansion done inside the Arrow
    batch (rows stay bounded by batch size × frames/doc; at 100 TB
    bound the blow-up with maxRecordsPerBatch and sample BEFORE any
    shuffle so only kept frames move)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            doc_ids, idxs, totals, frames = [], [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(blob)
                n_frames = max(1, len(buf) // FRAME_BYTES)
                for i in range(0, n_frames, every_n):
                    doc_ids.append(doc_id)
                    idxs.append(i)
                    totals.append(n_frames)
                    frames.append(buf[i * FRAME_BYTES : (i + 1) * FRAME_BYTES])
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "frame_idx": idxs,
                    "n_frames": totals,
                    "frame": frames,
                }
            )

    return media.mapInPandas(run, FRAME_SCHEMA)


def audio_features(media: DataFrame, decode_fn=None) -> DataFrame:
    """Audio-feature plumbing: payload bytes as a fake PCM signal →
    moments + zero-crossing count per doc. ``decode_fn="auto"``
    activates the soundfile soft dependency when present (real decode →
    float samples, float moments — no exact-integer oracle claim on
    that branch); a callable ``bytes -> float array`` is used directly.

    Moments are derived from EXACT integer sums (S1=Σc, S2=Σc², c in
    [-128,127], both exact in int64) followed by a fixed IEEE op
    sequence (S1/n; sqrt(max(S2/n − mean², 0))) — the same sequence the
    DuckDB oracle twin runs on the same integers, so the doubles are
    bitwise identical across engines and the oracle diff needs no
    rounding tolerance. Zero crossing = adjacent sign(c<0) flip,
    matching the SQL lag() formulation (0 counts as non-negative)."""
    decode_fn = _resolve_decoder(decode_fn, load_audio_decoder, "audio")

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            means, stds, zcs, ns = [], [], [], []
            for blob in pdf["payload"]:
                raw = b"" if blob is None else bytes(blob)
                if decode_fn is not None:
                    c = np.asarray(decode_fn(raw), dtype=np.float64)
                else:
                    c = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                    c -= 128
                n = len(c)
                ns.append(n)
                if n == 0:
                    means.append(0.0)
                    stds.append(0.0)
                    zcs.append(0)
                    continue
                if decode_fn is not None:
                    mean = float(c.mean())
                    means.append(mean)
                    stds.append(float(c.std()))
                    zcs.append(int(np.sum((c[1:] < 0) != (c[:-1] < 0))))
                    continue
                s1 = int(c.sum())
                s2 = int((c * c).sum())
                mean = s1 / n
                means.append(mean)
                stds.append(math.sqrt(max(s2 / n - mean * mean, 0.0)))
                zcs.append(int(np.sum((c[1:] < 0) != (c[:-1] < 0))))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_samples": ns,
                    "mean": means,
                    "std": stds,
                    "zero_crossings": zcs,
                }
            )

    return media.mapInPandas(run, AUDIO_SCHEMA)


PHASH_BITS = 64
_PHASH_NGRAM = 4
_PHASH_BASE = np.int64(257)
_PHASH_MOD = np.int64(1_000_000_007)


def perceptual_hashes(media: DataFrame) -> DataFrame:
    """(doc_id, phash): 64-bit SimHash over byte 4-grams of the payload
    — a codec-free perceptual fingerprint (real perceptual hashing
    would decode + DCT first; the byte-shingle form is the honest
    stand-in with identical plumbing and the SAME downstream banding).

    Each bit is an independent universal hash of the shingle hash
    (((a_b·h + b_b) mod P) mod 2, same family as text SimHash) — the
    shingle hash itself carries only ~30 bits mod P, so raw bit
    positions above that would be constant and the fingerprint would
    degenerate (the round-2 density failure: text-like payloads
    clustered into a handful of 256-way band buckets). The value is a
    signed int64 (bit 63 weighted -2^63, two's complement).

    Vectorized per blob: sliding byte windows → polynomial hashes →
    unique+counts as weights → signed bit sums. Narrow 1→1 transform;
    blobs never shuffle — only the 8-byte hash does."""
    from .dedup import SIMHASH_A, SIMHASH_B

    out_schema = "doc_id long, phash long"

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        coef_a = np.array(SIMHASH_A, dtype=np.int64)
        coef_b = np.array(SIMHASH_B, dtype=np.int64)
        bit_idx = np.arange(PHASH_BITS, dtype=np.uint64)

        def one(blob: bytes) -> int:
            arr = np.frombuffer(bytes(blob), dtype=np.uint8).astype(np.int64)
            if arr.size < _PHASH_NGRAM:
                arr = np.pad(arr, (0, _PHASH_NGRAM - arr.size))
            win = np.lib.stride_tricks.sliding_window_view(arr, _PHASH_NGRAM)
            h = np.zeros(len(win), dtype=np.int64)
            for j in range(_PHASH_NGRAM):
                h = (h * _PHASH_BASE + win[:, j]) % _PHASH_MOD
            uniq, w = np.unique(h, return_counts=True)
            # (a_b*h + b_b) < P^2 < 2^63: exact in int64
            bits = ((uniq[:, None] * coef_a[None, :] + coef_b[None, :]) % _PHASH_MOD) % 2
            sums = np.where(bits == 1, w[:, None], -w[:, None]).sum(axis=0)
            val = ((sums > 0).astype(np.uint64) << bit_idx).sum(dtype=np.uint64)
            return int(np.uint64(val).astype(np.int64))

        for pdf in batches:
            if pdf.empty:
                continue
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "phash": [one(b) for b in pdf["payload"]],
                }
            )

    return media.select("doc_id", "payload").mapInPandas(run, out_schema)


def media_near_dups(media: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-duplicate media pairs by perceptual-hash banding — the
    multimodal twin of text SimHash dedup, sharing the exact banded
    hamming join (4 × 16-bit bands, pigeonhole-exact for max_hamming
    ≤ 3). Payload bytes stay map-side; only (doc_id, 8-byte hash)
    enters the join."""
    from .dedup import hamming_band_pairs

    return hamming_band_pairs(
        perceptual_hashes(media), "doc_id", "phash", max_hamming=max_hamming
    )


DecodeFn = Callable[[bytes], np.ndarray]


def extract_features(
    media: DataFrame,
    decode_fn: DecodeFn | None = None,
    feature_dim: int = 8,
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    ``decode_fn=None`` → deterministic fake decode (byte-histogram
    moments), which exercises the full distributed path: binary Arrow
    transfer, per-batch numpy work, typed struct-ish output.
    ``decode_fn="auto"`` activates the Pillow soft dependency when the
    host ships it (NotImplementedError only when genuinely absent); any
    callable ``bytes -> 2-D uint8 array`` is used directly.
    """
    decode_fn = _resolve_decoder(decode_fn, load_image_decoder, "image")

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            feats, widths, heights = [], [], []
            for blob in pdf["payload"]:
                if decode_fn is not None:
                    img = np.atleast_2d(decode_fn(bytes(blob)))
                    h, w = int(img.shape[0]), int(img.shape[1])
                    arr = img.astype(np.float64).ravel()
                else:
                    arr = np.frombuffer(bytes(blob), dtype=np.uint8).astype(
                        np.float64
                    )
                    # fake "image": pretend bytes are a wxh grid
                    w = int(max(1, np.floor(np.sqrt(arr.size))))
                    h = int(arr.size // w)
                hist = np.histogram(arr, bins=feature_dim, range=(0, 256))[0]
                total = hist.sum() or 1
                feats.append((hist / total).astype(np.float32))
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "nbytes": pdf["nbytes"],
                    "width": widths,
                    "height": heights,
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)
