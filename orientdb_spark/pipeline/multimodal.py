"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no image/audio codecs, so the *decode* step is stubbed
(clearly-marked NotImplementedError / deterministic fake), but the
Spark-side plumbing is real and tested: binary columns, Arrow-batched
``mapInPandas`` with explicit output schema, partition-sized batches.

At 100 TB the pattern is: binary payloads stay in parquet (or are
pointers to object storage), metadata travels in typed columns, and every
per-item transformation runs as an Arrow-batched Pandas UDF over
``mapInPandas`` — never a row-at-a-time Python UDF.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("digest", T.StringType()),
    ]
)

FAKE_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("histogram", T.ArrayType(T.IntegerType())),
    ]
)


def _with_id(schema: "T.StructType", id_col: str) -> "T.StructType":
    """Output schema with the caller's id column name in slot 0 (every
    mapInPandas stage here keys rows by one long id)."""
    return T.StructType([T.StructField(id_col, T.LongType())] + list(schema.fields[1:]))


def _pillow():
    """Optional codec dependency: Pillow if importable, else None (this
    container ships no codecs — the deterministic fake stays the oracle
    path either way)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _png_to_gray(payload: bytes) -> "np.ndarray":
    """Minimal stdlib PNG decoder (zlib + struct, per the public PNG
    spec / RFC 2083): 8-bit grayscale, non-interlaced images only — the
    codec-less fallback that keeps the real-decode stage runnable in
    containers without Pillow. All five scanline filters (None/Sub/Up/
    Average/Paeth) are implemented; anything outside the supported
    subset raises NotImplementedError with the install hint."""
    import struct
    import zlib

    data = bytes(payload)
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise NotImplementedError(
            "stdlib fallback decodes PNG only; install Pillow for other formats"
        )
    ihdr, idat = None, b""
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if ihdr is None or len(ihdr) != 13:
        raise ValueError("malformed PNG: missing IHDR")
    w, h, bit, color, comp, filt, inter = struct.unpack(">IIBBBBB", ihdr)
    if (bit, color, comp, filt, inter) != (8, 0, 0, 0, 0):
        raise NotImplementedError(
            "stdlib fallback decodes 8-bit grayscale non-interlaced PNG "
            f"only (got bit={bit} color={color} interlace={inter}); "
            "install Pillow for full codec support"
        )
    raw = zlib.decompress(idat)
    stride = w + 1
    if len(raw) != h * stride:
        raise ValueError("malformed PNG: wrong decompressed length")
    out = np.zeros((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.int32)
    for r in range(h):
        ft = raw[r * stride]
        line = np.frombuffer(
            raw[r * stride + 1:(r + 1) * stride], dtype=np.uint8
        ).astype(np.int32)
        if ft == 0:  # None
            cur = line
        elif ft == 2:  # Up
            cur = (line + prev) % 256
        elif ft in (1, 3, 4):  # Sub / Average / Paeth: left-recurrence
            cur = np.zeros(w, dtype=np.int32)
            a = 0
            for c in range(w):
                b = int(prev[c])
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) // 2
                else:
                    cc = int(prev[c - 1]) if c else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                a = (int(line[c]) + pred) % 256
                cur[c] = a
        else:
            raise ValueError(f"malformed PNG: unknown filter type {ft}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_image(payload: bytes) -> "object":
    """Real image decode: Pillow when importable (any format, converted
    to grayscale); otherwise the stdlib PNG fallback (``_png_to_gray``,
    8-bit grayscale non-interlaced PNG — enough to keep the real-codec
    stage testable in codec-less containers). Returns a
    ``(height, width)`` uint8 grayscale ndarray; unsupported payloads
    without Pillow raise NotImplementedError."""
    Image = _pillow()
    if Image is None:
        return _png_to_gray(payload)
    import io

    with Image.open(io.BytesIO(bytes(payload))) as im:
        return np.asarray(im.convert("L"), dtype=np.uint8)


def decode_image_features(
    df: DataFrame, binary_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Real-codec decode stage (Arrow-batched mapInPandas, same schema
    as ``fake_decode_features``): per image, the 16-bucket pixel-value
    histogram of the grayscale decode. Uses Pillow when present; falls
    back to the stdlib grayscale-PNG decoder otherwise (payloads the
    fallback can't parse raise NotImplementedError in the executor with
    the install hint). The fake path remains the oracle; this stage
    proves the real-codec plumbing slots into the identical
    (id, n_bytes, histogram) contract."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hists, nbytes = [], []
            for b in pdf[binary_col]:
                px = decode_image(b)
                hists.append(
                    np.bincount(px.ravel() // 16, minlength=16).tolist()
                )
                nbytes.append(len(b))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "n_bytes": pd.Series(nbytes, dtype="int32"),
                    "histogram": hists,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(
        extract, _with_id(FAKE_DECODE_SCHEMA, id_col)
    )


def binary_features(df: DataFrame, binary_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """Byte-level features of a binary column via Arrow-batched
    mapInPandas: (id, n_bytes, md5 digest). This is the real multimodal
    plumbing — schema, batching, partition-parallelism — minus codecs."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[binary_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int32"),
                    "digest": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(
        extract, _with_id(FEATURE_SCHEMA, id_col)
    )


def fake_decode_features(
    df: DataFrame, binary_col: str = "payload", id_col: str = "doc_id", bins: int = 16
) -> DataFrame:
    """Deterministic fake 'decode': byte-value histogram with ``bins``
    buckets — stands in for decode→resize→feature-extract so the batch
    shape, schema, and partitioning of a real decoder are exercised."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hists = [
                np.bincount(
                    np.frombuffer(bytes(b), dtype=np.uint8) % bins, minlength=bins
                ).tolist()
                for b in pdf[binary_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "n_bytes": pdf[binary_col].map(len).astype("int32"),
                    "histogram": hists,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(
        extract, _with_id(FAKE_DECODE_SCHEMA, id_col)
    )


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Testdata helper: materialize a binary column from text (the driver
    tables carry no real media payloads)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pixels", T.ArrayType(T.IntegerType())),
    ]
)


def resize_images(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    width: int = 8,
    height: int = 8,
) -> DataFrame:
    """Resize stage — deterministic fake resample (no codecs in this
    container): the payload's bytes are treated as a 1-D grayscale strip
    and average-pooled into a fixed ``width × height`` grid. A real
    implementation swaps the pooling loop for PIL/libvips ``resize`` —
    the Spark plumbing (Arrow ``mapInPandas``, fixed output schema, 1:1
    row mapping, narrow stage / no shuffle) is exactly what production
    runs. Output pixel grid is typed metadata a downstream model reads."""
    cells = width * height

    cell_idx = np.arange(cells, dtype=np.int64)

    def pool(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf[binary_col]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                n = len(arr)
                if n == 0:
                    out.append([0] * cells)
                    continue
                # average-pool: cell i covers bytes [i*n/cells, (i+1)*n/cells)
                # (segments are never empty for n >= 1: lo = i*n//cells < n)
                lo = cell_idx * n // cells
                hi = np.minimum(np.maximum((cell_idx + 1) * n // cells, lo + 1), n)
                csum = np.concatenate(([0], arr.cumsum(dtype=np.int64)))
                out.append(((csum[hi] - csum[lo]) // (hi - lo)).tolist())
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "width": width,
                    "height": height,
                    "pixels": out,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(
        pool, _with_id(RESIZE_SCHEMA, id_col)
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_ts", T.DoubleType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    frame_bytes: int = 64,
    every: int = 4,
    fps: float = 30.0,
) -> DataFrame:
    """Frame-sampling stage — the 1→N fan-out plumbing of video decode:
    each payload is chunked into fixed-size ``frame_bytes`` "frames"
    (the codec-free stand-in for demuxed video frames), and every
    ``every``-th frame is emitted as its own row with a typed
    ``frame_ts`` (frame_index / fps). A real implementation replaces the
    chunker with pyav/ffmpeg demux; the fan-out batch shape — one input
    row yields a variable number of output rows from the same
    ``mapInPandas`` iterator, no shuffle, no explode of a materialized
    array — is the production pattern (frames never all materialize in
    one row's memory, which matters when a 4 GB video yields 100k
    frames).

    Known non-vectorized remainder: the per-document Python loop below
    is FRAME-granular (one iteration per emitted frame slice), not
    byte-granular like the loops np.bincount/cumsum replaced elsewhere
    in this module — O(frames) slice bookkeeping per batch is noise next
    to the Arrow transfer of the frame bytes themselves, and a real
    decoder replaces exactly this loop with its demux iterator."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, payloads = [], [], [], []
            for doc_id, b in zip(pdf[id_col], pdf[binary_col]):
                data = bytes(b)
                n_frames = (len(data) + frame_bytes - 1) // frame_bytes
                for fi in range(0, n_frames, every):
                    ids.append(int(doc_id))
                    idxs.append(fi)
                    tss.append(fi / fps)
                    payloads.append(data[fi * frame_bytes:(fi + 1) * frame_bytes])
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_index": pd.Series(idxs, dtype="int32"),
                    "frame_ts": pd.Series(tss, dtype="float64"),
                    "frame": payloads,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(
        frames, _with_id(FRAME_SCHEMA, id_col)
    )


def perceptual_hash(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    grid: int = 8,
) -> DataFrame:
    """aHash perceptual fingerprint of a binary image column: the
    ``grid x grid`` average-pooled grayscale grid (resize_images' fake
    resample — a real deployment swaps in a codec there and keeps
    everything else) thresholded at its own mean, one bit per cell,
    packed into a ``grid²``-bit integer with bitwise OR (no arithmetic
    overflow at bit 63). A small payload edit perturbs few cells, so
    near-duplicate media sits at low Hamming distance — compose with
    ``dedup.hamming_pairs`` for the image near-dup join; that block
    scheme handles sign-bit-set 64-bit hashes (arithmetic shifts +
    pmod keep low bits exact, bit_count is two's-complement-correct).

    Returns ``(id, phash)``."""
    if not 2 <= grid <= 8:
        raise ValueError(f"grid must be in [2, 8] (<= 64 bits), got {grid}")
    cells = grid * grid
    sized = resize_images(df, binary_col, id_col, width=grid, height=grid)
    px = F.col("pixels")
    total = F.aggregate(px, F.lit(0).cast("long"), lambda a, x: a + x)
    mean = (total / F.lit(cells)).alias("__mean")
    out = F.lit(0).cast("long")
    for j in range(cells):
        bit = F.when(
            F.element_at(px, j + 1) > F.col("__mean"),
            F.shiftleft(F.lit(1).cast("long"), j),
        ).otherwise(F.lit(0).cast("long"))
        out = out.bitwiseOR(bit)
    return (
        sized.withColumn("__mean", mean)
        .select(F.col(id_col), out.alias("phash"))
    )


def pair_score_filter(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "pair_id",
    vec_col: str = "embedding",
    threshold: float = 0.28,
    score_col: str = "pair_score",
) -> DataFrame:
    """CLIP-score pair filtering (Schuhmann et al. 2021 — the LAION
    curation step): join the two modality embeddings of each pair
    (image side / caption side) on the pair id, score the pair by
    embedding cosine, and keep pairs whose ROUNDED score clears
    ``threshold`` (LAION-400M used 0.28 with CLIP ViT-B/32).

    The decode/encode stages are upstream (this module's mapInPandas
    plumbing + a real encoder in deployment); this operator is the
    curation decision itself, and it is exact: cosine is the
    sequential-fold dot product (bit-identical to the oracle's
    list_dot_product), nudge-rounded to the 6-dp grid before the
    threshold compare. Pairs where either side has zero norm are
    DROPPED explicitly (no similarity definable) — without the guard
    a NaN cosine would be silently KEPT, since both Spark and DuckDB
    order NaN above every float (the embedding_decontaminate zero-norm
    lesson).

    Scale shape: one equi-join on pair_id (both sides hash-partition
    on the key — at 100 TB this is the one exchange per side; bucket
    both tables by pair_id at write time and it goes away), then a
    narrow in-row score + filter. No crossJoin, no per-pair Python.

    Returns (id, score) for kept pairs."""
    from .common import cosine_similarity, vec_norm

    a = left.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__a")
    )
    b = right.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__b")
    )
    scored = (
        a.join(b, id_col)
        .filter((vec_norm(F.col("__a")) > 0) & (vec_norm(F.col("__b")) > 0))
        .select(
            F.col(id_col),
            F.round(
                cosine_similarity(F.col("__a"), F.col("__b")) + F.lit(1e-12), 6
            ).alias(score_col),
        )
    )
    return scored.filter(F.col(score_col) >= F.lit(float(threshold)))


SCENE_CUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),  # slot 0: replaced by _with_id
        T.StructField("frame_index", T.LongType()),
        T.StructField("energy", T.LongType()),
    ]
)


def scene_cuts(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    frame_bytes: int = 64,
    threshold: int = 200,
) -> DataFrame:
    """Scene-cut detection over the fake-decode frame stream — the
    shot-boundary pass a video curation pipeline runs before
    frame-sampling per scene (dedup one keyframe per shot instead of N
    near-identical frames): every frame's byte-energy (exact integer
    sum of its byte values — the codec-free stand-in for a frame
    feature; a real implementation swaps in a per-frame embedding or
    color histogram), then a cut fires wherever the absolute energy
    delta between CONSECUTIVE frames exceeds ``threshold`` — an
    integer comparison, so the whole decision table replays exactly in
    SQL against the payload's character codes. Returns one row per
    frame: (id, frame_index, energy, delta, is_cut) with frame 0's
    delta NULL (no predecessor — never a cut).

    Scale shape: the 1→N frame fan-out is ``sample_frames``'s
    mapInPandas iterator (no shuffle, frames never materialize in one
    row); the energy is a vectorized numpy sum per frame inside the
    same Arrow pipeline; the only exchange is ONE doc-keyed window for
    the lag — frames of a doc are bounded (a real 2-hour video at 30
    fps is ~216k frames per key: one reducer's worth, same trade as
    any per-video stateful pass)."""
    if frame_bytes <= 0:
        raise ValueError(f"frame_bytes must be positive, got {frame_bytes}")
    if threshold < 0:
        raise ValueError(f"threshold must be >= 0, got {threshold}")
    frames = sample_frames(
        df, binary_col=binary_col, id_col=id_col,
        frame_bytes=frame_bytes, every=1,
    )

    def energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "frame_index": pdf["frame_index"].astype("int64"),
                    "energy": pdf["frame"]
                    .map(
                        lambda b: int(
                            np.frombuffer(bytes(b), dtype=np.uint8).sum()
                        )
                    )
                    .astype("int64"),
                }
            )

    feat = frames.mapInPandas(energy, _with_id(SCENE_CUT_SCHEMA, id_col))
    w = Window.partitionBy(id_col).orderBy("frame_index")
    delta = F.abs(F.col("energy") - F.lag("energy").over(w))
    return feat.select(
        id_col,
        "frame_index",
        "energy",
        delta.alias("delta"),
        F.coalesce(delta > F.lit(int(threshold)), F.lit(False)).alias("is_cut"),
    )
