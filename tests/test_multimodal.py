"""Multimodal plumbing: binary columns through Arrow mapInPandas stages.

The decode step is a documented stub (no codecs in the container); these
tests pin the REAL parts — schemas, 1:1 and 1→N batch shapes, and
deterministic fake transforms — so swapping a real codec in changes only
the per-item function body.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from orientdb_spark.pipeline import multimodal


@pytest.fixture(scope="module")
def payload_df(spark):
    rows = [
        (1, "hello world"),
        (2, "a" * 300),  # 300 bytes → 5 frames of 64
        (3, ""),  # empty payload edge
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return multimodal.with_binary_payload(df)


def _tiny_png(w=4, h=4):
    """Hand-built grayscale PNG (stdlib only) — pixel (r, c) = 16r + 4c."""
    import struct
    import zlib

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    rows = b"".join(
        b"\x00" + bytes(range(r * 16, r * 16 + 4 * w, 4)) for r in range(h)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(rows))
        + chunk(b"IEND", b"")
    )


def test_stdlib_png_decoder_supported_subset():
    """The codec-less fallback must reject what it can't parse with the
    install hint (unconditional — tests the fallback directly, so it
    runs whether or not Pillow is importable)."""
    with pytest.raises(NotImplementedError, match="PNG only"):
        multimodal._png_to_gray(b"JUNKJUNKJUNK")  # not a PNG
    with pytest.raises(ValueError, match="IHDR"):
        multimodal._png_to_gray(b"\x89PNG\r\n\x1a\n")  # truncated
    # interlaced / non-grayscale headers are out of the supported subset
    import struct
    import zlib

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    rgb = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00\x01\x02\x03"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="grayscale"):
        multimodal._png_to_gray(rgb)


def test_stdlib_png_decoder_all_filters():
    """Each PNG scanline filter (None/Sub/Up/Average/Paeth) round-trips:
    encode a known pixel grid with one filter per row, decode, compare."""
    import struct
    import zlib

    import numpy as np

    px = np.arange(5 * 4, dtype=np.uint8).reshape(5, 4) * 7 % 256

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = b""
    prev = [0] * 4
    for r, ft in enumerate([0, 1, 2, 3, 4]):
        row = [int(v) for v in px[r]]
        if ft == 0:
            enc = row
        elif ft == 1:
            enc = [(v - (row[c - 1] if c else 0)) % 256 for c, v in enumerate(row)]
        elif ft == 2:
            enc = [(v - prev[c]) % 256 for c, v in enumerate(row)]
        elif ft == 3:
            enc = [
                (v - ((row[c - 1] if c else 0) + prev[c]) // 2) % 256
                for c, v in enumerate(row)
            ]
        else:
            enc = [
                (v - paeth(row[c - 1] if c else 0, prev[c],
                           prev[c - 1] if c else 0)) % 256
                for c, v in enumerate(row)
            ]
        raw += bytes([ft]) + bytes(enc)
        prev = row
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 5, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = multimodal._png_to_gray(png)
    assert (out == px).all()


def test_decode_image_real_png_matches_fake_schema(spark):
    """Real-codec path (Pillow when present, stdlib PNG fallback when
    not — identical pixels either way): decode the 4x4 PNG fixture, run
    the real feature stage, and pin its schema to the fake path's
    (identical (id, n_bytes, histogram) contract)."""
    import numpy as np

    px = multimodal.decode_image(_tiny_png())
    assert px.shape == (4, 4) and px.dtype == np.uint8
    assert px[0, 0] == 0 and px[3, 3] == 60  # 16r + 4c
    df = spark.createDataFrame([(1, bytearray(_tiny_png()))], "doc_id bigint, payload binary")
    real = multimodal.decode_image_features(df)
    fake = multimodal.fake_decode_features(df)
    assert real.schema == fake.schema
    row = real.collect()[0]
    assert row["n_bytes"] == len(_tiny_png())
    assert sum(row["histogram"]) == 16  # 16 pixels histogrammed


def test_binary_features_digest(payload_df):
    out = {r["doc_id"]: r for r in multimodal.binary_features(payload_df).collect()}
    assert out[1]["n_bytes"] == len(b"hello world")
    assert out[1]["digest"] == hashlib.md5(b"hello world").hexdigest()
    assert out[3]["n_bytes"] == 0


def test_resize_pools_to_fixed_grid(payload_df):
    out = {r["doc_id"]: r for r in multimodal.resize_images(payload_df, width=2, height=2).collect()}
    # fixed grid regardless of payload size — the contract a model reads
    for r in out.values():
        assert (r["width"], r["height"], len(r["pixels"])) == (2, 2, 4)
    # constant input → constant pooled value
    assert out[2]["pixels"] == [ord("a")] * 4
    # empty payload → zero grid, not an error
    assert out[3]["pixels"] == [0, 0, 0, 0]
    # pooling is the mean of each byte segment
    data = b"hello world"
    n, cells = len(data), 4
    expect = []
    for i in range(cells):
        lo, hi = i * n // cells, max((i + 1) * n // cells, i * n // cells + 1)
        seg = data[lo:min(hi, n)] or data[-1:]
        expect.append(sum(seg) // len(seg))
    assert out[1]["pixels"] == expect


def test_sample_frames_fanout(payload_df):
    out = multimodal.sample_frames(payload_df, frame_bytes=64, every=2, fps=30.0)
    rows = out.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 2: 300 bytes → frames 0..4, every 2nd → indices 0, 2, 4
    idx2 = sorted(r["frame_index"] for r in by_doc[2])
    assert idx2 == [0, 2, 4]
    # typed frame timestamps: frame_index / fps
    ts = {r["frame_index"]: r["frame_ts"] for r in by_doc[2]}
    assert ts[2] == pytest.approx(2 / 30.0)
    # frame payloads are the byte chunks; the tail frame is short
    f4 = next(r for r in by_doc[2] if r["frame_index"] == 4)
    assert bytes(f4["frame"]) == b"a" * (300 - 4 * 64)
    # doc 1 (11 bytes): one frame, whole payload
    assert bytes(by_doc[1][0]["frame"]) == b"hello world"
    # empty payload → no frames, not a crash
    assert 3 not in by_doc


def test_frame_sample_schema(payload_df):
    out = multimodal.sample_frames(payload_df)
    assert [f.name for f in out.schema.fields] == ["doc_id", "frame_index", "frame_ts", "frame"]
    assert out.schema["frame"].dataType.typeName() == "binary"


def test_documents_text_is_ascii(oracle):
    """The multimodal_frame_sample oracle md5s substring(text, ...) by
    CHARS while Spark md5s the byte frame — equivalent only while the
    corpus is pure ASCII (chars == bytes). The histogram/resize oracles
    are byte-exact regardless (hex(encode(text))), but this pins the
    frame-digest precondition so a future testdata regen that introduces
    non-ASCII fails loudly here instead of as a driver hash mismatch."""
    n_bad = oracle.sql(
        "SELECT count(*) FROM documents "
        "WHERE octet_length(encode(text)) <> length(text)"
    ).fetchone()[0]
    assert n_bad == 0


def test_perceptual_hash_near_dup_recovery(spark):
    """Planted one-byte-changed copies sit within Hamming 6 of their
    originals (recall >= 0.9); every reported pair at this threshold is
    a planted one (no cross-doc noise on this corpus); and the block
    join equals brute force over the hash set — including 64-bit hashes
    with the sign bit set."""
    from pyspark.sql import functions as F

    from orientdb_spark.pipeline.dedup import hamming_pairs
    from orientdb_spark.pipeline.multimodal import (
        perceptual_hash,
        with_binary_payload,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = with_binary_payload(docs).select("doc_id", "payload").unionByName(
        with_binary_payload(
            docs.filter(F.col("doc_id") % 7 == 0).withColumn(
                "text", F.concat(F.lit("Z"), F.expr("substring(text, 2)"))
            )
        ).select((F.col("doc_id") + 1_000_000).alias("doc_id"), "payload")
    )
    ph = perceptual_hash(corpus)
    hashes = {r["doc_id"]: r["phash"] for r in ph.collect()}
    assert any(h < 0 for h in hashes.values())  # sign bit exercised
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_pairs(ph, "doc_id", "phash", 64, 6).collect()
    }
    want = {
        (a, b, bin((hashes[a] ^ hashes[b]) & (2**64 - 1)).count("1"))
        for a in hashes
        for b in hashes
        if a < b and bin((hashes[a] ^ hashes[b]) & (2**64 - 1)).count("1") <= 6
    }
    assert got == want
    planted = {(a, b) for a, b, _ in got if b - a == 1_000_000}
    n_planted = docs.filter(F.col("doc_id") % 7 == 0).count()
    assert len(planted) >= 0.9 * n_planted
    assert planted == {(a, b) for a, b, _ in got}  # zero non-planted pairs


def test_perceptual_hash_validation(spark):
    import pytest
    from pyspark.sql import functions as F

    from orientdb_spark.pipeline.multimodal import (
        perceptual_hash,
        with_binary_payload,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(3)
    with pytest.raises(ValueError):
        perceptual_hash(with_binary_payload(docs), grid=9)


def test_scene_cuts_hand_checked(spark):
    """Byte-energy deltas on hand-built payloads: a flat payload has no
    cuts, a payload with a hot second frame cuts exactly there, frame 0
    never cuts (NULL delta)."""
    import pytest

    from orientdb_spark.pipeline import multimodal

    docs = spark.createDataFrame(
        [
            (1, "aaaa" + "aaaa"),          # frames 'aaaa','aaaa': delta 0
            (2, "aaaa" + "zzzz" + "aa"),   # 388 - 488... energies 388,488,194
        ],
        ["doc_id", "text"],
    )
    payload = multimodal.with_binary_payload(docs)
    got = {
        (r["doc_id"], r["frame_index"]): r.asDict()
        for r in multimodal.scene_cuts(
            payload, frame_bytes=4, threshold=50
        ).collect()
    }
    a = ord("a")
    assert got[(1, 0)]["energy"] == 4 * a and got[(1, 0)]["delta"] is None
    assert got[(1, 0)]["is_cut"] is False and got[(1, 1)]["is_cut"] is False
    z = ord("z")
    assert got[(2, 1)]["energy"] == 4 * z
    assert got[(2, 1)]["delta"] == 4 * z - 4 * a and got[(2, 1)]["is_cut"]
    assert got[(2, 2)]["energy"] == 2 * a  # short tail frame
    assert got[(2, 2)]["is_cut"]
    with pytest.raises(ValueError, match="frame_bytes"):
        multimodal.scene_cuts(payload, frame_bytes=0)
