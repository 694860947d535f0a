"""LZ4 block codec + HRZC auto-dispatch (C2/C4, compression.c:60-205).

Pure-Python layer tests run without Spark; the Spark-side plumbing is
covered by q82's oracle row and the dispatch test at the bottom.
"""

import os
import random
import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hive_reflex_spark.functions.lz4 import (
    COMPRESS_DELTA,
    COMPRESS_LZ4,
    COMPRESS_NONE,
    COMPRESS_RLE,
    COMPRESSION_MAGIC,
    decompress_auto,
    delta_compress,
    delta_decompress,
    lz4_compress,
    lz4_decompress,
    pack_artifact,
    rle_compress,
    rle_decompress,
    validate_artifact,
)


@given(st.binary(max_size=4096))
@settings(max_examples=200, deadline=None)
def test_lz4_roundtrip_random(data):
    assert lz4_decompress(lz4_compress(data)) == data


@given(
    st.binary(min_size=1, max_size=32),
    st.integers(min_value=1, max_value=400),
)
@settings(max_examples=100, deadline=None)
def test_lz4_roundtrip_repetitive(unit, reps):
    data = unit * reps
    comp = lz4_compress(data)
    assert lz4_decompress(comp) == data
    if len(data) >= 256:
        # repetitive input must actually compress (C2's purpose)
        assert len(comp) < len(data) // 2


def test_lz4_overlap_copy_semantics():
    """offset < match length replicates the run byte-by-byte — the
    firmware loop's overlapping-copy behavior (compression.c:102-105)."""
    # hand-built block: 1 literal 'A', then match offset=1 len=19
    block = bytes([0x1F, ord("A"), 0x01, 0x00, 0x00])
    assert lz4_decompress(block) == b"A" * 20


def test_lz4_extended_lengths():
    data = os.urandom(300) + b"z" * 1000 + os.urandom(300)
    comp = lz4_compress(data)
    assert lz4_decompress(comp) == data
    # a >15 literal run and a >15+4 match both require extension bytes
    assert len(comp) < len(data)


def test_lz4_malformed_stream_rejected():
    with pytest.raises(ValueError):
        # token promising 10 literals with only 2 present
        lz4_decompress(bytes([0xA0, 1, 2]))
    with pytest.raises(ValueError):
        # back-reference reaching before the start of the block
        lz4_decompress(bytes([0x10, ord("A"), 0xFF, 0xFF, 0x00]))
    with pytest.raises(ValueError):
        # zero offset is self-referential garbage
        lz4_decompress(bytes([0x10, ord("A"), 0x00, 0x00, 0x00]))
    with pytest.raises(ValueError):
        # sequence cut off after the token's literals (no offset bytes)
        lz4_decompress(bytes([0x11, ord("A"), 0x05]))


@given(st.binary(max_size=2048))
@settings(max_examples=100, deadline=None)
def test_rle_delta_roundtrip(data):
    assert rle_decompress(rle_compress(data)) == data
    assert delta_decompress(delta_compress(data)) == data


def test_rle_run_cap_255():
    data = bytes([7]) * 700
    comp = rle_compress(data)
    assert comp == bytes([7, 255, 7, 255, 7, 190])
    assert rle_decompress(comp) == data


@given(
    st.binary(min_size=1, max_size=1024),
    st.sampled_from([COMPRESS_NONE, COMPRESS_RLE, COMPRESS_LZ4, COMPRESS_DELTA]),
)
@settings(max_examples=150, deadline=None)
def test_artifact_roundtrip_all_codecs(data, ctype):
    blob = pack_artifact(data, ctype)
    assert validate_artifact(blob)
    assert decompress_auto(blob) == data


def test_artifact_header_layout():
    """Header is five LE u32s in CompressionHeader_t order
    (compression.h:26-32): magic, type, csize, dsize, crc32."""
    data = b"the quick brown fox" * 10
    blob = pack_artifact(data, COMPRESS_LZ4)
    magic, ctype, csize, dsize, crc = struct.unpack_from("<IIIII", blob)
    assert magic == COMPRESSION_MAGIC == 0x484C5A43
    assert ctype == COMPRESS_LZ4
    assert dsize == len(data)
    assert csize == len(blob) - 20
    assert crc == zlib.crc32(data)


def test_artifact_rejects_corruption():
    data = os.urandom(512)
    blob = pack_artifact(data, COMPRESS_LZ4)
    bad_magic = b"\x00" + blob[1:]
    assert not validate_artifact(bad_magic)
    assert decompress_auto(bad_magic) is None
    # body corruption passes the header check but fails CRC
    body_bad = bytearray(blob)
    body_bad[40] ^= 0x55
    assert decompress_auto(bytes(body_bad)) is None
    # unknown codec type
    unknown = blob[:4] + struct.pack("<I", 9) + blob[8:]
    assert decompress_auto(unknown) is None
    # truncated blob
    assert decompress_auto(blob[:10]) is None


def test_delta_artifact_validates():
    """The reference's Decompress_Validate rejects type >= 4 — its own
    COMPRESS_DELTA=4 (compression.h:22, compression.c:259). Ours accepts
    every shipped codec."""
    assert validate_artifact(pack_artifact(b"abc" * 50, COMPRESS_DELTA))


def test_compression_ratios():
    random.seed(11)
    repetitive = b"weights are sparse and repetitive " * 100
    sparse = bytes(random.choices([0, 0, 0, 0, 0, 0, 3, 7], k=4000))
    assert len(lz4_compress(repetitive)) < len(repetitive) * 0.1
    assert len(rle_compress(sparse)) < len(sparse)
    # incompressible data expands by at most the literal-run framing
    noise = os.urandom(4096)
    assert len(lz4_compress(noise)) < len(noise) * 1.02


def test_q82_spark_dispatch(spark, sf_smoke):
    """Spark-side plumbing: mixed-codec binary artifacts dispatch and
    round-trip inside the Pandas UDF; corrupt headers are rejected."""
    from hive_reflex_spark.operators.codec import q82_lz4_roundtrip

    rows = {r["codec"]: r for r in q82_lz4_roundtrip(spark, sf_smoke).collect()}
    assert set(rows) == {"none", "rle", "lz4", "delta"}
    for name, r in rows.items():
        assert r["n_valid"] == r["n_roundtrip_ok"], name
        assert r["n_valid"] < r["n_docs"]  # the 1-in-17 corrupts were rejected
        assert r["min_sha"] is not None and len(r["min_sha"]) == 64
