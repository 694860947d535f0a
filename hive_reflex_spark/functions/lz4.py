"""LZ4 block codec (C2, `firmware/middleware/compression.c:60-117`).

The reference ships a simplified LZ4 block decompressor for OTA weight
blobs; this is the same public LZ4 block format (token = 4-bit literal
length | 4-bit match length, 15 → extension bytes, little-endian 16-bit
match offset) as pure Python, plus a greedy hash-chain compressor so
round-trips are testable without any external lz4 package.

Spark shape: blobs are independent — parallelism is ACROSS blobs, so the
decode runs as an Arrow-batched pandas UDF over a binary column (the
sanctioned Python path for byte-level sequential work; per-blob cost is
linear). At 100 TB the blobs ride a normal binary column through scans,
joins and shuffles; only the codec itself touches Python.
"""

from __future__ import annotations


def lz4_block_compress(data: bytes, min_match: int = 4) -> bytes:
    """Greedy LZ4 block compressor: 4-byte hash table, 64 KB window.
    Emits a final literals-only sequence (no match), which is what the
    decompressor's `src >= src_end` early-exit expects."""
    n = len(data)
    out = bytearray()
    table: dict[bytes, int] = {}
    anchor = 0  # start of pending literals
    i = 0
    while i + min_match <= n:
        key = data[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 0xFFFF and data[cand : cand + 4] == key:
            # extend the match forward
            m = 4
            while i + m < n and data[cand + m] == data[i + m]:
                m += 1
            lit = data[anchor:i]
            _emit_sequence(out, lit, i - cand, m)
            i += m
            anchor = i
        else:
            i += 1
    # final sequence: literals only
    lit = data[anchor:]
    token_lit = min(len(lit), 15)
    out.append(token_lit << 4)
    rest = len(lit) - 15
    while rest >= 0:
        out.append(min(rest, 255))
        if rest < 255:
            break
        rest -= 255
    out += lit
    return bytes(out)


def _emit_sequence(out: bytearray, lit: bytes, offset: int, match_len: int) -> None:
    ml = match_len - 4
    token = (min(len(lit), 15) << 4) | min(ml, 15)
    out.append(token)
    rest = len(lit) - 15
    while rest >= 0:
        out.append(min(rest, 255))
        if rest < 255:
            break
        rest -= 255
    out += lit
    out.append(offset & 0xFF)
    out.append((offset >> 8) & 0xFF)
    rest = ml - 15
    while rest >= 0:
        out.append(min(rest, 255))
        if rest < 255:
            break
        rest -= 255


def lz4_block_decompress(src: bytes) -> bytes:
    """`Decompress_LZ4` (compression.c:60-117) as Python: token → literal
    run → (offset, match run) copied byte-by-byte (matches may overlap
    their own output, which is how LZ4 encodes runs)."""
    dst = bytearray()
    i = 0
    n = len(src)
    while i < n:
        token = src[i]
        i += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                b = src[i]
                i += 1
                lit_len += b
                if b != 255:
                    break
        dst += src[i : i + lit_len]
        i += lit_len
        if i >= n:  # final literals-only sequence
            break
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        match_len = (token & 0x0F) + 4
        if token & 0x0F == 15:
            while True:
                b = src[i]
                i += 1
                match_len += b
                if b != 255:
                    break
        start = len(dst) - offset
        for k in range(match_len):  # byte-wise: overlapping copies legal
            dst.append(dst[start + k])
    return bytes(dst)


def lz4_decompress_col(col):
    """Arrow-batched decode of a binary column of LZ4 blocks."""
    import pandas as pd  # noqa: F401  (resolves the UDF's type hints)
    from pyspark.sql.functions import pandas_udf

    globals()["pd"] = pd  # postponed annotations resolve in module globals

    @pandas_udf("binary")
    def _decode(s: "pd.Series") -> "pd.Series":
        return s.map(lambda b: None if b is None else lz4_block_decompress(bytes(b)))

    return _decode(col)
