"""Variable-byte (VB) codec, numpy-vectorized.

Classic posting-list compression: each uint64 is split into 7-bit groups,
little-endian, with the high bit set on every byte EXCEPT the last of a value.
Encode and decode are fully vectorized (no per-value Python loop — the encode loop
runs over byte *positions*, ≤ 10 iterations for 64-bit values), so they are fit to
run inside Arrow-batched kernels over billions of postings.

This is the engine's "data encoding" custom op (SURVEY.md §4.2): deliberately NOT a
Catalyst rule — it's storage format, applied at block-assembly time.
"""

from __future__ import annotations

import numpy as np

_MAX_BYTES = 10  # ceil(64/7)


def vb_encode_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode a 1-D array of non-negative ints (< 2**63) to VB bytes, also
    returning the per-value byte length. The lengths let a caller that encodes
    MANY lists in one call (operators/compress.py encodes a whole Arrow batch's
    blocks at once) slice the single output buffer into per-list cells with
    pure offset arithmetic — no per-list numpy call."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.zeros(0, dtype=np.int64)
    if v.size and int(v.max()) >= (1 << 63):
        raise ValueError("vb_encode: values must be < 2**63")
    # bytes needed per value = floor(log2(v))//7 + 1 (1 for v in {0,1})
    bits = np.zeros_like(v, dtype=np.int64)
    nz = v > 0
    bits[nz] = np.floor(np.log2(v[nz].astype(np.float64))).astype(np.int64)
    lengths = bits // 7 + 1
    total = int(lengths.sum())
    offsets = np.cumsum(lengths) - lengths
    buf = np.zeros(total, dtype=np.uint8)
    for b in range(int(lengths.max())):
        mask = lengths > b
        chunk = (v[mask] >> np.uint64(7 * b)).astype(np.uint64) & np.uint64(0x7F)
        cont = (b < lengths[mask] - 1).astype(np.uint8) * np.uint8(0x80)
        buf[offsets[mask] + b] = chunk.astype(np.uint8) | cont
    return buf.tobytes(), lengths


def vb_encode(values: np.ndarray) -> bytes:
    """Encode a 1-D array of non-negative ints (< 2**63) to VB bytes."""
    return vb_encode_with_lengths(values)[0]


def vb_decode(data: bytes) -> np.ndarray:
    """Decode VB bytes back to a uint64 array. Inverse of :func:`vb_encode`."""
    b = np.frombuffer(data, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    n_values = int(is_last.sum())
    # index of the value each byte belongs to
    value_id = np.zeros(b.size, dtype=np.int64)
    value_id[1:] = np.cumsum(is_last)[:-1]
    # byte position within its value
    last_pos = np.nonzero(is_last)[0]
    starts = np.empty(n_values, dtype=np.int64)
    starts[0] = 0
    starts[1:] = last_pos[:-1] + 1
    pos_in_value = np.arange(b.size, dtype=np.int64) - starts[value_id]
    out = np.zeros(n_values, dtype=np.uint64)
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (7 * pos_in_value).astype(np.uint64)
    np.bitwise_or.at(out, value_id, contrib)
    return out


def gaps_encode(sorted_ords: np.ndarray) -> tuple[int, bytes]:
    """(first_ord, VB(gaps)) for a strictly-increasing ordinal array; the first
    element is stored raw (absolute) so blocks decode independently."""
    o = np.asarray(sorted_ords, dtype=np.uint64)
    if o.size == 0:
        return 0, b""
    gaps = np.diff(o)
    return int(o[0]), vb_encode(gaps)


def gaps_decode(first_ord: int, data: bytes, n: int) -> np.ndarray:
    gaps = vb_decode(data)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    out[0] = first_ord
    if n > 1:
        out[1:] = gaps
        np.cumsum(out, out=out)
    return out
