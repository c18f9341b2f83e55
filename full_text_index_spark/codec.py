"""Delta-gap + varbyte posting compression (vectorized numpy).

The distributed counterpart of the reference's compressed index payloads:
gamma-coded Ψ-differences with a block-sampled directory
(reference: csa-sada/comparray4.c:251-455) and the bucketed, partially
aggregated FM payloads (reference: fm/fm_build.c:580-702).  DocID gaps play
the role of Ψ-deltas; varbyte replaces gamma codes (byte-aligned → SIMD-able
and Arrow-friendly); the per-block directory (§ block metadata in build.py)
replaces the sampled ``R[]`` directory and superbucket occ headers.

Format: each value is emitted as little-endian 7-bit groups; the high bit
(0x80) is set on every byte except the last of a value.  All functions are
fully vectorized — no per-value Python loops — because they run inside
Arrow-batched UDFs on the hot path (the "no per-row Python" mandate).
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a 1-D array of non-negative ints (< 2**63) to varbyte bytes."""
    v = np.asarray(values)
    if len(v) == 0:
        return b""
    if v.min() < 0:
        raise ValueError("varbyte_encode: negative value")
    v = v.astype(np.uint64, copy=False)
    # bytes needed per value: 1 + #thresholds crossed (7-bit groups)
    nb = np.ones(len(v), np.int64)
    for k in range(1, 10):
        nb += (v >= (_U64(1) << _U64(7 * k))).astype(np.int64)
    total = int(nb.sum())
    ends = np.cumsum(nb)
    starts = ends - nb
    within = np.arange(total, dtype=np.int64) - np.repeat(starts, nb)
    vals_rep = np.repeat(v, nb)
    out = ((vals_rep >> (7 * within).astype(np.uint64)) & _U64(0x7F)).astype(np.uint8)
    cont = within < (np.repeat(nb, nb) - 1)
    out[cont] |= np.uint8(0x80)
    return out.tobytes()


def varbyte_decode(buf: bytes | memoryview | np.ndarray) -> np.ndarray:
    """Decode varbyte bytes to an int64 array."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if len(b) == 0:
        return np.empty(0, dtype=np.int64)
    if (b[-1] & 0x80) != 0:
        # a valid stream always ends on a terminator byte; a mis-sliced or
        # truncated blob otherwise dies below with a confusing shape/index
        # error — fail loudly as the data corruption it is
        raise ValueError(
            "varbyte_decode: truncated buffer (last byte has its "
            "continuation bit set)"
        )
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.empty(len(ends), dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    within = np.arange(len(b), dtype=np.int64) - np.repeat(starts, lengths)
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (7 * within).astype(np.uint64)
    return np.add.reduceat(contrib, starts).astype(np.int64)


def encode_gaps(doc_ids: np.ndarray) -> bytes:
    """Delta-gap + varbyte a strictly-increasing non-negative docID array.

    gap[0] = doc[0] + 1, gap[i] = doc[i] - doc[i-1]; all gaps are >= 1, so a
    zero gap can never occur and block-local decode only needs the previous
    block's last docID (or -1 at the start of the list).
    """
    d = np.asarray(doc_ids, dtype=np.int64)
    if len(d) == 0:
        return b""
    gaps = np.diff(d, prepend=np.int64(-1))
    if gaps.min() <= 0:
        raise ValueError("encode_gaps: doc_ids must be strictly increasing, >= 0")
    return varbyte_encode(gaps)


def decode_gaps(buf, prev_last_doc: int = -1) -> np.ndarray:
    """Inverse of encode_gaps for any byte-aligned block slice.

    ``prev_last_doc`` is the last docID of the preceding block (-1 at list
    start) — the skip-directory entry point, playing the role of the
    reference's sampled SA positions (ssa/SSA.cpp:187-207).
    """
    gaps = varbyte_decode(buf)
    if len(gaps) == 0:
        return gaps
    out = np.cumsum(gaps)
    out += prev_last_doc
    return out
