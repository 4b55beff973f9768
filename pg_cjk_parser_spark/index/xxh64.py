"""Pure-Python XXH64 matching Spark's ``xxhash64`` expression.

Spark's ``F.xxhash64(string_col)`` is XXH64 over the UTF-8 bytes with
seed 42, returned as a signed int64.  Implementing it driver-side (the
public XXH64 spec) lets query routing compute term buckets without a
Spark job; a test asserts bit-identity against the Spark expression.
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, x: int) -> int:
    acc = (acc + x * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            x1, x2, x3, x4 = struct.unpack_from("<QQQQ", data, i)
            v1 = _round(v1, x1)
            v2 = _round(v2, x2)
            v3 = _round(v3, x3)
            v4 = _round(v4, x4)
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        (k1,) = struct.unpack_from("<Q", data, i)
        h ^= _round(0, k1)
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h ^= (k * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def spark_xxhash64_str(s: str) -> int:
    """Signed int64, identical to Spark's xxhash64(string)."""
    h = xxh64(s.encode("utf-8"), 42)
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64_long(v: int) -> int:
    """Signed int64, identical to Spark's xxhash64(bigint)."""
    h = xxh64(struct.pack("<q", v), 42)
    return h - (1 << 64) if h >= (1 << 63) else h


def pmod(x: int, m: int) -> int:
    return x % m if x >= 0 else (x % m + m) % m


def spark_mmh3_int(v: int, seed: int = 42) -> int:
    """Spark's ``Murmur3Hash`` of one IntegerType value (hashInt,
    seed 42) - the hash behind ``HashPartitioning``, so the driver can
    predict which shuffle partition an int key lands in.  Bit-tested
    against ``F.hash``."""
    M = 0xFFFFFFFF
    c1, c2 = 0xCC9E2D51, 0x1B873593
    k = (v & M) * c1 & M
    k = ((k << 15) | (k >> 17)) & M
    k = k * c2 & M
    h = (seed ^ k) & M
    h = ((h << 13) | (h >> 19)) & M
    h = (h * 5 + 0xE6546B64) & M
    h ^= 4  # length in bytes
    h ^= h >> 16
    h = h * 0x85EBCA6B & M
    h ^= h >> 13
    h = h * 0xC2B2AE35 & M
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


import functools


@functools.lru_cache(maxsize=64)
def salt_partition_count(num_salts: int) -> int:
    """Smallest shuffle-partition count >= ``num_salts`` under which
    Spark's hash partitioning sends every salt id 0..num_salts-1 to
    its OWN partition.  ``repartition(num_salts, "salt")`` routinely
    collides (measured: salts {0,1,3} of 4 all hashed to one
    partition, so one scoring task did 75% of the query) - the
    classic few-distinct-keys repartition skew.  Empty partitions
    cost a no-op task each, so the search is capped."""
    hs = [spark_mmh3_int(s) for s in range(num_salts)]
    for p in range(num_salts, 64 * num_salts + 1):
        if len({h % p if h % p >= 0 else h % p + p for h in hs}) == num_salts:
            return p
    return num_salts


def spark_xxhash64_long_vec(v):
    """Vectorized :func:`spark_xxhash64_long` over an int64 numpy
    array (one fixed 8-byte lane: the XXH64 short path specializes to
    a handful of uint64 multiply/rotate/xor steps, which numpy wraps
    mod 2^64 natively).  Bit-identical to the scalar (tested)."""
    import numpy as np

    P1 = np.uint64(_P1)
    P2 = np.uint64(_P2)
    P3 = np.uint64(_P3)
    P4 = np.uint64(_P4)

    def rotl(x, r):
        return (x << np.uint64(r)) | (x >> np.uint64(64 - r))

    x = np.ascontiguousarray(v, dtype=np.int64).view(np.uint64)
    with np.errstate(over="ignore"):
        h = np.uint64((42 + _P5 + 8) & _M)
        k1 = rotl(x * P2, 31) * P1
        h = h ^ k1
        h = rotl(h, 27) * P1 + P4
        h ^= h >> np.uint64(33)
        h = h * P2
        h ^= h >> np.uint64(29)
        h = h * P3
        h ^= h >> np.uint64(32)
    return h.view(np.int64)
