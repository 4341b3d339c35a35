"""Pure-Python XXH64 matching Spark's ``xxhash64`` exactly — including
Spark's multi-argument seed chaining and per-type (int/long/bytes)
dispatch.  ORACLE-SIDE ONLY: golden.py uses this to re-derive the
minhash / simhash / LSH tables independently of the JVM, so even the
hash-seeded dedup operators get a full driver oracle.

Validated bit-for-bit against ``F.xxhash64`` (tests/test_triples.py::
test_xxh64_matches_spark).  XXH64 is a public algorithm (Yann Collet);
constants from the spec.
"""

from __future__ import annotations

M = (1 << 64) - 1
P1, P2, P3, P4, P5 = (
    0x9E3779B185EBCA87,
    0xC2B2AE3D27D4EB4F,
    0x165667B19E3779F9,
    0x85EBCA77C2B2AE63,
    0x27D4EB2F165667C5,
)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def xxh64_bytes(data: bytes, seed: int) -> int:
    seed &= M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed
        v4 = (seed - P1) & M
        while i + 32 <= n:
            v1 = (_rotl((v1 + int.from_bytes(data[i : i + 8], "little") * P2) & M, 31) * P1) & M
            v2 = (_rotl((v2 + int.from_bytes(data[i + 8 : i + 16], "little") * P2) & M, 31) * P1) & M
            v3 = (_rotl((v3 + int.from_bytes(data[i + 16 : i + 24], "little") * P2) & M, 31) * P1) & M
            v4 = (_rotl((v4 + int.from_bytes(data[i + 24 : i + 32], "little") * P2) & M, 31) * P1) & M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * P2) & M, 31) * P1) & M
            h = (h * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 8 <= n:
        h ^= (_rotl((int.from_bytes(data[i : i + 8], "little") * P2) & M, 31) * P1) & M
        h = (_rotl(h, 27) * P1 + P4) & M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * P1) & M
        h = (_rotl(h, 23) * P2 + P3) & M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M
        h = (_rotl(h, 11) * P1) & M
        i += 1
    return _fmix(h)


def xxh64_long(v: int, seed: int) -> int:
    seed &= M
    v &= M
    h = (seed + P5 + 8) & M
    h ^= (_rotl((v * P2) & M, 31) * P1) & M
    h = (_rotl(h, 27) * P1 + P4) & M
    return _fmix(h)


def xxh64_int(v: int, seed: int) -> int:
    seed &= M
    h = (seed + P5 + 4) & M
    h ^= ((v & 0xFFFFFFFF) * P1) & M
    h = (_rotl(h, 23) * P2 + P3) & M
    return _fmix(h)


def to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64(*vals, seed: int = 42) -> int:
    """Spark F.xxhash64 semantics: fold the inputs left-to-right, each
    value hashed with the running result as seed.  str -> UTF-8 bytes;
    ('int', v) / ('long', v) mimic IntegerType / LongType columns."""
    h = seed
    for v in vals:
        if isinstance(v, bytes):
            h = xxh64_bytes(v, h)
        elif isinstance(v, str):
            h = xxh64_bytes(v.encode("utf-8"), h)
        elif isinstance(v, tuple) and v[0] == "int":
            h = xxh64_int(v[1], h)
        elif isinstance(v, tuple) and v[0] == "long":
            h = xxh64_long(v[1], h)
        else:
            raise TypeError(f"unsupported xxhash64 operand: {v!r}")
    return to_signed(h)
