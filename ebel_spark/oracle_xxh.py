"""Pure-Python twin of Spark's `xxhash64` expression.

Spark's XxHash64 hashes a STRING column as XXH64 over its UTF-8 bytes with
seed 42, and folds additional arguments by re-hashing with the running hash
as the seed; an INT argument goes through the 4-byte block path.  This
module reimplements exactly that (verified bit-for-bit against
`F.xxhash64` for single strings, int-chained tuples, and all string
lengths crossing the 4/8/32-byte block boundaries) so driver-side pandas
code can reproduce MinHash/SimHash/fingerprint values for DuckDB oracles.
"""

from __future__ import annotations

MASK = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & MASK
    h ^= h >> 29
    h = (h * P3) & MASK
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of a byte string (unsigned 64-bit result)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK
        v2 = (seed + P2) & MASK
        v3 = seed & MASK
        v4 = (seed - P1) & MASK
        while i <= n - 32:
            vs = [v1, v2, v3, v4]
            for j in range(4):
                lane = int.from_bytes(data[i + 8 * j:i + 8 * j + 8], "little")
                v = (vs[j] + lane * P2) & MASK
                vs[j] = (_rotl(v, 31) * P1) & MASK
            v1, v2, v3, v4 = vs
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & MASK
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * P2) & MASK, 31) * P1) & MASK
            h = ((h * P1) + P4) & MASK
    else:
        h = (seed + P5) & MASK
    h = (h + n) & MASK
    while i <= n - 8:
        k = int.from_bytes(data[i:i + 8], "little")
        k = (_rotl((k * P2) & MASK, 31) * P1) & MASK
        h ^= k
        h = ((_rotl(h, 27) * P1) + P4) & MASK
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i:i + 4], "little") * P1) & MASK
        h = ((_rotl(h, 23) * P2) + P3) & MASK
        i += 4
    while i < n:
        h ^= (data[i] * P5) & MASK
        h = (_rotl(h, 11) * P1) & MASK
        i += 1
    return _fmix(h)


def xxh64_int4(v: int, seed: int) -> int:
    """Spark's 4-byte (IntegerType) block path — used when an int literal
    is chained as a second xxhash64 argument."""
    h = (seed + P5 + 4) & MASK
    h ^= ((v & 0xFFFFFFFF) * P1) & MASK
    h = ((_rotl(h, 23) * P2) + P3) & MASK
    return _fmix(h)


def signed(x: int) -> int:
    """Unsigned 64-bit -> Spark's signed LongType value."""
    return x - (1 << 64) if x >= (1 << 63) else x


def spark_xxhash64_str(s: str, seed: int = 42) -> int:
    """Signed value of `F.xxhash64(string_col)`."""
    return signed(xxh64(s.encode("utf-8"), seed))


def spark_xxhash64_str_int(s: str, i: int) -> int:
    """Signed value of `F.xxhash64(string_col, F.lit(i))` (int literal)."""
    return signed(xxh64_int4(i, xxh64(s.encode("utf-8"), 42)))
