"""Golden-vector tests for the pure-Python xxhash64 twin.

Expected values were produced by Spark 4.1.2's `F.xxhash64` itself
(single string arg with the default seed 42, and the (string, int-literal)
two-arg chaining used by ops/dedup.minhash_signature), so these tests pin
the driver-side oracle hashing to the engine under test without needing a
SparkSession.
"""

import pytest

from ebel_spark.oracle_xxh import (spark_xxhash64_str,
                                   spark_xxhash64_str_int, xxh64)

# (text, F.xxhash64(text), F.xxhash64(text, lit(7)))
GOLDEN = [
    ("", -7444071767201028348, -1372193571060509073),
    ("a", -8582455328737087284, -3997527857389255009),
    ("hello world", 7620854247404556961, 5926334230286959777),
    ("the quick brown fox jumps over the lazy dog" * 3,
     -8132148077751705370, 7257871619615068864),
    ("shingle one two three", 7342052346339327921, -3344872903515008106),
]


@pytest.mark.parametrize("text,h42,h_chain7", GOLDEN)
def test_spark_xxhash64_parity(text, h42, h_chain7):
    assert spark_xxhash64_str(text) == h42
    assert spark_xxhash64_str_int(text, 7) == h_chain7


def test_block_boundaries():
    """Exercise every length regime of the algorithm (tail-only, 4-byte,
    8-byte, 32-byte stripes) — the function must not crash or collide
    trivially, and stay deterministic."""
    seen = set()
    for n in [0, 1, 3, 4, 5, 7, 8, 9, 15, 16, 31, 32, 33, 63, 64, 100]:
        h = xxh64(b"x" * n, 42)
        assert h == xxh64(b"x" * n, 42)
        assert 0 <= h < (1 << 64)
        seen.add(h)
    assert len(seen) == 16  # all lengths hash differently


def test_reference_vector_xxh64():
    """Official XXH64 test vector: empty input, seed 0."""
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999
