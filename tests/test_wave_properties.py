"""Pure-python property tests for wave 5-11 primitives (no Spark
session — these check the MATH the operators are built on, with
hypothesis driving the input space)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st


def interleave16(qx: int, qy: int) -> int:
    """Reference Morton interleave matching relational5._interleave."""
    z = 0
    for i in range(8):
        z |= ((qx >> i) & 1) << (2 * i)
        z |= ((qy >> i) & 1) << (2 * i + 1)
    return z


@given(st.integers(0, 255), st.integers(0, 255))
def test_morton_bijective(qx, qy):
    """Every (qx, qy) has a unique z; de-interleaving recovers it."""
    z = interleave16(qx, qy)
    rx = sum(((z >> (2 * i)) & 1) << i for i in range(8))
    ry = sum(((z >> (2 * i + 1)) & 1) << i for i in range(8))
    assert (rx, ry) == (qx, qy)
    assert 0 <= z < 65536


@given(st.integers(0, 255), st.integers(0, 255))
def test_morton_prefix_bounds_rectangle(qx, qy):
    """A z-prefix bucket (z >> 10) bounds both coordinates to a 32-wide
    range — the data-skipping property snk_zorder's graded frame
    demonstrates: sharing a 6-bit z prefix pins the top 3 bits of BOTH
    dims."""
    z = interleave16(qx, qy)
    bucket = z >> 10
    # top 3 bits of each dim are a function of the bucket alone
    assert (qx >> 5) == sum(((bucket >> (2 * i)) & 1) << i for i in range(3))
    assert (qy >> 5) == sum(((bucket >> (2 * i + 1)) & 1) << i for i in range(3))


@given(
    st.integers(1, 2**32 - 1),
    st.integers(1, 10_000),
    st.integers(1, 10_000),
)
def test_aes_key_monotone_in_weight(h, w1, w2):
    """The A-ES competition key ln(u)/w is monotone increasing in the
    weight for a fixed draw: a heavier doc never ranks below a lighter
    doc with the same uniform (the property that makes top-k by key a
    WEIGHTED sample)."""
    u = (h + 1.0) / 4294967297.0
    k1 = math.floor(math.log(u) * 1e9 + 0.5) / float(w1)
    k2 = math.floor(math.log(u) * 1e9 + 0.5) / float(w2)
    if w1 > w2:
        assert k1 >= k2
    elif w1 < w2:
        assert k1 <= k2


@given(st.integers(0, 4095))
def test_bloom_word_bit_roundtrip(bucket):
    """The 4096-bit membership filter's (word, bit) decomposition
    covers every bucket exactly once and the bit test recovers
    membership."""
    word, bit = bucket // 64, bucket % 64
    mask = 1 << bit
    assert 0 <= word < 64 and 0 <= bit < 64
    assert (mask >> bit) & 1 == 1
    # a different bucket in the same word never aliases
    other = (bucket + 1) % 4096
    if other // 64 == word:
        assert (mask >> (other % 64)) & 1 == 0


@settings(max_examples=50)
@given(
    st.lists(st.integers(0, 10**8), min_size=2, max_size=50),
    st.integers(2, 32),
)
def test_histogram_bucket_bounds(values, n_buckets):
    """The integer-division bucket formula maps every value into
    [0, n_buckets-1], min(values) to bucket 0, and max(values) to the
    last bucket (when distinct)."""
    lo, hi = min(values), max(values)
    buckets = [
        min((v - lo) * n_buckets // (hi - lo + 1), n_buckets - 1)
        for v in values
    ]
    assert all(0 <= b < n_buckets for b in buckets)
    assert buckets[values.index(lo)] == 0
    # max lands in the last bucket ONLY when the integer range can
    # actually fill all buckets (range >= n_buckets); a 2-value range
    # under 3 buckets tops out at bucket (hi-lo)*k // (hi-lo+1) —
    # hypothesis found the counterexample (values=[0,1], k=3) in r8.
    if hi - lo + 1 >= n_buckets:
        assert buckets[values.index(hi)] == n_buckets - 1
    elif hi > lo:
        assert buckets[values.index(hi)] == (
            (hi - lo) * n_buckets // (hi - lo + 1)
        )


@given(st.integers(0, 10**7))
def test_sized_bloom_bits_headroom_and_clamps(n):
    """Bitmap sizing (ADVICE.md r7): power-of-two, >=8x the build
    cardinality until the 2^22 clamp, never below the 4096 floor —
    so the expected pass-through rate n/bits stays <=1/8 for any
    build side under ~0.5M keys and degrades gracefully past it."""
    from event_stream_checkout_spark.operators.lakehouse import (
        _BLOOM_BITS_MAX,
        _BLOOM_BITS_MIN,
        sized_bloom_bits,
    )

    bits = sized_bloom_bits(n)
    assert _BLOOM_BITS_MIN <= bits <= _BLOOM_BITS_MAX
    assert bits & (bits - 1) == 0  # power of two
    if bits < _BLOOM_BITS_MAX:
        assert bits >= 8 * n
    # monotone in n
    assert sized_bloom_bits(n + 1) >= bits
