import numpy as np

from pg_cjk_parser_spark.index.codec import (
    decode_positions,
    decode_varints,
    delta_decode,
    delta_encode,
    encode_positions,
    encode_varints,
)


def test_varint_roundtrip():
    rng = np.random.default_rng(42)
    for size in (0, 1, 7, 128, 5000):
        a = rng.integers(0, 1 << 62, size=size, dtype=np.uint64)
        a[: size // 3] = rng.integers(0, 128, size=size // 3)  # small values
        got = decode_varints(encode_varints(a))
        assert np.array_equal(got, a)


def test_varint_extremes():
    a = np.array([0, 1, 127, 128, (1 << 64) - 1, 1 << 63], dtype=np.uint64)
    assert np.array_equal(decode_varints(encode_varints(a)), a)


def test_delta_roundtrip_signed_docids():
    # xxhash64 docids are signed; sorted-signed order wraps in uint64
    d = np.sort(np.array([-(1 << 62), -5, -1, 0, 3, 1 << 61], dtype=np.int64))
    got = delta_decode(delta_encode(d)).view(np.int64)
    assert np.array_equal(got, d)


def test_positions_roundtrip():
    lists = [[1, 5, 9], [], [2], [100, 200, 300, 16383]]
    out = decode_positions(encode_positions(lists), len(lists))
    assert out == lists
