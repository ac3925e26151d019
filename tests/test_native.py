"""Native C++ packlib vs the numpy reference implementations."""

import numpy as np
import pytest

from qllm_tpu import native
from qllm_tpu.quant.layouts import (
    _pack_bitstream,
    _pack_fields,
    _unpack_bitstream,
    _unpack_fields,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native packlib could not be built"
)


@pytest.mark.parametrize("bits", [2, 4, 8])
def test_native_fields_matches_numpy(bits):
    rng = np.random.default_rng(0)
    K, N = 256, 96
    q = rng.integers(0, 2**bits, (K, N), dtype=np.int32)
    np.testing.assert_array_equal(
        native.pack_fields_rows(q, bits), _pack_fields(q, bits, axis=0)
    )
    p = _pack_fields(q, bits, axis=0)
    np.testing.assert_array_equal(
        native.unpack_fields_rows(p, bits, K),
        _unpack_fields(p, bits, axis=0, size=K),
    )


@pytest.mark.parametrize("bits", [3, 5, 6, 7])
def test_native_bitstream_matches_numpy(bits):
    rng = np.random.default_rng(1)
    K, N = 256, 64
    q = rng.integers(0, 2**bits, (K, N), dtype=np.int32)
    np.testing.assert_array_equal(
        native.pack_bitstream_rows(q, bits), _pack_bitstream(q, bits)
    )
    p = _pack_bitstream(q, bits)
    np.testing.assert_array_equal(
        native.unpack_bitstream_rows(p, bits, K), _unpack_bitstream(p, bits, K)
    )


def test_native_large_roundtrip():
    rng = np.random.default_rng(2)
    K, N = 4096, 1024
    q = rng.integers(0, 16, (K, N), dtype=np.int32)
    p = native.pack_fields_rows(q, 4)
    out = native.unpack_fields_rows(p, 4, K)
    np.testing.assert_array_equal(out, q)
