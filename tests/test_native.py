"""Native batch-converter tests: build, correctness vs NumPy, f16 edge cases."""

import numpy as np
import pytest

from myimagecaptioningmodel_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++?)")
    return lib


def test_f16_convert_matches_numpy(lib):
    rng = np.random.RandomState(0)
    x = (rng.randn(5, 3, 8, 8) * 2).astype(np.float16)
    out = native.convert_chw_to_nhwc_f32(x, nthreads=3)
    expect = x.astype(np.float32).transpose(0, 2, 3, 1)
    assert out.shape == (5, 8, 8, 3) and out.dtype == np.float32
    np.testing.assert_array_equal(out, expect)


def test_f16_special_values(lib):
    # subnormals, zeros, inf, nan, extremes
    vals = np.array(
        [0.0, -0.0, 6e-8, -6e-8, 1e-7, 65504.0, -65504.0, np.inf, -np.inf, np.nan,
         1.0, -2.5], dtype=np.float16,
    )
    x = np.zeros((1, 3, 2, 2), np.float16).reshape(-1)
    x[: vals.size] = vals
    x = x.reshape(1, 3, 2, 2)
    out = native.convert_chw_to_nhwc_f32(x)
    expect = x.astype(np.float32).transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(np.isnan(out), np.isnan(expect))
    m = ~np.isnan(expect)
    np.testing.assert_array_equal(out[m], expect[m])


def test_f32_convert_matches_numpy(lib):
    rng = np.random.RandomState(1)
    x = rng.randn(4, 3, 5, 7).astype(np.float32)
    out = native.convert_chw_to_nhwc_f32(x, nthreads=2)
    np.testing.assert_array_equal(out, x.transpose(0, 2, 3, 1))


def test_single_threaded_path(lib):
    x = np.arange(2 * 3 * 4 * 4, dtype=np.float16).reshape(2, 3, 4, 4)
    out = native.convert_chw_to_nhwc_f32(x, nthreads=1)
    np.testing.assert_array_equal(out, x.astype(np.float32).transpose(0, 2, 3, 1))
