"""Bit-exactness of the integer software-float lambda chain
(ops/softfloat.py) against host numpy IEEE arithmetic."""
import numpy as np
import pytest

from mozjpeg_tpu.ops import softfloat
from mozjpeg_tpu.codec.trellis import lambda_from_norm


def _rand_norm_sums(n, rng):
    """f32 norm sums shaped like real trellis inputs: sums of 63 squared
    int coefficients, plus adversarial values near rounding boundaries."""
    mags = rng.uniform(0, 30, n)
    vals = (2.0 ** mags * rng.uniform(0.5, 1.0, n)).astype(np.float32)
    vals[rng.random(n) < 0.02] = 0.0
    # exact small integers (flat blocks)
    ints = rng.integers(0, 4096, n // 4)
    vals[: n // 4] = ints.astype(np.float32)
    return vals


def test_f32_div_const_exact():
    rng = np.random.default_rng(42)
    a = _rand_norm_sums(200_000, rng)
    got = np.asarray(softfloat.f32_div_const(a, 63.0))
    want = a / np.float32(63.0)
    np.testing.assert_array_equal(got.view(np.uint32),
                                  want.view(np.uint32))


@pytest.mark.parametrize("s1,s2", [
    (14.75, 16.5),      # mozjpeg default lambda scales (jcparam.c:505-518)
    (16.5, 13.0),
    (12.0, 20.0),
    (9.0, 0.0),         # constant-lambda branch
    (14.75, 16.0),
])
def test_lambda_from_norm_exact(s1, s2):
    rng = np.random.default_rng(7)
    norm_sum = _rand_norm_sums(300_000, rng)
    got = np.asarray(softfloat.lambda_from_norm_t(norm_sum, s1, s2))
    want = lambda_from_norm(norm_sum, s1, s2)
    np.testing.assert_array_equal(got.view(np.uint32),
                                  want.view(np.uint32))


def test_lambda_boundary_hunt():
    """Adversarial: norm sums engineered so the f64 quotient lands close
    to f32 rounding boundaries (double-rounding hazard)."""
    s1, s2 = 14.75, 16.5
    rng = np.random.default_rng(3)
    # invert: pick target f32 lambdas at ulp boundaries, solve for norm
    lam_t = (2.0 ** rng.uniform(-16, 2, 100_000))
    norm = 2.0 ** np.float64(s1) / lam_t - 2.0 ** np.float64(s2)
    norm = np.maximum(norm, 0) * 63.0
    vals = norm.astype(np.float32)
    # sprinkle +-few-ulp perturbations
    u = vals.view(np.uint32)
    vals = np.concatenate([
        vals,
        (u + rng.integers(1, 3, len(u)).astype(np.uint32)).view(np.float32),
        (u - rng.integers(1, 3, len(u)).astype(np.uint32)).view(np.float32),
    ])
    vals = vals[np.isfinite(vals) & (vals >= 0)]
    got = np.asarray(softfloat.lambda_from_norm_t(vals, s1, s2))
    want = lambda_from_norm(vals, s1, s2)
    np.testing.assert_array_equal(got.view(np.uint32),
                                  want.view(np.uint32))
