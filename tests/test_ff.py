"""Float-float (double-single) arithmetic: exactness and precision bounds."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from periodicschurdecompositions_jl_tpu.ops import ff


def _rand(shape, rng, scale=1.0):
    return rng.standard_normal(shape) * scale


def _to64(x):
    return np.asarray(x.hi, np.float64) + np.asarray(x.lo, np.float64)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_from_to_f64_roundtrip(rng):
    x = _rand((64,), rng) * np.exp(rng.uniform(-20, 20, 64))
    xf = ff.from_f64(jnp.asarray(x))
    # round-trip error is the ds representation error: ~2^-48 relative
    err = np.abs(_to64(xf) - x) / np.abs(x)
    assert err.max() < 2.0 ** -45


def test_add_sub_precision(rng):
    a = _rand((256,), rng, 1e6)
    b = _rand((256,), rng)
    fa, fb = ff.from_f64(jnp.asarray(a)), ff.from_f64(jnp.asarray(b))
    s = ff.add(fa, fb)
    d = ff.sub(fa, fb)
    ref_s, ref_d = a + b, a - b
    assert (np.abs(_to64(s) - ref_s) / np.abs(ref_s)).max() < 1e-13
    assert (np.abs(_to64(d) - ref_d) / np.abs(ref_d)).max() < 1e-13


def test_add_cancellation(rng):
    # the case the XLA x64 rewriter's weak add fails at (~7e-11): a ~ -b
    a = _rand((256,), rng)
    b = -a * (1 + 1e-7 * rng.standard_normal(256))
    fa, fb = ff.from_f64(jnp.asarray(a)), ff.from_f64(jnp.asarray(b))
    s = _to64(ff.add(fa, fb))
    ref = a + b
    # the ds ADD is exact; the only error is the f64->ds input representation
    # (~2^-48 relative to the INPUTS).  The x64 rewriter's weak add loses
    # ~7e-11 relative-to-inputs here; ds must stay at representation level.
    assert (np.abs(s - ref) / np.abs(a)).max() < 1e-14
    # and against the exactly-representable inputs, the sum is exact
    a32 = _to64(fa)
    b32 = _to64(fb)
    assert np.abs(s - (a32 + b32)).max() < 1e-22


def test_mul_div_sqrt(rng):
    a = np.abs(_rand((256,), rng)) + 0.1
    b = _rand((256,), rng) * 3.0
    fa, fb = ff.from_f64(jnp.asarray(a)), ff.from_f64(jnp.asarray(b))
    m = _to64(ff.mul(fa, fb))
    q = _to64(ff.div(fa, fb))
    r = _to64(ff.sqrt(fa))
    assert (np.abs(m - a * b) / np.abs(a * b)).max() < 1e-13
    assert (np.abs(q - a / b) / np.abs(a / b)).max() < 1e-13
    assert (np.abs(r - np.sqrt(a)) / np.sqrt(a)).max() < 1e-13


def test_div_by_zero_num_guard():
    z = ff.zeros((4,))
    d = ff.div(z, ff.ff(jnp.zeros(4)))
    assert np.all(np.isfinite(_to64(d)))


def test_sqrt_zero():
    r = ff.sqrt(ff.zeros((4,)))
    assert np.all(_to64(r) == 0)


def test_comparisons(rng):
    a = _rand((128,), rng)
    b = a + 1e-12 * np.abs(a)  # differ below f32 resolution: lo decides
    fa, fb = ff.from_f64(jnp.asarray(a)), ff.from_f64(jnp.asarray(b))
    assert bool(jnp.all(ff.lt(fa, fb)))
    assert bool(jnp.all(ff.le(fa, fa)))
    assert not bool(jnp.any(ff.gt(fa, fb)))


def test_sum_dot(rng):
    x = _rand((3, 1000), rng)
    y = _rand((3, 1000), rng)
    fx, fy = ff.from_f64(jnp.asarray(x)), ff.from_f64(jnp.asarray(y))
    s = _to64(ff.sum_(fx, axis=1))
    d = _to64(ff.dot(fx, fy, axis=1))
    ref_s = x.sum(axis=1)
    ref_d = (x * y).sum(axis=1)
    assert np.abs(s - ref_s).max() / np.abs(x).max() < 1e-11
    assert np.abs(d - ref_d).max() / (np.abs(x) * np.abs(y)).sum(1).max() < 1e-11


def test_hypot(rng):
    a = _rand((64,), rng, 1e10)
    b = _rand((64,), rng, 1e-10)
    c = _rand((64,), rng)
    fa, fb, fc = (ff.from_f64(jnp.asarray(v)) for v in (a, b, c))
    h2 = _to64(ff.hypot2(fa, fb))
    h3 = _to64(ff.hypot3(fa, fb, fc))
    assert (np.abs(h2 - np.hypot(a, b)) / np.hypot(a, b)).max() < 1e-12
    ref3 = np.sqrt(a * a + b * b + c * c)
    assert (np.abs(h3 - ref3) / ref3).max() < 1e-12


def test_where_maximum(rng):
    a = _rand((64,), rng)
    b = _rand((64,), rng)
    fa, fb = ff.from_f64(jnp.asarray(a)), ff.from_f64(jnp.asarray(b))
    assert np.allclose(_to64(ff.maximum(fa, fb)), np.maximum(a, b))
    assert np.allclose(_to64(ff.where(a > 0, fa, fb)), np.where(a > 0, a, b))


def test_copysign(rng):
    a = _rand((64,), rng)
    s = _rand((64,), rng)
    fa = ff.from_f64(jnp.asarray(a))
    out = _to64(ff.copysign(fa, jnp.asarray(s)))
    ref = np.where(s >= 0, np.abs(a), -np.abs(a))
    assert np.allclose(out, ref)


def test_mul_pow2_exact(rng):
    a = _rand((64,), rng)
    fa = ff.from_f64(jnp.asarray(a))
    out = _to64(ff.mul_pow2(fa, 0.03125))
    assert np.all(out == _to64(fa) * 0.03125)


def test_recip_div_fast(rng):
    # +-20 decades: the ds lo-component of the RECIPROCAL must stay out of
    # the f32-subnormal range (|1/y| >~ 2^-78), the same domain bound the
    # 3-divide ff.div/recip have (verified identical failure at y=1e30)
    y = rng.standard_normal(500) * 10.0 ** rng.uniform(-20, 20, 500)
    x = rng.standard_normal(500) * 10.0 ** rng.uniform(-10, 10, 500)
    yf = ff.from_f64(jnp.asarray(y))
    xf = ff.from_f64(jnp.asarray(x))
    r = _to64(ff.recip_fast(yf))
    assert (np.abs(r - 1.0 / y) <= 16 * 2.0 ** -48 * np.abs(1.0 / y)).all()
    q = _to64(ff.div_fast(xf, yf))
    assert (np.abs(q - x / y) <= 16 * 2.0 ** -48 * np.abs(x / y)).all()
    # measured worst case ~7 ulp_ds across +-20 decades (vs ~3 for
    # the 3-divide ff.div); NOT generation-grade — generation uses the
    # exact recip/div (round-3 accuracy bisect)
    # zero-numerator exactness (div contract)
    assert _to64(ff.div_fast(ff.zeros(()), ff.ff(jnp.float32(3.0)))) == 0.0
