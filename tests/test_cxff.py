"""Complex float-float layer vs the exact-f64 split layer (CPU oracle)."""
import numpy as np
import jax.numpy as jnp
import pytest

from periodicschurdecompositions_jl_tpu.ops import cxff, cxkern, ff

TOL = 1e-13  # ds unit roundoff 2^-48 with small chains


def _mk(rng, shape=()):
    re = rng.standard_normal(shape)
    im = rng.standard_normal(shape)
    return re, im


def _cxf(re, im):
    return cxff.from_f64_split(jnp.asarray(re), jnp.asarray(im))


def _tonp(x):
    re, im = cxff.to_f64_split(x)
    return np.asarray(re) + 1j * np.asarray(im)


def test_arith(rng):
    ar, ai = _mk(rng, (7,))
    br, bi = _mk(rng, (7,))
    a, b = _cxf(ar, ai), _cxf(br, bi)
    an, bn = ar + 1j * ai, br + 1j * bi
    assert np.abs(_tonp(cxff.mul(a, b)) - an * bn).max() < TOL
    assert np.abs(_tonp(cxff.add(a, b)) - (an + bn)).max() < TOL
    assert np.abs(_tonp(cxff.div(a, b)) - an / bn).max() < TOL
    assert np.abs(np.asarray(ff.to_f64(cxff.cabs(a))) - np.abs(an)).max() < TOL


@pytest.mark.parametrize("case", ["gen", "g0", "f0", "tiny"])
def test_givens(rng, case):
    fr, fi = _mk(rng)
    gr, gi = _mk(rng)
    if case == "g0":
        gr = gi = np.zeros(())
    if case == "f0":
        fr = fi = np.zeros(())
    if case == "tiny":
        fr, fi, gr, gi = (x * 1e-30 for x in (fr, fi, gr, gi))
    f, g = _cxf(fr, fi), _cxf(gr, gi)
    c, s, r = cxff.givens_cxff(f, g)
    cn = np.asarray(ff.to_f64(c))
    sn = _tonp(s)
    rn = _tonp(r)
    fn, gn = fr + 1j * fi, gr + 1j * gi
    # at 1e-30 scale the ds REPRESENTATION floors (lo components reach f32
    # subnormals): rotation parameters stay fully accurate (prescaled
    # generation), but residuals against exact f64 inputs are bounded by
    # the ~1e-38 absolute representation floor, not by TOL * |f, g|
    rtol = 1e-37 if case == "tiny" else TOL * max(abs(fn) + abs(gn), 1.0)
    # rotation annihilates g and preserves norm
    assert abs(cn * fn + sn * gn - rn) < rtol
    assert abs(-np.conj(sn) * fn + cn * gn) < rtol
    assert abs(cn * cn + abs(sn) ** 2 - 1) < TOL
    if case == "g0":
        assert cn == 1.0 and sn == 0.0


def test_slab_updates(rng):
    n = 9
    ar, ai = _mk(rng, (n, n))
    H = _cxf(ar, ai)
    Hn = ar + 1j * ai
    f, g = _cxf(*_mk(rng)), _cxf(*_mk(rng))
    c, s, _ = cxff.givens_cxff(f, g)
    cn = np.asarray(ff.to_f64(c))
    sn = _tonp(s)
    G = np.array([[cn, sn], [-np.conj(sn), cn]])
    # rows
    H2 = cxff.rowsk_cxff(H, 3, cxff.lmat_cxff(c, s), lo=2)
    ref = Hn.copy()
    ref[3:5, 2:] = G @ ref[3:5, 2:]
    assert np.abs(_tonp(H2) - ref).max() < TOL * 10
    # cols
    H3 = cxff.colsk_cxff(H, 4, cxff.rmat_adj_cxff(c, s), hi=6)
    ref = Hn.copy()
    ref[:6, 4:6] = ref[:6, 4:6] @ G.conj().T
    assert np.abs(_tonp(H3) - ref).max() < TOL * 10
    # el/col/row get/set round trips
    v = cxff.getel_cxff(H, 2, 5)
    assert abs(_tonp(v) - Hn[2, 5]) < TOL
    H4 = cxff.setel_cxff(H, 2, 5, _cxf(np.asarray(2.5), np.asarray(-1.0)))
    assert abs(_tonp(cxff.getel_cxff(H4, 2, 5)) - (2.5 - 1j)) < TOL


def test_matches_cxkern_givens(rng):
    """ds and f64 split generators agree to ds roundoff on generic input."""
    for _ in range(20):
        fr, fi = _mk(rng)
        gr, gi = _mk(rng)
        c64, s64, r64 = cxkern.givens_cx(
            cxkern.cx(jnp.asarray(fr), jnp.asarray(fi)),
            cxkern.cx(jnp.asarray(gr), jnp.asarray(gi)))
        c, s, r = cxff.givens_cxff(_cxf(fr, fi), _cxf(gr, gi))
        assert abs(np.asarray(ff.to_f64(c)) - np.asarray(c64)) < TOL
        assert abs(_tonp(s) - (np.asarray(s64.re) +
                               1j * np.asarray(s64.im))) < TOL
        assert abs(_tonp(r) - (np.asarray(r64.re) +
                               1j * np.asarray(r64.im))) < TOL
