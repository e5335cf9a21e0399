"""Pallas TPU kernels: the rg core's opening/closing rotation ladders.

`ops/pqz_real_ff.act_sweep` brackets its fused Pallas chase with two
XLA-glue ds ladders — the double-shift OPENING (two rotations threaded
through all p factors, reference src/rgeneralized.jl:890-943) and the
CLOSING rotation chain (chain510, reference :1015-1048, :510-540).
Together they are ~5.8k optimization-barrier layers traced into the
while body and executed EVERY sweep iteration: the dominant share of the
rg core's ~20 ms/iteration fixed cost (round-5 jaxpr census; the sweep
kernels themselves cost ~1 ms/call, probe_cxrg_kernels).  These two
kernels run each ladder as ONE Mosaic launch.

Same design rules as ops/pallas_deflate.py (kernel D):
* identical ds op sequence to the glue (ffkern.givens_ff + the
  ffslab rowsk/colsk/zup orders) — outputs bitwise-equal
  (tests/test_pallas_rgopen.py);
* factor ladders statically unrolled with the static signature S (rg
  cycles are short; the fits() gate keeps the state under the bisected
  ~67 MiB Mosaic VMEM ceiling and p*factors bounded);
* row slabs via the 8-aligned 16-row rolled blocks; column updates as
  full-factor masked lane extract/forces;
* Z stored PLAIN in the rg core (column updates), so Z rides whole.
"""
from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ff
from .ff import FF
from .ffkern import givens_ff
from .pallas_sweep import (_lane_extract, _lane_force, _lane_iota,
                           _read_rows, _write_rows)

if sys.getrecursionlimit() < 20000:
    sys.setrecursionlimit(20000)


def _mm2_rows(M: FF, rows: FF) -> FF:
    outs = []
    for r in range(2):
        acc = ff.mul(FF(M.hi[r, 0], M.lo[r, 0]),
                     FF(rows.hi[0], rows.lo[0]))
        acc = ff.add(acc, ff.mul(FF(M.hi[r, 1], M.lo[r, 1]),
                                 FF(rows.hi[1], rows.lo[1])))
        outs.append(acc)
    return ff.stack(outs, 0)


def _lmat(c: FF, s: FF) -> FF:
    return ff.stack([ff.stack([c, s], 0),
                     ff.stack([ff.neg(s), c], 0)], 0)


def _rmat_adj(c: FF, s: FF) -> FF:
    return ff.stack([ff.stack([c, ff.neg(s)], 0),
                     ff.stack([s, c], 0)], 0)


def _make_rg_kernel(p: int, N: int, S, want_z: bool, mode: str):

    def kernel(iscal, fscal, *refs):
        nin = 4 if want_z else 2
        oH_hi, oH_lo = refs[nin], refs[nin + 1]
        if want_z:
            oZ_hi, oZ_lo = refs[nin + 2], refs[nin + 3]
        for k in range(nin):
            refs[nin + k][...] = refs[k][...]

        j = iscal[0]
        ilast = iscal[1]
        rhi = iscal[2]   # row-transform column bound (N = unbounded)
        clo = iscal[3]   # col-transform row floor (-1 = unbounded)
        c1 = FF(fscal[0], fscal[1])
        s1 = FF(fscal[2], fscal[3])
        c2 = FF(fscal[4], fscal[5])
        s2 = FF(fscal[6], fscal[7])

        zero = ff.zeros(())
        sub_i = _lane_iota((N, N), 0)

        def kel(f, r, c):
            rows = _read_rows(oH_hi, oH_lo, f, r, 1)
            v = _lane_extract(rows, c)
            return FF(v.hi[0], v.lo[0])

        def krows(f, k0, M2: FF, lo=None, hi=None):
            rows = _read_rows(oH_hi, oH_lo, f, k0, 2)
            new = _mm2_rows(M2, rows)
            if lo is not None or hi is not None:
                cmask = jnp.ones(rows.hi.shape, bool)
                lane = _lane_iota(rows.hi.shape)
                if lo is not None:
                    cmask &= lane >= lo
                if hi is not None:
                    cmask &= lane < hi
                new = ff.where(cmask, new, rows)
            _write_rows(oH_hi, oH_lo, f, k0, new)

        def kcols(f, j0, M2: FF, lo=None, hi=None, zrefs=False):
            hr, lr = (oZ_hi, oZ_lo) if zrefs else (oH_hi, oH_lo)
            Mv = FF(hr[f], lr[f])
            c0 = _lane_extract(Mv, j0)
            c1_ = _lane_extract(Mv, j0 + 1)
            outs = []
            for c in range(2):
                acc = ff.mul(c0, FF(M2.hi[0, c], M2.lo[0, c]))
                acc = ff.add(acc, ff.mul(c1_, FF(M2.hi[1, c],
                                                 M2.lo[1, c])))
                outs.append(acc)
            if lo is not None or hi is not None:
                rmask = jnp.ones((N,), bool)
                rows_i = sub_i[:, 0]
                if lo is not None:
                    rmask &= rows_i >= lo
                if hi is not None:
                    rmask &= rows_i < hi
                outs = [ff.where(rmask, o, old)
                        for o, old in zip(outs, (c0, c1_))]
            act_all = jnp.asarray(True)
            nv = _lane_force(Mv, j0, outs[0], act_all)
            nv = _lane_force(nv, j0 + 1, outs[1], act_all)
            hr[f] = nv.hi
            lr[f] = nv.lo

        def ksetel(f, r, c, val: FF):
            rows = _read_rows(oH_hi, oH_lo, f, r, 1)
            v1 = FF(jnp.reshape(val.hi, (1,)), jnp.reshape(val.lo, (1,)))
            rows = _lane_force(rows, c, v1, jnp.asarray(True))
            _write_rows(oH_hi, oH_lo, f, r, rows)

        def zup(l, k0, M2: FF):
            # Z stored PLAIN: columns k0:k0+2 <- cols @ M2, full height
            if want_z:
                kcols(l, k0, M2, zrefs=True)

        def lobound(v):
            return jnp.where(v < 0, jnp.int32(-1), v)

        clo_b = lobound(clo)

        if mode == "open":
            # ---- opening (reference :890-943): two rotations threaded
            # through the factor ring ---------------------------------
            kcols(0, j + 1, _rmat_adj(c2, s2), lo=clo_b, hi=ilast + 1)
            kcols(0, j, _rmat_adj(c1, s1), lo=clo_b, hi=ilast + 1)
            zup(1 % p, j + 1, _rmat_adj(c2, s2))
            zup(1 % p, j, _rmat_adj(c1, s1))
            for l in range(1, p):
                if S[l]:
                    krows(l, j + 1, _lmat(c2, s2), lo=j, hi=rhi)
                    c2, s2, r = givens_ff(kel(l, j + 2, j + 2),
                                          ff.neg(kel(l, j + 2, j + 1)))
                    ksetel(l, j + 2, j + 2, r)
                    ksetel(l, j + 2, j + 1, zero)
                    kcols(l, j + 1, _rmat_adj(c2, s2), lo=clo_b,
                          hi=j + 2)
                    krows(l, j, _lmat(c1, s1), lo=j, hi=rhi)
                    c1, s1, r = givens_ff(kel(l, j + 1, j + 1),
                                          ff.neg(kel(l, j + 1, j)))
                    ksetel(l, j + 1, j + 1, r)
                    ksetel(l, j + 1, j, zero)
                    kcols(l, j, _rmat_adj(c1, s1), lo=clo_b, hi=j + 1)
                else:
                    kcols(l, j + 1, _rmat_adj(c2, s2), lo=clo_b,
                          hi=j + 3)
                    c2, s2, r = givens_ff(kel(l, j + 1, j + 1),
                                          kel(l, j + 2, j + 1))
                    ksetel(l, j + 1, j + 1, r)
                    ksetel(l, j + 2, j + 1, zero)
                    krows(l, j + 1, _lmat(c2, s2), lo=j + 2, hi=rhi)
                    kcols(l, j, _rmat_adj(c1, s1), lo=clo_b, hi=j + 2)
                    c1, s1, r = givens_ff(kel(l, j, j),
                                          kel(l, j + 1, j))
                    ksetel(l, j, j, r)
                    ksetel(l, j + 1, j, zero)
                    krows(l, j, _lmat(c1, s1), lo=j + 1, hi=rhi)
                ln = (l + 1) % p
                zup(ln, j + 1, _rmat_adj(c2, s2))
                zup(ln, j, _rmat_adj(c1, s1))
            krows(0, j + 1, _lmat(c2, s2), lo=j, hi=rhi)
            krows(0, j, _lmat(c1, s1), lo=j, hi=rhi)
        else:
            # ---- closing at j = ilast-1 (reference :1015-1048) + the
            # chain510 single-rotation ladder (:510-540).  mode "chain"
            # starts from the GIVEN rotation (act_attack's perfect-shift
            # cascade computes it in f64 glue) and skips the initial
            # annihilation ---------------------------------------------
            if mode == "close":
                c1, s1, r1 = givens_ff(kel(0, j, j - 1),
                                       kel(0, j + 1, j - 1))
                ksetel(0, j, j - 1, r1)
                ksetel(0, j + 1, j - 1, zero)
            krows(0, j, _lmat(c1, s1), lo=j, hi=rhi)
            zup(0, j, _rmat_adj(c1, s1))
            for l in range(p - 1, 0, -1):
                if S[l]:
                    kcols(l, j, _rmat_adj(c1, s1), lo=clo_b, hi=j + 2)
                    c1, s1, r = givens_ff(kel(l, j, j), kel(l, j + 1, j))
                    ksetel(l, j, j, r)
                    ksetel(l, j + 1, j, zero)
                    krows(l, j, _lmat(c1, s1), lo=j + 1, hi=rhi)
                else:
                    krows(l, j, _lmat(c1, s1), lo=j, hi=rhi)
                    c1, s1, r = givens_ff(kel(l, j + 1, j + 1),
                                          ff.neg(kel(l, j + 1, j)))
                    ksetel(l, j + 1, j + 1, r)
                    ksetel(l, j + 1, j, zero)
                    kcols(l, j, _rmat_adj(c1, s1), lo=clo_b, hi=j + 1)
                zup(l, j, _rmat_adj(c1, s1))
            kcols(0, j, _rmat_adj(c1, s1), lo=clo_b)

    return kernel


def _vmem_bytes_rg(p, N, want_z):
    comps = 4 if want_z else 2
    return comps * p * N * N * 4


def rg_kernel_fits(p: int, N: int, want_z: bool = True) -> bool:
    """Whole state VMEM-resident (Z is PLAIN: full-height column updates
    need the full factor) under the bisected ~67 MiB Mosaic ceiling."""
    return _vmem_bytes_rg(p, N, want_z) <= 64 * (1 << 20)


@functools.lru_cache(maxsize=32)
def _rg_call(p: int, N: int, S, want_z: bool, mode: str,
             interpret: bool):
    kern = _make_rg_kernel(p, N, S, want_z, mode)
    nin = 4 if want_z else 2
    return pl.pallas_call(
        kern,
        out_shape=tuple(jax.ShapeDtypeStruct((p, N, N), jnp.float32)
                        for _ in range(nin)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * nin,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(nin)),
        input_output_aliases={2 + j: j for j in range(nin)},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * (1 << 20)),
        interpret=interpret,
    )


def _pack(j, ilast, rhi, clo, rots):
    iscal = jnp.stack([jnp.asarray(j, jnp.int32),
                       jnp.asarray(ilast, jnp.int32),
                       jnp.asarray(rhi, jnp.int32),
                       jnp.asarray(clo, jnp.int32)])
    fscal = jnp.stack([jnp.asarray(x, jnp.float32) for x in rots])
    return iscal, fscal


def _rg_run(H, Z, j, ilast, rhi, clo, rots, S, want_z, mode,
            interpret):
    """Pad (the rg core state is unpadded; the 8-aligned 16-row slab
    reads need sublane slack past 128 lanes), run, slice back."""
    p, n, _ = H.hi.shape
    if n > 128:
        Np = ((n + 16 + 7) // 8) * 8

        def pad(x):
            return jnp.zeros((p, Np, Np), jnp.float32).at[
                :, :n, :n].set(x)
        Hk = FF(pad(H.hi), pad(H.lo))
        Zk = FF(pad(Z.hi), pad(Z.lo)) if want_z else Z
    else:
        Np = n
        Hk, Zk = H, Z
    rhi_k = jnp.int32(Np) if rhi is None else jnp.asarray(rhi, jnp.int32)
    clo_k = jnp.int32(-1) if clo is None else jnp.asarray(clo, jnp.int32)
    iscal, fscal = _pack(j, ilast, rhi_k, clo_k, rots)
    args = (iscal, fscal, Hk.hi, Hk.lo)
    if want_z:
        args = args + (Zk.hi, Zk.lo)
    with ff.no_barriers():
        outs = _rg_call(p, Np, tuple(S), want_z, mode,
                        interpret)(*args)
    Hn = FF(outs[0], outs[1])
    Zn = FF(outs[2], outs[3]) if want_z else Z
    if n > 128:
        Hn = FF(Hn.hi[:, :n, :n], Hn.lo[:, :n, :n])
        if want_z:
            Zn = FF(Zn.hi[:, :n, :n], Zn.lo[:, :n, :n])
    return Hn, Zn


def rg_opening_ff(H: FF, Z, j, ilast, c1: FF, s1: FF, c2: FF, s2: FF,
                  S, *, rhi=None, clo=None, want_z: bool,
                  interpret: bool = False):
    """Fused opening ladder; ``rhi``/``clo`` the want_t window bounds
    (None = unbounded).  Returns (H, Z)."""
    return _rg_run(H, Z, j, ilast, rhi, clo,
                   (c1.hi, c1.lo, s1.hi, s1.lo,
                    c2.hi, c2.lo, s2.hi, s2.lo),
                   S, want_z, "open", interpret)


def rg_closing_ff(H: FF, Z, j, ilast, S, *, rhi=None, clo=None,
                  want_z: bool, interpret: bool = False):
    """Fused closing rotation + chain510 ladder.  Returns (H, Z)."""
    zf = jnp.float32(0.0)
    return _rg_run(H, Z, j, ilast, rhi, clo, (zf,) * 8,
                   S, want_z, "close", interpret)


def rg_chain510_ff(H: FF, Z, j, c1: FF, s1: FF, S, *, rhi=None, clo=None,
                   want_z: bool, interpret: bool = False):
    """Fused chain510 ladder from a GIVEN rotation (act_attack's
    perfect-shift cascade).  Returns (H, Z)."""
    zf = jnp.float32(0.0)
    return _rg_run(H, Z, j, j + 1, rhi, clo,
                   (c1.hi, c1.lo, s1.hi, s1.lo, zf, zf, zf, zf),
                   S, want_z, "chain", interpret)
