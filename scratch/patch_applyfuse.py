"""Apply-after-suite patch: fuse kernel B's per-step M3+M2 applications."""
path = "/root/repo/periodicschurdecompositions_jl_tpu/ops/pallas_sweep.py"
src = open(path).read()

old_step = """        def step(kk, _):
            M0 = _load_logs(R0, kk, 9)
            M1 = _load_logs(R1, kk, 4)
            _apply(oHThi, oHTlo, kk, _roll1(M0), hi_lane=i)
            _apply(oHThi, oHTlo, kk + 1, _roll1(M1), hi_lane=i)
            if want_z:
                _apply(oZThi, oZTlo, kk, M0)
                _apply(oZThi, oZTlo, kk + 1, M1)
            return jnp.int32(0)
"""
new_step = """        def step(kk, _):
            M0 = _load_logs(R0, kk, 9)
            M1 = _load_logs(R1, kk, 4)
            _apply2(oHThi, oHTlo, kk, _roll1(M0), _roll1(M1), hi_lane=i)
            if want_z:
                _apply2(oZThi, oZTlo, kk, M0, M1)
            return jnp.int32(0)
"""
assert old_step in src
src = src.replace(old_step, new_step)

anchor = "    def kernel(scal, HThi, HTlo, ZThi, ZTlo, R0, R1,"
fused = '''    def _apply2(hi_ref, lo_ref, kk, M3: FF, M2: FF, hi_lane=None):
        """Fused per-step application: M3^T on rows kk..kk+2 then M2^T on
        rows kk+1..kk+2, with ONE load/store per array pair (the separate
        _apply calls each did their own read-modify-write of the same
        aligned block — this halves kernel B's slab traffic)."""

        def _el(X, k, s, r):
            q = s * k + r
            return X[:, q:q + 1]

        lanes = hi_ref.shape[-1]
        if lanes <= 128:
            blk = FF(hi_ref[:, pl.ds(kk, 3), :], lo_ref[:, pl.ds(kk, 3), :])
            rs = [FF(blk.hi[:, s, :], blk.lo[:, s, :]) for s in range(3)]
        else:
            kk8 = pl.multiple_of(kk & jnp.int32(-8), 8)
            o = kk - kk8
            blk = FF(hi_ref[:, pl.ds(kk8, 16), :],
                     lo_ref[:, pl.ds(kk8, 16), :])
            sub = lax.broadcasted_iota(jnp.int32, blk.hi.shape, 1)
            zf = jnp.float32(0.0)
            rs = []
            for s in range(3):
                msk = sub == o + s
                rs.append(FF(jnp.sum(jnp.where(msk, blk.hi, zf), axis=1),
                             jnp.sum(jnp.where(msk, blk.lo, zf), axis=1)))
        outs = []
        for r in range(3):
            acc = ff.mul(FF(_el(M3.hi, 3, 0, r), _el(M3.lo, 3, 0, r)),
                         rs[0])
            for s in range(1, 3):
                acc = ff.add(acc, ff.mul(
                    FF(_el(M3.hi, 3, s, r), _el(M3.lo, 3, s, r)), rs[s]))
            outs.append(acc)
        o1 = ff.add(
            ff.mul(FF(_el(M2.hi, 2, 0, 0), _el(M2.lo, 2, 0, 0)), outs[1]),
            ff.mul(FF(_el(M2.hi, 2, 1, 0), _el(M2.lo, 2, 1, 0)), outs[2]))
        o2 = ff.add(
            ff.mul(FF(_el(M2.hi, 2, 0, 1), _el(M2.lo, 2, 0, 1)), outs[1]),
            ff.mul(FF(_el(M2.hi, 2, 1, 1), _el(M2.lo, 2, 1, 1)), outs[2]))
        outs = [outs[0], o1, o2]
        if hi_lane is not None:
            lane = _lane_iota(outs[0].hi.shape, 1)
            outs = [FF(jnp.where(lane <= hi_lane, outs[s].hi, rs[s].hi),
                       jnp.where(lane <= hi_lane, outs[s].lo, rs[s].lo))
                    for s in range(3)]
        if lanes <= 128:
            new = ff.stack(outs, 1)
            hi_ref[:, pl.ds(kk, 3), :] = new.hi
            lo_ref[:, pl.ds(kk, 3), :] = new.lo
        else:
            bh, bl = blk.hi, blk.lo
            for s in range(3):
                msk = sub == o + s
                bh = jnp.where(msk, outs[s].hi[:, None, :], bh)
                bl = jnp.where(msk, outs[s].lo[:, None, :], bl)
            hi_ref[:, pl.ds(kk8, 16), :] = bh
            lo_ref[:, pl.ds(kk8, 16), :] = bl

    def kernel(scal, HThi, HTlo, ZThi, ZTlo, R0, R1,'''
assert anchor in src
src = src.replace(anchor, fused)
open(path, "w").write(src)
print("patched")
