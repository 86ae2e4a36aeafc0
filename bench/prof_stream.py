#!/usr/bin/env python
"""Stage-by-stage TPU profile of the stream backend at a given config.

Times each piece of substep_binned under jit (value-fetch verified), plus
bin/unbin/rebin costs and the re-bin frequency over one frame.

Usage: python bench/prof_stream.py [--config 3d-1m] [--reps 20]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def timeit(fn, *args, reps=20):
    import jax

    out = jax.block_until_ready(fn(*args))
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.ravel()[0])
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="3d-1m")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--pair", action="store_true", help="tile pairing")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    import bench as B
    from fluid_tpu import step
    from fluid_tpu.ops import stream_transfer as stx

    dim, n, frames, batch, bkey, backends = B.CONFIGS[args.config]
    cfg, p, dom = B._make_scene(dim, n, batch)
    if batch:  # pack scenes side by side along x, like bench's stream path
        from fluid_tpu import scene as scene_mod

        p, dom, stride = scene_mod.pack_scenes(p, cfg)
        n = n * batch
        spec = dataclasses.replace(
            B._stream_spec(cfg, dom, n, pos=p.pos), scene_stride=stride
        )
    else:
        spec = B._stream_spec(cfg, dom, n, pos=p.pos)
    if args.pair:
        spec = dataclasses.replace(spec, pair=True)
        assert stx._use_pair(spec, dim)
    mp, ma = step.no_mouse()
    D = cfg.dim
    tshape, nt = stx._tile_geometry(dom, spec)
    nslots = (spec.A // 2 if stx._use_pair(spec, D) else spec.A) * spec.cap
    print(f"config={args.config} n={n} nt={nt} A={spec.A} cap={spec.cap} "
          f"E={spec.E} EP={spec.EP(D)} pair={stx._use_pair(spec, D)} "
          f"slots={nslots}")

    st = jax.jit(stx.bin_particles, static_argnums=(1, 2))(p, dom, spec)
    st = jax.block_until_ready(st)
    occ = int((st.count > 0).sum())
    print(f"occupied tiles at t=0: {occ}; mean count {float(st.count.sum())/max(occ,1):.1f}")

    r = args.reps
    t_bin = timeit(jax.jit(stx.bin_particles, static_argnums=(1, 2)), p, dom, spec, reps=r)
    print(f"bin_particles:   {t_bin*1e3:8.2f} ms")

    t_unbin = timeit(
        jax.jit(functools.partial(stx.unbin, n=p.n, D=D), static_argnums=(1, 2)),
        st, dom, spec, reps=r)
    print(f"unbin:           {t_unbin*1e3:8.2f} ms")

    t_rebin = timeit(
        jax.jit(functools.partial(stx._rebin_full, cfg=cfg, domain=dom, spec=spec,
                                  tshape=tshape, nt=nt, n=p.n)),
        st, reps=r)
    print(f"rebin_full:      {t_rebin*1e3:8.2f} ms")

    # ---- stage breakdown ---------------------------------------------------
    origin = tuple(int(o) for o in dom.origin)
    dep1_k = stx.make_deposit_kernel(spec, D, tshape, origin, "p2g1")
    dep2_k = stx.make_deposit_kernel(spec, D, tshape, origin, "p2g2")
    coll_k = stx.make_collect_kernel(spec, D, tshape, origin)
    E = spec.E
    E3 = E ** D
    EP = spec.EP(D)
    GROWS = stx.GROWS
    A, NG, G = spec.A, spec.NG, spec.group

    dep1_j = jax.jit(lambda c, t, s: dep1_k(c, t, s))
    t_dep1 = timeit(dep1_j, st.count, st.tid, st.stream, reps=r)
    print(f"dep1 kernel:     {t_dep1*1e3:8.2f} ms")
    dep1 = jax.block_until_ready(dep1_j(st.count, st.tid, st.stream))

    blk1_j = jax.jit(lambda b: b.reshape(A, GROWS, EP)[:, :1 + D, :E3])
    blk1 = jax.block_until_ready(blk1_j(dep1))

    hm_j = jax.jit(lambda b, nb: stx.halo_stream(b[:, 0, :], nb, tshape, spec, D, 1))
    t_hm = timeit(hm_j, blk1, st.nbr, reps=r)
    print(f"halo_pull(mass): {t_hm*1e3:8.2f} ms")
    hs_m = jax.block_until_ready(hm_j(blk1, st.nbr))

    r3 = stx._use_r3(spec, D)
    if r3:
        S1 = E3 // 128
        mg_j = jax.jit(lambda h: h.reshape(NG, G * S1, 128))
    else:
        mg_j = jax.jit(
            lambda h: jnp.pad(h, ((0, 0), (0, EP - E3))).reshape(NG, G, EP)
        )
    mgblk = jax.block_until_ready(mg_j(hs_m))

    params6 = jnp.asarray(
        [cfg.dt, cfg.rest_density, cfg.eos_stiffness, cfg.eos_power,
         cfg.pressure_floor, cfg.dynamic_viscosity], jnp.float32)
    dep2_j = jax.jit(
        lambda c, t, s, m, d1: dep2_k(c, t, s, mgblk=m, params=params6, d1blk=d1)
    )
    t_dep2 = timeit(dep2_j, st.count, st.tid, st.stream, mgblk, dep1, reps=r)
    print(f"dep2 kernel(m+f):{t_dep2*1e3:8.2f} ms")
    dep2 = jax.block_until_ready(dep2_j(st.count, st.tid, st.stream, mgblk, dep1))

    hmf_j = jax.jit(lambda b2, nb: stx.halo_stream(
        b2.reshape(A, D, EP)[:, :, :E3].reshape(A, D * E3),
        nb, tshape, spec, D, D))
    t_hmf = timeit(hmf_j, dep2, st.nbr, reps=r)
    print(f"halo_pull(m+f):  {t_hmf*1e3:8.2f} ms")
    hs_mf = jax.block_until_ready(hmf_j(dep2, st.nbr))

    def gblk_fn(hs_mf, hs_m):
        g = jnp.asarray(cfg.gravity, jnp.float32)
        mf = hs_mf.reshape(A, D, E3)
        ma_ = hs_m.reshape(A, 1, E3)
        v = jnp.where(ma_ > 0.0, mf / jnp.where(ma_ > 0.0, ma_, 1.0)
                      + cfg.dt * g[None, :, None], 0.0)
        gb = jnp.concatenate([v, ma_], axis=1)
        gb = jnp.pad(gb, ((0, 0), (0, GROWS - 1 - D), (0, EP - E3)))
        return gb.reshape(NG, G * GROWS, EP)

    gb_j = jax.jit(gblk_fn)
    t_gb = timeit(gb_j, hs_mf, hs_m, reps=r)
    print(f"gblk build:      {t_gb*1e3:8.2f} ms")
    gblk = jax.block_until_ready(gb_j(hs_mf, hs_m))

    params = stx._collect_params(cfg, mp, ma, D, spec.scene_stride)
    coll_j = jax.jit(lambda c, t, s, g: coll_k(c, t, params, s, g))
    t_coll = timeit(coll_j, st.count, st.tid, st.stream, gblk, reps=r)
    print(f"collect kernel:  {t_coll*1e3:8.2f} ms")

    total = t_dep1 + t_hm + t_dep2 + t_hmf + t_gb + t_coll
    print(f"stage sum:       {total*1e3:8.2f} ms")

    sub_j = jax.jit(functools.partial(
        stx.substep_binned, cfg=cfg, domain=dom, spec=spec,
        mouse_pos=mp, mouse_active=ma))
    t_sub = timeit(sub_j, st, reps=r)
    print(f"fused substep:   {t_sub*1e3:8.2f} ms")

    # ---- re-bin frequency over one frame ------------------------------------
    def scan_body(st, _):
        st = stx.substep_binned(st, cfg, dom, spec, mp, ma)
        need = stx.needs_rebin(st, dom, spec, D)
        st = jax.lax.cond(
            need, lambda s: stx._rebin_full(s, cfg, dom, spec, tshape, nt, p.n),
            lambda s: s, st)
        return st, need

    scan_j = jax.jit(lambda st: jax.lax.scan(scan_body, st, None, length=cfg.iterations))
    st2, needs = jax.block_until_ready(scan_j(st))
    print(f"re-bins in frame 1: {int(needs.sum())}/{cfg.iterations}")
    t0 = time.perf_counter()
    st3, needs2 = jax.block_until_ready(scan_j(st2))
    t_fr = time.perf_counter() - t0
    print(f"re-bins in frame 2: {int(needs2.sum())}/{cfg.iterations}; "
          f"frame: {t_fr*1e3:.1f} ms ({t_fr/cfg.iterations*1e3:.2f} ms/substep)")
    print(f"particles alive: {int(st3.count.sum())}/{n}")


if __name__ == "__main__":
    main()
