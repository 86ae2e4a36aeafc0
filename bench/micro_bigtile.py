#!/usr/bin/env python
"""Big-tile (flat, non-rank-3) stream spec vs the production T=4 spec.

Round-3 substep lead (VERDICT task 1): at T=4 the substep is bound by
~3 latency-bound per-occupied-tile MXU dots; T=8 (E=12, flat EP-padded
layout) has 8x fewer tiles with 8x fatter dots, amortizing the per-tile
fixed costs (dispatch, window builds, DMA rows, halo rows).  This times
K fused substeps INSIDE one jit with a scalar checksum output, so it is
valid even when the tunnel's device->host direction is degraded (large
execution outputs ship per call; scalars don't).

Usage: python bench/micro_bigtile.py [--config 3d-1m] [--tile 8]
         [--cap 1024] [--group 1] [--subs 10]
Compare against the production spec with --tile 4 --cap 128 --group 8.
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="3d-1m")
    ap.add_argument("--tile", type=int, default=8)
    ap.add_argument("--cap", type=int, default=1024)
    ap.add_argument("--group", type=int, default=1)
    ap.add_argument("--subs", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--wchunk", type=int, default=None,
        help="flat-path window chunk lanes (None = auto VMEM budget)",
    )
    ap.add_argument(
        "--pair", action="store_true",
        help="tile pairing (zfac path: tile=4 cap=128 only)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    import bench as B
    from fluid_tpu import step
    from fluid_tpu.ops import stream_transfer as stx

    dim, n, frames, batch, bkey, backends = B.CONFIGS[args.config]
    cfg, p, dom = B._make_scene(dim, n, batch)
    if batch:
        from fluid_tpu import scene as scene_mod

        p, dom, stride = scene_mod.pack_scenes(p, cfg)
        n = p.pos.shape[0]
    else:
        stride = 0.0
    T = args.tile
    nt = math.prod(s // T for s in dom.shape)
    mp, ma = step.no_mouse()

    # occupancy + peak per-tile count at t=0 (validates cap before binning)
    probe = stx.StreamSpec(
        tile=T, cap=128, halo=2, group=1, active=1, scene_stride=stride
    )
    tshape = tuple(s // T for s in dom.shape)

    @jax.jit
    def occ_stats(pos):
        tid = stx._keys_from_pos(pos, dom, probe, tshape)
        cnt = jnp.zeros((nt,), jnp.int32).at[tid].add(1)
        occ = cnt > 0
        dil = stx._active_set(occ, tshape)
        return occ.sum(), dil.sum(), cnt.max()

    o, d, peak = (int(x) for x in occ_stats(p.pos))
    print(f"tile={T}: nt={nt} occupied={o} dilated={d} peak_count={peak}")
    if peak > args.cap:
        print(f"cap {args.cap} < peak {peak} — raise --cap")
        return
    A = min(-(-d * 2 // args.group) * args.group, nt, 110_000)
    spec = stx.StreamSpec(
        tile=T, cap=args.cap, halo=2, group=args.group, active=A,
        scene_stride=stride, wchunk=args.wchunk, pair=args.pair,
    )
    nslots = (spec.A // 2 if stx._use_pair(spec, dim) else spec.A) * spec.cap
    print(f"spec: A={spec.A} NG={spec.NG} cap={spec.cap} E={spec.E} "
          f"r3={stx._use_r3(spec, dim)} pair={stx._use_pair(spec, dim)} "
          f"wchunk={stx._wchunk(spec, dim)} slots={nslots}")

    st = jax.block_until_ready(
        jax.jit(stx.bin_particles, static_argnums=(1, 2))(p, dom, spec)
    )
    print(f"live after bin: {int(st.count.sum())}/{n}")

    tshape_g, origin, ntg = stx._geom(dom, spec)
    dep1_k = stx.make_deposit_kernel(spec, dim, tshape_g, origin, "p2g1")

    @jax.jit
    def subs_k(st):
        dep1 = dep1_k(st.count, st.tid, st.stream)

        def body(_, carry):
            st, dep1 = carry
            st, dep1n = stx._substep_core(
                st, dep1, cfg, dom, spec, mp, ma, fused=True
            )
            return st, dep1n

        st, _ = lax.fori_loop(0, args.subs, body, (st, dep1))
        return st.stream.sum(), st.flag.sum(), st.count.sum()

    out = jax.block_until_ready(subs_k(st))
    t0 = time.perf_counter()
    for _ in range(args.reps):
        out = subs_k(st)
    jax.block_until_ready(out)
    chk = float(out[0])
    dt = (time.perf_counter() - t0) / args.reps / args.subs
    print(
        f"fused substep: {dt*1e3:8.2f} ms  (checksum {chk:.6g}, "
        f"flagged {float(out[1]):.0f}, live {int(out[2])})"
    )

    # frame with drift-triggered re-bins, checksummed (link-safe)
    @jax.jit
    def frame_k(st):
        st = stx.frame_binned(st, cfg, dom, spec, mp, ma, n=n)
        return st.stream.sum(), st.count.sum()

    out = jax.block_until_ready(frame_k(st))
    t0 = time.perf_counter()
    out = frame_k(st)
    jax.block_until_ready(out)
    print(
        f"frame ({cfg.iterations} subs + rebins): "
        f"{(time.perf_counter()-t0)*1e3:8.1f} ms  live {int(out[1])}/{n}"
    )


if __name__ == "__main__":
    main()
