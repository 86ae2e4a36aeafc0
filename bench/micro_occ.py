#!/usr/bin/env python
"""Measure peak dilated occupancy over a config's bench run (frames+warmup).

The stream active budget A must cover the PEAK cube-dilated occupied-tile
count at any re-bin during the run; bench's _stream_spec currently budgets
3x the t=0 probe.  This prints the per-frame dilated counts so the budget
can be set from measurement instead of a guess.

Run: python bench/micro_occ.py [--config batch-64] [--frames 4]
"""
import argparse
import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="batch-64")
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--pair", action="store_true")
    ap.add_argument("--active", type=int, default=None,
                    help="override A (probe-corrupted runs drop relay "
                    "shells and change the physics — measure with a big A)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench as B
    from fluid_tpu import step
    from fluid_tpu.ops import stream_transfer as stx

    dim, n, frames, batch, bkey, backends = B.CONFIGS[args.config]
    cfg, p, dom = B._make_scene(dim, n, batch)
    if batch:
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
    if args.active:
        spec = dataclasses.replace(spec, active=args.active)
    mp, ma = step.no_mouse()
    tshape, nt = stx._tile_geometry(dom, spec)

    @jax.jit
    def occ_dil(q):
        tid = stx._keys_from_pos(q.pos, dom, spec, tshape, vel=q.vel, dt=cfg.dt)
        occ = jnp.zeros((nt,), bool).at[tid].set(True)
        return (
            occ.sum(),
            stx._active_set(occ, tshape).sum(),
            stx._dilate(occ, tshape).sum(),
        )

    o0, a0, d0 = (int(x) for x in occ_dil(p))
    print(f"config={args.config} nt={nt} A={spec.A} t0: occ={o0} "
          f"needed={a0} dilated={d0}")

    frame_j = jax.jit(lambda q: stx.frame(q, cfg, dom, mp, ma, spec=spec))
    peak = a0
    for f in range(args.frames):
        p = jax.block_until_ready(frame_j(p))
        o, a, d = (int(x) for x in occ_dil(p))
        peak = max(peak, a)
        print(f"frame {f + 1}: occ={o} needed={a} dilated={d} "
              f"(A used {a / spec.A:.2f})")
    print(f"peak needed: {peak} = {peak / max(a0, 1):.2f}x t0; A={spec.A} "
          f"({spec.A / peak:.2f}x peak)")


if __name__ == "__main__":
    main()
