#!/usr/bin/env python
"""Group-size (tiles/program) sweep for the fused stream substep at 3d-1m.

Per-kernel dispatch is ~550 ns/program (bench/micro_kernels.py) and the
fused substep launches 4-5 kernels over NG = A/G programs each; at G=8
that is ~2.2 ms/kernel of pure dispatch.  Doubling G halves it, at the
price of more VMEM per program (blocks scale with G).  This measures the
fused paired substep + rebin at G in {8, 16, 32}.

Run: python bench/micro_group.py [--groups 8 16 32] [--no-pair]
"""
import argparse
import dataclasses
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def timeit(fn, *args, reps=10):
    import jax

    out = jax.block_until_ready(fn(*args))
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.ravel()[0])
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, nargs="+", default=[8, 16, 32])
    ap.add_argument("--no-pair", action="store_true")
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax

    import bench as B
    from fluid_tpu import step
    from fluid_tpu.ops import stream_transfer as stx

    dim, n, frames, batch, bkey, backends = B.CONFIGS["3d-1m"]
    cfg, p, dom = B._make_scene(dim, n, batch)
    base = B._stream_spec(cfg, dom, n)
    mp, ma = step.no_mouse()
    tshape, nt = stx._tile_geometry(dom, base)

    for g in args.groups:
        spec = dataclasses.replace(base, group=g, pair=not args.no_pair)
        if spec.pair and not stx._use_pair(spec, dim):
            print(f"G={g}: pair spec rejected, skipping")
            continue
        try:
            st = jax.block_until_ready(
                jax.jit(stx.bin_particles, static_argnums=(1, 2))(p, dom, spec)
            )
            sub_j = jax.jit(functools.partial(
                stx.substep_binned, cfg=cfg, domain=dom, spec=spec,
                mouse_pos=mp, mouse_active=ma))
            t_sub = timeit(sub_j, st, reps=args.reps)
            reb_j = jax.jit(functools.partial(
                stx._rebin_full, cfg=cfg, domain=dom, spec=spec,
                tshape=tshape, nt=nt, n=n))
            t_reb = timeit(reb_j, st, reps=args.reps)
            print(f"G={g:3d} A={spec.A} NG={spec.NG}: substep "
                  f"{t_sub*1e3:7.2f} ms  rebin {t_reb*1e3:7.2f} ms")
        except Exception as e:  # noqa: BLE001 - report and continue the sweep
            print(f"G={g}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
