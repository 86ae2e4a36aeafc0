#!/usr/bin/env python
"""2D tile-size probe (VERDICT r3 #8): does a bigger 2D tile lift 2d-ref /
2d-100k past the T=4 stream numbers?

The rank-3/zfac machinery is 3D-only, but the generic FLAT kernel path
handles any tile size (CPU-verified bit-level at T=16 on 2D).  A bigger
tile is the 2D analog of the 3D big-tile candidate (T=8, measured 3.6x
WORSE — window-chunk rebuild cost), with one key difference: the 2D window
[E^2 <= 400, cap] fits VMEM without chunking, so the dot-fattening has no
rebuild tax.  This script probes T in {4 (baseline), 8, 16} with
occupancy-sized cap/active budgets and reports pps + conservation.

Run (TPU): python bench/micro_2d_tile.py [--config 2d-100k] [--frames 5]
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
    ap.add_argument("--config", default="2d-100k", choices=["2d-ref", "2d-100k"])
    ap.add_argument("--frames", type=int, default=5)
    # 2d-ref's tight domain is 72^2 (divisible by 8/12, not 16); 2d-100k's
    # differs — the alignment check below skips infeasible tiles per config
    ap.add_argument("--tiles", type=int, nargs="*", default=[4, 8, 12, 16])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench as B
    from fluid_tpu import step
    from fluid_tpu.ops import stream_transfer as stx
    from fluid_tpu.session import Session

    dim, n, _frames, batch, bkey, backends = B.CONFIGS[args.config]
    cfg, p, dom = B._make_scene(dim, n, batch)
    mp, ma = step.no_mouse()

    for T in args.tiles:
        if any(s % T for s in dom.shape):
            print(f"T={T}: domain {dom.shape} not tile-aligned — skip")
            continue
        tshape = tuple(s // T for s in dom.shape)
        nt = math.prod(tshape)
        if T == 4:
            spec = B._stream_spec(cfg, dom, n, pos=p.pos)
        else:
            probe = stx.StreamSpec(tile=T, cap=128, halo=2, group=1, active=1)

            @jax.jit
            def occ_stats(pos):
                tid = stx._keys_from_pos(pos, dom, probe, tshape)
                cnt = jnp.zeros((nt,), jnp.int32).at[tid].add(1)
                occ = cnt > 0
                return stx._active_set(occ, tshape).sum(), cnt.max()

            act, peak = (int(x) for x in occ_stats(p.pos))
            cap = -(-(peak * 2) // 128) * 128  # 2x t=0 peak, lane-aligned
            active = min(max(act * 3, 64), nt)
            spec = stx.StreamSpec(
                tile=T, cap=cap, halo=2, group=1, active=active,
                interpret=jax.default_backend() == "cpu",
            )
        print(
            f"T={T}: E={spec.E} EP={spec.EP(2)} cap={spec.cap} "
            f"A={spec.A} wchunk={stx._wchunk(spec, 2)}"
        )
        try:
            pc = jax.tree.map(lambda a: a.copy(), p)
            sess = Session(cfg, dom, pc, backend="stream", spec=spec, strict=False)
            sess.frame((mp, ma))
            sess.block_until_ready()
            t0 = time.perf_counter()
            for _ in range(args.frames):
                sess.frame((mp, ma))
            sess.block_until_ready()
            dt = time.perf_counter() - t0
            live = sess.live_count()
            assert live == n, f"loss: {live} != {n}"
            drops = sess.shell_drop()
            assert drops == 0, f"shell drops: {drops}"
            pps = n * cfg.iterations * args.frames / dt
            print(
                f"  {pps:,.0f} pps  ({dt / args.frames * 1e3:.2f} ms/frame; "
                f"peak need {sess.need_peak():,} of A={spec.A})"
            )
        except Exception as e:  # noqa: BLE001
            print(f"  FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
