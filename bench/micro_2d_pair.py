#!/usr/bin/env python
"""2D FLAT tile pairing A/B (VERDICT r4 #3): pair off vs on, alternated reps.

The 2D window is E^2 = 64 rows — exactly half the 128 dot lanes — so the
flat path pairs two tiles per slot block and runs ONE window dot per pair
in deposit / g2p / fused-p2g1 (_use_pair2, round 5).  2D frame times at
ref scale are inside the tunnel jitter band, so this alternates specs and
reports the min over reps (the only trustworthy small-N comparison on the
tunnel — CLAUDE.md round-4 facts).

Run (TPU): python bench/micro_2d_pair.py [--config 2d-ref] [--frames 5]
           [--reps 3] [--groups 8 16]
"""
from __future__ import annotations

import argparse
import dataclasses
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="2d-ref", choices=["2d-ref", "2d-100k"])
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--groups", type=int, nargs="*", default=[8])
    args = ap.parse_args()

    import jax

    import bench as B
    from fluid_tpu import step
    from fluid_tpu.ops import stream_transfer as stx
    from fluid_tpu.session import Session

    dim, n, _frames, batch, _, _ = B.CONFIGS[args.config]
    cfg, p, dom = B._make_scene(dim, n, batch)
    mp, ma = step.no_mouse()

    base = B._stream_spec(cfg, dom, n, pos=p.pos)
    specs = {"pair=off": base}
    for g in args.groups:
        cand = dataclasses.replace(base, pair=True, group=g)
        if base.A % (g * 4):
            # keep NG a multiple of 4 (see bench._maybe_pair)
            cand = dataclasses.replace(
                cand, active=-(-base.A // (g * 4)) * (g * 4)
            )
        if stx._use_pair(cand, dim):
            specs[f"pair G={g}"] = cand

    best = {k: float("inf") for k in specs}
    for rep in range(args.reps):
        for name, spec in specs.items():
            pc = jax.tree.map(lambda a: a.copy(), p)
            try:
                sess = Session(
                    cfg, dom, pc, backend="stream", spec=spec, strict=False
                )
                sess.frame((mp, ma))
                sess.block_until_ready()
                snap = sess.snapshot()
                sess.run(args.frames, (mp, ma))
                sess.block_until_ready()
                sess.restore(snap)
                t0 = time.perf_counter()
                sess.run(args.frames, (mp, ma))
                sess.block_until_ready()
                dt = time.perf_counter() - t0
                live = sess.live_count()
                assert live == n, f"loss: {live} != {n}"
                assert sess.shell_drop() == 0, "shell drops"
                spf = dt / args.frames
                best[name] = min(best[name], spf)
                pps = n * cfg.iterations / spf
                print(
                    f"rep{rep} {name:>12}: {pps:>13,.0f} pps  "
                    f"{spf * 1e3:7.2f} ms/frame (A={spec.A})"
                )
            except Exception as e:  # noqa: BLE001
                print(f"rep{rep} {name:>12}: FAILED {type(e).__name__}: {e}")
    print("--- min over reps ---")
    for name, spf in best.items():
        if spf < float("inf"):
            print(
                f"{name:>12}: {n * cfg.iterations / spf:>13,.0f} pps  "
                f"{spf * 1e3:7.2f} ms/frame"
            )


if __name__ == "__main__":
    main()
