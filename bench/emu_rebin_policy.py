#!/usr/bin/env python
"""Re-bin POLICY emulation (CPU): does a partial re-key inflate triggers?

VERDICT r2 task 2's remaining lead is a violator-only re-bin: at a drift
trigger, re-key only the particles whose flag fired (0.005-0.2% of 1M)
instead of all of them (the 101 ms `_rebin_full`).  The open question is
TRIGGER FREQUENCY: a full re-bin predictively re-centers EVERY particle's
drift window, so the next trigger is ~10-15 substeps out; re-keying only
violators leaves the near-edge particles one substep from firing, which
could collapse the inter-trigger gap to ~1 and erase the win.

This script answers that WITHOUT the TPU: run the true physics (dense
backend, CPU, small n) and emulate the bin-key bookkeeping of each policy
on the ground-truth trajectories:

  full       re-key everyone predictively at each trigger (today's policy)
  viol       re-key only true violators (flag semantics of the collect
             kernel: floor(newpos) outside [1-h, T-2+h] in the bin tile)
  graded(m)  trigger on true violation, but re-key every particle within
             m CELLS of its window edge (a 2-level flag the kernel could
             emit as cheaply as today's binary one)

Reported per policy: triggers over the run, mean/max re-keyed fraction.
The decision rule: graded(m) wins if triggers stay ~ full's while the
re-keyed fraction stays <~ 1% (a ~100x smaller row move than _rebin_full).

Run: python bench/emu_rebin_policy.py [--frames 10] [--n 20000]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from fluid_tpu.utils.platform import force_cpu

force_cpu()

import jax  # noqa: E402
import numpy as np  # noqa: E402

import bench as B  # noqa: E402
from fluid_tpu import step  # noqa: E402
from fluid_tpu.ops import stream_transfer as stx  # noqa: E402


def predictive_tile(pos, vel, dt, dom, spec, tshape):
    """NumPy mirror of stream_transfer._keys_from_pos (per-axis tile coords)."""
    origin = np.asarray(dom.origin, np.int64)
    shape = np.asarray(dom.shape, np.int64)
    T, h = spec.tile, spec.halo
    cell = np.clip(np.floor(pos).astype(np.int64) - origin, 0, shape - 1)
    shift = np.clip(vel * (stx._LOOKAHEAD * dt), -1.0, 1.0)
    pcell = np.clip(np.floor(pos + shift).astype(np.int64) - origin, 0, shape - 1)
    ct = pcell // T
    lc = cell - ct * T
    ok = (lc >= 1 - h) & (lc <= T - 2 + h)
    return np.where(ok, ct, cell // T)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20_000)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--margins", default="0.5,1.0,1.5")
    args = ap.parse_args()

    cfg, p, dom = B._make_scene(3, args.n)
    spec = B._stream_spec(cfg, dom, args.n)
    tshape, origin_t, nt = stx._geom(dom, spec)
    T, h = spec.tile, spec.halo
    origin = np.asarray(dom.origin, np.int64)
    mp, ma = step.no_mouse()
    sub = jax.jit(lambda p: step.substep(p, cfg, dom, mp, ma, "dense")[0])

    margins = [float(m) for m in args.margins.split(",")]
    policies = ["full", "viol"] + [f"graded({m:g})" for m in margins]
    pos = np.asarray(p.pos, np.float64)
    vel = np.asarray(p.vel, np.float64)
    ct0 = predictive_tile(pos, vel, cfg.dt, dom, spec, tshape)
    state = {name: ct0.copy() for name in policies}
    trig = {name: 0 for name in policies}
    moved = {name: [] for name in policies}

    n_sub = args.frames * cfg.iterations
    for s in range(n_sub):
        p = sub(p)
        if (s + 1) % cfg.iterations == 0:
            p = jax.block_until_ready(p)
        pos = np.asarray(p.pos, np.float64)
        vel = np.asarray(p.vel, np.float64)
        cell = np.floor(pos).astype(np.int64) - origin  # flag uses floor(newpos)
        newct = predictive_tile(pos, vel, cfg.dt, dom, spec, tshape)
        for name in policies:
            ct = state[name]
            lc = cell - ct * T
            bad = ((lc < 1 - h) | (lc > T - 2 + h)).any(axis=1)
            if not bad.any():
                continue
            trig[name] += 1
            if name == "full":
                sel = np.ones(len(pos), bool)
            elif name == "viol":
                sel = bad
            else:
                m = float(name[name.index("(") + 1 : -1])
                lx = pos - origin - ct * T  # float local coords
                risk = ((lx < 1 - h + m) | (lx >= T - 1 + h - m)).any(axis=1)
                sel = bad | risk
            moved[name].append(sel.mean())
            ct[sel] = newct[sel]

    print(f"n={args.n} frames={args.frames} substeps={n_sub} "
          f"T={T} h={h} lookahead={stx._LOOKAHEAD}")
    print(f"{'policy':>12} {'triggers':>8} {'trig/frame':>10} "
          f"{'moved mean%':>11} {'moved max%':>10}")
    for name in policies:
        mv = np.array(moved[name]) * 100 if moved[name] else np.zeros(1)
        print(f"{name:>12} {trig[name]:8d} {trig[name]/args.frames:10.2f} "
              f"{mv.mean():11.3f} {mv.max():10.3f}")


if __name__ == "__main__":
    main()
