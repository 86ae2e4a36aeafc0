#!/usr/bin/env python
"""Where does the 3d-ref frame go?  Fused-frame A/B ablations (VERDICT r4
task 3: small-N configs sit furthest below their ceilings).

Small-N solo-stage profiling is tunnel-dispatch-bound (CLAUDE.md round-3
facts), so this measures FULL fused frames through the Session under spec
ablations instead:
  * baseline (bench auto spec at the current ladder rung)
  * group in {8, 16, 32}: per-program group-body amortization at small NG
  * pair on/off
  * dyn on/off (residual [A]-shaped cost check)
  * active budget sweep (A-dependence after occupied-only grids)

Run (TPU): python bench/micro_refscale.py [--config 3d-ref] [--frames 10]
"""
from __future__ import annotations

import argparse
import dataclasses
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def run_one(label, cfg, p, dom, spec, frames, n):
    import jax

    from fluid_tpu import step
    from fluid_tpu.session import Session

    mp, ma = step.no_mouse()
    try:
        pc = jax.tree.map(lambda a: a.copy(), p)
        sess = Session(cfg, dom, pc, backend="stream", spec=spec, strict=False)
        sess.frame((mp, ma))
        sess.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(frames):
            sess.frame((mp, ma))
        sess.block_until_ready()
        dt = time.perf_counter() - t0
        live = sess.live_count()
        assert live == n, f"loss {live} != {n}"
        assert sess.shell_drop() == 0, "shell drops"
        print(
            f"{label:28s} {dt / frames * 1e3:8.2f} ms/frame  "
            f"({n * cfg.iterations * frames / dt:,.0f} pps; "
            f"peak need {sess.need_peak():,} of A={spec.A:,}; "
            f"{sess.rebins() / (frames + 1):.2f} rebins/frame)"
        )
    except Exception as e:  # noqa: BLE001
        print(f"{label:28s} FAILED: {type(e).__name__}: {e}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="3d-ref")
    ap.add_argument("--frames", type=int, default=10)
    args = ap.parse_args()

    import bench as B
    from fluid_tpu.ops import stream_transfer as stx

    dim, n, _frames, batch, bkey, backends = B.CONFIGS[args.config]
    # peak-aware starting rung (batch-64's tight rungs are measured dead)
    B._ACTIVE_MULT = B._ACTIVE_MULTS[B._START_RUNG.get(args.config, 0)]
    cfg, p, dom = B._make_scene(dim, n, batch)
    if batch:
        # mirror bench._bench_frame: scenes packed side by side along x
        from fluid_tpu import scene as scene_mod

        p, dom, stride = scene_mod.pack_scenes(p, cfg)
        n = p.pos.shape[0]
        base = dataclasses.replace(
            B._stream_spec(cfg, dom, n, pos=p.pos), scene_stride=stride
        )
    else:
        base = B._stream_spec(cfg, dom, n, pos=p.pos)
    print(f"config={args.config} n={n} base: A={base.A} G={base.group} "
          f"pair={base.pair} dyn={base.dyn}")

    f = args.frames
    run_one("baseline", cfg, p, dom, base, f, n)
    for g in (16, 32):
        run_one(f"group={g}", cfg, p, dom,
                dataclasses.replace(base, group=g), f, n)
    if stx._use_pair(dataclasses.replace(base, pair=True), dim):
        run_one("pair", cfg, p, dom,
                dataclasses.replace(base, pair=True), f, n)
        run_one("pair+group=16", cfg, p, dom,
                dataclasses.replace(base, pair=True, group=16), f, n)
    run_one("dyn=off", cfg, p, dom,
            dataclasses.replace(base, dyn=False), f, n)
    if dim == 3:
        # dyn-bounded Pallas mass halo vs the A-shaped XLA gather — at base
        # A and at the inflated budgets where the gather's slack tax bites
        run_one("mhalo=pallas", cfg, p, dom,
                dataclasses.replace(base, mhalo="pallas"), f, n)
        run_one("mhalo=pallas active x2", cfg, p, dom,
                dataclasses.replace(base, mhalo="pallas",
                                    active=base.active * 2), f, n)
    for mult in (2, 4):
        run_one(f"active x{mult}", cfg, p, dom,
                dataclasses.replace(base, active=base.active * mult), f, n)

    # ---- solo re-bin cost vs A: attributes the active-sweep residue ------
    # (rebins/frame x this = the re-bin share of the frame)
    import time

    import jax

    for mult in (1, 2, 4):
        spec = dataclasses.replace(base, active=base.active * mult)
        tshape, origin, nt = stx._geom(dom, spec)
        st = stx.bin_particles(p, dom, spec, dt=cfg.dt)

        @jax.jit
        def rb(st, spec=spec, tshape=tshape, nt=nt):
            return stx._rebin_full(st, cfg, dom, spec, tshape, nt, n)

        out = jax.block_until_ready(rb(st))
        _ = float(out.count.sum())
        t0 = time.perf_counter()
        reps = 30
        for _ in range(reps):
            out = rb(st)
        jax.block_until_ready(out)
        _ = float(out.count.sum())
        print(f"solo rebin A={spec.A:6d}: "
              f"{(time.perf_counter() - t0) / reps * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()
