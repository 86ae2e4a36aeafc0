#!/usr/bin/env python
"""Benchmark harness — the five BASELINE.json configs.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Headline metric (BASELINE.json): particle-steps/sec at 3D 1M particles on one
TPU chip.  ``vs_baseline`` divides by the measured serial-CPU denominator in
BASELINE_MEASURED.json (the identical-semantics C++ engine — the reference is
an unbenchmarked serial Rust binary, SURVEY.md §6).

Usage:
  python bench.py                      # headline: 3D 1M on default platform
  python bench.py --config all         # run all five configs (summary line last)
  python bench.py --platform cpu --quick
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(ROOT))


def _load_baseline():
    path = ROOT / "BASELINE_MEASURED.json"
    if path.exists():
        return json.loads(path.read_text())["results"]
    return {}


def _bench_frame(cfg, n, frames, backend, seed=0, batch=None):
    """Time `frames` full frames; returns (particle_steps/sec, s/frame)."""
    import jax
    import jax.numpy as jnp

    from fluid_tpu import scene, step

    if batch:
        p, dom = scene.batched_dam_break(jax.random.key(seed), cfg, batch, n=n)
        run = jax.jit(
            lambda p, mp, ma: jax.vmap(lambda q: step.frame_body(q, cfg, dom, mp, ma))(p),
            donate_argnums=(0,),
        )
    else:
        p, dom = scene.dam_break(jax.random.key(seed), cfg, n=n)
        run = jax.jit(
            lambda p, mp, ma: step.frame_body(p, cfg, dom, mp, ma, backend),
            donate_argnums=(0,),
        )
    mp, ma = step.no_mouse()

    p = jax.block_until_ready(run(p, mp, ma))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(frames):
        p = run(p, mp, ma)
    jax.block_until_ready(p)
    dt = time.perf_counter() - t0
    per_frame = dt / frames
    total = n * (batch or 1) * cfg.iterations * frames
    return total / dt, per_frame


CONFIGS = {
    # name: (dim, particles, frames, batch, baseline_key)
    "2d-ref": (2, 4096, 20, None, "2d_reference_frame"),
    "3d-ref": (3, 4096, 20, None, "3d_reference_frame"),
    "2d-100k": (2, 100_000, 10, None, "2d_100k"),
    "3d-1m": (3, 1_000_000, 3, None, "3d_1m"),
    "batch-64": (3, 4096, 3, 64, "3d_reference_frame"),
}


def run_config(name, backend, quick, baselines):
    from fluid_tpu.config import default_2d, default_3d

    dim, n, frames, batch, bkey = CONFIGS[name]
    if quick:
        n = min(n, 20_000)
        frames = max(2, frames // 4)
        batch = min(batch, 8) if batch else None
    cfg = default_2d() if dim == 2 else default_3d()

    if backend == "auto":
        candidates = ["dense", "sorted"]
        timed = {}
        for b in candidates:
            try:
                pps, spf = _bench_frame(cfg, n, max(2, frames // 2), b, batch=batch)
                timed[b] = (pps, spf)
            except Exception as e:  # noqa: BLE001 — a backend may be unsupported
                print(f"# backend {b} failed: {e}", file=sys.stderr)
        backend, (pps, spf) = max(timed.items(), key=lambda kv: kv[1][0])
    else:
        pps, spf = _bench_frame(cfg, n, frames, backend, batch=batch)

    base = baselines.get(bkey, {}).get("particle_steps_per_sec")
    vs = (pps / base) if base else 0.0
    if batch:
        # baseline key is per-scene serial; scale denominator by batch
        vs = (pps / (base * 1.0)) if base else 0.0
    return {
        "config": name,
        "backend": backend,
        "particles": n * (batch or 1),
        "value": round(pps),
        "unit": "particle-steps/s",
        "s_per_frame": round(spf, 5),
        "vs_baseline": round(vs, 2),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="3d-1m", choices=[*CONFIGS, "all"])
    ap.add_argument("--backend", default="auto", choices=("auto", "dense", "sorted", "pallas"))
    ap.add_argument("--platform", default=None, choices=(None, "cpu", "tpu"))
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args(argv)

    if args.platform == "cpu":
        from fluid_tpu.utils.platform import force_cpu

        force_cpu()

    import jax

    baselines = _load_baseline()
    names = list(CONFIGS) if args.config == "all" else [args.config]
    results = [run_config(n, args.backend, args.quick, baselines) for n in names]

    for r in results[:-1]:
        print(json.dumps(r))
    head = results[-1]
    out = {
        "metric": f"particle-steps/sec ({head['config']}, backend={head['backend']}, "
        f"{jax.devices()[0].platform})",
        "value": head["value"],
        "unit": head["unit"],
        "vs_baseline": head["vs_baseline"],
        "s_per_frame": head["s_per_frame"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
