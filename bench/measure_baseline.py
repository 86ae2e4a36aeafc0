"""Measure the serial-CPU baseline (the reference-equivalent denominator).

The reference publishes no numbers and no Rust toolchain exists here
(SURVEY.md §6), so the denominator is the identical-semantics serial C++
engine (native/fluid_native.cpp, equivalence-tested against the JAX path at
1e-5).  Results are written to BASELINE_MEASURED.json and committed; bench.py
reads them to compute vs_baseline.

Run on the bench host:  python bench/measure_baseline.py
"""

from __future__ import annotations

import json
import platform
import time
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> None:
    from fluid_tpu.utils.platform import force_cpu

    force_cpu()
    import jax

    from fluid_tpu import native, scene
    from fluid_tpu.config import default_2d, default_3d

    if not native.available():
        raise SystemExit("build the native engine first: make -C native")

    results = {}

    def measure(name, cfg, n, substeps, repeats=3):
        p, dom = scene.dam_break(jax.random.key(0), cfg, n=n)
        sim = native.NativeSim(cfg, p, dom)
        sim.step(substeps=2)  # warm caches
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            sim.step(substeps=substeps)
            best = min(best, time.perf_counter() - t0)
        pps = n * substeps / best
        results[name] = {
            "particles": n,
            "substeps": substeps,
            "seconds": best,
            "particle_steps_per_sec": pps,
        }
        print(f"{name}: {best:.3f}s for {n}x{substeps} -> {pps:,.0f} particle-steps/s")

    # Reference workloads (4096 particles, 31 substeps/frame)
    measure("2d_reference_frame", default_2d(), 4096, 31)
    measure("3d_reference_frame", default_3d(), 4096, 31)
    # Scaling points for the north-star config
    measure("2d_100k", default_2d(), 100_000, 8, repeats=2)
    measure("3d_1m", default_3d(), 1_000_000, 4, repeats=2)

    out = {
        "engine": "native/fluid_native.cpp (serial C++, identical semantics)",
        "host": platform.platform(),
        "cpu_count": 1,
        "results": results,
    }
    path = ROOT / "BASELINE_MEASURED.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
