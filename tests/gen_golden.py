#!/usr/bin/env python
"""Regenerate the frozen golden-trajectory fixtures (tests/data/*.npz).

Run from the repo root:  python tests/gen_golden.py [--long-only]

Fixtures are produced by the scalar NumPy oracle (tests/oracle.py — an
independent transcription of the reference semantics, 2d_multi.rs:110-359)
and pinned with the initial state so the JAX path can be replayed against
them.  The *_100 fixtures cover SURVEY.md §7.3-4's long-horizon requirement:
f32 reduction-order drift must stay within the 1e-3 north-star tolerance
over >= 100 substeps, not just one frame.
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from fluid_tpu.config import default_2d, default_3d  # noqa: E402
from tests.oracle import OracleSim  # noqa: E402

DATA = pathlib.Path(__file__).parent / "data"


def _initial_state(cfg, n, seed):
    rng = np.random.default_rng(seed)
    pos = np.stack(
        [rng.uniform(18.0, 44.0, n) for _ in range(cfg.dim)], axis=-1
    ).astype(np.float32)
    vel = rng.normal(0, 0.3, (n, cfg.dim)).astype(np.float32)
    C = rng.normal(0, 0.05, (n, cfg.dim, cfg.dim)).astype(np.float32)
    return pos, vel, C


def freeze(name, cfg, n, substeps, seed):
    pos, vel, C = _initial_state(cfg, n, seed)
    o = OracleSim(cfg, pos, vel, C)
    for i in range(substeps):
        o.substep()
    np.savez(
        DATA / f"{name}.npz",
        pos0=pos, vel0=vel, C0=C, substeps=substeps,
        pos=o.pos.astype(np.float32), vel=o.vel.astype(np.float32),
        C=o.C.astype(np.float32),
        density=o.density.astype(np.float32),
        pressure=o.pressure.astype(np.float32),
    )
    print(f"wrote {name}.npz  (n={n}, {substeps} substeps)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--long-only", action="store_true")
    args = ap.parse_args()
    DATA.mkdir(exist_ok=True)
    if not args.long_only:
        freeze("golden_2d", default_2d(), 96, 8, seed=7)
        freeze("golden_3d", default_3d(), 96, 8, seed=7)
    freeze("golden_2d_100", default_2d(), 96, 100, seed=13)
    freeze("golden_3d_100", default_3d(), 96, 100, seed=13)


if __name__ == "__main__":
    main()
