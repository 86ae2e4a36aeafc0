"""A/B the 2D stream active budget on device (round-3 regression hunt).

Round 3 replaced the x20 rest-density estimate budget with an occupancy
probe (needed-relay closure x ladder mult).  3D got faster; BOTH 2D bench
configs got ~25% slower vs round 2.  This measures 2d-100k frames with the
probed spec vs the old estimate spec (pos=None skips the probe) to pin the
cause.  Usage: python bench/micro_2d_budget.py [--config 2d-100k|2d-ref]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="2d-100k")
    ap.add_argument("--frames", type=int, default=5)
    args = ap.parse_args()

    import bench as B

    dim, n, _, batch, _, _ = B.CONFIGS[args.config]
    cfg, p, dom = B._make_scene(dim, n, batch)

    import jax

    specs = {
        "probed(x1.5)": B._stream_spec(cfg, dom, n, pos=p.pos),
        "estimate(x20)": B._stream_spec(cfg, dom, n, pos=None),
    }
    # the last NUMERIC rung (the final rung None = the estimate spec above)
    B._ACTIVE_MULT = [m for m in B._ACTIVE_MULTS if m is not None][-1]
    specs["probed(x%g)" % B._ACTIVE_MULT[0]] = B._stream_spec(cfg, dom, n, pos=p.pos)
    B._ACTIVE_MULT = B._ACTIVE_MULTS[0]

    for name, spec in specs.items():
        pcopy = jax.tree.map(lambda a: a.copy(), p)
        try:
            pps, spf, _ = B._bench_frame(
                cfg, pcopy, dom, args.frames, "stream", batch, spec_override=spec
            )
            print(
                f"{name:>16}: active={spec.active:>6} {pps:>13,.0f} pps"
                f"  {spf*1e3:8.2f} ms/frame"
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name:>16}: active={spec.active:>6} FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
