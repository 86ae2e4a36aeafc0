#!/usr/bin/env python
"""Tunnel health probe: per-dispatch latency + small-kernel throughput.

Healthy axon tunnel (measured rounds 3-4): ~1-3 ms per jitted dispatch
round-trip, ~25-30 ms for a fused 3d-ref stream frame.  A degraded tunnel
shows 5-10x those numbers while still returning correct values — timings
taken then are garbage and must not be recorded (CLAUDE.md round-2 facts:
the round-3 session-2 tunnel death was preceded by exactly this signature).

Prints one JSON line: {"dispatch_ms": ..., "mm_ms": ..., "healthy": bool}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    x = jax.device_put(x, dev)
    float(f(x).ravel()[0])  # compile + warm
    t0 = time.perf_counter()
    reps = 30
    for _ in range(reps):
        x = f(x)
    val = float(x.ravel()[0])  # value fetch: real timings only if fetched
    dispatch_ms = (time.perf_counter() - t0) / reps * 1e3
    assert val == float(reps), val

    g = jax.jit(
        lambda a, b: jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST)
    )
    a = jax.device_put(jnp.ones((1024, 1024), jnp.float32), dev)
    float(g(a, a).ravel()[0])
    t0 = time.perf_counter()
    y = a
    for _ in range(10):
        y = g(y, a)
    float(y.ravel()[0])
    mm_ms = (time.perf_counter() - t0) / 10 * 1e3

    healthy = dispatch_ms < 5.0 and mm_ms < 10.0
    print(json.dumps({
        "dispatch_ms": round(dispatch_ms, 3),
        "mm_ms": round(mm_ms, 3),
        "healthy": healthy,
    }))
    return 0 if healthy else 1


if __name__ == "__main__":
    raise SystemExit(main())
