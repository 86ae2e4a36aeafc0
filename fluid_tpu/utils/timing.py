"""Per-phase device timing — parity with the reference's instrumentation.

The reference wraps each of the five pipeline phases in ``Instant`` timers and
shows the **last** substep's durations under the sim view
(``2d_multi.rs:112-132,479-487``).  A fused XLA frame has no host-visible
phase boundaries, so ``PhaseTimer`` jits each phase separately and blocks on
the result — same labels (``clear`` is gone: zero-init fuses into the scatter
and costs nothing, SURVEY.md §5.1).

This path exists for the diagnostic overlay only; the production path is the
fused ``step.frame``.
"""

from __future__ import annotations

import time
from typing import List, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..domain import Domain
from ..state import ParticleState
from ..step import _get_backend


class PhaseTimer:
    """Runs a frame phase-by-phase, reporting the last substep's times."""

    def __init__(self, cfg: Config, domain: Domain, backend: str = "dense"):
        self.cfg = cfg
        self.domain = domain
        ops = _get_backend(backend)
        if not hasattr(ops, "p2g_1"):
            # Fused backend (sorted/tiled/pallas): all phases run in one XLA
            # program, so the honest granularity is the whole substep.  The
            # simulation ALWAYS runs the requested backend — timing must never
            # change what is being simulated.
            self._fused = jax.jit(
                lambda p, mp, ma: ops.substep(p, cfg, domain, mp, ma)[0]
            )
            return
        self._fused = None
        self._p2g_1 = jax.jit(lambda p: ops.p2g_1(p, cfg, domain))
        self._p2g_2 = jax.jit(lambda p, g: ops.p2g_2(p, g, cfg, domain))
        self._update = jax.jit(lambda g: ops.grid_update(g, cfg))
        self._g2p = jax.jit(
            lambda p, g, mp, ma, rho, prs: ops.g2p(
                p, g, cfg, domain, mp, ma, rho, prs
            )
        )

    def frame(
        self, p: ParticleState, mouse_pos, mouse_active
    ) -> Tuple[ParticleState, List[Tuple[str, float]]]:
        times: List[Tuple[str, float]] = []
        if self._fused is not None:
            for _ in range(self.cfg.iterations):
                times.clear()
                t0 = time.perf_counter()
                p = jax.block_until_ready(self._fused(p, mouse_pos, mouse_active))
                times.append(("substep", time.perf_counter() - t0))
            return p, times
        for _ in range(self.cfg.iterations):
            times.clear()  # keep only the last substep (2d_multi.rs:112)

            t0 = time.perf_counter()
            grid = jax.block_until_ready(self._p2g_1(p))
            times.append(("p2g 1", time.perf_counter() - t0))

            t0 = time.perf_counter()
            grid, rho, prs = jax.block_until_ready(self._p2g_2(p, grid))
            times.append(("p2g 2", time.perf_counter() - t0))

            t0 = time.perf_counter()
            grid = jax.block_until_ready(self._update(grid))
            times.append(("update", time.perf_counter() - t0))

            t0 = time.perf_counter()
            p = jax.block_until_ready(
                self._g2p(p, grid, mouse_pos, mouse_active, rho, prs)
            )
            times.append(("g2p", time.perf_counter() - t0))
        return p, times

class StreamPhaseTimer:
    """Stage-split timing for the PRODUCTION stream path (VERDICT r3 #7).

    The reference shows five phase timings every frame while simulating at
    full speed (``2d_multi.rs:479-487``); the fused stream frame has no
    host-visible stage boundaries, so this probes each substep stage
    (dep1 / halo(m) / dep2(m+f) / halo+gblk / collect, plus a re-bin) ON
    the session's post-frame binned state and DISCARDS the outputs — the
    simulation itself stays the fused ``Session`` path, so timing never
    changes what is simulated.  Stage closures mirror
    ``stream_transfer._substep_core`` (same kernels, same dynamic-grid
    bounds).  The first frame's numbers include one-time stage compiles;
    steady state from frame 2.
    """

    def __init__(self, cfg: Config, domain: Domain, spec, n: int):
        import functools

        from ..ops import stream_transfer as stx

        self.cfg = cfg
        tshape, origin, nt = stx._geom(domain, spec)
        # the PRODUCTION stage closures (round 5: one definition site —
        # _substep_core composes these same functions, so the overlay can
        # never drift from what the fused frame actually runs)
        stages = stx.substep_stages(cfg, domain, spec, fused=False)
        self._dep1 = jax.jit(stages.dep1)
        self._halo_m = jax.jit(stages.halo_m)
        self._dep2 = jax.jit(stages.dep2)
        self._halo_gblk = jax.jit(stages.halo_gblk)
        self._collect = jax.jit(
            lambda st, gblk, mp, ma: stages.collect(st, gblk, mp, ma)[0]
        )
        self._rebin = jax.jit(
            functools.partial(
                stx._rebin_full, cfg=cfg, domain=domain, spec=spec,
                tshape=tshape, nt=nt, n=n,
            )
        )

    @staticmethod
    def _timed(times, label, fn, *args):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(leaf.ravel()[0])  # real fetch — surfaces device faults
        times.append((label, time.perf_counter() - t0))
        return out

    def probe(self, st, mouse_pos, mouse_active) -> List[Tuple[str, float]]:
        """One substep's stage times on ``st`` (state is NOT advanced)."""
        times: List[Tuple[str, float]] = []
        d1 = self._timed(times, "dep1", self._dep1, st)
        hm = self._timed(times, "halo m", self._halo_m, st, d1)
        d2 = self._timed(times, "dep2 m+f", self._dep2, st, d1, hm)
        gb = self._timed(times, "halo+gblk", self._halo_gblk, st, d2, hm)
        self._timed(times, "collect", self._collect, st, gb, mouse_pos, mouse_active)
        self._timed(times, "rebin", self._rebin, st)
        return times
