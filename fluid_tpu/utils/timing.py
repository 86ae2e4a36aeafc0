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
        D = cfg.dim
        tshape, origin, nt = stx._geom(domain, spec)
        T, E, EP, E3 = spec.tile, spec.E, spec.EP(D), spec.E**D
        A, NG, G = spec.A, spec.NG, spec.group
        GROWS = stx.GROWS
        r3 = stx._use_r3(spec, D)
        dep1_k = stx.make_deposit_kernel(spec, D, tshape, origin, "p2g1")
        dep2_k = stx.make_deposit_kernel(spec, D, tshape, origin, "p2g2")
        coll_k = stx.make_collect_kernel(spec, D, tshape, origin)
        params6 = jnp.asarray(
            [cfg.dt, cfg.rest_density, cfg.eos_stiffness, cfg.eos_power,
             cfg.pressure_floor, cfg.dynamic_viscosity],
            jnp.float32,
        )
        gvec = jnp.asarray(cfg.gravity, jnp.float32)

        def _no(st):
            return stx._n_occ(st.count) if spec.dyn else None

        def dep1(st):
            return dep1_k(st.count, st.tid, st.stream, n_asgn=_no(st))

        if r3:
            S1 = E3 // 128

            def halo_m(st, d1v):
                occ_t = (st.count > 0)[:, None, None]
                d1 = jnp.where(occ_t, d1v.reshape(A, GROWS * S1, 128), 0.0)
                return stx.halo_pull(
                    d1[:, :S1].reshape(A, E3), st.nbr, tshape, T, E
                ).reshape(A, S1, 128)

            def dep2(st, d1v, hs_m3):
                return dep2_k(
                    st.count, st.tid, st.stream,
                    mgblk=hs_m3.reshape(NG, G * S1, 128), params=params6,
                    d1blk=d1v, n_asgn=_no(st),
                )

            def halo_gblk(st, d2v, hs_m3):
                occ_t = (st.count > 0)[:, None, None]
                mf3 = jnp.where(occ_t, d2v.reshape(A, D * S1, 128), 0.0)
                if not spec.interpret:
                    na = stx._n_asgn(st.tid, nt) if spec.dyn else None
                    for d in range(D - 1):
                        mf3 = stx._make_halo_axis(spec, D, d, D)(
                            mf3, st.nbrg[2 * d], st.nbrg[2 * d + 1], n_asgn=na
                        )
                    return stx._make_halo_gblk(spec, D, D - 1, cfg.dt, cfg.gravity)(
                        mf3, hs_m3, st.nbrg[2 * (D - 1)],
                        st.nbrg[2 * (D - 1) + 1], n_asgn=_no(st),
                    ).reshape(NG, G * GROWS * S1, 128)
                hs_mf3 = stx.halo3(mf3, st.nbr, spec, D, D)
                mfv = hs_mf3.reshape(A, D, S1, 128)
                mav = hs_m3[:, None]
                vv = jnp.where(
                    mav > 0.0,
                    mfv / jnp.where(mav > 0.0, mav, 1.0)
                    + cfg.dt * gvec[None, :, None, None],
                    0.0,
                )
                return jnp.concatenate(
                    [vv.reshape(A, D * S1, 128), hs_m3], axis=1
                ).reshape(NG, G * GROWS * S1, 128)
        else:

            def halo_m(st, d1v):
                occ_t = (st.count > 0)[:, None, None]
                blk1 = jnp.where(
                    occ_t, d1v.reshape(A, GROWS, EP)[:, : 1 + D, :E3], 0.0
                )
                return stx.halo_stream(blk1[:, 0, :], st.nbr, tshape, spec, D, 1)

            def dep2(st, d1v, hs_m):
                mgblk = jnp.pad(hs_m, ((0, 0), (0, EP - E3))).reshape(NG, G, EP)
                return dep2_k(
                    st.count, st.tid, st.stream, mgblk=mgblk, params=params6,
                    d1blk=d1v, n_asgn=_no(st),
                )

            def halo_gblk(st, d2v, hs_m):
                occ_t = (st.count > 0)[:, None, None]
                blk2 = jnp.where(occ_t, d2v.reshape(A, D, EP)[:, :, :E3], 0.0)
                hs_mf = stx.halo_stream(
                    blk2.reshape(A, D * E3), st.nbr, tshape, spec, D, D
                )
                mf = hs_mf.reshape(A, D, E3)
                ma_ = hs_m.reshape(A, 1, E3)
                v = jnp.where(
                    ma_ > 0.0,
                    mf / jnp.where(ma_ > 0.0, ma_, 1.0)
                    + cfg.dt * gvec[None, :, None],
                    0.0,
                )
                gb = jnp.concatenate([v, ma_], axis=1)
                gb = jnp.pad(gb, ((0, 0), (0, GROWS - 1 - D), (0, EP - E3)))
                return gb.reshape(NG, G * GROWS, EP)

        def collect(st, gblk, mp, ma):
            params = stx._collect_params(cfg, mp, ma, D, spec.scene_stride)
            return coll_k(
                st.count, st.tid, params, st.stream, gblk, n_asgn=_no(st)
            )[0]

        self._dep1 = jax.jit(dep1)
        self._halo_m = jax.jit(halo_m)
        self._dep2 = jax.jit(dep2)
        self._halo_gblk = jax.jit(halo_gblk)
        self._collect = jax.jit(collect)
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
