"""Scalar NumPy oracle — an independent transcription of the reference
MLS-MPM substep semantics (``2d_multi.rs:110-359`` / ``3d_multi.rs:110-381``)
used as ground truth for golden/equivalence tests (SURVEY.md §4.2).

Deliberately written with explicit per-particle loops and a dense grid, in
float32, mirroring the reference's control flow (including quirks Q1-Q3:
un-scaled soft-wall lookahead, post-advect mouse impulse, per-tap bounds
checks).  It is slow and only meant for small N / few substeps.
"""

from __future__ import annotations

import itertools

import numpy as np


class OracleSim:
    def __init__(self, cfg, pos, vel=None, C=None, mass=None):
        """cfg: a fluid_tpu.config.Config; pos: [N, D] float32."""
        self.cfg = cfg
        self.dim = cfg.dim
        self.pos = np.array(pos, np.float32)
        n = len(self.pos)
        self.vel = np.zeros((n, self.dim), np.float32) if vel is None else np.array(vel, np.float32)
        self.C = np.zeros((n, self.dim, self.dim), np.float32) if C is None else np.array(C, np.float32)
        self.mass = np.ones((n,), np.float32) if mass is None else np.array(mass, np.float32)
        self.density = np.zeros((n,), np.float32)
        self.pressure = np.zeros((n,), np.float32)

        # set_rect geometry (2d_multi.rs:79-102) over boundary_clip
        res = cfg.grid_res
        lo, hi = cfg.boundary_clip
        a_min = [int(np.floor(x / res)) for x in lo]
        a_max = [int(np.floor(x / res)) + 1 for x in hi]
        self.p_min = np.array([k - 1 for k in a_min], np.int64)
        self.p_max = np.array([k + 1 for k in a_max], np.int64)
        self.origin = self.p_min * res
        self.shape = tuple((self.p_max - self.p_min) * res)

        self.grid_m = np.zeros(self.shape, np.float32)
        self.grid_v = np.zeros((*self.shape, self.dim), np.float32)

        self.offsets = np.array(
            [c[::-1] for c in itertools.product(range(3), repeat=self.dim)], np.int64
        )

    # -- helpers -----------------------------------------------------------

    def _weights(self, diff):
        """[3, D] quadratic B-spline weights (2d_multi.rs:368-374)."""
        return np.stack(
            [
                0.5 * (0.5 - diff) ** 2,
                0.75 - diff**2,
                0.5 * (0.5 + diff) ** 2,
            ]
        ).astype(np.float32)

    def _taps(self, p):
        """Per-tap (index-tuple-or-None, weight, dpos) for particle p."""
        pos = self.pos[p]
        cell = np.floor(pos).astype(np.int64)
        diff = (pos - (cell + 0.5)).astype(np.float32)
        ws = self._weights(diff)
        out = []
        for n in self.offsets:
            cell_n = cell + n - 1
            dpos = ((cell_n + 0.5) - pos).astype(np.float32)  # = -cell_diff_n
            w = np.float32(1.0)
            for d in range(self.dim):
                w = np.float32(w * ws[n[d], d])
            idx = cell_n - self.origin
            if np.any(idx < 0) or np.any(idx >= np.array(self.shape)):
                out.append((None, w, dpos))
            else:
                out.append((tuple(idx), w, dpos))
        return out

    # -- phases ------------------------------------------------------------

    def substep(self, mouse=None):
        cfg = self.cfg
        self.grid_m[...] = 0.0
        self.grid_v[...] = 0.0

        # p2g_1 (2d_multi.rs:148-180)
        for p in range(len(self.pos)):
            for idx, w, dpos in self._taps(p):
                if idx is None:
                    continue
                q = self.C[p] @ dpos
                mc = np.float32(w * self.mass[p])
                self.grid_m[idx] += mc
                self.grid_v[idx] += mc * (self.vel[p] + q)

        # p2g_2 (2d_multi.rs:182-238)
        for p in range(len(self.pos)):
            taps = self._taps(p)
            density = np.float32(0.0)
            for idx, w, _ in taps:
                if idx is None:
                    continue
                density = np.float32(density + self.grid_m[idx] * w)
            volume = np.float32(self.mass[p] / density)
            pressure = np.float32(
                max(
                    cfg.pressure_floor,
                    cfg.eos_stiffness
                    * ((density / cfg.rest_density) ** cfg.eos_power - 1.0),
                )
            )
            self.density[p] = density
            self.pressure[p] = pressure
            strain = self.C[p] + self.C[p].T
            stress = (-pressure * np.eye(self.dim) + cfg.dynamic_viscosity * strain).astype(np.float32)
            term = (-4.0 * volume * stress * cfg.dt).astype(np.float32)
            for idx, w, dpos in taps:
                if idx is None:
                    continue
                self.grid_v[idx] += w * (term @ dpos)

        # update_grid (2d_multi.rs:240-250)
        g = np.asarray(cfg.gravity, np.float32)
        m = self.grid_m
        with np.errstate(divide="ignore", invalid="ignore"):
            v = self.grid_v / m[..., None]
        v = np.where(m[..., None] > 0, v + np.float32(cfg.dt) * g, 0.0).astype(np.float32)
        self.grid_v = v

        # g2p (2d_multi.rs:252-359)
        lo = np.asarray(cfg.boundary_clip[0], np.float32)
        hi = np.asarray(cfg.boundary_clip[1], np.float32)
        for p in range(len(self.pos)):
            taps = self._taps(p)
            vel = np.zeros(self.dim, np.float32)
            B = np.zeros((self.dim, self.dim), np.float32)
            for idx, w, dpos in taps:
                if idx is None:
                    continue
                wv = self.grid_v[idx] * w
                B += np.outer(wv, dpos)
                vel += wv
            self.C[p] = 4.0 * B
            pos = self.pos[p] + vel * np.float32(cfg.dt)

            if mouse is not None:
                d = pos[:2] - np.asarray(mouse, np.float32)
                if d @ d < cfg.mouse_radius**2:
                    nrm = np.sqrt(d @ d)
                    push = d / nrm if nrm > 0 else np.zeros(2, np.float32)
                    vel[:2] += push

            pos = np.clip(pos, lo, hi)
            nxt = pos + vel
            wall_min = lo + np.float32(cfg.boundary_damp_dist)
            wall_max = hi - np.float32(cfg.boundary_damp_dist)
            for d in range(self.dim):
                if nxt[d] < wall_min[d]:
                    vel[d] += wall_min[d] - nxt[d]
                if nxt[d] > wall_max[d]:
                    vel[d] += wall_max[d] - nxt[d]
            self.pos[p] = pos
            self.vel[p] = vel

    def step(self, mouse=None):
        for _ in range(self.cfg.iterations):
            self.substep(mouse)
