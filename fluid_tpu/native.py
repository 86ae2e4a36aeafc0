"""ctypes bindings for the native serial C++ engine (native/fluid_native.cpp).

Role 1: the measured CPU baseline — the reference is a serial Rust binary
with no published numbers (SURVEY.md §6) and no Rust toolchain exists here,
so this identical-semantics serial C++ engine provides bench.py's
``vs_baseline`` denominator.

Role 2: a host-CPU fallback engine with the same SoA state API as the JAX
path (useful where no accelerator is available at all).

Build: ``make -C native`` (g++, no external deps).
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from .config import Config
from .domain import Domain, make_domain
from .state import ParticleState

_LIB_PATH = Path(__file__).resolve().parent.parent / "native" / "libfluid_native.so"


class _Params(ctypes.Structure):
    _fields_ = [
        ("dt", ctypes.c_float),
        ("rest_density", ctypes.c_float),
        ("dynamic_viscosity", ctypes.c_float),
        ("eos_stiffness", ctypes.c_float),
        ("eos_power", ctypes.c_float),
        ("pressure_floor", ctypes.c_float),
        ("mouse_radius", ctypes.c_float),
        ("boundary_damp_dist", ctypes.c_float),
        ("gravity", ctypes.c_float * 3),
        ("clip_lo", ctypes.c_float * 3),
        ("clip_hi", ctypes.c_float * 3),
        ("grid_origin", ctypes.c_int32 * 3),
        ("grid_shape", ctypes.c_int32 * 3),
    ]


def available() -> bool:
    return _LIB_PATH.exists()


def _load():
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.fluid_native_step.restype = None
    fp = ctypes.POINTER(ctypes.c_float)
    lib.fluid_native_step.argtypes = [
        ctypes.c_int, ctypes.c_int64, fp, fp, fp, fp, fp, fp,
        ctypes.c_int, ctypes.POINTER(_Params), fp, fp, fp,
    ]
    lib.fluid_native_abi_version.restype = ctypes.c_int64
    assert lib.fluid_native_abi_version() == 1
    return lib


def _params(cfg: Config, domain: Domain) -> _Params:
    p = _Params()
    p.dt = cfg.dt
    p.rest_density = cfg.rest_density
    p.dynamic_viscosity = cfg.dynamic_viscosity
    p.eos_stiffness = cfg.eos_stiffness
    p.eos_power = cfg.eos_power
    p.pressure_floor = cfg.pressure_floor
    p.mouse_radius = cfg.mouse_radius
    p.boundary_damp_dist = cfg.boundary_damp_dist
    for d in range(cfg.dim):
        p.gravity[d] = cfg.gravity[d]
        p.clip_lo[d] = cfg.boundary_clip[0][d]
        p.clip_hi[d] = cfg.boundary_clip[1][d]
        p.grid_origin[d] = domain.origin[d]
        p.grid_shape[d] = domain.shape[d]
    return p


class NativeSim:
    """Host-CPU simulation with the same state surface as the JAX path."""

    def __init__(self, cfg: Config, p: ParticleState, domain: Optional[Domain] = None):
        if not available():
            raise RuntimeError(
                f"native engine not built: run `make -C native` (missing {_LIB_PATH})"
            )
        self._lib = _load()
        self.cfg = cfg
        self.domain = domain or make_domain(cfg)
        # np.asarray on a CPU jax array can be a zero-copy VIEW of the device
        # buffer; the engine mutates in place, so force owned copies.
        self.pos = np.array(p.pos, np.float32, copy=True, order="C")
        self.vel = np.array(p.vel, np.float32, copy=True, order="C")
        self.C = np.array(p.C, np.float32, copy=True, order="C")
        self.mass = np.array(p.mass, np.float32, copy=True, order="C")
        self.density = np.zeros_like(self.mass)
        self.pressure = np.zeros_like(self.mass)
        ncells = self.domain.num_cells
        self._grid_m = np.zeros(ncells, np.float32)
        self._grid_v = np.zeros(ncells * cfg.dim, np.float32)
        self._prm = _params(cfg, self.domain)

    def step(self, substeps: Optional[int] = None, mouse: Optional[Tuple[float, float]] = None):
        n = len(self.mass)
        fp = ctypes.POINTER(ctypes.c_float)
        mouse_arr = None
        if mouse is not None:
            mouse_arr = (ctypes.c_float * 2)(mouse[0], mouse[1])
        self._lib.fluid_native_step(
            self.cfg.dim,
            n,
            self.pos.ctypes.data_as(fp),
            self.vel.ctypes.data_as(fp),
            self.C.ctypes.data_as(fp),
            self.mass.ctypes.data_as(fp),
            self.density.ctypes.data_as(fp),
            self.pressure.ctypes.data_as(fp),
            self.cfg.iterations if substeps is None else substeps,
            ctypes.byref(self._prm),
            self._grid_m.ctypes.data_as(fp),
            self._grid_v.ctypes.data_as(fp),
            ctypes.cast(mouse_arr, fp) if mouse_arr is not None else ctypes.cast(None, fp),
        )

    def state(self) -> ParticleState:
        import jax.numpy as jnp

        return ParticleState(
            pos=jnp.asarray(self.pos),
            vel=jnp.asarray(self.vel),
            C=jnp.asarray(self.C),
            mass=jnp.asarray(self.mass),
            density=jnp.asarray(self.density),
            pressure=jnp.asarray(self.pressure),
        )
