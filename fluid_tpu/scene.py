"""Scene construction — dam-break seeding and batched randomized scenes.

Parity with the reference's ``main`` seeding (``2d_multi.rs:502-512`` /
``3d_multi.rs:525-536``): 4096 unit-mass particles uniformly random in
``[16, 48]^2`` (2D) or ``[16, 32]^3`` (3D), zero velocity, zero affine
momentum, then ``set_rect((0,0),(64,64))``.

The reference's ``add_particle``/hash-map insertion (``2d_multi.rs:104-108``)
has no equivalent: scenes are built as whole arrays via ``jax.random`` (a
counter-based, reproducible PRNG — seeding differences vs the reference's
``rand::rng()`` are immaterial since the reference is unseeded/entropy-based).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .config import Config, default_2d, default_3d
from .domain import Domain, make_domain
from .state import ParticleState

# Reference seeding boxes (2d_multi.rs:504-507, 3d_multi.rs:527-531).
SEED_BOX_2D = ((16.0, 16.0), (48.0, 48.0))
SEED_BOX_3D = ((16.0, 16.0, 16.0), (32.0, 32.0, 32.0))
REFERENCE_N = 4096


def dam_break(
    key: jax.Array,
    cfg: Config,
    n: int = REFERENCE_N,
    box: Optional[Tuple[Tuple[float, ...], Tuple[float, ...]]] = None,
) -> Tuple[ParticleState, Domain]:
    """Uniform-random block of fluid, reference-style.

    Returns the particle state and the static domain (the ``set_rect`` analog,
    ``2d_multi.rs:513``).
    """
    if box is None:
        box = SEED_BOX_2D if cfg.dim == 2 else SEED_BOX_3D
    lo = jnp.asarray(box[0], jnp.float32)
    hi = jnp.asarray(box[1], jnp.float32)
    pos = jax.random.uniform(key, (n, cfg.dim), jnp.float32, lo, hi)
    return ParticleState.create(pos), make_domain(cfg)


def batched_dam_break(
    key: jax.Array,
    cfg: Config,
    batch: int,
    n: int = REFERENCE_N,
    jitter: float = 8.0,
) -> Tuple[ParticleState, Domain]:
    """A [batch, N, ...] stack of randomized dam-break scenes for the vmapped
    parameter-sweep configuration (BASELINE.json config 5: 64 randomized 3D
    scenes).  Each scene's seed box is randomly translated by up to ``jitter``
    world units (kept inside the boundary)."""
    box = SEED_BOX_2D if cfg.dim == 2 else SEED_BOX_3D
    lo = jnp.asarray(box[0], jnp.float32)
    hi = jnp.asarray(box[1], jnp.float32)
    clip_lo = jnp.asarray(cfg.boundary_clip[0], jnp.float32)
    clip_hi = jnp.asarray(cfg.boundary_clip[1], jnp.float32)

    k_shift, k_pos = jax.random.split(key)
    shift = jax.random.uniform(k_shift, (batch, cfg.dim), jnp.float32, -jitter, jitter)
    shift = jnp.clip(shift, clip_lo - lo, clip_hi - hi)
    pos = jax.random.uniform(k_pos, (batch, n, cfg.dim), jnp.float32, lo, hi)
    pos = pos + shift[:, None, :]
    state = jax.vmap(ParticleState.create)(pos)
    return state, make_domain(cfg)


def add_particles(state: ParticleState, pos, vel=None, C=None, mass=None) -> ParticleState:
    """Append particles to a scene (the ``add_particle`` analog,
    ``2d_multi.rs:104-108``) — returns a NEW fixed-size state; call while
    building scenes, not inside jit (shapes change)."""
    extra = ParticleState.create(pos, vel=vel, C=C, mass=mass)
    return jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0), state, extra)


def reference_scene_2d(seed: int = 0, n: int = REFERENCE_N):
    """The exact reference 2D app scene (config + particles + domain)."""
    cfg = default_2d()
    p, dom = dam_break(jax.random.key(seed), cfg, n)
    return cfg, p, dom


def reference_scene_3d(seed: int = 0, n: int = REFERENCE_N):
    """The exact reference 3D app scene (config + particles + domain)."""
    cfg = default_3d()
    p, dom = dam_break(jax.random.key(seed), cfg, n)
    return cfg, p, dom


# ---------------------------------------------------------------------------
# Scene packing — batched scenes as ONE spatial domain (stream backend DP)
# ---------------------------------------------------------------------------


def pack_scenes(
    state: ParticleState, cfg: Config, halo_cells: int = 4
) -> Tuple[ParticleState, Domain, float]:
    """Lay a [batch, N, ...] stack of scenes side by side along x in one
    packed domain (disjoint grids; per-scene walls via the stream backend's
    ``scene_stride``).

    Data parallelism over scenes becomes plain extra-N for the spatial
    backend: one stream, one kernel grid, no vmap — each scene keeps its own
    boundary box (the collect kernel clips x within
    ``[k*stride, k*stride + world]`` for scene k).  Scenes can never
    interact: the per-scene grids are separated by ``2*halo_cells`` unused
    cells and positions are clipped inside each scene's walls.

    Returns (packed_particles [batch*N], packed_domain, stride).
    """
    import math

    if state.pos.ndim != 3:
        raise ValueError("pack_scenes expects a [batch, N, D] particle stack")
    batch, n, D = state.pos.shape
    lo, hi = cfg.boundary_clip
    if any(abs(l) > 1e-6 for l in lo):
        raise ValueError("pack_scenes assumes boundary_clip starting at 0")
    world = hi[0]
    stride = float(-(-int(math.ceil(world) + 2 * halo_cells) // 8) * 8)

    offsets = jnp.arange(batch, dtype=jnp.float32) * stride  # [batch]
    pos = state.pos.at[..., 0].add(offsets[:, None])
    flat = lambda a: a.reshape((batch * n,) + a.shape[2:])
    packed = ParticleState(
        pos=flat(pos), vel=flat(state.vel), C=flat(state.C),
        mass=flat(state.mass), density=flat(state.density),
        pressure=flat(state.pressure),
    )

    origin = tuple([-halo_cells] * D)
    shape_x = batch * int(stride)
    shape = (shape_x,) + tuple(
        -(-(int(math.ceil(hi[d])) + halo_cells + halo_cells) // 8) * 8
        for d in range(1, D)
    )
    dom = Domain(
        origin=origin, shape=shape,
        a_rect=((0,) * D, (1,) * D), p_rect=((-1,) * D, (2,) * D),
    )
    return packed, dom, stride


def unpack_scenes(
    packed: ParticleState, batch: int, n: int, stride: float
) -> ParticleState:
    """Inverse of pack_scenes: restore [batch, N, ...] with per-scene x."""
    unflat = lambda a: a.reshape((batch, n) + a.shape[1:])
    pos = unflat(packed.pos)
    offsets = jnp.arange(batch, dtype=jnp.float32) * stride
    pos = pos.at[..., 0].add(-offsets[:, None])
    return ParticleState(
        pos=pos, vel=unflat(packed.vel), C=unflat(packed.C),
        mass=unflat(packed.mass), density=unflat(packed.density),
        pressure=unflat(packed.pressure),
    )
