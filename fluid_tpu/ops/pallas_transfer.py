"""Pallas TPU kernels for the tile-binned transfer hot path.

The pure-XLA tiled backend's remaining costs are dominated by per-row gather
overhead (the packed binned gather + un-bin: ~25ns/row regardless of width)
and HBM churn of staged contraction intermediates.  These kernels eliminate
both:

* particles live in a FIELD-MAJOR sorted packed stream ``[F, N]`` in HBM;
  each per-tile program DMAs its contiguous slice ``[:, start:start+cap]``
  (sorted order makes tile slices contiguous — no gather at all);
* per-axis B-spline weight profiles and the one-hot window matrix
  ``W[E^D, cap]`` are built in VMEM (lanes = cap, fully vectorized) and feed
  MXU matmuls ``block = sum_g W_g @ V_g`` (the offset-affine channel split of
  the APIC/eq-16 tap values — see ops/tiled_transfer.py);
* the G2P collect kernel runs the transposed contraction plus the entire
  per-particle tail (advect, mouse quirk Q3, clamp, soft wall quirk Q2,
  2d_multi.rs:252-359) and emits per-tile slot blocks.

The XLA side keeps: sort/offsets, stream packing, block halo summation
(ops/tiling.halo_sum), grid update, and slot->stream compaction — all dense.

Layout contract (all f32):
  deposit stream IN : [FPI, Npad]  rows: pos(D) vel(D) C(D*D) mass(1)
  force stream   IN : [D + D*D + D, Npad] rows: A2(D), term cols (D*D,
                      col-major: row D + j*D + i = term[i, j]), pos(D)
  blocks         OUT: [A, E^D, CH]
  collect out    OUT: [A, FO, cap] slot-major; rows: pos(D) vel(D) C(D*D)
                      rho(1) prs(1)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# In-kernel helpers
# ---------------------------------------------------------------------------


def _axis_profiles(pos_d, lc_d, E: int):
    """Per-axis plain/moment profiles [E, cap].

    pos_d: [cap] f32 positions along one axis; lc_d: [cap] i32 local cell.
    """
    cell = jnp.floor(pos_d)
    dv = pos_d - cell - 0.5
    w = [0.5 * (0.5 - dv) ** 2, 0.75 - dv * dv, 0.5 * (0.5 + dv) ** 2]
    e_io = lax.broadcasted_iota(jnp.int32, (E, pos_d.shape[0]), 0)
    plain = jnp.zeros((E, pos_d.shape[0]), jnp.float32)
    momnt = jnp.zeros((E, pos_d.shape[0]), jnp.float32)
    for o in range(3):
        eq = e_io == (lc_d[None, :] + o)
        plain = jnp.where(eq, w[o][None, :], plain)
        momnt = jnp.where(eq, w[o][None, :] * (o - 1.0), momnt)
    return plain, momnt


def _window(profs):
    """W[E^D, cap] tensor product of per-axis profiles [E, cap]."""
    D = len(profs)
    if D == 2:
        w = profs[0][:, None, :] * profs[1][None, :, :]
        E, cap = profs[0].shape
        return w.reshape(E * E, cap)
    w = (
        profs[0][:, None, None, :]
        * profs[1][None, :, None, :]
        * profs[2][None, None, :, :]
    )
    E, cap = profs[0].shape
    return w.reshape(E * E * E, cap)


def _dot_nt(a, b):
    """a [M, cap] x b [C, cap] -> [M, C] (contract cap on the MXU)."""
    return lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), precision=lax.Precision.HIGHEST, preferred_element_type=jnp.float32
    )


def _dot_tn(w, blk):
    """w [M, cap] x blk [M, C] -> [cap, C] (contract M)."""
    return lax.dot_general(
        w, blk, (((0,), (0,)), ((), ())), precision=lax.Precision.HIGHEST, preferred_element_type=jnp.float32
    )




def _rows(vecs):
    """Stack [cap] vectors into [n, cap] without concat (Mosaic-safe)."""
    n = len(vecs)
    cap = vecs[0].shape[0]
    rid = lax.broadcasted_iota(jnp.int32, (n, cap), 0)
    out = jnp.zeros((n, cap), jnp.float32)
    for i, v in enumerate(vecs):
        out = jnp.where(rid == i, v[None, :], out)
    return out

def _variants(plains, moments, valid_f):
    """(W0, [W_d per axis]) with the validity mask folded in."""
    D = len(plains)
    W0 = _window(plains) * valid_f
    Wv = []
    for d in range(D):
        profs = [moments[i] if i == d else plains[i] for i in range(D)]
        Wv.append(_window(profs) * valid_f)
    return W0, Wv




def _tile_origin_axis(tid, d: int, tshape, origin, T: int):
    """Cell origin (world grid-index space) of tile `tid` along axis d."""
    D = len(tshape)
    div = 1
    for k in range(d + 1, D):
        div *= tshape[k]
    coord = (tid // div) % tshape[d]
    return origin[d] + coord * T



def _pipelined_load(stream_ref, part_ref, sem, start_ref, cap):
    """Double-buffered stream DMA across grid steps: issue tile t+1's copy
    before waiting on tile t's (scratch persists across grid iterations)."""
    t = pl.program_id(0)
    nT = pl.num_programs(0)

    def dma(i, slot):
        return pltpu.make_async_copy(
            stream_ref.at[pl.ds(start_ref[i], cap), :],
            part_ref.at[slot],
            sem.at[slot],
        )

    @pl.when(t == 0)
    def _():
        dma(0, 0).start()

    @pl.when(t + 1 < nT)
    def _():
        dma(t + 1, (t + 1) % 2).start()

    dma(t, t % 2).wait()
    return part_ref[t % 2]

# ---------------------------------------------------------------------------
# Deposit kernel (P2G scatter replacement)
# ---------------------------------------------------------------------------


def _deposit_kernel(
    start_ref,
    count_ref,
    tid_ref,
    stream_ref,  # [FPI, Npad] (ANY/HBM)
    blocks_ref,  # [1, E^D, CH] (VMEM)
    part_ref,  # VMEM [FPI, cap]
    sem,
    *,
    D: int,
    T: int,
    cap: int,
    mode: str,
    tshape,
    origin,
):
    t = pl.program_id(0)
    E = T + 2
    start = start_ref[t]
    count = count_ref[t]

    pm = _pipelined_load(stream_ref, part_ref, sem, start_ref, cap).T  # [FPI, cap]

    valid = lax.broadcasted_iota(jnp.int32, (1, cap), 1)[0] < count
    pos_row0 = 0 if mode == "p2g1" else D + D * D

    plains, moments, dvec = [], [], []
    for d in range(D):
        pos_d = pm[pos_row0 + d, :]
        cell = jnp.floor(pos_d)
        lc = jnp.clip(cell.astype(jnp.int32) - _tile_origin_axis(tid_ref[t], d, tshape, origin, T), 0, T - 1)
        pl_d, mo_d = _axis_profiles(pos_d, lc, E)
        plains.append(pl_d)
        moments.append(mo_d)
        dvec.append(pos_d - cell - 0.5)

    W0, Wv = _variants(plains, moments, valid.astype(jnp.float32)[None, :])

    if mode == "p2g1":
        vel = [pm[D + d, :] for d in range(D)]
        Cm = [[pm[2 * D + i * D + j, :] for j in range(D)] for i in range(D)]
        mass = jnp.where(valid, pm[2 * D + D * D, :], 0.0)
        Aval = []
        for i in range(D):
            cd = Cm[i][0] * dvec[0]
            for j in range(1, D):
                cd = cd + Cm[i][j] * dvec[j]
            Aval.append(mass * (vel[i] - cd))
        zero = jnp.zeros_like(mass)
        V0 = _rows([mass] + Aval)  # [1+D, cap]
        block = _dot_nt(W0, V0)  # [E^D, 1+D]
        for d in range(D):
            # leading zero row keeps the mass channel untouched (no pad)
            Vd = _rows([zero] + [mass * Cm[i][d] for i in range(D)])
            block = block + _dot_nt(Wv[d], Vd)
    else:
        A2 = [pm[d, :] for d in range(D)]
        block = _dot_nt(W0, _rows(A2))
        for d in range(D):
            block = block + _dot_nt(Wv[d], _rows([pm[D + d * D + i, :] for i in range(D)]))

    blocks_ref[0] = block


def deposit(
    stream: jnp.ndarray,
    act_start: jnp.ndarray,
    act_count: jnp.ndarray,
    tile_id: jnp.ndarray,  # [A] i32 flat tile ids
    tshape,
    origin,
    *,
    D: int,
    T: int,
    cap: int,
    mode: str = "p2g1",
    interpret: bool = False,
) -> jnp.ndarray:
    """All active tiles -> blocks [A, E^D, CH] (CH = 1+D for p2g1, D force)."""
    A = act_start.shape[0]
    E = T + 2
    CH = 1 + D if mode == "p2g1" else D
    FPI = stream.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(A,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, E**D, CH), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, cap, FPI), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _deposit_kernel, D=D, T=T, cap=cap, mode=mode, tshape=tshape, origin=origin
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((A, E**D, CH), jnp.float32),
        interpret=interpret,
    )(act_start, act_count, tile_id, stream)


# ---------------------------------------------------------------------------
# Collect kernel (G2P gather replacement + particle tail)
# ---------------------------------------------------------------------------


def _collect_kernel(
    start_ref,
    count_ref,
    tid_ref,
    params_ref,  # [16 + 2D] f32 (SMEM via scalar prefetch)
    stream_ref,  # [FPI, Npad] (ANY)
    vblk_ref,  # [1, E^D, D]
    mblk_ref,  # [1, E^D, 1]
    out_ref,  # [1, FO, cap] (VMEM) slot-major output
    part_ref,  # VMEM [FPI, cap]
    sem_in,
    *,
    D: int,
    T: int,
    cap: int,
    tshape,
    origin,
):
    t = pl.program_id(0)
    E = T + 2
    start = start_ref[t]
    count = count_ref[t]

    pm = _pipelined_load(stream_ref, part_ref, sem_in, start_ref, cap).T  # [FPI, cap]

    valid = lax.broadcasted_iota(jnp.int32, (1, cap), 1)[0] < count

    pos = [pm[d, :] for d in range(D)]
    plains, moments, dvec = [], [], []
    for d in range(D):
        cell = jnp.floor(pos[d])
        lc = jnp.clip(cell.astype(jnp.int32) - _tile_origin_axis(tid_ref[t], d, tshape, origin, T), 0, T - 1)
        pl_d, mo_d = _axis_profiles(pos[d], lc, E)
        plains.append(pl_d)
        moments.append(mo_d)
        dvec.append(pos[d] - cell - 0.5)

    W0, Wv = _variants(plains, moments, jnp.ones((1, cap), jnp.float32))

    vblk = vblk_ref[0]  # [E^D, D]
    mblk = mblk_ref[0]  # [E^D, 1]

    rho = _dot_tn(W0, mblk)[:, 0]  # [cap]
    vC = _dot_tn(W0, vblk)  # [cap, D]
    Md = [_dot_tn(Wv[d], vblk) for d in range(D)]

    dt = params_ref[0]
    rest_density = params_ref[1]
    eos_stiffness = params_ref[2]
    eos_power = params_ref[3]
    pressure_floor = params_ref[4]
    mouse_radius = params_ref[5]
    boundary_damp = params_ref[6]
    mouse_active = params_ref[7]
    mx = params_ref[8]
    my = params_ref[9]
    clip_lo = [params_ref[10 + d] for d in range(D)]
    clip_hi = [params_ref[10 + D + d] for d in range(D)]

    vel = [vC[:, i] for i in range(D)]
    newpos = [pos[i] + vel[i] * dt for i in range(D)]

    pressure = jnp.maximum(
        pressure_floor, eos_stiffness * ((rho / rest_density) ** eos_power - 1.0)
    )

    newC = []
    for i in range(D):
        for j in range(D):
            newC.append(4.0 * (vel[i] * (-dvec[j]) + Md[j][:, i]))

    # mouse (quirk Q3: post-advect, xy-plane, 3d_multi.rs:305-310)
    dx = newpos[0] - mx
    dy = newpos[1] - my
    d2 = dx * dx + dy * dy
    nrm = jnp.sqrt(d2)
    inv = jnp.where(nrm > 0.0, 1.0 / jnp.where(nrm > 0.0, nrm, 1.0), 0.0)
    hit = (mouse_active > 0.0) & (d2 < mouse_radius * mouse_radius)
    vel[0] = vel[0] + jnp.where(hit, dx * inv, 0.0)
    vel[1] = vel[1] + jnp.where(hit, dy * inv, 0.0)

    # clamp + soft wall (quirk Q2: un-scaled lookahead, 2d_multi.rs:302-325)
    for d in range(D):
        p_cl = jnp.clip(newpos[d], clip_lo[d], clip_hi[d])
        nxt = p_cl + vel[d]
        wmin = clip_lo[d] + boundary_damp
        wmax = clip_hi[d] - boundary_damp
        v = vel[d] + jnp.where(nxt < wmin, wmin - nxt, 0.0)
        v = v + jnp.where(nxt > wmax, wmax - nxt, 0.0)
        newpos[d] = p_cl
        vel[d] = v

    mass = pm[2 * D + D * D, :]
    rows = newpos + vel + newC + [rho, pressure, mass]
    out = _rows(rows)  # [FO, cap]
    out_ref[0] = jnp.where(valid[None, :], out, 0.0)


def collect(
    stream: jnp.ndarray,
    vblocks: jnp.ndarray,  # [A, E^D, D]
    mblocks: jnp.ndarray,  # [A, E^D, 1]
    act_start: jnp.ndarray,
    act_count: jnp.ndarray,
    tile_id: jnp.ndarray,
    params: jnp.ndarray,  # [10 + 2D] f32
    tshape,
    origin,
    *,
    D: int,
    T: int,
    cap: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """All active tiles -> slot-major outputs [A, FO, cap]."""
    A = act_start.shape[0]
    E = T + 2
    FO = 2 * D + D * D + 3
    FPI = stream.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(A,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (1, E**D, D), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, E**D, 1), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, FO, cap), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, cap, FPI), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _collect_kernel, D=D, T=T, cap=cap, tshape=tshape, origin=origin
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((A, FO, cap), jnp.float32),
        interpret=interpret,
    )(act_start, act_count, tile_id, params, stream, vblocks, mblocks)


# ---------------------------------------------------------------------------
# Fused p2g_2 kernel: density collect + Tait EOS + stress + force deposit
# ---------------------------------------------------------------------------


def _p2g2_kernel(
    start_ref,
    count_ref,
    tid_ref,
    params_ref,  # [6]: dt, rest_density, eos_stiffness, eos_power, floor, mu
    stream_ref,  # [FPI, Npad] (ANY)
    mblk_ref,  # [1, E^D, 1]
    blocks_ref,  # [1, E^D, D] force blocks out
    part_ref,
    sem_in,
    *,
    D: int,
    T: int,
    cap: int,
    tshape,
    origin,
):
    t = pl.program_id(0)
    E = T + 2
    start = start_ref[t]
    count = count_ref[t]

    pm = _pipelined_load(stream_ref, part_ref, sem_in, start_ref, cap).T  # [FPI, cap]

    valid = lax.broadcasted_iota(jnp.int32, (1, cap), 1)[0] < count

    pos = [pm[d, :] for d in range(D)]
    Cm = [[pm[2 * D + i * D + j, :] for j in range(D)] for i in range(D)]
    mass = jnp.where(valid, pm[2 * D + D * D, :], 0.0)

    plains, moments, dvec = [], [], []
    for d in range(D):
        cell = jnp.floor(pos[d])
        lc = jnp.clip(cell.astype(jnp.int32) - _tile_origin_axis(tid_ref[t], d, tshape, origin, T), 0, T - 1)
        pl_d, mo_d = _axis_profiles(pos[d], lc, E)
        plains.append(pl_d)
        moments.append(mo_d)
        dvec.append(pos[d] - cell - 0.5)

    W0, Wv = _variants(plains, moments, valid.astype(jnp.float32)[None, :])

    rho = _dot_tn(W0, mblk_ref[0])[:, 0]  # [cap]

    dt = params_ref[0]
    rest_density = params_ref[1]
    eos_stiffness = params_ref[2]
    eos_power = params_ref[3]
    pressure_floor = params_ref[4]
    mu = params_ref[5]

    volume = jnp.where(rho > 0.0, mass / jnp.where(rho > 0.0, rho, 1.0), 0.0)
    pressure = jnp.maximum(
        pressure_floor, eos_stiffness * ((rho / rest_density) ** eos_power - 1.0)
    )
    scale = -4.0 * volume * dt  # [cap]

    # term[i][j] = scale * (-p delta_ij + mu (C_ij + C_ji))
    term = [
        [
            scale * ((-pressure if i == j else 0.0) + mu * (Cm[i][j] + Cm[j][i]))
            for j in range(D)
        ]
        for i in range(D)
    ]
    A2 = []
    for i in range(D):
        acc = term[i][0] * (-dvec[0])
        for j in range(1, D):
            acc = acc + term[i][j] * (-dvec[j])
        A2.append(acc)

    block = _dot_nt(W0, _rows(A2))
    for d in range(D):
        block = block + _dot_nt(Wv[d], _rows([term[i][d] for i in range(D)]))
    blocks_ref[0] = block


def p2g2(
    stream: jnp.ndarray,
    mblocks: jnp.ndarray,  # [A, E^D, 1] halo-summed+masked mass blocks
    act_start: jnp.ndarray,
    act_count: jnp.ndarray,
    tile_id: jnp.ndarray,
    params: jnp.ndarray,  # [6] f32
    tshape,
    origin,
    *,
    D: int,
    T: int,
    cap: int,
    interpret: bool = False,
) -> jnp.ndarray:
    A = act_start.shape[0]
    E = T + 2
    FPI = stream.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(A,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (1, E**D, 1), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, E**D, D), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, cap, FPI), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _p2g2_kernel, D=D, T=T, cap=cap, tshape=tshape, origin=origin
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((A, E**D, D), jnp.float32),
        interpret=interpret,
    )(act_start, act_count, tile_id, params, stream, mblocks)


# ---------------------------------------------------------------------------
# Fused substep (Pallas kernels + dense XLA glue)
# ---------------------------------------------------------------------------


def substep(
    p,
    cfg,
    domain,
    mouse_pos,
    mouse_active,
    spec=None,
    interpret: bool | None = None,
    preserve_order: bool = True,
):
    """One MLS-MPM substep: Pallas deposit/p2g2/collect kernels over the
    tile-binned sorted stream, with XLA doing sort/offsets, halo summation
    and grid update.  Drop-in equivalent of the dense/sorted/tiled backends
    (same physics incl. quirks Q2/Q3)."""
    from ..state import GridState, ParticleState
    from . import tiled_transfer as tt
    from .tiling import assemble, edge_mask, halo_sum

    if interpret is None:
        # CPU hosts (tests) can only run kernels in interpreter mode
        interpret = jax.default_backend() == "cpu"
    if spec is None:
        spec = tt.default_spec(cfg, p.n)
    D = p.dim
    T, cap = spec.tile, spec.cap
    E = T + 2
    n = p.n
    dtype = p.pos.dtype

    b = tt.bin_particles(p.pos, domain, spec)
    tshape, nt = tt._tile_geometry(domain, spec)
    A = b["n_active"]
    origin = jnp.asarray(domain.origin, jnp.int32)

    # sorted field-major stream, zero-padded by cap rows
    packed = jnp.concatenate(
        [p.pos, p.vel, p.C.reshape(n, D * D), p.mass[:, None]], axis=1
    )
    FP = packed.shape[1]
    sorted_packed = jnp.take(packed, b["order"], axis=0)
    stream = jnp.concatenate(
        [sorted_packed, jnp.zeros((cap, FP), dtype)], axis=0
    )  # [Npad, FP] slot-major (DMA slices the major dim)
    # lane-align the minor dim: DMA slice extents must be multiples of 128
    stream = jnp.pad(stream, ((0, 0), (0, 128 - FP)))

    count = b["start"][1:] - b["start"][:-1]
    toa = b["tile_of_active"]
    act_count = jnp.take(jnp.append(count, 0), jnp.clip(toa, 0, nt))
    tid = jnp.clip(toa, 0, nt - 1).astype(jnp.int32)
    origin_static = tuple(int(o) for o in domain.origin)

    # ---- p2g_1 deposit kernel --------------------------------------------
    blocks1 = deposit(
        stream, b["act_start"], act_count, tid, tshape, origin_static,
        D=D, T=T, cap=cap, mode="p2g1", interpret=interpret,
    )  # [A, E^D, 1+D]

    def to_dense(blocks, CH):
        flat = blocks.reshape(A, -1)
        dense = jnp.zeros((nt + 1, flat.shape[1]), dtype)
        dense = dense.at[toa].add(flat, mode="drop")
        return dense[:nt].reshape((nt,) + (E,) * D + (CH,))

    def to_active(dense_hs, CH):
        x = dense_hs.reshape(nt, -1)
        x = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), dtype)], axis=0)
        return jnp.take(x, toa, axis=0).reshape(A, E**D, CH)

    emask = edge_mask(tshape, T, dtype).reshape(nt, -1)
    emask = jnp.concatenate([emask, jnp.zeros((1, emask.shape[1]), dtype)], axis=0)
    emask_act = jnp.take(emask, toa, axis=0)[..., None]  # [A, E^D, 1]

    dense1 = to_dense(blocks1, 1 + D)
    hs1 = halo_sum(dense1, tshape, T)
    act1 = to_active(hs1, 1 + D) * emask_act
    mblocks = act1[..., 0:1]

    # ---- fused p2g_2 kernel ----------------------------------------------
    params6 = jnp.asarray(
        [cfg.dt, cfg.rest_density, cfg.eos_stiffness, cfg.eos_power,
         cfg.pressure_floor, cfg.dynamic_viscosity],
        jnp.float32,
    )
    blocks2 = p2g2(
        stream, mblocks, b["act_start"], act_count, tid, params6,
        tshape, origin_static,
        D=D, T=T, cap=cap, interpret=interpret,
    )  # [A, E^D, D]

    dense2 = to_dense(blocks2, D)
    hs2 = halo_sum(dense2, tshape, T)
    act2 = to_active(hs2, D) * emask_act

    # ---- grid update on active blocks -------------------------------------
    g = jnp.asarray(cfg.gravity, dtype)
    m_b = mblocks
    mom_b = act1[..., 1:] + act2
    v_b = jnp.where(
        m_b > 0.0, mom_b / jnp.where(m_b > 0.0, m_b, 1.0) + cfg.dt * g, 0.0
    )

    # ---- collect kernel (g2p + particle tail) ----------------------------
    lo = cfg.boundary_clip[0]
    hi = cfg.boundary_clip[1]
    params_c = jnp.asarray(
        [cfg.dt, cfg.rest_density, cfg.eos_stiffness, cfg.eos_power,
         cfg.pressure_floor, cfg.mouse_radius, cfg.boundary_damp_dist, 0.0,
         0.0, 0.0, *lo, *hi],
        jnp.float32,
    )
    params_c = params_c.at[7].set(mouse_active.astype(jnp.float32))
    params_c = params_c.at[8].set(mouse_pos[0].astype(jnp.float32))
    params_c = params_c.at[9].set(mouse_pos[1].astype(jnp.float32))
    out_slots = collect(
        stream, v_b, mblocks, b["act_start"], act_count, tid, params_c,
        tshape, origin_static,
        D=D, T=T, cap=cap, interpret=interpret,
    )  # [A, FO, cap]
    FO = out_slots.shape[1]  # pos, vel, C, rho, pressure, mass

    # ---- un-bin (slot-major -> original particle order) -------------------
    out_flat = jnp.swapaxes(out_slots, 1, 2).reshape(A * cap, FO)
    ranks = jnp.arange(n, dtype=jnp.int32)
    start_at = jnp.take(b["start"][:-1], b["sid"])
    s_rank = ranks - start_at
    occ_rank = jnp.take(
        jnp.cumsum((count > 0).astype(jnp.int32)) - 1, b["sid"]
    )
    slot = jnp.clip(occ_rank, 0, A - 1) * cap + jnp.clip(s_rank, 0, cap - 1)
    sorted_out = jnp.take(out_flat, slot, axis=0)

    if not spec.strict:
        fallback = jnp.concatenate(
            [p.pos, p.vel, p.C.reshape(n, D * D), p.density[:, None],
             p.pressure[:, None], p.mass[:, None]],
            axis=1,
        )
        fb_sorted = jnp.take(fallback, b["order"], axis=0)
        sorted_out = jnp.where(b["frozen"][:, None], fb_sorted, sorted_out)

    if preserve_order:
        unpacked = jnp.zeros_like(sorted_out)
        unpacked = unpacked.at[b["order"]].set(
            sorted_out, mode="promise_in_bounds", unique_indices=True
        )
        mass_out = p.mass
    else:
        unpacked = sorted_out
        mass_out = unpacked[:, FO - 1]

    out = ParticleState(
        pos=unpacked[:, 0:D],
        vel=unpacked[:, D : 2 * D],
        C=unpacked[:, 2 * D : 2 * D + D * D].reshape(n, D, D),
        mass=mass_out,
        density=unpacked[:, FO - 3],
        pressure=unpacked[:, FO - 2],
    )

    # Dense GridState (XLA dead-code-eliminates it when discarded)
    grid_all = assemble(dense1, tshape, T)
    grid_m = grid_all[..., 0]
    grid_mv = grid_all[..., 1:] + assemble(dense2, tshape, T)
    m = grid_m[..., None]
    grid_v = jnp.where(m > 0.0, grid_mv / jnp.where(m > 0.0, m, 1.0) + cfg.dt * g, 0.0)
    return out, GridState(mass=grid_m, vel=grid_v)
