"""Multi-chip stream backend — the flagship path, sharded (round 3).

Round 2's ``parallel/shard.py`` proved the chunk-halo/migration structure
(``/root/reference/src/2d_multi.rs:79-87,327-358``) on a TPU mesh, but its
local substep is the per-tap scatter formulation this repo measured ~100x
off the roofline.  This module shards the PERSISTENT-BINNED STREAM backend
instead — the same Pallas kernels that hold the single-chip headline run
unchanged on each device's tile slab:

* **Decomposition**: 1-D x-slabs in TILE space.  Device d owns global tile
  columns ``[d*TS, (d+1)*TS)``; its local tile grid is ``TS + 2`` columns —
  one GHOST column per side (local tx=0 and tx=TS+1), the ``p_rect`` analog.
* **Halo**: windows only ever reach one tile over (h <= T), so after each
  deposit kernel the edge-owned columns' blocks (local tx=1 and tx=TS) are
  ``lax.ppermute``d into the neighbors' ghost columns, and the ordinary
  separable halo (x axis FIRST) completes all sums locally.  Two block
  exchanges per substep (p2g_1 mass+momentum, p2g_2 force) ride ICI.
  Ghost tiles are zero-count actives FORCED into the needed-relay closure
  (``_bin_rows(occ_force=...)``): they are occupied REMOTELY, so local
  occupancy alone would under-provision the relays for cross-boundary
  diagonal flows.  Round 4 brought the sharded substep to single-chip
  feature parity: tile pairing, dynamic occupied-only kernel grids (with
  zero-then-exchange block gating), ghost-aware DMA-gated halo tables,
  and measured relay-closure budgets (``default_shard_spec(pos=...)``).
* **Migration**: particles stay validly binned between re-bins (the drift
  window argument is unchanged), so slots migrate only when the re-bin
  fires — which all devices agree on via ``lax.pmax`` over the drift flags.
  Movers (new key in a ghost column) are packed into fixed-capacity
  emigrant buffers, ppermuted, and re-binned together with the local rows
  (the ``swap_mul`` analog, ``2d_multi.rs:327-358``).

Equivalence is tested against the dense backend on an 8-virtual-device CPU
mesh (tests/test_stream_shard.py); ``__graft_entry__.dryrun_multichip``
exercises the same path.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..domain import Domain
from ..state import ParticleState
from ..ops import stream_transfer as stx
from ..ops.stream_transfer import StreamSpec, StreamState

AXIS = "space"


# ---------------------------------------------------------------------------
# Static geometry
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class StreamShardSpec:
    """Static sharded-stream geometry (hashable => jit-static).

    ``local`` is the per-device StreamSpec; its ``active`` budget covers the
    local slab's dilated occupancy plus the two ghost columns."""

    domain: Domain  # GLOBAL domain
    n_shards: int
    ts: int  # owned tile columns per device
    spec: StreamSpec  # local per-device stream spec
    migrate_cap: int  # max emigrants per direction per re-bin
    # static bound on per-device LIVE rows for the compacted re-bin
    # (0 = all slots, the shape-safe fallback).  A device can never hold
    # more rows than min(its slot count, the GLOBAL particle count), so
    # default_shard_spec sets that — at 3d-1m/s=1 it cuts the re-bin's
    # row shape 2.23M slots -> 1M rows (measured ~1.7 s/re-bin before).
    live_cap: int = 0

    @property
    def live_cap_rows(self) -> int:
        D = len(self.domain.shape)
        pair = stx._use_pair(self.spec, D)
        nslots = (self.spec.A // 2 if pair else self.spec.A) * self.spec.cap
        return min(self.live_cap, nslots) if self.live_cap > 0 else nslots

    @property
    def tile(self) -> int:
        return self.spec.tile

    @property
    def local_domain(self) -> Domain:
        """Device-relative domain template: x spans (TS+2) tile columns.

        The x origin is per-device (origin_x + (d*TS - 1)*T); kernels take
        the origin as data-independent STATIC geometry, so the local domain
        uses the device-0 template and the per-device shift is applied to
        positions' tile keys via ``_local_origin`` inside shard_map."""
        T = self.tile
        shape = ((self.ts + 2) * T, *self.domain.shape[1:])
        origin = (self.domain.origin[0] - T, *self.domain.origin[1:])
        return Domain(
            origin=origin, shape=shape,
            a_rect=self.domain.a_rect, p_rect=self.domain.p_rect,
        )

    @property
    def ncol(self) -> int:
        """Tiles per x-column (= y*z tile count) — the exchange width."""
        T = self.tile
        return math.prod(s // T for s in self.domain.shape[1:])

    def __post_init__(self):
        T = self.spec.tile
        if self.domain.shape[0] % T:
            raise ValueError("global x extent not tile-aligned")
        if self.spec.halo > T:
            raise ValueError("ghost-column halo requires halo <= tile")
        if self.spec.mhalo != "xla":
            # the sharded pallas mass-halo branch shipped unverified (no
            # equivalence test) and mhalo='pallas' is measured-neutral
            # single-chip (CLAUDE.md round 4) — rejected until it is
            # needed AND tested rather than silently trusted
            raise ValueError("sharded stream supports mhalo='xla' only")


def default_shard_spec(
    cfg: Config,
    domain: Domain,
    n_shards: int,
    n: int,
    interpret: Optional[bool] = None,
    pos=None,
    vel=None,
    pair: bool = False,
    active_mult: float = 3.0,
    active_floor: int = 1024,
) -> StreamShardSpec:
    """Sharded stream spec at single-chip feature parity (round 4).

    With ``pos`` (global positions, optionally ``vel`` for the predictive
    key) the per-slab active budget is MEASURED: the peak over slabs of the
    needed-relay closure of the slab's t=0 occupancy with both ghost
    columns forced occupied — exactly what ``_bin_local`` provisions — at
    ``active_mult``x growth headroom over ``active_floor`` (the single-chip
    bench's ladder policy; exhaustion still fails loudly via the
    ``shell_drop`` watermark + ``gather_stream``'s conservation assert, so
    callers can ladder the (mult, floor) pair the same way ``bench.py``
    does).  Without ``pos`` it falls back to the round-2 x32 dilation-era
    estimate, which is known to hold every config.  ``pair`` enables tile
    pairing (see StreamSpec.pair) — verify-before-trust like the bench."""
    T = 4
    ntx = domain.shape[0] // T
    ts = -(-ntx // n_shards)  # ceil: the conceptual grid pads up to s*ts
    ncol = math.prod(s // T for s in domain.shape[1:])
    per_tile = cfg.rest_density * T**cfg.dim
    nt_local = (ts + 2) * ncol
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    # small groups under interpret: the CPU suite is compile-bound and
    # kernel-body size scales with G (see stream_transfer.default_spec)
    group = 2 if interpret else 8
    if pos is None:
        # un-probed fallback: the slab's share of particles at stream-spec
        # slack, plus both ghost columns (always allocatable)
        occupied = max(2048, int(n / n_shards / max(per_tile, 1.0)) * 32)
        active = min(occupied + 2 * ncol, nt_local, 110_000)
    else:
        peak = _probe_slab_peak(cfg, domain, n_shards, ts, pos, vel)
        # quantize A to 4 groups' worth so NG stays a multiple of 4 and
        # _pbatch keeps batching 4 groups/program (see bench._stream_spec)
        quant = group * 4
        measured = max(active_floor, int(peak * active_mult))
        active = min(-(-measured // quant) * quant, nt_local, 110_000)
    spec = StreamSpec(
        tile=T, cap=128, halo=2, group=group, active=active,
        interpret=interpret, pair=pair,
    )
    mcap = max(256, n // n_shards // 4)
    return StreamShardSpec(
        domain=domain, n_shards=n_shards, ts=ts, spec=spec, migrate_cap=mcap,
        # a device can never hold more live rows than exist globally:
        # live_cap_rows = min(n, local slot count) bounds the compacted
        # re-bin's row shape (see _sharded_rebin)
        live_cap=n,
    )


def _probe_slab_peak(cfg, domain, n_shards, ts, pos, vel) -> int:
    """Max over slabs of the t=0 needed-relay closure size in the slab's
    LOCAL template (ghost columns forced occupied, like ``_bin_local``)."""
    T = 4
    gtshape = tuple(s // T for s in domain.shape)
    rs = math.prod(gtshape[1:])
    ltshape = (ts + 2,) + gtshape[1:]
    nt_local = math.prod(ltshape)
    ntx = gtshape[0]
    tx_l = np.arange(nt_local) // rs
    ghost = jnp.asarray((tx_l == 0) | (tx_l == ts + 1))
    probe = StreamSpec(tile=T, cap=128, halo=2, group=1, active=1)

    @jax.jit
    def peaks(pos, vel):
        gkeys = stx._keys_from_pos(
            pos, domain, probe, gtshape, vel=vel, dt=cfg.dt
        )
        gtx = gkeys // rs
        owner = jnp.clip(gtx // ts, 0, n_shards - 1)
        lkeys = (gtx - owner * ts + 1) * rs + gkeys % rs
        outs = []
        for d in range(n_shards):
            occ = (
                jnp.zeros((nt_local,), bool)
                .at[jnp.where(owner == d, lkeys, nt_local)]
                .set(True, mode="drop")
            )
            outs.append(stx._active_set(occ | ghost, ltshape).sum())
        return jnp.stack(outs)

    return int(jnp.max(peaks(pos, vel)))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ShardStreamState:
    """Per-device stream state plus the column exchange tables.

    ``col`` [4, ncol]: active indices (A = absent) of the x-columns
    [own-left tx=1, own-right tx=TS, ghost-left tx=0, ghost-right tx=TS+1],
    ordered by (ty, tz).  Rebuilt at (re-)bin time."""

    st: StreamState
    col: jax.Array


# ---------------------------------------------------------------------------
# Local binning helpers (run inside shard_map; all static shapes)
# ---------------------------------------------------------------------------


def _local_tshape(sspec: StreamShardSpec):
    T = sspec.tile
    dom = sspec.local_domain
    return tuple(s // T for s in dom.shape)


def _col_table(tid_act, sspec: StreamShardSpec) -> jnp.ndarray:
    """[4, ncol] active index of each exchange column's tiles."""
    tshape = _local_tshape(sspec)
    nt = math.prod(tshape)
    A = sspec.spec.A
    rs = math.prod(tshape[1:])  # tiles per x column
    inv = jnp.full((nt + 1,), A, jnp.int32)
    inv = inv.at[jnp.clip(tid_act, 0, nt)].min(
        jnp.where(tid_act < nt, jnp.arange(A, dtype=jnp.int32), A)
    )
    cols = []
    for tx in (1, sspec.ts, 0, sspec.ts + 1):
        base = tx * rs
        cols.append(lax.dynamic_slice(inv, (base,), (rs,)))
    return jnp.stack(cols, axis=0)


def _local_origin_shift(sspec: StreamShardSpec):
    """Per-device x shift (in cells) of the local domain template."""
    T = sspec.tile
    d = lax.axis_index(AXIS)
    return d * sspec.ts * T


def _shift_pos_x(pos, sspec: StreamShardSpec, sign: int):
    """Map global positions into the device-0 local template (and back)."""
    shift = _local_origin_shift(sspec).astype(pos.dtype)
    return pos.at[..., 0].add(sign * shift)


def _ghost_mask(sspec: StreamShardSpec):
    """[nt] bool — the two ghost columns (local tx = 0 and TS+1).

    Ghost tiles are occupied REMOTELY (their deposit blocks arrive via the
    ppermute exchange), so the needed-relay closure must treat them as
    occupied or cross-boundary diagonal flows lose their relays."""
    tshape = _local_tshape(sspec)
    ntx = tshape[0]
    rest = math.prod(tshape[1:])
    tx = np.arange(ntx * rest) // rest
    return jnp.asarray((tx == 0) | (tx == ntx - 1))


def _bin_local(rows, n_rows: int, sspec: StreamShardSpec, keys) -> ShardStreamState:
    """_bin_rows on the local template + column tables.

    The DMA-gate tables (``nbrg``) are rebuilt GHOST-AWARE: a ghost tile's
    deposit block is filled REMOTELY by the ppermute exchange, so "count ==
    0 => block zero" does not hold for it — gate on count OR ghost instead,
    which keeps the single-chip halo DMA skip for ordinary shell relays
    while never gating away remote flow."""
    spec = sspec.spec
    tshape = _local_tshape(sspec)
    nt = math.prod(tshape)
    st = stx._bin_rows(
        rows, keys, n_rows, spec, nt, tshape, occ_force=_ghost_mask(sspec)
    )
    gact = jnp.take(
        jnp.append(_ghost_mask(sspec), False), jnp.clip(st.tid, 0, nt)
    )
    nbrg = stx._gated_nbr(
        st.nbr, st.count + gact.astype(jnp.int32), spec.A, len(tshape)
    )
    st = dataclasses.replace(st, nbrg=nbrg)
    return ShardStreamState(st=st, col=_col_table(st.tid, sspec))


def _local_keys(pos_local, vel, sspec: StreamShardSpec, dt: float):
    """Predictive tile keys in the local template (pos already shifted)."""
    tshape = _local_tshape(sspec)
    return stx._keys_from_pos(
        pos_local, sspec.local_domain, sspec.spec, tshape, vel=vel, dt=dt
    )


# ---------------------------------------------------------------------------
# Ghost-column block exchange
# ---------------------------------------------------------------------------


def _perm_left(s):
    return [(i, i - 1) for i in range(1, s)]


def _perm_right(s):
    return [(i, i + 1) for i in range(s - 1)]


def _exchange_blocks(blocks, col, sspec: StreamShardSpec):
    """Fill ghost columns with the neighbors' edge-owned deposit blocks.

    blocks: [A, R, 128] (rank-3 kernel block layout) or [A, L] flat.  Rows
    of absent tiles (col == A) travel as zeros and land nowhere."""
    s = sspec.n_shards
    A = sspec.spec.A
    flat = blocks.reshape(A, -1)
    zero_row = jnp.zeros((1, flat.shape[1]), flat.dtype)
    padded = jnp.concatenate([flat, zero_row], axis=0)

    def col_take(idx):
        return jnp.take(padded, jnp.clip(idx, 0, A), axis=0)

    send_l = col_take(col[0])  # my left-owned column -> left neighbor
    send_r = col_take(col[1])  # my right-owned column -> right neighbor
    recv_r = lax.ppermute(send_l, AXIS, _perm_left(s))  # arrives at right ghost
    recv_l = lax.ppermute(send_r, AXIS, _perm_right(s))  # arrives at left ghost

    def col_put(dst, idx, rows):
        ok = idx < A
        safe = jnp.clip(idx, 0, A - 1)
        cur = jnp.take(dst, safe, axis=0)
        return dst.at[safe].set(jnp.where(ok[:, None], rows, cur))

    out = col_put(flat, col[3], recv_r)
    out = col_put(out, col[2], recv_l)
    return out.reshape(blocks.shape)


# ---------------------------------------------------------------------------
# Sharded substep (inside shard_map)
# ---------------------------------------------------------------------------


def _sharded_substep_core(
    ss: ShardStreamState,
    dep1,
    cfg: Config,
    sspec: StreamShardSpec,
    mouse_pos,
    mouse_active,
    fused: bool,
):
    """_substep_core with ghost exchanges spliced between deposit and halo.

    Mirrors stream_transfer._substep_core (including the round-3 dynamic
    occupied-only kernel grids), except deposit blocks are count-gated to
    zero and THEN pass through _exchange_blocks before any halo pass (x
    runs first, so one ghost fill per deposit completes all cross-device
    flow).  Zero-then-exchange makes the dynamic-grid story uniform: a
    skipped (uninitialized) shell/ghost block is zeroed locally, and ghost
    rows are refilled with the neighbor's (equally count-gated) edge
    blocks — so after the exchange "nonzero block" == occupied-or-ghost,
    which is exactly what the ghost-aware ``nbrg`` tables gate on."""
    D = cfg.dim
    spec = sspec.spec
    st = ss.st
    domain = sspec.local_domain
    tshape = _local_tshape(sspec)
    nt = math.prod(tshape)
    T, E, h = spec.tile, spec.E, spec.halo
    EP = spec.EP(D)
    A, NG, G = spec.A, spec.NG, spec.group
    E3 = E**D
    origin = tuple(int(o) for o in domain.origin)

    dep2_k = stx.make_deposit_kernel(spec, D, tshape, origin, "p2g2")
    coll_k = stx.make_collect_kernel(spec, D, tshape, origin, fused_p2g1=fused)

    # dynamic-grid bounds (single-chip parity): ``na`` bounds the halo axis
    # passes (shells + ghosts relay), ``no`` bounds dep2/collect/gblk.
    # Per-device values — each mesh device launches its own grid.
    na = stx._n_asgn(st.tid, nt) if spec.dyn else None
    no = stx._n_occ(st.count) if spec.dyn else None
    occ_t = (st.count > 0)[:, None, None]

    params6 = jnp.asarray(
        [cfg.dt, cfg.rest_density, cfg.eos_stiffness, cfg.eos_power,
         cfg.pressure_floor, cfg.dynamic_viscosity],
        jnp.float32,
    )
    g = jnp.asarray(cfg.gravity, jnp.float32)

    if stx._use_r3(spec, D):
        S1 = E3 // 128
        d1 = jnp.where(occ_t, dep1.reshape(A, stx.GROWS * S1, 128), 0.0)
        d1 = _exchange_blocks(d1, ss.col, sspec)
        # mass halo is always the XLA gather here (StreamShardSpec rejects
        # mhalo='pallas': that branch had no sharded equivalence test and
        # the form is measured-neutral single-chip — CLAUDE.md round 4)
        hs_m3 = stx.halo_pull(
            d1[:, :S1].reshape(A, E3), st.nbr, tshape, T, E
        ).reshape(A, S1, 128)
        mgblk = hs_m3.reshape(NG, G * S1, 128)
        # dep2 emits COMBINED m+f (d1 momentum added in-kernel); ghost tiles
        # lose their d1 momentum to the count==0 fast path / skipped grid,
        # but the combined exchange below refills them with the neighbor's
        # combined windows
        dep2 = dep2_k(
            st.count, st.tid, st.stream, mgblk=mgblk, params=params6,
            d1blk=d1.reshape(dep1.shape), n_asgn=no,
        )
        mf3 = jnp.where(occ_t, dep2.reshape(A, D * S1, 128), 0.0)
        mf3 = _exchange_blocks(mf3, ss.col, sspec)
        if not spec.interpret:
            # ghost-aware gated tables (see _bin_local): skip provably-zero
            # DMA sources without ever gating away remotely-filled ghosts
            for d in range(D - 1):
                mf3 = stx._make_halo_axis(spec, D, d, D)(
                    mf3, st.nbrg[2 * d], st.nbrg[2 * d + 1], n_asgn=na
                )
            gblk = stx._make_halo_gblk(spec, D, D - 1, cfg.dt, cfg.gravity)(
                mf3, hs_m3, st.nbrg[2 * (D - 1)], st.nbrg[2 * (D - 1) + 1],
                n_asgn=no,
            ).reshape(NG, G * stx.GROWS * S1, 128)
        else:
            hs_mf3 = stx.halo3(mf3, st.nbr, spec, D, D)
            mfv = hs_mf3.reshape(A, D, S1, 128)
            mav = hs_m3[:, None]
            vv = jnp.where(
                mav > 0.0,
                mfv / jnp.where(mav > 0.0, mav, 1.0)
                + cfg.dt * g[None, :, None, None],
                0.0,
            )
            gblk = jnp.concatenate(
                [vv.reshape(A, D * S1, 128), hs_m3], axis=1
            ).reshape(NG, G * stx.GROWS * S1, 128)
    else:
        d1 = jnp.where(occ_t, dep1.reshape(A, stx.GROWS, EP), 0.0)
        d1 = _exchange_blocks(d1, ss.col, sspec)
        blk1 = d1[:, : 1 + D, :E3]
        hs_m = stx.halo_stream(blk1[:, 0, :], st.nbr, tshape, spec, D, 1)
        mgblk = jnp.pad(hs_m, ((0, 0), (0, EP - E3))).reshape(NG, G, EP)
        dep2 = dep2_k(
            st.count, st.tid, st.stream, mgblk=mgblk, params=params6,
            d1blk=d1.reshape(dep1.shape), n_asgn=no,
        )
        mf = jnp.where(occ_t, dep2.reshape(A, D, EP), 0.0)
        mf = _exchange_blocks(mf, ss.col, sspec)
        blk2 = mf[:, :, :E3]  # combined m+f
        hs_mf = stx.halo_stream(
            blk2.reshape(A, D * E3), st.nbr, tshape, spec, D, D
        )
        mf = hs_mf.reshape(A, D, E3)
        ma_ = hs_m.reshape(A, 1, E3)
        v = jnp.where(
            ma_ > 0.0,
            mf / jnp.where(ma_ > 0.0, ma_, 1.0) + cfg.dt * g[None, :, None],
            0.0,
        )
        gblk = jnp.concatenate([v, ma_], axis=1)
        gblk = jnp.pad(gblk, ((0, 0), (0, stx.GROWS - 1 - D), (0, EP - E3)))
        gblk = gblk.reshape(NG, G * stx.GROWS, EP)

    # g2p runs in GLOBAL coordinates: shift the stream's x row into the
    # local template only where tile geometry is involved — the collect
    # kernel derives cells from pos, so feed it locally-shifted positions
    # and shift back afterwards.  (The stream already stores local x; see
    # shard_stream/bin.)
    params = stx._collect_params(cfg, mouse_pos, mouse_active, D, spec.scene_stride)
    # boundary walls are global: express them in local coordinates
    shift = _local_origin_shift(sspec).astype(jnp.float32)
    params = params.at[8].add(-shift)  # mouse x
    params = params.at[10].add(-shift)  # clip_lo x
    params = params.at[10 + D].add(-shift)  # clip_hi x
    outs = coll_k(st.count, st.tid, params, st.stream, gblk, n_asgn=no)
    new_stream, flag = outs[0], outs[1]
    dep1_next = outs[2] if fused else None
    if spec.dyn:
        # skipped tail programs leave their flag blocks uninitialized;
        # needs_rebin reduces over the whole array, so mask by occupancy
        # (mirrors _substep_core)
        occ_e = st.count > 0
        if stx._use_pair(spec, D):
            occ_e = occ_e[0::2] | occ_e[1::2]
        GB = flag.shape[1]
        flag = jnp.where(occ_e.reshape(NG, GB, 1), flag, 0.0)
    st2 = StreamState(
        stream=new_stream, count=st.count, tid=st.tid, flag=flag, nbr=st.nbr,
        # nbrg here is the GHOST-AWARE gate built by _bin_local (count OR
        # ghost), so the halo passes above can skip zero shells without
        # gating away remotely-filled ghost blocks
        nbrg=st.nbrg, shell_drop=st.shell_drop, need_peak=st.need_peak,
        rebins=st.rebins,
    )
    return ShardStreamState(st=st2, col=ss.col), dep1_next


def _extract_k(mask, prio_iota, k: int):
    """Indices of the first k set entries (by iota order) + validity."""
    n = mask.shape[0]
    prio = jnp.where(mask, prio_iota, n)
    order = jnp.argsort(prio)[:k]
    valid = jnp.take(mask, order)
    return order, valid


def _sharded_rebin(
    ss: ShardStreamState, cfg: Config, sspec: StreamShardSpec
) -> ShardStreamState:
    """Re-bin + slot migration (the swap_mul analog).

    COMPACTED to the per-device live rows first (round 5): the old form
    ran keys/extract/sort over ALL slots — O(A·cap) = 2.23M rows at 3d-1m
    where ~1M are live — and measured ~1.7 s per re-bin on v5e (the whole
    ×4.67 sharded-sanity overhead; the sharded SUBSTEP is only ×1.25).
    Per-device live counts are dynamic, but they are bounded by the STATIC
    ``live_cap`` = min(slot count, global n): a device can never hold more
    rows than exist globally.  Compacting via the same one-hot-histogram
    ``_compact_src`` the solo ``_rebin_full`` uses makes every downstream
    op (keys, the two extract-k argsorts, the bin sort + slot fill)
    live_cap-shaped.  Movers are rows whose predictive key lands in a
    ghost column; each direction ships up to migrate_cap rows."""
    spec = sspec.spec
    D = cfg.dim
    s = sspec.n_shards
    mcap = sspec.migrate_cap
    st = ss.st
    tshape = _local_tshape(sspec)
    nt = math.prod(tshape)
    rs = math.prod(tshape[1:])

    # pair-aware slot flatten: under spec.pair each cap-lane block holds
    # TWO front-packed tiles, so validity is per-BLOCK count sums
    flat = stx._stream_flat(st, spec, D)
    ncap = sspec.live_cap_rows
    live = st.count.sum()
    src = stx._compact_src(
        st.count, ncap, spec.cap, spec.A, stx._use_pair(spec, D)
    )
    rows = jnp.take(flat, src, axis=0)  # [ncap, F] live-compacted
    valid = jnp.arange(ncap, dtype=jnp.int32) < live
    keys = _local_keys(rows[:, 0:D], rows[:, D : 2 * D], sspec, cfg.dt)
    keys = jnp.where(valid, keys, nt)

    tx = keys // rs  # local tile x column
    go_left = valid & (tx == 0)
    go_right = valid & (tx == sspec.ts + 1)

    iota = jnp.arange(ncap, dtype=jnp.int32)
    sel_l, val_l = _extract_k(go_left, iota, mcap)
    sel_r, val_r = _extract_k(go_right, iota, mcap)
    em_l = jnp.take(rows, sel_l, axis=0)
    em_r = jnp.take(rows, sel_r, axis=0)
    em_l = jnp.where(val_l[:, None], em_l, 0.0)
    em_r = jnp.where(val_r[:, None], em_r, 0.0)
    # emigrant x leaves in GLOBAL coordinates (templates differ per device)
    shift = _local_origin_shift(sspec).astype(jnp.float32)
    em_l = em_l.at[:, 0].add(jnp.where(val_l, shift, 0.0))
    em_r = em_r.at[:, 0].add(jnp.where(val_r, shift, 0.0))

    # ship; leavers key to the sentinel locally
    keys = keys.at[sel_l].set(jnp.where(val_l, nt, jnp.take(keys, sel_l)))
    keys = keys.at[sel_r].set(jnp.where(val_r, nt, jnp.take(keys, sel_r)))
    im_r, imv_r = lax.ppermute((em_l, val_l), AXIS, _perm_left(s))
    im_l, imv_l = lax.ppermute((em_r, val_r), AXIS, _perm_right(s))
    im_l = im_l.at[:, 0].add(jnp.where(imv_l, -shift, 0.0))
    im_r = im_r.at[:, 0].add(jnp.where(imv_r, -shift, 0.0))

    im = jnp.concatenate([im_l, im_r], axis=0)
    imv = jnp.concatenate([imv_l, imv_r], axis=0)
    im_keys = _local_keys(im[:, 0:D], im[:, D : 2 * D], sspec, cfg.dt)
    im_keys = jnp.where(imv, im_keys, nt)

    rows_all = jnp.concatenate([rows, im], axis=0)
    all_keys = jnp.concatenate([keys, im_keys], axis=0)
    return _bin_local(rows_all, rows_all.shape[0], sspec, all_keys)


def sharded_frame_binned(
    ss: ShardStreamState,
    cfg: Config,
    sspec: StreamShardSpec,
    mouse_pos,
    mouse_active,
    substeps: Optional[int] = None,
):
    """Per-device frame body (call inside shard_map): substeps with
    mesh-agreed drift-triggered re-bins + migration.

    Returns ``(ss, rebins)`` where ``rebins`` is the mesh-agreed number of
    drift re-bins this frame fired (identical on every device — the
    trigger is a pmax) so drivers/tests can assert migration actually
    exercised (VERDICT r3 weak #2)."""
    spec = sspec.spec
    D = cfg.dim
    tshape = _local_tshape(sspec)
    origin = tuple(int(o) for o in sspec.local_domain.origin)
    n_sub = cfg.iterations if substeps is None else substeps
    dep1_k = stx.make_deposit_kernel(spec, D, tshape, origin, "p2g1")

    def body(_, carry):
        ss, dep1, nrb = carry
        ss, dep1_next = _sharded_substep_core(
            ss, dep1, cfg, sspec, mouse_pos, mouse_active, fused=True
        )

        def do_rebin(ss):
            ss2 = _sharded_rebin(ss, cfg, sspec)
            # carry the budget-exhaustion watermark across re-bins
            ss2 = dataclasses.replace(
                ss2,
                st=dataclasses.replace(
                    ss2.st,
                    shell_drop=jnp.maximum(
                        ss.st.shell_drop, ss2.st.shell_drop
                    ),
                    need_peak=jnp.maximum(
                        ss.st.need_peak, ss2.st.need_peak
                    ),
                    rebins=ss.st.rebins + 1,
                ),
            )
            no2 = stx._n_occ(ss2.st.count) if spec.dyn else None
            return ss2, dep1_k(
                ss2.st.count, ss2.st.tid, ss2.st.stream, n_asgn=no2
            )

        # all devices must agree (collectives inside both branches)
        need = lax.pmax(
            stx.needs_rebin(ss.st, sspec.local_domain, spec, D).astype(jnp.int32),
            AXIS,
        )
        ss, dep1 = lax.cond(need > 0, do_rebin, lambda s: (s, dep1_next), ss)
        return ss, dep1, nrb + need

    no0 = stx._n_occ(ss.st.count) if spec.dyn else None
    dep1_0 = dep1_k(ss.st.count, ss.st.tid, ss.st.stream, n_asgn=no0)
    ss, _, nrb = lax.fori_loop(
        0, n_sub, body, (ss, dep1_0, jnp.zeros((), jnp.int32))
    )
    return ss, nrb


# ---------------------------------------------------------------------------
# Host-side shard construction / gather / frame driver
# ---------------------------------------------------------------------------


def shard_stream(
    p: ParticleState, cfg: Config, sspec: StreamShardSpec, mesh: Mesh
) -> ShardStreamState:
    """Bin particles into per-device local streams ([s, ...] leading axis
    sharded over the mesh).  Positions are stored in each device's LOCAL
    template coordinates (x shifted by -d*TS*T)."""
    import numpy as np

    spec = sspec.spec
    s, T = sspec.n_shards, sspec.tile
    D = p.dim
    n = p.n
    tshape = _local_tshape(sspec)
    nt = math.prod(tshape)

    pos = np.asarray(p.pos)
    # ownership must follow the PREDICTIVE key (the same pos+lookahead keys
    # local binning uses): owner-by-raw-position lets a boundary resident
    # predictively key into its own ghost column, where the block exchange
    # would overwrite its deposits
    gtshape = tuple(sh // T for sh in sspec.domain.shape)
    gkeys = np.asarray(
        stx._keys_from_pos(
            p.pos, sspec.domain, spec, gtshape, vel=p.vel, dt=cfg.dt
        )
    )
    gtx = gkeys // math.prod(gtshape[1:])
    owner = np.clip(gtx // sspec.ts, 0, s - 1)

    rows_np = np.concatenate(
        [
            pos,
            np.asarray(p.vel),
            np.asarray(p.C).reshape(n, D * D),
            np.asarray(p.mass)[:, None],
            np.arange(n, dtype=np.float32)[:, None],
            np.asarray(p.density)[:, None],
            np.asarray(p.pressure)[:, None],
        ],
        axis=1,
    )
    F = rows_np.shape[1]
    # static per-device row budget (pair mode halves the slot blocks)
    GB = spec.group // 2 if stx._use_pair(spec, D) else spec.group
    n_max = spec.NG * GB * spec.cap
    per_rows = np.zeros((s, n_max, F), np.float32)
    per_n = np.zeros((s,), np.int64)
    for d in range(s):
        ids = np.nonzero(owner == d)[0]
        if len(ids) > n_max:
            raise ValueError(f"shard {d}: {len(ids)} particles > budget {n_max}")
        r = rows_np[ids].copy()
        r[:, 0] -= d * sspec.ts * T  # into the local template
        per_rows[d, : len(ids)] = r
        per_n[d] = len(ids)

    # local binning per device on host (trace-free, small)
    def bin_one(d):
        rows = jnp.asarray(per_rows[d])
        valid = jnp.arange(n_max) < int(per_n[d])
        keys = stx._keys_from_pos(
            rows[:, 0:D], sspec.local_domain, spec, tshape,
            vel=rows[:, D : 2 * D], dt=cfg.dt,
        )
        keys = jnp.where(valid, keys, nt)
        return _bin_local(rows, n_max, sspec, keys)

    states = [jax.tree.map(np.asarray, bin_one(d)) for d in range(s)]
    # leading device axis MERGED into dim 0 ([s*NG, ...], [s*A], ...): under
    # shard_map P(AXIS) each device then sees exactly the per-device shapes
    stacked = jax.tree.map(
        lambda *xs: np.stack(xs).reshape((-1,) + xs[0].shape[1:]), *states
    )
    sharding = NamedSharding(mesh, P(AXIS))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), stacked)


def gather_stream(
    ss: ShardStreamState, cfg: Config, sspec: StreamShardSpec, n: int
) -> ParticleState:
    """Collect all devices' live slots back to one ordered ParticleState."""
    spec = sspec.spec
    D = cfg.dim
    cap, G, A, NG = spec.cap, spec.group, spec.A, spec.NG
    s, T = sspec.n_shards, sspec.tile
    st = jax.tree.map(np.asarray, ss.st)
    F = st.stream.shape[-2]
    GB = G // 2 if stx._use_pair(spec, D) else G  # slot blocks per group
    stream_d = st.stream.reshape(s, NG, F, GB * cap)
    count_d = st.count.reshape(s, A)
    out = np.zeros((n, F), np.float32)
    seen = 0
    for d in range(s):
        flat = (
            stream_d[d]
            .reshape(NG, F, GB, cap)
            .transpose(0, 2, 3, 1)
            .reshape(NG * GB * cap, F)
        )
        blk_cnt = (
            count_d[d][0::2] + count_d[d][1::2]
            if stx._use_pair(spec, D)
            else count_d[d]
        )
        valid = np.arange(NG * GB * cap) % cap < np.repeat(blk_cnt, cap)
        rows = flat[valid]
        rows[:, 0] += d * sspec.ts * T  # back to global x
        ids = rows[:, 2 * D + D * D + 1].astype(np.int64)
        out[ids] = rows
        seen += len(rows)
    assert seen == n, f"particle loss across shards: {seen} != {n}"
    drops = int(np.max(st.shell_drop))
    assert drops == 0, (
        f"active-budget exhaustion on a shard: {drops} needed relay tiles "
        f"were dropped at a (re-)bin — physics invalid"
    )
    return ParticleState(
        pos=jnp.asarray(out[:, 0:D]),
        vel=jnp.asarray(out[:, D : 2 * D]),
        C=jnp.asarray(out[:, 2 * D : 2 * D + D * D].reshape(n, D, D)),
        mass=jnp.asarray(out[:, 2 * D + D * D]),
        density=jnp.asarray(out[:, 2 * D + D * D + 2]),
        pressure=jnp.asarray(out[:, 2 * D + D * D + 3]),
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "sspec", "mesh", "substeps"),
    donate_argnames=("ss",),
)
def sharded_stream_frame(
    ss: ShardStreamState,
    cfg: Config,
    sspec: StreamShardSpec,
    mesh: Mesh,
    mouse_pos,
    mouse_active,
    substeps: Optional[int] = None,
):
    """One frame of the sharded stream backend (shard_map over "space").

    Returns ``(ss, rebins)`` — see ``sharded_frame_binned``."""

    def local(ss, mp, ma):
        return sharded_frame_binned(ss, cfg, sspec, mp, ma, substeps=substeps)

    fn = jax.shard_map(
        local, mesh=mesh, in_specs=(P(AXIS), P(), P()),
        # the re-bin counter is mesh-agreed (pmax) => replicated
        out_specs=(P(AXIS), P()),
        # pallas_call emits ShapeDtypeStructs without vma annotations
        check_vma=False,
    )
    return fn(ss, mouse_pos, mouse_active)


class ShardedSession:
    """Interactive multi-chip session — the ``Session`` analog for the
    sharded stream backend (VERDICT r3 missing #3: the reference's whole
    surface is interactive, ``2d_multi.rs:518-539``, and until round 4 the
    sharded path only offered batch ``sharded_stream_frame`` calls).

    Holds the per-device binned state across frames (the chunk-map
    persistence analog), advances frames with mesh-agreed re-bins +
    migration, and renders the console histogram from gathered live slots.
    Same strict-mode invariants as ``Session``: particle conservation and
    the shell_drop watermark are checked after every frame.
    """

    def __init__(
        self,
        cfg: Config,
        domain: Domain,
        p: ParticleState,
        mesh: Mesh,
        sspec: Optional[StreamShardSpec] = None,
        strict: bool = True,
    ):
        self.cfg = cfg
        self.domain = domain
        self.mesh = mesh
        self.n = p.n
        self.strict = strict
        s = mesh.devices.size
        self.sspec = sspec if sspec is not None else default_shard_spec(
            cfg, domain, s, p.n, pos=p.pos, vel=p.vel
        )
        self._ss = shard_stream(p, cfg, self.sspec, mesh)
        self._frames = 0
        self.rebins = 0  # cumulative drift re-bins across frames
        self._run_fns = {}  # frames -> jitted k-frame shard_map program

    def _check(self, label: str) -> None:
        live = int(np.asarray(self._ss.st.count).sum())
        if live != self.n:
            raise RuntimeError(
                f"particle loss {label}: sum(count)={live} != n={self.n} "
                f"(raise spec.active/cap)"
            )
        drops = int(np.asarray(self._ss.st.shell_drop).max())
        if drops:
            raise RuntimeError(
                f"active-budget exhaustion {label}: {drops} relay tiles "
                f"dropped on a shard (raise spec.active)"
            )

    def frame(self, mouse=None) -> None:
        """Advance one frame.  Delegates to ``run(1)`` so the interactive
        per-frame path and the fused k-frame path share ONE jitted program
        (a separate per-frame program would double the trace/compile cost
        for identical semantics)."""
        self.run(1, mouse)

    # -- fused spans + replay (round-4 Session upgrades, VERDICT r4 #6) -----

    def snapshot(self):
        """Deep-copy the live per-device state; with ``restore`` a caller
        replays the SAME frame span through the already-warm jitted program
        (the warm-run-then-restore timing discipline Session.run uses —
        sharded benchmarks must not re-learn the dispatch-latency and
        warm-span pitfalls, see Session.snapshot)."""
        return (
            self._frames,
            self.rebins,
            jax.tree.map(lambda a: a.copy(), self._ss),
        )

    def restore(self, snap) -> None:
        """Reset to a ``snapshot()``.  Copies again so the snapshot
        survives repeated restores (``run`` donates the state buffers)."""
        self._frames, self.rebins, src = snap
        self._ss = jax.tree.map(lambda a: a.copy(), src)

    def _frame_fn(self):
        """The ONE jitted per-frame program (cached)."""
        fn = self._run_fns.get(1)
        if fn is None:
            cfg, sspec = self.cfg, self.sspec

            def local(ss, mp, ma):
                return sharded_frame_binned(ss, cfg, sspec, mp, ma)

            fn = jax.jit(
                jax.shard_map(
                    local, mesh=self.mesh, in_specs=(P(AXIS), P(), P()),
                    out_specs=(P(AXIS), P()), check_vma=False,
                ),
                donate_argnums=0,
            )
            self._run_fns[1] = fn
        return fn

    def run(self, frames: int, mouse=None) -> None:
        """Advance ``frames`` frames as k ASYNC dispatches of the single
        per-frame program — no host sync between frames (the re-bin
        counters are fetched once at the end), so dispatch latency
        pipelines behind execution.  Chosen over Session.run's
        fori-of-frames fusion: at sharded scales a frame is seconds, so
        there is no dispatch latency worth fusing away, one program
        serves frame() and run(), and the direct per-frame form is the
        one that measured the honest ×1.65 overhead vs solo (3d-1m,
        1-device mesh, min-of-reps; harness-span measurements of BOTH
        forms were unstable ×3.3-6.7 on the flaky tunnel — see
        BASELINE.md round-5 memo note).  ``mouse`` applies to every
        frame in the span — interactive use wants ``frame()``."""
        from .. import step as step_mod

        mp, ma = mouse if mouse is not None else step_mod.no_mouse()
        fn = self._frame_fn()
        nrbs = []
        for _ in range(frames):
            self._ss, nrb = fn(self._ss, mp, ma)
            nrbs.append(nrb)
        self.rebins += int(jnp.stack(nrbs).sum())  # ONE end-of-span fetch
        self._frames += frames
        if self.strict:
            self._check(f"during {frames}-frame run")

    # -- watermarks (Session parity) ----------------------------------------

    def live_count(self) -> int:
        return int(np.asarray(self._ss.st.count).sum())

    def shell_drop(self) -> int:
        return int(np.asarray(self._ss.st.shell_drop).max())

    def need_peak(self) -> int:
        return int(np.asarray(self._ss.st.need_peak).max())

    def block_until_ready(self) -> None:
        import jax

        leaves = jax.tree_util.tree_leaves(self._ss)
        jax.block_until_ready(leaves)
        float(np.asarray(leaves[0]).ravel()[0])

    def particles(self) -> ParticleState:
        return gather_stream(self._ss, self.cfg, self.sspec, self.n)

    def render(self, viewport_size, console_size) -> list:
        from .. import render as render_mod

        p = self.particles()
        return render_mod.ascii_frame(
            np.asarray(
                render_mod.histogram(
                    p.pos, jnp.asarray(viewport_size, jnp.float32),
                    tuple(console_size),
                )
            )
        )
