"""Stream transfer — persistent grouped slot-major Pallas kernels (round 2).

The round-1 hot paths (ops/tiled_transfer.py pure-XLA, ops/pallas_transfer.py
per-tile kernels) were re-measured on TPU v5e (bench/micro_kernels.py) and
their remaining costs are dominated by:

  * per-substep re-binning (argsort ~10ms + packed gather ~47ms + un-bin
    ~15ms at 1M particles) — paid 31x per frame;
  * per-program kernel dispatch (~550 ns/tile) and per-HBM-row DMA (~25
    ns/row): a [E^3, 4] output block decomposes into 1728 16-byte rows per
    8-tile program, while a [18, 8*128] block is 18 fat rows.

This backend removes both:

1. **Persistent slot-major stream.**  Particle state lives in HBM as
   ``stream [NG, F, G*cap]`` — G tiles per group, tile j of a group owning
   lanes ``[j*cap, (j+1)*cap)``, fields as rows (F = 19: pos D, vel D, C D*D,
   mass, id, rho, prs).  Every kernel block is a handful of >=4KB rows, and
   per-tile lane slices are 128-aligned (cap = 128).  The binning PERSISTS
   across substeps: kernels re-derive each particle's cell from its current
   position every substep, and the expanded window E = T + 2h with h = 2
   stays valid until a particle drifts more than h-1 cells outside its bin
   tile.  A cheap XLA check triggers re-binning via ``lax.cond`` only when
   needed (at rest-density scenes: every ~10-30 substeps instead of every
   substep).

2. **One-window kernels.**  The APIC moment windows obey
   ``Wv[d] = W0 * (e_d - lc_d - 1)`` (e_d = window coordinate, lc_d = local
   cell), so the 1+D variant matmuls collapse into ONE matmul plus per-lane
   fixups on the output:

     deposit:  block = W0 @ (V0 - sum_d (lc_d+1) V_d)  +  sum_d e_d (W0 @ V_d)
     collect:  M_d   = W0^T @ (e_d * blk) - (lc_d+1) * (W0^T @ blk)

   Deposits use the A@B^T form ``Ucat [C, cap] x W0 [E^D, cap] -> [C, E^D]``
   (transposed output = fat rows); collects use ``Bcat [C', E^D] x W0 -> [C',
   cap]`` — both MXU-native, no in-kernel relayouts (measured: deposit 391
   ns/tile, collect 422 ns/tile at E=6; E=8 costs +15%/+1%).

Physics is identical to ops/transfer.py (p2g_1 2d_multi.rs:148-180, p2g_2
:182-238, update :240-250, g2p :252-359, quirks Q2/Q3 included); only the
data movement differs.  Equivalence is tested against the dense backend
(tests/test_stream.py).

Strictness contract: like the tiled backend's ``strict=True`` — the caller
sizes ``cap``/``active`` so no tile overflows (``overflow_count`` checks, and
``frame_binned`` exposes ``sum(count)`` so a mid-run re-bin overflow is
detectable as a lost particle).  Particle output order is tile-sorted; the
``id`` row recovers the original order on un-bin.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import types
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Config
from ..domain import Domain
from ..state import GridState, ParticleState


def _pad128(x: int) -> int:
    return -(-x // 128) * 128


CHP = 8  # per-tile channel rows in block arrays, padded to the f32 sublane tile
GROWS = 4  # per-tile rows in the grid-value (gblk) array: v[D], mass, pad


def _use_r3(spec: "StreamSpec", D: int) -> bool:
    """Rank-3 halo-native block layout: [A, ch*S1, 128] with S1 = E^D/128.

    3D only — the gblk reshapes assume GROWS == 1+D; a 2D spec whose window
    happens to be lane-aligned (e.g. tile=12, halo=2 -> E^2 = 256) must take
    the flat path or the (1+D)*S1-row reshapes mismatch the GROWS layout."""
    return D == 3 and spec.E**D % 128 == 0


@dataclasses.dataclass(frozen=True)
class StreamSpec:
    """Static layout parameters (hashable => jit-static)."""

    tile: int = 4  # T: cells per tile edge
    cap: int = 128  # particle slots per tile (lane count — keep 128)
    halo: int = 2  # h: window reach beyond the tile; E = T + 2h
    group: int = 8  # G: tiles per kernel program
    active: int = 64  # A: active-tile budget (rounded up to a group multiple)
    # packed-scene stride along x (scene.pack_scenes): per-scene walls at
    # [k*stride + clip_lo_x, k*stride + clip_hi_x]; 0 = single scene
    scene_stride: float = 0.0
    interpret: bool = False  # run kernels in interpreter mode (CPU tests)
    # FLAT-path window chunking: lanes per in-kernel window materialization
    # (None = auto by VMEM budget, see _wchunk).  Big-tile specs (T=8,
    # cap=1024) need it: the full [E^3, cap] window is ~7 MB of VMEM.
    wchunk: Optional[int] = None
    # TILE PAIRING (zfac path only): two occupied tiles share each cap-lane
    # slot block, and every per-tile zfac dot becomes one per-PAIR dot whose
    # output lanes carry tile A in 0:64 and tile B in 64:128 (the pad half
    # the solo dot wastes).  ~2x fewer MXU dots at ~2x slot occupancy, and
    # half the stream slots (bin/re-bin gathers, collect writes).  See
    # _bin_rows for the pairing rule.
    pair: bool = False
    # DYNAMIC kernel grids: launch only the programs whose slot range
    # intersects [0, n_asgn) — the assigned (occupied + relay shell)
    # prefix of the occupied-first active ordering — and skip the zero
    # tail's dispatch + block DMA entirely (the tail is pure budget
    # headroom: ~70% of A at 3d-ref, ~40% at 3d-1m).  Skipped output
    # blocks are UNINITIALIZED; every consumer gates on count/tid and
    # the drift flag is masked in _substep_core.  Interpret mode fills
    # skipped blocks with NaN, so the CPU equivalence suite verifies the
    # gating for real.
    dyn: bool = True
    # GRADED drift flag margin, in cells.  0.0 = binary flag (today's
    # behavior).  m > 0 makes the collect kernel emit 2.0 for true drift
    # violations (next deposit outside [1-h, T-2+h] — the re-bin TRIGGER)
    # and 1.0 for "at-risk" slots within m cells of the window edge.  A
    # partial re-bin that moves only flag>=1 slots keeps the trigger rate
    # of the full policy (violator-only re-keys measure 10x trigger
    # inflation; graded(0.5) matches full at ~1.5% moved —
    # bench/emu_rebin_policy.py).
    rebin_margin: float = 0.0
    # MASS-halo form (r3 path).  "xla" = the halo_pull gather: 6 full-[A]
    # row gathers per substep, cost ~0.15-0.2 us per BUDGET tile whether
    # assigned or not (XLA ops cannot be dynamically bounded) — wins when
    # the budget is tight (A ~ n_asgn; measured 4.2 vs 5.5 ms at 3d-1m).
    # "pallas" = the same dyn-bounded separable axis kernels the m+f halo
    # uses (CH=1, gated nbrg tables): pays ~2x per ROW at 2 KB rows but
    # only for the n_asgn prefix.  Measured NEUTRAL at 3d-ref (within the
    # +-5 ms tunnel jitter band both ways; bench/micro_refscale.py + an
    # alternated A/B) because the A-residue is the RE-BIN's A-shaped table
    # builds, not this gather — so bench keeps the default and tightens
    # budgets instead.
    mhalo: str = "xla"

    def __post_init__(self):
        if self.cap % 128:
            raise ValueError("cap must be a multiple of 128 (lane alignment)")
        if self.halo < 1:
            raise ValueError("halo must cover the stencil radius (>= 1)")
        if self.wchunk is not None and self.cap % self.wchunk:
            raise ValueError("wchunk must divide cap")
        if self.pair and self.group % 2:
            raise ValueError("pair mode needs an even group (tiles/program)")
        if self.mhalo not in ("xla", "pallas"):
            raise ValueError(f"mhalo must be 'xla' or 'pallas', got {self.mhalo!r}")

    @property
    def E(self) -> int:
        return self.tile + 2 * self.halo

    def EP(self, dim: int) -> int:
        return _pad128(self.E**dim)

    @property
    def A(self) -> int:
        return -(-self.active // self.group) * self.group

    @property
    def NG(self) -> int:
        return self.A // self.group


def default_spec(cfg: Config, domain: Domain, n: int) -> StreamSpec:
    """Size the active budget/cap like bench._tiled_spec: rest-density
    occupancy with splash headroom.  On CPU hosts the kernels run in
    interpreter mode (tests); real compilation is TPU-only."""
    T = 4
    per_tile = cfg.rest_density * T**cfg.dim
    # 32x the rest-density tile estimate: box scenes spread across the whole
    # floor and the active set is cube-DILATED (measured dilated peaks: 21x
    # the estimate at the 3D reference dam-break).  110k hard cap keeps the
    # SMEM scalar-prefetch arrays (count+tid, 8B/tile) under ~1MB.
    occupied = max(2048, int(n / max(per_tile, 1.0)) * 32)
    nt = math.prod(s // T for s in domain.shape)
    interpret = jax.default_backend() == "cpu"
    # interpret mode exists for the CPU test/dev path only, and its cost is
    # TRACE/COMPILE-bound with kernel-body size scaling in G — small groups
    # compile ~2.3x faster with identical semantics (tests/test_stream.py)
    return StreamSpec(
        tile=T, cap=128, halo=2, group=2 if interpret else 8,
        active=min(occupied, nt, 110_000), interpret=interpret,
    )


def _n_asgn(tid: jnp.ndarray, nt: int) -> jnp.ndarray:
    """1 + highest ASSIGNED slot index (tid < nt) — the dynamic-grid bound.

    Occupied-first binning (and its pair permutation, whose stable sort
    keeps assigned entries ahead of the tid == nt sentinels) packs every
    assigned slot into the prefix [0, n_asgn); kernels launched through
    ``_dyn_grid`` cover exactly the programs intersecting that prefix."""
    A = tid.shape[0]
    a_io = jnp.arange(A, dtype=jnp.int32)
    return 1 + jnp.max(jnp.where(tid < nt, a_io, -1))


def _n_occ(count: jnp.ndarray) -> jnp.ndarray:
    """1 + highest OCCUPIED slot index (count > 0) — the deposit/collect
    grid bound.

    Shell relays (assigned, zero-count) matter only as halo-pass
    intermediaries: their own deposit windows are identically zero (no
    particles) and their final gblk/collect outputs are never consumed
    (no particles to gather).  Occupied-first binning (and the pair
    permutation's count-descending sort) packs every count > 0 entry
    ahead of the shells, so dep1/dep2/collect/gblk can launch with this
    tighter bound; the halo axis passes keep ``_n_asgn`` (shells relay
    real data there) and read the skipped shells' deposit blocks as
    zero via the count-gated ``jnp.where`` in ``_substep_core``."""
    A = count.shape[0]
    a_io = jnp.arange(A, dtype=jnp.int32)
    return 1 + jnp.max(jnp.where(count > 0, a_io, -1))


def _dyn_grid(nprog: int, n_asgn, per: int):
    """Grid tuple for kernels of ``per`` slots/program (static max
    ``nprog``).  With a traced ``n_asgn`` the grid is DYNAMIC: tail
    programs never run — no ~550ns dispatch, no block DMA, no zero
    writes.  Their output blocks are UNINITIALIZED (NaN in interpret
    mode), which every consumer must gate on count/tid."""
    if n_asgn is None:
        return (nprog,)
    return (jnp.clip((n_asgn + per - 1) // per, 1, nprog),)


# Stream row layout (F rows).
def _row_layout(D: int):
    # pos[D], vel[D], C[D*D], mass, id, rho, prs
    return 2 * D + D * D + 4


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StreamState:
    """Persistent binned particle state (fori_loop carry)."""

    stream: jax.Array  # [NG, F, G*cap] f32
    count: jax.Array  # [A] i32 — valid slots per active tile (front-packed)
    tid: jax.Array  # [A] i32 — flat tile id (nt = empty slot-tile)
    # [NG, G, cap] f32 — per-slot drift verdicts from the last collect
    # (contiguous, so needs_rebin is one cheap reduce); zero after (re-)bins
    flag: jax.Array
    # [2*D, A] i32 — active index of every active tile's +/- face neighbor
    # (A = "no active neighbor" sentinel).  Rebuilt at (re-)bin time; lets
    # the halo run as a direct active-major pull, so NOTHING in the substep
    # scales with the dense tile count nt (at batch-64 the packed domain
    # has 373k tiles but only ~23k active).
    nbr: jax.Array
    # [2*D, A] i32 — the face rows of nbr, progressively DMA-source-GATED
    # for the m+f halo pass sequence: pass d's +/- tables route neighbors
    # whose deposit block is provably still all zero (count == 0 and no
    # earlier pass relayed into them) to the A sentinel, so the axis kernel
    # skips their DMA (~43% of actives are zero-count shells at 3d-1m).
    # Valid ONLY where "count == 0 => block zero" holds — the sharded path
    # fills ghost blocks remotely and must keep using the raw nbr rows.
    nbrg: jax.Array
    # [1] i32 — watermark of needed-but-dropped active tiles across
    # (re-)bins (active budget exhaustion).  Nonzero means a halo relay
    # path was silently broken at some point: the run's physics is invalid
    # even if the final state passes overflow_count.  Checked by
    # Session/bench.  (Shape [1], not [], so the leaf can ride shard_map's
    # P(AXIS) out_specs in the sharded backend.)
    shell_drop: jax.Array
    # [1] i32 — watermark of the needed-relay-closure SIZE across (re-)bins
    # (the actual active-budget demand, regardless of whether it fit A).
    # Lets the bench/session report "peak need X of budget A" after a
    # successful run, so budget rungs can be tightened from measurement
    # instead of discovered by loud failure (VERDICT r4 #5).
    need_peak: jax.Array
    # [1] i32 — drift re-bins since the initial bin (diagnostics; the
    # sharded backend has carried the same counter since round 3).  Re-bin
    # frequency x solo re-bin cost attributes the re-bin share of a frame
    # without per-substep host syncs.
    rebins: jax.Array


# ---------------------------------------------------------------------------
# Shared in-kernel pieces
# ---------------------------------------------------------------------------


def _tile_coord(tid, d: int, tshape):
    div = 1
    for k in range(d + 1, len(tshape)):
        div *= tshape[k]
    return (tid // div) % tshape[d]


def _kernel_profiles(pm, tid, T: int, E: int, h: int, tshape, origin, cap: int):
    """Profiles from a stream block's pos rows (see _kernel_profiles_from)."""
    D = len(tshape)
    return _kernel_profiles_from(
        [pm[d, :] for d in range(D)], tid, T, E, h, tshape, origin, cap
    )


def _kernel_profiles_from(pos, tid, T: int, E: int, h: int, tshape, origin, cap: int):
    """Per-axis plain profiles [E, cap], window-local cell base, dvec.

    Window coordinate e maps to global cell ``tile_origin + e - h``; a
    particle's stencil occupies rows base..base+2 with base = lc + h - 1
    (lc = cell - tile_origin, clipped to the drift-tolerant range).
    """
    D = len(tshape)
    plains, bases, dvec = [], [], []
    for d in range(D):
        pos_d = pos[d]
        cell = jnp.floor(pos_d)
        coord = _tile_coord(tid, d, tshape)
        lc = cell.astype(jnp.int32) - (origin[d] + coord * T)
        base = jnp.clip(lc + h - 1, 0, E - 3)
        dv = pos_d - cell - 0.5
        w = [0.5 * (0.5 - dv) ** 2, 0.75 - dv * dv, 0.5 * (0.5 + dv) ** 2]
        e_io = lax.broadcasted_iota(jnp.int32, (E, cap), 0)
        plain = jnp.zeros((E, cap), jnp.float32)
        for o in range(3):
            plain = jnp.where(e_io == base[None, :] + o, w[o][None, :], plain)
        plains.append(plain)
        bases.append(base)
        dvec.append(dv)
    return plains, bases, dvec


def _kernel_window(plains, E: int, cap: int, D: int):
    """W0 [E^D, cap] tensor product."""
    if D == 2:
        w01 = plains[0][:, None, :] * plains[1][None, :, :]
        return w01.reshape(E * E, cap)
    w01 = (plains[0][:, None, :] * plains[1][None, :, :]).reshape(E * E, cap)
    return (w01[:, None, :] * plains[2][None, :, :]).reshape(E**3, cap)


def _wchunk(spec: "StreamSpec", D: int) -> int:
    """Lanes per in-kernel window materialization in the FLAT path.

    Big-tile specs make the full [E^D, G*cap] window a multi-MB VMEM temp
    (T=8, cap=1024: 7 MB) — materialize it WC lanes at a time and accumulate
    the per-chunk dots instead.  Auto: largest power-of-two division of cap
    keeping one [EP, WC] f32 chunk under ~4 MB (cap itself when it fits,
    which preserves the measured production path at T=4)."""
    if _use_r3(spec, D):
        return spec.cap  # r3/zfac path never materializes the flat window
    if spec.wchunk is not None:
        return min(spec.wchunk, spec.cap)
    wc = spec.cap
    while wc > 128 and spec.EP(D) * wc * 4 > 4 * 1024 * 1024:
        wc //= 2
    return wc


def _window_chunk(plains, vf, lo: int, wc: int, E: int, D: int):
    """Window rows [E^D, wc] for lane range [lo, lo+wc), masked by ``vf``
    (valid-lane floats; None = unmasked).

    Equivalent to ``(_kernel_window(plains, ...) * vf)[:, lo:lo+wc]`` without
    ever materializing the full-GL window."""
    sl = slice(lo, lo + wc)
    # NB: slice FIRST, newaxis AFTER — ``plains[d][None, :, sl]`` (newaxis
    # mixed into the index tuple) traces as a GATHER, which Mosaic's
    # _gather_lowering_rule rejects on hardware (interpret mode hides it).
    w01 = (plains[0][:, sl][:, None, :] * plains[1][:, sl][None, :, :]).reshape(
        E * E, wc
    )
    if D == 2:
        return w01 if vf is None else w01 * vf[:, sl]
    w = (w01[:, None, :] * plains[2][:, sl][None, :, :]).reshape(E**3, wc)
    return w if vf is None else w * vf[:, sl]


# In-situ A/B toggles for the z-factored contraction sites (read at kernel
# trace time; bench/prof_stream flips them to attribute wins per site).
ZFAC_DEPOSIT = True
ZFAC_RHO = True
ZFAC_G2P = True


def _use_pair(spec: "StreamSpec", D: int) -> bool:
    """Tile pairing packs tile B's window rows/lanes into the 64..128 half
    that a 64-row window leaves as zero padding.  3D: rides the zfac dot
    structure (the E^2 = 64 pair window).  2D: the FULL window is E^2 = 64
    rows, so the flat path pairs directly (_use_pair2)."""
    return spec.pair and (_use_zfac(spec, D) or _use_pair2(spec, D))


def _use_pair2(spec: "StreamSpec", D: int) -> bool:
    """FLAT-path 2D pairing: requires the production window geometry
    (E^2 == 64 == half a lane vector, so two tiles' windows fill the
    EP = 128 dot lanes exactly) and an unchunked window (the pair dot
    contracts all cap lanes at once)."""
    return (
        D == 2
        and spec.E**2 == 64
        and not _use_r3(spec, D)
        and _wchunk(spec, D) == spec.cap
    )


def _use_zfac(spec: "StreamSpec", D: int) -> bool:
    """z-factored contractions: every in-kernel dot against the E^3-wide
    window W0 = wx (x) (wy (x) wz) factors through the E^2 = 64-row pair
    window, cutting the MXU weight-load from 4 tiles to 1 per dot (the
    substep's binding cost is ~3 latency-bound window dots per occupied
    tile — BASELINE.md round 2).  Requires the r3 layout with E == 8:
    the merge identities below assume E^2 == 64 == half a lane vector
    (S1 == E/2), and Mosaic cannot reshape 64-lane arrays (probes p3/p4),
    so all intermediates stay 128-lane via zero-padding + roll-select."""
    return _use_r3(spec, D) and spec.E == 8


def _kernel_w12p(plains, GL: int):
    """[128, GL] pair window wy (x) wz (flat e1*E + e2), zero-padded from
    E^2 = 64 to 128 rows (padded rows contribute 0 to every contraction)."""
    E = plains[1].shape[0]
    E2 = E * E
    w12 = (plains[1][:, None, :] * plains[2][None, :, :]).reshape(E2, GL)
    return jnp.pad(w12, ((0, 128 - E2), (0, 0)))


def _kernel_wxs(plains, GL: int):
    """wx rows permuted to (kbit, q) order: wxs[kb*Q + q] = wx[2q + kb].

    Stacking the slow window axis into the dot's M rows in THIS order makes
    the merge back to window rows (r, q) a 4D sublane-group index plus one
    roll-select (probes p8/p9) — never a 64-lane reshape."""
    E = plains[0].shape[0]
    Q = E // 2
    rid = lax.broadcasted_iota(jnp.int32, (E, GL), 0)
    out = jnp.zeros((E, GL), jnp.float32)
    for row in range(E):
        out = jnp.where(
            rid == row, plains[0][2 * (row % Q) + row // Q][None, :], out
        )
    return out


def _zfac_merge(Yz, R: int, E: int):
    """Dot output [R*E, 128] rows (r, kbit, q), valid lanes yz < 64 ->
    window rows [R*S1, 128] (r, q) with lanes (kbit*64 + yz): row (r, q)
    covers flat e-indices q*128..(q+1)*128 = e0 in {2q, 2q+1} x yz."""
    Q = E // 2
    Y4 = Yz.reshape(R, 2, Q, 128)
    Ya = Y4[:, 0].reshape(R * Q, 128)
    Yb = Y4[:, 1].reshape(R * Q, 128)
    l_io = lax.broadcasted_iota(jnp.int32, (R * Q, 128), 1)
    return jnp.where(l_io < 64, Ya, pltpu.roll(Yb, 64, 1))


def _kernel_w12p_pair(plains, mA, mB):
    """[128, GL] PAIR window: lane columns of tile A carry their wy (x) wz
    rows in 0:64, tile B lanes in 64:128 — the zero-pad half of the solo
    pair window (_kernel_w12p).  One dot against this serves both member
    tiles of a slot block; ``mA``/``mB`` are the per-lane membership masks
    (floats, already restricted to valid slots)."""
    E = plains[1].shape[0]
    E2 = E * E  # == 64 (zfac invariant)
    GL = plains[1].shape[1]
    w12 = (plains[1][:, None, :] * plains[2][None, :, :]).reshape(E2, GL)
    return jnp.pad(w12 * mA[None, :], ((0, 128 - E2), (0, 0))) + jnp.pad(
        w12 * mB[None, :], ((128 - E2, 0), (0, 0))
    )


def _kernel_w0_pair(plains, mA, mB, E: int, D: int):
    """[128, GL] FLAT PAIR window (2D path): rows 0:64 carry tile A's full
    E^2 = 64-row window with lanes masked to A's slots, rows 64:128 tile
    B's — the sublane half _pad_rows zero-fills on the solo dot.  One dot
    against this serves both member tiles: an A-lane's column is zero in
    rows 64:128 and vice versa, so output lanes 0:64 / 64:128 of the
    transposed deposit dot (and the window-contraction rows of the g2p
    dot) separate exactly by member tile."""
    GL = plains[0].shape[1]
    W0 = _kernel_window(plains, E, GL, D)  # [E^2 = 64, GL]
    E2 = E**D
    return jnp.pad(W0 * mA[None, :], ((0, 128 - E2), (0, 0))) + jnp.pad(
        W0 * mB[None, :], ((128 - E2, 0), (0, 0))
    )


def _pair_split_lanes(blk):
    """[R, 128] pair-merged lanes -> (A half in 0:64 zero-extended, B half
    rolled down to 0:64, both [R, 128] with lanes 64:128 zero)."""
    l_io = lax.broadcasted_iota(jnp.int32, blk.shape, 1)
    ba = jnp.where(l_io < 64, blk, 0.0)
    bb = jnp.where(l_io < 64, pltpu.roll(blk, 64, 1), 0.0)
    return ba, bb


def _zfac_merge_pair(Yz, R: int, E: int):
    """Pair dot output [R*E, 128] rows (r, kbit, q), lanes (tb*64 + yz) ->
    the two member tiles' merged window blocks ([R*S1, 128] each, lanes
    (kbit*64 + yz) as in _zfac_merge)."""
    Q = E // 2
    Y4 = Yz.reshape(R, 2, Q, 128)
    Ya = Y4[:, 0].reshape(R * Q, 128)  # even-kbit rows: A in 0:64, B in 64:
    Yb = Y4[:, 1].reshape(R * Q, 128)  # odd-kbit rows
    l_io = lax.broadcasted_iota(jnp.int32, (R * Q, 128), 1)
    blk_a = jnp.where(l_io < 64, Ya, pltpu.roll(Yb, 64, 1))
    blk_b = jnp.where(l_io < 64, pltpu.roll(Ya, 64, 1), Yb)
    return blk_a, blk_b


def _r3_e_coords(E: int, D: int, rows: int, S1: int):
    """e_d coefficient arrays [rows, 128] in the r3 window-row layout:
    row (.., q), lane l decode to e0 = 2q + (l >= 64), e1 = (l % 64) // E,
    e2 = l % E  (flat = e0*E^2 + e1*E + e2 with E^2 == 64)."""
    r_io = lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
    l_io = lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    q = r_io % S1
    e0 = (2 * q + (l_io >= 64).astype(jnp.int32)).astype(jnp.float32)
    e1 = ((l_io % 64) // E).astype(jnp.float32)
    e2 = (l_io % E).astype(jnp.float32)
    return (e0, e1, e2)


def _fixup_deposit_r3(Z, E: int, D: int, CH: int):
    """Z [(1+D)*CH*S1, 128] merged window rows (g, c, q) -> blk
    [CH*S1, 128]: Y0 + sum_d e_d * Yd, all in the r3 row layout."""
    S1 = E**D // 128
    rows = CH * S1
    es = _r3_e_coords(E, D, rows, S1)
    blk = Z[0:rows]
    for d in range(D):
        blk = blk + es[d] * Z[(d + 1) * rows : (d + 2) * rows]
    return blk


def _rows_stack(vecs, cap: int):
    """Stack [cap] vectors into [n, cap] (iota-select, Mosaic-safe)."""
    n = len(vecs)
    rid = lax.broadcasted_iota(jnp.int32, (n, cap), 0)
    out = jnp.zeros((n, cap), jnp.float32)
    for i, v in enumerate(vecs):
        out = jnp.where(rid == i, v[None, :], out)
    return out


def _lane_e_coords(E: int, D: int, rows: int, lanes: Optional[int] = None):
    """e_d coefficient rows [rows, lanes] (lane iota decode of the window).

    For lanes > E^D (padded windows) the decoded values are garbage there —
    harmless, the padded window rows are zero so the products vanish."""
    L = E**D if lanes is None else lanes
    l_io = lax.broadcasted_iota(jnp.int32, (rows, L), 1)
    out = []
    for d in range(D):
        div = E ** (D - 1 - d)
        out.append(((l_io // div) % E).astype(jnp.float32))
    return out


def _pad_rows(x, rows: int):
    """Zero-pad the sublane dim of [r, L] to ``rows``."""
    r = x.shape[0]
    if r == rows:
        return x
    return jnp.pad(x, ((0, rows - r), (0, 0)))


# ---------------------------------------------------------------------------
# Kernel 1: p2g_1 deposit (mass + APIC momentum)
# ---------------------------------------------------------------------------


def _deposit_values(pm, valid, dvec, bases, cap: int, D: int, h: int):
    """Ucat [(1+D)*(1+D), cap] from a stream block (see _deposit_values_from)."""
    vel = [pm[D + d, :] for d in range(D)]
    Cm = [[pm[2 * D + i * D + j, :] for j in range(D)] for i in range(D)]
    mass = jnp.where(valid, pm[2 * D + D * D, :], 0.0)
    return _deposit_values_from(vel, Cm, mass, dvec, bases, cap, D)


def _deposit_values_from(vel, Cm, mass, dvec, bases, cap: int, D: int):
    """Ucat [(1+D)*(1+D), cap]: groups [U0, V1..VD] for the one-window form.

    Tap value m(v + C dpos), dpos = -dvec + (o-1); with the window identity
    the moment coefficient becomes (e_d - base_d - 1)  [base = lc + h - 1,
    so e_d - base - 1 = o - 1 at the tap rows].  ``mass`` must already be
    masked to valid lanes; vel/Cm are per-axis [cap] vectors.
    """
    Aval = []
    for i in range(D):
        cd = Cm[i][0] * dvec[0]
        for j in range(1, D):
            cd = cd + Cm[i][j] * dvec[j]
        Aval.append(mass * (vel[i] - cd))
    bf = [b.astype(jnp.float32) + 1.0 for b in bases]
    U0 = [mass]
    for i in range(D):
        acc = Aval[i]
        for d in range(D):
            acc = acc - bf[d] * (mass * Cm[i][d])
        U0.append(acc)
    Ucat = U0[:]
    zero = jnp.zeros_like(mass)
    for d in range(D):
        Ucat += [zero] + [mass * Cm[i][d] for i in range(D)]
    return _rows_stack(Ucat, cap)


def _p2g2_values(pm, valid, dvec, bases, rho, cfg_row, cap: int, D: int):
    """Ucat2 [D*(1+D), cap] force-deposit channels (eq-16 term).

    cfg_row: (dt, rest_density, eos_stiffness, eos_power, floor, mu)
    Returns (Ucat2, pressure[cap], volume[cap]).
    """
    dt, rest, k_eos, gamma, floor_p, mu = cfg_row
    Cm = [[pm[2 * D + i * D + j, :] for j in range(D)] for i in range(D)]
    mass = jnp.where(valid, pm[2 * D + D * D, :], 0.0)
    volume = jnp.where(rho > 0.0, mass / jnp.where(rho > 0.0, rho, 1.0), 0.0)
    pressure = jnp.maximum(floor_p, k_eos * ((rho / rest) ** gamma - 1.0))
    scale = (-4.0 * dt) * volume
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
    bf = [b.astype(jnp.float32) + 1.0 for b in bases]
    U0 = []
    for i in range(D):
        acc = A2[i]
        for d in range(D):
            acc = acc - bf[d] * term[i][d]
        U0.append(acc)
    Ucat = U0[:]
    for d in range(D):
        Ucat += [term[i][d] for i in range(D)]
    return _rows_stack(Ucat, cap), pressure, volume


def _fixup_deposit(YT, E: int, D: int, CH: int, EP: int):
    """YT [(1+D)*CH, EP] -> block [CH, EP]: Y0 + sum_d e_d * Yd."""
    es = _lane_e_coords(E, D, CH, lanes=EP)
    # lanes >= E^D carry garbage e-coords but YT is zero there (the padded
    # window rows are zero), so no masking needed.
    blk = YT[0:CH]
    for d in range(D):
        blk = blk + es[d] * YT[(d + 1) * CH : (d + 2) * CH]
    return blk


def _pbatch(NG: int, interpret: bool = False) -> int:
    """Groups per kernel program: per-program dispatch is ~550 ns, so at
    NG=4096 one group/program burns ~2.3 ms/kernel; batching 4 amortizes
    it while keeping blocks comfortably inside VMEM.

    Interpret mode (the CPU test path) returns 1: there is no dispatch to
    amortize, and interpret trace cost scales with kernel-body size — PB=4
    quadruples every kernel's trace for zero coverage (the pb loop is
    mechanical replication; the on-device bench verify gates the PB>1
    lowering on real hardware)."""
    if interpret:
        return 1
    for b in (4, 2):
        if NG % b == 0:
            return b
    return 1


def make_deposit_kernel(spec: StreamSpec, D: int, tshape, origin, mode: str):
    """Deposit blocks in ROW-GROUPED layout: out [NG, G*RT, OW], tile j of a
    group owning sublane rows [j*RT, (j+1)*RT) — a [NG*G, RT, OW] reshape
    needs NO transpose on the XLA side.

    mode='p2g1': channels mass+momentum (1+D), RT = GROWS(*S1) rows/tile.
    mode='p2g2': takes mgblk (halo'd mass windows), params [6] and the p2g1
    blocks d1blk, and emits the COMBINED momentum+force windows
    (d1 momentum + eq-16 force), D(*S1) rows/tile — fusing the m+f add into
    the kernel saves a full XLA read+read+write pass over the block arrays
    (~0.6 GB/substep at 3d-1m; this device's effective HBM bandwidth is the
    substep's binding constraint — see BASELINE.md round 3)."""
    T, cap, h, G = spec.tile, spec.cap, spec.halo, spec.group
    E, EP, NG, A = spec.E, spec.EP(D), spec.NG, spec.A
    F = _row_layout(D)
    CH = 1 + D if mode == "p2g1" else D
    # rank-3 halo-native output (3D): each channel's E^D window splits into
    # S1 sublanes x 128 lanes via an in-kernel reshape, so the halo kernels
    # and all XLA glue operate on [A, ch*S1, 128] with NO relayout copies
    r3 = _use_r3(spec, D)
    S1 = spec.E**D // 128 if r3 else 0
    RT1 = GROWS * S1 if r3 else GROWS  # p2g1 rows per tile (d1blk layout)
    RT = (CH * S1 if r3 else CH) if mode == "p2g2" else RT1
    OW = 128 if r3 else EP  # output lane width
    PB = _pbatch(NG, spec.interpret)  # groups/program (dispatch amortization)
    zf = _use_zfac(spec, D)
    zf_dep = zf and ZFAC_DEPOSIT
    zf_rho = zf and ZFAC_RHO and mode == "p2g2"
    WC = _wchunk(spec, D)  # flat-path window chunk lanes (VMEM budget)
    NCH = cap // WC
    pairmode = _use_pair(spec, D)
    GLW = (G // 2) * cap if pairmode else G * cap  # stream lanes per group

    def kernel(*refs):
        E3 = E**D
        if pairmode:
            fn = _one_group_pair if zf else _one_group_pair2
        else:
            fn = _one_group
        for pb in range(PB):
            fn(refs, pb, pl.program_id(0) * PB + pb, GLW, E3)

    def _one_group_pair2(refs, pb, gg, GL, E3):
        """FLAT 2D pair layout: slot block jp holds tiles (2jp, 2jp+1)
        front-packed; one window dot per PAIR with tile A's E^2 = 64 window
        rows in 0:64 and tile B's in 64:128 (_kernel_w0_pair) — the output
        lane halves separate by member tile, and the _lane_e_coords decode
        wraps mod 64 so the deposit fixup is valid on both halves."""
        if mode == "p2g1":
            count_ref, tid_ref, stream_ref, out_ref = refs
        else:
            count_ref, tid_ref, params_ref, stream_ref, mg_ref, d1_ref, out_ref = refs
        GP = G // 2
        l_io = lax.broadcasted_iota(jnp.int32, (1, GL), 1)[0]
        s_io = l_io % cap
        grp = l_io // cap  # PAIR index within the group
        tid_l = jnp.zeros((GL,), jnp.int32)
        c0_l = jnp.zeros((GL,), jnp.int32)
        cs_l = jnp.zeros((GL,), jnp.int32)
        tot = count_ref[gg * G]
        for jp in range(GP):
            a0 = gg * G + 2 * jp
            c0 = count_ref[a0]
            inp = grp == jp
            tid_l = jnp.where(
                inp, jnp.where(s_io < c0, tid_ref[a0], tid_ref[a0 + 1]), tid_l
            )
            c0_l = jnp.where(inp, c0, c0_l)
            cs_l = jnp.where(inp, c0 + count_ref[a0 + 1], cs_l)
            if jp > 0:
                tot = tot + count_ref[a0]
            tot = tot + count_ref[a0 + 1]
        valid = s_io < cs_l

        @pl.when(tot == 0)
        def _():
            out_ref[pb] = jnp.zeros((G * RT, OW), jnp.float32)

        @pl.when(tot > 0)
        def _():
            pm = stream_ref[pb]  # [F, GL]
            plains, bases, dvec = _kernel_profiles_from(
                [pm[d] for d in range(D)], tid_l, T, E, h, tshape, origin, GL
            )
            mA = (valid & (s_io < c0_l)).astype(jnp.float32)
            mB = (valid & (s_io >= c0_l)).astype(jnp.float32)
            w0p = _kernel_w0_pair(plains, mA, mB, E, D)  # [128, GL]
            if mode == "p2g1":
                U = _deposit_values(pm, valid, dvec, bases, GL, D, h)
            else:
                # pair rho: both member tiles' halo'd mass windows ride the
                # lane halves of ONE [GP, 128] x [128, GL] dot — an A-lane's
                # w0p column is zero in rows 64:128, so the contraction
                # selects the owner tile's half automatically
                mg = mg_ref[pb]  # [G, EP], valid lanes 0:E3, rest zero
                l1 = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
                rid = lax.broadcasted_iota(jnp.int32, (GP, 128), 0)
                Mp = jnp.zeros((GP, 128), jnp.float32)
                for jp in range(GP):
                    a = mg[2 * jp : 2 * jp + 1, :]
                    b = pltpu.roll(mg[2 * jp + 1 : 2 * jp + 2, :], 64, 1)
                    Mp = jnp.where(rid == jp, jnp.where(l1 < 64, a, b), Mp)
                Xp = lax.dot_general(
                    Mp, w0p, (((1,), (0,)), ((), ())),
                    precision=lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )  # [GP, GL]
                rho = jnp.zeros((GL,), jnp.float32)
                for jp in range(GP):
                    rho = jnp.where(grp == jp, Xp[jp], rho)
                cfg_row = tuple(params_ref[i] for i in range(6))
                U, _, _ = _p2g2_values(
                    pm, valid, dvec, bases, rho, cfg_row, GL, D
                )
            for jp in range(GP):
                a0 = gg * G + 2 * jp
                cp = count_ref[a0] + count_ref[a0 + 1]
                j0, j1 = 2 * jp, 2 * jp + 1

                @pl.when(cp == 0)
                def _(j0=j0):
                    out_ref[pb, j0 * RT : (j0 + 2) * RT, :] = jnp.zeros(
                        (2 * RT, OW), jnp.float32
                    )

                @pl.when(cp > 0)
                def _(jp=jp, j0=j0, j1=j1):
                    sl = slice(jp * cap, (jp + 1) * cap)
                    YT = lax.dot_general(
                        U[:, sl], w0p[:, sl], (((1,), (1,)), ((), ())),
                        precision=lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32,
                    )  # [RR, 128] lanes (tb*64 + window e)
                    blk = _fixup_deposit(YT, E, D, CH, EP)  # [CH, 128]
                    ba, bb = _pair_split_lanes(blk)
                    if mode == "p2g2":
                        # fused m+f: a zero-count member's d1 rows are zero
                        ba = ba + d1_ref[
                            pb, j0 * GROWS + 1 : j0 * GROWS + 1 + D, :
                        ]
                        bb = bb + d1_ref[
                            pb, j1 * GROWS + 1 : j1 * GROWS + 1 + D, :
                        ]
                    out_ref[pb, j0 * RT : (j0 + 1) * RT, :] = _pad_rows(ba, RT)
                    out_ref[pb, j1 * RT : (j1 + 1) * RT, :] = _pad_rows(bb, RT)

    def _one_group_pair(refs, pb, gg, GL, E3):
        """PAIR layout: slot block jp holds tiles (2jp, 2jp+1) front-packed.

        One zfac dot per PAIR: the pair window (_kernel_w12p_pair) routes
        each lane's rows into its member tile's output half, so the dot's
        otherwise-padded 64..128 lanes carry tile B.  A zero-count member's
        output half is exact zeros (its lane masks are empty)."""
        if mode == "p2g1":
            count_ref, tid_ref, stream_ref, out_ref = refs
        else:
            count_ref, tid_ref, params_ref, stream_ref, mg_ref, d1_ref, out_ref = refs
        GP = G // 2
        l_io = lax.broadcasted_iota(jnp.int32, (1, GL), 1)[0]
        s_io = l_io % cap
        grp = l_io // cap  # PAIR index within the group
        tid_l = jnp.zeros((GL,), jnp.int32)
        c0_l = jnp.zeros((GL,), jnp.int32)
        cs_l = jnp.zeros((GL,), jnp.int32)
        tot = count_ref[gg * G]
        for jp in range(GP):
            a0 = gg * G + 2 * jp
            c0 = count_ref[a0]
            inp = grp == jp
            tid_l = jnp.where(
                inp, jnp.where(s_io < c0, tid_ref[a0], tid_ref[a0 + 1]), tid_l
            )
            c0_l = jnp.where(inp, c0, c0_l)
            cs_l = jnp.where(inp, c0 + count_ref[a0 + 1], cs_l)
            if jp > 0:
                tot = tot + count_ref[a0]
            tot = tot + count_ref[a0 + 1]
        valid = s_io < cs_l

        @pl.when(tot == 0)
        def _():
            out_ref[pb] = jnp.zeros((G * RT, OW), jnp.float32)

        @pl.when(tot > 0)
        def _():
            pm = stream_ref[pb]  # [F, GL]
            plains, bases, dvec = _kernel_profiles_from(
                [pm[d] for d in range(D)], tid_l, T, E, h, tshape, origin, GL
            )
            mA = (valid & (s_io < c0_l)).astype(jnp.float32)
            mB = (valid & (s_io >= c0_l)).astype(jnp.float32)
            w12p = _kernel_w12p_pair(plains, mA, mB)  # [128, GL]
            if mode == "p2g1":
                U = _deposit_values(pm, valid, dvec, bases, GL, D, h)
            else:
                # z-factored density, pair-stacked: both member tiles' mass
                # windows ride the lane halves of ONE dot per parity
                mgall = mg_ref[pb]  # [G*S1, 128] rows (tile j, q)
                m4 = mgall.reshape(GP, 2 * S1, 128)
                mg0 = m4[:, :S1].reshape(GP * S1, 128)
                mg1 = m4[:, S1:].reshape(GP * S1, 128)
                l2 = lax.broadcasted_iota(jnp.int32, (GP * S1, 128), 1)
                MeP = jnp.where(l2 < 64, mg0, 0.0) + pltpu.roll(
                    jnp.where(l2 < 64, mg1, 0.0), 64, 1
                )
                MoP = jnp.where(l2 < 64, pltpu.roll(mg0, 64, 1), 0.0) + pltpu.roll(
                    jnp.where(l2 < 64, pltpu.roll(mg1, 64, 1), 0.0), 64, 1
                )
                Xe = lax.dot_general(
                    MeP, w12p, (((1,), (0,)), ((), ())),
                    precision=lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )  # [GP*S1, GL] rows (jp, q): e0 = 2q part
                Xo = lax.dot_general(
                    MoP, w12p, (((1,), (0,)), ((), ())),
                    precision=lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
                rho = jnp.zeros((GL,), jnp.float32)
                for q in range(S1):
                    xe = jnp.zeros((GL,), jnp.float32)
                    xo = jnp.zeros((GL,), jnp.float32)
                    for jp in range(GP):
                        xe = jnp.where(grp == jp, Xe[jp * S1 + q], xe)
                        xo = jnp.where(grp == jp, Xo[jp * S1 + q], xo)
                    rho = rho + xe * plains[0][2 * q] + xo * plains[0][2 * q + 1]
                cfg_row = tuple(params_ref[i] for i in range(6))
                U, _, _ = _p2g2_values(
                    pm, valid, dvec, bases, rho, cfg_row, GL, D
                )
            wxs = _kernel_wxs(plains, GL)
            RR = U.shape[0]
            Uz = (U[:, None, :] * wxs[None, :, :]).reshape(RR * E, GL)
            for jp in range(GP):
                a0 = gg * G + 2 * jp
                cp = count_ref[a0] + count_ref[a0 + 1]
                j0, j1 = 2 * jp, 2 * jp + 1

                @pl.when(cp == 0)
                def _(j0=j0):
                    out_ref[pb, j0 * RT : (j0 + 2) * RT, :] = jnp.zeros(
                        (2 * RT, OW), jnp.float32
                    )

                @pl.when(cp > 0)
                def _(jp=jp, j0=j0, j1=j1):
                    sl = slice(jp * cap, (jp + 1) * cap)
                    Yz = lax.dot_general(
                        Uz[:, sl], w12p[:, sl], (((1,), (1,)), ((), ())),
                        precision=lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32,
                    )  # [RR*E, 128] rows (r, kbit, q), lanes (tb*64 + yz)
                    za, zb = _zfac_merge_pair(Yz, RR, E)
                    ba = _fixup_deposit_r3(za, E, D, CH)  # [CH*S1, 128]
                    bb = _fixup_deposit_r3(zb, E, D, CH)
                    if mode == "p2g2":
                        # fused m+f: a zero-count member's d1 rows are zero
                        ba = ba + d1_ref[
                            pb, j0 * RT1 + S1 : j0 * RT1 + (1 + D) * S1, :
                        ]
                        bb = bb + d1_ref[
                            pb, j1 * RT1 + S1 : j1 * RT1 + (1 + D) * S1, :
                        ]
                    out_ref[pb, j0 * RT : (j0 + 1) * RT, :] = _pad_rows(ba, RT)
                    out_ref[pb, j1 * RT : (j1 + 1) * RT, :] = _pad_rows(bb, RT)

    def _one_group(refs, pb, gg, GL, E3):
        if mode == "p2g1":
            count_ref, tid_ref, stream_ref, out_ref = refs
        else:
            count_ref, tid_ref, params_ref, stream_ref, mg_ref, d1_ref, out_ref = refs

        # group-vectorized lane metadata: the VPU-heavy window/profile/value
        # builds run ONCE on [*, G*cap] arrays (per-tile [*, cap] ops in a
        # G-loop leave the 8x128 VPU mostly idle); only the MXU matmuls and
        # output writes stay per tile
        l_io = lax.broadcasted_iota(jnp.int32, (1, GL), 1)[0]
        s_io = l_io % cap
        grp = l_io // cap
        tid_l = jnp.zeros((GL,), jnp.int32)
        cnt_l = jnp.zeros((GL,), jnp.int32)
        tot = count_ref[gg * G]
        for j in range(G):
            a = gg * G + j
            tid_l = jnp.where(grp == j, tid_ref[a], tid_l)
            cnt_l = jnp.where(grp == j, count_ref[a], cnt_l)
            if j > 0:
                tot = tot + count_ref[a]
        valid = s_io < cnt_l

        @pl.when(tot == 0)
        def _():
            out_ref[pb] = jnp.zeros((G * RT, OW), jnp.float32)

        @pl.when(tot > 0)
        def _():
            pm = stream_ref[pb]  # [F, G*cap]
            plains, bases, dvec = _kernel_profiles_from(
                [pm[d] for d in range(D)], tid_l, T, E, h, tshape, origin, GL
            )
            vf = valid.astype(jnp.float32)[None, :]
            if zf_dep or zf_rho:
                w12p = _kernel_w12p(plains, GL) * vf  # [128, G*cap]
            if (not zf_dep or (mode == "p2g2" and not zf_rho)) and NCH == 1:
                W0 = _kernel_window(plains, E, GL, D) * vf  # [E^D, G*cap]
            if mode == "p2g1":
                U = _deposit_values(pm, valid, dvec, bases, GL, D, h)
            else:
                if zf_rho:
                    # z-factored density: contract the halo'd mass windows'
                    # yz lanes against the pair window, then combine the E
                    # e0-slices with wx — the [G*S1,128]x[128,GL] dots load
                    # 1 MXU weight tile where the E^3-wide form loads 4/row
                    mg = mg_ref[pb]  # [G*S1, 128] rows (j, q)
                    l2 = lax.broadcasted_iota(jnp.int32, (G * S1, 128), 1)
                    Me = jnp.where(l2 < 64, mg, 0.0)
                    Mo = jnp.where(l2 < 64, pltpu.roll(mg, 64, 1), 0.0)
                    Xe = lax.dot_general(
                        Me, w12p, (((1,), (0,)), ((), ())),
                        precision=lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32,
                    )  # [G*S1, G*cap] rows (j, q): e0 = 2q part
                    Xo = lax.dot_general(
                        Mo, w12p, (((1,), (0,)), ((), ())),
                        precision=lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32,
                    )  # e0 = 2q + 1 part
                    rho = jnp.zeros((GL,), jnp.float32)
                    for q in range(S1):
                        xe = jnp.zeros((GL,), jnp.float32)
                        xo = jnp.zeros((GL,), jnp.float32)
                        for j in range(G):
                            xe = jnp.where(grp == j, Xe[j * S1 + q], xe)
                            xo = jnp.where(grp == j, Xo[j * S1 + q], xo)
                        rho = rho + xe * plains[0][2 * q] + xo * plains[0][2 * q + 1]
                elif NCH > 1:
                    # chunked rho (flat big-tile path): per (tile, chunk)
                    # [1, E^D] x [E^D, WC] dots placed into their lane range
                    # by zero-pad + roll — the [E^D, GL] window never exists
                    rho2 = jnp.zeros((1, GL), jnp.float32)
                    for j in range(G):
                        mrow = mg_ref[pb, j : j + 1, :E3]  # [1, E^D]
                        for c in range(NCH):
                            lo = j * cap + c * WC
                            W0c = _window_chunk(plains, vf, lo, WC, E, D)
                            x = lax.dot_general(
                                mrow, W0c, (((1,), (0,)), ((), ())),
                                precision=lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32,
                            )  # [1, WC]
                            xg = jnp.pad(x, ((0, 0), (0, GL - WC)))
                            rho2 = rho2 + (pltpu.roll(xg, lo, 1) if lo else xg)
                    rho = rho2[0]
                else:
                    if r3:
                        mrows = _rows_stack(
                            [
                                mg_ref[pb, j * S1 : (j + 1) * S1, :].reshape(E3)
                                for j in range(G)
                            ],
                            E3,
                        )  # [G, E^D]
                    else:
                        mrows = mg_ref[pb, :, :E3]  # [G, E^D]
                    rho_all = lax.dot_general(
                        mrows, W0, (((1,), (0,)), ((), ())),
                        precision=lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32,
                    )  # [G, G*cap] (cross-tile entries unused)
                    rho = jnp.zeros((GL,), jnp.float32)
                    for j in range(G):
                        rho = jnp.where(grp == j, rho_all[j], rho)
                cfg_row = tuple(params_ref[i] for i in range(6))
                U, _, _ = _p2g2_values(
                    pm, valid, dvec, bases, rho, cfg_row, GL, D
                )
            if zf_dep:
                wxs = _kernel_wxs(plains, GL)
                RR = U.shape[0]  # (1+D)*CH
                Uz = (U[:, None, :] * wxs[None, :, :]).reshape(RR * E, GL)
            for j in range(G):
                cnt = count_ref[gg * G + j]

                @pl.when(cnt == 0)
                def _(j=j):
                    out_ref[pb, j * RT : (j + 1) * RT, :] = jnp.zeros(
                        (RT, OW), jnp.float32
                    )

                @pl.when(cnt > 0)
                def _(j=j):
                    if zf_dep:
                        Yz = lax.dot_general(
                            Uz[:, j * cap : (j + 1) * cap],
                            w12p[:, j * cap : (j + 1) * cap],
                            (((1,), (1,)), ((), ())),
                            precision=lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32,
                        )  # [RR*E, 128] rows (r, kbit, q)
                        Z = _zfac_merge(Yz, RR, E)  # [RR*S1, 128]
                        blk = _fixup_deposit_r3(Z, E, D, CH)  # [CH*S1, 128]
                    else:
                        if NCH > 1:
                            # chunked window: accumulate the deposit dot
                            # over WC-lane window chunks (K = WC per dot)
                            YT = None
                            for c in range(NCH):
                                lo = j * cap + c * WC
                                W0p = _pad_rows(
                                    _window_chunk(plains, vf, lo, WC, E, D),
                                    EP,
                                )
                                yt = lax.dot_general(
                                    U[:, lo : lo + WC], W0p,
                                    (((1,), (1,)), ((), ())),
                                    precision=lax.Precision.HIGHEST,
                                    preferred_element_type=jnp.float32,
                                )  # [(1+D)*CH, EP]
                                YT = yt if YT is None else YT + yt
                        else:
                            W0p = _pad_rows(W0[:, j * cap : (j + 1) * cap], EP)
                            YT = lax.dot_general(
                                U[:, j * cap : (j + 1) * cap], W0p,
                                (((1,), (1,)), ((), ())),
                                precision=lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32,
                            )  # [(1+D)*CH, EP]
                        blk = _fixup_deposit(YT, E, D, CH, EP)  # [CH, EP]
                        if r3:
                            blk = blk.reshape(CH * S1, 128)
                    if mode == "p2g2":
                        # fused m+f: add the p2g1 momentum rows in-kernel
                        if r3:
                            blk = blk + d1_ref[
                                pb, j * RT1 + S1 : j * RT1 + (1 + D) * S1, :
                            ]
                        else:
                            blk = blk + d1_ref[
                                pb, j * GROWS + 1 : j * GROWS + 1 + D, :
                            ]
                    out_ref[pb, j * RT : (j + 1) * RT, :] = _pad_rows(blk, RT)

    n_prefetch = 2 if mode == "p2g1" else 3
    in_specs = [
        pl.BlockSpec((PB, F, GLW), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM)
    ]
    if mode == "p2g2":
        mg_block = (PB, G * S1, 128) if r3 else (PB, G, EP)
        in_specs.append(
            pl.BlockSpec(mg_block, lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM)
        )
        in_specs.append(
            pl.BlockSpec(
                (PB, G * RT1, OW), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
            )
        )
    def call(count, tid, stream, mgblk=None, params=None, d1blk=None, n_asgn=None):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_prefetch,
            grid=_dyn_grid(NG // PB, n_asgn, G * PB),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (PB, G * RT, OW), lambda t, *_: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        args = (count, tid)
        if mode == "p2g2":
            args = args + (params,)
        args = args + (stream,)
        if mode == "p2g2":
            args = args + (mgblk, d1blk)
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((NG, G * RT, OW), jnp.float32),
            interpret=spec.interpret,
        )(*args)

    return call


# ---------------------------------------------------------------------------
# Kernel 3: collect (g2p + particle tail) -> next stream
# ---------------------------------------------------------------------------


def make_collect_kernel(spec: StreamSpec, D: int, tshape, origin, fused_p2g1: bool = False):
    """g2p + particle tail -> next stream.  With ``fused_p2g1`` the kernel
    ALSO emits the NEXT substep's p2g_1 deposit blocks from the just-updated
    particle state (one stream read + one window build instead of two; the
    fused output is only valid while no particle drifted out of its window —
    exactly the condition tracked by the drift flag, so frame_binned
    recomputes a standalone p2g_1 after any re-bin)."""
    T, cap, h, G = spec.tile, spec.cap, spec.halo, spec.group
    E, EP, NG, A = spec.E, spec.EP(D), spec.NG, spec.A
    E3 = E**D
    F = _row_layout(D)
    NP = 16 + 2 * D  # params length
    nb = (1 + D) * D + 1  # g2p channel rows
    NBP = -(-nb // 8) * 8  # sublane-padded scratch rows
    r3 = _use_r3(spec, D)  # rank-3 halo-native block layout (see deposit kernel)
    S1 = E3 // 128 if r3 else 0
    RT = GROWS * S1 if r3 else GROWS
    OW = 128 if r3 else EP
    PB = _pbatch(NG, spec.interpret)  # groups/program (dispatch amortization)
    zf = _use_zfac(spec, D)
    zf_g2p = zf and ZFAC_G2P
    zf_dep = zf and ZFAC_DEPOSIT
    WC = _wchunk(spec, D)  # flat-path window chunk lanes (VMEM budget)
    NCH = cap // WC
    pairmode = _use_pair(spec, D)
    pair3 = pairmode and zf  # zfac (3D) pairing
    pair2 = pairmode and not zf  # flat (2D) pairing — see _use_pair2
    GLW = (G // 2) * cap if pairmode else G * cap  # stream lanes per group
    GB = GLW // cap  # slot blocks per group (pairs when pairing)

    def kernel(*refs):
        for pb in range(PB):
            _one_group(refs, pb, pl.program_id(0) * PB + pb)

    def _one_group(refs, pb, gg):
        if fused_p2g1:
            (count_ref, tid_ref, params_ref, stream_ref, gblk_ref,
             out_ref, flag_ref, dep_ref, xsc) = refs
        else:
            (count_ref, tid_ref, params_ref, stream_ref, gblk_ref,
             out_ref, flag_ref, xsc) = refs
        dt = params_ref[0]
        rest = params_ref[1]
        k_eos = params_ref[2]
        gamma = params_ref[3]
        floor_p = params_ref[4]
        mouse_radius = params_ref[5]
        bdamp = params_ref[6]
        m_active = params_ref[7]
        mx = params_ref[8]
        my = params_ref[9]
        clip_lo = [params_ref[10 + d] for d in range(D)]
        clip_hi = [params_ref[10 + D + d] for d in range(D)]
        stride = params_ref[10 + 2 * D]  # packed-scene stride (0 = off)

        GL = GLW
        l_io = lax.broadcasted_iota(jnp.int32, (1, GL), 1)[0]
        s_io = l_io % cap
        grp = l_io // cap  # slot-block index (pair index when pairing)
        tid_l = jnp.zeros((GL,), jnp.int32)
        c0_l = jnp.zeros((GL,), jnp.int32)  # pair-first count (pair mode)
        cnt_l = jnp.zeros((GL,), jnp.int32)
        tot = count_ref[gg * G]
        if pairmode:
            for jp in range(GB):
                a0 = gg * G + 2 * jp
                c0 = count_ref[a0]
                inp = grp == jp
                tid_l = jnp.where(
                    inp, jnp.where(s_io < c0, tid_ref[a0], tid_ref[a0 + 1]),
                    tid_l,
                )
                c0_l = jnp.where(inp, c0, c0_l)
                cnt_l = jnp.where(inp, c0 + count_ref[a0 + 1], cnt_l)
                if jp > 0:
                    tot = tot + count_ref[a0]
                tot = tot + count_ref[a0 + 1]
        else:
            for j in range(G):
                a = gg * G + j
                tid_l = jnp.where(grp == j, tid_ref[a], tid_l)
                cnt_l = jnp.where(grp == j, count_ref[a], cnt_l)
                if j > 0:
                    tot = tot + count_ref[a]
        valid = s_io < cnt_l

        def _collect_group():
            pm = stream_ref[pb]  # [F, G*cap]
            plains, bases, dvec = _kernel_profiles_from(
                [pm[d] for d in range(D)], tid_l, T, E, h, tshape, origin, GL
            )
            if pair3:
                mA = (valid & (s_io < c0_l)).astype(jnp.float32)
                mB = (valid & (s_io >= c0_l)).astype(jnp.float32)
                w12p = _kernel_w12p_pair(plains, mA, mB)  # [128, GL]
                es3 = _r3_e_coords(E, D, NBP * S1, S1)
                rid3 = (
                    lax.broadcasted_iota(jnp.int32, (NBP * S1, 128), 0) // S1
                )
                l3 = lax.broadcasted_iota(jnp.int32, (NBP * S1, 128), 1)
            elif pair2:
                mA = (valid & (s_io < c0_l)).astype(jnp.float32)
                mB = (valid & (s_io >= c0_l)).astype(jnp.float32)
                w0p = _kernel_w0_pair(plains, mA, mB, E, D)  # [128, GL]
                es = _lane_e_coords(E, D, 1, lanes=128)  # wraps mod E^2=64
                rid = lax.broadcasted_iota(jnp.int32, (nb, 128), 0)
            elif zf_g2p:
                w12p = _kernel_w12p(plains, GL)  # [128, G*cap]
                # r3 e-coord coefficients for the Bcat channel build and the
                # lane iota for the even/odd e0 split (shared over tiles)
                es3 = _r3_e_coords(E, D, NBP * S1, S1)
                rid3 = (
                    lax.broadcasted_iota(jnp.int32, (NBP * S1, 128), 0) // S1
                )
                l3 = lax.broadcasted_iota(jnp.int32, (NBP * S1, 128), 1)
            else:
                if NCH == 1:
                    W0 = _kernel_window(plains, E, GL, D)  # [E^D, G*cap]
                es = _lane_e_coords(E, D, 1)
                rid = lax.broadcasted_iota(jnp.int32, (nb, E3), 0)

            def _bc_of(j):
                # Bcat in the r3 row layout [(c, q), (kbit*64 + yz)]:
                # channel rows v(D), e_0*v(D), .., e_{D-1}*v(D), m from tile
                # j's gblk, broadcast over the NBP channel rows
                gb3 = gblk_ref[
                    pb, j * RT : j * RT + (1 + D) * S1, :
                ].reshape(1 + D, S1, 128)
                Bc = jnp.zeros((NBP * S1, 128), jnp.float32)
                for i in range(D):
                    rep = jnp.broadcast_to(
                        gb3[i][None], (NBP, S1, 128)
                    ).reshape(NBP * S1, 128)
                    Bc = jnp.where(rid3 == i, rep, Bc)
                    for d in range(D):
                        Bc = jnp.where(
                            rid3 == (d + 1) * D + i, es3[d] * rep, Bc
                        )
                repm = jnp.broadcast_to(
                    gb3[D][None], (NBP, S1, 128)
                ).reshape(NBP * S1, 128)
                return jnp.where(rid3 == (1 + D) * D, repm, Bc)

            if pair2:
                # per-PAIR flat g2p (2D): both member tiles' Bcat window
                # values ride the lane halves of ONE [nb, 128] x [128, cap]
                # dot — an A-slot's w0p column is zero in rows 64:128, so
                # the contraction reads the owner tile's half
                for jp in range(GB):
                    a0 = gg * G + 2 * jp
                    cp = count_ref[a0] + count_ref[a0 + 1]

                    @pl.when(cp > 0)
                    def _(jp=jp):
                        j0, j1 = 2 * jp, 2 * jp + 1
                        gbA = gblk_ref[pb, j0 * GROWS : j0 * GROWS + 1 + D, :]
                        gbB = gblk_ref[pb, j1 * GROWS : j1 * GROWS + 1 + D, :]
                        l1 = lax.broadcasted_iota(
                            jnp.int32, (1 + D, 128), 1
                        )
                        gbP = jnp.where(
                            l1 < 64, gbA, pltpu.roll(gbB, 64, 1)
                        )  # [1+D, 128]: A's window in lanes 0:64, B's in 64:
                        Bcat = jnp.zeros((nb, 128), jnp.float32)
                        for i in range(D):
                            vi = gbP[i : i + 1, :]
                            Bcat = jnp.where(rid == i, vi, Bcat)
                            for d in range(D):
                                Bcat = jnp.where(
                                    rid == (d + 1) * D + i, es[d] * vi, Bcat
                                )
                        Bcat = jnp.where(
                            rid == (1 + D) * D, gbP[D : D + 1, :], Bcat
                        )
                        sl = slice(jp * cap, (jp + 1) * cap)
                        Xj = lax.dot_general(
                            Bcat, w0p[:, sl], (((1,), (0,)), ((), ())),
                            precision=lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32,
                        )  # [nb, cap]
                        xsc[:, sl] = _pad_rows(Xj, NBP)

                    @pl.when(cp == 0)
                    def _(jp=jp):
                        xsc[:, jp * cap : (jp + 1) * cap] = jnp.zeros(
                            (NBP, cap), jnp.float32
                        )

            if pair3:
                # per-PAIR g2p: both member tiles' Bcat channels ride the
                # lane halves (tb*64 + yz) of ONE dot per e0-parity
                for jp in range(GB):
                    a0 = gg * G + 2 * jp
                    cp = count_ref[a0] + count_ref[a0 + 1]

                    @pl.when(cp > 0)
                    def _(jp=jp):
                        Bc0 = _bc_of(2 * jp)
                        Bc1 = _bc_of(2 * jp + 1)
                        BeP = jnp.where(l3 < 64, Bc0, 0.0) + pltpu.roll(
                            jnp.where(l3 < 64, Bc1, 0.0), 64, 1
                        )
                        BoP = jnp.where(
                            l3 < 64, pltpu.roll(Bc0, 64, 1), 0.0
                        ) + pltpu.roll(
                            jnp.where(l3 < 64, pltpu.roll(Bc1, 64, 1), 0.0),
                            64, 1,
                        )
                        sl = slice(jp * cap, (jp + 1) * cap)
                        Xe = lax.dot_general(
                            BeP, w12p[:, sl], (((1,), (0,)), ((), ())),
                            precision=lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32,
                        )  # [NBP*S1, cap] rows (c, q)
                        Xo = lax.dot_general(
                            BoP, w12p[:, sl], (((1,), (0,)), ((), ())),
                            precision=lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32,
                        )
                        X3e = Xe.reshape(NBP, S1, cap)
                        X3o = Xo.reshape(NBP, S1, cap)
                        wx = plains[0]
                        acc = (
                            X3e[:, 0] * wx[0, sl][None, :]
                            + X3o[:, 0] * wx[1, sl][None, :]
                        )
                        for q in range(1, S1):
                            acc = (
                                acc
                                + X3e[:, q] * wx[2 * q, sl][None, :]
                                + X3o[:, q] * wx[2 * q + 1, sl][None, :]
                            )
                        xsc[:, sl] = acc

                    @pl.when(cp == 0)
                    def _(jp=jp):
                        xsc[:, jp * cap : (jp + 1) * cap] = jnp.zeros(
                            (NBP, cap), jnp.float32
                        )

            # per-tile g2p matmuls into the lane-concatenated scratch
            for j in range(0 if pairmode else G):
                cnt = count_ref[gg * G + j]

                @pl.when(cnt > 0)
                def _(j=j):
                    if zf_g2p:
                        # z-factored g2p: Bcat built in the r3 row layout
                        # [(c, q), (kbit*64 + yz)], contracted against the
                        # pair window per e0-parity, then the E e0-slices
                        # combined with wx (probe p10) — 2 one-weight-tile
                        # dots/tile instead of one 4-tile-wide dot
                        Bc = _bc_of(j)
                        Be = jnp.where(l3 < 64, Bc, 0.0)
                        Bo = jnp.where(l3 < 64, pltpu.roll(Bc, 64, 1), 0.0)
                        sl = slice(j * cap, (j + 1) * cap)
                        Xe = lax.dot_general(
                            Be, w12p[:, sl], (((1,), (0,)), ((), ())),
                            precision=lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32,
                        )  # [NBP*S1, cap] rows (c, q)
                        Xo = lax.dot_general(
                            Bo, w12p[:, sl], (((1,), (0,)), ((), ())),
                            precision=lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32,
                        )
                        X3e = Xe.reshape(NBP, S1, cap)
                        X3o = Xo.reshape(NBP, S1, cap)
                        wx = plains[0]
                        acc = (
                            X3e[:, 0] * wx[0, sl][None, :]
                            + X3o[:, 0] * wx[1, sl][None, :]
                        )
                        for q in range(1, S1):
                            acc = (
                                acc
                                + X3e[:, q] * wx[2 * q, sl][None, :]
                                + X3o[:, q] * wx[2 * q + 1, sl][None, :]
                            )
                        xsc[:, sl] = acc
                    else:
                        # row-grouped gblk: tile j's rows, [v(D), m] then pad
                        if r3:
                            gb = gblk_ref[
                                pb, j * RT : j * RT + (1 + D) * S1, :
                            ].reshape(1 + D, E3)
                        else:
                            gb = gblk_ref[pb, j * GROWS : j * GROWS + 1 + D, :E3]
                        # BcatT rows: v(D), e_0*v(D), .., e_{D-1}*v(D), m
                        Bcat = jnp.zeros((nb, E3), jnp.float32)
                        for i in range(D):
                            vi = gb[i][None, :]
                            Bcat = jnp.where(rid == i, vi, Bcat)
                            for d in range(D):
                                Bcat = jnp.where(
                                    rid == (d + 1) * D + i, es[d] * vi, Bcat
                                )
                        Bcat = jnp.where(rid == (1 + D) * D, gb[D][None, :], Bcat)
                        if NCH > 1:
                            # chunked g2p: the [E^D, GL] window never exists
                            for c in range(NCH):
                                lo = j * cap + c * WC
                                W0c = _window_chunk(plains, None, lo, WC, E, D)
                                Xc = lax.dot_general(
                                    Bcat, W0c, (((1,), (0,)), ((), ())),
                                    precision=lax.Precision.HIGHEST,
                                    preferred_element_type=jnp.float32,
                                )  # [nb, WC]
                                xsc[:, lo : lo + WC] = _pad_rows(Xc, NBP)
                        else:
                            Xj = lax.dot_general(
                                Bcat, W0[:, j * cap : (j + 1) * cap],
                                (((1,), (0,)), ((), ())),
                                precision=lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32,
                            )  # [nb, cap]
                            xsc[:, j * cap : (j + 1) * cap] = _pad_rows(Xj, NBP)

                @pl.when(cnt == 0)
                def _(j=j):
                    xsc[:, j * cap : (j + 1) * cap] = jnp.zeros(
                        (NBP, cap), jnp.float32
                    )

            X = xsc[...]  # [NBP, G*cap]
            v = [X[i] for i in range(D)]
            bf = [b.astype(jnp.float32) + 1.0 for b in bases]
            newC = []
            for i in range(D):
                for dd in range(D):
                    Md = X[(dd + 1) * D + i] - bf[dd] * v[i]
                    newC.append(4.0 * (v[i] * (-dvec[dd]) + Md))
            rho = X[(1 + D) * D]
            pressure = jnp.maximum(floor_p, k_eos * ((rho / rest) ** gamma - 1.0))

            newpos = [pm[d, :] + v[d] * dt for d in range(D)]

            # mouse repulsion (quirk Q3: post-advect, xy plane, 3d:305-310)
            dx = newpos[0] - mx
            dy = newpos[1] - my
            d2 = dx * dx + dy * dy
            nrm = jnp.sqrt(d2)
            inv = jnp.where(nrm > 0.0, 1.0 / jnp.where(nrm > 0.0, nrm, 1.0), 0.0)
            hit = (m_active > 0.0) & (d2 < mouse_radius * mouse_radius)
            v[0] = v[0] + jnp.where(hit, dx * inv, 0.0)
            v[1] = v[1] + jnp.where(hit, dy * inv, 0.0)

            # clamp + soft wall (quirk Q2: un-scaled lookahead, 2d:302-325);
            # packed scenes (scene.pack_scenes) shift the x walls by the
            # owning scene's offset — particles stay > 2*halo cells away
            # from scene boundaries, so floor(x/stride) is stable
            sbase = jnp.where(
                stride > 0.0,
                jnp.floor(newpos[0] / jnp.maximum(stride, 1.0)) * stride,
                0.0,
            )
            for d in range(D):
                off = sbase if d == 0 else 0.0
                p_cl = jnp.clip(newpos[d], clip_lo[d] + off, clip_hi[d] + off)
                nxt = p_cl + v[d]
                wmin = clip_lo[d] + off + bdamp
                wmax = clip_hi[d] + off - bdamp
                vv = v[d] + jnp.where(nxt < wmin, wmin - nxt, 0.0)
                vv = vv + jnp.where(nxt > wmax, wmax - nxt, 0.0)
                newpos[d] = p_cl
                v[d] = vv

            mass = pm[2 * D + D * D, :]
            pid = pm[2 * D + D * D + 1, :]

            # drift flag: 2.0 where the NEW cell leaves the drift window
            # [1-h, T-2+h] — the next substep's deposits would fall outside
            # the bin tile's expanded window, so the frame must re-bin
            # (needs_rebin triggers on flag >= 2).  With rebin_margin m > 0
            # also emit 1.0 for at-risk slots within m cells of the window
            # edge — the move set of a partial re-bin (see StreamSpec).
            flag = jnp.zeros((GL,), jnp.float32)
            margin = spec.rebin_margin
            for d in range(D):
                cn = jnp.floor(newpos[d]).astype(jnp.int32)
                coord = _tile_coord(tid_l, d, tshape)
                base = origin[d] + coord * T
                lcn = cn - base
                bad = (lcn < 1 - h) | (lcn > T - 2 + h)
                flag = jnp.maximum(flag, 2.0 * bad.astype(jnp.float32))
                if margin > 0.0:
                    lx = newpos[d] - base.astype(jnp.float32)
                    risk = (lx < 1 - h + margin) | (lx >= T - 1 + h - margin)
                    flag = jnp.maximum(flag, risk.astype(jnp.float32))

            rows = newpos + v + newC + [mass, pid, rho, pressure]
            out = _rows_stack(rows, GL)
            out_ref[pb] = jnp.where(valid[None, :], out, 0.0)
            flagv = jnp.where(valid, flag, 0.0)
            for j in range(GB):
                flag_ref[pb, j, :] = flagv[j * cap : (j + 1) * cap]

            if fused_p2g1:
                # next substep's p2g_1 from the NEW state (same tile frame)
                plains2, bases2, dvec2 = _kernel_profiles_from(
                    newpos, tid_l, T, E, h, tshape, origin, GL
                )
                vf = valid.astype(jnp.float32)[None, :]
                Cm_new = [[newC[i * D + dd] for dd in range(D)] for i in range(D)]
                U = _deposit_values_from(
                    v, Cm_new, jnp.where(valid, mass, 0.0), dvec2, bases2, GL, D
                )
                if pair2:
                    # flat 2D pair deposit from the NEW positions (same
                    # structure as the deposit kernel's _one_group_pair2)
                    mA2 = (valid & (s_io < c0_l)).astype(jnp.float32)
                    mB2 = (valid & (s_io >= c0_l)).astype(jnp.float32)
                    w0p2 = _kernel_w0_pair(plains2, mA2, mB2, E, D)
                    for jp in range(GB):
                        a0 = gg * G + 2 * jp
                        cp = count_ref[a0] + count_ref[a0 + 1]
                        j0, j1 = 2 * jp, 2 * jp + 1

                        @pl.when(cp == 0)
                        def _(j0=j0):
                            dep_ref[pb, j0 * RT : (j0 + 2) * RT, :] = (
                                jnp.zeros((2 * RT, OW), jnp.float32)
                            )

                        @pl.when(cp > 0)
                        def _(jp=jp, j0=j0, j1=j1):
                            sl = slice(jp * cap, (jp + 1) * cap)
                            YT = lax.dot_general(
                                U[:, sl], w0p2[:, sl],
                                (((1,), (1,)), ((), ())),
                                precision=lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32,
                            )  # [RR, 128] lanes (tb*64 + window e)
                            blk = _fixup_deposit(YT, E, D, 1 + D, EP)
                            ba, bb = _pair_split_lanes(blk)
                            dep_ref[pb, j0 * RT : (j0 + 1) * RT, :] = (
                                _pad_rows(ba, RT)
                            )
                            dep_ref[pb, j1 * RT : (j1 + 1) * RT, :] = (
                                _pad_rows(bb, RT)
                            )
                elif pair3:
                    # pair window from the NEW positions; slot->tile
                    # membership is a bin-time property, so mA/mB hold
                    mA2 = (valid & (s_io < c0_l)).astype(jnp.float32)
                    mB2 = (valid & (s_io >= c0_l)).astype(jnp.float32)
                    w12p2 = _kernel_w12p_pair(plains2, mA2, mB2)
                    wxs2 = _kernel_wxs(plains2, GL)
                    RR = U.shape[0]
                    Uz = (U[:, None, :] * wxs2[None, :, :]).reshape(RR * E, GL)
                    for jp in range(GB):
                        a0 = gg * G + 2 * jp
                        cp = count_ref[a0] + count_ref[a0 + 1]
                        j0, j1 = 2 * jp, 2 * jp + 1

                        @pl.when(cp == 0)
                        def _(j0=j0):
                            dep_ref[pb, j0 * RT : (j0 + 2) * RT, :] = (
                                jnp.zeros((2 * RT, OW), jnp.float32)
                            )

                        @pl.when(cp > 0)
                        def _(jp=jp, j0=j0, j1=j1):
                            sl = slice(jp * cap, (jp + 1) * cap)
                            Yz = lax.dot_general(
                                Uz[:, sl], w12p2[:, sl],
                                (((1,), (1,)), ((), ())),
                                precision=lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32,
                            )  # [RR*E, 128] lanes (tb*64 + yz)
                            za, zb = _zfac_merge_pair(Yz, RR, E)
                            ba = _fixup_deposit_r3(za, E, D, 1 + D)
                            bb = _fixup_deposit_r3(zb, E, D, 1 + D)
                            dep_ref[pb, j0 * RT : (j0 + 1) * RT, :] = (
                                _pad_rows(ba, RT)
                            )
                            dep_ref[pb, j1 * RT : (j1 + 1) * RT, :] = (
                                _pad_rows(bb, RT)
                            )
                elif zf_dep:
                    w12p2 = _kernel_w12p(plains2, GL) * vf
                    wxs2 = _kernel_wxs(plains2, GL)
                    RR = U.shape[0]  # (1+D)*(1+D)
                    Uz = (U[:, None, :] * wxs2[None, :, :]).reshape(RR * E, GL)
                else:
                    if NCH == 1:
                        W0n = _kernel_window(plains2, E, GL, D) * vf
                for j in range(0 if pairmode else G):
                    cnt = count_ref[gg * G + j]

                    @pl.when(cnt == 0)
                    def _(j=j):
                        dep_ref[pb, j * RT : (j + 1) * RT, :] = jnp.zeros(
                            (RT, OW), jnp.float32
                        )

                    @pl.when(cnt > 0)
                    def _(j=j):
                        if zf_dep:
                            Yz = lax.dot_general(
                                Uz[:, j * cap : (j + 1) * cap],
                                w12p2[:, j * cap : (j + 1) * cap],
                                (((1,), (1,)), ((), ())),
                                precision=lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32,
                            )  # [RR*E, 128] rows (r, kbit, q)
                            Z = _zfac_merge(Yz, RR, E)
                            blk = _fixup_deposit_r3(Z, E, D, 1 + D)
                        else:
                            if NCH > 1:
                                YT = None
                                for c in range(NCH):
                                    lo = j * cap + c * WC
                                    W0p = _pad_rows(
                                        _window_chunk(
                                            plains2, vf, lo, WC, E, D
                                        ),
                                        EP,
                                    )
                                    yt = lax.dot_general(
                                        U[:, lo : lo + WC], W0p,
                                        (((1,), (1,)), ((), ())),
                                        precision=lax.Precision.HIGHEST,
                                        preferred_element_type=jnp.float32,
                                    )
                                    YT = yt if YT is None else YT + yt
                            else:
                                YT = lax.dot_general(
                                    U[:, j * cap : (j + 1) * cap],
                                    _pad_rows(
                                        W0n[:, j * cap : (j + 1) * cap], EP
                                    ),
                                    (((1,), (1,)), ((), ())),
                                    precision=lax.Precision.HIGHEST,
                                    preferred_element_type=jnp.float32,
                                )
                            blk = _fixup_deposit(YT, E, D, 1 + D, EP)
                            if r3:
                                blk = blk.reshape((1 + D) * S1, 128)
                        dep_ref[pb, j * RT : (j + 1) * RT, :] = _pad_rows(blk, RT)

        @pl.when(tot == 0)
        def _():
            out_ref[pb] = jnp.zeros((F, GL), jnp.float32)
            flag_ref[pb] = jnp.zeros((GB, cap), jnp.float32)
            if fused_p2g1:
                dep_ref[pb] = jnp.zeros((G * RT, OW), jnp.float32)

        @pl.when(tot > 0)
        def _():
            _collect_group()

    out_shape = (
        jax.ShapeDtypeStruct((NG, F, GLW), jnp.float32),
        jax.ShapeDtypeStruct((NG, GB, cap), jnp.float32),
    )
    if fused_p2g1:
        out_shape = out_shape + (
            jax.ShapeDtypeStruct((NG, G * RT, OW), jnp.float32),
        )

    def call(count, tid, params, stream, gblk, n_asgn=None):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=_dyn_grid(NG // PB, n_asgn, G * PB),
            in_specs=[
                pl.BlockSpec(
                    (PB, F, GLW), lambda t, *_: (t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (PB, G * RT, OW), lambda t, *_: (t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=(
                pl.BlockSpec(
                    (PB, F, GLW), lambda t, *_: (t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (PB, GB, cap), lambda t, *_: (t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            )
            + (
                (
                    pl.BlockSpec(
                        (PB, G * RT, OW), lambda t, *_: (t, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                )
                if fused_p2g1
                else ()
            ),
            scratch_shapes=[pltpu.VMEM((NBP, GLW), jnp.float32)],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=spec.interpret,
        )(count, tid, params, stream, gblk)

    return call


# ---------------------------------------------------------------------------
# XLA glue: channel-major block <-> dense tile array, halo, masks
# ---------------------------------------------------------------------------


def _tile_geometry(domain: Domain, spec: StreamSpec):
    T = spec.tile
    if any(s % T for s in domain.shape):
        raise ValueError(f"grid shape {domain.shape} not divisible by tile={T}")
    tshape = tuple(s // T for s in domain.shape)
    return tshape, math.prod(tshape)


def halo_flat(x: jnp.ndarray, tshape, T: int, E: int, CH: int) -> jnp.ndarray:
    """Overlap-add across neighboring tiles on the FLAT block layout.

    x: [nt, CH*E^D] with lane order (ch, e_0, ..., e_{D-1}).  Window cell e
    maps to global cell t*T + e - h, so tile t's cells e in [T, E) coincide
    with tile t+1's [0, E-T) (generic in h).  Each axis pass is two
    (row-shift + lane-shift + mask + add) steps — all ops keep the fat
    CH*E^D minor dim, which measures ~4x faster than e-axis slice updates
    on [nt, ..., E, E, chan] layouts (bench/micro_kernels.py glue).

    Lane shifts stay within one channel block: a target lane needs e_d >= T
    (resp. < E-T), so its source lane differs by T*stride_d and has the same
    channel/other-e coordinates; out-of-support lanes are masked to zero.
    """
    D = len(tshape)
    nt, L = x.shape
    E3 = E**D
    r_io = jnp.arange(nt, dtype=jnp.int32)[:, None]  # [nt, 1]
    l_io = jnp.arange(L, dtype=jnp.int32)[None, :] % E3  # flat e index

    def row_shift(y, k):
        # z[r] = y[r + k] with zero fill (k may be negative)
        if k > 0:
            return jnp.concatenate([y[k:], jnp.zeros((k, L), y.dtype)], axis=0)
        return jnp.concatenate([jnp.zeros((-k, L), y.dtype), y[:k]], axis=0)

    def lane_shift(y, k):
        # z[:, l] = y[:, l - k] with zero fill
        if k > 0:
            return jnp.concatenate([jnp.zeros((y.shape[0], k), y.dtype), y[:, :-k]], axis=1)
        return jnp.concatenate([y[:, -k:], jnp.zeros((y.shape[0], -k), y.dtype)], axis=1)

    for d in range(D):
        rs = math.prod(tshape[d + 1 :])
        lstride = E ** (D - 1 - d)
        coord = (r_io // rs) % tshape[d]  # [nt, 1]
        e_d = (l_io // lstride) % E  # [1, L]

        xin = x
        # from the +1 neighbor: my e_d in [T, E) += nbr's e_d - T
        y = row_shift(xin, rs)
        y = jnp.where(coord < tshape[d] - 1, y, 0.0)
        y = lane_shift(y, T * lstride)
        x = x + jnp.where(e_d >= T, y, 0.0)
        # from the -1 neighbor: my e_d in [0, E-T) += nbr's e_d + T
        y = row_shift(xin, -rs)
        y = jnp.where(coord > 0, y, 0.0)
        y = lane_shift(y, -T * lstride)
        x = x + jnp.where(e_d < E - T, y, 0.0)
    return x


def halo_pull(x: jnp.ndarray, nbr: jnp.ndarray, tshape, T: int, E: int) -> jnp.ndarray:
    """Overlap-add across neighboring tiles, entirely in ACTIVE-major form.

    x: [A, CH*E^D] deposit windows of the active tiles (lane order
    (ch, e_0, .., e_{D-1})); nbr: [2*D, A] face table from ``_nbr_table``.
    Separable axis passes, same math as ``halo_flat`` (both directions of an
    axis read the pre-pass snapshot), with the dense row shifts replaced by
    A-row gathers through nbr — nothing here scales with the dense tile
    count nt.  Correctness of diagonal flows relies on the active set
    containing the needed-relay closure (``_active_set``): every relay
    between two occupied tiles exists as a zero-count active.
    (A 26-term direct pull needs no relays but measured ~4x slower — 26
    full-array gathers against 6.)"""
    D = len(tshape)
    A, L = x.shape
    E3 = E**D
    l_io = jnp.arange(L, dtype=jnp.int32)[None, :] % E3

    def lane_shift(y, k):
        if k > 0:
            return jnp.concatenate(
                [jnp.zeros((y.shape[0], k), y.dtype), y[:, :-k]], axis=1
            )
        return jnp.concatenate([y[:, -k:], jnp.zeros((y.shape[0], -k), y.dtype)], axis=1)

    for d in range(D):
        lstride = E ** (D - 1 - d)
        e_d = (l_io // lstride) % E
        xp = jnp.concatenate([x, jnp.zeros((1, L), x.dtype)], axis=0)
        # from the +1 neighbor: my e_d in [T, E) += nbr's value at e_d - T
        y = lane_shift(jnp.take(xp, nbr[2 * d], axis=0), T * lstride)
        acc = x + jnp.where(e_d >= T, y, 0.0)
        # from the -1 neighbor: my e_d in [0, E-T) += nbr's value at e_d + T
        y = lane_shift(jnp.take(xp, nbr[2 * d + 1], axis=0), -T * lstride)
        x = acc + jnp.where(e_d < E - T, y, 0.0)
    return x


def _halo_group(A: int) -> int:
    """Tiles per halo-kernel program: fat programs amortize the ~550ns
    per-program dispatch (A is always a multiple of the transfer group)."""
    for g in (32, 16, 8, 4, 2, 1):
        if A % g == 0:
            return g
    return 1


def _make_halo_gblk(spec: StreamSpec, D: int, axis: int, dt: float, gravity):
    """Final m+f halo axis pass FUSED with the grid update: emits the
    row-grouped gblk [(v(D) then mass) x S1 sublanes, 128] per tile
    directly, absorbing the XLA gblk build (measured ~5-7 ms/substep at
    3d-1m: one full read+write pass over ~600 MB).  Extra input: the
    halo'd mass hs_m [A, S1, 128]."""
    T, E, A = spec.tile, spec.E, spec.A
    E3 = E**D
    L = D * E3
    S = L // 128
    S1 = E3 // 128
    lstride = E ** (D - 1 - axis)
    shift = T * lstride
    GH = _halo_group(A)
    g_const = tuple(float(g) for g in gravity)

    def kernel(nbp_ref, nbm_ref, own_ref, m_ref, x_ref, o_ref, scrp, scrm, semp, semm):
        g = pl.program_id(0)
        base = g * GH

        def dma(idx, scr, sem, j):
            return pltpu.make_async_copy(
                x_ref.at[pl.ds(idx, 1)], scr.at[pl.ds(j, 1)], sem.at[j]
            )

        for j in range(GH):
            idp = nbp_ref[base + j]
            idm = nbm_ref[base + j]

            @pl.when(idp < A)
            def _(j=j, idp=idp):
                dma(idp, scrp, semp, j).start()

            @pl.when(idp >= A)
            def _(j=j):
                scrp[j] = jnp.zeros((S, 128), jnp.float32)

            @pl.when(idm < A)
            def _(j=j, idm=idm):
                dma(idm, scrm, semm, j).start()

            @pl.when(idm >= A)
            def _(j=j):
                scrm[j] = jnp.zeros((S, 128), jnp.float32)

        for j in range(GH):
            idp = nbp_ref[base + j]
            idm = nbm_ref[base + j]

            @pl.when(idp < A)
            def _(j=j, idp=idp):
                dma(idp, scrp, semp, j).wait()

            @pl.when(idm < A)
            def _(j=j, idm=idm):
                dma(idm, scrm, semm, j).wait()

        s_io = lax.broadcasted_iota(jnp.int32, (GH, S, 128), 1)
        l_io = lax.broadcasted_iota(jnp.int32, (GH, S, 128), 2)
        le = (s_io * 128 + l_io) % E3
        e_d = (le // lstride) % E

        def flat_roll(y, k):
            q, r = divmod(k % L, 128)
            r1 = pltpu.roll(y, r, 2)
            r2 = pltpu.roll(r1, q, 1)
            if r == 0:
                return r2
            r3 = pltpu.roll(r1, q + 1, 1)
            return jnp.where(l_io >= r, r2, r3)

        mf = (
            own_ref[...]
            + jnp.where(e_d >= T, flat_roll(scrp[...], shift), 0.0)
            + jnp.where(e_d < E - T, flat_roll(scrm[...], -shift), 0.0)
        )  # [GH, D*S1, 128]
        m = m_ref[...]  # [GH, S1, 128]
        minv = jnp.where(m > 0.0, 1.0 / jnp.where(m > 0.0, m, 1.0), 0.0)
        mpos = m > 0.0
        for c in range(D):
            vc = jnp.where(
                mpos,
                mf[:, c * S1 : (c + 1) * S1] * minv + dt * g_const[c],
                0.0,
            )
            o_ref[:, c * S1 : (c + 1) * S1, :] = vc
        o_ref[:, D * S1 : (1 + D) * S1, :] = m

    def call(x3, hs_m3, nbp, nbm, n_asgn=None):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=_dyn_grid(A // GH, n_asgn, GH),
            in_specs=[
                pl.BlockSpec(
                    (GH, S, 128), lambda g, *_: (g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (GH, S1, 128), lambda g, *_: (g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (GH, (1 + D) * S1, 128), lambda g, *_: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((GH, S, 128), jnp.float32),
                pltpu.VMEM((GH, S, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((GH,)),
                pltpu.SemaphoreType.DMA((GH,)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((A, (1 + D) * S1, 128), jnp.float32),
            interpret=spec.interpret,
        )(nbp, nbm, x3, hs_m3, x3)

    return call


def _make_halo_axis(spec: StreamSpec, D: int, axis: int, CH: int):
    """One separable push-halo axis pass as a Pallas kernel.

    x [A, CH*E^D] -> same shape with the +/- face neighbors' overlap added
    along ``axis``.  Math identical to the matching ``halo_pull`` pass: the
    lane shift by T*stride_d becomes a full-width ``pltpu.roll`` — globally
    wrapped (or cross-channel) lanes are exactly the masked-out ones, since
    a target lane with e_d >= T has flat-e index >= T*stride_d (resp.
    e_d < E-T => index < E^D - T*stride_d), so its roll source never leaves
    the channel block.  Neighbor rows arrive by per-row DMA through the
    face table (the XLA gather form measures ~200 GB/s effective at 3d-1m;
    this kernel reads each fat [1, CH*E^D] row once at DMA bandwidth)."""
    T, E, A = spec.tile, spec.E, spec.A
    E3 = E**D
    L = CH * E3
    S = L // 128  # x is rank-3 [A, S, 128]: dim 0 untiled => per-row DMA ok
    lstride = E ** (D - 1 - axis)
    shift = T * lstride
    GH = _halo_group(A)

    def kernel(nbp_ref, nbm_ref, own_ref, x_ref, o_ref, scrp, scrm, semp, semm):
        g = pl.program_id(0)
        base = g * GH

        def dma(idx, scr, sem, j):
            return pltpu.make_async_copy(
                x_ref.at[pl.ds(idx, 1)], scr.at[pl.ds(j, 1)], sem.at[j]
            )

        for j in range(GH):
            idp = nbp_ref[base + j]
            idm = nbm_ref[base + j]

            @pl.when(idp < A)
            def _(j=j, idp=idp):
                dma(idp, scrp, semp, j).start()

            @pl.when(idp >= A)
            def _(j=j):
                scrp[j] = jnp.zeros((S, 128), jnp.float32)

            @pl.when(idm < A)
            def _(j=j, idm=idm):
                dma(idm, scrm, semm, j).start()

            @pl.when(idm >= A)
            def _(j=j):
                scrm[j] = jnp.zeros((S, 128), jnp.float32)

        for j in range(GH):
            idp = nbp_ref[base + j]
            idm = nbm_ref[base + j]

            @pl.when(idp < A)
            def _(j=j, idp=idp):
                dma(idp, scrp, semp, j).wait()

            @pl.when(idm < A)
            def _(j=j, idm=idm):
                dma(idm, scrm, semm, j).wait()

        s_io = lax.broadcasted_iota(jnp.int32, (GH, S, 128), 1)
        l_io = lax.broadcasted_iota(jnp.int32, (GH, S, 128), 2)
        le = (s_io * 128 + l_io) % E3
        e_d = (le // lstride) % E

        def flat_roll(y, k):
            # roll by k over the flattened (S*128) trailing dims:
            # out[f] = in[(f - k) mod L].  Wrapped lanes land only where the
            # e_d masks below are zero (a target lane with e_d >= T has flat
            # e-index >= T*lstride, so its source stays in range).
            q, r = divmod(k % L, 128)
            r1 = pltpu.roll(y, r, 2)
            r2 = pltpu.roll(r1, q, 1)
            if r == 0:
                return r2
            r3 = pltpu.roll(r1, q + 1, 1)
            return jnp.where(l_io >= r, r2, r3)

        o_ref[...] = (
            own_ref[...]
            + jnp.where(e_d >= T, flat_roll(scrp[...], shift), 0.0)
            + jnp.where(e_d < E - T, flat_roll(scrm[...], -shift), 0.0)
        )

    def call(x3, nbp, nbm, n_asgn=None):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=_dyn_grid(A // GH, n_asgn, GH),
            in_specs=[
                pl.BlockSpec(
                    (GH, S, 128), lambda g, *_: (g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (GH, S, 128), lambda g, *_: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((GH, S, 128), jnp.float32),
                pltpu.VMEM((GH, S, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((GH,)),
                pltpu.SemaphoreType.DMA((GH,)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((A, S, 128), jnp.float32),
            interpret=spec.interpret,
        )(nbp, nbm, x3, x3)

    return call


def halo_stream(x: jnp.ndarray, nbr: jnp.ndarray, tshape, spec: StreamSpec, D: int, CH: int):
    """Active-major overlap-add: Pallas axis passes when the per-channel
    window is lane-aligned (3D with E^3 % 128 == 0), else the XLA gather
    form (2D windows are 36 lanes — sub-vreg, and 2D configs are small)."""
    if not _use_r3(spec, D):
        return halo_pull(x, nbr, tshape, spec.tile, spec.E)
    A, L = x.shape
    return halo3(x.reshape(A, L // 128, 128), nbr, spec, D, CH).reshape(A, L)


def halo3(
    x3: jnp.ndarray,
    nbr: jnp.ndarray,
    spec: StreamSpec,
    D: int,
    CH: int,
    force_kernel: bool = False,
):
    """Rank-3 [A, CH*E^D/128, 128] Pallas halo (no relayout at the API).

    Under interpret mode (CPU tests) this routes through the bit-identical
    XLA gather form instead — emulating 3 DMA kernels per halo makes the
    suite ~3x slower for zero extra coverage (the kernel itself has a
    dedicated interpret equivalence test; pass ``force_kernel`` for it)."""
    if spec.interpret and not force_kernel:
        A, S, _ = x3.shape
        tshape = None  # unused by halo_pull's lane math
        return halo_pull(
            x3.reshape(A, S * 128), nbr, (0,) * D, spec.tile, spec.E
        ).reshape(A, S, 128)
    for d in range(D):
        x3 = _make_halo_axis(spec, D, d, CH)(x3, nbr[2 * d], nbr[2 * d + 1])
    return x3


def _unflatten(idx: jnp.ndarray, shape) -> jnp.ndarray:
    out = []
    for d in range(len(shape) - 1, -1, -1):
        out.append(idx % shape[d])
        idx = idx // shape[d]
    return jnp.stack(out[::-1], axis=-1)


def _blocks_to_dense(blocks, tid, nt: int, spec: StreamSpec, D: int, CH: int):
    """[NG, G*RT, OW] kernel output -> dense [nt, CH*E^D] (flat).

    The row-grouped layout reshapes straight to per-tile blocks — no
    transpose (XLA transposes measured ~10ms at 1M scale).  Rows per tile
    are derived from the block shape (p2g1 emits GROWS(*S1), the fused
    p2g2 emits D(*S1))."""
    E, EP, G, A = spec.E, spec.EP(D), spec.group, spec.A
    E3 = E**D
    RT = blocks.shape[1] // G
    if _use_r3(spec, D):
        S1 = E3 // 128
        x = blocks.reshape(A, RT, 128)[:, : CH * S1, :].reshape(A, CH * E3)
    else:
        x = blocks.reshape(A, RT, EP)[:, :CH, :E3].reshape(A, CH * E3)
    dense = jnp.zeros((nt + 1, CH * E3), jnp.float32)
    dense = dense.at[jnp.clip(tid, 0, nt)].add(x, mode="drop")
    return dense[:nt]  # [nt, CH*E3]


def _dense_to_groups(dense_flat, tid, nt: int, spec: StreamSpec, D: int, CH: int, rows: int = CHP):
    """dense [nt, CH*E^D] -> row-grouped blocks [NG, G*rows, EP]
    (rows=1 gives the mgblk layout, one row per tile)."""
    E, EP, G, A, NG = spec.E, spec.EP(D), spec.group, spec.A, spec.NG
    E3 = E**D
    x = jnp.concatenate([dense_flat, jnp.zeros((1, CH * E3), jnp.float32)], axis=0)
    act = jnp.take(x, jnp.clip(tid, 0, nt), axis=0).reshape(A, CH, E3)
    act = jnp.pad(act, ((0, 0), (0, rows - CH), (0, EP - E3)))
    return act.reshape(NG, G * rows, EP)


# ---------------------------------------------------------------------------
# Binning: ParticleState <-> StreamState
# ---------------------------------------------------------------------------


def _flatten_coords(c: jnp.ndarray, shape) -> jnp.ndarray:
    strides = []
    s = 1
    for d in range(len(shape) - 1, -1, -1):
        strides.append(s)
        s *= shape[d]
    strides = jnp.asarray(strides[::-1], jnp.int32)
    return (c * strides).sum(axis=-1)


_LOOKAHEAD = 6.0  # predictive-binning horizon, in substeps


def _keys_from_pos(pos, domain: Domain, spec: StreamSpec, tshape, vel=None, dt=0.0):
    """Tile key per particle; with ``vel`` given, bins PREDICTIVELY.

    Binning by current position leaves a coherently-moving particle all of
    its drift margin on one side: it enters at the trailing window edge and
    re-bins after ~margin/speed substeps.  Binning by pos + clip(lookahead
    * dt * vel, +-1 cell) centers the TRAJECTORY in the drift window
    instead (at 3d-1m the falling dam re-bins 4-5x per 31-substep frame by
    position, 1-2x predictively).  A +-1-cell shift keeps the current cell
    inside the chosen tile's drift window [1-h, T-2+h] for any h >= 2:
    floor(pos +- s) with s <= 1 differs from floor(pos) by at most one
    cell, so lc is within [-1, T] — the per-axis fallback below is a
    safety net for h < 2 specs only."""
    shape = jnp.asarray(domain.shape, jnp.int32)
    origin = jnp.asarray(domain.origin, jnp.int32)
    cell = jnp.clip(jnp.floor(pos).astype(jnp.int32) - origin, 0, shape - 1)
    T, h = spec.tile, spec.halo
    if vel is None or dt == 0.0:
        return _flatten_coords(cell // T, tshape)
    shift = jnp.clip(vel * (_LOOKAHEAD * dt), -1.0, 1.0)
    pcell = jnp.clip(jnp.floor(pos + shift).astype(jnp.int32) - origin, 0, shape - 1)
    ct = pcell // T
    lc = cell - ct * T
    ok = (lc >= 1 - h) & (lc <= T - 2 + h)
    ct = jnp.where(ok, ct, cell // T)
    return _flatten_coords(ct, tshape)


def _nbr_table(tid_act, tshape, nt: int, A: int):
    """[2*D, A] active index of every active tile's +/- face neighbors.

    inv (tile id -> active index, A = not-active sentinel) is built with one
    [A] scatter — the ONLY nt-sized work outside binning itself; the
    separable push halo then runs active-major through this table.  Face
    neighbors suffice because the active set is the needed-relay closure
    (``_active_set``): every relay tile on a diagonal deposit path between
    occupied tiles is active."""
    D = len(tshape)
    inv = jnp.full((nt + 1,), A, jnp.int32)
    inv = inv.at[jnp.clip(tid_act, 0, nt)].min(
        jnp.where(tid_act < nt, jnp.arange(A, dtype=jnp.int32), A)
    )
    ok = tid_act < nt
    out = []
    for d in range(D):
        rs = math.prod(tshape[d + 1 :])
        coord = (tid_act // rs) % tshape[d]
        idp = jnp.where(ok & (coord < tshape[d] - 1), tid_act + rs, nt)
        idm = jnp.where(ok & (coord > 0), tid_act - rs, nt)
        out.append(jnp.take(inv, idp))
        out.append(jnp.take(inv, idm))
    return jnp.stack(out, axis=0)


def _gated_nbr(nbr, count, A: int, D: int):
    """DMA-source-gated copy of the face tables for the halo pass sequence.

    Pass d's rows route neighbors whose deposit block is provably still all
    zero — count == 0 and no pass 0..d-1 relayed a nonzero block into them —
    to the A sentinel, which the axis kernels treat as "zero scratch, skip
    DMA".  Bin-time only: the flags depend on count/nbr alone (constant
    between re-bins), and computing them inline costs ~5 ms/substep in [A]-
    row gathers at 3d-1m — the same order as the DMA it saves."""
    nz = count > 0
    out = []
    for d in range(D):
        nbp, nbm = nbr[2 * d], nbr[2 * d + 1]
        nzs = jnp.append(nz, False)  # sentinel A -> zero source
        nzp, nzm = jnp.take(nzs, nbp), jnp.take(nzs, nbm)
        out.append(jnp.where(nzp, nbp, A))
        out.append(jnp.where(nzm, nbm, A))
        nz = nz | nzp | nzm
    return jnp.stack(out, axis=0)


def _dilate_axes(o, axes):
    """+/-1 max filter along the given axes of a D-dim bool array."""
    D = o.ndim
    for d in axes:
        z = [slice(None)] * D
        lo = list(z)
        hi = list(z)
        lo[d] = slice(1, None)
        hi[d] = slice(None, -1)
        shp = list(o.shape)
        shp[d] = 1
        pad = jnp.zeros(shp, o.dtype)
        o = o | jnp.concatenate([o[tuple(lo)], pad], axis=d) | jnp.concatenate(
            [pad, o[tuple(hi)]], axis=d
        )
    return o


def _dilate(occ, tshape):
    """Cube-dilate a [nt] bool occupancy map (separable +/-1 max filter)."""
    D = len(tshape)
    return _dilate_axes(occ.reshape(tshape), range(D)).reshape(-1)


def _active_set(occ, tshape):
    """Needed-relay closure of a [nt] bool occupancy map (bin-time, O(nt)).

    The separable halo (axis passes 0..D-1) moves window overlap +/-1 tile
    per axis, so a deposit flow between occupied tiles u, w (|u-w|_inf <= 1
    — windows are E = T+2h <= 2T cells wide, so only cube neighbors
    overlap) routes through the intermediate lattice tiles
    (w0,u1,u2) after pass 0 and (w0,w1,u2) after pass 1.  Those relays must
    be active (zero-count, compute-skipped); nothing else does:
      - t is a pass-0 relay for SOME occupied pair iff t is an axis-0
        neighbor of an occupied u AND reaches an occupied w via axes 1..:
        t in dil_0(occ) & dil_{1..D-1}(occ);
      - t is a pass-1 relay iff t in dil_{0,1}(occ) & dil_{D-1}(occ).
    Flows into tiles outside this closure have no occupied receiver — their
    windows are never read (collect runs per occupied tile) — and the nbrg
    gating treats non-active sources as zero.  Versus full cube dilation
    this shrinks the active set to ~1.0-1.2x the occupied count (cube
    dilation of a settled fluid SHEET is ~3.4x: the empty layers above and
    below relay nothing — measured at batch-64, dilated 73.9k vs 21.8k
    occupied at frame 4)."""
    D = len(tshape)
    o = occ.reshape(tshape)
    if D == 1:
        return o.reshape(-1)
    act = o | (_dilate_axes(o, [0]) & _dilate_axes(o, range(1, D)))
    if D > 2:
        act = act | (
            _dilate_axes(o, range(D - 1)) & _dilate_axes(o, [D - 1])
        )
    return act.reshape(-1)


def _bin_rows(
    rows, tid_of_particle, n, spec: StreamSpec, nt, tshape, row_idx=None,
    occ_force=None,
):
    """rows [N, F] + tile ids -> (stream, count, tid) slot structure.

    GATHER-only (row scatter measures ~10x slower than gather on v5e):
    sort keys, materialize the rows in tile-sorted order (ONE random n-row
    gather), then fill slots with a MONOTONIC [A*cap]-row gather — per-tile
    slot ranges are contiguous in the sorted array, and v5e row gathers
    from (nearly) sequential addresses measure ~3x faster than random ones
    (31 vs ~100 ms at 4M rows; multi-row slice gathers via lax.gather are
    20x WORSE — measured 689-886 ms — don't retry).  Tile ids >= nt are
    "invalid row" sentinels (used by re-binning) and never land in a tile.
    ``row_idx`` (optional, [n] into rows) composes a prior compaction into
    the same gather: sorted row i is rows[row_idx[order[i]]].
    ``occ_force`` (optional, [nt] bool) marks tiles that must be treated as
    OCCUPIED when computing the needed-relay closure even though they hold
    no local particles — the sharded backend passes its ghost-column mask
    (ghost tiles are occupied REMOTELY; their deposit blocks arrive via the
    ppermute exchange, so local occupancy alone under-provisions the relays
    for cross-boundary flows).  Forced tiles still bin as zero-count
    actives.
    """
    cap, G, A, NG = spec.cap, spec.group, spec.A, spec.NG
    F = rows.shape[1]

    order = jnp.argsort(tid_of_particle)
    sid = jnp.take(tid_of_particle, order)
    # start[t] = first sorted rank with tile id >= t.  scan_unrolled binary
    # search wins for ~32k queries over 1M keys (7.1 ms vs sort-method's
    # 10.5 and scatter-min + cummin's ~25 on v5e); at packed-scene scale
    # (batch-64: 373k tiles) the query count dwarfs the keys and the sort
    # method wins instead.
    method = "scan_unrolled" if nt <= 65536 else "sort"
    start = jnp.searchsorted(
        sid, jnp.arange(nt + 2, dtype=sid.dtype), side="left",
        method=method,
    ).astype(jnp.int32)
    count_t = (start[1:] - start[:-1])[:nt]  # real tiles only

    # active set = needed-relay closure of the occupancy (see _active_set):
    # zero-count shell tiles act as halo relays; kernels skip them via
    # count == 0.
    # OCCUPIED-FIRST ordering (round 3): at 3d-1m roughly half the actives
    # are empty shell tiles, and interleaving them with occupied tiles makes
    # nearly every kernel GROUP contain a particle — so the per-group window
    # and value builds (the dominant non-dot kernel cost) run for all NG
    # groups.  Ranking occupied tiles first packs the shells into tail
    # groups whose tot==0 fast path skips all compute.
    occ_p = count_t > 0
    occ_c = occ_p if occ_force is None else occ_p | occ_force
    occ = _active_set(occ_c, tshape)
    shell = occ & ~occ_p
    n_occ = occ_p.sum().astype(jnp.int32)
    rank_p = jnp.cumsum(occ_p.astype(jnp.int32)) - 1
    rank_s = n_occ + jnp.cumsum(shell.astype(jnp.int32)) - 1
    occ_rank = jnp.where(occ_p, rank_p, rank_s)
    act_of_tile = jnp.where(occ & (occ_rank < A), occ_rank, A)
    tid_act = jnp.full((A,), -1, jnp.int32)
    tid_act = tid_act.at[jnp.clip(act_of_tile, 0, A - 1)].max(
        jnp.where(act_of_tile < A, jnp.arange(nt, dtype=jnp.int32), -1)
    )
    tid_act = jnp.where(tid_act < 0, nt, tid_act)
    count_act = jnp.take(jnp.append(count_t, 0), jnp.clip(tid_act, 0, nt))
    count_act = jnp.minimum(count_act, cap)

    D = len(tshape)
    if _use_pair(spec, D):
        # TILE PAIRING: re-order actives so blocks = adjacent pairs
        # (2p, 2p+1) whose counts always fit one cap-lane slot block.
        # Lossless rule: sort actives by count desc; "big" tiles
        # (count > cap/2, rank < nb) go solo — each followed by a
        # count-zero entry pulled from the sorted tail — and everything
        # else pairs adjacently (two counts <= cap/2 always fit).  Shell
        # and sentinel entries (count 0) pair at the tail, preserving the
        # occupied-first tot==0 fast-path grouping.
        # The src map below is a permutation for ANY nb: head [0, nb) solo
        # bigs, tail (A-1-p for p < nb) their sentinels, middle [nb, A-nb)
        # adjacent pairs.  Losslessness needs the tail sources to be
        # count-zero (true whenever the active budget has >= nb spare
        # zero-count entries — shells + unused); a too-tight budget can
        # pair a big with a nonzero tile and clamp, which the sum(count)
        # conservation check reports loudly, same as budget exhaustion.
        order2 = jnp.argsort(-count_act)  # desc, stable
        nb = (count_act > cap // 2).sum().astype(jnp.int32)
        j_io = jnp.arange(A, dtype=jnp.int32)
        src = jnp.where(
            j_io < 2 * nb,
            jnp.where(j_io % 2 == 0, j_io // 2, A - 1 - j_io // 2),
            j_io - nb,
        )
        perm_a = jnp.take(order2, src)
        tid_act = jnp.take(tid_act, perm_a)
        count_act = jnp.take(count_act, perm_a)
        # pair clamp: tile 2p+1 only keeps what fits after 2p.  A no-op for
        # every lossless pairing (sums <= cap by construction); on budget
        # exhaustion the stored counts stay consistent with the slots so
        # sum(count) == placed particles and the loss is detectable.
        c0r = count_act[0::2]
        c1r = jnp.minimum(count_act[1::2], cap - c0r)
        count_act = jnp.stack([c0r, c1r], axis=1).reshape(A)

    # slot fill via wide-chunk gathers over tile-sorted rows
    act_start = jnp.take(start[:-1], jnp.clip(tid_act, 0, nt))
    s_io = jnp.arange(cap, dtype=jnp.int32)
    perm = order if row_idx is None else jnp.take(row_idx, order)
    srows = jnp.take(rows, perm, axis=0)  # [n, F] tile-sorted
    if _use_pair(spec, D):
        # pair slot block b: tile 2b front-packed at [0, c0), tile 2b+1 at
        # [c0, c0+c1).  The gather is 2 sequential runs per block (run
        # length ~ tile count) — near-sequential, which v5e row gathers
        # like almost as much as fully monotonic.
        c0 = count_act[0::2]
        c1 = count_act[1::2]
        in0 = s_io[None, :] < c0[:, None]
        validp = s_io[None, :] < (c0 + c1)[:, None]
        bidx = jnp.where(
            in0,
            act_start[0::2][:, None] + s_io[None, :],
            act_start[1::2][:, None] + (s_io[None, :] - c0[:, None]),
        )  # [A/2, cap]
        slot_rows = jnp.take(
            srows, jnp.clip(bidx, 0, n - 1).ravel(), axis=0
        ).reshape(A // 2, cap, F)
        slot_rows = jnp.where(validp[..., None], slot_rows, 0.0)
        GP = G // 2
        stream = (
            slot_rows.reshape(NG, GP, cap, F)
            .transpose(0, 3, 1, 2)
            .reshape(NG, F, GP * cap)
        )
        flag = jnp.zeros((NG, GP, cap), jnp.float32)
    else:
        valid = s_io[None, :] < count_act[:, None]
        # keep bidx MONOTONIC including pad slots (clip, never re-point): v5e
        # row gathers from sequential addresses are ~3x cheaper, and rerouting
        # invalid slots to row 0 measured 34% slower at 2d-100k (round 3)
        bidx = act_start[:, None] + s_io[None, :]  # [A, cap], monotonic
        slot_rows = jnp.take(
            srows, jnp.clip(bidx, 0, n - 1).ravel(), axis=0
        ).reshape(A, cap, F)
        slot_rows = jnp.where(valid[..., None], slot_rows, 0.0)
        stream = (
            slot_rows.reshape(NG, G, cap, F).transpose(0, 3, 1, 2).reshape(NG, F, G * cap)
        )
        flag = jnp.zeros((NG, G, cap), jnp.float32)
    nbr = _nbr_table(tid_act, tshape, nt, A)
    # needed-but-dropped actives: occupied drops lose particles (caught by
    # the sum(count) conservation check) but SHELL drops silently break a
    # relay path — record the watermark so sessions/bench can fail loudly
    # even when a transient splash peak settles back before the final
    # overflow_count check.
    # shape [1] (not []) so the leaf can ride shard_map's P(AXIS) out_specs
    need = occ.sum().astype(jnp.int32).reshape(1)
    shell_drop = jnp.maximum(0, need - A)
    return StreamState(
        stream=stream, count=count_act, tid=tid_act, flag=flag,
        nbr=nbr, nbrg=_gated_nbr(nbr, count_act, A, len(tshape)),
        shell_drop=shell_drop, need_peak=need,
        rebins=jnp.zeros((1,), jnp.int32),
    )


def bin_particles(p: ParticleState, domain: Domain, spec: StreamSpec, dt: float = 0.0) -> StreamState:
    """ParticleState -> persistent stream layout (sort + one row scatter).

    ``dt`` (static) enables predictive binning — see _keys_from_pos."""
    tshape, nt = _tile_geometry(domain, spec)
    n, D = p.n, p.dim
    rows = jnp.concatenate(
        [
            p.pos,
            p.vel,
            p.C.reshape(n, D * D),
            p.mass[:, None],
            jnp.arange(n, dtype=jnp.float32)[:, None],  # id (exact to 2^24)
            p.density[:, None],
            p.pressure[:, None],
        ],
        axis=1,
    )
    tid_p = _keys_from_pos(p.pos, domain, spec, tshape, vel=p.vel, dt=dt)
    return _bin_rows(rows, tid_p, n, spec, nt, tshape)


def _stream_flat(st: StreamState, spec: StreamSpec, D: int):
    """stream -> flat rows [nblocks*cap, F] in slot order (block-major)."""
    cap, G, NG = spec.cap, spec.group, spec.NG
    F = st.stream.shape[1]
    GB = G // 2 if _use_pair(spec, D) else G  # slot blocks per group
    return (
        st.stream.reshape(NG, F, GB, cap)
        .transpose(0, 2, 3, 1)
        .reshape(NG * GB * cap, F)
    )


def _slots_flat(st: StreamState, spec: StreamSpec, D: int = 3):
    """stream -> (rows [nblocks*cap, F], slot_valid [nblocks*cap])."""
    cap, A = spec.cap, spec.A
    flat = _stream_flat(st, spec, D)
    if _use_pair(spec, D):
        blk_cnt = st.count[0::2] + st.count[1::2]  # live per slot block
    else:
        blk_cnt = st.count
    ns = flat.shape[0]
    slot_valid = (
        jnp.arange(ns, dtype=jnp.int32) % cap
        < jnp.repeat(blk_cnt, cap, total_repeat_length=ns)
    )
    return flat, slot_valid


def _slot_base(count, cap: int, A: int, pair: bool):
    """[A] flat slot index of each active tile's first particle."""
    a = jnp.arange(A, dtype=jnp.int32)
    if not pair:
        return a * cap
    prev = jnp.concatenate([jnp.zeros((1,), count.dtype), count[:-1]])
    return (a // 2) * cap + (a % 2) * prev


def _compact_src(count, n: int, cap: int, A: int, pair: bool = False):
    """[n] flat slot index of the i-th live particle (slot order).

    Tile of rank i = #{t: cum[t] <= i}: a one-hot histogram of the cumsum
    boundaries + prefix sum (3.5 ms at 1M on v5e; the searchsorted form
    measured 17-28 ms).  ``pair``: slot blocks hold tile pairs (2p, 2p+1)
    front-packed consecutively."""
    cum = jnp.cumsum(count)
    b = jnp.zeros((n + 1,), jnp.int32).at[jnp.clip(cum, 0, n)].add(1, mode="drop")
    a = jnp.clip(jnp.cumsum(b)[:n], 0, A - 1)
    i = jnp.arange(n, dtype=jnp.int32)
    start = cum - count
    base = jnp.take(_slot_base(count, cap, A, pair), a)
    nslot = (A // 2 if pair else A) * cap
    return jnp.clip(base + (i - jnp.take(start, a)), 0, nslot - 1)


def _compact_rows(st: StreamState, spec: StreamSpec, n: int, D: int):
    """Valid slots -> dense rows [n, F] (slot order = tile-sorted order).

    Slots are front-packed per tile, so valid slot i of the run is tile
    ``a = searchsorted(cumsum(count), i)`` at slot ``i - start_a`` — one
    [A]-prefix-sum + one n-row gather, never touching the (slots - n)
    empty slots.  This is what keeps re-binning O(n) instead of O(slots)
    (at 3d-1m: 4M slots hold 1M particles; the slot-shaped re-bin measured
    282 ms, the compacted one ~80 ms)."""
    cap, A = spec.cap, spec.A
    flat = _stream_flat(st, spec, D)
    # i >= sum(count) (possible only if particles were lost, which strict
    # mode forbids) clips into the last tile's pad slots — zero rows.
    src = _compact_src(st.count, n, cap, A, _use_pair(spec, D))
    return jnp.take(flat, src, axis=0)


def unbin(st: StreamState, domain: Domain, spec: StreamSpec, n: int, D: int) -> ParticleState:
    """Stream -> ParticleState in ORIGINAL particle order (via the id row).

    Gather-only and O(n): compact the valid slots to [n, F] rows, then one
    n-key argsort on the id row restores original order."""
    rows = _compact_rows(st, spec, n, D)
    ids = rows[:, 2 * D + D * D + 1].astype(jnp.int32)
    order = jnp.argsort(ids)
    out = jnp.take(rows, order, axis=0)
    return ParticleState(
        pos=out[:, 0:D],
        vel=out[:, D : 2 * D],
        C=out[:, 2 * D : 2 * D + D * D].reshape(n, D, D),
        mass=out[:, 2 * D + D * D],
        density=out[:, 2 * D + D * D + 2],
        pressure=out[:, 2 * D + D * D + 3],
    )


# ---------------------------------------------------------------------------
# Substep + frame drivers
# ---------------------------------------------------------------------------


def _collect_params(cfg: Config, mouse_pos, mouse_active, D: int, stride: float = 0.0):
    lo, hi = cfg.boundary_clip
    base = jnp.asarray(
        [
            cfg.dt, cfg.rest_density, cfg.eos_stiffness, cfg.eos_power,
            cfg.pressure_floor, cfg.mouse_radius, cfg.boundary_damp_dist,
            0.0, 0.0, 0.0, *lo, *hi, stride,
        ],
        jnp.float32,
    )
    base = base.at[7].set(mouse_active.astype(jnp.float32))
    base = base.at[8].set(mouse_pos[0].astype(jnp.float32))
    base = base.at[9].set(mouse_pos[1].astype(jnp.float32))
    return base


def substep_binned(
    st: StreamState,
    cfg: Config,
    domain: Domain,
    spec: StreamSpec,
    mouse_pos,
    mouse_active,
) -> StreamState:
    """One MLS-MPM substep entirely on the persistent stream layout."""
    tshape, origin, nt = _geom(domain, spec)
    dep1_k = make_deposit_kernel(spec, cfg.dim, tshape, origin, "p2g1")
    no = _n_occ(st.count) if spec.dyn else None
    st, _ = _substep_core(
        st, dep1_k(st.count, st.tid, st.stream, n_asgn=no), cfg, domain,
        spec, mouse_pos, mouse_active, fused=False,
    )
    return st


def _geom(domain: Domain, spec: StreamSpec):
    tshape, nt = _tile_geometry(domain, spec)
    return tshape, tuple(int(o) for o in domain.origin), nt


def substep_stages(cfg: Config, domain: Domain, spec: StreamSpec, fused: bool = False):
    """Stage closures of the stream substep — the SINGLE definition site
    shared by ``_substep_core`` (production: composed back-to-back inside
    one jitted frame) and ``utils.timing.StreamPhaseTimer`` (diagnostic
    overlay: each stage jitted separately), so the overlay is structurally
    unable to drift from the production substep (VERDICT r4 #7).

    Returns a namespace of::

      dep1(st)                   -> p2g_1 deposit blocks
      halo_m(st, dep1v)          -> halo'd mass windows
                                    (r3: [A, S1, 128]; flat: [A, E^D])
      dep2(st, dep1v, hs_m)      -> COMBINED momentum+force windows
      halo_gblk(st, dep2v, hs_m) -> grid-value blocks (v + mass windows)
      collect(st, gblk, mp, ma)  -> collect-kernel outputs tuple
                                    (stream', flag[, dep1_next if fused])

    Dynamic-grid bounds are recomputed per call from ``st`` (tid/count only
    change at re-bins, but the [A] reduces are ~free next to any kernel):
    ``na`` (assigned = occupied + relay shells) bounds the halo axis
    passes; ``no`` (occupied only) bounds dep1/dep2/collect/gblk, whose
    shell outputs are never consumed — see _n_occ.  Count-gates zero the
    shell tiles' UNINITIALIZED deposit blocks before any halo reads them.

    No edge mask anywhere: positions are clamped to boundary_clip, which
    sits >= 1 cell inside the dense grid (make_domain enforces
    halo_cells >= 1), so every stencil deposit lands in-grid; out-of-grid
    WINDOW cells of edge tiles hold zero deposits on every tile that
    replicates them, and the halo adds zeros — identical to the reference's
    dropped-tap semantics (2d_multi.rs:165-167) without any masking work.
    """
    D = cfg.dim
    tshape, origin, nt = _geom(domain, spec)
    T, E = spec.tile, spec.E
    EP = spec.EP(D)
    A, NG, G = spec.A, spec.NG, spec.group
    E3 = E**D

    dep1_k = make_deposit_kernel(spec, D, tshape, origin, "p2g1")
    dep2_k = make_deposit_kernel(spec, D, tshape, origin, "p2g2")
    coll_k = make_collect_kernel(spec, D, tshape, origin, fused_p2g1=fused)
    params6 = jnp.asarray(
        [cfg.dt, cfg.rest_density, cfg.eos_stiffness, cfg.eos_power,
         cfg.pressure_floor, cfg.dynamic_viscosity],
        jnp.float32,
    )
    g = jnp.asarray(cfg.gravity, jnp.float32)

    def _no(st):
        return _n_occ(st.count) if spec.dyn else None

    def _na(st):
        return _n_asgn(st.tid, nt) if spec.dyn else None

    def _occ_t(st):
        # count-gate for halo inputs: the occupied-bound deposit kernels
        # leave shell blocks UNINITIALIZED (their true value is zero)
        return (st.count > 0)[:, None, None]

    def dep1(st):
        return dep1_k(st.count, st.tid, st.stream, n_asgn=_no(st))

    if _use_r3(spec, D):
        # rank-3 halo-native path (3D): deposit blocks arrive as
        # [A, ch*S1, 128]; every glue op below is elementwise/reshape on
        # that layout — zero relayout copies between kernels
        S1 = E3 // 128

        def halo_m(st, dep1v):
            # mass halo: XLA gather form by default (at 2KB rows the Pallas
            # DMA kernel is latency-bound and LOSES to the gather when the
            # budget is tight — measured 8.4 vs ~4 ms at 3d-1m), or the
            # dyn-bounded Pallas axis kernels when spec.mhalo == "pallas"
            # (the gather pays ~0.2 us per BUDGET tile, slack included; the
            # kernels pay only the n_asgn prefix).  The occ_t gate zeroes
            # the shell tiles' UNINITIALIZED dep1 blocks either way (pass-0
            # "own" rows must read as zero; later passes see initialized
            # outputs).
            d1 = dep1v.reshape(A, GROWS * S1, 128)
            m_gated = jnp.where(_occ_t(st), d1[:, :S1], 0.0)
            if spec.mhalo == "pallas":
                hs_m3 = m_gated
                na = _na(st)
                for d in range(D):
                    hs_m3 = _make_halo_axis(spec, D, d, 1)(
                        hs_m3, st.nbrg[2 * d], st.nbrg[2 * d + 1], n_asgn=na
                    )
                return hs_m3
            return halo_pull(
                m_gated.reshape(A, E3), st.nbr, tshape, T, E,
            ).reshape(A, S1, 128)

        def dep2(st, dep1v, hs_m3):
            # dep2 emits the COMBINED momentum+force windows (the m+f add
            # is fused in-kernel; halo(mom)+halo(frc) == halo(mom+frc))
            return dep2_k(
                st.count, st.tid, st.stream,
                mgblk=hs_m3.reshape(NG, G * S1, 128), params=params6,
                d1blk=dep1v, n_asgn=_no(st),
            )

        def halo_gblk(st, dep2v, hs_m3):
            mf3 = jnp.where(_occ_t(st), dep2v.reshape(A, D * S1, 128), 0.0)
            if not spec.interpret:
                # last axis pass fused with the grid update: emits gblk
                # directly.  The m+f passes take the GATED neighbor tables
                # (st.nbrg): a neighbor whose deposit block is provably
                # still all zero (count == 0 and nothing relayed into it by
                # earlier passes) is pre-routed to the A sentinel at bin
                # time, so the kernel skips its DMA — at 3d-1m ~43% of
                # actives are zero-count shell relays and the halo passes
                # are DMA-row-bound.  Computing the gate inline costs 6
                # [A]-row gathers ≈ 5 ms/substep (measured), i.e. exactly
                # the DMA saving — it MUST live at bin time.
                na = _na(st)
                for d in range(D - 1):
                    mf3 = _make_halo_axis(spec, D, d, D)(
                        mf3, st.nbrg[2 * d], st.nbrg[2 * d + 1], n_asgn=na
                    )
                return _make_halo_gblk(spec, D, D - 1, cfg.dt, cfg.gravity)(
                    mf3, hs_m3, st.nbrg[2 * (D - 1)],
                    st.nbrg[2 * (D - 1) + 1], n_asgn=_no(st),
                ).reshape(NG, G * GROWS * S1, 128)
            hs_mf3 = halo3(mf3, st.nbr, spec, D, D)
            mfv = hs_mf3.reshape(A, D, S1, 128)
            mav = hs_m3[:, None]  # [A, 1, S1, 128]
            vv = jnp.where(
                mav > 0.0,
                mfv / jnp.where(mav > 0.0, mav, 1.0)
                + cfg.dt * g[None, :, None, None],
                0.0,
            )
            return jnp.concatenate(
                [vv.reshape(A, D * S1, 128), hs_m3], axis=1
            ).reshape(NG, G * GROWS * S1, 128)

    else:

        def halo_m(st, dep1v):
            blk1 = dep1v.reshape(A, GROWS, EP)[:, : 1 + D, :E3]
            blk1 = jnp.where(_occ_t(st), blk1, 0.0)
            # halo only the MASS channel (p2g_2 needs it); the momentum
            # halo rides the force halo below (dep2 emits COMBINED m+f;
            # halo is linear)
            return halo_stream(blk1[:, 0, :], st.nbr, tshape, spec, D, 1)

        def dep2(st, dep1v, hs_m):
            mgblk = jnp.pad(hs_m, ((0, 0), (0, EP - E3))).reshape(NG, G, EP)
            return dep2_k(
                st.count, st.tid, st.stream, mgblk=mgblk, params=params6,
                d1blk=dep1v, n_asgn=_no(st),
            )

        def halo_gblk(st, dep2v, hs_m):
            blk2 = dep2v.reshape(A, D, EP)[:, :, :E3]  # [A, D, E3] (m+f)
            blk2 = jnp.where(_occ_t(st), blk2, 0.0)
            hs_mf = halo_stream(
                blk2.reshape(A, D * E3), st.nbr, tshape, spec, D, D
            )
            mf = hs_mf.reshape(A, D, E3)
            ma_ = hs_m.reshape(A, 1, E3)
            v = jnp.where(
                ma_ > 0.0,
                mf / jnp.where(ma_ > 0.0, ma_, 1.0) + cfg.dt * g[None, :, None],
                0.0,
            )
            gblk = jnp.concatenate([v, ma_], axis=1)  # [A, 1+D, E3]
            gblk = jnp.pad(gblk, ((0, 0), (0, GROWS - 1 - D), (0, EP - E3)))
            return gblk.reshape(NG, G * GROWS, EP)

    def collect(st, gblk, mouse_pos, mouse_active):
        params = _collect_params(
            cfg, mouse_pos, mouse_active, D, spec.scene_stride
        )
        return coll_k(st.count, st.tid, params, st.stream, gblk, n_asgn=_no(st))

    return types.SimpleNamespace(
        dep1=dep1, halo_m=halo_m, dep2=dep2, halo_gblk=halo_gblk,
        collect=collect,
    )


def _substep_core(
    st: StreamState,
    dep1,
    cfg: Config,
    domain: Domain,
    spec: StreamSpec,
    mouse_pos,
    mouse_active,
    fused: bool,
):
    """Substep body given this substep's p2g_1 blocks.

    ``fused=True`` uses the collect kernel that also emits the NEXT
    substep's p2g_1 (valid only while no drift flag fires); returns
    (state, dep1_next-or-None).  The stage bodies live in
    ``substep_stages`` — ONE definition site shared with the timing
    overlay."""
    D = cfg.dim
    stages = substep_stages(cfg, domain, spec, fused=fused)
    hs_m = stages.halo_m(st, dep1)
    d2 = stages.dep2(st, dep1, hs_m)
    gblk = stages.halo_gblk(st, d2, hs_m)
    outs = stages.collect(st, gblk, mouse_pos, mouse_active)
    new_stream, flag = outs[0], outs[1]
    dep1_next = outs[2] if fused else None
    if spec.dyn:
        # skipped tail programs leave their flag blocks uninitialized;
        # needs_rebin reduces over the whole array, so mask by occupancy
        # (per slot block — covered groups zero their own tot==0 blocks,
        # and only occupied blocks hold slots that can drift)
        occ_e = st.count > 0
        if _use_pair(spec, D):
            occ_e = occ_e[0::2] | occ_e[1::2]
        GB = flag.shape[1]
        flag = jnp.where(occ_e.reshape(spec.NG, GB, 1), flag, 0.0)
    st2 = StreamState(
        stream=new_stream, count=st.count, tid=st.tid, flag=flag, nbr=st.nbr,
        nbrg=st.nbrg, shell_drop=st.shell_drop, need_peak=st.need_peak,
        rebins=st.rebins,
    )
    return st2, dep1_next


def needs_rebin(st: StreamState, domain: Domain, spec: StreamSpec, D: int) -> jnp.ndarray:
    """True when any valid particle's NEXT deposit would fall outside its
    bin tile's drift window (local cell outside [1-h, T-2+h]).

    The collect kernel writes per-slot verdicts into the contiguous flag
    output (invalid slots zeroed; 2.0 = violation, 1.0 = at-risk under a
    graded spec.rebin_margin), so this is one cheap reduce; a freshly
    (re-)binned stream carries a cleared flag."""
    return jnp.any(st.flag >= 2.0)


def frame_binned(
    st: StreamState,
    cfg: Config,
    domain: Domain,
    spec: StreamSpec,
    mouse_pos,
    mouse_active,
    substeps: Optional[int] = None,
    n: Optional[int] = None,
) -> StreamState:
    """cfg.iterations substeps with drift-triggered conditional re-binning.

    ``n`` is the live particle count (static; defaults to the full slot
    count, which is always safe but makes re-bins O(slots) — frame() passes
    the real n for the O(n) compacted re-bin)."""
    tshape, origin, nt = _geom(domain, spec)
    n_sub = cfg.iterations if substeps is None else substeps
    nslots = (spec.A // 2 if _use_pair(spec, cfg.dim) else spec.A) * spec.cap
    n_c = nslots if n is None else n
    dep1_k = make_deposit_kernel(spec, cfg.dim, tshape, origin, "p2g1")

    def body(_, carry):
        st, dep1 = carry
        st, dep1_next = _substep_core(
            st, dep1, cfg, domain, spec, mouse_pos, mouse_active, fused=True
        )

        def do_rebin(st):
            # fused dep1 is stale after a re-bin: recompute standalone
            st2 = _rebin_full(st, cfg, domain, spec, tshape, nt, n_c)
            # carry the budget-exhaustion watermark across re-bins
            st2 = dataclasses.replace(
                st2,
                shell_drop=jnp.maximum(st.shell_drop, st2.shell_drop),
                need_peak=jnp.maximum(st.need_peak, st2.need_peak),
                rebins=st.rebins + 1,
            )
            no2 = _n_occ(st2.count) if spec.dyn else None
            return st2, dep1_k(st2.count, st2.tid, st2.stream, n_asgn=no2)

        return lax.cond(
            needs_rebin(st, domain, spec, cfg.dim),
            do_rebin,
            lambda s: (s, dep1_next),
            st,
        )

    no0 = _n_occ(st.count) if spec.dyn else None
    dep1_0 = dep1_k(st.count, st.tid, st.stream, n_asgn=no0)
    st, _ = lax.fori_loop(0, n_sub, body, (st, dep1_0))
    return st


def _rebin_full(st: StreamState, cfg, domain, spec: StreamSpec, tshape, nt, n: int):
    """Static-shape re-bin, O(n): derive the live slots' flat indices (the
    same searchsorted compaction as ``_compact_rows``), gather only the
    POSITIONS narrowly to key+sort, then hand the flat slot array plus the
    composed index map to ``_bin_rows`` — one full-row gather total instead
    of compact-then-sort's two.  ``n`` must equal the live particle count
    (the strict-mode invariant sum(count) == n)."""
    D = cfg.dim
    cap, G, A, NG = spec.cap, spec.group, spec.A, spec.NG
    flat = _stream_flat(st, spec, D)
    src = _compact_src(st.count, n, cap, A, _use_pair(spec, D))
    # keys computed ELEMENTWISE over all slots straight off the stream's
    # field rows (no transpose, no row gather), then one scalar take
    # through src — replaces a 1M-row take + keys (37.8 -> ~6 ms)
    pos_rows = jnp.stack(
        [st.stream[:, d, :].reshape(-1) for d in range(D)], axis=-1
    )
    vel_rows = jnp.stack(
        [st.stream[:, D + d, :].reshape(-1) for d in range(D)], axis=-1
    )
    tid_slot = _keys_from_pos(
        pos_rows, domain, spec, tshape, vel=vel_rows, dt=cfg.dt
    )
    tid_p = jnp.take(tid_slot, src)
    # rows beyond the live count (possible only when n overestimates, e.g.
    # after a strict-contract violation) key to the nt sentinel tile, which
    # _bin_rows never places — no duplicated particles.
    live = jnp.arange(n, dtype=jnp.int32) < st.count.sum()
    tid_p = jnp.where(live, tid_p, nt)
    return _bin_rows(flat, tid_p, n, spec, nt, tshape, row_idx=src)


# ---------------------------------------------------------------------------
# Drop-in substep (dense-backend-compatible signature, for tests/step.py)
# ---------------------------------------------------------------------------


def substep(
    p: ParticleState,
    cfg: Config,
    domain: Domain,
    mouse_pos,
    mouse_active,
    spec: Optional[StreamSpec] = None,
    preserve_order: bool = True,
) -> Tuple[ParticleState, GridState]:
    """Bin -> one substep -> unbin.  For equivalence tests and small runs;
    the fast path is frame() below (bin/unbin amortized over the frame)."""
    if spec is None:
        spec = default_spec(cfg, domain, p.n)
    st = bin_particles(p, domain, spec, dt=cfg.dt)
    st2 = substep_binned(st, cfg, domain, spec, mouse_pos, mouse_active)
    out = unbin(st2, domain, spec, p.n, p.dim)

    # Dense grid for API parity (dead-code-eliminated when unused).
    D = cfg.dim
    tshape, nt = _tile_geometry(domain, spec)
    origin = tuple(int(o) for o in domain.origin)
    dep1_k = make_deposit_kernel(spec, D, tshape, origin, "p2g1")
    dep1 = dep1_k(st.count, st.tid, st.stream)
    dense1 = _blocks_to_dense(dep1, st.tid, nt, spec, D, 1 + D)
    from .tiling import assemble

    E = spec.E
    blocks_em = dense1.reshape(nt, 1 + D, *(E,) * D)
    perm = (0,) + tuple(range(2, 2 + D)) + (1,)
    grid_all = assemble(blocks_em.transpose(perm), tshape, spec.tile)
    grid_m = grid_all[..., 0]
    params6 = jnp.asarray(
        [cfg.dt, cfg.rest_density, cfg.eos_stiffness, cfg.eos_power,
         cfg.pressure_floor, cfg.dynamic_viscosity],
        jnp.float32,
    )
    hs_m = halo_flat(dense1[:, : E**D], tshape, spec.tile, E, 1)
    mgblk = _dense_to_groups(hs_m, st.tid, nt, spec, D, 1, rows=1)
    if _use_r3(spec, D):  # rank-3 mgblk layout (see make_deposit_kernel)
        S1 = E**D // 128
        NGg, Gg = spec.NG, spec.group
        mgblk = mgblk.reshape(NGg, Gg, spec.EP(D))[:, :, : E**D].reshape(
            NGg, Gg * S1, 128
        )
    dep2_k = make_deposit_kernel(spec, D, tshape, origin, "p2g2")
    dep2 = dep2_k(
        st.count, st.tid, st.stream, mgblk=mgblk, params=params6, d1blk=dep1
    )
    # dep2 blocks are the COMBINED momentum+force windows (m+f fused)
    dense2 = _blocks_to_dense(dep2, st.tid, nt, spec, D, D)
    blocks2 = dense2.reshape(nt, D, *(E,) * D)
    grid_mv = assemble(blocks2.transpose(perm), tshape, spec.tile)
    g = jnp.asarray(cfg.gravity, jnp.float32)
    mm = grid_m[..., None]
    grid_v = jnp.where(mm > 0.0, grid_mv / jnp.where(mm > 0.0, mm, 1.0) + cfg.dt * g, 0.0)
    return out, GridState(mass=grid_m, vel=grid_v)


def frame(
    p: ParticleState,
    cfg: Config,
    domain: Domain,
    mouse_pos,
    mouse_active,
    spec: Optional[StreamSpec] = None,
    substeps: Optional[int] = None,
) -> ParticleState:
    """Full frame on the persistent layout: bin once, run substeps with
    drift-triggered re-bins, un-bin once."""
    if spec is None:
        spec = default_spec(cfg, domain, p.n)
    st = bin_particles(p, domain, spec, dt=cfg.dt)
    st = frame_binned(
        st, cfg, domain, spec, mouse_pos, mouse_active, substeps, n=p.n
    )
    return unbin(st, domain, spec, p.n, p.dim)


def overflow_count(pos: jnp.ndarray, domain: Domain, spec: StreamSpec, vel=None, dt: float = 0.0) -> jnp.ndarray:
    """Particles that would not fit the slot structure (strict-mode check).

    Pass the state's ``vel`` and cfg.dt to check the PREDICTIVE keys the
    frame actually bins with (they coincide when velocities are zero)."""
    tshape, nt = _tile_geometry(domain, spec)
    n = pos.shape[0]
    tid_p = _keys_from_pos(pos, domain, spec, tshape, vel=vel, dt=dt)
    order = jnp.argsort(tid_p)
    sid = jnp.take(tid_p, order)
    ranks = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
    start = jnp.full((nt + 1,), n, jnp.int32)
    start = start.at[sid].min(jnp.where(first, ranks, n))
    start = lax.cummin(start[::-1])[::-1]
    count_t = start[1:] - start[:-1]
    # active budget check mirrors binning: the needed-relay closure must fit
    # A in full — a dropped zero-count shell tile would silently break a
    # halo relay path, so over-budget shell tiles count as overflow too.
    # Ranks mirror _bin_rows' occupied-first ordering.
    occ_p = count_t > 0
    dil = _active_set(occ_p, tshape)
    rank_p = jnp.cumsum(occ_p.astype(jnp.int32)) - 1
    s_rank = ranks - jnp.take(start[:-1], sid)
    a_rank = jnp.take(rank_p, sid)  # occupied tiles rank first
    frozen = (s_rank >= spec.cap) | (a_rank >= spec.A)
    return frozen.sum() + jnp.maximum(0, dil.sum().astype(jnp.int32) - spec.A)
