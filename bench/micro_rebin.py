#!/usr/bin/env python
"""Stage-level profile of the stream re-bin at 3d-1m on TPU.

_rebin_full (measured ~100 ms, 2-3x/frame = ~20% of the 3d-1m frame) is
two row gathers + a sort + O(nt) occupancy work.  This times each stage
jitted in isolation on a REAL mid-frame state (binned, 10 substeps in, so
the drift/occupancy structure is realistic), plus candidate fixes:
  * near-monotonic source gather (sort by old-active-rank instead of tile
    id — v5e row gathers from sequential addresses are ~3x cheaper);
  * slot-fill at narrower active budgets (the [A*cap]-row monotonic gather
    scales with slots, not particles).
Run: python bench/micro_rebin.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import bench as B
from fluid_tpu import step
from fluid_tpu.ops import stream_transfer as stx


def timeit(fn, *args, reps=20):
    out = jax.block_until_ready(fn(*args))
    # value-fetch BEFORE the timed loop: a faulted device makes
    # block_until_ready return garbage timings silently (CLAUDE.md)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / reps


def main():
    import argparse
    import dataclasses

    ap = argparse.ArgumentParser()
    ap.add_argument("--pair", action="store_true", help="tile pairing spec")
    args = ap.parse_args()

    dim, n, frames, batch, bkey, backends = B.CONFIGS["3d-1m"]
    cfg, p, dom = B._make_scene(dim, n, batch)
    spec = B._stream_spec(cfg, dom, n)
    if args.pair:
        spec = dataclasses.replace(spec, pair=True)
        assert stx._use_pair(spec, dim)
    tshape, origin, nt = stx._geom(dom, spec)
    D, cap, G, A, NG = 3, spec.cap, spec.group, spec.A, spec.NG
    pair = stx._use_pair(spec, dim)
    print(f"n={n} nt={nt} A={A} cap={cap} pair={pair}")

    st = jax.block_until_ready(stx.bin_particles(p, dom, spec, dt=cfg.dt))
    # advance 10 substeps for a realistic drifted state
    fb = jax.jit(
        lambda st: stx.frame_binned(
            st, cfg, dom, spec, *step.no_mouse(), substeps=10, n=n
        )
    )
    st = jax.block_until_ready(fb(st))
    print(f"occupied: {int((st.count > 0).sum())}; live {int(st.count.sum())}")

    F = st.stream.shape[1]

    # --- whole re-bin --------------------------------------------------------
    reb = jax.jit(
        lambda st: stx._rebin_full(st, cfg, dom, spec, tshape, nt, n)
    )
    print(f"rebin_full total:   {timeit(reb, st)*1e3:8.2f} ms")

    # --- stages --------------------------------------------------------------
    def flatten(st):
        return stx._stream_flat(st, spec, D)

    flat = jax.block_until_ready(jax.jit(flatten)(st))
    nslot = flat.shape[0]
    print(f"  flatten stream:   {timeit(jax.jit(flatten), st)*1e3:8.2f} ms  ({nslot//1000}k slots)")

    def keys(st):
        src = stx._compact_src(st.count, n, cap, A, pair)
        pos_rows = jnp.stack(
            [st.stream[:, d, :].reshape(-1) for d in range(D)], axis=-1
        )
        vel_rows = jnp.stack(
            [st.stream[:, D + d, :].reshape(-1) for d in range(D)], axis=-1
        )
        tid_slot = stx._keys_from_pos(
            pos_rows, dom, spec, tshape, vel=vel_rows, dt=cfg.dt
        )
        return jnp.take(tid_slot, src), src

    (tid_p, src) = jax.block_until_ready(jax.jit(keys)(st))
    print(f"  keys+compact_src: {timeit(jax.jit(keys), st)*1e3:8.2f} ms")

    order = jax.block_until_ready(jax.jit(jnp.argsort)(tid_p))
    print(f"  argsort [1M]:     {timeit(jax.jit(jnp.argsort), tid_p)*1e3:8.2f} ms")

    sid = jnp.take(tid_p, order)

    def starts(sid):
        return jnp.searchsorted(
            sid, jnp.arange(nt + 2, dtype=sid.dtype), side="left", method="sort"
        )

    print(f"  searchsorted:     {timeit(jax.jit(starts), sid)*1e3:8.2f} ms")
    start = jax.block_until_ready(jax.jit(starts)(sid))
    count_t = (start[1:] - start[:-1])[:nt]

    def occwork(count_t):
        occ_p = count_t > 0
        occ = stx._active_set(occ_p, tshape)
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
        return jnp.where(tid_act < 0, nt, tid_act)

    tid_act = jax.block_until_ready(jax.jit(occwork)(count_t))
    print(f"  occ+rank+dilate:  {timeit(jax.jit(occwork), count_t)*1e3:8.2f} ms")

    perm = jax.block_until_ready(jax.jit(lambda s, o: jnp.take(s, o))(src, order))

    g1 = jax.jit(lambda flat, perm: jnp.take(flat, perm, axis=0))
    srows = jax.block_until_ready(g1(flat, perm))
    print(f"  gather1 [1M,{F}]:  {timeit(g1, flat, perm)*1e3:8.2f} ms  (tile-id order)")

    # near-monotonic variant: how much does source order cost?
    perm_mono = jnp.sort(perm)
    print(f"  gather1 mono:     {timeit(g1, flat, perm_mono)*1e3:8.2f} ms  (sorted perm, bound)")

    count_act = jnp.take(jnp.append(count_t, 0), jnp.clip(tid_act, 0, nt))
    count_act = jnp.minimum(count_act, cap)
    act_start = jnp.take(
        jnp.append(start[:-1], jnp.zeros((1,), start.dtype))[: nt + 1],
        jnp.clip(tid_act, 0, nt),
    )

    if pair:
        def g2p(srows, act_start, count_act):
            s_io = jnp.arange(cap, dtype=jnp.int32)
            c0 = count_act[0::2]
            c1 = count_act[1::2]
            in0 = s_io[None, :] < c0[:, None]
            validp = s_io[None, :] < (c0 + c1)[:, None]
            bidx = jnp.where(
                in0,
                act_start[0::2][:, None] + s_io[None, :],
                act_start[1::2][:, None] + (s_io[None, :] - c0[:, None]),
            )
            slot_rows = jnp.take(
                srows, jnp.clip(bidx, 0, n - 1).ravel(), axis=0
            ).reshape(A // 2, cap, F)
            return jnp.where(validp[..., None], slot_rows, 0.0)

        g2j = jax.jit(g2p)
        slot_rows = jax.block_until_ready(g2j(srows, act_start, count_act))
        print(f"  gather2 [{A//2*cap//1000}k,{F}]:{timeit(g2j, srows, act_start, count_act)*1e3:8.2f} ms  (pair slot fill)")

        def to_stream(slot_rows):
            GP = G // 2
            return (
                slot_rows.reshape(NG, GP, cap, F)
                .transpose(0, 3, 1, 2)
                .reshape(NG, F, GP * cap)
            )

        print(f"  transpose:        {timeit(jax.jit(to_stream), slot_rows)*1e3:8.2f} ms")
    else:
        def g2(srows, act_start, count_act):
            s_io = jnp.arange(cap, dtype=jnp.int32)
            valid = s_io[None, :] < count_act[:, None]
            bidx = act_start[:, None] + s_io[None, :]
            slot_rows = jnp.take(
                srows, jnp.clip(bidx, 0, n - 1).ravel(), axis=0
            ).reshape(A, cap, F)
            return jnp.where(valid[..., None], slot_rows, 0.0)

        g2j = jax.jit(g2)
        slot_rows = jax.block_until_ready(g2j(srows, act_start, count_act))
        print(f"  gather2 [{A*cap//1000}k,{F}]:{timeit(g2j, srows, act_start, count_act)*1e3:8.2f} ms  (slot fill)")

        def to_stream(slot_rows):
            return (
                slot_rows.reshape(NG, G, cap, F).transpose(0, 3, 1, 2).reshape(NG, F, G * cap)
            )

        print(f"  transpose:        {timeit(jax.jit(to_stream), slot_rows)*1e3:8.2f} ms")

    nbrj = jax.jit(lambda t: stx._nbr_table(t, tshape, nt, A))
    print(f"  nbr table:        {timeit(nbrj, tid_act)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
