#!/usr/bin/env python
"""Stage timing of _rebin_full at 3d-1m shapes (round-3, VERDICT #2).

Breaks the 100ms re-bin into: slot flatten+compact-src, elementwise keys,
argsort, tile-sorted row gather, slot-fill gather, counts/dilate/nbr.
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=10):
    out = jax.block_until_ready(fn(*args))
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.ravel()[0])
    return dt


def main():
    import bench as B
    from fluid_tpu import step
    from fluid_tpu.ops import stream_transfer as stx

    cfg, p, dom = B._make_scene(3, 1_000_000)
    spec = B._stream_spec(cfg, dom, 1_000_000)
    tshape, nt = stx._tile_geometry(dom, spec)
    D, n = 3, p.n
    cap, G, A, NG = spec.cap, spec.group, spec.A, spec.NG

    st = jax.block_until_ready(
        jax.jit(stx.bin_particles, static_argnums=(1, 2))(p, dom, spec)
    )
    F = st.stream.shape[1]

    # run a few substeps so some drift exists (realistic mover fraction)
    mp, ma = step.no_mouse()
    sub = jax.jit(functools.partial(
        stx.substep_binned, cfg=cfg, domain=dom, spec=spec,
        mouse_pos=mp, mouse_active=ma))
    for _ in range(6):
        st = sub(st)
    st = jax.block_until_ready(st)

    def flat_fn(stream):
        return stream.reshape(NG, F, G, cap).transpose(0, 2, 3, 1).reshape(A * cap, F)

    t = timeit(jax.jit(flat_fn), st.stream)
    print(f"flatten (transpose):   {t*1e3:8.2f} ms")
    flat = jax.jit(flat_fn)(st.stream)

    t = timeit(jax.jit(lambda c: stx._compact_src(c, n, cap, A)), st.count)
    print(f"compact_src:           {t*1e3:8.2f} ms")
    src = jax.jit(lambda c: stx._compact_src(c, n, cap, A))(st.count)

    def keys_fn(stream, src):
        pos_rows = jnp.stack([stream[:, d, :].reshape(-1) for d in range(D)], axis=-1)
        vel_rows = jnp.stack([stream[:, D + d, :].reshape(-1) for d in range(D)], axis=-1)
        tid_slot = stx._keys_from_pos(pos_rows, dom, spec, tshape, vel=vel_rows, dt=cfg.dt)
        return jnp.take(tid_slot, src)

    t = timeit(jax.jit(keys_fn), st.stream, src)
    print(f"keys (elementwise):    {t*1e3:8.2f} ms")
    tid_p = jax.jit(keys_fn)(st.stream, src)
    moved = int((tid_p != jnp.take(
        jnp.repeat(st.tid, cap, total_repeat_length=A * cap), src)).sum())
    print(f"  movers: {moved}/{n} ({100*moved/n:.2f}%)")

    t = timeit(jax.jit(jnp.argsort), tid_p)
    print(f"argsort:               {t*1e3:8.2f} ms")
    order = jax.jit(jnp.argsort)(tid_p)

    perm = jnp.take(src, order)
    t = timeit(jax.jit(lambda f, q: jnp.take(f, q, axis=0)), flat, perm)
    print(f"sorted row gather:     {t*1e3:8.2f} ms")
    srows = jax.jit(lambda f, q: jnp.take(f, q, axis=0))(flat, perm)

    sid = jnp.take(tid_p, order)

    def fill_fn(srows, sid):
        start = jnp.searchsorted(
            sid, jnp.arange(nt + 2, dtype=sid.dtype), side="left",
            method="scan_unrolled").astype(jnp.int32)
        count_t = (start[1:] - start[:-1])[:nt]
        occ = stx._dilate(count_t > 0, tshape)
        occ_rank = jnp.cumsum(occ.astype(jnp.int32)) - 1
        act_of_tile = jnp.where(occ & (occ_rank < A), occ_rank, A)
        tid_act = jnp.full((A,), -1, jnp.int32)
        tid_act = tid_act.at[jnp.clip(act_of_tile, 0, A - 1)].max(
            jnp.where(act_of_tile < A, jnp.arange(nt, dtype=jnp.int32), -1))
        tid_act = jnp.where(tid_act < 0, nt, tid_act)
        count_act = jnp.take(jnp.append(count_t, 0), jnp.clip(tid_act, 0, nt))
        count_act = jnp.minimum(count_act, cap)
        act_start = jnp.take(start[:-1], jnp.clip(tid_act, 0, nt))
        s_io = jnp.arange(cap, dtype=jnp.int32)
        valid = s_io[None, :] < count_act[:, None]
        bidx = act_start[:, None] + s_io[None, :]
        slot_rows = jnp.take(
            srows, jnp.clip(bidx, 0, n - 1).ravel(), axis=0).reshape(A, cap, F)
        slot_rows = jnp.where(valid[..., None], slot_rows, 0.0)
        return slot_rows.reshape(NG, G, cap, F).transpose(0, 3, 1, 2).reshape(NG, F, G * cap)

    t = timeit(jax.jit(fill_fn), srows, sid)
    print(f"searchsorted+fill:     {t*1e3:8.2f} ms")

    t = timeit(jax.jit(functools.partial(
        stx._rebin_full, cfg=cfg, domain=dom, spec=spec,
        tshape=tshape, nt=nt, n=n)), st)
    print(f"full _rebin_full:      {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
