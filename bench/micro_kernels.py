#!/usr/bin/env python
"""TPU microbenchmarks for the round-2 kernel reformulation.

Probes, on real hardware, the costs that decide the hot-path design:
  * per-program fixed overhead of a tile-grid pallas kernel (DMA-only)
  * window-build cost ([E^D, cap] tensor product) for E in {6, 8}
  * MXU matmul cost vs shape and precision (the N-padding question)
  * current 4-matmul deposit kernel vs the one-window reformulation
    (moment window = W0 * (e_d - lc_d - 1) row fixup)
  * XLA glue at 1M: argsort, stream gather, un-bin, halo_sum

Run: python bench/micro_kernels.py [--cases fixed,window,...] [--n 1000000]
Timings are value-fetch verified (CLAUDE.md).
"""

from __future__ import annotations

import argparse
import functools
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    _fetch(out)
    return dt


def _fetch(out):
    x = jax.tree.leaves(out)[0]
    float(np.asarray(x.ravel()[0]))


# ---------------------------------------------------------------------------
# Synthetic binned scene (3D, matches the 3d-1m bench layout)
# ---------------------------------------------------------------------------


def synth(n, T=4, cap=128, occupancy=64, seed=0):
    """Build a synthetic sorted stream + tile tables like the 1M bench."""
    rng = np.random.default_rng(seed)
    A = n // occupancy
    D = 3
    FP = 2 * D + D * D + 1  # 16
    # tiles laid out along a flat ordering; tshape fake but consistent
    side = max(4, int(round(A ** (1 / 3))) + 1)
    tshape = (side, side, side)
    tid = np.arange(A, dtype=np.int32)
    act_start = (tid * occupancy).astype(np.int32)
    act_count = np.full((A,), occupancy, np.int32)
    # positions inside each tile's world box (origin at tile coords * T)
    tco = np.stack(np.unravel_index(tid, tshape), -1).astype(np.float32) * T
    pos = rng.uniform(0, T, (A, occupancy, 3)).astype(np.float32) + tco[:, None, :]
    pos = pos.reshape(-1, 3)
    vel = rng.normal(0, 0.5, (n, 3)).astype(np.float32)
    C = rng.normal(0, 0.1, (n, 9)).astype(np.float32)
    mass = np.ones((n, 1), np.float32)
    stream = np.concatenate([pos, vel, C, mass], 1)
    stream = np.concatenate([stream, np.zeros((cap, FP), np.float32)], 0)
    stream = np.pad(stream, ((0, 0), (0, 128 - FP)))
    return dict(
        stream=jnp.asarray(stream),
        act_start=jnp.asarray(act_start),
        act_count=jnp.asarray(act_count),
        tid=jnp.asarray(tid),
        tshape=tshape,
        A=A,
        n=n,
        cap=cap,
        T=T,
    )


# ---------------------------------------------------------------------------
# Kernel variants
# ---------------------------------------------------------------------------


def _pipelined_load(stream_ref, part_ref, sem, start_ref, cap):
    t = pl.program_id(0)
    nT = pl.num_programs(0)

    def dma(i, slot):
        return pltpu.make_async_copy(
            stream_ref.at[pl.ds(start_ref[i], cap), :], part_ref.at[slot], sem.at[slot]
        )

    @pl.when(t == 0)
    def _():
        dma(0, 0).start()

    @pl.when(t + 1 < nT)
    def _():
        dma(t + 1, (t + 1) % 2).start()

    dma(t, t % 2).wait()
    return part_ref[t % 2]


def _case_kernel(body, data, out_ch, *, E, interpret=False):
    """Common harness: per-tile stream DMA + body -> jitted fn over arrays."""
    A, cap = data["A"], data["cap"]
    FPI = data["stream"].shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(A,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, E**3, out_ch), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, cap, FPI), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def kernel(start_ref, count_ref, tid_ref, stream_ref, out_ref, part_ref, sem):
        pm = _pipelined_load(stream_ref, part_ref, sem, start_ref, cap).T
        out_ref[0] = body(pm, count_ref[pl.program_id(0)], tid_ref[pl.program_id(0)])

    @jax.jit
    def fn(act_start, act_count, tid, stream):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((A, E**3, out_ch), jnp.float32),
            interpret=interpret,
        )(act_start, act_count, tid, stream)

    return fn


def _profiles(pm, T, E, tshape, cap):
    """Per-axis plain profiles [E, cap] + local cell lc [3][cap] + dvec."""
    plains, lcs, dvec = [], [], []
    t = pl.program_id(0)
    # tile origin via flat tid arithmetic (static tshape)
    for d in range(3):
        pos_d = pm[d, :]
        cell = jnp.floor(pos_d)
        div = 1
        for k in range(d + 1, 3):
            div *= tshape[k]
        # tid == program id in synth data; use iota-free arithmetic
        coord = (t // div) % tshape[d]
        lc = jnp.clip(cell.astype(jnp.int32) - coord * T, -(E - T - 2), T - 1 + (E - T - 2))
        dv = pos_d - cell - 0.5
        w = [0.5 * (0.5 - dv) ** 2, 0.75 - dv * dv, 0.5 * (0.5 + dv) ** 2]
        e_io = lax.broadcasted_iota(jnp.int32, (E, cap), 0)
        plain = jnp.zeros((E, cap), jnp.float32)
        base = lc + (E - T - 2)  # shift so min lc maps to row 0
        for o in range(3):
            plain = jnp.where(e_io == base[None, :] + o, w[o][None, :], plain)
        plains.append(plain)
        lcs.append(base)
        dvec.append(dv)
    return plains, lcs, dvec


def _window(plains, E, cap):
    w01 = (plains[0][:, None, :] * plains[1][None, :, :]).reshape(E * E, cap)
    return (w01[:, None, :] * plains[2][None, :, :]).reshape(E**3, cap)


def _rows(vecs, cap):
    n = len(vecs)
    rid = lax.broadcasted_iota(jnp.int32, (n, cap), 0)
    out = jnp.zeros((n, cap), jnp.float32)
    for i, v in enumerate(vecs):
        out = jnp.where(rid == i, v[None, :], out)
    return out


def case_dma_only(data, E=6, prec=None):
    """Fixed overhead: DMA + trivial write."""

    def body(pm, count, tid):
        return jnp.zeros((E**3, 8), jnp.float32) + pm[0, 0]

    return _case_kernel(body, data, 8, E=E)


def case_window_build(data, E=6, prec="highest"):
    """W0 build + cheap reduce (no matmul)."""

    def body(pm, count, tid):
        plains, lcs, dvec = _profiles(pm, data["T"], E, data["tshape"], data["cap"])
        W0 = _window(plains, E, data["cap"])
        return jnp.sum(W0, axis=1, keepdims=True) * jnp.ones((1, 8), jnp.float32)

    return _case_kernel(body, data, 8, E=E)


def _precision(prec):
    return {
        "default": lax.Precision.DEFAULT,
        "high": lax.Precision.HIGH,
        "highest": lax.Precision.HIGHEST,
    }[prec]


def case_matmul(data, E=6, N=16, prec="highest"):
    """W0 build + one [E^3, cap] @ [cap, N] matmul."""
    cap = data["cap"]

    def body(pm, count, tid):
        plains, lcs, dvec = _profiles(pm, data["T"], E, data["tshape"], cap)
        W0 = _window(plains, E, cap)
        V = pm[:N, :] if N <= 128 else None
        return lax.dot_general(
            W0, V, (((1,), (1,)), ((), ())),
            precision=_precision(prec), preferred_element_type=jnp.float32,
        )

    return _case_kernel(body, data, N, E=E)


def case_deposit_current(data, E=6, prec="highest"):
    """Round-1 formulation: 4 window builds + 4 matmuls (p2g1)."""
    cap, T, tshape = data["cap"], data["T"], data["tshape"]
    D = 3

    def body(pm, count, tid):
        valid = lax.broadcasted_iota(jnp.int32, (1, cap), 1)[0] < count
        plains, moments, dvec = [], [], []
        t = pl.program_id(0)
        for d in range(D):
            pos_d = pm[d, :]
            cell = jnp.floor(pos_d)
            div = 1
            for k in range(d + 1, 3):
                div *= tshape[k]
            coord = (t // div) % tshape[d]
            lc = jnp.clip(cell.astype(jnp.int32) - coord * T, 0, T - 1)
            dv = pos_d - cell - 0.5
            w = [0.5 * (0.5 - dv) ** 2, 0.75 - dv * dv, 0.5 * (0.5 + dv) ** 2]
            e_io = lax.broadcasted_iota(jnp.int32, (E, cap), 0)
            plain = jnp.zeros((E, cap), jnp.float32)
            momnt = jnp.zeros((E, cap), jnp.float32)
            for o in range(3):
                eq = e_io == lc[None, :] + o
                plain = jnp.where(eq, w[o][None, :], plain)
                momnt = jnp.where(eq, w[o][None, :] * (o - 1.0), momnt)
            plains.append(plain)
            moments.append(momnt)
            dvec.append(dv)
        vf = valid.astype(jnp.float32)[None, :]
        W0 = _window(plains, E, cap) * vf
        Wv = []
        for d in range(D):
            profs = [moments[i] if i == d else plains[i] for i in range(D)]
            Wv.append(_window(profs, E, cap) * vf)
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
        pr = _precision(prec)

        def dot(a, b):
            return lax.dot_general(
                a, b, (((1,), (1,)), ((), ())), precision=pr,
                preferred_element_type=jnp.float32,
            )

        block = dot(W0, _rows([mass] + Aval, cap))
        for d in range(D):
            Vd = _rows([zero] + [mass * Cm[i][d] for i in range(D)], cap)
            block = block + dot(Wv[d], Vd)
        return block

    return _case_kernel(body, data, 4, E=E)


def case_deposit_onewindow(data, E=6, prec="highest"):
    """One-window reformulation: 1 build + 1 matmul + row fixups."""
    cap, T, tshape = data["cap"], data["T"], data["tshape"]
    D = 3

    def body(pm, count, tid):
        valid = lax.broadcasted_iota(jnp.int32, (1, cap), 1)[0] < count
        plains, lcs, dvec = _profiles(pm, T, E, tshape, cap)
        vf = valid.astype(jnp.float32)[None, :]
        W0 = _window(plains, E, cap) * vf

        vel = [pm[D + d, :] for d in range(D)]
        Cm = [[pm[2 * D + i * D + j, :] for j in range(D)] for i in range(D)]
        mass = jnp.where(valid, pm[2 * D + D * D, :], 0.0)
        Aval = []
        for i in range(D):
            cd = Cm[i][0] * dvec[0]
            for j in range(1, D):
                cd = cd + Cm[i][j] * dvec[j]
            Aval.append(mass * (vel[i] - cd))
        # V0 rows: [mass, A0, A1, A2]; Vd rows: [0, m*C[:,d]...]
        # U0 = V0 - sum_d (lc_d + 1) * Vd  (zero mass row unaffected)
        lcf = [l.astype(jnp.float32) + 1.0 for l in lcs]
        U0 = [mass]
        for i in range(D):
            acc = Aval[i]
            for d in range(D):
                acc = acc - lcf[d] * (mass * Cm[i][d])
            U0.append(acc)
        Ucat = U0[:]
        for d in range(D):
            Ucat += [jnp.zeros_like(mass)] + [mass * Cm[i][d] for i in range(D)]
        V = _rows(Ucat, cap)  # [(1+D)*4, cap]
        Y = lax.dot_general(
            W0, V, (((1,), (1,)), ((), ())),
            precision=_precision(prec), preferred_element_type=jnp.float32,
        )  # [E^3, 16]
        # block = Y0 + sum_d e_d * Y_{d+1}
        r = lax.broadcasted_iota(jnp.int32, (E**3, 4), 0)
        e0 = (r // (E * E)).astype(jnp.float32)
        e1 = ((r // E) % E).astype(jnp.float32)
        e2 = (r % E).astype(jnp.float32)
        block = Y[:, 0:4] + e0 * Y[:, 4:8] + e1 * Y[:, 8:12] + e2 * Y[:, 12:16]
        return block

    return _case_kernel(body, data, 4, E=E)


def case_nodma(data, E=6):
    """Dispatch-only: no stream DMA at all."""
    A, cap = data["A"], data["cap"]

    def kernel(start_ref, count_ref, tid_ref, stream_ref, out_ref):
        out_ref[0] = jnp.full((E**3, 8), 1.0 * pl.program_id(0), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(A,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, E**3, 8), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
    )

    @jax.jit
    def fn(act_start, act_count, tid, stream):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((A, E**3, 8), jnp.float32),
        )(act_start, act_count, tid, stream)

    return fn


def _tb_kernel(body, data, out_ch, *, E, TB):
    """TB tiles per program: ONE [TB*cap, 128] DMA + loop over sub-tiles."""
    A, cap = data["A"], data["cap"]
    FPI = data["stream"].shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(A // TB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (TB, E**3, out_ch), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, TB * cap, FPI), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def kernel(start_ref, count_ref, tid_ref, stream_ref, out_ref, part_ref, sem):
        t = pl.program_id(0)
        nT = pl.num_programs(0)

        def dma(i, slot):
            return pltpu.make_async_copy(
                stream_ref.at[pl.ds(start_ref[i * TB], TB * cap), :],
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
        buf = part_ref[t % 2]
        for j in range(TB):
            pm = buf[j * cap : (j + 1) * cap, :].T
            out_ref[j] = body(pm, count_ref[t * TB + j], tid_ref[t * TB + j])

    @jax.jit
    def fn(act_start, act_count, tid, stream):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((A, E**3, out_ch), jnp.float32),
        )(act_start, act_count, tid, stream)

    return fn


def case_dma_tb(data, TB=4, E=6):
    def body(pm, count, tid):
        return jnp.zeros((E**3, 8), jnp.float32) + pm[0, 0]

    return _tb_kernel(body, data, 8, E=E, TB=TB)


def _onewindow_body(data, E, prec):
    cap, T, tshape = data["cap"], data["T"], data["tshape"]
    D = 3

    def body(pm, count, tid):
        valid = lax.broadcasted_iota(jnp.int32, (1, cap), 1)[0] < count
        plains, lcs, dvec = [], [], []
        for d in range(D):
            pos_d = pm[d, :]
            cell = jnp.floor(pos_d)
            div = 1
            for k in range(d + 1, 3):
                div *= tshape[k]
            coord = (tid // div) % tshape[d]
            lc = jnp.clip(cell.astype(jnp.int32) - coord * T, -(E - T - 2) , T - 1 + (E - T - 2))
            dv = pos_d - cell - 0.5
            w = [0.5 * (0.5 - dv) ** 2, 0.75 - dv * dv, 0.5 * (0.5 + dv) ** 2]
            e_io = lax.broadcasted_iota(jnp.int32, (E, cap), 0)
            plain = jnp.zeros((E, cap), jnp.float32)
            base = lc + (E - T - 2)
            for o in range(3):
                plain = jnp.where(e_io == base[None, :] + o, w[o][None, :], plain)
            plains.append(plain)
            lcs.append(base)
            dvec.append(dv)
        vf = valid.astype(jnp.float32)[None, :]
        W0 = _window(plains, E, cap) * vf
        vel = [pm[D + d, :] for d in range(D)]
        Cm = [[pm[2 * D + i * D + j, :] for j in range(D)] for i in range(D)]
        mass = jnp.where(valid, pm[2 * D + D * D, :], 0.0)
        Aval = []
        for i in range(D):
            cd = Cm[i][0] * dvec[0]
            for j in range(1, D):
                cd = cd + Cm[i][j] * dvec[j]
            Aval.append(mass * (vel[i] - cd))
        lcf = [l.astype(jnp.float32) + 1.0 for l in lcs]
        U0 = [mass]
        for i in range(D):
            acc = Aval[i]
            for d in range(D):
                acc = acc - lcf[d] * (mass * Cm[i][d])
            U0.append(acc)
        Ucat = U0[:]
        for d in range(D):
            Ucat += [jnp.zeros_like(mass)] + [mass * Cm[i][d] for i in range(D)]
        V = _rows(Ucat, cap)
        Y = lax.dot_general(
            W0, V, (((1,), (1,)), ((), ())),
            precision=_precision(prec), preferred_element_type=jnp.float32,
        )
        r = lax.broadcasted_iota(jnp.int32, (E**3, 4), 0)
        e0 = (r // (E * E)).astype(jnp.float32)
        e1 = ((r // E) % E).astype(jnp.float32)
        e2 = (r % E).astype(jnp.float32)
        return Y[:, 0:4] + e0 * Y[:, 4:8] + e1 * Y[:, 8:12] + e2 * Y[:, 12:16]

    return body


def case_deposit_onewindow_tb(data, TB=4, E=6, prec="highest"):
    return _tb_kernel(_onewindow_body(data, E, prec), data, 4, E=E, TB=TB)


# ---------------------------------------------------------------------------
# Slot-major field-major stream variants (the round-2 persistent layout):
# stream [F, A*cap] f32; tile t owns lanes [t*cap, (t+1)*cap); BlockSpec
# auto-pipelining (no manual DMA, no scalar-prefetched starts).
# ---------------------------------------------------------------------------


def synth_slotmajor(n, T=4, cap=128, occupancy=64, seed=0, F=16):
    rng = np.random.default_rng(seed)
    A = n // occupancy
    side = max(4, int(round(A ** (1 / 3))) + 1)
    tshape = (side, side, side)
    tid = np.arange(A, dtype=np.int32)
    tco = np.stack(np.unravel_index(tid, tshape), -1).astype(np.float32) * T
    pos = rng.uniform(0, T, (A, cap, 3)).astype(np.float32) + tco[:, None, :]
    vel = rng.normal(0, 0.5, (A, cap, 3)).astype(np.float32)
    C = rng.normal(0, 0.1, (A, cap, 9)).astype(np.float32)
    mass = np.ones((A, cap, 1), np.float32)
    st = np.concatenate([pos, vel, C, mass], -1)  # [A, cap, 16]
    stream = np.ascontiguousarray(st.reshape(A * cap, F).T)  # [F, A*cap]
    count = np.full((A,), occupancy, np.int32)
    return dict(
        stream=jnp.asarray(stream), count=jnp.asarray(count),
        tshape=tshape, A=A, n=n, cap=cap, T=T, F=F,
    )


def _tb2_kernel(body, data, out_ch, *, E, TB, out_rows=None):
    """TB tiles/program, auto-pipelined field-major stream blocks."""
    A, cap, F = data["A"], data["cap"], data["F"]
    out_rows = out_rows or E**3

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # per-tile counts
        grid=(A // TB,),
        in_specs=[
            pl.BlockSpec(
                (F, TB * cap), lambda t, *_: (0, t), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (TB, out_rows, out_ch), lambda t, *_: (t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    def kernel(count_ref, stream_ref, out_ref):
        t = pl.program_id(0)
        for j in range(TB):
            pm = stream_ref[:, j * cap : (j + 1) * cap]
            out_ref[j] = body(pm, count_ref[t * TB + j], t * TB + j)

    @jax.jit
    def fn(count, stream):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((A, out_rows, out_ch), jnp.float32),
        )(count, stream)

    return fn


def case_tb2_dma(data, TB=8, E=6):
    def body(pm, count, tid):
        return jnp.zeros((E**3, 8), jnp.float32) + pm[0, 0]

    return _tb2_kernel(body, data, 8, E=E, TB=TB)


def case_tb2_deposit(data, TB=8, E=6, prec="highest", fixup="kernel"):
    """One-window deposit on the slot-major layout.

    fixup="kernel": emit [E^3, 4] blocks (row fixup in-kernel)
    fixup="xla":    emit raw [E^3, 16] Y (fold in XLA over all tiles)
    """
    cap, T, tshape = data["cap"], data["T"], data["tshape"]
    D = 3
    base_body = _onewindow_body_slotmajor(data, E, prec, fixup)
    ch = 4 if fixup == "kernel" else 16
    return _tb2_kernel(base_body, data, ch, E=E, TB=TB)


def _onewindow_body_slotmajor(data, E, prec, fixup="kernel"):
    cap, T, tshape = data["cap"], data["T"], data["tshape"]
    D = 3

    def body(pm, count, tid):
        valid = lax.broadcasted_iota(jnp.int32, (1, cap), 1)[0] < count
        plains, lcs, dvec = [], [], []
        for d in range(D):
            pos_d = pm[d, :]
            cell = jnp.floor(pos_d)
            div = 1
            for k in range(d + 1, 3):
                div *= tshape[k]
            coord = (tid // div) % tshape[d]
            lc = jnp.clip(
                cell.astype(jnp.int32) - coord * T,
                -(E - T - 2), T - 1 + (E - T - 2),
            )
            dv = pos_d - cell - 0.5
            w = [0.5 * (0.5 - dv) ** 2, 0.75 - dv * dv, 0.5 * (0.5 + dv) ** 2]
            e_io = lax.broadcasted_iota(jnp.int32, (E, cap), 0)
            plain = jnp.zeros((E, cap), jnp.float32)
            base = lc + (E - T - 2)
            for o in range(3):
                plain = jnp.where(e_io == base[None, :] + o, w[o][None, :], plain)
            plains.append(plain)
            lcs.append(base)
            dvec.append(dv)
        vf = valid.astype(jnp.float32)[None, :]
        W0 = _window(plains, E, cap) * vf
        vel = [pm[D + d, :] for d in range(D)]
        Cm = [[pm[2 * D + i * D + j, :] for j in range(D)] for i in range(D)]
        mass = jnp.where(valid, pm[2 * D + D * D, :], 0.0)
        Aval = []
        for i in range(D):
            cd = Cm[i][0] * dvec[0]
            for j in range(1, D):
                cd = cd + Cm[i][j] * dvec[j]
            Aval.append(mass * (vel[i] - cd))
        lcf = [l.astype(jnp.float32) + 1.0 for l in lcs]
        U0 = [mass]
        for i in range(D):
            acc = Aval[i]
            for d in range(D):
                acc = acc - lcf[d] * (mass * Cm[i][d])
            U0.append(acc)
        Ucat = U0[:]
        for d in range(D):
            Ucat += [jnp.zeros_like(mass)] + [mass * Cm[i][d] for i in range(D)]
        V = _rows(Ucat, cap)
        Y = lax.dot_general(
            W0, V, (((1,), (1,)), ((), ())),
            precision=_precision(prec), preferred_element_type=jnp.float32,
        )
        if fixup == "xla":
            return Y
        r = lax.broadcasted_iota(jnp.int32, (E**3, 4), 0)
        e0 = (r // (E * E)).astype(jnp.float32)
        e1 = ((r // E) % E).astype(jnp.float32)
        e2 = (r % E).astype(jnp.float32)
        return Y[:, 0:4] + e0 * Y[:, 4:8] + e1 * Y[:, 8:12] + e2 * Y[:, 12:16]

    return body


def case_tb2_collect(data, TB=8, E=6, prec="highest"):
    """Collect-direction matmul + particle-tail-sized VPU work + stream out."""
    cap, T, tshape = data["cap"], data["T"], data["tshape"]
    D = 3
    FO = 2 * D + D * D + 3  # 18

    A = data["A"]
    F = data["F"]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(A // TB,),
        in_specs=[
            pl.BlockSpec((F, TB * cap), lambda t, *_: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, E**3, D), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, E**3, 1), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (FO, TB * cap), lambda t, *_: (0, t), memory_space=pltpu.VMEM
        ),
    )

    def kernel(count_ref, stream_ref, vblk_ref, mblk_ref, out_ref):
        t = pl.program_id(0)
        for j in range(TB):
            pm = stream_ref[:, j * cap : (j + 1) * cap]
            tid = t * TB + j
            plains, lcs, dvec = [], [], []
            for d in range(D):
                pos_d = pm[d, :]
                cell = jnp.floor(pos_d)
                div = 1
                for k in range(d + 1, 3):
                    div *= tshape[k]
                coord = (tid // div) % tshape[d]
                lc = jnp.clip(
                    cell.astype(jnp.int32) - coord * T,
                    -(E - T - 2), T - 1 + (E - T - 2),
                )
                dv = pos_d - cell - 0.5
                w = [0.5 * (0.5 - dv) ** 2, 0.75 - dv * dv, 0.5 * (0.5 + dv) ** 2]
                e_io = lax.broadcasted_iota(jnp.int32, (E, cap), 0)
                plain = jnp.zeros((E, cap), jnp.float32)
                base = lc + (E - T - 2)
                for o in range(3):
                    plain = jnp.where(e_io == base[None, :] + o, w[o][None, :], plain)
                plains.append(plain)
                lcs.append(base)
                dvec.append(dv)
            W0 = _window(plains, E, cap)
            vblk = vblk_ref[j]  # [E^3, D]
            mblk = mblk_ref[j]  # [E^3, 1]
            r = lax.broadcasted_iota(jnp.int32, (E**3, D), 0)
            e0 = (r // (E * E)).astype(jnp.float32)
            e1 = ((r // E) % E).astype(jnp.float32)
            e2 = (r % E).astype(jnp.float32)
            Bcat_parts = [vblk, e0 * vblk, e1 * vblk, e2 * vblk]
            # [E^3, 4D+1]
            Bcat = jnp.concatenate(Bcat_parts + [mblk], axis=1)
            X = lax.dot_general(
                W0, Bcat, (((0,), (0,)), ((), ())),
                precision=_precision(prec), preferred_element_type=jnp.float32,
            )  # [cap, 4D+1]
            v = [X[:, i] for i in range(D)]
            lcf = [l.astype(jnp.float32) + 1.0 for l in lcs]
            newC = []
            for dd in range(D):
                for i in range(D):
                    Md = X[:, D * (dd + 1) + i] - lcf[dd] * v[i]
                    newC.append(4.0 * (v[i] * (-dvec[dd]) + Md))
            rho = X[:, 4 * D]
            newpos = [pm[d, :] + v[d] * 0.066 for d in range(D)]
            prs = jnp.maximum(-0.1, 10.0 * ((rho / 1.0) ** 4 - 1.0))
            rows = newpos + v + newC + [rho, prs, pm[2 * D + D * D, :]]
            out_ref[:, j * cap : (j + 1) * cap] = _rows(rows, cap)

    @jax.jit
    def fn(count, stream, vblk, mblk):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((FO, A * cap), jnp.float32),
        )(count, stream, vblk, mblk)

    return fn


def run_tb2(args):
    data = synth_slotmajor(args.n)
    A, cap = data["A"], data["cap"]
    print(f"# slot-major: A={A} tiles, {A*cap} slots", file=sys.stderr)
    cases = [
        ("tb2_dma_tb8", case_tb2_dma(data, TB=8), 2),
        ("tb2_dep_tb4_E6", case_tb2_deposit(data, TB=4, E=6), 2),
        ("tb2_dep_tb8_E6", case_tb2_deposit(data, TB=8, E=6), 2),
        ("tb2_dep_tb8_E6_xlafix", case_tb2_deposit(data, TB=8, E=6, fixup="xla"), 2),
        ("tb2_dep_tb16_E6", case_tb2_deposit(data, TB=16, E=6), 2),
        ("tb2_dep_tb8_E8", case_tb2_deposit(data, TB=8, E=8), 2),
        ("tb2_dep_tb8_E6_default", case_tb2_deposit(data, TB=8, E=6, prec="default"), 2),
    ]
    for name, fn, nargs in cases:
        try:
            dt = timeit(fn, data["count"], data["stream"], iters=args.iters)
            print(f"{name:32s} {dt*1e3:9.3f} ms   {dt/A*1e9:8.1f} ns/tile")
        except Exception as e:  # noqa: BLE001
            print(f"{name:32s} FAILED: {type(e).__name__}: {e}")
    # collect case needs extra block args
    rng = np.random.default_rng(1)
    for E in (6, 8):
        vblk = jnp.asarray(rng.normal(size=(A, E**3, 3)).astype(np.float32))
        mblk = jnp.asarray(rng.uniform(0.5, 2.0, (A, E**3, 1)).astype(np.float32))
        try:
            fn = case_tb2_collect(data, TB=8, E=E)
            dt = timeit(fn, data["count"], data["stream"], vblk, mblk, iters=args.iters)
            print(f"tb2_collect_tb8_E{E:<18d} {dt*1e3:9.3f} ms   {dt/A*1e9:8.1f} ns/tile")
        except Exception as e:  # noqa: BLE001
            print(f"tb2_collect_tb8_E{E} FAILED: {type(e).__name__}: {e}")


# ---------------------------------------------------------------------------
# tb3: contiguous per-tile blocks [A, F, cap] (HBM-contiguous block DMA)
# and the fully transposed collect (no in-kernel relayouts).
# ---------------------------------------------------------------------------


def synth_blocks(n, T=4, cap=128, occupancy=64, seed=0, F=16):
    rng = np.random.default_rng(seed)
    A = n // occupancy
    side = max(4, int(round(A ** (1 / 3))) + 1)
    tshape = (side, side, side)
    tid = np.arange(A, dtype=np.int32)
    tco = np.stack(np.unravel_index(tid, tshape), -1).astype(np.float32) * T
    pos = rng.uniform(0, T, (A, cap, 3)).astype(np.float32) + tco[:, None, :]
    vel = rng.normal(0, 0.5, (A, cap, 3)).astype(np.float32)
    C = rng.normal(0, 0.1, (A, cap, 9)).astype(np.float32)
    mass = np.ones((A, cap, 1), np.float32)
    st = np.concatenate([pos, vel, C, mass], -1)  # [A, cap, F]
    stream = np.ascontiguousarray(np.swapaxes(st, 1, 2))  # [A, F, cap]
    count = np.full((A,), occupancy, np.int32)
    return dict(
        stream=jnp.asarray(stream), count=jnp.asarray(count),
        tshape=tshape, A=A, n=n, cap=cap, T=T, F=F,
    )


def _tb3_deposit(data, TB=8, E=6, prec="highest"):
    A, cap, F = data["A"], data["cap"], data["F"]
    body = _onewindow_body_slotmajor(data, E, prec, "kernel")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(A // TB,),
        in_specs=[
            pl.BlockSpec((TB, F, cap), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (TB, E**3, 4), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
    )

    def kernel(count_ref, stream_ref, out_ref):
        t = pl.program_id(0)
        for j in range(TB):
            out_ref[j] = body(stream_ref[j], count_ref[t * TB + j], t * TB + j)

    @jax.jit
    def fn(count, stream):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((A, E**3, 4), jnp.float32),
        )(count, stream)

    return fn


def _tb3_dma(data, TB=8, E=6):
    A, cap, F = data["A"], data["cap"], data["F"]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(A // TB,),
        in_specs=[
            pl.BlockSpec((TB, F, cap), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (TB, E**3, 4), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
    )

    def kernel(count_ref, stream_ref, out_ref):
        for j in range(TB):
            out_ref[j] = jnp.zeros((E**3, 4), jnp.float32) + stream_ref[j, 0, 0]

    @jax.jit
    def fn(count, stream):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((A, E**3, 4), jnp.float32),
        )(count, stream)

    return fn


def _tb3_collect(data, TB=8, E=6, prec="highest"):
    """Transposed collect: X = BcatT [13, E^3] @ W0 [E^3, cap] -> [13, cap].

    vblk arrives TRANSPOSED [A, D, E^3]; mblk [A, 1, E^3].  All in-kernel
    arrays keep cap or E^3 in lanes — no relayouts.
    """
    A, cap, F = data["A"], data["cap"], data["F"]
    T, tshape = data["T"], data["tshape"]
    D = 3
    FO = 2 * D + D * D + 3

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(A // TB,),
        in_specs=[
            pl.BlockSpec((TB, F, cap), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, D, E**3), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1, E**3), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TB, FO, cap), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
    )

    def kernel(count_ref, stream_ref, vblk_ref, mblk_ref, out_ref):
        t = pl.program_id(0)
        for j in range(TB):
            pm = stream_ref[j]
            tid = t * TB + j
            plains, lcs, dvec = [], [], []
            for d in range(D):
                pos_d = pm[d, :]
                cell = jnp.floor(pos_d)
                div = 1
                for k in range(d + 1, 3):
                    div *= tshape[k]
                coord = (tid // div) % tshape[d]
                lc = jnp.clip(
                    cell.astype(jnp.int32) - coord * T,
                    -(E - T - 2), T - 1 + (E - T - 2),
                )
                dv = pos_d - cell - 0.5
                w = [0.5 * (0.5 - dv) ** 2, 0.75 - dv * dv, 0.5 * (0.5 + dv) ** 2]
                e_io = lax.broadcasted_iota(jnp.int32, (E, cap), 0)
                plain = jnp.zeros((E, cap), jnp.float32)
                base = lc + (E - T - 2)
                for o in range(3):
                    plain = jnp.where(e_io == base[None, :] + o, w[o][None, :], plain)
                plains.append(plain)
                lcs.append(base)
                dvec.append(dv)
            W0 = _window(plains, E, cap)  # [E^3, cap]
            vT = vblk_ref[j]  # [D, E^3]
            mT = mblk_ref[j]  # [1, E^3]
            # lane-iota e_d coefficients [1, E^3]
            l_io = lax.broadcasted_iota(jnp.int32, (1, E**3), 1)
            e0 = (l_io // (E * E)).astype(jnp.float32)
            e1 = ((l_io // E) % E).astype(jnp.float32)
            e2 = (l_io % E).astype(jnp.float32)
            # BcatT rows: v(3), e0*v(3), e1*v(3), e2*v(3), m(1) -> [13, E^3]
            rid = lax.broadcasted_iota(jnp.int32, (4 * D + 1, E**3), 0)
            Bcat = jnp.zeros((4 * D + 1, E**3), jnp.float32)
            for i in range(D):
                Bcat = jnp.where(rid == i, vT[i][None, :], Bcat)
                Bcat = jnp.where(rid == D + i, (e0 * vT[i][None, :]), Bcat)
                Bcat = jnp.where(rid == 2 * D + i, (e1 * vT[i][None, :]), Bcat)
                Bcat = jnp.where(rid == 3 * D + i, (e2 * vT[i][None, :]), Bcat)
            Bcat = jnp.where(rid == 4 * D, mT, Bcat)
            X = lax.dot_general(
                Bcat, W0, (((1,), (0,)), ((), ())),
                precision=_precision(prec), preferred_element_type=jnp.float32,
            )  # [13, cap]
            v = [X[i] for i in range(D)]
            lcf = [l.astype(jnp.float32) + 1.0 for l in lcs]
            newC = []
            for dd in range(D):
                for i in range(D):
                    Md = X[D * (dd + 1) + i] - lcf[dd] * v[i]
                    newC.append(4.0 * (v[i] * (-dvec[dd]) + Md))
            rho = X[4 * D]
            newpos = [pm[d, :] + v[d] * 0.066 for d in range(D)]
            prs = jnp.maximum(-0.1, 10.0 * ((rho / 1.0) ** 4 - 1.0))
            rows = newpos + v + newC + [rho, prs, pm[2 * D + D * D, :]]
            out_ref[j] = _rows(rows, cap)

    @jax.jit
    def fn(count, stream, vblk, mblk):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((A, FO, cap), jnp.float32),
        )(count, stream, vblk, mblk)

    return fn


def run_tb3(args):
    data = synth_blocks(args.n)
    A, cap = data["A"], data["cap"]
    print(f"# block layout: A={A} tiles, [A,16,{cap}] stream", file=sys.stderr)
    for name, fn in [
        ("tb3_dma_tb8", _tb3_dma(data, TB=8)),
        ("tb3_dep_tb8_E6", _tb3_deposit(data, TB=8, E=6)),
        ("tb3_dep_tb16_E6", _tb3_deposit(data, TB=16, E=6)),
        ("tb3_dep_tb8_E8", _tb3_deposit(data, TB=8, E=8)),
    ]:
        try:
            dt = timeit(fn, data["count"], data["stream"], iters=args.iters)
            print(f"{name:32s} {dt*1e3:9.3f} ms   {dt/A*1e9:8.1f} ns/tile")
        except Exception as e:  # noqa: BLE001
            print(f"{name:32s} FAILED: {type(e).__name__}: {e}")
    rng = np.random.default_rng(1)
    for E in (6, 8):
        vblk = jnp.asarray(rng.normal(size=(A, 3, E**3)).astype(np.float32))
        mblk = jnp.asarray(rng.uniform(0.5, 2.0, (A, 1, E**3)).astype(np.float32))
        try:
            fn = _tb3_collect(data, TB=8, E=E)
            dt = timeit(fn, data["count"], data["stream"], vblk, mblk, iters=args.iters)
            print(f"tb3_collect_tb8_E{E:<15d} {dt*1e3:9.3f} ms   {dt/A*1e9:8.1f} ns/tile")
        except Exception as e:  # noqa: BLE001
            print(f"tb3_collect_tb8_E{E} FAILED: {type(e).__name__}: {e}")


# ---------------------------------------------------------------------------
# tb4: grouped-lane layout — G tiles per program, every HBM block is a few
# FAT rows: stream [NG, F, G*cap], deposit out [NG, CH, G*EP], grid blocks
# [NG, 4, G*EP].  Motivated by tb3: per-row DMA cost dominates; [216, 4]
# blocks decompose into 1728 tiny rows/program while [18, 128*G] is 18.
# ---------------------------------------------------------------------------


def synth_grouped(n, T=4, cap=128, occupancy=64, seed=0, F=16, G=8):
    rng = np.random.default_rng(seed)
    A = n // occupancy
    A = (A // G) * G
    NG = A // G
    side = max(4, int(round(A ** (1 / 3))) + 1)
    tshape = (side, side, side)
    tid = np.arange(A, dtype=np.int32)
    tco = np.stack(np.unravel_index(tid, tshape), -1).astype(np.float32) * T
    pos = rng.uniform(0, T, (A, cap, 3)).astype(np.float32) + tco[:, None, :]
    vel = rng.normal(0, 0.5, (A, cap, 3)).astype(np.float32)
    C = rng.normal(0, 0.1, (A, cap, 9)).astype(np.float32)
    mass = np.ones((A, cap, 1), np.float32)
    st = np.concatenate([pos, vel, C, mass], -1)  # [A, cap, F]
    st = np.swapaxes(st, 1, 2)  # [A, F, cap]
    stream = np.ascontiguousarray(
        st.reshape(NG, G, F, cap).transpose(0, 2, 1, 3).reshape(NG, F, G * cap)
    )
    count = np.full((A,), occupancy, np.int32)
    return dict(
        stream=jnp.asarray(stream), count=jnp.asarray(count),
        tshape=tshape, A=A, NG=NG, G=G, n=n, cap=cap, T=T, F=F,
    )


def _grouped_profiles(pm, tid, T, E, tshape, cap):
    D = 3
    plains, lcs, dvec = [], [], []
    for d in range(D):
        pos_d = pm[d, :]
        cell = jnp.floor(pos_d)
        div = 1
        for k in range(d + 1, 3):
            div *= tshape[k]
        coord = (tid // div) % tshape[d]
        lc = jnp.clip(
            cell.astype(jnp.int32) - coord * T,
            -(E - T - 2), T - 1 + (E - T - 2),
        )
        dv = pos_d - cell - 0.5
        w = [0.5 * (0.5 - dv) ** 2, 0.75 - dv * dv, 0.5 * (0.5 + dv) ** 2]
        e_io = lax.broadcasted_iota(jnp.int32, (E, cap), 0)
        plain = jnp.zeros((E, cap), jnp.float32)
        base = lc + (E - T - 2)
        for o in range(3):
            plain = jnp.where(e_io == base[None, :] + o, w[o][None, :], plain)
        plains.append(plain)
        lcs.append(base)
        dvec.append(dv)
    return plains, lcs, dvec


def _dep_values(pm, valid, dvec, lcs, cap):
    """Ucat rows [16, cap] for the one-window p2g1 deposit."""
    D = 3
    vel = [pm[D + d, :] for d in range(D)]
    Cm = [[pm[2 * D + i * D + j, :] for j in range(D)] for i in range(D)]
    mass = jnp.where(valid, pm[2 * D + D * D, :], 0.0)
    Aval = []
    for i in range(D):
        cd = Cm[i][0] * dvec[0]
        for j in range(1, D):
            cd = cd + Cm[i][j] * dvec[j]
        Aval.append(mass * (vel[i] - cd))
    lcf = [l.astype(jnp.float32) + 1.0 for l in lcs]
    U0 = [mass]
    for i in range(D):
        acc = Aval[i]
        for d in range(D):
            acc = acc - lcf[d] * (mass * Cm[i][d])
        U0.append(acc)
    Ucat = U0[:]
    for d in range(D):
        Ucat += [jnp.zeros_like(mass)] + [mass * Cm[i][d] for i in range(D)]
    return _rows(Ucat, cap)


def _tb4_deposit(data, E=6, prec="highest", mode="abt"):
    """Grouped deposit: out [NG, 4, G*EP] (4 fat rows per program).

    mode="abt": transposed matmul V[16,cap] x W0[E^3,cap]^T -> [16, E^3]
    mode="tr":  plain matmul then jnp.transpose of the fixed [E^3, 4]
    """
    A, NG, G, cap, F = data["A"], data["NG"], data["G"], data["cap"], data["F"]
    T, tshape = data["T"], data["tshape"]
    EP = 256 if E == 6 else 512
    E3 = E**3

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NG,),
        in_specs=[
            pl.BlockSpec((1, F, G * cap), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, 4, G * EP), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
    )

    def kernel(count_ref, stream_ref, out_ref):
        t = pl.program_id(0)
        for j in range(G):
            pm = stream_ref[0, :, j * cap : (j + 1) * cap]
            tid = t * G + j
            valid = lax.broadcasted_iota(jnp.int32, (1, cap), 1)[0] < count_ref[tid]
            plains, lcs, dvec = _grouped_profiles(pm, tid, T, E, tshape, cap)
            vf = valid.astype(jnp.float32)[None, :]
            W0 = _window(plains, E, cap) * vf
            V = _dep_values(pm, valid, dvec, lcs, cap)
            if mode == "abt":
                YT = lax.dot_general(
                    V, W0, (((1,), (1,)), ((), ())),
                    precision=_precision(prec), preferred_element_type=jnp.float32,
                )  # [16, E^3]
                l_io = lax.broadcasted_iota(jnp.int32, (1, E3), 1)
                e0 = (l_io // (E * E)).astype(jnp.float32)
                e1 = ((l_io // E) % E).astype(jnp.float32)
                e2 = (l_io % E).astype(jnp.float32)
                blk = YT[0:4] + e0 * YT[4:8] + e1 * YT[8:12] + e2 * YT[12:16]
            else:
                Y = lax.dot_general(
                    W0, V, (((1,), (1,)), ((), ())),
                    precision=_precision(prec), preferred_element_type=jnp.float32,
                )  # [E^3, 16]
                r = lax.broadcasted_iota(jnp.int32, (E3, 4), 0)
                e0 = (r // (E * E)).astype(jnp.float32)
                e1 = ((r // E) % E).astype(jnp.float32)
                e2 = (r % E).astype(jnp.float32)
                blk = (Y[:, 0:4] + e0 * Y[:, 4:8] + e1 * Y[:, 8:12] + e2 * Y[:, 12:16]).T
            out_ref[0, :, j * EP : j * EP + E3] = blk

    @jax.jit
    def fn(count, stream):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((NG, 4, G * EP), jnp.float32),
        )(count, stream)

    return fn


def _tb4_collect(data, E=6, prec="highest"):
    """Grouped collect: gblk [NG, 4, G*EP] (v rows 0-2, mass row 3) ->
    out stream [NG, FO, G*cap]."""
    A, NG, G, cap, F = data["A"], data["NG"], data["G"], data["cap"], data["F"]
    T, tshape = data["T"], data["tshape"]
    EP = 256 if E == 6 else 512
    E3 = E**3
    D = 3
    FO = 2 * D + D * D + 3

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NG,),
        in_specs=[
            pl.BlockSpec((1, F, G * cap), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, G * EP), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, FO, G * cap), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
    )

    def kernel(count_ref, stream_ref, gblk_ref, out_ref):
        t = pl.program_id(0)
        for j in range(G):
            pm = stream_ref[0, :, j * cap : (j + 1) * cap]
            tid = t * G + j
            plains, lcs, dvec = _grouped_profiles(pm, tid, T, E, tshape, cap)
            W0 = _window(plains, E, cap)  # [E^3, cap]
            gb = gblk_ref[0, :, j * EP : j * EP + E3]  # [4, E^3]
            l_io = lax.broadcasted_iota(jnp.int32, (1, E3), 1)
            e0 = (l_io // (E * E)).astype(jnp.float32)
            e1 = ((l_io // E) % E).astype(jnp.float32)
            e2 = (l_io % E).astype(jnp.float32)
            rid = lax.broadcasted_iota(jnp.int32, (4 * D + 1, E3), 0)
            Bcat = jnp.zeros((4 * D + 1, E3), jnp.float32)
            for i in range(D):
                vi = gb[i][None, :]
                Bcat = jnp.where(rid == i, vi, Bcat)
                Bcat = jnp.where(rid == D + i, e0 * vi, Bcat)
                Bcat = jnp.where(rid == 2 * D + i, e1 * vi, Bcat)
                Bcat = jnp.where(rid == 3 * D + i, e2 * vi, Bcat)
            Bcat = jnp.where(rid == 4 * D, gb[3][None, :], Bcat)
            X = lax.dot_general(
                Bcat, W0, (((1,), (0,)), ((), ())),
                precision=_precision(prec), preferred_element_type=jnp.float32,
            )  # [13, cap]
            v = [X[i] for i in range(D)]
            lcf = [l.astype(jnp.float32) + 1.0 for l in lcs]
            newC = []
            for dd in range(D):
                for i in range(D):
                    Md = X[D * (dd + 1) + i] - lcf[dd] * v[i]
                    newC.append(4.0 * (v[i] * (-dvec[dd]) + Md))
            rho = X[4 * D]
            newpos = [pm[d, :] + v[d] * 0.066 for d in range(D)]
            prs = jnp.maximum(-0.1, 10.0 * ((rho / 1.0) ** 4 - 1.0))
            rows = newpos + v + newC + [rho, prs, pm[2 * D + D * D, :]]
            out_ref[0, :, j * cap : (j + 1) * cap] = _rows(rows, cap)

    @jax.jit
    def fn(count, stream, gblk):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((NG, FO, G * cap), jnp.float32),
        )(count, stream, gblk)

    return fn


def _tb4_dma(data, E=6):
    A, NG, G, cap, F = data["A"], data["NG"], data["G"], data["cap"], data["F"]
    EP = 256
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NG,),
        in_specs=[
            pl.BlockSpec((1, F, G * cap), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, 4, G * EP), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
    )

    def kernel(count_ref, stream_ref, out_ref):
        out_ref[0] = jnp.zeros((4, G * EP), jnp.float32) + stream_ref[0, 0, 0]

    @jax.jit
    def fn(count, stream):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((NG, 4, G * EP), jnp.float32),
        )(count, stream)

    return fn


def run_tb4(args):
    for G in (8, 16):
        data = synth_grouped(args.n, G=G)
        A = data["A"]
        print(f"# grouped G={G}: A={A} tiles, NG={data['NG']}", file=sys.stderr)
        cases = [
            (f"tb4_dma_G{G}", _tb4_dma(data), None),
            (f"tb4_dep_abt_G{G}_E6", _tb4_deposit(data, E=6, mode="abt"), None),
            (f"tb4_dep_tr_G{G}_E6", _tb4_deposit(data, E=6, mode="tr"), None),
            (f"tb4_dep_abt_G{G}_E8", _tb4_deposit(data, E=8, mode="abt"), None),
        ]
        for name, fn, _ in cases:
            try:
                dt = timeit(fn, data["count"], data["stream"], iters=args.iters)
                print(f"{name:32s} {dt*1e3:9.3f} ms   {dt/A*1e9:8.1f} ns/tile")
            except Exception as e:  # noqa: BLE001
                print(f"{name:32s} FAILED: {type(e).__name__}: {e}")
        rng = np.random.default_rng(1)
        for E in ((6, 8) if G == 8 else (6,)):
            EP = 256 if E == 6 else 512
            gblk = jnp.asarray(
                rng.normal(size=(data["NG"], 4, G * EP)).astype(np.float32)
            )
            try:
                fn = _tb4_collect(data, E=E)
                dt = timeit(fn, data["count"], data["stream"], gblk, iters=args.iters)
                print(f"tb4_collect_G{G}_E{E:<13d} {dt*1e3:9.3f} ms   {dt/A*1e9:8.1f} ns/tile")
            except Exception as e:  # noqa: BLE001
                print(f"tb4_collect_G{G}_E{E} FAILED: {type(e).__name__}: {e}")


# ---------------------------------------------------------------------------
# XLA glue costs at 1M
# ---------------------------------------------------------------------------


def xla_glue(n):
    rng = np.random.default_rng(0)
    res = {}
    keys = jnp.asarray(rng.integers(0, n // 64, n).astype(np.int32))
    res["argsort_1m"] = timeit(jax.jit(lambda k: jnp.argsort(k)), keys, iters=10)
    packed = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    order = jnp.asarray(rng.permutation(n).astype(np.int32))
    res["gather_n16"] = timeit(
        jax.jit(lambda p, o: jnp.take(p, o, axis=0)), packed, order, iters=10
    )
    res["scatter_n16"] = timeit(
        jax.jit(lambda p, o: jnp.zeros_like(p).at[o].set(p)), packed, order, iters=10
    )
    # halo_sum at bench scale: nt = 31**3 tiles, E=6, CH=4
    from fluid_tpu.ops.tiling import halo_sum

    nt, E, CH = 31**3, 6, 4
    blocks = jnp.asarray(rng.normal(size=(nt, E**3, CH)).astype(np.float32))
    res["halo_sum_31c_E6"] = timeit(
        jax.jit(lambda b: halo_sum(b.reshape(nt, E, E, E, CH), (31, 31, 31), 4)),
        blocks, iters=10,
    )
    return res


CASES = {
    "dma": lambda d: [("dma_only_E6", case_dma_only(d, E=6))],
    "window": lambda d: [
        ("window_E6", case_window_build(d, E=6)),
        ("window_E8", case_window_build(d, E=8)),
    ],
    "matmul": lambda d: [
        (f"mm_E{E}_N{N}_{p}", case_matmul(d, E=E, N=N, prec=p))
        for (E, N, p) in [
            (6, 16, "highest"), (6, 16, "high"), (6, 16, "default"),
            (6, 128, "highest"), (8, 16, "highest"), (8, 16, "high"),
        ]
    ],
    "tb": lambda d: [
        ("nodma_E6", case_nodma(d, E=6)),
        ("dma_tb4", case_dma_tb(d, TB=4)),
        ("dma_tb8", case_dma_tb(d, TB=8)),
        ("dep_onewin_tb4_E6", case_deposit_onewindow_tb(d, TB=4, E=6)),
        ("dep_onewin_tb8_E6", case_deposit_onewindow_tb(d, TB=8, E=6)),
        ("dep_onewin_tb8_E8", case_deposit_onewindow_tb(d, TB=8, E=8)),
        ("dep_onewin_tb16_E6", case_deposit_onewindow_tb(d, TB=16, E=6)),
    ],
    "deposit": lambda d: [
        ("dep_current_E6_highest", case_deposit_current(d, E=6, prec="highest")),
        ("dep_onewin_E6_highest", case_deposit_onewindow(d, E=6, prec="highest")),
        ("dep_onewin_E6_high", case_deposit_onewindow(d, E=6, prec="high")),
        ("dep_onewin_E8_high", case_deposit_onewindow(d, E=8, prec="high")),
    ],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="dma,window,matmul,deposit,glue")
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--interpret-check", action="store_true")
    args = ap.parse_args()

    want = args.cases.split(",")
    data = synth(args.n)
    A = data["A"]
    print(f"# devices: {jax.devices()}  A={A} tiles, n={args.n}", file=sys.stderr)

    for group in want:
        if group == "tb2":
            run_tb2(args)
            continue
        if group == "tb3":
            run_tb3(args)
            continue
        if group == "tb4":
            run_tb4(args)
            continue
        if group == "glue":
            for name, dt in xla_glue(args.n).items():
                print(f"{name:32s} {dt*1e3:9.3f} ms")
            continue
        for name, fn in CASES[group](data):
            try:
                dt = timeit(
                    fn, data["act_start"], data["act_count"], data["tid"],
                    data["stream"], iters=args.iters,
                )
                print(f"{name:32s} {dt*1e3:9.3f} ms   {dt/A*1e9:8.1f} ns/tile")
            except Exception as e:  # noqa: BLE001
                print(f"{name:32s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
