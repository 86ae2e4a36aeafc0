#!/usr/bin/env python
"""Micro-benchmark: z-FACTORED kernel dots vs the current wide-window dots.

The substep's binding cost is ~3 MXU dots per occupied tile, each one
~0.55-0.8 us because ONE operand is E^3 = 512 wide (weight-load-bound:
~N cycles for the [*,cap]@[512,cap]^T form regardless of the tiny
12-16-row M).  The window is a tensor product W0 = wx (x) (wy (x) wz)
(axis 0 SLOWEST in the real kernels' flat order), so every contraction
against W0 factors through the [64, cap] pair window w12 = wy (x) wz:

    Y[r, e0*64+yz] = sum_p U[r,p] * wx[e0,p] * W12[yz,p]

Mosaic cannot reshape 64-lane arrays (micro_zfac_probe p3/p4 FAIL), so the
factored kernels keep every array 128-lane:
  * W12 zero-padded to 128 rows (probe p6);
  * the e0 axis stacked into the dot's M rows with order (kbit, q)
    [e0 = 2q + kbit] so the merge back to window rows (r, q) with lanes
    (kbit*64 + yz) is one 4D sublane-group index (p8) + roll-select (p9);
  * the g2p k-combine via 3D slice mul-acc (p10).

This validates compilability, bit-accuracy, and timing of the three dot
types (deposit, rho, g2p) on TPU before rewiring stream_transfer.
Run: python bench/micro_zfac.py
"""
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

G, cap, E, D = 8, 128, 8, 3
GL = G * cap
E3 = E**D  # 512
E2 = E * E  # 64
S1 = E3 // 128  # 4
Q = E // 2  # 4 e0-pairs
NG = 4096
PB = 4
R = 12  # p2g2 channel rows (1+D)*D
HI = lax.Precision.HIGHEST


def timeit(fn, *args, reps=30):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    # fetch a value: a faulted device returns garbage timings silently
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / reps


def make_inputs(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    # per-group factor profiles (as the kernels build them)
    wx = jax.random.uniform(k1, (NG, E, GL), jnp.float32)
    wy = jax.random.uniform(k2, (NG, E, GL), jnp.float32)
    wz = jax.random.uniform(k3, (NG, E, GL), jnp.float32)
    U = jax.random.normal(k4, (NG, R, GL), jnp.float32)
    m = jax.random.uniform(k1, (NG, G * S1, 128), jnp.float32)  # mass windows
    B = jax.random.normal(k2, (NG, 16, E3), jnp.float32)  # g2p Bcat (13 pad 16)
    return wx, wy, wz, U, m, B


def _mk(kernel_body, n_out_rows, out_w):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(NG // PB,),
        in_specs=[
            pl.BlockSpec((PB, E, GL), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, E, GL), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, E, GL), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, R, GL), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, G * S1, 128), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, 16, E3), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (PB, n_out_rows, out_w), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
        ),
    )

    def call(wx, wy, wz, U, m, B):
        return pl.pallas_call(
            kernel_body,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((NG, n_out_rows, out_w), jnp.float32),
        )(wx, wy, wz, U, m, B)

    return jax.jit(call)


def _w12(wy, wz):
    """Pair window [E2, GL], flat (e1*E + e2) — e2 fastest."""
    return (wy[:, None, :] * wz[None, :, :]).reshape(E2, GL)


def _w0(wx, wy, wz):
    """Full window [E3, GL], flat (e0*E2 + e1*E + e2) — e0 SLOWEST
    (matches stream_transfer._kernel_window)."""
    w12 = _w12(wy, wz)
    return (wx[:, None, :] * w12[None, :, :]).reshape(E3, GL)


def _w12p(wy, wz):
    """[128, GL]: W12 zero-padded to 128 rows (probe p6)."""
    w12 = _w12(wy, wz)
    rid = lax.broadcasted_iota(jnp.int32, (128, GL), 0)
    z = jnp.zeros((128, GL), jnp.float32)
    # pad via iota-select (no in-kernel concat/pad of sublanes)
    return jnp.where(rid < E2, jnp.pad(w12, ((0, 128 - E2), (0, 0))), z)


def _wx_s(wx):
    """wx rows permuted to (kbit, q) order: wx_s[kbit*Q+q] = wx[2q+kbit]."""
    rid = lax.broadcasted_iota(jnp.int32, (E, GL), 0)
    out = jnp.zeros((E, GL), jnp.float32)
    for row in range(E):
        e0 = 2 * (row % Q) + row // Q
        out = jnp.where(rid == row, wx[e0][None, :], out)
    return out


def _merge_eo(Y, rows):
    """[rows*E, 128] dot output, rows (r, kbit, q), 64 valid lanes ->
    [rows*S1, 128] window rows (r, q) with lanes (kbit*64 + yz)."""
    Y4 = Y.reshape(rows, 2, Q, 128)
    Ya = Y4[:, 0].reshape(rows * Q, 128)
    Yb = Y4[:, 1].reshape(rows * Q, 128)
    l_io = lax.broadcasted_iota(jnp.int32, (rows * Q, 128), 1)
    return jnp.where(l_io < E2, Ya, pltpu.roll(Yb, E2, 1))


# --- deposit: current (one wide dot/tile) vs z-factored ---------------------

def dep_cur_kernel(wx_ref, wy_ref, wz_ref, U_ref, m_ref, B_ref, out_ref):
    for pb in range(PB):
        W0 = _w0(wx_ref[pb], wy_ref[pb], wz_ref[pb])
        U = U_ref[pb]
        for j in range(G):
            YT = lax.dot_general(
                U[:, j * cap : (j + 1) * cap],
                W0[:, j * cap : (j + 1) * cap],
                (((1,), (1,)), ((), ())),
                precision=HI, preferred_element_type=jnp.float32,
            )  # [R, E3]
            out_ref[pb, j * R * S1 : (j + 1) * R * S1, :] = YT.reshape(R * S1, 128)


def dep_z_kernel(wx_ref, wy_ref, wz_ref, U_ref, m_ref, B_ref, out_ref):
    for pb in range(PB):
        w12p = _w12p(wy_ref[pb], wz_ref[pb])  # [128, GL]
        wxs = _wx_s(wx_ref[pb])  # [E, GL] rows (kbit, q)
        U = U_ref[pb]  # [R, GL]
        Uz = (U[:, None, :] * wxs[None, :, :]).reshape(R * E, GL)
        for j in range(G):
            Yz = lax.dot_general(
                Uz[:, j * cap : (j + 1) * cap],
                w12p[:, j * cap : (j + 1) * cap],
                (((1,), (1,)), ((), ())),
                precision=HI, preferred_element_type=jnp.float32,
            )  # [R*E, 128] rows (r, kbit, q), lanes yz (64 valid)
            Z = _merge_eo(Yz, R)  # [R*S1, 128]
            out_ref[pb, j * R * S1 : (j + 1) * R * S1, :] = Z


# --- rho: current (one wide group dot) vs z-factored ------------------------

def rho_cur_kernel(wx_ref, wy_ref, wz_ref, U_ref, m_ref, B_ref, out_ref):
    for pb in range(PB):
        W0 = _w0(wx_ref[pb], wy_ref[pb], wz_ref[pb])
        mrows = jnp.zeros((G, E3), jnp.float32)
        rid = lax.broadcasted_iota(jnp.int32, (G, E3), 0)
        for j in range(G):
            mj = m_ref[pb, j * S1 : (j + 1) * S1, :].reshape(E3)
            mrows = jnp.where(rid == j, mj[None, :], mrows)
        rho_all = lax.dot_general(
            mrows, W0, (((1,), (0,)), ((), ())),
            precision=HI, preferred_element_type=jnp.float32,
        )  # [G, GL]
        grp = lax.broadcasted_iota(jnp.int32, (1, GL), 1)[0] // cap
        rho = jnp.zeros((GL,), jnp.float32)
        for j in range(G):
            rho = jnp.where(grp == j, rho_all[j], rho)
        out_ref[pb] = jnp.broadcast_to(rho[None, :], (8, GL))


def rho_z_kernel(wx_ref, wy_ref, wz_ref, U_ref, m_ref, B_ref, out_ref):
    for pb in range(PB):
        w12p = _w12p(wy_ref[pb], wz_ref[pb])  # [128, GL]
        wx = wx_ref[pb]
        mg = m_ref[pb]  # [G*S1, 128] rows (j, q), lanes (kbit*64 + yz)
        l_io = lax.broadcasted_iota(jnp.int32, (G * S1, 128), 1)
        Me = jnp.where(l_io < E2, mg, 0.0)
        Mo = jnp.where(l_io < E2, pltpu.roll(mg, E2, 1), 0.0)
        Xe = lax.dot_general(
            Me, w12p, (((1,), (0,)), ((), ())),
            precision=HI, preferred_element_type=jnp.float32,
        )  # [G*S1, GL] rows (j, q): sum_yz m[2q, yz] * w12[yz, p]
        Xo = lax.dot_general(
            Mo, w12p, (((1,), (0,)), ((), ())),
            precision=HI, preferred_element_type=jnp.float32,
        )
        grp = lax.broadcasted_iota(jnp.int32, (1, GL), 1)[0] // cap
        rho = jnp.zeros((GL,), jnp.float32)
        for q in range(Q):
            xe = jnp.zeros((GL,), jnp.float32)
            xo = jnp.zeros((GL,), jnp.float32)
            for j in range(G):
                xe = jnp.where(grp == j, Xe[j * S1 + q], xe)
                xo = jnp.where(grp == j, Xo[j * S1 + q], xo)
            rho = rho + xe * wx[2 * q] + xo * wx[2 * q + 1]
        out_ref[pb] = jnp.broadcast_to(rho[None, :], (8, GL))


# --- g2p: current vs z-factored ---------------------------------------------

def g2p_cur_kernel(wx_ref, wy_ref, wz_ref, U_ref, m_ref, B_ref, out_ref):
    for pb in range(PB):
        W0 = _w0(wx_ref[pb], wy_ref[pb], wz_ref[pb])
        B = B_ref[pb]  # [16, E3]
        for j in range(G):
            Xj = lax.dot_general(
                B, W0[:, j * cap : (j + 1) * cap],
                (((1,), (0,)), ((), ())),
                precision=HI, preferred_element_type=jnp.float32,
            )  # [16, cap]
            out_ref[pb, :, j * cap : (j + 1) * cap] = Xj


def g2p_z_kernel(wx_ref, wy_ref, wz_ref, U_ref, m_ref, B_ref, out_ref):
    for pb in range(PB):
        w12p = _w12p(wy_ref[pb], wz_ref[pb])  # [128, GL]
        wx = wx_ref[pb]
        Bz = B_ref[pb].reshape(16 * S1, 128)  # rows (c, q), lanes (kbit,yz)
        l_io = lax.broadcasted_iota(jnp.int32, (16 * S1, 128), 1)
        Be = jnp.where(l_io < E2, Bz, 0.0)
        Bo = jnp.where(l_io < E2, pltpu.roll(Bz, E2, 1), 0.0)
        for j in range(G):
            sl = slice(j * cap, (j + 1) * cap)
            Xe = lax.dot_general(
                Be, w12p[:, sl], (((1,), (0,)), ((), ())),
                precision=HI, preferred_element_type=jnp.float32,
            )  # [16*S1, cap] rows (c, q)
            Xo = lax.dot_general(
                Bo, w12p[:, sl], (((1,), (0,)), ((), ())),
                precision=HI, preferred_element_type=jnp.float32,
            )
            X3e = Xe.reshape(16, S1, cap)
            X3o = Xo.reshape(16, S1, cap)
            acc = X3e[:, 0] * wx[0, sl][None, :] + X3o[:, 0] * wx[1, sl][None, :]
            for q in range(1, Q):
                acc = (
                    acc
                    + X3e[:, q] * wx[2 * q, sl][None, :]
                    + X3o[:, q] * wx[2 * q + 1, sl][None, :]
                )
            out_ref[pb, :, j * cap : (j + 1) * cap] = acc


def main():
    key = jax.random.key(0)
    ins = make_inputs(key)

    dep_cur = _mk(dep_cur_kernel, G * R * S1, 128)
    dep_z = _mk(dep_z_kernel, G * R * S1, 128)
    rho_cur = _mk(rho_cur_kernel, 8, GL)
    rho_z = _mk(rho_z_kernel, 8, GL)
    g2p_cur = _mk(g2p_cur_kernel, 16, GL)
    g2p_z = _mk(g2p_z_kernel, 16, GL)

    for name, cur, fac in (
        ("deposit", dep_cur, dep_z),
        ("rho", rho_cur, rho_z),
        ("g2p", g2p_cur, g2p_z),
    ):
        try:
            a = jax.block_until_ready(cur(*ins))
        except Exception as e:  # noqa: BLE001
            print(f"{name} cur    : FAILED {type(e).__name__}: {str(e)[:150]}")
            continue
        try:
            b = jax.block_until_ready(fac(*ins))
        except Exception as e:  # noqa: BLE001
            print(f"{name} zfac   : FAILED {type(e).__name__}: {str(e)[:150]}")
            continue
        err = float(jnp.max(jnp.abs(a - b)))
        rel = err / max(1e-9, float(jnp.max(jnp.abs(a))))
        t_c = timeit(cur, *ins)
        t_f = timeit(fac, *ins)
        print(
            f"{name:8s}: cur {t_c*1e3:7.2f} ms  zfac {t_f*1e3:7.2f} ms  "
            f"({t_c/t_f:4.2f}x)  max|d| {err:.2e} (rel {rel:.1e})"
        )


if __name__ == "__main__":
    main()
