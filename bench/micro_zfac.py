#!/usr/bin/env python
"""Micro-benchmark: z-FACTORED kernel dots vs the current wide-window dots.

The substep's binding cost is ~3-4 MXU dots per occupied tile, each one
~0.55-0.8 us because ONE operand is E^3 = 512 wide (weight-load-bound:
~K or N cycles regardless of the tiny 12-16-row M).  The window is a
tensor product W0 = wz (x) wxy, so every contraction against W0 factors:

    Y[r, (k, xy)] = sum_p U[r,p] * wz[k,p] * Wxy[xy,p]
                  = (U zstacked-with-wz)[r*8+k, p] @ Wxy[xy, p]^T

turning a [12,128]@[512,128]^T dot (>= 512 weight-load cycles) into a
[96,128]@[64,128]^T dot (~224 cycles) + a cheap [96,64]->[12,512]
sublane->lane merge.  This validates compilability, bit-accuracy, and
timing of all four dot types (deposit, rho, g2p, fused-dep1) on TPU
before rewiring stream_transfer.  Run: python bench/micro_zfac.py
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


def _w01(wx, wy):
    return (wx[:, None, :] * wy[None, :, :]).reshape(E2, GL)


def _w0(wx, wy, wz):
    w01 = _w01(wx, wy)
    return (w01[:, None, :] * wz[None, :, :]).reshape(E3, GL)


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
        w01 = _w01(wx_ref[pb], wy_ref[pb])  # [E2, GL]
        wz = wz_ref[pb]  # [E, GL]
        U = U_ref[pb]  # [R, GL]
        Uz = (U[:, None, :] * wz[None, :, :]).reshape(R * E, GL)  # [96, GL]
        for j in range(G):
            Yz = lax.dot_general(
                Uz[:, j * cap : (j + 1) * cap],
                w01[:, j * cap : (j + 1) * cap],
                (((1,), (1,)), ((), ())),
                precision=HI, preferred_element_type=jnp.float32,
            )  # [96, 64] rows (r, k)
            YT = Yz.reshape(R, E * E2).reshape(R * S1, 128)
            out_ref[pb, j * R * S1 : (j + 1) * R * S1, :] = YT


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
        w01 = _w01(wx_ref[pb], wy_ref[pb])  # [E2, GL]
        wz = wz_ref[pb]
        # mass windows [G*S1, 128] -> [G*E, E2] (lane->sublane split)
        mz = m_ref[pb].reshape(G * E, E2)
        X = lax.dot_general(
            mz, w01, (((1,), (0,)), ((), ())),
            precision=HI, preferred_element_type=jnp.float32,
        )  # [G*E, GL] rows (j, k)
        grp = lax.broadcasted_iota(jnp.int32, (1, GL), 1)[0] // cap
        rho = jnp.zeros((GL,), jnp.float32)
        for k in range(E):
            xk = jnp.zeros((GL,), jnp.float32)
            for j in range(G):
                xk = jnp.where(grp == j, X[j * E + k], xk)
            rho = rho + xk * wz[k]
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
        w01 = _w01(wx_ref[pb], wy_ref[pb])
        wz = wz_ref[pb]
        Bz = B_ref[pb].reshape(16 * E, E2)  # [(c,k), xy] lane->sublane split
        for j in range(G):
            Xz = lax.dot_general(
                Bz, w01[:, j * cap : (j + 1) * cap],
                (((1,), (0,)), ((), ())),
                precision=HI, preferred_element_type=jnp.float32,
            )  # [16*E, cap] rows (c, k)
            acc = jnp.zeros((16, cap), jnp.float32)
            Xr = Xz.reshape(16, E * cap)
            for k in range(E):
                acc = acc + Xr[:, k * cap : (k + 1) * cap] * wz[k, j * cap : (j + 1) * cap][None, :]
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
