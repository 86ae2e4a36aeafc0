#!/usr/bin/env python
"""Round-3 micro-benchmarks: separable deposit dots + block lane-width.

Questions (3d-1m shapes: NG=4096 groups, G=8 tiles, cap=128, E=8, D=3):
  1. out-write lane width: the r3 block layout writes [A, 16, 128] = 512B
     HBM rows; would [A, 8, 256] / [A, 4, 512] (same flat bytes) cut the
     kernel DMA floor?
  2. separable deposit dot ([96,128]@[64,128]^T + row-repeat builds) vs the
     one-window dot ([12,128]@[512,128]^T with a shared [512,GL] window).
  3. is the rank-3 broadcast+reshape row-repeat ([12,128] -> [8,12,128] ->
     [96,128]) supported/cheap in Mosaic?

Usage: python bench/micro_sep.py [--ng 4096]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

G, CAP, E, D = 8, 128, 8, 3
E3 = E**D  # 512
GL = G * CAP


def timeit(fn, *args, iters=20):
    out = jax.block_until_ready(fn(*args))
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.ravel()[0])
    return dt


def synth(ng, key=0):
    k = jax.random.key(key)
    ks = jax.random.split(k, 3)
    stream = jax.random.uniform(ks[0], (ng, 24, GL), jnp.float32)
    wx = jax.random.uniform(ks[1], (ng, 8, GL), jnp.float32)
    return stream, wx


# ---------------------------------------------------------------------------
# 1. copy kernels at different out lane widths (write-side DMA floor)
# ---------------------------------------------------------------------------


def make_copy(ng, rows, lanes, pb=4):
    """Read the stream block, write a [rows, lanes] out block per group."""

    def kernel(s_ref, o_ref):
        for b in range(pb):
            x = s_ref[b]  # [24, GL]
            o_ref[b] = x[:rows * lanes // GL].reshape(rows, lanes)

    return pl.pallas_call(
        kernel,
        grid=(ng // pb,),
        in_specs=[pl.BlockSpec((pb, 24, GL), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((pb, rows, lanes), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ng, rows, lanes), jnp.float32),
    )


# ---------------------------------------------------------------------------
# 2/3. deposit-dot variants (per-group kernels, PB=4)
# ---------------------------------------------------------------------------

PREC = lax.Precision.HIGHEST


def make_dep(ng, mode, pb=4):
    """mode: 'onewindow' (current), 'sep3' (rank-3 repeat), 'sepsel'
    (iota-select repeat).  Output [ng, G*16, 128] (r3 deposit block)."""

    def kernel(s_ref, w_ref, o_ref):
        for b in range(pb):
            pm = s_ref[b]  # [24, GL]
            wxg = w_ref[b]  # [8, GL] per-axis x profiles
            # fake per-axis y/z profiles from stream rows (shapes match real)
            wyg = pm[0:8]
            wzg = pm[8:16]
            base = pm[0:12]  # stand-in for the U rows
            part = pm[12:24][:12] * 0.5  # e0-partner rows

            if mode == "onewindow":
                # W0 [E^3, GL] tensor product + per-tile [12,128]@[512,128]^T
                w01 = (wxg[:, None, :] * wyg[None, :, :]).reshape(64, GL)
                W0 = (w01[:, None, :] * wzg[None, :, :]).reshape(E3, GL)
                for j in range(G):
                    U = base[:, j * CAP : (j + 1) * CAP]
                    YT = lax.dot_general(
                        U, W0[:, j * CAP : (j + 1) * CAP],
                        (((1,), (1,)), ((), ())),
                        precision=PREC, preferred_element_type=jnp.float32,
                    )  # [12, 512]
                    es = lax.broadcasted_iota(jnp.int32, (4, E3), 1)
                    blk = (
                        YT[0:4]
                        + (es // 64 % 8).astype(jnp.float32) * YT[4:8]
                        + (es // 8 % 8).astype(jnp.float32) * YT[8:12]
                    )
                    o_ref[b, j * 16 : (j + 1) * 16, :] = blk.reshape(16, 128)
            else:
                Wyz = (wyg[:, None, :] * wzg[None, :, :]).reshape(64, GL)
                for j in range(G):
                    sl = slice(j * CAP, (j + 1) * CAP)
                    Bj = base[:, sl]  # [12, 128]
                    Pj = part[:, sl]
                    wxj = wxg[:, sl]  # [8, 128]
                    if mode == "sep3":
                        # rank-3 broadcast repeat: rows (r, e0)
                        WX = jnp.broadcast_to(wxj[None], (12, 8, 128)).reshape(96, 128)
                        B96 = jnp.broadcast_to(Bj[:, None], (12, 8, 128)).reshape(96, 128)
                        P96 = jnp.broadcast_to(Pj[:, None], (12, 8, 128)).reshape(96, 128)
                    else:
                        rid = lax.broadcasted_iota(jnp.int32, (96, 128), 0)
                        WX = jnp.zeros((96, 128), jnp.float32)
                        B96 = jnp.zeros((96, 128), jnp.float32)
                        P96 = jnp.zeros((96, 128), jnp.float32)
                        for e0 in range(8):
                            WX = jnp.where(rid % 8 == e0, wxj[e0][None], WX)
                        for r in range(12):
                            B96 = jnp.where(rid // 8 == r, Bj[r][None], B96)
                            P96 = jnp.where(rid // 8 == r, Pj[r][None], P96)
                    e0f = (lax.broadcasted_iota(jnp.int32, (96, 128), 0) % 8).astype(
                        jnp.float32
                    )
                    Ux = WX * B96 + (e0f * WX) * P96  # [96=(r,e0), 128]
                    YT3 = lax.dot_general(
                        Ux, Wyz[:, sl],
                        (((1,), (1,)), ((), ())),
                        precision=PREC, preferred_element_type=jnp.float32,
                    )  # [(r,e0), 64]
                    el = lax.broadcasted_iota(jnp.int32, (32, 64), 1)
                    blk = (
                        YT3[0:32]
                        + (el // 8).astype(jnp.float32) * YT3[32:64]
                        + (el % 8).astype(jnp.float32) * YT3[64:96]
                    )  # [(c,e0), 64]
                    o_ref[b, j * 16 : (j + 1) * 16, :] = blk.reshape(16, 128)

    return pl.pallas_call(
        kernel,
        grid=(ng // pb,),
        in_specs=[
            pl.BlockSpec((pb, 24, GL), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pb, 8, GL), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((pb, G * 16, 128), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ng, G * 16, 128), jnp.float32),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ng", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    ng = args.ng
    stream, wx = synth(ng)

    print(f"ng={ng} groups, G={G}, cap={CAP}, E={E} (3d-1m-like shapes)")
    for rows, lanes in ((64, 128), (32, 256), (16, 512), (8, 1024)):
        try:
            f = jax.jit(make_copy(ng, rows, lanes))
            t = timeit(f, stream, iters=args.iters)
            print(f"copy out [{rows:3d},{lanes:4d}]: {t*1e3:7.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"copy out [{rows:3d},{lanes:4d}]: FAILED {type(e).__name__}: {str(e)[:120]}")

    for mode in ("onewindow", "sep3", "sepsel"):
        try:
            f = jax.jit(make_dep(ng, mode))
            t = timeit(f, stream, wx, iters=args.iters)
            print(f"deposit {mode:10s}: {t*1e3:7.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"deposit {mode:10s}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
