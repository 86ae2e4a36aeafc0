#!/usr/bin/env python
"""Isolate which construct of the z-factored dots crashes Mosaic.

Each probe is a minimal kernel exercising ONE suspicious construct:
  p1: rank-3 broadcast build Uz [96, GL] (same pattern as _kernel_window)
  p2: A@B^T dot with N=64 output ([96,128]@[64,128]^T -> [96,64])
  p3: merge reshape [96,64] -> [12,512]
  p4: split reshape [32,128] -> [64,64]
  p5: dot with N=64 but output PADDED to [96,128] before store
  p6: [96,64] -> [12,512] via reshape [96,64]->[96? alt orders]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GL = 1024
E = 8
E2 = 64
cap = 128
HI = lax.Precision.HIGHEST


def run(name, kernel, in_shapes, out_shape):
    in_specs = [
        pl.BlockSpec(s, lambda: tuple(0 for _ in s), memory_space=pltpu.VMEM)
        for s in in_shapes
    ]
    try:
        f = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0, grid=(1,),
                in_specs=[
                    pl.BlockSpec((1,) + s, lambda t, sh=s: (0,) * (len(sh) + 1),
                                 memory_space=pltpu.VMEM)
                    for s in in_shapes
                ],
                out_specs=pl.BlockSpec(
                    (1,) + out_shape, lambda t: (0,) * (len(out_shape) + 1),
                    memory_space=pltpu.VMEM,
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((1,) + out_shape, jnp.float32),
        )
        args = [jnp.ones((1,) + s, jnp.float32) for s in in_shapes]
        out = jax.block_until_ready(jax.jit(f)(*args))
        print(f"{name}: OK   sum={float(out.sum()):.1f}")
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:140]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")


# p1: rank-3 broadcast build
def p1(u_ref, wz_ref, o_ref):
    U = u_ref[0]
    wz = wz_ref[0]
    Uz = (U[:, None, :] * wz[None, :, :]).reshape(12 * E, GL)
    o_ref[0] = Uz


run("p1 build Uz [96,GL]", p1, ((12, GL), (E, GL)), (96, GL))


# p2: N=64 dot
def p2(a_ref, b_ref, o_ref):
    Y = lax.dot_general(
        a_ref[0], b_ref[0], (((1,), (1,)), ((), ())),
        precision=HI, preferred_element_type=jnp.float32,
    )
    o_ref[0] = Y


run("p2 dot ->[96,64]", p2, ((96, cap), (64, cap)), (96, 64))


# p3: merge [96,64] -> [12,512]
def p3(a_ref, o_ref):
    o_ref[0] = a_ref[0].reshape(12, 512)


run("p3 merge [96,64]->[12,512]", p3, ((96, 64),), (12, 512))


# p4: split [32,128] -> [64,64]
def p4(a_ref, o_ref):
    o_ref[0] = a_ref[0].reshape(64, 64)


run("p4 split [32,128]->[64,64]", p4, ((32, 128),), (64, 64))


# p5: N=64 dot, pad to 128 lanes before store
def p5(a_ref, b_ref, o_ref):
    Y = lax.dot_general(
        a_ref[0], b_ref[0], (((1,), (1,)), ((), ())),
        precision=HI, preferred_element_type=jnp.float32,
    )
    o_ref[0] = jnp.pad(Y, ((0, 0), (0, 64)))


run("p5 dot N=64 pad->128", p5, ((96, cap), (64, cap)), (96, 128))


# p6: dot against PADDED B [128,cap] (64 zero rows) -> [96,128]
def p6(a_ref, b_ref, o_ref):
    B = jnp.pad(b_ref[0], ((0, 64), (0, 0)))
    Y = lax.dot_general(
        a_ref[0], B, (((1,), (1,)), ((), ())),
        precision=HI, preferred_element_type=jnp.float32,
    )
    o_ref[0] = Y


run("p6 dot padded-B ->[96,128]", p6, ((96, cap), (64, cap)), (96, 128))


# p7: merge [96,128](64 valid) -> select-combine into [12,512] via rolls
def p7(a_ref, o_ref):
    Y = a_ref[0]  # [96, 128], lanes 64.. zero
    Yp = jnp.pad(Y, ((0, 0), (0, 512 - 128)))  # [96, 512]
    acc = jnp.zeros((12, 512), jnp.float32)
    rid = lax.broadcasted_iota(jnp.int32, (12, 96), 1)
    for k in range(8):
        sel = jnp.zeros((12, 512), jnp.float32)
        blk = jnp.where((rid % 8) == k, 1.0, 0.0)  # [12,96] selector
        part = lax.dot_general(
            blk, Yp, (((1,), (0,)), ((), ())),
            precision=HI, preferred_element_type=jnp.float32,
        )  # [12, 512] -- rows r pick Yp[r*8+k]... (needs rid//8==r too)
        acc = acc + pltpu.roll(part, 64 * k, 1)
    o_ref[0] = acc


run("p7 roll-merge", p7, ((96, 128),), (12, 512))


# p8: 4D sublane-group reshape + static middle index: [96,128]->[12,2,4,128]
# -> [:,0] -> [12,4,128] -> [48,128]
def p8(a_ref, o_ref):
    Y = a_ref[0]  # [96, 128]
    Y4 = Y.reshape(12, 2, 4, 128)
    Ya = Y4[:, 0].reshape(48, 128)
    Yb = Y4[:, 1].reshape(48, 128)
    o_ref[0] = Ya + 2.0 * Yb


run("p8 4D sub-group index", p8, ((96, 128),), (48, 128))


# p9: the full even/odd roll-select merge: rows (r, kbit, q) -> (r, q) with
# lanes (kbit*64 + xy)
def p9(a_ref, o_ref):
    Y = a_ref[0]  # [96, 128] rows (r=12, kbit=2, q=4), lanes xy (64 valid)
    Y4 = Y.reshape(12, 2, 4, 128)
    Ya = Y4[:, 0].reshape(48, 128)
    Yb = Y4[:, 1].reshape(48, 128)
    l_io = lax.broadcasted_iota(jnp.int32, (48, 128), 1)
    o_ref[0] = jnp.where(l_io < 64, Ya, pltpu.roll(Yb, 64, 1))


run("p9 roll-select merge", p9, ((96, 128),), (48, 128))


# p10: sublane-group + static index on a 3D intermediate: [64,128]->[16,4,128]
# with per-slice lane multiply-accumulate (the g2p k-combine)
def p10(a_ref, w_ref, o_ref):
    X = a_ref[0].reshape(16, 4, 128)
    wz = w_ref[0]  # [8, 128]
    acc = X[:, 0] * wz[0][None, :]
    for q in range(1, 4):
        acc = acc + X[:, q] * wz[q][None, :]
    o_ref[0] = acc


run("p10 3D slice k-combine", p10, ((64, 128), (8, 128)), (16, 128))


# p11: row-dependent iota coeff build on [16,128]: e0 = 2*(row%4)+(lane>=64)
def p11(a_ref, o_ref):
    Z = a_ref[0]  # [16, 128]
    r_io = lax.broadcasted_iota(jnp.int32, (16, 128), 0)
    l_io = lax.broadcasted_iota(jnp.int32, (16, 128), 1)
    e0 = (2 * (r_io % 4) + (l_io >= 64).astype(jnp.int32)).astype(jnp.float32)
    o_ref[0] = Z * e0


run("p11 row-dep e0 coeff", p11, ((16, 128),), (16, 128))


# p12: periodic row replication via broadcast_to + sublane-merge reshape:
# [4,128] -> [16,4,128] -> [64,128]
def p12(a_ref, o_ref):
    g = a_ref[0]  # [4, 128]
    rep = jnp.broadcast_to(g[None], (16, 4, 128)).reshape(64, 128)
    o_ref[0] = rep


run("p12 periodic row rep", p12, ((4, 128),), (64, 128))


# p13: same replication via a selection-matrix dot [64,16]@[16,128]
def p13(a_ref, o_ref):
    g = a_ref[0]  # [16, 128] (4 channels x 4 q-rows)
    rid = lax.broadcasted_iota(jnp.int32, (64, 16), 0)
    cid = lax.broadcasted_iota(jnp.int32, (64, 16), 1)
    sel = jnp.where(cid == rid % 16, 1.0, 0.0)
    rep = lax.dot_general(
        sel, g, (((1,), (0,)), ((), ())),
        precision=HI, preferred_element_type=jnp.float32,
    )
    o_ref[0] = rep


run("p13 sel-dot row rep", p13, ((16, 128),), (64, 128))
