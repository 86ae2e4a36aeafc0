#!/usr/bin/env python
"""Manual double-buffered DMA copy vs BlockSpec-pipelined copy vs XLA copy.

If the pallas pipeline / XLA copies cap at ~150 GB/s on this device while
manual DMA streams faster, the stream kernels should switch to ANY-space
inputs with hand-rolled DMA.  If everything caps the same, the device's
effective HBM bandwidth IS the wall and the substep floor is real.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *a, iters=10):
    out = jax.block_until_ready(fn(*a))
    float(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    float(out.ravel()[0])
    return (time.perf_counter() - t0) / iters


def make_manual(ng, rows, lanes, chunk):
    """Copy [ng, rows, lanes] via hand-rolled 2-deep double-buffered DMA."""

    n_chunks = ng // chunk

    def kernel(x_ref, o_ref, scr, sem_in, sem_out):
        def dma_in(i, slot):
            return pltpu.make_async_copy(
                x_ref.at[pl.ds(i * chunk, chunk)], scr.at[slot], sem_in.at[slot]
            )

        def dma_out(i, slot):
            return pltpu.make_async_copy(
                scr.at[slot], o_ref.at[pl.ds(i * chunk, chunk)], sem_out.at[slot]
            )

        dma_in(0, 0).start()

        def body(i, _):
            slot = jax.lax.rem(i, 2)
            nxt = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < n_chunks)
            def _():
                dma_in(i + 1, nxt).start()

            dma_in(i, slot).wait()

            @pl.when(i >= 2)
            def _():
                dma_out(i - 2, slot).wait()

            dma_out(i, slot).start()
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)
        dma_out(n_chunks - 2, jax.lax.rem(n_chunks - 2, 2)).wait()
        dma_out(n_chunks - 1, jax.lax.rem(n_chunks - 1, 2)).wait()

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((ng, rows, lanes), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, rows, lanes), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )


def make_pipelined(ng, rows, lanes, pb):
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    return pl.pallas_call(
        kernel,
        grid=(ng // pb,),
        in_specs=[pl.BlockSpec((pb, rows, lanes), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((pb, rows, lanes), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ng, rows, lanes), jnp.float32),
    )


def main():
    ng, rows, lanes = 4096, 24, 1024
    mb = ng * rows * lanes * 4 / 1e6
    x = jax.block_until_ready(
        jax.jit(lambda: jnp.ones((ng, rows, lanes), jnp.float32))()
    )
    print(f"array {mb:.0f} MB", flush=True)

    f = jax.jit(lambda x: x * 1.0000001)
    t = timeit(f, x)
    print(f"xla mult-copy       : {t*1e3:7.2f} ms  {2*mb/1e3/t:6.0f} GB/s", flush=True)

    for pb in (4, 16):
        t = timeit(jax.jit(make_pipelined(ng, rows, lanes, pb)), x)
        print(f"pipelined copy pb={pb:2d}: {t*1e3:7.2f} ms  {2*mb/1e3/t:6.0f} GB/s", flush=True)

    for chunk in (8, 32):
        t = timeit(jax.jit(make_manual(ng, rows, lanes, chunk)), x)
        print(f"manual dma chunk={chunk:2d} : {t*1e3:7.2f} ms  {2*mb/1e3/t:6.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
