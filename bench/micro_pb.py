#!/usr/bin/env python
"""Pipeline-floor sweep: PB (groups/program), dimension semantics, and
input-stream shape for the stream kernels' copy floor (round 3)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from micro_sep import synth, timeit, G, CAP, GL  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def make_copy(ng, pb, arb=False):
    def kernel(s_ref, o_ref):
        for b in range(pb):
            x = s_ref[b]
            o_ref[b] = x[: 64 * 128 // GL].reshape(64, 128)

    kw = {}
    if arb:
        kw["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        )
    return pl.pallas_call(
        kernel,
        grid=(ng // pb,),
        in_specs=[pl.BlockSpec((pb, 24, GL), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((pb, 64, 128), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ng, 64, 128), jnp.float32),
        **kw,
    )


def main():
    ng = 4096
    stream, _ = synth(ng)
    # XLA reference: reshape-copy of the same bytes
    f = jax.jit(lambda s: s[:, :8, :].reshape(ng, 64, 128) * 1.0000001)
    print(f"xla copy same bytes : {timeit(f, stream, iters=10)*1e3:7.2f} ms", flush=True)
    for pb in (2, 4, 8, 16):
        f = jax.jit(make_copy(ng, pb))
        print(f"copy PB={pb:2d}         : {timeit(f, stream, iters=10)*1e3:7.2f} ms", flush=True)
    f = jax.jit(make_copy(ng, 4, arb=True))
    print(f"copy PB=4 arbitrary : {timeit(f, stream, iters=10)*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
