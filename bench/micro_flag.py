#!/usr/bin/env python
"""How local is drift?  Flagged-slot fraction at each re-bin (3d-1m).

VERDICT r2 task 2 offers an incremental re-bin (move only the drifted
particles; the collect kernel's flag output already localizes them).  Its
win over the full re-bin scales with the flagged fraction at trigger time,
so measure that first: run the flagship dam-break frame loop with the same
drift-triggered schedule as frame_binned, and at every trigger record
  * flagged slots / live particles (particles that MUST move), and
  * particles in flagged TILES / live (tile-granular move, coarser bound).

The whole 3-frame loop runs inside ONE jit and returns only a small stats
buffer — measurable (and correct) even when the tunnel's device->host
direction is degraded (execution outputs ship per call; keep them tiny).
Run: python bench/micro_flag.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np

import bench as B
from fluid_tpu import step
from fluid_tpu.ops import stream_transfer as stx

MAXREB = 32  # stats rows (plenty for 3 frames at 2-3 re-bins each)


def main():
    import argparse
    import dataclasses

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--margin", type=float, default=0.0,
        help="graded flag margin in cells (spec.rebin_margin); reports the "
        "at-risk (flag>=1) fraction a partial re-bin would move",
    )
    ap.add_argument(
        "--policy", default="full", choices=["full", "graded"],
        help="graded: EMULATE the partial re-bin's semantics (at-risk "
        "slots re-key predictively, residents keep their current tile) "
        "through the ordinary full _bin_rows machinery — same physics and "
        "TRIGGER SCHEDULE as a real partial re-bin, without the slot "
        "surgery.  Measures the trigger-rate inflation that decides "
        "whether building the surgery is worth it (VERDICT r4 #4)",
    )
    args = ap.parse_args()

    dim, n, frames, batch, bkey, backends = B.CONFIGS["3d-1m"]
    cfg, p, dom = B._make_scene(dim, n, batch)
    spec = B._stream_spec(cfg, dom, n)
    if args.margin > 0.0:
        spec = dataclasses.replace(spec, rebin_margin=args.margin)
    tshape, origin, nt = stx._geom(dom, spec)
    mp, ma = step.no_mouse()

    st0 = jax.block_until_ready(stx.bin_particles(p, dom, spec, dt=cfg.dt))
    dep1_k = stx.make_deposit_kernel(spec, cfg.dim, tshape, origin, "p2g1")

    args_policy = args.policy  # do_rebin's parameter shadows ``args``
    cap, G, A, NG = spec.cap, spec.group, spec.A, spec.NG
    pairmode = stx._use_pair(spec, cfg.dim)
    GB = G // 2 if pairmode else G

    def slot_tiles(st):
        """[nslots] current tile id of every slot (pair-aware)."""
        if pairmode:
            c0 = st.count[0::2]
            t0 = st.tid[0::2]
            t1 = st.tid[1::2]
            s_io = jnp.arange(cap, dtype=jnp.int32)[None, :]
            return jnp.where(
                s_io < c0[:, None], t0[:, None], t1[:, None]
            ).reshape(-1)
        return jnp.repeat(st.tid, cap, total_repeat_length=A * cap)

    def rebin_graded(st):
        """Partial-policy emulation: residents keep their tile (no
        predictive refresh), flag>=1 slots re-key predictively.  The
        binning itself still runs the full gather machinery — identical
        physics and trigger schedule to a real partial re-bin."""
        D = cfg.dim
        flat, slot_valid = stx._slots_flat(st, spec, D)
        flag_slot = (st.flag >= 1.0).reshape(-1)
        cur = slot_tiles(st)
        newk = stx._keys_from_pos(
            flat[:, :D], dom, spec, tshape,
            vel=flat[:, D : 2 * D], dt=cfg.dt,
        )
        keys = jnp.where(
            slot_valid, jnp.where(flag_slot, newk, cur), nt
        )
        return stx._bin_rows(flat, keys, flat.shape[0], spec, nt, tshape)

    def stats(st, substep_i):
        # flag >= 2 = true violators (the trigger); >= 1 adds the at-risk
        # set within spec.rebin_margin cells of the window edge (the move
        # set of a partial re-bin)
        viol = (st.flag >= 2.0).sum()
        flagged = (st.flag >= 1.0).sum()
        tile_hit = (st.flag >= 1.0).any(axis=2).reshape(-1)  # [A]
        in_hit = jnp.where(tile_hit, st.count, 0).sum()
        live = st.count.sum()
        occ = (st.count > 0).sum()
        hocc = (tile_hit & (st.count > 0)).sum()
        return jnp.stack(
            [substep_i, viol, flagged, in_hit, live, occ, hocc]
        ).astype(jnp.int32)

    @jax.jit
    def run(st):
        buf = jnp.zeros((MAXREB, 7), jnp.int32)
        dep1 = dep1_k(st.count, st.tid, st.stream)

        def body(i, carry):
            st, dep1, buf, k = carry
            st, dep1n = stx._substep_core(
                st, dep1, cfg, dom, spec, mp, ma, fused=True
            )

            def do_rebin(args):
                st, buf, k = args
                buf = buf.at[jnp.minimum(k, MAXREB - 1)].set(stats(st, i))
                if args_policy == "graded":
                    st2 = rebin_graded(st)
                else:
                    st2 = stx._rebin_full(st, cfg, dom, spec, tshape, nt, n)
                return st2, dep1_k(st2.count, st2.tid, st2.stream), buf, k + 1

            return lax.cond(
                stx.needs_rebin(st, dom, spec, cfg.dim),
                do_rebin,
                lambda a: (a[0], dep1n, a[1], a[2]),
                (st, buf, k),
            )

        st, _, buf, k = lax.fori_loop(
            0, 3 * cfg.iterations, body, (st, dep1, buf, jnp.int32(0))
        )
        return buf, k, st.count.sum()

    buf, k, live = jax.block_until_ready(run(st0))
    buf = np.asarray(buf)
    for row in buf[: int(k)]:
        s, v, f, ih, lv, occ, hocc = (int(x) for x in row)
        print(
            f"substep {s:3d}: viol {v:6d} ({100*v/lv:5.3f}%)"
            f"  at-risk {f:7d} ({100*f/lv:5.2f}%)"
            f"  in-flagged-tiles {ih:7d} ({100*ih/lv:5.2f}%)"
            f"  tiles {hocc}/{occ}"
        )
    print(f"re-bins over 3 frames: {int(k)}; live {int(live)}/{n}")


if __name__ == "__main__":
    main()
