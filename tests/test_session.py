"""Session (persistent-state frame driver) — the public interactive loop.

Covers VERDICT r2 #6: binned stream state held across frames, device-side
histogram from the binned layout, conservation checking, and equivalence
with the per-frame step.frame path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluid_tpu import render, scene, step
from fluid_tpu.config import default_2d
from fluid_tpu.session import Session, default_backend


def _case(iterations=2, n=512):
    # compact domain (32^2, 16-cell chunks) keeps interpret-mode kernel
    # grids small — the default 160^2 reference domain costs ~6x the wall
    # time for identical coverage
    cfg = default_2d().replace(
        iterations=iterations,
        boundary_clip=((0.0, 0.0), (32.0, 32.0)),
        grid_res=16,
    )
    from fluid_tpu.domain import make_domain

    p, _ = scene.dam_break(
        jax.random.key(0), cfg, n=n, box=((8.0, 8.0), (24.0, 24.0))
    )
    return cfg, p, make_domain(cfg, halo_cells=4)


def test_default_backend_is_platform_appropriate():
    # CPU test platform -> dense; the stream hot path is TPU-only
    assert default_backend() == "dense"


def test_session_stream_matches_step_frame_across_frames():
    cfg, p, dom = _case()
    p2 = jax.tree.map(jnp.copy, p)
    sess = Session(cfg, dom, p, backend="stream")
    for _ in range(3):
        sess.frame()
    got = sess.particles()
    for _ in range(3):
        p2 = step.frame(p2, cfg, dom, *step.no_mouse(), "stream")
    np.testing.assert_allclose(
        np.asarray(got.pos), np.asarray(p2.pos), atol=1e-4
    )
    assert sess.live_count() == 512


def test_session_fused_run_matches_per_frame():
    # Session.run(k) fuses k frames into ONE device program (bench timing
    # path); it must be bit-identical to k frame() calls — same nested
    # fori body, re-bin conds included — and carry the rebins counter.
    cfg, p, dom = _case()
    p2 = jax.tree.map(jnp.copy, p)
    sa = Session(cfg, dom, p, backend="stream")
    for _ in range(3):
        sa.frame()
    sb = Session(cfg, dom, p2, backend="stream")
    sb.compile_run(3)  # AOT path: compile off the clock, run uses it
    sb.run(3)
    qa, qb = sa.particles(), sb.particles()
    np.testing.assert_array_equal(np.asarray(qa.pos), np.asarray(qb.pos))
    np.testing.assert_array_equal(np.asarray(qa.vel), np.asarray(qb.vel))
    assert sa.rebins() == sb.rebins()
    assert sb.live_count() == 512


def test_session_histogram_matches_unbinned_render():
    cfg, p, dom = _case()
    sess = Session(cfg, dom, p, backend="stream")
    sess.frame()
    hist = np.asarray(sess.histogram(render.DEFAULT_VIEWPORT, render.DEFAULT_CONSOLE))
    ref = np.asarray(
        render.histogram(
            sess.particles().pos,
            jnp.asarray(render.DEFAULT_VIEWPORT, jnp.float32),
            render.DEFAULT_CONSOLE,
        )
    )
    np.testing.assert_array_equal(hist, ref)


def test_session_dense_backend_same_api():
    cfg, p, dom = _case()
    sess = Session(cfg, dom, p, backend="dense")
    sess.frame(step.mouse((32.0, 32.0)))
    out = sess.particles()
    assert np.isfinite(np.asarray(out.pos)).all()
    lines = sess.render(render.DEFAULT_VIEWPORT, render.DEFAULT_CONSOLE)
    assert len(lines) == render.DEFAULT_CONSOLE[1]


def test_session_rejects_overflowing_spec():
    from fluid_tpu.ops import stream_transfer as stx

    cfg, p, dom = _case()
    tiny = stx.StreamSpec(tile=4, cap=128, halo=2, group=8, active=8, interpret=True)
    with pytest.raises(ValueError, match="overflow"):
        Session(cfg, dom, p, backend="stream", spec=tiny)


def test_session_snapshot_restore_replays_bit_identical():
    """snapshot/restore must replay the SAME span bit-identically through
    the warm jitted program (bench.py warms `run` untimed, then restores so
    the timed span measures frames 0..k, not k..2k — the warm span must not
    change what is measured)."""
    cfg, p, dom = _case()
    cfg = cfg.replace(iterations=3)
    sess = Session(cfg, dom, p, backend="stream", strict=False)
    sess.frame()
    snap = sess.snapshot()
    sess.run(2)
    a = np.asarray(sess.particles().pos)
    sess.restore(snap)
    sess.run(2)
    b = np.asarray(sess.particles().pos)
    np.testing.assert_array_equal(a, b)
    # the snapshot survives a second restore (run donates its input buffers)
    sess.restore(snap)
    sess.run(2)
    np.testing.assert_array_equal(a, np.asarray(sess.particles().pos))
