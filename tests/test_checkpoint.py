"""Checkpoint round-trip tests (SURVEY.md §5.4)."""

import jax
import numpy as np

from fluid_tpu import checkpoint, scene, step
from fluid_tpu.config import default_3d


def test_roundtrip(tmp_path):
    cfg = default_3d()
    p, dom = scene.dam_break(jax.random.key(0), cfg, n=128)
    p = step.frame(p, cfg, dom, *step.no_mouse())
    path = tmp_path / "ckpt.npz"
    checkpoint.save(path, p, cfg, frame=7)
    p2, cfg2, frame = checkpoint.load(path)
    assert cfg2 == cfg and frame == 7
    for f in ("pos", "vel", "C", "mass", "density", "pressure"):
        np.testing.assert_array_equal(np.asarray(getattr(p, f)), np.asarray(getattr(p2, f)))


def test_resume_continues_identically(tmp_path):
    cfg = default_3d()
    p, dom = scene.dam_break(jax.random.key(1), cfg, n=128)
    p1 = step.frame(p, cfg, dom, *step.no_mouse())
    checkpoint.save(tmp_path / "c.npz", p1, cfg)
    p1b, cfg_b, _ = checkpoint.load(tmp_path / "c.npz")
    a = step.frame(p1, cfg, dom, *step.no_mouse())
    b = step.frame(p1b, cfg_b, dom, *step.no_mouse())
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
