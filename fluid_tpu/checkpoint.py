"""Checkpoint / resume.

The reference has none (SURVEY.md §5.4): state lives only in memory and the
sole export surface is ``iter_particle()`` (``2d_multi.rs:361-366``).  Here
the SoA state round-trips through ``.npz`` (plus config metadata for a
validity check), which also backs the golden-regression fixtures.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .config import Config
from .state import ParticleState

_FIELDS = ("pos", "vel", "C", "mass", "density", "pressure")


def save(path, p: ParticleState, cfg: Config, frame: int = 0) -> None:
    arrays = {f: np.asarray(getattr(p, f)) for f in _FIELDS}
    meta = json.dumps({"config": dataclasses.asdict(cfg), "frame": frame})
    np.savez(path, __meta__=np.frombuffer(meta.encode(), np.uint8), **arrays)


def load(path) -> Tuple[ParticleState, Config, int]:
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        p = ParticleState(**{f: jnp.asarray(z[f]) for f in _FIELDS})
    c = meta["config"]
    c["gravity"] = tuple(c["gravity"])
    c["boundary_clip"] = tuple(tuple(b) for b in c["boundary_clip"])
    return p, Config(**c), meta["frame"]
