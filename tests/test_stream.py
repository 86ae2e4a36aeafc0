"""Stream-backend equivalence vs dense (SURVEY.md §4.4).

Kernels run in interpreter mode on the CPU test platform; the physics and
the persistent-binning logic (drift-triggered re-bins, id-row un-binning)
are exercised end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluid_tpu import step
from fluid_tpu.config import default_2d, default_3d
from fluid_tpu.domain import make_domain
from fluid_tpu.ops import stream_transfer as stx
from fluid_tpu.state import ParticleState


def _small_case(dim, n, seed, vel_scale=0.4, world=24.0):
    base = default_2d() if dim == 2 else default_3d()
    cfg = base.replace(
        boundary_clip=(
            tuple(0.0 for _ in range(dim)), tuple(world for _ in range(dim))
        ),
        grid_res=16,
    )
    dom = make_domain(cfg, halo_cells=4)
    key = jax.random.key(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    # spread scales with world (== the old (6, world-8) at the default 24);
    # world=16 cases exist because interpret trace cost scales with the
    # domain's tile count and this file dominates suite wall time
    pos = jax.random.uniform(k1, (n, dim), jnp.float32, world / 4, world - world / 3)
    p = ParticleState.create(pos)
    p.vel = jax.random.normal(k2, p.vel.shape) * vel_scale
    p.C = jax.random.normal(k3, p.C.shape) * 0.05
    return cfg, p, dom


def _spec(cfg, dom, n, active=None, group=2):
    import math

    # group=2 (not the production 8): the suite is TRACE/COMPILE-bound and
    # kernel-body size scales with G (G=8 -> 43 s trace+compile per substep
    # jit, G=2 -> 23 s, G=1 -> 19 s measured); two tiles per group still
    # cover the multi-tile select/loop logic.  One 3D substep test keeps
    # G=8 for production-shape coverage.
    nt = math.prod(s // 4 for s in dom.shape)
    return stx.StreamSpec(
        tile=4, cap=128, halo=2, group=group,
        active=min(active or nt, nt), interpret=True,
    )


@pytest.mark.parametrize("dim", [2, 3])
def test_stream_matches_dense_one_substep(dim):
    cfg, p, dom = _small_case(dim, 256, seed=0, world=16.0)
    # 3D keeps the production group=8 (see _spec)
    spec = _spec(cfg, dom, 256, group=8 if dim == 3 else 2)
    assert int(stx.overflow_count(p.pos, dom, spec)) == 0
    mp, ma = step.no_mouse()
    a, ga = jax.jit(lambda q: step.substep(q, cfg, dom, mp, ma, backend="dense"))(p)
    b, gb = jax.jit(lambda q: stx.substep(q, cfg, dom, mp, ma, spec))(p)
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.vel), np.asarray(b.vel), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.C), np.asarray(b.C), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.density), np.asarray(b.density), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga.mass), np.asarray(gb.mass), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga.vel), np.asarray(gb.vel), atol=1e-4)


@pytest.mark.parametrize("dim", [2, 3])
def test_stream_frame_with_rebins_matches_dense(dim):
    # fast particles force drift-triggered re-bins within a few substeps
    cfg, p, dom = _small_case(dim, 256, seed=1, vel_scale=4.0, world=16.0)
    spec = _spec(cfg, dom, 256)
    mp, ma = step.no_mouse()
    substeps = 8

    @jax.jit
    def run_dense(q):
        def body(_, q):
            return step.substep(q, cfg, dom, mp, ma)[0]

        return jax.lax.fori_loop(0, substeps, body, q)

    a = run_dense(p)
    b = stx.frame(p, cfg, dom, mp, ma, spec, substeps=substeps)
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos), atol=1e-3)
    np.testing.assert_allclose(np.asarray(a.vel), np.asarray(b.vel), atol=1e-3)
    np.testing.assert_allclose(np.asarray(a.C), np.asarray(b.C), atol=1e-3)
    # mass conserved and ids preserved (no particle lost to re-binning)
    np.testing.assert_allclose(
        float(np.asarray(b.mass).sum()), float(np.asarray(p.mass).sum()), rtol=1e-6
    )


def test_stream_pair_matches_dense():
    """PAIR mode (two tiles per slot block, one zfac dot per pair): bin
    round-trip, one substep vs dense, and a re-binning frame vs dense."""
    cfg, p, dom = _small_case(3, 256, seed=0, world=16.0)
    import dataclasses as _dc

    spec = _dc.replace(_spec(cfg, dom, 256, group=4), pair=True)
    assert stx._use_pair(spec, 3)
    mp, ma = step.no_mouse()

    # bin/unbin round-trip: conservation + exact id-ordered reconstruction
    st = stx.bin_particles(p, dom, spec, dt=cfg.dt)
    assert int(st.count.sum()) == 256, "pairing lost particles at bin time"
    # lossless pairing invariant: every slot block's two counts fit cap
    c = np.asarray(st.count)
    assert ((c[0::2] + c[1::2]) <= spec.cap).all()
    q = stx.unbin(st, dom, spec, 256, 3)
    np.testing.assert_allclose(np.asarray(q.pos), np.asarray(p.pos), atol=0)
    np.testing.assert_allclose(np.asarray(q.vel), np.asarray(p.vel), atol=0)

    a, ga = jax.jit(lambda r: step.substep(r, cfg, dom, mp, ma, backend="dense"))(p)
    b, gb = jax.jit(lambda r: stx.substep(r, cfg, dom, mp, ma, spec))(p)
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.vel), np.asarray(b.vel), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.C), np.asarray(b.C), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.density), np.asarray(b.density), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga.mass), np.asarray(gb.mass), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga.vel), np.asarray(gb.vel), atol=1e-4)

    # fast-particle frame: drift re-bins go through the pair-aware
    # _rebin_full / _compact_src path
    cfg2, p2, dom2 = _small_case(3, 256, seed=1, vel_scale=4.0, world=16.0)
    spec2 = _dc.replace(_spec(cfg2, dom2, 256, group=2), pair=True)
    substeps = 6

    @jax.jit
    def run_dense(q):
        def body(_, q):
            return step.substep(q, cfg2, dom2, mp, ma)[0]

        return jax.lax.fori_loop(0, substeps, body, q)

    a2 = run_dense(p2)
    b2 = stx.frame(p2, cfg2, dom2, mp, ma, spec2, substeps=substeps)
    np.testing.assert_allclose(np.asarray(a2.pos), np.asarray(b2.pos), atol=1e-3)
    np.testing.assert_allclose(np.asarray(a2.vel), np.asarray(b2.vel), atol=1e-3)
    np.testing.assert_allclose(
        float(np.asarray(b2.mass).sum()), float(np.asarray(p2.mass).sum()),
        rtol=1e-6,
    )


def test_stream_pair2d_matches_dense():
    """FLAT 2D pair mode (round 5): the 2D window is E^2 = 64 rows — two
    tiles' windows fill the 128 dot lanes exactly (_kernel_w0_pair), one
    window dot per pair in deposit/g2p/fused-p2g1.  Same coverage as the 3D
    pair test: bin round-trip, one substep vs dense, re-binning frame."""
    cfg, p, dom = _small_case(2, 256, seed=0, world=16.0)
    import dataclasses as _dc

    spec = _dc.replace(_spec(cfg, dom, 256, group=4), pair=True)
    assert stx._use_pair(spec, 2) and stx._use_pair2(spec, 2)
    mp, ma = step.no_mouse()

    st = stx.bin_particles(p, dom, spec, dt=cfg.dt)
    assert int(st.count.sum()) == 256, "pairing lost particles at bin time"
    c = np.asarray(st.count)
    assert ((c[0::2] + c[1::2]) <= spec.cap).all()
    q = stx.unbin(st, dom, spec, 256, 2)
    np.testing.assert_allclose(np.asarray(q.pos), np.asarray(p.pos), atol=0)
    np.testing.assert_allclose(np.asarray(q.vel), np.asarray(p.vel), atol=0)

    a, ga = jax.jit(lambda r: step.substep(r, cfg, dom, mp, ma, backend="dense"))(p)
    b, gb = jax.jit(lambda r: stx.substep(r, cfg, dom, mp, ma, spec))(p)
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.vel), np.asarray(b.vel), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.C), np.asarray(b.C), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.density), np.asarray(b.density), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga.mass), np.asarray(gb.mass), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga.vel), np.asarray(gb.vel), atol=1e-4)

    # fast-particle frame: fused collect + pair-aware re-bins
    cfg2, p2, dom2 = _small_case(2, 256, seed=1, vel_scale=4.0, world=16.0)
    spec2 = _dc.replace(_spec(cfg2, dom2, 256, group=2), pair=True)
    substeps = 6

    @jax.jit
    def run_dense(q):
        def body(_, q):
            return step.substep(q, cfg2, dom2, mp, ma)[0]

        return jax.lax.fori_loop(0, substeps, body, q)

    a2 = run_dense(p2)
    b2 = stx.frame(p2, cfg2, dom2, mp, ma, spec2, substeps=substeps)
    np.testing.assert_allclose(np.asarray(a2.pos), np.asarray(b2.pos), atol=1e-3)
    np.testing.assert_allclose(np.asarray(a2.vel), np.asarray(b2.vel), atol=1e-3)
    np.testing.assert_allclose(
        float(np.asarray(b2.mass).sum()), float(np.asarray(p2.mass).sum()),
        rtol=1e-6,
    )


def test_stream_mhalo_pallas_matches_dense():
    """spec.mhalo == "pallas" (dyn-bounded separable mass halo through the
    GATED nbrg tables, replacing the halo_pull gather) must be physics-
    identical: a fast-particle frame vs dense, whose drift re-bins rebuild
    nbrg mid-run.  One geometry only (suite budget, round 5): the frame is
    a strict superset of the old single-substep check — every substep runs
    the mhalo=pallas axis kernels."""
    import dataclasses as _dc

    mp, ma = step.no_mouse()
    cfg2, p2, dom2 = _small_case(3, 192, seed=1, vel_scale=4.0, world=12.0)
    spec2 = _dc.replace(_spec(cfg2, dom2, 192, group=2), mhalo="pallas")
    substeps = 6

    @jax.jit
    def run_dense(q):
        def body(_, q):
            return step.substep(q, cfg2, dom2, mp, ma)[0]

        return jax.lax.fori_loop(0, substeps, body, q)

    a2 = run_dense(p2)
    b2 = stx.frame(p2, cfg2, dom2, mp, ma, spec2, substeps=substeps)
    np.testing.assert_allclose(np.asarray(a2.pos), np.asarray(b2.pos), atol=1e-3)
    np.testing.assert_allclose(np.asarray(a2.vel), np.asarray(b2.vel), atol=1e-3)


def test_stream_rebin_triggers():
    """Drift-flag firing in isolation.  Default-suite (VERDICT r3 #6):
    trigger firing is the precondition every frame-with-rebins equivalence
    test rests on, so a regression must fail CI — geometry shrunk (world
    16 -> 12, n 256 -> 192, vel_scale 8 -> 24 so the flag fires on the
    FIRST substep) instead of slow-marking it; the remaining ~20 s is the
    one-substep interpret trace, which geometry cannot shrink.  (2D was
    tried and does not drift far enough at the 2D dt.)"""
    cfg, p, dom = _small_case(3, 192, seed=2, vel_scale=24.0, world=12.0)
    spec = _spec(cfg, dom, 192)
    st = stx.bin_particles(p, dom, spec)
    mp, ma = step.no_mouse()
    fired = False
    for _ in range(2):
        st = stx.substep_binned(st, cfg, dom, spec, mp, ma)
        if bool(stx.needs_rebin(st, dom, spec, cfg.dim)):
            fired = True
            break
    assert fired, "drift check never fired with fast particles"


def test_graded_flag_matches_numpy_predicate():
    """rebin_margin > 0: the collect kernel's graded flag must (a) leave the
    physics bit-identical to margin=0, (b) emit flag>=2 exactly on the old
    binary violation set, and (c) emit flag>=1 exactly on the numpy at-risk
    predicate (float local coord within margin of the drift window edge)."""
    import dataclasses as _dc

    # vel_scale=12 with this seed produces BOTH graded levels (measured on
    # the CPU suite: 25 at-risk flag=1 slots and 3 flag=2 violations), so
    # assertions (b) and (c) below are exercised for real — guarded by the
    # non-vacuity asserts so a reshuffle can't silently re-vacuate them
    cfg, p, dom = _small_case(2, 128, seed=4, vel_scale=12.0, world=12.0)
    spec0 = _spec(cfg, dom, 128)
    specm = _dc.replace(spec0, rebin_margin=0.5)
    mp, ma = step.no_mouse()

    st0 = stx.bin_particles(p, dom, spec0, dt=cfg.dt)
    a = stx.substep_binned(st0, cfg, dom, spec0, mp, ma)
    b = stx.substep_binned(st0, cfg, dom, specm, mp, ma)

    np.testing.assert_array_equal(np.asarray(a.stream), np.asarray(b.stream))
    fa = np.asarray(a.flag)
    fb = np.asarray(b.flag)
    assert set(np.unique(fb)) <= {0.0, 1.0, 2.0}
    assert (fb == 1.0).sum() > 0, "vacuous: no at-risk slot fired"
    assert (fb == 2.0).sum() > 0, "vacuous: no violation slot fired"
    np.testing.assert_array_equal(fa > 0.0, fb >= 2.0)

    # numpy at-risk predicate per valid slot, from the post-substep stream
    T, h, m = spec0.tile, spec0.halo, specm.rebin_margin
    cap, G = spec0.cap, spec0.group
    tshape, origin, nt = stx._geom(dom, spec0)
    stream = np.asarray(b.stream)  # [NG, F, G*cap]
    count = np.asarray(b.count).reshape(-1)
    tid = np.asarray(b.tid).reshape(-1)
    NG = stream.shape[0]
    for ng in range(NG):
        for g in range(G):
            t = ng * G + g
            coords = [
                (tid[t] // int(np.prod(tshape[d + 1 :]))) % tshape[d]
                for d in range(2)
            ]
            for s in range(count[t]):
                lane = g * cap + s
                want = 0.0
                for d in range(2):
                    base = origin[d] + coords[d] * T
                    x = stream[ng, d, lane]
                    lcn = int(np.floor(x)) - base
                    if lcn < 1 - h or lcn > T - 2 + h:
                        want = 2.0
                    lx = x - base
                    if want < 2.0 and (lx < 1 - h + m or lx >= T - 1 + h - m):
                        want = max(want, 1.0)
                got = fb[ng, g, s]
                assert got == want, (t, s, got, want)


def test_stream_mouse_matches_dense():
    cfg, p, dom = _small_case(2, 192, seed=3, world=16.0)
    spec = _spec(cfg, dom, 192)
    mp, ma = step.mouse((8.0, 8.0))
    a, _ = jax.jit(lambda q: step.substep(q, cfg, dom, mp, ma, backend="dense"))(p)
    b, _ = jax.jit(lambda q: stx.substep(q, cfg, dom, mp, ma, spec))(p)
    np.testing.assert_allclose(np.asarray(a.vel), np.asarray(b.vel), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos), atol=1e-5)


def test_packed_scenes_match_per_scene_dense():
    """scene.pack_scenes: B scenes side-by-side in one domain must evolve
    exactly like B independent dense simulations (per-scene walls)."""
    import math

    from fluid_tpu import scene as scene_mod
    from fluid_tpu.config import default_3d

    # 12-unit worlds (round 5 suite budget): interpret trace cost scales
    # with the packed domain's tile count; 2x12 packs to ~60% of 2x16
    cfg = default_3d().replace(
        boundary_clip=((0.0,) * 3, (12.0,) * 3), grid_res=12
    )
    B, n = 2, 96
    key = jax.random.key(5)
    pos = jax.random.uniform(key, (B, n, 3), jnp.float32, 3.0, 9.0)
    pb = jax.vmap(ParticleState.create)(pos)
    vel = jax.random.normal(jax.random.key(6), pb.vel.shape) * 2.0
    import dataclasses as _dc

    pb = _dc.replace(pb, vel=vel)

    packed, dom, stride = scene_mod.pack_scenes(pb, cfg)
    nt = math.prod(s // 4 for s in dom.shape)
    spec = stx.StreamSpec(
        tile=4, cap=128, halo=2, group=2, active=nt,
        scene_stride=stride, interpret=True,
    )
    assert int(stx.overflow_count(packed.pos, dom, spec)) == 0
    mp, ma = step.no_mouse()
    out = stx.frame(packed, cfg, dom, mp, ma, spec, substeps=3)
    got = scene_mod.unpack_scenes(out, B, n, stride)

    # reference: each scene independently through the dense backend
    sdom = make_domain(cfg, halo_cells=4)

    @jax.jit
    def dense4(q):
        def body(_, q):
            return step.substep(q, cfg, sdom, mp, ma)[0]

        return jax.lax.fori_loop(0, 3, body, q)

    for b in range(B):
        want = dense4(jax.tree.map(lambda a: a[b], pb))
        np.testing.assert_allclose(
            np.asarray(got.pos[b]), np.asarray(want.pos), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(got.vel[b]), np.asarray(want.vel), atol=1e-3
        )


def test_rebin_overflow_detected_by_count_sum():
    """A cap-squeeze re-bin must surface as sum(count) < n (the invariant
    the bench asserts after every timed stream run).  Forces all particles
    into one tile mid-run by rebinning a state whose positions were packed
    beyond cap, and checks the loss is visible — not silent."""
    cfg, p, dom = _small_case(3, 512, seed=9, vel_scale=0.0)
    spec = _spec(cfg, dom, 512)
    st = stx.bin_particles(p, dom, spec)
    assert int(st.count.sum()) == 512
    # squeeze: move every particle into the same cell, then re-bin — one
    # tile holds 512 > cap=128 slots, so the re-bin must drop rows
    D = 3
    flat, _ = stx._slots_flat(st, spec)
    rows = flat.at[:, 0:D].set(10.0)
    tshape, nt = stx._tile_geometry(dom, spec)
    src = stx._compact_src(st.count, 512, spec.cap, spec.A)
    live_rows = jnp.take(rows, src, axis=0)
    tid = stx._keys_from_pos(live_rows[:, 0:D], dom, spec, tshape)
    st2 = stx._bin_rows(live_rows, tid, 512, spec, nt, tshape)
    lost = 512 - int(st2.count.sum())
    assert lost == 512 - spec.cap, "cap squeeze must drop exactly n - cap rows"
    assert int(st2.count.sum()) != 512, "loss must be detectable via sum(count)"


def test_halo_gblk_kernel_matches_xla_update_path():
    """The fused last-halo-pass + grid-update kernel (_make_halo_gblk) is
    TPU-only in _substep_core; run it in interpret mode and check it against
    the halo3 + XLA grid-update build the CPU branch uses (ADVICE r2)."""
    cfg, p, dom = _small_case(3, 384, seed=7, world=16.0)
    spec = _spec(cfg, dom, 384)
    st = stx.bin_particles(p, dom, spec)
    D = 3
    A, E3 = spec.A, spec.E**3
    S1 = E3 // 128
    key = jax.random.key(11)
    k1, k2 = jax.random.split(key)
    mf3 = jax.random.normal(k1, (A, D * S1, 128), jnp.float32)
    # mass with zero rows mixed in (masked grid-update path)
    m_raw = jax.random.uniform(k2, (A, S1, 128), jnp.float32, -0.5, 2.0)
    hs_m3 = jnp.maximum(m_raw, 0.0)
    g = jnp.asarray(cfg.gravity, jnp.float32)

    # XLA reference: full halo (gather form) then masked update
    hs_mf3 = stx.halo3(mf3, st.nbr, spec, D, D)
    mfv = hs_mf3.reshape(A, D, S1, 128)
    mav = hs_m3[:, None]
    vv = jnp.where(
        mav > 0.0,
        mfv / jnp.where(mav > 0.0, mav, 1.0) + cfg.dt * g[None, :, None, None],
        0.0,
    )
    ref = jnp.concatenate([vv.reshape(A, D * S1, 128), hs_m3], axis=1)

    # kernel path: D-1 axis-pass kernels then the fused gblk kernel
    x = mf3
    for d in range(D - 1):
        x = stx._make_halo_axis(spec, D, d, D)(x, st.nbr[2 * d], st.nbr[2 * d + 1])
    got = stx._make_halo_gblk(spec, D, D - 1, cfg.dt, cfg.gravity)(
        x, hs_m3, st.nbr[2 * (D - 1)], st.nbr[2 * (D - 1) + 1]
    )
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(got), atol=1e-6, rtol=1e-6
    )


def test_halo_dma_gating_matches_ungated():
    """_substep_core's halo DMA source gating (neighbors with still-zero
    blocks routed to the A sentinel) is exact: on blocks that are zero
    wherever count == 0 — the deposit-kernel invariant — the gated axis
    passes are bit-identical to the ungated ones.

    Default-suite (VERDICT r3 #6): a gating regression must fail CI, so
    this runs un-marked on a DETERMINISTIC diagonal-cluster scene.  A
    random box scene no longer works as the precondition: the round-3
    needed-relay closure only creates zero-count shell relays between
    DIAGONALLY adjacent occupied tiles, and a dense random blob has
    occupied relays everywhere (the old seed measured n_gated == 0 —
    vacuous, which the skipped suite never caught)."""
    import dataclasses as _dc

    cfg, p0, dom = _small_case(3, 64, seed=5, world=16.0)
    # two occupied tile clusters on a cube diagonal: their relay tiles
    # (e.g. (tx+1, ty, tz)) are zero-count closure shells, so the gate
    # has real work even under the tight relay closure
    pos = np.tile(np.asarray([[9.0, 9.0, 9.0], [13.5, 13.5, 13.5]]), (32, 1))
    pos += np.random.default_rng(5).uniform(-0.4, 0.4, pos.shape)
    p = _dc.replace(
        p0, pos=jnp.asarray(pos, jnp.float32)[: p0.n], vel=jnp.zeros_like(p0.vel)
    )
    spec = _spec(cfg, dom, 64)
    st = stx.bin_particles(p, dom, spec)
    D, A = 3, spec.A
    S1 = spec.E**3 // 128
    key = jax.random.key(17)
    mf3 = jax.random.normal(key, (A, D * S1, 128), jnp.float32)
    mf3 = jnp.where((st.count > 0)[:, None, None], mf3, 0.0)

    ref = mf3
    got = mf3
    nbrg = stx._gated_nbr(st.nbr, st.count, A, D)
    n_gated = int((np.asarray(nbrg) == A).sum() - (np.asarray(st.nbr) == A).sum())
    assert n_gated > 0, "case must actually gate some DMAs"
    for d in range(D):
        k = stx._make_halo_axis(spec, D, d, D)
        ref = k(ref, st.nbr[2 * d], st.nbr[2 * d + 1])
        got = k(got, nbrg[2 * d], nbrg[2 * d + 1])
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.slow  # big-tile is measured-dead and defaults OFF everywhere
def test_stream_flat3d_big_tile_matches_dense():
    """3D FLAT (non-rank-3) kernel path: tile=8 -> E=12, E^3=1728 % 128 != 0,
    so _use_r3 is False and the substep takes the EP-lane-padded branch (the
    layout of the big-tile contraction plan, BASELINE.md round 3).  One
    substep plus a short frame with re-bins, vs dense."""
    cfg, p, dom = _small_case(3, 256, seed=4, world=16.0)
    import math as _m

    nt = _m.prod(s // 8 for s in dom.shape)
    # wchunk=128 -> 2 window chunks per tile: exercises the chunked flat
    # deposit/rho/g2p/fused-p2g1 dots (the [E^3, cap] window never exists)
    spec = stx.StreamSpec(
        tile=8, cap=256, halo=2, group=1, active=nt, interpret=True,
        wchunk=128,
    )
    assert not stx._use_r3(spec, 3) and spec.E == 12
    assert stx._wchunk(spec, 3) == 128
    assert int(stx.overflow_count(p.pos, dom, spec)) == 0
    mp, ma = step.no_mouse()
    a, ga = jax.jit(lambda q: step.substep(q, cfg, dom, mp, ma, backend="dense"))(p)
    b, gb = jax.jit(lambda q: stx.substep(q, cfg, dom, mp, ma, spec))(p)
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.vel), np.asarray(b.vel), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.C), np.asarray(b.C), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.density), np.asarray(b.density), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga.mass), np.asarray(gb.mass), atol=1e-4)

    # short frame with drift-triggered re-bins at the big-tile geometry
    cfg2, p2, dom2 = _small_case(3, 256, seed=6, vel_scale=4.0, world=16.0)
    a2 = p2

    @jax.jit
    def run_dense(q):
        def body(_, q):
            return step.substep(q, cfg2, dom2, mp, ma)[0]

        return jax.lax.fori_loop(0, 6, body, q)

    a2 = run_dense(p2)
    b2 = stx.frame(p2, cfg2, dom2, mp, ma, spec, substeps=6)
    np.testing.assert_allclose(np.asarray(a2.pos), np.asarray(b2.pos), atol=1e-3)
    np.testing.assert_allclose(np.asarray(a2.vel), np.asarray(b2.vel), atol=1e-3)


def test_halo3_kernel_matches_gather_form():
    """The Pallas separable halo (interpret) is bit-identical to the XLA
    gather form it replaces on TPU (stream_transfer.halo3)."""
    cfg, p, dom = _small_case(3, 384, seed=3, world=16.0)
    spec = _spec(cfg, dom, 384)
    st = stx.bin_particles(p, dom, spec)
    A = spec.A
    E3 = spec.E ** 3
    for CH in (1, 3):
        key = jax.random.key(CH)
        x = jax.random.uniform(key, (A, CH * E3), jnp.float32)
        ref = stx.halo_pull(x, st.nbr, (0, 0, 0), spec.tile, spec.E)
        got = stx.halo3(
            x.reshape(A, CH * E3 // 128, 128), st.nbr, spec, 3, CH,
            force_kernel=True,
        ).reshape(A, CH * E3)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("tshape", [(7, 5), (5, 4, 6)])
def test_active_set_covers_all_relays(tshape):
    """_active_set must contain every relay the separable halo (axis passes
    0..D-1) routes a deposit flow through: for occupied u, w with
    |u-w|_inf <= 1 the intermediates (w0,u1,..) after pass 0 and
    (w0,w1,u2) after pass 1 — brute-forced over random occupancy maps."""
    import itertools
    import math

    D = len(tshape)
    nt = math.prod(tshape)
    rng = np.random.default_rng(0)
    for density in (0.03, 0.15, 0.5):
        occ = rng.random(nt) < density
        act = np.asarray(stx._active_set(jnp.asarray(occ), tshape)).reshape(tshape)
        o = occ.reshape(tshape)
        assert (act | ~o).all(), "occupied tiles must stay active"
        occ_idx = list(zip(*np.nonzero(o)))
        for u in occ_idx:
            for dvec in itertools.product((-1, 0, 1), repeat=D):
                w = tuple(u[d] + dvec[d] for d in range(D))
                if any(not (0 <= w[d] < tshape[d]) for d in range(D)):
                    continue
                if not o[w]:
                    continue
                r1 = (w[0],) + u[1:]  # after pass 0
                assert act[r1], f"missing pass-0 relay {r1} for {u}->{w}"
                if D == 3:
                    r2 = (w[0], w[1], u[2])  # after pass 1
                    assert act[r2], f"missing pass-1 relay {r2} for {u}->{w}"


def test_shell_drop_watermark_on_budget_exhaustion():
    """Dropping a needed zero-count relay tile loses no particles (so the
    sum(count) conservation check cannot see it) but must set the
    shell_drop watermark."""
    cfg, p, dom = _small_case(2, 8, seed=1, world=16.0)
    # two occupied tiles, diagonal: place 4 particles in each
    pos = np.zeros((8, 2), np.float32)
    pos[:4] = [5.0, 5.0]
    pos[4:] = [10.0, 10.0]
    p = ParticleState.create(jnp.asarray(pos))
    spec_ok = _spec(cfg, dom, 8)
    st_ok = stx.bin_particles(p, dom, spec_ok)
    assert int(st_ok.count.sum()) == 8
    assert int(st_ok.shell_drop.max()) == 0

    # active budget exactly the occupied count: both occupied tiles fit
    # (conservation holds) but their relays do not
    spec_tight = _spec(cfg, dom, 8, active=2)
    st = stx.bin_particles(p, dom, spec_tight)
    assert int(st.count.sum()) == 8, "no particle loss — only relays dropped"
    assert int(st.shell_drop.max()) > 0, "relay drop must set the watermark"
