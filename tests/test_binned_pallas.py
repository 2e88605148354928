"""Fused Pallas kernels (ops/binned_kernels.py) vs the XLA slot-grid engine.

Runs in Pallas interpret mode on the CPU test mesh; the same kernels are
verified on real TPU hardware by the benchmark path.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import epoch_tpu.constants as const
from epoch_tpu.core.grid import Grid
from epoch_tpu.core.config import SimConfig, SpeciesConfig
from epoch_tpu.core import binned as binmod


def _setup(n=(16, 8), K=8, bc_x=const.BC.PERIODIC, n_aux=0):
    nd = 2
    dxv = 1e-6
    grid = Grid(ndims=nd, shape_fn=const.Shape.TRIANGLE, n=n,
                cpml_thickness=0, cpml_active=(False,) * (2 * nd),
                lo=(0.0,) * nd, hi=tuple(ni * dxv for ni in n))
    dt = 0.9 * dxv / (const.c * np.sqrt(nd))
    sp = SpeciesConfig(name="e", charge=-const.q0, mass=const.m0, cap=512,
                       bc_particle=(bc_x, bc_x) + (const.BC.PERIODIC,) * 4)
    cfg = SimConfig(grid=grid, dt=dt, t_end=1.0, nsteps=-1,
                    bc_field=(const.BC.PERIODIC,) * 6,
                    bc_particle=(const.BC.PERIODIC,) * 6,
                    species=(sp,), lasers=(), dtype=np.float32)
    # id rows: every species routes them (species_uses_aux) — the names
    # only matter for the routing-eligibility check, not the kernel
    aux_names = ("id_lo", "id_hi")[:n_aux]
    cfg = dataclasses.replace(cfg, bin_k=K, binned_aux=aux_names)
    plan = binmod.BinnedPlan(cfg)
    rng = np.random.default_rng(3)
    NP = int(np.prod(n))            # ~1 ppc: no slot overflow
    x0 = np.stack([rng.uniform(0, grid.hi[d], NP) for d in range(nd)], 1)
    p0 = rng.normal(scale=3e-22, size=(NP, 3))
    w0 = rng.uniform(1, 2, NP)
    bm = binmod.bin_from_arrays(x0.astype(np.float32),
                                p0.astype(np.float32),
                                w0.astype(np.float32), grid, K=K,
                                n_aux=n_aux)
    if n_aux:
        # aux values tied to the particle weight: routing must keep the
        # (w, aux) pairing intact through every rebin
        fns = (lambda w: 10.0 * w, lambda w: -3.0 * w)
        aux = jnp.stack([jnp.where(bm.w > 0, f(bm.w), 0.0)
                         for f in fns[:n_aux]])
        bm = bm._replace(aux=aux)
    vals = {nm: jnp.asarray(rng.normal(size=n) * 1e3, jnp.float32)
            for nm in ("ex", "ey", "ez", "bx", "by", "bz")}
    return cfg, plan, sp, grid, bm, vals


@pytest.mark.parametrize("bc_name", ["periodic", "open", "reflect"])
def test_pallas_matches_xla_engine(bc_name):
    """Pallas vs XLA slot-grid engine: identical discretisation, so they
    must agree to f32 round-off for periodic AND bounded particle BCs."""
    bc_x = {"periodic": const.BC.PERIODIC, "open": const.BC.OPEN,
            "reflect": const.BC.REFLECT}[bc_name]
    cfg, plan, sp, grid, bm, interior = _setup(bc_x=bc_x)
    engines = binmod.make_pallas_engines(cfg, plan, interpret=True)
    eng = engines[0]
    assert eng is not None
    names = ("ex", "ey", "ez", "bx", "by", "bz")
    fstack = jnp.stack([interior[nm] for nm in names], axis=0)
    fpad = jnp.pad(fstack, ((0, 0), (2, 2), (2, 2)), mode="wrap")
    fwin = eng.make_fwin(fpad)
    bc = sp.bc_particle[:4]

    b_x = bm
    b_p = bm
    for step in range(4):
        b_x, jpad_x = binmod.push_deposit_binned(fpad, b_x, sp, plan,
                                                 bc=bc)
        b_p, jpart = binmod.push_deposit_pallas(eng, fwin, b_p, plan)
        jpad_p = eng.fold_jpart(jpart)
        for c in range(3):
            scale = max(float(jnp.abs(jpad_x[c]).max()), 1e-30)
            err = float(jnp.abs(jpad_x[c] - jpad_p[c]).max()) / scale
            assert err < 1e-5, (step, c, err)
        periodic = (bc_x == const.BC.PERIODIC, True)
        xx, px, wx, ax = binmod.to_flat(b_x, grid, periodic=periodic)
        xp, pp, wp, ap = binmod.to_flat(b_p, grid, periodic=periodic)
        assert ax.sum() == ap.sum()
        for d in range(2):
            sx = np.sort(xx[ax][:, d])
            sp_ = np.sort(xp[ap][:, d])
            np.testing.assert_allclose(sx, sp_, rtol=0, atol=1e-11)
        assert int(b_x.n_dropped) == 0
        assert int(b_p.n_dropped) == 0


def test_pallas_aux_payload_routing():
    """Aux rows (optical depths) ride the fused kernel's extra-payload
    rebin routing: after several pushes the (w, aux) pairing must be
    intact on every live slot, and match the XLA engine's routing."""
    cfg, plan, sp, grid, bm, interior = _setup(n_aux=2)
    assert plan.n_aux == 2
    engines = binmod.make_pallas_engines(cfg, plan, interpret=True)
    eng = engines[0]
    assert eng is not None and eng.n_extra == 2
    names = ("ex", "ey", "ez", "bx", "by", "bz")
    fstack = jnp.stack([interior[nm] for nm in names], axis=0)
    fpad = jnp.pad(fstack, ((0, 0), (2, 2), (2, 2)), mode="wrap")
    fwin = eng.make_fwin(fpad)
    b_x, b_p = bm, bm
    for step in range(4):
        b_x, _ = binmod.push_deposit_binned(fpad, b_x, sp, plan)
        b_p, _ = binmod.push_deposit_pallas(eng, fwin, b_p, plan)
        for b in (b_x, b_p):
            live = b.w > 0
            np.testing.assert_allclose(
                np.asarray(jnp.where(live, b.aux[0], 0.0)),
                np.asarray(jnp.where(live, 10.0 * b.w, 0.0)), rtol=1e-6)
            np.testing.assert_allclose(
                np.asarray(jnp.where(live, b.aux[1], 0.0)),
                np.asarray(jnp.where(live, -3.0 * b.w, 0.0)), rtol=1e-6)
        assert int(jnp.sum(b_x.w > 0)) == int(jnp.sum(b_p.w > 0))


def test_pallas_aux_skip_for_non_users():
    """A species that never reads its aux rows (species_uses_aux False —
    e.g. ions in a QED deck) skips the extra-payload routing entirely:
    its engine routes 0 rows and push_deposit_pallas passes the zero
    rows through untouched."""
    cfg, plan, sp, grid, bm, interior = _setup(n_aux=2)
    import dataclasses as dc
    cfg = dc.replace(cfg, binned_aux=("opdepth", "qed_eta"))
    plan = binmod.BinnedPlan(cfg)
    assert not binmod.species_uses_aux(cfg, 0)
    engines = binmod.make_pallas_engines(cfg, plan, interpret=True)
    eng = engines[0]
    assert eng is not None and eng.n_extra == 0
    names = ("ex", "ey", "ez", "bx", "by", "bz")
    fstack = jnp.stack([interior[nm] for nm in names], axis=0)
    fpad = jnp.pad(fstack, ((0, 0), (2, 2), (2, 2)), mode="wrap")
    fwin = eng.make_fwin(fpad)
    zaux = jnp.zeros_like(bm.aux)
    b = bm._replace(aux=zaux)
    for _ in range(3):
        b, _ = binmod.push_deposit_pallas(eng, fwin, b, plan)
    assert b.aux.shape == zaux.shape
    assert float(jnp.abs(b.aux).max()) == 0.0


PROBE_DECK_2D = """
begin:control
  nx = 32
  ny = 8
  t_end = 1.0
  nsteps = {nsteps}
  x_min = 0
  x_max = 32e-6
  y_min = 0
  y_max = 8e-6
end:control
begin:boundaries
  bc_x_min = simple_outflow
  bc_x_max = simple_outflow
  bc_y_min = periodic
  bc_y_max = periodic
end:boundaries
begin:species
  name = beam
  charge = -1
  mass = 1.0
  number_density = if(x lt 8e-6, 1e18, 0)
  nparticles_per_cell = 4
  drift_px = 5e-23
end:species
begin:probe
  name = midplane
  point = (16e-6, 0)
  normal = (1, 0)
  include_species:beam
end:probe
begin:output
  dt_snapshot = 1
end:output
"""


def test_pallas_probe_capture_matches_xla(tmp_path, monkeypatch):
    """Probe plane distances ride the fused kernel's extra rows; the
    crossing records must match the XLA binned engine's capture."""
    from epoch_tpu.core import Simulation

    def run(mode):
        monkeypatch.setenv("EPOCH_TPU_PALLAS", mode)
        d = tmp_path / f"m{mode}"
        d.mkdir(exist_ok=True)
        (d / "input.deck").write_text(PROBE_DECK_2D.format(nsteps=220))
        sim = Simulation(str(d / "input.deck"), seed=11)
        assert sim.cfg.engine == "binned"
        st = sim.run(max_steps=220)
        return sim, st

    sim_p, st_p = run("interpret")
    sim_x, st_x = run("0")
    from epoch_tpu.core.binned import make_pallas_engines as mpe
    buf_p, buf_x = st_p.probes[0], st_x.probes[0]
    n_p = int(jnp.sum(buf_p.alive))
    n_x = int(jnp.sum(buf_x.alive))
    assert n_x > 0 and n_p == n_x
    xs_p = np.sort(np.asarray(buf_p.x)[np.asarray(buf_p.alive)][:, 0])
    xs_x = np.sort(np.asarray(buf_x.x)[np.asarray(buf_x.alive)][:, 0])
    np.testing.assert_allclose(xs_p, xs_x, atol=1e-9)
    assert int(st_p.probe_dropped[0]) == 0
    assert int(st_x.probe_dropped[0]) == 0


THERMAL_DECK_2D = """
begin:control
  bin_headroom = 6.0
  nx = 48
  ny = 8
  t_end = 1.0
  nsteps = 80
  x_min = 0
  x_max = 48e-6
  y_min = 0
  y_max = 8e-6
end:control
begin:boundaries
  bc_x_min = thermal
  bc_x_max = thermal
  bc_y_min = periodic
  bc_y_max = periodic
end:boundaries
begin:species
  name = electron
  charge = -1
  mass = 1.0
  number_density = 1e20
  nparticles_per_cell = 4
  drift_px = 3e-23
  temperature_ev = if(abs(x - 24e-6) gt 20e-6, 4000, 1)
end:species
begin:output
  dt_snapshot = 1
end:output
"""


def test_pallas_thermal_bc_matches_xla(tmp_path, monkeypatch):
    """Thermal walls on the fused kernel: the in-kernel counter-hash RNG
    resamples wall crossings (boundary.F90:664-694).  RNG streams differ
    from the XLA engine's jax.random draws, so the comparison is
    statistical: particle count exactly conserved, wall heating
    comparable."""
    from epoch_tpu.core import Simulation

    def run(mode):
        monkeypatch.setenv("EPOCH_TPU_PALLAS", mode)
        d = tmp_path / f"th{mode}"
        d.mkdir(exist_ok=True)
        (d / "input.deck").write_text(THERMAL_DECK_2D)
        sim = Simulation(str(d / "input.deck"), seed=5)
        assert sim.cfg.engine == "binned"
        if mode == "interpret":
            from epoch_tpu.core.step import make_step_functions
            eng = binmod.make_pallas_engines(
                sim.cfg, binmod.BinnedPlan(sim.cfg), interpret=True)
            assert eng[0] is not None and eng[0].any_thermal
        st = sim.run(max_steps=80)
        return sim, st

    sim_p, st_p = run("interpret")
    sim_x, st_x = run("0")

    def stats(st):
        s = st.species[0]
        live = s.w > 0
        n = int(jnp.sum(live))
        p2 = jnp.where(live[None], s.p, 0.0) ** 2
        return n, float(jnp.sum(p2)) / max(n, 1)

    n_p, e_p = stats(st_p)
    n_x, e_x = stats(st_x)
    n0 = 48 * 8 * 4
    assert int(st_p.species[0].n_dropped) == 0
    assert n_p == n0, "pallas thermal wall lost particles"
    assert n_x == n0
    p_1ev2 = const.m0 * const.kb * 11604.5
    assert e_p > 20.0 * p_1ev2, (e_p, p_1ev2)
    assert abs(e_p - e_x) / e_x < 0.5, (e_p, e_x)


WINDOW_DECK = """
begin:control
  nx = 64
  ny = 16
  t_end = 1.0
  nsteps = 40
  x_min = 0
  x_max = 64e-6
  y_min = 0
  y_max = 16e-6
end:control
begin:boundaries
  bc_x_min = simple_outflow
  bc_x_max = simple_outflow
  bc_y_min = periodic
  bc_y_max = periodic
end:boundaries
begin:window
  move_window = T
  window_start_time = 0
  window_v_x = 3.0e8
  bc_x_min_after_move = simple_outflow
  bc_x_max_after_move = simple_outflow
end:window
begin:species
  name = electron
  charge = -1
  mass = 1.0
  nparticles_per_cell = 4
  number_density = if(abs(x - 80e-6) lt 16e-6, 2e23, 1e23)
  temperature_ev = 10
end:species
begin:output
  dt_snapshot = 1
end:output
"""


def test_window_pending_shift_matches_roll(tmp_path, monkeypatch):
    """Moving window on the Pallas engine records shifts as
    ``window_pending`` and lets the rebin routing relabel the slot grid
    (binned_kernels._axis_rebin shmask path); the XLA engine rolls the
    slot state (window._shift_binned).  Same deck, same seed → the two
    must agree on the particle set and the fields."""
    import os
    from epoch_tpu.core import Simulation

    def run(mode):
        monkeypatch.setenv("EPOCH_TPU_PALLAS", mode)
        d = tmp_path / mode
        d.mkdir(exist_ok=True)
        (d / "input.deck").write_text(WINDOW_DECK)
        sim = Simulation(str(d / "input.deck"))
        assert sim.cfg.engine == "binned"
        st = sim.run(max_steps=25)
        return sim, st

    sim_p, st_p = run("interpret")
    sim_x, st_x = run("0")
    assert int(st_p.window_offset) == int(st_x.window_offset) > 3
    # pending is consumed by the push before the dump point
    assert int(st_p.window_pending) == 0
    grid = sim_p.cfg.grid
    per = (False, True)
    xp_, pp_, wp_, ap_ = binmod.to_flat(st_p.species[0], grid, periodic=per)
    xx_, px_, wx_, ax_ = binmod.to_flat(st_x.species[0], grid, periodic=per)
    assert abs(int(ap_.sum()) - int(ax_.sum())) == 0
    np.testing.assert_allclose(np.sort(xp_[ap_][:, 0]),
                               np.sort(xx_[ax_][:, 0]), atol=5e-11)
    np.testing.assert_allclose(float(wp_[ap_].sum()),
                               float(wx_[ax_].sum()), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st_p.fields.ex),
                               np.asarray(st_x.fields.ex),
                               atol=2e-4 * max(
                                   1.0, float(np.abs(st_x.fields.ex).max())))


IMMOBILE_WINDOW_DECK = WINDOW_DECK.replace("begin:output", """begin:species
  name = proton
  charge = 1
  mass = 1836.2
  immobile = T
  nparticles_per_cell = 2
  number_density = 1e23
end:species
begin:output""")


def test_window_immobile_rebin_only_kernel(tmp_path, monkeypatch):
    """An immobile species under a moving window rides a zero-drift
    rebin-only kernel (make_pallas_engines) that consumes the pending
    relabel + swept-boundary cull, instead of forcing the rolled
    (full slot-state copy per step) window path.  Must agree with the
    XLA engine's rolled shift (reference skips the move for immobile
    species, epoch2d/src/particles.F90:178, but window.F90 still
    shifts/culls them)."""
    import os
    from epoch_tpu.core import Simulation

    def run(mode):
        monkeypatch.setenv("EPOCH_TPU_PALLAS", mode)
        d = tmp_path / mode
        d.mkdir(exist_ok=True)
        (d / "input.deck").write_text(IMMOBILE_WINDOW_DECK)
        sim = Simulation(str(d / "input.deck"))
        assert sim.cfg.engine == "binned"
        if mode == "interpret":
            assert binmod.window_pending_capable(sim.cfg)
            eng = binmod.make_pallas_engines(
                sim.cfg, binmod.BinnedPlan(sim.cfg), interpret=True)
            assert eng[1] is not None, "immobile species got no kernel"
        st = sim.run(max_steps=25)
        return sim, st

    sim_p, st_p = run("interpret")
    sim_x, st_x = run("0")
    assert int(st_p.window_offset) == int(st_x.window_offset) > 3
    assert int(st_p.window_pending) == 0
    grid = sim_p.cfg.grid
    per = (False, True)
    for si in range(2):
        xp_, pp_, wp_, ap_ = binmod.to_flat(st_p.species[si], grid,
                                            periodic=per)
        xx_, px_, wx_, ax_ = binmod.to_flat(st_x.species[si], grid,
                                            periodic=per)
        assert abs(int(ap_.sum()) - int(ax_.sum())) == 0, si
        np.testing.assert_allclose(np.sort(xp_[ap_][:, 0]),
                                   np.sort(xx_[ax_][:, 0]), atol=5e-11)
    # immobile momenta stay zero; positions were never drifted
    assert float(np.abs(np.asarray(st_p.species[1].p)).max()) == 0.0
    np.testing.assert_allclose(np.asarray(st_p.fields.ex),
                               np.asarray(st_x.fields.ex),
                               atol=2e-4 * max(
                                   1.0, float(np.abs(st_x.fields.ex).max())))


def test_carried_sides_match_fresh_staging():
    """sides_out engines carry their halo side columns across pushes
    (BinnedSpecies.sides) instead of re-staging them; after any number
    of pushes the carried arrays must be bit-identical to what
    stage_sides would rebuild from the slot state — any divergence
    means a kernel/XLA staging mismatch or stale carry."""
    cfg, plan, sp, grid, bm, interior = _setup(n=(16, 128))
    eng = binmod.make_pallas_engines(cfg, plan, interpret=True)[0]
    assert eng is not None and eng.sides_out
    assert binmod.sides_carry_capable(cfg)
    names = ("ex", "ey", "ez", "bx", "by", "bz")
    fstack = jnp.stack([interior[nm] for nm in names], axis=0)
    fpad = jnp.pad(fstack, ((0, 0), (2, 2), (2, 2)), mode="wrap")
    fwin = eng.make_fwin(fpad)
    b = bm
    assert b.sides is None
    for step in range(3):
        b, _ = binmod.push_deposit_pallas(eng, fwin, b, plan)
        assert b.sides is not None and len(b.sides) == 3 * eng.n_halo
        fresh = eng.stage_sides(b)
        for k, (c_arr, f_arr) in enumerate(zip(b.sides, fresh)):
            np.testing.assert_array_equal(np.asarray(c_arr),
                                          np.asarray(f_arr),
                                          err_msg=f"step {step} side {k}")


def test_butterfly_compaction_property():
    """The in-kernel compaction is stable live-first routing; check the
    vectorised jnp implementation directly against numpy for random
    masks (the Pallas kernel uses the same code)."""
    from epoch_tpu.ops.binned_kernels import _compact
    rng = np.random.default_rng(0)
    for trial in range(20):
        N = 48
        w = np.where(rng.random((N, 4, 8)) < rng.uniform(0.1, 0.9),
                     rng.uniform(0.5, 2.0, (N, 4, 8)), 0.0)
        pay = rng.normal(size=(N, 4, 8))
        (pay_c,), w_c = _compact([jnp.asarray(pay, jnp.float32)],
                                 jnp.asarray(w, jnp.float32), N)
        w_c = np.asarray(w_c)
        pay_c = np.asarray(pay_c)
        for a in range(4):
            for b in range(8):
                live = w[:, a, b] > 0
                nl = live.sum()
                # live-first, order preserved
                assert (w_c[:nl, a, b] > 0).all()
                assert (w_c[nl:, a, b] == 0).all()
                np.testing.assert_allclose(pay_c[:nl, a, b],
                                           pay[live, a, b], rtol=1e-6)


def test_pallas_photon_push_matches_xla(monkeypatch):
    """Fused ballistic photon variant (make_fused_push photon=True) vs
    the XLA push_photons_binned (rebin + full-dt drift): positions and
    momenta must agree over steps that exercise the rebin routing."""
    monkeypatch.setenv("EPOCH_TPU_PALLAS", "interpret")
    cfg, plan, sp, grid, bm, vals = _setup(n=(16, 8), K=8)
    sp_ph = dataclasses.replace(
        sp, name="ph", charge=0.0, mass=0.0,
        species_type=const.SpeciesType.PHOTON)
    cfg = dataclasses.replace(cfg, species=(sp_ph,))
    plan = binmod.BinnedPlan(cfg)
    engines = binmod.make_pallas_engines(cfg, plan)
    assert engines[0] is not None, "fused photon path inactive"
    from epoch_tpu.core.state import zero_fields
    fields = zero_fields(grid.padded_shape(), np.float32)
    fpad = binmod.make_fpad(fields, grid)
    fwin = engines[0].make_fwin(fpad)
    b_p = b_x = bm
    for _ in range(4):
        b_p, _j = binmod.push_deposit_pallas(engines[0], fwin, b_p, plan,
                                             sp=sp_ph)
        b_x = binmod.push_photons_binned(b_x, plan,
                                         bc=sp_ph.bc_particle[:4])
    xp_, pp_, wp_, ap_ = binmod.to_flat(b_p, grid)
    xx_, px_, wx_, ax_ = binmod.to_flat(b_x, grid)
    assert int(ap_.sum()) == int(ax_.sum()) > 0
    for d in range(2):
        np.testing.assert_allclose(np.sort(xp_[ap_][:, d]),
                                   np.sort(xx_[ax_][:, d]), atol=1e-11)
    np.testing.assert_allclose(np.sort(pp_[ap_][:, 0]),
                               np.sort(px_[ax_][:, 0]), rtol=1e-6)


def test_pallas_flat_sides_matches_lead_layout(monkeypatch):
    """The lane-aligned "flat" halo side-array layout ((…, K, nxb·NY)
    blocks, used when NY % 128 == 0 — no moveaxis staging copies) must
    be bit-identical to the stripe-leading layout it replaces, through
    pushes that exercise the halo rebin routing and aux payloads."""
    outs = {}
    for mode in ("1", "0"):
        monkeypatch.setenv("EPOCH_TPU_FLAT_SIDES", mode)
        cfg, plan, sp, grid, bm, interior = _setup(n=(16, 128), n_aux=2)
        eng = binmod.make_pallas_engines(cfg, plan, interpret=True)[0]
        assert eng is not None
        assert eng.flat_sides == (mode == "1")
        names = ("ex", "ey", "ez", "bx", "by", "bz")
        fstack = jnp.stack([interior[nm] for nm in names], axis=0)
        fpad = jnp.pad(fstack, ((0, 0), (2, 2), (2, 2)), mode="wrap")
        fwin = eng.make_fwin(fpad)
        b = bm
        for _ in range(4):
            b, jpart = binmod.push_deposit_pallas(eng, fwin, b, plan)
        outs[mode] = (b, eng.fold_jpart(jpart))
    (b1, j1), (b0, j0) = outs["1"], outs["0"]
    for nm in ("w", "xi", "p", "aux"):
        np.testing.assert_array_equal(np.asarray(getattr(b1, nm)),
                                      np.asarray(getattr(b0, nm)))
    np.testing.assert_array_equal(np.asarray(j1), np.asarray(j0))
