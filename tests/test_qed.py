"""QED photon emission tests (physics_packages/photons.F90).

Uses the reference TABLES directory (data files, read at runtime through
the deck's qed_table_location key — exactly how the reference consumes
them)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

import epoch_tpu.constants as const
from epoch_tpu.core import Simulation

TABLES = "/root/reference/epoch1d/src/physics_packages/TABLES"

DECK = """
begin:control
  pusher = scatter
  nx = 16
  t_end = 1
  x_min = 0
  x_max = 1.6e-5
end:control
begin:boundaries
  bc_x_min = periodic
  bc_x_max = periodic
end:boundaries
begin:qed
  use_qed = T
  qed_start_time = 0
  produce_photons = T
  produce_pairs = F
  photon_energy_min = 0
  qed_table_location = {tables}
end:qed
begin:species
  name = Electron
  charge = -1
  mass = 1.0
  number_density = 1e20
  nparticles = 128
  identify:electron
end:species
begin:species
  name = Photon
  nparticles = 0
  dump = T
  identify:photon
end:species
begin:output
  dt_snapshot = 1
end:output
"""


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    d = tmp_path_factory.mktemp("qed")
    (d / "input.deck").write_text(DECK.format(tables=TABLES))
    return Simulation(str(d / "input.deck"))


def test_tables_load(sim):
    tab = sim.cfg.qed_plan.tables
    assert tab.h_logeta.shape[0] == 500
    assert tab.p_photon.shape == (tab.n_eta, tab.n_chi)
    # h(eta) ~ 0.72 at small eta (hsokolov.table first entries)
    assert abs(tab.h_val[0] - 0.7189960759048358) < 1e-12


def test_emission_in_strong_field(sim):
    """GeV electrons in a ~10^14 V/m transverse field (η ~ 0.5) must emit
    photons with recoil; weight bookkeeping must hold."""
    st = sim.state
    cfg = sim.cfg
    # gamma = 2000 electrons moving +x
    gamma = 2000.0
    p0 = np.sqrt(gamma ** 2 - 1.0) * const.m0 * const.c
    slab = st.species[0]
    p = jnp.zeros_like(slab.p).at[:, 0].set(p0)
    slab = slab._replace(p=p)
    f = st.fields._replace(ey=jnp.full_like(st.fields.ey, 2.0e14))
    st = st._replace(fields=f, species=(slab, st.species[1]))
    p_tot0 = float(jnp.sum(jnp.where(slab.alive, slab.p[:, 0], 0.0)))
    for _ in range(20):
        st = sim.fns["step_a"](st)._replace(fields=f)
    n_ph = int(st.species[1].alive.sum())
    assert n_ph > 0, "no photons emitted at eta~1"
    # radiation reaction: electron momentum decreased
    p_tot1 = float(jnp.sum(jnp.where(st.species[0].alive,
                                     st.species[0].p[:, 0], 0.0)))
    assert p_tot1 < p_tot0
    # photon momenta along +x
    ph = st.species[1]
    px = np.asarray(ph.p[:, 0])[np.asarray(ph.alive)]
    assert (px > 0).all()


def test_photon_dynamics_off_freezes_photons(tmp_path):
    """photon_dynamics defaults to F in the reference (deck_qed_block
    F90 default; particles.F90:178 gates push_photons on it): photons
    are created and accumulate energy diagnostics but are never moved.
    Emit in a strong field, then check created photons stay put."""
    def run(extra):
        d = tmp_path / ("dyn" if extra else "nodyn")
        d.mkdir()
        deck = DECK.format(tables=TABLES)
        if extra:
            deck = deck.replace("produce_pairs = F",
                                "produce_pairs = F\n  photon_dynamics = T")
        (d / "input.deck").write_text(deck)
        sim = Simulation(str(d / "input.deck"))
        st = sim.state
        gamma = 2000.0
        p0 = np.sqrt(gamma ** 2 - 1.0) * const.m0 * const.c
        slab = st.species[0]
        slab = slab._replace(p=jnp.zeros_like(slab.p).at[:, 0].set(p0))
        f = st.fields._replace(ey=jnp.full_like(st.fields.ey, 2.0e14))
        st = st._replace(fields=f, species=(slab, st.species[1]))
        for _ in range(10):
            st = sim.fns["step_a"](st)._replace(fields=f)
        ph = st.species[1]
        al0 = np.asarray(ph.alive)
        assert al0.sum() > 0
        x0 = np.asarray(ph.x)[al0, 0]
        # two more steps: photons move iff photon_dynamics
        for _ in range(2):
            st = sim.fns["step_a"](st)._replace(fields=f)
        ph1 = st.species[1]
        x1 = np.asarray(ph1.x)[np.asarray(ph1.alive), 0]
        return sim, x0, x1

    sim_f, x0, x1 = run(False)
    assert sim_f.cfg.species[1].immobile
    # frozen: every originally-alive photon position is still present
    # bit-exactly (new photons may have appeared since)
    assert np.isin(x0, x1).all()
    sim_t, y0, y1 = run(True)
    assert not sim_t.cfg.species[1].immobile
    # moving at c: no original position survives two steps
    assert not np.isin(y0, y1).any()


TRIDENT_DECK = """
begin:control
  pusher = scatter
  nx = 16
  t_end = 1
  x_min = 0
  x_max = 1.6e-5
end:control
begin:boundaries
  bc_x_min = periodic
  bc_x_max = periodic
end:boundaries
begin:qed
  use_qed = T
  qed_start_time = 0
  produce_photons = F
  produce_pairs = F
  use_trident = T
  qed_table_location = {tables}
end:qed
begin:species
  name = Electron
  charge = -1
  mass = 1.0
  number_density = 1e20
  nparticles = 128
  identify:electron
end:species
begin:species
  name = TriElectron
  charge = -1
  mass = 1.0
  nparticles = 0
  identify:trident_electron
end:species
begin:species
  name = Positron
  charge = 1
  mass = 1.0
  nparticles = 0
  identify:trident_positron
end:species
begin:output
  dt_snapshot = 1
end:output
"""


def test_trident_pair_production(tmp_path):
    """TRIDENT_PHOTONS path (photons.F90:502-572, generate_pair_tri
    :1010-1042): at eta ~ 1 the trident channel must create e-/e+ pairs
    at rest with the generating electron's weight."""
    (tmp_path / "input.deck").write_text(TRIDENT_DECK.format(tables=TABLES))
    sim = Simulation(str(tmp_path / "input.deck"))
    assert sim.cfg.qed_plan.use_trident
    st = sim.state
    gamma = 2000.0
    p0 = np.sqrt(gamma ** 2 - 1.0) * const.m0 * const.c
    slab = st.species[0]
    # seed tau_tri near zero: the trident rate is alpha^2-suppressed, so
    # firing within a few steps tests the mechanism, not the (tiny) rate
    slab = slab._replace(
        p=jnp.zeros_like(slab.p).at[:, 0].set(p0),
        opdepth_tri=jnp.full_like(slab.opdepth_tri, 1e-10))
    f = st.fields._replace(ey=jnp.full_like(st.fields.ey, 2.0e14))
    st = st._replace(fields=f, species=(slab,) + st.species[1:])
    for _ in range(3):
        st = sim.fns["step_a"](st)._replace(fields=f)
    n_e = int(st.species[1].alive.sum())
    n_p = int(st.species[2].alive.sum())
    assert n_p > 0, "no trident pairs at eta~1"
    assert n_e == n_p
    # pairs created at rest with the source's weight (generate_pair_tri);
    # by assert time the Ey field has kicked them along y only
    pos = st.species[2]
    al = np.asarray(pos.alive)
    pp = np.asarray(pos.p)[al]
    assert np.all(pp[:, 0] == 0.0) and np.all(pp[:, 2] == 0.0)
    kick = const.q0 * 2.0e14 * sim.cfg.dt * 3   # <= 3 steps of Ey kick
    assert np.all(np.abs(pp[:, 1]) <= 1.5 * kick)
    w0 = float(st.species[0].weight[0])
    np.testing.assert_allclose(np.asarray(pos.weight)[al], w0)


def test_h_polyfit_matches_table():
    """The fused kernel evaluates h(eta) from a log-log polyfit of the
    reference table (Mosaic cannot gather tables); the fit must track
    the table interpolation to well under emission-statistics noise."""
    import numpy as np
    from epoch_tpu.physics.qed import QEDTables
    t = QEDTables(TABLES)
    lg = np.asarray(t.h_logeta)
    lv = np.asarray(t.h_val)
    c = np.polyfit(lg, lv, 12)
    rel = np.max(np.abs(10.0 ** np.polyval(c, lg) - 10.0 ** lv)
                 / np.maximum(10.0 ** lv, 1e-300))
    assert rel < 5e-4, rel


QED2D_DECK = """
begin:control
  nx = 32
  ny = 16
  t_end = 1
  x_min = 0
  x_max = 3.2e-5
  y_min = 0
  y_max = 1.6e-5
end:control
begin:boundaries
  bc_x_min = periodic
  bc_x_max = periodic
  bc_y_min = periodic
  bc_y_max = periodic
end:boundaries
begin:fields
  ey = 1.0e9
end:fields
begin:qed
  use_qed = T
  qed_start_time = {tstart}
  produce_photons = T
  produce_pairs = F
  photon_energy_min = 0
  qed_table_location = {tables}
end:qed
begin:species
  name = Electron
  charge = -1
  mass = 1.0
  number_density = 1e20
  nparticles_per_cell = 2
  temperature_ev = 1e6
  identify:electron
end:species
begin:species
  name = Photon
  nparticles = 0
  identify:photon
end:species
begin:output
  dt_snapshot = 1
end:output
"""


def test_qed_rates_in_kernel_match_xla(tmp_path, monkeypatch):
    """In-kernel eta + optical-depth decrement (fused push) vs the
    XLA-side gather/interp path: with emission gated off
    (qed_start_time past t), a one-step run must agree on the particle
    state, and the kernel's stored eta must match the XLA formula."""
    import numpy as np
    import jax.numpy as jnp
    from epoch_tpu.core import binned as binmod
    from epoch_tpu.physics.qed import _eta_electron
    import epoch_tpu.constants as const

    def run(mode, steps=1):
        monkeypatch.setenv("EPOCH_TPU_PALLAS", mode)
        # rates-only configuration: with in-kernel EMISSION the last
        # extras row carries e_ph, not eta — this test asserts the
        # rate math, so pin the eta-row semantics
        monkeypatch.setenv("EPOCH_TPU_EMIT_IN_KERNEL", "0")
        d = tmp_path / mode
        d.mkdir(exist_ok=True)
        (d / "input.deck").write_text(
            QED2D_DECK.format(tables=TABLES, tstart=1.0))
        sim = Simulation(str(d / "input.deck"), seed=7)
        assert sim.cfg.engine == "binned"
        st = sim.run(max_steps=steps)
        return sim, st

    sim_p, st_p = run("interpret")
    sim_x, st_x = run("0")
    bplan = binmod.BinnedPlan(sim_p.cfg)
    b_p, b_x = st_p.species[0], st_x.species[0]
    # identical dynamics (decrement inactive, fires impossible); slot
    # ORDER may differ between the two engines — compare sorted sets
    mp = np.asarray(b_p.w) > 0
    mx = np.asarray(b_x.w) > 0
    assert mp.sum() == mx.sum() > 0
    np.testing.assert_allclose(np.sort(np.asarray(b_p.w)[mp]),
                               np.sort(np.asarray(b_x.w)[mx]))
    for c in range(3):
        np.testing.assert_allclose(
            np.sort(np.asarray(b_p.p[c])[mp]),
            np.sort(np.asarray(b_x.p[c])[mx]), atol=1e-26)
    # the kernel's eta row vs the XLA formula (kernel samples eta at the
    # mid-push state: with the weak uniform field the per-step momentum
    # change keeps the sorted sets within ~1e-3 relative)
    i_eta = bplan.aux_idx["qed_eta"]
    eta_k = np.sort(np.asarray(b_p.aux[i_eta])[mp])
    fl = binmod.gather_fields_binned_shifted(
        st_x.fields, sim_x.cfg.grid, b_x.xi, bplan)
    mc0 = const.m0 * const.c
    u = [b_x.p[c] / mc0 for c in range(3)]
    gamma = jnp.sqrt(u[0] ** 2 + u[1] ** 2 + u[2] ** 2 + 1.0)
    eta_ref = np.sort(np.asarray(_eta_electron(
        (fl["ex"], fl["ey"], fl["ez"]),
        (fl["bx"], fl["by"], fl["bz"]), u, gamma))[mx])
    rel = np.abs(eta_k - eta_ref) / np.maximum(np.abs(eta_ref), 1e-15)
    assert float(rel.max()) < 5e-3, float(rel.max())


BW_DECK = """
begin:control
  nx = 16
  ny = 16
  t_end = 1
  x_min = 0
  x_max = 1.6e-5
  y_min = 0
  y_max = 1.6e-5
  bin_headroom = 3
end:control
begin:boundaries
  bc_x_min = periodic
  bc_x_max = periodic
  bc_y_min = periodic
  bc_y_max = periodic
end:boundaries
begin:qed
  use_qed = T
  qed_start_time = 0
  produce_photons = T
  produce_pairs = T
  photon_dynamics = T
  photon_energy_min = 1e6 * mev
  qed_table_location = {tables}
end:qed
begin:species
  name = Electron
  charge = -1
  mass = 1.0
  nparticles = 0
  identify:electron
end:species
begin:species
  # QED-inert ballast: sizes the slot capacity (K ~ ppc*headroom) so
  # the pair/emission appends never overflow cells in this test
  name = proton
  charge = 1
  mass = 1836.2
  number_density = 1e20
  nparticles_per_cell = 8
end:species
begin:species
  name = Photon
  nparticles = 0
  identify:photon
end:species
begin:species
  name = Positron
  nparticles = 0
  identify:positron
end:species
begin:output
  dt_snapshot = 1
end:output
"""


def test_breit_wheeler_pair_production(tmp_path):
    """Breit-Wheeler pair creation (generate_pair, photons.F90:944-1009)
    through the sparse fire-gated tail: GeV photons crossing a strong
    transverse field (chi ~ 1.5) must convert into e-/e+ pairs; each
    fire destroys the photon and hands its full weight to BOTH children,
    whose momenta split the photon's along its direction.  The huge
    photon_energy_min keeps the children's own synchrotron emission
    untracked (recoil only), so the photon weight book is monotone."""
    (tmp_path / "input.deck").write_text(BW_DECK.format(tables=TABLES))
    sim = Simulation(str(tmp_path / "input.deck"), seed=11)
    cfg = sim.cfg
    assert cfg.engine == "binned"
    assert cfg.qed_plan.produce_pairs
    st = sim.state
    names = [s.name for s in cfg.species]
    ie, iph, ipos = (names.index("Electron"), names.index("Photon"),
                     names.index("Positron"))
    # seed 2 GeV photons (part_e ~ 4000 >> 2) moving +x in every cell
    ph = st.species[iph]
    e_ph = 4000.0 * const.m0 * const.c ** 2
    w = jnp.zeros_like(ph.w).at[0].set(1.0e9)
    p = jnp.zeros_like(ph.p).at[0, 0].set(jnp.where(w[0] > 0, e_ph / const.c, 0.0))
    sp = list(st.species)
    sp[iph] = ph._replace(w=w, p=p)
    st = st._replace(species=tuple(sp))
    w_ph0 = float(jnp.sum(jnp.where(w > 0, w, 0.0)))
    f = st.fields._replace(ey=jnp.full_like(st.fields.ey, 2.0e15))
    st = st._replace(fields=f)
    for _ in range(30):
        st = sim.fns["step_a"](st)._replace(fields=f)
    el, phs, pos = st.species[ie], st.species[iph], st.species[ipos]
    n_el = int(jnp.sum(el.w > 0))
    n_pos = int(jnp.sum(pos.w > 0))
    assert n_pos > 0, "no Breit-Wheeler pairs at chi ~ 1.5"
    assert n_el == n_pos
    # weight books: destroyed photon weight reappears on BOTH children
    w_ph1 = float(jnp.sum(jnp.where(phs.w > 0, phs.w, 0.0)))
    w_el = float(jnp.sum(jnp.where(el.w > 0, el.w, 0.0)))
    w_pos = float(jnp.sum(jnp.where(pos.w > 0, pos.w, 0.0)))
    dropped = int(el.n_dropped) + int(pos.n_dropped)
    assert dropped == 0
    np.testing.assert_allclose(w_el, w_ph0 - w_ph1, rtol=1e-5)
    np.testing.assert_allclose(w_pos, w_ph0 - w_ph1, rtol=1e-5)
    # children inherit the photon's +x direction (energy split in
    # [0, 1] — a ~0 split leaves a child with ~zero momentum)
    al_e = np.asarray(el.w) > 0
    assert (np.asarray(el.p[0])[al_e] >= 0).all()
    assert (np.asarray(el.p[0])[al_e] <= e_ph / const.c * (1 + 1e-6)).all()


def test_pair_polyfit_matches_table():
    """The fused photon kernel evaluates T(chi) (pair production rate,
    pairprod.table) as exp(ln10·(poly(xn) - (8/3)·log10(e)/chi)) — the
    Erber suppression factored out, residual polyfit normalised.  The
    f32 evaluation must track the table to well under pair-statistics
    noise wherever the rate is physically alive (T > 1e-20), and
    underflow to EXACTLY zero in the table's 1e-50 clamp region."""
    from epoch_tpu.physics.qed import QEDTables, QEDPlan

    class _Q:
        qed_table_location = TABLES
        produce_photons = True
        produce_pairs = True
        photon_energy_min = 0.0
        photon_dynamics = True
        use_radiation_reaction = True
        qed_start_time = 0.0

    class _D:
        qed = _Q()
        species = ()

    class _C:
        species = ()
    plan = QEDPlan(_C(), _D())
    t = QEDTables(TABLES)
    lg = np.asarray(t.t_logchi)
    lv = np.asarray(t.t_val)
    chi = (10.0 ** lg).astype(np.float32)
    xn = np.clip(((lg - plan.pair_fit_mid) / plan.pair_fit_half)
                 .astype(np.float32), -1, 1)
    acc = np.zeros_like(xn) + np.float32(plan.pair_fit_coeffs[0])
    for cc in plan.pair_fit_coeffs[1:]:
        acc = acc * xn + np.float32(cc)
    expnt = acc - np.float32(8.0 / 3.0 * np.log10(np.e)) / chi
    t32 = np.exp(expnt * np.float32(np.log(10.0)))
    tref = 10.0 ** lv
    rel = np.abs(t32 - tref) / np.maximum(tref, 1e-300)
    assert rel[lv > -20].max() < 2e-3, rel[lv > -20].max()
    assert t32[lv <= -49.9].max() == 0.0


def test_pair_rates_in_kernel_match_xla(tmp_path, monkeypatch):
    """In-kernel photon chi + pair optical-depth decrement (fused
    ballistic kernel) vs the XLA gather/table path: with uniform fields
    (curl-free, J=0 — the Maxwell half-steps are no-ops) and a known
    starting depth (no entry resample), one step must agree on chi and
    on the decrement to the pair-rate fit tolerance."""
    def run(mode):
        monkeypatch.setenv("EPOCH_TPU_PALLAS", mode)
        d = tmp_path / ("m_" + mode)
        d.mkdir(exist_ok=True)
        (d / "input.deck").write_text(BW_DECK.format(tables=TABLES))
        sim = Simulation(str(d / "input.deck"), seed=11)
        from epoch_tpu.core import binned as binmod
        bplan = binmod.BinnedPlan(sim.cfg)
        if mode == "interpret":
            assert sim.cfg.qed_plan.rates_in_kernel, \
                "photon kernel rates not active"
        else:
            assert not sim.cfg.qed_plan.rates_in_kernel
        st = sim.state
        names = [s.name for s in sim.cfg.species]
        iph = names.index("Photon")
        ph = st.species[iph]
        e_ph = 4000.0 * const.m0 * const.c ** 2
        w = jnp.zeros_like(ph.w).at[0].set(1.0e3)
        p = jnp.zeros_like(ph.p).at[0, 0].set(
            jnp.where(w[0] > 0, e_ph / const.c, 0.0))
        i_od = bplan.aux_idx["opdepth"]
        aux = ph.aux.at[i_od].set(jnp.where(w > 0, 5.0, 0.0))
        sp = list(st.species)
        sp[iph] = ph._replace(w=w, p=p, aux=aux)
        f = st.fields._replace(ey=jnp.full_like(st.fields.ey, 2.0e15))
        st = st._replace(species=tuple(sp), fields=f)
        st = sim.fns["step_a"](st)
        b = st.species[iph]
        al = np.asarray(b.w) > 0
        return (np.asarray(b.aux[i_od])[al],
                np.asarray(b.aux[bplan.aux_idx["qed_eta"]])[al]
                if mode == "interpret" else None)

    od_k, chi_k = run("interpret")
    od_x, _ = run("0")
    # same photons, same field: identical chi => decrement within the
    # T(chi) fit tolerance (2e-3) of the table-interp path
    d_k = 5.0 - np.sort(od_k)
    d_x = 5.0 - np.sort(od_x)
    assert d_x.max() > 1e-3, "decrement inactive - test not probing rates"
    np.testing.assert_allclose(d_k, d_x, rtol=5e-3)
    # kernel-stored chi matches the analytic formula for a +x photon in
    # a pure Ey field: chi = 0.5*part_e*Ey/E_S
    from epoch_tpu.physics.qed import E_S
    part_e = 4000.0
    chi_ref = 0.5 * part_e * 2.0e15 / E_S
    np.testing.assert_allclose(chi_k, chi_ref, rtol=1e-4)


def test_chi_sampling_fit_matches_table_inversion():
    """The dense emission tail's gather-free Chebyshev chi sampler
    (QEDPlan.chi_fit_coeffs, qed._sample_chi_fit) must track the exact
    per-row table inversion (find_value_from_table_alt,
    photons.F90:867-943) to better than the table's OWN nearest-row
    quantisation (adjacent ksi_sokolov rows differ by up to 0.075
    decades in the sampled log-chi).  Evaluated at exact table rows so
    the nearest-row inversion is exact there; p off the fit grid."""
    import math
    import jax
    import types
    from epoch_tpu.physics.qed import (QEDTables, QEDPlan, _sample_chi_fit,
                                       _invert_cdf_rows)
    t = QEDTables(TABLES)
    rows = np.arange(0, len(t.log_eta), 3)  # ALL rows, log_eta in
    # [-5, 1]: the fire-dense regime (>= -3.2) and the rare low-eta
    # fires both gate identically (measured: u>=-3 max err well under
    # the 0.075 quantisation across every row at both degrees)
    p = np.linspace(0.013, 0.987, 61)     # off the fit's p grid
    eta = 10.0 ** t.log_eta[rows]
    ee, pp = np.meshgrid(eta, p, indexing="ij")
    chi_exact = np.asarray(_invert_cdf_rows(
        t.log_eta, t.log_chi, t.p_photon,
        jnp.asarray(ee.ravel()), jnp.asarray(pp.ravel())))
    u_exact = np.log10(chi_exact) - (np.log10(ee.ravel())
                                     - math.log10(2.0))
    rel = u_exact >= -3.0                 # within 3 decades of chi_max:
    # everything that can pass photon_energy_min or carry recoil
    # (default (8,12): the VPU-cheap fit; (12,24): the high-accuracy
    # override — the soft-photon tail (recoil < 0.1%, never stored at
    # practical photon_energy_min) is down-weighted 100x in the build
    # and holds a looser, degree-dependent bound)
    for deg, hard_max, hard_mean, soft_max in (
            ((8, 12), 0.075, 0.01, 0.6), ((12, 24), 0.075, 0.01, 0.15)):
        plan = types.SimpleNamespace(tables=t)
        plan.chi_fit_deg = deg
        plan.chi_fit_pmax = 0.9995
        plan.chi_fit_coeffs = QEDPlan._build_chi_fit(plan)
        chi_fit = np.asarray(_sample_chi_fit(
            plan, jnp.asarray(ee.ravel()), jnp.asarray(pp.ravel())))
        err = np.abs(np.log10(chi_fit) - np.log10(chi_exact))
        assert err[rel].max() < hard_max, (deg, err[rel].max())
        assert err[rel].mean() < hard_mean, (deg, err[rel].mean())
        assert err[~rel].max() < soft_max, (deg, err[~rel].max())


EMIT_KERNEL_DECK = """
begin:control
  nx = 16
  ny = 16
  t_end = 1
  x_min = 0
  x_max = 1.6e-5
  y_min = 0
  y_max = 1.6e-5
  bin_headroom = 4
end:control
begin:boundaries
  bc_x_min = periodic
  bc_x_max = periodic
  bc_y_min = periodic
  bc_y_max = periodic
end:boundaries
begin:qed
  use_qed = T
  qed_start_time = 0
  produce_photons = T
  photon_dynamics = T
  photon_energy_min = 0
  qed_table_location = {tables}
end:qed
begin:species
  name = Electron
  charge = -1
  mass = 1.0
  number_density = 1e20
  nparticles_per_cell = 2
  identify:electron
end:species
begin:species
  name = Photon
  nparticles = 0
  identify:photon
  bin_headroom = 20
end:species
begin:output
  dt_snapshot = 1
end:output
"""


def test_emission_in_kernel_momentum_book(tmp_path, monkeypatch):
    """Fully in-kernel emission (chi sample + recoil in the emitter
    kernel, photons appended through the photon kernel's rebin): in a
    pure-B field the Boris rotation preserves |p|, so the electrons'
    total w·|p|c loss must exactly equal the stored photon energy
    (recoil |p|' = |p| − e_ph/c along the unchanged direction, and
    photon_energy_min = 0 stores every fire)."""
    monkeypatch.setenv("EPOCH_TPU_PALLAS", "interpret")
    (tmp_path / "input.deck").write_text(
        EMIT_KERNEL_DECK.format(tables=TABLES))
    sim = Simulation(str(tmp_path / "input.deck"), seed=11)
    cfg = sim.cfg
    assert cfg.engine == "binned"
    assert cfg.qed_plan.emit_in_kernel.get(0), \
        "in-kernel emission not engaged"
    st = sim.state
    el0 = st.species[0]
    # gamma ~ 2000 electrons moving +x in a strong Bz: eta ~ 0.5
    gamma = 2000.0
    p0 = np.sqrt(gamma ** 2 - 1.0) * const.m0 * const.c
    p = jnp.zeros_like(el0.p).at[0].set(
        jnp.where(el0.w > 0, p0, 0.0))
    sp = list(st.species)
    sp[0] = el0._replace(p=p)
    st = st._replace(species=tuple(sp))
    f = st.fields._replace(bz=jnp.full_like(st.fields.bz, 1.0e6))
    st = st._replace(fields=f)

    def pmagsum(s):
        m = jnp.sqrt(s.p[0] ** 2 + s.p[1] ** 2 + s.p[2] ** 2)
        return float(jnp.sum(jnp.where(s.w > 0, s.w * m, 0.0)))

    pm0 = pmagsum(st.species[0])
    for _ in range(12):
        st = sim.fns["step_a"](st)._replace(fields=f)
    el, ph = st.species[0], st.species[1]
    n_ph = int(jnp.sum(ph.w > 0))
    assert n_ph > 0, "no photons emitted at eta~0.5"
    assert int(ph.n_dropped) == 0
    pm1 = pmagsum(el)
    ph_e = pmagsum(ph)           # photons: w·|p| with |p| = e_ph/c
    assert pm0 - pm1 > 0, "no recoil"
    np.testing.assert_allclose(pm0 - pm1, ph_e, rtol=1e-4)
    # (no direction assertion: electrons gyrate in Bz, so late fires
    # legitimately emit with any sign of px)
