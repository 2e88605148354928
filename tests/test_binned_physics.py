"""Particle-creating physics on the binned (slot-grid) engine.

Mirrors the scatter-engine oracles (test_ionise / test_qed /
test_bremsstrahlung / test_coll_ionise) with the engine auto-selecting
the binned path: creations are cell-local candidate merges
(core/binned.merge_candidates), optical depths live in the per-particle
aux rows, and the same physics invariants (counts, weight books, recoil
energy balance) must hold.
"""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import epoch_tpu.constants as const
from epoch_tpu.core import Simulation
from epoch_tpu.core import binned as binmod
from epoch_tpu.core.step import make_full_step

TABLES = "/root/reference/epoch1d/src/physics_packages/TABLES"


def wsum(b):
    return float(jnp.sum(jnp.where(b.w > 0, b.w, 0.0)))


def count(b):
    return int(jnp.sum(b.w > 0))


# ---------------------------------------------------------------------------
# merge_candidates unit behaviour
# ---------------------------------------------------------------------------

MERGE_DECK = """
begin:control
  nx = 8
  t_end = 1
  x_min = 0
  x_max = 8e-6
end:control
begin:boundaries
  bc_x_min = periodic
  bc_x_max = periodic
end:boundaries
begin:species
  name = e
  charge = -1
  mass = 1.0
  number_density = 1e20
  nparticles_per_cell = 2
end:species
begin:output
  dt_snapshot = 1
end:output
"""


def test_merge_candidates_appends_and_counts_overflow(tmp_path):
    (tmp_path / "input.deck").write_text(MERGE_DECK)
    sim = Simulation(str(tmp_path / "input.deck"))
    assert sim.cfg.engine == "binned"
    plan = binmod.BinnedPlan(sim.cfg)
    b = sim.state.species[0]
    K = b.K
    n0 = count(b)
    # candidates: one particle in cell 3 with distinctive payload
    cw = jnp.zeros((1,) + b.w.shape[1:], b.w.dtype).at[0, 3].set(7.5)
    cxi = jnp.full((1, 1) + b.w.shape[1:], 0.25, b.w.dtype)
    cp = jnp.full((3, 1) + b.w.shape[1:], 1.5e-21, b.w.dtype)
    out = binmod.merge_candidates(b, cxi, cp, cw, plan)
    assert count(out) == n0 + 1
    assert int(out.n_dropped) == int(b.n_dropped)
    # the appended particle sits in cell 3 with its payload intact
    col_w = np.asarray(out.w[:, 3])
    assert 7.5 in col_w
    k = int(np.argwhere(col_w == 7.5)[0][0])
    assert np.asarray(out.xi[0, :, 3])[k] == 0.25
    assert np.asarray(out.p[0, :, 3])[k] == pytest.approx(1.5e-21)

    # overflow: more candidates than free slots in one cell → counted
    cw_full = jnp.zeros((K,) + b.w.shape[1:], b.w.dtype).at[:, 5].set(1.0)
    cxi_f = jnp.zeros((1, K) + b.w.shape[1:], b.w.dtype)
    cp_f = jnp.zeros((3, K) + b.w.shape[1:], b.w.dtype)
    out2 = binmod.merge_candidates(b, cxi_f, cp_f, cw_full, plan)
    live_cell5 = int(jnp.sum(b.w[:, 5] > 0))
    assert int(out2.n_dropped) - int(b.n_dropped) == live_cell5
    assert count(out2) == n0 + K - live_cell5


# ---------------------------------------------------------------------------
# field ionisation (mirror of test_ionise.test_strong_field_ionises)
# ---------------------------------------------------------------------------

ION_DECK = """
begin:control
  nx = 16
  t_end = 1
  x_min = 0
  x_max = 1.6e-5
  field_ionisation = T
  use_multiphoton = F
  use_bsi = F
end:control
begin:boundaries
  bc_x_min = periodic
  bc_x_max = periodic
end:boundaries
begin:species
  name = Electron
  charge = -1
  mass = 1.0
end:species
begin:species
  name = Hydrogen
  charge = 0
  mass = 1836.2
  number_density = 1e20
  nparticles = 256
  ionisation_energies = (13.6 * ev)
  electron = Electron
end:species
begin:output
  dt_snapshot = 1
end:output
"""


def test_binned_field_ionisation(tmp_path):
    (tmp_path / "input.deck").write_text(ION_DECK)
    sim = Simulation(str(tmp_path / "input.deck"))
    cfg = sim.cfg
    assert cfg.engine == "binned"
    assert cfg.ionise_plan is not None
    st = sim.state
    n_h0 = count(st.species[1])
    assert n_h0 == 256
    f = st.fields._replace(ex=jnp.full_like(st.fields.ex, 5.0e11))
    st = st._replace(fields=f)
    for _ in range(10):
        st = sim.fns["step_a"](st)._replace(fields=f)
    n_h = count(st.species[1])
    n_h1 = count(st.species[2])
    n_e = count(st.species[0])
    assert n_h < n_h0            # hydrogen depleted
    assert n_h1 == n_h0 - n_h    # ions appear one-for-one
    assert n_e == n_h1           # one electron per ionisation
    assert int(st.species[0].n_dropped) == 0
    w_h1 = wsum(st.species[2])
    w_e = wsum(st.species[0])
    assert abs(w_h1 - w_e) < 1e-9 * max(w_h1, 1.0)


# ---------------------------------------------------------------------------
# QED synchrotron emission (mirror of test_qed.test_emission_in_strong_field)
# ---------------------------------------------------------------------------

QED_DECK = """
begin:control
  nx = 16
  t_end = 1
  x_min = 0
  x_max = 1.6e-5
  bin_headroom = 8
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


def test_binned_qed_emission(tmp_path):
    (tmp_path / "input.deck").write_text(QED_DECK.format(tables=TABLES))
    sim = Simulation(str(tmp_path / "input.deck"))
    cfg = sim.cfg
    assert cfg.engine == "binned"
    assert cfg.binned_aux == ("opdepth", "qed_eta")
    st = sim.state
    gamma = 2000.0
    p0 = math.sqrt(gamma ** 2 - 1.0) * const.m0 * const.c
    el = st.species[0]
    assert el.aux is not None and el.aux.shape[0] == 2
    p = jnp.zeros_like(el.p).at[0].set(jnp.where(el.w > 0, p0, 0.0))
    el = el._replace(p=p)
    f = st.fields._replace(ey=jnp.full_like(st.fields.ey, 2.0e14))
    st = st._replace(fields=f, species=(el, st.species[1]))
    p_tot0 = float(jnp.sum(jnp.where(el.w > 0, el.p[0], 0.0)))
    for _ in range(20):
        st = sim.fns["step_a"](st)._replace(fields=f)
    n_ph = count(st.species[1])
    assert n_ph > 0, "no photons emitted at eta~1"
    # this cascade overfills the K-slot photon columns on purpose: the
    # overflow must be COUNTED (never silent)
    assert int(st.species[1].n_dropped) >= 0
    p_tot1 = float(jnp.sum(jnp.where(st.species[0].w > 0,
                                     st.species[0].p[0], 0.0)))
    assert p_tot1 < p_tot0       # radiation reaction recoil
    ph = st.species[1]
    px = np.asarray(ph.p[0])[np.asarray(ph.w > 0)]
    assert (px > 0).all()        # photons along +x


# ---------------------------------------------------------------------------
# bremsstrahlung (mirror of test_bremsstrahlung.test_emission_rate_and_recoil)
# ---------------------------------------------------------------------------

BREM_DECK = """
begin:control
  nx = 16
  t_end = 1
  x_min = 0
  x_max = 1.6e-5
  bin_headroom = 8
end:control
begin:boundaries
  bc_x_min = periodic
  bc_x_max = periodic
end:boundaries
begin:bremsstrahlung
  use_bremsstrahlung = T
  produce_photons = T
  photon_weight = 1.0
  use_bremsstrahlung_recoil = T
  table_location = {tables}
end:bremsstrahlung
begin:species
  name = Electron
  charge = -1
  mass = 1.0
  number_density = 1e20
  nparticles = 256
  identify:electron
end:species
begin:species
  name = Carbon
  charge = 6
  mass = 21894
  atomic_number = 6
  number_density = 1e28
  nparticles_per_cell = 16
end:species
begin:species
  name = Photon
  nparticles = 0
  identify:brem_photon
end:species
begin:output
  dt_snapshot = 1
end:output
"""


def test_binned_bremsstrahlung(tmp_path):
    from tests.test_bremsstrahlung import write_table, SIGMA0
    write_table(tmp_path / "br6")
    (tmp_path / "input.deck").write_text(BREM_DECK.format(tables=tmp_path))
    sim = Simulation(str(tmp_path / "input.deck"))
    cfg = sim.cfg
    assert cfg.engine == "binned"
    assert "opdepth_brem" in cfg.binned_aux
    st = sim.state
    gamma = 20.0
    p0 = math.sqrt(gamma ** 2 - 1.0) * const.m0 * const.c
    el = st.species[0]
    p = jnp.zeros_like(el.p).at[0].set(jnp.where(el.w > 0, p0, 0.0))
    st = st._replace(species=(el._replace(p=p),) + st.species[1:])

    run = make_full_step(cfg)
    nsteps = 40
    st = run(st, nsteps)

    ph = st.species[2]
    n_ph = count(ph)
    n_el = count(st.species[0])
    v = math.sqrt(1.0 - 1.0 / gamma ** 2) * const.c
    rate = 1e28 * SIGMA0 * v * cfg.dt
    expect = n_el * rate * nsteps
    assert n_ph > 0
    assert 0.4 * expect < n_ph < 2.5 * expect, (n_ph, expect)
    assert int(ph.n_dropped) == 0

    # energy bookkeeping: electron kinetic loss equals photon energy
    el2 = st.species[0]
    mc = const.m0 * const.c
    g2 = np.sqrt(1.0 + np.sum(np.asarray(el2.p) ** 2, 0) / mc ** 2)
    e_lost = float(np.sum((gamma - g2) * const.m0 * const.c ** 2
                          * np.asarray(el2.w > 0)))
    e_ph = float(np.sum(const.c * np.sqrt(np.sum(np.asarray(ph.p) ** 2, 0))
                        * np.asarray(ph.w > 0)))
    assert e_ph > 0
    assert abs(e_lost - e_ph) < 0.05 * e_ph, (e_lost, e_ph)


# ---------------------------------------------------------------------------
# collisional ionisation (mirror of test_coll_ionise end-to-end)
# ---------------------------------------------------------------------------

CI_DECK = """
begin:control
  nx = 8
  t_end = 1
  x_min = 0
  x_max = 8e-6
  bin_headroom = 4
end:control
begin:boundaries
  bc_x_min = periodic
  bc_x_max = periodic
end:boundaries
begin:species
  name = electron
  charge = -1
  mass = 1.0
  number_density = 1e28
  nparticles_per_cell = 32
  temperature_ev = 2000
  identify:electron
end:species
begin:species
  name = hydrogen
  charge = 0
  mass = 1836.2
  atomic_number = 1
  number_density = 1e28
  nparticles_per_cell = 32
  ionisation_energies = (13.6*ev)
  electron_species = electron
end:species
begin:collisions
  use_collisions = T
  coulomb_log = 1
  collisional_ionisation = T
end:collisions
begin:output
  dt_snapshot = 1
end:output
"""


def test_binned_collisional_ionisation(tmp_path):
    (tmp_path / "input.deck").write_text(CI_DECK)
    sim = Simulation(str(tmp_path / "input.deck"), seed=6)
    cfg = sim.cfg
    assert cfg.engine == "binned"
    plan = cfg.collision_plan
    assert plan is not None and len(plan.ionise_entries) == 1
    names = [s.name for s in cfg.species]
    assert "hydrogen1" in names

    st = sim.state
    ih = names.index("hydrogen")
    ip = names.index("hydrogen1")
    ie_ = names.index("electron")

    w_h0 = wsum(st.species[ih])
    w_e0 = wsum(st.species[ie_])
    assert wsum(st.species[ip]) == 0.0

    from epoch_tpu.physics.collisions import particle_collisions
    key = jax.random.PRNGKey(3)
    coll = jax.jit(lambda s, k: particle_collisions(
        s, cfg, cfg.collision_plan, k))
    for _ in range(30):
        key, sub = jax.random.split(key)
        st, _ = coll(st, sub)

    w_h1 = wsum(st.species[ih])
    w_p1 = wsum(st.species[ip])
    w_e1 = wsum(st.species[ie_])
    assert w_p1 > 0, "no ionisation events"
    dropped = int(st.species[ip].n_dropped) \
        + int(st.species[ie_].n_dropped)
    assert dropped == 0
    assert abs((w_h0 - w_h1) - w_p1) < 1e-6 * w_h0
    assert abs((w_e1 - w_e0) - w_p1) < 1e-6 * w_e0
    assert w_p1 < w_h0


# ---------------------------------------------------------------------------
# ballistic photon push on the slot grid
# ---------------------------------------------------------------------------

def test_binned_photon_push(tmp_path):
    (tmp_path / "input.deck").write_text(MERGE_DECK)
    sim = Simulation(str(tmp_path / "input.deck"))
    plan = binmod.BinnedPlan(sim.cfg)
    b = sim.state.species[0]
    # one photon in cell 2 moving +x at c
    w = jnp.zeros_like(b.w).at[0, 2].set(1.0)
    xi = jnp.zeros_like(b.xi)
    e_ph = 1e-13      # J
    p = jnp.zeros_like(b.p).at[0, 0, 2].set(e_ph / const.c)
    ph = b._replace(w=w, xi=xi, p=p)
    nsteps = 20
    dx = sim.cfg.grid.delta[0]
    x_i, _, _, alive_i = binmod.to_flat(ph, sim.cfg.grid)
    x0 = float(x_i[alive_i, 0][0])
    for _ in range(nsteps):
        ph = binmod.push_photons_binned(ph, plan)
    # absolute position via the flat view
    x, pp, ww, alive = binmod.to_flat(ph, sim.cfg.grid)
    xs = x[alive, 0]
    assert xs.shape[0] == 1
    lo = sim.cfg.grid.lo[0]
    L = sim.cfg.grid.n[0] * dx
    expect = lo + (x0 + nsteps * const.c * sim.cfg.dt - lo) % L
    assert abs(float(xs[0]) - expect) < 1e-3 * dx
