"""Bremsstrahlung emission tests (physics_packages/bremsstrahlung.F90).

The reference ships no br<Z> tables (they are user-provided Geant4
exports), so these tests write a tiny synthetic table in the exact file
format the reference reads (setup_tables_bremsstrahlung :227-237) and
check the loader, the emission rate against n_i * sigma * v * dt, the
recoil bookkeeping, and the stationary-photon default."""
import math
import os

import numpy as np
import pytest

import epoch_tpu.constants as const
from epoch_tpu.core import Simulation
from epoch_tpu.core.step import make_full_step

# synthetic table: constant cross section, photon energy uniform in
# [0, e/2] (CDF linear), 8 electron-energy rows
SIGMA0 = 2.0e-24          # m^2 (inflated so emissions happen in ~40 steps)
E_ROWS = np.geomspace(1e-16, 1e-9, 8)     # J (~keV..GeV)
SIZE_K = 16


def write_table(path):
    ks = np.linspace(0.0, 0.5, SIZE_K)
    with open(path, "w") as f:
        f.write(f"{SIZE_K} {len(E_ROWS)}\n")
        f.write(" ".join(f"{e:.9e}" for e in E_ROWS) + "\n")
        f.write(" ".join(f"{SIGMA0:.9e}" for _ in E_ROWS) + "\n")
        for e in E_ROWS:
            f.write(" ".join(f"{k * e:.9e}" for k in ks) + "\n")
        cdf = np.linspace(0.0, 1.0, SIZE_K)
        for _ in E_ROWS:
            f.write(" ".join(f"{c:.9e}" for c in cdf) + "\n")


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


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    d = tmp_path_factory.mktemp("brem")
    write_table(d / "br6")
    (d / "input.deck").write_text(DECK.format(tables=d))
    return Simulation(str(d / "input.deck"))


def test_table_loader(sim):
    tab = sim.cfg.brem_plan.tables[6]
    assert tab.size_t == len(E_ROWS) and tab.size_k == SIZE_K
    assert np.allclose(tab.cross_section, SIGMA0)
    # k rows span [0, e/2]
    assert np.allclose(tab.k_table[:, -1], 0.5 * E_ROWS)


def test_missing_table_error(tmp_path):
    from epoch_tpu.physics.bremsstrahlung import load_brem_tables
    with pytest.raises(FileNotFoundError, match="br13"):
        load_brem_tables(str(tmp_path), [13])


def test_emission_rate_and_recoil(sim):
    """Fire rate must match n_i sigma v dt; electrons must lose the
    emitted energy (use_bremsstrahlung_recoil)."""
    import jax.numpy as jnp
    cfg = sim.cfg
    st = sim.state
    # relativistic electrons: gamma = 20 along +x
    gamma = 20.0
    p0 = math.sqrt(gamma ** 2 - 1.0) * const.m0 * const.c
    el = st.species[0]
    p = jnp.zeros_like(el.p).at[:, 0].set(p0)
    st = st._replace(species=(el._replace(p=p),) + st.species[1:])

    run = make_full_step(cfg)
    nsteps = 40
    st = run(st, nsteps)

    ph = st.species[2]
    n_ph = int(ph.alive.sum())
    n_el = int(st.species[0].alive.sum())
    # expected rate: tau decrements by n_i sigma v dt each step
    v = math.sqrt(1.0 - 1.0 / gamma ** 2) * const.c
    rate = 1e28 * SIGMA0 * v * cfg.dt          # per electron per step
    expect = n_el * rate * nsteps              # Poisson mean (multi-emission)
    assert n_ph > 0
    assert 0.4 * expect < n_ph < 2.5 * expect, (n_ph, expect)

    # energy bookkeeping: electron kinetic loss equals photon energy
    el2 = st.species[0]
    mc = const.m0 * const.c
    g2 = np.sqrt(1.0 + np.sum(np.asarray(el2.p) ** 2, 1) / mc ** 2)
    e_lost = float(np.sum((gamma - g2) * const.m0 * const.c ** 2
                          * np.asarray(el2.alive)))
    e_ph = float(np.sum(const.c * np.sqrt(np.sum(np.asarray(ph.p) ** 2, 1))
                        * np.asarray(ph.alive)))
    assert e_ph > 0
    assert abs(e_lost - e_ph) < 0.05 * e_ph, (e_lost, e_ph)

    # photon_dynamics defaults to F: photons stay where they were born
    assert bool(np.all(np.asarray(ph.x)[np.asarray(ph.alive), 0]
                       <= cfg.grid.local_hi(0)))


def test_sample_energy_uniform_cdf(sim):
    """With a linear CDF the sampled k is uniform in [0, e/2]."""
    import jax.numpy as jnp
    from epoch_tpu.physics.bremsstrahlung import _sample_photon_energy
    tab = sim.cfg.brem_plan.tables[6]
    e = jnp.full((1000,), 1e-12)
    u = jnp.linspace(0.001, 0.999, 1000)
    k = np.asarray(_sample_photon_energy(tab, e, u))
    assert np.all(np.diff(k) >= 0)
    assert np.allclose(k, np.asarray(u) * 0.5e-12, rtol=2e-2, atol=1e-17)
