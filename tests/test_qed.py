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
