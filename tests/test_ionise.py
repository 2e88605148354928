"""Field ionisation tests (physics_packages/ionise.F90).

Checks the ADK machinery: chain expansion from the deck, rate sanity
(monotonic in E, zero at low field), and end-to-end ionisation of a
hydrogen-like species in a strong static field with charge conservation.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import epoch_tpu.constants as const
from epoch_tpu.core import Simulation
from epoch_tpu.deck import load_deck

DECK = """
begin:control
  pusher = scatter
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


def test_chain_expansion(tmp_path):
    p = tmp_path / "input.deck"
    p.write_text(DECK)
    deck = load_deck(str(p))
    names = [s.name for s in deck.species]
    assert names == ["Electron", "Hydrogen", "Hydrogen1"]
    h = deck.species[1]
    assert h.ionise
    assert abs(h.ionisation_energy - 13.6 * const.ev) < 1e-25
    assert h.ionise_to_species_name == "Hydrogen1"
    assert h.release_species_name == "Electron"
    h1 = deck.species[2]
    assert abs(h1.charge - const.q0) < 1e-25


def test_adk_rate_monotonic():
    from epoch_tpu.physics.ionise import adk_rate
    lv = dict(adk_scaling=2.0 * (2 * 0.5) ** 1.5, ion_const=1.0,
              n_exp=0.5, l=0)
    e = np.logspace(-3, 0, 30)
    r = np.asarray(adk_rate(lv, jnp.asarray(e), xp=jnp))
    assert (np.diff(r) >= -1e-12).all()
    assert r[0] < 1e-10 * r[-1]


def test_strong_field_ionises(tmp_path):
    p = tmp_path / "input.deck"
    p.write_text(DECK)
    sim = Simulation(str(p))
    cfg = sim.cfg
    assert cfg.ionise_plan is not None
    st = sim.state
    n_h0 = int(st.species[1].alive.sum())
    assert n_h0 == 256
    # strong static field ~5e11 V/m ≈ atomic field / 10 → rapid ionisation
    f = st.fields._replace(ex=jnp.full_like(st.fields.ex, 5.0e11))
    st = st._replace(fields=f)
    for _ in range(10):
        st = sim.fns["step_a"](st)._replace(fields=f)
    n_h = int(st.species[1].alive.sum())
    n_h1 = int(st.species[2].alive.sum())
    n_e = int(st.species[0].alive.sum())
    assert n_h < n_h0            # hydrogen depleted
    assert n_h1 == n_h0 - n_h    # ions appear one-for-one
    assert n_e == n_h1           # each ionisation released one electron
    # charge conservation: weights preserved
    w_h1 = float(st.species[2].weight.sum())
    w_e = float(st.species[0].weight.sum())
    assert abs(w_h1 - w_e) < 1e-9 * max(w_h1, 1.0)
