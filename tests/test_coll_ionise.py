"""Collisional (electron-impact) ionisation
(collisional_ionisation + preionise, collisions.F90:229-711)."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import epoch_tpu.constants as const
from epoch_tpu.core import Simulation
from epoch_tpu.physics.collisions import _eiics_cm2

DECK = """
begin:control
  pusher = scatter
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


def test_mbell_cross_section_shape():
    """MBELL σ(E) for hydrogen 1s: zero below threshold bracket, peaks
    around ~4I, falls off at high energy (Bell model physics)."""
    entry = dict(e_ion_ev=13.6, n1=1, l=0, n2=1, q_full=const.q0)
    e = jnp.asarray([20.0, 55.0, 500.0, 5e4])
    sig = np.asarray(_eiics_cm2(e, entry, 0.0))
    assert np.all(sig > 0)
    assert sig[1] > sig[0] and sig[1] > sig[2] > sig[3]
    # peak magnitude ~1e-17..1e-16 cm² for hydrogen
    assert 1e-18 < sig[1] < 1e-15


def test_collisional_ionisation_end_to_end(tmp_path):
    """Hot electrons on neutral hydrogen ionise it: protons + new
    electrons appear, charge and weight books balance."""
    p = tmp_path / "input.deck"
    p.write_text(DECK)
    sim = Simulation(str(p), seed=6)
    cfg = sim.cfg
    assert cfg.engine == "scatter"
    plan = cfg.collision_plan
    assert plan is not None and len(plan.ionise_entries) == 1
    names = [s.name for s in cfg.species]
    assert "hydrogen1" in names            # chain-derived ion species

    st = sim.state
    ih = names.index("hydrogen")
    ip = names.index("hydrogen1")
    ie_ = names.index("electron")

    def wsum(st, i):
        s = st.species[i]
        return float(jnp.where(s.alive, s.weight, 0.0).sum())

    w_h0 = wsum(st, ih)
    w_e0 = wsum(st, ie_)
    assert wsum(st, ip) == 0.0

    from epoch_tpu.physics.collisions import particle_collisions
    key = jax.random.PRNGKey(3)
    coll = jax.jit(lambda s, k: particle_collisions(
        s, cfg, cfg.collision_plan, k))
    for _ in range(30):
        key, sub = jax.random.split(key)
        st, _ = coll(st, sub)

    w_h1 = wsum(st, ih)
    w_p1 = wsum(st, ip)
    w_e1 = wsum(st, ie_)
    assert w_p1 > 0, "no ionisation events"
    # hydrogen weight lost equals ion weight gained
    assert abs((w_h0 - w_h1) - w_p1) < 1e-6 * w_h0
    # released electrons carry the same weight
    assert abs((w_e1 - w_e0) - w_p1) < 1e-6 * w_e0
    # not everything ionised in 30 steps of this rate
    assert w_p1 < w_h0
