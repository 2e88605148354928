"""Derived-variable oracles (io/calc_df.F90:35-1231).

A uniform drifting Maxwellian plasma has analytic moments: per-axis
temperature = the loaded temperature, per-species current = n q v_drift,
ekflux > 0 along the drift, Poynting flux = E x B / mu0 for uniform
crossed fields."""
import numpy as np
import jax.numpy as jnp

import epoch_tpu.constants as const
from epoch_tpu.core import Simulation
from epoch_tpu.io.diagnostics import derived_variable

DECK = """
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
begin:species
  name = electron
  charge = -1
  mass = 1.0
  number_density = 1e20
  nparticles_per_cell = 64
  temperature_x = 11604525
  temperature_y = 2 * 11604525
  temperature_z = 11604525
  drift_px = 3e-23
end:species
begin:output
  dt_snapshot = 1
end:output
"""


def _sim(tmp_path):
    (tmp_path / "input.deck").write_text(DECK)
    return Simulation(str(tmp_path / "input.deck"), seed=11)


def test_per_axis_temperature(tmp_path):
    sim = _sim(tmp_path)
    tx = derived_variable("temperature_x", sim.cfg, sim.state, 0)
    ty = derived_variable("temperature_y", sim.cfg, sim.state, 0)
    # loaded T_x = 1 keV (in K), T_y = 2 keV: per-axis stress temperatures
    # must see the anisotropy (sampling noise at 64 ppc -> 15% tolerance)
    T0 = 11604525.0
    assert abs(np.median(tx) - T0) / T0 < 0.15, np.median(tx) / T0
    assert abs(np.median(ty) - 2 * T0) / (2 * T0) < 0.15
    # isotropised 'temperature' is the dof=3 average
    tt = derived_variable("temperature", sim.cfg, sim.state, 0)
    expect = (1 + 2 + 1) / 3 * T0
    assert abs(np.median(tt) - expect) / expect < 0.15


def test_per_species_current(tmp_path):
    sim = _sim(tmp_path)
    jx = derived_variable("current_x", sim.cfg, sim.state, 0)
    # J = n q <v_x>; drift_px = 3e-23 kg m/s -> v = p/(m gamma)
    v = 3e-23 / const.m0 / np.sqrt(1 + (3e-23 / (const.m0 * const.c)) ** 2)
    expect = 1e20 * (-const.q0) * v
    assert abs(np.mean(jx) - expect) / abs(expect) < 0.1, (
        np.mean(jx), expect)


def test_ekflux_positive_along_drift(tmp_path):
    sim = _sim(tmp_path)
    fx = derived_variable("ekflux_x", sim.cfg, sim.state, 0)
    assert np.mean(fx) > 0.0


def test_poynting_flux(tmp_path):
    sim = _sim(tmp_path)
    st = sim.state
    f = st.fields
    E0, B0 = 1e6, 0.01
    f = f._replace(ey=jnp.full_like(f.ey, E0), bz=jnp.full_like(f.bz, B0))
    st = st._replace(fields=f)
    sx = derived_variable("poynt_flux_x", sim.cfg, st)
    expect = E0 * B0 / const.mu0
    np.testing.assert_allclose(sx, expect, rtol=1e-6)
