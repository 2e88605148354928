"""Injectors + thermal particle BCs on the binned engine.

Both were scatter-only in round 1 (_select_engine); the binned engine now
emits injector particles by a column-local slot merge
(injectors._run_injector_binned) and re-thermalises wall crossings in
apply_axis_bcs.  RNG streams differ between engines, so the checks are
statistical against the scatter implementation, not bitwise.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import epoch_tpu.constants as const
from epoch_tpu.core import Simulation

INJECT_DECK = """
begin:control
  {pusher}
  nx = 64
  t_end = 1.0
  nsteps = 60
  x_min = 0
  x_max = 64e-6
end:control
begin:boundaries
  bc_x_min = simple_outflow
  bc_x_max = simple_outflow
end:boundaries
begin:injector
  boundary = x_min
  species = beam
  number_density = 1.0e20
  temperature = 1e7
  drift_px = 2.5e-23
  nparticles_per_cell = 6
end:injector
begin:species
  name = beam
  charge = -1
  mass = 1.0
end:species
begin:output
  dt_snapshot = 1
end:output
"""


def _run_inject(tmp_path, pusher):
    d = tmp_path / pusher
    d.mkdir()
    (d / "input.deck").write_text(
        INJECT_DECK.format(pusher=f"pusher = {pusher}"))
    sim = Simulation(str(d / "input.deck"), seed=7)
    st = sim.run(max_steps=60)
    return sim, st


def _totals(sim, st):
    s = st.species[0]
    if hasattr(s, "w"):
        live = s.w > 0
        wsum = float(jnp.sum(jnp.where(live, s.w, 0.0)))
        n = int(jnp.sum(live))
        px = float(jnp.sum(jnp.where(live, s.p[0], 0.0))) / max(n, 1)
    else:
        wsum = float(jnp.sum(jnp.where(s.alive, s.weight, 0.0)))
        n = int(jnp.sum(s.alive))
        px = float(jnp.sum(jnp.where(s.alive, s.p[:, 0], 0.0))) / max(n, 1)
    return wsum, n, px


def test_binned_injector_matches_scatter(tmp_path):
    sim_b, st_b = _run_inject(tmp_path, "binned")
    sim_s, st_s = _run_inject(tmp_path, "scatter")
    assert sim_b.cfg.engine == "binned"
    assert sim_s.cfg.engine == "scatter"
    wb, nb, pxb = _totals(sim_b, st_b)
    ws, ns, pxs = _totals(sim_s, st_s)
    # flux ≈ npc·v·dt/dx ≈ 0.5 particles/step over 60 steps
    assert nb > 20, "binned injector emitted almost nothing"
    # emission rate (flux × depth accumulator) statistically equal
    assert abs(wb - ws) / ws < 0.15, (wb, ws)
    # the beam flows inward (+x) in both
    assert pxb > 0 and pxs > 0
    assert abs(pxb - pxs) / abs(pxs) < 0.3, (pxb, pxs)
    assert int(st_b.species[0].n_dropped) == 0


THERMAL_DECK = """
begin:control
  {pusher}
  # the +x-drifting plasma piles up against the x_max wall: give the
  # slot grid headroom for the compression (overflow is counted, and
  # asserted zero below)
  bin_headroom = 6.0
  nx = 48
  t_end = 1.0
  nsteps = 80
  x_min = 0
  x_max = 48e-6
end:control
begin:boundaries
  bc_x_min = thermal
  bc_x_max = thermal
end:boundaries
begin:species
  name = electron
  charge = -1
  mass = 1.0
  number_density = 1e20
  nparticles_per_cell = 8
  drift_px = 3e-23
  # hot edges: the wall temperature of a thermal BC is the species
  # temperature evaluated at the domain edge (helper.F90:42-45)
  temperature_ev = if(abs(x - 24e-6) gt 20e-6, 4000, 1)
end:species
begin:output
  dt_snapshot = 1
end:output
"""


def _run_thermal(tmp_path, pusher):
    d = tmp_path / ("t_" + pusher)
    d.mkdir()
    (d / "input.deck").write_text(
        THERMAL_DECK.format(pusher=f"pusher = {pusher}"))
    sim = Simulation(str(d / "input.deck"), seed=5)
    st = sim.run(max_steps=80)
    return sim, st


def test_binned_thermal_bc_matches_scatter(tmp_path):
    """Cold drifting plasma against hot thermal walls: both engines must
    conserve the particle count (thermal walls re-emit, never absorb)
    and heat the distribution toward the wall temperature."""
    sim_b, st_b = _run_thermal(tmp_path, "binned")
    sim_s, st_s = _run_thermal(tmp_path, "scatter")
    assert sim_b.cfg.engine == "binned"

    def stats(st, binned):
        s = st.species[0]
        if binned:
            live = s.w > 0
            n = int(jnp.sum(live))
            p2 = jnp.where(live[None], s.p, 0.0) ** 2
            e = float(jnp.sum(p2)) / max(n, 1)
        else:
            n = int(jnp.sum(s.alive))
            p2 = jnp.where(s.alive[:, None], s.p, 0.0) ** 2
            e = float(jnp.sum(p2)) / max(n, 1)
        return n, e

    n_b, e_b = stats(st_b, True)
    n_s, e_s = stats(st_s, False)
    n0 = 48 * 8
    assert int(st_b.species[0].n_dropped) == 0
    assert n_b == n0, "binned thermal wall lost particles"
    assert n_s == n0, "scatter thermal wall lost particles"
    # wall temperature 4000 eV ≫ bulk 1 eV: both must heat up, and by
    # statistically comparable amounts
    p_1ev2 = const.m0 * const.kb * 11604.5     # (1 eV thermal momentum)²
    assert e_b > 20.0 * p_1ev2, (e_b, p_1ev2)
    assert e_s > 20.0 * p_1ev2
    assert abs(e_b - e_s) / e_s < 0.5, (e_b, e_s)
