"""Delta-f method (DELTAF_METHOD: particles.F90:405-408 + f0 :521-553,
deltaf_loader.F90): with the background f0 matching the loaded
Maxwellian exactly, the marker weights cancel (w = pvol * f0) and the
deposited current noise collapses relative to full-f."""
import numpy as np

from epoch_tpu.core import Simulation
from epoch_tpu.core.step import make_full_step

DECK = """
begin:control
  pusher = scatter
  nx = 64
  t_end = 1
  x_min = 0
  x_max = 6.4e-5
end:control
begin:boundaries
  bc_x_min = periodic
  bc_x_max = periodic
end:boundaries
begin:species
  name = electron
  charge = -1
  mass = 1.0
  number_density = 1e20
  nparticles_per_cell = 16
  temperature_ev = 100
{back}
end:species
begin:output
  dt_snapshot = 1
end:output
"""

BACK = """  density_back = 1e20
  temp_back_ev = 100
"""


def _field_noise(deck_text, seed=3):
    import tempfile, os
    d = tempfile.mkdtemp()
    with open(os.path.join(d, "input.deck"), "w") as f:
        f.write(deck_text)
    sim = Simulation(os.path.join(d, "input.deck"), seed=seed)
    run = make_full_step(sim.cfg)
    st = run(sim.state, 20)
    ex = np.asarray(sim.cfg.grid.interior(st.fields.ex))
    return float((ex ** 2).sum()), sim


def test_deltaf_weight_cancellation():
    """pvol * f0 equals the particle weight at load (uniform case)."""
    import tempfile, os, math
    import epoch_tpu.constants as const
    d = tempfile.mkdtemp()
    with open(os.path.join(d, "input.deck"), "w") as f:
        f.write(DECK.format(back=BACK))
    sim = Simulation(os.path.join(d, "input.deck"), seed=3)
    sp = sim.cfg.species[0]
    assert sp.deltaf is not None
    dens_b, temp_b, drift_b = sp.deltaf
    sl = sim.state.species[0]
    alive = np.asarray(sl.alive)
    p = np.asarray(sl.p)[alive]
    pv = np.asarray(sl.pvol)[alive]
    w = np.asarray(sl.weight)[alive]
    two_kb_mass = 2.0 * const.kb * sp.mass
    expo = sum((p[:, i] - drift_b[i]) ** 2 / temp_b[i]
               for i in range(3)) / two_kb_mass
    norm = dens_b / math.sqrt((math.pi * two_kb_mass) ** 3
                              * temp_b[0] * temp_b[1] * temp_b[2])
    wb = pv * norm * np.exp(-expo)
    assert np.allclose(wb, w, rtol=1e-10)


def test_deltaf_noise_reduction():
    noise_full, _ = _field_noise(DECK.format(back=""))
    noise_df, sim = _field_noise(DECK.format(back=BACK))
    assert sim.cfg.engine == "scatter"
    assert noise_df < 1e-6 * noise_full, (noise_df, noise_full)


DECK_BINNED = DECK.replace("  pusher = scatter\n", "")


def test_deltaf_binned_engine_selected():
    """Delta-f decks stay on the binned engine: pvol rides a routed aux
    row and the slot deposit subtracts f0 (push_deposit_binned)."""
    import tempfile, os
    d = tempfile.mkdtemp()
    with open(os.path.join(d, "input.deck"), "w") as f:
        f.write(DECK_BINNED.format(back=BACK))
    sim = Simulation(os.path.join(d, "input.deck"), seed=3)
    assert sim.cfg.engine == "binned"
    assert "pvol" in sim.cfg.binned_aux
    b = sim.state.species[0]
    assert hasattr(b, "xi")
    # pvol loaded alongside the particles (nonzero on live slots)
    i_pv = sim.cfg.binned_aux.index("pvol")
    pv = np.asarray(b.aux[i_pv])
    live = np.asarray(b.w) > 0
    assert (pv[live] > 0).all()
    assert (pv[~live] == 0).all()


def test_deltaf_noise_reduction_binned():
    """Same noise-collapse oracle as the scatter test, on the binned
    engine: with f0 matching the load, the deposited current (and so
    the driven Ex) vanishes to round-off."""
    noise_full, _ = _field_noise(DECK_BINNED.format(back=""))
    noise_df, sim = _field_noise(DECK_BINNED.format(back=BACK))
    assert sim.cfg.engine == "binned"
    assert noise_df < 1e-6 * noise_full, (noise_df, noise_full)
