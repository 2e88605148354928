"""Two-stream instability physics regression.

The reference test (epoch1d/tests/test_twostream.py) is plot-only; here we
assert numerics: the Ex field energy must grow exponentially at the cold
two-stream rate of the fastest box mode (within a generous bracket), on a
reduced version of the reference deck (same physics, shorter run).
"""
import numpy as np
import pytest

import epoch_tpu.constants as const
from epoch_tpu.core import Simulation
from epoch_tpu.core.step import make_full_step

DECK = """
begin:control
  nx = 128
  t_end = 0.15
  x_min = 0
  x_max = 5.0e5
end:control
begin:boundaries
  bc_x_min = periodic
  bc_x_max = periodic
end:boundaries
begin:constant
  drift_p = 2.5e-24
end:constant
begin:species
  name = Right
  charge = -1
  mass = 1.0
  temperature_x = 273
  drift_px = drift_p
  number_density = 10
  nparticles = 4096
end:species
begin:species
  name = Left
  charge = -1
  mass = 1.0
  temperature_x = 273
  drift_px = -drift_p
  number_density = 10
  nparticles = 4096
end:species
begin:output
  dt_snapshot = 1
end:output
"""


def theory_growth_rate(L, v0, wb, modes=12):
    """Max growth rate over box modes for symmetric cold beams:
    (ω²−k²v²)² = ωb²[(ω−kv)² + (ω+kv)²]."""
    best = 0.0
    for j in range(1, modes + 1):
        k = 2 * np.pi * j / L
        kv = k * v0
        # polynomial in ω: ((ω-kv)(ω+kv))^2 - wb^2[(ω-kv)^2+(ω+kv)^2] = 0
        # = ω^4 - 2k²v²ω² + k⁴v⁴ - wb²(2ω² + 2k²v²) = 0
        coeffs = [1.0, 0.0, -2 * kv ** 2 - 2 * wb ** 2, 0.0,
                  kv ** 4 - 2 * wb ** 2 * kv ** 2]
        roots = np.roots(coeffs)
        best = max(best, float(np.max(roots.imag)))
    return best


@pytest.mark.slow
def test_twostream_growth(tmp_path):
    p = tmp_path / "input.deck"
    p.write_text(DECK)
    sim = Simulation(str(p), seed=3)
    cfg = sim.cfg
    run = make_full_step(cfg)

    v0 = 2.5e-24 / const.m0
    wb = np.sqrt(10 * const.q0 ** 2 / (const.epsilon0 * const.m0))
    gamma_th = theory_growth_rate(5.0e5, v0, wb)
    assert gamma_th > 0

    st = sim.state
    chunk = 100
    times, energies = [], []
    nsteps = int(0.15 / cfg.dt)
    for _ in range(nsteps // chunk):
        st = run(st, chunk)
        ex = np.asarray(cfg.grid.interior(st.fields.ex))
        times.append(float(st.time))
        energies.append((ex ** 2).sum())
    times = np.array(times)
    energies = np.array(energies)

    sat = energies.max()
    floor = energies.min()
    # instability must develop by many e-foldings
    assert sat > 1e2 * floor
    # the asymptotic rate only shows once the fastest mode dominates and
    # before saturation: measure the PEAK local slope of ln E² (the early
    # window is polluted by noise-seeded mode competition and reads low)
    ln = np.log(energies)
    local = np.gradient(ln, times) / 2.0
    grow = (times < times[np.argmax(energies)]) \
        & (energies > 1e-3 * sat) & (energies < 0.5 * sat)
    assert grow.sum() >= 3, "no clean growth window found"
    gamma_sim = float(local[grow].max())
    assert 0.6 * gamma_th < gamma_sim < 1.3 * gamma_th, \
        (gamma_sim, gamma_th)
