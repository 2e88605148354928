"""Landau damping regression (epoch1d/tests/test_landau.py analogue).

The reference test is plot-only; here we assert the measured damping rate
of a seeded Langmuir mode numerically.  At k·λ_D = 0.5 the kinetic
dispersion relation gives ω = 1.4156 ω_p, γ = −0.1534 ω_p (standard
tabulated root of the plasma dispersion function).

Initial condition: both species uniform (neutral, E(0) = 0 consistent
with Gauss's law — an electromagnetic PIC code freezes any initial
Gauss-law error into a static E_k offset that pollutes the mode) and the
wave seeded through an electron drift perturbation
p_x = p1·cos(kx), exactly like the reference's twostream seeding style."""
import math

import numpy as np
import jax.numpy as jnp
import pytest

import epoch_tpu.constants as const
from epoch_tpu.core import Simulation

DECK = """
begin:control
  pusher = scatter
  nx = 64
  t_end = {t_end}
  x_min = 0
  x_max = {L}
end:control
begin:boundaries
  bc_x_min = periodic
  bc_x_max = periodic
end:boundaries
begin:constant
  n0 = {n0}
end:constant
begin:species
  name = electrons
  charge = -1
  mass = 1.0
  temperature = {T}
  number_density = n0
  drift_x = {p1} * cos(2 * pi * x / {L})
  nparticles_per_cell = 4000
end:species
begin:species
  name = protons
  charge = 1
  mass = 1836.2
  temperature = 0
  number_density = n0
  nparticles_per_cell = 16
end:species
begin:output
  dt_snapshot = 1
end:output
"""

GAMMA_OVER_WP = -0.1534          # k lambda_D = 0.5
OMEGA_OVER_WP = 1.4156


@pytest.mark.slow
def test_landau_damping_rate(tmp_path):
    n0 = 1.0e20
    wp = math.sqrt(n0 * const.q0 ** 2 / (const.epsilon0 * const.m0))
    # pick T so that lambda_D = 0.5 / k with one mode in the box
    # v_t = 0.05c: non-relativistic, so the analytic (Maxwellian) Landau
    # rate applies at the resonance v_phi = 2.83 v_t; k lambda_D = 0.5
    # with one mode in the box (L = 4 pi lambda_D)
    lam_d = 0.05 * const.c / wp
    T = lam_d ** 2 * n0 * const.q0 ** 2 / (const.epsilon0 * const.kb)
    L = 4.0 * math.pi * lam_d
    # v1/vt = 0.04: linear regime (bounce period >> fit window); the
    # ppc=4000 shot-noise floor sits well below the seeded response,
    # so fit envelope peaks with t*wp in (1, 9) — measured on this
    # configuration: gamma = -0.141 wp vs -0.1534 theory (8%)
    p1 = const.m0 * 0.002 * const.c
    t_end = 10.0 / wp
    (tmp_path / "input.deck").write_text(
        DECK.format(L=L, n0=n0, T=T, p1=p1, t_end=t_end))
    sim = Simulation(str(tmp_path / "input.deck"), seed=3)
    # high-ppc 1D: the scatter engine handles 256k particles
    # without the K=8000-slot rebin sorts the binned layout would need
    assert sim.cfg.engine == "scatter"

    st = sim.state
    dt = sim.cfg.dt
    times, energies = [], []
    nsteps = int(t_end / dt) + 1
    stride = 4
    for s in range(0, nsteps, stride):
        for _ in range(stride):
            st = sim.fns["step_b"](sim.fns["step_a"](st))
        ex = sim.cfg.grid.interior(st.fields.ex)
        # mode-1 amplitude (the seeded Langmuir wave)
        mode = np.abs(np.fft.rfft(np.asarray(ex))[1])
        times.append((s + stride) * dt)
        energies.append(mode)
    times = np.array(times)
    amp = np.array(energies)

    # envelope fit: peaks of the standing-wave oscillation
    from scipy.signal import argrelmax
    pk = argrelmax(amp, order=2)[0]
    # drop the initial transient; fit the linear-damping window only
    pk = pk[(times[pk] * wp > 1.0) & (times[pk] * wp < 9.0)]
    assert pk.size >= 2, "not enough oscillation peaks to fit"
    coef = np.polyfit(times[pk], np.log(amp[pk]), 1)
    gamma_meas = coef[0]
    gamma_ref = GAMMA_OVER_WP * wp
    assert abs(gamma_meas - gamma_ref) < 0.35 * abs(gamma_ref), (
        gamma_meas / wp, GAMMA_OVER_WP)
    # and the wave visibly decayed (at least one e-fold across the fit)
    assert amp[pk[-1]] < 0.6 * amp[pk[0]]
