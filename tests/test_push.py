"""Particle push + deposition physics tests.

The reference has no unit tests for the pusher (testing is end-to-end,
survey §4); these cover the TPU kernels directly: Boris gyration, E-field
acceleration, and the charge-conservation property of the PSC deposition
(∇·E − ρ/ε₀ invariant to round-off, particles.F90:32-34).
"""
import numpy as np
import jax.numpy as jnp
import pytest

import epoch_tpu.constants as const
from epoch_tpu.core import Simulation
from epoch_tpu.io.diagnostics import derived_variable


def make_sim(tmp_path, extra_species="", nx=64, t_end=1.0):
    deck = f"""
begin:control
  pusher = scatter
  nx = {nx}
  t_end = {t_end}
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
  number_density = 1e10
  nparticles = {nx * 8}
  temperature_x = 1e4
{extra_species}
end:species
begin:output
  dt_snapshot = 1
  grid = always
end:output
"""
    p = tmp_path / "input.deck"
    p.write_text(deck)
    return Simulation(str(p))


def make_tracer_sim(tmp_path):
    """Single-particle style setup: zero-current tracers in frozen fields."""
    deck = """
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
  name = tracer
  charge = -1
  mass = 1.0
  number_density = 1e10
  nparticles = 64
  zero_current = T
end:species
begin:output
  dt_snapshot = 1
end:output
"""
    p = tmp_path / "input.deck"
    p.write_text(deck)
    return Simulation(str(p))


def test_boris_gyration(tmp_path):
    """Tracer electron in uniform Bz gyrates with |p| conserved and the
    discrete Boris frequency 2·atan(ωc dt/2)/dt (particles.F90:322-345)."""
    sim = make_tracer_sim(tmp_path)
    cfg = sim.cfg
    st = sim.state
    bz0 = 10.0    # Tesla — rotation ~5 mrad/step at this dt
    f = st.fields._replace(bz=jnp.full_like(st.fields.bz, bz0))
    slab = st.species[0]
    p0 = 1e-23
    p = jnp.zeros_like(slab.p).at[:, 0].set(p0)
    slab = slab._replace(p=p)
    st = st._replace(fields=f, species=(slab,))
    n = 100
    for _ in range(n):
        st = sim.fns["step_a"](st)._replace(fields=f)  # frozen ext. field
    pa = np.asarray(st.species[0].p)
    pmag = np.sqrt((pa ** 2).sum(axis=1))
    np.testing.assert_allclose(pmag, p0, rtol=1e-12)
    gamma = np.sqrt(1 + (p0 / (const.m0 * const.c)) ** 2)
    wc = const.q0 * bz0 / (gamma * const.m0)
    dt = cfg.dt
    w_boris = 2.0 / dt * np.arctan(wc * dt / 2.0)
    angle = np.arctan2(pa[:, 1], pa[:, 0])
    # electron (q<0) with +px in +Bz: F = qv×B = +ŷ ⇒ positive rotation
    expected = (w_boris * n * dt) % (2 * np.pi)
    got = angle[0] % (2 * np.pi)
    err = abs(((got - expected + np.pi) % (2 * np.pi)) - np.pi)
    total = w_boris * n * dt
    assert err < 1e-9 * max(total, 1.0), (got, expected)


def test_e_acceleration(tmp_path):
    """dp/dt = qE for uniform Ey (kick split verified over full steps)."""
    sim = make_tracer_sim(tmp_path)
    st = sim.state
    ey0 = 1e3
    f = st.fields._replace(ey=jnp.full_like(st.fields.ey, ey0))
    slab = st.species[0]._replace(p=jnp.zeros_like(st.species[0].p))
    st = st._replace(fields=f, species=(slab,))
    n = 50
    for _ in range(n):
        st = sim.fns["step_a"](st)._replace(fields=f)
    pa = np.asarray(st.species[0].p)
    expected = -const.q0 * ey0 * n * sim.cfg.dt
    np.testing.assert_allclose(pa[:, 1], expected, rtol=1e-10)


def test_charge_conservation_gauss_law(tmp_path):
    """∇·E − ρ/ε₀ is time-invariant to round-off: the PSC deposition solves
    dρ/dt = −∇·J exactly on the grid (particles.F90:32-34,453).

    The conserved ρ is the shape-deposited charge at the *half-drifted*
    positions (the gx set of the pusher), and the matching E is the
    mid-step field (after fields_half, which completes the previous step's
    J contribution)."""
    from epoch_tpu.io.diagnostics import particle_to_grid, _fold_and_strip
    sim = make_sim(tmp_path)
    cfg = sim.cfg
    st = sim.state
    dt = cfg.dt
    grid = cfg.grid

    def rho_half(state):
        acc = 0.0
        for sp, slab in zip(cfg.species, state.species):
            mc = sp.mass * const.c
            u = slab.p / mc
            gamma = jnp.sqrt(1.0 + jnp.sum(u ** 2, axis=1))
            drift = u[:, :grid.ndims] * (const.c * dt / 2.0 / gamma)[:, None]
            moved = slab._replace(x=slab.x + drift)
            acc = acc + particle_to_grid(moved, grid) * sp.charge
        return np.asarray(_fold_and_strip(acc, cfg)) / grid.cell_volume

    def div_e(state):
        ex = np.asarray(state.fields.ex)
        ng, n, dx = grid.ng, grid.n[0], grid.delta[0]
        return (ex[ng:n + ng] - ex[ng - 1:n + ng - 1]) / dx

    # G_n = divE(mid-step n) − ρ_half(pre-step n)/ε₀
    rho0 = rho_half(st)
    mid = sim.fns["step_a"](st)
    g0 = div_e(mid) - rho0 / const.epsilon0
    st = sim.fns["step_b"](mid)
    for _ in range(50):
        st = sim.fns["step_b"](sim.fns["step_a"](st))
    rho_n = rho_half(st)
    mid = sim.fns["step_a"](st)
    g1 = div_e(mid) - rho_n / const.epsilon0
    scale = np.abs(rho0).max() / const.epsilon0
    drift = np.abs(g1 - g0).max()
    assert drift < 1e-9 * scale, f"Gauss-law drift {drift} vs scale {scale}"


def test_total_momentum_and_weight_conserved(tmp_path):
    sim = make_sim(tmp_path)
    st = sim.state
    w0 = float(jnp.sum(st.species[0].weight))
    for _ in range(20):
        st = sim.fns["step_a"](st)
        st = sim.fns["step_b"](st)
    w1 = float(jnp.sum(st.species[0].weight))
    assert abs(w1 - w0) < 1e-10 * abs(w0)


def test_energy_conservation_twostream_short(tmp_path):
    """Total (field + kinetic) energy conserved to <1% over a short
    two-stream run (the reference gates physics on energy conservation)."""
    deck = """
begin:control
  pusher = scatter
  nx = 64
  t_end = 1
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
  nparticles = 1024
end:species
begin:species
  name = Left
  charge = -1
  mass = 1.0
  temperature_x = 273
  drift_px = -drift_p
  number_density = 10
  nparticles = 1024
end:species
begin:output
  dt_snapshot = 1
end:output
"""
    p = tmp_path / "input.deck"
    p.write_text(deck)
    sim = Simulation(str(p))
    from epoch_tpu.io.diagnostics import total_field_energy, \
        total_particle_energy
    st = sim.state
    e0 = total_field_energy(sim.cfg, st) + total_particle_energy(sim.cfg, st)
    for _ in range(300):
        st = sim.fns["step_a"](st)
        st = sim.fns["step_b"](st)
    e1 = total_field_energy(sim.cfg, st) + total_particle_energy(sim.cfg, st)
    assert abs(e1 - e0) < 0.01 * e0
