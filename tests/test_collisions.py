"""Binary collision tests (physics_packages/collisions.F90).

Physics gates: momentum and energy conservation per pair, isotropisation of
an anisotropic electron population at a plausible rate, and the Pérez
cos χ inversion limits.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import epoch_tpu.constants as const
from epoch_tpu.core import Simulation
from epoch_tpu.physics.collisions import _cos_chi, _scatter_pairs

DECK = """
begin:control
  nx = 16
  t_end = 1
  x_min = 0
  x_max = 1.6e-5
end:control
begin:boundaries
  bc_x_min = periodic
  bc_x_max = periodic
end:boundaries
begin:species
  name = electron
  charge = -1
  mass = 1.0
  number_density = 1e26
  nparticles_per_cell = 16
  temp_x = 1e7
  temp_y = 1e5
  temp_z = 1e5
end:species
begin:collisions
  use_collisions = T
  coulomb_log = 5
end:collisions
begin:output
  dt_snapshot = 1
end:output
"""


def test_cos_chi_limits():
    r = jnp.linspace(0.01, 0.99, 50)
    # tiny s → nearly forward scattering
    c_small = np.asarray(_cos_chi(jnp.full_like(r, 1e-4), r))
    assert (c_small > 0.995).all()
    # huge s → isotropic: cos chi = 2r-1
    c_big = np.asarray(_cos_chi(jnp.full_like(r, 10.0), r))
    np.testing.assert_allclose(c_big, 2 * np.asarray(r) - 1, atol=1e-12)
    assert (c_big <= 1).all() and (c_big >= -1).all()


def test_pair_conservation():
    """COM scattering preserves total momentum and energy of each pair."""
    rng = np.random.default_rng(0)
    n = 256
    m1 = const.m0
    m2 = 1836.2 * const.m0
    p1 = jnp.asarray(rng.normal(scale=5e-22, size=(3, n)))
    p2 = jnp.asarray(rng.normal(scale=2e-21, size=(3, n)))
    r1 = jnp.asarray(rng.uniform(size=n))
    r2 = jnp.asarray(rng.uniform(size=n))
    s_fac = jnp.full(n, 1e-9)
    np1, np2 = _scatter_pairs(p1, p2, m1, m2, -const.q0, const.q0,
                              s_fac, jnp.full(n, 1e30),
                              jnp.full(n, 1e20), jnp.full(n, 1e20),
                              r1, r2, jnp.ones(n, bool))

    def energy(p, m):
        return np.sqrt((np.asarray(p) ** 2).sum(0) + (m * const.c) ** 2)

    ptot0 = np.asarray(p1 + p2)
    ptot1 = np.asarray(np1 + np2)
    np.testing.assert_allclose(ptot1, ptot0, rtol=1e-9, atol=1e-26)
    e0 = energy(p1, m1) + energy(p2, m2)
    e1 = energy(np1, m1) + energy(np2, m2)
    np.testing.assert_allclose(e1, e0, rtol=1e-9)
    # scattering actually happened
    assert np.abs(np.asarray(np1 - p1)).max() > 0


@pytest.mark.slow
def test_isotropisation(tmp_path):
    """Anisotropic electrons relax towards isotropy under self-collisions."""
    p = tmp_path / "input.deck"
    p.write_text(DECK)
    sim = Simulation(str(p), seed=2)
    cfg = sim.cfg
    assert cfg.engine == "binned"
    assert cfg.collision_plan is not None
    st = sim.state

    def anisotropy(st):
        b = st.species[0]
        w = np.asarray(b.w)
        ps = np.asarray(b.p)
        wsum = w.sum()
        tx = (ps[0] ** 2 * w).sum() / wsum
        ty = (ps[1] ** 2 * w).sum() / wsum
        return tx / ty

    a0 = anisotropy(st)
    for _ in range(100):
        st = sim.fns["step_b"](sim.fns["step_a"](st))
    a1 = anisotropy(st)
    assert a0 > 50        # initial Tx/Ty ~ 100
    assert a1 < a0 * 0.9  # collisions transfer energy between axes


def test_isotropisation_scatter(tmp_path):
    """The scatter-engine (cell-sorted pairing) path relaxes anisotropy
    too, and conserves momentum and energy to round-off."""
    p = tmp_path / "input.deck"
    p.write_text(DECK.replace("begin:control",
                              "begin:control\n  pusher = scatter"))
    sim = Simulation(str(p), seed=2)
    cfg = sim.cfg
    assert cfg.engine == "scatter"
    st = sim.state

    def stats(st):
        s = st.species[0]
        w = np.asarray(jnp.where(s.alive, s.weight, 0.0))
        ps = np.asarray(s.p)
        wsum = w.sum()
        tx = (ps[:, 0] ** 2 * w).sum() / wsum
        ty = (ps[:, 1] ** 2 * w).sum() / wsum
        mom = (ps * w[:, None]).sum(0)
        mc = const.m0 * const.c
        gam = np.sqrt(1 + (ps ** 2).sum(1) / mc ** 2)
        en = ((gam - 1) * w).sum() * const.m0 * const.c ** 2
        return tx / ty, mom, en

    a0, mom0, en0 = stats(st)
    from epoch_tpu.physics.collisions import particle_collisions
    key = jax.random.PRNGKey(7)
    coll = jax.jit(lambda s, k: particle_collisions(
        s, cfg, cfg.collision_plan, k))
    for _ in range(60):
        key, sub = jax.random.split(key)
        st, _ = coll(st, sub)
    a1, mom1, en1 = stats(st)
    assert a0 > 50
    assert a1 < a0 * 0.9, (a0, a1)
    assert np.allclose(mom1, mom0, atol=1e-8 * np.abs(mom0).max() + 1e-30)
    assert abs(en1 - en0) < 1e-8 * en0


def test_inter_species_scatter_equilibration(tmp_path):
    """Hot electrons + cold 'heavy electrons' exchange energy through
    inter-species collisions on the scatter engine; totals conserved."""
    deck = """
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
  name = hot
  charge = -1
  mass = 1.0
  number_density = 1e26
  nparticles_per_cell = 32
  temperature_ev = 1000
end:species
begin:species
  name = cold
  charge = -1
  mass = 1.0
  number_density = 1e26
  nparticles_per_cell = 32
  temperature_ev = 10
end:species
begin:collisions
  use_collisions = T
  coulomb_log = 5
  collide = none
  collide = hot cold on
end:collisions
begin:output
  dt_snapshot = 1
end:output
"""
    p = tmp_path / "input.deck"
    p.write_text(deck)
    sim = Simulation(str(p), seed=4)
    cfg = sim.cfg
    assert cfg.engine == "scatter"
    assert len(cfg.collision_plan.pairs) == 1
    st = sim.state

    def ke(st, i):
        s = st.species[i]
        w = np.asarray(jnp.where(s.alive, s.weight, 0.0))
        ps = np.asarray(s.p)
        mc = cfg.species[i].mass * const.c
        gam = np.sqrt(1 + (ps ** 2).sum(1) / mc ** 2)
        return ((gam - 1) * w).sum() * cfg.species[i].mass * const.c ** 2

    h0, c0 = ke(st, 0), ke(st, 1)
    from epoch_tpu.physics.collisions import particle_collisions
    key = jax.random.PRNGKey(9)
    coll = jax.jit(lambda s, k: particle_collisions(
        s, cfg, cfg.collision_plan, k))
    for _ in range(80):
        key, sub = jax.random.split(key)
        st, _ = coll(st, sub)
    h1, c1 = ke(st, 0), ke(st, 1)
    assert c1 > 1.2 * c0, (c0, c1)        # cold heats
    assert h1 < h0                         # hot cools
    assert abs((h1 + c1) - (h0 + c0)) < 1e-8 * (h0 + c0)


def test_sentoku_kemp_scatter(tmp_path):
    """use_nanbu = F selects the Sentoku-Kemp algorithm: anisotropy
    relaxes, momentum is conserved exactly and energy to the SK
    weighted-correction tolerance."""
    p = tmp_path / "input.deck"
    p.write_text(DECK.replace("begin:control",
                              "begin:control\n  pusher = scatter")
                     .replace("begin:collisions",
                              "begin:collisions\n  use_nanbu = F"))
    sim = Simulation(str(p), seed=2)
    cfg = sim.cfg
    assert cfg.collision_plan.use_nanbu is False
    st = sim.state

    def stats(st):
        s = st.species[0]
        w = np.asarray(jnp.where(s.alive, s.weight, 0.0))
        ps = np.asarray(s.p)
        tx = (ps[:, 0] ** 2 * w).sum()
        ty = (ps[:, 1] ** 2 * w).sum()
        mom = (ps * w[:, None]).sum(0)
        mc = const.m0 * const.c
        gam = np.sqrt(1 + (ps ** 2).sum(1) / mc ** 2)
        en = ((gam - 1) * w).sum() * const.m0 * const.c ** 2
        return tx / ty, mom, en

    a0, mom0, en0 = stats(st)
    from epoch_tpu.physics.collisions import particle_collisions
    key = jax.random.PRNGKey(11)
    coll = jax.jit(lambda s, k: particle_collisions(
        s, cfg, cfg.collision_plan, k))
    for _ in range(200):
        key, sub = jax.random.split(key)
        st, _ = coll(st, sub)
    a1, mom1, en1 = stats(st)
    assert a1 < a0 * 0.95, (a0, a1)
    assert np.allclose(mom1, mom0, atol=1e-8 * np.abs(mom0).max() + 1e-30)
    # equal weights -> no weighted correction -> exact energy conservation
    assert abs(en1 - en0) < 1e-8 * en0
