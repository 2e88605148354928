"""Slot-grid x padding (BinnedPlan.ns) for stripe-unaligned bounded grids.

The fused kernel's stripe blocks must be 8-aligned (Mosaic sublane rule);
CPML extension makes nx = nx_user + 2*thickness, which is rarely aligned
(mpi_routines.F90:290-291), so bounded-x decks pad the slot grid with
dead columns.  These tests pin:

* XLA slot engine vs fused kernel agreement on a padded grid,
* particles surviving INSIDE the CPML layer (the reference removes them
  only beyond the outer ghost edge, boundary.F90:1076-1090),
* the moving window refilling through the staging pad column, with the
  x_min CPML layer culled at each shift (window.F90:76,322-342).
"""
import numpy as np
import jax.numpy as jnp
import pytest

import epoch_tpu.constants as const
from epoch_tpu.core import binned as binmod


def _setup_padded(n=(20, 16), K=8):
    import dataclasses
    from epoch_tpu.core.grid import Grid
    from epoch_tpu.core.config import SimConfig, SpeciesConfig
    nd = 2
    dxv = 1e-6
    grid = Grid(ndims=nd, shape_fn=const.Shape.TRIANGLE, n=n,
                cpml_thickness=0, cpml_active=(False,) * (2 * nd),
                lo=(0.0,) * nd, hi=tuple(ni * dxv for ni in n))
    dt = 0.9 * dxv / (const.c * np.sqrt(nd))
    sp = SpeciesConfig(name="e", charge=-const.q0, mass=const.m0, cap=512,
                       bc_particle=(const.BC.OPEN,) * 2
                       + (const.BC.PERIODIC,) * 4)
    cfg = SimConfig(grid=grid, dt=dt, t_end=1.0, nsteps=-1,
                    bc_field=(const.BC.PERIODIC,) * 6,
                    bc_particle=(const.BC.PERIODIC,) * 6,
                    species=(sp,), lasers=(), dtype=np.float32)
    cfg = dataclasses.replace(cfg, bin_k=K)
    plan = binmod.BinnedPlan(cfg)
    assert plan.ns == (24, 16), plan.ns      # 20 -> 24 pad
    rng = np.random.default_rng(7)
    NP = int(np.prod(n))
    x0 = np.stack([rng.uniform(0, grid.hi[d], NP) for d in range(nd)], 1)
    p0 = rng.normal(scale=3e-22, size=(NP, 3))
    w0 = rng.uniform(1, 2, NP)
    bm = binmod.bin_from_arrays(x0.astype(np.float32),
                                p0.astype(np.float32),
                                w0.astype(np.float32), grid, K=K,
                                ns=plan.ns)
    assert bm.w.shape == (K, 24, 16)
    # pad columns start dead
    assert float(jnp.abs(bm.w[:, 20:]).max()) == 0.0
    vals = jnp.asarray(rng.normal(size=(6,) + n) * 1e3, jnp.float32)
    return cfg, plan, sp, grid, bm, vals


def test_padded_pallas_matches_xla_engine():
    cfg, plan, sp, grid, bm, fstack = _setup_padded()
    engines = binmod.make_pallas_engines(cfg, plan, interpret=True)
    eng = engines[0]
    assert eng is not None
    assert eng.nx == 24 and eng.nx_real == 20
    fpad = jnp.pad(fstack, ((0, 0), (2, 2), (2, 2)), mode="wrap")
    fwin = eng.make_fwin(fpad)
    bc = sp.bc_particle[:4]
    b_x, b_p = bm, bm
    for step in range(4):
        b_x, jpad_x = binmod.push_deposit_binned(fpad, b_x, sp, plan,
                                                 bc=bc)
        b_p, jpart = binmod.push_deposit_pallas(eng, fwin, b_p, plan)
        jpad_p = eng.fold_jpart(jpart)
        for c in range(3):
            scale = max(float(jnp.abs(jpad_x[c]).max()), 1e-30)
            err = float(jnp.abs(jpad_x[c] - jpad_p[c]).max()) / scale
            assert err < 1e-5, (step, c, err)
        # pad columns stay dead on both engines
        assert float(jnp.abs(b_x.w[:, 20:]).max()) == 0.0
        assert float(jnp.abs(b_p.w[:, 20:]).max()) == 0.0
        xx, px, wx, ax = binmod.to_flat(b_x, grid, periodic=(False, True))
        xp_, pp, wp, ap = binmod.to_flat(b_p, grid, periodic=(False, True))
        assert ax.sum() == ap.sum()
        for d in range(2):
            np.testing.assert_allclose(np.sort(xx[ax][:, d]),
                                       np.sort(xp_[ap][:, d]),
                                       rtol=0, atol=1e-11)


CPML_WINDOW_DECK = """
begin:control
  bin_headroom = 3.0
  nx = 28
  ny = 16
  t_end = 1.0
  nsteps = {nsteps}
  x_min = 0
  x_max = 28e-6
  y_min = 0
  y_max = 16e-6
end:control
begin:boundaries
  bc_x_min = cpml_outflow
  bc_x_max = cpml_outflow
  bc_y_min = periodic
  bc_y_max = periodic
  cpml_thickness = 6
end:boundaries
begin:window
  move_window = T
  window_start_time = 0
  window_v_x = 2.9979e8
  bc_x_min_after_move = cpml_outflow
  bc_x_max_after_move = cpml_outflow
end:window
begin:species
  name = electron
  charge = -1
  mass = 1.0
  number_density = 1e20
  nparticles_per_cell = 2
  temperature_ev = 5
end:species
begin:output
  dt_snapshot = 1
end:output
"""


@pytest.mark.parametrize("mode", ["interpret", "0"])
def test_cpml_window_keeps_population(tmp_path, monkeypatch, mode):
    """CPML-extended grid (28+12=40, stripe-unaligned before padding):
    particles survive inside the CPML layer and the window refill at the
    last grid cell (window.F90:227) replenishes the domain — the
    population must stay near its initial value, not decay."""
    from epoch_tpu.core import Simulation
    monkeypatch.setenv("EPOCH_TPU_PALLAS", mode)
    d = tmp_path / f"m{mode}"
    d.mkdir(exist_ok=True)
    (d / "input.deck").write_text(CPML_WINDOW_DECK.format(nsteps=60))
    sim = Simulation(str(d / "input.deck"), seed=5)
    assert sim.cfg.engine == "binned"
    assert sim.cfg.grid.n == (40, 28)
    b0 = sim.state.species[0]
    n0 = int(jnp.sum(b0.w > 0))
    assert n0 > 0
    st = sim.run(max_steps=60)
    n1 = int(jnp.sum(st.species[0].w > 0))
    # uniform plasma, window at c: refill balances outflow to ~10%
    assert n1 > 0.7 * n0, (n0, n1)


def test_cpml_window_engines_agree(tmp_path, monkeypatch):
    """Fused kernel vs XLA slot engine on the padded CPML window deck:
    same discretisation, so particle positions must agree to round-off."""
    from epoch_tpu.core import Simulation

    def run(mode):
        monkeypatch.setenv("EPOCH_TPU_PALLAS", mode)
        d = tmp_path / f"m{mode}"
        d.mkdir(exist_ok=True)
        (d / "input.deck").write_text(CPML_WINDOW_DECK.format(nsteps=25))
        sim = Simulation(str(d / "input.deck"), seed=5)
        st = sim.run(max_steps=25)
        return sim, st

    sim_p, st_p = run("interpret")
    sim_x, st_x = run("0")
    bp, bx = st_p.species[0], st_x.species[0]
    assert int(jnp.sum(bp.w > 0)) == int(jnp.sum(bx.w > 0))
    xp_, pp, wp, ap = binmod.to_flat(bp, sim_p.cfg.grid,
                                     periodic=(False, True))
    xx, px, wx, ax = binmod.to_flat(bx, sim_x.cfg.grid,
                                    periodic=(False, True))
    for d in range(2):
        np.testing.assert_allclose(np.sort(xp_[ap][:, d]),
                                   np.sort(xx[ax][:, d]),
                                   rtol=0, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(st_p.fields.ex), np.asarray(st_x.fields.ex),
        rtol=0, atol=max(1e-6 * float(jnp.abs(st_x.fields.ex).max()),
                         1e-20))
