"""Fused 3D Pallas kernel (ops/binned_kernels3d.py) vs the XLA slot-grid
engine — identical discretisation, so they must agree to round-off.

Runs in Pallas interpret mode on the CPU test mesh; the same kernel is
exercised on real TPU hardware by the 3D benchmark (BENCH_MODE=3d).
"""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

import epoch_tpu.constants as const
from epoch_tpu.core.grid import Grid
from epoch_tpu.core.config import SimConfig, SpeciesConfig
from epoch_tpu.core import binned as binmod


def _setup(n=(8, 8, 8), K=8, bc_x=const.BC.PERIODIC, n_aux=0):
    nd = 3
    dxv = 1e-6
    grid = Grid(ndims=nd, shape_fn=const.Shape.TRIANGLE, n=n,
                cpml_thickness=0, cpml_active=(False,) * (2 * nd),
                lo=(0.0,) * nd, hi=tuple(ni * dxv for ni in n))
    dt = 0.9 * dxv / (const.c * np.sqrt(nd))
    sp = SpeciesConfig(name="e", charge=-const.q0, mass=const.m0, cap=2048,
                       bc_particle=(bc_x, bc_x) + (const.BC.PERIODIC,) * 4)
    cfg = SimConfig(grid=grid, dt=dt, t_end=1.0, nsteps=-1,
                    bc_field=(const.BC.PERIODIC,) * 6,
                    bc_particle=(const.BC.PERIODIC,) * 6,
                    species=(sp,), lasers=(), dtype=np.float32)
    # id rows: every species routes them (species_uses_aux) — the names
    # matter for routing eligibility, the VALUES here are arbitrary
    aux_names = ("id_lo", "id_hi")[:n_aux]
    cfg = dataclasses.replace(cfg, bin_k=K, binned_aux=aux_names)
    plan = binmod.BinnedPlan(cfg)
    rng = np.random.default_rng(3)
    # ~1 ppc: random placement must stay below K per cell — the engines'
    # rebin candidate ORDERINGS differ, so overflow drops would select
    # different particles and the sets would legitimately diverge
    NP = int(np.prod(n))
    x0 = np.stack([rng.uniform(0, grid.hi[d], NP) for d in range(nd)], 1)
    p0 = rng.normal(scale=3e-22, size=(NP, 3))
    w0 = rng.uniform(1, 2, NP)
    bm = binmod.bin_from_arrays(x0.astype(np.float32),
                                p0.astype(np.float32),
                                w0.astype(np.float32), grid, K=K,
                                n_aux=n_aux)
    if n_aux:
        fns = (lambda w: 10.0 * w, lambda w: -3.0 * w)
        aux = jnp.stack([jnp.where(bm.w > 0, f(bm.w), 0.0)
                         for f in fns[:n_aux]])
        bm = bm._replace(aux=aux)
    vals = {nm: jnp.asarray(rng.normal(size=n) * 1e3, jnp.float32)
            for nm in ("ex", "ey", "ez", "bx", "by", "bz")}
    return cfg, plan, sp, grid, bm, vals


def _engine(cfg, plan):
    engines = binmod.make_pallas_engines(cfg, plan, interpret=True)
    assert engines[0] is not None
    return engines[0]


@pytest.mark.parametrize("bc_name", ["periodic", "open", "reflect"])
def test_pallas3d_matches_xla_engine(bc_name):
    bc_x = {"periodic": const.BC.PERIODIC, "open": const.BC.OPEN,
            "reflect": const.BC.REFLECT}[bc_name]
    cfg, plan, sp, grid, bm, interior = _setup(bc_x=bc_x)
    eng = _engine(cfg, plan)
    names = ("ex", "ey", "ez", "bx", "by", "bz")
    fstack = jnp.stack([interior[nm] for nm in names], axis=0)
    fpad = jnp.pad(fstack, ((0, 0), (2, 2), (2, 2), (2, 2)), mode="wrap")
    fwin = eng.make_fwin(fpad)
    bc = sp.bc_particle[:6]

    b_x = bm
    b_p = bm
    for step in range(4):
        b_x, jpad_x = binmod.push_deposit_binned(fpad, b_x, sp, plan,
                                                 bc=bc)
        b_p, jpart, _ = eng(fwin, b_p)
        jpad_p = eng.fold_jpart(jpart)
        for c in range(3):
            scale = max(float(jnp.abs(jpad_x[c]).max()), 1e-30)
            err = float(jnp.abs(jpad_x[c] - jpad_p[c]).max()) / scale
            assert err < 1e-5, (step, c, err)
        periodic = (bc_x == const.BC.PERIODIC, True, True)
        xx, px, wx, ax = binmod.to_flat(b_x, grid, periodic=periodic)
        xp, pp, wp, ap = binmod.to_flat(b_p, grid, periodic=periodic)
        assert ax.sum() == ap.sum(), step
        for d in range(3):
            np.testing.assert_allclose(np.sort(xx[ax][:, d]),
                                       np.sort(xp[ap][:, d]),
                                       rtol=0, atol=1e-11)
        assert int(b_x.n_dropped) == int(b_p.n_dropped)


def test_pallas3d_aux_payload_routing():
    cfg, plan, sp, grid, bm, interior = _setup(n_aux=2)
    assert plan.n_aux == 2
    eng = _engine(cfg, plan)
    assert eng.n_extra == 2
    names = ("ex", "ey", "ez", "bx", "by", "bz")
    fstack = jnp.stack([interior[nm] for nm in names], axis=0)
    fpad = jnp.pad(fstack, ((0, 0), (2, 2), (2, 2), (2, 2)), mode="wrap")
    fwin = eng.make_fwin(fpad)
    b_p = bm
    for step in range(3):
        b_p, _, extra_out = eng(fwin, b_p, extra=b_p.aux)
        b_p = b_p._replace(aux=extra_out)
        live = b_p.w > 0
        np.testing.assert_allclose(
            np.asarray(jnp.where(live, b_p.aux[0], 0.0)),
            np.asarray(jnp.where(live, 10.0 * b_p.w, 0.0)), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(jnp.where(live, b_p.aux[1], 0.0)),
            np.asarray(jnp.where(live, -3.0 * b_p.w, 0.0)), rtol=1e-6)


STEP3D_DECK = """
begin:control
  nx = 8
  ny = 8
  nz = 8
  t_end = 1
  x_min = 0
  x_max = 8e-6
  y_min = 0
  y_max = 8e-6
  z_min = 0
  z_max = 8e-6
end:control
begin:boundaries
  bc_x_min = periodic
  bc_x_max = periodic
  bc_y_min = periodic
  bc_y_max = periodic
  bc_z_min = periodic
  bc_z_max = periodic
end:boundaries
begin:species
  name = e
  charge = -1
  mass = 1.0
  number_density = 1e20
  nparticles_per_cell = 2
  temperature_ev = 1000
end:species
begin:output
  dt_snapshot = 1
end:output
"""


def test_pallas3d_through_the_step(tmp_path, monkeypatch):
    """End-to-end: a 3D deck stepped with the fused engines active must
    match the XLA slot path.  Guards the push_deposit_pallas -> engine
    call forwarding (the direct-engine tests above bypass it, which let
    a signature mismatch ship: qed_on/sides kwargs broke every 3D fused
    step on hardware while the kernel-level tests stayed green)."""
    from epoch_tpu.core import Simulation

    def run(mode):
        monkeypatch.setenv("EPOCH_TPU_PALLAS", mode)
        d = tmp_path / ("m_" + mode)
        d.mkdir(exist_ok=True)
        (d / "input.deck").write_text(STEP3D_DECK)
        sim = Simulation(str(d / "input.deck"), seed=5)
        assert sim.cfg.engine == "binned"
        if mode == "interpret":
            from epoch_tpu.core.step import make_step_functions
            # the engines must actually be fused (not None fallbacks)
            engines = binmod.make_pallas_engines(
                sim.cfg, binmod.BinnedPlan(sim.cfg), interpret=True)
            assert engines[0] is not None
        st = sim.run(max_steps=3)
        return st

    st_p = run("interpret")
    st_x = run("0")
    b_p, b_x = st_p.species[0], st_x.species[0]
    assert int((b_p.w > 0).sum()) == int((b_x.w > 0).sum())
    np.testing.assert_allclose(np.sort(np.asarray(b_p.w).ravel()),
                               np.sort(np.asarray(b_x.w).ravel()),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(st_p.fields.ex),
                               np.asarray(st_x.fields.ex),
                               rtol=1e-5, atol=1e-12)
