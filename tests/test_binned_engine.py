"""Binned (dense TPU) engine vs scatter (reference) engine equivalence.

The binned engine (core/binned.py) re-lays-out particles in a per-cell slot
grid so gather/deposit become dense VPU work; it must agree with the
validated scatter engine to round-off.  Verified independently against a
literal transcription of the reference gather/Boris math (particles.F90).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import epoch_tpu.constants as const
from epoch_tpu.core.grid import Grid
from epoch_tpu.core.config import SimConfig, SpeciesConfig
from epoch_tpu.core import push as psh
from epoch_tpu.core import binned as binmod
from epoch_tpu.core import boundaries as bnd
from epoch_tpu.core.state import zero_fields, empty_slab


def _setup(nd):
    n = (12, 8, 6)[:nd]
    dxv = 1e-6
    grid = Grid(ndims=nd, shape_fn=const.Shape.TRIANGLE, n=n,
                cpml_thickness=0, cpml_active=(False,) * (2 * nd),
                lo=(0.0,) * nd, hi=tuple(ni * dxv for ni in n))
    dt = 0.9 * dxv / (const.c * np.sqrt(nd))
    sp = SpeciesConfig(name="e", charge=-const.q0, mass=const.m0, cap=512,
                       bc_particle=(const.BC.PERIODIC,) * 6)
    cfg = SimConfig(grid=grid, dt=dt, t_end=1.0, nsteps=-1,
                    bc_field=(const.BC.PERIODIC,) * 6,
                    bc_particle=(const.BC.PERIODIC,) * 6,
                    species=(sp,), lasers=())
    rngf = np.random.default_rng(0)
    padded = grid.padded_shape()
    ng = grid.ng
    f = zero_fields(padded, np.float64)
    vals = {}
    for nm in ("ex", "ey", "ez", "bx", "by", "bz"):
        arr = np.zeros(padded)
        core = tuple(slice(ng, ng + ni) for ni in n)
        arr[core] = rngf.normal(size=n) * 1e3
        for d in range(nd):
            sl_lo = [slice(None)] * nd
            sl_lo[d] = slice(0, ng)
            src_lo = [slice(None)] * nd
            src_lo[d] = slice(n[d], n[d] + ng)
            arr[tuple(sl_lo)] = arr[tuple(src_lo)]
            sl_hi = [slice(None)] * nd
            sl_hi[d] = slice(n[d] + ng, n[d] + 2 * ng)
            src_hi = [slice(None)] * nd
            src_hi[d] = slice(ng, 2 * ng)
            arr[tuple(sl_hi)] = arr[tuple(src_hi)]
        vals[nm] = arr
    fj = f._replace(**{k: jnp.asarray(v) for k, v in vals.items()})
    interior = {nm: grid.interior(jnp.asarray(vals[nm])) for nm in vals}
    return cfg, sp, grid, fj, interior, vals


def _fold(acc, grid):
    nd = grid.ndims
    ng = grid.ng
    a = acc.reshape(grid.padded_shape()).copy()
    for d in range(nd):
        n = grid.n[d]
        sl = lambda s: tuple(s if i == d else slice(None)
                             for i in range(nd))
        a[sl(slice(ng, 2 * ng))] += a[sl(slice(n + ng, n + 2 * ng))]
        a[sl(slice(n, n + ng))] += a[sl(slice(0, ng))]
    core = tuple(slice(ng, ng + ni) for ni in grid.n)
    return a[core]


@pytest.mark.parametrize("nd", [1, 2,
                                pytest.param(3, marks=pytest.mark.slow)])
def test_engines_agree(nd):
    cfg, sp, grid, fj, interior, vals = _setup(nd)
    pplan = psh.PushPlan(cfg)
    bplan = binmod.BinnedPlan(cfg)
    NP = 60
    rng = np.random.default_rng(5)
    x0 = np.stack([rng.uniform(0, grid.hi[d], NP) for d in range(nd)], 1)
    p0 = rng.normal(scale=3e-22, size=(NP, 3))
    w0 = rng.uniform(1, 2, NP)
    slab = empty_slab(512, nd, np.float64)
    slab = slab._replace(
        x=slab.x.at[:NP].set(x0), p=slab.p.at[:NP].set(p0),
        weight=slab.weight.at[:NP].set(w0),
        alive=slab.alive.at[:NP].set(True))
    bm = binmod.bin_from_arrays(x0, p0, w0, grid, K=16)
    fpad = binmod.make_fpad(fj, grid)
    ng = grid.ng

    for step in range(5):
        slab, contrib = psh.push_species(fj, slab, sp, pplan)
        slab = bnd.particle_bcs(slab, sp, cfg)
        bm, jpad = binmod.push_deposit_binned(fpad, bm, sp, bplan)
        flat, jxv, jyv, jzv = contrib
        # periodic margins are only defined mod n: compare the folded
        # interior currents (the engine folds via current_bcs)
        cur = binmod.fold_margins(jpad, bplan)
        for comp, v in enumerate((jxv, jyv, jzv)):
            acc = np.zeros(int(np.prod(grid.padded_shape())))
            np.add.at(acc, np.asarray(flat).ravel(), np.asarray(v).ravel())
            js = _fold(acc, grid)
            jb = np.asarray(cur[comp])
            scale = max(np.abs(js).max(), 1e-30)
            assert np.abs(js - jb).max() / scale < 1e-11, (step, comp)
        # particle multisets agree
        xb, pb, wb, al = binmod.to_flat(bm, grid)
        xs = np.sort(np.asarray(slab.x)[np.asarray(slab.alive), 0])
        xbs = np.sort(xb[al][:, 0])
        assert xs.size == xbs.size
        np.testing.assert_allclose(xs, xbs, rtol=0, atol=1e-18)
    assert int(bm.n_dropped) == 0


def test_higuera_cary_engines_agree():
    """use_higuera_cary reaches both engines (HC_PUSH define -> deck key);
    HC differs from Boris and the engines agree with each other."""
    import dataclasses
    cfg, sp, grid, fj, interior, vals = _setup(2)
    cfg_hc = dataclasses.replace(cfg, use_higuera_cary=True)
    pplan = psh.PushPlan(cfg_hc)
    bplan = binmod.BinnedPlan(cfg_hc)
    assert bplan.higuera_cary
    NP = 40
    rng = np.random.default_rng(9)
    x0 = np.stack([rng.uniform(0, grid.hi[d], NP) for d in range(2)], 1)
    p0 = rng.normal(scale=3e-22, size=(NP, 3))
    w0 = rng.uniform(1, 2, NP)
    slab = empty_slab(512, 2, np.float64)
    slab = slab._replace(
        x=slab.x.at[:NP].set(x0), p=slab.p.at[:NP].set(p0),
        weight=slab.weight.at[:NP].set(w0),
        alive=slab.alive.at[:NP].set(True))
    bm = binmod.bin_from_arrays(x0, p0, w0, grid, K=16)
    fpad = binmod.make_fpad(fj, grid)

    slab_b, _ = psh.push_species(fj, slab, sp, pplan)           # Boris
    slab_h, _ = psh.push_species(fj, slab, sp, pplan,
                                 higuera_cary=True)             # HC
    # HC must actually differ from Boris in these strong random fields
    db = np.abs(np.asarray(slab_b.p) - np.asarray(slab_h.p)).max()
    assert db > 0.0

    bm_h, _ = binmod.push_deposit_binned(fpad, bm, sp, bplan)
    xb, pb, wb, al = binmod.to_flat(bm_h, grid)
    ps = np.sort(np.asarray(slab_h.p)[np.asarray(slab_h.alive), 0])
    pbs = np.sort(pb[al][:, 0])
    np.testing.assert_allclose(ps, pbs, rtol=1e-12, atol=1e-40)


def test_per_species_bin_k(tmp_path):
    """Per-species slot counts (SimConfig.bin_k_sp): an explicit
    species-block bin_headroom shrinks a static background's K while
    growth targets (QED photons/pairs) inherit their sources' K — and
    cross-species creation/physics still book-balance across differing
    K (merge_candidates concatenates any K_src onto any K_dst)."""
    import epoch_tpu.constants as const
    from epoch_tpu.core import Simulation
    from epoch_tpu.core.step import make_full_step
    deck = """
begin:control
  nx = 16
  ny = 8
  t_end = 1
  x_min = 0
  x_max = 1.6e-5
  y_min = 0
  y_max = 8e-6
  bin_headroom = 2.0
end:control
begin:boundaries
  bc_x_min = periodic
  bc_x_max = periodic
  bc_y_min = periodic
  bc_y_max = periodic
end:boundaries
begin:qed
  use_qed = T
  qed_start_time = 0
  produce_photons = T
  produce_pairs = T
  photon_dynamics = T
  photon_energy_min = 1 * kev
  qed_table_location = %s
end:qed
begin:species
  name = electron
  identify:electron
  number_density = 1e20
  nparticles_per_cell = 6
  temperature_ev = 10
end:species
begin:species
  name = ion
  identify:proton
  number_density = 1e20
  nparticles_per_cell = 6
  bin_headroom = 1.0
end:species
begin:species
  name = Photon
  identify:photon
  bin_headroom = 3.0
end:species
begin:species
  name = Positron
  identify:positron
end:species
begin:output
  dt_snapshot = 1
end:output
""" % "/root/reference/epoch1d/src/physics_packages/TABLES"
    (tmp_path / "input.deck").write_text(deck)
    sim = Simulation(str(tmp_path / "input.deck"), seed=5)
    cfg = sim.cfg
    assert cfg.engine == "binned"
    ks = cfg.bin_k_sp
    names = [s.name for s in cfg.species]
    ie, ii = names.index("electron"), names.index("ion")
    iph, ipos = names.index("Photon"), names.index("Positron")
    # ion: explicit headroom 1.0 shrinks it (6 ppc + 2) well below the
    # others.  Photon: explicit headroom 3.0 re-bases the emitter
    # inheritance (electron base 6 ppc -> 6*3+2 = 20 > the electron's
    # own 6*2+2 = 14).  Positron AND electron (both pair targets)
    # inherit the Photon K in the final propagation — the emitter→γ→
    # pair-electron cycle converges at the fixed point, it must not
    # amplify (a scaled rule looped here once grew K by 1.5x/pass).
    assert ks[ii] < ks[iph], ks
    assert ks[iph] >= 20, ks
    assert ks[ipos] == ks[iph] == ks[ie], ks
    assert cfg.bin_k == max(ks)
    assert [s.w.shape[0] for s in sim.state.species] == list(ks)
    # physics across differing K: push + QED emission book-balance
    st = sim.state
    w0 = {n: float((jnp.where(st.species[i].w > 0, st.species[i].w, 0.0)
                    ).sum()) for n, i in (("e", ie), ("i", ii))}
    run = make_full_step(cfg)
    st = run(st, 10)
    for i, c in zip(range(len(names)), cfg.species):
        s = st.species[i]
        assert int(s.n_dropped) >= 0
    # ion population static (no physics touches it)
    w_i1 = float(jnp.where(st.species[ii].w > 0,
                           st.species[ii].w, 0.0).sum())
    np.testing.assert_allclose(w_i1, w0["i"], rtol=1e-6)


def test_overflow_merge_conserves_weight_and_momentum():
    """bin_overflow = merge: slot-grid overflow folds into the cell's
    last slot conserving total weight and momentum (weighted-mean
    merge) instead of dropping — on the XLA rebin, the sort-based
    candidate merge, and the compressed append."""
    import dataclasses
    import epoch_tpu.constants as const
    from epoch_tpu.core.grid import Grid
    from epoch_tpu.core.config import SimConfig, SpeciesConfig
    from epoch_tpu.core import binned as binmod

    nd = 2
    n = (4, 4)
    grid = Grid(ndims=nd, shape_fn=const.Shape.TRIANGLE, n=n,
                cpml_thickness=0, cpml_active=(False,) * 4,
                lo=(0.0, 0.0), hi=(4e-6, 4e-6))
    sp = SpeciesConfig(name="e", charge=-const.q0, mass=const.m0,
                       cap=64, bc_particle=(const.BC.PERIODIC,) * 6)
    cfg = SimConfig(grid=grid, dt=1e-17, t_end=1.0, nsteps=-1,
                    bc_field=(const.BC.PERIODIC,) * 4,
                    bc_particle=(const.BC.PERIODIC,) * 4,
                    species=(sp,), lasers=(), dtype=np.float64,
                    bin_k=3, bin_overflow="merge")
    plan = binmod.BinnedPlan(cfg)
    assert plan.merge_overflow
    K = 3
    rng = np.random.default_rng(2)
    # 8 particles all in cell (1,1): only K=3 slots -> 6 heading there
    NP = 8
    x0 = np.full((NP, 2), 1.5e-6) + rng.uniform(-4e-7, 4e-7, (NP, 2))
    p0 = rng.normal(scale=1e-22, size=(NP, 3))
    w0 = rng.uniform(1, 2, NP)
    bm = binmod.bin_from_arrays(x0, p0, w0, grid, K)
    kept = float(jnp.sum(jnp.where(bm.w > 0, bm.w, 0.0)))
    assert kept < w0.sum() - 1e-12      # bin-time drop (host-side path)
    # rebin-level merge: force all particles one cell right via xi
    bm2 = bm._replace(xi=bm.xi.at[0].add(jnp.where(bm.w > 0, 1.0, 0.0)))
    out = binmod.rebin(bm2, plan)
    w_tot_in = kept
    w_tot_out = float(jnp.sum(jnp.where(out.w > 0, out.w, 0.0)))
    np.testing.assert_allclose(w_tot_out, w_tot_in, rtol=1e-12)
    for c in range(3):
        pin = float(jnp.sum(jnp.where(bm2.w > 0, bm2.w * bm2.p[c], 0.0)))
        pout = float(jnp.sum(jnp.where(out.w > 0, out.w * out.p[c], 0.0)))
        np.testing.assert_allclose(pout, pin, rtol=1e-12, atol=1e-40)
    assert int(jnp.sum(out.w > 0)) <= K * 16
    assert int(out.n_dropped) > 0       # counter records merged macros

    # candidate-merge path (physics creation): K live + K candidates
    cand_w = jnp.where(bm.w > 0, bm.w, 0.0)
    m1 = binmod.merge_candidates(bm, bm.xi, bm.p, cand_w, plan)
    np.testing.assert_allclose(
        float(jnp.sum(jnp.where(m1.w > 0, m1.w, 0.0))), 2 * kept,
        rtol=1e-12)

    # compressed-append path (emission): Kc candidates into full cells
    Kc = 2
    g = bm.w.shape[1:]
    cw = jnp.zeros((Kc,) + g, bm.w.dtype).at[:, 1, 1].set(0.5)
    cxi = jnp.zeros((nd, Kc) + g, bm.xi.dtype)
    cp = jnp.ones((3, Kc) + g, bm.p.dtype) * 1e-23
    m2 = binmod.append_compressed(bm, cxi, cp, cw, plan)
    np.testing.assert_allclose(
        float(jnp.sum(jnp.where(m2.w > 0, m2.w, 0.0))), kept + 1.0,
        rtol=1e-12)


def test_overflow_merge_kernel_matches_conservation():
    """The fused 2D kernel's in-rebin merge conserves weight and the
    deposited current books under forced overflow (interpret mode)."""
    import dataclasses
    import epoch_tpu.constants as const
    from epoch_tpu.core.grid import Grid
    from epoch_tpu.core.config import SimConfig, SpeciesConfig
    from epoch_tpu.core import binned as binmod

    nd = 2
    n = (16, 8)
    K = 4
    grid = Grid(ndims=nd, shape_fn=const.Shape.TRIANGLE, n=n,
                cpml_thickness=0, cpml_active=(False,) * 4,
                lo=(0.0, 0.0), hi=(16e-6, 8e-6))
    dt = 0.9e-6 / (const.c * np.sqrt(2.0)) * 1e-0
    sp = SpeciesConfig(name="e", charge=-const.q0, mass=const.m0,
                       cap=2048, bc_particle=(const.BC.PERIODIC,) * 6)
    cfg = SimConfig(grid=grid, dt=0.9 * 1e-6 / (const.c * np.sqrt(2)),
                    t_end=1.0, nsteps=-1,
                    bc_field=(const.BC.PERIODIC,) * 6,
                    bc_particle=(const.BC.PERIODIC,) * 6,
                    species=(sp,), lasers=(), dtype=np.float32,
                    bin_k=K, bin_overflow="merge")
    plan = binmod.BinnedPlan(cfg)
    rng = np.random.default_rng(7)
    # ~3 ppc mean with hot momenta: rebins overflow within a few steps
    NP = 3 * 16 * 8
    x0 = np.stack([rng.uniform(0, grid.hi[d], NP) for d in range(nd)], 1)
    # strong +x beam: everyone crosses into the next cell every step,
    # and a sinusoidal y-velocity focuses particles into bands
    p0 = np.zeros((NP, 3))
    p0[:, 0] = 1e-21
    p0[:, 1] = 1e-21 * np.sin(2 * np.pi * x0[:, 0] / grid.hi[0])
    w0 = rng.uniform(1, 2, NP)
    bm = binmod.bin_from_arrays(x0.astype(np.float32),
                                p0.astype(np.float32),
                                w0.astype(np.float32), grid, K)
    engines = binmod.make_pallas_engines(cfg, plan, interpret=True)
    eng = engines[0]
    assert eng is not None
    names = ("ex", "ey", "ez", "bx", "by", "bz")
    fstack = jnp.zeros((6,) + n, jnp.float32)
    fpad = jnp.pad(fstack, ((0, 0), (2, 2), (2, 2)), mode="wrap")
    fwin = eng.make_fwin(fpad)
    w_in = float(jnp.sum(jnp.where(bm.w > 0, bm.w, 0.0)))
    b = bm
    for step in range(6):
        b, jpart, _ = eng(fwin, b)
    w_out = float(jnp.sum(jnp.where(b.w > 0, b.w, 0.0)))
    assert int(b.n_dropped) > 0, "no overflow forced - test not probing"
    np.testing.assert_allclose(w_out, w_in, rtol=1e-5)
