"""Fused Pallas kernel × device mesh (parallel/spmd_push.py).

The kernel runs per-shard under shard_map; halo columns at shard edges
ride ppermute ring exchanges and the deposition margins are exchanged
like processor_summation_bcs (boundary.F90:783-806).  The sharded step
on the 8-device CPU mesh must reproduce the single-device fused path to
round-off — on the north-star deck class: moving window + laser +
bounded x BCs (VERDICT r2 item 4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from epoch_tpu.core import Simulation
from epoch_tpu.core import binned as binmod
from epoch_tpu.parallel.sharding import (make_mesh, shard_state,
                                         make_sharded_step)

LWFA_DECK = """
begin:control
  nx = 128
  ny = 16
  t_end = 1.0
  nsteps = {nsteps}
  x_min = 0
  x_max = 128e-7
  y_min = 0
  y_max = 16e-7
end:control
begin:boundaries
  bc_x_min = simple_laser
  bc_x_max = simple_outflow
  bc_y_min = periodic
  bc_y_max = periodic
end:boundaries
begin:window
  move_window = T
  window_start_time = 0
  window_v_x = 2.9979e8
  bc_x_min_after_move = simple_outflow
  bc_x_max_after_move = simple_outflow
end:window
begin:constant
  lambda0 = 1.0e-6
  omega0 = 2.0 * pi * c / lambda0
end:constant
begin:laser
  boundary = x_min
  amp = 1.0e11
  omega = omega0
  profile = gauss(y, 8e-7, 4e-7)
end:laser
begin:species
  name = electron
  charge = -1
  mass = 1.0
  number_density = if(x gt 32e-7, 1e23, 0)
  nparticles_per_cell = 4
  temperature_ev = 10
end:species
begin:output
  dt_snapshot = 1
end:output
"""


PROBE_DECK = """
begin:control
  nx = 128
  ny = 16
  t_end = 1.0
  nsteps = {nsteps}
  x_min = 0
  x_max = 128e-6
  y_min = 0
  y_max = 16e-6
end:control
begin:boundaries
  bc_x_min = simple_outflow
  bc_x_max = simple_outflow
  bc_y_min = periodic
  bc_y_max = periodic
end:boundaries
begin:species
  name = beam
  charge = -1
  mass = 1.0
  number_density = if(x lt 16e-6, 1e18, 0)
  nparticles_per_cell = 4
  drift_px = 5e-23
end:species
begin:probe
  name = midplane
  point = (24e-6, 0)
  normal = (1, 0)
  include_species:beam
end:probe
begin:output
  dt_snapshot = 1
end:output
"""

QED_DECK = """
begin:control
  bin_headroom = 10
  nx = 128
  ny = 16
  t_end = 1.0
  nsteps = {nsteps}
  x_min = 0
  x_max = 128e-7
  y_min = 0
  y_max = 16e-7
end:control
begin:boundaries
  bc_x_min = simple_outflow
  bc_x_max = simple_outflow
  bc_y_min = periodic
  bc_y_max = periodic
end:boundaries
begin:species
  name = electron
  identify:electron
  number_density = 1e20
  nparticles_per_cell = 4
  drift_px = 5.4e-19
end:species
begin:species
  name = Photon
  nparticles = 0
  identify:photon
end:species
begin:qed
  use_qed = T
  qed_start_time = 0
  produce_photons = T
  qed_table_location = {tables}
  photon_energy_min = 0
  photon_dynamics = T
end:qed
begin:output
  dt_snapshot = 1
end:output
"""

TABLES = "/root/reference/epoch1d/src/physics_packages/TABLES"


def _mesh_step(cfg, state0):
    import dataclasses
    from epoch_tpu.core.step import make_step_functions as msf
    mesh = make_mesh(8)
    cfg_m = dataclasses.replace(cfg, mesh=mesh)
    fns8 = msf(cfg_m)
    assert fns8["uses_spmd_pallas"], "shard_map fused path inactive"
    st8 = shard_state(state0, mesh)
    return make_sharded_step(cfg, mesh, example_state=st8), st8


def test_spmd_probe_matches_single(tmp_path, monkeypatch):
    """Probe payload rows ride the shard_map'd kernel (VERDICT r3 item
    5): the entry/final plane distances come back through the rebin
    routing per shard, reassemble to the global slot grid, and the
    single-device probe_records_from_rows detection reproduces the
    unsharded fused path's captures exactly."""
    monkeypatch.setenv("EPOCH_TPU_PALLAS", "interpret")
    nsteps = 180
    d = tmp_path / "probe"
    d.mkdir()
    (d / "input.deck").write_text(PROBE_DECK.format(nsteps=nsteps))
    sim = Simulation(str(d / "input.deck"), seed=7)
    assert sim.cfg.engine == "binned"
    state0 = sim.state

    from epoch_tpu.core.step import make_step_functions
    fns1 = make_step_functions(sim.cfg)
    plan = binmod.BinnedPlan(sim.cfg)
    engines1 = binmod.make_pallas_engines(sim.cfg, plan)
    assert engines1[0] is not None and engines1[0].n_probes == 1
    st1 = state0
    for _ in range(nsteps):
        st1 = fns1["step_b_raw"](fns1["step_a_raw"](st1))

    step8, st8 = _mesh_step(sim.cfg, state0)
    for _ in range(nsteps):
        st8 = step8(st8)
        # XLA:CPU's in-process collectives deadlock (rendezvous abort)
        # when many multi-device dispatches are in flight — sync each
        # step (host-platform artifact only; TPU pipelines fine)
        jax.block_until_ready(st8.fields.ex)

    for stx in (st1, st8):
        assert int(sum(jnp.asarray(pd) for pd in stx.probe_dropped)) == 0
    b1, b8 = st1.probes[0], st8.probes[0]
    n1 = int(jnp.sum(b1.alive))
    n8 = int(jnp.sum(b8.alive))
    assert n1 == n8 > 0
    # same capture multiset (order differs: appends interleave shards)
    x1 = np.sort(np.asarray(b1.x)[np.asarray(b1.alive)][:, 0])
    x8 = np.sort(np.asarray(b8.x)[np.asarray(b8.alive)][:, 0])
    np.testing.assert_allclose(x1, x8, atol=1e-12)
    w1 = float(jnp.sum(jnp.where(b1.alive, b1.weight, 0.0)))
    w8 = float(jnp.sum(jnp.where(b8.alive, b8.weight, 0.0)))
    np.testing.assert_allclose(w1, w8, rtol=1e-12)


def test_spmd_qed_photons_run(tmp_path, monkeypatch):
    """QED synchrotron emission with a LIVE photon species on the
    8-device mesh: emitter aux rows (optical depths) route through the
    shard_map'd kernel, the photon species rides its fused ballistic
    kernel per shard, and the XLA-side emission tail appends under
    GSPMD.  Structural gates: photons actually appear, every book
    balances (no drops), and the run is deterministic."""
    monkeypatch.setenv("EPOCH_TPU_PALLAS", "interpret")
    # every cell fires at this field strength: lift the sparse-tail
    # fired-cell cap to the whole grid so nothing is drop-counted
    monkeypatch.setenv("EPOCH_TPU_FIRE_CELL_CAP", "2048")
    monkeypatch.setenv("EPOCH_TPU_EMIT_RANK_CAP", "16")
    nsteps = 8
    d = tmp_path / "qed"
    d.mkdir()
    (d / "input.deck").write_text(
        QED_DECK.format(nsteps=nsteps, tables=TABLES))
    sim = Simulation(str(d / "input.deck"), seed=5)
    assert sim.cfg.engine == "binned"
    names = [s.name for s in sim.cfg.species]
    ie, iph = names.index("electron"), names.index("Photon")
    state0 = sim.state
    # a strong transverse field so eta is large and emission fires
    f = state0.fields._replace(
        ey=jnp.full_like(state0.fields.ey, 5.0e14))
    state0 = state0._replace(fields=f)

    def run(seed_state):
        step8, st8 = _mesh_step(sim.cfg, seed_state)
        for _ in range(nsteps):
            st8 = st8._replace(fields=f)
            st8 = step8(st8)
            jax.block_until_ready(st8.fields.ex)   # see probe test
        return st8

    st = run(state0)
    ph = st.species[iph]
    n_ph = int(jnp.sum(ph.w > 0))
    assert n_ph > 0, "no synchrotron photons under the mesh"
    assert int(ph.n_dropped) == 0
    assert int(st.species[ie].n_dropped) == 0
    # photons inherit the emitters' +x direction
    assert float(jnp.sum(jnp.where(ph.w > 0, ph.p[0], 0.0))) > 0
    # determinism: the mesh path reruns bit-identically
    st2 = run(state0)
    np.testing.assert_array_equal(np.asarray(st.species[iph].w),
                                  np.asarray(st2.species[iph].w))


def test_spmd_pallas_matches_single(tmp_path, monkeypatch):
    monkeypatch.setenv("EPOCH_TPU_PALLAS", "interpret")
    nsteps = 12
    d = tmp_path / "spmd"
    d.mkdir()
    (d / "input.deck").write_text(LWFA_DECK.format(nsteps=nsteps))
    sim = Simulation(str(d / "input.deck"), seed=3)
    assert sim.cfg.engine == "binned"
    state0 = sim.state

    # single-device fused path
    from epoch_tpu.core.step import make_step_functions
    fns1 = make_step_functions(sim.cfg)
    assert not fns1["uses_spmd_pallas"]
    plan = binmod.BinnedPlan(sim.cfg)
    engines1 = binmod.make_pallas_engines(sim.cfg, plan)
    assert engines1[0] is not None, "single-device fused path inactive"
    st1 = state0
    for _ in range(nsteps):
        st1 = fns1["step_b_raw"](fns1["step_a_raw"](st1))

    # 8-device sharded fused path
    mesh = make_mesh(8)
    import dataclasses
    from epoch_tpu.core.step import make_step_functions as msf
    cfg_m = dataclasses.replace(sim.cfg, mesh=mesh)
    fns8 = msf(cfg_m)
    assert fns8["uses_spmd_pallas"], "shard_map fused path inactive"
    st8 = shard_state(state0, mesh)
    step8 = make_sharded_step(sim.cfg, mesh, example_state=st8)
    for _ in range(nsteps):
        st8 = step8(st8)

    assert int(st1.window_offset) == int(st8.window_offset) > 0
    # the single-device path stages the pending refill column in
    # state.window_refill (consumed in-kernel at the next push); the
    # sharded path stages it in the arrays — materialise for comparison
    from epoch_tpu.core.window import materialize_refill
    st1 = materialize_refill(st1, sim.cfg)
    # fields agree to round-off
    for nm in ("ex", "ey", "ez", "bx", "by", "bz"):
        a = np.asarray(getattr(st1.fields, nm))
        b = np.asarray(getattr(st8.fields, nm))
        scale = max(np.abs(a).max(), 1e-3)
        assert np.abs(a - b).max() / scale < 1e-11, nm
    # particle sets agree
    grid = sim.cfg.grid
    per = (False, True)
    x1, p1, w1, a1 = binmod.to_flat(st1.species[0], grid, periodic=per)
    x8, p8, w8, a8 = binmod.to_flat(st8.species[0], grid, periodic=per)
    assert a1.sum() == a8.sum() > 0
    np.testing.assert_allclose(np.sort(x1[a1][:, 0]),
                               np.sort(x8[a8][:, 0]), atol=1e-12)
    np.testing.assert_allclose(float(w1[a1].sum()), float(w8[a8].sum()),
                               rtol=1e-12)
    assert int(st1.species[0].n_dropped) == int(st8.species[0].n_dropped)
