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
