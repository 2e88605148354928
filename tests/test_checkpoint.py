"""Restart dumps must resume bit-exactly (use_exact_restart semantics,
setup.F90:822-1464)."""
import os

import numpy as np
import pytest

from epoch_tpu.core import Simulation
from epoch_tpu.io.checkpoint import write_restart, read_restart

DECK = """
begin:control
  nx = 32
  t_end = 1
  x_min = 0
  x_max = 3.2e-5
  pusher = {pusher}
end:control
begin:boundaries
  bc_x_min = periodic
  bc_x_max = periodic
end:boundaries
begin:species
  name = electron
  charge = -1
  mass = 1.0
  number_density = 1e22
  nparticles_per_cell = 4
  temperature_ev = 100
end:species
begin:output
  dt_snapshot = 1
end:output
"""


@pytest.mark.parametrize("pusher", ["scatter", "binned"])
def test_restart_bit_exact(tmp_path, pusher):
    d = tmp_path / pusher
    d.mkdir()
    (d / "input.deck").write_text(DECK.format(pusher=pusher))
    sim = Simulation(str(d / "input.deck"))
    st = sim.state
    for _ in range(5):
        st = sim.fns["step_b"](sim.fns["step_a"](st))
    ckpt = str(d / "restart.sdf")
    write_restart(ckpt, sim.cfg, st, deck_text="deck")

    restored = read_restart(ckpt, sim.cfg, st)
    # continue both and compare
    a = b = None
    st2 = st
    st3 = restored
    for _ in range(5):
        st2 = sim.fns["step_b"](sim.fns["step_a"](st2))
        st3 = sim.fns["step_b"](sim.fns["step_a"](st3))
    for nm in ("ex", "ey", "jx"):
        x = np.asarray(getattr(st2.fields, nm))
        y = np.asarray(getattr(st3.fields, nm))
        np.testing.assert_array_equal(x, y)
    assert float(st3.time) == float(st2.time)
