"""Delayed moving-window start: the reference swaps the boundary BCs to
bc_*_after_move when time reaches window_start_time (window.F90:358-368)
— in particular a simple_laser boundary becomes an outflow and the laser
STOPS injecting.  Here the host loop swaps in a re-built step set at the
crossing (Simulation.fns_for)."""
import numpy as np
import pytest

from epoch_tpu.core import Simulation

DECK = """
begin:control
  nx = 64
  ny = 8
  t_end = {t_end}
  x_min = 0
  x_max = 64e-7
  y_min = 0
  y_max = 8e-7
end:control
begin:boundaries
  bc_x_min = simple_laser
  bc_x_max = simple_outflow
  bc_y_min = periodic
  bc_y_max = periodic
end:boundaries
begin:window
  move_window = T
  window_start_time = {t_start}
  window_v_x = 2.9979e8
  bc_x_min_after_move = {after}
  bc_x_max_after_move = simple_outflow
end:window
begin:laser
  boundary = x_min
  amp = 1.0e11
  omega = 2.0 * pi * c / 1.0e-6
end:laser
begin:output
  dt_snapshot = 1
end:output
"""


def _sim(tmp_path, t_start, t_end=2.0e-14, after="simple_outflow"):
    d = tmp_path / "w"
    d.mkdir(exist_ok=True)
    (d / "input.deck").write_text(
        DECK.format(t_start=t_start, t_end=t_end, after=after))
    return Simulation(str(d / "input.deck"))


def test_delayed_start_laser_then_window(tmp_path):
    t_start = 8.0e-15
    sim = _sim(tmp_path, t_start)
    # pre-move config keeps the laser boundary live
    assert sim.cfg.bc_field_after_move is not None
    ey2 = {}

    def cb(s, st, last=False):
        ey2[int(st.step)] = (float(st.time),
                            float((np.asarray(st.fields.ey) ** 2).sum()),
                            int(st.window_offset))

    sim.run(dump_callback=cb)
    steps = sorted(ey2)
    times = np.array([ey2[s][0] for s in steps])
    sums = np.array([ey2[s][1] for s in steps])
    offs = np.array([ey2[s][2] for s in steps])
    pre = times < t_start
    post = times > t_start + 2e-15
    # the laser entered before the window started
    assert sums[pre][-1] > 1e3 * max(sums[pre][0], 1.0)
    assert np.abs(np.asarray(sim.state.fields.ey)).max() > 3e10
    # the window moved only after t_start
    assert offs[pre].max() == 0
    assert offs[-1] > 0
    # injection stopped at the switch: ΣEy² no longer grows
    i_sw = int(np.argmax(post))
    assert sums[-1] <= sums[i_sw] * 1.10
    # the post-move step set was actually built and used
    assert getattr(sim, "_fns_post", None) is not None
    assert sim._cfg_post.bc_field[0].name == "SIMPLE_OUTFLOW"


def test_immediate_start_kills_laser(tmp_path):
    # window_start_time = 0: BCs swapped at build; laser never fires
    sim = _sim(tmp_path, 0.0, t_end=8.0e-15)
    assert sim.cfg.bc_field_after_move is None
    assert sim.cfg.bc_field[0].name == "SIMPLE_OUTFLOW"
    sim.run()
    assert np.abs(np.asarray(sim.state.fields.ey)).max() < 1e6


def test_cpmlness_change_rejected(tmp_path):
    with pytest.raises(ValueError, match="CPML"):
        _sim(tmp_path, 8.0e-15, after="cpml_outflow")
