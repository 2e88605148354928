"""User extension hooks (SURVEY L9: user_interaction/ layer —
custom_parser.f90 register_objects/custom_function/custom_constant,
custom_deck.f90 block handlers, custom_laser.f90 time-profile fallback,
ic_module.f90 manual_load)."""
import logging

import numpy as np
import pytest

from epoch_tpu import extensions as ext
from epoch_tpu.core import Simulation

BASE = """
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
  number_density = {density}
  nparticles_per_cell = 4
  temperature_ev = 10
end:species
"""


@pytest.fixture(autouse=True)
def _clean_registries():
    ext.clear()
    yield
    ext.clear()


def _density(sim, i=0):
    from epoch_tpu.io.diagnostics import get_slab, particle_to_grid
    slab = get_slab(sim.cfg, sim.state, i)
    dep = particle_to_grid(slab, sim.cfg.grid)
    return np.asarray(sim.cfg.grid.interior(dep)) / sim.cfg.grid.delta[0]


def test_custom_expr_function_and_constant(tmp_path):
    ext.register_expr_function("doubled", lambda v: 2.0 * v)
    ext.register_expr_constant("my_n0", 5.0e19)
    (tmp_path / "input.deck").write_text(
        BASE.format(density="doubled(my_n0)"))
    sim = Simulation(str(tmp_path / "input.deck"))
    den = _density(sim)
    assert np.allclose(den.mean(), 1.0e20, rtol=0.05)


def test_custom_deck_block(tmp_path, caplog):
    seen = {}

    @ext.register_deck_block("my_extension_block")
    def handler(el, val, parser):
        seen[el] = parser.expr(val).const()
        return True

    checked = []

    @ext.register_deck_check
    def check(cfg):
        checked.append(cfg)

    (tmp_path / "input.deck").write_text(
        BASE.format(density="1e20")
        + "begin:my_extension_block\n  knob = 2 * 21\nend:my_extension_block\n")
    with caplog.at_level(logging.WARNING, logger="epoch_tpu"):
        Simulation(str(tmp_path / "input.deck"))
    assert seen == {"knob": 42.0}
    assert len(checked) == 1
    assert not [r for r in caplog.records
                if "my_extension_block" in r.getMessage()]


def test_unknown_block_warns(tmp_path, caplog):
    (tmp_path / "input.deck").write_text(
        BASE.format(density="1e20")
        + "begin:not_a_block\n  foo = 1\nend:not_a_block\n")
    with caplog.at_level(logging.WARNING, logger="epoch_tpu"):
        Simulation(str(tmp_path / "input.deck"))
    assert [r for r in caplog.records if "not_a_block" in r.getMessage()]


def test_manual_load_hook(tmp_path):
    calls = []

    @ext.register_manual_load
    def tweak(sim):
        calls.append(sim)
        st = sim.state
        b = st.species[0]
        if hasattr(b, "xi"):
            b = b._replace(w=b.w * 2.0)
        else:
            b = b._replace(weight=b.weight * 2.0)
        return st._replace(species=(b,) + st.species[1:])

    (tmp_path / "input.deck").write_text(BASE.format(density="1e20"))
    sim = Simulation(str(tmp_path / "input.deck"))
    assert len(calls) == 1
    den = _density(sim)
    assert np.allclose(den.mean(), 2.0e20, rtol=0.05)


def test_plugin_file_autoload(tmp_path):
    (tmp_path / "epoch_extensions.py").write_text(
        "from epoch_tpu import extensions as ext\n"
        "ext.register_expr_constant('plugin_n0', 3.0e19)\n")
    (tmp_path / "input.deck").write_text(BASE.format(density="plugin_n0"))
    sim = Simulation(str(tmp_path / "input.deck"))
    den = _density(sim)
    assert np.allclose(den.mean(), 3.0e19, rtol=0.05)


LASER_DECK = """
begin:control
  nx = 64
  t_end = 1
  x_min = 0
  x_max = 6.4e-6
end:control
begin:boundaries
  bc_x_min = simple_laser
  bc_x_max = open
end:boundaries
begin:laser
  boundary = x_min
  amp = 1e11
  lambda = 1.0e-6
end:laser
"""


def test_custom_laser_time_profile(tmp_path):
    # ramp the envelope to ~0 — with the hook the injected ΣEy² must be
    # far below the unhooked run (laser.f90:197 fallback dispatch)
    (tmp_path / "a").mkdir()
    (tmp_path / "a" / "input.deck").write_text(LASER_DECK)
    sim = Simulation(str(tmp_path / "a" / "input.deck"))
    for _ in range(40):
        st = sim.fns["step_a"](sim.state)
        sim.state = sim.fns["step_b"](st)
    ref = float(np.sum(np.asarray(sim.state.fields.ey) ** 2))

    ext.register_laser_time_profile(lambda las, ctx, xp: 1e-3)
    (tmp_path / "b").mkdir()
    (tmp_path / "b" / "input.deck").write_text(LASER_DECK)
    sim2 = Simulation(str(tmp_path / "b" / "input.deck"))
    for _ in range(40):
        st = sim2.fns["step_a"](sim2.state)
        sim2.state = sim2.fns["step_b"](st)
    hooked = float(np.sum(np.asarray(sim2.state.fields.ey) ** 2))
    assert ref > 0.0
    assert hooked < 1e-4 * ref
