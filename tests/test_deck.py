"""Deck reader tests: every reference deck must parse (deck.F90 parity)."""
import glob
import os

import pytest

from epoch_tpu import constants as const
from epoch_tpu.deck import load_deck

from conftest import REFERENCE

ALL_DECKS = sorted(
    glob.glob(os.path.join(REFERENCE, "epoch*/example_decks/*.deck"))
    + glob.glob(os.path.join(REFERENCE, "epoch*/tests/*/input.deck"))
    + glob.glob(os.path.join(REFERENCE, "epoch*/tests/*/*/input.deck")))


@pytest.mark.parametrize("path", ALL_DECKS, ids=lambda p: p[len(REFERENCE) + 1:])
def test_parse_reference_deck(path):
    cfg = load_deck(path)
    assert cfg.control.nx > 0


def test_twostream_deck_details():
    cfg = load_deck(os.path.join(
        REFERENCE, "epoch1d/tests/twostream/input.deck"))
    assert cfg.control.nx == 400
    assert cfg.control.t_end == 0.15
    assert [s.name for s in cfg.species] == ["Right", "Left"]
    right = cfg.species[0]
    assert right.charge == -const.q0
    assert right.mass == const.m0
    assert right.npart == 1600
    assert right.drift[0]({}) == 2.5e-24
    assert right.temp[0]({}) == 273.0
    assert cfg.boundaries.bc_field[0] == const.BC.PERIODIC
    dfn = cfg.dist_fns[0]
    assert dfn.name == "x_px"
    assert dfn.directions == [const.Direction.X, const.Direction.PX]
    assert dfn.include_species == ["Left", "Right"]


def test_laser_deck_details():
    cfg = load_deck(os.path.join(REFERENCE, "epoch1d/tests/laser/input.deck"))
    assert cfg.boundaries.bc_field[0] == const.BC.SIMPLE_LASER
    assert len(cfg.lasers) == 1
    las = cfg.lasers[0]
    # intensity_w_cm2 → amp (deck_laser_block.f90:131-137)
    expected = (1e15 / (const.c * const.epsilon0 / 2.0)) ** 0.5 * 100.0
    assert abs(las.amp - expected) < 1e-6 * expected
    assert abs(las.omega - 2 * 3.141592653589793 * const.c / 1e-6) < 1e6
    assert las.t_end == 14e-15


def test_stencil_block():
    cfg = load_deck(os.path.join(
        REFERENCE, "epoch1d/tests/custom_stencils/lehe_custom/input.deck"))
    assert cfg.control.maxwell_solver == const.MaxwellSolver.CUSTOM
    assert cfg.stencil.deltax == -0.025303094265254511
    assert cfg.stencil.dt > 0


def test_import_directive(tmp_path):
    (tmp_path / "common.deck").write_text(
        "begin:constant\n  dens = 5\nend:constant\n")
    (tmp_path / "input.deck").write_text(
        "import: common.deck\n"
        "begin:control\n  nx = 10\n  t_end = 1\n  x_min = 0\n  x_max = 1\n"
        "end:control\n"
        "begin:species\n  name = e\n  charge = -1\n  mass = 1\n"
        "  number_density = dens * 2\n  nparticles = 10\nend:species\n")
    cfg = load_deck(str(tmp_path / "input.deck"))
    assert cfg.species[0].density({}) == 10.0


def test_species_dist_fn_sampling(tmp_path):
    """Arbitrary momentum distribution loader (power_law.deck style):
    a triangular dist_fn in px reproduces its mean and sign support."""
    import numpy as np
    from epoch_tpu.core import Simulation
    deck = """
begin:control
  pusher = scatter
  nx = 16
  t_end = 1
  x_min = 0
  x_max = 1.6e-5
end:control
begin:boundaries
  bc_x_min = periodic
  bc_x_max = periodic
end:boundaries
begin:constant
  p0 = 1e-22
end:constant
begin:species
  name = beam
  charge = -1
  mass = 1.0
  number_density = 1e20
  nparticles = 4096
  dist_fn = px / p0
  dist_fn_px_range = (0, p0)
end:species
begin:output
  dt_snapshot = 1
end:output
"""
    (tmp_path / "input.deck").write_text(deck)
    sim = Simulation(str(tmp_path / "input.deck"), seed=9)
    sl = sim.state.species[0]
    alive = np.asarray(sl.alive)
    px = np.asarray(sl.p)[alive, 0]
    assert np.all(px >= 0) and np.all(px <= 1e-22)
    # f(p) ∝ p on [0, p0] → mean 2/3 p0
    assert abs(px.mean() - 2.0 / 3.0 * 1e-22) < 0.03e-22
    assert np.allclose(np.asarray(sl.p)[alive, 1:], 0.0)
