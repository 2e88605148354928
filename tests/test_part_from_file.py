"""particles_from_file loader (deck_part_from_file_block.F90,
custom_particle_load helper.F90:763-930): raw float64 binary arrays."""
import numpy as np

from epoch_tpu.core import Simulation

DECK = """
begin:control
  pusher = scatter
  nx = 16
  t_end = 1e-15
  x_min = 0
  x_max = 1.6e-5
end:control
begin:boundaries
  bc_x_min = periodic
  bc_x_max = periodic
end:boundaries
begin:species
  name = beam
  charge = -1
  mass = 1.0
end:species
begin:particles_from_file
  species = beam
  x_data = beam_x.dat
  offset = 16
  px_data = beam_px.dat
  offset = 0
  w_data = beam_w.dat
  id8_data = beam_id.dat
end:particles_from_file
begin:output
  dt_snapshot = 1
end:output
"""


def test_load_from_file(tmp_path):
    n = 100
    rng = np.random.default_rng(5)
    x = rng.uniform(1e-6, 1.5e-5, n)
    px = rng.normal(0, 1e-23, n)
    w = rng.uniform(1, 2, n)
    ids = np.arange(1000, 1000 + n, dtype=np.int64)
    x.tofile(tmp_path / "beam_x.dat")
    # px file carries a 16-byte header skipped by `offset` (sticky until
    # the next offset line)
    with open(tmp_path / "beam_px.dat", "wb") as f:
        f.write(b"\0" * 16)
        px.tofile(f)
    w.tofile(tmp_path / "beam_w.dat")
    ids.tofile(tmp_path / "beam_id.dat")

    (tmp_path / "input.deck").write_text(DECK)
    sim = Simulation(str(tmp_path / "input.deck"))
    sl = sim.state.species[0]
    alive = np.asarray(sl.alive)
    assert alive.sum() == n
    assert np.allclose(np.asarray(sl.x)[alive, 0], x)
    assert np.allclose(np.asarray(sl.p)[alive, 0], px)
    assert np.allclose(np.asarray(sl.p)[alive, 1:], 0.0)
    assert np.allclose(np.asarray(sl.weight)[alive], w)
    assert np.array_equal(np.asarray(sl.id)[alive], ids)


def test_mismatched_counts(tmp_path):
    import pytest
    n = 10
    np.zeros(n).tofile(tmp_path / "beam_x.dat")
    np.zeros(n).tofile(tmp_path / "beam_px.dat")  # 16-byte offset -> 8 recs
    np.zeros(n).tofile(tmp_path / "beam_w.dat")
    np.arange(n, dtype=np.int64).tofile(tmp_path / "beam_id.dat")
    deck = DECK.replace("offset = 16\n", "")
    # px now has an extra-records mismatch via the leftover offset line
    np.zeros(n + 3).tofile(tmp_path / "beam_px.dat")
    (tmp_path / "input.deck").write_text(deck)
    with pytest.raises(ValueError, match="px_data"):
        Simulation(str(tmp_path / "input.deck"))
