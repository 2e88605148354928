"""Field-variable subset output: skip striding (Reduced_) and spatial
trimming (Core_) — deck_subset_block.F90:292-311 + the write_field subset
loop (epoch2d/src/io/diagnostics.F90:1797-1900).

Subset names act as dumpmask bits on io-block variables
(`ex = always + <subset>`); a skip subset suppresses the full-grid copy
of that variable (dump_skipped), a Core subset does not.
"""
import glob

import numpy as np

from epoch_tpu.io import sdf
from epoch_tpu.runner import Runner

DECK = """
begin:control
  nx = 16
  ny = 8
  t_end = 1
  x_min = 0
  x_max = 1.6e-5
  y_min = 0
  y_max = 0.8e-5
end:control
begin:boundaries
  bc_x_min = periodic
  bc_x_max = periodic
  bc_y_min = periodic
  bc_y_max = periodic
end:boundaries
begin:fields
  ex = sin(2 * pi * x / 1.6e-5)
  ey = cos(2 * pi * y / 0.8e-5)
end:fields
begin:species
  name = electron
  charge = -1
  mass = 1.0
  number_density = 1e20 * (1 + x / 1.6e-5)
  nparticles_per_cell = 4
end:species
begin:subset
  name = coarse
  skip = 1
end:subset
begin:subset
  name = slab
  x_min = 0.4e-5
  x_max = 1.2e-5
end:subset
begin:output
  dt_snapshot = 1e-18
  grid = always
  ex = always + coarse
  ey = always
  number_density = always + slab + no_sum + species
end:output
"""


def _run(tmp_path):
    (tmp_path / "input.deck").write_text(DECK)
    r = Runner(str(tmp_path))
    r.out.maybe_dump(r.sim, r.sim.state, force=True)
    files = sorted(glob.glob(str(tmp_path / "*.sdf")))
    return r.sim, sdf.read(files[-1])


def test_skip_subset_strides_and_suppresses_full(tmp_path):
    sim, d = _run(tmp_path)
    sub = next(s for s in sim.deck.subsets if s.name == "coarse")
    assert sub.skip == (2, 2, 2)
    assert sub.mask_bit != 0
    red = d["Electric Field/Ex/Reduced_coarse"].data
    assert red.shape == (8, 4)
    # ey dumps full grid; ex was claimed by the skip subset
    ey = d["Electric Field/Ey"].data
    assert ey.shape == (16, 8)
    assert "Electric Field/Ex" not in d, \
        "skip subset must suppress the full-grid copy (dump_skipped)"
    # the strided samples equal every 2nd point of the analytic field
    x_nodes = np.asarray(d["Grid/coarse"].data[0])
    assert x_nodes.shape[0] == 9           # 8 sampled cells + 1
    # Ex is staggered to x-faces: sample k sits at nodes[2k] + dx
    np.testing.assert_allclose(
        red[:, 0], np.sin(2 * np.pi * (x_nodes[:-1] + 1.0e-6) / 1.6e-5),
        atol=1e-6)


def test_core_subset_trims_without_suppressing(tmp_path):
    sim, d = _run(tmp_path)
    full = d["Derived/Number_Density/electron"].data
    core = d["Derived/Number_Density/electron/Core_slab"].data
    # cells [4, 12) of 16
    assert core.shape == (8, 8)
    np.testing.assert_allclose(core, full[4:12], rtol=1e-6)
    # Core subsets do NOT suppress the full dump
    assert full.shape == (16, 8)
    # trimmed node mesh spans the box
    xn = np.asarray(d["Grid/slab"].data[0])
    assert xn.shape[0] == 9
    np.testing.assert_allclose(xn[0], 0.4e-5, atol=1e-12)
    np.testing.assert_allclose(xn[-1], 1.2e-5, atol=1e-12)
