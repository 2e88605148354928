"""Maxwell-solver dispersion tests
(epoch1d/tests/test_maxwell_solvers.py, test_custom_stencils.py).

Fits the Ey²-weighted pulse-centroid trajectory across dumps and compares
the measured group velocity against the analytic dispersion, rtol 0.022.

Note on lehe_x: rounds 2-3 fitted dumps[2:] because dump 1's source-cell
state deviated from the Fortran (vg 3.202e8, rel 2.76% vs the 2.2% gate
under the reference's own dumps[1:] protocol).  Root cause found round 4:
the reference forces fng = 2 for the lehe solvers regardless of
field_order (deck_control_block.F90:114-118), which places the cpml_laser
source row one cell deeper (boundary.F90:896) — our fng was
field_order/2 = 1.  With the source row matched, all three decks use the
full reference protocol (fit from the first t>0 dump).
"""
import glob
import os
import shutil

import numpy as np
import pytest

import epoch_tpu.io.sdf as sdf
from epoch_tpu.runner import Runner

from conftest import reference_deck

micron = 1e-6
femto = 1e-15
c = 2.99792458e8
nx = 240
x_min = -12 * micron
dt_multiplier = 0.95
lambda_l = 0.5 * micron
k_l = 2 * np.pi / lambda_l
dx = (2 * 12 * micron) / nx
dt_yee = dt_multiplier * dx / c

VG_LEHE = c * (1.0 + 2.0 * (1.0 - c * dt_yee / dx) * (k_l * dx / 2.0) ** 2)
VG_YEE = c * np.cos(k_l * dx / 2.0) / np.sqrt(
    1 - (c * dt_yee / dx * np.sin(k_l * dx / 2.0)) ** 2)

DECKS = {
    "yee": ("epoch1d/tests/maxwell_solvers/yee/input.deck", VG_YEE, 1),
    "lehe_x": ("epoch1d/tests/maxwell_solvers/lehe_x/input.deck", VG_LEHE, 1),
    "custom": ("epoch1d/tests/custom_stencils/lehe_custom/input.deck",
               VG_LEHE, 1),
}


def _run(deck_rel, tmpdir):
    shutil.copy(reference_deck(deck_rel), os.path.join(tmpdir, "input.deck"))
    Runner(tmpdir).run()
    pts = []
    for f in sorted(glob.glob(os.path.join(tmpdir, "*.sdf"))):
        d = sdf.read(f, dict=True)
        t = d["Header"]["time"]
        blk = d["Electric Field/Ey"]
        data = blk.data
        xaxis = blk.grid_mid.data[0]
        b = np.sum(data ** 2)
        if b > 0 and t > 0:
            pts.append((t, np.sum(xaxis * data ** 2) / b))
    return np.array(pts)


@pytest.mark.parametrize("solver", list(DECKS))
def test_group_velocity(solver, tmp_path):
    deck_rel, vg_ref, first_dump = DECKS[solver]
    pts = _run(deck_rel, str(tmp_path))
    vg_sim = np.polyfit(pts[first_dump - 1:, 0], pts[first_dump - 1:, 1], 1)[0]
    print(f"{solver}: vg_sim={vg_sim:.4e} vg_ref={vg_ref:.4e} "
          f"rel={abs(vg_sim - vg_ref) / vg_ref:.4f}")
    # epoch1d/tests/test_maxwell_solvers.py:131 tolerance
    assert np.isclose(vg_sim, vg_ref, rtol=0.022)
