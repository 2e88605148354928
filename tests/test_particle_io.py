"""Per-particle output variables + lazy global IDs
(deck_io_block.F90:528-580, generate_particle_ids partlist.F90:883)."""
import numpy as np

import epoch_tpu.constants as const
from epoch_tpu.runner import Runner
from epoch_tpu.io import sdf

DECK = """
begin:control
  pusher = scatter
  nx = 16
  t_end = {t_end}
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
  number_density = 1e20
  nparticles = 64
  temperature_ev = 1000
end:species
begin:output
  dt_snapshot = {snap}
  particles = always
  px = always
  vx = always
  gamma = always
  ek = always
  id = always
  particle_weight = always
end:output
"""


def test_particle_vars_and_ids(tmp_path):
    # ~2 snapshots
    t_end = 4e-15
    (tmp_path / "input.deck").write_text(
        DECK.format(t_end=t_end, snap=t_end / 2.1))
    r = Runner(str(tmp_path))
    r.run()
    dumps = sorted(tmp_path.glob("0*.sdf"))
    assert len(dumps) >= 2

    d0 = sdf.read(str(dumps[0]))
    ids0 = np.sort(d0["Particles/ID/electron"].data.astype(np.int64))
    assert ids0.shape[0] == 64
    # ids are unique and start at 1 (lazy assignment on first dump)
    assert np.array_equal(ids0, np.arange(1, 65))

    d1 = sdf.read(str(dumps[-1]))
    ids1 = np.sort(d1["Particles/ID/electron"].data.astype(np.int64))
    # stable across dumps: same id set, no re-assignment
    assert np.array_equal(ids0, ids1)

    # vx/gamma/ek consistent with px
    px = d1["Particles/Px/electron"].data
    vx = d1["Particles/Vx/electron"].data
    gam = d1["Particles/Gamma/electron"].data
    ek = d1["Particles/Ek/electron"].data
    assert np.allclose(vx, px / (const.m0 * gam), rtol=1e-10)
    assert np.all(gam >= 1.0)
    assert np.allclose(ek, (gam - 1.0) * const.m0 * const.c ** 2,
                       rtol=1e-8)
