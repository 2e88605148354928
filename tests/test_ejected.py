"""Ejected-particle tracking (boundary.F90:758-770, ejected_list
shared_data.F90:456): open-boundary exits accumulate and dump as
ejected_<species> point data, clearing after each dump."""
import numpy as np

import epoch_tpu.constants as const
from epoch_tpu.runner import Runner
from epoch_tpu.io import sdf

DECK = """
begin:control
  pusher = scatter
  nx = 32
  t_end = {t_end}
  x_min = 0
  x_max = 3.2e-6
end:control
begin:boundaries
  bc_x_min = open
  bc_x_max = open
end:boundaries
begin:species
  name = electron
  charge = -1
  mass = 1.0
  number_density = 1e20
  nparticles = 64
  drift_px = 1e-22
end:species
begin:output
  dt_snapshot = {t_end}
  particles = always
  ejected_particles = always
end:output
"""


def test_ejected_accumulate_and_dump(tmp_path):
    # v_x ~ 1e-22/m0 ~ 1.1e8 m/s; domain 3.2e-6 m crossed in ~30 fs
    t_end = 4.0e-14
    (tmp_path / "input.deck").write_text(DECK.format(t_end=t_end))
    r = Runner(str(tmp_path))
    assert r.sim.cfg.track_ejected
    r.run()
    dumps = sorted(tmp_path.glob("0*.sdf"))
    d = sdf.read(str(dumps[-1]))
    ej = d["Grid/Particles/ejected_electron"].data
    n_ej = ej[0].shape[0] if isinstance(ej, (list, tuple)) else ej.shape[0]
    n_alive = int(r.sim.state.species[0].alive.sum())
    assert n_ej > 0
    # every initial particle is either still in the box or ejected
    assert n_ej + n_alive == 64, (n_ej, n_alive)
    px = d["Particles/Px/ejected_electron"].data
    assert np.all(np.abs(px) > 0)
    # buffers cleared after the dump
    assert int(r.sim.state.ejected[0].alive.sum()) == 0
