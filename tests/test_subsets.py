"""Subset output: ranges, random fraction, and persistent membership
(deck_subset_block.F90; build_persistent_subsets diagnostics.F90:2510)."""
import numpy as np

from epoch_tpu.runner import Runner
from epoch_tpu.io import sdf

DECK = """
begin:control
  pusher = scatter
  nx = 32
  t_end = 8e-15
  x_min = 0
  x_max = 3.2e-5
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
  nparticles = 128
  temperature_ev = 1000
end:species
begin:subset
  name = fast
  include_species = electron
  px_min = 0
end:subset
begin:subset
  name = tracked
  include_species = electron
  px_min = 0
  persist_start_time = 0
end:subset
begin:output
  dt_snapshot = 3.5e-15
  particles = always
  px = always
end:output
"""


def test_subset_ranges_and_persistence(tmp_path):
    import jax.numpy as jnp
    (tmp_path / "input.deck").write_text(DECK)
    r = Runner(str(tmp_path))
    st = r.out.maybe_dump(r.sim, r.sim.state, force=True)   # dump 0
    dumps = sorted(tmp_path.glob("0*.sdf"))
    d0 = sdf.read(str(dumps[-1]))
    # plain subset: only px >= 0 members
    px0 = d0["Px/fast/electron"].data
    assert px0.size > 0 and np.all(px0 >= 0)
    # persistent subset registered the same set at t=0
    n_track0 = d0["Px/tracked/electron"].data.shape[0]
    assert n_track0 == px0.shape[0]

    # flip every momentum: the filtered subset swaps membership, the
    # persistent subset keeps its registered members (now px < 0)
    sl = st.species[0]
    st = st._replace(species=(sl._replace(p=-sl.p),))
    r.sim.state = st
    st = r.out.maybe_dump(r.sim, st, force=True)
    dumps = sorted(tmp_path.glob("0*.sdf"))
    dl = sdf.read(str(dumps[-1]))
    pxl = dl["Px/fast/electron"].data
    assert np.all(pxl >= 0)
    assert pxl.shape[0] == 128 - px0.shape[0]
    pxt = dl["Px/tracked/electron"].data
    # everyone is registered by now (both dumps' px>=0 sets cover all)
    assert pxt.shape[0] == 128
    assert np.any(pxt < 0), "persistent members keep negative px"
