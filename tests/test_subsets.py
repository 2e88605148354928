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


BINNED_DECK = """
begin:control
  nx = 16
  ny = 8
  t_end = 8e-15
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
begin:species
  name = electron
  charge = -1
  mass = 1.0
  number_density = 1e20
  nparticles_per_cell = 2
  temperature_ev = 1000
end:species
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
  id = always
end:output
"""


def test_persistent_subset_and_ids_on_binned(tmp_path):
    """IDs ride the slot grid as float-encoded aux rows (VERDICT r2
    item 7): id output and persistent subsets work on the DEFAULT
    engine (partlist.F90:883, particle_id_hash.F90:88-692)."""
    (tmp_path / "input.deck").write_text(BINNED_DECK)
    r = Runner(str(tmp_path))
    assert r.sim.cfg.engine == "binned"
    assert "id_lo" in r.sim.cfg.binned_aux
    st = r.out.maybe_dump(r.sim, r.sim.state, force=True)
    dumps = sorted(tmp_path.glob("0*.sdf"))
    d0 = sdf.read(str(dumps[-1]))
    ids0 = d0["Particles/ID/electron"].data
    n_all = ids0.shape[0]
    assert n_all == 16 * 8 * 2
    assert np.all(ids0 > 0)
    assert np.unique(ids0).size == n_all, "ids must be unique"
    n_track0 = d0["Px/tracked/electron"].data.shape[0]
    assert 0 < n_track0 < n_all

    # run a couple of steps: particles move cells (and slots); each
    # keeps its id — the dumped id SET is unchanged
    r.run(max_steps=2)
    st = r.out.maybe_dump(r.sim, r.sim.state, force=True)
    dumps = sorted(tmp_path.glob("0*.sdf"))
    dl = sdf.read(str(dumps[-1]))
    idsl = dl["Particles/ID/electron"].data
    assert np.array_equal(np.sort(idsl), np.sort(ids0))

    # flip every momentum: the persistent subset keeps its registered
    # members (now px < 0)
    sl = r.sim.state.species[0]
    r.sim.state = r.sim.state._replace(species=(sl._replace(p=-sl.p),))
    st = r.out.maybe_dump(r.sim, r.sim.state, force=True)
    dumps = sorted(tmp_path.glob("0*.sdf"))
    df = sdf.read(str(dumps[-1]))
    pxt = df["Px/tracked/electron"].data
    assert pxt.shape[0] >= n_track0
    assert np.any(pxt < 0), "persistent members keep negative px"
