"""Restart dumps must resume bit-exactly (use_exact_restart semantics,
setup.F90:822-1464)."""
import os

import numpy as np
import pytest

from epoch_tpu.core import Simulation
from epoch_tpu.io.checkpoint import write_restart, read_restart

DECK = """
begin:control
  nx = 32
  t_end = 1
  x_min = 0
  x_max = 3.2e-5
  pusher = {pusher}
end:control
begin:boundaries
  bc_x_min = periodic
  bc_x_max = periodic
end:boundaries
begin:species
  name = electron
  charge = -1
  mass = 1.0
  number_density = 1e22
  nparticles_per_cell = 4
  temperature_ev = 100
end:species
begin:output
  dt_snapshot = 1
end:output
"""


@pytest.mark.parametrize("pusher", ["scatter", "binned"])
def test_restart_bit_exact(tmp_path, pusher):
    d = tmp_path / pusher
    d.mkdir()
    (d / "input.deck").write_text(DECK.format(pusher=pusher))
    sim = Simulation(str(d / "input.deck"))
    st = sim.state
    for _ in range(5):
        st = sim.fns["step_b"](sim.fns["step_a"](st))
    ckpt = str(d / "restart.sdf")
    write_restart(ckpt, sim.cfg, st, deck_text="deck")

    restored = read_restart(ckpt, sim.cfg, st)
    # continue both and compare
    a = b = None
    st2 = st
    st3 = restored
    for _ in range(5):
        st2 = sim.fns["step_b"](sim.fns["step_a"](st2))
        st3 = sim.fns["step_b"](sim.fns["step_a"](st3))
    for nm in ("ex", "ey", "jx"):
        x = np.asarray(getattr(st2.fields, nm))
        y = np.asarray(getattr(st3.fields, nm))
        np.testing.assert_array_equal(x, y)
    assert float(st3.time) == float(st2.time)


def test_rolling_restarts(tmp_path):
    """rolling_restart alternates two restart files; restart_dump_every
    controls cadence (shared_data.F90:309)."""
    import os
    from epoch_tpu.runner import Runner
    deck = """
begin:control
  nx = 16
  t_end = 1
  nsteps = 7
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
  nparticles = 256
  temperature_ev = 10
end:species
begin:output
  nstep_snapshot = 2
  restart_dump_every = 1
  rolling_restart = T
  grid = always
  ex = always
end:output
"""
    (tmp_path / "input.deck").write_text(deck)
    import io as _io
    r = Runner(str(tmp_path), stdout=_io.StringIO())
    r.run()
    f0 = tmp_path / "roll_restart0.sdf"
    f1 = tmp_path / "roll_restart1.sdf"
    assert f0.exists() and f1.exists()
    # both must be loadable full restarts
    from epoch_tpu.io.checkpoint import read_restart
    st0 = read_restart(str(f0), r.sim.cfg, r.sim.state)
    st1 = read_restart(str(f1), r.sim.cfg, r.sim.state)
    # the two files are from different dump points (alternation)
    assert float(st0.time) != float(st1.time)


def test_persistent_subset_membership_roundtrip(tmp_path):
    """Persistent-subset ids survive a restart (id_registry analogue)."""
    from epoch_tpu.core import Simulation
    from epoch_tpu.io.checkpoint import (write_restart,
                                         read_persistent_members)
    deck = """
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
  number_density = 1e20
  nparticles = 64
end:species
begin:output
  dt_snapshot = 1
end:output
"""
    (tmp_path / "input.deck").write_text(deck)
    sim = Simulation(str(tmp_path / "input.deck"))
    members = {("fast", "electron"): {3, 17, 42}}
    ck = str(tmp_path / "r.sdf")
    write_restart(ck, sim.cfg, sim.state, persistent_members=members)
    got = read_persistent_members(ck)
    assert got == members


def test_source_embedding_roundtrip(tmp_path):
    """Every restart dump embeds the full source tarball
    (epoch_write_source_info, diagnostics.F90:3412; src/pack.py); the
    unpack script must recover byte-identical source files."""
    import io
    import subprocess
    import sys
    import tarfile

    d = tmp_path / "src"
    d.mkdir()
    (d / "input.deck").write_text(DECK.format(pusher="scatter"))
    sim = Simulation(str(d / "input.deck"))
    ckpt = str(d / "restart.sdf")
    write_restart(ckpt, sim.cfg, sim.state, deck_text="the deck text")

    from epoch_tpu.io import sdf
    blk = sdf.read(ckpt)["Source Code/epoch_tpu"]
    assert blk.meta["mimetype"] == "application/gzip"
    with tarfile.open(fileobj=io.BytesIO(blk.data), mode="r:gz") as tf:
        names = tf.getnames()
        payload = tf.extractfile("epoch_tpu/io/checkpoint.py").read()
    assert "epoch_tpu/core/binned.py" in names
    assert "bench.py" in names
    import epoch_tpu.io.checkpoint as ck
    with open(ck.__file__, "rb") as f:
        assert payload == f.read()
    # determinism: a second dump embeds byte-identical source
    write_restart(str(d / "r2.sdf"), sim.cfg, sim.state)
    assert sdf.read(str(d / "r2.sdf"))["Source Code/epoch_tpu"].data \
        == blk.data

    # the unpack script end-to-end
    out = tmp_path / "unpacked"
    out.mkdir()
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.dirname(
             os.path.abspath(__file__))),
             "scripts", "unpack_source_from_restart.py"),
         ckpt, str(out)],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert (out / "epoch_tpu" / "io" / "checkpoint.py").read_bytes() \
        == payload
    assert (out / "input.deck.from_restart").read_text() == "the deck text"
