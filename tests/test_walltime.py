"""Walltime stop/dump machinery (diagnostics.F90:3222-3410,
deck_io_block.F90:498-510): stop_at_walltime halts with a forced restart
dump; walltime_interval / dump_at_walltimes drive dump cadences; unknown
io-block keys warn instead of being silently swallowed."""
import io
import logging
import os

import numpy as np

from epoch_tpu.runner import Runner
from epoch_tpu.deck.deck import load_deck

DECK = """
begin:control
  nx = 16
  t_end = 1
  x_min = 0
  x_max = 1.6e-5
  stop_at_walltime = {walltime}
  check_stop_frequency = 1
end:control
begin:boundaries
  bc_x_min = periodic
  bc_x_max = periodic
end:boundaries
begin:species
  name = electron
  charge = -1
  mass = 1.0
  number_density = 1e10
  nparticles_per_cell = 2
  temperature_ev = 10
end:species
begin:output
  {extra}
  ex = always
end:output
"""


def test_stop_at_walltime_leaves_restart_dump(tmp_path):
    """A run killed by stop_at_walltime must leave a restart dump — the
    reference always dumps before a scheduler kill (check_walltime_auto,
    diagnostics.F90:3323)."""
    (tmp_path / "input.deck").write_text(
        DECK.format(walltime="1e-3", extra=""))
    r = Runner(str(tmp_path), stdout=io.StringIO())
    st = r.run()
    # the tiny budget halts well before t_end
    assert float(st.time) < r.sim.cfg.t_end
    assert os.path.exists(tmp_path / "restart.sdf"), \
        "stop_at_walltime halt left no restart dump"
    out = r.stdout.getvalue()
    assert "stop_at_walltime" in out


def test_no_walltime_stop_by_default(tmp_path):
    (tmp_path / "input.deck").write_text(
        DECK.format(walltime="-1", extra="").replace(
            "t_end = 1", "nsteps = 3"))
    r = Runner(str(tmp_path), stdout=io.StringIO())
    st = r.run()
    assert int(st.step) == 3
    assert not os.path.exists(tmp_path / "restart.sdf")


def test_walltime_interval_fires_dumps(tmp_path):
    """walltime_interval fires on elapsed wall-clock (every maybe_dump
    call here, interval ≈ 0) — each step adds a dump."""
    (tmp_path / "input.deck").write_text(
        DECK.format(walltime="-1",
                    extra="walltime_interval = 1e-7").replace(
                        "t_end = 1", "nsteps = 4"))
    r = Runner(str(tmp_path), stdout=io.StringIO())
    r.run()
    dumps = [f for f in os.listdir(tmp_path) if f.endswith(".sdf")]
    # initial + one per step (4) + final
    assert len(dumps) >= 5


def test_dump_at_walltimes_one_shot(tmp_path):
    (tmp_path / "input.deck").write_text(
        DECK.format(walltime="-1",
                    extra="dump_at_walltimes = 1e-7").replace(
                        "t_end = 1", "nsteps = 4"))
    r = Runner(str(tmp_path), stdout=io.StringIO())
    r.run()
    dumps = [f for f in os.listdir(tmp_path) if f.endswith(".sdf")]
    # the one-shot merges into the initial dump (elapsed already past it)
    # and is then consumed; only the dump_first/dump_last dumps remain
    # (3 here: initial + nsteps-boundary + exit).  An unconsumed trigger
    # would fire every step (7 dumps).
    assert len(dumps) == 3


def test_unknown_io_key_warns(tmp_path, caplog):
    (tmp_path / "input.deck").write_text(
        DECK.format(walltime="-1", extra="not_a_real_key = always"))
    with caplog.at_level(logging.WARNING, logger="epoch_tpu"):
        load_deck(str(tmp_path / "input.deck"))
    assert any("not_a_real_key" in rec.getMessage()
               for rec in caplog.records)


def test_ref_vocabulary_io_key_warns_differently(tmp_path, caplog):
    """A valid-EPOCH-but-unimplemented key (cpml_psi_exy) warns as 'not
    implemented', not 'unknown'."""
    (tmp_path / "input.deck").write_text(
        DECK.format(walltime="-1", extra="cpml_psi_exy = always"))
    with caplog.at_level(logging.WARNING, logger="epoch_tpu"):
        load_deck(str(tmp_path / "input.deck"))
    msgs = [rec.getMessage() for rec in caplog.records]
    assert any("not implemented" in m and "cpml_psi_exy" in m
               for m in msgs)


def test_disabled_block_never_fires(tmp_path):
    (tmp_path / "input.deck").write_text(
        DECK.format(walltime="-1", extra="disabled = T").replace(
            "t_end = 1", "nsteps = 2"))
    r = Runner(str(tmp_path), stdout=io.StringIO())
    r.run()
    dumps = [f for f in os.listdir(tmp_path) if f.endswith(".sdf")]
    assert len(dumps) == 0
