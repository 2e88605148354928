"""The reference laser regression (epoch1d/tests/test_laser.py:60-80):
exact conserved ΣEy² at dumps 1, 3 and 7 of the 1d laser deck."""
import glob
import os
import shutil

import numpy as np
import pytest

import epoch_tpu.io.sdf as sdf
from epoch_tpu.runner import Runner

from conftest import reference_deck


@pytest.fixture(scope="module")
def laser_run(tmp_path_factory):
    rundir = str(tmp_path_factory.mktemp("laser"))
    shutil.copy(reference_deck("epoch1d/tests/laser/input.deck"),
                os.path.join(rundir, "input.deck"))
    r = Runner(rundir)
    r.run()
    return rundir


def _sum_ey2(rundir, i):
    files = sorted(glob.glob(os.path.join(rundir, "*.sdf")))
    d = sdf.read(files[i], dict=True)
    return (d["Electric Field/Ey"].data ** 2).sum()


def test_dump_count(laser_run):
    assert len(glob.glob(os.path.join(laser_run, "*.sdf"))) == 8


def test_sum_ey2_dump1(laser_run):
    # epoch1d/tests/test_laser.py:73-74
    assert np.isclose(_sum_ey2(laser_run, 1), 1.3863746041123297e+23)


def test_sum_ey2_dump3(laser_run):
    # epoch1d/tests/test_laser.py:76-77
    assert np.isclose(_sum_ey2(laser_run, 3), 1.4061852974870318e+23)


def test_sum_ey2_dump7(laser_run):
    # epoch1d/tests/test_laser.py:79-80
    assert np.isclose(_sum_ey2(laser_run, 7), 1.23187164795e+17)
