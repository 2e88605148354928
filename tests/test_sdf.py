"""SDF writer/reader round-trip tests."""
import numpy as np

from epoch_tpu.io import sdf


def test_roundtrip(tmp_path):
    path = str(tmp_path / "0000.sdf")
    w = sdf.SDFWriter(path, step=7, time=1.25e-14)
    xb = np.linspace(-1e-6, 1e-6, 101)
    w.write_plain_mesh("grid", "Grid/Grid", [xb])
    ey = np.sin(np.linspace(0, 6, 100))
    w.write_plain_variable("ey", "Electric Field/Ey", ey, "grid", "V/m")
    coords = np.random.default_rng(0).uniform(-1e-6, 1e-6, (50, 1))
    w.write_point_mesh("grid/e", "Grid/Particles/e", coords)
    px = np.arange(50.0)
    w.write_point_variable("px/e", "Particles/Px/e", px, "grid/e", "kg.m/s")
    w.write_constant("total_field_energy", "Total Field Energy", 3.5)
    w.write_namevalue("meta", "Meta", {"a": 1.0, "b": 2.0})
    w.write_datablock("deck", "Input Deck", b"begin:control\nend:control\n")
    w.close()

    d = sdf.read(path, dict=True)
    assert d["Header"]["step"] == 7
    assert abs(d["Header"]["time"] - 1.25e-14) < 1e-30
    np.testing.assert_array_equal(d["Grid/Grid"].data[0], xb)
    blk = d["Electric Field/Ey"]
    np.testing.assert_array_equal(blk.data, ey)
    mids = blk.grid_mid.data[0]
    np.testing.assert_allclose(mids, 0.5 * (xb[1:] + xb[:-1]))
    np.testing.assert_allclose(d["Grid/Particles/e"].data[0], coords[:, 0])
    np.testing.assert_array_equal(d["Particles/Px/e"].data, px)
    assert d["Total Field Energy"].data == 3.5
    assert d["Meta"].data == {"a": 1.0, "b": 2.0}
    assert d["Input Deck"].data.startswith(b"begin:control")


def test_2d_fortran_order(tmp_path):
    path = str(tmp_path / "a.sdf")
    w = sdf.SDFWriter(path)
    arr = np.arange(12.0).reshape(3, 4)
    w.write_plain_mesh("grid", "Grid/Grid",
                       [np.arange(4.0), np.arange(5.0)])
    w.write_plain_variable("v", "Var", arr, "grid")
    w.close()
    d = sdf.read(path)
    np.testing.assert_array_equal(d["Var"].data, arr)
