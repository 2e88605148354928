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


def test_sdf_structural_spec(tmp_path):
    """Field-by-field structural validation against the SDF v1.4 layout
    (independent offset-based parse, not the library reader): header
    constants, block-header chaining, data-location bounds."""
    import struct
    import numpy as np
    from epoch_tpu.io.sdf import SDFWriter, ID_LENGTH, STRING_LENGTH, \
        HEADER_LENGTH

    path = str(tmp_path / "spec.sdf")
    w = SDFWriter(path, code_name="Epoch_tpu", step=7, time=1.5e-15,
                  restart=True)
    w.write_plain_mesh("grid", "Grid/Grid",
                       [np.linspace(0, 1, 9), np.linspace(0, 2, 5)])
    w.write_plain_variable("ex", "Electric Field/Ex",
                           np.arange(32, dtype=np.float64).reshape(8, 4),
                           "grid", "V/m")
    w.write_constant("cst", "Constants/dt", 3.25)
    w.close()

    raw = open(path, "rb").read()
    # --- file header, explicit offsets (SDF v1.4) ---
    assert raw[0:4] == b"SDF1"
    endianness, version, revision = struct.unpack_from("<3i", raw, 4)
    assert endianness == 16911887 and version == 1 and revision >= 1
    assert raw[16:48].decode().startswith("Epoch_tpu")
    first_block, summary_loc = struct.unpack_from("<qq", raw, 48)
    summary_size, nblocks, bhl, step = struct.unpack_from("<4i", raw, 64)
    assert first_block == HEADER_LENGTH == 106
    assert nblocks == 3
    assert bhl == 8 + 8 + ID_LENGTH + 8 + 4 + 4 + 4 + STRING_LENGTH
    assert step == 7
    (t,) = struct.unpack_from("<d", raw, 80)
    assert t == 1.5e-15
    j1, j2, slen, iover = struct.unpack_from("<4i", raw, 88)
    assert slen == STRING_LENGTH
    assert raw[104] == 1          # restart flag

    # --- block chain: every next_block/data_location strictly ordered and
    # in-bounds; ids/names are space-padded ASCII ---
    pos = first_block
    seen = []
    for _ in range(nblocks):
        nb, dl = struct.unpack_from("<qq", raw, pos)
        bid = raw[pos + 16:pos + 16 + ID_LENGTH].decode().strip()
        (dlen,) = struct.unpack_from("<q", raw, pos + 16 + ID_LENGTH)
        bt, dt, nd = struct.unpack_from(
            "<3i", raw, pos + 24 + ID_LENGTH)
        seen.append((bid, bt, dt, nd))
        assert pos + bhl <= dl <= len(raw)
        assert dl + dlen == nb <= len(raw)
        pos = nb
    assert pos == len(raw)        # chain covers the file exactly
    assert [s[0] for s in seen] == ["grid", "ex", "cst"]
    # blocktypes: plain mesh=1, plain var=3, constant=5; real8 datatype=4
    assert [s[1] for s in seen] == [1, 3, 5]
    assert seen[1][2] == 4 and seen[1][3] == 2

    # --- plain-variable data is Fortran-ordered float64 after the
    # metadata (mult r8, units id32, mesh id32, dims 4*nd, stagger i4) ---
    pos = first_block
    nb, dl = struct.unpack_from("<qq", raw, pos)
    pos = nb                      # skip mesh
    nb, dl = struct.unpack_from("<qq", raw, pos)
    meta_off = pos + bhl
    (mult,) = struct.unpack_from("<d", raw, meta_off)
    assert mult == 1.0
    units = raw[meta_off + 8:meta_off + 8 + ID_LENGTH].decode().strip()
    assert units == "V/m"
    mesh_id = raw[meta_off + 8 + ID_LENGTH:
                  meta_off + 8 + 2 * ID_LENGTH].decode().strip()
    assert mesh_id == "grid"
    d0, d1 = struct.unpack_from("<2i", raw, meta_off + 8 + 2 * ID_LENGTH)
    assert (d0, d1) == (8, 4)
    arr = np.frombuffer(raw[dl:dl + 32 * 8], np.float64).reshape(
        (8, 4), order="F")
    np.testing.assert_array_equal(arr, np.arange(32).reshape(8, 4))


def test_sdf_golden_bytes(tmp_path):
    """Regression-freeze the wire format: a fixed dataset must produce
    byte-identical output to the committed golden digest."""
    import hashlib
    import numpy as np
    from epoch_tpu.io.sdf import SDFWriter
    path = str(tmp_path / "golden.sdf")
    w = SDFWriter(path, code_name="Epoch_tpu", step=3, time=2.0e-16)
    w.write_plain_mesh("grid", "Grid/Grid", [np.linspace(0, 1, 5)])
    w.write_plain_variable("ex", "Electric Field/Ex",
                           np.arange(4, dtype=np.float64), "grid", "V/m")
    w.write_point_mesh("pm", "Grid/Particles/e",
                       np.arange(6, dtype=np.float64).reshape(3, 2))
    w.write_point_variable("px", "Px/e", np.ones(3), "pm", "kg.m/s")
    w.write_constant("c1", "Constants/i", 42)
    w.write_namevalue("nv", "NameValue", {"a": 1.0, "b": 2.0})
    w.write_datablock("db", "Input Deck", b"begin:control\nend:control\n",
                      "text/plain")
    w.close()
    digest = hashlib.sha256(open(path, "rb").read()).hexdigest()
    assert digest == GOLDEN_SHA256, digest


GOLDEN_SHA256 = "84c76a2805622faa303ffab08eece372bef043a692420594bed7ffb7294826b9"
