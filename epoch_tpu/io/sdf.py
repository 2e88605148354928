"""SDF (Self-Describing Format) writer/reader in pure Python.

The reference vendors the SDF C library as a submodule (``.gitmodules``;
absent from the snapshot) and calls it from ``io/diagnostics.F90``.  This
module re-implements the SDF v1.4 wire format natively: little-endian header
+ chained block headers + raw Fortran-order data, so dumps are
self-describing and the bundled :func:`read` exposes the same API shape as
the ``sdf`` Python reader used by the reference test-suite
(``sdf.read(path, dict=True)`` → ``{'Header': {...}, 'Electric Field/Ey':
block}`` with ``block.data``, ``block.grid_mid.data``).

Byte-layout references: SDF_lib ``sdf.h`` block/datatype constants; the
layout below follows the published SDF format specification (v1.4).  The
reader accepts exactly what the writer emits; cross-validation against
C-library-written files is tracked as future work since the submodule is not
available offline.
"""
from __future__ import annotations

import io
import struct
from dataclasses import dataclass, field

import numpy as np

MAGIC = b"SDF1"
ENDIANNESS = 16911887
SDF_VERSION = 1
SDF_REVISION = 4
ID_LENGTH = 32
STRING_LENGTH = 64
HEADER_LENGTH = 106

# blocktypes (SDF_lib sdf.h)
BT_NULL = 0
BT_PLAIN_MESH = 1
BT_POINT_MESH = 2
BT_PLAIN_VARIABLE = 3
BT_POINT_VARIABLE = 4
BT_CONSTANT = 5
BT_ARRAY = 6
BT_RUN_INFO = 7
BT_SOURCE = 8
BT_STITCHED_TENSOR = 9
BT_STITCHED_MATERIAL = 10
BT_STITCHED_MATVAR = 11
BT_STITCHED_SPECIES = 12
BT_SPECIES = 13
BT_PLAIN_DERIVED = 14
BT_POINT_DERIVED = 15
BT_CPU_SPLIT = 17
BT_DATABLOCK = 26
BT_NAMEVALUE = 27

# datatypes
DT_NULL = 0
DT_INTEGER4 = 1
DT_INTEGER8 = 2
DT_REAL4 = 3
DT_REAL8 = 4
DT_CHARACTER = 6
DT_LOGICAL = 7

_NP2DT = {
    np.dtype(np.int32): DT_INTEGER4,
    np.dtype(np.int64): DT_INTEGER8,
    np.dtype(np.float32): DT_REAL4,
    np.dtype(np.float64): DT_REAL8,
}
_DT2NP = {v: k for k, v in _NP2DT.items()}


def _pad(s: str, n: int) -> bytes:
    b = s.encode()[:n]
    return b + b" " * (n - len(b))


@dataclass
class Block:
    id: str
    name: str
    blocktype: int
    datatype: int
    ndims: int
    data: object = None
    meta: dict = field(default_factory=dict)
    # resolved lazily by the reader:
    _file: object = None

    @property
    def grid(self):
        return self.meta.get("_grid")

    @property
    def grid_mid(self):
        g = self.meta.get("_grid")
        if g is None:
            return None
        mids = tuple(0.5 * (ax[1:] + ax[:-1]) for ax in g.data)
        return _GridMid(mids)

    @property
    def units(self):
        return self.meta.get("units")

    @property
    def stagger(self):
        return self.meta.get("stagger")


class _GridMid:
    def __init__(self, data):
        self.data = data


class SDFWriter:
    """Sequential SDF dump writer (single controller; the reference writes
    collectively with MPI-IO subtypes, unnecessary on a TPU host)."""

    def __init__(self, path, code_name="Epoch_tpu", step=0, time=0.0,
                 restart=False, jobid=(0, 0), code_io_version=1):
        self.path = path
        self.code_name = code_name
        self.step = step
        self.time = time
        self.restart = restart
        self.jobid = jobid
        self.code_io_version = code_io_version
        self.blocks = []          # (header_bytes_fn, data_bytes)
        self._block_entries = []

    # -- block writers ----------------------------------------------------
    def _add(self, bid, name, blocktype, datatype, ndims, metadata: bytes,
             data: bytes):
        self._block_entries.append(
            dict(id=bid, name=name, blocktype=blocktype, datatype=datatype,
                 ndims=ndims, metadata=metadata, data=data))

    def write_plain_mesh(self, bid, name, axes, labels=None, units=None,
                         geometry=1):
        """axes: list of 1d node-coordinate arrays (len n+1 per axis)."""
        nd = len(axes)
        labels = labels or ["X", "Y", "Z"][:nd]
        units = units or ["m"] * nd
        axes = [np.ascontiguousarray(a, np.float64) for a in axes]
        meta = b"".join(struct.pack("<d", 1.0) for _ in range(nd))
        meta += b"".join(_pad(l, ID_LENGTH) for l in labels)
        meta += b"".join(_pad(u, ID_LENGTH) for u in units)
        meta += struct.pack("<i", geometry)
        meta += b"".join(struct.pack("<d", float(a.min())) for a in axes)
        meta += b"".join(struct.pack("<d", float(a.max())) for a in axes)
        meta += b"".join(struct.pack("<i", a.size) for a in axes)
        data = b"".join(a.tobytes() for a in axes)
        self._add(bid, name, BT_PLAIN_MESH, DT_REAL8, nd, meta, data)

    def write_plain_variable(self, bid, name, data, mesh_id="grid",
                             units="", stagger=0, mult=1.0):
        arr = np.asarray(data)
        dt = _NP2DT[arr.dtype if arr.dtype in _NP2DT else np.dtype(np.float64)]
        arr = np.ascontiguousarray(arr, _DT2NP[dt])
        nd = arr.ndim
        meta = struct.pack("<d", mult)
        meta += _pad(units, ID_LENGTH)
        meta += _pad(mesh_id, ID_LENGTH)
        meta += b"".join(struct.pack("<i", s) for s in arr.shape)
        meta += struct.pack("<i", stagger)
        # Fortran order on disk, matching the reference writer
        data_bytes = np.asfortranarray(arr).tobytes(order="F")
        self._add(bid, name, BT_PLAIN_VARIABLE, dt, nd, meta, data_bytes)

    def write_point_mesh(self, bid, name, coords, labels=None, units=None,
                         geometry=1):
        """coords: (npart, ndims)."""
        coords = np.ascontiguousarray(coords, np.float64)
        npart, nd = coords.shape
        labels = labels or ["X", "Y", "Z"][:nd]
        units = units or ["m"] * nd
        meta = b"".join(struct.pack("<d", 1.0) for _ in range(nd))
        meta += b"".join(_pad(l, ID_LENGTH) for l in labels)
        meta += b"".join(_pad(u, ID_LENGTH) for u in units)
        meta += struct.pack("<i", geometry)
        if npart:
            meta += b"".join(struct.pack("<d", float(coords[:, d].min()))
                             for d in range(nd))
            meta += b"".join(struct.pack("<d", float(coords[:, d].max()))
                             for d in range(nd))
        else:
            meta += b"\x00" * (16 * nd)
        meta += struct.pack("<q", npart)
        data = b"".join(np.ascontiguousarray(coords[:, d]).tobytes()
                        for d in range(nd))
        self._add(bid, name, BT_POINT_MESH, DT_REAL8, nd, meta, data)

    def write_point_variable(self, bid, name, data, mesh_id, units="",
                             mult=1.0):
        arr = np.asarray(data)
        dt = _NP2DT.get(arr.dtype, DT_REAL8)
        arr = np.ascontiguousarray(arr, _DT2NP[dt])
        meta = struct.pack("<d", mult)
        meta += _pad(units, ID_LENGTH)
        meta += _pad(mesh_id, ID_LENGTH)
        meta += struct.pack("<q", arr.shape[0])
        self._add(bid, name, BT_POINT_VARIABLE, dt, 1, meta, arr.tobytes())

    # -- paged point writers (streamed at close(); the dump never holds
    # more than one page of particle data — io/iterators.F90 analogue) --
    def write_point_mesh_paged(self, bid, name, pages_fn, npart, nd,
                               mins, maxs, labels=None, units=None,
                               geometry=1):
        """``pages_fn()`` → iterator of (n_page, nd) float arrays whose
        row total is ``npart``; invoked once per dimension at close()."""
        labels = labels or ["X", "Y", "Z"][:nd]
        units = units or ["m"] * nd
        meta = b"".join(struct.pack("<d", 1.0) for _ in range(nd))
        meta += b"".join(_pad(l, ID_LENGTH) for l in labels)
        meta += b"".join(_pad(u, ID_LENGTH) for u in units)
        meta += struct.pack("<i", geometry)
        if npart:
            meta += b"".join(struct.pack("<d", float(m)) for m in mins)
            meta += b"".join(struct.pack("<d", float(m)) for m in maxs)
        else:
            meta += b"\x00" * (16 * nd)
        meta += struct.pack("<q", int(npart))

        def chunks():
            for d in range(nd):
                got = 0
                for page in pages_fn():
                    page = np.asarray(page)
                    got += page.shape[0]
                    yield np.ascontiguousarray(
                        page[:, d], np.float64).tobytes()
                if got != npart:
                    raise ValueError(
                        f"paged point mesh {bid!r}: pages totalled "
                        f"{got} rows, expected {npart}")
        self._add(bid, name, BT_POINT_MESH, DT_REAL8, nd, meta,
                  ("paged", 8 * int(npart) * nd, chunks))

    def write_point_variable_paged(self, bid, name, pages_fn, npart,
                                   mesh_id, units="", mult=1.0,
                                   dtype=np.float64):
        """``pages_fn()`` → iterator of 1d arrays totalling ``npart``."""
        dt = _NP2DT.get(np.dtype(dtype), DT_REAL8)
        npdt = _DT2NP[dt]
        meta = struct.pack("<d", mult)
        meta += _pad(units, ID_LENGTH)
        meta += _pad(mesh_id, ID_LENGTH)
        meta += struct.pack("<q", int(npart))

        def chunks():
            got = 0
            for page in pages_fn():
                page = np.asarray(page)
                got += page.shape[0]
                yield np.ascontiguousarray(page, npdt).tobytes()
            if got != npart:
                raise ValueError(
                    f"paged point variable {bid!r}: pages totalled "
                    f"{got} rows, expected {npart}")
        self._add(bid, name, BT_POINT_VARIABLE, dt, 1, meta,
                  ("paged", np.dtype(npdt).itemsize * int(npart),
                   chunks))

    def write_constant(self, bid, name, value):
        if isinstance(value, (int, np.integer)):
            dt, data = DT_INTEGER8, struct.pack("<q", int(value))
        else:
            dt, data = DT_REAL8, struct.pack("<d", float(value))
        # constants store the value in the metadata section
        self._add(bid, name, BT_CONSTANT, dt, 1, data, b"")

    def write_namevalue(self, bid, name, mapping: dict):
        names = b"".join(_pad(str(k), STRING_LENGTH) for k in mapping)
        vals = b"".join(struct.pack("<d", float(v)) for v in mapping.values())
        meta = struct.pack("<i", len(mapping)) + names
        self._add(bid, name, BT_NAMEVALUE, DT_REAL8, 1, meta, vals)

    def write_datablock(self, bid, name, payload: bytes, mimetype=""):
        meta = _pad(mimetype, ID_LENGTH)
        self._add(bid, name, BT_DATABLOCK, DT_CHARACTER, 1, meta, payload)

    def write_run_info(self, version=(0, 1, 0), commit_id="", deck_md5="",
                       defines=0, run_date=0):
        """Run provenance block (sdf_write_run_info; the reference embeds
        version, commit string and the compile-defines i8 bitmask,
        diagnostics.F90:395-397 / constants.F90:221-247)."""
        meta = struct.pack("<3i", *version)
        meta += _pad(commit_id, ID_LENGTH)
        meta += _pad(deck_md5, ID_LENGTH)
        meta += struct.pack("<q", int(defines))
        meta += struct.pack("<i", int(run_date))
        self._add("run_info", "Run_info", BT_RUN_INFO, DT_NULL, 1, meta, b"")

    # -- serialisation ----------------------------------------------------
    def close(self):
        block_header_length = 8 + 8 + ID_LENGTH + 8 + 4 + 4 + 4 + STRING_LENGTH
        with open(self.path, "wb") as f:
            header = MAGIC
            header += struct.pack("<i", ENDIANNESS)
            header += struct.pack("<i", SDF_VERSION)
            header += struct.pack("<i", SDF_REVISION)
            header += _pad(self.code_name, ID_LENGTH)
            header += struct.pack("<q", HEADER_LENGTH)   # first_block_location
            header += struct.pack("<q", 0)               # summary_location
            header += struct.pack("<i", 0)               # summary_size
            header += struct.pack("<i", len(self._block_entries))
            header += struct.pack("<i", block_header_length)
            header += struct.pack("<i", int(self.step))
            header += struct.pack("<d", float(self.time))
            header += struct.pack("<i", self.jobid[0])
            header += struct.pack("<i", self.jobid[1])
            header += struct.pack("<i", STRING_LENGTH)
            header += struct.pack("<i", self.code_io_version)
            header += struct.pack("<?", bool(self.restart))
            header += b"\x00"                            # other_domains flag
            assert len(header) == HEADER_LENGTH, len(header)
            f.write(header)

            pos = HEADER_LENGTH
            for e in self._block_entries:
                meta = e["metadata"]
                data = e["data"]
                paged = isinstance(data, tuple) and data[0] == "paged"
                data_len = data[1] if paged else len(data)
                header_len = block_header_length + len(meta)
                data_location = pos + header_len
                next_block = data_location + data_len
                bh = struct.pack("<q", next_block)
                bh += struct.pack("<q", data_location)
                bh += _pad(e["id"], ID_LENGTH)
                bh += struct.pack("<q", data_len)
                bh += struct.pack("<i", e["blocktype"])
                bh += struct.pack("<i", e["datatype"])
                bh += struct.pack("<i", e["ndims"])
                bh += _pad(e["name"], STRING_LENGTH)
                f.write(bh)
                f.write(meta)
                if paged:
                    written = 0
                    for chunk in data[2]():
                        written += len(chunk)
                        f.write(chunk)
                    if written != data_len:
                        raise ValueError(
                            f"paged block {e['id']!r}: streamed "
                            f"{written} bytes, declared {data_len}")
                else:
                    f.write(data)
                pos = next_block


def read(path, dict=True):
    """Read an SDF file → {'Header': {...}, name: Block, ...} (mirrors the
    ``sdf``-python API used by epoch's tests)."""
    out = {}
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:4] != MAGIC:
        raise ValueError(f"{path}: not an SDF file")
    (endianness, version, revision) = struct.unpack_from("<3i", raw, 4)
    code_name = raw[16:48].decode().strip()
    (first_block, _summary, _ssize, nblocks, bhl, step) = \
        struct.unpack_from("<qqiiii", raw, 48)
    (time,) = struct.unpack_from("<d", raw, 80)
    jobid1, jobid2, string_length, io_ver = struct.unpack_from("<4i", raw, 88)
    restart_flag = raw[104] != 0
    out["Header"] = {
        "code_name": code_name, "step": step, "time": time,
        "jobid1": jobid1, "jobid2": jobid2, "restart_flag": restart_flag,
        "version": version, "revision": revision,
    }
    pos = first_block
    blocks = []
    for _ in range(nblocks):
        (next_block, data_loc) = struct.unpack_from("<qq", raw, pos)
        bid = raw[pos + 16:pos + 16 + ID_LENGTH].decode().strip()
        (data_len, btype, dtype, ndims) = struct.unpack_from(
            "<qiii", raw, pos + 16 + ID_LENGTH)
        name_off = pos + 16 + ID_LENGTH + 20
        name = raw[name_off:name_off + string_length].decode().strip()
        meta_off = name_off + string_length
        blk = Block(id=bid, name=name, blocktype=btype, datatype=dtype,
                    ndims=ndims)
        _parse_block(blk, raw, meta_off, data_loc, data_len)
        blocks.append(blk)
        pos = next_block
    # resolve variable → mesh links
    by_id = {b.id: b for b in blocks}
    for b in blocks:
        mesh_id = b.meta.get("mesh_id")
        if mesh_id and mesh_id in by_id:
            b.meta["_grid"] = by_id[mesh_id]
    for b in blocks:
        out[b.name] = b
    return out


def _parse_block(blk, raw, meta_off, data_loc, data_len):
    nd = blk.ndims
    p = meta_off
    if blk.blocktype in (BT_PLAIN_MESH, BT_POINT_MESH):
        p += 8 * nd                       # mults
        labels = [raw[p + i * ID_LENGTH:p + (i + 1) * ID_LENGTH].decode().strip()
                  for i in range(nd)]
        p += ID_LENGTH * nd
        units = [raw[p + i * ID_LENGTH:p + (i + 1) * ID_LENGTH].decode().strip()
                 for i in range(nd)]
        p += ID_LENGTH * nd
        (geometry,) = struct.unpack_from("<i", raw, p)
        p += 4
        p += 16 * nd                      # min/max
        blk.meta.update(labels=labels, units=units, geometry=geometry)
        if blk.blocktype == BT_PLAIN_MESH:
            dims = struct.unpack_from(f"<{nd}i", raw, p)
            axes = []
            off = data_loc
            for n in dims:
                axes.append(np.frombuffer(raw, np.float64, n, off).copy())
                off += 8 * n
            blk.data = tuple(axes)
            blk.meta["dims"] = dims
        else:
            (npart,) = struct.unpack_from("<q", raw, p)
            coords = []
            off = data_loc
            for _ in range(nd):
                coords.append(np.frombuffer(raw, np.float64, npart, off).copy())
                off += 8 * npart
            blk.data = tuple(coords)
            blk.meta["npart"] = npart
    elif blk.blocktype in (BT_PLAIN_VARIABLE, BT_PLAIN_DERIVED):
        (mult,) = struct.unpack_from("<d", raw, p)
        p += 8
        units = raw[p:p + ID_LENGTH].decode().strip()
        p += ID_LENGTH
        mesh_id = raw[p:p + ID_LENGTH].decode().strip()
        p += ID_LENGTH
        dims = struct.unpack_from(f"<{nd}i", raw, p)
        p += 4 * nd
        (stagger,) = struct.unpack_from("<i", raw, p)
        npdt = _DT2NP[blk.datatype]
        count = int(np.prod(dims))
        flat = np.frombuffer(raw, npdt, count, data_loc)
        blk.data = flat.reshape(dims, order="F").copy()
        blk.meta.update(mult=mult, units=units, mesh_id=mesh_id,
                        dims=dims, stagger=stagger)
    elif blk.blocktype in (BT_POINT_VARIABLE, BT_POINT_DERIVED):
        (mult,) = struct.unpack_from("<d", raw, p)
        p += 8
        units = raw[p:p + ID_LENGTH].decode().strip()
        p += ID_LENGTH
        mesh_id = raw[p:p + ID_LENGTH].decode().strip()
        p += ID_LENGTH
        (npart,) = struct.unpack_from("<q", raw, p)
        npdt = _DT2NP[blk.datatype]
        blk.data = np.frombuffer(raw, npdt, npart, data_loc).copy()
        blk.meta.update(mult=mult, units=units, mesh_id=mesh_id, npart=npart)
    elif blk.blocktype == BT_CONSTANT:
        if blk.datatype == DT_INTEGER8:
            (blk.data,) = struct.unpack_from("<q", raw, meta_off)
        else:
            (blk.data,) = struct.unpack_from("<d", raw, meta_off)
    elif blk.blocktype == BT_NAMEVALUE:
        (n,) = struct.unpack_from("<i", raw, p)
        p += 4
        names = [raw[p + i * STRING_LENGTH:p + (i + 1) * STRING_LENGTH]
                 .decode().strip() for i in range(n)]
        vals = np.frombuffer(raw, np.float64, n, data_loc)
        blk.data = {k: float(v) for k, v in zip(names, vals)}
    elif blk.blocktype == BT_DATABLOCK:
        blk.meta["mimetype"] = raw[p:p + ID_LENGTH].decode().strip()
        blk.data = raw[data_loc:data_loc + data_len]
    elif blk.blocktype == BT_RUN_INFO:
        version = struct.unpack_from("<3i", raw, p)
        p += 12
        commit_id = raw[p:p + ID_LENGTH].decode().strip()
        p += ID_LENGTH
        deck_md5 = raw[p:p + ID_LENGTH].decode().strip()
        p += ID_LENGTH
        defines = 0
        run_date = 0
        if p + 12 <= len(raw):       # extended layout (defines + run date)
            (defines,) = struct.unpack_from("<q", raw, p)
            (run_date,) = struct.unpack_from("<i", raw, p + 8)
        blk.data = {"version": version, "commit_id": commit_id,
                    "deck_md5": deck_md5, "defines": defines,
                    "run_date": run_date}
        blk.meta.update(blk.data)
    # other blocktypes: keep raw
    else:
        blk.data = raw[data_loc:data_loc + data_len]
