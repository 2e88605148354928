"""Source embedding for restart dumps (reproducibility).

The reference packs the full source tree (gzip + base64, ``src/pack.py``)
into a Fortran module compiled into the binary, and writes it into every
restart dump (``epoch_write_source_info``, diagnostics.F90:3412); the
companion ``unpack_source_from_restart`` shell script extracts it.  Here
the tarball is built lazily at first dump from the installed ``epoch_tpu``
package tree plus the repo-root entry points, embedded as an SDF datablock
(block id ``source_code``), and extracted by
``scripts/unpack_source_from_restart.py``.
"""
from __future__ import annotations

import functools
import gzip
import io
import os
import tarfile

_EXTS = (".py", ".md", ".deck", ".toml", ".cfg", ".txt")


@functools.lru_cache(maxsize=1)
def source_tarball() -> bytes:
    """Deterministic gzipped tar of the epoch_tpu source tree.

    Deterministic (zeroed mtimes/uids, sorted member order, gzip mtime=0)
    so repeated dumps of the same tree are byte-identical.
    """
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = os.path.dirname(pkg)
    paths = []
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(_EXTS):
                paths.append(os.path.join(dirpath, fn))
    # repo-root entry points that define the run surface
    for fn in ("bench.py", "__graft_entry__.py"):
        p = os.path.join(base, fn)
        if os.path.exists(p):
            paths.append(p)
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        with tarfile.open(fileobj=gz, mode="w") as tf:
            for p in paths:
                with open(p, "rb") as f:
                    data = f.read()
                ti = tarfile.TarInfo(os.path.relpath(p, base))
                ti.size = len(data)
                ti.mtime = 0
                ti.uid = ti.gid = 0
                ti.uname = ti.gname = ""
                tf.addfile(ti, io.BytesIO(data))
    return buf.getvalue()
