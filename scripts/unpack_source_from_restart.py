#!/usr/bin/env python
"""Extract the embedded source tarball from a restart SDF dump.

Analogue of the reference's ``unpack_source_from_restart`` shell script
(epoch2d/unpack_source_from_restart): every restart dump carries the full
framework source as a gzipped tar datablock for reproducibility.

Usage: unpack_source_from_restart.py <restart.sdf> [<outdir>]
"""
import io
import os
import sys
import tarfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    path = sys.argv[1]
    outdir = sys.argv[2] if len(sys.argv) > 2 else "."
    from epoch_tpu.io import sdf
    d = sdf.read(path)
    blk = d.get("Source Code/epoch_tpu")
    if blk is None:
        sys.exit(f"{path}: no embedded source datablock "
                 "(not a restart dump, or written with embed_source=False)")
    with tarfile.open(fileobj=io.BytesIO(blk.data), mode="r:gz") as tf:
        tf.extractall(outdir, filter="data")
        names = tf.getnames()
    print(f"extracted {len(names)} files to {outdir}")
    deck = d.get("Input Deck")
    if deck is not None:
        dp = os.path.join(outdir, "input.deck.from_restart")
        with open(dp, "wb") as f:
            f.write(deck.data)
        print(f"wrote {dp}")


if __name__ == "__main__":
    main()
