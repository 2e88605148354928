#!/usr/bin/env python
"""Dump the optimized HLO of the bench chunk step and summarise the
instructions the trace flags as hot (copies, broadcasts, pad/maximum
fusions, dynamic-update-slices) with their shapes."""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("EPOCH_TPU_X64", "0")

import jax

import bench


def main():
    from epoch_tpu.core.step import make_full_step
    cfg, st = bench.setup()
    run_n = make_full_step(cfg)
    # make_full_step dispatches jitted chunk bodies; grab the jitted fn
    import epoch_tpu.core.step as stepmod
    fn = run_n.chunk_fn
    txt = fn.lower(st).compile().as_text()
    out = os.environ.get("HLO_OUT", "/tmp/chunk.hlo")
    with open(out, "w") as f:
        f.write(txt)
    pats = re.compile(
        r"^\s*%?(copy[.\d]*|broadcast[.\d]*|pad_maximum_fusion[.\d]*|"
        r"dynamic-update-slice[.\d]*|slice[.\d]*|fusion[.\d]*) = ")
    n = 0
    for line in txt.splitlines():
        ls = line.strip()
        m = re.match(r"%?([\w.\-]+) = (\S+) (copy|broadcast|pad|"
                     r"dynamic-update-slice|slice|fusion)\(", ls)
        if m and ("f32[" in m.group(2) or "s32[" in m.group(2)):
            shape = m.group(2)
            # only big arrays (>= 1 MB)
            dims = re.findall(r"\[([\d,]*)\]", shape)
            if dims:
                try:
                    sz = 1
                    for d in dims[0].split(","):
                        if d:
                            sz *= int(d)
                    if sz * 4 < 1 << 20:
                        continue
                except ValueError:
                    continue
            print(ls[:220])
            n += 1
            if n > 120:
                break
    print(f"full HLO written to {out}")


if __name__ == "__main__":
    main()
