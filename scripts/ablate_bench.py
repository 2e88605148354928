#!/usr/bin/env python
"""Time the bench step under kernel-phase ablations (EPOCH_TPU_KERNEL_ABLATE).

Ablated kernels produce WRONG physics, which feeds back into the particle
population and poisons naive ablated RUNS.  Instead: run the FULL step to
steady state once, snapshot, then time each ablated step over a short
segment from that same snapshot (population drift over the segment is
~1%).  The ablation env var is read at kernel trace time, so each variant
builds its own step functions in-process."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("EPOCH_TPU_X64", "0")

import jax

import bench


def main():
    from epoch_tpu.core.step import make_full_step
    warm = int(os.environ.get("ABLATE_WARM", 300))
    seg = int(os.environ.get("ABLATE_SEG", 60))
    abls = os.environ.get(
        "ABLATIONS", ",nodeposit,nopush,norebin,nocompact,nogather"
    ).split(",")

    cfg, st = bench.setup()
    os.environ["EPOCH_TPU_KERNEL_ABLATE"] = ""
    run_full = make_full_step(cfg)
    st = run_full(st, warm)
    bench.sync(st)
    snap = jax.tree.map(lambda a: a + 0, st)   # private copy (donation!)

    for ab in abls:
        os.environ["EPOCH_TPU_KERNEL_ABLATE"] = ab
        run_ab = make_full_step(cfg)
        s = jax.tree.map(lambda a: a + 0, snap)
        s = run_ab(s, seg)          # compile + warm the variant
        bench.sync(s)
        s = jax.tree.map(lambda a: a + 0, snap)
        t0 = time.perf_counter()
        s = run_ab(s, seg)
        bench.sync(s)
        dt = time.perf_counter() - t0
        print(json.dumps({"ablate": ab, "ms_per_step": 1e3 * dt / seg}))


if __name__ == "__main__":
    main()
