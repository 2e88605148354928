#!/usr/bin/env python
"""Micro-benchmark the fused push kernel in isolation.

Freezes the field windows at a steady-state LWFA snapshot and scans ONLY
push_deposit_pallas for N iterations (the slot state threads through the
scan, so nothing is constant-folded; fields/window/BC feedback is
frozen).  Ablation diffs against this are clean VPU-phase costs —
ablated full RUNS are population-poisoned and segment timings drown in
the ~100 ms fixed tunnel overhead."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("EPOCH_TPU_X64", "0")

import jax
import jax.numpy as jnp

import bench


def main():
    from epoch_tpu.core.step import make_full_step
    from epoch_tpu.core import binned as binmod

    iters = int(os.environ.get("MICRO_ITERS", 200))
    abls = os.environ.get(
        "ABLATIONS", ",nodeposit,nopush,norebin,nocompact,nogather"
    ).split(",")

    cfg, st = bench.setup()
    os.environ["EPOCH_TPU_KERNEL_ABLATE"] = ""
    run_full = make_full_step(cfg)
    st = run_full(st, int(os.environ.get("ABLATE_WARM", 300)))
    bench.sync(st)

    plan = binmod.BinnedPlan(cfg)
    fpad = binmod.make_fpad(st.fields, cfg.grid)

    for ab in abls:
        os.environ["EPOCH_TPU_KERNEL_ABLATE"] = ab
        engines = binmod.make_pallas_engines(cfg, plan)
        assert all(e is not None for e in engines), "fused path inactive"
        fwin = engines[0].make_fwin(fpad)
        sh = jnp.ones((), jnp.int32) * 0

        def body(species, _):
            out = []
            for si, b in enumerate(species):
                nb, _j, _e = engines[si](fwin, b, shift=sh)
                out.append(nb)
            return tuple(out), None

        scan = jax.jit(lambda sp: jax.lax.scan(body, sp, None,
                                               length=iters)[0])
        sp0 = tuple(jax.tree.map(lambda a: a + 0, s) for s in st.species)
        r = scan(sp0)
        jax.block_until_ready(r)
        import numpy as np
        float(np.asarray(r[0].w).ravel()[0])      # honest fence
        sp0 = tuple(jax.tree.map(lambda a: a + 0, s) for s in st.species)
        t0 = time.perf_counter()
        r = scan(sp0)
        float(np.asarray(r[0].w).ravel()[0])
        dt = time.perf_counter() - t0
        print(json.dumps({"ablate": ab,
                          "kernel_ms_per_step": 1e3 * dt / iters}))


if __name__ == "__main__":
    main()
