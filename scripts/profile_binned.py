#!/usr/bin/env python
"""Micro-profile of the binned engine phases on the current backend."""
import os
import sys
import time
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("EPOCH_TPU_X64", "0")

import jax
import jax.numpy as jnp

from bench import DECK


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    nx = int(os.environ.get("BENCH_NX", 256))
    ny = int(os.environ.get("BENCH_NY", 256))
    ppc = int(os.environ.get("BENCH_PPC", 8))
    d = tempfile.mkdtemp()
    cell = 2.0e-8
    with open(os.path.join(d, "input.deck"), "w") as f:
        f.write(DECK.format(nx=nx, ny=ny, ppc=ppc,
                            lx=nx * cell, ly=ny * cell))
    from epoch_tpu.core import Simulation, binned as binmod
    from epoch_tpu.core import step as step_mod
    sim = Simulation(os.path.join(d, "input.deck"))
    cfg = sim.cfg
    st = sim.state
    print("engine:", cfg.engine, " K:", cfg.bin_k)

    fns = step_mod.make_step_functions(cfg)
    full = jax.jit(lambda s: fns["step_b_raw"](fns["step_a_raw"](s)))
    print(f"full step      : {timeit(full, st)*1e3:7.3f} ms")

    bplan = binmod.BinnedPlan(cfg)
    grid = cfg.grid
    interior = {nm: grid.interior(getattr(st.fields, nm))
                for nm in ("ex", "ey", "ez", "bx", "by", "bz")}
    b0 = st.species[0]

    pd = jax.jit(lambda f, b: binmod.push_deposit_binned(
        f, b, cfg.species[0], bplan))
    print(f"push+dep+rebin : {timeit(pd, interior, b0)*1e3:7.3f} ms "
          f"(one species)")

    rb = jax.jit(lambda b: binmod.rebin(b, bplan))
    print(f"rebin alone    : {timeit(rb, b0)*1e3:7.3f} ms (one species)")

    fh = jax.jit(fns["fields_half"])
    print(f"fields_half    : {timeit(fh, st)*1e3:7.3f} ms")

    pa = jax.jit(fns["push_all"])
    print(f"push_all       : {timeit(pa, st)*1e3:7.3f} ms (all species)")


if __name__ == "__main__":
    main()
