#!/usr/bin/env python
"""Benchmark: particle pushes/sec/chip on a 2D plasma deck.

Prints ONE JSON line {"metric","value","unit","vs_baseline"}.
Baseline (BASELINE.json): 1e9 particle-pushes/sec/chip target on TPU v5p.
"""
import json
import os
import sys
import time
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("EPOCH_TPU_X64", "0")   # single precision for perf

DECK = """
begin:control
  precision = single
  bin_headroom = 1.5
  nx = {nx}
  ny = {ny}
  t_end = 1.0
  x_min = 0
  x_max = {lx}
  y_min = 0
  y_max = {ly}
end:control
begin:boundaries
  bc_x_min = periodic
  bc_x_max = periodic
  bc_y_min = periodic
  bc_y_max = periodic
end:boundaries
begin:constant
  den = 1.0e24
end:constant
begin:species
  name = electron
  charge = -1
  mass = 1.0
  number_density = den
  nparticles_per_cell = {ppc}
  temperature_ev = 1000
end:species
begin:species
  name = proton
  charge = 1
  mass = 1836.2
  number_density = den
  nparticles_per_cell = {ppc}
  temperature_ev = 100
end:species
begin:output
  dt_snapshot = 1
end:output
"""


def main():
    import jax
    from epoch_tpu.core import Simulation
    from epoch_tpu.core.step import make_full_step

    nx = int(os.environ.get("BENCH_NX", 256))
    ny = int(os.environ.get("BENCH_NY", 256))
    ppc = int(os.environ.get("BENCH_PPC", 8))
    steps = int(os.environ.get("BENCH_STEPS", 50))

    d = tempfile.mkdtemp()
    cell = 2.0e-8
    with open(os.path.join(d, "input.deck"), "w") as f:
        f.write(DECK.format(nx=nx, ny=ny, ppc=ppc,
                            lx=nx * cell, ly=ny * cell))
    sim = Simulation(os.path.join(d, "input.deck"))

    def count(s):
        if hasattr(s, "alive"):
            return int(s.alive.sum())
        return int((s.w > 0).sum())
    npart = sum(count(s) for s in sim.state.species)

    run_n = make_full_step(sim.cfg)
    # warmup with the same step count (single compile of the scanned step)
    st = run_n(sim.state, steps)
    jax.block_until_ready(st.fields.ex)
    t0 = time.perf_counter()
    st = run_n(st, steps)
    jax.block_until_ready(st.fields.ex)
    dt_wall = time.perf_counter() - t0

    pushes_per_sec = npart * steps / dt_wall
    baseline = 1e9
    print(json.dumps({
        "metric": "particle_pushes_per_sec_per_chip",
        "value": pushes_per_sec,
        "unit": "pushes/s",
        "vs_baseline": pushes_per_sec / baseline,
    }))


if __name__ == "__main__":
    main()
