#!/usr/bin/env python
"""Profile the bench step: per-op device times from a jax.profiler trace.

Writes the trace under /tmp/epoch_prof and prints a sorted per-op summary
parsed from the trace events (works through the axon tunnel).
"""
import glob
import gzip
import json
import os
import sys
import tempfile
import collections

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("EPOCH_TPU_X64", "0")

import jax

import bench


def main():
    nx = int(os.environ.get("BENCH_NX", 256))
    ny = int(os.environ.get("BENCH_NY", 256))
    ppc = int(os.environ.get("BENCH_PPC", 8))
    mode = os.environ.get("BENCH_MODE", "lwfa")

    d = tempfile.mkdtemp()
    with open(os.path.join(d, "input.deck"), "w") as f:
        if mode == "lwfa":
            cell = 5.0e-8
            ly = ny * cell
            f.write(bench.DECK_LWFA.format(nx=nx, ny=ny, ppc=ppc,
                                           lx=nx * cell, ly=ly,
                                           yc=0.5 * ly, w0=0.25 * ly,
                                           x0=0.25 * nx * cell))
        else:
            cell = 2.0e-8
            f.write(bench.DECK.format(nx=nx, ny=ny, ppc=ppc,
                                      lx=nx * cell, ly=ny * cell))
    from epoch_tpu.core import Simulation
    from epoch_tpu.core.step import make_full_step
    sim = Simulation(os.path.join(d, "input.deck"))
    run_n = make_full_step(sim.cfg)
    st = run_n(sim.state, 200)   # warm up + reach steady state
    jax.block_until_ready(st.fields.ex)

    logdir = "/tmp/epoch_prof"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        st = run_n(st, 30)
        jax.block_until_ready(st.fields.ex)

    # parse trace
    paths = glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz")
    ev_tot = collections.Counter()
    ev_cnt = collections.Counter()
    for p in paths:
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        for e in data.get("traceEvents", []):
            if e.get("ph") != "X":
                continue
            pid_name = e.get("pid")
            name = e.get("name", "")
            dur = e.get("dur", 0)
            # device-side compute lanes only: heuristic — XLA op names
            args = e.get("args", {})
            if not isinstance(args, dict):
                args = {}
            lk = args.get("long_name") or name
            if "run_id" in str(args) or True:
                ev_tot[name] += dur
                ev_cnt[name] += 1
    total = sum(ev_tot.values())
    print(f"{'us_total':>10} {'count':>6}  name")
    for name, us in ev_tot.most_common(60):
        print(f"{us:10.0f} {ev_cnt[name]:6d}  {name[:110]}")


if __name__ == "__main__":
    main()
