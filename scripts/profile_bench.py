#!/usr/bin/env python
"""Profile the bench step: per-op device times from a jax.profiler trace.

Uses bench.setup() so the profiled configuration (deck, pre-phase,
after-move BCs) is exactly what bench.py times.  Writes the trace under
/tmp/epoch_prof and prints a sorted per-op summary parsed from the trace
events (works through the axon tunnel).
"""
import glob
import gzip
import json
import os
import sys
import collections

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("EPOCH_TPU_X64", "0")

import jax

import bench


def main():
    from epoch_tpu.core.step import make_full_step
    cfg_bench, st = bench.setup()
    run_n = make_full_step(cfg_bench)
    st = run_n(st, 200)   # warm up + reach moving-window steady state
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
    cat_tot = collections.Counter()
    import re
    for p in paths:
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        for e in data.get("traceEvents", []):
            if e.get("ph") != "X":
                continue
            name = e.get("name", "")
            dur = e.get("dur", 0)
            ev_tot[name] += dur
            ev_cnt[name] += 1
            if re.match(r"(jit_|while|\$|PjitF)", name):
                continue
            cat_tot[re.sub(r"[.\d-]+$", "", name)] += dur
    print("=== by category (device ops only) ===")
    for name, us in cat_tot.most_common(25):
        print(f"{us:10.0f}  {name}")
    print(f"{'us_total':>10} {'count':>6}  name")
    for name, us in ev_tot.most_common(80):
        print(f"{us:10.0f} {ev_cnt[name]:6d}  {name[:110]}")


if __name__ == "__main__":
    main()
