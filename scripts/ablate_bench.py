#!/usr/bin/env python
"""Time the bench step under kernel-phase ablations (EPOCH_TPU_KERNEL_ABLATE).

Results under ablation are numerically WRONG — timing only.  Run each
ablation in a subprocess so the kernel is rebuilt."""
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time, json
sys.path.insert(0, %r)
os.environ.setdefault("EPOCH_TPU_X64", "0")
import jax
import bench
from epoch_tpu.core.step import make_full_step
cfg, st = bench.setup()
run_n = make_full_step(cfg)
steps = int(os.environ.get("BENCH_STEPS", 200))
st = run_n(st, steps)
bench.sync(st)
t0 = time.perf_counter()
st = run_n(st, steps)
bench.sync(st)
dt = time.perf_counter() - t0
print(json.dumps({"ablate": os.environ.get("EPOCH_TPU_KERNEL_ABLATE", ""),
                  "ms_per_step": 1e3 * dt / steps}))
""" % (HERE,)


def main():
    abls = os.environ.get(
        "ABLATIONS", ",nodeposit,nopush,norebin,nogather").split(",")
    for ab in abls:
        env = dict(os.environ)
        env["EPOCH_TPU_KERNEL_ABLATE"] = ab
        out = subprocess.run([sys.executable, "-c", CHILD], env=env,
                             capture_output=True, text=True)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        print(line[-1] if line else f"FAILED {ab}: {out.stderr[-500:]}")


if __name__ == "__main__":
    main()
