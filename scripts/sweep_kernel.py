#!/usr/bin/env python
"""Sweep fused-kernel tuning knobs (ROW_BLOCK, BX) on the bench deck.

Each point runs in a subprocess (kernel rebuild); honest transfer-fenced
timing via bench.main.  Run on an IDLE host only."""
import itertools
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    rbs = os.environ.get("SWEEP_RB", "4,6,9,18").split(",")
    bxs = os.environ.get("SWEEP_BX", "8,16").split(",")
    for rb, bx in itertools.product(rbs, bxs):
        env = dict(os.environ)
        env["EPOCH_TPU_ROW_BLOCK"] = rb
        env["EPOCH_TPU_BX"] = bx
        env.setdefault("BENCH_STEPS", "600")
        out = subprocess.run([sys.executable,
                              os.path.join(HERE, "bench.py")],
                             env=env, capture_output=True, text=True)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        print(f"RB={rb} BX={bx}",
              line[-1] if line else f"FAILED: {out.stderr[-300:]}")


if __name__ == "__main__":
    main()
