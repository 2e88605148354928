"""Build/version metadata embedded into dumps.

The reference encodes the active compile-time defines into an i8 bitmask
(constants.F90:221-247) and the git commit string
(version_data.F90 via gen_commit_string.sh) into every SDF run_info
block (diagnostics.F90:395-397).  Here the defines are runtime deck
options, so the bitmask is computed from the resolved SimConfig with the
SAME bit assignments, keeping dump-side compatibility for tools that
inspect it.
"""
from __future__ import annotations

import functools
import subprocess

from .. import constants as const

VERSION = (0, 2, 0)

# reference bit values (constants.F90:221-247)
DEF_PARTICLE_SHAPE_BSPLINE3 = 1 << 2
DEF_SPLIT_PART_AFTER_PUSH = 1 << 3
DEF_PER_PARTICLE_WEIGHT = 1 << 4
DEF_ZERO_CURRENT_PARTICLES = 1 << 6
DEF_PARTICLE_PROBES = 1 << 7
DEF_PARTICLE_IONISE = 1 << 9
DEF_PARTICLE_SHAPE_TOPHAT = 1 << 11
DEF_PARTICLE_ID = 1 << 14
DEF_PHOTONS = 1 << 15
DEF_TRIDENT_PHOTONS = 1 << 16
DEF_DELTAF_METHOD = 1 << 20
DEF_WORK_DONE_INTEGRATED = 1 << 22
DEF_HC_PUSH = 1 << 23
DEF_BREMSSTRAHLUNG = 1 << 26


@functools.lru_cache(maxsize=1)
def git_commit() -> str:
    """Short commit id of the framework checkout ('' if unavailable)."""
    try:
        import os
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        out = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=here,
            capture_output=True, text=True, timeout=5)
        return out.stdout.strip() if out.returncode == 0 else ""
    except Exception:
        return ""


def defines_bitmask(cfg) -> int:
    """Runtime-options bitmask with the reference's bit layout; the
    reference's compile-time gates are deck keys here, so the mask
    reflects what this RUN actually enabled."""
    mask = DEF_PER_PARTICLE_WEIGHT        # always per-particle weights
    shape = cfg.grid.shape_fn
    if shape == const.Shape.BSPLINE3:
        mask |= DEF_PARTICLE_SHAPE_BSPLINE3
    elif shape == const.Shape.TOPHAT:
        mask |= DEF_PARTICLE_SHAPE_TOPHAT
    if any(sp.zero_current for sp in cfg.species):
        mask |= DEF_ZERO_CURRENT_PARTICLES
    if cfg.probe_plans:
        mask |= DEF_PARTICLE_PROBES
    if cfg.ionise_plan is not None:
        mask |= DEF_PARTICLE_IONISE
    if cfg.qed_plan is not None:
        mask |= DEF_PHOTONS
        if getattr(cfg.qed_plan, "use_trident", False):
            mask |= DEF_TRIDENT_PHOTONS
    if cfg.brem_plan is not None:
        mask |= DEF_BREMSSTRAHLUNG
    if cfg.split_plan is not None:
        mask |= DEF_SPLIT_PART_AFTER_PUSH
    if any(sp.deltaf for sp in cfg.species):
        mask |= DEF_DELTAF_METHOD
    if cfg.use_higuera_cary:
        mask |= DEF_HC_PUSH
    if getattr(cfg, "work_done_integrated", False):
        mask |= DEF_WORK_DONE_INTEGRATED
    mask |= DEF_PARTICLE_ID               # lazy int64 ids always available
    return mask
