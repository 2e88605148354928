"""Particle probes (io/probes.F90 + detection in particles.F90:518-557).

A probe is a plane (point, normal); any particle of an attached species
whose kinetic energy lies in [ek_min, ek_max] and which crosses the plane
inward (d_init ≥ 0 → d_final < 0) during a step is copied into the probe's
capture buffer, dumped as point data.

TPU design: detection is a masked append into a fixed-capacity slab after
the push (scatter engine).
"""
from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from .. import constants as const
from .slab_ops import append_particles
from .state import empty_slab


class ProbePlan:
    def __init__(self, pb, cfg, deck, cap):
        self.name = pb.name
        nd = cfg.ndims
        self.point = np.array((pb.point + [0.0] * 3)[:nd])
        normal = np.array((pb.normal + [0.0] * 3)[:nd])
        n = np.linalg.norm(normal)
        self.normal = normal / n if n > 0 else normal
        self.ek_min = pb.ek_min
        self.ek_max = pb.ek_max
        self.species = [deck.species_index(s) for s in pb.include_species]
        self.cap = cap
        self.dumpmask = pb.dumpmask


def build_probe_plans(cfg, deck):
    plans = []
    for pb in deck.probes:
        cap = 0
        for s in pb.include_species:
            cap += cfg.species[deck.species_index(s)].cap
        cap = max(cap, 1024)
        plans.append(ProbePlan(pb, cfg, deck, cap))
    return tuple(plans)


def init_probe_buffers(cfg, dtype):
    return tuple(empty_slab(p.cap, cfg.ndims, dtype)
                 for p in cfg.probe_plans)


def capture(probe_buf, plan: ProbePlan, sp_cfg, x_old, slab):
    """Append particles that crossed the probe plane this step
    (particles.F90:518-557)."""
    mc = sp_cfg.mass * const.c
    if sp_cfg.species_type == const.SpeciesType.PHOTON:
        ek = const.c * jnp.sqrt(jnp.sum(slab.p ** 2, axis=1))
    else:
        # normalise BEFORE squaring: p² in kg²m²/s² (~1e-45 for thermal
        # electrons) underflows single precision
        u2 = jnp.sum((slab.p / mc) ** 2, axis=1)
        gamma = jnp.sqrt(1.0 + u2)
        ek = u2 / (gamma + 1.0) * sp_cfg.mass * const.c ** 2
    normal = jnp.asarray(plan.normal, slab.x.dtype)
    point = jnp.asarray(plan.point, slab.x.dtype)
    d_init = jnp.sum(normal * (point[None, :] - x_old), axis=1)
    d_final = jnp.sum(normal * (point[None, :] - slab.x), axis=1)
    # weight>0 excludes the loader's zero-weight placeholder particles
    # (zero-density cells) — the reference never instantiates those
    fire = slab.alive & (slab.weight > 0) \
        & (ek > plan.ek_min) & (ek < plan.ek_max) \
        & (d_final < 0.0) & (d_init >= 0.0)
    # (buf, n_dropped): buffer-overflow crossings are counted — the
    # reference's dynamic list keeps every crossing (probes.F90:107)
    return append_particles(probe_buf, slab.x, slab.p, slab.weight, fire,
                            with_count=True)
