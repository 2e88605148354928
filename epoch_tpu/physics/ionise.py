"""Field ionisation (physics_packages/ionise.F90).

ADK tunnelling with optional barrier-suppression (BSI) and multiphoton
regimes, chained across ionisation levels.  Rate constants are precomputed
per species exactly as ``initialise_ionisation`` (ionise.F90:51-250), in
atomic units:

* ``adk_scaling  = 2 (2 I_H)^{3/2}``         (I_H = E_ion/hartree)
* ``ionisation_constant = sqrt(6/π) I_H 2^{2n*} / (n* Γ(2n*))``
* rate(E) = C (s/E)^{2n*-1.5} exp(-s/(3E)) (b√(s/E) e^{s/E} K_{l+1/2}(s/E) − 1)

where the half-integer Bessel K has closed forms.  Ionisation events kill
the ion in its level slab, append it to the next level and release an
electron carrying the mass-fraction momentum split (ionise.F90:768-812).

TPU design: fully vectorised per level; within-step multi-level chaining is
approximated by up to ``CHAIN`` unrolled sub-iterations with the
time-remaining bookkeeping of the reference's inverse-sampling loop.
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants as const
from ..core.slab_ops import append_particles

CHAIN = 2           # unrolled within-step ionisation levels
# bessel_constant = sqrt(8/π) (ionise.F90:28); note
# sqrt(8/π)·sqrt(s)·e^s·K_{l+1/2}(s) = 2·P_l(1/s) analytically, which is how
# the Bessel factor is evaluated here (no overflow for large s)
ION_EXPONENT = -1.0 / 3.0


class IonisePlan:
    """Per-level static constants (initialise_ionisation)."""

    def __init__(self, cfg, deck):
        self.levels = []          # list of dicts
        for i, sp in enumerate(deck.species):
            if not getattr(sp, "ionise", False):
                continue
            self.levels.append(self._level(cfg, deck, i, sp))

    def _level(self, cfg, deck, i, sp):
        e_ion = sp.ionisation_energy
        ih = e_ion / const.hartree
        next_idx = deck.species_index(sp.ionise_to_species_name)
        rel_idx = deck.species_index(sp.release_species_name)
        next_charge_ev = cfg.species[next_idx].charge / const.ev
        n_star = next_charge_ev / math.sqrt(2.0 * ih)
        adk_scaling = 2.0 * math.sqrt((2.0 * ih) ** 3)
        ion_const = math.sqrt(6.0 / math.pi) * ih * 2.0 ** (2.0 * n_star) \
            / (n_star * math.gamma(2.0 * n_star))
        l = getattr(sp, "l_quantum", 0)
        rel_mass_frac = cfg.species[rel_idx].mass / cfg.species[i].mass
        out = dict(
            species=i, to=next_idx, release=rel_idx,
            e_ion=e_ion,
            adk_scaling=adk_scaling,
            ion_const=ion_const,
            n_exp=2.0 * n_star - 1.5,
            l=l,
            rel_mass_frac=rel_mass_frac,
        )
        if deck.control.use_bsi:
            bsi_const = ih * math.sqrt(2.0 * ih) / (2.0 * math.pi
                                                    * next_charge_ev)
            bsi_scaling = ih ** 2 / (4.0 * next_charge_ev)
            bsi_threshold = next_charge_ev ** 3 / (2.0 * n_star) ** 4
            cap = _adk_rate_scalar(out, bsi_threshold)
            out.update(bsi_const=bsi_const, bsi_scaling=bsi_scaling,
                       bsi_threshold=bsi_threshold, adk_bsi_cap=cap)
        return out


def _bessel_poly(l, inv_x):
    """P_l(1/x) with K_{l+1/2}(x) = sqrt(π/2x)·e^{-x}·P_l(1/x), l = 0..3."""
    if l == 0:
        return 1.0 + 0.0 * inv_x
    if l == 1:
        return 1.0 + inv_x
    if l == 2:
        return 1.0 + 3.0 * inv_x + 3.0 * inv_x ** 2
    return 1.0 + 6.0 * inv_x + 15.0 * inv_x ** 2 + 15.0 * inv_x ** 3


def _adk_rate_scalar(lv, e_mag):
    return float(adk_rate(lv, np.float64(e_mag), xp=np))


def adk_rate(lv, e_mag, xp=jnp):
    """ADK tunnelling rate in atomic units (ionise.F90:743-751):
    rate = C (s)^{2n*-1.5} e^{-s/3} (√(8/π)√s e^s K_{l+1/2}(s) − 1)
    with s = adk_scaling/E; the Bessel factor is 2·P_l(1/s) exactly."""
    s = lv["adk_scaling"] / xp.maximum(e_mag, 1e-300)
    bes = 2.0 * _bessel_poly(lv["l"], 1.0 / s) - 1.0
    rate = lv["ion_const"] * s ** lv["n_exp"] \
        * xp.exp(ION_EXPONENT * xp.minimum(s, 2000.0)) * bes
    if "bsi_const" in lv:
        # BSI regime above the threshold field (ionise.F90:480-505)
        bsi = lv["bsi_const"] * (1.0 - lv["bsi_scaling"]
                                 / xp.maximum(e_mag, 1e-300))
        use_bsi = e_mag > lv["bsi_threshold"]
        rate = xp.where(use_bsi, xp.maximum(bsi, 0.0),
                        xp.minimum(rate, lv.get("adk_bsi_cap", rate)))
    return xp.where(e_mag > 1e-300, xp.maximum(rate, 0.0), 0.0)


def madelung_nl(n_electrons: int):
    """Ground-state (n, l) of the outermost electron by Madelung filling
    (create_ionisation_species_from_name, deck_species_block.F90:1252-1266)."""
    n = 0
    i = 0
    l = 0
    while n_electrons > i:
        n += 1
        for l in range((n - 1) // 2, -1, -1):
            i += 4 * l + 2
            if n_electrons <= i:
                n = n - l
                break
    return n, l


def _ionise_binned(state, cfg, plan: IonisePlan, key):
    """Field ionisation on the binned (slot-grid) engine: the ADK/BSI rate
    math is identical; the gather is the slot-grid roll gather and the
    level promotion/electron release are cell-local candidate merges
    (binned.merge_candidates) — created particles always land in the
    parent's cell (ionise.F90:768-812)."""
    from ..core import binned as binmod

    grid = cfg.grid
    bplan = binmod.BinnedPlan(cfg)
    species = list(state.species)
    dt_at = cfg.dt / const.atomic_time

    for lv in plan.levels:
        b = species[lv["species"]]
        sp_cfg = cfg.species[lv["species"]]
        # end-of-push ξ is un-normalised: the shifted gather folds the
        # cell offset into widened windows (the reference ionises at the
        # current position; the old every-step slot-sort rebin here was
        # pure bookkeeping and dominated ionisation decks)
        fl = binmod.gather_fields_binned_shifted(
            state.fields, grid, b.xi, bplan, comps=("ex", "ey", "ez"))
        e_mag = jnp.sqrt(fl["ex"] ** 2 + fl["ey"] ** 2 + fl["ez"] ** 2) \
            / const.atomic_electric_field

        key, k1 = jax.random.split(key)
        rate = adk_rate(lv, e_mag)
        u = jax.random.uniform(k1, e_mag.shape,
                               dtype=e_mag.dtype, minval=1e-12)
        prob = 1.0 - jnp.exp(-rate * dt_at)
        fire = (b.w > 0) & (u < prob)
        cand_w = jnp.where(fire, b.w, 0.0)

        # electron release: momentum split by mass fraction
        # (ionise.F90:773-781)
        p_e = b.p * lv["rel_mass_frac"]
        species[lv["release"]] = binmod.merge_candidates(
            species[lv["release"]], b.xi, p_e, cand_w, bplan)
        # promote the ion to the next charge state
        species[lv["to"]] = binmod.merge_candidates(
            species[lv["to"]], b.xi, b.p - p_e, cand_w, bplan)
        # kill in the source level
        species[lv["species"]] = b._replace(
            w=jnp.where(fire, 0.0, b.w))

    return state._replace(species=tuple(species)), key


def ionise_particles(state, cfg, plan: IonisePlan, key):
    """One ionisation pass over all levels (ionise_particles,
    ionise.F90:359-400 → tunnelling(-bsi) paths)."""
    if cfg.species and hasattr(state.species[0], "xi"):
        return _ionise_binned(state, cfg, plan, key)
    from ..core import push as psh
    from ..core.boundaries import STAGGER
    from ..core import shapes

    grid = cfg.grid
    pplan = psh.PushPlan(cfg)
    f = state.fields
    species = list(state.species)
    dt_at = cfg.dt / const.atomic_time
    drops = jnp.zeros((), jnp.int32)

    for lv in plan.levels:
        slab = species[lv["species"]]
        if slab.cap == 0:
            continue
        nd = grid.ndims
        # field gather at particle positions (both stagger sets, as the
        # pusher: ionise.F90 uses the same include files)
        cell1, g_w, cell2, h_w = [], [], [], []
        for d in range(nd):
            rel = slab.x[:, d] - grid.grid_min(d)
            c1, cf1 = shapes.cell_and_frac(rel, 1.0 / grid.delta[d],
                                           grid.shape_fn, grid.ng, False)
            c2, cf2 = shapes.cell_and_frac(rel, 1.0 / grid.delta[d],
                                           grid.shape_fn, grid.ng, True)
            cell1.append(jnp.clip(c1, 0, grid.padded_shape()[d] - 1))
            cell2.append(jnp.clip(c2, 0, grid.padded_shape()[d] - 1))
            g_w.append(shapes.support_weights(grid.shape_fn, cf1))
            h_w.append(shapes.support_weights(grid.shape_fn, cf2))

        def gat(field, name):
            stag = STAGGER[name]
            cells = [cell2[d] if stag[d] else cell1[d] for d in range(nd)]
            ws = [h_w[d] if stag[d] else g_w[d] for d in range(nd)]
            return pplan.fac * psh.gather_field(field, cells, ws,
                                                pplan.strides)

        ex_p = gat(f.ex, "ex")
        ey_p = gat(f.ey, "ey")
        ez_p = gat(f.ez, "ez")
        e_mag = jnp.sqrt(ex_p ** 2 + ey_p ** 2 + ez_p ** 2) \
            / const.atomic_electric_field

        key, k1 = jax.random.split(key)
        rate = adk_rate(lv, e_mag)
        u = jax.random.uniform(k1, e_mag.shape,
                               dtype=e_mag.dtype, minval=1e-12)
        prob = 1.0 - jnp.exp(-rate * dt_at)
        fire = slab.alive & (u < prob)

        # electron release: momentum split by mass fraction
        # (ionise.F90:773-781)
        p_e = slab.p * lv["rel_mass_frac"]
        rel_slab = species[lv["release"]]
        rel_slab, d1 = append_particles(
            rel_slab, slab.x, p_e, slab.weight, fire, with_count=True)
        species[lv["release"]] = rel_slab

        # promote the ion to the next charge state
        nxt = species[lv["to"]]
        nxt, d2 = append_particles(
            nxt, slab.x, slab.p - p_e, slab.weight, fire, with_count=True)
        species[lv["to"]] = nxt
        drops = drops + d1 + d2

        # kill in the source level
        alive = slab.alive & ~fire
        species[lv["species"]] = slab._replace(
            alive=alive, weight=jnp.where(alive, slab.weight, 0.0))

    from ..core.slab_ops import add_dropped
    return add_dropped(state._replace(species=tuple(species)), drops), key
