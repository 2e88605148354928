"""Bremsstrahlung photon emission from tabulated Geant4 cross sections
(physics_packages/bremsstrahlung.F90).

Per electron: the optical depth depletes at
``n_ion * sigma(E) * v * dt / photon_weight`` for every ion species with
1 <= Z <= 100 (delta_optical_depth :586), optionally enhanced by the
plasma-screening factor (get_plasma_factor :615); at tau <= 0 a photon is
emitted along the electron momentum with energy drawn from the tabulated
per-energy CDF (generate_photon :653, find_value_from_table_alt :876) and
the electron recoils by ``photon_weight * k / c``.

Tables are loaded at runtime from ``bremsstrahlung_table_location`` — one
``br<Z>`` text file per atomic number in the same format the reference
reads (setup_tables_bremsstrahlung :215-260): a ``size_k size_t`` header,
a line of electron energies [J], a line of cross sections [m^2], then
``size_t`` rows of photon energies and ``size_t`` rows of CDF values.

TPU design: the per-particle work is fully vectorised; ion/electron
number-density and temperature grids are dense shape-weighted deposits
(particle_to_grid) with ghost folds, gathered back at the electrons with
the cell-centred triangle weights (grid_centred_var_at_particle :718);
CDF inversion is a dense row argmax (tables are ~100s of columns).
"""
from __future__ import annotations

import math
import os

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants as const
from ..core.slab_ops import append_particles

# plasma screening constants (constants.F90:187-191)
LOG_SCREEN_1 = math.log(1.4 / const.alpha_fine)
LOG_SCREEN_2 = math.log(
    math.sqrt(const.epsilon0 * const.kb) / const.q0 * const.m0 * const.c
    * const.alpha_fine / 1.4 / const.h_bar)


class BremTable:
    """One ``br<Z>`` table (setup_tables_bremsstrahlung :215-260)."""

    def __init__(self, path: str):
        with open(path) as f:
            tokens_rows = [ln.split() for ln in f if ln.strip()]
        flat = [v for row in tokens_rows for v in row]
        size_k, size_t = int(flat[0]), int(flat[1])
        vals = np.array([float(v) for v in flat[2:]])
        need = 2 * size_t + 2 * size_t * size_k
        if vals.size < need:
            raise ValueError(
                f"bremsstrahlung table {path!r} truncated: expected "
                f"{need} values for size_k={size_k} size_t={size_t}, "
                f"got {vals.size}")
        self.size_k, self.size_t = size_k, size_t
        o = 0
        self.e_table = vals[o:o + size_t]; o += size_t
        self.cross_section = vals[o:o + size_t]; o += size_t
        self.k_table = vals[o:o + size_t * size_k].reshape(size_t, size_k)
        o += size_t * size_k
        self.cdf_table = vals[o:o + size_t * size_k].reshape(size_t, size_k)


def load_brem_tables(location: str, z_values) -> dict:
    """One table per unique atomic number (br<Z> files)."""
    tables = {}
    for z in sorted(set(int(z) for z in z_values)):
        if z < 1 or z > 100:
            continue
        path = os.path.join(location, f"br{z}")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"bremsstrahlung table 'br{z}' not found in "
                f"{location!r}; set bremsstrahlung_table_location to a "
                f"directory holding the Geant4-derived br<Z> tables "
                f"(one per ion atomic number in the deck)")
        tables[z] = BremTable(path)
    return tables


class BremPlan:
    """Static bremsstrahlung configuration resolved from the deck
    (check_bremsstrahlung_variables :82-144)."""

    def __init__(self, cfg, deck):
        b = deck.bremsstrahlung
        loc = b.table_location or os.environ.get("EPOCH_BREM_TABLES", "")
        if not loc:
            raise ValueError(
                "use_bremsstrahlung requires table_location (deck key "
                "bremsstrahlung_table_location) pointing at the br<Z> "
                "table directory")
        self.electrons = [i for i, s in enumerate(cfg.species)
                          if s.species_type == const.SpeciesType.ELECTRON]
        if not self.electrons:
            raise ValueError("bremsstrahlung requires an electron species "
                             "(identify:electron)")
        # ion species: atomic number on the species block (1..100)
        self.ions = []
        for i, (sb, s) in enumerate(zip(deck.species, cfg.species)):
            z = getattr(sb, "atomic_number", 0)
            if 1 <= z <= 100:
                self.ions.append((i, z, int(round(s.charge / const.q0))))
        self.tables = load_brem_tables(loc, [z for _, z, _ in self.ions])
        ids = {s.identify: i for i, s in enumerate(deck.species)
               if s.identify}
        # brem_photon falls back to the QED photon species (:121-127)
        self.photon_species = ids.get("brem_photon", ids.get("photon", -1))
        self.produce_photons = b.produce_photons
        if self.produce_photons and self.photon_species < 0:
            raise ValueError("produce_photons requires a photon species "
                             "(identify:brem_photon)")
        self.photon_energy_min = b.photon_energy_min
        self.photon_weight = b.photon_weight
        if self.photon_weight <= 0.0:
            raise ValueError("bremsstrahlung photon_weight must be > 0")
        self.photon_dynamics = b.photon_dynamics
        self.use_plasma_screening = b.use_plasma_screening
        self.use_recoil = b.use_radiation_reaction
        self.start_time = b.start_time


def _gather_centred(padded, cfg, slab):
    """Cell-centred grid variable at the particles
    (grid_centred_var_at_particle :718-760)."""
    from ..core.push import gather_centred
    return gather_centred(padded, cfg, slab)


def _density_grid(cfg, state, idx):
    """Padded number-density grid with ghost folds + fills
    (calc_number_density + field_bc)."""
    from ..io.diagnostics import particle_to_grid
    from ..core import boundaries as bnd
    grid = cfg.grid
    acc = particle_to_grid(state.species[idx], grid)
    acc = bnd.current_summation_bcs(acc, "", cfg)
    acc = bnd.field_bc(acc, "jz", cfg)   # cell-centred ghost fill
    return acc / grid.cell_volume


def _root_te_over_ne_grid(cfg, state, plan):
    """sqrt(Te/ne) on the grid, Te the ne-weighted mean electron
    temperature (bremsstrahlung_update_optical_depth :449-487)."""
    from ..io.diagnostics import particle_to_grid
    from ..core import boundaries as bnd
    grid = cfg.grid
    num_t = 0.0
    num_n = 0.0
    for i in plan.electrons:
        slab = state.species[i]
        sp = cfg.species[i]
        # stress temperature: <p^2 - <p>^2>/(3 m kb) per cell
        w = particle_to_grid(slab, grid)
        p2 = jnp.sum(slab.p ** 2, axis=1)
        sum_p2 = particle_to_grid(slab, grid, p2)
        mean_sub = 0.0
        for c in range(3):
            sp_c = particle_to_grid(slab, grid, slab.p[:, c])
            mean_sub = mean_sub + jnp.where(
                w > 0, sp_c ** 2 / jnp.maximum(w, 1e-300), 0.0)
        temp = jnp.where(w > 0, (sum_p2 - mean_sub)
                         / jnp.maximum(w, 1e-300), 0.0) \
            / (3.0 * sp.mass * const.kb)
        num_t = num_t + temp * w
        num_n = num_n + w
    te = jnp.where(num_n > 0, num_t / jnp.maximum(num_n, 1e-300), 0.0)
    ne = num_n / grid.cell_volume
    root = jnp.where((ne > 1e-10) & (te > 1e-10),
                     jnp.sqrt(te / jnp.maximum(ne, 1e-300)), 0.0)
    root = bnd.current_summation_bcs(root, "", cfg)
    root = bnd.field_bc(root, "jz", cfg)
    return root


def _plasma_factor(z: int, a: int, root_te_ne):
    """get_plasma_factor (:615-632)."""
    la3 = math.log(float(a)) / 3.0
    term1 = LOG_SCREEN_1 - la3
    term2 = LOG_SCREEN_2 + la3 + jnp.log(root_te_ne + 1e-300)
    pf = 1.0 + (float(z) / float(a)) ** 2 * term2 / term1
    return jnp.maximum(1.0, pf)


def _sample_photon_energy(tab: BremTable, part_e, u):
    """Inverse-CDF photon energy at electron energy part_e
    (find_value_from_table_alt :876-1131), vectorised: the CDF of the two
    bracketing energy rows is inverted densely and blended linearly."""
    et = jnp.asarray(tab.e_table)
    kt = jnp.asarray(tab.k_table)
    ct = jnp.asarray(tab.cdf_table)
    i1 = jnp.clip(jnp.searchsorted(et, part_e) - 1, 0, tab.size_t - 2)
    i2 = i1 + 1
    fx = jnp.clip((part_e - et[i1]) / jnp.maximum(et[i2] - et[i1], 1e-300),
                  0.0, 1.0)

    def invert(ix):
        cdf = ct[ix]                     # (N, K)
        kk = kt[ix]
        j = jnp.clip(jnp.argmax(cdf >= u[:, None], axis=1), 1,
                     tab.size_k - 1)
        c0 = jnp.take_along_axis(cdf, (j - 1)[:, None], 1)[:, 0]
        c1 = jnp.take_along_axis(cdf, j[:, None], 1)[:, 0]
        y0 = jnp.take_along_axis(kk, (j - 1)[:, None], 1)[:, 0]
        y1 = jnp.take_along_axis(kk, j[:, None], 1)[:, 0]
        f = jnp.where(c1 > c0, (u - c0) / jnp.maximum(c1 - c0, 1e-300), 0.0)
        return y0 + jnp.clip(f, 0.0, 1.0) * (y1 - y0)

    return (1.0 - fx) * invert(i1) + fx * invert(i2)


def _brem_binned(state, cfg, plan: BremPlan, key):
    """Bremsstrahlung on the binned (slot-grid) engine: the rate/sampling
    math is shared; ion densities deposit through the slot-grid rolls
    (deposit_scalar_binned), the gather-back is the cell-centred roll
    gather, and emission is a cell-local candidate merge.  Plasma
    screening uses exact per-cell moments (the slot grid gives these for
    free) instead of the scatter path's shape-weighted deposits."""
    from ..core import binned as binmod
    from ..core import boundaries as bnd
    from .collisions import _cell_density, _cell_temp

    grid = cfg.grid
    bplan = binmod.BinnedPlan(cfg)
    dt = cfg.dt
    species = list(state.species)
    active = state.time > plan.start_time
    i_ob = bplan.aux_idx["opdepth_brem"]

    def rebinned(idx):
        b = binmod.rebin(
            species[idx], bplan,
            bc=cfg.species[idx].bc_particle[:2 * cfg.ndims])
        species[idx] = b
        return b

    def padded2(full):
        full = bnd.current_summation_bcs(full, "", cfg)
        full = bnd.field_bc(full, "jz", cfg)
        return binmod.ghost2_slice(full, grid)

    root_te_ne2 = None
    if plan.use_plasma_screening:
        num_t, num_n = 0.0, 0.0
        for ie in plan.electrons:
            b = rebinned(ie)
            w_cell = jnp.sum(b.w, axis=0)
            temp = _cell_temp(b, cfg.species[ie].mass)
            num_t = num_t + temp * w_cell
            num_n = num_n + w_cell
        te = jnp.where(num_n > 0, num_t / jnp.maximum(num_n, 1e-30), 0.0)
        ne = num_n / grid.cell_volume
        root = jnp.where((ne > 1e-10) & (te > 1e-10),
                         jnp.sqrt(te / jnp.maximum(ne, 1e-30)), 0.0)
        full = jnp.zeros(grid.padded_shape(), root.dtype)
        ng = grid.ng
        full = full.at[tuple(slice(ng, ng + n) for n in grid.n)].set(root)
        root_te_ne2 = padded2(full)

    for ion_idx, z, q_ion in plan.ions:
        tab = plan.tables[z]
        bi = rebinned(ion_idx)
        spad = binmod.deposit_scalar_binned(bi.w, bi.xi, bplan)
        ni2 = padded2(binmod.scalar_pad_to_padded(spad, bplan, grid)) \
            / grid.cell_volume
        for ie in plan.electrons:
            b = rebinned(ie)
            sp = cfg.species[ie]
            key, k1, k2, k3 = jax.random.split(key, 4)
            mc0 = sp.mass * const.c
            u0, u1, u2 = b.p[0] / mc0, b.p[1] / mc0, b.p[2] / mc0
            gamma = jnp.sqrt(u0 ** 2 + u1 ** 2 + u2 ** 2 + 1.0)
            part_e = gamma * sp.mass * const.c ** 2
            mag_p = jnp.sqrt(b.p[0] ** 2 + b.p[1] ** 2 + b.p[2] ** 2)
            part_v = mag_p * const.c ** 2 / part_e
            moving = gamma - 1.0 > 1e-15
            alive = b.w > 0

            ni = binmod.gather_centred_binned(ni2, b.xi, bplan)
            if plan.use_plasma_screening:
                rtn = binmod.gather_centred_binned(root_te_ne2, b.xi, bplan)
                pf = _plasma_factor(q_ion, z, rtn)
            else:
                pf = 1.0
            sigma = jnp.interp(part_e, jnp.asarray(tab.e_table),
                               jnp.asarray(tab.cross_section)) * pf
            d_od = ni * sigma * part_v * dt / plan.photon_weight

            od = b.aux[i_ob]
            od = jnp.where(od <= 0.0,
                           -jnp.log(1.0 - jax.random.uniform(
                               k1, od.shape, od.dtype, maxval=0.999999)),
                           od)
            od = od - jnp.where(alive & moving & active, d_od, 0.0)
            fire = alive & moving & (od <= 0.0)

            r = jax.random.uniform(k2, od.shape, od.dtype)
            k_ph = _sample_photon_energy(
                tab, part_e.reshape(-1), r.reshape(-1)).reshape(od.shape)
            mag_safe = jnp.where(mag_p > 0, mag_p, 1.0)
            dirv = b.p / mag_safe[None]
            if plan.use_recoil:
                new_mag = jnp.where(
                    fire, jnp.maximum(
                        mag_p - plan.photon_weight * k_ph / const.c, 0.0),
                    mag_p)
                newp = dirv * new_mag[None]
            else:
                newp = b.p
            od = jnp.where(fire, -jnp.log(1.0 - jax.random.uniform(
                k3, od.shape, od.dtype, maxval=0.999999)), od)
            b = b._replace(p=newp, aux=b.aux.at[i_ob].set(od))
            species[ie] = b

            if plan.produce_photons and plan.photon_species >= 0:
                keep = fire & (k_ph > plan.photon_energy_min)
                p_ph = dirv * (k_ph / const.c)[None]
                species[plan.photon_species] = binmod.merge_candidates(
                    species[plan.photon_species], b.xi, p_ph,
                    jnp.where(keep, b.w * plan.photon_weight, 0.0), bplan)

    return state._replace(species=tuple(species)), key


def brem_update(state, cfg, plan: BremPlan, key):
    """bremsstrahlung_update_optical_depth (:434-578): the static
    (ion species x electron species) loop is unrolled at trace time; each
    pair depletes the depth and fires emissions against that ion's Z
    table, exactly matching the reference's nested-list ordering."""
    if cfg.species and hasattr(state.species[0], "xi"):
        return _brem_binned(state, cfg, plan, key)
    dt = cfg.dt
    species = list(state.species)
    active = state.time > plan.start_time
    drops = jnp.zeros((), jnp.int32)

    root_te_ne = None
    if plan.use_plasma_screening:
        root_te_ne = _root_te_over_ne_grid(cfg, state, plan)

    for ion_idx, z, q_ion in plan.ions:
        tab = plan.tables[z]
        ni_grid = _density_grid(cfg, state, ion_idx)
        for ie in plan.electrons:
            slab = species[ie]
            if slab.cap == 0:
                continue
            sp = cfg.species[ie]
            key, k1, k2, k3 = jax.random.split(key, 4)
            mc0 = sp.mass * const.c
            u3 = [slab.p[:, c] / mc0 for c in range(3)]
            gamma = jnp.sqrt(u3[0] ** 2 + u3[1] ** 2 + u3[2] ** 2 + 1.0)
            part_e = gamma * sp.mass * const.c ** 2
            mag_p = jnp.sqrt(jnp.sum(slab.p ** 2, axis=1))
            part_v = mag_p * const.c ** 2 / part_e
            moving = gamma - 1.0 > 1e-15

            ni = _gather_centred(ni_grid, cfg, slab)
            if plan.use_plasma_screening:
                rtn = _gather_centred(root_te_ne, cfg, slab)
                pf = _plasma_factor(q_ion, z, rtn)
            else:
                pf = 1.0
            sigma = jnp.interp(part_e, jnp.asarray(tab.e_table),
                               jnp.asarray(tab.cross_section)) * pf
            d_od = ni * sigma * part_v * dt / plan.photon_weight

            od = slab.opdepth_brem
            od = jnp.where(od <= 0.0,
                           -jnp.log(1.0 - jax.random.uniform(
                               k1, od.shape, od.dtype, maxval=0.999999)),
                           od)
            od = od - jnp.where(slab.alive & moving & active, d_od, 0.0)
            fire = slab.alive & moving & (od <= 0.0)

            r = jax.random.uniform(k2, od.shape, od.dtype)
            k_ph = _sample_photon_energy(tab, part_e, r)
            mag_safe = jnp.maximum(mag_p, 1e-300)
            dirv = slab.p / mag_safe[:, None]
            if plan.use_recoil:
                new_mag = jnp.where(
                    fire, jnp.maximum(
                        mag_p - plan.photon_weight * k_ph / const.c, 0.0),
                    mag_p)
                newp = dirv * new_mag[:, None]
            else:
                newp = slab.p
            # reset fired depths (reset_optical_depth :638)
            od = jnp.where(fire, -jnp.log(1.0 - jax.random.uniform(
                k3, od.shape, od.dtype, maxval=0.999999)), od)
            species[ie] = slab._replace(p=newp, opdepth_brem=od)

            if plan.produce_photons and plan.photon_species >= 0:
                keep = fire & (k_ph > plan.photon_energy_min)
                ph = species[plan.photon_species]
                p_ph = dirv * (k_ph / const.c)[:, None]
                ph, d_ = append_particles(ph, slab.x, p_ph,
                                          slab.weight * plan.photon_weight,
                                          keep, with_count=True)
                drops = drops + d_
                species[plan.photon_species] = ph

    from ..core.slab_ops import add_dropped
    return add_dropped(state._replace(species=tuple(species)), drops), key
