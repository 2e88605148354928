"""Particle-count housekeeping: pseudo-particle splitting and species
migration (housekeeping/split_particle.F90, particle_migration.F90).

Splitting (split_particles :121-199): in cells holding 0 < count <=
npart_per_cell_min macro-particles, every particle with weight >= 1 is
halved in weight and cloned; the pair separates by +-jitter, jitter
uniform in +-0.25*dx per axis.  Disabled once the species' global count
reaches npart_max.

Migration (migrate_particles :33-57): every migration_interval steps,
particles promote to a hotter species when p^2/m exceeds
promote_multiplier * 3 kB Te(fluid) in a cell below promote_density, and
demote when below demote_multiplier * 3 kB Te(target fluid) in a cell at
or above demote_density.  The fluid Te/ne grids are EMA-smoothed with
alpha = 0.25 per event (update_fluid_energy :90-113).  Chains are
processed hot-end first (migration_chain :60-87).

TPU design: counts and fluid grids are dense shape-weighted deposits;
moves are mask + capped append (slab_ops) instead of linked-list splices;
the (species x species) chain order is resolved statically at plan time.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants as const
from . import boundaries as bnd
from . import push as psh
from .slab_ops import append_particles


class SplitPlan:
    """Static splitting configuration (setup_split_particles :90-110)."""

    def __init__(self, cfg, deck):
        self.species = [(i, sb.npart_max)
                        for i, sb in enumerate(deck.species) if sb.split]
        self.min_count = deck.control.npart_per_cell_min


class MigrationPlan:
    """Static migration chains (initialise_migration :236-358)."""

    def __init__(self, cfg, deck):
        names = {sb.name: i for i, sb in enumerate(deck.species)}

        def resolve(v):
            if not v:
                return -1
            if v in names:
                return names[v]
            try:
                return int(v) - 1      # reference takes a 1-based index
            except ValueError:
                return -1

        n = len(deck.species)
        self.promote_to = [-1] * n
        self.demote_to = [-1] * n
        self.promote_mult = [1.0] * n
        self.demote_mult = [1.0] * n
        self.promote_density = [float("inf")] * n
        self.demote_density = [0.0] * n
        active = [False] * n
        for i, sb in enumerate(deck.species):
            if not sb.migrate:
                continue
            pt, dt_ = resolve(sb.promote_to), resolve(sb.demote_to)
            if dt_ >= 0:
                # demotion requires identical charge & mass (:270-291)
                o = cfg.species[dt_]
                s = cfg.species[i]
                if (abs(s.mass - o.mass) > 1e-300
                        or abs(s.charge - o.charge) > 1e-300):
                    dt_ = -1
            self.promote_to[i] = pt
            self.demote_to[i] = dt_
            self.promote_mult[i] = sb.promote_multiplier
            self.demote_mult[i] = sb.demote_multiplier
            self.promote_density[i] = sb.promote_density
            self.demote_density[i] = sb.demote_density
            active[i] = pt >= 0 or dt_ >= 0
        # break looped promotion chains (:308-333)
        for i in range(n):
            seen = {i}
            cur = i
            while active[cur] and self.promote_to[cur] >= 0:
                nxt = self.promote_to[cur]
                if nxt in seen:
                    self.promote_to[cur] = -1
                    break
                seen.add(nxt)
                cur = nxt
        self.active = active
        # fluids: promoted-from sources and demoted-to targets (:300-306)
        fluid = set()
        for i in range(n):
            if not active[i]:
                continue
            if self.promote_to[i] >= 0:
                fluid.add(i)
            if self.demote_to[i] >= 0:
                fluid.add(self.demote_to[i])
        self.fluid_species = sorted(fluid)
        self.fluid_slot = {s: k for k, s in enumerate(self.fluid_species)}
        # hot-end-first processing order (migration_chain :60-87)
        order, done = [], set()

        def visit(i):
            if i in done or not active[i]:
                return
            done.add(i)
            if self.promote_to[i] >= 0:
                visit(self.promote_to[i])
            order.append(i)

        for i in range(n):
            visit(i)
        self.order = order
        self.interval = max(deck.control.migration_interval, 1)

    @property
    def any_active(self):
        return any(self.active)


def _cell_counts(slab, grid):
    """Alive macro-particles per (padded) cell, nearest-cell binning
    (reorder_particles_to_grid, split_particle.F90:29-66)."""
    nd = grid.ndims
    padded = grid.padded_shape()
    cells = []
    for d in range(nd):
        rel = slab.x[:, d] - grid.grid_min(d)
        c = jnp.floor(rel / grid.delta[d] + 0.5).astype(jnp.int32) + grid.ng
        cells.append(jnp.clip(c, 0, padded[d] - 1))
    strides = [int(np.prod(padded[d + 1:])) for d in range(nd)]
    flat = sum(cells[d] * strides[d] for d in range(nd))
    counts = jnp.zeros(int(np.prod(padded)), jnp.int32)
    counts = counts.at[flat].add(slab.alive.astype(jnp.int32))
    return counts, flat


def _split_binned(b, npart_max, plan, cfg, key):
    """Splitting on the slot grid: per-cell live counts are one
    reduction, the clone set is a cell-local candidate merge
    (binned.merge_candidates), jitter is ±0.25 cells in ξ units
    (split_particle.F90:121-199)."""
    from . import binned as binmod
    grid = cfg.grid
    bplan = binmod.BinnedPlan(cfg)
    nd = grid.ndims
    dtype = b.w.dtype
    counts = jnp.sum((b.w > 0).astype(jnp.int32), axis=0)
    eligible = (b.w > 0) & (counts > 0)[None] \
        & (counts <= plan.min_count)[None] & (b.w >= 1.0)
    if npart_max > 0:
        total = jnp.sum(b.w > 0)
        eligible = eligible & (total < npart_max)
    jit_u = jax.random.uniform(key, (nd,) + b.w.shape, dtype)
    jitter = (2.0 * jit_u - 1.0) * 0.25
    w_half = jnp.where(eligible, 0.5 * b.w, b.w)
    xi_orig = jnp.where(eligible[None], b.xi - jitter, b.xi)
    cand_xi = xi_orig + 2.0 * jitter
    cand_w = jnp.where(eligible, w_half, 0.0)
    b = b._replace(xi=xi_orig, w=w_half)
    # clones inherit momentum; aux rows (optical depths) reset to zero
    # for lazy resampling, as for created particles
    return binmod.merge_candidates(b, cand_xi, b.p, cand_w, bplan)


def split_particles(state, cfg, plan: SplitPlan, key):
    drops = jnp.zeros((), jnp.int32)
    """split_particles (split_particle.F90:121-199), vectorised: all
    particles in underpopulated cells split at once."""
    grid = cfg.grid
    species = list(state.species)
    for si, npart_max in plan.species:
        slab = species[si]
        if hasattr(slab, "xi"):
            key, sub = jax.random.split(key)
            species[si] = _split_binned(slab, npart_max, plan, cfg, sub)
            continue
        if slab.cap == 0:
            continue
        key, sub = jax.random.split(key)
        counts, flat = _cell_counts(slab, grid)
        my_count = counts[flat]
        eligible = slab.alive & (my_count > 0) \
            & (my_count <= plan.min_count) & (slab.weight >= 1.0)
        if npart_max > 0:
            total = jnp.sum(slab.alive)
            eligible = eligible & (total < npart_max)
        jit_u = jax.random.uniform(sub, slab.x.shape, slab.x.dtype)
        jitter = (2.0 * jit_u - 1.0) * 0.25 \
            * jnp.asarray(grid.delta, slab.x.dtype)[None, :]
        w_new = jnp.where(eligible, 0.5 * slab.weight, slab.weight)
        x_orig = jnp.where(eligible[:, None], slab.x - jitter, slab.x)
        slab = slab._replace(x=x_orig, weight=w_new)
        slab, d_ = append_particles(slab, slab.x + 2.0 * jitter, slab.p,
                                    slab.weight, eligible, with_count=True)
        drops = drops + d_
        species[si] = slab
    from .slab_ops import add_dropped
    return add_dropped(state._replace(species=tuple(species)), drops), key


def init_fluid_grids(cfg, state, plan: MigrationPlan):
    """Initial fluid Te/ne grids (initialise_migration :370-381)."""
    grids = []
    for si in plan.fluid_species:
        grids.append(_temp_dens_any(cfg, state.species[si],
                                    cfg.species[si]))
    return state._replace(fluid_grids=tuple(grids))


def _temp_dens_any(cfg, s, sp):
    """Engine dispatch for the fluid Te/ne deposit."""
    if hasattr(s, "xi"):
        from . import binned as binmod
        return _temp_dens_grid_binned(cfg, s, sp, binmod.BinnedPlan(cfg))
    return _temp_dens_grid(cfg, s, sp)


def _temp_dens_grid(cfg, slab, sp):
    """Stacked (temperature[K], number density) padded grids with ghost
    folds + fills (calc_temperature / calc_number_density)."""
    from ..io.diagnostics import particle_to_grid
    grid = cfg.grid
    w = particle_to_grid(slab, grid)
    p2 = jnp.sum(slab.p ** 2, axis=1)
    sum_p2 = particle_to_grid(slab, grid, p2)
    mean_sub = 0.0
    for c in range(3):
        spc = particle_to_grid(slab, grid, slab.p[:, c])
        mean_sub = mean_sub + jnp.where(
            w > 0, spc ** 2 / jnp.maximum(w, 1e-300), 0.0)
    temp = jnp.where(w > 0, (sum_p2 - mean_sub)
                     / jnp.maximum(w, 1e-300), 0.0) \
        / (3.0 * sp.mass * const.kb)
    dens = w / grid.cell_volume
    out = []
    for arr in (temp, dens):
        arr = bnd.current_summation_bcs(arr, "", cfg)
        arr = bnd.field_bc(arr, "jz", cfg)
        out.append(arr)
    return jnp.stack(out)


def _temp_dens_grid_binned(cfg, b, sp, bplan):
    """_temp_dens_grid on the slot grid: shape-weighted deposits are
    native binned reductions (deposit_scalar_binned) — same formula and
    fold order as the scatter version, so the fluid grids agree across
    engines to round-off.  Requires post-rebin ξ (callers rebin)."""
    from . import binned as binmod
    grid = cfg.grid
    live_w = jnp.where(b.w > 0, b.w, 0.0)

    def dep(vals):
        spad = binmod.deposit_scalar_binned(vals, b.xi, bplan)
        return binmod.scalar_pad_to_padded(spad, bplan, grid)

    w = dep(live_w)
    p2 = b.p[0] ** 2 + b.p[1] ** 2 + b.p[2] ** 2
    sum_p2 = dep(live_w * p2)
    mean_sub = 0.0
    for c in range(3):
        spc = dep(live_w * b.p[c])
        mean_sub = mean_sub + jnp.where(
            w > 0, spc ** 2 / jnp.maximum(w, 1e-300), 0.0)
    temp = jnp.where(w > 0, (sum_p2 - mean_sub)
                     / jnp.maximum(w, 1e-300), 0.0) \
        / (3.0 * sp.mass * const.kb)
    dens = w / grid.cell_volume
    out = []
    for arr in (temp, dens):
        arr = bnd.current_summation_bcs(arr, "", cfg)
        arr = bnd.field_bc(arr, "jz", cfg)
        out.append(arr)
    return jnp.stack(out)


def _migrate_binned(state, cfg, plan: MigrationPlan):
    """Migration on the slot grid (particle_migration.F90:33-57): the
    fluid lookups are cell-centred binned gathers
    (gather_centred_binned, the fluid-grid lookup :144-153), moves are
    cell-local candidate merges (merge_candidates) — the migrated
    particle lands in its own cell of the destination species with its
    momentum and aux rows (ids, optical depths) intact; candidates
    beyond the destination cell's free slots are counted drops."""
    from . import binned as binmod
    bplan = binmod.BinnedPlan(cfg)
    alpha = 0.25
    species = list(state.species)

    def rebinned(idx):
        b = binmod.rebin(
            species[idx], bplan,
            bc=cfg.species[idx].bc_particle[:2 * cfg.ndims])
        species[idx] = b
        return b

    involved = set(plan.fluid_species)
    for si in plan.order:
        involved.add(si)
        if plan.promote_to[si] >= 0:
            involved.add(plan.promote_to[si])
        if plan.demote_to[si] >= 0:
            involved.add(plan.demote_to[si])
    for si in sorted(involved):
        rebinned(si)

    grids = list(state.fluid_grids)
    for k, si in enumerate(plan.fluid_species):
        fresh = _temp_dens_grid_binned(cfg, species[si], cfg.species[si],
                                       bplan)
        grids[k] = alpha * fresh + (1.0 - alpha) * grids[k]
    state = state._replace(fluid_grids=tuple(grids))

    def fluid_at(slot, b):
        te2 = binmod.ghost2_slice(grids[slot][0], cfg.grid)
        ne2 = binmod.ghost2_slice(grids[slot][1], cfg.grid)
        return (binmod.gather_centred_binned(te2, b.xi, bplan),
                binmod.gather_centred_binned(ne2, b.xi, bplan))

    def move(src_i, dst_i, mask):
        src = species[src_i]
        cand_w = jnp.where(mask, src.w, 0.0)
        cand_aux = None
        if src.aux is not None:
            cand_aux = jnp.where(mask[None], src.aux, 0.0)
        species[dst_i] = binmod.merge_candidates(
            species[dst_i], src.xi, src.p, cand_w, bplan,
            cand_aux=cand_aux)
        species[src_i] = src._replace(
            w=jnp.where(mask, 0.0, src.w))

    for si in plan.order:
        b = species[si]
        sp = cfg.species[si]
        alive = b.w > 0
        ke = (b.p[0] ** 2 + b.p[1] ** 2 + b.p[2] ** 2) / sp.mass
        if plan.promote_to[si] >= 0:
            te, ne = fluid_at(plan.fluid_slot[si], b)
            mask = alive \
                & (ke > plan.promote_mult[si] * 3.0 * const.kb * te) \
                & (ne < plan.promote_density[si])
            move(si, plan.promote_to[si], mask)
            b = species[si]
            alive = b.w > 0
        if plan.demote_to[si] >= 0:
            dst = plan.demote_to[si]
            te, ne = fluid_at(plan.fluid_slot[dst], b)
            mask = alive \
                & (ke < plan.demote_mult[si] * 3.0 * const.kb * te) \
                & (ne >= plan.demote_density[si])
            move(si, dst, mask)
    return state._replace(species=tuple(species))


def migrate_particles(state, cfg, plan: MigrationPlan):
    """One migration event (EMA grid refresh + promotion/demotion
    chains), to be gated on step % interval by the caller."""
    if cfg.species and hasattr(state.species[0], "xi"):
        return _migrate_binned(state, cfg, plan)
    # refresh fluid grids with alpha = 0.25 (update_fluid_energy :95)
    alpha = 0.25
    grids = list(state.fluid_grids)
    for k, si in enumerate(plan.fluid_species):
        fresh = _temp_dens_grid(cfg, state.species[si], cfg.species[si])
        grids[k] = alpha * fresh + (1.0 - alpha) * grids[k]
    state = state._replace(fluid_grids=tuple(grids))

    species = list(state.species)

    drops = [jnp.zeros((), jnp.int32)]

    def move(src_i, dst_i, mask):
        src = species[src_i]
        dst, d_ = append_particles(species[dst_i], src.x, src.p, src.weight,
                                   mask, with_count=True)
        drops[0] = drops[0] + d_
        alive = src.alive & ~mask
        species[src_i] = src._replace(
            alive=alive, weight=jnp.where(alive, src.weight, 0.0))
        species[dst_i] = dst

    for si in plan.order:
        slab = species[si]
        if slab.cap == 0:
            continue
        sp = cfg.species[si]
        ke = jnp.sum(slab.p ** 2, axis=1) / sp.mass   # p^2/m (:143)
        if plan.promote_to[si] >= 0:
            slot = plan.fluid_slot[si]
            te = psh.gather_centred(state.fluid_grids[slot][0], cfg, slab)
            ne = psh.gather_centred(state.fluid_grids[slot][1], cfg, slab)
            mask = slab.alive \
                & (ke > plan.promote_mult[si] * 3.0 * const.kb * te) \
                & (ne < plan.promote_density[si])
            move(si, plan.promote_to[si], mask)
            slab = species[si]
        if plan.demote_to[si] >= 0:
            dst = plan.demote_to[si]
            slot = plan.fluid_slot[dst]
            te = psh.gather_centred(state.fluid_grids[slot][0], cfg, slab)
            ne = psh.gather_centred(state.fluid_grids[slot][1], cfg, slab)
            mask = slab.alive \
                & (ke < plan.demote_mult[si] * 3.0 * const.kb * te) \
                & (ne >= plan.demote_density[si])
            move(si, dst, mask)
    from .slab_ops import add_dropped
    return add_dropped(state._replace(species=tuple(species)), drops[0])
