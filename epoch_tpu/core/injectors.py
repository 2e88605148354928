"""Boundary particle injectors (physics_packages/injectors.F90).

Each injector attaches to a domain boundary and emits ``npart_per_cell``
particles per cell per transit time, flux-Maxwellian weighted
(run_single_injector, injectors.F90:183-407): the mean inward flow speed of
a drifting Maxwellian sets the ideal emission count, a per-cell fractional
``depth`` accumulator (with shot noise) converts it to integers, and new
particles are placed within ``v·dt`` of the boundary with flux-weighted
normal momentum.

TPU design: one jittable emission pass per injector per step; per-boundary-
cell depth accumulators live in the state; appends go into dead slots of the
species slab (slab_ops).  Heat-bath/thermal particle BCs reuse the same
samplers.
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants as const
from .slab_ops import append_particles, sample_maxwellian_p, \
    sample_flux_maxwellian_p

FLOW_LIMIT = 10.0   # flow_limit_val in the reference
SQRT2 = math.sqrt(2.0)
SQRT2PI_INV = 1.0 / math.sqrt(2.0 * math.pi)


class InjectorPlan:
    """Static per-injector data computed at build time."""

    def __init__(self, inj_block, cfg, deck):
        self.boundary = inj_block.boundary
        self.species_idx = deck.species_index(inj_block.species)
        sp = cfg.species[self.species_idx]
        self.mass = sp.mass
        self.npc = inj_block.npart_per_cell if inj_block.npart_per_cell > 0 \
            else max(cfg.species[self.species_idx].npart_per_cell, 1.0)
        self.density = inj_block.density
        self.density_min = inj_block.density_min
        self.temp = inj_block.temp
        self.drift = inj_block.drift
        self.use_flux = inj_block.use_flux_injector
        self.t_start = inj_block.t_start
        self.t_end = inj_block.t_end
        grid = cfg.grid
        self.axis = self.boundary // 2
        self.hi = bool(self.boundary % 2)
        self.dir_mult = -1.0 if self.hi else 1.0
        # transverse cell grid
        self.tdims = tuple(d for d in range(grid.ndims) if d != self.axis)
        self.n_cells = int(np.prod([grid.n[d] for d in self.tdims])) \
            if self.tdims else 1
        self.max_new_per_cell = int(math.ceil(self.npc)) + 2
        self.max_new = self.n_cells * self.max_new_per_cell


def _boundary_ctx(plan, cfg, time, xp):
    """Deck-expression context at the boundary cells."""
    grid = cfg.grid
    names = ["x", "y", "z"]
    ctx = {"time": time}
    bpos = grid.hi[plan.axis] if plan.hi else grid.lo[plan.axis]
    if plan.tdims:
        coords = [grid.centres(d) for d in plan.tdims]
        mesh = np.meshgrid(*coords, indexing="ij")
        for d, m in zip(plan.tdims, mesh):
            ctx[names[d]] = jnp.asarray(m.reshape(-1))
    ctx[names[plan.axis]] = bpos
    return ctx


def _emission_counts(plan: InjectorPlan, cfg, time, depth, k0):
    """Shared flux-Maxwellian emission arithmetic
    (run_single_injector, injectors.F90:183-280): per-boundary-cell ideal
    counts with shot noise, depth accumulation, integer emission counts.
    Returns (parts, depth', dens, temps, drifts, v_inject_dt), all flat
    (n_cells,)."""
    grid = cfg.grid
    dt = cfg.dt
    dtype = cfg.dtype
    axis = plan.axis
    dxa = grid.delta[axis]

    ctx = _boundary_ctx(plan, cfg, time, jnp)
    dens = plan.density(ctx, xp=jnp) if plan.density is not None else 0.0
    dens = jnp.broadcast_to(jnp.asarray(dens, dtype), (plan.n_cells,))
    temps = []
    drifts = []
    for i in range(3):
        t = plan.temp[i](ctx, xp=jnp) if plan.temp[i] is not None else 0.0
        d = plan.drift[i](ctx, xp=jnp) if plan.drift[i] is not None else 0.0
        temps.append(jnp.broadcast_to(jnp.asarray(t, dtype), (plan.n_cells,)))
        drifts.append(jnp.broadcast_to(jnp.asarray(d, dtype), (plan.n_cells,)))

    mass = plan.mass
    typical_mc2 = (mass * const.c) ** 2
    p_therm = jnp.sqrt(mass * const.kb *
                       jnp.maximum(jnp.maximum(temps[0], temps[1]), temps[2]))
    p_inject_drift = drifts[axis]
    dir_mult = plan.dir_mult

    if plan.use_flux:
        p_drift = p_inject_drift * dir_mult
        p_ratio = p_drift / (SQRT2 * jnp.maximum(p_therm, 1e-300))
        density_corr = 0.5 * (1.0 + jax.scipy.special.erf(p_ratio))
        v_mom = dir_mult * (
            p_drift + SQRT2PI_INV * p_therm * jnp.exp(-p_ratio ** 2)
            / jnp.maximum(density_corr, 1e-300))
        gamma_mass = jnp.sqrt(v_mom ** 2 + typical_mc2) / const.c
        v_inject_s = v_mom / gamma_mass
        # large inward drift → plain drift velocity, no correction
        big_in = p_drift > FLOW_LIMIT * p_therm
        gm2 = jnp.sqrt(p_inject_drift ** 2 + typical_mc2) / const.c
        v_inject_s = jnp.where(big_in, p_inject_drift / gm2, v_inject_s)
        density_corr = jnp.where(big_in, 1.0, density_corr)
        # strong outflow or cold: no injection
        dead = (p_drift < -FLOW_LIMIT * p_therm) | (p_therm < 1e-300)
        density_corr = jnp.where(dead, 0.0, density_corr)
    else:
        gm = jnp.sqrt(p_inject_drift ** 2 + typical_mc2) / const.c
        v_inject_s = p_inject_drift / gm
        density_corr = jnp.ones_like(dens)

    v_inject = jnp.abs(v_inject_s)
    v_inject_dt = dt * v_inject_s

    npart_ideal = plan.npc * v_inject * density_corr * dt / dxa
    noise_std = 0.5 * jnp.sqrt(jnp.maximum(
        npart_ideal * (1.0 - npart_ideal / plan.npc), 0.0))
    itemp = jax.random.normal(k0, (plan.n_cells,), dtype) * noise_std \
        + npart_ideal
    active = jnp.logical_and(time >= plan.t_start, time <= plan.t_end)
    itemp = jnp.where(active & (dens >= plan.density_min), itemp, 0.0)
    depth = depth - itemp
    parts = jnp.where(depth < 0.0,
                      jnp.floor(jnp.abs(depth - 1.0)), 0.0)
    depth = depth + parts
    return parts, depth, dens, temps, drifts, v_inject_dt


def run_injector(state, plan: InjectorPlan, depth, cfg, key):
    """One emission pass; returns (new_state, new_depth)."""
    slab = state.species[plan.species_idx]
    if hasattr(slab, "xi"):
        return _run_injector_binned(state, plan, depth, cfg, key)
    grid = cfg.grid
    dt = cfg.dt
    dtype = cfg.dtype
    axis = plan.axis
    dxa = grid.delta[axis]
    time = state.time

    k0, k1, k2, k3, k4 = jax.random.split(key, 5)
    parts, depth, dens, temps, drifts, v_inject_dt = _emission_counts(
        plan, cfg, time, depth, k0)
    mass = plan.mass
    dir_mult = plan.dir_mult

    # emit up to max_new_per_cell per cell
    mpc = plan.max_new_per_cell
    slot = jnp.arange(plan.max_new)
    cell = slot // mpc
    sub = slot % mpc
    valid = sub < parts[cell]

    # positions: within v·dt of the boundary (injectors.F90:289-296)
    png = grid.png
    bpos = (grid.hi[axis] if plan.hi else grid.lo[axis]) \
        - 0.5 * dir_mult * dxa * png
    u = jax.random.uniform(k1, (plan.max_new,), dtype)
    pos_a = bpos - u * v_inject_dt[cell]
    nd = grid.ndims
    xs = [None] * nd
    xs[axis] = pos_a
    ut = jax.random.uniform(k2, (plan.max_new, max(len(plan.tdims), 1)), dtype)
    for i, d in enumerate(plan.tdims):
        # transverse cell centre + uniform
        coords = jnp.asarray(grid.centres(d).astype(dtype))
        if len(plan.tdims) == 1:
            centre = coords[cell % grid.n[d]]
        else:
            # row-major unravel over transverse dims
            sizes = [grid.n[t] for t in plan.tdims]
            idx = cell
            for j in range(i + 1, len(sizes)):
                idx = idx // sizes[j]
            centre = coords[idx % grid.n[d]]
        xs[d] = centre + (ut[:, i] - 0.5) * grid.delta[d]
    x_new = jnp.stack(xs, axis=1)

    # momenta (injectors.F90:311-322)
    keys = jax.random.split(k3, 3)
    p_new = []
    for i in range(3):
        t_i = temps[i][cell]
        d_i = drifts[i][cell]
        if plan.use_flux and i == axis:
            p_new.append(sample_flux_maxwellian_p(
                keys[i], mass, t_i, d_i, dir_mult, (plan.max_new,)))
        else:
            p_new.append(sample_maxwellian_p(
                keys[i], mass, t_i, d_i, (plan.max_new,)))
    p_new = jnp.stack(p_new, axis=1)

    w_new = (grid.cell_volume / plan.npc) * dens[cell]
    valid = valid & (w_new > 0)
    slab, drops = append_particles(slab, x_new, p_new, w_new, valid,
                                   with_count=True)
    species = list(state.species)
    species[plan.species_idx] = slab
    from .slab_ops import add_dropped
    return add_dropped(state._replace(species=tuple(species)),
                       drops), depth


def _run_injector_binned(state, plan: InjectorPlan, depth, cfg, key):
    """Emission onto the slot grid (binned engine).

    The emitted particles land in the boundary-cell column: per
    transverse cell up to ``max_new_per_cell`` candidates, flux-weighted
    along the boundary normal, are merged into the column's free slots
    with one column-local live-first sort (the slot-grid analogue of the
    reference's list appends).  Positions are placed within ``v·dt``
    INSIDE the edge cell (the reference stages them in the ghost band
    outside and lets the push carry them in, injectors.F90:289-296 — the
    slot grid has no outside cells; the arrival-phase difference is
    O(v·dt) and flux-neutral).  Overflow is counted in n_dropped."""
    grid = cfg.grid
    dtype = cfg.dtype
    axis = plan.axis
    dxa = grid.delta[axis]
    time = state.time
    b = state.species[plan.species_idx]
    K = b.K
    nd = grid.ndims

    k0, k1, k2, k3 = jax.random.split(key, 4)
    parts, depth, dens, temps, drifts, v_inject_dt = _emission_counts(
        plan, cfg, time, depth, k0)

    tshape = tuple(grid.n[d] for d in plan.tdims)
    cshape = (plan.max_new_per_cell,) + tshape
    parts_t = parts.reshape(tshape) if tshape else parts.reshape(())
    iota = jax.lax.broadcasted_iota(jnp.int32, cshape, 0)
    valid = iota < parts_t[None].astype(jnp.int32) if tshape \
        else iota < parts.astype(jnp.int32)

    # ξ along the boundary normal: within |v·dt| of the wall, inside the
    # edge cell (dir_mult maps lo/hi symmetrically)
    u = jax.random.uniform(k1, cshape, dtype)
    vmag = jnp.abs(v_inject_dt).reshape(tshape) if tshape \
        else jnp.abs(v_inject_dt).reshape(())
    xi_axis = plan.dir_mult * (u * (vmag[None] / dxa) - 0.5)
    xi_new = []
    tkeys = jax.random.split(k2, max(nd - 1, 1))
    ti = 0
    for d in range(nd):
        if d == axis:
            xi_new.append(xi_axis)
        else:
            xi_new.append(jax.random.uniform(tkeys[ti], cshape, dtype) - 0.5)
            ti += 1
    xi_new = jnp.stack(xi_new)

    keys = jax.random.split(k3, 3)
    p_new = []
    for i in range(3):
        t_i = temps[i].reshape(tshape)[None] if tshape else temps[i]
        d_i = drifts[i].reshape(tshape)[None] if tshape else drifts[i]
        t_i = jnp.broadcast_to(t_i, cshape)
        d_i = jnp.broadcast_to(d_i, cshape)
        if plan.use_flux and i == axis:
            p_new.append(sample_flux_maxwellian_p(
                keys[i], plan.mass, t_i, d_i, plan.dir_mult, cshape))
        else:
            p_new.append(sample_maxwellian_p(
                keys[i], plan.mass, t_i, d_i, cshape))
    p_new = jnp.stack(p_new)

    w_new = (grid.cell_volume / plan.npc) \
        * (dens.reshape(tshape)[None] if tshape else dens)
    w_new = jnp.broadcast_to(w_new, cshape)
    w_new = jnp.where(valid & (w_new > 0), w_new, 0.0)

    # column-local live-first merge (cf. binned.merge_candidates)
    col = grid.n[axis] - 1 if plan.hi else 0
    idx_w = (slice(None),) * (1 + axis) + (col,)
    idx_v = (slice(None),) * (2 + axis) + (col,)
    w_col = b.w[idx_w]
    xi_col = b.xi[idx_v]
    p_col = b.p[idx_v]
    na = 0 if b.aux is None else b.aux.shape[0]
    cw = jnp.concatenate([w_col, w_new], axis=0)
    cxi = jnp.concatenate([xi_col, xi_new], axis=1)
    cp = jnp.concatenate([p_col, p_new], axis=1)
    if na:
        cax = jnp.concatenate(
            [b.aux[idx_v], jnp.zeros((na,) + cshape, dtype)], axis=1)
    ops = (-cw,) + tuple(cxi[i] for i in range(nd)) \
        + tuple(cp[i] for i in range(3)) \
        + (tuple(cax[i] for i in range(na)) if na else ())
    sorted_ops = jax.lax.sort(ops, dimension=0, num_keys=1)
    live_total = jnp.sum(cw > 0)
    w_k = -sorted_ops[0][:K]
    xi_k = jnp.stack([sorted_ops[1 + i][:K] for i in range(nd)])
    p_k = jnp.stack([sorted_ops[1 + nd + i][:K] for i in range(3)])
    kept = jnp.sum(w_k > 0)
    dropped = (live_total - kept).astype(jnp.int32)
    b = b._replace(
        w=b.w.at[idx_w].set(w_k),
        xi=b.xi.at[idx_v].set(xi_k),
        p=b.p.at[idx_v].set(p_k),
        aux=(b.aux.at[idx_v].set(
            jnp.stack([sorted_ops[4 + nd + i][:K] for i in range(na)]))
            if na else b.aux),
        n_dropped=b.n_dropped + dropped)
    species = list(state.species)
    species[plan.species_idx] = b
    return state._replace(species=tuple(species)), depth
