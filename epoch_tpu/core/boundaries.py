"""Field and particle boundary conditions.

Re-implements ``epoch{1,2,3}d/src/boundary.F90`` dimension-generically.
Single-device halo "exchange" is a periodic wrap of the ghost slabs; the
sharded path swaps these helpers for ``ppermute`` collectives
(epoch_tpu.parallel.halo).

Stagger table (setup.F90:123-132): ex staggered in x, ey in y, ez in z;
bx in y,z; by in x,z; bz in x,y.
"""
from __future__ import annotations

import jax.numpy as jnp

from .. import constants as const
from .state import Fields

# stagger[field][axis] — True when the field is staggered along that axis
STAGGER = {
    "ex": (True, False, False),
    "ey": (False, True, False),
    "ez": (False, False, True),
    "bx": (False, True, True),
    "by": (True, False, True),
    "bz": (True, True, False),
    "jx": (True, False, False),
    "jy": (False, True, False),
    "jz": (False, False, True),
}


def _sl(arr, axis, s):
    idx = [slice(None)] * arr.ndim
    idx[axis] = s
    return tuple(idx)


def periodic_wrap(field, axis: int, n: int, ng: int):
    """Ghost fill from the opposite side (do_field_mpi_with_lengths,
    boundary.F90:156-192, rank↔self)."""
    lo_src = _sl(field, axis, slice(n, n + ng))
    hi_src = _sl(field, axis, slice(ng, 2 * ng))
    field = field.at[_sl(field, axis, slice(0, ng))].set(field[lo_src])
    field = field.at[_sl(field, axis, slice(n + ng, n + 2 * ng))].set(field[hi_src])
    return field


def zero_gradient(field, axis: int, n: int, ng: int, staggered: bool, hi: bool):
    """field_zero_gradient (boundary.F90:236-267): mirror ghosts."""
    if not hi:
        if staggered:
            # ghost p in [0, ng-2] mirrors p' = 2(ng-1) - p
            src = field[_sl(field, axis, slice(ng, 2 * ng - 1))]
            field = field.at[_sl(field, axis, slice(0, ng - 1))].set(
                jnp.flip(src, axis=axis))
        else:
            src = field[_sl(field, axis, slice(ng, 2 * ng))]
            field = field.at[_sl(field, axis, slice(0, ng))].set(
                jnp.flip(src, axis=axis))
    else:
        centre = n + ng - 1
        if staggered:
            src = field[_sl(field, axis, slice(centre - ng + 1, centre))]
            field = field.at[_sl(field, axis, slice(centre + 1, centre + ng))].set(
                jnp.flip(src, axis=axis))
        else:
            src = field[_sl(field, axis, slice(n, n + ng))]
            field = field.at[_sl(field, axis, slice(n + ng, n + 2 * ng))].set(
                jnp.flip(src, axis=axis))
    return field


def clamp_zero(field, axis: int, n: int, ng: int, staggered: bool, hi: bool):
    """field_clamp_zero (boundary.F90:271-304): antisymmetric ghosts."""
    if not hi:
        if staggered:
            src = field[_sl(field, axis, slice(ng, 2 * ng - 1))]
            field = field.at[_sl(field, axis, slice(0, ng - 1))].set(
                -jnp.flip(src, axis=axis))
            field = field.at[_sl(field, axis, ng - 1)].set(0.0)
        else:
            src = field[_sl(field, axis, slice(ng, 2 * ng))]
            field = field.at[_sl(field, axis, slice(0, ng))].set(
                -jnp.flip(src, axis=axis))
    else:
        centre = n + ng - 1
        if staggered:
            field = field.at[_sl(field, axis, centre)].set(0.0)
            src = field[_sl(field, axis, slice(centre - ng + 1, centre))]
            field = field.at[_sl(field, axis, slice(centre + 1, centre + ng))].set(
                -jnp.flip(src, axis=axis))
        else:
            src = field[_sl(field, axis, slice(n, n + ng))]
            field = field.at[_sl(field, axis, slice(n + ng, n + 2 * ng))].set(
                -jnp.flip(src, axis=axis))
    return field


def field_bc(field, name: str, cfg):
    """MPI/periodic halo refresh for one field (field_bc, boundary.F90:145)."""
    grid = cfg.grid
    ng = grid.ng
    for d in range(grid.ndims):
        if cfg.bc_field[2 * d] == const.BC.PERIODIC:
            field = periodic_wrap(field, d, grid.n[d], ng)
    return field


def _apply_edge_bcs(field, name: str, cfg, is_b: bool):
    """Clamp/zero-gradient/conduct edge conditions (efield_bcs
    boundary.F90:487-525, bfield_bcs :529-570)."""
    grid = cfg.grid
    ng = grid.ng
    for d in range(grid.ndims):
        stag = STAGGER[name][d]
        for hi in (False, True):
            bc = cfg.bc_field[2 * d + (1 if hi else 0)]
            if bc == const.BC.CONDUCT:
                # E: clamp normal component, zero-grad tangential;
                # B: zero-grad normal, clamp tangential.
                normal = (name in ("ex", "bx", "jx") and d == 0) or \
                         (name in ("ey", "by", "jy") and d == 1) or \
                         (name in ("ez", "bz", "jz") and d == 2)
                if is_b:
                    clamp = not normal
                else:
                    clamp = normal
                if clamp:
                    field = clamp_zero(field, d, grid.n[d], ng, stag, hi)
                else:
                    field = zero_gradient(field, d, grid.n[d], ng, stag, hi)
            elif bc in const.CLAMP_BCS:
                field = clamp_zero(field, d, grid.n[d], ng, stag, hi)
            elif bc in const.ZERO_GRAD_BCS:
                field = zero_gradient(field, d, grid.n[d], ng, stag, hi)
    return field


def efield_bcs(f: Fields, cfg) -> Fields:
    """boundary.F90:487-525."""
    ex = _apply_edge_bcs(field_bc(f.ex, "ex", cfg), "ex", cfg, is_b=False)
    ey = _apply_edge_bcs(field_bc(f.ey, "ey", cfg), "ey", cfg, is_b=False)
    ez = _apply_edge_bcs(field_bc(f.ez, "ez", cfg), "ez", cfg, is_b=False)
    return f._replace(ex=ex, ey=ey, ez=ez)


def bfield_bcs(f: Fields, cfg, mpi_only: bool) -> Fields:
    """boundary.F90:529-570."""
    bx = field_bc(f.bx, "bx", cfg)
    by = field_bc(f.by, "by", cfg)
    bz = field_bc(f.bz, "bz", cfg)
    if not mpi_only:
        bx = _apply_edge_bcs(bx, "bx", cfg, is_b=True)
        by = _apply_edge_bcs(by, "by", cfg, is_b=True)
        bz = _apply_edge_bcs(bz, "bz", cfg, is_b=True)
    return f._replace(bx=bx, by=by, bz=bz)


def current_summation_bcs(field, name: str, cfg):
    """Additive ghost-zone reduction after deposition
    (processor_summation_bcs + particle_periodic_bcs, boundary.F90:372-483).

    Periodic axes fold the ghost slabs back into the interior; reflecting
    particle boundaries fold with the appropriate sign
    (particle_reflection_bcs, boundary.F90:308-368).
    """
    grid = cfg.grid
    ng = grid.ng
    for d in range(grid.ndims):
        n = grid.n[d]
        # reflecting boundaries first (flip direction = normal component)
        for hi in (False, True):
            bc = cfg.bc_particle[2 * d + (1 if hi else 0)]
            if bc != const.BC.REFLECT:
                continue
            flip = (name == "jx" and d == 0) or (name == "jy" and d == 1) \
                or (name == "jz" and d == 2)
            if not hi:
                if flip:
                    # array(i) -= array(-i), i=1..ng-1 (mirror around f=0)
                    ghost = jnp.flip(
                        field[_sl(field, d, slice(0, ng - 1))], axis=d)
                    field = field.at[_sl(field, d, slice(ng, 2 * ng - 1))].add(-ghost)
                else:
                    # array(i) += array(1-i): mirror around the edge
                    ghost = jnp.flip(
                        field[_sl(field, d, slice(0, ng))], axis=d)
                    field = field.at[_sl(field, d, slice(ng, 2 * ng))].add(ghost)
                field = field.at[_sl(field, d, slice(0, ng))].set(0.0)
            else:
                centre = n + ng - 1
                if flip:
                    ghost = jnp.flip(
                        field[_sl(field, d, slice(centre + 1, centre + ng))], axis=d)
                    field = field.at[_sl(field, d, slice(centre - ng + 1, centre))].add(
                        -ghost)
                else:
                    ghost = jnp.flip(
                        field[_sl(field, d, slice(n + ng, n + 2 * ng))], axis=d)
                    field = field.at[_sl(field, d, slice(n, n + ng))].add(ghost)
                field = field.at[_sl(field, d, slice(n + ng, n + 2 * ng))].set(0.0)
        # periodic fold
        if cfg.bc_particle[2 * d] == const.BC.PERIODIC:
            hi_ghost = field[_sl(field, d, slice(n + ng, n + 2 * ng))]
            field = field.at[_sl(field, d, slice(ng, 2 * ng))].add(hi_ghost)
            lo_ghost = field[_sl(field, d, slice(0, ng))]
            field = field.at[_sl(field, d, slice(n, n + ng))].add(lo_ghost)
    return field


def current_bcs(f: Fields, cfg) -> Fields:
    """current_bcs (boundary.F90:802-811)."""
    return f._replace(
        jx=current_summation_bcs(f.jx, "jx", cfg),
        jy=current_summation_bcs(f.jy, "jy", cfg),
        jz=current_summation_bcs(f.jz, "jz", cfg),
    )


def particle_bcs(slab, sp_cfg, cfg, key=None):
    """Apply domain particle BCs to a species slab
    (particle_bcs, boundary.F90:599-798).

    Single-device version: periodic wrap / reflect / open-removal / thermal
    re-emission.  With sharding, inter-rank migration is implicit (particle
    decomposition) or a ppermute exchange (spatial decomposition tier).
    """
    import jax
    grid = cfg.grid
    x = slab.x
    p = slab.p
    alive = slab.alive
    weight = slab.weight
    for d in range(grid.ndims):
        lo_bc = sp_cfg.bc_particle[2 * d]
        hi_bc = sp_cfg.bc_particle[2 * d + 1]
        lo_field_cpml = cfg.bc_field[2 * d] in const.CPML_BCS
        hi_field_cpml = cfg.bc_field[2 * d + 1] in const.CPML_BCS
        xd = x[:, d]
        lo = grid.local_lo(d)
        hi = grid.local_hi(d)
        out_lo = grid.outer_lo(d)
        out_hi = grid.outer_hi(d)
        wrap = grid.wrap_length(d)

        for hi_side in (False, True):
            bc = hi_bc if hi_side else lo_bc
            field_cpml = hi_field_cpml if hi_side else lo_field_cpml
            if hi_side:
                beyond = xd >= hi
                beyond_outer = xd >= out_hi
                edge = grid.hi[d]
                outer_edge = out_hi
                sgn = 1.0
            else:
                beyond = xd < lo
                beyond_outer = xd < out_lo
                edge = grid.lo[d]
                outer_edge = out_lo
                sgn = -1.0
            if field_cpml:
                alive = alive & ~beyond_outer
            elif bc == const.BC.PERIODIC:
                xd = jnp.where(beyond, xd - sgn * wrap, xd)
            elif bc == const.BC.REFLECT:
                xd = jnp.where(beyond, 2.0 * edge - xd, xd)
                p = p.at[:, d].set(jnp.where(beyond, -p[:, d], p[:, d]))
            elif bc in (const.BC.THERMAL, const.BC.HEAT_BATH) \
                    and key is not None:
                # thermal re-emission (boundary.F90:664-694): reflect about
                # the outer edge, resample a flux-Maxwellian normal momentum
                # and Maxwellian transverse momenta at ext_temp
                from .slab_ops import sample_maxwellian_p, \
                    sample_flux_maxwellian_p
                key, k1, k2, k3 = jax.random.split(key, 4)
                temps = _ext_temp(sp_cfg, 2 * d + (1 if hi_side else 0))
                xd = jnp.where(beyond_outer, 2.0 * outer_edge - xd, xd)
                ks = (k1, k2, k3)
                for comp in range(3):
                    if comp == d:
                        newp = sample_flux_maxwellian_p(
                            ks[comp], sp_cfg.mass, temps[comp], 0.0,
                            -sgn, xd.shape)
                    else:
                        newp = sample_maxwellian_p(
                            ks[comp], sp_cfg.mass, temps[comp], 0.0,
                            xd.shape)
                    p = p.at[:, comp].set(
                        jnp.where(beyond_outer, newp, p[:, comp]))
            else:  # open: remove beyond the outer edge
                alive = alive & ~beyond_outer

        x = x.at[:, d].set(xd)
    weight = jnp.where(alive, weight, 0.0)
    return slab._replace(x=x, p=p, alive=alive, weight=weight)


def _ext_temp(sp_cfg, boundary):
    """Boundary temperatures (species_temp at the edge, helper.F90:42-45)."""
    if sp_cfg.ext_temp and len(sp_cfg.ext_temp) > boundary:
        return sp_cfg.ext_temp[boundary]
    return (0.0, 0.0, 0.0)
