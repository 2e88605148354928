"""Explicit shard_map + ppermute halo tier.

The default multi-chip path (parallel/sharding.py) pins NamedShardings on
the step and lets GSPMD insert the halo collectives for the stencil
rolls.  This module is the *explicit* tier — the direct analogue of the
reference's hand-written nearest-neighbour machinery — for when the
compiler's choices need to be overridden at scale:

* ``exchange_pad``     ≙ ``do_field_mpi_with_lengths`` halo exchange
                         (boundary.F90:156-318): pad a shard-local block
                         with ``width`` cells per side received from the
                         ring neighbours via ``lax.ppermute``.
* ``fold_halo_sum``    ≙ ``processor_summation_bcs`` (boundary.F90:783-806):
                         additive reverse exchange — ghost accumulations
                         travel back to their owners and are summed.
* ``shardmap_fields_half`` / ``shardmap_fields_b_then_e`` — the two
  Maxwell half-steps of the main loop run under ``shard_map`` over the
  device mesh with the halos above, numerically identical to the global
  (GSPMD) implementation for periodic field BCs.

All functions assume the mesh axes named in ``mesh.axis_names`` map onto
the leading grid dimensions in order (the same convention as
parallel/sharding.state_shardings).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:                      # older jax
    from jax.experimental.shard_map import shard_map

from .. import constants as const


def _ring(n):
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    return fwd, bwd


def exchange_pad(block, axis_name: str, axis: int, width: int):
    """Pad ``block`` along array ``axis`` with ``width`` cells per side
    taken from the ring neighbours over mesh axis ``axis_name``.

    Must be called inside shard_map.  Periodic by construction (the ring
    wraps), exactly like the reference's periodic neighbour table
    (mpi_routines.F90:179-272); physical BCs overwrite the outer ghosts
    afterwards just as field_bc does after the MPI exchange.
    """
    n_dev = jax.lax.axis_size(axis_name)
    sl_lo = [slice(None)] * block.ndim
    sl_lo[axis] = slice(0, width)
    sl_hi = [slice(None)] * block.ndim
    sl_hi[axis] = slice(block.shape[axis] - width, block.shape[axis])
    if n_dev == 1:
        left = block[tuple(sl_hi)]
        right = block[tuple(sl_lo)]
    else:
        fwd, bwd = _ring(n_dev)
        # my high edge becomes my right neighbour's left ghost
        left = jax.lax.ppermute(block[tuple(sl_hi)], axis_name, fwd)
        right = jax.lax.ppermute(block[tuple(sl_lo)], axis_name, bwd)
    return jnp.concatenate([left, block, right], axis=axis)


def fold_halo_sum(padded, axis_name: str, axis: int, width: int):
    """Inverse of exchange_pad for accumulations: the ``width`` margin
    cells on each side are sent to the owning neighbour and added onto
    its edge (processor_summation_bcs, boundary.F90:783-806).  Returns
    the interior block."""
    n_dev = jax.lax.axis_size(axis_name)
    n = padded.shape[axis] - 2 * width

    def sl(a, b):
        s = [slice(None)] * padded.ndim
        s[axis] = slice(a, b)
        return tuple(s)

    lo_margin = padded[sl(0, width)]
    hi_margin = padded[sl(n + width, n + 2 * width)]
    if n_dev == 1:
        from_left = hi_margin
        from_right = lo_margin
    else:
        fwd, bwd = _ring(n_dev)
        from_left = jax.lax.ppermute(hi_margin, axis_name, fwd)
        from_right = jax.lax.ppermute(lo_margin, axis_name, bwd)
    core = padded[sl(width, n + width)]
    core = core.at[sl(0, width)].add(from_left)
    core = core.at[sl(n - width, n)].add(from_right)
    return core


def _mesh_grid_axes(mesh: Mesh, ndims: int):
    """(grid axis, mesh axis name) pairs, sharding.state_shardings order."""
    out = []
    for d, nm in enumerate(("x", "y", "z")[:ndims]):
        if nm in mesh.axis_names:
            out.append((d, nm))
    return out


def make_shardmap_fields_half(cfg, mesh: Mesh):
    """Build fields_half (E+dt/2, E-bcs, B+dt/2, B-bcs) as a shard_map
    over ``mesh`` with explicit ppermute halos.

    Supports all-periodic field BCs (the exchange ring IS the periodic
    wrap).  Works on the interior views of the ghost-padded global
    arrays; the returned function reproduces the global implementation's
    padded arrays bit-for-bit (interior by the same curl arithmetic,
    ghosts by the same periodic fill).
    """
    from ..core import fields as fld
    from ..core import boundaries as bnd

    if any(bc != const.BC.PERIODIC for bc in cfg.bc_field[:2 * cfg.ndims]):
        raise NotImplementedError(
            "explicit halo tier: periodic field BCs only")
    if cfg.any_cpml:
        raise NotImplementedError("explicit halo tier: no CPML")

    grid = cfg.grid
    ng = grid.ng
    nd = grid.ndims
    pairs = _mesh_grid_axes(mesh, nd)
    plan = fld.FieldSolverPlan(cfg)
    order = cfg.field_order

    interior = tuple(slice(ng, ng + n) for n in grid.n)

    in_spec = P(*[next((nm for (dd, nm) in pairs if dd == d), None)
                  for d in range(nd)])

    def pad_all(a):
        for d, nm in pairs:
            a = exchange_pad(a, nm, d, ng)
        # axes with no mesh dimension: periodic wrap locally
        for d in range(nd):
            if not any(dd == d for dd, _ in pairs):
                sl_lo = [slice(None)] * nd
                sl_lo[d] = slice(0, ng)
                sl_hi = [slice(None)] * nd
                sl_hi[d] = slice(a.shape[d] - ng, a.shape[d])
                a = jnp.concatenate([a[tuple(sl_hi)], a, a[tuple(sl_lo)]],
                                    axis=d)
        return a

    core = tuple([slice(ng, -ng)] * nd)

    def local_e_update(e, b, j):
        """E update on locally-padded blocks, returning padded blocks
        (ghosts consistent by construction — every shard computed its
        neighbours' edge values from the same exchanged data)."""
        de = [-plan.fac * j[c] for c in range(3)]
        for (c, d, eidx, s) in fld._eps_pairs(nd):
            de[c] = de[c] + s * plan.cn[d] * fld.d_minus(b[eidx], d, order)
        return [e[c] + de[c] for c in range(3)]

    def local_b_update(e, b):
        enhanced = (order == 2
                    and cfg.maxwell_solver != const.MaxwellSolver.YEE)
        db = [jnp.zeros_like(b[c]) for c in range(3)]
        for (c, d, eidx, s) in fld._eps_pairs(nd):
            if enhanced:
                trans = tuple(a for a in range(nd) if a != d)
                dterm = fld.d_plus_enhanced(e[eidx], d, cfg, trans)
            else:
                dterm = fld.d_plus(e[eidx], d, order)
            db[c] = db[c] - s * plan.hdtd[d] * dterm
        return [b[c] + db[c] for c in range(3)]

    def body(ex, ey, ez, bx, by, bz, jx, jy, jz):
        e = [pad_all(a) for a in (ex, ey, ez)]
        b = [pad_all(a) for a in (bx, by, bz)]
        j = [pad_all(a) for a in (jx, jy, jz)]
        e = local_e_update(e, b, j)
        e = [a[core] for a in e]
        # re-exchange E halos before the B curl (efield_bcs analogue)
        e = [pad_all(a) for a in e]
        b = local_b_update(e, b)
        return tuple(a[core] for a in e) + tuple(a[core] for a in b)

    mapped = shard_map(
        body, mesh=mesh,
        in_specs=(in_spec,) * 9,
        out_specs=(in_spec,) * 6)

    def fields_half(state):
        f = state.fields
        args = [getattr(f, nm)[interior]
                for nm in ("ex", "ey", "ez", "bx", "by", "bz",
                           "jx", "jy", "jz")]
        ex, ey, ez, bx, by, bz = mapped(*args)
        out = {}
        for nm, a in zip(("ex", "ey", "ez", "bx", "by", "bz"),
                         (ex, ey, ez, bx, by, bz)):
            padded = getattr(f, nm).at[interior].set(a)
            out[nm] = bnd.field_bc(padded, nm, cfg)
        return state._replace(fields=f._replace(**out))

    return fields_half
