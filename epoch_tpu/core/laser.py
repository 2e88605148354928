"""Laser boundary sources and Silver-Müller outflow BCs.

Re-implements ``epoch1d/src/laser.f90`` (and the 2d/3d profile variants):
lasers attach to a boundary and are injected through an outflow
characteristic solve on the tangential B components at the boundary row;
``simple_outflow`` is the same formula with zero source.

The sources are evaluated inside jit from compiled deck expressions, so
time-profiles, chirped phases and transverse profiles all trace into the
step function.
"""
from __future__ import annotations

import jax.numpy as jnp

from .. import constants as const
from .state import Fields


def _transverse_coords(grid, axis, dtype):
    """Meshgrid of transverse cell-centre coordinates, padded shape."""
    import numpy as np
    tdims = [d for d in range(grid.ndims) if d != axis]
    if not tdims:
        return {}
    cs = [grid.centres(d, ghosts=True) for d in tdims]
    names = ["x", "y", "z"]
    if len(cs) == 1:
        return {names[tdims[0]]: jnp.asarray(cs[0].astype(dtype))}
    X, Y = np.meshgrid(cs[0], cs[1], indexing="ij")
    return {names[tdims[0]]: jnp.asarray(X.astype(dtype)),
            names[tdims[1]]: jnp.asarray(Y.astype(dtype))}


def laser_sources(cfg, bd, time, phases, dtype, ctx_coords):
    """Σ over lasers on boundary ``bd`` of amp·t_profile·profile·
    sin(∫ω dt + phase) split into the two polarisation components
    (laser.f90:outflow_bcs_* source loop)."""
    source1 = 0.0
    source2 = 0.0
    for i, las in enumerate(cfg.lasers):
        if las.boundary != bd:
            continue
        ctx = dict(ctx_coords)
        ctx["time"] = time
        t_env = las.amp
        if las.t_profile is not None:
            t_env = t_env * las.t_profile(ctx, xp=jnp)
        profile = 1.0
        if las.profile is not None:
            profile = las.profile(ctx, xp=jnp)
        phase = 0.0
        if las.phase is not None:
            phase = las.phase(ctx, xp=jnp)
        if las.omega_fn is not None:
            integral_phase = phases[i]
        else:
            integral_phase = las.omega * time
        base = t_env * profile * jnp.sin(integral_phase + phase)
        active = jnp.logical_and(time >= las.t_start, time <= las.t_end)
        base = jnp.where(active, base, 0.0)
        source1 = source1 + base * jnp.cos(las.pol_angle)
        source2 = source2 + base * jnp.sin(las.pol_angle)
    return source1, source2


def _row(arr, axis, idx):
    sl = [slice(None)] * arr.ndim
    sl[axis] = idx
    return tuple(sl)


def outflow_bcs_x(f: Fields, cfg, state, dt, time, hi: bool, dtype):
    """outflow_bcs_x_min / x_max (laser.f90:325-485).

    Solves the incoming characteristic for the tangential B row just outside
    the domain, with optional laser source terms; axis = x. ``dt`` is passed
    explicitly because the init-time call uses dt/2 (epoch1d.F90:154-158).
    """
    grid = cfg.grid
    ng = grid.ng
    bd = const.BD_X_MAX if hi else const.BD_X_MIN
    bc = cfg.bc_field[bd]
    # Fortran laser row index (laser.f90:333-338,432-437)
    if bc == const.BC.CPML_LASER:
        # boundary.F90:896-900, 960-965 (single-domain: nx_global_min = 1)
        lp_f = (grid.n[0] - grid.cpml_thickness - cfg.fng + 1) if hi \
            else (grid.cpml_thickness + cfg.fng)
    else:
        lp_f = grid.n[0] if hi else 1
    lp = lp_f + ng - 1      # python index of the boundary row
    dx = grid.delta[0]
    dtc2 = dt * const.c ** 2
    lx = dtc2 / dx
    s = 1.0 / (lx + const.c)
    diff = lx - const.c
    dt_eps = dt / const.epsilon0

    ctx_coords = _transverse_coords(grid, 0, dtype)
    src1, src2 = laser_sources(cfg, bd, time, state.lasers.integral_phase,
                               dtype, ctx_coords)

    bcf = state.bc_fields
    key = "x_max" if hi else "x_min"

    if not hi:
        bx = f.bx.at[_row(f.bx, 0, lp - 1)].set(bcf[f"bx_{key}"])
        bz_new = s * (4.0 * src1
                      + 2.0 * (bcf[f"ey_{key}"] + const.c * bcf[f"bz_{key}"])
                      - 2.0 * f.ey[_row(f.ey, 0, lp)]
                      + dt_eps * f.jy[_row(f.jy, 0, lp)]
                      + diff * f.bz[_row(f.bz, 0, lp)])
        by_new = s * (-4.0 * src2
                      - 2.0 * (bcf[f"ez_{key}"] - const.c * bcf[f"by_{key}"])
                      + 2.0 * f.ez[_row(f.ez, 0, lp)]
                      - dt_eps * f.jz[_row(f.jz, 0, lp)]
                      + diff * f.by[_row(f.by, 0, lp)])
        bz = f.bz.at[_row(f.bz, 0, lp - 1)].set(bz_new)
        by = f.by.at[_row(f.by, 0, lp - 1)].set(by_new)
    else:
        bx = f.bx.at[_row(f.bx, 0, lp + 1)].set(bcf[f"bx_{key}"])
        bz_new = s * (-4.0 * src1
                      - 2.0 * (bcf[f"ey_{key}"] - const.c * bcf[f"bz_{key}"])
                      + 2.0 * f.ey[_row(f.ey, 0, lp)]
                      - dt_eps * f.jy[_row(f.jy, 0, lp)]
                      + diff * f.bz[_row(f.bz, 0, lp - 1)])
        by_new = s * (4.0 * src2
                      + 2.0 * (bcf[f"ez_{key}"] + const.c * bcf[f"by_{key}"])
                      - 2.0 * f.ez[_row(f.ez, 0, lp)]
                      + dt_eps * f.jz[_row(f.jz, 0, lp)]
                      + diff * f.by[_row(f.by, 0, lp - 1)])
        bz = f.bz.at[_row(f.bz, 0, lp)].set(bz_new)
        by = f.by.at[_row(f.by, 0, lp)].set(by_new)
    return f._replace(bx=bx, by=by, bz=bz)


def update_laser_phases(cfg, state, dt):
    """update_laser_omegas (laser.f90:215-250): advance ∫ω dt for lasers
    with time-varying omega; constant-ω lasers use ω·time directly."""
    phases = state.lasers.integral_phase
    if not any(l.omega_fn is not None for l in cfg.lasers):
        return phases
    new = []
    for i, las in enumerate(cfg.lasers):
        if las.omega_fn is not None:
            om = las.omega_fn({"time": state.time}, xp=jnp)
            new.append(phases[i] + om * dt)
        else:
            new.append(las.omega * state.time)
    return jnp.stack(new)
