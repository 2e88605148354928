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
    from . import loader
    # add_laser gating (boundary.F90:41-49): sources inject only through
    # a laser-type BC.  When the moving window replaces the boundary
    # with an outflow BC (window.F90:358-368, applied at build time in
    # sim.build_config) the attached lasers stop firing.
    if cfg.bc_field[bd] not in (const.BC.SIMPLE_LASER,
                                const.BC.CPML_LASER):
        return source1, source2
    for i, las in enumerate(cfg.lasers):
        if las.boundary != bd:
            continue
        ctx = dict(ctx_coords)
        ctx["time"] = time
        loader._add_geom_ctx(ctx, cfg.grid, time)
        t_env = las.amp
        if las.t_profile is not None:
            t_env = t_env * las.t_profile(ctx, xp=jnp)
        else:
            # no deck t_profile: the user custom hook is the fallback,
            # exactly the reference's dispatch (laser.f90:191-197 →
            # custom_laser.f90 custom_laser_time_profile, default 1)
            from ..extensions import LASER_TIME_PROFILE
            for hook in LASER_TIME_PROFILE:
                t_env = t_env * hook(las, ctx, jnp)
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


def outflow_bcs(f: Fields, cfg, state, dt, time, axis, hi: bool, dtype):
    """outflow_bcs_{x,y,z}_{min,max} (1d laser.f90:325-485; the 2d/3d
    variants add the transverse-derivative cross terms, e.g. 3d x_min
    laser.f90 ``- lz*(bx(lp,:,k)-bx(lp,:,k-1))`` in the bz row and
    ``- ly*(bx(lp,j,:)-bx(lp,j-1,:))`` in the by row).

    Solves the incoming characteristic for the two tangential B rows just
    outside the domain, with optional laser source terms.  For boundary
    axis a with cyclic transverse axes t1=(a+1)%3, t2=(a+2)%3 the min-side
    update is (verified against all three reference dimensionalities):

        b_{t2}' = s*( 4*src1 + 2*(E_{t1,s} + c*B_{t2,s}) - 2*e_{t1}
                      - l_{t2}*d_{t2} b_a + dt/eps0*j_{t1} + diff*b_{t2})
        b_{t1}' = s*(-4*src2 - 2*(E_{t2,s} - c*B_{t1,s}) + 2*e_{t2}
                      - l_{t1}*d_{t1} b_a - dt/eps0*j_{t2} + diff*b_{t1})

    and the max side mirrors every sign except diff.  ``dt`` is passed
    explicitly because the init-time call uses dt/2 (epoch1d.F90:154-158).
    """
    grid = cfg.grid
    nd = grid.ndims
    ng = grid.ng
    bd = 2 * axis + (1 if hi else 0)
    bc = cfg.bc_field[bd]
    # Fortran laser row index (laser.f90:333-338,432-437)
    if bc == const.BC.CPML_LASER:
        # boundary.F90:896-900, 960-965 (single-domain: n_global_min = 1)
        lp_f = (grid.n[axis] - grid.cpml_thickness - cfg.fng + 1) if hi \
            else (grid.cpml_thickness + cfg.fng)
    else:
        lp_f = grid.n[axis] if hi else 1
    lp = lp_f + ng - 1      # python index of the boundary row
    d_ax = grid.delta[axis]
    dtc2 = dt * const.c ** 2
    l_ax = dtc2 / d_ax
    s = 1.0 / (l_ax + const.c)
    diff = l_ax - const.c
    dt_eps = dt / const.epsilon0

    ctx_coords = _transverse_coords(grid, axis, dtype)
    from . import loader as _ldr
    _ldr._add_geom_ctx(ctx_coords, grid)
    src1, src2 = laser_sources(cfg, bd, time, state.lasers.integral_phase,
                               dtype, ctx_coords)

    bcf = state.bc_fields
    names = ["x", "y", "z"]
    key = f"{names[axis]}_{'max' if hi else 'min'}"
    t1, t2 = (axis + 1) % 3, (axis + 2) % 3
    e = [f.ex, f.ey, f.ez]
    b = [f.bx, f.by, f.bz]
    j = [f.jx, f.jy, f.jz]
    bn = ["bx", "by", "bz"]
    en = ["ex", "ey", "ez"]

    def row(arr, idx):
        return arr[_row(arr, axis, idx)]

    def dtrans(arr, t, idx):
        """d/dt-axis backward difference of arr's boundary row, scaled
        by dt*c²/delta_t; zero when the axis doesn't exist (1d/2d)."""
        if t >= nd:
            return 0.0
        r = row(arr, idx)
        tt = t if t < axis else t - 1     # axis position in the row slice
        shifted = jnp.roll(r, 1, axis=tt)
        return (dtc2 / grid.delta[t]) * (r - shifted)

    sgn = -1.0 if hi else 1.0
    out = lp + 1 if hi else lp - 1          # row written outside the domain
    dref = lp - 1 if hi else lp             # row feeding the diff term

    b_axis_new = b[axis].at[_row(b[axis], axis, out)].set(
        bcf[f"{bn[axis]}_{key}"])
    bt2_new = s * (sgn * 4.0 * src1
                   + 2.0 * sgn * bcf[f"{en[t1]}_{key}"]
                   + 2.0 * const.c * bcf[f"{bn[t2]}_{key}"]
                   - sgn * 2.0 * row(e[t1], lp)
                   - sgn * dtrans(b[axis], t2, lp)
                   + sgn * dt_eps * row(j[t1], lp)
                   + diff * row(b[t2], dref))
    bt1_new = s * (-sgn * 4.0 * src2
                   - 2.0 * sgn * bcf[f"{en[t2]}_{key}"]
                   + 2.0 * const.c * bcf[f"{bn[t1]}_{key}"]
                   + sgn * 2.0 * row(e[t2], lp)
                   - sgn * dtrans(b[axis], t1, lp)
                   - sgn * dt_eps * row(j[t2], lp)
                   + diff * row(b[t1], dref))
    wrow = lp if hi else lp - 1             # written tangential-B row
    upd = {bn[axis]: b_axis_new}
    # stored bc_fields rows can be f64 under x64 configs; pin before the
    # row scatter into the f32 field (future JAX makes this an error)
    upd[bn[t2]] = b[t2].at[_row(b[t2], axis, wrow)].set(
        jnp.asarray(bt2_new, b[t2].dtype))
    upd[bn[t1]] = b[t1].at[_row(b[t1], axis, wrow)].set(
        jnp.asarray(bt1_new, b[t1].dtype))
    return f._replace(**upd)


def outflow_bcs_x(f: Fields, cfg, state, dt, time, hi: bool, dtype):
    """Backwards-compatible x-axis wrapper."""
    return outflow_bcs(f, cfg, state, dt, time, 0, hi, dtype)


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


def absorption_increments(f: Fields, cfg, state, dt, time, axis, hi, dtype):
    """Poynting-flux energy bookkeeping at an outflow boundary
    (calc_absorption, laser.f90:435-478): returns (d_absorb, d_inject).

    Cell-centred field rows are used for every component (the reference
    itself notes exact face-centring is impossible at open boundaries);
    transverse staggering averages are dropped — a diagnostic-level
    simplification."""
    grid = cfg.grid
    ng = grid.ng
    bd = 2 * axis + (1 if hi else 0)
    n = grid.n[axis]
    ibc = (n if hi else 1) + ng - 1
    direc = -1.0 if hi else 1.0
    dd = 1.0
    for d in range(grid.ndims):
        if d != axis:
            dd *= grid.delta[d]
    t1, t2 = (axis + 1) % 3, (axis + 2) % 3
    e = [f.ex, f.ey, f.ez]
    b = [f.bx, f.by, f.bz]

    def row(arr, idx):
        sl = [slice(None)] * arr.ndim
        sl[axis] = idx
        return arr[tuple(sl)]

    def interior_t(rowarr):
        sl = []
        k = 0
        for d in range(grid.ndims):
            if d == axis:
                continue
            sl.append(slice(ng, ng + grid.n[d]))
        return rowarr[tuple(sl)] if sl else rowarr

    e1 = interior_t(row(e[t1], ibc))
    e2 = interior_t(row(e[t2], ibc))
    b1 = interior_t(0.5 * (row(b[t2], ibc - 1) + row(b[t2], ibc)))
    b2 = interior_t(0.5 * (row(b[t1], ibc - 1) + row(b[t1], ibc)))
    factor = dt * dd * direc
    d_absorb = (factor / const.mu0) * jnp.sum(e1 * b1 - e2 * b2)

    d_inject = jnp.zeros((), dtype)
    ctx_coords = _transverse_coords(grid, axis, dtype)
    from . import loader as _ldr
    _ldr._add_geom_ctx(ctx_coords, grid)
    from . import loader
    for i, las in enumerate(cfg.lasers):
        if las.boundary != bd:
            continue
        ctx = dict(ctx_coords)
        ctx["time"] = time
        loader._add_geom_ctx(ctx, cfg.grid, time)
        t_env = 1.0
        if las.t_profile is not None:
            t_env = las.t_profile(ctx, xp=jnp)
        else:
            from ..extensions import LASER_TIME_PROFILE
            for hook in LASER_TIME_PROFILE:
                t_env = t_env * hook(las, ctx, jnp)
        profile = jnp.asarray(1.0, dtype)
        if las.profile is not None:
            profile = las.profile(ctx, xp=jnp) * jnp.ones_like(e1)
        active = jnp.logical_and(time >= las.t_start, time <= las.t_end)
        lfac = 0.5 * const.epsilon0 * const.c * factor \
            * (t_env * las.amp) ** 2
        d_inject = d_inject + jnp.where(
            active, lfac * jnp.sum(profile ** 2 * jnp.ones_like(e1)), 0.0)
    return d_absorb, d_inject
