"""Particle push + charge-conserving current deposition — the hot core.

Re-designs ``epoch{1,2,3}d/src/particles.F90:push_particles`` for TPU:
instead of a per-particle linked-list walk with scalar scatter, the whole
species slab is processed as dense SoA array ops — field gather as batched
takes, Boris rotation as vector arithmetic, and the PSC charge-conserving
deposition (solving dρ/dt = −∇·J via prefix sums of shape-function
differences, particles.F90:397-514) as windowed outer products + cumulative
sums + one scatter-add per current component.  XLA keeps everything fused;
the scatter-add is the remaining irregular op (a cell-sorted segment-sum /
Pallas path replaces it in the perf tier, epoch_tpu/ops).

The deposition window is the static ``support+2`` footprint; trailing window
cells receive exactly zero because sum(hx−gx) = 0, so no dcell-dependent
bounds are needed (equivalent to the xmin/xmax logic at particles.F90:439-440).
"""
from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants as const
from . import shapes
from .state import Fields, ParticleSlab

THIRD = 1.0 / 3.0


def _flat_index(cells, strides):
    """Combine per-axis (N, W) index arrays into flat indices (N, W**nd).
    ``strides[d]`` = prod(padded_shape[d+1:])."""
    nd = len(cells)
    if nd == 1:
        return cells[0]
    if nd == 2:
        return (cells[0][:, :, None] * strides[0] + cells[1][:, None, :]
                ).reshape(cells[0].shape[0], -1)
    return (cells[0][:, :, None, None] * strides[0]
            + cells[1][:, None, :, None] * strides[1]
            + cells[2][:, None, None, :]).reshape(cells[0].shape[0], -1)


def gather_field(field, base_cells, weights, strides):
    """Interpolate a grid field to particles.

    ``base_cells``: per-axis (N,) cell indices; ``weights``: per-axis (N, S)
    support weights.  Implements include/<shape>/e_part.inc, b_part.inc.
    """
    nd = len(base_cells)
    offs = jnp.asarray(shapes.support_offsets_cache[weights[0].shape[1]])
    idx = [base_cells[d][:, None] + offs[None, :] for d in range(nd)]
    flat = field.reshape(-1)
    if nd == 1:
        vals = flat[idx[0]]                                # (N, S)
        return jnp.sum(vals * weights[0], axis=1)
    if nd == 2:
        fi = idx[0][:, :, None] * strides[0] + idx[1][:, None, :]
        vals = flat[fi]                                    # (N, S, S)
        w = weights[0][:, :, None] * weights[1][:, None, :]
        return jnp.sum(vals * w, axis=(1, 2))
    fi = (idx[0][:, :, None, None] * strides[0]
          + idx[1][:, None, :, None] * strides[1]
          + idx[2][:, None, None, :])
    vals = flat[fi]
    w = (weights[0][:, :, None, None] * weights[1][:, None, :, None]
         * weights[2][:, None, None, :])
    return jnp.sum(vals * w, axis=(1, 2, 3))


def gather_centred(padded, cfg, slab):
    """Cell-centred grid variable at the particles with the particle shape
    (grid_centred_var_at_particle, bremsstrahlung.F90:718-760; also the
    fluid-grid lookup in particle_migration.F90:144-153)."""
    grid = cfg.grid
    pplan = PushPlan(cfg)
    nd = grid.ndims
    cells, ws = [], []
    for d in range(nd):
        rel = slab.x[:, d] - grid.grid_min(d)
        c, cf = shapes.cell_and_frac(rel, 1.0 / grid.delta[d],
                                     grid.shape_fn, grid.ng, False)
        cells.append(jnp.clip(c, 0, grid.padded_shape()[d] - 1))
        ws.append(shapes.support_weights(grid.shape_fn, cf))
    return pplan.fac * gather_field(padded, cells, ws, pplan.strides)


class PushPlan:
    """Static per-run scalars for the pusher (particles.F90:145-153)."""

    def __init__(self, cfg):
        grid = cfg.grid
        self.nd = grid.ndims
        self.shape = grid.shape_fn
        self.ng = grid.ng
        self.dt = cfg.dt
        self.idelta = tuple(1.0 / d for d in grid.delta)
        self.fac = shapes.FAC_1D[self.shape] ** self.nd
        self.dto2 = cfg.dt / 2.0
        self.dtco2 = const.c * self.dto2
        self.dtfac = 0.5 * cfg.dt * self.fac
        self.grid_min = tuple(grid.grid_min(d) for d in range(self.nd))
        self.padded = grid.padded_shape()
        self.strides = tuple(
            int(np.prod(self.padded[d + 1:])) for d in range(self.nd))
        # current prefactors (1d particles.F90:145-153; 2d :152-162)
        d = grid.delta
        if self.nd == 1:
            self.fj = (self.fac / cfg.dt,
                       self.fac / d[0],
                       self.fac / d[0])
        elif self.nd == 2:
            self.fj = (self.fac / (cfg.dt * d[1]),
                       self.fac / (cfg.dt * d[0]),
                       self.fac / (d[0] * d[1]))
        else:
            self.fj = (self.fac / (cfg.dt * d[1] * d[2]),
                       self.fac / (cfg.dt * d[0] * d[2]),
                       self.fac / (cfg.dt * d[0] * d[1]))


# cache mapping support length → offsets (for gather_field)
shapes.support_offsets_cache = {
    len(shapes.support_offsets(s)): shapes.support_offsets(s)
    for s in (const.Shape.TOPHAT, const.Shape.TRIANGLE, const.Shape.BSPLINE3)
}


def push_species(fields: Fields, slab: ParticleSlab, sp, plan: PushPlan,
                 higuera_cary: bool = False):
    """Advance one species by dt and return (new_slab, (djx, djy, djz))
    contributions on the padded grid.

    Algorithm: particles.F90:199-514 (gather → half E kick → Boris/HC
    rotation → half E kick → move → PSC current deposition).
    """
    nd = plan.nd
    shp = plan.shape
    ng = plan.ng
    x = slab.x
    p = slab.p
    w = slab.weight
    q = sp.charge
    mass = sp.mass
    part_mc = const.c * mass
    ipart_mc = 1.0 / part_mc
    cmratio = q * plan.dtfac * ipart_mc
    ccmratio = const.c * cmratio

    rel = [x[:, d] - plan.grid_min[d] for d in range(nd)]
    u = [p[:, i] * ipart_mc for i in range(3)]

    gamma = jnp.sqrt(u[0] ** 2 + u[1] ** 2 + u[2] ** 2 + 1.0)
    gamma0 = gamma        # γ(t) — first work term (particles.F90:250-258)
    root = plan.dtco2 / gamma
    for d in range(nd):
        rel[d] = rel[d] + u[d] * root

    # two stagger sets of cells/weights per axis (particles.F90:248-287)
    cell1, g_w, cell2, h_w = [], [], [], []
    for d in range(nd):
        c1, cf1 = shapes.cell_and_frac(rel[d], plan.idelta[d], shp, ng, False)
        c2, cf2 = shapes.cell_and_frac(rel[d], plan.idelta[d], shp, ng, True)
        cell1.append(c1)
        cell2.append(c2)
        g_w.append(shapes.support_weights(shp, cf1))
        h_w.append(shapes.support_weights(shp, cf2))

    # gather E, B with the per-field stagger pattern; normalise by fac here
    # (the reference folds fac into cmratio, equivalent)
    def gat(field, name):
        from .boundaries import STAGGER
        stag = STAGGER[name]
        cells = [cell2[d] if stag[d] else cell1[d] for d in range(nd)]
        ws = [h_w[d] if stag[d] else g_w[d] for d in range(nd)]
        return plan.fac * gather_field(field, cells, ws, plan.strides)

    ex_p = gat(fields.ex, "ex")
    ey_p = gat(fields.ey, "ey")
    ez_p = gat(fields.ez, "ez")
    bx_p = gat(fields.bx, "bx")
    by_p = gat(fields.by, "by")
    bz_p = gat(fields.bz, "bz")

    fac_inv = 1.0 / plan.fac
    cm = cmratio * fac_inv      # q*dt/(2 m c)
    ccm = ccmratio * fac_inv

    # half E kick (particles.F90:304-306)
    uxm = u[0] + cm * ex_p
    uym = u[1] + cm * ey_p
    uzm = u[2] + cm * ez_p

    if higuera_cary:
        # Higuera–Cary (particles.F90:308-320, PoP 24, 052104 (2017))
        g2 = uxm ** 2 + uym ** 2 + uzm ** 2 + 1.0
        # beta = alpha * B at the particle (particles.F90:336-339;
        # the gathered bx_p is already the physical field)
        alpha = 0.5 * q * plan.dt / mass
        beta = (alpha * bx_p, alpha * by_p, alpha * bz_p)
        beta2 = beta[0] ** 2 + beta[1] ** 2 + beta[2] ** 2
        sigma = g2 - beta2
        bdotu = beta[0] * uxm + beta[1] * uym + beta[2] * uzm
        g2 = sigma + jnp.sqrt(sigma ** 2 + 4.0 * (beta2 + bdotu ** 2))
        gamma = jnp.sqrt(0.5 * g2)
    else:
        gamma = jnp.sqrt(uxm ** 2 + uym ** 2 + uzm ** 2 + 1.0)

    # Boris rotation (particles.F90:322-345)
    root = ccm / gamma
    taux = bx_p * root
    tauy = by_p * root
    tauz = bz_p * root
    taux2, tauy2, tauz2 = taux ** 2, tauy ** 2, tauz ** 2
    tau = 1.0 / (1.0 + taux2 + tauy2 + tauz2)
    uxp = ((1.0 + taux2 - tauy2 - tauz2) * uxm
           + 2.0 * ((taux * tauy + tauz) * uym + (taux * tauz - tauy) * uzm)) * tau
    uyp = ((1.0 - taux2 + tauy2 - tauz2) * uym
           + 2.0 * ((tauy * tauz + taux) * uzm + (tauy * taux - tauz) * uxm)) * tau
    uzp = ((1.0 - taux2 - tauy2 + tauz2) * uzm
           + 2.0 * ((tauz * taux + tauy) * uxm + (tauz * tauy - taux) * uym)) * tau

    # second half E kick (particles.F90:347-350)
    ux = uxp + cm * ex_p
    uy = uyp + cm * ey_p
    uz = uzp + cm * ez_p

    u2 = ux ** 2 + uy ** 2 + uz ** 2
    gamma = jnp.sqrt(u2 + 1.0)
    root = const.c / gamma
    uvec = (ux, uy, uz)
    delta = [uvec[d] * root * plan.dto2 for d in range(nd)]
    vy = uy * root
    vz = uz * root

    for d in range(nd):
        rel[d] = rel[d] + delta[d]

    new_x = jnp.stack(
        [rel[d] + plan.grid_min[d] for d in range(nd)], axis=1)
    new_p = jnp.stack([ux, uy, uz], axis=1) * part_mc

    new_work = slab.work
    if new_work is not None:
        # WORK_DONE_INTEGRATED (particles.F90:396-411): per-direction
        # field work this step, trapezoidal in the velocity —
        # E_part · (u(t)/γ(t) + u(t+dt)/γ(t+dt)) · q·dt/(2mc).  "Results
        # correspond with the electron's gamma factor": Σ_c work_c over
        # a step equals Δγ.  ex_p carries plan.fac and cm divides it
        # back out, so the product matches the reference's raw
        # ex_part·cmratio exactly.
        ig0 = 1.0 / gamma0
        ign = 1.0 / gamma
        wx = ex_p * cm * (u[0] * ig0 + ux * ign)
        wy = ey_p * cm * (u[1] * ig0 + uy * ign)
        wz = ez_p * cm * (u[2] * ig0 + uz * ign)
        live = slab.alive
        wx = jnp.where(live, wx, 0.0)
        wy = jnp.where(live, wy, 0.0)
        wz = jnp.where(live, wz, 0.0)
        new_work = jnp.stack(
            [wx, wy, wz,
             new_work[:, 3] + wx, new_work[:, 4] + wy,
             new_work[:, 5] + wz], axis=1)

    # ---- current deposition at t+1.5dt (particles.F90:397-514) ----
    if sp.zero_current or sp.immobile:
        return slab._replace(x=new_x, p=new_p, work=new_work), None

    rel3 = [rel[d] + delta[d] for d in range(nd)]
    gw5, hw5, cells_w = [], [], []
    offs = jnp.asarray(shapes.window_offsets(shp))
    wlen = offs.shape[0]
    for d in range(nd):
        c3, cf3 = shapes.cell_and_frac(rel3[d], plan.idelta[d], shp, ng, False)
        dcell = c3 - cell1[d]
        h5 = shapes.window_weights(shp, cf3, dcell)
        # gx on the window: the support weights from the pre-move position,
        # zero-padded one cell each side (window = [sf_min-1, sf_max+1])
        g5 = jnp.pad(g_w[d], ((0, 0), (1, 1)))
        hw5.append(h5 - g5)          # hx := hx − gx (particles.F90:434)
        gw5.append(g5)
        cells = jnp.clip(cell1[d][:, None] + offs[None, :], 0,
                         plan.padded[d] - 1)
        cells_w.append(cells)

    if getattr(sp, "deltaf", None) is not None:
        # delta-f: subtract the static background f0 from the deposited
        # current (particles.F90:405-408; f0 :521-553)
        dens_b, temp_b, drift_b = sp.deltaf
        two_kb_mass = 2.0 * const.kb * sp.mass
        tb = [max(t, 1e-300) for t in temp_b]
        expo = sum((new_p[:, i] - drift_b[i]) ** 2 / tb[i]
                   for i in range(3)) / two_kb_mass
        norm = dens_b / math.sqrt(
            (math.pi * two_kb_mass) ** 3 * tb[0] * tb[1] * tb[2])
        w = w - slab.pvol * norm * jnp.exp(-expo)

    live_w = jnp.where(slab.alive, w, 0.0)
    fjx = plan.fj[0] * live_w * q
    fjy = plan.fj[1] * live_w * q
    fjz = plan.fj[2] * live_w * q

    if nd == 1:
        gx, hx = gw5[0], hw5[0]
        wy = gx + 0.5 * hx
        jxv = -fjx[:, None] * jnp.cumsum(hx, axis=1)
        jyv = (fjy * vy)[:, None] * wy
        jzv = (fjz * vz)[:, None] * wy
        flat = cells_w[0]
    elif nd == 2:
        gx, hx = gw5[0], hw5[0]
        gy, hy = gw5[1], hw5[1]
        yfac1 = gy + 0.5 * hy
        yfac2 = THIRD * hy + 0.5 * gy
        xfac1 = gx + 0.5 * hx
        wx = hx[:, :, None] * yfac1[:, None, :]
        wy = hy[:, None, :] * xfac1[:, :, None]
        wz = gx[:, :, None] * yfac1[:, None, :] + hx[:, :, None] * yfac2[:, None, :]
        jxv = (-fjx[:, None, None] * jnp.cumsum(wx, axis=1)).reshape(-1, wlen * wlen)
        jyv = (-fjy[:, None, None] * jnp.cumsum(wy, axis=2)).reshape(-1, wlen * wlen)
        jzv = ((fjz * vz)[:, None, None] * wz).reshape(-1, wlen * wlen)
        flat = _flat_index(cells_w, plan.strides)
    else:
        gx, hx = gw5[0], hw5[0]
        gy, hy = gw5[1], hw5[1]
        gz, hz = gw5[2], hw5[2]
        xfac1 = gx + 0.5 * hx
        xfac2 = THIRD * hx + 0.5 * gx
        yfac1 = gy + 0.5 * hy
        yfac2 = THIRD * hy + 0.5 * gy
        zfac1 = gz + 0.5 * hz
        zfac2 = THIRD * hz + 0.5 * gz
        N = gx.shape[0]
        yz = gy[:, :, None] * zfac1[:, None, :] + hy[:, :, None] * zfac2[:, None, :]
        wx = hx[:, :, None, None] * yz[:, None, :, :]
        hygz = hy[:, :, None] * gz[:, None, :]
        hyhz = hy[:, :, None] * hz[:, None, :]
        wy = (xfac1[:, :, None, None] * hygz[:, None, :, :]
              + xfac2[:, :, None, None] * hyhz[:, None, :, :])
        hzyfac1 = hz[:, None, :, None] * yfac1[:, :, None, None]  # (N,y,z,1)?
        # build wz explicitly: gx_i*hz_k*yfac1_j + hx_i*hz_k*yfac2_j
        wz = (gx[:, :, None, None] * yfac1[:, None, :, None] * hz[:, None, None, :]
              + hx[:, :, None, None] * yfac2[:, None, :, None] * hz[:, None, None, :])
        jxv = (-fjx[:, None, None, None] * jnp.cumsum(wx, axis=1)).reshape(N, -1)
        jyv = (-fjy[:, None, None, None] * jnp.cumsum(wy, axis=2)).reshape(N, -1)
        jzv = (-fjz[:, None, None, None] * jnp.cumsum(wz, axis=3)).reshape(N, -1)
        flat = _flat_index(cells_w, plan.strides)

    return slab._replace(x=new_x, p=new_p, work=new_work), \
        (flat, jxv, jyv, jzv)


def push_photons(slab: ParticleSlab, plan: PushPlan):
    """Ballistic photon advance x += p c²/E dt (particles.F90:558-640)."""
    nd = plan.nd
    energy = jnp.maximum(
        const.c * jnp.sqrt(jnp.sum(slab.p ** 2, axis=1)), 1e-300)
    fac = plan.dt * const.c ** 2 / energy
    new_x = slab.x + slab.p[:, :nd] * fac[:, None]
    return slab._replace(x=new_x)


def deposit_currents(fields: Fields, contributions, dtype):
    """Scatter-add all species' windowed current contributions into J.

    The reference accumulates directly during the particle loop
    (particles.F90:488-514); here deposition is a batched scatter-add which
    XLA lowers to sorted segment updates on TPU.
    """
    jx = jnp.zeros_like(fields.jx).reshape(-1)
    jy = jnp.zeros_like(fields.jy).reshape(-1)
    jz = jnp.zeros_like(fields.jz).reshape(-1)
    for (flat, jxv, jyv, jzv) in contributions:
        fi = flat.reshape(-1)
        jx = jx.at[fi].add(jxv.reshape(-1).astype(dtype))
        jy = jy.at[fi].add(jyv.reshape(-1).astype(dtype))
        jz = jz.at[fi].add(jzv.reshape(-1).astype(dtype))
    shape = fields.jx.shape
    return fields._replace(jx=jx.reshape(shape), jy=jy.reshape(shape),
                           jz=jz.reshape(shape))
