"""Cell-binned dense particle engine — the TPU-native hot path.

The reference walks per-particle linked lists with scalar gather/scatter
(particles.F90:199-514).  XLA's general gather/scatter is element-serialised
on TPU (~4 M particle·ops/s measured), so this engine re-designs the data
layout instead of the loop: particles live in a dense per-cell slot grid

    xi  : (nx[, ny[, nz]], K, ndims)   position fraction within own cell
    p   : (nx[, ny[, nz]], K, 3)       momentum
    w   : (nx[, ny[, nz]], K)          weight (0 ⇒ empty slot)

With particles binned by their (unstaggered) cell, every irregular memory
access becomes dense:

* field gather = Σ over the static shape-function window of
  ``weight(ξ) * roll(field, offset)`` — pure VPU elementwise work;
* the PSC charge-conserving deposition = per-offset reductions over the slot
  axis followed by rolls — a dense segment reduction, bit-identical in math
  to the reference prefix-sum scheme (particles.F90:429-514);
* the CFL guarantee (≤1 cell/step) makes re-binning a *local* exchange:
  per axis, 3 rolled candidate sets are compacted back to K slots with one
  small lax.sort along the slot axis.

Measured on TPU v5lite: ~5000× the throughput of the scatter path.
Periodic boundaries are implicit in the rolls; bounded domains route through
masked edge bins (round-2 work — the engine currently requires all-periodic
particle boundaries and no moving window).
"""
from __future__ import annotations

import itertools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants as const
from . import shapes
from .state import ParticleSlab

Shape = const.Shape


class BinnedSpecies(NamedTuple):
    xi: jax.Array    # (*grid, K, nd) ξ = r - cell ∈ [-0.5, 0.5)
    p: jax.Array     # (*grid, K, 3)
    w: jax.Array     # (*grid, K); 0 = dead
    n_dropped: jax.Array  # scalar counter of overflow-dropped particles

    @property
    def K(self):
        return self.w.shape[-1]


def _tri(cf, r):
    """Triangle (TSC) weight at integer offset r (gx.inc)."""
    cf2 = cf * cf
    return jnp.where(r == -1, 0.25 + cf2 + cf,
           jnp.where(r == 0, 1.5 - 2.0 * cf2,
           jnp.where(r == 1, 0.25 + cf2 - cf, 0.0)))


def _weight(shape, cf, r):
    if shape == Shape.TRIANGLE:
        return _tri(cf, r)
    return shapes.weight_at(shape, cf, r)


class BinnedPlan:
    """Static scalars (mirror of push.PushPlan)."""

    def __init__(self, cfg):
        grid = cfg.grid
        self.nd = grid.ndims
        self.shape = grid.shape_fn
        if self.shape != Shape.TRIANGLE:
            raise NotImplementedError("binned engine: triangle shape only")
        self.n = grid.n
        self.dt = cfg.dt
        self.delta = grid.delta
        self.fac = shapes.FAC_1D[self.shape] ** self.nd
        self.dto2 = cfg.dt / 2.0
        self.dtco2 = const.c * self.dto2
        d = grid.delta
        if self.nd == 1:
            self.fj = (self.fac / cfg.dt, self.fac / d[0], self.fac / d[0])
        elif self.nd == 2:
            self.fj = (self.fac / (cfg.dt * d[1]), self.fac / (cfg.dt * d[0]),
                       self.fac / (d[0] * d[1]))
        else:
            self.fj = (self.fac / (cfg.dt * d[1] * d[2]),
                       self.fac / (cfg.dt * d[0] * d[2]),
                       self.fac / (cfg.dt * d[0] * d[1]))
        # The particle is re-binned onto its half-drift cell1 before the
        # gather, so unstaggered weights live on −1..1 and staggered on
        # −2..1: gather offsets −2..1.  The deposition window is the
        # reference's support+2 = −2..2 (particles.F90:79-83).
        self.gather_offsets = (-2, -1, 0, 1)
        self.offsets = tuple(range(-2, 3))


# ---------------------------------------------------------------------------
# conversion to/from flat slabs (host-side setup & diagnostics)
# ---------------------------------------------------------------------------

def bin_from_arrays(x, p, w, grid, K) -> BinnedSpecies:
    """Host-side: place flat particle arrays into the slot grid."""
    nd = grid.ndims
    n = grid.n
    x = np.asarray(x)
    r = np.stack([(x[:, d] - grid.grid_min(d)) / grid.delta[d]
                  for d in range(nd)], axis=1)
    cell = np.floor(r + 0.5).astype(np.int64)
    xi = r - cell
    cell = np.stack([np.mod(cell[:, d], n[d]) for d in range(nd)], axis=1)
    flat_cell = np.zeros(x.shape[0], np.int64)
    for d in range(nd):
        flat_cell = flat_cell * n[d] + cell[:, d]
    order = np.argsort(flat_cell, kind="stable")
    C = int(np.prod(n))
    counts = np.bincount(flat_cell, minlength=C)
    ndrop = int(np.maximum(counts - K, 0).sum())
    slot_of = np.zeros(x.shape[0], np.int64)
    # slot index within the cell for sorted order
    starts = np.zeros(C + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    pos_sorted = np.arange(x.shape[0]) - starts[flat_cell[order]]
    keep = pos_sorted < K
    dtype = np.asarray(p).dtype
    xi_g = np.zeros((C, K, nd), dtype)
    p_g = np.zeros((C, K, 3), dtype)
    w_g = np.zeros((C, K), dtype)
    idx_part = order[keep]
    idx_cell = flat_cell[idx_part]
    idx_slot = pos_sorted[keep]
    xi_g[idx_cell, idx_slot] = xi[idx_part]
    p_g[idx_cell, idx_slot] = np.asarray(p)[idx_part]
    w_g[idx_cell, idx_slot] = np.asarray(w)[idx_part]
    gshape = tuple(n)
    return BinnedSpecies(
        xi=jnp.asarray(xi_g.reshape(gshape + (K, nd))),
        p=jnp.asarray(p_g.reshape(gshape + (K, 3))),
        w=jnp.asarray(w_g.reshape(gshape + (K,))),
        n_dropped=jnp.asarray(ndrop, jnp.int32),
    )


def as_slab(binned: BinnedSpecies, grid) -> ParticleSlab:
    """Flat ParticleSlab view for diagnostics / IO (host-side)."""
    x, p, w, alive = to_flat(binned, grid)
    n = x.shape[0]
    return ParticleSlab(
        x=jnp.asarray(x), p=jnp.asarray(p), weight=jnp.asarray(w),
        alive=jnp.asarray(alive),
        id=jnp.zeros(n, jnp.int32),
        opdepth=jnp.zeros(n, x.dtype),
        opdepth_brem=jnp.zeros(n, x.dtype),
    )


def to_flat(binned: BinnedSpecies, grid):
    """Flat (host) view for diagnostics: absolute positions, p, w, alive."""
    nd = grid.ndims
    n = grid.n
    K = binned.K
    xi = np.asarray(binned.xi).reshape(-1, K, nd)
    w = np.asarray(binned.w).reshape(-1, K)
    p = np.asarray(binned.p).reshape(-1, K, 3)
    C = xi.shape[0]
    cells = np.indices(n).reshape(nd, C).T            # (C, nd)
    x = np.zeros((C, K, nd))
    for d in range(nd):
        x[..., d] = grid.grid_min(d) + \
            (cells[:, None, d] + xi[..., d]) * grid.delta[d]
    alive = w > 0
    return x.reshape(-1, nd), p.reshape(-1, 3), w.reshape(-1), alive.reshape(-1)


# ---------------------------------------------------------------------------
# the fused push + deposit
# ---------------------------------------------------------------------------

def _roll(f, off, nd):
    """Roll a grid array by the offset tuple (periodic)."""
    for d, o in enumerate(off):
        if o:
            f = jnp.roll(f, -o, axis=d)
    return f


def _axis_w(cf, off_arr):
    # cf: (*grid, K); returns weight at each static offset
    return _tri(cf, off_arr)


def push_deposit_binned(interior_fields, binned: BinnedSpecies, sp, plan,
                        _debug=None):
    """One full Boris push + PSC deposition on the slot grid.

    ``interior_fields``: dict name → (*grid,) interior field arrays.
    Returns (new_binned, (jx, jy, jz) interior current arrays).
    Mirrors particles.F90:199-514; periodic wrap via rolls.
    """
    nd = plan.nd
    K = binned.K
    xi = binned.xi
    p = binned.p
    w = binned.w
    dtype = w.dtype
    mass = sp.mass
    q = sp.charge
    part_mc = const.c * mass
    ipart_mc = 1.0 / part_mc
    cm = q * 0.5 * plan.dt * ipart_mc          # fac-free kick factor
    ccm = cm * const.c

    u = [p[..., i] * ipart_mc for i in range(3)]
    gamma = jnp.sqrt(u[0] ** 2 + u[1] ** 2 + u[2] ** 2 + 1.0)
    root = plan.dtco2 / gamma
    # half drift in grid units, then re-bin so bin == cell1 exactly
    # (particles.F90:234-257); keeps the gather/deposit windows minimal
    xi_h = jnp.stack([xi[..., d] + u[d] * root / plan.delta[d]
                      for d in range(nd)], axis=-1)
    binned = rebin(binned._replace(xi=jnp.where((w > 0)[..., None],
                                                xi_h, xi)), plan)
    xi = binned.xi
    p = binned.p
    w = binned.w
    alive = w > 0
    u = [p[..., i] * ipart_mc for i in range(3)]

    # cell fractions for the two stagger sets (particles.F90:248-287):
    # cell1 = bin (ξ ∈ [-0.5, 0.5)), cell2 = bin + c2, c2 = floor(ξ)
    xi_ax = [xi[..., d] for d in range(nd)]
    cf1 = [-x for x in xi_ax]
    c2 = [jnp.floor(x) for x in xi_ax]
    cf2 = [c2[d] - xi_ax[d] + 0.5 for d in range(nd)]

    from .boundaries import STAGGER
    names = ("ex", "ey", "ez", "bx", "by", "bz")
    gofs = plan.gather_offsets
    gw = [[_weight(plan.shape, cf1[d], o) for o in gofs] for d in range(nd)]
    hw = [[_weight(plan.shape, cf2[d], o - c2[d]) for o in gofs]
          for d in range(nd)]
    # stack the six fields: one roll per offset tuple; per-offset there are
    # only 2^nd distinct stagger weight products, shared across fields
    fstack = jnp.stack([interior_fields[nm] for nm in names], axis=0)
    stag_bits = {nm: tuple(int(STAGGER[nm][d]) for d in range(nd))
                 for nm in names}
    accs = {nm: jnp.zeros(w.shape, dtype) for nm in names}
    for off in itertools.product(range(len(gofs)), repeat=nd):
        otup = tuple(gofs[i] for i in off)
        rolled = _roll(fstack, (0,) + otup, nd + 1)
        wprod = {}
        for bits in itertools.product((0, 1), repeat=nd):
            ww = None
            for d in range(nd):
                wd = hw[d][off[d]] if bits[d] else gw[d][off[d]]
                ww = wd if ww is None else ww * wd
            wprod[bits] = ww
        for k, nm in enumerate(names):
            accs[nm] = accs[nm] + wprod[stag_bits[nm]] * rolled[k][..., None]
    if _debug is not None:
        _debug["accs"] = accs
        _debug["cf1"] = cf1
        _debug["xi_h"] = xi_ax
    fac = plan.fac
    ex_p = fac * accs["ex"]
    ey_p = fac * accs["ey"]
    ez_p = fac * accs["ez"]
    bx_p = fac * accs["bx"]
    by_p = fac * accs["by"]
    bz_p = fac * accs["bz"]

    # Boris (particles.F90:304-350)
    uxm = u[0] + cm * ex_p
    uym = u[1] + cm * ey_p
    uzm = u[2] + cm * ez_p
    gamma = jnp.sqrt(uxm ** 2 + uym ** 2 + uzm ** 2 + 1.0)
    rootb = ccm / gamma
    tx = bx_p * rootb
    ty = by_p * rootb
    tz = bz_p * rootb
    tx2, ty2, tz2 = tx * tx, ty * ty, tz * tz
    tau = 1.0 / (1.0 + tx2 + ty2 + tz2)
    uxp = ((1 + tx2 - ty2 - tz2) * uxm
           + 2.0 * ((tx * ty + tz) * uym + (tx * tz - ty) * uzm)) * tau
    uyp = ((1 - tx2 + ty2 - tz2) * uym
           + 2.0 * ((ty * tz + tx) * uzm + (ty * tx - tz) * uxm)) * tau
    uzp = ((1 - tx2 - ty2 + tz2) * uzm
           + 2.0 * ((tz * tx + ty) * uxm + (tz * ty - tx) * uym)) * tau
    ux = uxp + cm * ex_p
    uy = uyp + cm * ey_p
    uz = uzp + cm * ez_p
    u2 = ux ** 2 + uy ** 2 + uz ** 2
    gamma = jnp.sqrt(u2 + 1.0)
    rootc = const.c / gamma
    uvec = (ux, uy, uz)
    delta = [uvec[d] * rootc * plan.dto2 / plan.delta[d] for d in range(nd)]
    vy = uy * rootc
    vz = uz * rootc

    xi_new = [xi_ax[d] + delta[d] for d in range(nd)]
    new_p = jnp.stack([ux, uy, uz], axis=-1) * part_mc
    new_p = jnp.where(alive[..., None], new_p, binned.p)

    # ---- deposition (particles.F90:397-514) ----
    live_w = jnp.where(alive, w, 0.0)
    currents = None
    if not (sp.zero_current or sp.immobile):
        xi_dep = [xi_new[d] + delta[d] for d in range(nd)]
        c3 = [jnp.floor(x + 0.5) for x in xi_dep]
        cf3 = [c3[d] - xi_dep[d] for d in range(nd)]
        # per-axis window weights at bin-relative offsets (gx from the
        # half-drift position, hx from t+1.5dt; particles.F90:420-434)
        gx5 = [[_weight(plan.shape, cf1[d], o)
                for o in plan.offsets] for d in range(nd)]
        hx5 = [[_weight(plan.shape, cf3[d], o - c3[d])
                for o in plan.offsets] for d in range(nd)]
        dxw = [[hx5[d][i] - gx5[d][i] for i in range(len(plan.offsets))]
               for d in range(nd)]
        fjx = plan.fj[0] * live_w * q
        fjy = plan.fj[1] * live_w * q
        fjz = plan.fj[2] * live_w * q

        zero = jnp.zeros(plan.n, dtype)
        jx = zero
        jy = zero
        jz = zero
        W = len(plan.offsets)
        if nd == 1:
            jxh = jnp.zeros_like(w)
            for i in range(W):
                hx = dxw[0][i]
                wy = gx5[0][i] + 0.5 * hx
                jxh = jxh - fjx * hx
                jx = jx + _roll_back(jnp.sum(jxh, axis=-1),
                                     (plan.offsets[i],), nd)
                jy = jy + _roll_back(jnp.sum(fjy * vy * wy, axis=-1),
                                     (plan.offsets[i],), nd)
                jz = jz + _roll_back(jnp.sum(fjz * vz * wy, axis=-1),
                                     (plan.offsets[i],), nd)
        elif nd == 2:
            # (particles.F90 2d deposition loop structure); the three current
            # components are stacked so each offset does a single roll
            third = 1.0 / 3.0
            acc3 = jnp.zeros((3,) + tuple(plan.n), dtype)
            jyh = [jnp.zeros_like(w) for _ in range(W)]
            for iy in range(W):
                hy = dxw[1][iy]
                gy = gx5[1][iy]
                yfac1 = gy + 0.5 * hy
                yfac2 = third * hy + 0.5 * gy
                jxh = jnp.zeros_like(w)
                for ix in range(W):
                    hx = dxw[0][ix]
                    gx = gx5[0][ix]
                    xfac1 = gx + 0.5 * hx
                    wxv = hx * yfac1
                    wyv = hy * xfac1
                    wzv = gx * yfac1 + hx * yfac2
                    jxh = jxh - fjx * wxv
                    jyh[ix] = jyh[ix] - fjy * wyv
                    v3 = jnp.stack([jnp.sum(jxh, axis=-1),
                                    jnp.sum(jyh[ix], axis=-1),
                                    jnp.sum(fjz * vz * wzv, axis=-1)], axis=0)
                    off = (0, plan.offsets[ix], plan.offsets[iy])
                    acc3 = acc3 + _roll_back(v3, off, nd + 1)
            jx, jy, jz = acc3[0], acc3[1], acc3[2]
        else:
            third = 1.0 / 3.0
            jyh = [jnp.zeros_like(w) for _ in range(W)]
            jzh = [[jnp.zeros_like(w) for _ in range(W)] for _ in range(W)]
            for iz in range(W):
                hz = dxw[2][iz]
                gz = gx5[2][iz]
                zfac1 = gz + 0.5 * hz
                zfac2 = third * hz + 0.5 * gz
                for iy in range(W):
                    hy = dxw[1][iy]
                    gy = gx5[1][iy]
                    yfac1 = gy + 0.5 * hy
                    yfac2 = third * hy + 0.5 * gy
                    hygz = hy * gz
                    hyhz = hy * hz
                    yzfac = gy * zfac1 + hy * zfac2
                    hzyfac1 = hz * yfac1
                    hzyfac2 = hz * yfac2
                    jxh = jnp.zeros_like(w)
                    for ix in range(W):
                        hx = dxw[0][ix]
                        gx = gx5[0][ix]
                        xfac1 = gx + 0.5 * hx
                        xfac2 = third * hx + 0.5 * gx
                        wxv = hx * yzfac
                        wyv = xfac1 * hygz + xfac2 * hyhz
                        wzv = gx * hzyfac1 + hx * hzyfac2
                        jxh = jxh - fjx * wxv
                        jyh[ix] = jyh[ix] - fjy * wyv
                        jzh[ix][iy] = jzh[ix][iy] - fjz * wzv
                        off = (plan.offsets[ix], plan.offsets[iy],
                               plan.offsets[iz])
                        jx = jx + _roll_back(jnp.sum(jxh, axis=-1), off, nd)
                        jy = jy + _roll_back(jnp.sum(jyh[ix], axis=-1), off, nd)
                        jz = jz + _roll_back(jnp.sum(jzh[ix][iy], axis=-1),
                                             off, nd)
        currents = (jx, jy, jz)

    # ---- rebin: sequential per-axis local exchange ----
    new_xi = jnp.stack(xi_new, axis=-1)
    new_xi = jnp.where(alive[..., None], new_xi, binned.xi)
    out = binned._replace(xi=new_xi, p=new_p)
    out = rebin(out, plan)
    return out, currents


def _roll_back(acc, off, nd):
    """Bin b deposits into cell b+off ⇒ J[i] += acc[i-off]."""
    for d, o in enumerate(off):
        if o:
            acc = jnp.roll(acc, o, axis=d)
    return acc


def rebin(binned: BinnedSpecies, plan) -> BinnedSpecies:
    """Move particles whose ξ left [-0.5, 0.5) to the neighbouring bin,
    axis by axis (CFL ⇒ at most one cell), compacting with a slot sort."""
    nd = plan.nd
    K = binned.K
    xi = binned.xi
    p = binned.p
    w = binned.w
    dropped = binned.n_dropped
    for d in range(nd):
        dc = jnp.clip(jnp.floor(xi[..., d] + 0.5), -1.0, 1.0)
        dc = jnp.where(w > 0, dc, 0.0)
        xi = xi.at[..., d].add(-dc)
        cands_xi, cands_p, cands_w = [], [], []
        for o in (-1, 0, 1):
            # particles from bin b-o moving by o land in bin b
            sel = (jnp.roll(dc, o, axis=d) == o) & (jnp.roll(w, o, axis=d) > 0)
            cands_w.append(jnp.where(sel, jnp.roll(w, o, axis=d), 0.0))
            cands_xi.append(jnp.roll(xi, o, axis=d))
            cands_p.append(jnp.roll(p, o, axis=d))
        cw = jnp.concatenate(cands_w, axis=-1)              # (*g, 3K)
        cxi = jnp.concatenate(cands_xi, axis=-2)
        cp = jnp.concatenate(cands_p, axis=-2)
        # sort alive-first along the slot axis; keep K
        key = jnp.where(cw > 0, 0.0, 1.0).astype(w.dtype)
        ops = (key, cw) + tuple(cxi[..., i] for i in range(nd)) \
            + tuple(cp[..., i] for i in range(3))
        sorted_ops = jax.lax.sort(ops, dimension=cw.ndim - 1, num_keys=1)
        live_total = jnp.sum(cw > 0)
        cw = sorted_ops[1][..., :K]
        xi = jnp.stack([sorted_ops[2 + i][..., :K] for i in range(nd)],
                       axis=-1)
        p = jnp.stack([sorted_ops[2 + nd + i][..., :K] for i in range(3)],
                      axis=-1)
        w = cw
        kept = jnp.sum(w > 0)
        dropped = dropped + (live_total - kept).astype(jnp.int32)
    return binned._replace(xi=xi, p=p, w=w, n_dropped=dropped)
