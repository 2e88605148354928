"""Fused Pallas TPU kernel for the binned particle engine (3D).

The 3D analogue of ``ops/binned_kernels.py`` — one kernel per species
runs the reference hot loop (``epoch3d/src/particles.F90:28-750``):
half-drift, slot rebin, field gather, Boris rotation, move, and the
closed-form PSC charge-conserving 125-offset deposition, with every slot
payload VMEM-resident across all phases.

VMEM at 3D shapes forces TWO blocked grid axes (a full-y stripe of a 64³
grid would need ~14 MB of rebin candidates alone):

* the grid is tiled into (BX, BY, nz) bricks over a (nxb, nyb) Pallas
  grid; z stays whole (lane axis; z-rebin is a lane roll, periodic wrap
  exact);
* x-rebin candidates come from 2 halo COLUMNS per brick (as in 2D);
* y-rebin candidates come from 2 halo ROWS per brick, x-extended by one
  cell each side (width BX+2) so xy-diagonal movers are covered; the
  kernel redundantly drifts + x-rebins those rows (their own ±x
  candidates lie inside the BX+2 extent — a particle two cells out can
  not reach the brick in one CFL step), exactly as the 2D kernel
  redundantly drifts its halo columns;
* per-brick field windows (6, BX+4, BY+4, nz+4) are pre-sliced by the
  XLA caller, per-brick partial currents (3, BX+4, BY+4, nz+4) are
  overlap-added back by the caller.

Payload-extra rows (QED/brems/trident optical depths) ride the butterfly
exactly as in 2D.  Moving window, probes and thermal BCs stay on the 2D
kernel / XLA paths for now (none of the 3D flagship configs use them).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as const
from .binned_kernels import _tri_const, _w_sel, _bc_axis, _compact


def _axis_rebin3(w, xi, p, K, axis, ndrop, haloL=None, haloR=None):
    """One axis of the 3D rebin on (K, BX, BY, NZ) bricks.

    ``xi``: list of 3 position-fraction arrays; ``p``: payload list
    (3 momenta + extras).  ``axis``: 0 = brick-x (halo columns), 1 =
    brick-y (halo rows), 2 = lane-z (periodic roll).  Halo tuples are
    (w, xi0, xi1, xi2, *payloads) with ξ already drift-advanced and a
    singleton dim at the concat axis."""
    ax = 1 + axis
    alive = w > 0
    dc = jnp.clip(jnp.floor(xi[axis] + 0.5), -1.0, 1.0)
    dc = jnp.where(alive, dc, 0.0)
    xi = list(xi)
    xi[axis] = xi[axis] - dc
    payload = list(xi) + list(p)

    if axis < 2:
        def col(h):
            hw, *hrest = h
            hxa = hrest[axis]
            hdc = jnp.clip(jnp.floor(hxa + 0.5), -1.0, 1.0)
            hdc = jnp.where(hw > 0, hdc, 0.0)
            hrest = list(hrest)
            hrest[axis] = hxa - hdc
            return hw, hrest, hdc
        wL, plL, dcL = col(haloL)
        wR, plR, dcR = col(haloR)

        def from_left(a, h):
            sl = [slice(None)] * a.ndim
            sl[ax] = slice(None, -1)
            return jnp.concatenate([h, a[tuple(sl)]], axis=ax)

        def from_right(a, h):
            sl = [slice(None)] * a.ndim
            sl[ax] = slice(1, None)
            return jnp.concatenate([a[tuple(sl)], h], axis=ax)

        w_l = from_left(w, wL)
        w_r = from_right(w, wR)
        dc_l = from_left(dc, dcL)
        dc_r = from_right(dc, dcR)
        pls_l = [from_left(a, h) for a, h in zip(payload, plL)]
        pls_r = [from_right(a, h) for a, h in zip(payload, plR)]
    else:
        def roll_z(a, o):
            return jnp.roll(a, o, axis=ax)
        w_l = roll_z(w, 1)
        w_r = roll_z(w, -1)
        dc_l = roll_z(dc, 1)
        dc_r = roll_z(dc, -1)
        pls_l = [roll_z(a, 1) for a in payload]
        pls_r = [roll_z(a, -1) for a in payload]

    live_l = (w_l > 0) & (dc_l == 1.0)
    live_c = (w > 0) & (dc == 0.0)
    live_r = (w_r > 0) & (dc_r == -1.0)
    cand_w = jnp.concatenate([jnp.where(live_c, w, 0.0),
                              jnp.where(live_l, w_l, 0.0),
                              jnp.where(live_r, w_r, 0.0)], axis=0)
    cands = [jnp.concatenate([c, l, r], axis=0)
             for c, l, r in zip(payload, pls_l, pls_r)]
    n_live = jnp.sum((cand_w > 0).astype(jnp.int32))
    cands, cand_w = _compact(cands, cand_w, 3 * K)
    w = cand_w[:K]
    cands = [a[:K] for a in cands]
    ndrop = ndrop + n_live - jnp.sum((w > 0).astype(jnp.int32))
    return w, cands[:3], cands[3:], ndrop


def make_fused_push3d(K, BX, BY, NZ, nxb, nyb, plan, sp, dtype, bc=None,
                      interpret=False, n_extra=0):
    """Build the fused per-species pallas_call (3D).

    Inputs: flags (nxb·nyb,) any-live-in-brick-or-halos; w (K,nx,ny,NZ);
    xi/p (3,K,nx,ny,NZ); [extra (n_extra,K,nx,ny,NZ)];
    x-halo columns wx (K,nxb,2,ny,NZ) etc. ([...,0,:,:] the column left
    of the brick, [...,1,:,:] right of it); y-halo rows wy
    (K,nxb,BX+2,2·nyb,NZ) etc. (per brick, rows below/above, x-extended
    one cell each side); per-brick field windows
    fwin (nxb·nyb, 6, BX+4, BY+4, NZ+4).  Outputs: w', xi', p',
    [extra'], per-brick partial currents (nxb·nyb, 3, BX+4, BY+4, NZ+4),
    dropped-particle counter.

    ``bc``: 6 particle-BC enums.  Thermal/window/probes unsupported here
    (XLA fallback); see module docstring.
    """
    nd = 3
    mass = float(sp.mass)
    q = float(sp.charge)
    part_mc = float(const.c * mass)
    ipart_mc = float(1.0 / part_mc)
    cm = float(q * 0.5 * plan.dt * ipart_mc)
    ccm = float(cm * const.c)
    fac = float(plan.fac)
    fj = tuple(float(v) for v in plan.fj)
    offsets = plan.offsets
    W = len(offsets)
    M = -offsets[0]
    nx = nxb * BX
    ny = nyb * BY
    from ..core.boundaries import STAGGER
    names = ("ex", "ey", "ez", "bx", "by", "bz")
    stag_bits = {nm: tuple(int(STAGGER[nm][d]) for d in range(nd))
                 for nm in names}
    PER = const.BC.PERIODIC
    bc = bc or (PER,) * 6
    kernel_bcs = (PER, const.BC.OPEN, const.BC.REFLECT)
    if any(b not in kernel_bcs for b in bc):
        raise ValueError("3D fused kernel: periodic/open/reflect only")
    bounded_ax = tuple(bc[2 * d] != PER or bc[2 * d + 1] != PER
                       for d in range(nd))
    kb = plan.kb
    fdr = tuple(float(const.c * plan.dt / 2.0 / plan.delta[d])
                for d in range(nd))
    import os as _os
    ROW_BLOCK = max(int(_os.environ.get("EPOCH_TPU_ROW_BLOCK",
                                        (K + 1) // 2)), 1)

    def drift(w, xi, p):
        alive = w > 0
        u = [p[c] * ipart_mc for c in range(3)]
        igam = jax.lax.rsqrt(u[0] * u[0] + u[1] * u[1] + u[2] * u[2] + 1.0)
        return [jnp.where(alive, xi[d] + u[d] * igam * fdr[d], xi[d])
                for d in range(nd)]

    def kernel(flag_ref, *rest):
        rest = list(rest)
        w_ref, xi_ref, p_ref = rest[:3]
        del rest[:3]
        exi_ref = rest.pop(0) if n_extra else None
        wx_ref, xix_ref, px_ref = rest[:3]
        del rest[:3]
        exx_ref = rest.pop(0) if n_extra else None
        wy_ref, xiy_ref, py_ref = rest[:3]
        del rest[:3]
        exy_ref = rest.pop(0) if n_extra else None
        f_ref, wo_ref, xio_ref, po_ref = rest[:4]
        del rest[:4]
        exo_ref = rest.pop(0) if n_extra else None
        j_ref, nd_ref = rest
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when((i == 0) & (j == 0))
        def _():
            nd_ref[0, 0] = 0

        flag = flag_ref[i * nyb + j]

        @pl.when(flag == 0)
        def _():
            j_ref[...] = jnp.zeros(j_ref.shape, j_ref.dtype)
            wo_ref[:] = w_ref[:]
            xio_ref[...] = xi_ref[...]
            po_ref[...] = p_ref[...]
            if exo_ref is not None:
                exo_ref[...] = exi_ref[...]

        @pl.when(flag > 0)
        def _():
            _live_body(i, j, w_ref, xi_ref, p_ref, exi_ref,
                       wx_ref, xix_ref, px_ref, exx_ref,
                       wy_ref, xiy_ref, py_ref, exy_ref,
                       f_ref, wo_ref, xio_ref, po_ref, exo_ref,
                       j_ref, nd_ref)

    def _apply_bc(xi_list, p_list, w, gidx, d):
        return _bc_axis(xi_list, p_list, w, d, bc[2 * d], bc[2 * d + 1],
                        kb[d][0], kb[d][1], gidx)

    def _live_body(i, j, w_ref, xi_ref, p_ref, exi_ref,
                   wx_ref, xix_ref, px_ref, exx_ref,
                   wy_ref, xiy_ref, py_ref, exy_ref,
                   f_ref, wo_ref, xio_ref, po_ref, exo_ref,
                   j_ref, nd_ref):
        # ---- phase 1: drift + rebin (x with halo cols, y with halo
        # rows, z with lane rolls) ----
        w = w_ref[:]
        xi = [xi_ref[0], xi_ref[1], xi_ref[2]]
        p = [p_ref[0], p_ref[1], p_ref[2]] \
            + [exi_ref[c] for c in range(n_extra)]
        xi = drift(w, xi, p)
        ndrop = jnp.zeros((), jnp.int32)

        def giota(arr_shape, d):
            base = (i * BX, j * BY, 0)[d]
            return base + jax.lax.broadcasted_iota(jnp.int32, arr_shape,
                                                   1 + d)
        if bounded_ax[0]:
            xi, p, w = _apply_bc(xi, p, w, giota(w.shape, 0), 0)

        def xhalo(side):
            # (K, 1, 2, BY, NZ) → (K, 1, BY, NZ) column
            hw = wx_ref[:, 0, side][:, None]
            hxi = [xix_ref[c, :, 0, side][:, None] for c in range(3)]
            hp = [px_ref[c, :, 0, side][:, None] for c in range(3)] \
                + [exx_ref[c, :, 0, side][:, None] for c in range(n_extra)]
            hxi = drift(hw, hxi, hp)
            if bounded_ax[0]:
                hg = jnp.asarray(i * BX + (-1, BX)[side], jnp.int32)
                hxi, hp, hw = _apply_bc(hxi, hp, hw, hg, 0)
            return (hw, *hxi, *hp)

        w, xi, p, ndrop = _axis_rebin3(w, xi, p, K, 0, ndrop,
                                       haloL=xhalo(0), haloR=xhalo(1))

        def yhalo(side):
            # (K, 2, BX+2, NZ) rows: drift, x-BC, x-rebin internally
            # (the BX+2 extent provides the rows' own ±x candidates),
            # then slice to the BX interior and add the brick-y axis
            hw = wy_ref[:, 0, side]
            hxi = [xiy_ref[c, :, 0, side] for c in range(3)]
            hp = [py_ref[c, :, 0, side] for c in range(3)] \
                + [exy_ref[c, :, 0, side] for c in range(n_extra)]
            hxi = drift(hw, hxi, hp)
            gx = (i * BX - 1) + jax.lax.broadcasted_iota(
                jnp.int32, hw.shape, 1)
            if bounded_ax[0]:
                hxi, hp, hw = _apply_bc(hxi, hp, hw, gx, 0)
            # x-rebin within the row: dc from the drifted ξ; target
            # cells are the interior [1, BX+1)
            alive = hw > 0
            dc = jnp.clip(jnp.floor(hxi[0] + 0.5), -1.0, 1.0)
            dc = jnp.where(alive, dc, 0.0)
            hxi = list(hxi)
            hxi[0] = hxi[0] - dc
            payload = hxi + hp

            def sh(a, o):
                return jnp.roll(a, -o, axis=1)
            live_l = (sh(hw, -1) > 0) & (sh(dc, -1) == 1.0)
            live_c = (hw > 0) & (dc == 0.0)
            live_r = (sh(hw, 1) > 0) & (sh(dc, 1) == -1.0)
            cw = jnp.concatenate([jnp.where(live_c, hw, 0.0),
                                  jnp.where(live_l, sh(hw, -1), 0.0),
                                  jnp.where(live_r, sh(hw, 1), 0.0)],
                                 axis=0)
            cands = [jnp.concatenate([a, sh(a, -1), sh(a, 1)], axis=0)
                     for a in payload]
            cands, cw = _compact(cands, cw, 3 * K)
            hw2 = cw[:K, 1:BX + 1]
            cands = [a[:K, 1:BX + 1] for a in cands]
            # overflow within a halo row's compaction is counted by the
            # owning brick of those cells, not here
            hw2 = hw2[:, :, None]          # (K, BX, 1, NZ)
            cands = [a[:, :, None] for a in cands]
            return (hw2, *cands)

        if bounded_ax[1]:
            xi, p, w = _apply_bc(xi, p, w, giota(w.shape, 1), 1)

        def ybc_halo(h, side):
            if not bounded_ax[1]:
                return h
            hw, *hrest = h
            gy = jnp.asarray(j * BY + (-1, BY)[side], jnp.int32)
            hxi, hp, hw = _apply_bc(list(hrest[:3]), list(hrest[3:]),
                                    hw, gy, 1)
            return (hw, *hxi, *hp)

        w, xi, p, ndrop = _axis_rebin3(
            w, xi, p, K, 1, ndrop,
            haloL=ybc_halo(yhalo(0), 0), haloR=ybc_halo(yhalo(1), 1))

        if bounded_ax[2]:
            xi, p, w = _apply_bc(xi, p, w, giota(w.shape, 2), 2)
        w, xi, p, ndrop = _axis_rebin3(w, xi, p, K, 2, ndrop)
        nd_ref[0, 0] = nd_ref[0, 0] + ndrop
        extras = p[3:]
        p = p[:3]

        # ---- phase 2: gather/Boris/move/deposit in slot row blocks ----
        j_ref[...] = jnp.zeros(j_ref.shape, j_ref.dtype)
        wo_ref[:] = w
        for d in range(3):
            xio_ref[d] = xi[d]
            po_ref[d] = p[d]
        for c in range(n_extra):
            exo_ref[c] = extras[c]
        for r0 in range(0, K, ROW_BLOCK):
            r1 = min(r0 + ROW_BLOCK, K)
            blk = slice(r0, r1)
            wb = w[blk]
            xib = [xi[d][blk] for d in range(3)]
            pb = [p[c][blk] for c in range(3)]

            @pl.when(jnp.any(wb > 0))
            def _(i=i, j=j, r0=r0, r1=r1, wb=wb, xib=xib, pb=pb):
                _push_block(i, j, r0, r1, wb, xib, pb, f_ref,
                            wo_ref, xio_ref, po_ref, j_ref)

    def _push_block(i, j, r0, r1, w, xi, p, f_ref,
                    wo_ref, xio_ref, po_ref, j_ref):
        alive = w > 0
        u = [p[c] * ipart_mc for c in range(3)]

        cf1 = [-xi[d] for d in range(nd)]
        c2 = [jnp.floor(xi[d]) for d in range(nd)]
        cf2 = [c2[d] - xi[d] + 0.5 for d in range(nd)]
        gw = [{o: _tri_const(cf1[d], o) for o in (-1, 0, 1)}
              for d in range(nd)]
        hw = [{o: _w_sel(cf2[d], o, c2[d], (-1.0, 0.0))
               for o in (-2, -1, 0, 1)} for d in range(nd)]

        BDIMS = (BX, BY, NZ)

        def fwin_slice(k, otup):
            sl = (0, k) + tuple(
                slice(otup[d] + 2, otup[d] + 2 + BDIMS[d])
                for d in range(nd))
            return f_ref[sl]

        accs = {}
        # per-component gather: contract z first (shared per (ox, oy)
        # column), then y, then x — fewer products than the full
        # per-offset weight-product table in 3D
        for k, nm in enumerate(names):
            bits = stag_bits[nm]
            tabs = [hw[d] if bits[d] else gw[d] for d in range(nd)]
            acc = jnp.zeros(w.shape, dtype)
            for ox in sorted(tabs[0]):
                accx = jnp.zeros(w.shape, dtype)
                for oy in sorted(tabs[1]):
                    accy = jnp.zeros(w.shape, dtype)
                    for oz in sorted(tabs[2]):
                        accy = accy + tabs[2][oz] \
                            * fwin_slice(k, (ox, oy, oz))[None]
                    accx = accx + tabs[1][oy] * accy
                acc = acc + tabs[0][ox] * accx
            accs[nm] = fac * acc

        ex_p, ey_p, ez_p = accs["ex"], accs["ey"], accs["ez"]
        bx_p, by_p, bz_p = accs["bx"], accs["by"], accs["bz"]

        uxm = u[0] + cm * ex_p
        uym = u[1] + cm * ey_p
        uzm = u[2] + cm * ez_p
        if plan.higuera_cary:
            g2 = uxm * uxm + uym * uym + uzm * uzm + 1.0
            alpha_hc = float(0.5 * q * plan.dt / mass)
            bxb = alpha_hc * bx_p
            byb = alpha_hc * by_p
            bzb = alpha_hc * bz_p
            beta2 = bxb * bxb + byb * byb + bzb * bzb
            sigma = g2 - beta2
            bdotu = bxb * uxm + byb * uym + bzb * uzm
            igam = jax.lax.rsqrt(0.5 * (sigma + jnp.sqrt(
                sigma * sigma + 4.0 * (beta2 + bdotu * bdotu))))
        else:
            igam = jax.lax.rsqrt(uxm * uxm + uym * uym + uzm * uzm + 1.0)
        rootb = ccm * igam
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
        igam = jax.lax.rsqrt(ux * ux + uy * uy + uz * uz + 1.0)
        rootc = const.c * igam
        uvec = (ux, uy, uz)
        delta = [uvec[d] * rootc * float(plan.dto2 / plan.delta[d])
                 for d in range(nd)]

        xi_new = [xi[d] + delta[d] for d in range(nd)]
        p_new = [ux * part_mc, uy * part_mc, uz * part_mc]

        def write_back(xi_out, p_out, w_out):
            for d in range(3):
                xio_ref[d, r0:r1] = jnp.where(alive, xi_out[d], xi[d])
                po_ref[d, r0:r1] = jnp.where(alive, p_out[d], p[d])
            wo_ref[r0:r1] = w_out

        def apply_bcs(xi_out, p_out, w_out):
            for d in range(nd):
                if bounded_ax[d]:
                    base = (i * BX, j * BY, 0)[d]
                    g = base + jax.lax.broadcasted_iota(jnp.int32,
                                                        w.shape, 1 + d)
                    xi_out, p_out, w_out = _bc_axis(
                        xi_out, p_out, w_out, d, bc[2 * d], bc[2 * d + 1],
                        kb[d][0], kb[d][1], g)
            return xi_out, p_out, w_out

        if sp.zero_current or sp.immobile:
            xi_b, p_b, w_b = apply_bcs(list(xi_new), list(p_new), w)
            write_back(xi_b, p_b, w_b)
            return

        # ---- deposition at t+1.5dt (particles.F90:397-514, 3D) ----
        live_w = jnp.where(alive, w, 0.0)
        xi_dep = [xi_new[d] + delta[d] for d in range(nd)]
        c3 = [jnp.clip(jnp.floor(x + 0.5), -1.0, 1.0) for x in xi_dep]
        cf3 = [c3[d] - xi_dep[d] for d in range(nd)]
        zero = jnp.zeros_like(cf1[0])
        gx5 = [[(_tri_const(cf1[d], o) if abs(o) <= 1 else zero)
                for o in offsets] for d in range(nd)]
        hx5 = [[_w_sel(cf3[d], o, c3[d], (-1.0, 0.0, 1.0)) for o in offsets]
               for d in range(nd)]
        dxw = [[hx5[d][k] - gx5[d][k] for k in range(W)] for d in range(nd)]
        dcum = []
        for d in range(nd):
            run = []
            acc = None
            for k in range(W):
                acc = dxw[d][k] if acc is None else acc + dxw[d][k]
                run.append(acc)
            dcum.append(run)
        fjx = fj[0] * live_w * q
        fjy = fj[1] * live_w * q
        fjz = fj[2] * live_w * q
        third = 1.0 / 3.0

        def dep_add(comp, otup, v):
            sl = (0, comp) + tuple(
                slice(otup[d] + M, otup[d] + M + BDIMS[d])
                for d in range(nd))
            j_ref[sl] += v

        # separable structure (binned.push_deposit_binned 3D branch):
        # hoist the per-(transverse-pair) factors once per pair
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
                yzfac = gy * zfac1 + hy * zfac2
                xj = -fjx * yzfac
                for ix in range(W):
                    if ix < W - 1:
                        dep_add(0, (offsets[ix], offsets[iy], offsets[iz]),
                                jnp.sum(xj * dcum[0][ix], axis=0))
        for ix in range(W):
            hx = dxw[0][ix]
            gx = gx5[0][ix]
            xfac1 = gx + 0.5 * hx
            xfac2 = third * hx + 0.5 * gx
            for iz in range(W):
                gz = gx5[2][iz]
                hz = dxw[2][iz]
                xzfac = xfac1 * gz + xfac2 * hz
                yj = -fjy * xzfac
                for iy in range(W - 1):
                    dep_add(1, (offsets[ix], offsets[iy], offsets[iz]),
                            jnp.sum(yj * dcum[1][iy], axis=0))
            for iy in range(W):
                gy = gx5[1][iy]
                hy = dxw[1][iy]
                xyfac = gx * (gy + 0.5 * hy) + hx * (third * hy + 0.5 * gy)
                zj = -fjz * xyfac
                for iz in range(W - 1):
                    dep_add(2, (offsets[ix], offsets[iy], offsets[iz]),
                            jnp.sum(zj * dcum[2][iz], axis=0))

        xi_b, p_b, w_b = apply_bcs(list(xi_new), list(p_new), w)
        write_back(xi_b, p_b, w_b)

    grid = (nxb, nyb)
    Kd = K

    def bspec(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    in_specs = [
        bspec((Kd, BX, BY, NZ), lambda i, j, *_: (0, i, j, 0)),
        bspec((3, Kd, BX, BY, NZ), lambda i, j, *_: (0, 0, i, j, 0)),
        bspec((3, Kd, BX, BY, NZ), lambda i, j, *_: (0, 0, i, j, 0)),
    ] + ([bspec((n_extra, Kd, BX, BY, NZ),
                lambda i, j, *_: (0, 0, i, j, 0))] if n_extra else []) + [
        # x-halo columns (K, nxb, 2, ny, NZ)
        bspec((Kd, 1, 2, BY, NZ), lambda i, j, *_: (0, i, 0, j, 0)),
        bspec((3, Kd, 1, 2, BY, NZ),
              lambda i, j, *_: (0, 0, i, 0, j, 0)),
        bspec((3, Kd, 1, 2, BY, NZ),
              lambda i, j, *_: (0, 0, i, 0, j, 0)),
    ] + ([bspec((n_extra, Kd, 1, 2, BY, NZ),
                lambda i, j, *_: (0, 0, i, 0, j, 0))] if n_extra else []) + [
        # y-halo rows (K, nxb, 2·nyb, BX+2, NZ): the 2-row y block sits
        # outside the trailing (BX+2, NZ) dims, which match the array
        # extents (Mosaic full-dim rule)
        bspec((Kd, 1, 2, BX + 2, NZ), lambda i, j, *_: (0, i, j, 0, 0)),
        bspec((3, Kd, 1, 2, BX + 2, NZ),
              lambda i, j, *_: (0, 0, i, j, 0, 0)),
        bspec((3, Kd, 1, 2, BX + 2, NZ),
              lambda i, j, *_: (0, 0, i, j, 0, 0)),
    ] + ([bspec((n_extra, Kd, 1, 2, BX + 2, NZ),
                lambda i, j, *_: (0, 0, i, j, 0, 0))] if n_extra else []) + [
        bspec((1, 6, BX + 2 * M, BY + 2 * M, NZ + 2 * M),
              lambda i, j, *_: (i * nyb + j, 0, 0, 0, 0)),
    ]
    out_specs = (
        bspec((Kd, BX, BY, NZ), lambda i, j, *_: (0, i, j, 0)),
        bspec((3, Kd, BX, BY, NZ), lambda i, j, *_: (0, 0, i, j, 0)),
        bspec((3, Kd, BX, BY, NZ), lambda i, j, *_: (0, 0, i, j, 0)),
    ) + ((bspec((n_extra, Kd, BX, BY, NZ),
                lambda i, j, *_: (0, 0, i, j, 0)),) if n_extra else ()) + (
        bspec((1, 3, BX + 2 * M, BY + 2 * M, NZ + 2 * M),
              lambda i, j, *_: (i * nyb + j, 0, 0, 0, 0)),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct((Kd, nx, ny, NZ), dtype),
        jax.ShapeDtypeStruct((3, Kd, nx, ny, NZ), dtype),
        jax.ShapeDtypeStruct((3, Kd, nx, ny, NZ), dtype),
    ) + ((jax.ShapeDtypeStruct((n_extra, Kd, nx, ny, NZ), dtype),)
         if n_extra else ()) + (
        jax.ShapeDtypeStruct((nxb * nyb, 3, BX + 2 * M, BY + 2 * M,
                              NZ + 2 * M), dtype),
        jax.ShapeDtypeStruct((1, 1), jnp.int32),
    )
    # donate the slot state into its outputs (cf. the 2D kernel: avoids
    # XLA double-buffering the carry around the custom call)
    io_aliases = {1: 0, 2: 1, 3: 2}
    if n_extra:
        io_aliases[4] = 3
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        input_output_aliases=io_aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # the 3K-slot rebin candidates + double-buffered brick blocks
            # exceed the default 16 MiB scoped-vmem cap at 64^3 shapes
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def pick_b(n, prefer):
    import os
    for b in prefer:
        if n % b == 0 and n // b >= 2:
            return b
    return None


class PallasBinned3D:
    """Per-(species, config) fused 3D kernel + the XLA glue."""

    def __init__(self, plan, sp, cfg, interpret=False, n_extra=0,
                 k=None):
        import os
        self.plan = plan
        self.sp = sp
        self.K = k if k else cfg.bin_k
        self.nx, self.ny, self.nz = plan.n
        envx = os.environ.get("EPOCH_TPU_BX3")
        envy = os.environ.get("EPOCH_TPU_BY3")
        self.BX = int(envx) if envx else pick_b(self.nx, (4, 8, 2))
        # x-halo trailing block dims are (BY, NZ): Mosaic needs BY %8
        # or full-extent on hardware (interpret mode is unconstrained)
        by_cands = (8, 16, 4) if interpret else (8, 16)
        by = pick_b(self.ny, by_cands)
        if by is None and self.ny <= 16:
            by = self.ny
        self.BY = int(envy) if envy else by
        self.nxb = self.nx // self.BX
        self.nyb = self.ny // self.BY
        dtype = jnp.dtype(cfg.dtype)
        self.dtype = dtype
        self.interpret = interpret
        self.n_extra = n_extra
        self.any_thermal = False
        bc = tuple(sp.bc_particle[:6])
        self.fused = make_fused_push3d(
            self.K, self.BX, self.BY, self.nz, self.nxb, self.nyb,
            plan, sp, dtype, bc=bc, interpret=interpret, n_extra=n_extra)

    def halo_cols_x(self, a, axis):
        """x-halo columns per brick: [..., nxb, 2, ny, NZ] — the columns
        {i·BX−1, (i+1)·BX} mod nx (strided static slice + stripe roll:
        reads only what it writes, unlike a reshape which XLA may
        materialise column-major — see 2D halo_cols)."""
        BX = self.BX

        def stripecol(col0):
            starts = [0] * a.ndim
            limits = list(a.shape)
            strides = [1] * a.ndim
            starts[axis] = col0
            strides[axis] = BX
            return jax.lax.slice(a, starts, limits, strides)

        left = jnp.roll(stripecol(BX - 1), 1, axis=axis)
        right = jnp.roll(stripecol(0), -1, axis=axis)
        return jnp.stack([left, right], axis=axis + 1)

    def halo_rows_y(self, a, xaxis):
        """y-halo rows per brick: [..., nxb, 2·nyb, BX+2, NZ] — rows
        {j·BY−1, (j+1)·BY} mod ny, x-extended one cell each side.

        ``xaxis``: position of the grid-x axis in ``a``.  Built from
        three stripe-column stacks (left-extension, core BX, right-
        extension) and a y-axis reshape + roll."""
        BX = self.BX
        BY = self.BY
        yaxis = xaxis + 1
        pre = a.shape[:xaxis]
        post = a.shape[yaxis + 1:]      # (NZ,)

        def yrow(r0):
            # strided static slice on the big array (cf. halo_cols_x)
            starts = [0] * a.ndim
            limits = list(a.shape)
            strides = [1] * a.ndim
            starts[yaxis] = r0
            strides[yaxis] = BY
            return jax.lax.slice(a, starts, limits, strides)

        below = jnp.roll(yrow(BY - 1), 1, axis=yaxis)   # row j·BY−1
        above = jnp.roll(yrow(0), -1, axis=yaxis)       # row (j+1)·BY
        rows = jnp.stack([below, above], axis=yaxis + 1)
        # [..., nx, nyb, 2, NZ] → x-extend to (nxb, BX+2): reshape x,
        # then concat the neighbouring stripes' edge columns
        rr = rows.reshape(pre + (self.nxb, BX, self.nyb, 2) + post)

        def xcol(c0):
            idx = (slice(None),) * (xaxis + 1) + (c0,)
            return rr[idx][(slice(None),) * (xaxis + 1) + (None,)]

        lext = jnp.roll(xcol(BX - 1), 1, axis=xaxis)
        rext = jnp.roll(xcol(0), -1, axis=xaxis)
        ext = jnp.concatenate([lext, rr, rext], axis=xaxis + 1)
        # [..., nxb, BX+2, nyb, 2, NZ] → [..., nxb, 2·nyb, BX+2, NZ]:
        # the blocked (2·nyb) axis must sit OUTSIDE the last two dims —
        # Mosaic requires the trailing block dims be 8/128-aligned or
        # full, and a 2-row y block is neither (the interpret-mode-only
        # ordering this replaces was rejected on real TPU)
        ext = jnp.moveaxis(ext, xaxis + 1, xaxis + 3)
        shp = ext.shape
        k = xaxis + 1                   # position of the nyb axis
        return ext.reshape(shp[:k] + (shp[k] * shp[k + 1],) + shp[k + 2:])

    def make_fwin(self, fpad):
        """Per-brick field windows (nxb·nyb, 6, BX+4, BY+4, NZ+4) from
        the (6, nx+4, ny+4, nz+4) ghost-sliced stack."""
        BX, BY = self.BX, self.BY
        M2 = 4
        nz4 = fpad.shape[3]

        def xwin(f):
            # overlapping (BX+4)-windows at stride BX along x
            core = f[:, :self.nx].reshape(6, self.nxb, BX,
                                          f.shape[2], nz4)
            shifted = jnp.pad(f[:, BX:], ((0, 0), (0, max(BX - M2, 0)),
                                          (0, 0), (0, 0)))
            ext = shifted[:, :self.nx].reshape(
                6, self.nxb, BX, f.shape[2], nz4)[:, :, :M2]
            return jnp.concatenate([core, ext], axis=2)

        fx = xwin(fpad)                 # (6, nxb, BX+4, ny+4, nz4)

        def ywin(f):
            core = f[..., :self.ny, :].reshape(
                6, self.nxb, BX + M2, self.nyb, BY, nz4)
            shifted = jnp.pad(f[..., BY:, :],
                              ((0, 0), (0, 0), (0, 0),
                               (0, max(BY - M2, 0)), (0, 0)))
            ext = shifted[..., :self.ny, :].reshape(
                6, self.nxb, BX + M2, self.nyb, BY, nz4)[..., :M2, :]
            return jnp.concatenate([core, ext], axis=4)

        fxy = ywin(fx)                  # (6, nxb, BX+4, nyb, BY+4, nz4)
        fxy = jnp.moveaxis(fxy, (1, 3), (0, 1))
        return fxy.reshape(self.nxb * self.nyb, 6, BX + M2, BY + M2, nz4)

    def fold_jpart(self, jpart):
        """Overlap-add per-brick partial currents into the padded J
        (2-axis generalisation of the 2D fold: ⌈(B+2M)/B⌉ dense adds
        per axis instead of nxb·nyb dynamic-update-slices)."""
        BX, BY = self.BX, self.BY
        M = 2
        nz4 = self.nz + 2 * M
        jp = jpart.reshape(self.nxb, self.nyb, 3, BX + 2 * M, BY + 2 * M,
                           nz4)
        # fold x: row-groups g of every stripe are contiguous after a
        # transpose+reshape
        GX = -(-(BX + 2 * M) // BX)
        ext = jnp.zeros((3, self.nx + GX * BX, self.nyb, BY + 2 * M, nz4),
                        jpart.dtype)
        for g in range(GX):
            rows = jp[:, :, :, g * BX:min((g + 1) * BX, BX + 2 * M)]
            r = rows.shape[3]
            if r < BX:
                rows = jnp.pad(rows, ((0, 0), (0, 0), (0, 0),
                                      (0, BX - r), (0, 0), (0, 0)))
            block = jnp.transpose(rows, (2, 0, 3, 1, 4, 5)).reshape(
                3, self.nx, self.nyb, BY + 2 * M, nz4)
            ext = ext.at[:, g * BX:g * BX + self.nx].add(block)
        jx = ext[:, :self.nx + 2 * M]   # (3, nx+4, nyb, BY+4, nz4)
        GY = -(-(BY + 2 * M) // BY)
        ext2 = jnp.zeros((3, self.nx + 2 * M, self.ny + GY * BY, nz4),
                         jpart.dtype)
        for g in range(GY):
            rows = jx[:, :, :, g * BY:min((g + 1) * BY, BY + 2 * M)]
            r = rows.shape[3]
            if r < BY:
                rows = jnp.pad(rows, ((0, 0), (0, 0), (0, 0),
                                      (0, BY - r), (0, 0)))
            block = rows.reshape(3, self.nx + 2 * M, self.ny, nz4)
            ext2 = ext2.at[:, :, g * BY:g * BY + self.ny].add(block)
        return ext2[:, :, :self.ny + 2 * M]

    def __call__(self, fwin, binned, shift=None, extra=None, seed=None,
                 refill=None, qed_on=None, sides=None, emission=None):
        """Returns (new binned, jpart, extra_out).

        ``qed_on``/``sides``/``emission`` exist for call-signature
        parity with the 2D
        PallasBinned (push_deposit_pallas forwards them unconditionally);
        the 3D kernel has no in-kernel QED rates or carried sides yet, so
        both must be None (qed_enabled/sides_out are never set 3D-side)."""
        assert qed_on is None and sides is None
        w, xi, p = binned.w, binned.xi, binned.p
        wx = self.halo_cols_x(w, 1)
        xix = self.halo_cols_x(xi, 2)
        px = self.halo_cols_x(p, 2)
        wy = self.halo_rows_y(w, 1)
        xiy = self.halo_rows_y(xi, 2)
        py = self.halo_rows_y(p, 2)
        # per-brick any-live flags over brick + halos
        wb = w.reshape(self.K, self.nxb, self.BX, self.nyb, self.BY,
                       self.nz)
        smax = jnp.max(wb, axis=(0, 2, 4, 5))
        hx = jnp.max(wx.reshape(self.K, self.nxb, 2, self.nyb, self.BY,
                                self.nz), axis=(0, 2, 4, 5))
        hy = jnp.max(wy.reshape(self.K, self.nxb, self.BX + 2, self.nyb,
                                2, self.nz), axis=(0, 2, 4, 5))
        flags = ((jnp.maximum(jnp.maximum(smax, hx), hy) > 0)
                 .reshape(-1)).astype(jnp.int32)
        ins = [w, xi, p]
        if self.n_extra:
            ins.append(extra)
        ins += [wx, xix, px]
        if self.n_extra:
            ins.append(self.halo_cols_x(extra, 2))
        ins += [wy, xiy, py]
        if self.n_extra:
            ins.append(self.halo_rows_y(extra, 2))
        ins.append(fwin)
        outs = self.fused(flags, *ins)
        if self.n_extra:
            new_w, new_xi, new_p, extra_out, jpart, ndrop = outs
        else:
            new_w, new_xi, new_p, jpart, ndrop = outs
            extra_out = None
        out = binned._replace(
            xi=new_xi, p=new_p, w=new_w,
            n_dropped=binned.n_dropped + ndrop[0, 0])
        return out, jpart, extra_out
