"""FDTD Maxwell solver.

Staggered-Yee leapfrog with field_order 2/4/6 stencils and the
dispersion-improved solver family (Lehe/Pukhov/Cowan/custom) — a
dimension-generic re-expression of ``epoch{1,2,3}d/src/fields.f90``.  The
reference hand-specialises three source trees; here the curl is written once
via Levi-Civita pairs and shifted-array differences, which XLA fuses into a
single stencil kernel per update.

Update region: Fortran ``DO ix = 0, nx`` ⇒ python ``[ng-1, n+ng)`` per axis;
ghost cells outside it are refreshed by the boundary module.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import constants as const
from .state import Fields, CPMLState

# central-difference coefficient tables (fields.f90:99-124,166-211)
ORDER_COEFFS = {
    2: (1.0,),
    4: (9.0 / 8.0, -1.0 / 24.0),
    6: (75.0 / 64.0, -25.0 / 384.0, 3.0 / 640.0),
}


def shift(f, axis: int, k: int):
    """f evaluated at index i+k along ``axis`` (roll; safe inside the update
    region because ng >= 3 ghost cells cover the largest stencil reach)."""
    if k == 0:
        return f
    return jnp.roll(f, -k, axis=axis)


def d_minus(f, axis: int, order: int):
    """Backward-staggered derivative sum_k c_k (f(i+k-1) - f(i-k)) (E update)."""
    out = None
    for k, c in enumerate(ORDER_COEFFS[order], start=1):
        t = c * (shift(f, axis, k - 1) - shift(f, axis, -k))
        out = t if out is None else out + t
    return out


def d_plus(f, axis: int, order: int):
    """Forward-staggered derivative sum_k c_k (f(i+k) - f(i-k+1)) (B update)."""
    out = None
    for k, c in enumerate(ORDER_COEFFS[order], start=1):
        t = c * (shift(f, axis, k) - shift(f, axis, -(k - 1)))
        out = t if out is None else out + t
    return out


def d_plus_enhanced(f, axis: int, cfg, transverse_axes):
    """Order-2 forward derivative with dispersion-enhancement cross terms
    (epoch2d/src/fields.f90 update_b_field non-Yee branch)."""
    st = cfg.stencil
    a = axis
    out = st.alpha[a] * (shift(f, a, 1) - f)
    for ti, b in enumerate(transverse_axes):
        beta = st.beta[a][ti] if ti < len(st.beta[a]) else 0.0
        if beta != 0.0:
            fp = shift(f, a, 1)
            out = out + beta * (
                shift(fp, b, 1) - shift(f, b, 1)
                + shift(fp, b, -1) - shift(f, b, -1))
    if st.delta[a] != 0.0:
        out = out + st.delta[a] * (shift(f, a, 2) - shift(f, a, -1))
    return out


def _axis_profile(arr_1d, axis: int, ndims: int):
    """Reshape a per-axis (npad,) profile for broadcasting."""
    shape = [1] * ndims
    shape[axis] = arr_1d.shape[0]
    return arr_1d.reshape(shape)


def update_region_mask(grid) -> np.ndarray:
    """Boolean mask of the Fortran [0, n] update region (np, static)."""
    ng = grid.ng
    mask = np.ones((), bool)
    full = np.ones(grid.padded_shape(), bool)
    for d in range(grid.ndims):
        idx = np.arange(grid.padded_shape()[d])
        m = (idx >= ng - 1) & (idx <= grid.n[d] + ng - 1)
        full &= _axis_profile(m, d, grid.ndims)
    return full


class FieldSolverPlan:
    """Precomputed arrays closed over by the jitted field updates."""

    def __init__(self, cfg):
        grid = cfg.grid
        nd = grid.ndims
        dt = cfg.dt
        self.mask = jnp.asarray(update_region_mask(grid))
        hdt = 0.5 * dt
        self.fac = hdt / const.epsilon0                     # fields.f90:365
        self.hdt = hdt
        self.cn = tuple(hdt / grid.delta[d] * const.c ** 2 for d in range(nd))
        self.hdtd = tuple(hdt / grid.delta[d] for d in range(nd))
        dtype = cfg.dtype
        if cfg.any_cpml:
            self.ike = [jnp.asarray(
                _axis_profile(cfg.aux.ikappa_e[d], d, nd).astype(dtype))
                for d in range(nd)]
            self.ikb = [jnp.asarray(
                _axis_profile(cfg.aux.ikappa_b[d], d, nd).astype(dtype))
                for d in range(nd)]
            from .config import cpml_psi_coeffs
            self.psi_be, self.psi_ce, self.psi_bb, self.psi_cb = [], [], [], []
            for d in range(nd):
                be, ce = cpml_psi_coeffs(cfg.aux, d, "e", hdt, grid.delta[d])
                bb, cb = cpml_psi_coeffs(cfg.aux, d, "b", hdt, grid.delta[d])
                self.psi_be.append(jnp.asarray(_axis_profile(be, d, nd).astype(dtype)))
                self.psi_ce.append(jnp.asarray(_axis_profile(ce, d, nd).astype(dtype)))
                self.psi_bb.append(jnp.asarray(_axis_profile(bb, d, nd).astype(dtype)))
                self.psi_cb.append(jnp.asarray(_axis_profile(cb, d, nd).astype(dtype)))
        else:
            self.ike = self.ikb = None


# Levi-Civita pairs: for component c and axis d (c != d), the partner field
# component e and sign s such that (curl F)_c += s * dF_e/dx_d.
def _eps_pairs(ndims: int):
    pairs = []
    for d in range(ndims):
        for c in range(3):
            if c == d:
                continue
            e = 3 - c - d if c != d else None
            # epsilon_{c d e}
            perm = {(0, 1, 2): 1, (1, 2, 0): 1, (2, 0, 1): 1,
                    (0, 2, 1): -1, (2, 1, 0): -1, (1, 0, 2): -1}
            s = perm[(c, d, e)]
            pairs.append((c, d, e, s))
    return pairs


def update_e_field(f: Fields, cfg, plan: FieldSolverPlan,
                   cpml: CPMLState | None):
    """E ← E + c²·dt/2·∇×B − dt/2/ε₀·J on the update region
    (fields.f90:76-215)."""
    nd = cfg.ndims
    order = cfg.field_order
    e = [f.ex, f.ey, f.ez]
    b = [f.bx, f.by, f.bz]
    j = [f.jx, f.jy, f.jz]
    de = [-plan.fac * j[c] for c in range(3)]
    for (c, d, eidx, s) in _eps_pairs(nd):
        term = plan.cn[d] * d_minus(b[eidx], d, order)
        if plan.ike is not None:
            term = term * plan.ike[d]
        de[c] = de[c] + s * term
    new_e = [jnp.where(plan.mask, e[c] + de[c], e[c]) for c in range(3)]

    new_cpml = cpml
    if cfg.any_cpml and cpml is not None:
        # cpml_advance_e_currents (boundary.F90:998-1051): psi recursion on
        # 2-point differences, then E correction with fac = hdt*c².
        facc = plan.hdt * const.c ** 2
        psi_new = []
        k = 0
        psi_flat = cpml.psi[0]
        for (c, d, eidx, s) in _eps_pairs(nd):
            dpair = shift(b[eidx], d, 0) - shift(b[eidx], d, -1)
            psi = plan.psi_be[d] * psi_flat[k] + plan.psi_ce[d] * dpair
            new_e[c] = new_e[c] + s * facc * psi
            psi_new.append(psi)
            k += 1
        new_cpml = CPMLState(psi=(jnp.stack(psi_new), cpml.psi[1]))

    return f._replace(ex=new_e[0], ey=new_e[1], ez=new_e[2]), new_cpml


def update_b_field(f: Fields, cfg, plan: FieldSolverPlan,
                   cpml: CPMLState | None):
    """B ← B − dt/2·∇×E on the update region (fields.f90:219-354)."""
    nd = cfg.ndims
    order = cfg.field_order
    e = [f.ex, f.ey, f.ez]
    b = [f.bx, f.by, f.bz]
    enhanced = (order == 2 and cfg.maxwell_solver != const.MaxwellSolver.YEE)
    db = [jnp.zeros_like(b[c]) for c in range(3)]
    for (c, d, eidx, s) in _eps_pairs(nd):
        if enhanced:
            trans = tuple(a for a in range(nd) if a != d)
            dterm = d_plus_enhanced(e[eidx], d, cfg, trans)
        else:
            dterm = d_plus(e[eidx], d, order)
        term = plan.hdtd[d] * dterm
        if plan.ikb is not None:
            term = term * plan.ikb[d]
        db[c] = db[c] - s * term
    new_b = [jnp.where(plan.mask, b[c] + db[c], b[c]) for c in range(3)]

    new_cpml = cpml
    if cfg.any_cpml and cpml is not None:
        # cpml_advance_b_currents (boundary.F90:1055-1106)
        psi_new = []
        k = 0
        psi_flat = cpml.psi[1]
        for (c, d, eidx, s) in _eps_pairs(nd):
            dpair = shift(e[eidx], d, 1) - e[eidx]
            psi = plan.psi_bb[d] * psi_flat[k] + plan.psi_cb[d] * dpair
            new_b[c] = new_b[c] - s * plan.hdt * psi
            psi_new.append(psi)
            k += 1
        new_cpml = CPMLState(psi=(cpml.psi[0], jnp.stack(psi_new)))

    return f._replace(bx=new_b[0], by=new_b[1], bz=new_b[2]), new_cpml
