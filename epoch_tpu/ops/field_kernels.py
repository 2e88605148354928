"""Fused Maxwell-update Pallas kernels (2D).

``core/fields.py`` expresses each half-update as jnp rolls + elementwise
ops; XLA lowers that to dozens of small fusions whose per-op dispatch
overhead dominates at production grid sizes (~35% of the LWFA bench step
is non-kernel ops of a few µs each).  These kernels run one half-update
— E (with J and CPML psi-E) or B (with CPML psi-B) — as a single
VMEM-resident Pallas call, reusing the same jnp math (fields.d_minus /
d_plus / d_plus_enhanced run unchanged inside the kernel), so results
are bit-identical to the XLA path.

Field boundary handling (ghost fills, laser rows) stays outside in XLA:
those are per-row ops with deck-dependent expression logic (laser
profiles), and they separate the E and B halves anyway (fields.f90:358
ordering).

Eligibility: 2D, full field stack + psi fits VMEM (~10 MB).  The XLA
path remains the reference implementation and the fallback.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as const
from ..core import fields as fld
from ..core.state import CPMLState


def _region_mask(shape, grid):
    """Update-region mask built in-kernel from iotas (no input array)."""
    ng = grid.ng
    m = None
    for d, npad in enumerate(shape):
        idx = jax.lax.broadcasted_iota(jnp.int32, shape, d)
        md = (idx >= ng - 1) & (idx <= grid.n[d] + ng - 1)
        m = md if m is None else m & md
    return m


def make_field_half_kernel(cfg, plan, which: str, interpret=False):
    """Build the fused E- or B-half update.

    ``which``: "e" → (fields…, j…, [psi_e]) → (ex', ey', ez', [psi_e']);
    "b" → (fields…, [psi_b]) → (bx', by', bz', [psi_b']).
    Mirrors fields.update_e_field / update_b_field exactly.
    """
    grid = cfg.grid
    nd = cfg.ndims
    assert nd == 2
    order = cfg.field_order
    pairs = fld._eps_pairs(nd)
    cpml = cfg.any_cpml
    dtype = jnp.dtype(cfg.dtype)
    shape = grid.padded_shape()
    enhanced = (order == 2
                and cfg.maxwell_solver != const.MaxwellSolver.YEE)
    # static per-axis profiles → baked as numpy, loaded as inputs
    # (closure jnp arrays are not allowed inside kernels)
    if cpml:
        ike = [np.asarray(a).reshape(-1) for a in
               (plan.ike if which == "e" else plan.ikb)]
        psi_b_prof = [np.asarray(a).reshape(-1) for a in
                      (plan.psi_be if which == "e" else plan.psi_bb)]
        psi_c_prof = [np.asarray(a).reshape(-1) for a in
                      (plan.psi_ce if which == "e" else plan.psi_cb)]

    def prof(vec_ref, d):
        v = vec_ref[:]                      # (1, npad_d)
        if d == 0:
            return jnp.transpose(v)         # (npad_x, 1)
        return v

    def kernel(*refs):
        refs = list(refs)
        e = [refs.pop(0)[:] for _ in range(3)]
        b = [refs.pop(0)[:] for _ in range(3)]
        if which == "e":
            j = [refs.pop(0)[:] for _ in range(3)]
        psi_ref = refs.pop(0) if cpml else None
        prof_refs = []
        if cpml:
            for _ in range(3 * nd):
                prof_refs.append(refs.pop(0))
        outs = refs
        mask = _region_mask(shape, grid)

        if which == "e":
            de = [-float(plan.fac) * j[c] for c in range(3)]
            for (c, d, eidx, s) in pairs:
                term = float(plan.cn[d]) * fld.d_minus(b[eidx], d, order)
                if cpml:
                    term = term * prof(prof_refs[d], d)
                de[c] = de[c] + s * term
            new = [jnp.where(mask, e[c] + de[c], e[c]) for c in range(3)]
            if cpml:
                facc = float(plan.hdt) * float(const.c) ** 2
                for k, (c, d, eidx, s) in enumerate(pairs):
                    dpair = b[eidx] - fld.shift(b[eidx], d, -1)
                    psi = prof(prof_refs[nd + d], d) * psi_ref[k] \
                        + prof(prof_refs[2 * nd + d], d) * dpair
                    new[c] = new[c] + s * facc * psi
                    outs[3][k] = psi
        else:
            db = [jnp.zeros(shape, dtype) for _ in range(3)]
            for (c, d, eidx, s) in pairs:
                if enhanced:
                    trans = tuple(a for a in range(nd) if a != d)
                    dterm = fld.d_plus_enhanced(e[eidx], d, cfg, trans)
                else:
                    dterm = fld.d_plus(e[eidx], d, order)
                term = float(plan.hdtd[d]) * dterm
                if cpml:
                    term = term * prof(prof_refs[d], d)
                db[c] = db[c] - s * term
            new = [jnp.where(mask, b[c] + db[c], b[c]) for c in range(3)]
            if cpml:
                for k, (c, d, eidx, s) in enumerate(pairs):
                    dpair = fld.shift(e[eidx], d, 1) - e[eidx]
                    psi = prof(prof_refs[nd + d], d) * psi_ref[k] \
                        + prof(prof_refs[2 * nd + d], d) * dpair
                    new[c] = new[c] - s * float(plan.hdt) * psi
                    outs[3][k] = psi
        for c in range(3):
            outs[c][...] = new[c]

    n_pairs = len(pairs)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    n_in = 6 + (3 if which == "e" else 0) + ((1 + 3 * nd) if cpml else 0)
    in_specs = [vspec] * n_in
    out_specs = (vspec,) * (4 if cpml else 3)
    out_shape = tuple([jax.ShapeDtypeStruct(shape, dtype)] * 3) \
        + ((jax.ShapeDtypeStruct((n_pairs,) + shape, dtype),)
           if cpml else ())
    call = pl.pallas_call(kernel, in_specs=in_specs, out_specs=out_specs,
                          out_shape=out_shape, interpret=interpret)
    if cpml:
        prof_arrays = [jnp.asarray(v.reshape(1, -1), dtype)
                       for v in (ike + psi_b_prof + psi_c_prof)]

    def run(f, cpml_state):
        args = [f.ex, f.ey, f.ez, f.bx, f.by, f.bz]
        if which == "e":
            args += [f.jx, f.jy, f.jz]
        if cpml:
            args.append(cpml_state.psi[0 if which == "e" else 1])
            args += prof_arrays
        outs = call(*args)
        if which == "e":
            f = f._replace(ex=outs[0], ey=outs[1], ez=outs[2])
        else:
            f = f._replace(bx=outs[0], by=outs[1], bz=outs[2])
        if cpml:
            if which == "e":
                cpml_state = CPMLState(psi=(outs[3], cpml_state.psi[1]))
            else:
                cpml_state = CPMLState(psi=(cpml_state.psi[0], outs[3]))
        return f, cpml_state

    return run


def fused_fields_eligible(cfg, interpret=False):
    """Fused field kernels: 2D, f32 on hardware (any dtype interpreted),
    stack fits VMEM comfortably."""
    import os
    if os.environ.get("EPOCH_TPU_FUSED_FIELDS", "auto") == "0":
        return False
    if cfg.ndims != 2:
        return False
    if not interpret:
        if jax.default_backend() != "tpu":
            return False
        if jnp.dtype(cfg.dtype) != jnp.float32:
            return False
    shape = cfg.grid.padded_shape()
    cells = int(np.prod(shape))
    n_arr = 16 + (5 if cfg.any_cpml else 0)
    return cells * 4 * n_arr <= 10 * 1024 * 1024
