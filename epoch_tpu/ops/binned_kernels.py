"""Fused Pallas TPU kernel for the binned particle engine (2D).

The hot loop of the reference is the per-particle gather/Boris/move/deposit
walk (``epoch2d/src/particles.F90:28-565``).  ``core/binned.py`` re-designs
that as dense slot-grid array programs; this module lowers the whole hot
path to ONE Pallas kernel per species so the slot payloads stay
VMEM-resident across every phase (no HBM round trip between rebin and
push, which two separate kernels would pay):

* **drift + rebin**: the half-drift followed by the per-axis slot
  compaction.  The XLA path compacts with ``lax.sort`` over 3K candidate
  slots (~3 ms/step at bench shapes); here the compaction is a butterfly
  routing network along the *slot* axis — the leading, register-tiled axis,
  so every shuffle is free and only the selects cost VPU work.  Stable
  compaction is a monotone routing, which an LSB→MSB butterfly performs
  conflict-free (verified exhaustively in tests).
* **push + deposit**: field gather (per-component ≤4×4 windows, c1 ≡ 0
  after the rebin), Boris rotation, move, and the closed-form PSC
  charge-conserving deposition into a margin-padded J accumulated in VMEM
  across the sequential stripe grid.

The kernel tiles the grid into x-stripes of ``BX`` cells and receives the
two halo columns of each stripe as separate inputs (periodic wrap is
applied by the XLA-side gather of those columns).  A scalar-prefetch
any-live flag per stripe (computed over the stripe + its halo columns)
lets vacuum stripes — the region ahead of the plasma in a moving-window
LWFA run — skip all VPU work and pass their slots through.
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as const


def _tri_const(cf, r: int):
    """Triangle weight at a compile-time integer offset (gx.inc)."""
    if r == -1:
        return 0.25 + cf * cf + cf
    if r == 0:
        return 1.5 - 2.0 * cf * cf
    if r == 1:
        return 0.25 + cf * cf - cf
    return None


def _w_sel(cf, o: int, base, base_vals):
    """Weight at offset ``o`` relative to integer array ``base`` restricted
    to ``base_vals`` (select between concrete polynomials)."""
    out = None
    for bv in base_vals:
        poly = _tri_const(cf, o - int(bv))
        if poly is None:
            continue
        term = jnp.where(base == bv, poly, 0.0)
        out = term if out is None else out + term
    if out is None:
        return jnp.zeros_like(cf)
    return out


# ---------------------------------------------------------------------------
# boundary particle BCs on the slot grid (see core/binned.apply_axis_bcs
# for semantics; here with a global-cell-index array so stripe halos work)
# ---------------------------------------------------------------------------

_I32 = lambda v: jnp.int32(np.uint32(v).view(np.int32) if v > 0x7fffffff
                           else v)


def _hash_u01(seed, pid, salt: int, shape, dtype):
    """Counter-based uniform (0,1) field: murmur3-finalizer hash of
    (element index, stripe id, per-site salt, per-step seed).

    Pure integer jnp ops — identical streams under Mosaic and interpret
    mode (the pltpu hardware PRNG has no interpret lowering), so thermal
    resampling is testable on CPU and reproducible.  24 mantissa bits;
    the +2⁻²⁵ offset keeps log() finite."""
    lin = jnp.zeros((), jnp.int32)
    for d, s in enumerate(shape):
        lin = lin * jnp.int32(s) \
            + jax.lax.broadcasted_iota(jnp.int32, shape, d)
    x = lin + _I32(0x9E3779B9) * jnp.int32(salt)
    x = x + jnp.asarray(seed, jnp.int32) * _I32(2654435761)
    x = x + jnp.asarray(pid, jnp.int32) * jnp.int32(97787)
    s16 = jnp.int32(16)
    for m in (0x7feb352d, 0x846ca68b):
        x = x ^ jax.lax.shift_right_logical(x, s16)
        x = x * _I32(m)
    x = x ^ jax.lax.shift_right_logical(x, s16)
    u24 = jax.lax.shift_right_logical(x, jnp.int32(8))
    return u24.astype(dtype) * (1.0 / (1 << 24)) + (0.5 / (1 << 24))


def _bc_axis(xi_list, p_list, w, d, bc_lo, bc_hi, kb_lo, kb_hi, gidx,
             thermal=None):
    """Apply open/reflect/thermal BCs along axis d.  ``gidx``: global cell
    index, broadcastable against w (signed: halo columns outside [0, n)
    kill automatically under a bounded BC).  bc values are BC enums.

    ``thermal``: (sigmas_lo, sigmas_hi, rand) — per-component momentum
    sigmas √(kB·T·m) (static floats) for THERMAL/HEAT_BATH sides plus a
    ``rand(salt, shape) -> uniform(0,1)`` callback (see _hash_u01), or
    None.  The crossing particle reflects and its momentum is resampled
    from the boundary heat bath (boundary.F90:664-694): flux-Maxwellian
    (Rayleigh) inward along the axis, Maxwellian transverse."""
    from .. import constants as const
    TH = (const.BC.THERMAL, const.BC.HEAT_BATH)
    alive = w > 0
    for hi_side, bc in ((False, bc_lo), (True, bc_hi)):
        if bc == const.BC.PERIODIC:
            continue
        xa = xi_list[d]
        if hi_side:
            edge = gidx == kb_hi
            inside_kill = gidx > kb_hi
            crossing = edge & (xa >= 0.5) & alive
            refl = 1.0 - xa
        else:
            edge = gidx == kb_lo
            inside_kill = gidx < kb_lo
            crossing = edge & (xa < -0.5) & alive
            refl = -1.0 - xa
        if bc == const.BC.REFLECT:
            xi_list[d] = jnp.where(crossing, refl, xa)
            p_list[d] = jnp.where(crossing, -p_list[d], p_list[d])
            w = jnp.where(inside_kill & alive, 0.0, w)
        elif bc in TH and thermal is not None:
            sig = thermal[1 if hi_side else 0]
            rand = thermal[2]
            sgn = 1.0 if hi_side else -1.0
            dt_ = w.dtype
            s0 = 3 * (1 if hi_side else 0)
            u1 = rand(s0 + 0, w.shape)
            u2 = rand(s0 + 1, w.shape)
            u3 = rand(s0 + 2, w.shape)
            # Box–Muller pair for the two transverse Maxwellians,
            # Rayleigh inversion for the inward flux component
            r = jnp.sqrt(-2.0 * jnp.log(u1))
            ang = (2.0 * np.pi) * u2
            normals = (r * jnp.cos(ang), r * jnp.sin(ang))
            ray = jnp.sqrt(-2.0 * jnp.log(u3))
            xi_list[d] = jnp.where(crossing, refl, xa)
            ti = 0
            for comp in range(3):
                if comp == d:
                    newp = (-sgn * float(sig[comp])) * ray
                else:
                    newp = float(sig[comp]) * normals[ti]
                    ti += 1
                p_list[comp] = jnp.where(crossing, newp, p_list[comp])
            w = jnp.where(inside_kill & alive, 0.0, w)
        else:   # OPEN
            w = jnp.where(crossing | (inside_kill & alive), 0.0, w)
        alive = w > 0
    return xi_list, p_list, w


# ---------------------------------------------------------------------------
# drift + rebin kernel
# ---------------------------------------------------------------------------

def _compact(payloads, w, n_rows):
    """Stable live-first compaction along axis 0 via butterfly routing.

    ``w > 0`` marks live rows.  Returns (payloads, w) with every live row
    moved to the top (original order preserved) and vacated rows dead.
    The downward shift of each live row equals ``index - rank`` where rank
    is the exclusive count of live rows above; routing one shift bit per
    stage is conflict-free for monotone ranks.
    """
    live = (w > 0).astype(jnp.int32)
    shape = (n_rows,) + (1,) * (w.ndim - 1)
    iota = jax.lax.broadcasted_iota(jnp.int32, w.shape, 0)
    # inclusive prefix count of live rows (Hillis–Steele; rolls along the
    # slot axis are register moves)
    csum = live
    sh = 1
    while sh < n_rows:
        csum = csum + jnp.where(iota >= sh, jnp.roll(csum, sh, axis=0), 0)
        sh *= 2
    s = jnp.where(live > 0, iota - (csum - 1), 0)    # downward shift
    b = 0
    while (1 << b) < n_rows:
        step = 1 << b
        move = (live > 0) & (((s >> b) & 1) == 1)
        # the element `step` below arrives here; wrap arrivals are invalid
        arrive = jnp.roll(move, -step, axis=0) & (iota < n_rows - step)
        payloads = [jnp.where(arrive, jnp.roll(a, -step, axis=0), a)
                    for a in payloads]
        w = jnp.where(arrive, jnp.roll(w, -step, axis=0),
                      jnp.where(move, 0.0, w))
        s = jnp.where(arrive, jnp.roll(s, -step, axis=0), s)
        live = (w > 0).astype(jnp.int32)
        b += 1
    return payloads, w


def _axis_rebin(w, xi0, xi1, p, haloL, haloR, K, axis, ndrop,
                haloR2=None, shmask=None, merge=False, extra_cands=None):
    """One axis of the rebin: adjust ξ by dc, gather the 3 neighbour
    candidate sets along the slot axis and compact back to K slots.

    ``axis`` 0 = stripe-x (halo columns supplied), 1 = lane-y (periodic
    roll).  ``p`` is a list of 3 momentum arrays.

    ``shmask``/``haloR2`` (axis 0, moving-window decks only): when the
    traced bool ``shmask`` is set, a window shift is pending — the grid
    labels slid one cell left (window.F90:350-397), so the candidate
    sources for output column b are array columns {b, b+1, b+2} instead
    of {b-1, b, b+1}: the rebin's routing performs the slot-grid roll
    for free instead of paying an HBM round trip for jnp.roll of the
    whole slot state.  ``haloR2`` supplies the second right halo column.
    """
    xi_a = xi0 if axis == 0 else xi1
    alive = w > 0
    dc = jnp.clip(jnp.floor(xi_a + 0.5), -1.0, 1.0)
    dc = jnp.where(alive, dc, 0.0)
    xi_a = xi_a - dc
    payload = [xi_a if axis == 0 else xi0, xi_a if axis == 1 else xi1] + p

    if axis == 0:
        # haloL/haloR: (w, xi0, xi1, p0, p1, p2[, extras…]) column tuples
        # (K, 1, NY), ξ already drift-advanced; adjust their dc the same way
        def col(h):
            hw, hx0, hx1, *hrest = h
            hxa = hx0
            hdc = jnp.clip(jnp.floor(hxa + 0.5), -1.0, 1.0)
            hdc = jnp.where(hw > 0, hdc, 0.0)
            hx0a = hx0 - hdc
            return hw, [hx0a, hx1] + list(hrest), hdc
        wL, plL, dcL = col(haloL)
        wR, plR, dcR = col(haloR)

        def from_left(a, h):
            return jnp.concatenate([h, a[:, :-1, :]], axis=1)

        def from_right(a, h):
            return jnp.concatenate([a[:, 1:, :], h], axis=1)

        def from_right2(a, h1, h2):
            return jnp.concatenate([a[:, 2:, :], h1, h2], axis=1)

        if shmask is None:
            w_l = from_left(w, wL)
            w_r = from_right(w, wR)
            dc_l = from_left(dc, dcL)
            dc_r = from_right(dc, dcR)
            pls_l = [from_left(a, h) for a, h in zip(payload, plL)]
            pls_r = [from_right(a, h) for a, h in zip(payload, plR)]
        else:
            wR2, plR2, dcR2 = col(haloR2)

            def sel(un, sh):
                return jnp.where(shmask, sh, un)

            # shifted: "+1 set" = self, "0 set" = cols+1, "−1 set" = cols+2
            w_l = sel(from_left(w, wL), w)
            dc_l = sel(from_left(dc, dcL), dc)
            pls_l = [sel(from_left(a, h), a)
                     for a, h in zip(payload, plL)]
            w_c = sel(w, from_right(w, wR))
            dc_c = sel(dc, from_right(dc, dcR))
            pls_c = [sel(a, from_right(a, h))
                     for a, h in zip(payload, plR)]
            w_r = sel(from_right(w, wR), from_right2(w, wR, wR2))
            dc_r = sel(from_right(dc, dcR), from_right2(dc, dcR, dcR2))
            pls_r = [sel(from_right(a, h1), from_right2(a, h1, h2))
                     for a, h1, h2 in zip(payload, plR, plR2)]
            w, dc, payload = w_c, dc_c, pls_c
    else:
        def roll_y(a, o):
            return jnp.roll(a, o, axis=2)
        w_l = roll_y(w, 1)
        w_r = roll_y(w, -1)
        dc_l = roll_y(dc, 1)
        dc_r = roll_y(dc, -1)
        pls_l = [roll_y(a, 1) for a in payload]
        pls_r = [roll_y(a, -1) for a in payload]

    live_l = (w_l > 0) & (dc_l == 1.0)
    live_c = (w > 0) & (dc == 0.0)
    live_r = (w_r > 0) & (dc_r == -1.0)
    stacks_w = [jnp.where(live_c, w, 0.0),
                jnp.where(live_l, w_l, 0.0),
                jnp.where(live_r, w_r, 0.0)]
    stacks_p = [list(t) for t in zip(payload, pls_l, pls_r)]
    n_rows = 3 * K
    if extra_cands is not None:
        # cell-local creation candidates (in-kernel QED emission): no
        # routing — they were born in their final cell this step
        ew, epl = extra_cands
        stacks_w.append(ew)
        for d, a in enumerate(epl):
            stacks_p[d].append(a)
        n_rows += ew.shape[0]
    cand_w = jnp.concatenate(stacks_w, axis=0)
    cands = [jnp.concatenate(t, axis=0) for t in stacks_p]
    K3 = n_rows
    n_live = jnp.sum((cand_w > 0).astype(jnp.int32))
    import os as _os
    if _os.environ.get("EPOCH_TPU_KERNEL_ABLATE", "") == "nocompact":
        # profiling only (WRONG results): time the rebin without the
        # butterfly routing
        pass
    else:
        cands, cand_w = _compact(cands, cand_w, K3)
    w = cand_w[:K]
    kept = [a[:K] for a in cands]
    if merge:
        # bin_overflow = merge: fold the live-compacted overflow rows
        # [K:] into slot K-1, conserving Σw and Σw·payload (weighted-
        # mean merge).  over_w > 0 ⇒ the cell had ≥ K live candidates,
        # so slot K-1 is live (or a transient hole, handled by inv).
        ow = cand_w[K:]
        over_w = jnp.sum(ow, axis=0)
        w_last = w[K - 1]
        tot = w_last + over_w
        inv = jnp.where(tot > 0, 1.0 / jnp.maximum(tot, 1e-30), 0.0)
        iota = jax.lax.broadcasted_iota(jnp.int32, w.shape, 0)
        is_last = (iota == K - 1) & (over_w > 0)[None]
        kept = [jnp.where(
            is_last,
            ((w_last * a[K - 1]
              + jnp.sum(ow * c[K:], axis=0)) * inv)[None],
            a) for a, c in zip(kept, cands)]
        w = jnp.where(is_last, tot[None], w)
    ndrop = ndrop + n_live - jnp.sum((w > 0).astype(jnp.int32))
    return w, kept[0], kept[1], kept[2:], ndrop


# ---------------------------------------------------------------------------
# fused drift + rebin + gather + Boris + move + deposit kernel
# ---------------------------------------------------------------------------

def make_fused_push(K, BX, NY, nxb, plan, sp, dtype, bc=None,
                    interpret=False, with_window=False,
                    n_extra=0, probe_specs=(), with_xoff=False,
                    nx_global=None, pad_x=0, halo_mode="cols",
                    with_refill=False, cull_lo=0, clear_rcol=False,
                    photon=False, move=True, qed=None, sides_out=False,
                    emit_k=0):
    """Build the fused per-species pallas_call (2D).

    ``emit_k`` (photon kernels): accept an in-kernel-emission candidate
    block — (emit_k, nx, NY) weights + (2|3, emit_k, nx, NY) xi/p of
    photons created THIS step by the emitter kernels — appended to the
    lane-axis rebin's candidate stack (cell-local: no routing, overflow
    follows the bin_overflow policy and is counted on this species).

    One kernel per stripe does the full reference hot loop
    (particles.F90:28-565): half-drift, slot rebin (the cell binning the
    reference gets from its per-cell linked lists), field gather, Boris
    rotation, move, and the closed-form PSC charge-conserving deposition
    — the slot payloads stay VMEM-resident across all phases instead of
    paying an HBM round trip between a rebin kernel and a push kernel.

    Inputs: flags (nxb,) int32 any-live-in-stripe-or-halos, w (K,nx,NY),
    xi (2,K,nx,NY), p (3,K,nx,NY), halo columns wE (K,nxb,2,NY),
    xiE (2,K,nxb,2,NY), pE (3,K,nxb,2,NY) ([...,0,:] left of the stripe,
    [...,1,:] right of it), and per-stripe field windows
    fwin (nxb, 6, BX+4, NY+4) pre-sliced by the XLA caller (every
    in-kernel access is a *static* slice; Mosaic cannot lower dynamic
    sublane starts).  Outputs: w', xi', p', per-stripe partial currents
    jpart (nxb, 3, BX+4, NY+4) (caller overlap-adds stripes and folds the
    periodic margins), and the dropped-particle counter.  A stripe whose
    flag is 0 (no live particles in it or its halo columns — LWFA vacuum
    ahead of the plasma) skips all compute and passes its slots through.

    ``bc``: 4 particle-BC enums (x_lo, x_hi, y_lo, y_hi).

    ``with_window``: moving-window deck — a second scalar-prefetch input
    (``shift`` ∈ {0, 1}) reports a pending one-cell window shift
    (window.F90:350-397); the rebin routing consumes it by sourcing
    candidates one column to the right (see _axis_rebin), the halo inputs
    carry a THIRD column (the second column right of the stripe), and
    boundary-cell indices are shift-adjusted.  This replaces rolling the
    whole slot state in HBM at every window shift.

    ``n_extra``: number of extra per-particle payload rows carried THROUGH
    the rebin routing unchanged (QED/bremsstrahlung/trident optical
    depths — the reference's compile-gated particle fields,
    shared_data.F90:94-136 — and probe plane entry distances).  Adds an
    input ``extra`` (n_extra, K, nx, NY) + its halo columns; the first
    ``n_extra`` output rows are the routed payloads.

    ``halo_mode``: "cols" (default) — halo columns arrive as separate
    per-side arrays (K, nxb, NY) whose BlockSpec index_map reads the
    NEIGHBOUR stripe's entry ((i∓1) mod nxb): the periodic roll costs
    nothing (no XLA pad+concat staging, measured ~0.35 ms/step at bench
    shapes).  "stacked" — the shard_map/SPMD layout: one pre-stacked
    (K, nxb, n_halo, NY) tensor per payload whose edge entries were
    patched by ppermute exchanges (parallel/spmd_push.py).

    ``with_refill``: the moving-window refill column rides the kernel
    as three extra inputs (w (1,K,NY), xi (1,2,K,NY), p (1,3,K,NY))
    substituted into array column ``rcol`` when a shift is pending —
    the XLA-side staging this replaces copied the WHOLE slot state
    per step (a dynamic-update-slice on the pallas outputs forced
    w/xi/p copies, ~21 MB/species, HLO copy.196).  ``cull_lo``: with a
    pending shift, kill cells with post-shift label < cull_lo (the
    reference culls everything left of the user domain at each shift,
    window.F90:76,322-342 — the x_min CPML layer).

    ``probe_specs``: static tuple of (normal, point) pairs (floats, nd
    each) of the probe planes attached to this species
    (particles.F90:518-557).  The LAST ``len(probe_specs) + 1`` output
    extra rows are [signed end-of-step plane distances (pre-BC position)
    per probe…, pre-BC weight]: the XLA caller combines them with the
    routed entry distances for the crossing test, so open-boundary kills
    in the same step still capture (the pre-BC weight row is the
    aliveness witness).  Output extra rows total
    ``n_extra + len(probe_specs) + (1 if probe_specs else 0)``.
    """
    nd = 2
    mass = float(sp.mass)
    q = float(sp.charge)
    if photon:
        # ballistic massless push (push_photons, particles.F90:611-695):
        # rebin-with-BCs then x += p_hat*c*dt — no gather/Boris/deposit
        part_mc = ipart_mc = cm = ccm = 0.0
    else:
        part_mc = float(const.c * mass)
        ipart_mc = float(1.0 / part_mc)
        cm = float(q * 0.5 * plan.dt * ipart_mc)
        ccm = float(cm * const.c)
    fac = float(plan.fac)
    fj = tuple(float(v) for v in plan.fj)
    offsets = plan.offsets           # (-2..2)
    W = len(offsets)
    M = -offsets[0]
    nx = nxb * BX
    nxg = nx_global if nx_global is not None else nx
    # "cols" side arrays come in one of two layouts:
    #   flat  — (…, K, nxb·NY) with (…, K, NY) blocks at offset i·NY:
    #           built by a single strided column extraction, no
    #           transpose (the (nxb, …, K, NY) layout cost a moveaxis
    #           copy per side array, ~0.3 ms/step at bench shapes).
    #           Needs NY % 128 == 0 (Mosaic: last block dim must be
    #           lane-aligned when not full-extent).
    #   lead  — (nxb, …, K, NY), stripe axis leading (any NY).
    import os as _os_fl
    flat_sides = (halo_mode == "cols" and NY % 128 == 0
                  and _os_fl.environ.get("EPOCH_TPU_FLAT_SIDES", "1")
                  != "0")
    # refill staging column: the first dead pad column on padded grids,
    # the wrapped column 0 otherwise (window._insert_column_binned)
    RCOL = (nxg - pad_x) if pad_x > 0 else 0
    REF_SR = RCOL // BX
    REF_RC = RCOL % BX
    from ..core.boundaries import STAGGER
    names = ("ex", "ey", "ez", "bx", "by", "bz")
    stag_bits = {nm: tuple(int(STAGGER[nm][d]) for d in range(nd))
                 for nm in names}
    PER = const.BC.PERIODIC
    bc = bc or (PER,) * 4
    bounded = any(b != PER for b in bc)
    bounded_x = bc[0] != PER or bc[1] != PER
    bounded_y = bc[2] != PER or bc[3] != PER
    TH = (const.BC.THERMAL, const.BC.HEAT_BATH)
    any_thermal = any(b in TH for b in bc)
    if any_thermal:
        from ..core.boundaries import _ext_temp

        def _sig(bd):
            temps = _ext_temp(sp, bd)
            return tuple(float(np.sqrt(max(float(t), 0.0)
                                       * const.kb * mass)) for t in temps)
        th_sig = tuple(_sig(bd) for bd in range(4))
    # unique static salt base per thermal _bc_axis call site (the hash
    # streams must differ between the rebin-time, halo-view and
    # end-of-push applications)
    _salt_ctr = [0]

    def _mk_thermal(axis, sd, i):
        if not any_thermal \
                or (bc[2 * axis] not in TH and bc[2 * axis + 1] not in TH):
            return None
        base = _salt_ctr[0]
        _salt_ctr[0] += 8

        def rand(salt, shape, base=base, sd=sd, i=i):
            return _hash_u01(sd, i, base + salt, shape, dtype)
        return (th_sig[2 * axis], th_sig[2 * axis + 1], rand)
    if with_window and not bounded_x:
        # the relabelling BC arithmetic relies on the signed-kill trick
        raise ValueError("window pending-shift needs non-periodic x BCs")
    kb = plan.kb
    fx = float(const.c * plan.dt / 2.0 / plan.delta[0])
    fy = float(const.c * plan.dt / 2.0 / plan.delta[1])
    import os as _os
    # two row blocks by default: per-block fixed costs (gather weight
    # tables) outweigh finer skip granularity in the sweep (RB 9 > 4 > 6
    # > 3 at bench shapes, K=18)
    ROW_BLOCK = max(int(_os.environ.get("EPOCH_TPU_ROW_BLOCK",
                                        (K + 1) // 2)), 1)
    # profiling-only phase ablation (results are WRONG under ablation):
    # "nopush" times drift+rebin alone, "norebin" times push+deposit
    # alone, "nodeposit" skips the deposition (prep + offset loop),
    # "nogather" zeroes the field gather (keeps Boris/move/deposit)
    ABLATE = _os.environ.get("EPOCH_TPU_KERNEL_ABLATE", "")

    n_probes = len(probe_specs)
    # output extra-row layout: [routed aux | probe dfin… , pre-BC w | eta]
    n_extra_out = n_extra + (n_probes + 1 if n_probes else 0) \
        + (1 if qed else 0)
    ETA_ROW = n_extra_out - 1
    # grown-output aliasing: when qed appends the eta row (and no probe
    # rows are interleaved) the caller passes the FULL aux — including
    # the stale eta row, which the kernel overwrites — so the input and
    # output extras shapes match and the buffer is donated instead of
    # round-tripping a separate HBM allocation per step per emitter
    alias_grown = qed is not None and n_extra > 0 and n_probes == 0
    n_extra_in = n_extra_out if alias_grown else n_extra
    if qed is not None:
        # (i_od aux-row index, h(eta) log-log polyfit coeffs, fit range,
        #  c1 = dt·α·√3/(2π·τc), C_eta = coeff·q0·√(τ0/m0)[, emit])
        # optional 7th element = in-kernel EMISSION:
        #  (chi-fit 2D Chebyshev coeffs, log10-eta fit range lo/hi,
        #   p-domain max, radiation-reaction flag) — the kernel then
        #   samples the photon energy itself, applies recoil to the
        #   written-back momentum, and stores e_ph (not eta) in the
        #   last extras row for the XLA-side candidate build
        QED_IOD, QED_COEF, QED_LO, QED_HI, QED_C1, QED_CETA = qed[:6]
        QED_EMIT = qed[6] if len(qed) > 6 else None

    def drift(w, xi0, xi1, p0, p1, p2, *_extras):
        if photon:
            # photons rebin at their END-of-last-step positions (the
            # XLA path's rebin-first ordering): no pre-rebin drift
            return xi0, xi1
        alive = w > 0
        u0 = p0 * ipart_mc
        u1 = p1 * ipart_mc
        u2 = p2 * ipart_mc
        igam = jax.lax.rsqrt(u0 * u0 + u1 * u1 + u2 * u2 + 1.0)
        xi0 = jnp.where(alive, xi0 + u0 * igam * fx, xi0)
        xi1 = jnp.where(alive, xi1 + u1 * igam * fy, xi1)
        return xi0, xi1

    def kernel(flag_ref, *rest):
        # deterministic thermal-RNG salt layout per trace (re-tracing
        # must reproduce identical hash streams)
        _salt_ctr[0] = 0
        if with_window:
            shift_ref = rest[0]
            rest = rest[1:]
        if any_thermal:
            seed_ref = rest[0]
            rest = rest[1:]
        if with_xoff:
            xoff_ref = rest[0]
            rest = rest[1:]
        if qed is not None:
            qed_ref = rest[0]
            rest = rest[1:]
        rest = list(rest)
        w_ref, xi_ref, p_ref = rest[:3]
        del rest[:3]
        exi_ref = rest.pop(0) if n_extra else None
        if halo_mode == "cols":
            n_sides = 3 if with_window else 2
            n_groups = 3 + (1 if n_extra else 0)
            side_refs = rest[:n_sides * n_groups]
            del rest[:n_sides * n_groups]
            we_ref = xie_ref = pe_ref = exe_ref = None
        else:
            we_ref, xie_ref, pe_ref = rest[:3]
            del rest[:3]
            exe_ref = rest.pop(0) if n_extra else None
            side_refs = None
        f_ref = rest.pop(0)
        if with_refill:
            refw_ref, refxi_ref, refp_ref = rest[:3]
            del rest[:3]
        else:
            refw_ref = refxi_ref = refp_ref = None
        if emit_k:
            emw_ref, emxi_ref, emp_ref = rest[:3]
            del rest[:3]
        else:
            emw_ref = emxi_ref = emp_ref = None
        wo_ref, xio_ref, po_ref = rest[:3]
        del rest[:3]
        exo_ref = rest.pop(0) if n_extra_out else None
        j_ref, nd_ref = rest[:2]
        sides_o = rest[2:]      # carried-sides outputs (sides_out only)
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            nd_ref[0, 0] = 0

        flag = flag_ref[i]
        sh = shift_ref[0] if with_window else None
        sd = seed_ref[0] if any_thermal else None
        xo = xoff_ref[0] if with_xoff else 0
        # qed scalar pair: [active flag, per-step RNG seed]
        qon = (qed_ref[0], qed_ref[1]) if qed is not None else None

        @pl.when(flag == 0)
        def _():
            # vacuum stripe: nothing here, nothing incoming — pass through
            # (with a pending shift only stripes with particles in reach
            # of the relabelling are live-flagged; a vacuum stripe's slots
            # are all dead, so the relabel is a no-op on them)
            j_ref[...] = jnp.zeros(j_ref.shape, j_ref.dtype)
            wo_ref[:] = w_ref[:]
            xio_ref[...] = xi_ref[...]
            po_ref[...] = p_ref[...]
            if exo_ref is not None:
                zrow = jnp.zeros((1,) + w_ref.shape, w_ref.dtype)
                prew_row = n_extra + n_probes if n_probes else -1
                for c in range(n_extra):
                    exo_ref[c] = exi_ref[c]
                for c in range(n_extra, n_extra_out):
                    if c == prew_row:
                        exo_ref[c] = w_ref[:]
                    else:
                        exo_ref[c] = zrow[0]

        @pl.when(flag > 0)
        def _():
            _live_body(i, xo, sh, sd, qon, w_ref, xi_ref, p_ref,
                       exi_ref,
                       (we_ref, xie_ref, pe_ref, exe_ref, side_refs),
                       (refw_ref, refxi_ref, refp_ref),
                       (emw_ref, emxi_ref, emp_ref),
                       f_ref, wo_ref, xio_ref, po_ref, exo_ref, j_ref,
                       nd_ref)

        if sides_out:
            # publish this stripe's POST-push halo source columns (the
            # exact values the staged side arrays would hold next step)
            # so decks where nothing else touches the slot state can
            # carry them instead of re-staging (BinnedSpecies.sides).
            # Reads the just-written output blocks; column layout and
            # array order mirror stage_sides / halo_side_arrays.
            n_s = 3 if with_window else 2
            cols = (BX - 1, 0, 1)
            for s in range(n_s):
                cc = cols[s]
                if flat_sides:
                    sides_o[s][...] = wo_ref[:, cc, :]
                    sides_o[n_s + s][0] = xio_ref[0, :, cc, :]
                    sides_o[n_s + s][1] = xio_ref[1, :, cc, :]
                    for c in range(3):
                        sides_o[2 * n_s + s][c] = po_ref[c, :, cc, :]
                else:
                    sides_o[s][0] = wo_ref[:, cc, :]
                    sides_o[n_s + s][0, 0] = xio_ref[0, :, cc, :]
                    sides_o[n_s + s][0, 1] = xio_ref[1, :, cc, :]
                    for c in range(3):
                        sides_o[2 * n_s + s][0, c] = po_ref[c, :, cc, :]

    def _live_body(i, xo, sh, sd, qon, w_ref, xi_ref, p_ref, exi_ref,
                   halos,
                   refills, emission, f_ref, wo_ref, xio_ref, po_ref,
                   exo_ref, j_ref, nd_ref):
        we_ref, xie_ref, pe_ref, exe_ref, side_refs = halos
        refw_ref, refxi_ref, refp_ref = refills
        emw_ref, emxi_ref, emp_ref = emission
        n_sides = 3 if with_window else 2
        # ---- phase 1: half-drift + rebin (particles.F90:234-257 + the
        # reference's implicit cell binning) ----
        w = w_ref[:]
        xi0 = xi_ref[0]
        xi1 = xi_ref[1]
        # extras ride the momentum payload list through BCs + rebin
        # (_bc_axis only touches indices < nd; the butterfly routes all)
        p = [p_ref[0], p_ref[1], p_ref[2]] \
            + [exi_ref[c] for c in range(n_extra)]
        if clear_rcol or with_refill:
            # a pending shift REPLACES column RCOL in-kernel: the
            # departed cell's wrapped content dies and the staged refill
            # (state.window_refill) takes its place — instead of a
            # whole-slot-state DUS on the XLA side
            m = (jax.lax.broadcasted_iota(jnp.int32, w.shape, 1)
                 == REF_RC) & (i == REF_SR) & (sh > 0)
            if with_refill:
                w = jnp.where(m, refw_ref[0][:, None, :], w)
                xi0 = jnp.where(m, refxi_ref[0, 0][:, None, :], xi0)
                xi1 = jnp.where(m, refxi_ref[0, 1][:, None, :], xi1)
                for c in range(3):
                    p[c] = jnp.where(m, refp_ref[0, c][:, None, :], p[c])
                for c in range(3, 3 + n_extra):
                    # fresh particles: aux rows (ids, depths) reset
                    p[c] = jnp.where(m, 0.0, p[c])
            else:
                w = jnp.where(m, 0.0, w)
        if ABLATE == "norebin":
            _phase2(i, xo, sd, qon, w, xi0, xi1, p[:3], p[3:], f_ref,
                    wo_ref, xio_ref, po_ref, exo_ref, j_ref)
            return
        xi0, xi1 = drift(w, xi0, xi1, *p)
        if bounded_x:
            gx0 = xo + i * BX \
                + jax.lax.broadcasted_iota(jnp.int32, w.shape, 1)
            if with_window:
                # pending shift: array column c is grid cell c−sh.  On an
                # unpadded grid the wrapped column 0 is the freshly
                # refilled cell nx−1; with pad columns the refill stages
                # in column nx_real instead (window._insert_column_binned)
                # — already labelled nx_real−1 by the plain c−sh rule —
                # and column 0 (the departed cell) must NOT wrap alive.
                gx0 = gx0 - sh
                if pad_x == 0:
                    gx0 = jnp.where(gx0 < 0, gx0 + nxg, gx0)
                if cull_lo > 0:
                    # shift-time cull of the x_min CPML layer
                    # (window.F90:76,322-342): post-shift cells < thL
                    w = jnp.where((sh > 0) & (gx0 < cull_lo), 0.0, w)
            xis, p, w = _bc_axis([xi0, xi1], p, w, 0, bc[0], bc[1],
                                 kb[0][0], kb[0][1], gx0,
                                 thermal=_mk_thermal(0, sd, i))
            xi0, xi1 = xis

        def halo(side):
            if side_refs is not None:
                wr = side_refs[side]
                xr = side_refs[n_sides + side]
                pr = side_refs[2 * n_sides + side]
                if flat_sides:
                    hw = wr[:][:, None, :]
                    hx0 = xr[0][:, None, :]
                    hx1 = xr[1][:, None, :]
                    hp = [pr[c][:, None, :] for c in range(3)]
                else:
                    hw = wr[0][:, None, :]
                    hx0 = xr[0, 0][:, None, :]
                    hx1 = xr[0, 1][:, None, :]
                    hp = [pr[0, c][:, None, :] for c in range(3)]
                if n_extra:
                    er = side_refs[3 * n_sides + side]
                    hp += [(er[c] if flat_sides else er[0, c])
                           [:, None, :] for c in range(n_extra)]
            else:
                hw = we_ref[:, 0, side, :][:, None, :]
                hx0 = xie_ref[0, :, 0, side, :][:, None, :]
                hx1 = xie_ref[1, :, 0, side, :][:, None, :]
                hp = [pe_ref[c, :, 0, side, :][:, None, :]
                      for c in range(3)] \
                    + [exe_ref[c, :, 0, side, :][:, None, :]
                       for c in range(n_extra)]
            if clear_rcol or with_refill:
                # this halo view reads the replaced column when its
                # global source column is RCOL and a shift is pending
                colg = (i * BX + (-1, BX, BX + 1)[side]) % nxg
                hm = (colg == RCOL) & (sh > 0)
                if with_refill:
                    hw = jnp.where(hm, refw_ref[0][:, None, :], hw)
                    hx0 = jnp.where(hm, refxi_ref[0, 0][:, None, :], hx0)
                    hx1 = jnp.where(hm, refxi_ref[0, 1][:, None, :], hx1)
                    for c in range(3):
                        hp[c] = jnp.where(hm, refp_ref[0, c][:, None, :],
                                          hp[c])
                    for c in range(3, 3 + n_extra):
                        hp[c] = jnp.where(hm, 0.0, hp[c])
                else:
                    hw = jnp.where(hm, 0.0, hw)
            hx0, hx1 = drift(hw, hx0, hx1, *hp)
            if bounded_x:
                # signed global column index: wrap columns fall outside
                # [0, n) and are auto-killed by the kill masks.  With a
                # pending shift the last stripe's first right halo is the
                # refilled column (array col 0 → cell nx−1): nx−sh keeps
                # it alive exactly when sh = 1.
                off = (-1, BX, BX + 1)[side]
                hg = jnp.asarray(xo + i * BX + off, jnp.int32)
                if with_window:
                    hg = hg - sh
                if cull_lo > 0:
                    hw = jnp.where((sh > 0) & (hg < cull_lo), 0.0, hw)
                hxis, hp, hw = _bc_axis([hx0, hx1], hp, hw, 0, bc[0],
                                        bc[1], kb[0][0], kb[0][1], hg,
                                        thermal=_mk_thermal(0, sd, i))
                hx0, hx1 = hxis
            return (hw, hx0, hx1, *hp)

        ndrop = jnp.zeros((), jnp.int32)
        merge_of = getattr(plan, "merge_overflow", False)
        if with_window:
            w, xi0, xi1, p, ndrop = _axis_rebin(
                w, xi0, xi1, p, halo(0), halo(1), K, 0, ndrop,
                haloR2=halo(2), shmask=sh > 0, merge=merge_of)
        else:
            w, xi0, xi1, p, ndrop = _axis_rebin(
                w, xi0, xi1, p, halo(0), halo(1), K, 0, ndrop,
                merge=merge_of)
        if bounded_y:
            gy = jax.lax.broadcasted_iota(jnp.int32, w.shape, 2)
            xis, p, w = _bc_axis([xi0, xi1], p, w, 1, bc[2], bc[3],
                                 kb[1][0], kb[1][1], gy,
                                 thermal=_mk_thermal(1, sd, i))
            xi0, xi1 = xis
        ecands = None
        if emit_k:
            # photons born this step in the emitter kernels: cell-local
            # candidates with fresh (zero) aux payload rows
            ez = [jnp.zeros(emw_ref.shape, dtype)] * n_extra
            ecands = (emw_ref[:],
                      [emxi_ref[0], emxi_ref[1],
                       emp_ref[0], emp_ref[1], emp_ref[2]] + ez)
        w, xi0, xi1, p, ndrop = _axis_rebin(
            w, xi0, xi1, p, None, None, K, 1, ndrop, merge=merge_of,
            extra_cands=ecands)
        nd_ref[0, 0] = nd_ref[0, 0] + ndrop
        extras = p[3:]
        p = p[:3]
        if ABLATE == "nopush":
            j_ref[...] = jnp.zeros(j_ref.shape, j_ref.dtype)
            wo_ref[:] = w
            xio_ref[0] = xi0
            xio_ref[1] = xi1
            for c in range(3):
                po_ref[c] = p[c]
            if exo_ref is not None:
                for c in range(n_extra):
                    exo_ref[c] = extras[c]
                for c in range(n_extra, n_extra_out):
                    exo_ref[c] = jnp.zeros(w.shape, w.dtype)
            return
        _phase2(i, xo, sd, qon, w, xi0, xi1, p, extras, f_ref, wo_ref,
                xio_ref, po_ref, exo_ref, j_ref)

    def _phase2(i, xo, sd, qon, w, xi0, xi1, p, extras, f_ref, wo_ref,
                xio_ref, po_ref, exo_ref, j_ref):
        if exo_ref is not None:
            prew_row = n_extra + n_probes if n_probes else -1
            for c in range(n_extra):
                exo_ref[c] = extras[c]
            for c in range(n_extra, n_extra_out):
                # probe end-of-step distances / eta default to 0 for
                # dead or skipped row blocks (the pre-BC weight row
                # gates probe firing)
                if c == prew_row:
                    exo_ref[c] = w      # pre-BC aliveness
                else:
                    exo_ref[c] = jnp.zeros(w.shape, w.dtype)

        # ---- phase 2: gather/Boris/move/deposit on the rebinned slots
        # (ξ ∈ [-0.5, 0.5): c1 ≡ 0) ----
        #
        # Work in row BLOCKS of the slot axis, each gated on any-live:
        # the rebin compacts live slots to the top of every cell, so a
        # stripe occupied to depth m only pays for ⌈m/RB⌉ blocks — on an
        # LWFA deck most stripes sit far below the wake-peak depth that
        # sizes K.  Dead/skipped rows keep the pass-through write below.
        j_ref[...] = jnp.zeros(j_ref.shape, j_ref.dtype)
        wo_ref[:] = w
        xio_ref[0] = xi0
        xio_ref[1] = xi1
        po_ref[0] = p[0]
        po_ref[1] = p[1]
        po_ref[2] = p[2]
        for r0 in range(0, K, ROW_BLOCK):
            r1 = min(r0 + ROW_BLOCK, K)
            blk = slice(r0, r1)
            wb = w[blk]
            x0b = xi0[blk]
            x1b = xi1[blk]
            pb = [p[0][blk], p[1][blk], p[2][blk]]

            @pl.when(jnp.any(wb > 0))
            def _(i=i, r0=r0, r1=r1, wb=wb, x0b=x0b, x1b=x1b, pb=pb):
                _push_block(i, xo, sd, qon, r0, r1, wb, x0b, x1b, pb,
                            f_ref,
                            wo_ref, xio_ref, po_ref, exo_ref, j_ref)

    def _push_block(i, xo, sd, qon, r0, r1, w, xi0, xi1, p, f_ref,
                    wo_ref, xio_ref, po_ref, exo_ref, j_ref):
        alive = w > 0
        xi = [xi0, xi1]

        def _gather6():
            # 6-component staggered triangle gather at the post-rebin
            # (ξ-centred) positions; shared by the massive push and the
            # photon pair-rate path
            cf1 = [-xi[d] for d in range(nd)]
            c2 = [jnp.floor(xi[d]) for d in range(nd)]
            cf2 = [c2[d] - xi[d] + 0.5 for d in range(nd)]
            gw = [{o: _tri_const(cf1[d], o) for o in (-1, 0, 1)}
                  for d in range(nd)]
            hw = [{o: _w_sel(cf2[d], o, c2[d], (-1.0, 0.0))
                   for o in (-2, -1, 0, 1)} for d in range(nd)]

            wprod_cache = {}

            def wprods(bits):
                if bits not in wprod_cache:
                    tabs = [hw[d] if bits[d] else gw[d] for d in range(nd)]
                    out = {}
                    for ox in sorted(tabs[0]):
                        for oy in sorted(tabs[1]):
                            out[(ox, oy)] = tabs[0][ox] * tabs[1][oy]
                    wprod_cache[bits] = out
                return wprod_cache[bits]

            accs = {}
            bf16g = _os.environ.get("EPOCH_TPU_BF16_GATHER") == "1"
            for k, nm in enumerate(names):
                if ABLATE == "nogather":
                    accs[nm] = jnp.zeros(w.shape, dtype)
                    continue
                acc = jnp.zeros(w.shape, dtype)
                for (ox, oy), ww in wprods(stag_bits[nm]).items():
                    win = f_ref[0, k, ox + 2:ox + 2 + BX, 2 + oy:2 + oy + NY]
                    if bf16g:
                        # experiment (EPOCH_TPU_BF16_GATHER=1): bf16
                        # shape-weight products, f32 accumulate.
                        # MEASURED NEGATIVE at bench shapes: 912 vs
                        # 950 M pushes/s — the casts outweigh any VPU
                        # gain (bf16 ALU rate = f32 here).  Kept as a
                        # recorded result; default off.
                        acc = acc + (ww.astype(jnp.bfloat16)
                                     * win[None].astype(jnp.bfloat16)
                                     ).astype(dtype)
                    else:
                        acc = acc + ww * win[None]
                accs[nm] = acc
            return tuple(fac * accs[nm] for nm in names)

        if photon and not move:
            # immobile / photon_dynamics=F species: rebin-only (the
            # kernel exists to consume pending window relabels + the
            # swept-boundary cull; particles.F90:178 skips the move)
            xi_new = [xi[d] for d in range(nd)]
            p_new = [p[0], p[1], p[2]]
        elif photon:
            # ballistic full-dt move (push_photons_binned numerics)
            mag = jnp.sqrt(p[0] * p[0] + p[1] * p[1] + p[2] * p[2])
            if qed is not None:
                # in-kernel Breit-Wheeler pair rates (calculate_chi,
                # photons.F90:714-745 + the optical-depth decrement,
                # :607-660): chi from the kernel's own gathered fields
                # at the PRE-move position, T(chi) from the log-log
                # polyfit (QED_COEF), d_od = C1·chi·T/part_e.  The
                # fired photons (od <= 0) are destroyed XLA-side by the
                # sparse pair tail (qed.py), which reads chi from the
                # eta row.
                ex_p, ey_p, ez_p, bx_p, by_p, bz_p = _gather6()
                msafe = jnp.where(mag > 0, mag, 1.0)
                dxv = p[0] / msafe
                dyv = p[1] / msafe
                dzv = p[2] / msafe
                edd = ex_p * dxv + ey_p * dyv + ez_p * dzv
                qx = ex_p - edd * dxv + const.c * (dyv * bz_p - dzv * by_p)
                qy = ey_p - edd * dyv + const.c * (dzv * bx_p - dxv * bz_p)
                qz = ez_p - edd * dzv + const.c * (dxv * by_p - dyv * bx_p)
                part_e = mag * float(1.0 / (const.m0 * const.c))
                chi_q = QED_CETA * part_e * jnp.sqrt(
                    qx * qx + qy * qy + qz * qz)
                # T(chi) = exp(ln10·(poly(xn) − (8/3)·log10(e)/chi)):
                # the Erber exponential is exact, the residual poly is
                # fit in a [-1,1]-normalised abscissa (QED_LO/HI carry
                # the fit's mid/half here — see QEDPlan.pair_fit_*)
                chi_s = jnp.maximum(chi_q, 1e-30)
                xn = jnp.clip(
                    (jnp.log(chi_s) * float(1.0 / math.log(10.0))
                     - QED_LO) * float(1.0 / QED_HI), -1.0, 1.0)
                acc_t = jnp.zeros_like(xn) + QED_COEF[0]
                for cpoly in QED_COEF[1:]:
                    acc_t = acc_t * xn + cpoly
                expnt = acc_t - float(8.0 / 3.0 * math.log10(math.e)) \
                    / chi_s
                t_q = jnp.exp(expnt * float(math.log(10.0)))
                d_od = QED_C1 * chi_q * t_q / jnp.maximum(part_e, 1e-30)
                od_q = exo_ref[QED_IOD, r0:r1]
                uq = _hash_u01(qon[1], i, 301 + r0, w.shape, w.dtype)
                od_q = jnp.where(od_q <= 0.0,
                                 -jnp.log(1.0 - 0.999999 * uq), od_q)
                # pair-eligibility gate in-kernel (photons.F90: only
                # photons with E > 2·m0·c² can pair-produce): ineligible
                # photons keep od > 0, so the XLA-side fire mask needs
                # no dense |p| recomputation (which forced full-array
                # layout copies around the custom call)
                exo_ref[QED_IOD, r0:r1] = od_q - jnp.where(
                    alive & (qon[0] > 0) & (mag > 0) & (part_e > 2.0),
                    d_od, 0.0)
                exo_ref[ETA_ROW, r0:r1] = jnp.where(alive, chi_q, 0.0)
            ok = alive & (mag > 0)
            faci = float(const.c * plan.dt) / jnp.where(mag > 0, mag, 1.0)
            xi_new = [jnp.where(ok, xi[d] + p[d] * faci
                                / float(plan.delta[d]), xi[d])
                      for d in range(nd)]
            p_new = [p[0], p[1], p[2]]
        else:
            u = [p[c] * ipart_mc for c in range(3)]
            ex_p, ey_p, ez_p, bx_p, by_p, bz_p = _gather6()

            if qed is not None:
                # QED synchrotron rates at the particle (calculate_eta,
                # photons.F90:661-712), reusing the push's own gathered
                # fields: eta, then the optical-depth decrement with
                # h(eta) from the log-log polyfit of the reference table
                # (table gathers cannot lower in Mosaic).  Emission
                # itself stays XLA-side, sparse over fired slots.
                alv = w > 0
                g_q = jnp.sqrt(u[0] * u[0] + u[1] * u[1] + u[2] * u[2]
                               + 1.0)
                mod2 = jnp.maximum(u[0] * u[0] + u[1] * u[1]
                                   + u[2] * u[2], 1e-20)
                bxv = [u[c] / g_q for c in range(3)]
                ude = (u[0] * ex_p + u[1] * ey_p + u[2] * ez_p) / mod2
                gx_ = ex_p - ude * u[0] \
                    + const.c * (bxv[1] * bz_p - bxv[2] * by_p)
                gy_ = ey_p - ude * u[1] \
                    + const.c * (bxv[2] * bx_p - bxv[0] * bz_p)
                gz_ = ez_p - ude * u[2] \
                    + const.c * (bxv[0] * by_p - bxv[1] * bx_p)
                be_ = (bxv[0] * ex_p + bxv[1] * ey_p + bxv[2] * ez_p) \
                    / jnp.sqrt(mod2)
                eta_q = QED_CETA * g_q * jnp.sqrt(
                    gx_ * gx_ + gy_ * gy_ + gz_ * gz_ + be_ * be_)
                lg = jnp.clip(
                    jnp.log(jnp.maximum(eta_q, 1e-30))
                    * float(1.0 / math.log(10.0)), QED_LO, QED_HI)
                acc_h = jnp.zeros_like(lg) + QED_COEF[0]
                for cpoly in QED_COEF[1:]:
                    acc_h = acc_h * lg + cpoly
                h_q = jnp.exp(acc_h * float(math.log(10.0)))
                d_od = QED_C1 * eta_q * h_q / g_q
                od_q = exo_ref[QED_IOD, r0:r1]
                # entry resample of exhausted/uninitialised depths
                # (photons.F90 reset_optical_depth), then the decrement:
                # post-push od <= 0 thereby flags a fire for the next
                # qed pass (one-step emission latency vs the reference's
                # same-pass processing — a dt-level approximation)
                uq = _hash_u01(qon[1], i, 301 + r0, w.shape, w.dtype)
                od_q = jnp.where(od_q <= 0.0,
                                 -jnp.log(1.0 - 0.999999 * uq), od_q)
                od_out = od_q - jnp.where(
                    alv & (qon[0] > 0), d_od, 0.0)
                exo_ref[QED_IOD, r0:r1] = od_out
                fire_q = e_ph_q = None
                if QED_EMIT is None:
                    exo_ref[ETA_ROW, r0:r1] = jnp.where(alv, eta_q, 0.0)
                else:
                    # in-kernel photon-energy sample (generate_photon /
                    # calculate_photon_energy, photons.F90:867-943):
                    # same Chebyshev fit as qed._sample_chi_fit, on the
                    # VPU while the gathered fields are hot.  The last
                    # extras row carries e_ph of this step's fires for
                    # the XLA candidate build (photon-kernel rebin).
                    CH_COEFS, CH_LE0, CH_LE1, CH_PMAX, CH_RR = QED_EMIT
                    LN10 = float(math.log(10.0))
                    # eta > 0 guards freshly-created pair electrons
                    # whose rate rows are still zero (od = 0 would
                    # otherwise read as an instant fire with eta -> 0
                    # and a divergent e_ph — same guard as the photon
                    # path's chi_row > 0)
                    fire_q = alv & (qon[0] > 0) & (od_out <= 0.0) \
                        & (eta_q > 0.0)
                    rq = _hash_u01(qon[1], i, 517 + r0, w.shape,
                                   w.dtype)
                    lgc = jnp.clip(
                        jnp.log(jnp.maximum(eta_q, 1e-30)) / LN10,
                        CH_LE0, CH_LE1)
                    xnq = (2.0 * (lgc - CH_LE0)
                           / (CH_LE1 - CH_LE0) - 1.0)
                    ynq = (2.0 * jnp.minimum(rq, CH_PMAX)
                           / CH_PMAX - 1.0)
                    rows_q = []
                    for row in CH_COEFS:
                        b1 = jnp.zeros_like(ynq)
                        b2 = jnp.zeros_like(ynq)
                        for ck in row[:0:-1]:
                            b1, b2 = ck + 2.0 * ynq * b1 - b2, b1
                        rows_q.append(row[0] + ynq * b1 - b2)
                    b1 = jnp.zeros_like(xnq)
                    b2 = jnp.zeros_like(xnq)
                    for ck in rows_q[:0:-1]:
                        b1, b2 = ck + 2.0 * xnq * b1 - b2, b1
                    u_fit = rows_q[0] + xnq * b1 - b2
                    chi_q = jnp.exp(LN10 * (
                        lgc - float(math.log10(2.0))
                        + jnp.minimum(u_fit, 0.0)))
                    e_ph_q = ((2.0 * chi_q
                               / jnp.maximum(eta_q, 1e-30)) * g_q
                              * float(const.m0 * const.c ** 2))
                    e_ph_q = jnp.where(fire_q, e_ph_q, 0.0)
                    exo_ref[ETA_ROW, r0:r1] = e_ph_q

            # Boris rotation (particles.F90:304-350)
            uxm = u[0] + cm * ex_p
            uym = u[1] + cm * ey_p
            uzm = u[2] + cm * ez_p
            if plan.higuera_cary:
                g2 = uxm * uxm + uym * uym + uzm * uzm + 1.0
                alpha_hc = float(0.5 * q * plan.dt / mass)
                bx_b = alpha_hc * bx_p
                by_b = alpha_hc * by_p
                bz_b = alpha_hc * bz_p
                beta2 = bx_b * bx_b + by_b * by_b + bz_b * bz_b
                sigma = g2 - beta2
                bdotu = bx_b * uxm + by_b * uym + bz_b * uzm
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
            vy = uy * rootc
            vz = uz * rootc

            xi_new = [xi[d] + delta[d] for d in range(nd)]
            p_new = [ux * part_mc, uy * part_mc, uz * part_mc]
            if qed is not None and QED_EMIT is not None \
                    and QED_EMIT[4]:
                # same-pass radiation-reaction recoil on the written-
                # back momentum (photons.F90 same-pass processing); the
                # deposit below stays on the un-recoiled trajectory —
                # recoil affects motion from the NEXT step, exactly as
                # the XLA tail's post-deposit application did
                magn = jnp.sqrt(p_new[0] * p_new[0]
                                + p_new[1] * p_new[1]
                                + p_new[2] * p_new[2])
                msafe_q = jnp.maximum(magn, 1e-30)
                sc_q = jnp.where(
                    fire_q,
                    jnp.maximum(magn - e_ph_q * float(1.0 / const.c),
                                0.0) / msafe_q,
                    1.0)
                p_new = [c_ * sc_q for c_ in p_new]

        if n_probes:
            # signed end-of-step plane distances at the PRE-BC position
            # (particles.F90:518-557 captures before particle_bcs)
            gxc = (xo + i * BX + jax.lax.broadcasted_iota(
                jnp.int32, w.shape, 1)).astype(w.dtype)
            gyc = jax.lax.broadcasted_iota(
                jnp.int32, w.shape, 2).astype(w.dtype)
            xf = [float(plan.grid_min[0]) + (gxc + xi_new[0])
                  * float(plan.delta[0]),
                  float(plan.grid_min[1]) + (gyc + xi_new[1])
                  * float(plan.delta[1])]
            for pi, (normal, point) in enumerate(probe_specs):
                dfin = jnp.zeros(w.shape, w.dtype)
                for d in range(nd):
                    dfin = dfin + float(normal[d]) * (float(point[d])
                                                      - xf[d])
                exo_ref[n_extra + pi, r0:r1] = dfin

        def write_back(xi_out, p_out, w_out):
            xio_ref[0, r0:r1] = jnp.where(alive, xi_out[0], xi[0])
            xio_ref[1, r0:r1] = jnp.where(alive, xi_out[1], xi[1])
            po_ref[0, r0:r1] = jnp.where(alive, p_out[0], p[0])
            po_ref[1, r0:r1] = jnp.where(alive, p_out[1], p[1])
            po_ref[2, r0:r1] = jnp.where(alive, p_out[2], p[2])
            wo_ref[r0:r1] = w_out

        def apply_bcs(xi_out, p_out, w_out):
            # end-of-push boundary BCs (reference particle_bcs timing);
            # runs AFTER the deposit, which uses the pre-BC state
            if not bounded:
                return xi_out, p_out, w_out
            if bc[0] != PER or bc[1] != PER:
                gx = xo + i * BX + jax.lax.broadcasted_iota(
                    jnp.int32, w.shape, 1)
                xi_out, p_out, w_out = _bc_axis(
                    xi_out, p_out, w_out, 0, bc[0], bc[1],
                    kb[0][0], kb[0][1], gx,
                    thermal=_mk_thermal(0, sd, i))
            if bc[2] != PER or bc[3] != PER:
                gy = jax.lax.broadcasted_iota(jnp.int32, w.shape, 2)
                xi_out, p_out, w_out = _bc_axis(
                    xi_out, p_out, w_out, 1, bc[2], bc[3],
                    kb[1][0], kb[1][1], gy,
                    thermal=_mk_thermal(1, sd, i))
            return xi_out, p_out, w_out

        if photon or sp.zero_current or sp.immobile \
                or ABLATE == "nodeposit":
            xi_b, p_b, w_b = apply_bcs(list(xi_new), list(p_new), w)
            write_back(xi_b, p_b, w_b)
            return

        # ---- deposition at t+1.5dt (particles.F90:397-514) ----
        live_w = jnp.where(alive, w, 0.0)
        xi_dep = [xi_new[d] + delta[d] for d in range(nd)]
        c3 = [jnp.clip(jnp.floor(x + 0.5), -1.0, 1.0) for x in xi_dep]
        cf3 = [c3[d] - xi_dep[d] for d in range(nd)]
        # start-of-push fractions (the gather's cf1, recomputed: ξ is
        # cell-centred post-rebin so cf1 ≡ -ξ)
        cf1 = [-xi[d] for d in range(nd)]
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
        xfac1 = [gx5[0][k] + 0.5 * dxw[0][k] for k in range(W)]
        yfac1 = [gx5[1][k] + 0.5 * dxw[1][k] for k in range(W)]
        yfac2 = [third * dxw[1][k] + 0.5 * gx5[1][k] for k in range(W)]
        fz = fjz * vz
        # hoist the per-offset one-sided products (each reused W times
        # across the transverse loop) and split jz into its two separable
        # rank-1 terms: fz·gx5x⊗yfac1 (gx5[0][k] ≡ 0 at k ∈ {0, W−1}:
        # only W−2 x-offsets contribute) + fz·dxwx⊗yfac2.  Versus the
        # fused 2-term product this trades (W²)·2 extra multiplies and an
        # add per pair for one multiply each — ~35% less deposit
        # arithmetic for jz at the cost of (W−2)·W extra (BX, NY)
        # accumulator adds (1/ROW_BLOCK the cost of a slot-deep op).
        xjx = [-fjx * dcum[0][k] for k in range(W - 1)]
        yjy = [-fjy * dcum[1][k] for k in range(W - 1)]
        fzg = {k: fz * gx5[0][k] for k in range(1, W - 1)}
        fzd = [fz * dxw[0][k] for k in range(W)]
        for ki in range(W):
            for kj in range(W):
                ox = offsets[ki]
                oy = offsets[kj]
                xs = slice(ox + M, ox + M + BX)
                ys = slice(M + oy, M + oy + NY)
                # the full-window running sum dcum[..][W-1] = Σ(hx−gx)
                # is identically zero (both normalise to 1): the last
                # x-offset contributes no jx, the last y-offset no jy
                if ki < W - 1:
                    vx = jnp.sum(xjx[ki] * yfac1[kj], axis=0)
                    j_ref[0, 0, xs, ys] += vx
                if kj < W - 1:
                    vy_ = jnp.sum(xfac1[ki] * yjy[kj], axis=0)
                    j_ref[0, 1, xs, ys] += vy_
                if ki in fzg:
                    j_ref[0, 2, xs, ys] += jnp.sum(fzg[ki] * yfac1[kj],
                                                   axis=0)
                j_ref[0, 2, xs, ys] += jnp.sum(fzd[ki] * yfac2[kj],
                                               axis=0)

        xi_b, p_b, w_b = apply_bcs(list(xi_new), list(p_new), w)
        write_back(xi_b, p_b, w_b)

    grid = (nxb,)
    H = 3 if with_window else 2
    in_specs = [
        pl.BlockSpec((K, BX, NY), lambda i, *_: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, K, BX, NY), lambda i, *_: (0, 0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, K, BX, NY), lambda i, *_: (0, 0, i, 0),
                     memory_space=pltpu.VMEM),
    ] + ([pl.BlockSpec((n_extra_in, K, BX, NY), lambda i, *_: (0, 0, i, 0),
                       memory_space=pltpu.VMEM)] if n_extra else [])
    if halo_mode == "cols" and flat_sides:
        # per-side column arrays (…, K, nxb·NY): block (…, K, NY) at
        # last-dim offset j·NY reads the NEIGHBOUR stripe's column —
        # no transpose on the XLA side (NY % 128 == 0 keeps the block
        # lane-aligned).
        lm = lambda i, *_: (0, (i - 1) % nxb)
        rm = lambda i, *_: (0, (i + 1) % nxb)
        lm2 = lambda i, *_: (0, 0, (i - 1) % nxb)
        rm2 = lambda i, *_: (0, 0, (i + 1) % nxb)
        side_maps = [lm, rm] + ([rm] if with_window else [])
        side_maps2 = [lm2, rm2] + ([rm2] if with_window else [])
        for mp in side_maps:
            in_specs.append(pl.BlockSpec((K, NY), mp,
                                         memory_space=pltpu.VMEM))
        for mp in side_maps2:
            in_specs.append(pl.BlockSpec((2, K, NY), mp,
                                         memory_space=pltpu.VMEM))
        for mp in side_maps2:
            in_specs.append(pl.BlockSpec((3, K, NY), mp,
                                         memory_space=pltpu.VMEM))
        if n_extra:
            for mp in side_maps2:
                in_specs.append(pl.BlockSpec((n_extra, K, NY), mp,
                                             memory_space=pltpu.VMEM))
    elif halo_mode == "cols":
        # per-side column arrays (nxb, …, K, NY): the index_map reads
        # the NEIGHBOUR stripe's entry — the periodic roll is free.
        # The blocked stripe axis leads so the trailing block dims
        # (K, NY) are full-extent (Mosaic's alignment rule).
        lm = lambda i, *_: ((i - 1) % nxb, 0, 0)
        rm = lambda i, *_: ((i + 1) % nxb, 0, 0)
        lm2 = lambda i, *_: ((i - 1) % nxb, 0, 0, 0)
        rm2 = lambda i, *_: ((i + 1) % nxb, 0, 0, 0)
        side_maps = [lm, rm] + ([rm] if with_window else [])
        side_maps2 = [lm2, rm2] + ([rm2] if with_window else [])
        for mp in side_maps:
            in_specs.append(pl.BlockSpec((1, K, NY), mp,
                                         memory_space=pltpu.VMEM))
        for mp in side_maps2:
            in_specs.append(pl.BlockSpec((1, 2, K, NY), mp,
                                         memory_space=pltpu.VMEM))
        for mp in side_maps2:
            in_specs.append(pl.BlockSpec((1, 3, K, NY), mp,
                                         memory_space=pltpu.VMEM))
        if n_extra:
            for mp in side_maps2:
                in_specs.append(pl.BlockSpec((1, n_extra, K, NY), mp,
                                             memory_space=pltpu.VMEM))
    else:
        in_specs += [
            pl.BlockSpec((K, 1, H, NY), lambda i, *_: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, K, 1, H, NY), lambda i, *_: (0, 0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, K, 1, H, NY), lambda i, *_: (0, 0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + ([pl.BlockSpec((n_extra, K, 1, H, NY),
                           lambda i, *_: (0, 0, i, 0, 0),
                           memory_space=pltpu.VMEM)] if n_extra else [])
    in_specs += [
        pl.BlockSpec((1, 6, BX + 2 * M, NY + 2 * M),
                     lambda i, *_: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if with_refill:
        # staged refill column (broadcast to every stripe; consumed only
        # where the column test hits)
        in_specs += [
            pl.BlockSpec((1, K, NY), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, K, NY), lambda i, *_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, K, NY), lambda i, *_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    if emit_k:
        in_specs += [
            pl.BlockSpec((emit_k, BX, NY), lambda i, *_: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, emit_k, BX, NY),
                         lambda i, *_: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, emit_k, BX, NY),
                         lambda i, *_: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ]
    out_specs = (
        pl.BlockSpec((K, BX, NY), lambda i, *_: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, K, BX, NY), lambda i, *_: (0, 0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, K, BX, NY), lambda i, *_: (0, 0, i, 0),
                     memory_space=pltpu.VMEM),
    ) + ((pl.BlockSpec((n_extra_out, K, BX, NY),
                       lambda i, *_: (0, 0, i, 0),
                       memory_space=pltpu.VMEM),) if n_extra_out else ()) + (
        pl.BlockSpec((1, 3, BX + 2 * M, NY + 2 * M), lambda i, *_: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct((K, nx, NY), dtype),
        jax.ShapeDtypeStruct((2, K, nx, NY), dtype),
        jax.ShapeDtypeStruct((3, K, nx, NY), dtype),
    ) + ((jax.ShapeDtypeStruct((n_extra_out, K, nx, NY), dtype),)
         if n_extra_out else ()) + (
        jax.ShapeDtypeStruct((nxb, 3, BX + 2 * M, NY + 2 * M), dtype),
        jax.ShapeDtypeStruct((1, 1), jnp.int32),
    )
    if sides_out:
        # carried halo side columns: output arrays mirror the side-INPUT
        # layout exactly (flat (…, K, nxb·NY) or lead (nxb, …, K, NY)),
        # ordered [w sides…, xi sides…, p sides…].  NOT io-aliased to
        # the side inputs: stripe i reads its neighbours' entries from
        # the PREVIOUS step's buffer, which an in-place write would
        # corrupt mid-grid.
        n_s = 3 if with_window else 2
        if flat_sides:
            out_specs = out_specs + tuple(
                pl.BlockSpec((K, NY), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM) for _ in range(n_s)
            ) + tuple(
                pl.BlockSpec((2, K, NY), lambda i, *_: (0, 0, i),
                             memory_space=pltpu.VMEM) for _ in range(n_s)
            ) + tuple(
                pl.BlockSpec((3, K, NY), lambda i, *_: (0, 0, i),
                             memory_space=pltpu.VMEM) for _ in range(n_s))
            out_shape = out_shape + tuple(
                jax.ShapeDtypeStruct((K, nxb * NY), dtype)
                for _ in range(n_s)) + tuple(
                jax.ShapeDtypeStruct((2, K, nxb * NY), dtype)
                for _ in range(n_s)) + tuple(
                jax.ShapeDtypeStruct((3, K, nxb * NY), dtype)
                for _ in range(n_s))
        else:
            out_specs = out_specs + tuple(
                pl.BlockSpec((1, K, NY), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM) for _ in range(n_s)
            ) + tuple(
                pl.BlockSpec((1, 2, K, NY), lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM) for _ in range(n_s)
            ) + tuple(
                pl.BlockSpec((1, 3, K, NY), lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM) for _ in range(n_s))
            out_shape = out_shape + tuple(
                jax.ShapeDtypeStruct((nxb, K, NY), dtype)
                for _ in range(n_s)) + tuple(
                jax.ShapeDtypeStruct((nxb, 2, K, NY), dtype)
                for _ in range(n_s)) + tuple(
                jax.ShapeDtypeStruct((nxb, 3, K, NY), dtype)
                for _ in range(n_s))
    n_scal = 1 + (1 if with_window else 0) + (1 if any_thermal else 0) \
        + (1 if with_xoff else 0) + (1 if qed is not None else 0)
    # donate the slot state into its outputs: without this XLA
    # double-buffers w/xi/p around the custom call inside the scan carry
    # (~90 µs/step of pure HBM copies at bench shapes)
    io_aliases = {n_scal + 0: 0, n_scal + 1: 1, n_scal + 2: 2}
    if n_extra and n_extra_out == n_extra_in:
        io_aliases[n_scal + 3] = 3
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_scal,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        input_output_aliases=io_aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the default 16 MiB scoped-vmem cap trips at NY ≳ 300 (the
            # 3K-slot rebin candidates + double-buffered payload blocks
            # scale with NY); real VMEM is far larger on current chips
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# XLA-side driver
# ---------------------------------------------------------------------------

def pick_bx(nx, mosaic=True):
    """Stripe width: Mosaic requires the sublane block dim be a multiple
    of 8 (BinnedPlan.ns pads bounded-x grids to guarantee one exists);
    interpret mode (CPU tests, tiny grids) may use narrower stripes."""
    import os
    env = os.environ.get("EPOCH_TPU_BX")
    if env:
        bx = int(env)
        return bx if nx % bx == 0 and nx // bx >= 2 else None
    # 16 first: measured +1% over BX=8 at bench shapes (fewer grid steps
    # and halo fetches per particle)
    cands = (16, 8) if mosaic else (16, 8, 4, 2)
    for bx in cands:
        if nx % bx == 0 and nx // bx >= 2:
            return bx
    return None


class PallasBinned:
    """Per-(species, config) fused kernel + the XLA glue."""

    def __init__(self, plan, sp, cfg, interpret=False, with_window=False,
                 n_extra=0, probe_specs=(), spmd_axis=None, mesh_n=1,
                 with_refill=False, cull_lo=0, clear_rcol=False,
                 photon=False, move=True, qed=None, sides_out=False,
                 k=None, emit_k=0):
        """``spmd_axis``: mesh axis name when running per-shard inside a
        shard_map over grid-x (parallel/spmd_push.py) — halo columns at
        shard edges then come from lax.ppermute ring exchanges, and the
        kernel receives the shard's global x offset as a scalar so
        boundary / window cell arithmetic stays global."""
        self.plan = plan
        self.sp = sp
        self.K = k if k else cfg.bin_k
        self.spmd_axis = spmd_axis
        self.mesh_n = mesh_n
        self.nx_global, self.ny = plan.ns     # slot-grid (padded) extents
        self.nx_real = plan.n[0]              # physical cells
        self.nx = self.nx_global // mesh_n
        self.BX = pick_bx(self.nx, mosaic=not interpret)
        self.nxb = self.nx // self.BX
        dtype = jnp.dtype(cfg.dtype)
        self.dtype = dtype
        self.interpret = interpret
        self.with_window = with_window
        self.n_extra = n_extra
        self.n_probes = len(probe_specs)
        self.n_extra_out = n_extra + (self.n_probes + 1
                                      if self.n_probes else 0) \
            + (1 if qed is not None else 0)
        # grown-output aliasing (see make_fused_push): callers pass the
        # FULL aux incl. the eta row; no slice/concat copies XLA-side
        self.alias_extras = (qed is not None and n_extra > 0
                             and self.n_probes == 0)
        # carried-sides fast path: kernel outputs its halo source
        # columns; only meaningful without extra payload rows (aux rows
        # would also need carrying) and off the spmd/stacked layout
        self.sides_out = bool(sides_out)
        if sides_out:
            assert n_extra == 0 and spmd_axis is None, \
                "sides carry requires n_extra == 0 and no spmd axis"
        bc = tuple(sp.bc_particle[:4])
        self.any_thermal = any(
            b in (const.BC.THERMAL, const.BC.HEAT_BATH) for b in bc)
        # single-device path: halo columns ride BlockSpec neighbour
        # index maps; sharded path: pre-stacked tensors with ppermute-
        # patched shard edges (spmd_push.py)
        self.halo_mode = "cols" if spmd_axis is None else "stacked"
        import os as _os
        self.flat_sides = (self.halo_mode == "cols"
                           and self.ny % 128 == 0
                           and _os.environ.get("EPOCH_TPU_FLAT_SIDES",
                                               "1") != "0")
        self.with_refill = with_refill
        self.qed_enabled = qed is not None
        self.emit_k = emit_k
        self.fused = make_fused_push(
            self.K, self.BX, self.ny, self.nxb, plan, sp, dtype, bc=bc,
            interpret=interpret, with_window=with_window,
            n_extra=n_extra, probe_specs=probe_specs,
            with_xoff=spmd_axis is not None, nx_global=self.nx_global,
            pad_x=self.nx_global - self.nx_real,
            halo_mode=self.halo_mode, with_refill=with_refill,
            cull_lo=cull_lo, clear_rcol=clear_rcol, photon=photon,
            move=move, qed=qed, sides_out=sides_out, emit_k=emit_k)
        # refill staging column (must match make_fused_push RCOL)
        self.rcol = self.nx_real if self.nx_global > self.nx_real else 0
        self.n_halo = 3 if with_window else 2

    def stripecol(self, a, axis, col0):
        """Column ``col0`` of every BX-stripe along ``axis`` →
        [..., nxb, ...] (reshape + unit index: gather-free, layout-safe;
        see ROUND2 notes on jnp.take layout poisoning)."""
        import os
        BX = self.BX
        nd_ = a.ndim
        if os.environ.get("EPOCH_TPU_HALO") == "slice":
            starts = [0] * nd_
            limits = list(a.shape)
            strides = [1] * nd_
            starts[axis] = col0
            strides[axis] = BX
            return jax.lax.slice(a, starts, limits, strides)
        pre = a.shape[:axis]
        post = a.shape[axis + 1:]
        ar = a.reshape(pre + (self.nxb, BX) + post)
        return ar[(slice(None),) * (axis + 1) + (col0,)]

    def halo_side_arrays(self, a, axis):
        """Per-side halo column arrays [..., nxb, ...] for halo_mode
        "cols": [left-of-stripe source, right source(, 2nd right)] — the
        neighbour roll happens in the kernel's BlockSpec index_map, so
        no XLA pad/concat staging is materialised (was ~0.35 ms/step at
        bench shapes)."""
        cols = [self.stripecol(a, axis, self.BX - 1),
                self.stripecol(a, axis, 0)]
        if self.with_window:
            cols.append(self.stripecol(a, axis, 1))
        if self.flat_sides:
            # (…, nxb, NY) → (…, nxb·NY): a free reshape of contiguous
            # trailing dims — the kernel blocks (…, K, NY) at last-dim
            # offset i·NY (NY % 128 == 0), so no moveaxis copy is paid
            return [c.reshape(c.shape[:axis] + (-1,)) for c in cols]
        # stripe axis leading: the kernel blocks it to 1 so the trailing
        # block dims (K, NY) stay full-extent (Mosaic alignment rule)
        return [jnp.moveaxis(c, axis, 0) for c in cols]

    def halo_cols(self, a, axis):
        """Halo columns per stripe along grid-x ``axis`` →
        shape [..., nxb, n_halo, NY].

        SPMD/shard_map layout only (halo_mode "stacked"): shard-edge
        entries are patched by lax.ppermute ring exchanges below.  The
        columns are {i·BX−1}, {(i+1)·BX}, {(i+1)·BX+1} mod nx."""
        BX = self.BX
        nd_ = a.ndim

        def stripecol(col0):
            return self.stripecol(a, axis, col0)

        def tk(lo, hi):
            sl = [slice(None)] * nd_
            sl[axis] = slice(lo, hi)
            return tuple(sl)

        if self.spmd_axis is None:
            left = jnp.roll(stripecol(BX - 1), 1, axis=axis)
            right = jnp.roll(stripecol(0), -1, axis=axis)
            cols = [left, right]
            if self.with_window:
                cols.append(jnp.roll(stripecol(1), -1, axis=axis))
        else:
            # per-shard: the edge stripes' halo columns come from the
            # neighbouring shard over ICI (the analogue of the reference
            # particle exchange, boundary.F90:948-1354).  Ring permutes
            # implement global periodic wrap; bounded domains kill the
            # wrapped columns via the signed global cell index (xoff).
            n = self.mesh_n
            ax = self.spmd_axis
            to_right = [(i, (i + 1) % n) for i in range(n)]
            to_left = [(i, (i - 1) % n) for i in range(n)]

            def from_left_nb(col):
                return jax.lax.ppermute(col[tk(-1, None)], ax, to_right)

            def from_right_nb(col):
                return jax.lax.ppermute(col[tk(0, 1)], ax, to_left)

            cL = stripecol(BX - 1)
            left = jnp.concatenate([from_left_nb(cL), cL[tk(None, -1)]],
                                   axis=axis)
            c0 = stripecol(0)
            right = jnp.concatenate([c0[tk(1, None)], from_right_nb(c0)],
                                    axis=axis)
            cols = [left, right]
            if self.with_window:
                c1 = stripecol(1)
                cols.append(jnp.concatenate(
                    [c1[tk(1, None)], from_right_nb(c1)], axis=axis))
        return jnp.stack(cols, axis=axis + 1)

    def make_fwin(self, fpad):
        """Per-stripe field windows (shared by every species).

        Overlapping (BX+4)-wide windows at stride BX, built from two
        row-major reshapes instead of an nxb-long stack of slices (which
        lowers to a chain of dynamic-update-slices): window rows
        [0, BX) are the contiguous stripe cores; rows [BX, BX+4) are the
        first 4 rows of the BX-groups starting 1 stripe later."""
        BX = self.BX
        nxb = self.nxb
        ny4 = fpad.shape[2]
        # zero-extend the gather rows over the slot grid's dead pad
        # columns (BinnedPlan.ns > grid.n on bounded-x unaligned grids)
        missing = self.nx + 4 - fpad.shape[1]
        if missing > 0:
            fpad = jnp.pad(fpad, ((0, 0), (0, missing), (0, 0)))
        M2 = fpad.shape[1] - self.nx          # 2·margin (= 4)
        core = jnp.moveaxis(
            fpad[:, :self.nx].reshape(6, nxb, BX, ny4), 0, 1)
        shifted = jnp.pad(fpad[:, BX:],
                          ((0, 0), (0, max(BX - M2, 0)), (0, 0)))
        ext = jnp.moveaxis(
            shifted[:, :self.nx].reshape(6, nxb, BX, ny4), 0, 1)[:, :, :M2]
        return jnp.concatenate([core, ext], axis=2)

    def fold_jpart(self, jpart):
        """Overlap-add per-stripe partial currents into the padded J.

        Stripe i's (BX+2M) rows start at padded row i·BX, so row-group g
        (rows [g·BX, (g+1)·BX) of every stripe) is contiguous across
        stripes after a reshape: the whole fold is ⌈(BX+2M)/BX⌉ dense
        adds instead of nxb sequential dynamic-update-slices."""
        BX = self.BX
        M = 2
        ny4 = self.ny + 2 * M
        G = -(-(BX + 2 * M) // BX)
        ext = jnp.zeros((3, self.nx + G * BX, ny4), jpart.dtype)
        for g in range(G):
            rows = jpart[:, :, g * BX:min((g + 1) * BX, BX + 2 * M), :]
            r = rows.shape[2]
            if r < BX:
                rows = jnp.pad(rows, ((0, 0), (0, 0), (0, BX - r), (0, 0)))
            block = jnp.moveaxis(rows, 0, 1).reshape(3, self.nx, ny4)
            ext = ext.at[:, g * BX:g * BX + self.nx].add(block)
        return ext[:, :self.nx + 2 * M]

    def stage_sides(self, binned):
        """Halo side-column arrays staged XLA-side from the slot state,
        in exactly the layout the kernel's side inputs/outputs use —
        the initial value for the carried-sides fast path (sides_out),
        also re-staged after any XLA-side slot mutation."""
        return tuple(self.halo_side_arrays(binned.w, 1)
                     + self.halo_side_arrays(binned.xi, 2)
                     + self.halo_side_arrays(binned.p, 2))

    def __call__(self, fwin, binned, shift=None, extra=None, seed=None,
                 refill=None, qed_on=None, sides=None, emission=None):
        """fwin from make_fwin.  Returns (new binned, jpart, extra_out).

        ``shift`` (with_window only): traced int32 scalar, 1 when a
        window shift is pending (consumed by the rebin's routing).
        ``extra``: (n_extra, K, nx, ny) payload rows (aux optical depths
        + probe entry distances); ``extra_out`` is None when the kernel
        carries none, else (n_extra_out, K, nx, ny) — see
        make_fused_push."""
        w, xi, p = binned.w, binned.xi, binned.p
        # per-stripe any-live flag over the stripe + its halo columns
        # (weights are non-negative: max > 0 ⇔ any live); vacuum stripes
        # skip all VPU work inside the kernel
        smax = jnp.max(w.reshape(self.K, self.nxb, self.BX, self.ny),
                       axis=(0, 2, 3))
        ins = [w, xi, p]
        if self.n_extra:
            ins.append(extra)
            if self.alias_extras:
                # full aux passed through (rows beyond n_extra are the
                # kernel-written eta row); only routed rows need halos
                extra = extra[:self.n_extra]
        if self.halo_mode == "cols":
            if sides is not None:
                # carried sides (previous kernel invocation's outputs):
                # no staging at all
                wcols = list(sides[:self.n_halo])
                ins += list(sides)
            else:
                wcols = self.halo_side_arrays(w, 1)
                ins += wcols
                ins += self.halo_side_arrays(xi, 2)
                ins += self.halo_side_arrays(p, 2)
                if self.n_extra:
                    ins += self.halo_side_arrays(extra, 2)
            # arrival flags: stripe i's left halo is wcols[0][i-1],
            # right halos wcols[1:][i+1] — tiny (nxb,) rolls
            if self.flat_sides:   # (K, nxb·NY) each
                cmax = [jnp.max(c.reshape(self.K, self.nxb, self.ny),
                                axis=(0, 2)) for c in wcols]
            else:                 # (nxb, K, NY) each
                cmax = [jnp.max(c, axis=(1, 2)) for c in wcols]
            hmax = jnp.maximum(jnp.roll(cmax[0], 1), jnp.roll(cmax[1], -1))
            for c in cmax[2:]:
                hmax = jnp.maximum(hmax, jnp.roll(c, -1))
        else:
            we = self.halo_cols(w, 1)
            hmax = jnp.max(we, axis=(0, 2, 3))
            ins += [we, self.halo_cols(xi, 2), self.halo_cols(p, 2)]
            if self.n_extra:
                ins.append(self.halo_cols(extra, 2))
        flags = ((jnp.maximum(smax, hmax) > 0)).astype(jnp.int32)
        ins.append(fwin)
        if self.with_refill:
            if refill is None:
                refill = (jnp.zeros((self.K, self.ny), self.dtype),
                          jnp.zeros((2, self.K, self.ny), self.dtype),
                          jnp.zeros((3, self.K, self.ny), self.dtype))
            rw, rxi, rp = refill
            # stripes that see the staged column must be live: its own
            # stripe plus any neighbour whose halo view reads RCOL
            sr = self.rcol // self.BX
            rc = self.rcol % self.BX
            readers = {sr}
            if rc == 0 or rc == 1:
                readers.add((sr - 1) % self.nxb)
            if rc == self.BX - 1:
                readers.add((sr + 1) % self.nxb)
            rlive = (jnp.max(rw) > 0).astype(jnp.int32)
            for r in readers:
                flags = flags.at[r].max(rlive)
            ins += [rw[None], rxi[None], rp[None]]
        if self.emit_k:
            if emission is None:
                emission = (
                    jnp.zeros((self.emit_k, self.nx, self.ny),
                              self.dtype),
                    jnp.zeros((2, self.emit_k, self.nx, self.ny),
                              self.dtype),
                    jnp.zeros((3, self.emit_k, self.nx, self.ny),
                              self.dtype))
            ew, exi_c, ep = emission
            # a stripe receiving freshly-emitted photons is live even
            # if it held none before (vacuum ahead of the interaction)
            emax = jnp.max(
                ew.reshape(self.emit_k, self.nxb, self.BX, self.ny),
                axis=(0, 2, 3))
            flags = jnp.maximum(flags, (emax > 0).astype(jnp.int32))
            ins += [ew, exi_c, ep]
        scal = [flags]
        if self.with_window:
            if shift is None:
                shift = jnp.zeros((), jnp.int32)
            scal.append(jnp.reshape(shift.astype(jnp.int32), (1,)))
        if self.any_thermal:
            if seed is None:
                seed = jnp.zeros((), jnp.int32)
            scal.append(jnp.reshape(seed.astype(jnp.int32), (1,)))
        if self.spmd_axis is not None:
            xoff = jax.lax.axis_index(self.spmd_axis).astype(jnp.int32) \
                * self.nx
            scal.append(jnp.reshape(xoff, (1,)))
        if self.qed_enabled:
            if qed_on is None:
                qed_on = (jnp.ones((), jnp.int32),
                          jnp.zeros((), jnp.int32))
            flagv, seedv = qed_on
            scal.append(jnp.stack([jnp.asarray(flagv, jnp.int32),
                                   jnp.asarray(seedv, jnp.int32)]))
        outs = self.fused(*scal, *ins)
        sides_new = None
        if self.sides_out:
            n_sarr = 3 * self.n_halo
            outs, sides_new = outs[:-n_sarr], tuple(outs[-n_sarr:])
        if self.n_extra_out:
            new_w, new_xi, new_p, extra_out, jpart, ndrop = outs
        else:
            new_w, new_xi, new_p, jpart, ndrop = outs
            extra_out = None
        out = binned._replace(
            xi=new_xi, p=new_p, w=new_w, sides=sides_new,
            n_dropped=binned.n_dropped + ndrop[0, 0])
        return out, jpart, extra_out
