"""Moving window (housekeeping/window.F90).

Keeps a finite grid tracking a light-speed front (LWFA workloads).  The
reference shifts the global coordinate arrays and walks linked lists
(window.F90:57-120); the TPU design keeps the *static* grid arrays and
moves a ``window_offset`` cell counter in the state instead.  Particle
coordinates stay **grid-relative**: at each one-cell shift every particle's
x drops by dx (scatter engine) or the slot grid rolls one cell left
(binned engine), so the push/BC/deposit machinery never sees the offset;
absolute coordinates (for dumped grids, particle output and deck
expressions) are reconstructed as ``x + offset*dx``.
A shift event (≤1 cell/step by CFL... up to 2 handled via two conditional
rolls) does, entirely inside jit:

* fields (and CPML psi) slide left one cell + incoming-edge fix rows
  (shift_fields, window.F90:98-136);
* departed particles (x < x_min) are killed (remove_particles :260);
* the incoming column is refilled from the deck density/temperature/drift
  expressions with the counter-based device RNG (insert_particles :182),
  evaluated at the new absolute positions.
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants as const
from .state import SimState


def window_plan(cfg, deck):
    """Precompute static insertion info per species (host side)."""
    plans = []
    grid = cfg.grid
    nd = grid.ndims
    # number of boundary cells = product of transverse extents
    n_col = int(np.prod(grid.n[1:])) if nd > 1 else 1
    for sp_blk, sp_cfg in zip(deck.species, cfg.species):
        npc = sp_blk.npart_per_cell
        if npc < 0 and sp_blk.npart > 0:
            npc = sp_blk.npart / max(int(np.prod(grid.n)), 1)
        npc = max(npc, 0.0)
        max_new = int(math.ceil(npc + 1)) * n_col
        layers = getattr(sp_blk, "density_layers", None) or \
            ([sp_blk.density] if sp_blk.density is not None else [])
        plans.append(dict(
            name=sp_blk.name,
            npc=npc,
            max_new=max_new,
            density=sp_blk.density,
            density_layers=layers,
            temp=sp_blk.temp,
            drift=sp_blk.drift,
            density_min=max(sp_blk.density_min, 0.0),
            density_max=sp_blk.density_max,
            mass=sp_cfg.mass,
        ))
    return plans


def pending_single_shift(cfg) -> bool:
    """True when the window velocity is provably < 1 cell/step constant,
    so one masked shift per step suffices — the static precondition for
    the branch-free pending path AND for in-kernel refill staging (the
    fused kernels consume exactly one staged column per pending shift;
    make_pallas_engines gates with_refill on this too)."""
    if cfg.window_v_x is None:
        return True
    dx = cfg.grid.delta[0]
    try:
        v0 = float(cfg.window_v_x({"time": 0.0}))
        v1 = float(cfg.window_v_x({"time": 1.2345e-9}))
        return v0 == v1 and abs(v0) * cfg.dt / dx < 0.999
    except Exception:
        return False


def _shift_left(arr, axis=0):
    """One-cell left slide with edge duplication (shift_field,
    window.F90:141-153 — interior shifted; edge fixed afterwards)."""
    idx = [slice(None)] * arr.ndim
    idx[axis] = slice(1, None)
    last = [slice(None)] * arr.ndim
    last[axis] = slice(-1, None)
    return jnp.concatenate([arr[tuple(idx)], arr[tuple(last)]], axis=axis)


def moving_window(state: SimState, cfg, pending_ok: bool = False,
                  refill_in_kernel: bool = False) -> SimState:
    """window.F90:350-397.

    ``pending_ok``: every species runs the fused Pallas kernel each step,
    so a shift can be recorded as ``window_pending`` and consumed by the
    next push's rebin routing (binned_kernels._axis_rebin) instead of
    rolling the whole slot state in HBM here.

    ``refill_in_kernel``: the kernels also consume the staged refill
    column (state.window_refill) and the CPML shift-cull, so this pass
    only computes the small column arrays — the whole-slot-state
    dynamic-update-slice staging (which forced ~21 MB/species of copies
    per step) disappears."""
    if not cfg.move_window:
        return state
    t = state.time
    dx = cfg.grid.delta[0]
    if cfg.window_v_x is not None:
        v = cfg.window_v_x({"time": t}, xp=jnp)
    else:
        v = const.c
    active = jnp.logical_and(t >= cfg.window_start_time,
                             t < cfg.window_stop_time)
    frac = state.window_frac + jnp.where(active, v * cfg.dt / dx, 0.0)
    nshift = jnp.floor(frac).astype(jnp.int32)
    frac = frac - nshift.astype(frac.dtype)
    state = state._replace(window_frac=frac)

    # at most ~1 cell/step by CFL; a provably-constant sub-cell-per-step
    # window velocity needs only ONE conditional shift (each extra
    # lax.cond copies the whole state pytree — measurably expensive)
    n_conds = 1 if pending_single_shift(cfg) else 2
    if pending_ok and n_conds == 1 and state.window_pending is not None:
        # branch-free pending shift: the hot path pays only column ops +
        # small-array selects every step (a lax.cond join would copy the
        # whole slot state); the rebin consumes the relabel next push
        return _shift_masked(state, cfg, nshift > 0,
                             refill_in_kernel=refill_in_kernel)
    for _ in range(n_conds):
        state = jax.lax.cond(
            nshift > 0,
            lambda s: _shift_once(s, cfg, pending_ok=pending_ok),
            lambda s: s, state)
        nshift = nshift - 1
    return state


def _shift_masked(state: SimState, cfg, shifted,
                  refill_in_kernel: bool = False) -> SimState:
    """Unconditional (masked) one-cell shift for the pending-shift path:
    fields roll + select (small arrays), the wrapped slot column is
    cleared/refilled under the ``shifted`` mask, and ``window_pending``
    records the relabel for the next push's rebin routing.

    With ``refill_in_kernel`` the slot state is NOT touched here at all:
    the refill columns are staged in ``state.window_refill`` and the
    next push's fused kernels substitute them (and apply the CPML
    shift-cull) during the rebin."""
    new_offset = state.window_offset + shifted.astype(jnp.int32)
    f, cpml = _shift_fields(state, cfg)
    f = type(f)(*[jnp.where(shifted, b, a)
                  for a, b in zip(state.fields, f)])
    if cpml is not None:
        cpml = cpml.__class__(psi=tuple(
            jnp.where(shifted, b, a)
            for a, b in zip(state.cpml.psi, cpml.psi)))
    if refill_in_kernel:
        new_refill = []
        for i, (sp_cfg, slab) in enumerate(zip(cfg.species,
                                               state.species)):
            plan = cfg.window_plans[i]
            if plan["max_new"] > 0 and plan["density"] is not None:
                key = jax.random.fold_in(
                    jax.random.fold_in(state.rng, new_offset), i)
                rw, rxi, rp, n_over = _refill_column(
                    slab, plan, cfg, new_offset, state.time, key,
                    cfg.window_plans)
                live = shifted
                new_refill.append((
                    jnp.where(live, rw, 0.0), rxi, rp))
                new_species_nd = slab.n_dropped + jnp.where(
                    shifted, n_over, 0)
                state = state._replace(species=state.species[:i] + (
                    slab._replace(n_dropped=new_species_nd),)
                    + state.species[i + 1:])
            else:
                new_refill.append(None)
        return state._replace(
            fields=f, cpml=cpml, window_offset=new_offset,
            window_refill=tuple(new_refill),
            window_pending=jnp.maximum(state.window_pending,
                                       shifted.astype(jnp.int32)))
    new_species = []
    for i, (sp_cfg, slab) in enumerate(zip(cfg.species, state.species)):
        plan = cfg.window_plans[i]
        # pending-shift columns: array col c = (new) cell c−1 until the
        # next push's rebin consumes the relabel.  The departed cell 0
        # is col 0; the incoming cell nx−1 is col 0 via the rebin's
        # wrap on aligned grids, or the first dead pad column (a real
        # array column, BinnedPlan.ns) on padded ones.  remove_particles
        # culls everything left of the user domain — the whole x_min
        # CPML layer — at each shift (window.F90:76,322-342): cells
        # [0, th) = cols [1, th+1).
        pad = slab.w.shape[1] - cfg.grid.n[0]
        rcol = cfg.grid.n[0] if pad > 0 else 0
        thL = cfg.grid.cpml_thickness
        cull = jnp.arange(slab.w.shape[1]) < (thL + 1)
        cleared = slab._replace(
            w=jnp.where(shifted & cull[None, :] if slab.w.ndim == 2
                        else shifted & cull[None, :, None],
                        0.0, slab.w))
        if plan["max_new"] > 0 and plan["density"] is not None:
            key = jax.random.fold_in(
                jax.random.fold_in(state.rng, new_offset), i)
            refilled = _insert_column_binned(
                cleared, plan, cfg, new_offset, state.time, key,
                cfg.window_plans, col=rcol)
            slab = cleared._replace(
                w=cleared.w.at[:, rcol].set(
                    jnp.where(shifted, refilled.w[:, rcol],
                              cleared.w[:, rcol])),
                xi=cleared.xi.at[:, :, rcol].set(
                    jnp.where(shifted, refilled.xi[:, :, rcol],
                              cleared.xi[:, :, rcol])),
                p=cleared.p.at[:, :, rcol].set(
                    jnp.where(shifted, refilled.p[:, :, rcol],
                              cleared.p[:, :, rcol])),
                n_dropped=cleared.n_dropped + jnp.where(
                    shifted, refilled.n_dropped - cleared.n_dropped, 0),
            )
        else:
            slab = cleared
        new_species.append(slab)
    return state._replace(
        fields=f, cpml=cpml, species=tuple(new_species),
        window_offset=new_offset,
        window_pending=jnp.maximum(state.window_pending,
                                   shifted.astype(jnp.int32)))


def _shift_fields(state: SimState, cfg):
    """Slide fields (+psi) one cell left with incoming-edge fix rows
    (shift_fields, window.F90:98-136)."""
    grid = cfg.grid
    f = state.fields

    new_fields = {}
    for name in f._fields:
        new_fields[name] = _shift_left(getattr(f, name), axis=0)
    f = f.__class__(**new_fields)

    # incoming-edge fix rows (window.F90:113-128); saved boundary fields are
    # zero for vacuum-start LWFA runs
    ng = grid.ng
    n = grid.n[0]
    bcf = state.bc_fields or {}

    def row(arr, fidx, val):
        sl = [slice(None)] * arr.ndim
        sl[0] = fidx + ng - 1
        return arr.at[tuple(sl)].set(val)

    def rowavg(arr, fidx, f1, f2):
        sl1 = [slice(None)] * arr.ndim
        sl1[0] = f1 + ng - 1
        sl2 = [slice(None)] * arr.ndim
        sl2[0] = f2 + ng - 1
        val = 0.5 * (arr[tuple(sl1)] + arr[tuple(sl2)])
        return row(arr, fidx, val)

    ex = row(row(f.ex, n, bcf.get("ex_x_max", 0.0)),
             n + 1, bcf.get("ex_x_max", 0.0))
    ex = rowavg(ex, n - 1, n - 2, n)
    ey = row(f.ey, n + 1, bcf.get("ey_x_max", 0.0))
    ey = rowavg(ey, n, n - 1, n + 1)
    ez = row(f.ez, n + 1, bcf.get("ez_x_max", 0.0))
    ez = rowavg(ez, n, n - 1, n + 1)
    bx = row(f.bx, n + 1, bcf.get("bx_x_max", 0.0))
    bx = rowavg(bx, n, n - 1, n + 1)
    by = row(f.by, n, bcf.get("by_x_max", 0.0))
    by = rowavg(by, n - 1, n - 2, n)
    bz = row(f.bz, n, bcf.get("bz_x_max", 0.0))
    bz = rowavg(bz, n - 1, n - 2, n)
    f = f._replace(ex=ex, ey=ey, ez=ez, bx=bx, by=by, bz=bz)

    cpml = state.cpml
    if cpml is not None:
        cpml = cpml.__class__(psi=tuple(
            _shift_left(p, axis=1) for p in cpml.psi))
    return f, cpml


def _shift_once(state: SimState, cfg, pending_ok: bool = False) -> SimState:
    grid = cfg.grid
    dx = grid.delta[0]
    f, cpml = _shift_fields(state, cfg)
    new_offset = state.window_offset + 1

    def shift_species(state: SimState, roll_binned: bool) -> SimState:
        rng = state.rng
        drops = jnp.zeros((), jnp.int32)
        new_species = []
        for i, (sp_cfg, slab) in enumerate(zip(cfg.species, state.species)):
            plan = cfg.window_plans[i]
            if hasattr(slab, "xi"):      # binned engine
                pad = slab.w.shape[1] - grid.n[0]
                thL = grid.cpml_thickness
                if roll_binned:
                    # roll the slot grid; refill the (new) last real
                    # column (inside the CPML layer under cpml_outflow,
                    # window.F90:227,243)
                    slab = _shift_binned(slab, plan, cfg, new_offset,
                                         state.time)
                    col = grid.n[0] - 1
                else:
                    # pending-shift: the next push's rebin routing does
                    # the relabel — clear the departed cell 0 (col 0)
                    # plus the x_min CPML layer (remove_particles culls
                    # below the user domain each shift, window.F90:76,
                    # 322-342), and refill the incoming cell nx−1 at
                    # the wrap column (aligned grids) or the staging
                    # pad column (padded grids)
                    slab = slab._replace(
                        w=slab.w.at[:, :thL + 1].set(0.0))
                    col = grid.n[0] if pad > 0 else 0
                if plan["max_new"] > 0 and plan["density"] is not None:
                    # key derived from (rng, offset, species) WITHOUT
                    # advancing the stream: identical refills whether the
                    # shift goes through this rolled path or the masked
                    # pending path (_shift_masked)
                    sub = jax.random.fold_in(
                        jax.random.fold_in(state.rng, new_offset), i)
                    slab = _insert_column_binned(slab, plan, cfg,
                                                 new_offset, state.time,
                                                 sub, cfg.window_plans,
                                                 col=col)
                new_species.append(slab)
                continue
            # scatter engine: grid-relative shift + removal at the edge
            x = slab.x.at[:, 0].add(-dx)
            alive = slab.alive & (x[:, 0] >= grid.local_lo(0))
            weight = jnp.where(alive, slab.weight, 0.0)
            slab = slab._replace(x=x, alive=alive, weight=weight)
            if plan["max_new"] > 0 and plan["density"] is not None:
                rng, sub = jax.random.split(rng)
                slab, d_ = _insert_column(slab, plan, cfg, new_offset,
                                          state.time, sub,
                                          cfg.window_plans)
                drops = drops + d_
            new_species.append(slab)
        from .slab_ops import add_dropped
        return add_dropped(
            state._replace(species=tuple(new_species), rng=rng), drops)

    state = state._replace(fields=f, cpml=cpml, window_offset=new_offset)
    if pending_ok and state.window_pending is not None:
        # record the shift for the next rebin; if one is already pending
        # (push skipped since the last shift) fall back to a real roll
        state = jax.lax.cond(
            state.window_pending > 0,
            lambda s: shift_species(s, True),
            lambda s: shift_species(s, False)._replace(
                window_pending=jnp.ones((), jnp.int32)),
            state)
        return state
    return shift_species(state, True)


def _shift_binned(b, plan, cfg, new_offset, time):
    """Slot-grid window shift: cells slide one to the left; the departed
    leftmost column is deleted (remove_particles) and the incoming right
    column cleared for refill."""
    w = jnp.roll(b.w, -1, axis=1)
    xi = jnp.roll(b.xi, -1, axis=2)
    p = jnp.roll(b.p, -1, axis=2)
    aux = jnp.roll(b.aux, -1, axis=2) if b.aux is not None else b.aux
    # Clear the wrapped-in column (old column 0 = departed particles) and
    # — remove_particles culls everything left of the user domain, the
    # whole x_min CPML layer, at each shift (window.F90:76,322-342) —
    # the CPML columns.  Iota masks, NOT chained .at[slice].set updates:
    # the XLA:CPU SPMD partitioner mis-applies a multi-column
    # dynamic-update-slice chained with a later single-column update on
    # an x-sharded array (each non-final shard's last column gets the
    # wrong data — see tests/test_runner_mesh.py regression).
    thL = cfg.grid.cpml_thickness
    ix = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1)
    w = jnp.where((ix == w.shape[1] - 1) | (ix < thL), 0.0, w)
    return b._replace(w=w, xi=xi, p=p, aux=aux)


def materialize_refill(state: SimState, cfg) -> SimState:
    """Apply the staged pending-shift slot edits (state.window_refill)
    to the particle arrays, exactly as the next push's fused kernels
    would: cull the x_min CPML layer + departed column and write the
    refill column.  IDEMPOTENT — the kernels re-apply the same values —
    so the result may replace the live state (used before dumps and at
    Simulation.run exit, where observers expect insert_particles to
    have already happened, window.F90:182-258)."""
    if not state.window_refill or state.window_pending is None:
        return state
    shifted = state.window_pending > 0
    grid = cfg.grid
    thL = grid.cpml_thickness
    new_species = []
    for i, slab in enumerate(state.species):
        ref = state.window_refill[i] if i < len(state.window_refill) \
            else None
        if not hasattr(slab, "xi"):
            new_species.append(slab)
            continue
        pad = slab.w.shape[1] - grid.n[0]
        rcol = grid.n[0] if pad > 0 else 0
        cull = jnp.arange(slab.w.shape[1]) < (thL + 1)
        cmask = cull[None, :] if slab.w.ndim == 2 else cull[None, :, None]
        w = jnp.where(shifted & cmask, 0.0, slab.w)
        ix = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1)
        w = jnp.where(shifted & (ix == rcol), 0.0, w)
        if ref is not None:
            rw, rxi, rp = ref
            w = w.at[:, rcol].set(jnp.where(shifted, rw, w[:, rcol]))
            xi = slab.xi.at[:, :, rcol].set(
                jnp.where(shifted, rxi, slab.xi[:, :, rcol]))
            p = slab.p.at[:, :, rcol].set(
                jnp.where(shifted, rp, slab.p[:, :, rcol]))
            aux = slab.aux
            if aux is not None:
                # fresh particles: aux rows (ids, optical depths) reset
                aux = aux.at[:, :, rcol].set(
                    jnp.where(shifted, 0.0, aux[:, :, rcol]))
            slab = slab._replace(w=w, xi=xi, p=p, aux=aux)
        else:
            slab = slab._replace(w=w)
        new_species.append(slab)
    return state._replace(species=tuple(new_species))


def _refill_column(b, plan, cfg, offset, time, key, all_plans=None):
    """Compute the refill column payloads (insert_particles,
    window.F90:182-258) WITHOUT writing them into the slot grid:
    (w (K, n_t), xi (nd, K, n_t), p (3, K, n_t), n_over).  Density/
    temperature/drift are evaluated at the new absolute positions."""
    grid = cfg.grid
    nd = grid.ndims
    dx = grid.delta[0]
    dtype = b.w.dtype
    K = b.K
    tshape = (K,) + tuple(grid.n[1:])      # slots x transverse cells
    k1, k2, k3, k4 = jax.random.split(key, 4)

    npc = plan["npc"]
    npc_int = int(math.floor(npc))
    npc_frac = npc - npc_int
    extra = (jax.random.uniform(k1, tshape[1:]) < npc_frac).astype(jnp.int32)
    count = npc_int + extra                # per transverse cell
    slot = jax.lax.broadcasted_iota(jnp.int32, tshape, 0)
    valid = slot < count[None]
    n_over = jnp.sum(jnp.maximum(count - K, 0)).astype(jnp.int32)

    xi_new = jax.random.uniform(k2, (nd,) + tshape, dtype) - 0.5
    offset_f = offset.astype(dtype)
    names = ["x", "y", "z"]
    ctx = {"time": time}
    ctx["x"] = grid.grid_min(0) + (grid.n[0] - 1 + offset_f) * dx \
        + xi_new[0] * dx
    for d in range(1, nd):
        cell_t = jax.lax.broadcasted_iota(jnp.int32, tshape, d)
        ctx[names[d]] = grid.grid_min(d) \
            + (cell_t.astype(dtype) + xi_new[d]) * grid.delta[d]

    dens = _density_at(plan, ctx, all_plans) * jnp.ones(tshape, dtype)
    if plan["density_max"] > 0:
        dens = jnp.minimum(dens, plan["density_max"])
    dens = jnp.where(dens >= plan["density_min"], dens, 0.0)
    cell_vol = float(np.prod(grid.delta))
    w_new = dens * cell_vol / jnp.maximum(count[None].astype(dtype), 1.0)
    valid = valid & (w_new > 0)

    norms = jax.random.normal(k4, (3,) + tshape, dtype)
    p_new = []
    for i in range(3):
        temp = plan["temp"][i](ctx, xp=jnp) if plan["temp"][i] is not None \
            else 0.0
        drift = plan["drift"][i](ctx, xp=jnp) \
            if plan["drift"][i] is not None else 0.0
        std = jnp.sqrt(jnp.maximum(temp * const.kb * plan["mass"], 0.0))
        p_new.append(norms[i] * std + drift)
    p_new = jnp.stack(p_new)

    w_col = jnp.where(valid, w_new, 0.0)
    xi_col = jnp.where(valid[None], xi_new, jnp.zeros_like(xi_new))
    p_col = jnp.where(valid[None], p_new, jnp.zeros_like(p_new))
    return w_col, xi_col, p_col, n_over


def _insert_column_binned(b, plan, cfg, offset, time, key, all_plans=None,
                          col=-1):
    """Refill the incoming column of the slot grid (insert_particles,
    window.F90:182-258).  ``col`` is the array column holding the
    incoming cell: −1 after a rolled shift, 0/pad-col for a pending
    shift (the grid cell is nx−1 either way)."""
    w_col, xi_col, p_col, n_over = _refill_column(
        b, plan, cfg, offset, time, key, all_plans)
    w = b.w.at[:, col].set(w_col)
    xi = b.xi.at[:, :, col].set(xi_col)
    p = b.p.at[:, :, col].set(p_col)
    return b._replace(w=w, xi=xi, p=p, n_dropped=b.n_dropped + n_over)


def _layers_at(plan, ctx):
    """Evaluate a species' layered density stack at point ctx (deck-order
    number_density lines with self-reference, deck_species_block)."""
    dens = 0.0
    for layer in plan["density_layers"]:
        c = dict(ctx)
        c[f"density:{plan['name']}"] = dens
        dens = layer(c, xp=jnp)
    return dens


def _density_at(plan, ctx, all_plans):
    """Evaluate plan's density at ctx, resolving ``density(other)``
    cross references to earlier-declared species (evaluated at the same
    points, matching the loader's deck-order cache semantics)."""
    dens_ctx = dict(ctx)
    for other in (all_plans or []):
        if other is plan:
            break
        if other["density_layers"]:
            dens_ctx[f"density:{other['name']}"] = _layers_at(other, dens_ctx)
    return _layers_at(plan, dens_ctx)


def _insert_column(slab, plan, cfg, offset, time, key, all_plans=None):
    """Refill the incoming column (insert_particles, window.F90:159-258).

    Grid-relative positions: the new particles land in the *static* last
    cell band [grid_max - dx/2, grid_max + dx/2); deck expressions see the
    absolute coordinate x + offset*dx."""
    grid = cfg.grid
    nd = grid.ndims
    dx = grid.delta[0]
    dtype = slab.x.dtype
    offset_f = offset.astype(dtype)
    max_new = plan["max_new"]
    npc = plan["npc"]
    npc_int = int(math.floor(npc))
    npc_frac = npc - npc_int

    k1, k2, k3, k4 = jax.random.split(key, 4)

    # transverse cell multi-index for each new slot
    n_col = max_new // max(int(math.ceil(npc + 1)), 1)
    per_cell = int(math.ceil(npc + 1))
    slot = jnp.arange(max_new)
    cell_t = slot // per_cell          # transverse cell id
    sub = slot % per_cell              # particle index within the cell

    # stochastic fractional particle (window.F90:205-210)
    extra = (jax.random.uniform(k1, (n_col,)) < npc_frac).astype(jnp.int32)
    count_per_cell = npc_int + extra   # (n_col,)
    valid = sub < count_per_cell[cell_t]

    # positions: the (static) last-cell band (x0 = x_grid_max − dx/2;
    # window.F90:246 x0 = x_grid_max + dx/2 is pre-shift, ours post-shift)
    x0 = grid.grid_min(0) + (grid.n[0] - 1) * dx - 0.5 * dx
    xs = x0 + jax.random.uniform(k2, (max_new,), dtype) * dx
    pos = [xs]
    names = ["x", "y", "z"]
    ctx = {}
    for d in range(1, nd):
        centre = grid.grid_min(d) + cell_t.astype(dtype) * grid.delta[d]
        u = jax.random.uniform(k3, (max_new,), dtype)
        pos.append(centre + (u - 0.5) * grid.delta[d])
    x_new = jnp.stack(pos, axis=1)
    ctx["x"] = xs + offset_f * dx      # absolute coordinate for the deck
    for d in range(1, nd):
        ctx[names[d]] = x_new[:, d]
    ctx["time"] = time

    dens = _density_at(plan, ctx, all_plans) * jnp.ones(max_new, dtype)
    if plan["density_max"] > 0:
        dens = jnp.minimum(dens, plan["density_max"])
    dens = jnp.where(dens >= plan["density_min"], dens, 0.0)
    wdata = dx / jnp.maximum(count_per_cell[cell_t].astype(dtype), 1.0) \
        * float(np.prod(grid.delta[1:])) if nd > 1 else \
        dx / jnp.maximum(count_per_cell[cell_t].astype(dtype), 1.0)
    w_new = dens * wdata
    valid = valid & (w_new > 0)

    # momenta: thermal + drift at the insertion point
    p_new = []
    norms = jax.random.normal(k4, (max_new, 3), dtype)
    for i in range(3):
        temp = plan["temp"][i](ctx, xp=jnp) if plan["temp"][i] is not None else 0.0
        drift = plan["drift"][i](ctx, xp=jnp) if plan["drift"][i] is not None else 0.0
        std = jnp.sqrt(jnp.maximum(temp * const.kb * plan["mass"], 0.0))
        p_new.append(norms[:, i] * std + drift)
    p_new = jnp.stack(p_new, axis=1)

    # append into dead slots (fixed capacity; overflow counted)
    order = jnp.argsort(slab.alive)        # dead slots first
    target = order[:max_new]
    ok = valid & ~slab.alive[target]
    drops = (jnp.sum(valid) - jnp.sum(ok)).astype(jnp.int32)
    x_upd = jnp.where(ok[:, None], x_new, slab.x[target])
    p_upd = jnp.where(ok[:, None], p_new, slab.p[target])
    w_upd = jnp.where(ok, w_new, slab.weight[target])
    a_upd = jnp.where(ok, True, slab.alive[target])
    return slab._replace(
        x=slab.x.at[target].set(x_upd),
        p=slab.p.at[target].set(p_upd),
        weight=slab.weight.at[target].set(w_upd),
        alive=slab.alive.at[target].set(a_upd),
    ), drops
