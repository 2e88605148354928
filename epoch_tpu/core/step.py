"""Timestep orchestration.

The leapfrog structure mirrors the reference main loop
(``epoch1d/src/epoch1d.F90:184-249``; survey §3.2):

    fields_half   : E+dt/2, E-bcs, B+dt/2, B-bcs(mpi)        (fields.f90:358)
    push          : gather/kick/move/deposit, J bcs, particle bcs
    current_finish: J halos + smoothing                       (current_smooth)
    step++ ; time += dt/2 ;  [output point] ; time += dt/2
    fields_final  : B+dt/2, bfield_final_bcs (laser inject!), E+dt/2, E-bcs
    moving window

The two halves are built as separately jittable functions so the host can
dump diagnostics at the mid-step output point exactly as the reference does;
``make_full_step`` composes them for scan-driven benchmarking.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import constants as const
from . import boundaries as bnd
from . import fields as fld
from . import laser as las
from . import push as psh
from .state import SimState, Fields


def smooth_array(arr, cfg, its, comp_its):
    """Strided compensated binomial filter
    (current_smooth.F90:smooth_array)."""
    nd = cfg.ndims
    alpha = 0.5
    beta = (1.0 - alpha) / (2.0 * nd)
    out = arr
    for it in range(1, its + comp_its + 1):
        out = bnd.field_bc(out, "jx", cfg)
        acc = alpha * out
        for d in range(nd):
            acc = acc + beta * (fld.shift(out, d, 1) + fld.shift(out, d, -1))
        mask = None
        # update interior only (Fortran 1..nx); reuse solver region mask is
        # wider (0..nx) — build the exact one lazily on cfg
        out = jnp.where(_interior_mask(cfg), acc, out)
        # alpha switches to the compensator only for iterations *after*
        # it > its (current_smooth.F90:130-133); beta keeps the binomial
        # value, exactly as the reference does
        if it > its:
            alpha = its * 0.5 + 1.0
    return out


_interior_mask_cache = {}


def _interior_mask(cfg):
    key = id(cfg)
    if key not in _interior_mask_cache:
        import numpy as np
        grid = cfg.grid
        ng = grid.ng
        m = np.ones(grid.padded_shape(), bool)
        for d in range(grid.ndims):
            idx = np.arange(grid.padded_shape()[d])
            mm = (idx >= ng) & (idx <= grid.n[d] + ng - 1)
            shape = [1] * grid.ndims
            shape[d] = idx.shape[0]
            m &= mm.reshape(shape)
        _interior_mask_cache[key] = jnp.asarray(m)
    return _interior_mask_cache[key]


def _seed_from_key(key):
    """Fold a PRNG key into the int32 seed of the fused kernel's
    counter-based hash streams."""
    kd = jax.random.key_data(key) if hasattr(jax.random, "key_data") \
        else key
    return jax.lax.bitcast_convert_type(
        (kd[0] ^ kd[1]).astype(jnp.uint32), jnp.int32)


def _append_probe_recs(probes, probe_dropped, sp_probes, recs):
    """Append probe crossing records; count capture-cap (top_k) and
    buffer-append drops (the reference keeps every crossing,
    probes.F90:107 — a nonzero count is surfaced at end of run)."""
    from .slab_ops import append_particles
    for (pi, _), (xs, ps, ws, ok, nf) in zip(sp_probes, recs):
        probes[pi], nd_ap = append_particles(probes[pi], xs, ps, ws, ok,
                                             with_count=True)
        drop = (nf - jnp.sum(ok)).astype(jnp.int32) \
            + jnp.asarray(nd_ap, jnp.int32)
        probe_dropped[pi] = probe_dropped[pi] + drop
    return probes, probe_dropped


def make_step_functions(cfg):
    """Build the jitted step halves, closing over the static config."""
    import os
    plan = fld.FieldSolverPlan(cfg)
    pplan = psh.PushPlan(cfg)
    dt = cfg.dt
    dtype = cfg.dtype

    # fused Maxwell half-updates (ops/field_kernels.py): one Pallas call
    # per half instead of dozens of small XLA fusions; bit-identical math
    from ..ops.field_kernels import (fused_fields_eligible,
                                     make_field_half_kernel)
    ff_interp = os.environ.get("EPOCH_TPU_FUSED_FIELDS") == "interpret"
    if fused_fields_eligible(cfg, interpret=ff_interp):
        upd_e = make_field_half_kernel(cfg, plan, "e", interpret=ff_interp)
        upd_b = make_field_half_kernel(cfg, plan, "b", interpret=ff_interp)
    else:
        upd_e = lambda f, c: fld.update_e_field(f, cfg, plan, c)
        upd_b = lambda f, c: fld.update_b_field(f, cfg, plan, c)

    def fields_half(state: SimState) -> SimState:
        f, cpml = upd_e(state.fields, state.cpml)
        f = bnd.efield_bcs(f, cfg)
        f, cpml = upd_b(f, cpml)
        f = bnd.bfield_bcs(f, cfg, mpi_only=True)
        return state._replace(fields=f, cpml=cpml)

    def bfield_final_bcs(state: SimState, dt_eff, time) -> SimState:
        """boundary.F90:574-595 + laser.f90 outflow bcs."""
        phases = las.update_laser_phases(cfg, state, dt_eff)
        state = state._replace(
            lasers=state.lasers._replace(integral_phase=phases))
        f = bnd.bfield_bcs(state.fields, cfg, mpi_only=False)
        lasers = state.lasers
        for axis in range(cfg.ndims):
            for hi in (False, True):
                bd = 2 * axis + (1 if hi else 0)
                if cfg.needs_outflow_bcs(bd):
                    f = las.outflow_bcs(f, cfg, state._replace(fields=f),
                                        dt_eff, time, axis, hi, dtype)
                    if cfg.dump_absorption:
                        da, di = las.absorption_increments(
                            f, cfg, state, dt_eff, time, axis, hi, dtype)
                        lasers = lasers._replace(
                            absorb_local=lasers.absorb_local + da,
                            inject_local=lasers.inject_local + di)
        f = bnd.bfield_bcs(f, cfg, mpi_only=True)
        return state._replace(fields=f, lasers=lasers)

    def fields_final(state: SimState) -> SimState:
        f, cpml = upd_b(state.fields, state.cpml)
        state = state._replace(fields=f, cpml=cpml)
        state = bfield_final_bcs(state, dt, state.time)
        f, cpml = upd_e(state.fields, state.cpml)
        f = bnd.efield_bcs(f, cfg)
        return state._replace(fields=f, cpml=cpml)

    window_pending_ok = False
    refill_in_kernel = False
    spmd_push = None
    if cfg.engine == "binned":
        from . import binned as binmod
        bplan = binmod.BinnedPlan(cfg)
        if cfg.mesh is not None:
            # explicit shard_map composition of the fused kernel with
            # the mesh (parallel/spmd_push.py); GSPMD cannot partition a
            # Pallas custom call
            from ..parallel.spmd_push import (spmd_pallas_eligible,
                                              make_spmd_push)
            if spmd_pallas_eligible(cfg, bplan, cfg.mesh):
                pallas_engines = binmod.make_pallas_engines(
                    cfg, bplan, spmd_axis="x",
                    mesh_n=cfg.mesh.shape["x"])
            else:
                pallas_engines = [None] * len(cfg.species)
        else:
            pallas_engines = binmod.make_pallas_engines(cfg, bplan)
        # pending-shift moving window: every species must go through the
        # fused kernel so the rebin routing consumes the relabel
        window_pending_ok = (
            binmod.window_pending_capable(cfg)
            and cfg.particle_push_start_time <= 0
            and len(pallas_engines) > 0
            and all(e is not None for e in pallas_engines))
        # single-device fused kernels consume the staged refill column +
        # CPML cull themselves (state.window_refill); the sharded path
        # keeps XLA-side staging
        from .window import pending_single_shift
        refill_in_kernel = (window_pending_ok and cfg.mesh is None
                            and pending_single_shift(cfg))
        if cfg.qed_plan is not None:
            # emitter species whose fused kernel computes eta + the
            # optical-depth decrement itself (qed.py skips the dense
            # XLA-side gather/interp for those)
            cfg.qed_plan.rates_in_kernel = {
                si: True for si, e in enumerate(pallas_engines)
                if e is not None and getattr(e, "qed_enabled", False)}
            # emitters whose kernel ALSO samples chi + applies recoil
            # and publishes e_ph for the photon kernel's candidate feed
            # (qed.py skips their emission tail entirely)
            ph_si = cfg.qed_plan.photon_species
            ph_accepts = (0 <= ph_si < len(pallas_engines)
                          and pallas_engines[ph_si] is not None
                          and getattr(pallas_engines[ph_si],
                                      "emit_k", 0) > 0)
            cfg.qed_plan.emit_in_kernel = {
                si: True for si, e in enumerate(pallas_engines)
                if ph_accepts and e is not None
                and getattr(e, "emits_in_kernel", False)}
        if cfg.mesh is not None and any(e is not None
                                        for e in pallas_engines):
            from ..parallel.spmd_push import make_spmd_push
            spmd_push = make_spmd_push(cfg, bplan, pallas_engines,
                                       cfg.mesh, window_pending_ok)

    def push_all(state: SimState) -> SimState:
        f = state.fields
        zero = jnp.zeros_like(f.jx)
        f = f._replace(jx=zero, jy=zero, jz=zero)
        if cfg.engine == "binned":
            return _push_all_binned(state, f)
        contributions = []
        new_slabs = []
        rng = state.rng
        any_thermal = any(
            bc in (const.BC.THERMAL, const.BC.HEAT_BATH)
            for sp_cfg in cfg.species
            for bc in sp_cfg.bc_particle[:2 * cfg.ndims])
        probes = list(state.probes)
        probe_dropped = list(state.probe_dropped)
        ejected = list(state.ejected)
        for si, (sp_cfg, slab) in enumerate(zip(cfg.species, state.species)):
            x_old = slab.x
            if sp_cfg.species_type == const.SpeciesType.PHOTON:
                if not sp_cfg.immobile:   # photon_dynamics = F
                    slab = psh.push_photons(slab, pplan)
            elif not sp_cfg.immobile:
                slab, contrib = psh.push_species(
                    state.fields, slab, sp_cfg, pplan,
                    higuera_cary=cfg.use_higuera_cary)
                if contrib is not None:
                    contributions.append(contrib)
            # probe plane crossings (particles.F90:518-557)
            for pi, pplan_ in enumerate(cfg.probe_plans):
                if si in pplan_.species:
                    from . import probes as prb
                    probes[pi], pdrop = prb.capture(probes[pi], pplan_,
                                                    sp_cfg, x_old, slab)
                    probe_dropped[pi] = probe_dropped[pi] \
                        + jnp.asarray(pdrop, jnp.int32)
            key = None
            if any_thermal:
                rng, key = jax.random.split(rng)
            pre = slab
            slab = bnd.particle_bcs(slab, sp_cfg, cfg, key=key)
            if cfg.track_ejected and si < len(ejected):
                # open-boundary exits land in the ejected buffer
                # (boundary.F90:758-770)
                from .slab_ops import append_particles
                gone = pre.alive & ~slab.alive
                ejected[si] = append_particles(
                    ejected[si], pre.x, pre.p, pre.weight, gone)
                # (ejected-buffer overflow is dump-side only, not counted)
            new_slabs.append(slab)
        state = state._replace(rng=rng, probes=tuple(probes),
                               probe_dropped=tuple(probe_dropped),
                               ejected=tuple(ejected))
        f = psh.deposit_currents(f, contributions, dtype)
        f = bnd.current_bcs(f, cfg)
        return state._replace(fields=f, species=tuple(new_slabs))

    def _push_all_binned(state: SimState, f) -> SimState:
        grid = cfg.grid
        # shared (6, n+4) ghost-sliced field stack for gather (periodic
        # and bounded BCs alike: ghost content comes from the field BCs,
        # exactly what the scatter engine's gather sees)
        fpad = binmod.make_fpad(state.fields, grid)
        if cfg.mesh is not None:
            # GSPMD back-propagates shardings from the slot arrays into
            # this padded (nx+2M)-wide stack, whose x extent rarely
            # divides the mesh; XLA:CPU mis-offsets per-shard slices of
            # such unevenly-sharded intermediates (ghost-derivative
            # junk at each shard's first column).  Pin the stack
            # replicated: resharding then happens only at the slot
            # arrays / shard_map boundary, whose x extent does divide.
            from jax.sharding import NamedSharding, PartitionSpec
            fpad = jax.lax.with_sharding_constraint(
                fpad, NamedSharding(cfg.mesh, PartitionSpec()))
        fwin = None
        first_engine = next((e for e in pallas_engines if e is not None),
                            None)
        if first_engine is not None and spmd_push is None:
            fwin = first_engine.make_fwin(fpad)
        any_thermal = any(
            bc in (const.BC.THERMAL, const.BC.HEAT_BATH)
            for sp_cfg in cfg.species
            for bc in sp_cfg.bc_particle[:2 * cfg.ndims])
        any_qed_kernel = any(getattr(e, "qed_enabled", False)
                             for e in pallas_engines)
        rng = state.rng
        keys = [None] * len(cfg.species)
        if any_thermal or any_qed_kernel:
            for si in range(len(cfg.species)):
                rng, keys[si] = jax.random.split(rng)
        probes = list(state.probes)
        probe_dropped = list(state.probe_dropped)
        jpad_sum = None
        jpart_sum = None
        new_species = [None] * len(cfg.species)
        spmd_new = None
        if spmd_push is not None:
            shift = state.window_pending if window_pending_ok else None
            seeds = [_seed_from_key(keys[si])
                     if keys[si] is not None
                     and pallas_engines[si] is not None
                     and pallas_engines[si].any_thermal
                     else jnp.zeros((), jnp.int32)
                     for si in range(len(cfg.species))]
            spmd_new, spmd_jpad, _, spmd_probe_rows = spmd_push(
                fpad, list(state.species), shift, seeds)
            jpad_sum = spmd_jpad
        # in-kernel emission: process the QED photon species LAST so
        # every emitter's freshly-published e_ph rows feed this step's
        # photon-kernel rebin (same-step emission, photons.F90 ordering)
        order = list(range(len(cfg.species)))
        emit_cands = []
        emit_target = -1
        qp_ = cfg.qed_plan
        if qp_ is not None and getattr(qp_, "emit_in_kernel", None):
            emit_target = qp_.photon_species
            order = [x for x in order if x != emit_target] \
                + [emit_target]
        for si in order:
            sp_cfg, b = cfg.species[si], state.species[si]
            key = keys[si]
            if spmd_new is not None and si in spmd_new:
                if si in spmd_probe_rows:
                    # probe payload rows came back through the shard_map
                    # (reassembled global): same detection as the
                    # single-device fused path
                    sp_probes = [(pi, pp) for pi, pp in
                                 enumerate(cfg.probe_plans)
                                 if si in pp.species]
                    recs = binmod.probe_records_from_rows(
                        spmd_new[si], spmd_probe_rows[si], 0,
                        [pp for _, pp in sp_probes], sp_cfg, bplan)
                    probes, probe_dropped = _append_probe_recs(
                        probes, probe_dropped, sp_probes, recs)
                new_species[si] = spmd_new[si]
                continue
            if sp_cfg.immobile:
                # zero-drift rebin-only kernel: consumes the pending
                # window relabel + swept-boundary cull, and (as the
                # in-kernel-emission target, photon_dynamics = F)
                # appends the newborn photons through its rebin
                if pallas_engines[si] is not None \
                        and (window_pending_ok or si == emit_target):
                    refill = None
                    if getattr(pallas_engines[si], "with_refill",
                               False) and si < len(state.window_refill):
                        refill = state.window_refill[si]
                    emission = None
                    if si == emit_target and emit_cands:
                        emission = (
                            jnp.concatenate([c[0] for c in emit_cands],
                                            axis=0),
                            jnp.concatenate([c[1] for c in emit_cands],
                                            axis=1),
                            jnp.concatenate([c[2] for c in emit_cands],
                                            axis=1))
                    b, _ji = binmod.push_deposit_pallas(
                        pallas_engines[si], fwin, b, bplan, sp=sp_cfg,
                        shift=(state.window_pending if window_pending_ok
                               else None),
                        refill=refill, emission=emission)
                new_species[si] = b
                continue
            if sp_cfg.species_type == const.SpeciesType.PHOTON:
                # ballistic, current-free (push_photons,
                # particles.F90:611-695); fused variant when available
                if pallas_engines[si] is not None:
                    shift = state.window_pending if window_pending_ok \
                        else None
                    emission = None
                    if si == emit_target and emit_cands:
                        emission = (
                            jnp.concatenate([c[0] for c in emit_cands],
                                            axis=0),
                            jnp.concatenate([c[1] for c in emit_cands],
                                            axis=1),
                            jnp.concatenate([c[2] for c in emit_cands],
                                            axis=1))
                    qed_on = None
                    if getattr(pallas_engines[si], "qed_enabled",
                               False):
                        # per-step seed for the in-kernel pair-depth
                        # resample (a zero default would redraw the
                        # SAME uniforms every step)
                        qpk = cfg.qed_plan
                        flagv = ((state.time > qpk.start_time)
                                 & (state.time
                                    >= cfg.particle_push_start_time))
                        qed_on = (flagv, _seed_from_key(keys[si]))
                    b, _jph = binmod.push_deposit_pallas(
                        pallas_engines[si], fwin, b, bplan, sp=sp_cfg,
                        shift=shift, emission=emission, qed_on=qed_on)
                else:
                    b = binmod.push_photons_binned(
                        b, bplan, bc=sp_cfg.bc_particle[:2 * cfg.ndims],
                        key=key, sp=sp_cfg)
                new_species[si] = b
                continue
            sp_probes = [(pi, pp) for pi, pp in
                         enumerate(cfg.probe_plans) if si in pp.species]
            if pallas_engines[si] is not None:
                shift = state.window_pending if window_pending_ok else None
                seed = None
                if pallas_engines[si].any_thermal and key is not None:
                    seed = _seed_from_key(key)
                refill = None
                if getattr(pallas_engines[si], "with_refill", False) \
                        and si < len(state.window_refill):
                    refill = state.window_refill[si]
                qed_on = None
                if getattr(pallas_engines[si], "qed_enabled", False):
                    qp = cfg.qed_plan
                    flagv = ((state.time > qp.start_time)
                             & (state.time
                                >= cfg.particle_push_start_time))
                    qed_on = (flagv, _seed_from_key(keys[si]))
                if sp_probes:
                    b, jpart, recs = binmod.push_deposit_pallas(
                        pallas_engines[si], fwin, b, bplan, sp=sp_cfg,
                        shift=shift, probes=[pp for _, pp in sp_probes],
                        seed=seed, refill=refill, qed_on=qed_on)
                    probes, probe_dropped = _append_probe_recs(
                        probes, probe_dropped, sp_probes, recs)
                else:
                    b, jpart = binmod.push_deposit_pallas(
                        pallas_engines[si], fwin, b, bplan, sp=sp_cfg,
                        shift=shift, seed=seed, refill=refill,
                        qed_on=qed_on)
                if not sp_cfg.zero_current:
                    jpart_sum = jpart if jpart_sum is None \
                        else jpart_sum + jpart
                if getattr(pallas_engines[si], "emits_in_kernel",
                           False) and emit_target >= 0:
                    # photons born this step: candidate block from the
                    # kernel-published e_ph row (energy-min filter here;
                    # recoil already applied in-kernel regardless)
                    e_ph = b.aux[-1]
                    mag = jnp.sqrt(b.p[0] ** 2 + b.p[1] ** 2
                                   + b.p[2] ** 2)
                    msafe = jnp.maximum(mag, 1e-30)
                    keepf = (b.w > 0) \
                        & (e_ph > qp_.photon_energy_min)
                    cw = jnp.where(keepf, b.w, 0.0)
                    cp = b.p * jnp.where(
                        keepf, e_ph / (const.c * msafe), 0.0)[None]
                    emit_cands.append((cw, b.xi, cp))
            else:
                if sp_probes:
                    b, jpad, recs = binmod.push_deposit_binned(
                        fpad, b, sp_cfg, bplan,
                        bc=sp_cfg.bc_particle[:2 * cfg.ndims], key=key,
                        probes=[pp for _, pp in sp_probes])
                    probes, probe_dropped = _append_probe_recs(
                        probes, probe_dropped, sp_probes, recs)
                else:
                    b, jpad = binmod.push_deposit_binned(
                        fpad, b, sp_cfg, bplan,
                        bc=sp_cfg.bc_particle[:2 * cfg.ndims], key=key)
                if jpad is not None:
                    jpad_sum = jpad if jpad_sum is None \
                        else jpad_sum + jpad
            new_species[si] = b
        if any_thermal or any_qed_kernel:
            state = state._replace(rng=rng)
        if jpart_sum is not None:
            jp = first_engine.fold_jpart(jpart_sum)
            jpad_sum = jp if jpad_sum is None else jpad_sum + jp
        if jpad_sum is not None:
            jfull = binmod.jpad_to_padded(jpad_sum, bplan, grid)
            f = f._replace(jx=jfull[0], jy=jfull[1], jz=jfull[2])
            # periodic ghost summation, exactly as the scatter path
            f = bnd.current_bcs(f, cfg)
        if window_pending_ok:
            # the rebin routing consumed any pending window relabel
            state = state._replace(
                window_pending=jnp.zeros((), jnp.int32))
        if cfg.probe_plans:
            state = state._replace(probes=tuple(probes),
                                   probe_dropped=tuple(probe_dropped))
        return state._replace(fields=f, species=tuple(new_species))

    def current_finish(state: SimState) -> SimState:
        """current_smooth.F90:29-45 (summation bcs already applied)."""
        f = state.fields
        jx = bnd.field_bc(f.jx, "jx", cfg)
        jy = bnd.field_bc(f.jy, "jy", cfg)
        jz = bnd.field_bc(f.jz, "jz", cfg)
        if cfg.smooth_currents:
            its = cfg.smooth_iterations
            comp = 1 if cfg.smooth_compensation else 0
            jx = smooth_array(jx, cfg, its, comp)
            jy = smooth_array(jy, cfg, its, comp)
            jz = smooth_array(jz, cfg, its, comp)
        if cfg.use_current_correction and cfg.initial_currents is not None:
            # subtract the initial DC current (current_smooth.F90:39-43)
            j0x, j0y, j0z = cfg.initial_currents
            jx = jx - j0x
            jy = jy - j0y
            jz = jz - j0z
        return state._replace(fields=f._replace(jx=jx, jy=jy, jz=jz))

    def run_injectors(state: SimState) -> SimState:
        """injectors.F90:143-180."""
        if not cfg.injector_plans:
            return state
        from . import injectors as inj
        rng = state.rng
        depths = list(state.injector_depth)
        for i, plan in enumerate(cfg.injector_plans):
            rng, sub = jax.random.split(rng)
            state, depths[i] = inj.run_injector(state, plan, depths[i],
                                                cfg, sub)
        return state._replace(rng=rng, injector_depth=tuple(depths))

    def step_a(state: SimState) -> SimState:
        """qed → fields_half → injectors → push → collisions/ionise →
        current_finish → step++/time+=dt/2 (main loop, epoch1d.F90:184-249).
        Leaves the state at the mid-step output point."""
        if cfg.qed_plan is not None:
            from ..physics.qed import qed_update
            rng, sub = jax.random.split(state.rng)
            state, _ = qed_update(state._replace(rng=rng), cfg,
                                  cfg.qed_plan, sub)
        if cfg.brem_plan is not None:
            from ..physics.bremsstrahlung import brem_update
            rng, sub = jax.random.split(state.rng)
            state, _ = brem_update(state._replace(rng=rng), cfg,
                                   cfg.brem_plan, sub)
        state = fields_half(state)
        push_on = state.time >= cfg.particle_push_start_time
        if cfg.species:
            state = run_injectors(state)
            state = jax.lax.cond(push_on, push_all, lambda s: s, state) \
                if cfg.particle_push_start_time > 0 else push_all(state)
            if cfg.collision_plan is not None:
                from ..physics.collisions import particle_collisions
                rng, sub = jax.random.split(state.rng)
                state, _ = particle_collisions(state._replace(rng=rng), cfg,
                                               cfg.collision_plan, sub)
            if cfg.split_plan is not None:
                from . import housekeeping as hk
                rng, sub = jax.random.split(state.rng)
                state, _ = hk.split_particles(state._replace(rng=rng), cfg,
                                              cfg.split_plan, sub)
            if cfg.migration_plan is not None:
                from . import housekeeping as hk
                plan = cfg.migration_plan
                # step has already ++'d below in the reference by the time
                # migrate runs; match MOD(step, interval) on the new step
                state = jax.lax.cond(
                    (state.step + 1) % plan.interval == 0,
                    lambda s: hk.migrate_particles(s, cfg, plan),
                    lambda s: s, state)
            if cfg.ionise_plan is not None:
                from ..physics.ionise import ionise_particles
                rng, sub = jax.random.split(state.rng)
                state, _ = ionise_particles(state._replace(rng=rng), cfg,
                                            cfg.ionise_plan, sub)
            state = current_finish(state)
        return state._replace(step=state.step + 1,
                              time=state.time + 0.5 * dt)

    def step_b(state: SimState) -> SimState:
        """time += dt/2 → fields_final → moving window."""
        state = state._replace(time=state.time + 0.5 * dt)
        state = fields_final(state)
        if cfg.move_window:
            from . import window as win
            state = win.moving_window(state, cfg,
                                      pending_ok=window_pending_ok,
                                      refill_in_kernel=refill_in_kernel)
        return state._replace()

    def init_b_boundaries(state: SimState) -> SimState:
        """The dt/2 bfield_final_bcs trick at startup
        (epoch1d.F90:153-159)."""
        state = state._replace(time=state.time + 0.5 * dt)
        return bfield_final_bcs(state, 0.5 * dt, state.time)

    def prime_sides(state):
        """Stage BinnedSpecies.sides for carried-sides engines so the
        state pytree structure is fixed BEFORE any scan/jit over steps
        (the kernel refreshes them every invocation afterwards).
        Host-side no-op when already primed or no engine carries."""
        if cfg.engine != "binned":
            return state
        new_species = list(state.species)
        changed = False
        for si, b in enumerate(new_species):
            e = pallas_engines[si]
            if e is not None and getattr(e, "sides_out", False) \
                    and b.sides is None:
                new_species[si] = b._replace(sides=e.stage_sides(b))
                changed = True
        if not changed:
            return state
        return state._replace(species=tuple(new_species))

    return {
        # no buffer donation here: callers may hold references across the
        # dump callback; the benchmark path jits its own donated composite.
        "step_a": jax.jit(step_a),
        "step_b": jax.jit(step_b),
        "init_b_boundaries": jax.jit(init_b_boundaries),
        "step_a_raw": step_a,
        "step_b_raw": step_b,
        "init_b_boundaries_raw": init_b_boundaries,
        "fields_half": fields_half,
        "push_all": push_all,
        "prime_sides": prime_sides,
        "uses_spmd_pallas": spmd_push is not None,
    }


def make_full_step(cfg, chunk: int = 10):
    """One fused, donated step + an n-step driver for benchmarks.

    Per-dispatch latency through the runtime is ~1.8 ms on the bench
    chip — comparable to the whole step's device time — so the driver
    scans ``chunk`` steps inside one jit and dispatches n//chunk times;
    the remainder runs through a single donated step.
    """
    fns = make_step_functions(cfg)
    a, b = fns["step_a_raw"], fns["step_b_raw"]
    step = lambda s: b(a(s))
    full = jax.jit(step, donate_argnums=0)

    def chunk_body(s):
        return jax.lax.scan(lambda c, _: (step(c), None), s, None,
                            length=chunk)[0]

    full_chunk = jax.jit(chunk_body, donate_argnums=0)

    def run_n(state, n: int):
        # carried-sides engines need the state structure fixed before
        # the scan (the kernel refreshes sides in-place afterwards)
        state = fns["prime_sides"](state)
        for _ in range(n // chunk):
            state = full_chunk(state)
        for _ in range(n % chunk):
            state = full(state)
        return state

    run_n.single_step = full
    run_n.chunk_fn = full_chunk
    run_n.chunk = chunk
    return run_n
