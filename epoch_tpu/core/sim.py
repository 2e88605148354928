"""Simulation assembly and run loop.

Mirrors the init sequence of ``epoch1d/src/epoch1d.F90:16-182`` (survey §3.1):
deck → grid/allocation → particle load → dt → initial field expressions →
boundary-field saves → half-dt laser init → initial dump → main loop.
"""
from __future__ import annotations

import dataclasses
import math
import os

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants as const
from ..deck.deck import DeckConfig, load_deck
from . import boundaries as bnd
from . import loader
from . import step as step_mod
from .config import (SimConfig, SpeciesConfig, LaserConfig, StencilCoeffs,
                     solver_coefficients, cfl_limit, build_cpml_profiles)
from .grid import Grid, make_grid
from .state import (SimState, Fields, CPMLState, LaserState, ParticleSlab,
                    zero_fields, empty_slab)


def _normalise_bcs(deck: DeckConfig):
    """boundary.F90:30-139 bc normalisation."""
    b = deck.boundaries
    for i in range(len(b.bc_field)):
        bc = b.bc_field[i]
        if bc in (const.BC.OTHER, const.BC.REFLECT):
            b.bc_field[i] = const.BC.CLAMP
        elif bc == const.BC.OPEN:
            b.bc_field[i] = const.BC.SIMPLE_OUTFLOW
    for sp in deck.species:
        for i in range(6):
            bc = sp.bc_particle[i]
            if bc is None:
                continue
            if bc in (const.BC.OTHER, const.BC.CONDUCT):
                sp.bc_particle[i] = const.BC.REFLECT
            elif bc in (const.BC.SIMPLE_LASER, const.BC.SIMPLE_OUTFLOW,
                        const.BC.CPML_LASER, const.BC.CPML_OUTFLOW):
                sp.bc_particle[i] = const.BC.OPEN
    for i in range(len(b.bc_particle)):
        bc = b.bc_particle[i]
        if bc in (const.BC.OTHER, const.BC.CONDUCT):
            b.bc_particle[i] = const.BC.REFLECT
        elif bc in (const.BC.SIMPLE_LASER, const.BC.SIMPLE_OUTFLOW,
                    const.BC.CPML_LASER, const.BC.CPML_OUTFLOW):
            b.bc_particle[i] = const.BC.OPEN


def compute_dt(deck: DeckConfig, grid: Grid, solver, stencil) -> float:
    """set_dt (setup.F90:637-720) + set_laser_dt (laser.f90:283-310)
    + set_plasma_frequency_dt (setup.F90 - Bohm-Gross limit)."""
    c = const.c
    d = grid.delta
    ctl = deck.control
    inv2 = sum(1.0 / dd ** 2 for dd in d)
    dt_courant = 1.0 / (c * math.sqrt(inv2))

    if solver == const.MaxwellSolver.YEE:
        dt = cfl_limit(ctl.field_order) * dt_courant
    elif solver == const.MaxwellSolver.CUSTOM:
        dt = deck.stencil.dt if deck.stencil and deck.stencil.dt > 0 \
            else dt_courant
    else:
        dt = min(d) / c

    any_open = any(bc in (const.BC.SIMPLE_LASER, const.BC.SIMPLE_OUTFLOW)
                   for bc in deck.boundaries.bc_field[:2 * grid.ndims])
    if any_open:
        dt = min(dt, dt_courant)

    # laser Nyquist limit
    dt_laser = math.inf
    for las_blk in deck.lasers:
        if las_blk.omega > 0:
            dt_laser = min(dt_laser, 2.0 * math.pi / las_blk.omega / 2.0)
    if dt_laser < math.inf:
        dt = min(dt, dt_laser)

    # plasma frequency limit (Bohm-Gross)
    dt_pf = math.inf
    k_max = 2.0 * math.pi / min(d)
    dens_cache = loader.build_species_caches(deck.species, grid)
    for sp in deck.species:
        if sp.species_type == const.SpeciesType.PHOTON or sp.mass <= 0:
            continue
        has_dens = sp.density or getattr(sp, 'density_layers', None)
        dens = dens_cache.get(f"density:{sp.name}") if has_dens else None
        if dens is None:
            continue
        if sp.density_max > 0:
            dens = np.minimum(dens, sp.density_max)
        tmax = np.zeros(grid.n)
        for i, tnm in enumerate("xyz"):
            t = dens_cache.get(f"temp_{tnm}:{sp.name}")
            if t is not None:
                tmax = np.maximum(tmax, t)
        fac1 = const.q0 ** 2 / sp.mass / const.epsilon0
        fac2 = 3.0 * k_max ** 2 * const.kb / sp.mass
        om2 = fac1 * dens + fac2 * tmax
        om2 = om2[om2 > 1e-300]
        if om2.size:
            dt_pf = min(dt_pf, float(2.0 * math.pi / np.sqrt(om2.max())))
    if dt_pf < math.inf:
        dt = min(dt, dt_pf / 2.0)

    mult = ctl.dt_multiplier
    if solver == const.MaxwellSolver.CUSTOM and mult < 1.0:
        mult = 1.0       # setup.F90:598-607
    return dt * mult


def _expr_fn(expr):
    if expr is None:
        return None
    return expr


def build_config(deck: DeckConfig) -> SimConfig:
    # bc_*_after_move: the reference switches field BCs when the window
    # starts (window.F90:358-368); with start_time <= 0 that is build
    # time.  A delayed start records the post-move BC tuple in the
    # config; the host loop swaps in a re-built step set when the window
    # starts (Simulation.fns_for / Runner.run) — the jit-era analogue of
    # the reference's mid-run setup_boundaries call.
    win0 = deck.window
    bc_after_move = None
    if win0.move_window:
        after = [win0.bc_x_min_after_move, win0.bc_x_max_after_move]
        if win0.window_start_time <= 0.0:
            for i in (0, 1):
                if after[i] is not None:
                    deck.boundaries.bc_field[i] = after[i]
        elif any(a is not None for a in after):
            post = list(deck.boundaries.bc_field)
            for i in (0, 1):
                if after[i] is not None:
                    post[i] = after[i]
            # normalise like _normalise_bcs does for the pre-move set
            for i in range(len(post)):
                if post[i] in (const.BC.OTHER, const.BC.REFLECT):
                    post[i] = const.BC.CLAMP
                elif post[i] == const.BC.OPEN:
                    post[i] = const.BC.SIMPLE_OUTFLOW
            # the CPML layer is laid out at grid build: switching a
            # boundary's cpml-ness mid-run would need a regrid, which
            # the reference cannot do either (allocate_cpml_fields runs
            # at setup) — reject it loudly rather than mis-absorb
            for i in (0, 1):
                pre_cpml = deck.boundaries.bc_field[i] in const.CPML_BCS
                post_cpml = post[i] in const.CPML_BCS
                if pre_cpml != post_cpml:
                    raise ValueError(
                        f"bc_{'x_min' if i == 0 else 'x_max'}_after_move "
                        f"changes the boundary's CPML-ness; use a "
                        f"matching cpml_*/simple_* pair")
            bc_after_move = tuple(post)
    _normalise_bcs(deck)
    grid = make_grid(deck.control, deck.boundaries)
    solver = deck.control.maxwell_solver
    dt = compute_dt(deck, grid, solver, deck.stencil)
    stencil = solver_coefficients(solver, deck.stencil, grid, dt)
    dtype = np.float64 if deck.control.precision == "double" else np.float32

    # resolve deferred delta-f density_back expressions that reference
    # other species' densities (twostream_deltaf.deck style)
    if any(getattr(sp, "density_back_expr", None) is not None
           for sp in deck.species):
        dcache = {}
        for sp in deck.species:
            if sp.density or getattr(sp, "density_layers", None):
                dcache[f"density:{sp.name}"] = \
                    loader.species_density(sp, grid, dcache)
            ex = getattr(sp, "density_back_expr", None)
            if ex is not None:
                names = ["x", "y", "z"]
                ctx = dict(dcache)
                for d in range(grid.ndims):
                    ctx[names[d]] = grid.centres(d)[:1]
                ctx["time"] = 0.0
                val = ex(ctx, xp=np)
                sp.density_back = float(np.mean(np.asarray(val)))

    species = []
    for sp in deck.species:
        # boundary temperatures for thermal bcs: species temperature
        # evaluated at the domain edges (helper.F90:42-45)
        ext_temp = []
        for b in range(2 * grid.ndims):
            ax = b // 2
            edge = grid.hi[ax] if b % 2 else grid.lo[ax]
            ctx = {"xyz"[ax]: edge, "time": 0.0}
            for d in range(grid.ndims):
                ctx.setdefault("xyz"[d], 0.5 * (grid.lo[d] + grid.hi[d]))
            temps = []
            for i in range(3):
                try:
                    temps.append(float(np.mean(sp.temp[i](ctx)))
                                 if sp.temp[i] is not None else 0.0)
                except Exception:
                    temps.append(0.0)
            ext_temp.append(tuple(temps))
        species.append(SpeciesConfig(
            name=sp.name,
            charge=sp.charge,
            mass=sp.mass,
            cap=0,   # filled after loading
            immobile=sp.immobile,
            zero_current=sp.zero_current,
            species_type=sp.species_type,
            bc_particle=tuple(sp.bc_particle),
            npart=sp.npart,
            npart_per_cell=sp.npart_per_cell,
            ext_temp=tuple(ext_temp),
            deltaf=(sp.density_back, tuple(sp.temp_back),
                    tuple(sp.drift_back))
            if getattr(sp, "density_back", 0.0) else None,
        ))

    lasers = []
    for las_blk in deck.lasers:
        lasers.append(LaserConfig(
            boundary=las_blk.boundary,
            amp=las_blk.amp,
            omega=las_blk.omega,
            pol_angle=las_blk.pol_angle,
            t_start=las_blk.t_start,
            t_end=las_blk.t_end,
            t_profile=_expr_fn(las_blk.t_profile),
            profile=_expr_fn(las_blk.profile),
            phase=_expr_fn(las_blk.phase),
            omega_fn=_expr_fn(las_blk.omega_expr),
        ))

    aux = None
    if any(grid.cpml_active):
        aux = build_cpml_profiles(grid, deck.boundaries.bc_field,
                                  deck.boundaries.cpml_kappa_max,
                                  deck.boundaries.cpml_a_max,
                                  deck.boundaries.cpml_sigma_max,
                                  deck.control.field_order)

    win = deck.window
    cfg = SimConfig(
        grid=grid,
        dt=dt,
        t_end=deck.control.t_end,
        nsteps=deck.control.nsteps,
        bc_field=tuple(deck.boundaries.bc_field),
        bc_particle=tuple(deck.boundaries.bc_particle),
        species=tuple(species),
        lasers=tuple(lasers),
        field_order=deck.control.field_order,
        maxwell_solver=solver,
        stencil=stencil,
        dtype=dtype,
        smooth_currents=deck.control.smooth_currents,
        use_higuera_cary=deck.control.use_higuera_cary,
        work_done_integrated=deck.control.work_done_integrated,
        bin_overflow=deck.control.bin_overflow,
        smooth_iterations=deck.control.smooth_iterations,
        smooth_compensation=deck.control.smooth_compensation,
        cpml_kappa_max=deck.boundaries.cpml_kappa_max,
        cpml_a_max=deck.boundaries.cpml_a_max,
        cpml_sigma_max=deck.boundaries.cpml_sigma_max,
        aux=aux,
        move_window=win.move_window,
        window_v_x=_expr_fn(win.window_v_x),
        window_start_time=win.window_start_time,
        window_stop_time=win.window_stop_time,
        particle_push_start_time=deck.control.particle_tstart,
        bc_field_after_move=bc_after_move,
        deck=deck,
    )
    if cfg.move_window:
        from .window import window_plan
        cfg = dataclasses.replace(
            cfg, window_plans=tuple(window_plan(cfg, deck)))
    cfg = dataclasses.replace(cfg, engine=_select_engine(deck, cfg))
    if deck.injectors:
        from .injectors import InjectorPlan
        cfg = dataclasses.replace(cfg, injector_plans=tuple(
            InjectorPlan(b, cfg, deck) for b in deck.injectors))
    cfg = dataclasses.replace(
        cfg, use_current_correction=deck.control.use_current_correction)
    if deck.control.field_ionisation and any(
            getattr(s, "ionise", False) for s in deck.species):
        from ..physics.ionise import IonisePlan
        cfg = dataclasses.replace(cfg, ionise_plan=IonisePlan(cfg, deck))
    if deck.collisions.use_collisions:
        from ..physics.collisions import CollisionPlan
        cfg = dataclasses.replace(cfg, collision_plan=CollisionPlan(cfg, deck))
    if deck.qed.use_qed:
        from ..physics.qed import QEDPlan
        plan = QEDPlan(cfg, deck)
        cfg = dataclasses.replace(cfg, qed_plan=plan)
        if plan.produce_photons and not plan.photon_dynamics \
                and plan.photon_species >= 0:
            # photon_dynamics = F (the reference default): photons are
            # created and accumulate but are never pushed
            # (particles.F90:178 gates push_photons on photon_dynamics)
            sp = list(cfg.species)
            sp[plan.photon_species] = dataclasses.replace(
                sp[plan.photon_species], immobile=True)
            cfg = dataclasses.replace(cfg, species=tuple(sp))
    if deck.bremsstrahlung.use_bremsstrahlung:
        from ..physics.bremsstrahlung import BremPlan
        plan = BremPlan(cfg, deck)
        cfg = dataclasses.replace(cfg, brem_plan=plan)
        if plan.produce_photons and not plan.photon_dynamics:
            # stationary photons (bremsstrahlung_photon_dynamics = F)
            sp = list(cfg.species)
            sp[plan.photon_species] = dataclasses.replace(
                sp[plan.photon_species], immobile=True)
            cfg = dataclasses.replace(cfg, species=tuple(sp))
    if any(sb.split for sb in deck.species):
        from .housekeeping import SplitPlan
        cfg = dataclasses.replace(cfg, split_plan=SplitPlan(cfg, deck))
    if deck.control.use_migration:
        from .housekeeping import MigrationPlan
        plan = MigrationPlan(cfg, deck)
        if plan.any_active:
            cfg = dataclasses.replace(cfg, migration_plan=plan)
    if any("ejected_particles" in o.variables for o in deck.outputs) \
            and cfg.engine != "binned":
        cfg = dataclasses.replace(cfg, track_ejected=True)
    if any("absorption" in o.variables for o in deck.outputs):
        cfg = dataclasses.replace(cfg, dump_absorption=True)
    if cfg.engine == "binned":
        # per-particle aux rows the physics packages need on the slot grid
        aux_rows = []
        if deck.qed.use_qed:
            aux_rows.append("opdepth")
            if getattr(deck.qed, "use_trident", False):
                aux_rows.append("opdepth_tri")
        if deck.bremsstrahlung.use_bremsstrahlung:
            aux_rows.append("opdepth_brem")
        # particle IDs ride the slot grid as a pair of float-encoded aux
        # rows (20 bits each, exact in f32) when the deck needs them: id
        # output or persistent-subset membership (generate_particle_ids,
        # partlist.F90:883; id_registry, particle_id_hash.F90:88-692)
        need_ids = any("id" in o.variables for o in deck.outputs) or any(
            s.persist_start_time is not None
            or s.persist_start_step is not None for s in deck.subsets)
        if need_ids:
            aux_rows += ["id_lo", "id_hi"]
        if any(getattr(s, "deltaf", None) is not None
               for s in cfg.species):
            # delta-f phase-space volumes (deltaf_loader.F90) ride the
            # slot grid so the binned deposit can subtract f0
            aux_rows.append("pvol")
        if deck.qed.use_qed:
            # per-particle eta written by the fused kernel (in-kernel
            # QED rates); MUST stay the LAST row — the kernel excludes
            # it from the rebin routing and appends it fresh
            aux_rows.append("qed_eta")
        if aux_rows:
            cfg = dataclasses.replace(cfg, binned_aux=tuple(aux_rows))
    return cfg


def _select_engine(deck: DeckConfig, cfg: SimConfig) -> str:
    """Pick the particle engine.  'binned' (core/binned.py) is the dense TPU
    hot path; it supports periodic/open/reflect/thermal/heat-bath particle
    boundaries, any field BCs (incl. lasers/CPML — field-side machinery is
    engine independent), the moving window, injectors, probes, splitting,
    the triangle shape, photon species and the particle-creating physics
    packages (field/collisional ionisation, QED, bremsstrahlung —
    cell-local candidate merges, binned.merge_candidates) and species
    migration (cell-local moves, housekeeping._migrate_binned).
    Delta-f stays on scatter (explicit downgrade below)."""
    choice = deck.control.pusher
    if choice == "scatter":
        return "scatter"
    binned_bcs = (const.BC.PERIODIC, const.BC.OPEN, const.BC.REFLECT,
                  const.BC.THERMAL, const.BC.HEAT_BATH)
    why = []
    if not all(bc in binned_bcs
               for sp in cfg.species
               for bc in sp.bc_particle[:2 * cfg.ndims]) \
            or not all(bc in binned_bcs
                       for bc in cfg.bc_particle[:2 * cfg.ndims]):
        why.append("unsupported particle boundary condition")
    if cfg.grid.shape_fn != const.Shape.TRIANGLE:
        why.append(f"shape function {cfg.grid.shape_fn.name}"
                   " (binned = triangle only)")
    if len(cfg.species) == 0:
        why.append("no species")
    if deck.control.work_done_integrated:
        # the fused/binned push does not compute the per-direction work
        # terms (WORK_DONE_INTEGRATED, particles.F90:396-411): the
        # scatter Boris push carries them exactly
        why.append("work_done_integrated diagnostics")
    # probes run on the binned engine (plane distances carried
    # through the rebin) except with a moving window (probe planes
    # are window-frame-fixed there) or photon species (photon push
    # bypasses the massive-particle path that detects crossings)
    if deck.probes and (
            deck.window.move_window
            or any(cfg.species[i].species_type == const.SpeciesType.PHOTON
                   for pb in deck.probes
                   for i in (deck.species_index(s)
                             for s in pb.include_species))):
        why.append("probes with a moving window / photon species")
    eligible = not why
    if choice == "binned":
        if not eligible:
            raise ValueError(
                "pusher=binned ineligible: " + "; ".join(why))
        return "binned"
    if not eligible:
        # loud downgrade (VERDICT r3): a silently selected scatter engine
        # loses an order of magnitude of throughput
        import logging
        logging.getLogger("epoch_tpu").warning(
            "binned TPU engine ineligible (%s): falling back to the "
            "scatter engine", "; ".join(why))
        return "scatter"
    return "binned"


def _initial_fields(deck: DeckConfig, grid: Grid, dtype) -> Fields:
    """Evaluate begin:fields expressions on the padded grid
    (deck_fields_block)."""
    f = zero_fields(grid.padded_shape(), dtype)
    fb = deck.fields
    updates = {}
    names = ["x", "y", "z"]
    cs = [grid.centres(d, ghosts=True) for d in range(grid.ndims)]
    csb = [grid.nodes(d, ghosts=True)[:-1] for d in range(grid.ndims)]
    for comp in ("ex", "ey", "ez", "bx", "by", "bz"):
        expr = getattr(fb, comp)
        if expr is None:
            continue
        # staggered coordinate per axis
        stag = bnd.STAGGER[comp]
        ctx = {}
        axes_coords = []
        for d in range(grid.ndims):
            coord = cs[d] + (0.5 * grid.delta[d] if stag[d] else 0.0)
            axes_coords.append(coord)
        if grid.ndims == 1:
            ctx[names[0]] = axes_coords[0]
        else:
            mesh = np.meshgrid(*axes_coords, indexing="ij")
            for d in range(grid.ndims):
                ctx[names[d]] = mesh[d]
        loader._add_geom_ctx(ctx, grid)
        val = expr(ctx, xp=np)
        updates[comp] = jnp.asarray(
            np.broadcast_to(np.asarray(val, dtype), grid.padded_shape()))
    return f._replace(**updates)


def build_state(cfg: SimConfig, seed: int = 0) -> SimState:
    deck = cfg.deck
    grid = cfg.grid
    dtype = cfg.dtype
    rng = np.random.default_rng(seed)

    fields = _initial_fields(deck, grid, dtype)

    loaded = []
    new_species = []
    dens_cache = loader.build_species_caches(deck.species, grid)
    pff_map = {p.species: p for p in getattr(deck, "part_from_file", ())}
    for sp_blk, sp_cfg in zip(deck.species, cfg.species):
        if sp_blk.name in pff_map:
            # particles_from_file replaces auto_load (helper.F90:763-930)
            arrs = loader.load_from_file(pff_map[sp_blk.name], grid,
                                         base_dir=deck.deck_dir)
            n = arrs["x"].shape[0]
            cap = max(256, int(math.ceil(n * 1.25 / 128.0)) * 128)
        else:
            arrs, cap = loader.load_species(sp_blk, grid, rng, dtype,
                                            dens_cache=dens_cache)
        loaded.append(arrs)
        new_species.append(dataclasses.replace(sp_cfg, cap=cap))
    cfg = dataclasses.replace(cfg, species=tuple(new_species))

    slabs = []
    if cfg.engine == "binned":
        from .binned import bin_from_arrays
        n_cells = int(np.prod(grid.n))
        nsp = len(loaded)

        # --- per-species slot counts (K): every kernel/tail pass over a
        # species costs ∝ its K × grid, so static backgrounds (fixed
        # ions) shouldn't pay the headroom a growing cascade photon
        # population needs.  Collisions already pair at min(K_i, K_j);
        # cross-species creation appends (merge_candidates) concatenate
        # any K_src onto any K_dst.
        def headroom_of(si):
            h = getattr(deck.species[si], "bin_headroom", 0.0)
            return h if h > 0 else deck.control.bin_headroom

        explicit = [getattr(sb, "bin_headroom", 0.0) > 0
                    for sb in deck.species]
        ks = [4] * nsp
        for si, arrs in enumerate(loaded):
            if arrs is not None:
                # size K by the PEAK per-cell count of the actual load
                # (bounded-support densities concentrate npart into few
                # cells; the old mean-over-all-cells undersized K and
                # silently dropped particles at bin time)
                x = np.asarray(arrs["x"])
                r = np.stack([(x[:, d] - grid.grid_min(d)) / grid.delta[d]
                              for d in range(grid.ndims)], axis=1)
                cell = np.floor(r + 0.5).astype(np.int64)
                flat = np.zeros(x.shape[0], np.int64)
                for d in range(grid.ndims):
                    flat = flat * grid.n[d] + np.mod(cell[:, d], grid.n[d])
                counts = np.bincount(flat, minlength=n_cells) \
                    if x.shape[0] else np.zeros(1, np.int64)
                peak = int(counts.max())
                occ = counts[counts > 0]
                mean_occ = float(occ.mean()) if occ.size else 0.0
                # headroom covers dynamic compression of the typical
                # cell; the load-time peak (Poisson noise of npart-style
                # loads) must fit outright
                ks[si] = max(ks[si], max(int(math.ceil(
                    mean_occ * headroom_of(si))), peak) + 2)
        for inj in deck.injectors:
            # a steady injected stream fills the boundary cell to ~npc
            # (flux in = flux out); size the slots like a loaded species
            si = deck.species_index(inj.species)
            npc = inj.npart_per_cell
            if npc <= 0:
                npc = max(deck.species[si].npart_per_cell, 1.0)
            ks[si] = max(ks[si], int(math.ceil(
                npc * headroom_of(si))) + 2)
        for si, sb in enumerate(deck.species):
            if sb.split:
                # splitting doubles counts in cells at <= min_count
                ks[si] = max(ks[si],
                             2 * deck.control.npart_per_cell_min + 2)

        # creation/migration TARGETS default to their sources' K (a cell
        # can gain up to a source-cell's worth of particles).  An
        # explicit species-block bin_headroom re-bases that inheritance:
        # K = ceil(source base occupancy × own headroom) — a cascade
        # deck can grow accumulating photons and shrink short-lived
        # positrons independently (drops stay counted either way).
        # Propagation is pure-max (cycle-safe: emitter→γ→pair-electron
        # loops converge); the explicit re-basing runs once in between.
        edges = []                   # (src, dst) creation/move pairs

        def edge(src, dst):
            if src is not None and dst is not None \
                    and 0 <= src < nsp and 0 <= dst < nsp and src != dst:
                edges.append((src, dst))

        qp = cfg.qed_plan
        if qp is not None:
            for e in qp.emitters:
                edge(e, qp.photon_species)
                if getattr(qp, "use_trident", False):
                    edge(e, qp.tri_electron)
                    edge(e, qp.tri_positron)
            if qp.produce_pairs and qp.photon_species >= 0:
                edge(qp.photon_species, qp.bw_electron)
                edge(qp.photon_species, qp.bw_positron)
        bp = cfg.brem_plan
        if bp is not None and bp.photon_species >= 0:
            for e in bp.electrons:
                edge(e, bp.photon_species)
        if cfg.ionise_plan is not None:
            for lv in cfg.ionise_plan.levels:
                edge(lv["species"], lv["to"])
                edge(lv["species"], lv["release"])
        if cfg.collision_plan is not None:
            for en in getattr(cfg.collision_plan, "ionise_entries", ()):
                edge(en["ion"], en["to"])
                edge(en["ion"], en["release"])
        if cfg.migration_plan is not None:
            mp = cfg.migration_plan
            for si in range(nsp):
                edge(si, mp.promote_to[si] if mp.promote_to[si] >= 0
                     else None)
                edge(si, mp.demote_to[si] if mp.demote_to[si] >= 0
                     else None)

        def propagate():
            for _ in range(nsp):
                for src, dst in edges:
                    if not explicit[dst]:
                        ks[dst] = max(ks[dst], ks[src])

        propagate()
        for dst in range(nsp):
            if not explicit[dst]:
                continue
            srcs = [s for s, d in edges if d == dst]
            if srcs:
                base = max((ks[s] - 2) / max(headroom_of(s), 1e-9)
                           for s in srcs)
                ks[dst] = max(ks[dst], int(math.ceil(
                    base * headroom_of(dst))) + 2)
        propagate()

        # K is the leading (non-tiled) axis of every slot array: no lane
        # alignment needed, and every kernel's VPU work scales ∝ K
        cfg = dataclasses.replace(cfg, bin_k=max(ks), bin_k_sp=tuple(ks))
        from .binned import BinnedPlan
        ns = BinnedPlan(cfg).ns      # slot extents incl. pad columns
        for si, arrs in enumerate(loaded):
            if arrs is None:
                # empty-loaded species (QED photons/positrons before any
                # emission): pin the staging dtype to the deck precision
                # — bare np.zeros is f64 and under x64 the whole slot
                # grid would silently come out f64 (2x memory and a
                # future-error f64→f32 scatter at every deposit)
                zdt = np.dtype(cfg.dtype)
                arrs = dict(x=np.zeros((0, grid.ndims), zdt),
                            p=np.zeros((0, 3), zdt),
                            weight=np.zeros((0,), zdt))
            aux_vals = None
            if "pvol" in arrs and "pvol" in cfg.binned_aux:
                aux_vals = {cfg.binned_aux.index("pvol"): arrs["pvol"]}
            slabs.append(bin_from_arrays(
                arrs["x"], arrs["p"], arrs["weight"], grid, ks[si],
                n_aux=len(cfg.binned_aux), ns=ns, aux_vals=aux_vals))
    else:
        # ionisation products need capacity headroom scaled by their sources
        ion_levels = []
        if cfg.ionise_plan is not None:
            ion_levels += [(lv["species"], lv["to"], lv["release"])
                           for lv in cfg.ionise_plan.levels]
        if cfg.collision_plan is not None:
            ion_levels += [(e["ion"], e["to"], e["release"])
                           for e in getattr(cfg.collision_plan,
                                            "ionise_entries", ())]
        if ion_levels:
            caps = [s.cap for s in cfg.species]
            for src, to, release in ion_levels:
                caps[to] = max(caps[to], caps[src] + caps[to])
                caps[release] += caps[src]
            cfg = dataclasses.replace(cfg, species=tuple(
                dataclasses.replace(s, cap=c)
                for s, c in zip(cfg.species, caps)))
        for arrs, sp_cfg in zip(loaded, cfg.species):
            slab = empty_slab(sp_cfg.cap, grid.ndims, dtype)
            if arrs is not None:
                n = arrs["x"].shape[0]
                slab = slab._replace(
                    x=slab.x.at[:n].set(arrs["x"]),
                    p=slab.p.at[:n].set(arrs["p"]),
                    weight=slab.weight.at[:n].set(arrs["weight"]),
                    alive=slab.alive.at[:n].set(arrs["alive"]),
                )
                if "id" in arrs:
                    slab = slab._replace(
                        id=slab.id.at[:n].set(arrs["id"]))
                if "pvol" in arrs:
                    slab = slab._replace(
                        pvol=slab.pvol.at[:n].set(arrs["pvol"]))
            if cfg.work_done_integrated:
                # WORK_DONE_INTEGRATED storage (shared_data.F90:117-125)
                slab = slab._replace(
                    work=jnp.zeros((sp_cfg.cap, 6), dtype))
            slabs.append(slab)

    cpml = None
    if cfg.any_cpml:
        npairs = 2 * grid.ndims
        z = jnp.zeros((npairs,) + grid.padded_shape(), dtype)
        cpml = CPMLState(psi=(z, z))

    nl = max(len(cfg.lasers), 1)
    lstate = LaserState(
        integral_phase=jnp.zeros(nl, dtype),
        absorb_local=jnp.zeros((), dtype),
        inject_local=jnp.zeros((), dtype),
    )

    # boundary-field saves for Silver-Müller outflow (setup.F90:361-388)
    bc_fields = _field_boundary_saves(fields, cfg)

    state = SimState(
        fields=fields,
        cpml=cpml,
        species=tuple(slabs),
        lasers=lstate,
        time=jnp.zeros((), dtype),
        step=jnp.zeros((), jnp.int32),
        window_offset=jnp.zeros((), jnp.int32),
        window_frac=jnp.zeros((), dtype),
        rng=jax.random.PRNGKey(seed),
        bc_fields=bc_fields,
        injector_depth=tuple(jnp.zeros((p.n_cells,), dtype)
                             for p in cfg.injector_plans),
        slab_dropped=jnp.zeros((), jnp.int32),
        window_pending=(jnp.zeros((), jnp.int32) if cfg.move_window
                        else None),
    )
    if cfg.move_window and cfg.engine == "binned":
        # staged refill columns for the in-kernel pending-shift path
        # (window._shift_masked refill_in_kernel); zeros until the first
        # shift — harmless when the path is inactive (e.g. off-TPU)
        from .binned import window_pending_capable
        if window_pending_capable(cfg):
            nt = tuple(grid.n[1:])
            refill = []
            for i, wp in enumerate(cfg.window_plans):
                K = cfg.bin_k_sp[i] if cfg.bin_k_sp else cfg.bin_k
                if wp["max_new"] > 0 and wp["density"] is not None:
                    refill.append((
                        jnp.zeros((K,) + nt, dtype),
                        jnp.zeros((grid.ndims, K) + nt, dtype),
                        jnp.zeros((3, K) + nt, dtype)))
                else:
                    refill.append(None)
            state = state._replace(window_refill=tuple(refill))
    if deck.probes:
        from .probes import build_probe_plans, init_probe_buffers
        cfg = dataclasses.replace(
            cfg, probe_plans=build_probe_plans(cfg, deck))
        state = state._replace(
            probes=init_probe_buffers(cfg, dtype),
            probe_dropped=tuple(jnp.zeros((), jnp.int32)
                                for _ in cfg.probe_plans))
    if cfg.migration_plan is not None:
        from .housekeeping import init_fluid_grids
        state = init_fluid_grids(cfg, state, cfg.migration_plan)
    if cfg.track_ejected:
        state = state._replace(ejected=tuple(
            empty_slab(max(256, getattr(s, "cap", 256) // 2),
                       grid.ndims, dtype)
            for s in state.species))
    if cfg.use_current_correction and cfg.species:
        # calc_initial_current (io/calc_df.F90:1231): the DC current of the
        # initial distribution, subtracted each step in current_finish
        from ..io.diagnostics import get_slab, particle_to_grid
        from .boundaries import current_summation_bcs
        j0 = []
        for comp in range(3):
            acc = 0.0
            for i, sp in enumerate(cfg.species):
                slab = get_slab(cfg, state, i)
                mc = sp.mass * const.c
                u = slab.p / mc
                gam = jnp.sqrt(1.0 + jnp.sum(u ** 2, axis=1))
                v = slab.p[:, comp] / (sp.mass * gam)
                acc = acc + particle_to_grid(slab, grid, v) * sp.charge
            acc = current_summation_bcs(acc / grid.cell_volume, "", cfg)
            j0.append(jnp.asarray(acc, dtype))
        cfg = dataclasses.replace(cfg, initial_currents=tuple(j0))
    return cfg, state


def _field_boundary_saves(fields: Fields, cfg) -> dict:
    """ey_x_min etc. for every domain boundary (setup_field_boundaries,
    setup.F90:363-388): components staggered along the boundary axis are
    averaged over the two rows straddling the edge."""
    grid = cfg.grid
    ng = grid.ng
    names = ["x", "y", "z"]
    # stagger flags per axis: which of (ex,ey,ez,bx,by,bz) are staggered
    # along that axis (Yee layout)
    e_stag = {0: ("ex",), 1: ("ey",), 2: ("ez",)}
    out = {}
    for axis in range(grid.ndims):
        n = grid.n[axis]
        f0 = ng
        f1 = n + ng - 1
        if cfg.bc_field[2 * axis] == const.BC.CPML_LASER:
            f0 = (grid.cpml_thickness + cfg.fng - 1) + ng - 1
        if cfg.bc_field[2 * axis + 1] == const.BC.CPML_LASER:
            f1 = (n - grid.cpml_thickness - cfg.fng + 2) + ng - 1

        def row(a, i):
            sl = [slice(None)] * a.ndim
            sl[axis] = i
            return a[tuple(sl)]

        stag_e = e_stag[axis][0]
        stag_b = [f"b{names[t]}" for t in range(3) if t != axis]
        for side, i in (("min", f0), ("max", f1)):
            key = f"{names[axis]}_{side}"
            for nm in ("ex", "ey", "ez", "bx", "by", "bz"):
                arr = getattr(fields, nm)
                if nm == stag_e or nm in stag_b:
                    out[f"{nm}_{key}"] = 0.5 * (row(arr, i)
                                                + row(arr, i - 1))
                else:
                    out[f"{nm}_{key}"] = row(arr, i)
    return out


class Simulation:
    """Host-side driver (the PROGRAM pic analogue)."""

    def __init__(self, deck_path: str, seed: int = 0, mesh=None):
        """``mesh``: None (single-program), a jax.sharding.Mesh, or
        "auto" — deck nprocx/y keys or an automatic grid-x split over
        the available devices (parallel.sharding.auto_mesh), the
        analogue of the reference decomposing every run
        (mpi_routines.F90:44-172)."""
        from .. import extensions as ext
        ext.load_plugin(os.path.dirname(os.path.abspath(deck_path)))
        self.deck = load_deck(deck_path)
        cfg = build_config(self.deck)
        if mesh == "auto":
            from ..parallel.sharding import auto_mesh
            mesh = auto_mesh(cfg, self.deck.control)
        if mesh is not None:
            cfg = dataclasses.replace(cfg, mesh=mesh)
        self.cfg, self.state = build_state(cfg, seed=seed)
        if mesh is not None:
            from ..parallel.sharding import shard_state
            self.state = shard_state(self.state, mesh)
        self.fns = self._finalise_fns(step_mod.make_step_functions(self.cfg))
        # init: particle bcs + efield bcs + half-dt laser trick
        # (epoch1d.F90:141-159)
        st = self.state
        if self.cfg.engine != "binned":
            new_slabs = []
            for sp_cfg, slab in zip(self.cfg.species, st.species):
                new_slabs.append(bnd.particle_bcs(slab, sp_cfg, self.cfg))
            st = st._replace(species=tuple(new_slabs))
        st = st._replace(fields=bnd.efield_bcs(st.fields, self.cfg))
        st = self.fns["init_b_boundaries"](st)
        st = self.fns["prime_sides"](st)
        self.state = st
        # user manual-load hooks (ic_module.f90:29): run once after the
        # auto-load + init boundary sequence, free to replace state
        for hook in ext.MANUAL_LOAD:
            new = hook(self)
            if new is not None:
                self.state = new

    @property
    def dt(self):
        return self.cfg.dt

    def _finalise_fns(self, fns):
        """On a mesh, pin state shardings in AND out of the jitted step
        halves (without out_shardings GSPMD may leave outputs partially
        replicated — the 4x redundancy seen in round 1)."""
        if self.cfg.mesh is None:
            return fns
        import jax
        from ..parallel.sharding import state_shardings
        sh = state_shardings(self.state, self.cfg.mesh)
        for nm in ("step_a", "step_b", "init_b_boundaries"):
            fns[nm] = jax.jit(fns[nm + "_raw"],
                              in_shardings=(sh,), out_shardings=sh)
        return fns

    def fns_for(self, state):
        """Step set for the current time: once a delayed moving window
        starts, the after-move BCs replace the boundary (the reference
        re-runs setup_boundaries mid-run, window.F90:358-368); here that
        is a second jitted step set built lazily at the crossing."""
        cfg = self.cfg
        if cfg.bc_field_after_move is None \
                or float(state.time) < cfg.window_start_time:
            return self.fns
        if getattr(self, "_fns_post", None) is None:
            cfg_post = dataclasses.replace(
                cfg, bc_field=tuple(cfg.bc_field_after_move),
                bc_field_after_move=None)
            self._cfg_post = cfg_post
            self._fns_post = self._finalise_fns(
                step_mod.make_step_functions(cfg_post))
        return self._fns_post

    def run(self, dump_callback=None, max_steps=None):
        """Main loop (epoch1d.F90:184-249).  ``dump_callback(sim, state)``
        is invoked at every mid-step output point and once at t=0."""
        cfg = self.cfg
        st = self.state
        if dump_callback is not None:
            dump_callback(self, st)     # initial dump (time = dt/2 point)
        nsteps = cfg.nsteps if cfg.nsteps >= 0 else None
        if max_steps is not None:
            nsteps = min(nsteps, max_steps) if nsteps else max_steps
        while True:
            t = float(st.time)
            s = int(st.step)
            if (nsteps is not None and s >= nsteps) or t >= cfg.t_end:
                break
            fns = self.fns_for(st)
            st = fns["step_a"](st)
            if dump_callback is not None:
                dump_callback(self, st)
            st = fns["step_b"](st)
        if getattr(st, "window_refill", ()):
            # surface the staged refill column in the returned state
            # (idempotent: the next push would substitute the same data)
            from .window import materialize_refill
            st = materialize_refill(st, cfg)
        self.state = st
        if dump_callback is not None:
            dump_callback(self, st, last=True)
        return st
