"""Checkpoint / restart.

The reference restart dump is an SDF file flagged ``restart`` containing the
full field arrays, every particle record, per-rank RNG state, dt, step/time,
window offset, laser phases and the input deck text
(diagnostics.F90:1090,3412; reader setup.F90:822-1464).  Here a restart dump
is an SDF file with the same logical content: the complete state pytree is
serialised block-by-block, so a run can resume bit-exactly (counter-based
RNG key included — the analogue of ``use_exact_restart``).
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..core.state import SimState, Fields, CPMLState, LaserState, ParticleSlab
from .sdf import SDFWriter, read as sdf_read


def write_restart(path, cfg, state: SimState, deck_text: str = "",
                  persistent_members=None, embed_source: bool = True):
    w = SDFWriter(path, step=int(state.step), time=float(state.time),
                  restart=True)
    grid = cfg.grid
    # grid mesh for tool compatibility
    w.write_plain_mesh("grid", "Grid/Grid",
                       [grid.nodes(d) for d in range(grid.ndims)])
    # full padded field arrays (the reference dumps full-domain arrays with
    # stagger metadata; we keep ghosts for bit-exact resume)
    for nm in state.fields._fields:
        w.write_plain_variable(f"restart/{nm}", f"Restart/Fields/{nm}",
                               np.asarray(getattr(state.fields, nm)), "grid")
    if state.cpml is not None:
        for k, stack in enumerate(state.cpml.psi):
            w.write_plain_variable(f"restart/cpml_psi{k}",
                                   f"Restart/CPML/psi{k}",
                                   np.asarray(stack), "grid")
    for i, sp in enumerate(cfg.species):
        s = state.species[i]
        if hasattr(s, "xi"):     # binned
            w.write_plain_variable(f"restart/binned_xi/{sp.name}",
                                   f"Restart/Binned/xi/{sp.name}",
                                   np.asarray(s.xi), "grid")
            w.write_plain_variable(f"restart/binned_p/{sp.name}",
                                   f"Restart/Binned/p/{sp.name}",
                                   np.asarray(s.p), "grid")
            w.write_plain_variable(f"restart/binned_w/{sp.name}",
                                   f"Restart/Binned/w/{sp.name}",
                                   np.asarray(s.w), "grid")
            w.write_constant(f"restart/binned_drop/{sp.name}",
                             f"Restart/Binned/dropped/{sp.name}",
                             int(s.n_dropped))
            if s.aux is not None:
                w.write_plain_variable(f"restart/binned_aux/{sp.name}",
                                       f"Restart/Binned/aux/{sp.name}",
                                       np.asarray(s.aux), "grid")
        else:
            w.write_plain_variable(f"restart/x/{sp.name}",
                                   f"Restart/Particles/x/{sp.name}",
                                   np.asarray(s.x), "grid")
            w.write_plain_variable(f"restart/p/{sp.name}",
                                   f"Restart/Particles/p/{sp.name}",
                                   np.asarray(s.p), "grid")
            w.write_plain_variable(f"restart/w/{sp.name}",
                                   f"Restart/Particles/w/{sp.name}",
                                   np.asarray(s.weight), "grid")
            w.write_plain_variable(f"restart/alive/{sp.name}",
                                   f"Restart/Particles/alive/{sp.name}",
                                   np.asarray(s.alive).astype(np.int32),
                                   "grid")
            w.write_plain_variable(f"restart/id/{sp.name}",
                                   f"Restart/Particles/id/{sp.name}",
                                   np.asarray(s.id).astype(np.int64),
                                   "grid")
            w.write_plain_variable(f"restart/od/{sp.name}",
                                   f"Restart/Particles/od/{sp.name}",
                                   np.asarray(s.opdepth), "grid")
            w.write_plain_variable(f"restart/odb/{sp.name}",
                                   f"Restart/Particles/odb/{sp.name}",
                                   np.asarray(s.opdepth_brem), "grid")
            w.write_plain_variable(f"restart/odt/{sp.name}",
                                   f"Restart/Particles/odt/{sp.name}",
                                   np.asarray(s.opdepth_tri), "grid")
            w.write_plain_variable(f"restart/pvol/{sp.name}",
                                   f"Restart/Particles/pvol/{sp.name}",
                                   np.asarray(s.pvol), "grid")
            if s.work is not None:
                # WORK_DONE_INTEGRATED columns (shared_data.F90:117-125)
                w.write_plain_variable(f"restart/work/{sp.name}",
                                       f"Restart/Particles/work/{sp.name}",
                                       np.asarray(s.work), "grid")
    # scalars + RNG + laser phases (setup.F90:1483-1573 analogues)
    w.write_constant("restart/time", "Restart/time", float(state.time))
    w.write_constant("restart/step", "Restart/step", int(state.step))
    w.write_constant("restart/dt", "Restart/dt", float(cfg.dt))
    w.write_constant("restart/window_offset", "Restart/window_offset",
                     int(state.window_offset))
    w.write_constant("restart/window_frac", "Restart/window_frac",
                     float(state.window_frac))
    if state.slab_dropped is not None:
        w.write_constant("restart/slab_dropped", "Restart/slab_dropped",
                         int(state.slab_dropped))
    if state.window_pending is not None:
        w.write_constant("restart/window_pending", "Restart/window_pending",
                         int(state.window_pending))
    for k, pd in enumerate(state.probe_dropped):
        w.write_constant(f"restart/probe_dropped{k}",
                         f"Restart/probe_dropped/{k}", int(pd))
    w.write_plain_variable("restart/rng", "Restart/rng",
                           np.asarray(jax.random.key_data(state.rng)
                                      if hasattr(jax.random, "key_data")
                                      else state.rng).astype(np.int64),
                           "grid")
    w.write_plain_variable("restart/laser_phase", "Restart/laser_phase",
                           np.asarray(state.lasers.integral_phase), "grid")
    w.write_constant("restart/laser_absorb", "Restart/laser_absorb",
                     float(state.lasers.absorb_local))
    w.write_constant("restart/laser_inject", "Restart/laser_inject",
                     float(state.lasers.inject_local))
    for k, g in enumerate(state.fluid_grids):
        w.write_plain_variable(f"restart/fluid{k}", f"Restart/Fluid/{k}",
                               np.asarray(g), "grid")
    # injector fractional-depth accumulators (read_injector_depths,
    # setup.F90:1520), probe capture buffers and ejected-particle buffers —
    # required for bit-exact resume of decks using those features
    for k, dep in enumerate(state.injector_depth):
        w.write_plain_variable(f"restart/injdepth{k}",
                               f"Restart/InjectorDepth/{k}",
                               np.asarray(dep), "grid")
    # staged moving-window refill columns (consumed by the push AFTER the
    # shift that staged them — a mid-pending restart must replay them)
    for k, ref in enumerate(state.window_refill):
        if ref is None:
            continue
        for nm, arr in zip(("w", "xi", "p"), ref):
            w.write_plain_variable(f"restart/winref{k}_{nm}",
                                   f"Restart/WindowRefill/{k}/{nm}",
                                   np.asarray(arr), "grid")

    def _write_slab(prefix, slab):
        w.write_plain_variable(f"restart/{prefix}_x", f"Restart/{prefix}/x",
                               np.asarray(slab.x), "grid")
        w.write_plain_variable(f"restart/{prefix}_p", f"Restart/{prefix}/p",
                               np.asarray(slab.p), "grid")
        w.write_plain_variable(f"restart/{prefix}_w", f"Restart/{prefix}/w",
                               np.asarray(slab.weight), "grid")
        w.write_plain_variable(f"restart/{prefix}_al", f"Restart/{prefix}/al",
                               np.asarray(slab.alive).astype(np.int32),
                               "grid")
        w.write_plain_variable(f"restart/{prefix}_id", f"Restart/{prefix}/id",
                               np.asarray(slab.id).astype(np.int64), "grid")

    for k, buf in enumerate(state.probes):
        _write_slab(f"Probe{k}", buf)
    for k, buf in enumerate(state.ejected):
        _write_slab(f"Ejected{k}", buf)
    # persistent-subset membership (id_registry analogue,
    # particle_id_hash.F90 / build_persistent_subsets)
    for (sub_name, sp_name), ids in (persistent_members or {}).items():
        w.write_plain_variable(
            f"restart/psub/{sub_name}/{sp_name}",
            f"Restart/PersistentSubset/{sub_name}/{sp_name}",
            np.fromiter(sorted(ids), dtype=np.int64, count=len(ids)),
            "grid")
    if deck_text:
        w.write_datablock("input_deck", "Input Deck", deck_text.encode(),
                          "text/plain")
    if embed_source:
        # full source tarball in every restart dump (epoch_write_source_info,
        # diagnostics.F90:3412; src/pack.py); extract with
        # scripts/unpack_source_from_restart.py
        from ..utils.pack import source_tarball
        w.write_datablock("source_code", "Source Code/epoch_tpu",
                          source_tarball(), "application/gzip")
    w.close()


def read_persistent_members(path):
    """Recover persistent-subset membership id sets from a restart."""
    d = sdf_read(path)
    out = {}
    for name, blk in d.items():
        if isinstance(name, str) \
                and name.startswith("Restart/PersistentSubset/"):
            _, _, sub_name, sp_name = name.split("/", 3)
            out[(sub_name, sp_name)] = set(int(i) for i in blk.data)
    return out


def read_restart(path, cfg, template: SimState) -> SimState:
    """Restore a SimState matching ``template``'s structure."""
    d = sdf_read(path)
    dtype = cfg.dtype

    def arr(name):
        return jnp.asarray(d[name].data.astype(dtype))

    fields = template.fields._replace(**{
        nm: arr(f"Restart/Fields/{nm}") for nm in template.fields._fields})
    cpml = template.cpml
    if cpml is not None:
        cpml = CPMLState(psi=tuple(
            arr(f"Restart/CPML/psi{k}") for k in range(len(cpml.psi))))
    species = []
    for i, sp in enumerate(cfg.species):
        t = template.species[i]
        if hasattr(t, "xi"):
            sp_r = t._replace(
                xi=arr(f"Restart/Binned/xi/{sp.name}"),
                p=arr(f"Restart/Binned/p/{sp.name}"),
                w=arr(f"Restart/Binned/w/{sp.name}"),
                n_dropped=jnp.asarray(
                    d[f"Restart/Binned/dropped/{sp.name}"].data, jnp.int32),
                aux=(arr(f"Restart/Binned/aux/{sp.name}")
                     if f"Restart/Binned/aux/{sp.name}" in d else t.aux),
            )
            if sp_r.sides is not None:
                # derived halo side columns: the template's are stale
                # against the restored slots — re-stage from the
                # restored arrays (layout via the template structure is
                # unavailable here; Simulation re-primes after restore)
                sp_r = sp_r._replace(sides=None)
            species.append(sp_r)
        else:
            extra = {}
            if f"Restart/Particles/id/{sp.name}" in d:
                extra["id"] = jnp.asarray(
                    d[f"Restart/Particles/id/{sp.name}"].data.astype(
                        np.int64))
                extra["opdepth"] = arr(f"Restart/Particles/od/{sp.name}")
                extra["opdepth_brem"] = arr(
                    f"Restart/Particles/odb/{sp.name}")
                if f"Restart/Particles/odt/{sp.name}" in d:
                    extra["opdepth_tri"] = arr(
                        f"Restart/Particles/odt/{sp.name}")
                if f"Restart/Particles/pvol/{sp.name}" in d:
                    extra["pvol"] = arr(
                        f"Restart/Particles/pvol/{sp.name}")
                if f"Restart/Particles/work/{sp.name}" in d:
                    extra["work"] = arr(
                        f"Restart/Particles/work/{sp.name}")
            species.append(t._replace(
                x=arr(f"Restart/Particles/x/{sp.name}"),
                p=arr(f"Restart/Particles/p/{sp.name}"),
                weight=arr(f"Restart/Particles/w/{sp.name}"),
                alive=jnp.asarray(
                    d[f"Restart/Particles/alive/{sp.name}"].data != 0),
                **extra,
            ))
    rng_data = d["Restart/rng"].data.astype(np.uint32)
    rng = jnp.asarray(rng_data)
    if hasattr(jax.random, "wrap_key_data") and template.rng.dtype != jnp.uint32:
        rng = jax.random.wrap_key_data(rng)
    lasers = template.lasers._replace(
        integral_phase=arr("Restart/laser_phase"))
    if "Restart/laser_absorb" in d:
        lasers = lasers._replace(
            absorb_local=jnp.asarray(d["Restart/laser_absorb"].data, dtype),
            inject_local=jnp.asarray(d["Restart/laser_inject"].data, dtype))
    fluid_grids = tuple(arr(f"Restart/Fluid/{k}")
                        for k in range(len(template.fluid_grids)))
    injector_depth = tuple(
        arr(f"Restart/InjectorDepth/{k}")
        if f"Restart/InjectorDepth/{k}" in d else template.injector_depth[k]
        for k in range(len(template.injector_depth)))

    def _read_slab(prefix, t):
        if f"Restart/{prefix}/x" not in d:
            return t
        return t._replace(
            x=arr(f"Restart/{prefix}/x"), p=arr(f"Restart/{prefix}/p"),
            weight=arr(f"Restart/{prefix}/w"),
            alive=jnp.asarray(d[f"Restart/{prefix}/al"].data != 0),
            id=jnp.asarray(d[f"Restart/{prefix}/id"].data.astype(np.int64)))

    probes = tuple(_read_slab(f"Probe{k}", t)
                   for k, t in enumerate(template.probes))
    ejected = tuple(_read_slab(f"Ejected{k}", t)
                    for k, t in enumerate(template.ejected))
    probe_dropped = tuple(
        jnp.asarray(d[f"Restart/probe_dropped/{k}"].data, jnp.int32)
        if f"Restart/probe_dropped/{k}" in d else template.probe_dropped[k]
        for k in range(len(template.probe_dropped)))
    window_refill = tuple(
        (tuple(jnp.asarray(d[f"Restart/WindowRefill/{k}/{nm}"].data,
                           dtype)
               for nm in ("w", "xi", "p"))
         if ref is not None and f"Restart/WindowRefill/{k}/w" in d
         else ref)
        for k, ref in enumerate(template.window_refill))
    return template._replace(
        window_refill=window_refill,
        fluid_grids=fluid_grids, injector_depth=injector_depth,
        probes=probes, ejected=ejected, probe_dropped=probe_dropped,
        fields=fields, cpml=cpml, species=tuple(species), lasers=lasers,
        time=jnp.asarray(d["Restart/time"].data, dtype),
        step=jnp.asarray(d["Restart/step"].data, jnp.int32),
        window_offset=jnp.asarray(d["Restart/window_offset"].data, jnp.int32),
        window_frac=jnp.asarray(d["Restart/window_frac"].data, dtype),
        rng=rng,
        slab_dropped=(jnp.asarray(d["Restart/slab_dropped"].data, jnp.int32)
                      if "Restart/slab_dropped" in d
                      else template.slab_dropped),
        window_pending=(
            jnp.asarray(d["Restart/window_pending"].data, jnp.int32)
            if "Restart/window_pending" in d else template.window_pending),
    )
