"""Multi-chip scaling via jax.sharding.

The reference parallelises with MPI spatial domain decomposition
(``mpi_routines.F90:44-172`` split_domain + halo exchanges).  The TPU-native
mapping used here (round 1):

* **fields** are sharded along the x grid axis over the mesh — XLA GSPMD
  inserts the halo collectives (collective-permute) for the shifted-stencil
  reads, the direct analogue of ``do_field_mpi_with_lengths``;
* **particles** are sharded along the slab (capacity) axis — classic
  particle decomposition: each chip pushes its slice against the field and
  contributes to the deposition reduction.  Particle slices never need
  migration (assignment is not spatial), which eliminates EPOCH's
  particle-exchange machinery (boundary.F90:948-1354) and its load balancer
  (balance.F90) entirely: the decomposition is uniform by construction.

Spatial domain decomposition with explicit ``shard_map``/``ppermute`` halos
(lower J-reduction volume for very large grids) is the planned perf-tier
alternative; for the benchmark regime (grids ≤ few M cells, particles ≫
cells) particle decomposition is bandwidth-optimal: the only collective is
one psum of J per step.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.state import SimState, Fields, ParticleSlab, CPMLState, LaserState


def make_mesh(n_devices: int | None = None, axis: str = "x") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def state_shardings(state: SimState, mesh: Mesh, axis: str = "x"):
    """Build the sharding pytree for a SimState: fields along grid-x,
    particle slabs along capacity, everything else replicated."""
    repl = NamedSharding(mesh, P())
    field_sh = NamedSharding(mesh, P(axis))

    def field_like(arr):
        n = mesh.shape[axis]
        if arr.ndim >= 1 and arr.shape[0] % n == 0:
            return field_sh
        return repl

    fields = Fields(*[field_like(a) for a in state.fields])
    if state.cpml is not None:
        # psi stacks: (npairs, *grid) — shard grid axis (dim 1)
        psi_sh = []
        for stack in state.cpml.psi:
            n = mesh.shape[axis]
            if stack.shape[1] % n == 0:
                psi_sh.append(NamedSharding(mesh, P(None, axis)))
            else:
                psi_sh.append(repl)
        cpml = CPMLState(psi=tuple(psi_sh))
    else:
        cpml = None

    def slab_sharding(slab):
        n = mesh.shape[axis]
        if hasattr(slab, "xi"):
            # binned storage: spatial decomposition along the grid-x axis
            # (w is (K, *grid), xi/p are (nd|3, K, *grid)) — the direct
            # analogue of EPOCH's domain decomposition; rolls in the
            # binned kernels become collective-permutes over ICI
            if slab.w.shape[1] % n == 0:
                return type(slab)(
                    xi=NamedSharding(mesh, P(None, None, axis)),
                    p=NamedSharding(mesh, P(None, None, axis)),
                    w=NamedSharding(mesh, P(None, axis)),
                    n_dropped=repl)
            return jax.tree.map(lambda _: repl, slab)
        if slab.cap % n == 0:
            part = NamedSharding(mesh, P(axis))
            return ParticleSlab(
                x=part, p=part, weight=part, alive=part, id=part,
                opdepth=part, opdepth_brem=part, pvol=part)
        return jax.tree.map(lambda _: repl, slab)

    species = tuple(slab_sharding(s) for s in state.species)
    lasers = jax.tree.map(lambda _: repl, state.lasers)
    bc_fields = jax.tree.map(lambda _: repl, state.bc_fields) \
        if state.bc_fields is not None else None
    return SimState(
        fields=fields, cpml=cpml, species=species, lasers=lasers,
        time=repl, step=repl, window_offset=repl, window_frac=repl,
        rng=repl, bc_fields=bc_fields,
        injector_depth=jax.tree.map(lambda _: repl, state.injector_depth),
        fluid_grids=tuple(
            NamedSharding(mesh, P(None, axis))
            if g.shape[1] % mesh.shape[axis] == 0 else repl
            for g in state.fluid_grids))


def shard_state(state: SimState, mesh: Mesh, axis: str = "x") -> SimState:
    sh = state_shardings(state, mesh, axis)
    return jax.tree.map(
        lambda arr, s: jax.device_put(arr, s), state, sh,
        is_leaf=lambda x: x is None)


def make_sharded_step(cfg, mesh: Mesh, axis: str = "x"):
    """Jit the full step with state shardings pinned in and out."""
    from ..core import step as step_mod
    fns = step_mod.make_step_functions(cfg)

    def full(state):
        return fns["step_b"](fns["step_a"](state))

    return jax.jit(full)
