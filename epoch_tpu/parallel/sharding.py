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


def make_mesh(n_devices: int | None = None, axis: str = "x",
              shape: tuple | None = None, axes: tuple = ("x", "y")) -> Mesh:
    """1-D mesh over grid-x by default; pass ``shape=(a, b)`` for a 2-D
    (x, y) device mesh — the analogue of deck ``nprocx/nprocy``
    (split_domain, mpi_routines.F90:44-172)."""
    devs = jax.devices()
    if shape is not None:
        n = int(np.prod(shape))
        return Mesh(np.array(devs[:n]).reshape(shape), axes[:len(shape)])
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def auto_mesh(cfg, control=None):
    """Deck-driven or automatic device decomposition for a run — the
    analogue of ``split_domain`` (mpi_routines.F90:44-172), which the
    reference applies to every run.

    Deck ``nprocx/y/z`` keys (deck_control_block.F90) request an explicit
    split; more processors than devices is a hard error, exactly as the
    reference aborts on an impossible decomposition.  With no keys set,
    the run auto-splits along grid-x over the largest device count whose
    shards divide both the ghost-padded field arrays and (binned engine)
    the slot grid; a single device — or no divisible count — yields None
    (unsharded run)."""
    devs = jax.devices()
    grid = cfg.grid
    req = [0, 0, 0]
    if control is not None:
        req = [int(getattr(control, "nprocx", 0) or 0),
               int(getattr(control, "nprocy", 0) or 0),
               int(getattr(control, "nprocz", 0) or 0)]

    def slot_nx():
        if cfg.engine != "binned":
            return grid.n[0]
        from ..core.binned import BinnedPlan
        return BinnedPlan(cfg).ns[0]

    def x_ok(n):
        # particle storage must shard (it dominates memory and compute);
        # ghost-padded field arrays shard only when (nx + 2*ng) also
        # divides — state_shardings falls back to replicating the ones
        # that don't, which is correct and cheap at field sizes
        return grid.n[0] % n == 0 and slot_nx() % n == 0

    if any(r > 0 for r in req[:grid.ndims]):
        shape = tuple(max(r, 1) for r in req[:min(grid.ndims, 2)])
        tot = int(np.prod(shape))
        if tot > len(devs):
            raise ValueError(
                f"deck requests nproc={tot} but only {len(devs)} "
                f"devices are available")
        if any(r > 0 for r in req[2:]) and grid.ndims >= 3:
            raise ValueError("nprocz decomposition is not supported — "
                             "use nprocx/nprocy (z stays on-device)")
        if tot == 1:
            return None
        if shape[1:] == (1,) or len(shape) == 1:
            return make_mesh(n_devices=shape[0])
        return make_mesh(shape=shape)
    if len(devs) <= 1:
        return None
    for n in range(len(devs), 1, -1):
        if x_ok(n):
            return make_mesh(n_devices=n)
    return None


def _grid_axes(mesh: Mesh):
    """Mesh axis name per grid dimension (x always; y if present)."""
    names = list(mesh.axis_names)
    out = []
    for nm in ("x", "y", "z"):
        out.append(nm if nm in names else None)
    return out


def state_shardings(state: SimState, mesh: Mesh, axis: str = "x"):
    """Build the sharding pytree for a SimState: fields along grid-x
    (and grid-y for a 2-D mesh), particle slabs along capacity (scatter)
    or spatially (binned), everything else replicated."""
    repl = NamedSharding(mesh, P())
    gaxes = _grid_axes(mesh)

    def divisible(shape, offset=0):
        """Mesh axes applicable to grid dims starting at ``offset``.
        NamedSharding needs even divisibility: pick nx ≡ −2·ng (mod
        n_dev) so the ghost-padded arrays shard (see grid.ng); axes that
        don't divide fall back to replication."""
        spec = [None] * offset
        for d in range(len(shape) - offset):
            ax = gaxes[d] if d < 3 else None
            if ax is not None and shape[offset + d] % mesh.shape[ax] == 0:
                spec.append(ax)
            else:
                spec.append(None)
        return tuple(spec)

    def field_like(arr):
        spec = divisible(arr.shape)
        if any(s is not None for s in spec):
            return NamedSharding(mesh, P(*spec))
        return repl

    fields = Fields(*[field_like(a) for a in state.fields])
    if state.cpml is not None:
        psi_sh = []
        for stack in state.cpml.psi:
            spec = divisible(stack.shape, offset=1)
            psi_sh.append(NamedSharding(mesh, P(*spec))
                          if any(s is not None for s in spec) else repl)
        cpml = CPMLState(psi=tuple(psi_sh))
    else:
        cpml = None

    n_first = mesh.shape[mesh.axis_names[0]]

    def slab_sharding(slab):
        if hasattr(slab, "xi"):
            # binned storage: spatial decomposition along the grid axes
            # (w is (K, *grid), xi/p are (nd|3, K, *grid)) — the direct
            # analogue of EPOCH's domain decomposition; rolls in the
            # binned kernels become collective-permutes over ICI
            spec_w = divisible(slab.w.shape, offset=1)
            if any(s is not None for s in spec_w):
                vec = NamedSharding(mesh, P(None, *spec_w))
                return type(slab)(
                    xi=vec, p=vec,
                    w=NamedSharding(mesh, P(*spec_w)),
                    n_dropped=repl,
                    aux=(vec if slab.aux is not None else None))
            return jax.tree.map(lambda _: repl, slab)
        if slab.cap % mesh.size == 0:
            # particle (capacity) decomposition over the whole mesh
            part = NamedSharding(
                mesh, P(tuple(mesh.axis_names)))
            return ParticleSlab(
                x=part, p=part, weight=part, alive=part, id=part,
                opdepth=part, opdepth_brem=part, opdepth_tri=part,
                pvol=part,
                work=part if slab.work is not None else None)
        return jax.tree.map(lambda _: repl, slab)

    species = tuple(slab_sharding(s) for s in state.species)
    lasers = jax.tree.map(lambda _: repl, state.lasers)
    bc_fields = jax.tree.map(lambda _: repl, state.bc_fields) \
        if state.bc_fields is not None else None
    return SimState(
        fields=fields, cpml=cpml, species=species, lasers=lasers,
        time=repl, step=repl, window_offset=repl, window_frac=repl,
        rng=repl, bc_fields=bc_fields,
        slab_dropped=repl if state.slab_dropped is not None else None,
        window_pending=repl if state.window_pending is not None else None,
        injector_depth=jax.tree.map(lambda _: repl, state.injector_depth),
        # staged refill columns are transverse-only (small): replicate
        window_refill=jax.tree.map(lambda _: repl, state.window_refill),
        probes=jax.tree.map(lambda _: repl, state.probes),
        probe_dropped=jax.tree.map(lambda _: repl, state.probe_dropped),
        ejected=jax.tree.map(lambda _: repl, state.ejected),
        fluid_grids=tuple(
            NamedSharding(mesh, P(None, *divisible(g.shape, offset=1)))
            if any(s is not None for s in divisible(g.shape, offset=1))
            else repl for g in state.fluid_grids))


def shard_state(state: SimState, mesh: Mesh, axis: str = "x") -> SimState:
    # carried halo side columns (BinnedSpecies.sides) are a single-
    # device fast path (binned.sides_carry_capable excludes meshes) and
    # derived data — drop them rather than invent shardings
    state = state._replace(species=tuple(
        s._replace(sides=None) if getattr(s, "sides", None) is not None
        else s for s in state.species))
    sh = state_shardings(state, mesh, axis)
    return jax.tree.map(
        lambda arr, s: jax.device_put(arr, s), state, sh,
        is_leaf=lambda x: x is None)


def make_sharded_step(cfg, mesh: Mesh, axis: str = "x", state=None,
                      example_state=None):
    """Jit the full step with state shardings pinned in AND out — without
    out_shardings GSPMD may leave outputs partially replicated (the 4×
    redundancy seen in round 1's dryrun)."""
    import dataclasses
    from ..core import step as step_mod
    # expose the mesh to the step builder: the fused Pallas push
    # shard_maps over it (parallel/spmd_push.py) since GSPMD cannot
    # partition a Pallas custom call
    cfg = dataclasses.replace(cfg, mesh=mesh)
    fns = step_mod.make_step_functions(cfg)

    def full(state):
        return fns["step_b_raw"](fns["step_a_raw"](state))

    ex = example_state if example_state is not None else state
    if ex is not None:
        sh = state_shardings(ex, mesh, axis)
        return jax.jit(full, in_shardings=(sh,), out_shardings=sh)
    return jax.jit(full)
