"""Simulation state pytrees.

The reference keeps all state in module-level globals
(``epoch2d/src/shared_data.F90``) and particles in per-species doubly-linked
lists (``housekeeping/partlist.F90``).  The TPU-native design replaces that
with one immutable pytree of device arrays:

* fields are dense arrays with ``ng`` ghost cells per side;
* each species is a fixed-capacity structure-of-arrays slab with a validity
  mask (dead slots have ``weight = 0``) — no dynamic allocation under jit;
* RNG is a counter-based ``jax.random`` key (reference: KISS generator,
  ``random_generator.f90``), saved in checkpoints for exact restart.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Fields(NamedTuple):
    """E, B and current J on the staggered grid (shared_data.F90:436-451)."""
    ex: jax.Array
    ey: jax.Array
    ez: jax.Array
    bx: jax.Array
    by: jax.Array
    bz: jax.Array
    jx: jax.Array
    jy: jax.Array
    jz: jax.Array


class CPMLState(NamedTuple):
    """CPML convolution memory (psi) arrays (shared_data.F90:419-428).

    One (psi_e, psi_b) pair per transverse field component and axis; we
    allocate the four 1d arrays (eyx, ezx, byx, bzx) generalised to a stack
    per axis: psi[axis] has shape (4, *padded) = (ey, ez, by, bz) convolution
    currents for that axis (2d/3d add the y/z-axis stacks).
    """
    psi: tuple  # tuple over axes of (4, *padded_shape) arrays


class ParticleSlab(NamedTuple):
    """Fixed-capacity SoA particle storage for one species.

    Replaces the linked ``particle_list`` (partlist.F90:154-166).  ``weight``
    doubles as the validity mask: dead slots have weight exactly 0 and take
    no part in deposition or diagnostics.
    """
    x: jax.Array       # (cap, ndims) absolute positions
    p: jax.Array       # (cap, 3) momenta [kg m/s]
    weight: jax.Array  # (cap,)
    alive: jax.Array   # (cap,) bool
    id: jax.Array      # (cap,) int64 (0 = unassigned)
    # optional per-particle optical depths etc. are added by physics packages
    opdepth: jax.Array        # (cap,) QED optical depth (photons.F90)
    opdepth_brem: jax.Array   # (cap,) bremsstrahlung optical depth
    # trident optical depth (TRIDENT_PHOTONS builds, photons.F90:502-572)
    opdepth_tri: jax.Array    # (cap,)
    # delta-f phase-space volume (particle%pvol, DELTAF_METHOD builds);
    # constant per particle after deltaf_load
    pvol: jax.Array           # (cap,)
    # WORK_DONE_INTEGRATED builds (shared_data.F90:117-125): per-step and
    # time-integrated field work per direction, columns
    # [work_x, work_y, work_z, work_x_total, work_y_total, work_z_total].
    # Allocated only when control work_done_integrated = T (None else).
    work: jax.Array = None    # (cap, 6) or None

    @property
    def cap(self) -> int:
        return self.x.shape[0]

    def count(self):
        return jnp.sum(self.alive)


class LaserState(NamedTuple):
    """Per-laser mutable state (laser_block, shared_data.F90:688-707)."""
    integral_phase: jax.Array   # (n_lasers,) current_integral_phase
    absorb_local: jax.Array     # scalar: Poynting flux absorbed at open bcs
    inject_local: jax.Array     # scalar: injected laser energy


class SimState(NamedTuple):
    fields: Fields
    cpml: CPMLState | None
    species: tuple            # tuple[ParticleSlab, ...]
    lasers: LaserState
    time: jax.Array           # scalar
    step: jax.Array           # scalar int
    window_offset: jax.Array  # cells shifted so far (moving window)
    window_frac: jax.Array    # fractional cell accumulator for window shift
    rng: jax.Array            # jax PRNG key
    # boundary field memory for Silver-Mueller outflow (setup.F90:373-381)
    bc_fields: dict | None = None
    # per-injector fractional emission accumulators
    # (injector_block%depth, injectors.F90:276-283)
    injector_depth: tuple = ()
    # per-probe capture buffers (particle_probe%sampled_particles,
    # shared_data.F90:391-404): fixed-capacity slabs filled by the pusher
    probes: tuple = ()
    # per-fluid-species EMA (temperature, density) grids for particle
    # migration (migrate%fluid_energy/fluid_density,
    # particle_migration.F90:90-113): stacked (2, *padded) arrays aligned
    # with MigrationPlan.fluid_species
    fluid_grids: tuple = ()
    # per-species ejected-particle buffers (ejected_list,
    # shared_data.F90:456; filled at open boundaries, boundary.F90:758-770;
    # dumped + cleared by the 'ejected_particles' output key)
    ejected: tuple = ()
    # total particles dropped by fixed-capacity slab appends (injectors,
    # window refill, ionise/QED/brems creation) — the reference's dynamic
    # lists cannot overflow, so a nonzero count is a capacity warning
    # surfaced at end of run (runner) and in dumps
    slab_dropped: jax.Array | None = None
    # moving window: 1 while a one-cell shift awaits consumption by the
    # next push's rebin (binned Pallas engines only — the rebin routing
    # performs the slot-grid roll for free; window._shift_once)
    window_pending: jax.Array | None = None
    # staged moving-window refill columns, one entry per species:
    # (w (K, n_t), xi (nd, K, n_t), p (3, K, n_t)) or None — consumed
    # in-kernel by the next push when window_pending is set
    # (window._shift_masked refill_in_kernel path)
    window_refill: tuple = ()
    # per-probe dropped-crossing counters (capture-cap top_k truncation +
    # probe-buffer append overflow); the reference keeps every crossing
    # (probes.F90:107), so a nonzero count is surfaced at end of run
    probe_dropped: tuple = ()


def zero_fields(padded_shape, dtype) -> Fields:
    z = lambda: jnp.zeros(padded_shape, dtype)
    return Fields(z(), z(), z(), z(), z(), z(), z(), z(), z())


def empty_slab(cap: int, ndims: int, dtype) -> ParticleSlab:
    return ParticleSlab(
        x=jnp.zeros((cap, ndims), dtype),
        p=jnp.zeros((cap, 3), dtype),
        weight=jnp.zeros((cap,), dtype),
        alive=jnp.zeros((cap,), bool),
        # int64 under x64 (PARTICLE_ID); silently int32 when x64 is off
        id=jnp.zeros((cap,), jnp.int64),
        opdepth=jnp.zeros((cap,), dtype),
        opdepth_brem=jnp.zeros((cap,), dtype),
        opdepth_tri=jnp.zeros((cap,), dtype),
        pvol=jnp.zeros((cap,), dtype),
    )
