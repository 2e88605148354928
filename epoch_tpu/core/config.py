"""Static simulation configuration.

Everything that is compile-time constant for a run: grid geometry, boundary
condition codes, solver coefficients, species metadata, laser descriptors and
precomputed CPML profiles.  The config is closed over when building the
jitted step function (the JAX analogue of the reference's compile-time
defines + module globals, shared_data.F90).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field as dfield
from typing import Any, Callable, Optional

import numpy as np

from .. import constants as const
from ..deck.deck import DeckConfig
from .grid import Grid, make_grid


@dataclass(frozen=True)
class SpeciesConfig:
    name: str
    charge: float           # SI
    mass: float             # SI
    cap: int                # slab capacity
    immobile: bool = False
    zero_current: bool = False
    species_type: const.SpeciesType = const.SpeciesType.STANDARD
    bc_particle: tuple = ()
    npart: int = -1
    npart_per_cell: float = -1.0
    ext_temp: tuple = ()    # ((lo,hi) per axis) of 3-vectors, thermal bcs
    # delta-f background (density_back, (Tx,Ty,Tz)[K], (px,py,pz) drifts);
    # None disables the method for this species (DELTAF_METHOD)
    deltaf: Any = None


@dataclass(frozen=True)
class LaserConfig:
    """Static laser descriptor; profile/phase/time functions are jittable
    callables built from deck expressions (laser.f90, deck_laser_block.f90)."""
    boundary: int
    amp: float
    omega: float
    pol_angle: float
    t_start: float
    t_end: float
    # callables (time, transverse_coords) -> value; None means constant 1/0
    t_profile: Optional[Callable] = None
    profile: Optional[Callable] = None
    phase: Optional[Callable] = None
    omega_fn: Optional[Callable] = None


@dataclass(frozen=True)
class StencilCoeffs:
    """Maxwell solver cross-term coefficients (fields.f90:50-100)."""
    alpha: tuple = (1.0, 1.0, 1.0)
    beta: tuple = ((0.0, 0.0), (0.0, 0.0), (0.0, 0.0))  # beta[a][transverse]
    delta: tuple = (0.0, 0.0, 0.0)


class FieldAux:
    """Precomputed per-axis profiles for the field solver (numpy, static)."""

    def __init__(self):
        self.ikappa_e = {}    # axis -> 1/kappa at E-locations (padded,)
        self.ikappa_b = {}
        self.cpml_be = {}     # axis -> bcoeff for E psi update
        self.cpml_ce = {}     # axis -> ccoeff_d for E psi update
        self.cpml_bb = {}
        self.cpml_cb = {}


@dataclass(frozen=True)
class SimConfig:
    grid: Grid
    dt: float
    t_end: float
    nsteps: int
    bc_field: tuple
    bc_particle: tuple
    species: tuple           # tuple[SpeciesConfig, ...]
    lasers: tuple            # tuple[LaserConfig, ...]
    field_order: int = 2
    maxwell_solver: const.MaxwellSolver = const.MaxwellSolver.YEE
    stencil: StencilCoeffs = StencilCoeffs()
    dtype: Any = np.float64
    smooth_currents: bool = False
    # Higuera-Cary momentum update instead of Boris (HC_PUSH define,
    # particles.F90:308-320)
    use_higuera_cary: bool = False
    # WORK_DONE_INTEGRATED define -> runtime key (particles.F90:396-411):
    # per-particle E-field work per direction, step + time-integrated
    work_done_integrated: bool = False
    smooth_iterations: int = 1
    smooth_compensation: bool = False
    cpml_kappa_max: float = 20.0
    cpml_a_max: float = 0.15
    cpml_sigma_max: float = 0.7
    aux: Any = None          # FieldAux (precomputed numpy profiles)
    move_window: bool = False
    window_v_x: Optional[Callable] = None
    window_start_time: float = 0.0
    window_stop_time: float = math.inf
    window_plans: tuple = ()   # per-species insertion plans (window.py)
    # particle engine: 'scatter' (general, any BCs) or 'binned' (dense
    # cell-slot grid — the TPU hot path, core/binned.py; see
    # sim._select_engine for the supported feature set)
    engine: str = "scatter"
    bin_k: int = 0             # max slots per cell (binned engine)
    bin_k_sp: tuple = ()       # per-species K (kernel/tail cost ∝ K)
    bin_overflow: str = "drop"  # slot-overflow policy: drop | merge
    # per-particle auxiliary rows on the binned engine (optical depths for
    # QED / bremsstrahlung / trident; subset of
    # ("opdepth", "opdepth_brem", "opdepth_tri"))
    binned_aux: tuple = ()
    use_current_correction: bool = False
    initial_currents: Any = None   # (jx0, jy0, jz0) padded arrays or None
    injector_plans: tuple = ()     # InjectorPlan per deck injector block
    ionise_plan: Any = None        # physics.ionise.IonisePlan or None
    collision_plan: Any = None     # physics.collisions.CollisionPlan or None
    qed_plan: Any = None           # physics.qed.QEDPlan or None
    brem_plan: Any = None          # physics.bremsstrahlung.BremPlan or None
    split_plan: Any = None         # housekeeping.SplitPlan or None
    migration_plan: Any = None     # housekeeping.MigrationPlan or None
    track_ejected: bool = False    # 'ejected_particles' output requested
    dump_absorption: bool = False  # 'absorption' output requested
    probe_plans: tuple = ()        # per-probe static descriptors
    particle_push_start_time: float = 0.0
    # delayed-window-start BC swap (window.F90:358-368): the full
    # post-move bc_field tuple, or None when no swap is pending; the
    # host loop re-builds the step set from it when the window starts
    bc_field_after_move: Any = None
    deck: Any = None         # original DeckConfig (host-side only)
    # device mesh for multi-chip runs (jax.sharding.Mesh) — the analogue
    # of the reference's MPI communicator (mpi_routines.F90:44-172); set
    # by make_sharded_step / the runner's decomposition.  The fused
    # Pallas push shard_maps over the "x" axis when present.
    mesh: Any = None

    @property
    def ndims(self) -> int:
        return self.grid.ndims

    @property
    def any_cpml(self) -> bool:
        return any(self.cpml_active)

    @property
    def cpml_active(self):
        return self.grid.cpml_active

    @property
    def fng(self) -> int:
        # the lehe stencil reaches one extra cell; the reference forces
        # fng = 2 for it regardless of field_order
        # (deck_control_block.F90:114-116) — this offsets the cpml_laser
        # source row (boundary.F90:896) and the outflow anchor cells
        # (setup.F90:369-370)
        if self.maxwell_solver in (const.MaxwellSolver.LEHE,
                                   const.MaxwellSolver.LEHE_X,
                                   const.MaxwellSolver.LEHE_Y,
                                   const.MaxwellSolver.LEHE_Z):
            return max(self.field_order // 2, 2)
        return self.field_order // 2

    def lasers_on(self, bd: int):
        return tuple(l for l in self.lasers if l.boundary == bd)

    def needs_outflow_bcs(self, bd: int) -> bool:
        """True when boundary bd runs the Silver-Müller outflow solve
        (bfield_final_bcs, boundary.F90:574-595: add_laser OR
        simple_outflow; add_laser is set for simple_laser boundaries
        (boundary.F90:48-50) and for cpml_laser rows
        (boundary.F90:896-900))."""
        bc = self.bc_field[bd]
        if bc in (const.BC.SIMPLE_LASER, const.BC.SIMPLE_OUTFLOW):
            return True
        if bc == const.BC.CPML_LASER:
            return True
        return False


def solver_coefficients(solver, stencil_block, grid: Grid, dt: float) -> StencilCoeffs:
    """Dispersion-improved solver coefficients.

    1d: fields.f90:50-72 (lehe_x); 2d: epoch2d/src/fields.f90:50-88
    (lehe_x/lehe_y/pukhov); custom from the deck stencil block.
    """
    d = grid.delta
    nd = grid.ndims
    beta = [[0.0] * max(nd - 1, 1) for _ in range(3)]
    delta = [0.0, 0.0, 0.0]
    alpha = [1.0, 1.0, 1.0]

    def lehe_delta(ax):
        dx_cdt = d[ax] / (const.c * dt)
        return 0.25 * (1.0 - dx_cdt ** 2 * math.sin(0.5 * math.pi / dx_cdt) ** 2)

    if solver == const.MaxwellSolver.CUSTOM and stencil_block is not None:
        sb = stencil_block
        delta = [sb.deltax, sb.deltay, sb.deltaz]
        if nd == 1:
            alpha[0] = 1.0 - 3.0 * sb.deltax
        elif nd == 2:
            beta[0] = [sb.betaxy]
            beta[1] = [sb.betayx]
            alpha[0] = 1.0 - 2.0 * sb.betaxy - 3.0 * sb.deltax
            alpha[1] = 1.0 - 2.0 * sb.betayx - 3.0 * sb.deltay
        else:
            beta[0] = [sb.betaxy, sb.betaxz]
            beta[1] = [sb.betayx, sb.betayz]
            beta[2] = [sb.betazx, sb.betazy]
            alpha[0] = 1.0 - 2.0 * sb.betaxy - 2.0 * sb.betaxz - 3.0 * sb.deltax
            alpha[1] = 1.0 - 2.0 * sb.betayx - 2.0 * sb.betayz - 3.0 * sb.deltay
            alpha[2] = 1.0 - 2.0 * sb.betazx - 2.0 * sb.betazy - 3.0 * sb.deltaz
    elif solver == const.MaxwellSolver.LEHE_X or \
            (solver == const.MaxwellSolver.LEHE and nd == 1):
        if nd == 1:
            delta[0] = lehe_delta(0)
            alpha[0] = 1.0 - 3.0 * delta[0]
        elif nd == 2:
            beta[0] = [0.125 * (d[0] / d[1]) ** 2]
            beta[1] = [0.125]
            delta[0] = lehe_delta(0)
            alpha[0] = 1.0 - 2.0 * beta[0][0] - 3.0 * delta[0]
            alpha[1] = 1.0 - 2.0 * beta[1][0]
        else:
            beta[0] = [0.125 * (d[0] / d[1]) ** 2, 0.125 * (d[0] / d[2]) ** 2]
            beta[1] = [0.125, 0.0]
            beta[2] = [0.125, 0.0]
            delta[0] = lehe_delta(0)
            alpha[0] = 1.0 - 2.0 * sum(beta[0]) - 3.0 * delta[0]
            alpha[1] = 1.0 - 2.0 * sum(beta[1])
            alpha[2] = 1.0 - 2.0 * sum(beta[2])
    elif solver == const.MaxwellSolver.LEHE_Y and nd >= 2:
        beta[1] = [0.125 * (d[1] / d[0]) ** 2] + ([0.125 * (d[1] / d[2]) ** 2] if nd == 3 else [])
        beta[0] = [0.125] + ([0.0] if nd == 3 else [])
        if nd == 3:
            beta[2] = [0.0, 0.125]
        delta[1] = lehe_delta(1)
        alpha[0] = 1.0 - 2.0 * sum(beta[0])
        alpha[1] = 1.0 - 2.0 * sum(beta[1]) - 3.0 * delta[1]
        if nd == 3:
            alpha[2] = 1.0 - 2.0 * sum(beta[2])
    elif solver in (const.MaxwellSolver.PUKHOV, const.MaxwellSolver.COWAN) and nd >= 2:
        dmin = min(d)
        for a in range(nd):
            beta[a] = [0.125 * (dmin / d[t]) ** 2
                       for t in range(nd) if t != a]
            alpha[a] = 1.0 - 2.0 * sum(beta[a])
    # YEE: defaults
    return StencilCoeffs(alpha=tuple(alpha),
                         beta=tuple(tuple(b) for b in beta),
                         delta=tuple(delta))


def cfl_limit(field_order: int) -> float:
    """fields.f90:38-45."""
    if field_order == 2:
        return 1.0
    if field_order == 4:
        return 6.0 / 7.0
    return 120.0 / 149.0


def build_cpml_profiles(cfg_grid: Grid, bc_field, kappa_max, a_max, sigma_max,
                        field_order: int) -> FieldAux:
    """CPML grading profiles (boundary.F90:815-966, Roden & Gedney).

    kappa/sigma/a use m=3, ma=1 polynomial grading over the cpml_thickness
    cells adjacent to each CPML boundary; E-locations sample integer cells,
    B-locations the half-shifted ones.
    """
    aux = FieldAux()
    ng = cfg_grid.ng
    thick = cfg_grid.cpml_thickness
    m, ma = 3, 1
    for d in range(cfg_grid.ndims):
        n = cfg_grid.n[d]
        npad = n + 2 * ng
        dxd = cfg_grid.delta[d]
        kappa_e = np.ones(npad)
        kappa_b = np.ones(npad)
        sigma_e = np.zeros(npad)
        sigma_b = np.zeros(npad)
        a_e = np.zeros(npad)
        a_b = np.zeros(npad)
        sigma_maxval = sigma_max * const.c * 0.8 * (m + 1.0) / dxd
        lo_active = bc_field[2 * d] in const.CPML_BCS
        hi_active = bc_field[2 * d + 1] in const.CPML_BCS

        def grade(pos):  # pos in [0,1]: 1 at outer edge -> 0 at inner edge
            xm = pos ** m
            return (1.0 + (kappa_max - 1.0) * xm,
                    sigma_maxval * xm,
                    a_max * (1.0 - pos) ** ma)

        if lo_active and thick > 0:
            for f in range(1, thick + 1):       # Fortran cell index 1..thick
                p = f + ng - 1
                pos = 1.0 - (f - 1) / thick
                kappa_e[p], sigma_e[p], a_e[p] = grade(pos)
                pos_h = 1.0 - (f - 0.5) / thick
                kappa_b[p], sigma_b[p], a_b[p] = grade(pos_h)
        if hi_active and thick > 0:
            for f in range(n - thick + 1, n + 1):   # Fortran n-thick+1..n
                p = f + ng - 1
                gi = n - f + 1                       # runs thick..1
                pos = 1.0 - (gi - 1) / thick
                kappa_e[p], sigma_e[p], a_e[p] = grade(pos)
                pos_h = 1.0 - (gi - 0.5) / thick
                # B-profile stored at ix-1 (boundary.F90:949-951)
                kappa_b[p - 1], sigma_b[p - 1], a_b[p - 1] = grade(pos_h)

        aux.ikappa_e[d] = 1.0 / kappa_e
        aux.ikappa_b[d] = 1.0 / kappa_b

        def psi_coeffs(kappa, sigma, a, tstep):
            b = np.exp(-(sigma / kappa + a) * tstep)
            denom = (sigma + kappa * a) * dxd
            with np.errstate(divide="ignore", invalid="ignore"):
                cc = np.where(denom != 0.0,
                              (b - 1.0) * sigma / kappa / np.where(denom == 0, 1, denom),
                              0.0)
            return b, cc

        # tstep for the psi updates is hdt = dt/2; filled at finalize time
        aux.cpml_be[d] = (kappa_e, sigma_e, a_e)
        aux.cpml_bb[d] = (kappa_b, sigma_b, a_b)
    return aux


def cpml_psi_coeffs(aux: FieldAux, d: int, which: str, tstep: float, dxd: float):
    """b/c coefficient arrays for the psi recursion at timestep ``tstep``
    (boundary.F90:998-1106)."""
    kappa, sigma, a = (aux.cpml_be if which == "e" else aux.cpml_bb)[d]
    b = np.exp(-(sigma / kappa + a) * tstep)
    denom = (sigma + kappa * a) * dxd
    cc = np.where(denom != 0.0,
                  (b - 1.0) * sigma / kappa / np.where(denom == 0.0, 1.0, denom),
                  0.0)
    return b, cc
