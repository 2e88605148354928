"""Typed configuration blocks produced by the deck reader.

Mirrors the per-block handler modules of the reference
(``epoch2d/src/deck/deck_*_block.f90``) as plain dataclasses.  Values that the
reference stores as tokenized expression stacks are kept as
:class:`~epoch_tpu.deck.expr.Expression` objects and evaluated lazily (on the
grid, per step for time-varying ones).
"""
from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import Optional

from .. import constants as const
from .expr import Expression

BC_NAMES = {
    "periodic": const.BC.PERIODIC,
    "simple_laser": const.BC.SIMPLE_LASER,
    "simple_outflow": const.BC.SIMPLE_OUTFLOW,
    "open": const.BC.OPEN,
    "reflect": const.BC.REFLECT,
    "conduct": const.BC.CONDUCT,
    "thermal": const.BC.THERMAL,
    "cpml_laser": const.BC.CPML_LASER,
    "cpml_outflow": const.BC.CPML_OUTFLOW,
    "heat_bath": const.BC.HEAT_BATH,
    "clamp": const.BC.CLAMP,
    "zero_gradient": const.BC.ZERO_GRADIENT,
}

MAXWELL_SOLVER_NAMES = {
    "yee": const.MaxwellSolver.YEE,
    "lehe": const.MaxwellSolver.LEHE,
    "lehe_x": const.MaxwellSolver.LEHE_X,
    "lehe_y": const.MaxwellSolver.LEHE_Y,
    "lehe_z": const.MaxwellSolver.LEHE_Z,
    "cowan": const.MaxwellSolver.COWAN,
    "pukhov": const.MaxwellSolver.PUKHOV,
    "custom": const.MaxwellSolver.CUSTOM,
}

SHAPE_NAMES = {
    "tophat": const.Shape.TOPHAT,
    "triangle": const.Shape.TRIANGLE,
    "bspline3": const.Shape.BSPLINE3,
}


@dataclass
class ControlBlock:
    """deck_control_block.F90 key list (subset growing towards parity)."""
    nx: int = 0
    ny: int = 1
    nz: int = 1
    t_end: float = float("inf")
    nsteps: int = -1
    x_min: float = 0.0
    x_max: float = 0.0
    y_min: float = 0.0
    y_max: float = 0.0
    z_min: float = 0.0
    z_max: float = 0.0
    dt_multiplier: float = 0.95          # setup.F90:76
    field_order: int = 2
    maxwell_solver: const.MaxwellSolver = const.MaxwellSolver.YEE
    stdout_frequency: int = 0
    use_random_seed: bool = False
    random_seed: int = 0
    smooth_currents: bool = False
    smooth_iterations: int = 1
    smooth_compensation: bool = False
    smooth_strides: tuple = ()
    use_higuera_cary: bool = False       # HC_PUSH define -> runtime key
    # WORK_DONE_INTEGRATED define -> runtime key: per-particle field-work
    # tracking (particles.F90:396-411)
    work_done_integrated: bool = False
    use_balance: bool = False
    dlb_threshold: float = 0.0
    balance_first: bool = True
    npart: int = -1                       # global particle count hint
    nprocx: int = 0
    nprocy: int = 0
    nprocz: int = 0
    restart_snapshot: Optional[str] = None
    field_ionisation: bool = False
    use_multiphoton: bool = True
    use_bsi: bool = True
    particle_tstart: float = 0.0
    use_exact_restart: bool = False
    allow_cpu_reduce: bool = True
    check_stop_frequency: int = 10
    # debug sanitizer: per-step field finiteness checks (the runtime
    # analogue of the reference debug build's -ffpe-trap, Makefile:92-99)
    use_nan_check: bool = False
    stop_at_walltime: float = -1.0
    simplify_deck: bool = True
    print_constants: bool = False
    use_current_correction: bool = False
    use_migration: bool = False           # particle_migration.F90
    migration_interval: int = 1
    npart_per_cell_min: int = 5           # split threshold (split_particle.F90:24)
    window_injectors: bool = False
    use_more_setup_memory: bool = False
    # --- TPU-framework extensions (not in the reference deck language) ---
    particle_shape: const.Shape = const.Shape.TRIANGLE  # compile-time in ref
    precision: str = "double"          # 'double' | 'single' (TPU perf mode)
    n_zeros: int = 4
    pusher: str = "auto"               # 'auto' | 'binned' | 'scatter'
    bin_headroom: float = 2.0          # slot capacity / mean ppc (binned)
    # slot-overflow policy (binned): "drop" counts & discards particles
    # beyond a cell's K slots (the default; loud in the runner);
    # "merge" folds them into the cell's last slot conserving weight,
    # charge and momentum (weighted-mean position/momentum — standard
    # PIC particle-merging, kinetic energy not conserved)
    bin_overflow: str = "drop"


@dataclass
class BoundariesBlock:
    """deck_boundaries_block.f90; defaults from setup.F90:78-81."""
    bc_field: list = dfield(default_factory=lambda: [const.BC.PERIODIC] * 6)
    bc_particle: list = dfield(default_factory=lambda: [const.BC.PERIODIC] * 6)
    cpml_thickness: int = 6
    cpml_kappa_max: float = 20.0
    cpml_a_max: float = 0.15
    cpml_sigma_max: float = 0.7


@dataclass
class SpeciesBlock:
    """deck_species_block.F90 (~90 keys; common set here)."""
    name: str = ""
    charge: float = 0.0                  # units of |q0| in deck; stored SI
    mass: float = 0.0                    # units of m0 in deck; stored SI
    npart: int = -1                      # 'nparticles' / 'npart'
    # 'frac'/'fraction' of the control-level npart
    # (deck_species_block.F90:550-558); resolved in _finalise
    fraction: float = -1.0
    npart_per_cell: float = -1.0
    density: Optional[Expression] = None
    density_layers: list = dfield(default_factory=list)
    density_min: float = 0.0             # EPOCH default: no minimum
    density_max: float = -1.0            # <0 → unlimited
    temp: list = dfield(default_factory=lambda: [None, None, None])   # K
    drift: list = dfield(default_factory=lambda: [None, None, None])  # kg m/s
    immobile: bool = False
    zero_current: bool = False           # 'zero_current' / tracer species
    species_type: const.SpeciesType = const.SpeciesType.STANDARD
    identify: str = ""
    bc_particle: list = dfield(default_factory=lambda: [None] * 6)
    dumpmask: int = int(const.IOType.ALWAYS)
    atomic_number: int = 0
    ionisation_energies: list = dfield(default_factory=list)
    ionise_to_species: list = dfield(default_factory=list)
    electron_species: list = dfield(default_factory=list)
    background_density: Optional[Expression] = None
    # delta-f background (initial_conditions%*_back, DELTAF_METHOD)
    density_back: float = 0.0
    density_back_expr: Optional[Expression] = None  # deferred species refs
    temp_back: list = dfield(default_factory=lambda: [0.0, 0.0, 0.0])
    drift_back: list = dfield(default_factory=lambda: [0.0, 0.0, 0.0])
    split: bool = False           # pseudo-particle splitting (split_particle.F90)
    npart_max: int = -1           # split cap on global particle count
    # per-species slot-grid headroom (binned engine): overrides the
    # control-level bin_headroom AND the growth-target sizing rule —
    # lets a deck shrink static species (fixed ions) or grow
    # accumulating ones (cascade photons) independently
    bin_headroom: float = 0.0     # 0 = inherit control.bin_headroom
    migrate: bool = False
    promote_to: str = ""
    demote_to: str = ""
    promote_multiplier: float = 1.0
    demote_multiplier: float = 1.0
    promote_density: float = float("inf")
    demote_density: float = 0.0
    fill_ghosts: bool = False
    ext_temp_x_min: list = dfield(default_factory=lambda: [0.0, 0.0, 0.0])
    ext_temp_x_max: list = dfield(default_factory=lambda: [0.0, 0.0, 0.0])
    ext_temp_y_min: list = dfield(default_factory=lambda: [0.0, 0.0, 0.0])
    ext_temp_y_max: list = dfield(default_factory=lambda: [0.0, 0.0, 0.0])
    # --- ionisation chain wiring (deck_species_block.F90:301-341) ---
    ionise: bool = False
    ionisation_energy: float = 0.0
    ionise_to_species_name: str = ""
    release_species_name: str = ""
    principal_n: int = 1
    l_quantum: int = 0
    use_maxwell_juettner: bool = False
    fractional_tail_cutoff: float = 20.0
    # arbitrary momentum distribution (deck_species_block.F90:859-886):
    # accept-reject on dist_fn over the dist_fn_p*_range boxes
    dist_fn: Optional[Expression] = None
    dist_fn_ranges: list = dfield(
        default_factory=lambda: [None, None, None])


@dataclass
class LaserBlock:
    """deck_laser_block.f90 + laser.f90:25-47 defaults."""
    boundary: int = const.BD_X_MIN
    amp: float = -1.0
    omega: float = -1.0
    omega_expr: Optional[Expression] = None
    omega_func_type: str = "omega"       # 'omega' | 'freq' | 'lambda'
    pol_angle: float = 0.0
    phase: Optional[Expression] = None
    t_profile: Optional[Expression] = None
    profile: Optional[Expression] = None
    t_start: float = 0.0
    t_end: float = float("inf")
    id: int = -1


@dataclass
class FieldsBlock:
    """begin:fields — initial field expressions (deck_fields_block)."""
    ex: Optional[Expression] = None
    ey: Optional[Expression] = None
    ez: Optional[Expression] = None
    bx: Optional[Expression] = None
    by: Optional[Expression] = None
    bz: Optional[Expression] = None
    offset: int = 0


@dataclass
class WindowBlock:
    """deck_window_block.f90."""
    move_window: bool = False
    window_v_x: Optional[Expression] = None
    window_start_time: float = 0.0
    window_stop_time: float = float("inf")
    bc_x_min_after_move: Optional[const.BC] = None
    bc_x_max_after_move: Optional[const.BC] = None


@dataclass
class OutputBlock:
    """deck_io_block.F90 (~110 variable keys; stored as dumpmask dict)."""
    name: str = "normal"
    file_prefix: str = ""
    dt_snapshot: float = -1.0
    nstep_snapshot: int = -1
    dump_first: bool = True
    dump_last: bool = True
    dump_at_times: list = dfield(default_factory=list)
    dump_at_nsteps: list = dfield(default_factory=list)
    dump_cycle: int = 0
    restart_dump_every: int = -1
    full_dump_every: int = -1
    force_final_to_be_restartable: bool = False
    rolling_restart: bool = False
    time_start: float = 0.0
    time_stop: float = float("inf")
    nstep_start: int = 0
    nstep_stop: int = 2 ** 62
    dt_average: float = -1.0
    nstep_average: int = -1
    # walltime-driven cadences (deck_io_block.F90:498-510): fire a dump
    # every walltime_interval seconds of elapsed wall-clock within
    # [walltime_start, walltime_stop], plus one-shot dump_at_walltimes
    walltime_interval: float = -1.0
    walltime_start: float = 0.0
    walltime_stop: float = float("inf")
    dump_at_walltimes: list = dfield(default_factory=list)
    dump_first_after_restart: bool = False
    disabled: bool = False
    # variable name → dumpmask bits
    variables: dict = dfield(default_factory=dict)


@dataclass
class DistFnBlock:
    """deck_dist_fn_block.f90."""
    name: str = ""
    ndims: int = 1
    dumpmask: int = int(const.IOType.ALWAYS)
    directions: list = dfield(default_factory=list)    # Direction codes
    ranges: list = dfield(default_factory=list)        # (lo, hi) pairs
    resolutions: list = dfield(default_factory=list)
    include_species: list = dfield(default_factory=list)
    restrictions: dict = dfield(default_factory=dict)  # dir → (lo, hi)
    output_deltaf: bool = False


@dataclass
class StencilBlock:
    """deck_stencil_block.f90 — custom Maxwell stencil coefficients."""
    betaxy: float = 0.0
    betayx: float = 0.0
    betaxz: float = 0.0
    betazx: float = 0.0
    betayz: float = 0.0
    betazy: float = 0.0
    gammax: float = 0.0
    gammay: float = 0.0
    gammaz: float = 0.0
    deltax: float = 0.0
    deltay: float = 0.0
    deltaz: float = 0.0
    dt: float = -1.0


@dataclass
class ProbeBlock:
    """deck_particle_probe_block.F90."""
    name: str = ""
    point: list = dfield(default_factory=list)
    normal: list = dfield(default_factory=list)
    ek_min: float = 0.0
    ek_max: float = float("inf")
    include_species: list = dfield(default_factory=list)
    dumpmask: int = int(const.IOType.ALWAYS)


@dataclass
class SubsetBlock:
    """deck_subset_block.F90."""
    name: str = ""
    include_species: list = dfield(default_factory=list)
    random_fraction: float = 1.0
    # per-axis grid-variable strides (deck `skip = n` → stride n+1,
    # deck_subset_block.F90:292-311); () ⇒ no striding
    skip: tuple = ()
    # dumpmask bit this subset's name contributes in io-block variable
    # masks (`ex = always + <subset>`); 0 when never referenced
    mask_bit: int = 0
    space_box: dict = dfield(default_factory=dict)   # axis → (lo, hi)
    ranges: dict = dfield(default_factory=dict)      # var → (lo, hi)
    restriction: Optional[Expression] = None
    persist_start_time: Optional[float] = None
    persist_start_step: Optional[int] = None
    dumpmask: int = int(const.IOType.ALWAYS)


@dataclass
class InjectorBlock:
    """deck_injector_block.f90."""
    boundary: int = const.BD_X_MIN
    species: str = ""
    npart_per_cell: float = -1.0
    density: Optional[Expression] = None
    density_layers: list = dfield(default_factory=list)
    density_min: float = 0.0
    temp: list = dfield(default_factory=lambda: [None, None, None])
    drift: list = dfield(default_factory=lambda: [None, None, None])
    use_flux_injector: bool = True
    t_start: float = 0.0
    t_end: float = float("inf")


@dataclass
class CollisionsBlock:
    """deck_collision_block.f90."""
    use_collisions: bool = False
    coulomb_log: float = -1.0            # <0 → auto
    collide_all: bool = True
    collide_pairs: dict = dfield(default_factory=dict)
    collisional_ionisation: bool = False
    use_nanbu: bool = True               # default Nanbu-Perez


@dataclass
class QEDBlock:
    """deck_qed_block.f90."""
    use_qed: bool = False
    qed_start_time: float = 0.0
    produce_photons: bool = False
    photon_energy_min: float = 0.0
    produce_pairs: bool = False
    photon_dynamics: bool = False
    qed_table_location: str = ""
    use_radiation_reaction: bool = True
    # TRIDENT_PHOTONS define -> runtime key (photons.F90:502-572)
    use_trident: bool = False


@dataclass
class PartFromFileBlock:
    """begin:particles_from_file (deck_part_from_file_block.F90): bulk
    particle arrays from raw binary files of float64 records; ``offset``
    applies to the *_data files declared after it."""
    species: str = ""
    x_data: str = ""
    y_data: str = ""
    z_data: str = ""
    px_data: str = ""
    py_data: str = ""
    pz_data: str = ""
    w_data: str = ""
    id_data: str = ""
    id_4byte: bool = False
    offsets: dict = dfield(default_factory=dict)   # key -> byte offset


@dataclass
class BremsstrahlungBlock:
    use_bremsstrahlung: bool = False
    start_time: float = 0.0
    produce_photons: bool = False
    photon_energy_min: float = 0.0
    photon_weight: float = 1.0
    photon_dynamics: bool = False
    use_plasma_screening: bool = False
    use_radiation_reaction: bool = True
    table_location: str = ""
