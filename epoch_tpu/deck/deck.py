"""Input-deck reader.

Re-implements the reference deck front-end (``epoch2d/src/deck/deck.F90``):
``begin:block``/``end:block`` sections of ``element = value`` lines, ``#``
comments, ``\\`` line continuations, recursive ``import:`` includes and the
two-pass structure (names/geometry first, expressions after allocation).
The deck format is preserved verbatim so existing EPOCH decks run unchanged.
"""
from __future__ import annotations

import logging
import os
import re
from dataclasses import dataclass, field as dfield

from .. import constants as const
from . import blocks as B
from .expr import DUMPMASK_WORDS, Expression, DeckExprError


@dataclass
class RawBlock:
    name: str
    elements: list  # [(element, value), ...]


# the reference's io-block variable vocabulary (deck_io_block.F90 element
# handlers; scalar/cadence keys are parsed separately above this set) —
# used to distinguish "valid EPOCH key this framework does not write yet"
# from a genuinely unknown key when warning
REF_IO_VARIABLES = frozenset("""
absorption average_particle_energy average_px average_py average_pz
average_weight averaging_period bremsstrahlung_optical_depth bx by bz
charge charge_density cpml_psi_bxy cpml_psi_byx cpml_psi_bzx cpml_psi_bzy
cpml_psi_exy cpml_psi_eyx cpml_psi_ezx cpml_psi_ezy distribution_functions
dump_input_decks dump_source_code ejected_particles ek ekbar ekflux ex
extended_io_file ey ez field_grid gamma grid id jx jy jz mass mass_density
min_cycles_per_average number_density optical_depth particle_energy
particle_energy_flux particle_grid particle_probes particle_weight
particles particles_per_cell poynt_flux poynting_flux ppc px py pz
qed_energy relativistic_mass rest_mass restartable species_id temp temp_x
temp_y temp_z temperature temperature_x temperature_y temperature_z
total_energy_sum trident_optical_depth tx ty tz use_offset_grid vx vy vz
weight work_x work_x_total work_y work_y_total work_z work_z_total
dump_final force_first_to_be_restartable force_last_to_be_restartable
dump_cycle_first_index filesystem current_density
""".split())


def _known_output_variable(el: str) -> bool:
    """True when the io.diagnostics writer implements this variable key."""
    from ..io.diagnostics import (FIELD_VARS, DERIVED_VARS, VAR_EXPANSIONS,
                                  PARTICLE_VARS, EXTRA_OUTPUT_KEYS)
    return (el in FIELD_VARS or el in DERIVED_VARS or el in VAR_EXPANSIONS
            or el in PARTICLE_VARS or el in EXTRA_OUTPUT_KEYS)


def read_deck_lines(path: str) -> list[RawBlock]:
    """Tokenise a deck file into raw blocks, following ``import:``s."""
    out: list[RawBlock] = []
    stack: list[RawBlock] = []
    base = os.path.dirname(os.path.abspath(path))

    def handle_file(p):
        with open(p) as f:
            buf = ""
            for raw in f:
                line = raw.split("#", 1)[0].strip()
                if not line:
                    continue
                if line.endswith("\\"):
                    buf += line[:-1] + " "
                    continue
                line = buf + line
                buf = ""
                _handle_line(line, p)

    def _handle_line(line, cur_path):
        low = line.lower()
        if low.startswith("begin:"):
            name = line.split(":", 1)[1].strip().lower()
            stack.append(RawBlock(name, []))
            return
        if low.startswith("end:"):
            if stack:
                out.append(stack.pop())
            return
        if low.startswith("import:"):
            sub = line.split(":", 1)[1].strip()
            handle_file(os.path.join(base, sub))
            return
        if "=" in line:
            el, val = line.split("=", 1)
            el, val = el.strip(), val.strip()
        elif ":" in line:
            el, val = line.split(":", 1)
            el, val = el.strip(), val.strip()
        else:
            el, val = line, ""
        if stack:
            stack[-1].elements.append((el, val))

    handle_file(path)
    return out


@dataclass
class DeckConfig:
    """Fully parsed deck: the entire runtime configuration surface."""
    control: B.ControlBlock = dfield(default_factory=B.ControlBlock)
    boundaries: B.BoundariesBlock = dfield(default_factory=B.BoundariesBlock)
    species: list = dfield(default_factory=list)
    lasers: list = dfield(default_factory=list)
    fields: B.FieldsBlock = dfield(default_factory=B.FieldsBlock)
    window: B.WindowBlock = dfield(default_factory=B.WindowBlock)
    outputs: list = dfield(default_factory=list)
    dist_fns: list = dfield(default_factory=list)
    stencil: B.StencilBlock | None = None
    probes: list = dfield(default_factory=list)
    subsets: list = dfield(default_factory=list)
    injectors: list = dfield(default_factory=list)
    part_from_file: list = dfield(default_factory=list)
    collisions: B.CollisionsBlock = dfield(default_factory=B.CollisionsBlock)
    qed: B.QEDBlock = dfield(default_factory=B.QEDBlock)
    bremsstrahlung: B.BremsstrahlungBlock = dfield(default_factory=B.BremsstrahlungBlock)
    constants: dict = dfield(default_factory=dict)   # name → RPN (inlined)
    ndims: int = 1
    deck_text: str = ""
    deck_dir: str = ""       # directory of the deck file (relative paths)

    @property
    def species_names(self):
        return tuple(s.name for s in self.species)

    def species_index(self, name: str) -> int:
        for i, s in enumerate(self.species):
            if s.name == name:
                return i
        raise KeyError(f"unknown species {name!r}")


class DeckParseError(ValueError):
    pass


_BOUNDARY_NAMES = {
    "x_min": const.BD_X_MIN, "x_max": const.BD_X_MAX,
    "y_min": const.BD_Y_MIN, "y_max": const.BD_Y_MAX,
    "z_min": const.BD_Z_MIN, "z_max": const.BD_Z_MAX,
    # legacy names (left/right/down/up/back/front)
    "left": const.BD_X_MIN, "right": const.BD_X_MAX,
    "down": const.BD_Y_MIN, "up": const.BD_Y_MAX,
    "back": const.BD_Z_MIN, "front": const.BD_Z_MAX,
}

_TRUE = {"t", "true", "y", "yes", "on", "1"}
_FALSE = {"f", "false", "n", "no", "off", "0"}


class DeckParser:
    """Two-pass deck parser (reference: deck.F90:418 ``read_deck``)."""

    def __init__(self, ndims: int = 1):
        self.cfg = DeckConfig(ndims=ndims)
        self._ctx = {"ndims": float(ndims)}

    # -- helpers ----------------------------------------------------------
    def expr(self, value: str) -> Expression:
        return Expression.compile(value, user_constants=self.cfg.constants,
                                  species_names=self.cfg.species_names)

    def num(self, value: str) -> float:
        e = self.expr(value)
        return float(e(self._ctx))

    def integer(self, value: str) -> int:
        return int(round(self.num(value)))

    def logical(self, value: str) -> bool:
        v = value.strip().lower()
        if v in _TRUE:
            return True
        if v in _FALSE:
            return False
        raise DeckParseError(f"bad logical {value!r}")

    def dumpmask(self, value: str) -> int:
        v = value.strip().lower()
        if v in _TRUE:
            return int(const.IOType.ALWAYS)
        if v in _FALSE:
            return int(const.IOType.NEVER)
        ctx = {k: float(v) for k, v in DUMPMASK_WORDS.items()}
        ctx.update(self._ctx)
        # subset names act as dumpmask bits (deck_io_block.F90 routes
        # them into iodumpmask(io+1, :); diagnostics write_field then
        # emits Core_/Reduced_ variants for flagged variables)
        for nm, bit in getattr(self, "_subset_bits", {}).items():
            ctx.setdefault(nm, float(bit))
        return int(self.expr(value)(ctx))

    def pair(self, value: str):
        """Parse '(a, b)' range tuples used by dist_fn/subset blocks."""
        v = value.strip()
        if v.startswith("(") and v.endswith(")"):
            v = v[1:-1]
        parts = _split_top_level(v)
        return tuple(self.num(p) for p in parts)

    # -- main entry -------------------------------------------------------
    def parse_file(self, path: str) -> DeckConfig:
        raw = read_deck_lines(path)
        with open(path) as f:
            self.cfg.deck_text = f.read()
        import os
        self.cfg.deck_dir = os.path.dirname(os.path.abspath(path))
        # pass 1: constants + control + boundaries + species scalars (names)
        for blk in raw:
            if blk.name == "constant":
                self._handle_constant(blk)
            elif blk.name == "control":
                self._handle_control(blk)
            elif blk.name == "boundaries":
                self._handle_boundaries(blk)
        self._update_ctx()
        # subset names claim dumpmask bits BEFORE the io blocks parse:
        # the reference's io-block variable dumpmasks name subsets
        # (`ex = always + <subset>`, deck_io_block.F90 via io_list
        # lookup) and subset blocks may follow the output block in the
        # deck — same reason the reference reads in two passes
        self._subset_bits = {}
        for blk in raw:
            if blk.name == "subset":
                for el, val in blk.elements:
                    if el.strip().lower() == "name":
                        nm = val.strip()
                        if nm not in self._subset_bits:
                            self._subset_bits[nm] = 1 << (
                                12 + len(self._subset_bits))
        # pass 2: everything else, in deck order
        for blk in raw:
            handler = getattr(self, f"_handle_{blk.name}", None)
            if blk.name in ("constant", "control", "boundaries"):
                continue
            if handler is None:
                # unknown block: offered to user extension handlers
                # (custom_deck.f90 custom_blocks_handle_element), else
                # warned about loudly
                from ..extensions import DECK_BLOCKS
                hook = DECK_BLOCKS.get(blk.name)
                for el, val in blk.elements:
                    if hook is not None and hook(el, val, self):
                        continue
                    logging.getLogger("epoch_tpu").warning(
                        "deck block %r: key %r not recognised (no "
                        "handler and no registered extension) — ignored",
                        blk.name, el)
                continue
            handler(blk)
        self._finalise()
        from ..extensions import DECK_CHECKS
        for chk in DECK_CHECKS:
            chk(self.cfg)
        return self.cfg

    def _update_ctx(self):
        c = self.cfg.control
        self._ctx.update(
            nx=float(c.nx), ny=float(c.ny), nz=float(c.nz),
            x_min=c.x_min, x_max=c.x_max, y_min=c.y_min, y_max=c.y_max,
            z_min=c.z_min, z_max=c.z_max,
            length_x=c.x_max - c.x_min, lengthx=c.x_max - c.x_min,
            length_y=c.y_max - c.y_min, lengthy=c.y_max - c.y_min,
            length_z=c.z_max - c.z_min, lengthz=c.z_max - c.z_min,
            t_end=c.t_end, nsteps=float(c.nsteps),
            nprocx=float(c.nprocx), nprocy=float(c.nprocy), nprocz=float(c.nprocz),
        )
        if c.nx:
            self._ctx["dx"] = (c.x_max - c.x_min) / c.nx
        if c.ny > 1:
            self._ctx["dy"] = (c.y_max - c.y_min) / c.ny
        if c.nz > 1:
            self._ctx["dz"] = (c.z_max - c.z_min) / c.nz

    # -- block handlers ---------------------------------------------------
    def _handle_constant(self, blk: RawBlock):
        for el, val in blk.elements:
            e = self.expr(val)
            self.cfg.constants[el] = e.rpn

    def _handle_control(self, blk: RawBlock):
        c = self.cfg.control
        for el, val in blk.elements:
            el = el.lower()
            if el in ("nx", "ny", "nz"):
                setattr(c, el, self.integer(val))
                self._update_ctx()
            elif el in ("x_min", "x_max", "y_min", "y_max", "z_min", "z_max",
                        "x_start", "x_end", "y_start", "y_end", "z_start", "z_end"):
                name = el.replace("start", "min").replace("end", "max")
                setattr(c, name, self.num(val))
                self._update_ctx()
            elif el == "t_end":
                c.t_end = self.num(val)
                self._update_ctx()
            elif el in ("nsteps", "nstep"):
                c.nsteps = self.integer(val)
            elif el == "dt_multiplier":
                c.dt_multiplier = self.num(val)
            elif el == "field_order":
                c.field_order = self.integer(val)
            elif el == "maxwell_solver":
                c.maxwell_solver = B.MAXWELL_SOLVER_NAMES[val.strip().lower()]
            elif el == "stdout_frequency":
                c.stdout_frequency = self.integer(val)
            elif el == "use_random_seed":
                c.use_random_seed = self.logical(val)
            elif el == "random_seed":
                c.random_seed = self.integer(val)
            elif el == "smooth_currents":
                c.smooth_currents = self.logical(val)
            elif el == "use_higuera_cary":
                c.use_higuera_cary = self.logical(val)
            elif el == "work_done_integrated":
                c.work_done_integrated = self.logical(val)
            elif el == "smooth_iterations":
                c.smooth_iterations = self.integer(val)
            elif el == "smooth_compensation":
                c.smooth_compensation = self.logical(val)
            elif el == "smooth_strides":
                if val.strip().lower() == "auto":
                    c.smooth_strides = ()   # auto strides (current_smooth default)
                else:
                    c.smooth_strides = tuple(
                        self.integer(v) for v in _split_top_level(val))
            elif el in ("npart", "nparticles"):
                c.npart = self.integer(val)
            elif el in ("nprocx", "nproc_x"):
                c.nprocx = self.integer(val)
            elif el in ("nprocy", "nproc_y"):
                c.nprocy = self.integer(val)
            elif el in ("nprocz", "nproc_z"):
                c.nprocz = self.integer(val)
            elif el == "use_balance" or el == "dlb":
                c.use_balance = self.logical(val)
            elif el == "dlb_threshold":
                c.dlb_threshold = self.num(val)
                c.use_balance = True
            elif el == "restart_snapshot":
                c.restart_snapshot = val.strip()
            elif el == "field_ionisation":
                c.field_ionisation = self.logical(val)
            elif el == "use_multiphoton":
                c.use_multiphoton = self.logical(val)
            elif el == "use_bsi":
                c.use_bsi = self.logical(val)
            elif el == "particle_tstart":
                c.particle_tstart = self.num(val)
            elif el == "use_exact_restart":
                c.use_exact_restart = self.logical(val)
            elif el == "check_stop_frequency":
                c.check_stop_frequency = self.integer(val)
            elif el in ("use_nan_check", "check_nans", "nan_check"):
                c.use_nan_check = self.logical(val)
            elif el == "stop_at_walltime":
                c.stop_at_walltime = self.num(val)
            elif el == "use_current_correction":
                c.use_current_correction = self.logical(val)
            elif el in ("use_migration", "migrate_particles"):
                c.use_migration = self.logical(val)
            elif el == "migration_interval":
                c.migration_interval = self.integer(val)
            elif el == "npart_per_cell_min":
                c.npart_per_cell_min = self.integer(val)
            elif el == "n_zeros":
                c.n_zeros = self.integer(val)
            elif el == "particle_shape":
                c.particle_shape = B.SHAPE_NAMES[val.strip().lower()]
            elif el == "precision":
                c.precision = val.strip().lower()
            elif el == "pusher" or el == "engine":
                c.pusher = val.strip().lower()
            elif el == "bin_headroom":
                c.bin_headroom = self.num(val)
            elif el == "bin_overflow":
                v = val.strip().lower()
                if v not in ("drop", "merge"):
                    raise ValueError(
                        f"bin_overflow must be drop|merge, got {v!r}")
                c.bin_overflow = v
            # silently accept remaining legacy keys for now
        self._update_ctx()

    def _handle_boundaries(self, blk: RawBlock):
        b = self.cfg.boundaries
        for el, val in blk.elements:
            el = el.lower()
            m = re.match(r"bc_(x|y|z)_(min|max)(_field|_particle)?$", el)
            if m:
                idx = _BOUNDARY_NAMES[f"{m.group(1)}_{m.group(2)}"]
                bc = B.BC_NAMES[val.strip().lower()]
                if m.group(3) == "_field":
                    b.bc_field[idx] = bc
                elif m.group(3) == "_particle":
                    b.bc_particle[idx] = bc
                else:
                    b.bc_field[idx] = bc
                    b.bc_particle[idx] = _particle_bc_from_field(bc)
            elif el == "cpml_thickness":
                b.cpml_thickness = self.integer(val)
            elif el == "cpml_kappa_max":
                b.cpml_kappa_max = self.num(val)
            elif el == "cpml_a_max":
                b.cpml_a_max = self.num(val)
            elif el == "cpml_sigma_max":
                b.cpml_sigma_max = self.num(val)

    def _handle_species(self, blk: RawBlock):
        s = B.SpeciesBlock()
        for el, val in blk.elements:
            ell = el.lower()
            if ell == "name":
                s.name = val.strip()
            elif ell == "charge":
                s.charge = self.num(val) * const.q0
            elif ell == "mass":
                s.mass = self.num(val) * const.m0
            elif ell in ("npart", "nparticles"):
                s.npart = self.integer(val)
            elif ell in ("frac", "fraction"):
                # fraction of the control-level global particle count
                # (deck_species_block.F90:550-558)
                s.fraction = self.num(val)
            elif ell in ("npart_per_cell", "nparticles_per_cell"):
                s.npart_per_cell = self.num(val)
            elif ell == "bin_headroom":
                s.bin_headroom = self.num(val)
            elif ell in ("density", "number_density", "rho"):
                s.density = self.expr(val)
                s.density_layers.append(s.density)
            elif ell in ("density_min", "number_density_min", "minrho"):
                s.density_min = self.num(val)
            elif ell in ("density_max", "number_density_max", "maxrho"):
                s.density_max = self.num(val)
            elif ell in ("density_back", "number_density_back",
                         "density_background",
                         "number_density_background"):
                # delta-f f0 density; may reference other species'
                # densities (e.g. number_density(proton)) — defer those
                try:
                    s.density_back = self.num(val)
                except DeckExprError:
                    s.density_back_expr = self.expr(val)
            elif ell in ("temp", "temperature", "temp_k", "temperature_k"):
                e = self.expr(val)
                s.temp = [e, e, e]
            elif ell in ("temp_ev", "temperature_ev"):
                e = self.expr(f"({val}) * ev / kb")
                s.temp = [e, e, e]
            else:
                m = re.match(r"temp(?:erature)?_(x|y|z)(_ev|_k)?$", ell)
                if m:
                    i = "xyz".index(m.group(1))
                    if m.group(2) == "_ev":
                        s.temp[i] = self.expr(f"({val}) * ev / kb")
                    else:
                        s.temp[i] = self.expr(val)
                    continue
                m = re.match(r"drift_?p?(x|y|z)$", ell)
                if m:
                    i = "xyz".index(m.group(1))
                    s.drift[i] = self.expr(val)
                    continue
                m = re.match(r"bc_(x|y|z)_(min|max)$", ell)
                if m:
                    idx = _BOUNDARY_NAMES[f"{m.group(1)}_{m.group(2)}"]
                    s.bc_particle[idx] = B.BC_NAMES[val.strip().lower()]
                    continue
                if ell == "use_maxwell_juettner":
                    s.use_maxwell_juettner = self.logical(val)
                elif ell == "fractional_tail_cutoff":
                    s.fractional_tail_cutoff = self.num(val)
                elif ell == "immobile":
                    s.immobile = self.logical(val)
                elif ell in ("zero_current", "tracer"):
                    s.zero_current = self.logical(val)
                elif ell == "identify":
                    s.identify = val.strip().lower()
                    s.species_type = _species_type_from_identify(s.identify)
                    # identify also fixes charge/mass
                    # (identify_species, deck_species_block.F90:1382-1424)
                    ident = s.identify
                    if ident == "electron":
                        s.charge, s.mass = -const.q0, const.m0
                    elif ident == "proton":
                        s.charge, s.mass = const.q0, 1836.2 * const.m0
                        s.atomic_number = max(s.atomic_number, 1)
                    elif ident == "positron":
                        s.charge, s.mass = const.q0, const.m0
                    elif "photon" in ident:
                        s.charge, s.mass = 0.0, 0.0
                elif ell == "dump" or ell == "dumpmask":
                    s.dumpmask = self.dumpmask(val)
                elif ell == "atomic_number" or ell == "atomic_no":
                    s.atomic_number = self.integer(val)
                elif ell == "ionisation_energies":
                    s.ionisation_energies = [
                        self.num(v) for v in _split_top_level(_strip_parens(val))]
                elif ell in ("ionise_to_species", "ionise_species"):
                    s.ionise_to_species = [v.strip() for v in _split_top_level(val)]
                elif ell in ("electron_species", "electron",
                             "ionisation_electron_species"):
                    s.electron_species = [v.strip() for v in _split_top_level(val)]
                elif ell in ("temp_back", "temp_back_k", "temp_back_ev",
                             "temperature_background",
                             "temperature_background_k",
                             "temperature_background_ev"):
                    mult = const.q0 / const.kb \
                        if ell.endswith("_ev") else 1.0
                    s.temp_back = [self.num(val) * mult] * 3
                elif ell.startswith("temp_") and ell.endswith(
                        ("_back", "_back_k", "_back_ev",
                         "_background", "_background_k", "_background_ev")) \
                        and ell[5] in "xyz":
                    mult = const.q0 / const.kb \
                        if ell.endswith("_ev") else 1.0
                    s.temp_back["xyz".index(ell[5])] = self.num(val) * mult
                elif ell in ("drift_x_back", "drift_px_back",
                             "drift_x_background", "drift_px_background"):
                    s.drift_back[0] = self.num(val)
                elif ell in ("drift_y_back", "drift_py_back",
                             "drift_y_background", "drift_py_background"):
                    s.drift_back[1] = self.num(val)
                elif ell in ("drift_z_back", "drift_pz_back",
                             "drift_z_background", "drift_pz_background"):
                    s.drift_back[2] = self.num(val)
                elif ell == "dist_fn":
                    s.dist_fn = self.expr(val)
                elif ell in ("dist_fn_px_range", "dist_fn_py_range",
                             "dist_fn_pz_range"):
                    comp = "xyz".index(ell[9])
                    parts = _split_top_level(_strip_parens(val))
                    s.dist_fn_ranges[comp] = (self.expr(parts[0]),
                                              self.expr(parts[1]))
                elif ell == "split":
                    s.split = self.logical(val)
                elif ell == "npart_max":
                    s.npart_max = self.integer(val)
                elif ell == "migrate":
                    s.migrate = self.logical(val)
                elif ell == "promote_to":
                    s.promote_to = val.strip()
                elif ell == "demote_to":
                    s.demote_to = val.strip()
                elif ell == "promote_multiplier":
                    s.promote_multiplier = self.num(val)
                elif ell == "demote_multiplier":
                    s.demote_multiplier = self.num(val)
                elif ell in ("promote_number_density", "promote_density"):
                    s.promote_density = self.num(val)
                elif ell in ("demote_number_density", "demote_density"):
                    s.demote_density = self.num(val)
                elif ell == "fill_ghosts":
                    s.fill_ghosts = self.logical(val)
                # remaining keys tolerated
        if not s.name:
            raise DeckParseError("species block without a name")
        # repeated species blocks with the same name MERGE into the
        # existing species (the reference keys blocks by name,
        # deck_species_block.F90 species_id lookup) — e.g. the 2D
        # ionisation example re-opens 'Electron' to add density/temp
        for prev in self.cfg.species:
            if prev.name == s.name:
                import dataclasses as _dc
                blank = B.SpeciesBlock(name=s.name)
                for f_ in _dc.fields(B.SpeciesBlock):
                    new_v = getattr(s, f_.name)
                    if new_v != getattr(blank, f_.name):
                        if f_.name == "density_layers":
                            prev.density_layers.extend(new_v)
                            prev.density = s.density
                        else:
                            setattr(prev, f_.name, new_v)
                return
        self.cfg.species.append(s)

    def _handle_laser(self, blk: RawBlock):
        las = B.LaserBlock()
        for el, val in blk.elements:
            el = el.lower()
            if el == "boundary" or el == "direction":
                las.boundary = _BOUNDARY_NAMES[val.strip().lower()]
            elif el == "amp":
                las.amp = self.num(val)
            elif el in ("intensity", "irradiance"):
                las.amp = (self.num(val) / (const.c * const.epsilon0 / 2.0)) ** 0.5
            elif el in ("intensity_w_cm2", "irradiance_w_cm2"):
                las.amp = ((self.num(val) / (const.c * const.epsilon0 / 2.0)) ** 0.5) * 100.0
            elif el in ("omega", "freq", "frequency", "lambda"):
                e = self.expr(val)
                las.omega_expr = e
                las.omega_func_type = {"omega": "omega", "freq": "freq",
                                       "frequency": "freq", "lambda": "lambda"}[el]
                if not e.time_varying:
                    om = float(e(self._ctx))
                    if las.omega_func_type == "freq":
                        om = 2.0 * const.pi * om
                    elif las.omega_func_type == "lambda":
                        om = 2.0 * const.pi * const.c / om
                    las.omega = om
                    las.omega_expr = None
            elif el == "pol_angle" or el == "pol":
                ang = self.num(val)
                if el == "pol":
                    ang = ang * const.pi / 180.0
                las.pol_angle = ang
            elif el == "phase":
                las.phase = self.expr(val)
            elif el == "t_profile":
                las.t_profile = self.expr(val)
            elif el == "profile":
                las.profile = self.expr(val)
            elif el == "t_start":
                las.t_start = self.num(val) if val.strip().lower() != "start" else 0.0
            elif el == "t_end":
                las.t_end = self.num(val) if val.strip().lower() != "end" \
                    else self.cfg.control.t_end
            elif el == "id":
                las.id = self.integer(val)
        self.cfg.lasers.append(las)

    def _handle_fields(self, blk: RawBlock):
        f = self.cfg.fields
        for el, val in blk.elements:
            el = el.lower()
            if el in ("ex", "ey", "ez", "bx", "by", "bz"):
                setattr(f, el, self.expr(val))
            elif el == "offset":
                f.offset = self.integer(val)

    def _handle_window(self, blk: RawBlock):
        w = self.cfg.window
        for el, val in blk.elements:
            el = el.lower()
            if el == "move_window":
                w.move_window = self.logical(val)
            elif el == "window_v_x":
                w.window_v_x = self.expr(val)
            elif el == "window_start_time":
                w.window_start_time = self.num(val)
            elif el == "window_stop_time":
                w.window_stop_time = self.num(val)
            elif el == "bc_x_min_after_move":
                w.bc_x_min_after_move = B.BC_NAMES[val.strip().lower()]
            elif el == "bc_x_max_after_move":
                w.bc_x_max_after_move = B.BC_NAMES[val.strip().lower()]

    def _handle_output(self, blk: RawBlock):
        o = B.OutputBlock()
        scalar_keys = {
            "name": ("name", str.strip),
            "file_prefix": ("file_prefix", str.strip),
            "dt_snapshot": ("dt_snapshot", self.num),
            "nstep_snapshot": ("nstep_snapshot", self.integer),
            "dump_first": ("dump_first", self.logical),
            "dump_last": ("dump_last", self.logical),
            "dump_cycle": ("dump_cycle", self.integer),
            "restart_dump_every": ("restart_dump_every", self.integer),
            "full_dump_every": ("full_dump_every", self.integer),
            "force_final_to_be_restartable": ("force_final_to_be_restartable",
                                              self.logical),
            "rolling_restart": ("rolling_restart", self.logical),
            "time_start": ("time_start", self.num),
            "time_stop": ("time_stop", self.num),
            "nstep_start": ("nstep_start", self.integer),
            "nstep_stop": ("nstep_stop", self.integer),
            "dt_average": ("dt_average", self.num),
            "nstep_average": ("nstep_average", self.integer),
            "walltime_interval": ("walltime_interval", self.num),
            "walltime_snapshot": ("walltime_interval", self.num),
            "walltime_start": ("walltime_start", self.num),
            "walltime_stop": ("walltime_stop", self.num),
            "dump_first_after_restart": ("dump_first_after_restart",
                                         self.logical),
            "disabled": ("disabled", self.logical),
        }
        for el, val in blk.elements:
            el = el.lower()
            if el in scalar_keys:
                attr, conv = scalar_keys[el]
                setattr(o, attr, conv(val))
            elif el == "dump_at_times" or el == "times_dump":
                o.dump_at_times = [self.num(v) for v in _split_top_level(val)]
            elif el == "dump_at_nsteps" or el == "nsteps_dump":
                o.dump_at_nsteps = [self.integer(v) for v in _split_top_level(val)]
            elif el == "dump_at_walltimes" or el == "walltimes_dump":
                o.dump_at_walltimes = [self.num(v)
                                       for v in _split_top_level(val)]
            else:
                # everything else is an output-variable dumpmask; keys
                # outside the known variable vocabulary are accepted but
                # WARNED about (the reference errors on unknown io-block
                # elements, deck_io_block.F90 handler tail) — a silently
                # swallowed key is a data-loss hazard
                if not _known_output_variable(el):
                    import logging
                    if el in REF_IO_VARIABLES:
                        logging.getLogger("epoch_tpu").warning(
                            "output block %r: variable %r is valid EPOCH "
                            "vocabulary but not implemented by this "
                            "framework — it will not be written", o.name, el)
                    else:
                        logging.getLogger("epoch_tpu").warning(
                            "output block %r: unknown key %r (treated as a "
                            "dumpmask variable; it will never be written)",
                            o.name, el)
                try:
                    o.variables[el] = self.dumpmask(val)
                except DeckExprError:
                    pass
        self.cfg.outputs.append(o)

    _handle_output_global = _handle_output  # io_global merges into the same model

    def _handle_particles_from_file(self, blk: RawBlock):
        """begin:particles_from_file (deck_part_from_file_block.F90:125-
        255); ``offset`` is sticky over the following *_data lines."""
        p = B.PartFromFileBlock()
        current_offset = 0
        for el, val in blk.elements:
            el = el.lower()
            v = val.strip()
            if el == "species":
                p.species = v
            elif el == "offset":
                current_offset = self.integer(val)
            elif el in ("x_data", "y_data", "z_data", "px_data",
                        "py_data", "pz_data", "w_data"):
                setattr(p, el, v)
                p.offsets[el] = current_offset
            elif el in ("id4_data", "id8_data"):
                p.id_data = v
                p.id_4byte = el == "id4_data"
                p.offsets["id_data"] = current_offset
        if not p.species:
            raise DeckParseError(
                "particles_from_file block without a species")
        if not p.x_data:
            raise DeckParseError(
                f"particles_from_file for {p.species!r} has no x_data")
        if not p.w_data:
            raise DeckParseError(
                f"particles_from_file for {p.species!r} has no w_data")
        self.cfg.part_from_file.append(p)

    def _handle_dist_fn(self, blk: RawBlock):
        d = B.DistFnBlock()
        for el, val in blk.elements:
            el = el.lower()
            if el == "name":
                d.name = val.strip()
            elif el == "ndims":
                d.ndims = self.integer(val)
            elif el == "dumpmask":
                d.dumpmask = self.dumpmask(val)
            elif el == "output_deltaf":
                d.output_deltaf = self.logical(val)
            elif el.startswith("direction"):
                d.directions.append(const.Direction(self.integer(val)))
            elif el.startswith("range"):
                d.ranges.append(self.pair(val))
            elif el.startswith("resolution"):
                d.resolutions.append(self.integer(val))
            elif el == "include_species":
                d.include_species.append(val.strip())
            elif el.startswith("restrict_"):
                d.restrictions[el[len("restrict_"):]] = self.pair(val)
        self.cfg.dist_fns.append(d)

    def _handle_stencil(self, blk: RawBlock):
        st = B.StencilBlock()
        for el, val in blk.elements:
            el = el.lower()
            if el == "dt":
                st.dt = self.num(val)
            elif hasattr(st, el):
                setattr(st, el, self.num(val))
        self.cfg.stencil = st

    def _handle_probe(self, blk: RawBlock):
        p = B.ProbeBlock()
        for el, val in blk.elements:
            el = el.lower()
            if el == "name":
                p.name = val.strip()
            elif el == "point":
                p.point = list(self.pair(val)) if "," in val else [self.num(val)]
            elif el == "normal":
                p.normal = list(self.pair(val)) if "," in val else [self.num(val)]
            elif el == "ek_min":
                p.ek_min = self.num(val)
            elif el == "ek_max":
                p.ek_max = self.num(val)
            elif el == "include_species":
                p.include_species.append(val.strip())
            elif el == "dumpmask":
                p.dumpmask = self.dumpmask(val)
        self.cfg.probes.append(p)

    def _handle_subset(self, blk: RawBlock):
        s = B.SubsetBlock()
        for el, val in blk.elements:
            el = el.lower()
            if el == "name":
                s.name = val.strip()
            elif el == "include_species":
                s.include_species.append(val.strip())
            elif el == "random_fraction":
                s.random_fraction = self.num(val)
            elif el == "restriction":
                s.restriction = self.expr(val)
            elif el == "persist_start_time":
                s.persist_start_time = self.num(val)
            elif el == "persist_start_step":
                s.persist_start_step = self.integer(val)
            elif el == "dumpmask":
                s.dumpmask = self.dumpmask(val)
            elif el == "skip":
                # deck `skip = n` means every (n+1)-th point
                # (deck_subset_block.F90:292-311 stores skip_dir = n+1)
                s.skip = (self.integer(val) + 1,) * 3
            elif el in ("skip_x", "skip_y", "skip_z"):
                strides = list(s.skip) if s.skip else [1, 1, 1]
                strides["xyz".index(el[-1])] = self.integer(val) + 1
                s.skip = tuple(strides)
            else:
                m = re.match(r"(x|y|z)_(min|max)$", el)
                if m:
                    box = s.space_box.setdefault(m.group(1), [None, None])
                    box[0 if m.group(2) == "min" else 1] = self.num(val)
                    continue
                m = re.match(r"(\w+)_(min|max)$", el)
                if m:
                    rng = s.ranges.setdefault(m.group(1), [None, None])
                    rng[0 if m.group(2) == "min" else 1] = self.num(val)
        s.mask_bit = self._subset_bits.get(s.name, 0)
        self.cfg.subsets.append(s)

    def _handle_injector(self, blk: RawBlock):
        inj = B.InjectorBlock()
        for el, val in blk.elements:
            el = el.lower()
            if el == "boundary":
                inj.boundary = _BOUNDARY_NAMES[val.strip().lower()]
            elif el == "species":
                inj.species = val.strip()
            elif el in ("npart_per_cell", "nparticles_per_cell"):
                inj.npart_per_cell = self.num(val)
            elif el in ("density", "number_density", "rho"):
                inj.density = self.expr(val)
            elif el in ("density_min", "number_density_min"):
                inj.density_min = self.num(val)
            elif el == "use_flux_injector" or el == "use_flux_maxwellian":
                inj.use_flux_injector = self.logical(val)
            elif el == "t_start":
                inj.t_start = self.num(val)
            elif el == "t_end":
                inj.t_end = self.num(val)
            else:
                m = re.match(r"temp(?:erature)?_?(x|y|z)?(_ev|_k)?$", el)
                if m:
                    conv = f"({val}) * ev / kb" if m.group(2) == "_ev" else val
                    e = self.expr(conv)
                    if m.group(1):
                        inj.temp["xyz".index(m.group(1))] = e
                    else:
                        inj.temp = [e, e, e]
                    continue
                m = re.match(r"drift_?p?(x|y|z)$", el)
                if m:
                    inj.drift["xyz".index(m.group(1))] = self.expr(val)
        self.cfg.injectors.append(inj)

    def _handle_collisions(self, blk: RawBlock):
        cb = self.cfg.collisions
        for el, val in blk.elements:
            el = el.lower()
            if el == "use_collisions":
                cb.use_collisions = self.logical(val)
            elif el == "coulomb_log":
                if val.strip().lower() == "auto":
                    cb.coulomb_log = -1.0
                else:
                    cb.coulomb_log = self.num(val)
            elif el == "collide":
                vv = val.strip()
                if vv.lower() == "all":
                    cb.collide_all = True
                elif vv.lower() == "none":
                    cb.collide_all = False
                else:
                    # "species1 species2 [on|off|factor]"
                    parts = vv.split()
                    if len(parts) >= 2:
                        fac = 1.0
                        if len(parts) >= 3:
                            t = parts[2].lower()
                            fac = 1.0 if t == "on" else \
                                0.0 if t == "off" else self.num(parts[2])
                        cb.collide_pairs[f"{parts[0]} {parts[1]}"] = fac
                        cb.collide_pairs[f"{parts[1]} {parts[0]}"] = fac
            elif el == "collisional_ionisation":
                cb.collisional_ionisation = self.logical(val)
            elif el == "use_nanbu":
                cb.use_nanbu = self.logical(val)

    def _handle_qed(self, blk: RawBlock):
        q = self.cfg.qed
        for el, val in blk.elements:
            el = el.lower()
            if el == "use_qed" or el == "qed":
                q.use_qed = self.logical(val)
            elif el == "qed_start_time":
                q.qed_start_time = self.num(val)
            elif el == "produce_photons":
                q.produce_photons = self.logical(val)
            elif el == "photon_energy_min":
                q.photon_energy_min = self.num(val)
            elif el == "produce_pairs":
                q.produce_pairs = self.logical(val)
            elif el in ("use_trident", "trident", "produce_trident_pairs"):
                q.use_trident = self.logical(val)
            elif el == "photon_dynamics":
                q.photon_dynamics = self.logical(val)
            elif el == "qed_table_location":
                q.qed_table_location = val.strip()
            elif el == "use_radiation_reaction":
                q.use_radiation_reaction = self.logical(val)

    def _handle_bremsstrahlung(self, blk: RawBlock):
        b = self.cfg.bremsstrahlung
        for el, val in blk.elements:
            el = el.lower()
            if el in ("use_bremsstrahlung", "bremsstrahlung", "enable"):
                b.use_bremsstrahlung = self.logical(val)
            elif el in ("start_time", "bremsstrahlung_start_time"):
                b.start_time = self.num(val)
            elif el in ("produce_photons", "produce_bremsstrahlung_photons"):
                b.produce_photons = self.logical(val)
            elif el in ("photon_energy_min", "min_photon_energy",
                        "photon_energy_min_bremsstrahlung"):
                b.photon_energy_min = self.num(val)
            elif el in ("photon_weight", "photon_weight_multiplier"):
                b.photon_weight = self.num(val)
            elif el in ("photon_dynamics",
                        "bremsstrahlung_photon_dynamics"):
                b.photon_dynamics = self.logical(val)
            elif el == "use_plasma_screening":
                b.use_plasma_screening = self.logical(val)
            elif el in ("use_bremsstrahlung_recoil",
                        "use_radiation_reaction"):
                b.use_radiation_reaction = self.logical(val)
            elif el in ("table_location", "bremsstrahlung_table_location"):
                b.table_location = val.strip()

    def _finalise(self):
        cfg = self.cfg
        # deduce ndims from control block
        if cfg.control.nz > 1:
            cfg.ndims = 3
        elif cfg.control.ny > 1:
            cfg.ndims = 2
        else:
            cfg.ndims = 1
        # laser t_end defaults to simulation t_end (laser.f90:40)
        for las in cfg.lasers:
            if las.t_end == float("inf"):
                las.t_end = cfg.control.t_end
        # frac/fraction → count from the control-level global npart
        # (deck_species_block.F90:550-558)
        for s in cfg.species:
            if s.fraction >= 0.0:
                s.npart = int(s.fraction * max(cfg.control.npart, 0))
        # per-species particle BCs default to the global ones
        for s in cfg.species:
            for i in range(6):
                if s.bc_particle[i] is None:
                    s.bc_particle[i] = cfg.boundaries.bc_particle[i]
        self._expand_ionisation_chains()

    def _expand_ionisation_chains(self):
        """species with N ionisation_energies spawn derived species
        name1..nameN, chained for field/collisional ionisation
        (species_block_end, deck_species_block.F90:301-341)."""
        cfg = self.cfg
        new_species = []
        for s in list(cfg.species):
            new_species.append(s)
            if not s.ionisation_energies:
                continue
            energies = s.ionisation_energies
            releases = s.electron_species or [""]
            if len(releases) == 1:
                releases = releases * len(energies)
            prev = s
            for i, e_ion in enumerate(energies):
                name = f"{s.name}{i + 1}"
                derived = B.SpeciesBlock(
                    name=name,
                    charge=s.charge + (i + 1) * const.q0,
                    mass=s.mass,
                    bc_particle=list(s.bc_particle),
                    species_type=const.SpeciesType.ION,
                    atomic_number=s.atomic_number,
                )
                prev.ionise = True
                prev.ionisation_energy = e_ion
                prev.ionise_to_species_name = name
                prev.release_species_name = releases[i] if i < len(releases) \
                    else releases[-1]
                # (n, l) of the outgoing electron by Madelung filling
                from ..physics.ionise import madelung_nl
                prev.principal_n, prev.l_quantum = madelung_nl(
                    len(energies) - i)
                new_species.append(derived)
                prev = derived
        cfg.species = new_species


def _strip_parens(text: str) -> str:
    t = text.strip()
    if t.startswith("(") and t.endswith(")"):
        return t[1:-1]
    return t


def _split_top_level(text: str) -> list[str]:
    """Split on commas not inside parentheses."""
    parts, depth, cur = [], 0, ""
    for ch in text:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append(cur.strip())
            cur = ""
        else:
            cur += ch
    if cur.strip():
        parts.append(cur.strip())
    return parts


def _particle_bc_from_field(bc: const.BC) -> const.BC:
    """Field BC name → implied particle BC (setup_particle_boundary,
    boundary.F90:99-139)."""
    if bc in (const.BC.SIMPLE_LASER, const.BC.SIMPLE_OUTFLOW,
              const.BC.CPML_LASER, const.BC.CPML_OUTFLOW):
        return const.BC.OPEN
    if bc == const.BC.CONDUCT:
        return const.BC.REFLECT
    return bc


def _species_type_from_identify(identify: str) -> const.SpeciesType:
    ident = identify.lower()
    if "photon" in ident:
        return const.SpeciesType.PHOTON
    if "positron" in ident:
        return const.SpeciesType.POSITRON
    if "electron" in ident:
        return const.SpeciesType.ELECTRON
    if "proton" in ident or "ion" in ident:
        return const.SpeciesType.ION
    return const.SpeciesType.STANDARD


def load_deck(path: str, ndims: int = 1) -> DeckConfig:
    return DeckParser(ndims=ndims).parse_file(path)
