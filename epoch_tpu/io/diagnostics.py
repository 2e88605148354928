"""Output orchestration and derived variables.

Re-implements the reference I/O stack (``epoch1d/src/io/diagnostics.F90``,
``io/calc_df.F90``, ``io/dist_fn.F90``): named output blocks with independent
cadences (``io_test`` scheduling, diagnostics.F90:1208), dumpmask-gated
variables, particle→grid derived moments, N-D phase-space histograms, and
numbered ``NNNN.sdf`` dumps with a ``.visit`` manifest.
"""
from __future__ import annotations

import math
import os
import time as time_mod

import numpy as np
import jax.numpy as jnp

from .. import constants as const
from ..core import shapes
from ..core.boundaries import STAGGER
from .sdf import SDFWriter

IOType = const.IOType


def get_slab(cfg, state, i):
    """Species state as a flat ParticleSlab (converts binned storage).
    Positions are grid-relative (static grid); add window_off() along x
    for absolute output coordinates."""
    sp = state.species[i]
    if hasattr(sp, "xi"):          # BinnedSpecies
        from ..core.binned import as_slab
        periodic = tuple(
            cfg.bc_particle[2 * d] == const.BC.PERIODIC
            for d in range(cfg.ndims))
        return as_slab(sp, cfg.grid, periodic=periodic,
                       aux_names=getattr(cfg, "binned_aux", ()))
    return sp


def iter_slab_pages(cfg, state, i, page_bytes=None):
    """Yield bounded-size ParticleSlab pages for species ``i`` — the
    dump-time streaming iterator (io/iterators.F90:31-474 analogue).

    The binned engine pages over grid-x column chunks (the device slice
    happens before the host pull, so peak host memory per variable pass
    is bounded by the page, not the 10^7–10^8-particle slab); scatter
    slabs page over particle rows.  ``page_bytes`` bounds the raw slot
    payload per page (default 256 MiB, EPOCH_TPU_DUMP_PAGE_MB)."""
    if page_bytes is None:
        page_bytes = int(os.environ.get("EPOCH_TPU_DUMP_PAGE_MB",
                                        256)) * 2 ** 20
    sp = state.species[i]
    if hasattr(sp, "xi"):          # BinnedSpecies
        from ..core.binned import as_slab
        grid = cfg.grid
        periodic = tuple(
            cfg.bc_particle[2 * d] == const.BC.PERIODIC
            for d in range(cfg.ndims))
        naux = 0 if sp.aux is None else sp.aux.shape[0]
        rest = int(np.prod(grid.n[1:])) if cfg.ndims > 1 else 1
        bytes_per_col = sp.K * rest * (cfg.ndims + 4 + naux) \
            * sp.w.dtype.itemsize
        cols = max(1, min(grid.n[0], page_bytes // max(bytes_per_col, 1)))
        for x0 in range(0, grid.n[0], cols):
            yield as_slab(sp, grid, periodic=periodic,
                          aux_names=getattr(cfg, "binned_aux", ()),
                          xsl=(x0, min(grid.n[0], x0 + cols)))
        return
    n = sp.x.shape[0]
    bytes_per_row = (cfg.ndims + 8) * sp.x.dtype.itemsize
    rows = max(1, min(n, page_bytes // max(bytes_per_row, 1)))
    for r0 in range(0, max(n, 1), rows):
        sl = slice(r0, min(n, r0 + rows))
        yield sp._replace(
            x=sp.x[sl], p=sp.p[sl], weight=sp.weight[sl],
            alive=sp.alive[sl], id=sp.id[sl],
            opdepth=sp.opdepth[sl], opdepth_brem=sp.opdepth_brem[sl],
            opdepth_tri=sp.opdepth_tri[sl], pvol=sp.pvol[sl])


def window_off(cfg, state) -> float:
    """Moving-window x offset: absolute coordinate = grid-relative + off
    (the engines keep positions relative to the static grid; see
    core/window.py)."""
    if not cfg.move_window:
        return 0.0
    return float(state.window_offset) * cfg.grid.delta[0]


# ---------------------------------------------------------------------------
# derived variables (calc_df.F90:35-1231)
# ---------------------------------------------------------------------------

def particle_to_grid(slab, grid, values=None):
    """Deposit per-particle ``values`` (default: weight) onto cell centres
    with normalised shape weights (include/particle_to_grid.inc).

    Returns the padded array; callers strip ghosts / apply BC folds.
    """
    nd = grid.ndims
    shp = grid.shape_fn
    ng = grid.ng
    fac1 = shapes.FAC_1D[shp]
    w = jnp.where(slab.alive, slab.weight, 0.0)
    vals = w if values is None else values * w
    cells, wts = [], []
    for d in range(nd):
        rel = slab.x[:, d] - grid.grid_min(d)
        c, cf = shapes.cell_and_frac(rel, 1.0 / grid.delta[d], shp, ng, False)
        c = jnp.clip(c, 0, grid.n[d] + 2 * ng - 1)
        cells.append(c)
        wts.append(shapes.support_weights(shp, cf) * fac1)
    offs = shapes.support_offsets(shp)
    S = len(offs)
    padded = grid.padded_shape()
    out = jnp.zeros(padded).reshape(-1)
    strides = [int(np.prod(padded[d + 1:])) for d in range(nd)]
    offs_j = jnp.asarray(offs)
    idx = [jnp.clip(cells[d][:, None] + offs_j[None, :], 0, padded[d] - 1)
           for d in range(nd)]
    if nd == 1:
        out = out.at[idx[0].reshape(-1)].add(
            (vals[:, None] * wts[0]).reshape(-1))
    elif nd == 2:
        fi = (idx[0][:, :, None] * strides[0] + idx[1][:, None, :])
        wv = vals[:, None, None] * wts[0][:, :, None] * wts[1][:, None, :]
        out = out.at[fi.reshape(-1)].add(wv.reshape(-1))
    else:
        fi = (idx[0][:, :, None, None] * strides[0]
              + idx[1][:, None, :, None] * strides[1]
              + idx[2][:, None, None, :])
        wv = (vals[:, None, None, None] * wts[0][:, :, None, None]
              * wts[1][:, None, :, None] * wts[2][:, None, None, :])
        out = out.at[fi.reshape(-1)].add(wv.reshape(-1))
    return out.reshape(padded)


def _fold_and_strip(arr, cfg):
    """Apply the additive summation BCs and strip ghosts (calc_df applies
    processor_summation_bcs to every derived grid variable)."""
    from ..core.boundaries import current_summation_bcs
    arr = current_summation_bcs(arr, "", cfg)
    return cfg.grid.interior(arr)


def derived_variable(name, cfg, state, species_idx=None):
    """Compute a derived grid variable (interior, numpy).

    Supported (calc_df.F90): number_density, charge_density, mass_density,
    ekbar [J], average_p{x,y,z}, average_weight, ppc, temperature.
    """
    grid = cfg.grid
    ivol = 1.0 / grid.cell_volume
    idxs = [species_idx] if species_idx is not None \
        else list(range(len(cfg.species)))

    def ke(slab, sp):
        mc = sp.mass * const.c
        p2 = jnp.sum(slab.p ** 2, axis=1)
        if sp.species_type == const.SpeciesType.PHOTON:
            return const.c * jnp.sqrt(p2)
        gamma = jnp.sqrt(1.0 + p2 / mc ** 2)
        return (gamma - 1.0) * sp.mass * const.c ** 2

    if name == "number_density":
        acc = sum(particle_to_grid(get_slab(cfg, state, i), grid) for i in idxs)
        return np.asarray(_fold_and_strip(acc, cfg)) * ivol
    if name == "charge_density":
        acc = sum(particle_to_grid(get_slab(cfg, state, i), grid) * cfg.species[i].charge
                  for i in idxs)
        return np.asarray(_fold_and_strip(acc, cfg)) * ivol
    if name == "mass_density":
        acc = sum(particle_to_grid(get_slab(cfg, state, i), grid) * cfg.species[i].mass
                  for i in idxs)
        return np.asarray(_fold_and_strip(acc, cfg)) * ivol
    if name in ("ekbar", "average_particle_energy"):
        num = 0.0
        den = 0.0
        for i in idxs:
            slab, sp = get_slab(cfg, state, i), cfg.species[i]
            num = num + particle_to_grid(slab, grid, ke(slab, sp))
            den = den + particle_to_grid(slab, grid)
        num = _fold_and_strip(num, cfg)
        den = _fold_and_strip(den, cfg)
        return np.asarray(jnp.where(den > 0, num / jnp.maximum(den, 1e-300), 0.0))
    if name in ("average_px", "average_py", "average_pz"):
        comp = "xyz".index(name[-1])
        num = 0.0
        den = 0.0
        for i in idxs:
            slab = get_slab(cfg, state, i)
            num = num + particle_to_grid(slab, grid, slab.p[:, comp])
            den = den + particle_to_grid(slab, grid)
        num = _fold_and_strip(num, cfg)
        den = _fold_and_strip(den, cfg)
        return np.asarray(jnp.where(den > 0, num / jnp.maximum(den, 1e-300), 0.0))
    if name == "average_weight":
        num = 0.0
        cnt = 0.0
        for i in idxs:
            slab = get_slab(cfg, state, i)
            num = num + particle_to_grid(slab, grid, slab.weight)
            ones = jnp.where(slab.alive, 1.0, 0.0)
            cnt = cnt + particle_to_grid(
                slab._replace(weight=ones), grid)
        num = _fold_and_strip(num, cfg)
        cnt = _fold_and_strip(cnt, cfg)
        return np.asarray(jnp.where(cnt > 0, num / jnp.maximum(cnt, 1e-300), 0.0))
    if name in ("ppc", "particles_per_cell"):
        cnt = 0.0
        for i in idxs:
            slab = get_slab(cfg, state, i)
            ones = jnp.where(slab.alive, 1.0, 0.0)
            cnt = cnt + particle_to_grid(slab._replace(weight=ones), grid)
        return np.asarray(_fold_and_strip(cnt, cfg))
    if name in ("temperature", "temperature_x", "temperature_y",
                "temperature_z"):
        # calc_temperature (calc_df.F90:687-938): count-weighted second
        # moment of p/sqrt(m) about the count-weighted per-cell mean;
        # sigma = M2 - M1^2/M0 in closed form, T = sigma/(M0 kb dof)
        dirs = [0, 1, 2] if name == "temperature" \
            else ["xyz".index(name[-1])]
        m0 = 0.0
        m1 = [0.0, 0.0, 0.0]
        m2 = 0.0
        for i in idxs:
            slab, sp = get_slab(cfg, state, i), cfg.species[i]
            if sp.species_type == const.SpeciesType.PHOTON:
                continue
            ones = jnp.where(slab.alive, 1.0, 0.0)
            cs = slab._replace(weight=ones)
            m0 = m0 + particle_to_grid(cs, grid)
            for d in dirs:
                pm = slab.p[:, d] / math.sqrt(sp.mass)
                m1[d] = m1[d] + particle_to_grid(cs, grid, pm)
                m2 = m2 + particle_to_grid(cs, grid, pm * pm)
        m0 = _fold_and_strip(m0, cfg)
        m2 = _fold_and_strip(m2, cfg)
        sig = m2
        for d in dirs:
            m1d = _fold_and_strip(m1[d], cfg)
            sig = sig - jnp.where(m0 > 0, m1d * m1d / jnp.maximum(m0, 1e-300),
                                  0.0)
        dof = float(len(dirs))
        return np.asarray(jnp.where(
            m0 > 0, sig / jnp.maximum(m0, 1e-6) / const.kb / dof, 0.0))
    if name in ("ekflux_x", "ekflux_y", "ekflux_z"):
        # calc_ekflux (calc_df.F90:225-367): weighted mean of
        # KE * (c * prod(transverse cell sizes) * u_dir/gamma), positive
        # direction (outgoing flux variant)
        d = "xyz".index(name[-1])
        fac = const.c * float(np.prod([grid.delta[k]
                                       for k in range(grid.ndims)
                                       if k != d]))
        num = 0.0
        den = 0.0
        for i in idxs:
            slab, sp = get_slab(cfg, state, i), cfg.species[i]
            if sp.species_type == const.SpeciesType.PHOTON:
                continue
            mc = sp.mass * const.c
            u = slab.p / mc
            gamma = jnp.sqrt(1.0 + jnp.sum(u ** 2, axis=1))
            flux = jnp.maximum(fac * u[:, d] / gamma, 0.0)
            num = num + particle_to_grid(slab, grid, ke(slab, sp) * flux)
            den = den + particle_to_grid(slab, grid)
        num = _fold_and_strip(num, cfg)
        den = _fold_and_strip(den, cfg)
        return np.asarray(num / jnp.maximum(den, 1e-300))
    if name in ("current_x", "current_y", "current_z"):
        # calc_per_species_current (calc_df.F90:942-1045):
        # J = c/vol * sum w q p_dir / sqrt((mc)^2 + p^2)
        comp = "xyz".index(name[-1])
        acc = 0.0
        for i in idxs:
            slab, sp = get_slab(cfg, state, i), cfg.species[i]
            if sp.zero_current:
                continue
            mc = sp.mass * const.c
            root = 1.0 / jnp.sqrt(mc ** 2 + jnp.sum(slab.p ** 2, axis=1))
            acc = acc + particle_to_grid(
                slab, grid, sp.charge * slab.p[:, comp] * root)
        acc = _fold_and_strip(acc, cfg)
        return np.asarray(acc) * const.c * ivol
    if name in ("poynt_flux_x", "poynt_flux_y", "poynt_flux_z"):
        # calc_poynt_flux (calc_df.F90:371-414): cell-centred (E x B)/mu0
        # component with Yee de-staggering
        f = state.fields

        def cc(arr, name_):
            # average staggered components back to cell centres
            stag = STAGGER[name_]
            out = arr
            for d2 in range(grid.ndims):
                if stag[d2]:
                    out = 0.5 * (out + shifted(out, d2, -1))
            return out

        def shifted(arr, d2, off):
            sl = [slice(None)] * arr.ndim
            sl[d2] = slice(None)
            return jnp.roll(arr, -off, axis=d2)

        ex = cc(f.ex, "ex")
        ey = cc(f.ey, "ey")
        ez = cc(f.ez, "ez")
        bx = cc(f.bx, "bx")
        by = cc(f.by, "by")
        bz = cc(f.bz, "bz")
        comp = "xyz".index(name[-1])
        if comp == 0:
            s = (ey * bz - ez * by) / const.mu0
        elif comp == 1:
            s = (ez * bx - ex * bz) / const.mu0
        else:
            s = (ex * by - ey * bx) / const.mu0
        return np.asarray(grid.interior(s))
    raise KeyError(f"unknown derived variable {name!r}")


def total_field_energy(cfg, state):
    """Σ ε₀E²/2 + B²/2μ₀ over the interior (calc_total_energy_sum,
    calc_df.F90)."""
    f = state.fields
    g = cfg.grid
    e2 = sum(np.asarray(g.interior(c)) ** 2 for c in (f.ex, f.ey, f.ez))
    b2 = sum(np.asarray(g.interior(c)) ** 2 for c in (f.bx, f.by, f.bz))
    return (0.5 * const.epsilon0 * e2 + 0.5 / const.mu0 * b2).sum() \
        * g.cell_volume


def total_particle_energy(cfg, state):
    tot = 0.0
    for i, sp in enumerate(cfg.species):
        slab = get_slab(cfg, state, i)
        p2 = np.asarray(jnp.sum(slab.p ** 2, axis=1))
        w = np.asarray(jnp.where(slab.alive, slab.weight, 0.0))
        mc = sp.mass * const.c
        if sp.species_type == const.SpeciesType.PHOTON:
            ke = const.c * np.sqrt(p2)
        else:
            gamma = np.sqrt(1.0 + p2 / mc ** 2)
            ke = (gamma - 1.0) * sp.mass * const.c ** 2
        tot += float((ke * w).sum())
    return tot


# ---------------------------------------------------------------------------
# dist_fn (io/dist_fn.F90:118-716)
# ---------------------------------------------------------------------------

_DIR_AXIS = {const.Direction.X: 0, const.Direction.Y: 1, const.Direction.Z: 2}


def dist_fn_axis_values(dfn_dir, slab, sp):
    D = const.Direction
    p = slab.p
    if dfn_dir in _DIR_AXIS:
        return slab.x[:, _DIR_AXIS[dfn_dir]]
    if dfn_dir == D.PX:
        return p[:, 0]
    if dfn_dir == D.PY:
        return p[:, 1]
    if dfn_dir == D.PZ:
        return p[:, 2]
    mc = sp.mass * const.c
    p2 = jnp.sum(p ** 2, axis=1)
    if dfn_dir == D.EN:
        gamma = jnp.sqrt(1.0 + p2 / mc ** 2)
        return (gamma - 1.0) * sp.mass * const.c ** 2
    if dfn_dir == D.GAMMA_M1:
        gamma = jnp.sqrt(1.0 + p2 / mc ** 2)
        return gamma - 1.0
    if dfn_dir == D.MOD_P:
        return jnp.sqrt(p2)
    if dfn_dir == D.XY_ANGLE:
        return jnp.arctan2(p[:, 1], p[:, 0])
    if dfn_dir == D.YZ_ANGLE:
        return jnp.arctan2(p[:, 2], p[:, 1])
    if dfn_dir == D.ZX_ANGLE:
        return jnp.arctan2(p[:, 0], p[:, 2])
    raise KeyError(dfn_dir)


def compute_dist_fn(dfn, cfg, state, species_idx):
    """N-D weighted histogram for one species → (edges list, hist array)."""
    grid = cfg.grid
    slab = get_slab(cfg, state, species_idx)
    sp = cfg.species[species_idx]
    w = np.asarray(jnp.where(slab.alive, slab.weight, 0.0))
    alive = w > 0
    samples = []
    edges = []
    for i, direction in enumerate(dfn.directions[:dfn.ndims]):
        v = np.asarray(dist_fn_axis_values(direction, slab, sp))
        if direction in _DIR_AXIS:
            d = _DIR_AXIS[direction]
            off = window_off(cfg, state) if d == 0 else 0.0
            v = v + off
            lo, hi = off + grid.grid_min(d) - 0.5 * grid.delta[d], \
                off + grid.grid_max(d) + 0.5 * grid.delta[d]
            res = grid.n[d]
        else:
            lo, hi = dfn.ranges[i] if i < len(dfn.ranges) else (0.0, 0.0)
            res = dfn.resolutions[i] if i < len(dfn.resolutions) else 100
            if not (hi > lo):      # auto-range (dist_fn.F90:219-252)
                vv = v[alive]
                lo = float(vv.min()) if vv.size else 0.0
                hi = float(vv.max()) if vv.size else 1.0
                if hi <= lo:
                    hi = lo + 1.0
        samples.append(v)
        edges.append(np.linspace(lo, hi, res + 1))
    # restrictions (restrict_px etc.)
    mask = alive
    restr_dirs = {"x": const.Direction.X, "y": const.Direction.Y,
                  "z": const.Direction.Z, "px": const.Direction.PX,
                  "py": const.Direction.PY, "pz": const.Direction.PZ}
    for key, (lo, hi) in dfn.restrictions.items():
        if key in restr_dirs:
            v = np.asarray(dist_fn_axis_values(restr_dirs[key], slab, sp))
            mask = mask & (v >= lo) & (v <= hi)
    sample_arr = np.stack([s[mask] for s in samples], axis=1)
    hist, _ = np.histogramdd(sample_arr, bins=edges, weights=w[mask])
    return edges, hist


# ---------------------------------------------------------------------------
# output manager (diagnostics.F90:204-1205)
# ---------------------------------------------------------------------------

# variable key → (sdf id, sdf name, units, field attr)
FIELD_VARS = {
    "ex": ("ex", "Electric Field/Ex", "V/m"),
    "ey": ("ey", "Electric Field/Ey", "V/m"),
    "ez": ("ez", "Electric Field/Ez", "V/m"),
    "bx": ("bx", "Magnetic Field/Bx", "T"),
    "by": ("by", "Magnetic Field/By", "T"),
    "bz": ("bz", "Magnetic Field/Bz", "T"),
    "jx": ("jx", "Current/Jx", "A/m^2"),
    "jy": ("jy", "Current/Jy", "A/m^2"),
    "jz": ("jz", "Current/Jz", "A/m^2"),
}

DERIVED_VARS = {
    "number_density": ("number_density", "Derived/Number_Density", "1/m^3"),
    "charge_density": ("charge_density", "Derived/Charge_Density", "C/m^3"),
    "mass_density": ("mass_density", "Derived/Mass_Density", "kg/m^3"),
    "average_particle_energy": ("ekbar", "Derived/Average_Particle_Energy", "J"),
    "ekbar": ("ekbar", "Derived/EkBar", "J"),
    "temperature": ("temperature", "Derived/Temperature", "K"),
    "ppc": ("ppc", "Derived/Particles_Per_Cell", "n_particles"),
    "average_weight": ("average_weight", "Derived/Average_Weight", "weight"),
    "average_px": ("average_px", "Derived/Particles_Average_Px", "kg.m/s"),
    "average_py": ("average_py", "Derived/Particles_Average_Py", "kg.m/s"),
    "average_pz": ("average_pz", "Derived/Particles_Average_Pz", "kg.m/s"),
    "temperature_x": ("temperature_x", "Derived/Temperature/X", "K"),
    "temperature_y": ("temperature_y", "Derived/Temperature/Y", "K"),
    "temperature_z": ("temperature_z", "Derived/Temperature/Z", "K"),
    "ekflux_x": ("ekflux_x", "Derived/EkFlux/X", "W/m^2"),
    "ekflux_y": ("ekflux_y", "Derived/EkFlux/Y", "W/m^2"),
    "ekflux_z": ("ekflux_z", "Derived/EkFlux/Z", "W/m^2"),
    "current_x": ("current_x", "Derived/Jx", "A/m^2"),
    "current_y": ("current_y", "Derived/Jy", "A/m^2"),
    "current_z": ("current_z", "Derived/Jz", "A/m^2"),
    "poynt_flux_x": ("poynt_flux_x", "Derived/Poynting_Flux/X", "W/m^2"),
    "poynt_flux_y": ("poynt_flux_y", "Derived/Poynting_Flux/Y", "W/m^2"),
    "poynt_flux_z": ("poynt_flux_z", "Derived/Poynting_Flux/Z", "W/m^2"),
}

# deck keys that expand to directional variants (deck_io_block.F90:696-702)
VAR_EXPANSIONS = {
    "ekflux": ("ekflux_x", "ekflux_y", "ekflux_z"),
    "poynt_flux": ("poynt_flux_x", "poynt_flux_y", "poynt_flux_z"),
    "poynting_flux": ("poynt_flux_x", "poynt_flux_y", "poynt_flux_z"),
    "current_density": ("current_x", "current_y", "current_z"),
    # convenience alias (the reference exposes the six work_* keys
    # individually, deck_io_block.F90:593-610)
    "work_done_integrated": ("work_x", "work_y", "work_z",
                             "work_x_total", "work_y_total",
                             "work_z_total"),
}

# non-variable keys maybe_dump/write_dump consume directly (the rest of
# the writer's vocabulary, for deck-time unknown-key warnings)
EXTRA_OUTPUT_KEYS = frozenset((
    "grid", "field_grid", "particles", "particle_grid",
    "distribution_functions", "total_energy_sum", "absorption",
    "ejected_particles", "particle_probes", "species_id",
    "dump_input_decks", "dump_source_code",
))

def _work_col(s, col):
    return s.work[:, col] if s.work is not None else s.weight * 0.0


def _gamma_of(s, sp):
    import jax.numpy as jnp
    if sp.species_type == const.SpeciesType.PHOTON or sp.mass <= 0:
        return jnp.ones_like(s.weight)
    mc = sp.mass * const.c
    return jnp.sqrt(1.0 + jnp.sum((s.p / mc) ** 2, axis=1))


def _velocity(s, sp, comp):
    import jax.numpy as jnp
    if sp.species_type == const.SpeciesType.PHOTON or sp.mass <= 0:
        mag = jnp.maximum(jnp.sqrt(jnp.sum(s.p ** 2, axis=1)), 1e-300)
        return const.c * s.p[:, comp] / mag
    return s.p[:, comp] / (sp.mass * _gamma_of(s, sp))


def _particle_ek(s, sp):
    import jax.numpy as jnp
    if sp.species_type == const.SpeciesType.PHOTON or sp.mass <= 0:
        return const.c * jnp.sqrt(jnp.sum(s.p ** 2, axis=1))
    return (_gamma_of(s, sp) - 1.0) * sp.mass * const.c ** 2


# getters take (slab, species_cfg); deck_io_block.F90:528-580 key set
PARTICLE_VARS = {
    "particles": None,   # triggers the point mesh
    "px": ("px", "Particles/Px", "kg.m/s", lambda s, sp: s.p[:, 0]),
    "py": ("py", "Particles/Py", "kg.m/s", lambda s, sp: s.p[:, 1]),
    "pz": ("pz", "Particles/Pz", "kg.m/s", lambda s, sp: s.p[:, 2]),
    "vx": ("vx", "Particles/Vx", "m/s", lambda s, sp: _velocity(s, sp, 0)),
    "vy": ("vy", "Particles/Vy", "m/s", lambda s, sp: _velocity(s, sp, 1)),
    "vz": ("vz", "Particles/Vz", "m/s", lambda s, sp: _velocity(s, sp, 2)),
    "particle_weight": ("weight", "Particles/Weight", "",
                        lambda s, sp: s.weight),
    "weight": ("weight", "Particles/Weight", "", lambda s, sp: s.weight),
    "id": ("id", "Particles/ID", "", lambda s, sp: s.id),
    "charge": ("charge", "Particles/Charge", "C",
               lambda s, sp: sp.charge * (s.weight * 0 + 1.0)),
    "mass": ("mass", "Particles/Mass", "kg",
             lambda s, sp: sp.mass * (s.weight * 0 + 1.0)),
    "rest_mass": ("mass", "Particles/Mass", "kg",
                  lambda s, sp: sp.mass * (s.weight * 0 + 1.0)),
    "ek": ("ek", "Particles/Ek", "J", _particle_ek),
    "particle_energy": ("ek", "Particles/Ek", "J", _particle_ek),
    "gamma": ("gamma", "Particles/Gamma", "", _gamma_of),
    "relativistic_mass": ("relativistic_mass", "Particles/Relativistic Mass",
                          "kg", lambda s, sp: sp.mass * _gamma_of(s, sp)),
    "optical_depth": ("optical_depth", "Particles/Optical Depth", "",
                      lambda s, sp: s.opdepth),
    "bremsstrahlung_optical_depth": (
        "optical_depth_brem", "Particles/Bremsstrahlung Optical Depth", "",
        lambda s, sp: s.opdepth_brem),
    # WORK_DONE_INTEGRATED variables (diagnostics.F90:669-690); zeros
    # when the run didn't enable control work_done_integrated
    "work_x": ("work_x", "Particles/Work_x_direction", "J",
               lambda s, sp: _work_col(s, 0)),
    "work_y": ("work_y", "Particles/Work_y_direction", "J",
               lambda s, sp: _work_col(s, 1)),
    "work_z": ("work_z", "Particles/Work_z_direction", "J",
               lambda s, sp: _work_col(s, 2)),
    "work_x_total": ("work_x_total", "Particles/Time_Integrated_Work_x",
                     "J", lambda s, sp: _work_col(s, 3)),
    "work_y_total": ("work_y_total", "Particles/Time_Integrated_Work_y",
                     "J", lambda s, sp: _work_col(s, 4)),
    "work_z_total": ("work_z_total", "Particles/Time_Integrated_Work_z",
                     "J", lambda s, sp: _work_col(s, 5)),
}


class IOBlockState:
    def __init__(self, block):
        self.block = block
        self.time_prev = 0.0
        self.nstep_prev = 0
        self.first_call = True
        self.dump_at_times = sorted(block.dump_at_times)
        # walltime cadence bookkeeping (io_block%walltime_prev +
        # one-shot dump_at_walltimes, diagnostics.F90:1253-1300)
        self.walltime_prev = 0.0
        self.dump_at_walltimes = sorted(block.dump_at_walltimes)
        # running averages (averaged_data_block, shared_data.F90:286-293)
        self.avg_sum = {}
        self.avg_count = 0

    @property
    def any_average(self):
        return any(m & int(IOType.AVERAGE) for m in self.block.variables.values())


class OutputManager:
    """Drives dump scheduling and SDF writing for all output blocks."""

    def __init__(self, cfg, deck, data_dir, n_zeros=4):
        self.cfg = cfg
        self.deck = deck
        self.data_dir = data_dir
        self.blocks = [IOBlockState(b) for b in deck.outputs]
        self.dump_index = 0
        self.n_zeros = n_zeros
        self.file_list = []
        # lazy global particle-ID assignment (generate_particle_ids,
        # partlist.F90:883): ids are handed out on the first dump that
        # requests them; 0 marks unassigned
        self.id_counter = 1
        # (subset name, species name) -> set of registered particle ids
        # (id_registry, particle_id_hash.F90:88-692)
        self.persistent_members = {}
        # walltime cadences measure elapsed wall-clock since job start
        # (walltime_started, diagnostics.F90:248-251)
        self.walltime_started = time_mod.time()
        os.makedirs(data_dir, exist_ok=True)

    @property
    def elapsed_walltime(self):
        return time_mod.time() - self.walltime_started

    def _assign_ids(self, sim, state):
        aux_names = tuple(getattr(self.cfg, "binned_aux", ()))
        new_species = []
        for s in state.species:
            if hasattr(s, "xi"):
                # binned storage: ids live in the id_lo/id_hi aux rows
                # (binned.decode_ids); assign fresh ids to live slots
                # still at 0, exactly like the scatter branch below
                from ..core.binned import decode_ids, encode_ids
                ids = decode_ids(s.aux, aux_names)
                if ids is None:
                    new_species.append(s)
                    continue
                need = np.asarray(s.w > 0) & (ids == 0)
                n = int(need.sum())
                if n:
                    ids[need] = np.arange(self.id_counter,
                                          self.id_counter + n)
                    self.id_counter += n
                    aux = np.array(s.aux)
                    lo, hi = encode_ids(ids, aux.dtype)
                    aux[aux_names.index("id_lo")] = lo
                    aux[aux_names.index("id_hi")] = hi
                    s = s._replace(aux=jnp.asarray(aux))
                new_species.append(s)
                continue
            ids = np.array(s.id)
            need = np.asarray(s.alive) & (ids == 0)
            n = int(need.sum())
            if n:
                ids[need] = np.arange(self.id_counter,
                                      self.id_counter + n, dtype=ids.dtype)
                self.id_counter += n
            new_species.append(s._replace(id=jnp.asarray(ids)))
        state = state._replace(species=tuple(new_species))
        if sim is not None:
            sim.state = state
        return state

    def accumulate_averages(self, state):
        """average_field accumulation between dumps (diagnostics.F90:1434)."""
        for st in self.blocks:
            if not st.any_average:
                continue
            for var, mask in st.block.variables.items():
                if not (mask & int(IOType.AVERAGE)) or var not in FIELD_VARS:
                    continue
                bid = FIELD_VARS[var][0]
                arr = np.asarray(self.cfg.grid.interior(
                    getattr(state.fields, bid)))
                if var in st.avg_sum:
                    st.avg_sum[var] += arr
                else:
                    st.avg_sum[var] = arr.copy()
            st.avg_count += 1

    def maybe_dump(self, sim, state, last=False, force=False):
        """io_test (diagnostics.F90:1208-1420) — fire any due blocks and
        write one merged dump (the reference merges same-prefix blocks)."""
        self.accumulate_averages(state)
        time = float(state.time)
        step = int(state.step)
        nsteps = self.cfg.nsteps
        last_call = last or time >= self.cfg.t_end or \
            (0 <= nsteps == step)
        merged_mask = {}
        any_dump = False
        elapsed = self.elapsed_walltime
        for st in self.blocks:
            b = st.block
            if b.disabled:
                st.first_call = False
                continue
            dump = force
            if last_call and b.dump_last:
                dump = True
            if st.first_call and b.dump_first:
                dump = True
            while st.dump_at_times and time >= st.dump_at_times[0]:
                st.dump_at_times.pop(0)
                dump = True
            # walltime cadences (diagnostics.F90:1253-1300): interval
            # within [walltime_start, walltime_stop] + one-shot list
            if b.walltime_interval > 0 \
                    and b.walltime_start <= elapsed <= b.walltime_stop \
                    and elapsed - st.walltime_prev >= b.walltime_interval:
                st.walltime_prev = elapsed
                dump = True
            while st.dump_at_walltimes \
                    and elapsed >= st.dump_at_walltimes[0]:
                st.dump_at_walltimes.pop(0)
                dump = True
            for ns in b.dump_at_nsteps:
                if step >= ns:
                    dump = True
                    b.dump_at_nsteps = [n for n in b.dump_at_nsteps if n > step]
                    break
            if b.dt_snapshot > 0 and time >= st.time_prev + b.dt_snapshot:
                while st.time_prev + b.dt_snapshot <= time:
                    st.time_prev += b.dt_snapshot
                if b.time_start <= time <= b.time_stop \
                        and b.nstep_start <= step <= b.nstep_stop:
                    dump = True
            if b.nstep_snapshot > 0 and step >= st.nstep_prev + b.nstep_snapshot:
                while st.nstep_prev + b.nstep_snapshot <= step:
                    st.nstep_prev += b.nstep_snapshot
                dump = True
            st.first_call = False
            if dump:
                any_dump = True
                st.fire_count = getattr(st, "fire_count", 0) + 1
                for var, mask in b.variables.items():
                    merged_mask[var] = merged_mask.get(var, 0) | mask
                # restart dumps: every Nth firing of this block writes a
                # full restart file; rolling restarts alternate between
                # two files (io_block%rolling_restart,
                # shared_data.F90:309, diagnostics.F90 restart logic)
                want_restart = (
                    (b.restart_dump_every > 0
                     and st.fire_count % b.restart_dump_every == 0)
                    or (last_call and b.force_final_to_be_restartable))
                if want_restart:
                    from .checkpoint import write_restart
                    if b.rolling_restart:
                        slot = getattr(st, "roll_slot", 0)
                        st.roll_slot = 1 - slot
                        name = f"{b.file_prefix}roll_restart{slot}.sdf"
                    else:
                        name = (f"{b.file_prefix}restart_"
                                f"{self.dump_index:0{self.n_zeros}d}.sdf")
                    write_restart(
                        os.path.join(self.data_dir, name), self.cfg, state,
                        deck_text=getattr(self.deck, "deck_text", ""),
                        persistent_members=self.persistent_members)
        if any_dump:
            if getattr(state, "window_refill", ()):
                # dumps between a window shift and the next push must show
                # the refilled column the kernels will substitute
                # (window.materialize_refill is idempotent — the live
                # state may keep the materialised arrays)
                from ..core.window import materialize_refill
                state = materialize_refill(state, self.cfg)
            need_ids = "id" in merged_mask and self._fires(merged_mask["id"])
            # persistent subsets track membership by particle id
            # (build_persistent_subsets, diagnostics.F90:2510)
            need_ids |= any(
                s.persist_start_time is not None
                or s.persist_start_step is not None
                for s in self.deck.subsets)
            if need_ids:
                state = self._assign_ids(sim, state)
            self.write_dump(sim, state, merged_mask)
            if self._fires(merged_mask.get("ejected_particles", 0)) \
                    and state.ejected:
                # reset the buffers after writing (reset_ejected,
                # diagnostics.F90:937-941)
                state = state._replace(ejected=tuple(
                    e._replace(alive=e.alive & False,
                               weight=e.weight * 0.0)
                    for e in state.ejected))
                if sim is not None:
                    sim.state = state
        # the state is returned (and sim.state synced) because lazy ID
        # assignment may have amended it; callers step the returned state
        return state

    def _fires(self, mask):
        return (mask & int(IOType.ALWAYS)) != 0

    def write_dump(self, sim, state, mask_map):
        cfg = self.cfg
        grid = cfg.grid
        fname = f"{self.dump_index:0{self.n_zeros}d}.sdf"
        path = os.path.join(self.data_dir, fname)
        w = SDFWriter(path, code_name="Epoch_tpu",
                      step=int(state.step), time=float(state.time))
        # grid (node mesh over the extended domain, diagnostics.F90:772);
        # the dumped mesh tracks the moving window (window.F90:71-85)
        axes = [grid.nodes(d) for d in range(grid.ndims)]
        axes[0] = axes[0] + window_off(cfg, state)
        w.write_plain_mesh("grid", "Grid/Grid", axes)
        self._dump_axes = axes
        self._dump_subset_grids = {}

        species_names = [s.name for s in cfg.species]
        for var, mask in mask_map.items():
            if not self._fires(mask):
                continue
            if var in FIELD_VARS:
                bid, name, units = FIELD_VARS[var]
                arr = np.asarray(grid.interior(getattr(state.fields, bid)))
                self._write_grid_var(w, bid, name, units, arr, mask)
                if mask & int(IOType.AVERAGE):
                    # time-averaged variant (diagnostics.F90 averaged vars)
                    for st in self.blocks:
                        if var in st.avg_sum and st.avg_count > 0:
                            w.write_plain_variable(
                                f"{bid}_averaged", f"{name}_averaged",
                                st.avg_sum[var] / st.avg_count, "grid", units)
                            break
            elif var in DERIVED_VARS or var in VAR_EXPANSIONS:
                for sub in VAR_EXPANSIONS.get(var, (var,)):
                    if sub not in DERIVED_VARS:
                        continue   # particle-side expansion (work_x…)
                    key, name, units = DERIVED_VARS[sub]
                    if mask & int(IOType.SPECIES) \
                            and not key.startswith("poynt"):
                        for i, sname in enumerate(species_names):
                            arr = derived_variable(key, cfg, state, i)
                            self._write_grid_var(
                                w, f"{key}/{sname}", f"{name}/{sname}",
                                units, arr, mask)
                    if not (mask & int(IOType.NO_SUM)):
                        arr = derived_variable(key, cfg, state)
                        self._write_grid_var(w, key, name, units, arr,
                                             mask)
            elif var == "distribution_functions":
                self._write_dist_fns(w, state)
            elif var == "total_energy_sum":
                w.write_constant("total_field_energy",
                                 "Total Field Energy in Simulation (J)",
                                 total_field_energy(cfg, state))
                w.write_constant("total_particle_energy",
                                 "Total Particle Energy in Simulation (J)",
                                 total_particle_energy(cfg, state))
        # laser absorption bookkeeping (diagnostics.F90:884-898)
        if self._fires(mask_map.get("absorption", 0)):
            inj = float(state.lasers.inject_local)
            absd = float(state.lasers.absorb_local)
            frac = absd / inj if inj > 0 else 0.0
            w.write_constant("laser_enTotal",
                             "Absorption/Total Laser Energy Injected (J)",
                             inj)
            w.write_constant("abs_frac",
                             "Absorption/Fraction of Laser Energy "
                             "Absorbed (%)", frac)
        # particle data (VAR_EXPANSIONS may alias a deck key to particle
        # variables: work_done_integrated -> work_x/y/z + totals)
        part_vars = []
        expand_masks = {}
        for v, m in mask_map.items():
            if not self._fires(m):
                continue
            for sub in VAR_EXPANSIONS.get(v, (v,)):
                if sub in PARTICLE_VARS and sub not in part_vars:
                    part_vars.append(sub)
                    expand_masks.setdefault(sub, m)
        for sub, m in expand_masks.items():
            mask_map.setdefault(sub, m)
        if part_vars:
            self._write_particles(w, state, part_vars, mask_map)
        # ejected particles: dumped like a species named ejected_<name>
        # (deck_species_block.F90:268-276) then cleared by maybe_dump
        if self._fires(mask_map.get("ejected_particles", 0)) \
                and state.ejected:
            for i, sp in enumerate(cfg.species):
                buf = state.ejected[i]
                alive = np.asarray(buf.alive)
                nm = f"ejected_{sp.name}"
                mesh_id = f"grid/{nm}"
                w.write_point_mesh(mesh_id, f"Grid/Particles/{nm}",
                                   np.asarray(buf.x)[alive])
                for comp, pn in enumerate(("Px", "Py", "Pz")):
                    w.write_point_variable(
                        f"{pn.lower()}/{nm}", f"Particles/{pn}/{nm}",
                        np.asarray(buf.p)[alive][:, comp], mesh_id,
                        "kg.m/s")
                w.write_point_variable(
                    f"weight/{nm}", f"Particles/Weight/{nm}",
                    np.asarray(buf.weight)[alive], mesh_id, "")
        # probe captures (io/probes.F90:107)
        for pi, plan in enumerate(getattr(cfg, "probe_plans", ()) or ()):
            if pi < len(state.probes):
                buf = state.probes[pi]
                alive = np.asarray(buf.alive)
                coords = np.asarray(buf.x)[alive]
                mesh_id = f"grid/probe/{plan.name}"
                w.write_point_mesh(mesh_id, f"Grid/Probe/{plan.name}", coords)
                for comp, nm in enumerate(("Px", "Py", "Pz")):
                    w.write_point_variable(
                        f"probe/{plan.name}/{nm.lower()}",
                        f"Probe/{plan.name}/{nm}",
                        np.asarray(buf.p)[alive][:, comp], mesh_id, "kg.m/s")
                w.write_point_variable(
                    f"probe/{plan.name}/weight",
                    f"Probe/{plan.name}/Weight",
                    np.asarray(buf.weight)[alive], mesh_id, "")
        # subsets (deck_subset_block.F90; random fraction / box / ranges)
        for sub in self.deck.subsets:
            self._write_subset(w, state, sub)
        # provenance: version/commit/defines bitmask + deck md5
        # (diagnostics.F90:395-397, constants.F90:221-247)
        import hashlib
        from ..utils.version import VERSION, git_commit, defines_bitmask
        deck_md5 = hashlib.md5(
            getattr(self.deck, "deck_text", "").encode()).hexdigest()
        w.write_run_info(version=VERSION, commit_id=git_commit(),
                         deck_md5=deck_md5,
                         defines=defines_bitmask(cfg),
                         run_date=int(time_mod.time()))
        w.close()
        # reset per-window averages after a dump
        for st in self.blocks:
            st.avg_sum = {}
            st.avg_count = 0
        self.file_list.append(fname)
        self.dump_index += 1
        self._update_visit()

    def _write_grid_var(self, w, bid, name, units, arr, mask):
        """write_field analogue (diagnostics.F90:1732-1909): besides the
        plain full-grid dump, emit subset variants for every subset named
        in this variable's dumpmask — Reduced_<sub> (strided sampling,
        ``skip``) or Core_<sub> (trimmed to the subset's spatial box).  A
        Reduced dump suppresses the full-grid copy exactly as the
        reference's dump_skipped logic (:1894-1900); Core dumps do not."""
        grid = self.cfg.grid
        nd = grid.ndims
        dump_skipped = False
        for sub in self.deck.subsets:
            if not sub.mask_bit or not (mask & sub.mask_bit):
                continue
            strides = tuple(sub.skip[:nd]) if sub.skip else (1,) * nd
            if any(s > 1 for s in strides):
                mesh_id = self._subset_grid_mesh(w, sub, strides=strides)
                red = arr[tuple(slice(None, None, s) for s in strides)]
                w.write_plain_variable(f"{bid}/r_{sub.name}",
                                       f"{name}/Reduced_{sub.name}",
                                       red, mesh_id, units)
                dump_skipped = True
            elif sub.space_box:
                rngs = self._subset_cell_ranges(sub)
                if any(hi <= lo for lo, hi in rngs):
                    continue        # empty range (reference CYCLEs)
                mesh_id = self._subset_grid_mesh(w, sub, ranges=rngs)
                trimmed = arr[tuple(slice(lo, hi) for lo, hi in rngs)]
                w.write_plain_variable(f"{bid}/c_{sub.name}",
                                       f"{name}/Core_{sub.name}",
                                       trimmed, mesh_id, units)
        if not dump_skipped:
            w.write_plain_variable(bid, name, arr, "grid", units)

    def _subset_cell_ranges(self, sub):
        """Subset spatial box → per-axis [lo, hi) cell-index ranges
        (cell_global_ranges, diagnostics.F90)."""
        grid = self.cfg.grid
        out = []
        for d in range(grid.ndims):
            lo_i, hi_i = 0, grid.n[d]
            box = sub.space_box.get("xyz"[d])
            if box is not None:
                nodes = self._dump_axes[d]
                if box[0] is not None:
                    lo_i = int(np.searchsorted(nodes, box[0], "left"))
                if box[1] is not None:
                    hi_i = int(np.searchsorted(nodes, box[1], "right")) - 1
                lo_i = max(0, min(lo_i, grid.n[d]))
                hi_i = max(0, min(hi_i, grid.n[d]))
            out.append((lo_i, hi_i))
        return out

    def _subset_grid_mesh(self, w, sub, strides=None, ranges=None):
        """Write the subset's node mesh once per dump (grid/r_<name> for
        strided sets, grid/<name> for trimmed sets) and return its id."""
        key = ("r_" if strides else "") + sub.name
        if key in self._dump_subset_grids:
            return self._dump_subset_grids[key]
        if strides is not None:
            mesh_id = f"grid/r_{sub.name}"
            axes = [self._dump_axes[d][::strides[d]]
                    for d in range(self.cfg.grid.ndims)]
        else:
            mesh_id = f"grid/{sub.name}"
            axes = [self._dump_axes[d][lo:hi + 1]
                    for d, (lo, hi) in enumerate(ranges)]
        w.write_plain_mesh(mesh_id, f"Grid/{sub.name}", axes)
        self._dump_subset_grids[key] = mesh_id
        return mesh_id

    def _write_subset(self, w, state, sub):
        cfg = self.cfg
        import numpy.random as npr
        rng = np.random.default_rng(self.dump_index)
        for sname in sub.include_species:
            try:
                si = [s.name for s in cfg.species].index(sname)
            except ValueError:
                continue
            slab = get_slab(cfg, state, si)
            sp = cfg.species[si]
            keep = np.asarray(slab.alive).copy()
            x = np.asarray(slab.x).copy()
            x[:, 0] += window_off(cfg, state)
            p = np.asarray(slab.p)
            if sub.random_fraction < 1.0:
                keep &= rng.uniform(size=keep.shape) < sub.random_fraction
            for ax, (lo, hi) in sub.space_box.items():
                d = "xyz".index(ax)
                if d < cfg.ndims:
                    if lo is not None:
                        keep &= x[:, d] >= lo
                    if hi is not None:
                        keep &= x[:, d] <= hi
            mc = sp.mass * const.c
            p2 = (p ** 2).sum(1)
            gamma = np.sqrt(1 + p2 / max(mc, 1e-300) ** 2)
            ids = np.asarray(slab.id)
            vals = {"px": p[:, 0], "py": p[:, 1], "pz": p[:, 2],
                    "gamma": gamma,
                    "energy": (gamma - 1) * sp.mass * const.c ** 2,
                    "weight": np.asarray(slab.weight),
                    "id": ids,
                    "charge": np.full(keep.shape, sp.charge),
                    "mass": np.full(keep.shape, sp.mass)}
            for var, (lo, hi) in sub.ranges.items():
                if var in vals:
                    if lo is not None:
                        keep &= vals[var] >= lo
                    if hi is not None:
                        keep &= vals[var] <= hi
            # persistent subsets: membership by id from the persist start
            # (test_particle/diagnostics.F90:2510-2600); once registered a
            # particle stays in the subset for every later dump
            if sub.persist_start_time is not None \
                    or sub.persist_start_step is not None:
                t0 = sub.persist_start_time \
                    if sub.persist_start_time is not None else -np.inf
                s0 = sub.persist_start_step \
                    if sub.persist_start_step is not None else -1
                members = self.persistent_members.setdefault(
                    (sub.name, sname), set())
                if float(state.time) >= t0 and int(state.step) >= s0:
                    members.update(int(i) for i in ids[keep] if i)
                keep = np.asarray(slab.alive) & np.isin(
                    ids, np.fromiter(members, dtype=ids.dtype,
                                     count=len(members)))
            mesh_id = f"grid/{sub.name}/{sname}"
            w.write_point_mesh(mesh_id, f"Grid/{sub.name}/{sname}", x[keep])
            for comp, nm in enumerate(("Px", "Py", "Pz")):
                w.write_point_variable(
                    f"{sub.name}/{nm.lower()}/{sname}",
                    f"{nm}/{sub.name}/{sname}", p[keep][:, comp],
                    mesh_id, "kg.m/s")
            w.write_point_variable(
                f"{sub.name}/weight/{sname}",
                f"Weight/{sub.name}/{sname}",
                np.asarray(slab.weight)[keep], mesh_id, "")

    def _write_particles(self, w, state, part_vars, mask_map):
        """Particle output, paged: the dump never materialises more
        than one page of the slab on the host (the reference streams
        through its sdf iterators, io/iterators.F90:31-474; get_slab
        would haul the whole 10^7–10^8-particle slab per variable)."""
        cfg = self.cfg
        woff = window_off(cfg, state)
        nd = cfg.ndims
        for i, sp in enumerate(cfg.species):
            # pass 0: alive count + coordinate extents (+ dtype probes)
            npart = 0
            mins = [np.inf] * nd
            maxs = [-np.inf] * nd
            first_page = None
            for pg in iter_slab_pages(cfg, state, i):
                if first_page is None:
                    first_page = pg
                al = np.asarray(pg.alive)
                npart += int(al.sum())
                if al.any():
                    x = np.asarray(pg.x)[al]
                    for d in range(nd):
                        mins[d] = min(mins[d], float(x[:, d].min()))
                        maxs[d] = max(maxs[d], float(x[:, d].max()))
            if npart:
                mins[0] += woff
                maxs[0] += woff
            else:
                mins = [0.0] * nd
                maxs = [0.0] * nd
            mesh_id = f"grid/{sp.name}"

            def coord_pages(i=i):
                for pg in iter_slab_pages(cfg, state, i):
                    al = np.asarray(pg.alive)
                    c = np.asarray(pg.x, np.float64)[al]
                    c[:, 0] += woff
                    yield c
            w.write_point_mesh_paged(mesh_id, f"Grid/Particles/{sp.name}",
                                     coord_pages, npart, nd, mins, maxs)
            for var in part_vars:
                if var == "particles":
                    continue
                bid, name, units, getter = PARTICLE_VARS[var]
                probe = np.asarray(getter(first_page, sp))

                def var_pages(getter=getter, i=i, sp=sp):
                    for pg in iter_slab_pages(cfg, state, i):
                        al = np.asarray(pg.alive)
                        yield np.asarray(getter(pg, sp))[al]
                w.write_point_variable_paged(
                    f"{bid}/{sp.name}", f"{name}/{sp.name}", var_pages,
                    npart, mesh_id, units, dtype=probe.dtype)

    def _write_dist_fns(self, w, state):
        cfg = self.cfg
        for dfn in self.deck.dist_fns:
            for sname in dfn.include_species:
                try:
                    si = [s.name for s in cfg.species].index(sname)
                except ValueError:
                    continue
                edges, hist = compute_dist_fn(dfn, cfg, state, si)
                mesh_id = f"grid_{dfn.name}_{sname}"
                w.write_plain_mesh(mesh_id, f"Grid/{dfn.name}/{sname}", edges,
                                   labels=[d.name for d in
                                           dfn.directions[:dfn.ndims]],
                                   units=[""] * len(edges))
                w.write_plain_variable(f"{dfn.name}/{sname}",
                                       f"dist_fn/{dfn.name}/{sname}",
                                       hist, mesh_id, "npart/cell")

    def _update_visit(self):
        path = os.path.join(self.data_dir, "epoch_tpu.visit")
        with open(path, "w") as f:
            f.write("\n".join(self.file_list) + "\n")
