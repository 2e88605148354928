"""Initial particle loading (auto_load).

Host-side (numpy) re-implementation of
``epoch1d/src/user_interaction/helper.F90:95-650`` and the Maxwellian
momentum sampling of ``user_interaction/particle_temperature.F90``:

* per-cell placement: ``npart_per_cell = npart / n_valid_cells`` particles
  uniformly in every valid cell, remainder scattered randomly;
* per-particle weights from the *normalised* shape-interpolated density:
  ``w = density(x_p) * cell_volume / npart_in_cell`` (setup_particle_density,
  helper.F90:651-760);
* momenta sampled per-axis from N(drift, sqrt(kb T m))
  (momentum_from_temperature, particle_temperature.F90:380-390).

Loading happens once at startup on the host; the result is transferred to
device as the initial slab. RNG: numpy Generator (the reference uses the KISS
generator; streams differ, statistics match).
"""
from __future__ import annotations

import math

import numpy as np

from .. import constants as const
from . import shapes
from .state import ParticleSlab, empty_slab


def _eval_on_grid(expr, grid, extra_ctx=None):
    """Evaluate a deck expression on cell centres (interior, no ghosts)."""
    import numpy as xp
    if expr is None:
        return np.zeros(grid.n)
    ctx = dict(extra_ctx or {})
    cs = [grid.centres(d) for d in range(grid.ndims)]
    if grid.ndims == 1:
        ctx.setdefault("x", cs[0])
    elif grid.ndims == 2:
        X, Y = np.meshgrid(cs[0], cs[1], indexing="ij")
        ctx.setdefault("x", X)
        ctx.setdefault("y", Y)
    else:
        X, Y, Z = np.meshgrid(cs[0], cs[1], cs[2], indexing="ij")
        ctx.setdefault("x", X)
        ctx.setdefault("y", Y)
        ctx.setdefault("z", Z)
    _add_geom_ctx(ctx, grid)
    val = expr(ctx, xp=xp)
    return np.broadcast_to(np.asarray(val, float), grid.n).copy()


def _add_geom_ctx(ctx, grid, time=0.0):
    names = ["x", "y", "z"]
    for d in range(grid.ndims):
        ctx.setdefault(f"{names[d]}_min", grid.lo[d])
        ctx.setdefault(f"{names[d]}_max", grid.hi[d])
        ctx.setdefault(f"d{names[d]}", grid.delta[d])
        ctx.setdefault(f"length_{names[d]}", grid.hi[d] - grid.lo[d])
        ctx.setdefault(f"length{names[d]}", grid.hi[d] - grid.lo[d])
        ctx.setdefault(f"n{names[d]}", float(grid.n[d]))
    ctx.setdefault("time", time)


def _eval_at_points(expr, pts, grid, default=0.0, time=0.0,
                    grid_cache=None):
    """Evaluate a deck expression at particle positions (N, ndims).

    ``grid_cache`` entries holding whole-grid arrays (density:<sp>,
    temp_x:<sp>, ... species cross-references) are sampled at the
    particle cells (NGP) so expressions like temperature_x(Electron)
    resolve (deck_species_block species functions)."""
    import numpy as xp
    if expr is None:
        return np.full(pts.shape[0], default)
    ctx = {}
    names = ["x", "y", "z"]
    for d in range(grid.ndims):
        ctx[names[d]] = pts[:, d]
    _add_geom_ctx(ctx, grid, time)
    if grid_cache:
        cell = tuple(
            np.clip(np.floor((pts[:, d] - grid.grid_min(d))
                             / grid.delta[d] + 0.5).astype(int),
                    0, grid.n[d] - 1)
            for d in range(grid.ndims))
        for k, g in grid_cache.items():
            ga = np.asarray(g)
            if ga.shape == tuple(grid.n):
                ctx[k] = ga[cell]
            else:
                ctx[k] = g
    val = expr(ctx, xp=xp)
    return np.broadcast_to(np.asarray(val, float), (pts.shape[0],)).copy()


def sample_maxwellian(rng, mass, temp, drift):
    """p ~ N(drift, sqrt(kb T m)) (particle_temperature.F90:380-390)."""
    std = np.sqrt(np.maximum(temp, 0.0) * const.kb * mass)
    return rng.normal(loc=drift, scale=std)


def sample_maxwell_juettner(rng, mass, temp, n, cutoff=20.0):
    """Relativistic Maxwell-Jüttner |p| sampling
    (momentum_from_temperature_relativistic,
    particle_temperature.F90:213-318): f(p) ∝ p² exp(−γ mc²/kT), inverted
    numerically per temperature; isotropic direction."""
    mc = mass * const.c
    theta = np.maximum(temp, 1.0) * const.kb / (mass * const.c ** 2)
    p_out = np.zeros((n, 3))
    # group identical temperatures for table reuse
    theta_u, inv = np.unique(np.round(theta, 12), return_inverse=True)
    for ti, th in enumerate(theta_u):
        sel = inv == ti
        m = int(sel.sum())
        if m == 0 or th <= 0:
            continue
        umax = cutoff * max(np.sqrt(th * (th + 2)), th * cutoff / 4 + 1.0)
        u = np.linspace(0, umax, 4096)
        gam = np.sqrt(1.0 + u ** 2)
        pdf = u ** 2 * np.exp(-(gam - 1.0) / th)
        cdf = np.cumsum(pdf)
        cdf /= cdf[-1]
        r = rng.uniform(size=m)
        mag = np.interp(r, cdf, u) * mc
        # isotropic directions
        mu = rng.uniform(-1, 1, m)
        phi = rng.uniform(0, 2 * np.pi, m)
        s = np.sqrt(1 - mu ** 2)
        p_out[sel, 0] = mag * s * np.cos(phi)
        p_out[sel, 1] = mag * s * np.sin(phi)
        p_out[sel, 2] = mag * mu
    return p_out


def drift_lorentz_transform(p, mass, drift_p):
    """Boost sampled momenta into a drifting frame
    (drift_lorentz_transform, particle_temperature.F90:324-376)."""
    mc = mass * const.c
    pd = np.asarray(drift_p, float)
    pd_mag2 = (pd ** 2).sum()
    if pd_mag2 == 0:
        return p
    gd = np.sqrt(1.0 + pd_mag2 / mc ** 2)
    vd = pd / (mass * gd)
    beta = np.linalg.norm(vd) / const.c
    nhat = pd / np.sqrt(pd_mag2)
    gam = np.sqrt(1.0 + (p ** 2).sum(1) / mc ** 2)
    p_par = p @ nhat
    e = gam * mass * const.c ** 2
    p_par_new = gd * (p_par + beta * e / const.c)
    return p + np.outer(p_par_new - p_par, nhat)


def flux_maxwellian(rng, mass, temp, drift, direction):
    """Rayleigh-weighted inflow momentum for thermal/injector boundaries
    (flux_momentum_from_temperature, particle_temperature.F90:401-452).
    Zero-drift specialisation: p = dir * sigma * sqrt(-2 ln(1-u))."""
    sigma = np.sqrt(np.maximum(temp, 0.0) * const.kb * mass)
    u = rng.uniform(size=np.shape(drift) if np.ndim(drift) else None)
    return direction * sigma * np.sqrt(-2.0 * np.log(1.0 - u))


def build_species_caches(species_blocks, grid):
    """Evaluate every species' density and temperature grids with
    cross-references (density(X), temperature_x(X)) resolved by fixed
    point: merged/re-opened species blocks may reference species declared
    *later* in the deck, so iterate until no new entry resolves."""
    from ..deck.expr import DeckExprError
    cache = {}
    for _ in range(max(len(species_blocks), 1)):
        progress = False
        for sp in species_blocks:
            if f"density:{sp.name}" not in cache:
                try:
                    cache[f"density:{sp.name}"] = species_density(
                        sp, grid, cache)
                    progress = True
                except (DeckExprError, KeyError):
                    pass
            for ti, tnm in enumerate("xyz"):
                key = f"temp_{tnm}:{sp.name}"
                if key in cache or sp.temp[ti] is None:
                    continue
                try:
                    cache[key] = _eval_on_grid(sp.temp[ti], grid,
                                               extra_ctx=cache)
                    progress = True
                except (DeckExprError, KeyError):
                    pass
        if not progress:
            break
    return cache


def species_density(sp_block, grid, dens_cache=None):
    """Evaluate the (possibly layered, self/cross-referencing) density
    expressions on the grid: `number_density = ...` lines are applied in
    deck order with `density(species)` resolving to the previously
    evaluated array (deck_species_block density stacking)."""
    layers = getattr(sp_block, "density_layers", None) or \
        ([sp_block.density] if sp_block.density is not None else [])
    ctx = dict(dens_cache or {})
    dens = np.zeros(grid.n)
    for layer in layers:
        ctx[f"density:{sp_block.name}"] = dens
        dens = _eval_on_grid(layer, grid, extra_ctx=ctx)
    return dens


def load_species(sp_block, grid, rng, dtype, cap_headroom=1.25,
                 dens_cache=None):
    """auto_load for one species → ParticleSlab arrays (numpy)."""
    nd = grid.ndims
    n_cells = int(np.prod(grid.n))
    density = species_density(sp_block, grid, dens_cache)
    if sp_block.density_max > 0:
        density = np.minimum(density, sp_block.density_max)
    # zero-density cells are NOT loaded: the reference's auto_load skips
    # cells below the rounding threshold (helper.F90:497-530); keeping
    # them produced alive w=0 placeholders that cost push time and
    # polluted probe captures (round-2 known gap #5)
    valid = (density >= max(sp_block.density_min, 0.0)) & (density > 0.0)
    density = np.where(valid, density, 0.0)
    n_valid = int(valid.sum())

    if sp_block.npart_per_cell >= 0:
        npc = sp_block.npart_per_cell
        total = int(math.floor(npc * n_valid))
    elif sp_block.npart > 0:
        npc = sp_block.npart / max(n_valid, 1)
        total = sp_block.npart
    else:
        npc = 0
        total = 0

    npc_int = int(math.floor(npc))
    cap = max(256, int(math.ceil(total * cap_headroom / 128.0)) * 128)
    if total == 0 or n_valid == 0:
        return None, cap

    valid_idx = np.argwhere(valid)          # (n_valid, nd)
    # base placement: npc_int per valid cell (helper.F90:497-530)
    base = np.repeat(valid_idx, npc_int, axis=0) if npc_int > 0 else \
        np.zeros((0, nd), int)
    n_left = total - base.shape[0]
    if n_left > 0:
        extra = valid_idx[rng.integers(0, n_valid, size=n_left)]
        cells = np.concatenate([base, extra], axis=0)
    else:
        cells = base[:total]

    # uniform position inside each cell (helper.F90:516)
    pos = np.empty((total, nd))
    for d in range(nd):
        centres = grid.grid_min(d) + cells[:, d] * grid.delta[d]
        pos[:, d] = centres + (rng.uniform(size=total) - 0.5) * grid.delta[d]

    # weights: normalised shape-interpolated density * dV / npart_in_cell
    # (setup_particle_density, helper.F90:651-760)
    dens_at = _interp_density(density, pos, grid)
    counts = np.zeros(grid.n, dtype=np.int64)
    np.add.at(counts, tuple(cells[:, d] for d in range(nd)), 1)
    cnt_at = counts[tuple(cells[:, d] for d in range(nd))]
    weight = dens_at * grid.cell_volume / np.maximum(cnt_at, 1)

    # momenta (setup_particle_temperature[-relativistic] + drift)
    p = np.zeros((total, 3))
    if getattr(sp_block, "dist_fn", None) is not None:
        p = sample_dist_fn(sp_block, pos, grid, rng)
        drift_vec = np.stack(
            [_eval_at_points(sp_block.drift[i], pos, grid, default=0.0,
                             grid_cache=dens_cache)
             for i in range(3)], axis=1)
        if np.any(drift_vec):
            # mean-drift boost (the reference folds the drift into the
            # rejection acceptance, sample_from_deck_expression :511-517;
            # a deterministic boost reproduces the mean flow)
            p = drift_lorentz_transform(p, sp_block.mass,
                                        drift_vec.mean(0))
    elif getattr(sp_block, "use_maxwell_juettner", False):
        temp = _eval_at_points(sp_block.temp[0], pos, grid, default=0.0,
                               grid_cache=dens_cache)
        p = sample_maxwell_juettner(rng, sp_block.mass, temp, total,
                                    cutoff=sp_block.fractional_tail_cutoff)
        drift_vec = [float(np.mean(_eval_at_points(
            sp_block.drift[i], pos, grid, default=0.0))) for i in range(3)]
        p = drift_lorentz_transform(p, sp_block.mass, drift_vec)
    else:
        for i in range(3):
            temp = _eval_at_points(sp_block.temp[i], pos, grid,
                                   default=0.0, grid_cache=dens_cache)
            drift = _eval_at_points(sp_block.drift[i], pos, grid, default=0.0)
            p[:, i] = sample_maxwellian(rng, sp_block.mass, temp, drift)

    arrs = dict(
        x=pos.astype(dtype),
        p=p.astype(dtype),
        weight=weight.astype(dtype),
        alive=np.ones(total, bool),
    )
    if getattr(sp_block, "density_back", 0.0):
        # delta-f phase-space volumes: pvol = 1 / (marker distribution)
        # with the *local* loading temperature/drift
        # (deltaf_load, deltaf_loader.F90:53-137)
        m = sp_block.mass
        two_kb_mass = 2.0 * const.kb * m
        temps, drifts = [], []
        for i in range(3):
            temps.append(np.maximum(_eval_at_points(
                sp_block.temp[i], pos, grid, default=0.0,
                grid_cache=dens_cache), 1e-300))
            drifts.append(_eval_at_points(
                sp_block.drift[i], pos, grid, default=0.0))
        expo = sum((p[:, i] - drifts[i]) ** 2 / temps[i]
                   for i in range(3)) / two_kb_mass
        norm = np.sqrt((np.pi * two_kb_mass) ** 3
                       * temps[0] * temps[1] * temps[2])
        dist = np.exp(-expo) * cnt_at / grid.cell_volume / norm
        arrs["pvol"] = (1.0 / np.maximum(dist, 1e-300)).astype(dtype)
    return arrs, cap


def _interp_density(density, pos, grid):
    """Shape-weighted density at particle positions with *normalised*
    weights (gxfac.inc) — periodic wrap of the cell index for lookups."""
    nd = grid.ndims
    shp = grid.shape_fn
    fac1 = shapes.FAC_1D[shp]
    offs = shapes.support_offsets(shp)
    out = np.zeros(pos.shape[0])
    # per-axis cells/weights
    cells, ws = [], []
    for d in range(nd):
        r = (pos[:, d] - grid.grid_min(d)) / grid.delta[d]
        if shp == const.Shape.TOPHAT:
            r = r - 0.5
        c = np.floor(r + 0.5)
        cf = c - r
        cells.append(c.astype(int))
        # evaluate weights at each support offset (normalised by fac1)
        w = np.stack([_np_weight(shp, cf, o) for o in offs], axis=1) * fac1
        ws.append(w)
    # accumulate over the support product
    import itertools
    for combo in itertools.product(range(len(offs)), repeat=nd):
        idx = tuple(np.mod(cells[d] + offs[combo[d]], grid.n[d]) for d in range(nd))
        w = np.ones(pos.shape[0])
        for d in range(nd):
            w = w * ws[d][:, combo[d]]
        out += w * density[idx]
    return out


def _np_weight(shp, cf, r):
    if shp == const.Shape.TRIANGLE:
        cf2 = cf * cf
        table = {-1: 0.25 + cf2 + cf, 0: 1.5 - 2.0 * cf2, 1: 0.25 + cf2 - cf}
        return table[r]
    if shp == const.Shape.TOPHAT:
        table = {0: 0.5 + cf, 1: 0.5 - cf}
        return table[r]
    cf2 = cf * cf
    table = {
        -2: (0.5 + cf) ** 4,
        -1: 4.75 + 11.0 * cf + 4.0 * cf2 * (1.5 - cf - cf2),
        0: 14.375 + 6.0 * cf2 * (cf2 - 2.5),
        1: 4.75 - 11.0 * cf + 4.0 * cf2 * (1.5 + cf - cf2),
        2: (0.5 - cf) ** 4,
    }
    return table[r]


def load_from_file(pff, grid, base_dir=""):
    """particles_from_file loader (custom_particle_load,
    helper.F90:763-930 + simple_io.F90:109-180): raw binary files of
    float64 records, one per particle, byte ``offset`` skipped.

    Replaces the species' auto_load entirely.  Returns the same arrs
    dict as load_species plus optional ``id``."""
    import os

    def read_f8(key):
        path = getattr(pff, key)
        if not path:
            return None
        full = path if os.path.isabs(path) else os.path.join(base_dir, path)
        if not os.path.exists(full):
            raise FileNotFoundError(
                f"particles_from_file: {key} file {full!r} not found")
        return np.fromfile(full, dtype=np.float64,
                           offset=pff.offsets.get(key, 0))

    x = read_f8("x_data")
    w = read_f8("w_data")
    n = x.shape[0]
    if w.shape[0] != n:
        raise ValueError(
            f"particles_from_file for {pff.species!r}: x_data has {n} "
            f"records but w_data has {w.shape[0]}")
    nd = grid.ndims
    pos = np.zeros((n, nd))
    pos[:, 0] = x
    for d, key in ((1, "y_data"), (2, "z_data")):
        if d < nd:
            arr = read_f8(key)
            if arr is not None:
                if arr.shape[0] != n:
                    raise ValueError(
                        f"particles_from_file for {pff.species!r}: "
                        f"{key} record count mismatch")
                pos[:, d] = arr
    p = np.zeros((n, 3))
    for c, key in enumerate(("px_data", "py_data", "pz_data")):
        arr = read_f8(key)
        if arr is not None:
            if arr.shape[0] != n:
                raise ValueError(
                    f"particles_from_file for {pff.species!r}: "
                    f"{key} record count mismatch")
            p[:, c] = arr
    arrs = dict(x=pos, p=p, weight=w, alive=np.ones(n, bool))
    if pff.id_data:
        full = pff.id_data if os.path.isabs(pff.id_data) \
            else os.path.join(base_dir, pff.id_data)
        dt = np.int32 if pff.id_4byte else np.int64
        ids = np.fromfile(full, dtype=dt,
                          offset=pff.offsets.get("id_data", 0))
        if ids.shape[0] != n:
            raise ValueError(
                f"particles_from_file for {pff.species!r}: id record "
                f"count mismatch")
        arrs["id"] = ids.astype(np.int64)
    return arrs


def sample_dist_fn(sp_block, pos, grid, rng, max_its=2000):
    """Accept-reject sampling of an arbitrary deck momentum distribution
    (setup_particle_dist_fn, particle_temperature.F90:133-209 +
    sample_from_deck_expression :458-524): uniform candidates over the
    dist_fn_p*_range boxes accepted with probability dist_fn(p) — the
    deck normalises the expression to a peak of <= 1, as the reference
    requires."""
    import numpy as xp
    n = pos.shape[0]
    names = ["x", "y", "z"]
    base_ctx = {}
    for d in range(grid.ndims):
        base_ctx[names[d]] = pos[:, d]
    _add_geom_ctx(base_ctx, grid)

    los = np.zeros((n, 3))
    his = np.zeros((n, 3))
    for c in range(3):
        rng_c = sp_block.dist_fn_ranges[c]
        if rng_c is None:
            continue
        los[:, c] = np.broadcast_to(
            np.asarray(rng_c[0](base_ctx, xp=xp), float), (n,))
        his[:, c] = np.broadcast_to(
            np.asarray(rng_c[1](base_ctx, xp=xp), float), (n,))

    p = los.copy()           # zero-width components stay at their lo (0)
    todo = np.ones(n, bool)
    for _ in range(max_its):
        m = int(todo.sum())
        if m == 0:
            break
        cand = los[todo] + rng.uniform(size=(m, 3)) * (his[todo]
                                                       - los[todo])
        ctx = dict(base_ctx)
        for d in range(grid.ndims):
            ctx[names[d]] = pos[todo, d]
        ctx["px"], ctx["py"], ctx["pz"] = cand[:, 0], cand[:, 1], cand[:, 2]
        prob = np.broadcast_to(
            np.asarray(sp_block.dist_fn(ctx, xp=xp), float), (m,))
        acc = rng.uniform(size=m) <= prob
        idx = np.flatnonzero(todo)[acc]
        p[idx] = cand[acc]
        left = todo.copy()
        left[idx] = False
        todo = left
    if todo.any():
        raise RuntimeError(
            f"dist_fn sampling for species {sp_block.name!r} failed to "
            f"converge for {int(todo.sum())} particles after {max_its} "
            f"iterations; is the distribution normalised to peak <= 1?")
    return p
