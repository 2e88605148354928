"""Cell-binned dense particle engine — the TPU-native hot path.

The reference walks per-particle linked lists with scalar gather/scatter
(particles.F90:199-514).  XLA's general gather/scatter is element-serialised
on TPU (~4 M particle·ops/s measured), so this engine re-designs the data
layout instead of the loop: particles live in a dense per-cell slot grid
with **component- and slot-major layout** so the grid axes are the minor
(lane-tiled) dimensions:

    w  : (K, nx[, ny[, nz]])        weight (0 ⇒ empty slot)
    xi : (nd, K, nx[, ny[, nz]])    position fraction within own cell
    p  : (3,  K, nx[, ny[, nz]])    momentum

With particles binned by their (unstaggered) cell, every irregular memory
access becomes dense:

* field gather = Σ over the static shape-function window of
  ``weight(ξ) · roll(field, offset)`` — pure VPU elementwise work;
* the PSC charge-conserving deposition (solving dρ/dt = −∇·J via running
  sums of shape-function differences, particles.F90:429-514) is evaluated in
  closed form: the axis running sums factor into cumulative per-axis weight
  vectors, so every window offset is an independent product → K-reduction →
  roll, with no sequential accumulation chains;
* the CFL guarantee (≤1 cell/step) makes re-binning a *local* exchange:
  per axis, 3 rolled candidate sets are compacted back to K slots with one
  lax.sort along the slot axis.

Periodic boundaries are implicit in the rolls; bounded domains are the
scatter engine's job (engine selection in core/sim.py).
"""
from __future__ import annotations

import itertools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants as const
from . import shapes
from .state import ParticleSlab

Shape = const.Shape


class BinnedSpecies(NamedTuple):
    xi: jax.Array    # (nd, K, *grid) ξ = r - cell ∈ [-0.5, 0.5)
    p: jax.Array     # (3, K, *grid)
    w: jax.Array     # (K, *grid); 0 = dead
    n_dropped: jax.Array  # scalar counter of overflow-dropped particles
    # optional per-particle auxiliary rows (optical depths for QED/
    # bremsstrahlung/trident — the slot-grid analogue of the reference's
    # compile-gated particle fields, shared_data.F90:94-136); None when the
    # run needs none, (n_aux, K, *grid) otherwise.  Row meanings are the
    # config's ``binned_aux`` tuple (BinnedPlan.aux_idx).
    aux: jax.Array | None = None
    # carried halo side columns for the fused-kernel fast path: the
    # kernel OUTPUTS its post-push halo source columns each step so the
    # next step reads them directly instead of re-staging them from the
    # slot arrays XLA-side (~0.1 ms/step of pure layout copies at bench
    # shapes).  Tuple layout = PallasBinned.stage_sides; None whenever
    # the columns may be stale (any XLA-side slot mutation) — engines
    # only carry sides on decks where nothing touches the slot state
    # between kernel invocations (binned.sides_carry_capable).
    sides: tuple | None = None

    @property
    def K(self):
        return self.w.shape[0]


def _tri(cf, r):
    """Triangle (TSC) weight at integer offset r (gx.inc)."""
    cf2 = cf * cf
    return jnp.where(r == -1, 0.25 + cf2 + cf,
           jnp.where(r == 0, 1.5 - 2.0 * cf2,
           jnp.where(r == 1, 0.25 + cf2 - cf, 0.0)))


def _weight(shape, cf, r):
    if shape == Shape.TRIANGLE:
        return _tri(cf, r)
    return shapes.weight_at(shape, cf, r)


def _tri_const(cf, r: int):
    """Triangle weight at a *compile-time* integer offset: resolves to one
    polynomial (or zero) at trace time — no runtime selects."""
    if r == -1:
        return 0.25 + cf * cf + cf
    if r == 0:
        return 1.5 - 2.0 * cf * cf
    if r == 1:
        return 0.25 + cf * cf - cf
    return None     # outside support


def _w_rel(cf, o: int, base, base_vals):
    """Weight at offset ``o`` relative to an integer array ``base`` whose
    values are restricted to ``base_vals``: select between the concrete
    polynomials for each possible base value."""
    out = None
    for bv in base_vals:
        poly = _tri_const(cf, o - bv)
        if poly is None:
            continue
        term = jnp.where(base == bv, poly, 0.0)
        out = term if out is None else out + term
    if out is None:
        return jnp.zeros_like(cf)
    return out


class BinnedPlan:
    """Static scalars (mirror of push.PushPlan)."""

    def __init__(self, cfg):
        grid = cfg.grid
        self.nd = grid.ndims
        self.shape = grid.shape_fn
        if self.shape != Shape.TRIANGLE:
            raise NotImplementedError("binned engine: triangle shape only")
        self.n = grid.n
        # plain Python floats throughout: a np.float64 scalar (e.g. a dt
        # computed through np.sqrt) is strongly typed in JAX and silently
        # promotes every downstream product to f64 under x64 — the
        # FutureWarning'd f64→f32 scatter in the deposit came from here
        self.dt = float(cfg.dt)
        self.delta = tuple(float(d) for d in grid.delta)
        self.grid_min = tuple(float(grid.grid_min(d))
                              for d in range(self.nd))
        self.fac = float(shapes.FAC_1D[self.shape] ** self.nd)
        # slot-overflow policy: merge folds beyond-K candidates into the
        # cell's last slot (weight/charge/momentum-conserving) instead
        # of dropping them (deck key bin_overflow)
        self.merge_overflow = \
            getattr(cfg, "bin_overflow", "drop") == "merge"
        self.dto2 = float(cfg.dt / 2.0)
        self.dtco2 = float(const.c * self.dto2)
        d = grid.delta
        if self.nd == 1:
            self.fj = (self.fac / cfg.dt, self.fac / d[0], self.fac / d[0])
        elif self.nd == 2:
            self.fj = (self.fac / (cfg.dt * d[1]), self.fac / (cfg.dt * d[0]),
                       self.fac / (d[0] * d[1]))
        else:
            self.fj = (self.fac / (cfg.dt * d[1] * d[2]),
                       self.fac / (cfg.dt * d[0] * d[2]),
                       self.fac / (cfg.dt * d[0] * d[1]))
        self.fj = tuple(float(v) for v in self.fj)
        self.higuera_cary = bool(getattr(cfg, "use_higuera_cary", False))
        # auxiliary per-particle row layout (optical depths etc.)
        self.aux_names = tuple(getattr(cfg, "binned_aux", ()))
        self.aux_idx = {nm: i for i, nm in enumerate(self.aux_names)}
        self.n_aux = len(self.aux_names)
        # One rebin per step, placed right AFTER the half-drift: between two
        # rebin points the particle moves at most one full step (≤1 cell by
        # CFL), so the rebin still only needs the 3 axis-neighbour candidate
        # sets, while the gather then sees ξ ∈ [-0.5, 0.5) exactly (c1 ≡ 0:
        # unstaggered support −1..1, staggered c2 ∈ {-1,0}: support −2..1)
        # and the deposition at t+1.5dt sees c3 ∈ {-1,0,1} (window −2..2,
        # matching the reference's support+2, particles.F90:79-83).  This
        # halves the window area versus rebinning at the end of the step
        # (5×5→≤4×4 gather, 7×7→5×5 deposit) at identical sort cost.
        self.g_offsets = (-1, 0, 1)
        self.h_offsets = (-2, -1, 0, 1)
        self.offsets = tuple(range(-2, 3))
        # kill/reflect boundary cell per axis side.  Particles live on the
        # FULL grid including any CPML layer: the reference removes them
        # only beyond the outer ghost edge (boundary.F90:1076-1090 —
        # x_min/max_local merely routes MPI exchange), and the moving
        # window refills the last grid cell, which sits inside the CPML
        # layer under cpml_outflow (window.F90:227 pack_ix = nx).
        self.kb = tuple((0, grid.n[d] - 1) for d in range(self.nd))
        # slot-grid extents: the fused kernel's stripe (sublane) blocks
        # must be 8-aligned on TPU, so bounded-x 2D decks pad the slot
        # grid's x axis with dead columns to a multiple of 8 (CPML makes
        # nx = nx_user + 2*thickness, rarely aligned).  Pad columns sit
        # beyond the hi-side kill boundary, so no particle ever lives
        # there; periodic-x decks cannot pad (the rebin roll would route
        # through the dead columns) and keep ns = n.
        pad_x = 0
        if self.nd == 2 and self.n[0] % 8 != 0 and cfg.species:
            per = const.BC.PERIODIC
            if all(sp.bc_particle[0] != per and sp.bc_particle[1] != per
                   for sp in cfg.species):
                pad_x = -self.n[0] % 8
        self.ns = (self.n[0] + pad_x,) + tuple(self.n[1:])

    def grid_axis(self, d):
        """Array axis of grid dimension d in (K, *grid) arrays."""
        return 1 + d


# ---------------------------------------------------------------------------
# conversion to/from flat slabs (host-side setup & diagnostics)
# ---------------------------------------------------------------------------

def bin_from_arrays(x, p, w, grid, K, n_aux: int = 0,
                    ns=None, aux_vals=None) -> BinnedSpecies:
    """Host-side: place flat particle arrays into the slot grid.

    ``ns``: slot-grid extents (BinnedPlan.ns) — ≥ grid.n, with dead
    pad columns beyond the real cells (see BinnedPlan).
    ``aux_vals``: optional {aux_row_index: (N,) per-particle values}
    scattered into the aux rows alongside the particles (delta-f
    phase-space volumes; everything else lazily re-samples from 0)."""
    nd = grid.ndims
    n = ns if ns is not None else grid.n
    x = np.asarray(x)
    r = np.stack([(x[:, d] - grid.grid_min(d)) / grid.delta[d]
                  for d in range(nd)], axis=1)
    cell = np.floor(r + 0.5).astype(np.int64)
    xi = r - cell
    cell = np.stack([np.mod(cell[:, d], n[d]) for d in range(nd)], axis=1)
    flat_cell = np.zeros(x.shape[0], np.int64)
    for d in range(nd):
        flat_cell = flat_cell * n[d] + cell[:, d]
    order = np.argsort(flat_cell, kind="stable")
    C = int(np.prod(n))
    counts = np.bincount(flat_cell, minlength=C)
    ndrop = int(np.maximum(counts - K, 0).sum())
    starts = np.zeros(C + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    pos_sorted = np.arange(x.shape[0]) - starts[flat_cell[order]]
    keep = pos_sorted < K
    # clamp host-side f64 staging to the device dtype: jnp.asarray
    # silently truncates arrays but jnp.zeros warns (and future-errors)
    # on an unavailable explicit f64 request
    dtype = np.asarray(p).dtype
    if dtype == np.float64 and not jax.config.jax_enable_x64:
        dtype = np.dtype(np.float32)
    xi_g = np.zeros((nd, K, C), dtype)
    p_g = np.zeros((3, K, C), dtype)
    w_g = np.zeros((K, C), dtype)
    idx_part = order[keep]
    idx_cell = flat_cell[idx_part]
    idx_slot = pos_sorted[keep]
    for d in range(nd):
        xi_g[d, idx_slot, idx_cell] = xi[idx_part, d]
    for i in range(3):
        p_g[i, idx_slot, idx_cell] = np.asarray(p)[idx_part, i]
    w_g[idx_slot, idx_cell] = np.asarray(w)[idx_part]
    g = tuple(n)
    aux = None
    if n_aux:
        aux_g = np.zeros((n_aux, K, C), dtype)
        for row, vals in (aux_vals or {}).items():
            aux_g[row, idx_slot, idx_cell] = np.asarray(vals)[idx_part]
        aux = jnp.asarray(aux_g.reshape((n_aux, K) + g))
    return BinnedSpecies(
        xi=jnp.asarray(xi_g.reshape((nd, K) + g)),
        p=jnp.asarray(p_g.reshape((3, K) + g)),
        w=jnp.asarray(w_g.reshape((K,) + g)),
        n_dropped=jnp.asarray(ndrop, jnp.int32),
        aux=aux,
    )


# particle ids ride the slot grid as two float-encoded aux rows of
# ID_BITS each (exact: 2^20 < 2^24, the f32 integer range) — the slot
# analogue of the reference's 64-bit particle%id (partlist.F90:883)
ID_BITS = 20


def decode_ids(aux, aux_names):
    """(n_aux, ...) aux stack -> int64 id array, or None without rows."""
    if aux is None or "id_lo" not in aux_names:
        return None
    lo = np.asarray(aux[aux_names.index("id_lo")], np.int64)
    hi = np.asarray(aux[aux_names.index("id_hi")], np.int64)
    return lo + (hi << ID_BITS)


def encode_ids(ids, dtype):
    """int64 id array -> (lo, hi) float rows."""
    ids = np.asarray(ids, np.int64)
    mask = (1 << ID_BITS) - 1
    return ((ids & mask).astype(dtype), (ids >> ID_BITS).astype(dtype))


def as_slab(binned: BinnedSpecies, grid, periodic=None,
            aux_names=(), xsl=None) -> ParticleSlab:
    """Flat ParticleSlab view for diagnostics / IO (host-side).

    ``xsl=(x0, x1)`` restricts the view to grid-x columns [x0, x1) —
    the paged-dump iterator's unit (io/iterators.F90 analogue: bounded
    host memory per page instead of materialising the whole slab)."""
    x, p, w, alive = to_flat(binned, grid, periodic=periodic, xsl=xsl)
    n = x.shape[0]
    od = {nm: jnp.zeros(n, x.dtype)
          for nm in ("opdepth", "opdepth_brem", "opdepth_tri", "pvol")}
    ids = None
    if binned.aux is not None:
        x0, x1 = xsl if xsl is not None else (0, grid.n[0])
        crop = (slice(x0, x1),) + tuple(slice(0, gn) for gn in grid.n[1:])
        for i, nm in enumerate(aux_names):
            if nm in od:
                od[nm] = jnp.asarray(
                    np.asarray(binned.aux[i][(slice(None),) + crop])
                    .reshape(-1))
        cropped = np.asarray(
            binned.aux[(slice(None), slice(None)) + crop])
        cropped = cropped.reshape(cropped.shape[0], -1)
        ids = decode_ids(cropped, aux_names)
    return ParticleSlab(
        x=jnp.asarray(x), p=jnp.asarray(p), weight=jnp.asarray(w),
        alive=jnp.asarray(alive),
        id=jnp.zeros(n, jnp.int32) if ids is None else jnp.asarray(ids),
        opdepth=od["opdepth"],
        opdepth_brem=od["opdepth_brem"],
        opdepth_tri=od["opdepth_tri"],
        pvol=od["pvol"],
    )


def to_flat(binned: BinnedSpecies, grid, periodic=None, xsl=None):
    """Flat (host) view for diagnostics: absolute positions, p, w, alive.

    ξ may overhang the bin by up to one CFL step between rebins; periodic
    axes wrap the absolute position into [lo, hi) to match the scatter
    engine's particle_bcs convention (boundary.F90:1074-1096).
    ``xsl=(x0, x1)``: restrict to grid-x columns [x0, x1) — the device
    slice happens BEFORE the host pull, so paged dumps transfer and
    materialise only the page.
    """
    nd = grid.ndims
    n = grid.n
    K = binned.K
    x0, x1 = xsl if xsl is not None else (0, n[0])
    # strip slot-grid pad columns (BinnedPlan.ns) down to the real cells
    crop = (slice(x0, x1),) + tuple(slice(0, n[d]) for d in range(1, nd))
    nloc = (x1 - x0,) + tuple(n[1:])
    C = int(np.prod(nloc))
    xi = np.asarray(binned.xi[(slice(None), slice(None)) + crop]) \
        .reshape(nd, K, C)
    w = np.asarray(binned.w[(slice(None),) + crop]).reshape(K, C)
    p = np.asarray(binned.p[(slice(None), slice(None)) + crop]) \
        .reshape(3, K, C)
    cells = np.indices(nloc).reshape(nd, C)    # (nd, C)
    cells[0] += x0
    x = np.zeros((nd, K, C))
    for d in range(nd):
        x[d] = grid.grid_min(d) + (cells[d][None, :] + xi[d]) * grid.delta[d]
        if periodic is None or periodic[d]:
            length = n[d] * grid.delta[d]
            lo = grid.lo[d]
            x[d] = lo + np.mod(x[d] - lo, length)
    alive = w > 0
    return (x.reshape(nd, -1).T, p.reshape(3, -1).T, w.reshape(-1),
            alive.reshape(-1))


# ---------------------------------------------------------------------------
# the fused push + deposit
# ---------------------------------------------------------------------------

def _roll_grid(f, off, first_grid_axis):
    """Roll grid axes by −off (periodic): value at cell+off."""
    for d, o in enumerate(off):
        if o:
            f = jnp.roll(f, -o, axis=first_grid_axis + d)
    return f


def _roll_back(acc, off, first_grid_axis=0):
    """Bin b deposits into cell b+off ⇒ J[i] += acc[i−off]."""
    for d, o in enumerate(off):
        if o:
            acc = jnp.roll(acc, o, axis=first_grid_axis + d)
    return acc


def _pad_to_ns(arr, plan, lead: int):
    """Zero-extend a grid-windowed array's x rows to the padded slot-grid
    extents (BinnedPlan.ns); no-op when the plan has no pad columns.
    ``lead``: number of leading non-grid axes."""
    pad = plan.ns[0] - plan.n[0]
    if pad == 0:
        return arr
    widths = ((0, 0),) * lead + ((0, pad),) + ((0, 0),) * (plan.nd - 1)
    return jnp.pad(arr, widths)


def make_fpad(fields, grid):
    """(6, *(n+4)) field stack with 2 ghost rows per side, sliced from the
    padded field arrays (ghost content already maintained by the field
    BCs, so periodic/clamp/outflow behave exactly as the scatter engine's
    gather sees them)."""
    ng = grid.ng
    sl = tuple(slice(ng - 2, ng + n + 2) for n in grid.n)
    return jnp.stack([getattr(fields, nm)[sl]
                      for nm in ("ex", "ey", "ez", "bx", "by", "bz")],
                     axis=0)


def jpad_to_padded(jpad, plan, grid):
    """Place the margin-padded deposition into full (ghost-padded) J
    arrays; periodic summation then runs through boundaries.current_bcs
    exactly as for the scatter engine."""
    ng = grid.ng
    M = -plan.offsets[0]
    out = jnp.zeros((3,) + grid.padded_shape(), jpad.dtype)
    # drop deposits into the dead pad columns (always zero: no particle
    # ever lives there, but the jpad array extends over plan.ns)
    jpad = jpad[(slice(None),) + tuple(
        slice(0, plan.n[d] + 2 * M) for d in range(plan.nd))]
    region = (slice(None),) + tuple(
        slice(ng - M, ng + plan.n[d] + M) for d in range(plan.nd))
    return out.at[region].set(jpad)


def push_deposit_binned(fpad, binned: BinnedSpecies, sp, plan, bc=None,
                        key=None, probes=None, _debug=None):
    """One full Boris push + PSC deposition on the slot grid.

    ``fpad``: (6, *(n+4)) field stack from make_fpad.  Returns
    (new_binned, jpad) where jpad = (3, *(n+4)) raw margin-padded
    currents (caller folds via jpad_to_padded + current_bcs).
    Mirrors particles.F90:199-514.

    ``probes``: optional list of ProbePlans attached to this species —
    the kernel then also returns per-plan crossing records (x, p, w,
    valid, n_fired), detected exactly as the scatter pusher does
    (particles.F90:518-557): the signed plane distance at the step entry
    is carried THROUGH the rebin as an extra slot payload (plane
    distances are invariant under the bin relabelling), and compared
    against the end-of-step distance before the boundary BCs apply.
    """
    nd = plan.nd
    dtype = binned.w.dtype
    mass = sp.mass
    q = sp.charge
    part_mc = const.c * mass
    ipart_mc = 1.0 / part_mc
    cm = q * 0.5 * plan.dt * ipart_mc
    ccm = cm * const.c
    n_aux = 0 if binned.aux is None else binned.aux.shape[0]
    fpad = _pad_to_ns(fpad, plan, 1)

    # half drift in grid units (particles.F90:234-257); entry ξ ∈ [-1.5,1.5)
    # (previous step's full move, unrebinned)
    w = binned.w
    p = binned.p
    alive = w > 0
    u = [p[i] * ipart_mc for i in range(3)]
    gamma = jnp.sqrt(u[0] ** 2 + u[1] ** 2 + u[2] ** 2 + 1.0)
    root = plan.dtco2 / gamma
    xi_ax = [jnp.where(alive, binned.xi[d] + u[d] * root / plan.delta[d],
                       binned.xi[d]) for d in range(nd)]

    aux_in = binned.aux
    if probes:
        # signed plane distances at the step entry, one row per probe
        cells = [jax.lax.broadcasted_iota(jnp.int32, w.shape, 1 + d)
                 .astype(dtype) for d in range(nd)]
        x0 = [plan.grid_min[d] + (cells[d] + binned.xi[d]) * plan.delta[d]
              for d in range(nd)]
        dinit = []
        for pb in probes:
            acc = jnp.zeros_like(w)
            for d in range(nd):
                acc = acc + pb.normal[d] * (pb.point[d] - x0[d])
            dinit.append(acc)
        dinit = jnp.stack(dinit)
        aux_in = dinit if aux_in is None \
            else jnp.concatenate([aux_in, dinit], axis=0)

    # rebin NOW (mid-push): the slot permutation restores ξ ∈ [-0.5,0.5),
    # so cell1 ≡ bin (c1 = 0) for the gather below; boundary particle BCs
    # are applied here (see apply_axis_bcs for the timing argument)
    sub = None
    if key is not None:
        key, sub = jax.random.split(key)
    binned = rebin(binned._replace(xi=jnp.stack(xi_ax), aux=aux_in),
                   plan, bc=bc, key=sub, sp=sp)
    if probes:
        dinit_rows = binned.aux[n_aux:]
        binned = binned._replace(
            aux=binned.aux[:n_aux] if n_aux else None)
    w = binned.w
    p = binned.p
    alive = w > 0
    xi_ax = [binned.xi[d] for d in range(nd)]
    u = [p[i] * ipart_mc for i in range(3)]

    # stagger-set fractions relative to the bin (particles.F90:248-287):
    # cell1 = bin exactly; cell2 = bin + c2 with c2 ∈ {-1,0}
    cf1 = [-xi_ax[d] for d in range(nd)]
    c2 = [jnp.floor(x) for x in xi_ax]
    cf2 = [c2[d] - xi_ax[d] + 0.5 for d in range(nd)]

    from .boundaries import STAGGER
    names = ("ex", "ey", "ez", "bx", "by", "bz")
    # per-axis weight tables: unstaggered gw on −1..1 (direct polynomials,
    # c1 = 0), staggered hw on −2..1 (2-way select on c2)
    gw = [{o: _tri_const(cf1[d], o) for o in plan.g_offsets}
          for d in range(nd)]
    hw = [{o: _w_rel(cf2[d], o, c2[d], (-1.0, 0.0)) for o in plan.h_offsets}
          for d in range(nd)]
    gpad = 2
    stag_bits = {nm: tuple(int(STAGGER[nm][d]) for d in range(nd))
                 for nm in names}
    # weight products cached per stagger pattern, window per component
    wprod_cache = {}

    def wprods(bits):
        if bits not in wprod_cache:
            tabs = [hw[d] if bits[d] else gw[d] for d in range(nd)]
            out = {}
            for otup in itertools.product(*[sorted(t) for t in tabs]):
                ww = None
                for d in range(nd):
                    wd = tabs[d][otup[d]]
                    ww = wd if ww is None else ww * wd
                out[otup] = ww
            wprod_cache[bits] = out
        return wprod_cache[bits]

    accs = {}
    for k, nm in enumerate(names):
        acc = jnp.zeros(w.shape, dtype)
        for otup, ww in wprods(stag_bits[nm]).items():
            sl = tuple(slice(gpad + otup[d], gpad + otup[d] + plan.ns[d])
                       for d in range(nd))
            acc = acc + ww * fpad[(k,) + sl][None]
        accs[nm] = acc
    if _debug is not None:
        _debug["accs"] = accs
        _debug["cf1"] = cf1
        _debug["xi_h"] = xi_ax
    fac = plan.fac
    ex_p = fac * accs["ex"]
    ey_p = fac * accs["ey"]
    ez_p = fac * accs["ez"]
    bx_p = fac * accs["bx"]
    by_p = fac * accs["by"]
    bz_p = fac * accs["bz"]

    # Boris (particles.F90:304-350)
    uxm = u[0] + cm * ex_p
    uym = u[1] + cm * ey_p
    uzm = u[2] + cm * ez_p
    if plan.higuera_cary:
        # Higuera–Cary gamma (particles.F90:308-320, HC_PUSH)
        g2 = uxm ** 2 + uym ** 2 + uzm ** 2 + 1.0
        alpha_hc = 0.5 * q * plan.dt / mass
        bx_b = alpha_hc * bx_p
        by_b = alpha_hc * by_p
        bz_b = alpha_hc * bz_p
        beta2 = bx_b ** 2 + by_b ** 2 + bz_b ** 2
        sigma = g2 - beta2
        bdotu = bx_b * uxm + by_b * uym + bz_b * uzm
        gamma = jnp.sqrt(0.5 * (sigma + jnp.sqrt(
            sigma ** 2 + 4.0 * (beta2 + bdotu ** 2))))
    else:
        gamma = jnp.sqrt(uxm ** 2 + uym ** 2 + uzm ** 2 + 1.0)
    rootb = ccm / gamma
    tx = bx_p * rootb
    ty = by_p * rootb
    tz = bz_p * rootb
    tx2, ty2, tz2 = tx * tx, ty * ty, tz * tz
    tau = 1.0 / (1.0 + tx2 + ty2 + tz2)
    uxp = ((1 + tx2 - ty2 - tz2) * uxm
           + 2.0 * ((tx * ty + tz) * uym + (tx * tz - ty) * uzm)) * tau
    uyp = ((1 - tx2 + ty2 - tz2) * uym
           + 2.0 * ((ty * tz + tx) * uzm + (ty * tx - tz) * uxm)) * tau
    uzp = ((1 - tx2 - ty2 + tz2) * uzm
           + 2.0 * ((tz * tx + ty) * uxm + (tz * ty - tx) * uym)) * tau
    ux = uxp + cm * ex_p
    uy = uyp + cm * ey_p
    uz = uzp + cm * ez_p
    u2 = ux ** 2 + uy ** 2 + uz ** 2
    gamma = jnp.sqrt(u2 + 1.0)
    rootc = const.c / gamma
    uvec = (ux, uy, uz)
    delta = [uvec[d] * rootc * plan.dto2 / plan.delta[d] for d in range(nd)]
    vy = uy * rootc
    vz = uz * rootc

    xi_new = [xi_ax[d] + delta[d] for d in range(nd)]
    new_p = jnp.stack([ux, uy, uz]) * part_mc
    new_p = jnp.where(alive[None], new_p, binned.p)

    probe_recs = None
    if probes:
        # crossing detection against the PRE-BC final position, exactly
        # as the scatter path captures before particle_bcs
        cells = [jax.lax.broadcasted_iota(jnp.int32, w.shape, 1 + d)
                 .astype(dtype) for d in range(nd)]
        xf = [plan.grid_min[d] + (cells[d] + xi_new[d]) * plan.delta[d]
              for d in range(nd)]
        ek = u2 / (gamma + 1.0) * mass * const.c ** 2
        probe_recs = []
        for pi, pb in enumerate(probes):
            dfin = jnp.zeros_like(w)
            for d in range(nd):
                dfin = dfin + pb.normal[d] * (pb.point[d] - xf[d])
            fire = alive & (ek > pb.ek_min) & (ek < pb.ek_max) \
                & (dfin < 0.0) & (dinit_rows[pi] >= 0.0)
            probe_recs.append(probe_topk(fire, xf, new_p, w, nd, dtype))

    # ---- deposition at t+1.5dt (particles.F90:397-514) ----
    currents = None
    if not (sp.zero_current or sp.immobile):
        w_dep = w
        if getattr(sp, "deltaf", None) is not None \
                and "pvol" in plan.aux_idx:
            # delta-f: subtract the static background f0 from the
            # deposited current (particles.F90:405-408; f0 :521-553) —
            # pvol rides the slot grid as a routed aux row
            import math as _math
            dens_b, temp_b, drift_b = sp.deltaf
            two_kb_mass = 2.0 * const.kb * mass
            tb = [max(t, 1e-300) for t in temp_b]
            expo = ((new_p[0] - drift_b[0]) ** 2 / tb[0]
                    + (new_p[1] - drift_b[1]) ** 2 / tb[1]
                    + (new_p[2] - drift_b[2]) ** 2 / tb[2]) / two_kb_mass
            norm = dens_b / _math.sqrt(
                (_math.pi * two_kb_mass) ** 3 * tb[0] * tb[1] * tb[2])
            pvol = binned.aux[plan.aux_idx["pvol"]]
            w_dep = w - pvol * norm * jnp.exp(-expo)
        live_w = jnp.where(alive, w_dep, 0.0)
        xi_dep = [xi_new[d] + delta[d] for d in range(nd)]
        # c3 ∈ {-1,0,1}: |ξ_dep| < 0.5 + one full CFL step < 1.5 (clip is a
        # pure safety net for CFL-violating inputs)
        c3 = [jnp.clip(jnp.floor(x + 0.5), -1.0, 1.0) for x in xi_dep]
        cf3 = [c3[d] - xi_dep[d] for d in range(nd)]
        W = len(plan.offsets)
        bvals = (-1.0, 0.0, 1.0)
        # per-axis window weight vectors (gx from the half-drift position,
        # hx−gx differences, and their running sums — the closed form of
        # the reference's jxh/jyh prefix accumulation); concrete-offset
        # polynomials keep everything select-free (gx: c1 = 0 directly)
        zero = jnp.zeros_like(cf1[0])
        gx5 = [[(_tri_const(cf1[d], o) if abs(o) <= 1 else zero)
                for o in plan.offsets] for d in range(nd)]
        hx5 = [[_w_rel(cf3[d], o, c3[d], bvals) for o in plan.offsets]
               for d in range(nd)]
        dxw = [[hx5[d][i] - gx5[d][i] for i in range(W)] for d in range(nd)]
        dcum = []
        for d in range(nd):
            run = []
            acc = None
            for i in range(W):
                acc = dxw[d][i] if acc is None else acc + dxw[d][i]
                run.append(acc)
            dcum.append(run)
        fjx = plan.fj[0] * live_w * q
        fjy = plan.fj[1] * live_w * q
        fjz = plan.fj[2] * live_w * q
        third = 1.0 / 3.0

        # accumulate into a margin-padded J and fold the periodic margins
        # once at the end: every window offset is a static-slice add
        M = -plan.offsets[0]
        jpad = jnp.zeros((3,) + tuple(n + 2 * M for n in plan.ns), dtype)

        def pad_add(jp, off, v3):
            sl = (slice(None),) + tuple(
                slice(M + off[d], M + off[d] + plan.ns[d])
                for d in range(nd))
            return jp.at[sl].add(v3)

        zcell = jnp.zeros(w.shape[1:], dtype)
        if nd == 1:
            for i in range(W):
                wy = gx5[0][i] + 0.5 * dxw[0][i]
                # dcum[..][W-1] = Σ(hx−gx) ≡ 0: no jx at the last offset
                v3 = jnp.stack([
                    zcell if i == W - 1
                    else jnp.sum(-fjx * dcum[0][i], axis=0),
                    jnp.sum(fjy * vy * wy, axis=0),
                    jnp.sum(fjz * vz * wy, axis=0)])
                jpad = pad_add(jpad, (plan.offsets[i],), v3)
        elif nd == 2:
            # separable closed form: every (ix,iy) plane is an outer product
            # of per-axis factors contracted over the slot axis
            xfac1 = [gx5[0][i] + 0.5 * dxw[0][i] for i in range(W)]
            yfac1 = [gx5[1][j] + 0.5 * dxw[1][j] for j in range(W)]
            yfac2 = [third * dxw[1][j] + 0.5 * gx5[1][j] for j in range(W)]
            fz = fjz * vz
            for i in range(W):
                for j in range(W):
                    # dcum[..][W-1] ≡ 0: the last x-offset deposits no jx,
                    # the last y-offset no jy
                    v3 = jnp.stack([
                        zcell if i == W - 1
                        else jnp.sum(-fjx * dcum[0][i] * yfac1[j], axis=0),
                        zcell if j == W - 1
                        else jnp.sum(-fjy * xfac1[i] * dcum[1][j], axis=0),
                        jnp.sum(fz * (gx5[0][i] * yfac1[j]
                                      + dxw[0][i] * yfac2[j]), axis=0)])
                    jpad = pad_add(jpad, (plan.offsets[i], plan.offsets[j]),
                                   v3)
        else:
            # 3d: same separable structure, contracted axis-by-axis
            for iz in range(W):
                hz = dxw[2][iz]
                gz = gx5[2][iz]
                zfac1 = gz + 0.5 * hz
                zfac2 = third * hz + 0.5 * gz
                for iy in range(W):
                    hy = dxw[1][iy]
                    gy = gx5[1][iy]
                    yfac1 = gy + 0.5 * hy
                    yfac2 = third * hy + 0.5 * gy
                    yzfac = gy * zfac1 + hy * zfac2
                    for ix in range(W):
                        hx = dxw[0][ix]
                        gx = gx5[0][ix]
                        xfac1 = gx + 0.5 * hx
                        xfac2 = third * hx + 0.5 * gx
                        v3 = jnp.stack([
                            zcell if ix == W - 1
                            else jnp.sum(-fjx * dcum[0][ix] * yzfac,
                                         axis=0),
                            zcell if iy == W - 1
                            else jnp.sum(-fjy * (xfac1 * gz + xfac2 * hz)
                                         * dcum[1][iy], axis=0),
                            zcell if iz == W - 1
                            else jnp.sum(-fjz * (gx * yfac1 + hx * yfac2)
                                         * dcum[2][iz], axis=0)])
                        jpad = pad_add(jpad, (plan.offsets[ix],
                                              plan.offsets[iy],
                                              plan.offsets[iz]), v3)
        currents = jpad

    new_xi = jnp.stack(xi_new)
    new_xi = jnp.where(alive[None], new_xi, binned.xi)
    new_w = w
    # boundary particle BCs after the deposit, matching the reference's
    # end-of-step particle_bcs timing (epoch2d.F90:237, boundary.F90:948):
    # the dump point then never sees out-of-domain particles.  The rebin
    # above re-applies them to catch half-drift overhang.
    if bc is not None and any(b != const.BC.PERIODIC
                              for b in bc[:2 * nd]):
        for d in range(nd):
            if bc[2 * d] != const.BC.PERIODIC \
                    or bc[2 * d + 1] != const.BC.PERIODIC:
                sub = None
                if key is not None:
                    key, sub = jax.random.split(key)
                new_xi, new_p, new_w = apply_axis_bcs(
                    new_xi, new_p, new_w, plan, d, bc[2 * d],
                    bc[2 * d + 1], key=sub, sp=sp)
    # no rebin here — the next step's mid-push rebin (above) restores the
    # binning invariant; ξ stays in [-1.5, 1.5) until then
    out = binned._replace(xi=new_xi, p=new_p, w=new_w)
    if probes is not None:
        return out, currents, probe_recs
    return out, currents


def fold_margins(jpad, plan):
    """Periodic fold of the deposition margins back into the interior
    (processor_summation_bcs analogue, boundary.F90:783-806)."""
    nd = plan.nd
    M = -plan.offsets[0]
    for d in range(nd):
        ax = 1 + d
        n = plan.n[d]

        def slc(lo, hi):
            sl = [slice(None)] * (nd + 1)
            sl[ax] = slice(lo, hi)
            return tuple(sl)

        jpad = jpad.at[slc(n, n + M)].add(jpad[slc(0, M)])
        jpad = jpad.at[slc(M, 2 * M)].add(jpad[slc(n + M, n + 2 * M)])
    core = (slice(None),) + tuple(slice(M, M + plan.n[d])
                                  for d in range(nd))
    jcore = jpad[core]
    return jcore[0], jcore[1], jcore[2]


def window_pending_capable(cfg):
    """True when the moving window can use the pending-shift mechanism:
    every species is pushed by the fused Pallas kernel each step (so the
    rebin routing consumes the relabel) and nothing else touches the slot
    grids between the shift and the next push.  Otherwise the window
    falls back to rolling the slot state (window._shift_binned)."""
    if not cfg.move_window:
        return False
    if cfg.ndims > 2:
        # the 3D fused kernel does not consume pending shifts yet: 3D
        # windows run the rolled path (window._shift_binned — an
        # XLA-side slot-state roll per shift, correct but ~1 extra
        # slot-state copy every c·dt/dx steps)
        return False
    if cfg.injector_plans:
        # injector column writes land between the shift and the push
        return False
    for p in (cfg.brem_plan, cfg.ionise_plan,
              cfg.collision_plan, cfg.split_plan, cfg.migration_plan):
        if p is not None:
            return False
    if cfg.qed_plan is not None:
        # QED is pending-compatible when every XLA-side stage between
        # the shift and the push is CELL-LOCAL: in-kernel rates cover
        # the emitters' field gather, and emission append targets the
        # parent's array cell (relabel-consistent across species).
        # Breit-Wheeler pairs qualify too when the photon kernel
        # computes chi + the depth decrement itself (the XLA tail then
        # only reads aux rows and appends into the parent's cell); a
        # config where the photon kernel can't take the rates (frozen
        # photons, missing qed_eta row) keeps the rolled path, since
        # the XLA-side chi gather would be one-cell-stale under a
        # pending relabel.
        if cfg.qed_plan.produce_pairs:
            ph = cfg.qed_plan.photon_species
            # under a mesh the photon kernel runs without in-kernel
            # rates (no qed_on plumbing through the shard body): the
            # XLA-side chi gather would be one-cell-stale under a
            # pending relabel — keep the rolled window path there
            rates_ok = (ph >= 0 and not cfg.species[ph].immobile
                        and cfg.mesh is None
                        and cfg.binned_aux
                        and cfg.binned_aux[-1] == "qed_eta")
            if not rates_ok:
                return False
    kernel_bcs = (const.BC.OPEN, const.BC.REFLECT)
    for sp in cfg.species:
        if sp.immobile:
            # immobile species (photon_dynamics = F photons, fixed ion
            # backgrounds) consume the relabel through a rebin-only
            # zero-drift kernel (make_pallas_engines); x BCs checked
            # below like every other species
            pass
        if sp.species_type == const.SpeciesType.PHOTON:
            # photons ride their own fused ballistic kernel; thermal
            # walls (no photon kernel) are rejected below like massive
            # species with non-kernel BCs
            pass
        if sp.bc_particle[0] not in kernel_bcs \
                or sp.bc_particle[1] not in kernel_bcs:
            return False
    return bool(cfg.species)


def sides_carry_capable(cfg):
    """True when nothing touches the binned slot state between fused-
    kernel invocations, so the kernel's halo side-column outputs stay
    valid across steps and replace the XLA-side staging
    (BinnedSpecies.sides; ~0.1 ms/step of layout copies at bench
    shapes).  Any XLA-side slot mutator disqualifies the deck."""
    import os
    if os.environ.get("EPOCH_TPU_SIDES_CARRY", "1") == "0":
        return False
    if cfg.mesh is not None:
        # sharded steps pin state shardings per structure; keep the
        # state pytree stable there (spmd engines stage per shard)
        return False
    if cfg.injector_plans:
        return False
    for pl_ in (cfg.qed_plan, cfg.brem_plan, cfg.ionise_plan,
                cfg.collision_plan, cfg.split_plan, cfg.migration_plan):
        if pl_ is not None:
            return False
    if cfg.move_window and not window_pending_capable(cfg):
        # the rolled window path shifts the slot arrays XLA-side
        return False
    return True


def species_uses_aux(cfg, si):
    """True when species ``si`` ever reads or writes any binned_aux row.

    Aux rows are global (every species' slot state carries them so the
    pytree stays uniform), but only some species USE them: QED optical
    depths belong to emitters + the photon species, brems depths to
    electrons, id rows to everyone.  Non-users can skip the kernel's
    extra-payload rebin routing entirely — their rows stay all-zero and
    never need to follow the particles (~2 extra routed payloads on a
    6-payload rebin cost ~25%% of a bench proton kernel)."""
    names = getattr(cfg, "binned_aux", ())
    if not names:
        return False
    if "id_lo" in names:
        return True
    if "pvol" in names \
            and getattr(cfg.species[si], "deltaf", None) is not None:
        # delta-f phase-space volumes follow the particles to every
        # deposit (push_deposit_binned's f0 subtraction)
        return True
    qp = cfg.qed_plan
    if qp is not None and si in qp.emitters:
        return True
    if qp is not None and si == qp.photon_species and qp.produce_pairs:
        # pair optical depth + chi rows; without pair production the
        # photon species never reads its depth rows
        return True
    bp = cfg.brem_plan
    if bp is not None and si in getattr(bp, "electrons", ()):
        return True
    return False


def make_pallas_engines(cfg, plan, interpret=None, spmd_axis=None,
                        mesh_n=1):
    """Per-species fused Pallas kernel drivers, or None where ineligible.

    The Pallas path covers 2D/3D triangle-shape configurations in single
    precision on TPU: periodic/open/reflect/thermal/heat-bath BCs, the
    pending-shift moving window (incl. in-kernel refill/cull), aux/probe
    payload routing, in-kernel QED rates, and the ballistic photon
    variant; remaining cases fall back to the XLA slot-grid
    implementation above (with a logged reason).
    ``EPOCH_TPU_PALLAS`` ∈ {auto,0,1,interpret} overrides.
    """
    import os
    mode = os.environ.get("EPOCH_TPU_PALLAS", "auto")
    if interpret is None:
        interpret = (mode == "interpret")
    if mode == "0":
        return [None] * len(cfg.species)
    if plan.nd not in (2, 3):
        return [None] * len(cfg.species)
    if jnp.dtype(cfg.dtype) != jnp.float32 and not interpret:
        # Mosaic path is single-precision; interpret mode (CPU tests)
        # runs the kernel at the config dtype, so f64 decks exercise it
        return [None] * len(cfg.species)
    if plan.nd == 3:
        return _make_pallas_engines_3d(cfg, plan, interpret, mode)
    if not interpret and jax.default_backend() != "tpu" and mode != "1":
        return [None] * len(cfg.species)
    from ..ops.binned_kernels import pick_bx, PallasBinned

    def k_of(si):
        return cfg.bin_k_sp[si] if cfg.bin_k_sp else None

    def bail(why):
        import logging
        logging.getLogger("epoch_tpu").warning(
            "fused Pallas path ineligible (%s): falling back to the "
            "XLA slot engine", why)
        return [None] * len(cfg.species)
    nx_loc = plan.ns[0] // mesh_n
    if plan.ns[0] % mesh_n != 0:
        return bail(f"slot grid nx={plan.ns[0]} not divisible by the "
                    f"{mesh_n}-shard mesh")
    if pick_bx(nx_loc, mosaic=not interpret) is None:
        return bail(f"no 8-aligned stripe width divides nx={nx_loc} "
                    "(periodic-x grids need nx % 8 == 0)")
    # scoped-VMEM model: the rebin's 3K candidate payloads + the double-
    # buffered slot blocks all scale with K·BX·NY (measured 18.9 MiB at
    # K=18, BX=8, NY=384); stay under the kernel's vmem_limit_bytes
    BX_est = pick_bx(nx_loc, mosaic=not interpret)
    est = 85 * cfg.bin_k * BX_est * (plan.n[1] + 4) * 4
    if est > 96 * 1024 * 1024:
        return bail(f"estimated kernel VMEM {est/2**20:.0f} MiB exceeds "
                    "the 96 MiB budget (grid too tall in y)")
    with_window = window_pending_capable(cfg)
    carry = sides_carry_capable(cfg) and spmd_axis is None
    kernel_bcs = (const.BC.PERIODIC, const.BC.OPEN, const.BC.REFLECT,
                  const.BC.THERMAL, const.BC.HEAT_BATH)
    out = []
    TH = (const.BC.THERMAL, const.BC.HEAT_BATH)

    # ---- in-kernel QED emission group (photons born inside the
    # emitter kernels, appended through the photon kernel's rebin) ----
    # eligibility is mutual: the emitters sample chi + recoil in-kernel
    # and publish e_ph in their last extras row; the photon kernel
    # accepts the candidate block.  Single-device, trident off (the
    # e_ph row repurposes eta, which trident reads), probe-free
    # emitters, photon_dynamics on.
    qp_all = cfg.qed_plan

    def _has_probes(si):
        return any(si in pp.species
                   for pp in getattr(cfg, "probe_plans", ()))

    def _emitter_kernel_ok(si):
        spe = cfg.species[si]
        return (not spe.immobile
                and spe.species_type != const.SpeciesType.PHOTON
                and all(b in kernel_bcs
                        for b in spe.bc_particle[:2 * plan.nd])
                and getattr(spe, "deltaf", None) is None
                and not _has_probes(si))

    emit_srcs = ()
    if (qp_all is not None and qp_all.produce_photons
            and qp_all.photon_species >= 0
            and not getattr(qp_all, "use_trident", False)
            and spmd_axis is None
            and "qed_eta" in plan.aux_idx
            and plan.aux_idx["qed_eta"] == plan.n_aux - 1
            and not any(b not in kernel_bcs or b in TH
                        for b in cfg.species[qp_all.photon_species]
                        .bc_particle[:2 * plan.nd])
            and os.environ.get("EPOCH_TPU_EMIT_IN_KERNEL", "1") != "0"):
        emit_srcs = tuple(si for si in qp_all.emitters
                          if _emitter_kernel_ok(si))
    emit_k_total = sum((cfg.bin_k_sp[si] if cfg.bin_k_sp
                        else cfg.bin_k) for si in emit_srcs)
    qed_emit_tuple = None
    if emit_srcs:
        t_ = qp_all.tables
        qed_emit_tuple = (
            tuple(tuple(float(v) for v in row)
                  for row in qp_all.chi_fit_coeffs),
            float(t_.log_eta[0]), float(t_.log_eta[-1]),
            float(qp_all.chi_fit_pmax),
            bool(qp_all.use_radiation_reaction))
    for si, sp in enumerate(cfg.species):
        if sp.species_type == const.SpeciesType.PHOTON:
            # ballistic fused variant: rebin + full-dt drift, no
            # gather/Boris/deposit — the XLA push_photons_binned ran the
            # slot-sort rebin every step even on near-vacuum photon
            # grids (a QED LWFA deck paid ~5x the bare deck for it).
            # Composes with shard_map like the massive kernels (window
            # staging then stays XLA-side; in-kernel pair rates need the
            # qed_on plumbing the shard body doesn't carry, so chi falls
            # back to the XLA gather under a mesh).
            if any(bc not in kernel_bcs or bc in TH
                   for bc in sp.bc_particle[:2 * plan.nd]):
                out.append(None)
            else:
                ph_window = window_pending_capable(cfg)
                from .window import pending_single_shift
                ph_stage = (ph_window and spmd_axis is None
                            and pending_single_shift(cfg))
                # in-kernel Breit-Wheeler pair rates: the moving-photon
                # kernel gathers fields itself and decrements the pair
                # optical depth (chi stored in the qed_eta row); the
                # XLA-side tail (qed.py) then only fires on od <= 0 —
                # no per-slot gather or table interp outside the kernel
                qp = cfg.qed_plan
                ph_qed = None
                n_ph_route = plan.n_aux \
                    if species_uses_aux(cfg, si) else 0
                if qp is not None and qp.produce_pairs \
                        and si == qp.photon_species and not sp.immobile \
                        and spmd_axis is None \
                        and "qed_eta" in plan.aux_idx \
                        and plan.aux_idx["qed_eta"] == plan.n_aux - 1:
                    n_ph_route = plan.n_aux - 1
                    # photon interpretation of the qed tuple: slots 2-3
                    # are the fit's (mid, half) normalisation, not a
                    # clip range (the kernel branches on photon=True)
                    ph_qed = (plan.aux_idx["opdepth"],
                              tuple(qp.pair_fit_coeffs),
                              float(qp.pair_fit_mid),
                              float(qp.pair_fit_half),
                              float(qp.c_pair_per_dt * plan.dt),
                              float(qp.c_chi))
                out.append(PallasBinned(
                    plan, sp, cfg, interpret=interpret,
                    with_window=ph_window, n_extra=n_ph_route,
                    photon=True, move=not sp.immobile,
                    clear_rcol=ph_stage,
                    spmd_axis=spmd_axis, mesh_n=mesh_n,
                    sides_out=carry and plan.n_aux == 0,
                    cull_lo=(cfg.grid.cpml_thickness if ph_stage
                             else 0),
                    qed=ph_qed, k=k_of(si),
                    emit_k=(emit_k_total
                            if qp_all is not None
                            and si == qp_all.photon_species else 0)))
        elif sp.immobile:
            # zero-drift rebin-only kernel: under a moving window it
            # consumes the pending relabel + swept-boundary cull; as
            # the in-kernel-emission target (photon_dynamics = F) it
            # appends the newborn photons through its rebin — either
            # way immobile species stay off the XLA slot paths
            emit_here = (emit_srcs
                         and qp_all is not None
                         and si == qp_all.photon_species)
            if (with_window or emit_here) and spmd_axis is None \
                    and not any(
                    bc not in kernel_bcs or bc in TH
                    for bc in sp.bc_particle[:2 * plan.nd]):
                from .window import pending_single_shift
                im_stage = pending_single_shift(cfg)
                wplan = cfg.window_plans[si] \
                    if si < len(cfg.window_plans) else None
                im_refill = bool(
                    im_stage and wplan is not None
                    and wplan["max_new"] > 0
                    and wplan["density"] is not None)
                out.append(PallasBinned(
                    plan, sp, cfg, interpret=interpret,
                    with_window=with_window,
                    n_extra=(plan.n_aux if species_uses_aux(cfg, si)
                             else 0),
                    photon=True, move=False, clear_rcol=im_stage,
                    with_refill=im_refill,
                    sides_out=carry and plan.n_aux == 0,
                    cull_lo=(cfg.grid.cpml_thickness if im_stage
                             else 0), k=k_of(si),
                    emit_k=(emit_k_total if emit_here else 0)))
            else:
                out.append(None)
        elif any(bc not in kernel_bcs
                 for bc in sp.bc_particle[:2 * plan.nd]):
            out.append(None)
        elif getattr(sp, "deltaf", None) is not None:
            # the fused kernel deposits the full marker weight; the
            # delta-f f0 subtraction lives in push_deposit_binned only
            import logging
            logging.getLogger("epoch_tpu").info(
                "species %s: delta-f rides the XLA slot path (fused "
                "kernel deposits full-f)", sp.name)
            out.append(None)
        else:
            # aux rows (QED/brems/trident optical depths) and probe
            # entry distances ride the kernel's extra-payload routing
            probe_specs = tuple(
                (tuple(float(v) for v in pp.normal),
                 tuple(float(v) for v in pp.point))
                for pp in getattr(cfg, "probe_plans", ())
                if si in pp.species)
            # in-kernel QED rates for emitter species: eta + the
            # optical-depth decrement reuse the push's gathered fields;
            # the 'qed_eta' aux row (LAST) is excluded from routing and
            # appended fresh by the kernel
            qp = cfg.qed_plan
            qed_args = None
            n_route = plan.n_aux if species_uses_aux(cfg, si) else 0
            if qp is not None and si in qp.emitters \
                    and spmd_axis is None \
                    and "qed_eta" in plan.aux_idx \
                    and plan.aux_idx["qed_eta"] == plan.n_aux - 1:
                n_route = plan.n_aux - 1
                qed_args = (plan.aux_idx["opdepth"],
                            tuple(qp.h_fit_coeffs),
                            float(qp.h_fit_lo), float(qp.h_fit_hi),
                            float(qp.c1_per_dt * plan.dt),
                            float(qp.c_eta))
                if si in emit_srcs:
                    # in-kernel emission: chi sample + recoil in this
                    # kernel; e_ph published via the (repurposed) last
                    # extras row for the photon kernel's candidate feed
                    qed_args = qed_args + (qed_emit_tuple,)
            # pending-shift refill/cull ride the kernel on the single-
            # device path (the sharded path keeps XLA-side staging);
            # requires the provably-single-shift window (the kernel
            # consumes exactly one staged column per pending shift)
            from .window import pending_single_shift
            in_kernel_stage = (with_window and spmd_axis is None
                               and pending_single_shift(cfg))
            wplan = cfg.window_plans[si] if with_window \
                and si < len(cfg.window_plans) else None
            with_refill = bool(
                in_kernel_stage and wplan is not None
                and wplan["max_new"] > 0
                and wplan["density"] is not None)
            cull_lo = cfg.grid.cpml_thickness if in_kernel_stage else 0
            n_ex = n_route + len(probe_specs)
            eng_ = PallasBinned(plan, sp, cfg, interpret=interpret,
                                    with_window=with_window,
                                    n_extra=n_ex,
                                    probe_specs=probe_specs,
                                    spmd_axis=spmd_axis, mesh_n=mesh_n,
                                    with_refill=with_refill,
                                    cull_lo=cull_lo,
                                    clear_rcol=in_kernel_stage,
                                    sides_out=carry and n_ex == 0,
                                    qed=qed_args, k=k_of(si))
            eng_.emits_in_kernel = bool(
                qed_args is not None and len(qed_args) > 6)
            out.append(eng_)
    return out


def probe_entry_distances(binned: BinnedSpecies, plan, probes):
    """Signed plane distances at the step-entry positions, one row per
    probe (the quantity the reference snapshots before the move,
    particles.F90:518-530)."""
    nd = plan.nd
    w = binned.w
    dtype = w.dtype
    cells = [jax.lax.broadcasted_iota(jnp.int32, w.shape, 1 + d)
             .astype(dtype) for d in range(nd)]
    x0 = [plan.grid_min[d] + (cells[d] + binned.xi[d]) * plan.delta[d]
          for d in range(nd)]
    rows = []
    for pb in probes:
        acc = jnp.zeros_like(w)
        for d in range(nd):
            acc = acc + pb.normal[d] * (pb.point[d] - x0[d])
        rows.append(acc)
    return jnp.stack(rows)


def probe_topk(fire, xf, p, w, nd, dtype):
    """Dense-to-record extraction of probe crossings: top_k on the fire
    mask (slot-grid analogue of the reference's per-crossing list append,
    probes.F90:95-130).  Returns (xs, ps, ws, ok, n_fired); records
    beyond the per-step cap are dropped — callers count them via
    n_fired - ok.sum()."""
    kk = min(1024, fire.size)
    score = fire.astype(dtype).reshape(-1)
    vals, idx = jax.lax.top_k(score, kk)
    ok = vals > 0
    xs = jnp.stack([xf[d].reshape(-1)[idx] for d in range(nd)], axis=1)
    ps = jnp.stack([p[c].reshape(-1)[idx] for c in range(3)], axis=1)
    ws = w.reshape(-1)[idx]
    return xs, ps, ws, ok, jnp.sum(fire)


def _make_pallas_engines_3d(cfg, plan, interpret, mode):
    """3D fused-kernel drivers (ops/binned_kernels3d.py), or None where
    ineligible.  Window/probes/thermal stay on the XLA slot path in 3D;
    aux rows ride the kernel as in 2D."""
    import logging
    log = logging.getLogger("epoch_tpu")
    n_sp = len(cfg.species)
    if getattr(cfg, "probe_plans", ()):
        log.warning("3D fused Pallas path ineligible (particle probes): "
                    "falling back to the XLA slot engine")
        return [None] * n_sp
    if plan.merge_overflow:
        log.warning("3D fused Pallas path ineligible (bin_overflow = "
                    "merge is 2D-kernel + XLA only): falling back to "
                    "the XLA slot engine")
        return [None] * n_sp
    # the moving window is fine here: 3D windows use the rolled shift
    # (window._shift_binned, XLA-side) which preserves the binning
    # invariant the kernel needs — window_pending_capable excludes 3D
    if not interpret and jax.default_backend() != "tpu" and mode != "1":
        return [None] * n_sp
    from ..ops.binned_kernels3d import pick_b, PallasBinned3D
    BX = pick_b(plan.n[0], (4, 8, 2))
    # the x-halo block's trailing dims are (BY, NZ): Mosaic needs BY
    # sublane-aligned (%8) — or full-extent — on real hardware
    by_cands = (8, 16) if (not interpret and mode != "interpret") \
        else (8, 16, 4)
    BY = pick_b(plan.n[1], by_cands)
    if BY is None and plan.n[1] <= 16:
        BY = plan.n[1]
    if BX is None or BY is None:
        log.warning(
            "3D fused Pallas path ineligible (no aligned brick tiling "
            "for nx=%d ny=%d; Mosaic needs BY %% 8 == 0 or full-extent): "
            "falling back to the XLA slot engine", plan.n[0], plan.n[1])
        return [None] * n_sp
    # VMEM bound: the 3K rebin candidate set is the high-water mark
    # (the kernel requests a 100 MiB scoped-vmem budget; stay below it
    # with margin for the double-buffered brick blocks)
    K = cfg.bin_k
    cand_bytes = 3 * K * BX * BY * plan.n[2] * 4 * (10 + plan.n_aux)
    if cand_bytes > 60 * 1024 * 1024:
        log.warning(
            "3D fused Pallas path ineligible (rebin candidate set "
            "%.0f MiB exceeds the 60 MiB VMEM budget at K=%d, BX=%d, "
            "BY=%d, NZ=%d): falling back to the XLA slot engine — "
            "reduce bin_headroom or nz", cand_bytes / 2 ** 20, K, BX, BY,
            plan.n[2])
        return [None] * n_sp
    kernel_bcs = (const.BC.PERIODIC, const.BC.OPEN, const.BC.REFLECT)
    out = []
    for si, sp in enumerate(cfg.species):
        if sp.immobile or sp.species_type == const.SpeciesType.PHOTON:
            if not sp.immobile or cfg.move_window:
                log.info("species %s: 3D fused kernel has no photon/"
                         "immobile variant — XLA slot path", sp.name)
            out.append(None)
        elif any(bc not in kernel_bcs for bc in sp.bc_particle[:6]):
            log.warning("species %s: 3D fused kernel supports periodic/"
                        "open/reflect particle BCs only — XLA slot path",
                        sp.name)
            out.append(None)
        elif getattr(sp, "deltaf", None) is not None:
            log.info("species %s: delta-f rides the XLA slot path "
                     "(fused kernel deposits full-f)", sp.name)
            out.append(None)
        else:
            out.append(PallasBinned3D(
                plan, sp, cfg, interpret=interpret,
                n_extra=(plan.n_aux if species_uses_aux(cfg, si)
                         else 0),
                k=(cfg.bin_k_sp[si] if cfg.bin_k_sp else None)))
    return out


def push_deposit_pallas(engine, fwin, binned, plan, sp=None, shift=None,
                        probes=None, seed=None, refill=None, qed_on=None,
                        emission=None):
    """Fused-kernel variant of push_deposit_binned; returns per-stripe
    partial currents (callers sum over species, then fold once).

    Aux rows (optical depths) and probe plane distances ride the
    kernel's extra-payload rebin routing (make_fused_push n_extra);
    crossing detection runs XLA-side on the kernel's output rows.  With
    ``probes`` the return is (binned, jpart, probe_recs) as for
    push_deposit_binned."""
    n_aux = 0 if binned.aux is None else binned.aux.shape[0]
    qed_en = getattr(engine, "qed_enabled", False)
    # routed rows are what the engine was built with: n_aux for aux-using
    # species (minus the kernel-fresh qed_eta LAST row under in-kernel
    # QED rates), 0 for species that never touch their aux rows
    # (species_uses_aux — their rows stay zero and skip the rebin
    # routing entirely)
    n_route = engine.n_extra - getattr(engine, "n_probes", 0)
    alias_extras = getattr(engine, "alias_extras", False) and not probes
    if alias_extras:
        # grown-output aliasing: pass the FULL aux (the stale eta row is
        # overwritten in-kernel) — no slice/concat copies, and the slot
        # extras buffer is donated through the kernel
        extra = binned.aux
    else:
        extra = binned.aux[:n_route] if n_route else None
        if probes:
            dinit = probe_entry_distances(binned, plan, probes)
            extra = dinit if extra is None \
                else jnp.concatenate([extra, dinit], axis=0)
    # carried-sides fast path: reuse the previous invocation's halo
    # side-column outputs when present (engine.sides_out decks only —
    # sides_carry_capable guarantees nothing mutated the slots since)
    sides = binned.sides if getattr(engine, "sides_out", False) else None
    out, jpart, extra_out = engine(fwin, binned, shift=shift, extra=extra,
                                   seed=seed, refill=refill,
                                   qed_on=qed_on, sides=sides,
                                   emission=emission)
    probe_recs = None
    if extra_out is not None:
        if n_aux and (n_route or qed_en):
            if alias_extras:
                # output row order [routed aux… | eta] matches the aux
                # row order exactly — adopt the donated buffer whole
                aux_new = extra_out
            else:
                aux_new = extra_out[:n_route]
                if qed_en:
                    aux_new = jnp.concatenate([aux_new, extra_out[-1:]],
                                              axis=0)
            out = out._replace(aux=aux_new)
        if probes:
            probe_recs = probe_records_from_rows(out, extra_out, n_route,
                                                 probes, sp, plan)
    if probes is not None:
        return out, jpart, probe_recs
    return out, jpart


def probe_records_from_rows(out, extra_out, n_route, probes, sp, plan):
    """Probe crossing detection on the fused kernel's output payload
    rows (particles.F90:518-557): rows [n_route : n_route+npb] are the
    echoed entry distances, the next npb the final distances, then the
    pre-BC weight.  Shared by the single-device path and the shard_map
    path (which runs it on the reassembled global outputs)."""
    npb = len(probes)
    dinit_r = extra_out[n_route:n_route + npb]
    dfin = extra_out[n_route + npb:n_route + 2 * npb]
    prew = extra_out[n_route + 2 * npb]   # pre-BC weight
    nd = plan.nd
    dtype = out.w.dtype
    mass = sp.mass
    u = [out.p[c] * (1.0 / (const.c * mass)) for c in range(3)]
    u2 = u[0] ** 2 + u[1] ** 2 + u[2] ** 2
    gamma = jnp.sqrt(u2 + 1.0)
    ek = u2 / (gamma + 1.0) * mass * const.c ** 2
    cells = [jax.lax.broadcasted_iota(jnp.int32, out.w.shape,
                                      1 + d).astype(dtype)
             for d in range(nd)]
    # post-BC position: identical to pre-BC for open-killed
    # particles (only w is zeroed); reflected wall-crossers
    # record the reflected position — a one-cell-edge deviation
    xf = [plan.grid_min[d] + (cells[d] + out.xi[d]) * plan.delta[d]
          for d in range(nd)]
    probe_recs = []
    for pi, pb in enumerate(probes):
        fire = (prew > 0) & (ek > pb.ek_min) & (ek < pb.ek_max) \
            & (dfin[pi] < 0.0) & (dinit_r[pi] >= 0.0)
        probe_recs.append(probe_topk(fire, xf, out.p, prew, nd,
                                     dtype))
    return probe_recs


def apply_axis_bcs(xi, p, w, plan, d, bc_lo, bc_hi, key=None, sp=None):
    """Open/reflect/thermal particle BCs on the slot grid for axis ``d``
    (boundary.F90:948-1354 analogue), applied both at the end of the push
    (reference timing — dumps never see out-of-domain particles) and at
    the mid-push rebin (for half-drift overhang, where the reference
    would gather at the out-of-domain position instead).  Field-free the
    two discretisations are bitwise identical (reflection commutes with
    drift); with fields the mid-push reflection differs by O(∇F·dt²) for
    the crossing particle — an equally consistent wall discretisation.
    Open boundaries remove the particle at the *domain* edge; the
    reference keeps it until the outer ghost edge one cell further
    (boundary.F90:613-618), so ghost-band deposits and re-entry from the
    ghost band are not reproduced (the ghost J only feeds ghost E, which
    the field BCs overwrite).

    ``xi`` is the (nd, K, *g) stack; returns (xi, p, w).  Only the edge
    cell of an axis can host a boundary-crossing particle (|ξ| < 1.5 by
    CFL), except with CPML where every cell inside the absorbing layer
    kills (the reference removes at x_min which excludes the CPML cells).

    Thermal/heat-bath BCs (boundary.F90:664-694) reflect the crossing
    particle and resample its momentum: flux-Maxwellian inward along the
    axis, Maxwellian transverse, at the species boundary temperature
    (``sp.ext_temp``).  They need ``key`` + ``sp`` — the XLA binned path
    supplies them; the Pallas kernel has no RNG, so thermal species fall
    back to this path (make_pallas_engines).
    """
    gax = 1 + d
    kb_lo, kb_hi = plan.kb[d]
    idx = jax.lax.broadcasted_iota(jnp.int32, w.shape, gax)
    alive = w > 0
    for hi_side, bc in ((False, bc_lo), (True, bc_hi)):
        if bc == const.BC.PERIODIC:
            continue
        xa = xi[d]
        if hi_side:
            edge = idx == kb_hi
            inside_kill = idx > kb_hi
            crossing = edge & (xa >= 0.5) & alive
            refl = 1.0 - xa
        else:
            edge = idx == kb_lo
            inside_kill = idx < kb_lo
            crossing = edge & (xa < -0.5) & alive
            refl = -1.0 - xa
        if bc == const.BC.REFLECT:
            xi = xi.at[d].set(jnp.where(crossing, refl, xa))
            p = p.at[d].set(jnp.where(crossing, -p[d], p[d]))
            w = jnp.where(inside_kill & alive, 0.0, w)
        elif bc in (const.BC.THERMAL, const.BC.HEAT_BATH) \
                and key is not None and sp is not None:
            from .slab_ops import sample_maxwellian_p, \
                sample_flux_maxwellian_p
            from .boundaries import _ext_temp
            temps = _ext_temp(sp, 2 * d + (1 if hi_side else 0))
            sgn = 1.0 if hi_side else -1.0
            key, k1, k2, k3 = jax.random.split(key, 4)
            ks = (k1, k2, k3)
            xi = xi.at[d].set(jnp.where(crossing, refl, xa))
            for comp in range(3):
                if comp == d:
                    newp = sample_flux_maxwellian_p(
                        ks[comp], sp.mass, temps[comp], 0.0, -sgn,
                        w.shape)
                else:
                    newp = sample_maxwellian_p(
                        ks[comp], sp.mass, temps[comp], 0.0, w.shape)
                p = p.at[comp].set(jnp.where(crossing, newp, p[comp]))
            w = jnp.where(inside_kill & alive, 0.0, w)
        else:   # OPEN (simple_laser/outflow/cpml already normalised)
            w = jnp.where((crossing | (inside_kill & alive)), 0.0, w)
        alive = w > 0
    return xi, p, w


def gather_fields_binned(fpad, xi_stack, plan,
                         comps=("ex", "ey", "ez", "bx", "by", "bz")):
    """Field components at the particles on the slot grid.

    Requires post-rebin fractions (ξ ∈ [-0.5, 0.5): c1 ≡ 0 and staggered
    c2 ∈ {-1, 0}).  This is the gather stage of push_deposit_binned
    factored out for the physics packages (QED η/χ at the particle,
    ADK ionisation rates — the reference reuses the pusher's include
    files for these, ionise.F90:430-470 / photons.F90:566-600).
    Returns {name: (K, *grid)} with the shape-function normalisation
    applied."""
    from .boundaries import STAGGER
    nd = plan.nd
    xi_ax = [xi_stack[d] for d in range(nd)]
    cf1 = [-xi_ax[d] for d in range(nd)]
    c2 = [jnp.floor(x) for x in xi_ax]
    cf2 = [c2[d] - xi_ax[d] + 0.5 for d in range(nd)]
    gw = [{o: _tri_const(cf1[d], o) for o in plan.g_offsets}
          for d in range(nd)]
    hw = [{o: _w_rel(cf2[d], o, c2[d], (-1.0, 0.0)) for o in plan.h_offsets}
          for d in range(nd)]
    gpad = 2
    names6 = ("ex", "ey", "ez", "bx", "by", "bz")
    wprod_cache = {}

    def wprods(bits):
        if bits not in wprod_cache:
            tabs = [hw[d] if bits[d] else gw[d] for d in range(nd)]
            out = {}
            for otup in itertools.product(*[sorted(t) for t in tabs]):
                ww = None
                for d in range(nd):
                    wd = tabs[d][otup[d]]
                    ww = wd if ww is None else ww * wd
                out[otup] = ww
            wprod_cache[bits] = out
        return wprod_cache[bits]

    out = {}
    for nm in comps:
        k = names6.index(nm)
        bits = tuple(int(STAGGER[nm][d]) for d in range(nd))
        acc = None
        for otup, ww in wprods(bits).items():
            sl = tuple(slice(gpad + otup[d], gpad + otup[d] + plan.ns[d])
                       for d in range(nd))
            term = ww * fpad[(k,) + sl][None]
            acc = term if acc is None else acc + term
        out[nm] = plan.fac * acc
    return out


def gather_fields_binned_shifted(fields, grid, xi_stack, plan,
                                 comps=("ex", "ey", "ez",
                                        "bx", "by", "bz")):
    """Field components at particles whose ξ is UN-normalised (end-of-
    push state, ξ ∈ (−1.5, 1.5)): the per-slot cell shift
    dc = clip(floor(ξ+0.5), −1, 1) folds into widened gather windows.

    Replaces the slot-SORT rebin the physics packages ran before
    gathering (qed/ionise called ``rebin`` every step just to centre ξ —
    a 3K-row lax.sort over the whole slot grid).  Widened windows cost
    ~2.5x the centred gather's arithmetic, far below the sort."""
    from .boundaries import STAGGER
    nd = plan.nd
    ng = grid.ng
    gpad = 3                     # offsets reach ±(2+1) after the shift
    names6 = ("ex", "ey", "ez", "bx", "by", "bz")
    sl = tuple(slice(ng - gpad, ng + n + gpad) for n in grid.n)
    fpad = jnp.stack([getattr(fields, nm)[sl] for nm in names6], axis=0)
    if tuple(plan.ns) != tuple(grid.n):
        # zero-extend over the slot grid's dead pad columns
        fpad = jnp.pad(fpad, ((0, 0),) + tuple(
            (0, plan.ns[d] - grid.n[d]) for d in range(nd)))
    xi_ax = [xi_stack[d] for d in range(nd)]
    dc = [jnp.clip(jnp.floor(xi_ax[d] + 0.5), -1.0, 1.0)
          for d in range(nd)]
    xc = [xi_ax[d] - dc[d] for d in range(nd)]
    cf1 = [-xc[d] for d in range(nd)]
    c2 = [jnp.floor(x) for x in xc]
    cf2 = [c2[d] - xc[d] + 0.5 for d in range(nd)]
    gw = [{o: _w_rel(cf1[d], o, dc[d], (-1.0, 0.0, 1.0))
           for o in (-2, -1, 0, 1, 2)} for d in range(nd)]
    hw = [{o: _w_rel(cf2[d], o, c2[d] + dc[d], (-2.0, -1.0, 0.0, 1.0))
           for o in (-3, -2, -1, 0, 1, 2)} for d in range(nd)]
    wprod_cache = {}

    def wprods(bits):
        if bits not in wprod_cache:
            tabs = [hw[d] if bits[d] else gw[d] for d in range(nd)]
            out = {}
            for otup in itertools.product(*[sorted(t) for t in tabs]):
                ww = None
                for d in range(nd):
                    wd = tabs[d][otup[d]]
                    ww = wd if ww is None else ww * wd
                out[otup] = ww
            wprod_cache[bits] = out
        return wprod_cache[bits]

    out = {}
    for nm in comps:
        k = names6.index(nm)
        bits = tuple(int(STAGGER[nm][d]) for d in range(nd))
        acc = None
        for otup, ww in wprods(bits).items():
            s = tuple(slice(gpad + otup[d], gpad + otup[d] + plan.ns[d])
                      for d in range(nd))
            term = ww * fpad[(k,) + s][None]
            acc = term if acc is None else acc + term
        out[nm] = plan.fac * acc
    return out


def deposit_scalar_binned(vals, xi_stack, plan):
    """Shape-weighted scalar deposition (particle_to_grid analogue on the
    slot grid): requires post-rebin ξ (c1 ≡ 0, support −1..1 per axis).
    ``vals``: (K, *grid) with dead slots 0.  Returns the margin-padded
    (*(n+2)) raw sums; fold/normalise with scalar_pad_to_padded +
    boundaries.current_summation_bcs."""
    nd = plan.nd
    cf1 = [-xi_stack[d] for d in range(nd)]
    M = 1
    spad = jnp.zeros(tuple(n + 2 for n in plan.ns), vals.dtype)
    for otup in itertools.product((-1, 0, 1), repeat=nd):
        ww = vals
        for d in range(nd):
            ww = ww * _tri_const(cf1[d], otup[d])
        v = jnp.sum(ww, axis=0)
        sl = tuple(slice(M + otup[d], M + otup[d] + plan.ns[d])
                   for d in range(nd))
        spad = spad.at[sl].add(v)
    return spad * plan.fac


def scalar_pad_to_padded(spad, plan, grid):
    """Place a margin-1-padded scalar deposition into a full ghost-padded
    grid array (cf. jpad_to_padded); the ghost deposits then fold through
    boundaries.current_summation_bcs exactly as the scatter path."""
    ng = grid.ng
    out = jnp.zeros(grid.padded_shape(), spad.dtype)
    spad = spad[tuple(slice(0, plan.n[d] + 2) for d in range(plan.nd))]
    region = tuple(slice(ng - 1, ng + plan.n[d] + 1)
                   for d in range(plan.nd))
    return out.at[region].set(spad)


def gather_centred_binned(pad2, xi_stack, plan):
    """Cell-centred grid variable at the particles
    (grid_centred_var_at_particle, bremsstrahlung.F90:718-760): ``pad2``
    has 2 ghost cells per side (padded[ng-2 : ng+n+2]); requires
    post-rebin ξ."""
    nd = plan.nd
    pad2 = _pad_to_ns(pad2, plan, 0)
    cf1 = [-xi_stack[d] for d in range(nd)]
    gpad = 2
    acc = None
    for otup in itertools.product((-1, 0, 1), repeat=nd):
        ww = None
        for d in range(nd):
            wd = _tri_const(cf1[d], otup[d])
            ww = wd if ww is None else ww * wd
        sl = tuple(slice(gpad + otup[d], gpad + otup[d] + plan.ns[d])
                   for d in range(nd))
        term = ww * pad2[sl][None]
        acc = term if acc is None else acc + term
    return plan.fac * acc


def ghost2_slice(padded, grid):
    """Slice a ghost-padded grid array down to 2 ghost cells per side
    (the gather window of the binned engine, cf. make_fpad)."""
    ng = grid.ng
    return padded[tuple(slice(ng - 2, ng + n + 2) for n in grid.n)]


def merge_candidates(binned: BinnedSpecies, cand_xi, cand_p, cand_w, plan,
                     cand_aux=None) -> BinnedSpecies:
    """Append cell-local candidate particles into free slots.

    The slot-grid analogue of the reference's dynamic-list appends
    (partlist.F90:114-409) for particle-creating physics: every created
    particle lives in the SAME cell as its parent (ionisation electrons,
    emitted photons, Breit–Wheeler pairs), so appending is a per-cell
    compaction — concatenate the Kc candidate slots onto the K existing
    ones and re-sort live-first along the slot axis.  Candidates beyond
    the free capacity of their cell are dropped and counted in
    ``n_dropped``.  ``cand_w`` must be 0 for non-firing candidate slots;
    ``cand_aux`` defaults to zeros (lazily re-sampled optical depths)."""
    nd = plan.nd
    K = binned.K
    na = 0 if binned.aux is None else binned.aux.shape[0]
    cw = jnp.concatenate([binned.w, cand_w], axis=0)
    cxi = jnp.concatenate([binned.xi, cand_xi], axis=1)
    cp = jnp.concatenate([binned.p, cand_p], axis=1)
    if na:
        if cand_aux is None:
            cand_aux = jnp.zeros((na,) + cand_w.shape, cand_w.dtype)
        cax = jnp.concatenate([binned.aux, cand_aux], axis=1)
    from ..ops.slotsort import sort_by_key
    payloads = [cxi[i] for i in range(nd)] \
        + [cp[i] for i in range(3)] \
        + ([cax[i] for i in range(na)] if na else [])
    skey, sorted_pl = sort_by_key(-cw, payloads)
    sorted_ops = (skey,) + tuple(sorted_pl)
    live_total = jnp.sum(cw > 0)
    w = -sorted_ops[0][:K]
    xi = jnp.stack([sorted_ops[1 + i][:K] for i in range(nd)])
    p = jnp.stack([sorted_ops[1 + nd + i][:K] for i in range(3)])
    aux = jnp.stack([sorted_ops[4 + nd + i][:K] for i in range(na)]) \
        if na else binned.aux
    kept = jnp.sum(w > 0)
    if plan.merge_overflow:
        # fold overflow rows into slot K-1 (see rebin; bin_overflow)
        nK = cw.shape[0]
        ow = jnp.maximum(-sorted_ops[0][K:nK], 0.0)
        over_w = jnp.sum(ow, axis=0)
        tot = w[K - 1] + over_w
        inv = jnp.where(tot > 0, 1.0 / jnp.maximum(tot, 1e-300), 0.0)

        def fold(full, rows_over):
            msum = jnp.sum(ow[None] * rows_over, axis=1)
            mval = (w[K - 1][None] * full[:, K - 1] + msum) * inv
            return full.at[:, K - 1].set(
                jnp.where((over_w > 0)[None], mval, full[:, K - 1]))

        xi = fold(xi, jnp.stack([sorted_ops[1 + i][K:nK]
                                 for i in range(nd)]))
        p = fold(p, jnp.stack([sorted_ops[1 + nd + i][K:nK]
                               for i in range(3)]))
        if na:
            aux = fold(aux, jnp.stack([sorted_ops[4 + nd + i][K:nK]
                                       for i in range(na)]))
        w = w.at[K - 1].set(jnp.where(over_w > 0, tot, w[K - 1]))
    dropped = binned.n_dropped + (live_total - kept).astype(jnp.int32)
    return binned._replace(xi=xi, p=p, w=w, aux=aux, n_dropped=dropped)


def append_compressed(binned: BinnedSpecies, cand_xi, cand_p, cand_w,
                      plan, cand_aux=None) -> BinnedSpecies:
    """Append a SMALL compressed candidate grid (Kc rows, cell-ranked —
    see qed.py's emission compression) into the first free slots of each
    cell WITHOUT a sort: the slot grids are kept live-first-compacted by
    the engines, so candidate r of a cell with n live slots lands in row
    n+r via one K-deep select per candidate row.  merge_candidates'
    multi-payload lax.sort cost ~7 ms/step at bench shapes even with
    tiny candidate sets; this costs Kc selects per payload.  Overflow
    beyond K is dropped and counted."""
    nd = plan.nd
    K = binned.K
    Kc = cand_w.shape[0]
    na = 0 if binned.aux is None else binned.aux.shape[0]
    if na and cand_aux is None:
        cand_aux = jnp.zeros((na,) + cand_w.shape, cand_w.dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, binned.w.shape, 0)
    # first free row = one past the LAST live row (not the live count):
    # in-place kills (Breit-Wheeler photon destruction, BC kills) leave
    # transient holes until the next rebin compacts them — counting live
    # slots would land candidates ON live rows above a hole and silently
    # overwrite them.  Holes are wasted capacity for one step only.
    n_live = jnp.max(jnp.where(binned.w > 0, rows + 1, 0), axis=0)
    w, xi, p, aux = binned.w, binned.xi, binned.p, binned.aux
    dropped = jnp.zeros((), jnp.int32)
    for r in range(Kc):
        alive_c = cand_w[r] > 0
        sel = (rows == (n_live + r)[None]) & alive_c[None]
        w = jnp.where(sel, cand_w[r][None], w)
        xi = jnp.where(sel[None], cand_xi[:, r][:, None], xi)
        p = jnp.where(sel[None], cand_p[:, r][:, None], p)
        if na:
            aux = jnp.where(sel[None], cand_aux[:, r][:, None], aux)
        dropped = dropped + jnp.sum(
            alive_c & (n_live + r >= K)).astype(jnp.int32)
    if plan.merge_overflow:
        # candidates that found no free row fold into slot K-1 instead
        # (weighted-mean merge, bin_overflow = merge)
        omask = [(cand_w[r] > 0) & (n_live + r >= K) for r in range(Kc)]
        ow = [jnp.where(m, cand_w[r], 0.0) for r, m in enumerate(omask)]
        over_w = sum(ow)
        tot = w[K - 1] + over_w
        inv = jnp.where(tot > 0, 1.0 / jnp.maximum(tot, 1e-300), 0.0)

        def fold(full, cand):
            msum = sum(ow[r][None] * cand[:, r] for r in range(Kc))
            mval = (w[K - 1][None] * full[:, K - 1] + msum) * inv
            return full.at[:, K - 1].set(
                jnp.where((over_w > 0)[None], mval, full[:, K - 1]))

        xi = fold(xi, cand_xi)
        p = fold(p, cand_p)
        if na:
            aux = fold(aux, cand_aux)
        w = w.at[K - 1].set(jnp.where(over_w > 0, tot, w[K - 1]))
    return binned._replace(w=w, xi=xi, p=p, aux=aux,
                           n_dropped=binned.n_dropped + dropped)


def push_photons_binned(binned: BinnedSpecies, plan,
                        bc=None, key=None, sp=None) -> BinnedSpecies:
    """Ballistic photon advance on the slot grid (push_photons,
    particles.F90:611-695): rebin first (restores ξ ∈ [-0.5, 0.5) and
    applies boundary BCs, exactly as the massive-species mid-push rebin),
    then drift x += p̂·c·dt.  CFL bounds c·dt below one cell per axis, so
    the next step's rebin needs only the 3 neighbour candidate sets."""
    sub = None
    if key is not None:
        key, sub = jax.random.split(key)
    binned = rebin(binned, plan, bc=bc, key=sub, sp=sp)
    w = binned.w
    p = binned.p
    mag = jnp.sqrt(p[0] ** 2 + p[1] ** 2 + p[2] ** 2)
    ok = (w > 0) & (mag > 0)
    fac = const.c * plan.dt / jnp.where(mag > 0, mag, 1.0)
    xi = jnp.stack([
        jnp.where(ok, binned.xi[d] + p[d] * fac / plan.delta[d],
                  binned.xi[d])
        for d in range(plan.nd)])
    new_w = w
    if bc is not None and any(b != const.BC.PERIODIC
                              for b in bc[:2 * plan.nd]):
        new_p = p
        for d in range(plan.nd):
            if bc[2 * d] != const.BC.PERIODIC \
                    or bc[2 * d + 1] != const.BC.PERIODIC:
                sub = None
                if key is not None:
                    key, sub = jax.random.split(key)
                xi, new_p, new_w = apply_axis_bcs(
                    xi, new_p, new_w, plan, d, bc[2 * d], bc[2 * d + 1],
                    key=sub, sp=sp)
        return binned._replace(xi=xi, p=new_p, w=new_w)
    return binned._replace(xi=xi)


def rebin(binned: BinnedSpecies, plan, bc=None, key=None,
          sp=None) -> BinnedSpecies:
    """Move particles whose ξ left [-0.5, 0.5) to the neighbouring bin,
    axis by axis (CFL ⇒ at most one cell), compacting with a slot sort.
    ``bc``: per-boundary particle BCs (2 per axis); None = all periodic.
    ``key``/``sp``: for thermal re-emission BCs (apply_axis_bcs)."""
    nd = plan.nd
    K = binned.K
    xi = binned.xi
    p = binned.p
    w = binned.w
    aux = binned.aux
    na = 0 if aux is None else aux.shape[0]
    dropped = binned.n_dropped
    for d in range(nd):
        if bc is not None and (bc[2 * d] != const.BC.PERIODIC
                               or bc[2 * d + 1] != const.BC.PERIODIC):
            sub = None
            if key is not None:
                key, sub = jax.random.split(key)
            xi, p, w = apply_axis_bcs(xi, p, w, plan, d,
                                      bc[2 * d], bc[2 * d + 1],
                                      key=sub, sp=sp)
        gax_w = 1 + d          # grid axis in (K, *g)
        gax_v = 2 + d          # grid axis in (c, K, *g)
        dc = jnp.clip(jnp.floor(xi[d] + 0.5), -1.0, 1.0)
        dc = jnp.where(w > 0, dc, 0.0)
        xi = xi.at[d].add(-dc)
        cands_w, cands_xi, cands_p, cands_aux = [], [], [], []
        for o in (-1, 0, 1):
            sel = (jnp.roll(dc, o, axis=gax_w) == o) \
                & (jnp.roll(w, o, axis=gax_w) > 0)
            cands_w.append(jnp.where(sel, jnp.roll(w, o, axis=gax_w), 0.0))
            cands_xi.append(jnp.roll(xi, o, axis=gax_v))
            cands_p.append(jnp.roll(p, o, axis=gax_v))
            if na:
                cands_aux.append(jnp.roll(aux, o, axis=gax_v))
        cw = jnp.concatenate(cands_w, axis=0)               # (3K, *g)
        cxi = jnp.concatenate(cands_xi, axis=1)             # (nd, 3K, *g)
        cp = jnp.concatenate(cands_p, axis=1)
        cax = jnp.concatenate(cands_aux, axis=1) if na else None
        # compact live-first along the slot axis with -w as the key via
        # the fused Batcher network (ops/slotsort.py): the whole 3K-row
        # compaction is one elementwise fusion — lax.sort streamed every
        # payload through each compare stage
        from ..ops.slotsort import sort_by_key
        payloads = [cxi[i] for i in range(nd)] \
            + [cp[i] for i in range(3)] \
            + [cax[i] for i in range(na)]
        skey, sorted_pl = sort_by_key(-cw, payloads)
        sorted_ops = (skey,) + tuple(sorted_pl)
        live_total = jnp.sum(cw > 0)
        w = -sorted_ops[0][:K]
        xi = jnp.stack([sorted_ops[1 + i][:K] for i in range(nd)])
        p = jnp.stack([sorted_ops[1 + nd + i][:K] for i in range(3)])
        if na:
            aux = jnp.stack([sorted_ops[4 + nd + i][:K] for i in range(na)])
        kept = jnp.sum(w > 0)
        if plan.merge_overflow:
            # overflow rows [K:] (live ones sort first): fold them into
            # slot K-1 conserving Σw, Σw·ξ, Σw·p (weighted-mean merge —
            # the cell had ≥K live slots whenever over_w > 0, so slot
            # K-1 is live).  The counter records merged macro-particles.
            ow = jnp.maximum(-sorted_ops[0][K:], 0.0)
            over_w = jnp.sum(ow, axis=0)
            tot = w[K - 1] + over_w
            inv = jnp.where(tot > 0, 1.0 / jnp.maximum(tot, 1e-300), 0.0)

            def fold(full, rows_over):
                msum = jnp.sum(ow[None] * rows_over, axis=1)
                mval = (w[K - 1][None] * full[:, K - 1] + msum) * inv
                return full.at[:, K - 1].set(
                    jnp.where((over_w > 0)[None], mval, full[:, K - 1]))

            xi = fold(xi, jnp.stack([sorted_ops[1 + i][K:]
                                     for i in range(nd)]))
            p = fold(p, jnp.stack([sorted_ops[1 + nd + i][K:]
                                   for i in range(3)]))
            if na:
                aux = fold(aux, jnp.stack([sorted_ops[4 + nd + i][K:]
                                           for i in range(na)]))
            w = w.at[K - 1].set(jnp.where(over_w > 0, tot, w[K - 1]))
        dropped = dropped + (live_total - kept).astype(jnp.int32)
    return binned._replace(xi=xi, p=p, w=w, aux=aux, n_dropped=dropped)
