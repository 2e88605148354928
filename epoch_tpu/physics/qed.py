"""QED synchrotron emission + Breit–Wheeler pair production
(physics_packages/photons.F90, Sokolov/Ridgers model).

Per particle: the quantum parameter η (electrons/positrons,
calculate_eta :661) or χ (photons, :714) from the local fields; the optical
depth depletes through the tabulated rates (h_Sokolov for emission :609,
T_pair for pairs :643) and fires an event at τ ≤ 0 — photon emission with
inverse-CDF-sampled energy + radiation-reaction recoil (generate_photon
:867, calculate_photon_energy :928), or photon → e⁻e⁺ with the tabulated
energy split (generate_pair :944).

Tables are loaded at runtime from ``qed_table_location`` (the same text
format the reference reads in setup_tables_qed :216 — point it at an EPOCH
``TABLES`` directory).  TPU design: all per-particle work is vectorised;
table lookups are dense row-interpolations + masked argmax inversions (the
tables are ≲500×300 and live comfortably in VMEM); emission uses capped
append buffers (slab_ops).
"""
from __future__ import annotations

import math
import os

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants as const
from ..core.slab_ops import append_particles

E_S = 1.323285417001326061279735961512150e18       # Schwinger field (V/m)
TAU_C = 1.288088667367242662108649212042082e-21    # ħ/(m0 c²)


class QEDTables:
    """Loader for the reference's QED table set (setup_tables_qed)."""

    def __init__(self, location: str):
        self.location = location

        def rows(fname):
            with open(os.path.join(location, fname)) as f:
                return [ln.split() for ln in f if ln.strip()]

        # hsokolov.table: header n, min, max; rows log10(eta), h(eta)
        r = rows("hsokolov.table")
        data = np.array([[float(v) for v in row] for row in r[1:]])
        self.h_logeta = data[:, 0]
        self.h_val = data[:, 1]

        # pairprod.table: header n; rows log10(chi), omegahat, T(chi)
        r = rows("pairprod.table")
        data = np.array([[float(v) for v in row] for row in r[1:]])
        self.t_logchi = data[:, 0]
        self.omega_val = data[:, 1]      # log10(omegahat) for trident
        self.t_val = data[:, 2]

        # ksi_sokolov.table: header n_eta n_chi etalog_min etalog_max;
        # then n_eta rows of n_chi CDF values
        r = rows("ksi_sokolov.table")
        n_eta, n_chi = int(r[0][0]), int(r[0][1])
        self.etalog_min, self.etalog_max = float(r[0][2]), float(r[0][3])
        flat = [float(v) for row in r[1:] for v in row]
        self.p_photon = np.array(flat).reshape(n_eta, n_chi)
        self.n_eta, self.n_chi = n_eta, n_chi

        # chimin.table: n_eta values of chi_min(eta)
        r = rows("chimin.table")
        self.chimin = np.array([float(v) for row in r for v in row])[:n_eta]

        # log_chi2.table / epsilon.table / energy_split.table (pairs)
        r = rows("log_chi2.table")
        n_chi2 = int(r[0][0])
        vals = [float(v) for row in r[1:] for v in row]
        self.log_chi2 = np.array(vals[:n_chi2])
        r = rows("epsilon.table")
        n_eps = int(r[0][0])
        vals = [float(v) for row in r[1:] for v in row]
        self.epsilon_split = np.array(vals[:n_eps])
        r = rows("energy_split.table")
        vals = [float(v) for row in r for v in row]
        self.p_energy = np.array(vals[:n_chi2 * n_eps]).reshape(n_chi2, n_eps)

        # per-row chi axes (photons.F90:452-463): log-uniform from
        # log10(chimin(eta)) to log_eta − log10(2)
        self.log_eta = np.linspace(self.etalog_min, self.etalog_max, n_eta)
        self.log_chi = np.zeros((n_eta, n_chi))
        for i in range(n_eta):
            cmin = math.log10(max(self.chimin[i], 1e-300))
            cmax = self.log_eta[i] - math.log10(2.0)
            self.log_chi[i] = np.linspace(cmin, cmax, n_chi)


class QEDPlan:
    def __init__(self, cfg, deck):
        q = deck.qed
        loc = q.qed_table_location or os.environ.get("EPOCH_QED_TABLES", "")
        if not loc:
            raise ValueError("use_qed requires qed_table_location (a deck "
                             "key) pointing at an EPOCH TABLES directory")
        self.tables = QEDTables(loc)
        self.produce_photons = q.produce_photons
        self.produce_pairs = q.produce_pairs
        self.photon_energy_min = q.photon_energy_min
        self.photon_dynamics = q.photon_dynamics
        self.use_radiation_reaction = q.use_radiation_reaction
        self.use_trident = getattr(q, "use_trident", False)
        self.start_time = q.qed_start_time
        ids = {s.identify: i for i, s in enumerate(deck.species) if s.identify}
        self.emitters = [i for i, s in enumerate(cfg.species)
                         if s.species_type in (const.SpeciesType.ELECTRON,
                                               const.SpeciesType.POSITRON)]
        self.photon_species = ids.get("photon", ids.get("qed_photon", -1))
        self.bw_electron = ids.get("breit_wheeler_electron",
                                   ids.get("bw_electron",
                                           ids.get("electron", -1)))
        self.bw_positron = ids.get("breit_wheeler_positron",
                                   ids.get("bw_positron",
                                           ids.get("positron", -1)))
        # trident species fall back to the first electron/positron
        # (photons.F90:160-216)
        self.tri_electron = ids.get("trident_electron",
                                    ids.get("electron", -1))
        self.tri_positron = ids.get("trident_positron",
                                    ids.get("positron", -1))
        # Chebyshev-free dense fit of the synchrotron h(eta) table in
        # log-log space: the fused kernel evaluates rates in VMEM, where
        # table gathers cannot lower (TPU gathers also serialise on the
        # XLA side).  Max fit error checked in tests/test_qed.py.
        t = self.tables
        deg = 12
        self.h_fit_coeffs = tuple(
            float(c) for c in np.polyfit(t.h_logeta, t.h_val, deg))
        self.h_fit_lo = float(t.h_logeta[0])
        self.h_fit_hi = float(t.h_logeta[-1])
        # Breit-Wheeler pair-rate fit for the in-kernel photon path.
        # T(chi) (pairprod.table) spans 48 decades with a 1e-50 table
        # floor — a raw log-log polyfit cannot track it.  Factor out the
        # Erber exponential suppression exp(-8/(3chi)) and fit the
        # residual G = log10(T) + (8/3chi)·log10(e) over the unclamped
        # rows in a [-1,1]-normalised abscissa (f32-Horner-stable):
        #   T = exp(ln10·(poly(xn) - (8/3)·log10(e)/chi)),
        #   xn = clip((log10 chi - mid)/half, -1, 1).
        # Max f32 error 7e-4 where T > 1e-20; exact 0 (underflow) in the
        # suppressed region.  Gated in tests/test_qed.py.
        t_lg = np.asarray(t.t_logchi)
        t_lv = np.asarray(t.t_val)
        g_res = t_lv + (8.0 / (3.0 * 10.0 ** t_lg)) * math.log10(math.e)
        unclamped = t_lv > -49.9
        p_lo = float(t_lg[unclamped][0])
        p_hi = float(t_lg[unclamped][-1])
        self.pair_fit_mid = 0.5 * (p_lo + p_hi)
        self.pair_fit_half = 0.5 * (p_hi - p_lo)
        xn = (t_lg[unclamped] - self.pair_fit_mid) / self.pair_fit_half
        self.pair_fit_coeffs = tuple(
            float(c) for c in np.polyfit(xn, g_res[unclamped], 16))
        # d_od = c_pair_per_dt·dt · chi · T(chi) / part_e;
        # chi = c_chi · part_e · |q_perp|  (calculate_chi :714-745)
        self.c_pair_per_dt = float(const.alpha_fine / TAU_C)
        self.c_chi = float(0.5 / E_S)
        # Gather-free photon-energy sampling fit for the DENSE emission
        # tail (generate_photon / calculate_photon_energy :867-943).
        # The table inversion chi(eta, p) needs a per-particle gather of
        # a (n_chi,) CDF row — TPU gathers serialise, ~7 ms/step dense at
        # bench shapes.  Instead fit U(x, p) = log10(chi) − (log10 eta −
        # log10 2), the offset of the sampled chi below the row maximum
        # chi_max = eta/2, as a 2-D Chebyshev series in x (normalised
        # log10 eta) and y = 2p − 1.  U is smooth where it matters:
        # weighting the fit to U ≥ −5 (photons within 5 decades of
        # chi_max — everything energetic enough to survive
        # photon_energy_min or contribute measurable recoil).  Degree
        # picks the fidelity/cost point: the Clenshaw is the cascade
        # bench's single hottest fusion (~1100 VPU flops/slot/step at
        # (12,24), measured 1.28 ms/step at 2.65M slots — near VPU
        # peak).  The default (8, 12) costs ~1/3 of that and keeps the
        # hard-photon region (U ≥ −3: every stored photon + the
        # dominant recoil) at max error 0.027 decades — SMALLER than
        # the reference's own nearest-row quantisation of the same
        # table (adjacent ksi_sokolov rows differ by up to 0.075
        # decades, mean 0.046).  The soft tail (U < −3, photons below
        # ~1e-3 of the particle energy: never stored at practical
        # photon_energy_min, recoil < 0.1%) degrades to ≤ 0.6 decades.
        # EPOCH_TPU_CHI_FIT_DEG=dx,dp overrides (12,24 reproduces the
        # high-accuracy fit everywhere).  Gated in tests/test_qed.py.
        deg_env = os.environ.get("EPOCH_TPU_CHI_FIT_DEG", "8,12")
        self.chi_fit_deg = tuple(int(v) for v in deg_env.split(","))
        self.chi_fit_pmax = 0.9995
        self.chi_fit_coeffs = self._build_chi_fit()
        # per-species map set by the step builder when the fused kernel
        # computes eta + the optical-depth decrement itself
        self.rates_in_kernel = {}
        # emitters whose kernel also samples chi, applies recoil and
        # feeds the photon kernel's rebin (emission fully in-kernel)
        self.emit_in_kernel = {}
        # folded constants for the in-kernel rate math
        # (eta = c_eta · γ · |g|, d_od = c1_per_dt·dt · eta · h / γ)
        lambdac = const.h_bar / (const.m0 * const.c)
        coeff = math.sqrt(3.0 * lambdac
                          / (2.0 * const.alpha_fine
                             * const.m0 * const.c ** 3))
        tau0 = const.q0 ** 2 / (6.0 * math.pi * const.epsilon0
                                * const.m0 * const.c ** 3)
        self.c_eta = float(coeff * const.q0 * math.sqrt(tau0 / const.m0))
        self.c1_per_dt = float(const.alpha_fine * math.sqrt(3.0)
                               / (2.0 * math.pi * TAU_C))

    def _build_chi_fit(self):
        """Weighted tensor-Chebyshev least squares of the inverse photon
        CDF offset U(log10 eta, p) against the loaded ksi_sokolov table
        (see chi_fit_coeffs above)."""
        import numpy.polynomial.chebyshev as _C
        t = self.tables
        n_eta, n_chi = t.p_photon.shape
        le = np.asarray(t.log_eta)
        lcm = np.log10(np.maximum(np.asarray(t.chimin), 1e-300))
        pgrid = np.linspace(0.0, self.chi_fit_pmax, 401)
        u_tab = np.zeros((n_eta, pgrid.size))
        for i in range(n_eta):
            cdf = t.p_photon[i]
            j = np.clip(np.searchsorted(cdf, pgrid, side="left"),
                        1, n_chi - 1)
            c0, c1 = cdf[j - 1], cdf[j]
            f = np.where(c1 > c0,
                         (pgrid - c0) / np.maximum(c1 - c0, 1e-300), 0.0)
            s = (j - 1 + np.clip(f, 0, 1)) / (n_chi - 1)
            span = (le[i] - math.log10(2.0)) - lcm[i]
            u_tab[i] = (s - 1.0) * span
        dx, dp = self.chi_fit_deg
        xn = 2.0 * (le - le[0]) / (le[-1] - le[0]) - 1.0
        basis = np.einsum(
            "ia,jb->ijab", _C.chebvander(xn, dx),
            _C.chebvander(2.0 * pgrid / self.chi_fit_pmax - 1.0, dp)
        ).reshape(n_eta * pgrid.size, -1)
        wgt = np.where(u_tab >= -5.0, 1.0, 0.01).ravel()
        coef, *_ = np.linalg.lstsq(basis * wgt[:, None],
                                   u_tab.ravel() * wgt, rcond=None)
        return tuple(tuple(float(v) for v in row)
                     for row in coef.reshape(dx + 1, dp + 1))


def _interp_1d(xt, yt, x):
    """Linear interpolation with edge clamping (find_value_from_table_1d)."""
    xt = jnp.asarray(xt)
    yt = jnp.asarray(yt)
    i = jnp.clip(jnp.searchsorted(xt, x) - 1, 0, xt.shape[0] - 2)
    f = (x - xt[i]) / (xt[i + 1] - xt[i])
    f = jnp.clip(f, 0.0, 1.0)
    return yt[i] * (1 - f) + yt[i + 1] * f


def _clenshaw(coeffs, x):
    """Chebyshev series evaluation; ``coeffs`` may be floats or arrays
    (the outer dimension of a tensor series)."""
    b1 = jnp.zeros_like(x)
    b2 = jnp.zeros_like(x)
    for ck in coeffs[:0:-1]:
        b1, b2 = ck + 2.0 * x * b1 - b2, b1
    return coeffs[0] + x * b1 - b2


def _sample_chi_fit(plan, eta, r):
    """Photon chi sample from the gather-free Chebyshev fit of the
    inverse ksi_sokolov CDF (QEDPlan.chi_fit_coeffs): elementwise math
    only, no table row gathers.  ``r`` uniform in [0, 1); values above
    chi_fit_pmax evaluate at the fit endpoint (the chi_max cap)."""
    t = plan.tables
    le0, le1 = float(t.log_eta[0]), float(t.log_eta[-1])
    lg = jnp.log10(jnp.maximum(eta, 1e-30))
    lgc = jnp.clip(lg, le0, le1)
    xn = 2.0 * (lgc - le0) / (le1 - le0) - 1.0
    # r may be uniform in [0,1); the fit domain is [0, chi_fit_pmax] —
    # clamp only for the evaluation, so the top (1-pmax) quantile maps
    # to the fit endpoint (chi -> chi_max) instead of never being drawn
    yn = 2.0 * jnp.minimum(r, plan.chi_fit_pmax) / plan.chi_fit_pmax \
        - 1.0
    rows = [_clenshaw(row, yn) for row in plan.chi_fit_coeffs]
    u = _clenshaw(rows, xn)
    # chi_max = eta/2 uses the clamped table abscissa, matching the
    # reference's row-clamped axis (photons.F90:452-463)
    return 10.0 ** (lgc - math.log10(2.0) + jnp.minimum(u, 0.0))


def _invert_cdf_rows(log_x_axis, row_axes, p_table, x_in, p, chimin=None):
    """Given per-row CDF table p_table(nx, ny) with per-row y axes, find
    y(x_in, p) by interpolating the inverse CDF (find_value_from_table_alt).

    Dense TPU formulation: select the nearest row, then invert the 1d CDF
    with a masked comparison (ny ≲ 300)."""
    log_x_axis = jnp.asarray(log_x_axis)
    row_axes = jnp.asarray(row_axes)
    p_table = jnp.asarray(p_table)
    lx = jnp.log10(jnp.maximum(x_in, 1e-300))
    nx = log_x_axis.shape[0]
    fi = (lx - log_x_axis[0]) / (log_x_axis[-1] - log_x_axis[0]) * (nx - 1)
    i = jnp.clip(jnp.round(fi).astype(jnp.int32), 0, nx - 1)
    cdf = p_table[i]                # (N, ny)
    axis = row_axes[i]              # (N, ny)
    # index of first CDF >= p
    ge = cdf >= p[:, None]
    j = jnp.argmax(ge, axis=1)
    j = jnp.clip(j, 1, cdf.shape[1] - 1)
    c0 = jnp.take_along_axis(cdf, (j - 1)[:, None], 1)[:, 0]
    c1 = jnp.take_along_axis(cdf, j[:, None], 1)[:, 0]
    y0 = jnp.take_along_axis(axis, (j - 1)[:, None], 1)[:, 0]
    y1 = jnp.take_along_axis(axis, j[:, None], 1)[:, 0]
    f = jnp.where(c1 > c0, (p - c0) / jnp.maximum(c1 - c0, 1e-300), 0.0)
    return 10.0 ** (y0 + jnp.clip(f, 0, 1) * (y1 - y0))


def _field_at_particles(state, cfg, slab):
    from ..core import push as psh
    from ..core import shapes
    from ..core.boundaries import STAGGER
    grid = cfg.grid
    pplan = psh.PushPlan(cfg)
    nd = grid.ndims
    cell1, g_w, cell2, h_w = [], [], [], []
    for d in range(nd):
        rel = slab.x[:, d] - grid.grid_min(d)
        c1, cf1 = shapes.cell_and_frac(rel, 1.0 / grid.delta[d],
                                       grid.shape_fn, grid.ng, False)
        c2, cf2 = shapes.cell_and_frac(rel, 1.0 / grid.delta[d],
                                       grid.shape_fn, grid.ng, True)
        cell1.append(jnp.clip(c1, 0, grid.padded_shape()[d] - 1))
        cell2.append(jnp.clip(c2, 0, grid.padded_shape()[d] - 1))
        g_w.append(shapes.support_weights(grid.shape_fn, cf1))
        h_w.append(shapes.support_weights(grid.shape_fn, cf2))

    def gat(field, name):
        stag = STAGGER[name]
        cells = [cell2[d] if stag[d] else cell1[d] for d in range(nd)]
        ws = [h_w[d] if stag[d] else g_w[d] for d in range(nd)]
        return pplan.fac * psh.gather_field(field, cells, ws, pplan.strides)

    f = state.fields
    return (gat(f.ex, "ex"), gat(f.ey, "ey"), gat(f.ez, "ez"),
            gat(f.bx, "bx"), gat(f.by, "by"), gat(f.bz, "bz"))


def _eta_electron(e, b, u, gamma):
    """calculate_eta (photons.F90:661-712): η from the dipole emission
    intensity of the perpendicular Lorentz force."""
    ex, ey, ez = e
    bx, by, bz = b
    ux, uy, uz = u
    mod2 = jnp.maximum(ux ** 2 + uy ** 2 + uz ** 2, 1e-300)
    betax, betay, betaz = ux / gamma, uy / gamma, uz / gamma
    lambdac = const.h_bar / (const.m0 * const.c)
    coeff = math.sqrt(3.0 * lambdac
                      / (2.0 * const.alpha_fine * const.m0 * const.c ** 3))
    u_dot_e = (ux * ex + uy * ey + uz * ez) / mod2
    fx = const.q0 * (ex - u_dot_e * ux + const.c * (betay * bz - betaz * by))
    fy = const.q0 * (ey - u_dot_e * uy + const.c * (betaz * bx - betax * bz))
    fz = const.q0 * (ez - u_dot_e * uz + const.c * (betax * by - betay * bx))
    tau0 = const.q0 ** 2 / (6.0 * math.pi * const.epsilon0
                            * const.m0 * const.c ** 3)
    be = (betax * ex + betay * ey + betaz * ez)
    i_e = tau0 * gamma ** 2 * (fx ** 2 + fy ** 2 + fz ** 2
                               + (const.q0 * be / jnp.sqrt(mod2)) ** 2) \
        / const.m0
    return coeff * jnp.sqrt(jnp.maximum(i_e, 0.0))


def _chi_photon(e, b, dirv, part_e):
    """calculate_chi (photons.F90:714-745)."""
    ex, ey, ez = e
    bx, by, bz = b
    dx_, dy_, dz_ = dirv
    edd = ex * dx_ + ey * dy_ + ez * dz_
    qx = ex - edd * dx_ + const.c * (dy_ * bz - dz_ * by)
    qy = ey - edd * dy_ + const.c * (dz_ * bx - dx_ * bz)
    qz = ez - edd * dz_ + const.c * (dx_ * by - dy_ * bx)
    return 0.5 * jnp.sqrt(qx ** 2 + qy ** 2 + qz ** 2) * part_e / E_S


def _run_trident(species, b, i, plan, bplan, eta, alive, active, key,
                 i_odt, dt, mc0):
    """Trident pairs on the binned engine (TRIDENT_PHOTONS,
    photons.F90:502-572,1010-1042); mutates ``species`` in place.
    Uses a folded-in RNG stream so the caller's key stays untouched.
    NOTE: pre-round-4 builds consumed a split here, so seeded runs
    draw a different (equally valid) stream than those versions —
    a bit-exact mismatch against old outputs is not a physics
    regression."""
    from ..core import binned as binmod
    if not (plan.use_trident and i_odt >= 0 and plan.tri_electron >= 0
            and plan.tri_positron >= 0):
        return
    tab = plan.tables
    k3 = jax.random.fold_in(key, 7)
    odt = b.aux[i_odt]
    odt = jnp.where(odt <= 0.0,
                    -jnp.log(1.0 - jax.random.uniform(
                        k3, odt.shape, odt.dtype, maxval=0.999999)),
                    odt)
    omega_hat = 10.0 ** _interp_1d(
        tab.t_logchi, tab.omega_val,
        jnp.log10(jnp.maximum(eta, 1e-30)))
    gam_t = jnp.sqrt((b.p[0] ** 2 + b.p[1] ** 2 + b.p[2] ** 2)
                     / mc0 ** 2 + 1.0)
    d_odt = dt * eta * const.alpha_fine ** 2 * 0.64 * omega_hat \
        / (2.0 * math.pi * TAU_C * gam_t)
    odt = (odt - jnp.where(alive & active, d_odt, 0.0)) \
        .astype(b.aux.dtype)
    fire_t = alive & active & (odt <= 0.0)
    p_zero = jnp.zeros_like(b.p)
    cand_w = jnp.where(fire_t, b.w, 0.0)
    species[plan.tri_electron] = binmod.merge_candidates(
        species[plan.tri_electron], b.xi, p_zero, cand_w, bplan)
    species[plan.tri_positron] = binmod.merge_candidates(
        species[plan.tri_positron], b.xi, p_zero, cand_w, bplan)
    odt = jnp.where(fire_t, -jnp.log(1.0 - jax.random.uniform(
        jax.random.fold_in(k3, 1), odt.shape, odt.dtype,
        maxval=0.999999)), odt)
    species[i] = b._replace(aux=b.aux.at[i_odt].set(odt))


def _qed_binned(state, cfg, plan: QEDPlan, key):
    """QED on the binned (slot-grid) engine: identical rate math; the
    gather is the slot-grid roll gather, optical depths live in the
    per-particle aux rows, and photon/pair creation is a cell-local
    candidate merge (binned.merge_candidates) — every created particle
    lands in its parent's cell (photons.F90:867-1042)."""
    from ..core import binned as binmod

    grid = cfg.grid
    bplan = binmod.BinnedPlan(cfg)
    tab = plan.tables
    dt = cfg.dt
    mc0 = const.m0 * const.c
    species = list(state.species)
    active = (state.time > plan.start_time) \
        & (state.time >= cfg.particle_push_start_time)
    i_od = bplan.aux_idx["opdepth"]
    i_odt = bplan.aux_idx.get("opdepth_tri", -1)

    def flat_invert(log_x_axis, row_axes, p_table, x_in, p):
        out = _invert_cdf_rows(log_x_axis, row_axes, p_table,
                               x_in.reshape(-1), p.reshape(-1))
        return out.reshape(x_in.shape)

    for i in plan.emitters:
        if plan.emit_in_kernel.get(i):
            # emission ran fully inside the fused kernel this step:
            # chi sample + recoil in the emitter kernel, the photon
            # append through the photon kernel's rebin (step.py feeds
            # the candidate block) — nothing left to do XLA-side
            continue
        b = species[i]
        sp_cfg = cfg.species[i]
        key, k1, k2 = jax.random.split(key, 3)
        alive = b.w > 0
        if plan.rates_in_kernel.get(i):
            # the fused push already resampled/decremented the optical
            # depth and stored eta (aux rows): od <= 0 flags a fire —
            # no gather, no table interp here; emission resolves one
            # push after the crossing (dt-level latency)
            eta = b.aux[bplan.aux_idx["qed_eta"]]
            od = b.aux[i_od]
            # eta > 0 excludes slots the kernel has not rated yet
            # (pair-born electrons this step, step-0 uninitialised
            # rows): od = 0 with eta = 0 would otherwise mass-fire
            # with a divergent e_ph = 2chi/eta and zero every
            # momentum (same guard as the photon chi_row > 0 below)
            fire = alive & active & (od <= 0.0) & (eta > 0.0)
        else:
            u = [b.p[c] / mc0 for c in range(3)]
            gamma = jnp.sqrt(u[0] ** 2 + u[1] ** 2 + u[2] ** 2 + 1.0)
            # end-of-push ξ is un-normalised; the shifted gather folds
            # the cell offset into widened windows instead of running
            # the slot-sort rebin every step
            fl = binmod.gather_fields_binned_shifted(state.fields, grid,
                                                     b.xi, bplan)
            eta = _eta_electron((fl["ex"], fl["ey"], fl["ez"]),
                                (fl["bx"], fl["by"], fl["bz"]), u, gamma)
            od = b.aux[i_od]
            od = jnp.where(od <= 0.0,
                           -jnp.log(1.0 - jax.random.uniform(
                               k1, od.shape, od.dtype, maxval=0.999999)),
                           od)
            h = 10.0 ** _interp_1d(tab.h_logeta, tab.h_val,
                                   jnp.log10(jnp.maximum(eta, 1e-30)))
            d_od = dt * eta * const.alpha_fine * math.sqrt(3.0) * h \
                / (2.0 * math.pi * TAU_C * gamma)
            # f64 constants (TAU_C) promote under x64 configs; od is
            # scattered back into the f32 aux rows — pin the dtype
            od = (od - jnp.where(alive & active, d_od, 0.0)) \
                .astype(b.aux.dtype)
            eta = eta.astype(b.aux.dtype)
            fire = alive & active & (od <= 0.0)

        # --- sparse emission, fire-gated.  Fires are rare; the old dense
        # inversion gathered a (N, n_chi) CDF row per SLOT per STEP (GBs
        # materialised; TPU gathers serialise) and a slot-level top_k
        # was itself a multi-ms sort over N=2.6M.  Extract fired CELLS
        # instead — sort-FREE: a cell-flat cumsum + searchsorted yields
        # the first kc fired cell indices (top_k lowers to a full
        # variadic sort on TPU, ~1 ms over 147k cells at bench shapes) —
        # gather those columns, do everything per-(K, cell-subset), and
        # gate the WHOLE tail behind any(fire).  The cond returns only
        # SMALL arrays ((Kp|Kc, kc) payloads + the kc cell indices); the
        # full-grid candidate/recoil arrays are built OUTSIDE by
        # unique-index scatters in the kernel's native layout (large
        # cond outputs forced ~14 MB of conditional join copies).
        Kp = b.w.shape[0]
        fshape = fire.shape
        gshape = fshape[1:]
        N = fire.size
        C = N // Kp
        # cap sized for the measured regime (QED LWFA bench: ~210 fired
        # cells/step at 2.3M particles): every gather/scatter in the
        # tail scales with kc; cells beyond it are counted drops
        kc = min(int(os.environ.get("EPOCH_TPU_FIRE_CELL_CAP", 256)), C)
        with_photons = plan.produce_photons and plan.photon_species >= 0
        ph0 = species[plan.photon_species] if with_photons else None

        Kc = int(os.environ.get("EPOCH_TPU_EMIT_RANK_CAP", 4))
        nd_ = bplan.nd

        # DENSE emission tail (default): in a developed high-eta
        # interaction (the Breit-Wheeler cascade flagship) MOST cells
        # fire every step — the sparse fired-cell extraction's kc cap
        # then drops the bulk of the emission (measured: 1.27 M photons
        # dropped vs 1 k stored on the cascade bench).  The reference
        # has no such cap: emission runs per-particle inside the hot
        # loop (photons.F90:524-1042).  The dense tail samples chi for
        # every slot from the gather-free Chebyshev fit (elementwise),
        # applies recoil as a full-field scale, and builds the per-cell
        # ranked candidate rows by K-deep masked reductions — no
        # searchsorted, no scatters, no fired-cell cap; the only caps
        # left are the physical ones (Kc candidates per cell per step,
        # K slots per cell), both counted.  Still gated behind
        # any(fire) so no-fire steps pay nothing.
        if os.environ.get("EPOCH_TPU_QED_TAIL", "dense") != "sparse":
            def _emit_dense(_):
                # full-range uniform: the reference samples (0,1)
                # (photons.F90 generate_photon); _sample_chi_fit clamps
                # to the fit domain internally
                r = jax.random.uniform(k2, fshape, b.w.dtype)
                chi = _sample_chi_fit(plan, eta, r)
                mag = jnp.sqrt(b.p[0] ** 2 + b.p[1] ** 2 + b.p[2] ** 2)
                msafe = jnp.where(mag > 0, mag, 1.0)
                gam = jnp.sqrt((mag / mc0) ** 2 + 1.0)
                e_ph = ((2.0 * chi / jnp.maximum(eta, 1e-30)) * gam
                        * const.m0 * const.c ** 2).astype(b.w.dtype)
                scale = jnp.where(
                    fire,
                    jnp.maximum(mag - e_ph / const.c, 0.0) / msafe,
                    1.0).astype(b.w.dtype)
                over = jnp.zeros((), jnp.int32)
                cand_w = jnp.zeros((Kc,) + gshape, b.w.dtype)
                cand_xi = jnp.zeros((nd_, Kc) + gshape, b.xi.dtype)
                cand_p = jnp.zeros((3, Kc) + gshape, b.p.dtype)
                if with_photons:
                    keep = fire & (e_ph > plan.photon_energy_min)
                    rank = jnp.cumsum(keep.astype(jnp.int32), axis=0) - 1
                    over = jnp.sum(keep
                                   & (rank >= Kc)).astype(jnp.int32)
                    p_ph = b.p * (e_ph / const.c / msafe)[None]
                    sels = [keep & (rank == rr) for rr in range(Kc)]
                    cand_w = jnp.stack(
                        [jnp.sum(jnp.where(s, b.w, 0.0), axis=0)
                         for s in sels])
                    cand_xi = jnp.stack(
                        [jnp.sum(jnp.where(s[None], b.xi, 0.0), axis=1)
                         for s in sels], axis=1)
                    cand_p = jnp.stack(
                        [jnp.sum(jnp.where(s[None], p_ph, 0.0), axis=1)
                         for s in sels], axis=1)
                return scale, cand_w, cand_xi, cand_p, over

            def _no_fire_dense(_):
                return (jnp.ones(fshape, b.w.dtype),
                        jnp.zeros((Kc,) + gshape, b.w.dtype),
                        jnp.zeros((nd_, Kc) + gshape, b.xi.dtype),
                        jnp.zeros((3, Kc) + gshape, b.p.dtype),
                        jnp.zeros((), jnp.int32))

            if os.environ.get("EPOCH_TPU_QED_GATE", "1") == "0":
                scale, cand_w, cand_xi, cand_p, over = _emit_dense(None)
            else:
                scale, cand_w, cand_xi, cand_p, over = jax.lax.cond(
                    jnp.any(fire), _emit_dense, _no_fire_dense, None)
            newp = b.p * scale[None] \
                if plan.use_radiation_reaction else b.p
            if with_photons:
                species[plan.photon_species] = binmod.append_compressed(
                    ph0, cand_xi, cand_p, cand_w, bplan)
                species[plan.photon_species] = \
                    species[plan.photon_species]._replace(
                        n_dropped=species[plan.photon_species].n_dropped
                        + over)
            if plan.rates_in_kernel.get(i):
                b = b._replace(p=newp)
            else:
                b = b._replace(p=newp, aux=b.aux.at[i_od].set(od))
            species[i] = b
            _run_trident(species, b, i, plan, bplan, eta, alive, active,
                         key, i_odt, dt, mc0)
            continue

        def _emit_tail(_):
            # cell extraction: cum[i] = #fired cells in [0..i]; the s-th
            # fired cell is where cum first reaches s+1 — a vectorised
            # binary search (kc·log2(C) gathers), no sort.  Unused slots
            # saturate to C (out of range), the caller's drop marker.
            fire_cell = jnp.any(fire, axis=0).reshape(-1)
            cum = jnp.cumsum(fire_cell.astype(jnp.int32))
            cidx = jnp.searchsorted(
                cum, jnp.arange(1, kc + 1, dtype=cum.dtype)
            ).astype(jnp.int32)
            cok = cidx < C
            uc = jnp.unravel_index(jnp.clip(cidx, 0, C - 1), gshape)
            i2 = (slice(None),) + uc            # (Kp, kc) selections
            i3 = (slice(None), slice(None)) + uc  # (lead, Kp, kc)
            fire_c = fire[i2] & cok[None]
            over_fires = (jnp.sum(fire)
                          - jnp.sum(fire_c)).astype(jnp.int32)
            eta_c = eta[i2]
            p_c = b.p[i3]
            mag_c = jnp.sqrt(p_c[0] ** 2 + p_c[1] ** 2 + p_c[2] ** 2)
            gam_c = jnp.sqrt((mag_c / mc0) ** 2 + 1.0)
            msafe_c = jnp.where(mag_c > 0, mag_c, 1.0)
            dir_c = p_c / msafe_c[None]
            r_c = jax.random.uniform(k2, (Kp, kc), b.w.dtype)
            chi_c = _invert_cdf_rows(
                tab.log_eta, tab.log_chi, tab.p_photon,
                eta_c.reshape(-1), r_c.reshape(-1)).reshape(Kp, kc)
            # float64 constants promote under x64 configs — pin to the
            # state dtype (the cond's branches must agree, and the
            # cand_p .at[].set would otherwise warn on the downcast)
            e_ph_c = ((2.0 * chi_c / jnp.maximum(eta_c, 1e-30)) * gam_c
                      * const.m0 * const.c ** 2).astype(b.w.dtype)
            # recoil as a |p| ratio, applied outside as p * scale
            scale_c = jnp.where(
                fire_c,
                jnp.maximum(mag_c - e_ph_c / const.c, 0.0) / msafe_c,
                1.0).astype(b.w.dtype)
            cand_w = jnp.zeros((Kc, C), b.w.dtype)
            cand_xi = jnp.zeros((nd_, Kc, C), b.xi.dtype)
            cand_p = jnp.zeros((3, Kc, C), b.p.dtype)
            over_rank = jnp.zeros((), jnp.int32)
            if with_photons:
                # COMPRESSED candidate grid: rank fired slots within
                # their cells (a K-deep cumsum, no sort); the append is
                # Kc K-deep selects instead of the dense merge's
                # multi-payload lax.sort (6.5 ms/step at bench shapes).
                # The dense (Kc, grid) grids are built HERE, inside the
                # cond (fire steps only): building them outside from
                # compressed cond outputs re-materialised the zero grids
                # every step (measured +4 ms/step in the cascade bench).
                # Scatters go at FLAT cell indices with invalid slots
                # remapped to unique out-of-range fills (mode="drop"):
                # clipping them to C-1 made a zero write COLLIDE with a
                # genuine candidate whenever the last cell fired, and
                # duplicate-index .set order is undefined (one photon
                # silently vanished in the Breit-Wheeler weight-book
                # test).  The flat->grid reshape is a row-major bitcast.
                keep_c = fire_c & (e_ph_c > plan.photon_energy_min)
                rank_c = jnp.cumsum(keep_c.astype(jnp.int32), axis=0) - 1
                over_rank = jnp.sum(keep_c
                                    & (rank_c >= Kc)).astype(jnp.int32)
                xi_c = b.xi[i3]
                p_ph_c = dir_c * (e_ph_c / const.c)[None]
                w_c = b.w[i2]
                cu = jnp.where(cok, cidx,
                               C + jnp.arange(kc, dtype=jnp.int32))
                for r in range(Kc):
                    sel = keep_c & (rank_c == r)
                    wv = jnp.sum(jnp.where(sel, w_c, 0.0), axis=0)
                    cand_w = cand_w.at[r, cu].set(
                        wv, mode="drop", unique_indices=True)
                    xv = jnp.sum(jnp.where(sel[None], xi_c, 0.0), axis=1)
                    cand_xi = cand_xi.at[:, r, cu].set(
                        xv, mode="drop", unique_indices=True)
                    pv = jnp.sum(jnp.where(sel[None], p_ph_c, 0.0),
                                 axis=1)
                    cand_p = cand_p.at[:, r, cu].set(
                        pv, mode="drop", unique_indices=True)
            cand_w = cand_w.reshape((Kc,) + gshape)
            cand_xi = cand_xi.reshape((nd_, Kc) + gshape)
            cand_p = cand_p.reshape((3, Kc) + gshape)
            # fires beyond the fired-cell cap / per-cell rank cap are
            # dropped photons — counted like every other overflow
            return (cidx, scale_c, cand_w, cand_xi, cand_p,
                    over_fires + over_rank)

        def _no_fire(_):
            return (jnp.full((kc,), C, jnp.int32),
                    jnp.ones((Kp, kc), b.w.dtype),
                    jnp.zeros((Kc,) + gshape, b.w.dtype),
                    jnp.zeros((nd_, Kc) + gshape, b.xi.dtype),
                    jnp.zeros((3, Kc) + gshape, b.p.dtype),
                    jnp.zeros((), jnp.int32))

        if os.environ.get("EPOCH_TPU_QED_GATE", "1") == "0":
            # debug/profiling: run the tail unconditionally so its ops
            # show up flat in a device trace (a lax.cond hides them)
            cidx, scale_c, cand_w, cand_xi, cand_p, over = \
                _emit_tail(None)
        else:
            cidx, scale_c, cand_w, cand_xi, cand_p, over = jax.lax.cond(
                jnp.any(fire), _emit_tail, _no_fire, None)
        # out-of-range fills made unique so the scale scatter below can
        # declare unique_indices (XLA otherwise serialises the updates)
        cidx_u = jnp.where(cidx < C, cidx,
                           C + jnp.arange(kc, dtype=jnp.int32))
        if plan.use_radiation_reaction:
            # dense recoil scale: ones with the fired ratios scattered
            # in at the (distinct) fired cells, then an elementwise
            # multiply — p itself never passes through a gather/scatter,
            # so it stays in the kernel's native layout
            scale = jnp.ones((Kp, C), b.w.dtype).at[:, cidx_u].set(
                scale_c, mode="drop",
                unique_indices=True).reshape(fshape)
            newp = b.p * scale[None]
        else:
            newp = b.p
        if with_photons:
            species[plan.photon_species] = binmod.append_compressed(
                ph0, cand_xi, cand_p, cand_w, bplan)
            species[plan.photon_species] = \
                species[plan.photon_species]._replace(
                    n_dropped=species[plan.photon_species].n_dropped
                    + over)
        if plan.rates_in_kernel.get(i):
            # od lives in aux untouched here (the kernel maintains it):
            # skip the .at[].set, which forced a full aux copy per step
            b = b._replace(p=newp)
        else:
            b = b._replace(p=newp, aux=b.aux.at[i_od].set(od))
        species[i] = b
        _run_trident(species, b, i, plan, bplan, eta, alive, active,
                     key, i_odt, dt, mc0)

    # photons → pairs (Breit-Wheeler, generate_pair :944)
    if plan.produce_pairs and plan.photon_species >= 0:
        iph = plan.photon_species
        b = species[iph]
        sp_cfg = cfg.species[iph]
        key, k1, k2 = jax.random.split(key, 3)
        alive = b.w > 0
        if plan.rates_in_kernel.get(iph):
            # the fused photon kernel decremented the pair optical depth
            # in-kernel (chi from its own gathered fields, and only for
            # pair-eligible photons, E > 2·m0·c²): od <= 0 flags a fire
            # — no gather/table interp and no dense |p| recomputation
            # here.  chi > 0 excludes photons created THIS step by the
            # emission append (aux rows zero until their first kernel
            # pass — od = 0 would otherwise read as an instant fire).
            od = b.aux[i_od]
            chi_row = b.aux[bplan.aux_idx["qed_eta"]]
            fire = alive & active & (od <= 0.0) & (chi_row > 0.0)
            set_od = None
        else:
            mag_p = jnp.sqrt(b.p[0] ** 2 + b.p[1] ** 2 + b.p[2] ** 2)
            mag_safe = jnp.where(mag_p > 0, mag_p, 1.0)
            part_e = const.c * mag_p / (const.m0 * const.c ** 2)
            dirv = b.p / mag_safe[None]
            fl = binmod.gather_fields_binned_shifted(state.fields, grid,
                                                     b.xi, bplan)
            chi = _chi_photon((fl["ex"], fl["ey"], fl["ez"]),
                              (fl["bx"], fl["by"], fl["bz"]),
                              (dirv[0], dirv[1], dirv[2]), part_e)
            od = b.aux[i_od]
            od = jnp.where(od <= 0.0,
                           -jnp.log(1.0 - jax.random.uniform(
                               k1, od.shape, od.dtype, maxval=0.999999)),
                           od)
            tpair = 10.0 ** _interp_1d(
                tab.t_logchi, tab.t_val,
                jnp.log10(jnp.maximum(chi, 1e-30)))
            d_od = dt / TAU_C * const.alpha_fine \
                / jnp.maximum(part_e, 1e-30) * chi * tpair
            od = (od - jnp.where(alive & active, d_od, 0.0)) \
                .astype(b.aux.dtype)
            fire = alive & active & (od <= 0.0) & (part_e > 2.0)
            set_od = od

        make_pairs = plan.bw_electron >= 0 and plan.bw_positron >= 0
        if make_pairs:
            # sparse, fire-gated pair creation (mirror of the emission
            # tail above): the dense path inverted the energy-split CDF
            # for EVERY slot and ran two sort-based merge_candidates
            # every step — ~2x 7 ms at bench shapes with zero fires.
            # Extract fired CELLS (cumsum + searchsorted, sort-free), do
            # the inversion on the (K, kc) column subset, and return
            # only the compressed (Kc, kc) payloads from the cond; the
            # appends decompress them by kc-sized unique-index scatters.
            Kp = b.w.shape[0]
            gshape = fire.shape[1:]
            C = fire.size // Kp
            kc = min(int(os.environ.get("EPOCH_TPU_FIRE_CELL_CAP", 256)),
                     C)
            bwe0 = species[plan.bw_electron]
            bwp0 = species[plan.bw_positron]
            eps_axes = jnp.broadcast_to(
                jnp.log10(jnp.maximum(jnp.asarray(tab.epsilon_split),
                                      1e-30))[None, :],
                (tab.log_chi2.shape[0], tab.epsilon_split.shape[0]))

            Kc = int(os.environ.get("EPOCH_TPU_EMIT_RANK_CAP", 4))
            nd_ = bplan.nd

            def _pair_tail(_):
                # same layout discipline as the emission tail: the cond
                # returns only the compressed (Kc, kc) candidate
                # payloads for the two pair species; the photon kill and
                # the appends are elementwise ops outside
                fire_cell = jnp.any(fire, axis=0).reshape(-1)
                cum = jnp.cumsum(fire_cell.astype(jnp.int32))
                cidx = jnp.searchsorted(
                    cum, jnp.arange(1, kc + 1, dtype=cum.dtype)
                ).astype(jnp.int32)
                cok = cidx < C
                uc = jnp.unravel_index(jnp.clip(cidx, 0, C - 1), gshape)
                i2 = (slice(None),) + uc
                i3 = (slice(None), slice(None)) + uc
                fire_c = fire[i2] & cok[None]
                over_fires = (jnp.sum(fire)
                              - jnp.sum(fire_c)).astype(jnp.int32)
                p_c = b.p[i3]
                mag_c = jnp.sqrt(p_c[0] ** 2 + p_c[1] ** 2
                                 + p_c[2] ** 2)
                dir_c = p_c / jnp.where(mag_c > 0, mag_c, 1.0)[None]
                w_c = b.w[i2]
                xi_c = b.xi[i3]
                # chi at the fired subset: recompute from the aux eta
                # row is unavailable for photons — invert the energy-
                # split CDF with chi re-derived column-wise
                if plan.rates_in_kernel.get(iph):
                    chi_c = b.aux[bplan.aux_idx["qed_eta"]][i2]
                else:
                    chi_c = chi[i2]
                r_c = jax.random.uniform(k2, (Kp, kc), b.w.dtype)
                frac_c = _invert_cdf_rows(
                    tab.log_chi2, eps_axes, tab.p_energy,
                    chi_c.reshape(-1), r_c.reshape(-1)).reshape(Kp, kc)
                # the f64 table axes promote under x64 configs; the
                # .at[].set into the f32 candidate grids below would
                # otherwise warn (future JAX: error) on the downcast
                frac_c = jnp.clip(frac_c, 0.0, 1.0).astype(b.w.dtype)
                rank_c = jnp.cumsum(fire_c.astype(jnp.int32), axis=0) - 1
                over_rank = jnp.sum(fire_c
                                    & (rank_c >= Kc)).astype(jnp.int32)
                # flat scatters at unique saturated indices (see the
                # emission tail): clipped fills collided with a genuine
                # candidate at the last cell and zeroed it
                cu = jnp.where(cok, cidx,
                               C + jnp.arange(kc, dtype=jnp.int32))
                cands = []
                for fr in (frac_c, 1.0 - frac_c):
                    p_t = dir_c * (fr * mag_c)[None]
                    cand_w = jnp.zeros((Kc, C), b.w.dtype)
                    cand_xi = jnp.zeros((nd_, Kc, C), b.xi.dtype)
                    cand_p = jnp.zeros((3, Kc, C), b.p.dtype)
                    for r in range(Kc):
                        sel = fire_c & (rank_c == r)
                        wv = jnp.sum(jnp.where(sel, w_c, 0.0), axis=0)
                        cand_w = cand_w.at[r, cu].set(
                            wv, mode="drop", unique_indices=True)
                        xv = jnp.sum(jnp.where(sel[None], xi_c, 0.0),
                                     axis=1)
                        cand_xi = cand_xi.at[:, r, cu].set(
                            xv, mode="drop", unique_indices=True)
                        pv = jnp.sum(jnp.where(sel[None], p_t, 0.0),
                                     axis=1)
                        cand_p = cand_p.at[:, r, cu].set(
                            pv, mode="drop", unique_indices=True)
                    cands.extend([
                        cand_w.reshape((Kc,) + gshape),
                        cand_xi.reshape((nd_, Kc) + gshape),
                        cand_p.reshape((3, Kc) + gshape)])
                return tuple(cands) + (over_fires + over_rank,)

            def _no_pair(_):
                zw = jnp.zeros((Kc,) + gshape, b.w.dtype)
                zxi = jnp.zeros((nd_, Kc) + gshape, b.xi.dtype)
                zp = jnp.zeros((3, Kc) + gshape, b.p.dtype)
                return (zw, zxi, zp, zw, zxi, zp,
                        jnp.zeros((), jnp.int32))

            (ew, exi, ep, pw, pxi, pp, over) = jax.lax.cond(
                jnp.any(fire), _pair_tail, _no_pair, None)
            bwe1 = binmod.append_compressed(bwe0, exi, ep, ew, bplan)
            bwp1 = binmod.append_compressed(bwp0, pxi, pp, pw, bplan)
            species[plan.bw_electron] = bwe1._replace(
                n_dropped=bwe1.n_dropped + over)
            species[plan.bw_positron] = bwp1._replace(
                n_dropped=bwp1.n_dropped + over)
            ph_w = jnp.where(fire, 0.0, b.w)
        else:
            ph_w = jnp.where(fire, 0.0, b.w)
        if set_od is None:
            species[iph] = species[iph]._replace(w=ph_w)
        else:
            species[iph] = species[iph]._replace(
                w=ph_w, aux=b.aux.at[i_od].set(set_od))

    return state._replace(species=tuple(species)), key


def qed_update(state, cfg, plan: QEDPlan, key):
    """qed_update_optical_depth (photons.F90:524-607)."""
    if cfg.species and hasattr(state.species[0], "xi"):
        return _qed_binned(state, cfg, plan, key)
    dt = cfg.dt
    species = list(state.species)
    tab = plan.tables
    mc0 = const.m0 * const.c
    drops = jnp.zeros((), jnp.int32)
    # the reference gates QED on the push being active AND
    # time > qed_start_time (photons.F90 via epoch1d.F90:190-196)
    active = (state.time > plan.start_time) \
        & (state.time >= cfg.particle_push_start_time)

    for i in plan.emitters:
        slab = species[i]
        if slab.cap == 0:
            continue
        key, k1, k2 = jax.random.split(key, 3)
        u = [slab.p[:, c] / mc0 for c in range(3)]
        gamma = jnp.sqrt(u[0] ** 2 + u[1] ** 2 + u[2] ** 2 + 1.0)
        e, b3 = None, None
        ex, ey, ez, bx, by, bz = _field_at_particles(state, cfg, slab)
        eta = _eta_electron((ex, ey, ez), (bx, by, bz), u, gamma)
        # lazily (re)sample exhausted depths (reset_optical_depth)
        od = slab.opdepth
        od = jnp.where(od <= 0.0,
                       -jnp.log(1.0 - jax.random.uniform(
                           k1, od.shape, od.dtype, maxval=0.999999)),
                       od)
        # tables store log10 values; the reference exponentiates the
        # interpolant (find_value_from_table_1d, photons.F90:1046-1096)
        h = 10.0 ** _interp_1d(tab.h_logeta, tab.h_val,
                               jnp.log10(jnp.maximum(eta, 1e-300)))
        d_od = dt * eta * const.alpha_fine * math.sqrt(3.0) * h \
            / (2.0 * math.pi * TAU_C * gamma)
        od = od - jnp.where(slab.alive & active, d_od, 0.0)
        fire = slab.alive & active & (od <= 0.0)

        # photon energy from the tabulated inverse CDF (generate_photon)
        r = jax.random.uniform(k2, od.shape, od.dtype)
        chi_final = _invert_cdf_rows(tab.log_eta, tab.log_chi, tab.p_photon,
                                     eta, r)
        e_ph = (2.0 * chi_final / jnp.maximum(eta, 1e-300)) * gamma \
            * const.m0 * const.c ** 2
        mag_p = jnp.maximum(jnp.sqrt(jnp.sum(slab.p ** 2, axis=1)), 1e-300)
        dirv = slab.p / mag_p[:, None]
        if plan.use_radiation_reaction:
            new_mag = jnp.where(fire, jnp.maximum(
                mag_p - e_ph / const.c, 0.0), mag_p)
            newp = dirv * new_mag[:, None]
        else:
            newp = slab.p
        species[i] = slab._replace(p=newp, opdepth=od)

        if plan.produce_photons and plan.photon_species >= 0:
            keep = fire & (e_ph > plan.photon_energy_min)
            ph = species[plan.photon_species]
            p_ph = dirv * (e_ph / const.c)[:, None]
            ph, d_ = append_particles(ph, slab.x, p_ph, slab.weight,
                                      keep, with_count=True)
            drops = drops + d_
            species[plan.photon_species] = ph

        # trident pair production (TRIDENT_PHOTONS, photons.F90:502-572):
        # depth depletes as dt·η·α²·0.64·ω̂(η)/(2π τ_c γ); at τ ≤ 0 an
        # e⁻e⁺ pair is created at rest with the electron's weight
        # (generate_pair_tri :1010-1042)
        if plan.use_trident and plan.tri_electron >= 0 \
                and plan.tri_positron >= 0:
            slab = species[i]
            key, k3 = jax.random.split(key)
            odt = slab.opdepth_tri
            odt = jnp.where(odt <= 0.0,
                            -jnp.log(1.0 - jax.random.uniform(
                                k3, odt.shape, odt.dtype, maxval=0.999999)),
                            odt)
            omega_hat = 10.0 ** _interp_1d(
                tab.t_logchi, tab.omega_val,
                jnp.log10(jnp.maximum(eta, 1e-300)))
            d_odt = dt * eta * const.alpha_fine ** 2 * 0.64 * omega_hat \
                / (2.0 * math.pi * TAU_C * gamma)
            odt = odt - jnp.where(slab.alive & active, d_odt, 0.0)
            fire_t = slab.alive & active & (odt <= 0.0)
            p_zero = jnp.zeros_like(slab.p)
            species[plan.tri_electron], d1 = append_particles(
                species[plan.tri_electron], slab.x, p_zero, slab.weight,
                fire_t, with_count=True)
            species[plan.tri_positron], d2 = append_particles(
                species[plan.tri_positron], slab.x, p_zero, slab.weight,
                fire_t, with_count=True)
            drops = drops + d1 + d2
            odt = jnp.where(fire_t, -jnp.log(1.0 - jax.random.uniform(
                jax.random.fold_in(k3, 1), odt.shape, odt.dtype,
                maxval=0.999999)), odt)
            species[i] = slab._replace(opdepth_tri=odt)

    # photons → pairs (Breit-Wheeler)
    if plan.produce_pairs and plan.photon_species >= 0:
        iph = plan.photon_species
        slab = species[iph]
        if slab.cap > 0:
            key, k1, k2 = jax.random.split(key, 3)
            e_photon = const.c * jnp.sqrt(jnp.sum(slab.p ** 2, axis=1))
            part_e = e_photon / (const.m0 * const.c ** 2)
            mag = jnp.maximum(e_photon / const.c, 1e-300)
            dirv = slab.p / mag[:, None]
            ex, ey, ez, bx, by, bz = _field_at_particles(state, cfg, slab)
            chi = _chi_photon((ex, ey, ez), (bx, by, bz),
                              (dirv[:, 0], dirv[:, 1], dirv[:, 2]), part_e)
            od = slab.opdepth
            od = jnp.where(od <= 0.0,
                           -jnp.log(1.0 - jax.random.uniform(
                               k1, od.shape, od.dtype, maxval=0.999999)),
                           od)
            tpair = 10.0 ** _interp_1d(
                tab.t_logchi, tab.t_val,
                jnp.log10(jnp.maximum(chi, 1e-300)))
            d_od = dt / TAU_C * const.alpha_fine \
                / jnp.maximum(part_e, 1e-300) * chi * tpair
            od = od - jnp.where(slab.alive & active, d_od, 0.0)
            fire = slab.alive & active & (od <= 0.0) & (part_e > 2.0)

            r = jax.random.uniform(k2, od.shape, od.dtype)
            # energy split fraction from energy_split.table (generate_pair)
            eps_axes = jnp.broadcast_to(
                jnp.log10(jnp.maximum(jnp.asarray(tab.epsilon_split),
                                      1e-300))[None, :],
                (tab.log_chi2.shape[0], tab.epsilon_split.shape[0]))
            frac = _invert_cdf_rows(tab.log_chi2, eps_axes, tab.p_energy,
                                    chi, r)
            frac = jnp.clip(frac, 0.0, 1.0)
            if plan.bw_electron >= 0 and plan.bw_positron >= 0:
                pe = dirv * (frac * mag)[:, None]
                pp = dirv * ((1.0 - frac) * mag)[:, None]
                species[plan.bw_electron], d1 = append_particles(
                    species[plan.bw_electron], slab.x, pe, slab.weight,
                    fire, with_count=True)
                species[plan.bw_positron], d2 = append_particles(
                    species[plan.bw_positron], slab.x, pp, slab.weight,
                    fire, with_count=True)
                drops = drops + d1 + d2
            alive = slab.alive & ~fire
            species[iph] = slab._replace(
                alive=alive, weight=jnp.where(alive, slab.weight, 0.0),
                opdepth=od)

    from ..core.slab_ops import add_dropped
    return add_dropped(state._replace(species=tuple(species)), drops), key
