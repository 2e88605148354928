"""Binary Coulomb collisions and electron-impact ionisation
(physics_packages/collisions.F90: particle_collisions :118,
intra/inter_collisions_sk :731,1166, intra/inter_collisions_np :959,1416,
collisional_ionisation :229, preionise :467, calc_coulomb_log :1811).

Two relativistic pairwise algorithms, selected by ``use_nanbu``:
Nanbu–Pérez (default: cumulative angle from Nanbu's distribution with the
Pérez et al. PoP 19, 083104 (2012) piecewise inversion and cold-plasma
limit s') and Sentoku–Kemp (JCP 227, 6846 (2008): Gaussian cumulative
angle with clamped collision frequency and the weighted-particle energy
correction).  Electron-impact ionisation uses MBELL/MRBEB cross sections.

TPU design, per engine:

* binned — per-cell pairing is free on the slot grid: a per-cell random
  shuffle is one lax.sort along the slot axis and pairs are adjacent
  slots (intra) or equal slots of the two species (inter);
* scatter — one argsort groups each species by cell with random
  within-cell order (the linked-list walk + Fisher–Yates shuffle of
  shuffle_particle_list_random :1747 collapses into the sort key); pairs
  are adjacent sorted entries (intra) or per-cell rank-matched rows
  truncated to the smaller count (inter), and per-cell densities and
  temperatures come from flat segment sums.
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants as const

PI4_EPS2_C4 = 4.0 * math.pi * const.epsilon0 ** 2 * const.c ** 4
TWO_THIRDS = 2.0 / 3.0
PI_FAC = (4.0 * math.pi / 3.0) ** (1.0 / 3.0)

# MBELL electron-impact ionisation coefficients (collisions.F90:82-112;
# Haque et al., MBELL model) — indices [n-1, l], [n-1, l, i-1]
E_REST_EV = const.m0 * const.c ** 2 / const.ev
MRBEB_CONST = 2.0 * math.pi * const.a0 ** 2 * const.alpha_fine ** 4
A_BELL = np.array([[0.5250, 0.0, 0.0],
                   [0.5300, 0.6000, 0.0],
                   [0.1300, 0.3880, 0.3500]]) * 1e-13
_B_RAW = [
    [-0.5100, -0.4100,  0.2500, 0.0, -0.4000, -0.2000, 0.0, 0.0,  1.6000],
    [ 0.2000,  0.1500, -1.5000, 0.0, -0.7100, -0.2356, 0.0, 0.0, -3.0000],
    [ 0.0500,  0.1500,  2.4000, 0.0,  0.6550,  0.5355, 0.0, 0.0,  4.0000],
    [-0.0250, -0.2000,  3.2200, 0.0,  0.4250,  3.1500, 0.0, 0.0,  2.0000],
    [-0.1000, -0.1500, -3.6670, 0.0, -0.7500, -8.5000, 0.0, 0.0, -5.0000],
    [ 0.0000,  0.0000,  0.0000, 0.0,  0.0000,  5.0500, 0.0, 0.0, -1.5000],
    [ 0.0000,  0.0000,  0.0000, 0.0,  0.0000,  0.3700, 0.0, 0.0,  3.5000],
]
# Fortran column-major reshape (3,3,7): n fastest, then l, then i
B_BELL = np.array(_B_RAW).reshape(7, 3, 3).transpose(2, 1, 0) * 1e-13
L_BELL = np.array([1.27, 0.542, 0.95]) * 1e-13


class CollisionPlan:
    """Static pair table (coll_pairs, deck_collision_block)."""

    def __init__(self, cfg, deck):
        cb = deck.collisions
        self.coulomb_log = cb.coulomb_log       # <0 → auto
        self.use_nanbu = cb.use_nanbu           # False → Sentoku–Kemp
        self.pairs = []
        ns = len(cfg.species)
        for i in range(ns):
            si = cfg.species[i]
            if si.species_type == const.SpeciesType.PHOTON or si.charge == 0:
                continue
            for j in range(i, ns):
                sj = cfg.species[j]
                if sj.species_type == const.SpeciesType.PHOTON \
                        or sj.charge == 0:
                    continue
                factor = cb.collide_pairs.get(
                    f"{si.name} {sj.name}",
                    1.0 if cb.collide_all else 0.0)
                if factor > 0:
                    self.pairs.append((i, j, factor))
        # electron-impact ionisation entries (collisional_ionisation,
        # collisions.F90:229-462): one per (electron species, ionisable
        # species) pair enabled in coll_pairs
        self.collisional_ionisation = cb.collisional_ionisation
        self.ionise_entries = []
        if cb.collisional_ionisation:
            for ie, se in enumerate(cfg.species):
                if se.species_type != const.SpeciesType.ELECTRON:
                    continue
                for jj, (sbj, sj) in enumerate(zip(deck.species,
                                                   cfg.species)):
                    if not getattr(sbj, "ionise", False):
                        continue
                    factor = cb.collide_pairs.get(
                        f"{se.name} {sj.name}",
                        1.0 if cb.collide_all else 0.0)
                    if factor <= 0:
                        continue
                    to = deck.species_index(sbj.ionise_to_species_name)
                    rel = deck.species_index(sbj.release_species_name)
                    end = to
                    while getattr(deck.species[end], "ionise", False):
                        end = deck.species_index(
                            deck.species[end].ionise_to_species_name)
                    # e_user_factor = coll_pairs(electron, ionise_to)
                    # gates the in-pass ionising-vs-ejected scatter
                    # (collisions.F90:361,389-396)
                    e_factor = cb.collide_pairs.get(
                        f"{se.name} {cfg.species[to].name}",
                        1.0 if cb.collide_all else 0.0)
                    self.ionise_entries.append(dict(
                        e=ie, ion=jj, to=to, release=rel,
                        e_ion_ev=sbj.ionisation_energy / const.ev,
                        n1=sbj.principal_n, l=sbj.l_quantum,
                        n2=deck.species[to].principal_n,
                        q_full=cfg.species[end].charge,
                        e_factor=e_factor))


def _shuffle_alive_first(b, key):
    """Per-cell random permutation with live slots packed first.  Aux
    rows (optical depths) ride along.  One fused Batcher network along
    the slot axis (ops/slotsort.py) — the lax.sort form transposed the
    slot axis minor and streamed every payload through each compare
    stage (~10 HBM passes at 128^3 bench shapes)."""
    from ..ops.slotsort import sort_by_key
    nd = b.xi.shape[0]
    na = 0 if b.aux is None else b.aux.shape[0]
    u = jax.random.uniform(key, b.w.shape, b.w.dtype)
    sort_key = jnp.where(b.w > 0, u, 2.0)       # dead slots last
    payloads = [b.w] + [b.xi[i] for i in range(nd)] \
        + [b.p[i] for i in range(3)] + [b.aux[i] for i in range(na)]
    _, out = sort_by_key(sort_key, payloads)
    return b._replace(
        w=out[0],
        xi=jnp.stack(out[1:1 + nd]),
        p=jnp.stack(out[1 + nd:4 + nd]),
        aux=(jnp.stack(out[4 + nd:4 + nd + na]) if na else b.aux),
    )


def _cos_chi(s12, r1, xp=jnp):
    """Pérez et al. (2012) piecewise inversion of Nanbu's angle distribution
    (collisions.F90:1046-1070)."""
    r1c = xp.maximum(r1, 5e-9)
    # s < 0.1
    c_a = 1.0 + s12 * xp.log(r1c)
    # 0.1 <= s < 6 share the form log(exp(-A) + 2 r1 sinh(A)) with
    # A = min(1/a_inv, 80) below s=3 and A = 3 exp(-s) above: select A
    # first so the branch pair costs ONE exp + ONE log instead of two
    # exp/sinh/log sets (the collision pair core is transcendental-
    # bound on the TPU vector unit; sinh(A) = (e - 1/e)/2 reuses e)
    a_inv = 0.0056958 + (0.9560202 + (-0.508139 + (0.47913906
            + (-0.12788975 + 0.02389567 * s12) * s12) * s12) * s12) * s12
    a = 1.0 / xp.maximum(a_inv, 1e-30)
    aa = xp.where(s12 < 3.0, xp.minimum(a, 80.0), 3.0 * xp.exp(-s12))
    e = xp.exp(aa)
    ei = 1.0 / e
    val = xp.log(ei + r1 * (e - ei))
    c_bc = xp.where(s12 < 3.0, a_inv * val,
                    val / xp.maximum(aa, 1e-30))
    # s >= 6: isotropic
    c_d = 2.0 * r1 - 1.0
    cosp = xp.where(s12 < 0.1, c_a,
           xp.where(s12 < 6.0, c_bc, c_d))
    return xp.clip(cosp, -1.0, 1.0)


def _scatter_pairs(p1_si, p2_si, m1, m2, q1, q2, s_fac, s_fac_prime,
                   idens, jdens, r1, r2, valid):
    """The pairwise NP scattering core (collisions.F90:1016-1140) on arrays
    of shape (..., ) per momentum component; p*_si are (3, ...) in SI.

    All momenta/masses are normalised by the lighter mass so every
    intermediate is O(1) — in SI kg units p/c ~ 1e-31 and its square
    underflows single precision (and defeated absolute eps floors)."""
    xp = jnp
    eps = 1e-30
    m_ref = min(m1, m2)
    m1h = m1 / m_ref
    m2h = m2 / m_ref
    p1 = p1_si / (const.c * m_ref)
    p2 = p2_si / (const.c * m_ref)

    # degenerate pairs can't collide
    dif = p1 - p2
    degenerate = (xp.sum(p1 ** 2, 0) < eps) & (xp.sum(p2 ** 2, 0) < eps)
    degenerate |= xp.sum(dif ** 2, 0) < eps
    ok = valid & ~degenerate

    gm1 = xp.sqrt(xp.sum((p1 / m1h) ** 2, 0) + 1.0) * m1h
    gm2 = xp.sqrt(xp.sum((p2 / m2h) ** 2, 0) + 1.0) * m2h
    gm = gm1 + gm2
    v1 = p1 / gm1
    v2 = p2 / gm2
    vc = (p1 + p2) / gm
    vc_sq = xp.minimum(xp.sum(vc ** 2, 0), 1.0 - 1e-12)
    gc = 1.0 / xp.sqrt(1.0 - vc_sq)
    gc_m1_vc = (gc - 1.0) / xp.maximum(vc_sq, eps)

    vdv1 = xp.sum(vc * v1, 0)
    p3 = p1 + (gc_m1_vc * vdv1 - gc) * gm1 * vc
    gm3 = (1.0 - vdv1) * gc * gm1
    vdv2 = xp.sum(vc * v2, 0)
    gm4 = (1.0 - vdv2) * gc * gm2

    p_mag2 = xp.maximum(xp.sum(p3 ** 2, 0), eps)
    p_mag = xp.sqrt(p_mag2)

    fac = (q1 * q2) ** 2 * s_fac / (gm1 * gm2 * m_ref ** 2)
    s12 = fac * gc * p_mag * const.c / gm * (gm3 * gm4 / p_mag2 + 1.0) ** 2
    # cold-plasma upper limit (collisions.F90:1037-1043); the mass
    # normalisation cancels in v_rel
    v_rel = gm * p_mag * const.c / xp.maximum(gm3 * gm4 * gc, eps)
    s_prime = s_fac_prime * (m1 + m2) * v_rel / xp.maximum(
        m1 * idens ** TWO_THIRDS, m2 * jdens ** TWO_THIRDS)
    s12 = xp.minimum(s12, s_prime)

    cosp = _cos_chi(s12, r1)
    sinp = xp.sqrt(xp.maximum(1.0 - cosp ** 2, 0.0))
    phi = r2 * 2.0 * math.pi

    p_perp2 = p3[0] ** 2 + p3[1] ** 2
    p_perp = xp.sqrt(p_perp2)
    p_tot = xp.sqrt(p_perp2 + p3[2] ** 2)
    ipp = 1.0 / (p_perp + 1e-300)
    sc = sinp * xp.cos(phi)
    ss = sinp * xp.sin(phi)
    p3n = xp.stack([
        p3[0] * p3[2] * ipp * sc - p3[1] * p_tot * ipp * ss + p3[0] * cosp,
        p3[1] * p3[2] * ipp * sc + p3[0] * p_tot * ipp * ss + p3[1] * cosp,
        -p_perp * sc + p3[2] * cosp,
    ])
    p4n = -p3n
    vdp3 = xp.sum(vc * p3n, 0)
    p5 = (p3n + (gc_m1_vc * vdp3 + gm3 * gc) * vc) * const.c * m_ref
    vdp4 = xp.sum(vc * p4n, 0)
    p6 = (p4n + (gc_m1_vc * vdp4 + gm4 * gc) * vc) * const.c * m_ref

    new_p1 = xp.where(ok[None], p5, p1_si)
    new_p2 = xp.where(ok[None], p6, p2_si)
    return new_p1, new_p2


def _new_coords(v):
    """Orthonormal basis with c1 along v (new_coords,
    collisions.F90:1697-1728); v is (3, ...)."""
    xp = jnp
    vmag = xp.sqrt(xp.maximum(xp.sum(v ** 2, 0), 1e-300))
    vtrans = xp.sqrt(v[1] ** 2 + v[2] ** 2)
    ok = vtrans > 1e-150
    vt = xp.maximum(vtrans, 1e-150)
    c1 = xp.where(ok, v / vmag,
                  xp.stack([xp.ones_like(v[0]), v[1] * 0, v[2] * 0]))
    c2 = xp.where(ok, xp.stack([v[0] * 0, v[2], -v[1]]) / vt,
                  xp.stack([v[0] * 0, xp.ones_like(v[1]), v[2] * 0]))
    c3 = xp.where(ok, xp.stack([vt ** 2, -v[0] * v[1], -v[0] * v[2]])
                  / (vmag * vt),
                  xp.stack([v[0] * 0, v[1] * 0, xp.ones_like(v[2])]))
    return c1, c2, c3


def _weighted_correction(wtr, p, p_scat, en, en_scat, mh, phi, apply):
    """Sentoku & Kemp (2008) eqs. 21-26 energy-conserving correction for
    unequal weights (weighted_particles_correction,
    collisions.F90:1654-1693); normalised units (c=1, masses /m_ref)."""
    xp = jnp
    en_after = (1.0 - wtr) * en + wtr * en_scat
    p_after = (1.0 - wtr)[None] * p + wtr[None] * p_scat
    p_mag2 = xp.sum(p_after ** 2, 0)
    gamma_en = en_after / mh
    gamma_p = xp.sqrt(1.0 + p_mag2 / mh ** 2)
    fix = apply & (gamma_p < gamma_en)
    delta_p = mh * xp.sqrt(xp.maximum(gamma_en ** 2 - gamma_p ** 2, 0.0))
    c1, c2, c3 = _new_coords(p_after)
    corrected = p_after + delta_p[None] * (c2 * xp.cos(phi)[None]
                                           + c3 * xp.sin(phi)[None])
    return xp.where(fix[None], corrected, p_scat)


def _scatter_pairs_sk(p1_si, p2_si, m1, m2, q1, q2, nu_fac, dens_eff,
                      log_lambda, w1, w2, r1, r2, rphi, rcorr, valid):
    """Sentoku–Kemp pairwise scattering core
    (intra/inter_collisions_sk, collisions.F90:731-958,1166-1414):
    Gaussian cumulative angle with variance nu = min(nu_coll*factor*np*dt,
    0.02), rest-frame → COM angle transform, and the weighted-particle
    energy correction.  Momenta/masses normalised by the lighter mass,
    velocities in units of c."""
    xp = jnp
    eps = 1e-30
    m_ref = min(m1, m2)
    m1h, m2h = m1 / m_ref, m2 / m_ref
    p1 = p1_si / (const.c * m_ref)
    p2 = p2_si / (const.c * m_ref)
    degenerate = (xp.sum(p1 ** 2, 0) < eps) & (xp.sum(p2 ** 2, 0) < eps)
    degenerate |= xp.sum((p1 - p2) ** 2, 0) < eps
    ok = valid & ~degenerate

    e1 = xp.sqrt(xp.sum(p1 ** 2, 0) + m1h ** 2)
    e2 = xp.sqrt(xp.sum(p2 ** 2, 0) + m2h ** 2)
    vc = (p1 + p2) / (e1 + e2)
    vc_sq = xp.minimum(xp.sum(vc ** 2, 0), 1.0 - 1e-12)
    g = 1.0 / xp.sqrt(1.0 - vc_sq)
    g_m1 = g ** 2 * vc_sq / (g + 1.0)

    p1vc = xp.sum(p1 * vc, 0)
    p2vc = xp.sum(p2 * vc, 0)
    vs = xp.maximum(vc_sq, eps)
    p3 = p1 + vc * (p1vc * g_m1 / vs - g * e1)[None]
    p4 = p2 + vc * (p2vc * g_m1 / vs - g * e2)[None]
    p3_mag = xp.sqrt(xp.maximum(xp.sum(p3 ** 2, 0), eps))
    e3 = g * (e1 - p1vc)
    e4 = g * (e2 - p2vc)
    v3 = p3 / e3[None]
    v4 = p4 / e4[None]
    vr = (v3 - v4) / (1.0 - xp.sum(v3 * v4, 0))[None]
    vrabs = xp.sqrt(xp.maximum(xp.sum(vr ** 2, 0), eps))

    # collision frequency in SI (coll_freq :1627-1650)
    mu = (m1 * m2) / (m1 + m2)
    nu = (q1 * q2) ** 2 * dens_eff * log_lambda \
        / (4.0 * math.pi * const.epsilon0 ** 2 * mu ** 2
           * (vrabs * const.c) ** 3)
    nu = xp.minimum(nu * nu_fac, 0.02)

    r1c = (1.0 - 1e-10) * r1 + 0.5e-10
    delta = xp.sqrt(-2.0 * nu * xp.log(r1c)) * xp.sin(2.0 * math.pi * r2)
    sin_t = 2.0 * delta / (1.0 + delta ** 2)
    cos_t = (1.0 - delta ** 2) / (1.0 + delta ** 2)

    vcr = v3 if m1 > m2 else v4
    vcr_mag = xp.sqrt(xp.sum(vcr ** 2, 0))
    g_r = 1.0 / xp.sqrt(xp.maximum(1.0 - xp.sum(vcr ** 2, 0), 1e-12))
    den = g_r * (cos_t - vcr_mag / xp.maximum(vrabs, eps))
    big = 1e150
    tan_cm = xp.where(xp.abs(den) > 1e-150, sin_t / den, big)
    rt = xp.sqrt(1.0 + tan_cm ** 2)
    sin_cm = tan_cm / rt
    cos_cm = 1.0 / rt

    c1, c2, c3 = _new_coords(vr)
    phi = 2.0 * math.pi * rphi
    p3n = p3_mag[None] * (c1 * cos_cm[None]
                          + c2 * (sin_cm * xp.cos(phi))[None]
                          + c3 * (sin_cm * xp.sin(phi))[None])
    p4n = -p3n
    p5 = p3n + vc * (xp.sum(p3n * vc, 0) * g_m1 / vs + g * e3)[None]
    p6 = p4n + vc * (xp.sum(p4n * vc, 0) * g_m1 / vs + g * e4)[None]

    # weighted-particle correction (:909-924)
    e5 = xp.sqrt(xp.sum(p5 ** 2, 0) + m1h ** 2)
    e6 = xp.sqrt(xp.sum(p6 ** 2, 0) + m2h ** 2)
    wr = w1 / xp.maximum(w2, 1e-300)
    phi2 = 2.0 * math.pi * rcorr
    p5 = _weighted_correction(w2 / xp.maximum(w1, 1e-300), p1, p5, e1, e5,
                              m1h, phi2, ok & (wr > 1.0 + 2e-16))
    p6 = _weighted_correction(wr, p2, p6, e2, e6,
                              m2h, phi2, ok & (wr < 1.0 - 2e-16))

    new_p1 = xp.where(ok[None], p5 * (const.c * m_ref), p1_si)
    new_p2 = xp.where(ok[None], p6 * (const.c * m_ref), p2_si)
    return new_p1, new_p2


def _cell_density(b, cell_volume):
    return jnp.sum(b.w, axis=0) / cell_volume


def _cell_ekbar(b, mass):
    mc = mass * const.c
    p2 = jnp.sum(b.p ** 2, axis=0)
    gamma = jnp.sqrt(1.0 + p2 / mc ** 2)
    ke = (gamma - 1.0) * mass * const.c ** 2
    wsum = jnp.maximum(jnp.sum(b.w, axis=0), 1e-300)
    return jnp.sum(ke * b.w, axis=0) / wsum


def _cell_temp(b, mass):
    """Per-cell temperature from <p²> (calc_coll_temperature)."""
    wsum = jnp.maximum(jnp.sum(b.w, axis=0), 1e-300)
    pm = [jnp.sum(b.p[i] * b.w, axis=0) / wsum for i in range(3)]
    var = sum(jnp.sum((b.p[i] - pm[i][None]) ** 2 * b.w, axis=0) / wsum
              for i in range(3))
    return var / (3.0 * mass * const.kb)


def coulomb_log_auto(ekbar1, temp2, dens1, dens2, q1, q2, m1):
    """calc_coulomb_log (collisions.F90:1811-1840)."""
    xp = jnp
    ek = xp.maximum(ekbar1, 100.0 * const.q0)
    t2 = xp.maximum(temp2, 100.0)
    bmax = xp.sqrt(const.epsilon0 * const.q0 * t2
                   / (abs(q2) * const.q0 * xp.maximum(dens2, 1e-300)))
    b0 = abs(q1 * q2) / (8.0 * math.pi * const.epsilon0 * ek)
    gamm = ek / (m1 * const.c ** 2) + 1.0
    db = 2.0 * math.pi * const.h_bar / (xp.sqrt(gamm ** 2 - 1.0)
                                        * m1 * const.c)
    bmin = xp.maximum(b0, db)
    ll = xp.maximum(1.0, xp.log(bmax / xp.maximum(bmin, 1e-300)))
    return xp.where((dens1 <= 1.0) | (dens2 <= 1.0), 1.0, ll)


def _sorted_view(slab, grid, key):
    """Cell-sort a slab: random within-cell order, dead slots last
    (reorder_particles_to_grid + shuffle_particle_list_random)."""
    nd = grid.ndims
    n_cell = int(np.prod(grid.n))
    cells = 0
    stride = 1
    for d in reversed(range(nd)):
        rel = slab.x[:, d] - grid.grid_min(d)
        c = jnp.clip(jnp.floor(rel / grid.delta[d]).astype(jnp.int32),
                     0, grid.n[d] - 1)
        cells = cells + c * stride
        stride *= grid.n[d]
    u = jax.random.uniform(key, cells.shape)
    skey = jnp.where(slab.alive, cells.astype(jnp.float64 if
                     slab.x.dtype == jnp.float64 else jnp.float32)
                     + u * 0.5, float(n_cell + 1))
    perm = jnp.argsort(skey)
    c = jnp.where(slab.alive, cells, n_cell)[perm]
    N = c.shape[0]
    start = jnp.searchsorted(c, c)
    end = jnp.searchsorted(c, c, side="right")
    return dict(perm=perm, c=c, p=slab.p[perm], w=slab.weight[perm],
                x=slab.x[perm], alive=slab.alive[perm],
                rank=jnp.arange(N) - start, cnt=end - start,
                n_cell=n_cell)


def _flat_cell_stats(sv, mass, n_cell, dvol):
    """Per-cell density / ekbar / temperature from a sorted view
    (calc_coll_number_density/_temperature/_ekbar)."""
    w = jnp.where(sv["alive"], sv["w"], 0.0)
    c = sv["c"]
    wsum = jnp.zeros(n_cell + 1, w.dtype).at[c].add(w)
    mc = mass * const.c
    p2 = jnp.sum(sv["p"] ** 2, axis=1)
    gamma = jnp.sqrt(1.0 + p2 / mc ** 2)
    ke = (gamma - 1.0) * mass * const.c ** 2
    kesum = jnp.zeros(n_cell + 1, w.dtype).at[c].add(ke * w)
    wsafe = jnp.maximum(wsum, 1e-300)
    pm = [jnp.zeros(n_cell + 1, w.dtype).at[c].add(sv["p"][:, i] * w)
          / wsafe for i in range(3)]
    var = sum(jnp.zeros(n_cell + 1, w.dtype).at[c].add(
        (sv["p"][:, i] - pm[i][c]) ** 2 * w) / wsafe for i in range(3))
    return dict(dens=wsum / dvol, ekbar=kesum / wsafe,
                temp=var / (3.0 * mass * const.kb))


def _collide_pair_scatter(species, cfg, plan, i, j, user_factor, key):
    """Scatter-engine collisions for one species pair: cell-sorted
    pairing (adjacent for intra, rank-matched unique pairs for inter,
    truncated to the smaller per-cell count), then the NP core."""
    grid = cfg.grid
    dvol = grid.cell_volume
    dt = cfg.dt
    m1, q1 = cfg.species[i].mass, cfg.species[i].charge
    key, k1, k2, k3, k4 = jax.random.split(key, 5)
    svi = _sorted_view(species[i], grid, k1)
    n_cell = svi["n_cell"]
    stats_i = _flat_cell_stats(svi, m1, n_cell, dvol)

    if i == j:
        p = svi["p"]
        p_b = jnp.roll(p, -1, 0)
        w_b = jnp.roll(svi["w"], -1, 0)
        alive_b = jnp.roll(svi["alive"], -1, 0)
        c_b = jnp.roll(svi["c"], -1, 0)
        valid = svi["alive"] & alive_b & (svi["c"] == c_b) \
            & (svi["rank"] % 2 == 0)
        c = svi["c"]
        fsum = jnp.zeros(n_cell + 1, p.dtype).at[c].add(
            jnp.where(valid, jnp.minimum(svi["w"], w_b), 0.0))
        # intra-species: extra factor 2 (Nanbu sec. 4.1; :1002)
        factor = user_factor / (2.0 * jnp.maximum(fsum, 1e-300))
        idens = stats_i["dens"]
        if plan.coulomb_log < 0:
            ll = coulomb_log_auto(stats_i["ekbar"], stats_i["temp"],
                                  idens, idens, q1, q1, m1)
        else:
            ll = plan.coulomb_log
        r1 = jax.random.uniform(k2, c.shape, p.dtype)
        r2 = jax.random.uniform(k3, c.shape, p.dtype)
        if plan.use_nanbu:
            cell_fac = idens * idens * dt * factor * dvol
            s_fac = (cell_fac * ll / PI4_EPS2_C4)[c]
            s_fac_p = (cell_fac * PI_FAC)[c]
            di = idens[c]
            np1, np2 = _scatter_pairs(p.T, p_b.T, m1, m1, q1, q1,
                                      s_fac, s_fac_p, di, di, r1, r2,
                                      valid)
        else:
            # SK intra: np = Σ(w_a+w_b), factor = user/Σmin/2 (:760-783)
            np_cell = jnp.zeros(n_cell + 1, p.dtype).at[c].add(
                jnp.where(valid, svi["w"] + w_b, 0.0))
            nu_fac = (user_factor / (2.0 * jnp.maximum(fsum, 1e-300))
                      * np_cell * dt)[c]
            ll_at = ll[c] if hasattr(ll, "shape") and ll.ndim else ll
            key, kp, kc = jax.random.split(key, 3)
            rphi = jax.random.uniform(kp, c.shape, p.dtype)
            rcorr = jax.random.uniform(kc, c.shape, p.dtype)
            np1, np2 = _scatter_pairs_sk(
                p.T, p_b.T, m1, m1, q1, q1, nu_fac, idens[c], ll_at,
                svi["w"], w_b, r1, r2, rphi, rcorr, valid)
        p_new = jnp.where(valid[:, None], np1.T, p)
        back = jnp.roll(np2.T, 1, 0)
        p_new = jnp.where(jnp.roll(valid, 1)[:, None], back, p_new)
        slab = species[i]
        species[i] = slab._replace(p=slab.p.at[svi["perm"]].set(p_new))
        return species, key

    m2, q2 = cfg.species[j].mass, cfg.species[j].charge
    svj = _sorted_view(species[j], grid, k4)
    stats_j = _flat_cell_stats(svj, m2, n_cell, dvol)
    cell_ids = jnp.arange(n_cell + 1)
    starts_j = jnp.searchsorted(svj["c"], cell_ids)
    cnts_j = jnp.searchsorted(svj["c"], cell_ids, side="right") - starts_j
    c = svi["c"]
    cntj = cnts_j[c]
    pairable = svi["alive"] & (svi["rank"] < jnp.minimum(svi["cnt"], cntj))
    N_j = svj["c"].shape[0]
    partner = jnp.where(pairable, starts_j[c] + svi["rank"], N_j)
    pj = svj["p"][jnp.clip(partner, 0, N_j - 1)]
    wj = svj["w"][jnp.clip(partner, 0, N_j - 1)]
    fsum = jnp.zeros(n_cell + 1, pj.dtype).at[c].add(
        jnp.where(pairable, jnp.minimum(svi["w"], wj), 0.0))
    factor = user_factor / jnp.maximum(fsum, 1e-300)
    idens, jdens = stats_i["dens"], stats_j["dens"]
    if plan.coulomb_log < 0:
        ll = coulomb_log_auto(stats_i["ekbar"], stats_j["temp"],
                              idens, jdens, q1, q2, m1)
    else:
        ll = plan.coulomb_log
    r1 = jax.random.uniform(k2, c.shape, pj.dtype)
    r2 = jax.random.uniform(k3, c.shape, pj.dtype)
    if plan.use_nanbu:
        cell_fac = idens * jdens * dt * factor * dvol
        s_fac = (cell_fac * ll / PI4_EPS2_C4)[c]
        s_fac_p = (cell_fac * PI_FAC)[c]
        np1, np2 = _scatter_pairs(svi["p"].T, pj.T, m1, m2, q1, q2,
                                  s_fac, s_fac_p, idens[c], jdens[c],
                                  r1, r2, pairable)
    else:
        # SK inter: np = Σw of the longer list, dens = min(idens, jdens)
        # (inter_collisions_sk :1205-1308)
        wi_cell = jnp.zeros(n_cell + 1, pj.dtype).at[c].add(
            jnp.where(svi["alive"], svi["w"], 0.0))
        wj_cell = jnp.zeros(n_cell + 1, pj.dtype).at[svj["c"]].add(
            jnp.where(svj["alive"], svj["w"], 0.0))
        cnts_i = jnp.zeros(n_cell + 1, jnp.int32).at[c].add(
            svi["alive"].astype(jnp.int32))
        np_cell = jnp.where(cnts_i >= cnts_j, wi_cell, wj_cell)
        nu_fac = (factor * np_cell * dt)[c]
        ll_at = ll[c] if hasattr(ll, "shape") and ll.ndim else ll
        dmin = jnp.minimum(idens, jdens)[c]
        key, kp, kc = jax.random.split(key, 3)
        rphi = jax.random.uniform(kp, c.shape, pj.dtype)
        rcorr = jax.random.uniform(kc, c.shape, pj.dtype)
        np1, np2 = _scatter_pairs_sk(
            svi["p"].T, pj.T, m1, m2, q1, q2, nu_fac, dmin, ll_at,
            svi["w"], wj, r1, r2, rphi, rcorr, pairable)
    pi_new = jnp.where(pairable[:, None], np1.T, svi["p"])
    slab_i = species[i]
    species[i] = slab_i._replace(p=slab_i.p.at[svi["perm"]].set(pi_new))
    # unique partner indices: scatter with out-of-range rows dropped
    pj_sorted = svj["p"].at[partner].set(
        jnp.where(pairable[:, None], np2.T, pj), mode="drop")
    slab_j = species[j]
    species[j] = slab_j._replace(p=slab_j.p.at[svj["perm"]].set(pj_sorted))
    return species, key


def _eiics_cm2(e_ke_i, entry, q_ion):
    """Electron-impact ionisation cross section in cm²: MBELL for
    (n<4, l<3), MRBEB otherwise (collisions.F90:577-623)."""
    xp = jnp
    i_ev = entry["e_ion_ev"]
    n1, l, n2 = entry["n1"], entry["l"], entry["n2"]
    red_ion = E_REST_EV / i_ev
    red_inc = xp.maximum(e_ke_i / i_ev, 1.0 + 1e-12)
    if n1 < 4 and l < 3:
        gr = (1.0 + 2.0 * red_ion) / (red_inc + 2.0 * red_ion) \
            * ((red_inc + red_ion) / (1.0 + red_ion)) ** 2 \
            * ((1.0 + red_inc) * (red_inc + 2.0 * red_ion)
               * (1.0 + red_ion) ** 2
               / (red_ion ** 2 * (1.0 + 2.0 * red_ion)
                  + red_inc * (red_inc + 2.0 * red_ion)
                  * (1.0 + red_ion) ** 2)) ** 1.5
        fion = 1.0 + 3.0 * xp.abs(
            q_ion / (entry["q_full"] * red_inc)) ** L_BELL[l]
        one_m = 1.0 - 1.0 / red_inc
        acc = 0.0
        for i in range(7):
            acc = acc + B_BELL[n1 - 1, l, i] * one_m ** (i + 1)
        eiics = (A_BELL[n1 - 1, l] * xp.log(red_inc) + acc) \
            / (e_ke_i * i_ev)
        return fion * gr * eiics
    t = red_inc
    tp = e_ke_i / E_REST_EV
    bp = 1.0 / red_ion
    bt2 = 1.0 - 1.0 / (1.0 + tp) ** 2
    bb2 = 1.0 - 1.0 / (1.0 + bp) ** 2
    mrbeb_c = const.hartree / i_ev / 2.0 \
        * (0.3 * (q_ion / const.q0 / n1) ** 2
           + 0.7 * ((q_ion / const.q0 + 1.0) / n2) ** 2)
    return MRBEB_CONST / (bt2 + mrbeb_c * bb2) / bp \
        * (0.5 * (xp.log(bt2 / (1.0 - bt2)) - bt2 - math.log(2.0 * bp))
           * (1.0 - 1.0 / t ** 2)
           + 1.0 - 1.0 / t
           - xp.log(t) / (t + 1.0) * (1.0 + 2.0 * tp)
           / (1.0 + 0.5 * tp) ** 2
           + bp ** 2 / (1.0 + 0.5 * tp) ** 2 * (t - 1.0) / 2.0)


def _flat_density(slab, grid, n_cell, dvol):
    nd = grid.ndims
    cells = 0
    stride = 1
    for d in reversed(range(nd)):
        rel = slab.x[:, d] - grid.grid_min(d)
        c = jnp.clip(jnp.floor(rel / grid.delta[d]).astype(jnp.int32),
                     0, grid.n[d] - 1)
        cells = cells + c * stride
        stride *= grid.n[d]
    w = jnp.where(slab.alive, slab.weight, 0.0)
    return jnp.zeros(n_cell + 1, w.dtype).at[cells].add(w) / dvol


def _collisional_ionise_pair(species, cfg, entry, key):
    """Electron-impact ionisation for one (electron, ion) species pair
    (preionise, collisions.F90:467-711), vectorised over cell-sorted
    rank-matched pairs.

    The ionising-vs-ejected electron Coulomb scatter runs in-pass,
    exactly as the reference (inter_coll_fn on (ejected_e, ionising_e),
    collisions.F90:389-396).  One noted divergence remains: the incident
    electron's energy loss uses the reference's own lab-frame fallback
    formula for every event (exact for slow ions; the reference's
    ion-frame rotation path reduces to it)."""
    grid = cfg.grid
    dvol = grid.cell_volume
    dt = cfg.dt
    ie, jj = entry["e"], entry["ion"]
    m_e = cfg.species[ie].mass
    m_ion = cfg.species[jj].mass
    q_ion = cfg.species[jj].charge
    i_ev = entry["e_ion_ev"]
    key, k1, k2, k3 = jax.random.split(key, 4)
    sve = _sorted_view(species[ie], grid, k1)
    svj = _sorted_view(species[jj], grid, k2)
    n_cell = sve["n_cell"]

    cell_ids = jnp.arange(n_cell + 1)
    starts_j = jnp.searchsorted(svj["c"], cell_ids)
    cnts_j = jnp.searchsorted(svj["c"], cell_ids, side="right") - starts_j
    c = sve["c"]
    pairable = sve["alive"] & (sve["rank"]
                               < jnp.minimum(sve["cnt"], cnts_j[c]))
    N_j = svj["c"].shape[0]
    partner = jnp.where(pairable, starts_j[c] + sve["rank"], N_j)
    psafe = jnp.clip(partner, 0, N_j - 1)
    p_i = svj["p"][psafe]
    w_i = svj["w"][psafe]
    x_i = svj["x"][psafe]

    # release-species (electron fluid) density for the rate
    e_dens = _flat_density(species[entry["release"]], grid, n_cell, dvol)
    np_cell = jnp.zeros(n_cell + 1, p_i.dtype).at[c].add(
        jnp.where(pairable, sve["w"], 0.0))
    fsum = jnp.zeros(n_cell + 1, p_i.dtype).at[c].add(
        jnp.where(pairable, jnp.minimum(sve["w"], w_i), 0.0))
    # prob_factor = -e_dens*np/factor*dt*1e-4 (cm²→m², preionise :524)
    prob_factor = -e_dens * np_cell / jnp.maximum(fsum, 1e-300) * dt * 1e-4

    # electron kinetic energy & speed in the ion frame (preionise :527-570)
    p_e = sve["p"]
    mec = m_e * const.c
    e_e = const.c * jnp.sqrt(jnp.sum(p_e ** 2, 1) + mec ** 2)  # total E·...
    gam_i = jnp.sqrt(jnp.sum((p_i / (m_ion * const.c)) ** 2, 1) + 1.0)
    v_i = p_i / (m_ion * gam_i[:, None])
    e_prime = gam_i * (e_e - jnp.sum(v_i * p_e, 1))        # ion-frame E
    e_ke_i = (e_prime - m_e * const.c ** 2) / const.ev     # eV
    e_ke_i = jnp.maximum(e_ke_i, 1e-30)
    e_p2_i = jnp.maximum((e_prime ** 2 - (m_e * const.c ** 2) ** 2)
                         / const.c ** 2, 1e-300)
    e_v_i = jnp.sqrt(e_p2_i) * const.c ** 2 / e_prime

    thresh = e_ke_i >= w_i / jnp.maximum(sve["w"], 1e-300) * i_ev
    eiics = _eiics_cm2(e_ke_i, entry, q_ion)
    u = jax.random.uniform(k3, c.shape, p_i.dtype)
    prob = 1.0 - jnp.exp(prob_factor[c] * jnp.maximum(eiics, 0.0) * e_v_i)
    fire = pairable & thresh & (u < prob)

    # incident electron loses (w_i/w_e)·I of kinetic energy along its
    # direction (the reference's lab-scaling branch, preionise :647-656)
    e_new = (e_ke_i - w_i / jnp.maximum(sve["w"], 1e-300) * i_ev
             + E_REST_EV) * const.ev
    scale = jnp.sqrt(jnp.maximum((e_new / const.c) ** 2 - mec ** 2, 0.0)
                     / e_p2_i)
    p_e_new = jnp.where(fire[:, None], p_e * scale[:, None], p_e)

    # ejected electron carries the mass-fraction share of the ion momentum
    # (preionise :687-692); the ion promotes to ionise_to_species
    p_ej = (m_e / m_ion) * p_i
    p_ion_new = p_i - p_ej

    # in-pass Coulomb scatter of the (ejected, ionising) electron pairs
    # (inter_coll_fn on (ejected_e, ionising_e), collisions.F90:389-396),
    # gated by e_user_factor = coll_pairs(electron, ionise_to)
    if entry.get("e_factor", 0.0) > 0.0:
        plan_cl = getattr(cfg.collision_plan, "coulomb_log", -1.0) \
            if cfg.collision_plan is not None else -1.0
        key, kr1, kr2, kr3 = jax.random.split(key, 4)
        q_el = cfg.species[ie].charge
        imp_stats = _flat_cell_stats(sve, m_e, n_cell, dvol)
        rel_sv = _sorted_view(species[entry["release"]], grid, kr3)
        rel_stats = _flat_cell_stats(rel_sv, m_e, n_cell, dvol)
        fsum_f = jnp.zeros(n_cell + 1, p_e.dtype).at[c].add(
            jnp.where(fire, jnp.minimum(w_i, sve["w"]), 0.0))
        factor_e = entry["e_factor"] / jnp.maximum(fsum_f, 1e-300)
        if plan_cl < 0:
            ll_e = coulomb_log_auto(
                imp_stats["ekbar"], rel_stats["temp"], imp_stats["dens"],
                rel_stats["dens"], q_el, q_el, m_e)
        else:
            ll_e = plan_cl
        cell_fac = rel_stats["dens"] * imp_stats["dens"] * dt \
            * factor_e * dvol
        s_fac = (cell_fac * ll_e / PI4_EPS2_C4)[c]
        s_fac_p = (cell_fac * PI_FAC)[c]
        r1s = jax.random.uniform(kr1, c.shape, p_e.dtype)
        r2s = jax.random.uniform(kr2, c.shape, p_e.dtype)
        np_ej, np_ion = _scatter_pairs(
            p_ej.T, p_e_new.T, m_e, m_e, q_el, q_el, s_fac, s_fac_p,
            rel_stats["dens"][c], imp_stats["dens"][c], r1s, r2s, fire)
        p_ej = jnp.where(fire[:, None], np_ej.T, p_ej)
        p_e_new = jnp.where(fire[:, None], np_ion.T, p_e_new)

    slab_e = species[ie]
    species[ie] = slab_e._replace(p=slab_e.p.at[sve["perm"]].set(p_e_new))
    from ..core.slab_ops import append_particles
    species[entry["release"]], d1 = append_particles(
        species[entry["release"]], x_i, p_ej, w_i, fire, with_count=True)
    species[entry["to"]], d2 = append_particles(
        species[entry["to"]], x_i, p_ion_new, w_i, fire, with_count=True)
    drops = d1 + d2
    # kill the ionised ions in their original slab
    fired_sorted = jnp.zeros(N_j + 1, bool).at[partner].max(fire)[:N_j]
    alive_sorted = svj["alive"] & ~fired_sorted
    slab_j = species[jj]
    alive_new = slab_j.alive.at[svj["perm"]].set(alive_sorted)
    species[jj] = slab_j._replace(
        alive=alive_new, weight=jnp.where(alive_new, slab_j.weight, 0.0))
    return species, key, drops


def _collisional_ionise_binned(species, cfg, entry, key, bplan):
    """Electron-impact ionisation on the binned engine (preionise,
    collisions.F90:467-711): rank-k electron slot pairs with rank-k ion
    slot after the alive-first shuffle (the slot grid's analogue of the
    reference's shuffled secondary lists); creations are cell-local
    candidate merges; the ionising-vs-ejected electron scatter runs
    in-pass (collisions.F90:389-396).  Keeps the scatter path's one
    documented divergence (lab-frame energy-loss formula)."""
    from ..core import binned as binmod
    grid = cfg.grid
    dvol = grid.cell_volume
    dt = cfg.dt
    ie, jj = entry["e"], entry["ion"]
    m_e = cfg.species[ie].mass
    m_ion = cfg.species[jj].mass
    q_ion = cfg.species[jj].charge
    i_ev = entry["e_ion_ev"]
    key, k1, k2, k3 = jax.random.split(key, 4)
    be = _shuffle_alive_first(species[ie], k1)
    bj = _shuffle_alive_first(species[jj], k2)
    Kp = min(be.K, bj.K)
    p_e = be.p[:, :Kp]                       # (3, Kp, *g)
    w_e = be.w[:Kp]
    p_i = bj.p[:, :Kp]
    w_i = bj.w[:Kp]
    pairable = (w_e > 0) & (w_i > 0)

    e_dens = jnp.sum(species[entry["release"]].w, axis=0) / dvol   # (*g)
    np_cell = jnp.sum(jnp.where(pairable, w_e, 0.0), axis=0)
    fsum = jnp.sum(jnp.where(pairable, jnp.minimum(w_e, w_i), 0.0), axis=0)
    prob_factor = -e_dens * np_cell / jnp.maximum(fsum, 1e-300) * dt * 1e-4

    mec = m_e * const.c
    e_e = const.c * jnp.sqrt(p_e[0] ** 2 + p_e[1] ** 2 + p_e[2] ** 2
                             + mec ** 2)
    gam_i = jnp.sqrt((p_i[0] ** 2 + p_i[1] ** 2 + p_i[2] ** 2)
                     / (m_ion * const.c) ** 2 + 1.0)
    v_i = p_i / (m_ion * gam_i[None])
    vdotp = v_i[0] * p_e[0] + v_i[1] * p_e[1] + v_i[2] * p_e[2]
    e_prime = gam_i * (e_e - vdotp)
    e_ke_i = jnp.maximum((e_prime - m_e * const.c ** 2) / const.ev, 1e-30)
    e_p2_i = jnp.maximum((e_prime ** 2 - (m_e * const.c ** 2) ** 2)
                         / const.c ** 2, 1e-300)
    e_v_i = jnp.sqrt(e_p2_i) * const.c ** 2 / e_prime

    thresh = e_ke_i >= w_i / jnp.maximum(w_e, 1e-300) * i_ev
    eiics = _eiics_cm2(e_ke_i, entry, q_ion)
    u = jax.random.uniform(k3, w_e.shape, w_e.dtype)
    prob = 1.0 - jnp.exp(prob_factor[None] * jnp.maximum(eiics, 0.0)
                         * e_v_i)
    fire = pairable & thresh & (u < prob)

    e_new = (e_ke_i - w_i / jnp.maximum(w_e, 1e-300) * i_ev
             + E_REST_EV) * const.ev
    scale = jnp.sqrt(jnp.maximum((e_new / const.c) ** 2 - mec ** 2, 0.0)
                     / e_p2_i)
    p_e_new = jnp.where(fire[None], p_e * scale[None], p_e)

    p_ej = (m_e / m_ion) * p_i
    p_ion_new = p_i - p_ej

    # in-pass Coulomb scatter of the (ejected, ionising) electron pairs
    # (collisions.F90:389-396); densities/temps from the exact per-cell
    # slot-grid moments
    if entry.get("e_factor", 0.0) > 0.0:
        plan_cl = getattr(cfg.collision_plan, "coulomb_log", -1.0) \
            if cfg.collision_plan is not None else -1.0
        key, kr1, kr2 = jax.random.split(key, 3)
        q_el = cfg.species[ie].charge
        rel_b = species[entry["release"]]
        rel_dens = _cell_density(rel_b, dvol)
        imp_dens = _cell_density(be, dvol)
        fsum_f = jnp.sum(jnp.where(fire, jnp.minimum(w_i, w_e), 0.0),
                         axis=0)
        factor_e = entry["e_factor"] / jnp.maximum(fsum_f, 1e-300)
        if plan_cl < 0:
            ll_e = coulomb_log_auto(
                _cell_ekbar(be, m_e), _cell_temp(rel_b, m_e),
                imp_dens, rel_dens, q_el, q_el, m_e)
        else:
            ll_e = plan_cl
        cell_fac = rel_dens * imp_dens * dt * factor_e * dvol
        s_fac = (cell_fac * ll_e / PI4_EPS2_C4)[None]
        s_fac_p = (cell_fac * PI_FAC)[None]
        r1s = jax.random.uniform(kr1, w_e.shape, w_e.dtype)
        r2s = jax.random.uniform(kr2, w_e.shape, w_e.dtype)
        np_ej, np_ion = _scatter_pairs(
            p_ej, p_e_new, m_e, m_e, q_el, q_el, s_fac, s_fac_p,
            rel_dens[None], imp_dens[None], r1s, r2s, fire)
        p_ej = jnp.where(fire[None], np_ej, p_ej)
        p_e_new = jnp.where(fire[None], np_ion, p_e_new)

    species[ie] = be._replace(p=be.p.at[:, :Kp].set(p_e_new))
    cand_w = jnp.where(fire, w_i, 0.0)
    species[entry["release"]] = binmod.merge_candidates(
        species[entry["release"]], bj.xi[:, :Kp], p_ej, cand_w, bplan)
    species[entry["to"]] = binmod.merge_candidates(
        species[entry["to"]], bj.xi[:, :Kp], p_ion_new, cand_w, bplan)
    species[jj] = bj._replace(
        w=bj.w.at[:Kp].set(jnp.where(fire, 0.0, w_i)))
    return species, key


def particle_collisions(state, cfg, plan: CollisionPlan, key):
    """One collision pass over all enabled pairs (both engines)."""
    from ..core.binned import BinnedSpecies
    if not hasattr(state.species[0], "xi"):
        species = list(state.species)
        for (i, j, user_factor) in plan.pairs:
            species, key = _collide_pair_scatter(species, cfg, plan, i, j,
                                                 user_factor, key)
        from ..core.slab_ops import add_dropped
        drops = jnp.zeros((), jnp.int32)
        for entry in plan.ionise_entries:
            species, key, d_ = _collisional_ionise_pair(species, cfg, entry,
                                                        key)
            drops = drops + d_
        return add_dropped(state._replace(species=tuple(species)),
                           drops), key
    grid = cfg.grid
    dvol = grid.cell_volume
    dt = cfg.dt
    species = list(state.species)

    # one shuffle per PRIMARY species per pass (collisions.F90:171: the
    # ispecies secondary lists are shuffled once before the jspecies
    # loop; partner lists pair in their existing order) — the primary's
    # random order already randomises every matching it participates in
    shuffled = set()
    for (i, j, user_factor) in plan.pairs:
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        if i not in shuffled:
            species[i] = _shuffle_alive_first(species[i], k1)
            shuffled.add(i)
        bi = species[i]
        m1 = cfg.species[i].mass
        q1 = cfg.species[i].charge
        idens = _cell_density(bi, dvol)
        if i == j:
            # intra-species: adjacent slot pairs (collisions.F90:731-958)
            K = bi.K
            Kh = K // 2
            p_a = bi.p[:, 0:2 * Kh:2]
            p_b = bi.p[:, 1:2 * Kh:2]
            w_a = bi.w[0:2 * Kh:2]
            w_b = bi.w[1:2 * Kh:2]
            valid = (w_a > 0) & (w_b > 0)
            fsum = jnp.maximum(jnp.sum(jnp.minimum(w_a, w_b), axis=0), 1e-300)
            # intra-species: extra factor 2 (Nanbu sec. 4.1; :1002)
            factor = user_factor / (2.0 * fsum)
            if plan.coulomb_log < 0:
                ek = _cell_ekbar(bi, m1)
                tj = _cell_temp(bi, m1)
                ll = coulomb_log_auto(ek, tj, idens, idens, q1, q1, m1)
            else:
                ll = plan.coulomb_log
            cell_fac = idens * idens * dt * factor * dvol
            s_fac = cell_fac * ll / PI4_EPS2_C4
            s_fac_p = cell_fac * PI_FAC
            r1 = jax.random.uniform(k2, w_a.shape, bi.w.dtype)
            r2 = jax.random.uniform(k3, w_a.shape, bi.w.dtype)
            np1, np2 = _scatter_pairs(
                p_a, p_b, m1, m1, q1, q1, s_fac[None], s_fac_p[None],
                idens[None], idens[None], r1, r2, valid)
            newp = bi.p
            newp = newp.at[:, 0:2 * Kh:2].set(np1)
            newp = newp.at[:, 1:2 * Kh:2].set(np2)
            species[i] = bi._replace(p=newp)
        else:
            # partner species pairs in its existing (live-first) order:
            # the primary's shuffle already randomises the matching
            # (collisions.F90:218-221 passes the j lists unshuffled)
            bj = species[j]
            m2 = cfg.species[j].mass
            q2 = cfg.species[j].charge
            jdens = _cell_density(bj, dvol)
            Kp = min(bi.K, bj.K)
            p_a = bi.p[:, :Kp]
            p_b = bj.p[:, :Kp]
            w_a = bi.w[:Kp]
            w_b = bj.w[:Kp]
            valid = (w_a > 0) & (w_b > 0)
            fsum = jnp.maximum(jnp.sum(jnp.minimum(w_a, w_b), axis=0), 1e-300)
            factor = user_factor / fsum
            if plan.coulomb_log < 0:
                ek = _cell_ekbar(bi, m1)
                tj = _cell_temp(bj, m2)
                ll = coulomb_log_auto(ek, tj, idens, jdens, q1, q2, m1)
            else:
                ll = plan.coulomb_log
            cell_fac = idens * jdens * dt * factor * dvol
            s_fac = cell_fac * ll / PI4_EPS2_C4
            s_fac_p = cell_fac * PI_FAC
            r1 = jax.random.uniform(k2, w_a.shape, bi.w.dtype)
            r2 = jax.random.uniform(k3, w_a.shape, bi.w.dtype)
            np1, np2 = _scatter_pairs(
                p_a, p_b, m1, m2, q1, q2, s_fac[None], s_fac_p[None],
                idens[None], jdens[None], r1, r2, valid)
            species[i] = bi._replace(p=bi.p.at[:, :Kp].set(np1))
            species[j] = bj._replace(p=bj.p.at[:, :Kp].set(np2))
    if plan.ionise_entries:
        from ..core.binned import BinnedPlan
        bplan = BinnedPlan(cfg)
        for entry in plan.ionise_entries:
            species, key = _collisional_ionise_binned(species, cfg, entry,
                                                      key, bplan)
    return state._replace(species=tuple(species)), key
