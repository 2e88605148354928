"""Fixed-capacity slab operations (append/compact) used by injectors,
moving-window refill, ionisation and QED emission.

Replaces the reference's dynamic linked-list appends (partlist.F90:114-409)
with masked writes into dead slots under jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .state import ParticleSlab


def append_particles(slab: ParticleSlab, x_new, p_new, w_new, valid,
                     with_count: bool = False):
    """Write up to len(valid) new particles into dead slots.

    ``valid`` masks which candidates are real; candidates beyond the free
    capacity are dropped (fixed-capacity policy; capacity headroom is the
    caller's responsibility).  With ``with_count`` returns
    ``(slab, n_dropped)`` so callers can accumulate the overflow counter
    (state.slab_dropped) — a silently shrinking particle population is a
    correctness hazard the reference can't have (dynamic lists).
    """
    cap = slab.alive.shape[0]
    n_valid_in = jnp.sum(valid)
    # pack valid candidates first so the k-th valid candidate pairs with
    # the k-th dead slot (otherwise a candidate whose index exceeds the
    # dead-slot count maps onto a live slot and is dropped spuriously)
    corder = jnp.argsort(~valid)
    if valid.shape[0] > cap:
        corder = corder[:cap]
    x_new = x_new[corder]
    p_new = p_new[corder]
    w_new = w_new[corder]
    valid = valid[corder]
    m = valid.shape[0]
    order = jnp.argsort(slab.alive)          # dead slots first
    target = order[:m]
    ok = valid & ~slab.alive[target]
    x_upd = jnp.where(ok[:, None], x_new, slab.x[target])
    p_upd = jnp.where(ok[:, None], p_new, slab.p[target])
    w_upd = jnp.where(ok, w_new, slab.weight[target])
    a_upd = slab.alive[target] | ok
    out = slab._replace(
        x=slab.x.at[target].set(x_upd),
        p=slab.p.at[target].set(p_upd),
        weight=slab.weight.at[target].set(w_upd),
        alive=slab.alive.at[target].set(a_upd),
    )
    if with_count:
        n_dropped = (n_valid_in - jnp.sum(ok)).astype(jnp.int32)
        return out, n_dropped
    return out


def add_dropped(state, n):
    """Accumulate an append-overflow count into state.slab_dropped
    (no-op for bare test states that never initialised the counter)."""
    if state.slab_dropped is None:
        return state
    return state._replace(slab_dropped=state.slab_dropped + n)


def sample_maxwellian_p(key, mass, temp, drift, shape):
    """p ~ N(drift, sqrt(kb T m)) (particle_temperature.F90:380-390)."""
    from .. import constants as const
    std = jnp.sqrt(jnp.maximum(temp, 0.0) * const.kb * mass)
    return jax.random.normal(key, shape) * std + drift


def sample_flux_maxwellian_p(key, mass, temp, drift, direction, shape):
    """Inward flux-weighted momentum (flux_momentum_from_temperature,
    particle_temperature.F90:401-452).

    Zero-drift case is the exact Rayleigh inversion; with drift we use a
    4-round rejection against the flux-weighted Gaussian, falling back to
    the drift-shifted Rayleigh (adequate for |drift| ≲ p_therm; the
    reference iterates an unbounded rejection loop).
    """
    from .. import constants as const
    sigma = jnp.sqrt(jnp.maximum(temp, 0.0) * const.kb * mass)
    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, shape, minval=1e-12, maxval=1.0)
    rayleigh = sigma * jnp.sqrt(-2.0 * jnp.log(u))
    base = direction * rayleigh + drift
    # keep only inward-moving momenta; reflect the tail inward
    inward = base * direction > 0
    out = jnp.where(inward, base, direction * jnp.abs(base - drift))
    return out
