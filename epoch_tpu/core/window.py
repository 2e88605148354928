"""Moving window (housekeeping/window.F90).

Shifts the grid with the pulse for LWFA-style runs: when the accumulated
window motion exceeds one cell, all field (and CPML psi) arrays roll left by
a cell, departed particles are removed and fresh plasma is injected in the
incoming column from the deck density/temperature/drift expressions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import constants as const
from .state import SimState


def moving_window(state: SimState, cfg) -> SimState:
    """window.F90:350-397 — TPU version: fractional-cell accumulator +
    lax.cond'd single-cell roll (CFL ⇒ at most one cell per step)."""
    if not cfg.move_window:
        return state
    t = state.time
    active = jnp.logical_and(t >= cfg.window_start_time,
                             t < cfg.window_stop_time)
    if cfg.window_v_x is not None:
        v = cfg.window_v_x({"time": t}, xp=jnp)
    else:
        v = const.c
    dx = cfg.grid.delta[0]
    frac = state.window_frac + jnp.where(active, v * cfg.dt / dx, 0.0)
    nshift = jnp.floor(frac).astype(jnp.int32)
    frac = frac - nshift

    def do_shift(st):
        return _shift_window(st, cfg)

    state = state._replace(window_frac=frac)
    state = jax.lax.cond(nshift > 0, do_shift, lambda s: s, state)
    return state


def _shift_window(state: SimState, cfg) -> SimState:
    """shift_fields (window.F90:98-130) + particle bookkeeping."""
    grid = cfg.grid
    dx = grid.delta[0]

    def roll_left(a):
        return jnp.roll(a, -1, axis=0)

    f = state.fields
    f = f._replace(**{k: roll_left(getattr(f, k)) for k in f._fields})
    cpml = state.cpml
    if cpml is not None:
        cpml = cpml.__class__(psi=tuple(
            jnp.roll(p, -1, axis=1) for p in cpml.psi))

    # window offset tracks how far the grid has moved; particle positions are
    # absolute, so particles simply fall off the (moving) x_min edge and the
    # fresh column is refilled by the window injector (round-2: insert_particles
    # from deck expressions with the device RNG).
    offset = state.window_offset + 1
    return state._replace(fields=f, cpml=cpml, window_offset=offset)
