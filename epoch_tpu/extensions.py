"""User extension hooks (SURVEY L9 — the reference's user_interaction/
layer: ``custom_parser.f90:28,38`` register_objects/custom_function,
``custom_deck.f90`` custom_blocks_handle_element/check,
``custom_laser.f90`` custom_laser_time_profile, and
``ic_module.f90:29`` manual_load).

The reference's extension model is "edit these stub subroutines and
recompile"; the TPU-native analogue is a Python plugin file.  Place an
``epoch_extensions.py`` next to ``input.deck`` (or call the register_*
functions before constructing a ``Simulation``) and the runner imports
it before the deck parses:

    # epoch_extensions.py
    from epoch_tpu import extensions as ext

    ext.register_expr_function("my_env", lambda t: t / (t + 1.0))
    ext.register_expr_constant("n_crit0", 1.74e27)

    @ext.register_manual_load
    def tweak(sim):
        ...mutate/replace sim.state species...

All hooked callables run under ``jit`` tracing — use ``jax.numpy``
semantics (no Python control flow on traced values).
"""
from __future__ import annotations

import importlib.util
import logging
import os

_log = logging.getLogger("epoch_tpu")

# name -> (fn, nargs); fn is called with the evaluated argument values
# (scalars or broadcastable arrays) and must return one value.
EXPR_FUNCTIONS: dict[str, tuple] = {}
# name -> float (custom_parser.f90 custom_constant analogue)
EXPR_CONSTANTS: dict[str, float] = {}
# block_name -> handler(element, value, parser) -> bool (handled?)
# (custom_deck.f90 custom_blocks_handle_element analogue)
DECK_BLOCKS: dict[str, object] = {}
# post-parse validators: fn(cfg) raising on missing essentials
# (custom_deck.f90 custom_blocks_check analogue)
DECK_CHECKS: list = []
# fn(sim) -> None or new state, called once after auto-load
# (ic_module.f90 manual_load analogue)
MANUAL_LOAD: list = []
# fn(laser, ctx, xp) -> scalar/array; the laser time-profile fallback
# used when the deck block gives no t_profile
# (laser.f90:197 -> custom_laser.f90 analogue)
LASER_TIME_PROFILE: list = []


def register_expr_function(name, fn=None, nargs=1):
    """Register ``name(...)`` in the deck expression language.

    Usable as a decorator; ``nargs`` is the fixed argument count
    (variadic custom functions are not supported — match the
    reference's fixed parameter packs)."""
    def deco(f):
        EXPR_FUNCTIONS[name.lower()] = (f, int(nargs))
        return f
    return deco if fn is None else deco(fn)


def register_expr_constant(name, value):
    EXPR_CONSTANTS[name.lower()] = float(value)


def register_deck_block(name, handler=None):
    """Handle a non-standard deck block.  ``handler(element, value,
    parser)`` is called per key with the raw strings and the live
    DeckParser (``parser.expr(value)`` evaluates deck expressions);
    return True when the element was consumed."""
    def deco(f):
        DECK_BLOCKS[name.lower()] = f
        return f
    return deco if handler is None else deco(handler)


def register_deck_check(fn):
    DECK_CHECKS.append(fn)
    return fn


def register_manual_load(fn):
    MANUAL_LOAD.append(fn)
    return fn


def register_laser_time_profile(fn):
    LASER_TIME_PROFILE.append(fn)
    return fn


def clear():
    """Reset every registry (test isolation)."""
    EXPR_FUNCTIONS.clear()
    EXPR_CONSTANTS.clear()
    DECK_BLOCKS.clear()
    DECK_CHECKS.clear()
    MANUAL_LOAD.clear()
    LASER_TIME_PROFILE.clear()


_loaded: set = set()


def load_plugin(data_dir: str):
    """Import ``epoch_extensions.py`` from ``data_dir`` if present
    (idempotent per path).  Called by Simulation before deck parse."""
    path = os.path.join(os.path.abspath(data_dir), "epoch_extensions.py")
    if path in _loaded or not os.path.isfile(path):
        return
    _loaded.add(path)
    spec = importlib.util.spec_from_file_location("epoch_extensions", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    _log.info("loaded user extensions from %s", path)
