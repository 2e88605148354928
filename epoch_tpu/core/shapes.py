"""Particle shape functions (tophat / triangle / bspline3).

The reference selects one shape at compile time via textual include files
(``epoch2d/src/include/{tophat,triangle,bspline3}/*.inc``); here the shape is
a static config parameter and weights are vectorised over the particle batch.

Weights are *unnormalised* exactly as in the reference (they sum to
``1/fac_1d`` per axis, ``fac_1d`` = 1/2 triangle, 1 tophat, 1/24 bspline3);
the normalisation factor enters the gather/deposition prefactors
(particles.F90:120-128).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import constants as const

Shape = const.Shape

# per-axis normalisation 1/sum(weights)
FAC_1D = {
    Shape.TOPHAT: 1.0,
    Shape.TRIANGLE: 0.5,
    Shape.BSPLINE3: 1.0 / 24.0,
}


def support_offsets(shape: Shape) -> np.ndarray:
    sf_min, sf_max, _ = const.SHAPE_SUPPORT[shape]
    return np.arange(sf_min, sf_max + 1)


def window_offsets(shape: Shape) -> np.ndarray:
    """Deposition footprint: support extended by one cell each side
    (hx array bounds sf_min-1 : sf_max+1, particles.F90:79-83)."""
    sf_min, sf_max, _ = const.SHAPE_SUPPORT[shape]
    return np.arange(sf_min - 1, sf_max + 2)


def weight_at(shape: Shape, cf, r):
    """Shape weight at integer offset ``r`` from the particle cell with
    cell fraction ``cf`` (as defined in the *.inc files); zero outside
    support.  ``r`` broadcasts against ``cf``."""
    if shape == Shape.TRIANGLE:
        cf2 = cf * cf
        w_m = 0.25 + cf2 + cf          # r = -1
        w_0 = 1.5 - 2.0 * cf2          # r = 0
        w_p = 0.25 + cf2 - cf          # r = +1
        return jnp.where(r == -1, w_m,
               jnp.where(r == 0, w_0,
               jnp.where(r == 1, w_p, 0.0)))
    if shape == Shape.TOPHAT:
        w_0 = 0.5 + cf                 # r = 0
        w_p = 0.5 - cf                 # r = 1
        return jnp.where(r == 0, w_0, jnp.where(r == 1, w_p, 0.0))
    # bspline3
    cf2 = cf * cf
    w_m2 = (0.5 + cf) ** 4
    w_m1 = 4.75 + 11.0 * cf + 4.0 * cf2 * (1.5 - cf - cf2)
    w_0 = 14.375 + 6.0 * cf2 * (cf2 - 2.5)
    w_p1 = 4.75 - 11.0 * cf + 4.0 * cf2 * (1.5 + cf - cf2)
    w_p2 = (0.5 - cf) ** 4
    return jnp.where(r == -2, w_m2,
           jnp.where(r == -1, w_m1,
           jnp.where(r == 0, w_0,
           jnp.where(r == 1, w_p1,
           jnp.where(r == 2, w_p2, 0.0)))))


def support_weights(shape: Shape, cf):
    """(N,) cf → (N, support_len) weights at the support offsets (gx)."""
    offs = jnp.asarray(support_offsets(shape))
    return weight_at(shape, cf[..., None], offs)


def window_weights(shape: Shape, cf, dcell):
    """(N,) cf, (N,) integer dcell → (N, window_len) weights placed at
    offsets ``window - dcell`` (hx_dcell.inc)."""
    offs = jnp.asarray(window_offsets(shape))
    return weight_at(shape, cf[..., None], offs - dcell[..., None])


def cell_and_frac(rel_pos, inv_dx, shape: Shape, ng: int, staggered: bool):
    """Cell index (python, ghost-padded) and cell fraction.

    Unstaggered (gx/cell_x1, particles.F90:248-257):
        r = pos/dx [- 0.5 tophat];  c = floor(r + 0.5);  cf = c - r
    Staggered by half a cell (hx/cell_x2, :275-277):
        c = floor(r);  cf = c - r + 0.5
    Returned cell = c + ng (Fortran c+1, 1-based → python + ng).
    """
    r = rel_pos * inv_dx
    if shape == Shape.TOPHAT:
        r = r - 0.5
    if staggered:
        c = jnp.floor(r)
        cf = c - r + 0.5
    else:
        c = jnp.floor(r + 0.5)
        cf = c - r
    return c.astype(jnp.int32) + ng, cf
