"""Pallas TPU kernel: live-first compaction of rebin candidates.

The binned engine's rebin (core/binned.py) needs the 3K candidate slots
of every cell reordered live-first so the first K survive.  This kernel
runs a bitonic network entirely in VMEM, touching HBM once per payload
in and once out; the sort key is the negated weight (live w>0 first)
and payloads ride along through the same compare-exchange selects.

STATUS: superseded in round 2 by the FUSED kernel's butterfly routing
(ops/binned_kernels._compact, inside make_fused_push): a monotone
live-first routing needs only log2(3K) stages vs the bitonic network's
~21, and running it inside the fused kernel keeps the payloads
VMEM-resident with no extra HBM round trip.  This standalone kernel is
kept as the measured negative result that motivated the fusion.
Measured on v5e at the bench shapes (48->16 slots, 256x256 grid,
6 payloads): this kernel 2.2 ms vs the in-graph XLA variadic sort at
0.79 ms — the bitonic network's 21 stages x 7 payloads of VMEM traffic
dominate, and XLA's sort is already well scheduled in context (its
poor 4.5 ms standalone time is a layout artefact).  Kept as the base
for a future fused rebin (compaction + the following gather could share
the VMEM residency, which is where a real win would come from).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bitonic_stages(n):
    """(k, j) stage list of the bitonic sorting network for n = 2**m."""
    stages = []
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            stages.append((k, j))
            j //= 2
        k *= 2
    return stages


def _compact_kernel(n_cand, n_pad, n_keep, n_payload, *refs):
    key_ref = refs[0]
    pay_refs = refs[1:1 + n_payload]
    out_refs = refs[1 + n_payload:]

    big = jnp.float32(3.4e38)
    key = key_ref[:]                     # (n_cand, tx, ny)
    shape = key.shape
    if n_pad > n_cand:
        pad = jnp.full((n_pad - n_cand,) + shape[1:], big, key.dtype)
        key = jnp.concatenate([key, pad], axis=0)
    pays = []
    for r in pay_refs:
        p = r[:]
        if n_pad > n_cand:
            p = jnp.concatenate(
                [p, jnp.zeros((n_pad - n_cand,) + shape[1:], p.dtype)],
                axis=0)
        pays.append(p)

    full = (n_pad,) + shape[1:]
    ndim_t = len(shape) - 1

    def partner_view(a, j):
        """a with every stride-j pair swapped along axis 0 (i -> i ^ j)."""
        nb = n_pad // (2 * j)
        r = a.reshape((nb, 2, j) + shape[1:])
        sw = jnp.concatenate([r[:, 1:2], r[:, 0:1]], axis=1)
        return sw.reshape(full)

    rows = jax.lax.broadcasted_iota(
        jnp.int32, (n_pad,) + (1,) * ndim_t, 0)

    for (k, j) in _bitonic_stages(n_pad):
        # rows pair at distance j (i <-> i^j); a row keeps the minimum of
        # the pair when it is the lower index XNOR the run is ascending
        # ((i & k) == 0) — full-rank bools only (Mosaic rejects 5d masks)
        key_p = partner_view(key, j)
        is_lo = (rows & j) == 0
        asc = (rows & k) == 0
        keep_min = is_lo == asc
        # no bool-valued select_n (Mosaic i1 truncation limitation)
        take_self = (keep_min & (key <= key_p)) \
            | (~keep_min & (key >= key_p))
        key = jnp.where(take_self, key, key_p)
        pays = [jnp.where(take_self, p, partner_view(p, j)) for p in pays]

    out_refs[0][:] = key[:n_keep]
    for r, p in zip(out_refs[1:], pays):
        r[:] = p[:n_keep]


@functools.partial(jax.jit, static_argnums=(0,))
def compact_live_first(n_keep, key, *payloads):
    """Sort (key asc) along axis 0 entirely in VMEM, returning the first
    ``n_keep`` rows of the key and every payload."""
    n_cand = key.shape[0]
    n_pad = 1 << (n_cand - 1).bit_length()
    g = key.shape[1:]
    # tile the sublane axis (grid-x); lane axis stays whole
    if len(g) == 2:
        tx = 8
        grid = (pl.cdiv(g[0], tx),)
        blk_in = (n_cand, tx, g[1])
        blk_out = (n_keep, tx, g[1])
        imap = lambda i: (0, i, 0)
    else:
        tx = None
        grid = (1,)
        blk_in = (n_cand, g[0])
        blk_out = (n_keep, g[0])
        imap = lambda i: (0, 0)

    n_payload = len(payloads)
    kern = functools.partial(_compact_kernel, n_cand, n_pad, n_keep,
                             n_payload)
    out_shapes = [jax.ShapeDtypeStruct((n_keep,) + g, key.dtype)] + [
        jax.ShapeDtypeStruct((n_keep,) + g, p.dtype) for p in payloads]
    in_spec = pl.BlockSpec(blk_in, imap, memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(blk_out, imap, memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kern,
        grid=grid,
        out_shape=tuple(out_shapes),
        in_specs=[in_spec] * (1 + n_payload),
        out_specs=tuple([out_spec] * (1 + n_payload)),
    )(key, *payloads)
    return outs
