"""Fused slot-axis sorting networks.

The binned engine's slot axis is tiny (K ~ 4..32) while the grid axes
are huge (128^3 = 2M cells), so every per-cell reorder — the collision
shuffle (collisions.F90: shuffle_particle_list_random :1747), candidate
compaction after a rebin, creation-merge appends — is K values deep and
millions of cells wide.  ``jax.lax.sort`` over that layout materialises
each compare stage of every operand through HBM (and transposes when the
sort dimension is not minor); at bench shapes a single multi-payload
sort costs milliseconds.

A Batcher odd-even mergesort NETWORK of ``jnp.where`` compare-swaps is
the TPU-native form: the whole network is elementwise over the grid, so
XLA fuses it into one pass — each cell's K-deep column is sorted in
registers, and every payload array is read and written exactly once.
Comparator counts are O(K log^2 K) (19 at K=8, 63 at 16, 191 at 32),
all fused.

The network sorts ascending by key and is NOT stable; all users here
key by random uniforms (shuffles) or by -w with only the live/dead
partition mattering, so stability is irrelevant.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def comparator_pairs(n: int):
    """Batcher odd-even mergesort comparator list for ``n`` wires.

    The classic iterative construction, valid for arbitrary ``n`` (not
    just powers of two): comparators addressing wires >= n are pruned,
    which is sound because a virtual +inf pad at the tail never swaps
    forward (Knuth TAOCP vol. 3, 5.3.4).
    """
    pairs = []
    p = 1
    while p < n:
        k = p
        while k >= 1:
            for j in range(k % p, n - k, 2 * k):
                for i in range(min(k, n - j - k)):
                    if (i + j) // (2 * p) == (i + j + k) // (2 * p):
                        pairs.append((i + j, i + j + k))
            k //= 2
        p *= 2
    return tuple(pairs)


def sort_by_key(key, payloads):
    """Sort ``key`` (shape (K, *grid)) ascending along axis 0, carrying
    ``payloads`` (sequence of (K, *grid) arrays) through the same
    permutation.  Returns ``(key_sorted, payloads_sorted)`` with the
    same shapes.  One fused elementwise pass; not stable."""
    K = key.shape[0]
    keys = [key[i] for i in range(K)]
    plds = [[p[i] for i in range(K)] for p in payloads]
    for (a, b) in comparator_pairs(K):
        swap = keys[a] > keys[b]
        ka, kb = keys[a], keys[b]
        keys[a] = jnp.where(swap, kb, ka)
        keys[b] = jnp.where(swap, ka, kb)
        for rows in plds:
            ra, rb = rows[a], rows[b]
            rows[a] = jnp.where(swap, rb, ra)
            rows[b] = jnp.where(swap, ra, rb)
    return (jnp.stack(keys),
            [jnp.stack(rows) for rows in plds])
