"""Pallas compaction kernel (ops/compact.py) vs lax.sort semantics.

Runs in interpret mode on CPU so the suite exercises the kernel logic
without TPU hardware."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_compact_matches_sort(monkeypatch):
    from jax.experimental import pallas as pl
    import epoch_tpu.ops.compact as C

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(C.pl, "pallas_call", interp)

    K3, K = 48, 16
    g = (16, 128)
    rng = jax.random.PRNGKey(0)
    w = jnp.where(jax.random.uniform(rng, (K3,) + g) > 0.7,
                  jax.random.uniform(jax.random.fold_in(rng, 1),
                                     (K3,) + g), 0.0)
    pays = [jax.random.normal(jax.random.fold_in(rng, i + 2), (K3,) + g)
            for i in range(3)]
    key = -w
    outs = C.compact_live_first._fun(K, key, w, *pays) \
        if hasattr(C.compact_live_first, "_fun") \
        else C.compact_live_first(K, key, w, *pays)
    ref = jax.lax.sort((key, w) + tuple(pays), dimension=0, num_keys=1)
    # same live multiset per cell (order within equal keys may differ)
    assert np.array_equal((np.asarray(outs[1]) > 0).sum(0),
                          (np.asarray(ref[1][:K]) > 0).sum(0))
    assert np.allclose(np.sort(np.asarray(outs[1]), axis=0),
                       np.sort(np.asarray(ref[1][:K]), axis=0))
