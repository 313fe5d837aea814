"""k-sorted merge sort (ops/sort_pallas) against lax.sort."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastpm_tpu.ops.sort_pallas import (make_merge_pairs_fn,
                                        sort_ksorted,
                                        sort_maybe_ksorted)


def _ksorted_keys(rng, n, D):
    """Unique i32 keys where row i's sorted position is within ~D of
    i (rank-displaced identity)."""
    vals = np.arange(n, dtype=np.int64) * 7 + rng.integers(-7 * D,
                                                           7 * D, n)
    order = np.argsort(vals, kind="stable")
    ranks = np.empty(n, dtype=np.int32)
    ranks[order] = np.arange(n, dtype=np.int32)
    return ranks


def test_merge_pairs_bitonic():
    """The pallas pair-merge sorts (ascending, descending) run pairs."""
    rng = np.random.default_rng(3)
    n, B = 4096, 512
    keys = rng.integers(0, 10000, n).astype(np.int32)
    pay = rng.standard_normal(n).astype(np.float32)
    kb = keys.reshape(-1, B).copy()
    pb = pay.reshape(-1, B).copy()
    for i in range(kb.shape[0]):
        order = np.argsort(kb[i], kind="stable")
        if i % 2 == 1:
            order = order[::-1]
        kb[i], pb[i] = kb[i][order], pb[i][order]
    merge = make_merge_pairs_fn(n, B, 1, interpret=True)
    ok, op = merge(jnp.asarray(kb.reshape(n)),
                   jnp.asarray(pb.reshape(n)))
    ok, op = np.asarray(ok), np.asarray(op)
    for k2 in ok.reshape(-1, 2 * B):
        assert (np.diff(k2) >= 0).all()
    # multiset of (key, payload) pairs preserved
    a = sorted(zip(keys.tolist(), pay.tolist()))
    b = sorted(zip(ok.tolist(), op.tolist()))
    assert a == b


def test_sort_ksorted_exact_unique():
    """Unique k-sorted keys: output matches lax.sort bit-for-bit and
    the ok flag is True."""
    rng = np.random.default_rng(0)
    n, B = 16384, 1024
    key = jnp.asarray(_ksorted_keys(rng, n, B // 3))
    pay = tuple(jnp.asarray(rng.standard_normal(n).astype(np.float32))
                for _ in range(3))
    (out, ok) = jax.jit(
        lambda ops: sort_ksorted(ops, B, interpret=True))((key,) + pay)
    assert bool(ok)
    want = jax.lax.sort((key,) + pay, num_keys=1)
    for g, w in zip(out, want):
        assert bool(jnp.all(g == w))


def test_sort_ksorted_duplicates():
    """Duplicate keys (the real cell distribution): keys sorted, and
    per-key payload multisets match lax.sort's."""
    rng = np.random.default_rng(1)
    n, B = 8192, 512
    base = np.sort(rng.integers(0, 600, n)).astype(np.int32)
    jitter = rng.integers(-2, 3, n).astype(np.int32)
    key = jnp.asarray(base + jitter)
    pay = jnp.asarray(rng.permutation(n).astype(np.float32))
    (out, ok) = jax.jit(
        lambda ops: sort_ksorted(ops, B, interpret=True))((key, pay))
    assert bool(ok)
    k, p = np.asarray(out[0]), np.asarray(out[1])
    assert (np.diff(k) >= 0).all()
    a = sorted(zip(k.tolist(), p.tolist()))
    kw, pw = jax.lax.sort((key, pay), num_keys=1)
    b = sorted(zip(np.asarray(kw).tolist(), np.asarray(pw).tolist()))
    assert a == b


def test_sort_maybe_ksorted_fallback():
    """A random permutation defeats the fast path; the cond falls back
    to the full sort and the result still matches lax.sort exactly."""
    rng = np.random.default_rng(2)
    n, B = 8192, 512
    key = jnp.asarray(rng.permutation(n).astype(np.int32))
    pay = tuple(jnp.asarray(rng.standard_normal(n).astype(np.float32))
                for _ in range(2))
    _, ok = jax.jit(
        lambda ops: sort_ksorted(ops, B, interpret=True))((key,) + pay)
    assert not bool(ok)
    out = jax.jit(lambda ops: sort_maybe_ksorted(
        ops, B, interpret=True))((key,) + pay)
    want = jax.lax.sort((key,) + pay, num_keys=1)
    for g, w in zip(out, want):
        assert bool(jnp.all(g == w))


def test_sort_ksorted_rejects_bad_shapes():
    with pytest.raises(ValueError):
        make_merge_pairs_fn(4096, 300, 1)
    with pytest.raises(ValueError):
        make_merge_pairs_fn(5000, 512, 1)


def test_prepare_carry_sort_block_matches_full_sort():
    """make_prepare_carry_fn(sort_block=...) (k-sorted fast sort with
    padding to a 2B multiple) produces the same prepared bundle as the
    full-lax.sort path: identical cell_2d/ranges/w8T, and the carried
    (x, v) rows equal as a multiset (intra-cell order is free)."""
    from fastpm_tpu.mesh import PM
    from fastpm_tpu.ops.paint_pallas import make_prepare_carry_fn

    pm = PM(Nmesh=(32, 32, 32), BoxSize=32.0)
    rng = np.random.default_rng(3)
    n = 3000  # NOT a multiple of 2B: exercises the pad/slice path
    x = jnp.asarray((rng.random((n, 3)) * 32).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    p_ref = jax.jit(make_prepare_carry_fn(pm))
    p_ks = jax.jit(make_prepare_carry_fn(pm, sort_block=256))
    (pa, xa, va, _) = p_ref(x, v)
    (pb, xb, vb, _) = p_ks(x, v)
    assert bool(jnp.array_equal(pa["cell_2d"], pb["cell_2d"]))
    assert bool(jnp.array_equal(pa["ranges"], pb["ranges"]))
    assert float(jnp.abs(pa["w8T"] - pb["w8T"]).max()) == 0.0
    ka = np.lexsort(np.asarray(xa).T)
    kb = np.lexsort(np.asarray(xb).T)
    assert np.array_equal(np.asarray(xa)[ka], np.asarray(xb)[kb])
    assert np.array_equal(np.asarray(va)[ka], np.asarray(vb)[kb])
    with pytest.raises(ValueError):
        make_prepare_carry_fn(pm, sort_block=256)(
            x, v, jnp.zeros((n,), jnp.uint32))
