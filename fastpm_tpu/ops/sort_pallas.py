"""k-sorted multi-operand sort -- the prepare-sort replacement.

The per-step `lax.sort` over (cell, x, v) is ~20% of a force step
(BENCH_NOTES: 143-190 ms at 16.7M rows).  But under order-free carry
stepping (make_prepare_carry_fn) the input of step N+1 is the OUTPUT
order of step N: particles move well under a mesh cell per step, so the
new cell keys are ALMOST sorted -- each row sits within a bounded
number of ranks D of its final position (D ~ particles per mesh
x-plane per cell of x-motion; ~33k at the 256^3 B2 bench shape).

`lax.sort` is oblivious to pre-sortedness.  This module exploits it:

  1. block sort: one `lax.sort` over (nblocks, B) rows -- cost
     n*log^2(B) instead of n*log^2(n).  Odd blocks are sorted
     DESCENDING (by negating the i32 key -- free, fused) so each
     adjacent pair is a bitonic sequence.
  2. even merge: a Pallas kernel bitonic-merges adjacent block pairs
     (0,1), (2,3), ... entirely in VMEM: log2(2B) butterfly stages;
     row-stride stages via sublane reshuffles, lane-stride stages via
     dual `pltpu.roll` butterflies.
  3. odd merge: same kernel over pairs (1,2), (3,4), ... after an XLA
     re-reversal of the second runs.

For inputs where every row is within B ranks of its sorted position,
even+odd adjacent merges yield a full sort (1-block-bounded odd-even
block transposition).  The caller does NOT need to trust that bound:
`sort_ksorted` returns an exact global sortedness flag, and
`sort_maybe_ksorted` wraps it in a `lax.cond` fallback to a full
`lax.sort`, so the result is always correct -- the k-sorted path is
purely a fast path (reference spends the analogous time in its MPI
bucket exchange, libfastpm/store.c:486-657; no counterpart kernel).

All operands ride every compare-exchange, like lax.sort with
num_keys=1: the key must be i32, payloads f32/i32 of the same length.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["make_merge_pairs_fn", "sort_ksorted", "sort_maybe_ksorted"]


def _butterfly_rows(key, ops, m, R):
    """Compare-exchange rows at XOR-stride m (in rows, ascending):
    reshape (R, 128) -> (R//(2m), 2, m, 128) and exchange the middle
    axis."""
    ksh = key.reshape(R // (2 * m), 2, m, 128)
    a_k, b_k = ksh[:, 0], ksh[:, 1]
    swap = b_k < a_k
    out_k = jnp.stack([jnp.where(swap, b_k, a_k),
                       jnp.where(swap, a_k, b_k)], axis=1)
    new_ops = []
    for o in ops:
        osh = o.reshape(R // (2 * m), 2, m, 128)
        a, b = osh[:, 0], osh[:, 1]
        new_ops.append(jnp.stack([jnp.where(swap, b, a),
                                  jnp.where(swap, a, b)],
                                 axis=1).reshape(R, 128))
    return out_k.reshape(R, 128), new_ops


def _butterfly_lanes(key, ops, s, lane):
    """Compare-exchange lanes at XOR-stride s < 128 (ascending) via
    dual cyclic lane rolls: partner(l) = l ^ s stays in the same
    128-lane row."""
    low = (lane & s) == 0

    def partner(x):
        return jnp.where(low, pltpu.roll(x, 128 - s, 1),
                         pltpu.roll(x, s, 1))

    pk = partner(key)
    # lane with bit clear keeps the min, bit set keeps the max; strict
    # comparisons make both sides of each pair agree (ties: no swap).
    # Select in i32 space: Mosaic (v5e) rejects select_n with i1
    # vector operands ("Unsupported target bitwidth for truncation").
    low_i = low.astype(jnp.int32)
    take = (low_i * (pk < key).astype(jnp.int32)
            + (1 - low_i) * (pk > key).astype(jnp.int32)) > 0
    out_k = jnp.where(take, pk, key)
    new_ops = [jnp.where(take, partner(o), o) for o in ops]
    return out_k, new_ops


def _merge_kernel(key_hbm, *rest, B, P, R, npairs):
    """Bitonic-merge each (2B)-element pair: operands arrive as
    (npairs, R, 128) in ANY/HBM space; pair p is DMA'd to VMEM,
    swept by log2(2B) butterfly stages, and written back.  rest =
    P payload hbm refs, key_out, *payload_outs, then scratch:
    key_vmem, ops_vmem, in_sems, out_sems."""
    pay_hbm = rest[:P]
    key_out = rest[P]
    pay_out = rest[P + 1:2 * P + 1]
    key_vmem = rest[2 * P + 1]
    ops_vmem = rest[2 * P + 2]
    in_sems = rest[2 * P + 3]
    out_sems = rest[2 * P + 4]

    p = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)

    def in_copies():
        cps = [pltpu.make_async_copy(key_hbm.at[p], key_vmem,
                                     in_sems.at[0])]
        for i in range(P):
            cps.append(pltpu.make_async_copy(
                pay_hbm[i].at[p], ops_vmem.at[i], in_sems.at[1 + i]))
        return cps

    def out_copies():
        cps = [pltpu.make_async_copy(key_vmem, key_out.at[p],
                                     out_sems.at[0])]
        for i in range(P):
            cps.append(pltpu.make_async_copy(
                ops_vmem.at[i], pay_out[i].at[p],
                out_sems.at[1 + i]))
        return cps

    for cp in in_copies():
        cp.start()
    for cp in in_copies():
        cp.wait()

    key = key_vmem[...]
    ops = [ops_vmem[i] for i in range(P)]
    s = B
    while s >= 128:
        key, ops = _butterfly_rows(key, ops, s // 128, R)
        s //= 2
    while s >= 1:
        key, ops = _butterfly_lanes(key, ops, s, lane)
        s //= 2
    key_vmem[...] = key
    for i in range(P):
        ops_vmem[i] = ops[i]

    for cp in out_copies():
        cp.start()
    for cp in out_copies():
        cp.wait()


def _resolve_interpret(interpret):
    if interpret is None:
        import jax
        return jax.default_backend() == "cpu"
    return interpret


def make_merge_pairs_fn(n, B, P, interpret=None):
    """Build the pallas pair-merge: operands (key i32[n], P payloads
    [n]) where each adjacent pair of B-runs is bitonic (first run
    ascending, second descending); returns them with every 2B-run
    sorted ascending.  n must be a multiple of 2B, B a power of two
    >= 128."""
    interpret = _resolve_interpret(interpret)
    if B & (B - 1) or B < 128:
        raise ValueError("B must be a power of two >= 128")
    if n % (2 * B):
        raise ValueError("n must be a multiple of 2B")
    npairs = n // (2 * B)
    R = 2 * B // 128
    kernel = functools.partial(_merge_kernel, B=B, P=P, R=R,
                               npairs=npairs)

    def merge(key, *payloads):
        if len(payloads) != P:
            raise ValueError(f"expected {P} payloads")
        shaped = [o.reshape(npairs, R, 128) for o in (key,) + payloads]
        outs = pl.pallas_call(
            kernel,
            grid=(npairs,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (1 + P),
            out_specs=tuple([pl.BlockSpec(memory_space=pl.ANY)]
                            * (1 + P)),
            scratch_shapes=[
                pltpu.VMEM((R, 128), jnp.int32),
                pltpu.VMEM((P, R, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((1 + P,)),
                pltpu.SemaphoreType.DMA((1 + P,)),
            ],
            out_shape=tuple(
                [jax.ShapeDtypeStruct((npairs, R, 128), jnp.int32)]
                + [jax.ShapeDtypeStruct((npairs, R, 128), jnp.float32)]
                * P),
            interpret=interpret,
        )(*shaped)
        return tuple(o.reshape(n) for o in outs)

    return merge


def _flip_second_runs(arrs, n, B):
    """XLA reversal of every ODD B-run (descending <- ascending), so
    adjacent (even, odd) runs form bitonic pairs."""
    out = []
    for a in arrs:
        r = a.reshape(n // (2 * B), 2, B)
        out.append(jnp.concatenate(
            [r[:, 0:1], jnp.flip(r[:, 1:2], axis=-1)],
            axis=1).reshape(n))
    return out


def sort_ksorted(operands, B, interpret=None):
    """Fast path: sort (key, *payloads) assuming every row is within
    ~B ranks of its sorted position.  Returns (sorted_ops, ok) where
    ok is the EXACT global sortedness flag of the result -- callers
    must fall back to a full sort when ok is False (sort_maybe_ksorted
    does this with lax.cond)."""
    key = operands[0]
    payloads = tuple(operands[1:])
    n = key.shape[0]
    P = len(payloads)
    if n % (2 * B):
        raise ValueError("n must be a multiple of 2B")
    merge = make_merge_pairs_fn(n, B, P, interpret=interpret)

    # 1. block sort rows of B; odd blocks descending via key negation
    nb = n // B
    sign = jnp.where((jnp.arange(nb, dtype=jnp.int32) & 1)[:, None]
                     == 1, jnp.int32(-1), jnp.int32(1))
    kb = key.reshape(nb, B) * sign
    sorted_ops = jax.lax.sort(
        (kb,) + tuple(p.reshape(nb, B) for p in payloads),
        dimension=1, num_keys=1)
    key1 = (sorted_ops[0] * sign).reshape(n)
    pays1 = [o.reshape(n) for o in sorted_ops[1:]]

    # 2. even merge: pairs (0,1), (2,3), ... are bitonic already
    even = merge(key1, *pays1)

    # 3. odd merge: pairs (1,2), (3,4), ...; head/tail B-runs pass
    # through.  The interior second runs are re-reversed first.
    mid = [o[B:n - B] for o in even]
    mid = _flip_second_runs(mid, n - 2 * B, B)
    if n - 2 * B >= 2 * B:
        merge_mid = make_merge_pairs_fn(n - 2 * B, B, P,
                                        interpret=interpret)
        mid = merge_mid(mid[0], *mid[1:])
    out = tuple(jnp.concatenate([e[:B], m, e[n - B:]])
                for e, m in zip(even, mid))
    ok = jnp.all(out[0][1:] >= out[0][:-1])
    return out, ok


def sort_maybe_ksorted(operands, B, interpret=None):
    """Correct-by-construction sort: the k-sorted fast path guarded by
    its exact sortedness flag, falling back to a full lax.sort inside
    a lax.cond (one branch executes at runtime)."""
    fast, ok = sort_ksorted(operands, B, interpret=interpret)

    def use_fast(_):
        return fast

    def full(ops):
        return jax.lax.sort(ops, num_keys=1)

    return jax.lax.cond(ok, use_fast, full, tuple(operands))
