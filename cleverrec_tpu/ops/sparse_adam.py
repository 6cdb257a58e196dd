"""Sparse (lazy) row-wise Adam for embedding tables.

The scan tier's ``optax.adam`` is DENSE: every step decays and rewrites
the full [N, d] moment/param planes even though a batch touches at most
O(B) distinct rows — at Epinions scale that full-table traversal was
214.8 ms of the 336.7 ms SBPR epoch (benchmarks/sbpr_profile.py,
round-5 breakdown) while the Adam math itself was ~6 ms.  This module
updates ONLY the touched rows per step: duplicate ids' gradients are
summed first (matching XLA's dense scatter-add), then one gather +
Adam + scatter per plane — O(B d) HBM traffic instead of O(N d).

Semantics: LazyAdam (tf.contrib.opt.LazyAdamOptimizer) — untouched
rows' moments do NOT decay between their occurrences, with the global
step count driving bias correction.  This deviates from the reference's
TF1 vanilla Adam (which densely decays moments every step,
`tf.train.AdamOptimizer._apply_sparse`); the deviation is the
well-known embedding-training tradeoff and is pinned at the metric
level in benchmarks/EPINIONS_RUNS.jsonl (HR/NDCG within run variance of
the dense-Adam scan arm).  Step-level mechanics are pinned against a
dense-scatter lazy oracle in tests/test_sparse_rows.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _segment_totals(g_s: jax.Array, newseg: jax.Array) -> jax.Array:
    """Per-position running totals of a SEGMENTED sum (segments =
    contiguous runs flagged by ``newseg``), via the classic segmented
    associative scan.  At each segment's LAST position the running
    total is the full segment sum.  Exact within a segment (no
    cross-segment accumulation, so no f32 cancellation), and entirely
    gather/scatter-free — ``jax.ops.segment_sum`` at this width (18k
    segments) lowered to a pathological TPU scatter-add that dominated
    the whole training step (measured ~0.8 ms/step; the sort feeding
    it is 6 us)."""
    def comb(a, b):
        fa, va = a
        fb, vb = b
        keep = (~fb).astype(va.dtype)[..., None]
        return fa | fb, vb + va * keep

    _, v = jax.lax.associative_scan(comb, (newseg, g_s))
    return v


def dedup_rows(ids: jax.Array, grads: jax.Array, n_rows: int):
    """Sum duplicate ids' gradient rows.

    Returns (rep [M], gsum [M, d]): ``rep`` holds each distinct id once
    (slot order arbitrary) with unused slots set to ``n_rows`` (out of
    range — callers gather with mode='fill' and scatter with
    mode='drop'); ``gsum[s]`` is the summed gradient of ``rep[s]``.
    """
    m = ids.shape[0]
    ids_s, order = jax.lax.sort_key_val(ids,
                                        jnp.arange(m, dtype=jnp.int32))
    g_s = grads[order]
    newseg = jnp.concatenate([jnp.ones((1,), bool),
                              ids_s[1:] != ids_s[:-1]])
    is_last = jnp.concatenate([ids_s[1:] != ids_s[:-1],
                               jnp.ones((1,), bool)])
    gsum = _segment_totals(g_s, newseg)
    rep = jnp.where(is_last, ids_s,
                    jnp.asarray(n_rows, ids_s.dtype))
    return rep, gsum


def sparse_rows_adam(table: jax.Array, mu: jax.Array, nu: jax.Array,
                     ids: jax.Array, grads: jax.Array, count,
                     lr: float, b1: float = 0.9, b2: float = 0.999,
                     eps: float = 1e-8):
    """One LazyAdam step on the rows named by ``ids`` (duplicates'
    grads summed, exactly like a dense scatter-add).  ``count`` is the
    PRE-step global Adam count (optax convention: bias correction uses
    count + 1).  Matches optax.adam's update formula row-wise:
    m <- b1 m + (1-b1) g;  v <- b2 v + (1-b2) g^2;
    p <- p - lr * m_hat / (sqrt(v_hat) + eps)."""
    rep, gsum = dedup_rows(ids, grads, table.shape[0])
    mrows = mu.at[rep].get(mode="fill", fill_value=0.0)
    vrows = nu.at[rep].get(mode="fill", fill_value=0.0)
    trows = table.at[rep].get(mode="fill", fill_value=0.0)
    m2 = b1 * mrows + (1.0 - b1) * gsum
    v2 = b2 * vrows + (1.0 - b2) * gsum * gsum
    t = (count + 1).astype(jnp.float32)
    mhat = m2 / (1.0 - b1 ** t)
    vhat = v2 / (1.0 - b2 ** t)
    t2 = trows - lr * mhat / (jnp.sqrt(vhat) + eps)
    return (table.at[rep].set(t2, mode="drop"),
            mu.at[rep].set(m2, mode="drop"),
            nu.at[rep].set(v2, mode="drop"))


def dense_adam_leaf(p, m, v, g, count, lr: float, b1: float = 0.9,
                    b2: float = 0.999, eps: float = 1e-8):
    """Plain Adam on a dense (non-table) leaf — the rows tier's small
    dense params (e.g. CUNE's learned social scalar)."""
    m2 = b1 * m + (1.0 - b1) * g
    v2 = b2 * v + (1.0 - b2) * g * g
    t = (count + 1).astype(jnp.float32)
    mhat = m2 / (1.0 - b1 ** t)
    vhat = v2 / (1.0 - b2 ** t)
    return p - lr * mhat / (jnp.sqrt(vhat) + eps), m2, v2
