"""Shared model building blocks.

Segment-sum neighborhood aggregation replaces the reference's per-batch
``tf.sparse_tensor_dense_matmul`` over user-item incidence matrices
(utils/tools.py:90-113) — on TPU a gather + segment-sum over the flat
(u, i) pair list is the same math with sequential memory traffic and no
sparse-format bookkeeping.

Masked history attention (NAIS-style) is computed in one numerically-stable
pass over the padded history; peak memory is O(B * H * d), so callers
bound B by the history width (NAIS shrinks its eval chunk sizes,
models/itemsim.py SCORE_ALL_CHUNK).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def segment_mean_embeddings(ids_seg: Array, ids_val: Array, table: Array,
                            num_segments: int, inv_counts: Array) -> Array:
    """out[s] = inv_counts[s] * sum_{k: ids_seg[k]==s} table[ids_val[k]].

    With inv_counts = 1/|segment| this is the row-normalized incidence
    matmul (TransCF ui/iu matrices, FISM's 1/|I_u| user aggregation).
    """
    vals = table[ids_val]
    agg = jax.ops.segment_sum(vals, ids_seg, num_segments=num_segments)
    return agg * inv_counts[:, None]


def masked_history_attention(hist_emb: Array, mask: Array, logits: Array,
                             beta: float) -> Array:
    """NAIS smoothed softmax over a padded history (NAIS_single.py:66-80).

    hist_emb: [B, H, d] history item embeddings; mask: [B, H] validity;
    logits: [B, H] raw attention scores.  Returns [B, d] user vectors:
        u = sum_h exp(s_h) p_h / (sum_h exp(s_h))^beta
    computed with running-max stabilization (exact up to float assoc).
    """
    neg = jnp.asarray(-1e30, logits.dtype)
    logits = jnp.where(mask, logits, neg)
    m = jnp.max(logits, axis=1, keepdims=True)                  # [B, 1]
    # All-masked rows: make the max finite so exp() stays 0 via the mask.
    m = jnp.maximum(m, -1e29)
    e = jnp.where(mask, jnp.exp(logits - m), 0.0)               # [B, H]
    s = jnp.sum(e, axis=1, keepdims=True)                       # [B, 1]
    num = jnp.einsum("bh,bhd->bd", e, hist_emb)                 # [B, d]
    # u = e^{m(1-beta)} * num / s^beta  (folding the max back in).
    scale = jnp.exp(m * (1.0 - beta)) / jnp.maximum(s, 1e-30) ** beta
    return num * scale


def relu_mlp_logits(x: Array, w: Array, b: Array, h: Array) -> Array:
    """h^T ReLU(x W + b) — the 1-hidden-layer attention scorer used by
    NAIS/SAMN/the GAT models (e.g. NAIS_single.py:74)."""
    return jax.nn.relu(x @ w + b) @ h
