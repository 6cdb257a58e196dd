"""Shared full-catalog ranking backends.

One implementation of each ranker, consumed by BOTH the Evaluator
(evalx.py — converts to PAD_ITEM id lists for the metric formulas) and
the serving module (serving.py — returns (items, scores) with -1/-inf
padding).  They previously carried near-duplicate copies that had
already drifted (PAD sentinels, stream thresholds, backend precedence).

Every ranker returns ``(values [B, k], items [B, k])`` with masked /
past-catalog slots at exactly ``-inf`` (the fused kernel's finite
-3e38 sentinel is normalized here so consumers can test isfinite
uniformly).  Scores are "higher is better": cml_like distance models
are negated INSIDE each ranker.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_full_scores(model, params, aux, u, rows,
                       filter_seen: bool = True):
    """[B, I] scores with seen train items masked to -inf.

    ``rows``: the batch users' PRE-GATHERED sorted seen rows [B, L]
    (callers gather seen.rows[u] themselves — the Evaluator pre-stacks
    them per batch).  Seen ids scatter into a [B, I+1] mask; the
    sentinel id ``I`` lands in the spill column and is sliced off
    (matches the reference's rank-time skip,
    RankingRecommender.py:214-230)."""
    scores = model.score_all(params, u, aux)
    if model.cml_like:
        scores = -scores
    if not filter_seen:
        return scores
    b, item_nums = scores.shape
    seen = jnp.zeros((b, item_nums + 1), dtype=bool)
    seen = seen.at[jnp.arange(b)[:, None], rows].set(True)[:, :item_nums]
    return jnp.where(seen, -jnp.inf, scores)


def rank_dense(model, params, aux, u, rows, k: int,
               filter_seen: bool = True):
    """Dense [B, I] scoring + top-k."""
    scores = masked_full_scores(model, params, aux, u, rows, filter_seen)
    return jax.lax.top_k(scores, k)


def rank_sharded(model, params, aux, u, rows, k: int, mesh,
                 filter_seen: bool = True):
    """Item-axis-sharded ranking: scores constrained to
    P(None, 'model'), per-shard top-K + all_gather merge."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from cleverrec_tpu.ops.topk import sharded_topk_scores
    scores = masked_full_scores(model, params, aux, u, rows, filter_seen)
    n_shards = mesh.shape["model"]
    pad = (-scores.shape[1]) % n_shards
    if pad:
        scores = jnp.pad(scores, ((0, 0), (0, pad)),
                         constant_values=-jnp.inf)
    scores = jax.lax.with_sharding_constraint(
        scores, NamedSharding(mesh, P(None, "model")))
    return sharded_topk_scores(scores, k, mesh)


def rank_stream(model, params, aux, u, rows, item_nums: int, k: int,
                chunk: int = 4096, filter_seen: bool = True):
    """Streaming ranking: lax.scan over item chunks with a carried
    running top-K — memory O(B * chunk) instead of the dense [B, I]
    score matrix (the catalog-axis scaling path, SURVEY.md section
    5.7).  Seen masking via binary search over the sorted seen rows."""
    from cleverrec_tpu.ops.topk import streaming_topk
    cml = model.cml_like

    def score_chunk(chunk_ids):
        cand = jnp.broadcast_to(chunk_ids[None, :],
                                (u.shape[0], chunk_ids.shape[0]))
        s = model.score_candidates(params, u, cand, aux)
        if cml:
            s = -s
        if filter_seen:
            idx = jax.vmap(jnp.searchsorted)(rows, cand)
            idx_c = jnp.minimum(idx, rows.shape[1] - 1)
            hit = jnp.take_along_axis(rows, idx_c, axis=1) == cand
            s = jnp.where(hit, -jnp.inf, s)
        return s

    return streaming_topk(score_chunk, item_nums, k, chunk=chunk)


def rank_fused(model, params, aux, u, seen_bits, k: int,
               interpret: bool = False):
    """Pallas path for dot-decomposable models: one fused
    score+bitmap-mask kernel, then top_k.  ``seen_bits``: [B, W] packed
    uint32 seen bitmaps (pass zeros for unfiltered retrieval)."""
    from cleverrec_tpu.ops.pallas_scores import fused_dot_topk_scores
    u_vecs, table, bias = model.dot_decomposition(params, u, aux)
    if model.cml_like:
        # Negate INSIDE the dot (-u).q so the kernel's -3e38 seen mask
        # stays the worst score; never negate after masking.
        u_vecs = -u_vecs
        bias = None if bias is None else -bias
    scores, item_map = fused_dot_topk_scores(u_vecs, table, seen_bits,
                                             interpret=interpret)
    if bias is not None:
        # Bias after masking keeps masked slots at -3e38 (bias is
        # bounded); ranking unaffected.  Scores are in the kernel's
        # permuted column order, so permute the bias to match.
        scores = scores + jnp.pad(bias, (0, item_map.shape[0]
                                         - bias.shape[0]))[item_map][None, :]
    v, idx = jax.lax.top_k(scores, k)
    # Normalize the kernel's finite -3e38 sentinel to the module-wide
    # -inf contract.
    return jnp.where(v > -1e37, v, -jnp.inf), item_map[idx]
