"""Top-K retrieval over large item catalogs.

The reference's full-catalog eval argsorts the whole item axis per user in
numpy (RankingRecommender.py:221-240).  The bundled datasets fit a single
[B, I] score pass, but the production-scale path must stream:

- ``streaming_topk``: lax.scan over item chunks with a carried running
  top-K (memory O(B * chunk) instead of O(B * I)),
- ``sharded_topk_scores``: shard_map over the mesh 'model' axis — each
  shard computes its local top-K, an all_gather + merge produces the
  global result (the distributed "sequence-parallel analog" for the
  catalog axis, SURVEY.md section 5.7),
- ``merge_topk``: k-way merge of (values, ids) blocks via one lax.top_k.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

Array = jax.Array


def merge_topk(values: Array, ids: Array, k: int) -> tuple[Array, Array]:
    """Merge candidate blocks: values/ids [B, M] -> top-k [B, k]."""
    v, idx = jax.lax.top_k(values, k)
    return v, jnp.take_along_axis(ids, idx, axis=1)


# Grouped exact top-k: below this width a plain lax.top_k wins (the
# group reduce + rescue pipeline has fixed overhead ~ a [B, k*group]
# sort); above it the win grows with width (5.2x at 319k columns).
GROUPED_MIN_COLS = 16384
_NEG = -3.0e38   # finite mask sentinel (matches ops/pallas_scores.NEG)


def grouped_topk(scores: Array, k: int, group: int = 128,
                 min_cols: int = GROUPED_MIN_COLS) -> tuple[Array, Array]:
    """Exact top-k via group-max pruning — the wide-catalog fast path.

    XLA's TopK over a [B, 320k] row costs ~23ms/1024 rows on v5e; this
    pipeline gets the identical VALUES in ~4.5ms:

    1. group maxes over ``group``-column blocks (fuses into the scoring
       matmul's epilogue — near-free),
    2. lax.top_k over the [B, n/group] group maxes,
    3. gather the k winning groups' columns as a batched ONE-HOT matmul
       [B,k,G] x [B,G,group] (a take_along_axis element gather here is
       ~60ms — TPU scalar-gathers; the MXU form is ~0.3ms),
    4. exact lax.top_k over the [B, k*group] rescue set.

    Exactness: let t be the k-th largest value of a row.  Any group
    holding a top-k item has max >= t, and any group with max >= t
    holds an item scoring >= t — so at most k groups can outrank a
    top-k item's group, step 2's k groups cover all of them, and step
    4 recovers exactly the top-k VALUES.  Tie ORDER (which equal-valued
    item id surfaces) may differ from lax.top_k's lowest-index rule.

    Contract: float32 scores; masked slots must be <= -1e37 (either
    -inf or the kernels' finite -3e38 sentinel) and come back as
    exactly -inf.  -inf is clamped to -3e38 internally: a one-hot
    matmul rescue of a raw -inf would produce 0 * -inf = NaN.  Indices
    for -inf slots may point at padding (>= n); consumers already remap
    non-finite slots to their PAD sentinel.  Falls back to lax.top_k
    when the row is narrow, the group count can't cover k, or the
    dtype isn't float32.
    """
    b, n = scores.shape
    g = -(-n // group)
    if (n < min_cols or g < k or scores.dtype != jnp.float32):
        return jax.lax.top_k(scores, k)
    pad = g * group - n
    s = jnp.maximum(scores, _NEG)
    if pad:
        s = jnp.pad(s, ((0, 0), (0, pad)), constant_values=_NEG)
    s3 = s.reshape(b, g, group)
    gmax = s3.max(axis=-1)
    _, gi = jax.lax.top_k(gmax, k)                         # [B, k]
    onehot = (gi[:, :, None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, g), 2)).astype(jnp.float32)      # [B, k, G]
    cand = jax.lax.dot_general(
        onehot, s3, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                # [B, k, group]
    v, ci = jax.lax.top_k(cand.reshape(b, k * group), k)
    cols = (gi[:, :, None] * group
            + jnp.arange(group, dtype=gi.dtype)).reshape(b, k * group)
    idx = jnp.take_along_axis(cols, ci, axis=1)
    return jnp.where(v > -1.0e37, v, -jnp.inf), idx


def streaming_topk(score_chunk_fn: Callable[[Array], Array], item_nums: int,
                   k: int, chunk: int = 4096,
                   approx: bool = False) -> tuple[Array, Array]:
    """Running top-k over item chunks.

    score_chunk_fn(item_ids [chunk]) -> scores [B, chunk] (already masked:
    seen/invalid items must be -inf).  Returns (values, ids) [B, k].

    ``approx=True``: ScaNN-style selection — each fresh chunk is first
    reduced with jax.lax.approx_max_k (TPU PartialReduce, ~0.95 recall
    per chunk) and the CARRY is merged exactly, so an element that
    survives its own chunk's selection is never evicted approximately
    later (re-approximating the sorted carry would compound recall loss
    across chunks: the carry sits in fixed leading positions — the
    adversarial layout for positional partial-reduce binning).

    Exact mode reduces each fresh chunk with ``grouped_topk`` (group-max
    pruning, exact values) and merges the k survivors with the carry —
    the full lax.top_k sort of [B, k + chunk] it replaces dominated the
    whole eval at large catalogs (0.68ms/4k chunk on v5e).  Narrow
    chunks where grouped_topk declines fall back to that full sort.
    """
    n_chunks = -(-item_nums // chunk)
    out_shape = jax.eval_shape(score_chunk_fn,
                               jax.ShapeDtypeStruct((chunk,), jnp.int32))
    b = out_shape.shape[0]
    neg = jnp.full((b, k), -jnp.inf, out_shape.dtype)
    zero_ids = jnp.zeros((b, k), jnp.int32)
    grouped = (not approx and chunk > 4 * k
               and chunk // 128 >= k and out_shape.dtype == jnp.float32)

    def body(carry, c_idx):
        best_v, best_i = carry
        ids = c_idx * chunk + jnp.arange(chunk, dtype=jnp.int32)
        valid = ids < item_nums
        scores = score_chunk_fn(jnp.minimum(ids, item_nums - 1))
        scores = jnp.where(valid[None, :], scores, -jnp.inf)
        if approx and chunk > k:
            cids = jnp.broadcast_to(ids[None, :], scores.shape)
            scores, sel = jax.lax.approx_max_k(scores, k)
            cids = jnp.take_along_axis(cids, sel, axis=1)
        elif grouped:
            scores, sel = grouped_topk(scores, k, min_cols=8192)
            # -inf slots may index padding; clamp into the chunk (the
            # merge drops them by value, ids just must stay in range).
            cids = c_idx * chunk + jnp.minimum(sel, chunk - 1)
        else:
            cids = jnp.broadcast_to(ids[None, :], scores.shape)
        v = jnp.concatenate([best_v, scores], axis=1)
        i = jnp.concatenate([best_i, cids], axis=1)
        return merge_topk(v, i, k), None

    (values, ids), _ = jax.lax.scan(
        body, (neg, zero_ids), jnp.arange(n_chunks, dtype=jnp.int32))
    return values, ids


def sharded_topk_scores(scores: Array, k: int, mesh: Mesh,
                        axis: str = "model") -> tuple[Array, Array]:
    """Global top-k of an item-axis-sharded score matrix.

    scores: [B, I] sharded P(None, axis).  Each shard takes its local
    top-k, shards all_gather the (k * n_shards) candidates, one merge
    yields the exact global top-k, replicated.
    """

    def local(scores_shard):
        shard_i = scores_shard.shape[1]
        v, i = grouped_topk(scores_shard, min(k, shard_i))
        offset = jax.lax.axis_index(axis) * shard_i
        i = i + offset
        v_all = jax.lax.all_gather(v, axis, axis=1, tiled=True)
        i_all = jax.lax.all_gather(i, axis, axis=1, tiled=True)
        return merge_topk(v_all, i_all, k)

    # check_vma off: the post-all_gather merge is replicated by
    # construction, which the static checker cannot infer.
    return jax.shard_map(local, mesh=mesh, in_specs=P(None, axis),
                         out_specs=(P(), P()), check_vma=False)(scores)
