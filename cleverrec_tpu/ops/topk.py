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
    adversarial layout for positional partial-reduce binning).  Exact
    mode pays a full lax.top_k sort of [B, k + chunk] per chunk.
    """
    n_chunks = -(-item_nums // chunk)
    out_shape = jax.eval_shape(score_chunk_fn,
                               jax.ShapeDtypeStruct((chunk,), jnp.int32))
    b = out_shape.shape[0]
    neg = jnp.full((b, k), -jnp.inf, out_shape.dtype)
    zero_ids = jnp.zeros((b, k), jnp.int32)

    def body(carry, c_idx):
        best_v, best_i = carry
        ids = c_idx * chunk + jnp.arange(chunk, dtype=jnp.int32)
        valid = ids < item_nums
        scores = score_chunk_fn(jnp.minimum(ids, item_nums - 1))
        scores = jnp.where(valid[None, :], scores, -jnp.inf)
        cids = jnp.broadcast_to(ids[None, :], scores.shape)
        if approx and chunk > k:
            scores, sel = jax.lax.approx_max_k(scores, k)
            cids = jnp.take_along_axis(cids, sel, axis=1)
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
        v, i = jax.lax.top_k(scores_shard, min(k, shard_i))
        offset = jax.lax.axis_index(axis) * shard_i
        i = i + offset
        v_all = jax.lax.all_gather(v, axis, axis=1, tiled=True)
        i_all = jax.lax.all_gather(i, axis, axis=1, tiled=True)
        return merge_topk(v_all, i_all, k)

    # check_vma off: the post-all_gather merge is replicated by
    # construction, which the static checker cannot infer.
    return jax.shard_map(local, mesh=mesh, in_specs=P(None, axis),
                         out_specs=(P(), P()), check_vma=False)(scores)
