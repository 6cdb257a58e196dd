"""Serving: compiled top-K retrieval functions + portable export.

The reference has no serving story (training scripts only).  For
production deployment this module turns a trained model into:

- ``build_retrieval_fn``: a jitted ``retrieve(user_ids) -> (items,
  scores)`` closure over frozen params/aux with on-device seen-item
  filtering — the online-serving hot path,
- ``export_retrieval`` / ``load_retrieval``: a serialized StableHLO
  artifact (jax.export) that can be shipped to and executed by a serving
  binary without the Python model code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def build_retrieval_fn(model, params, arrays, device_data, k: int = 10,
                       filter_seen: bool = True):
    """Compiled user -> top-k retrieval.

    Returns retrieve(user_ids [B]) -> (items [B, k], scores [B, k]);
    batch size is fixed at first call per shape (standard jit caching).
    """
    item_nums = model.meta.item_nums
    seen_rows = jnp.asarray(device_data.seen.rows)

    @jax.jit
    def retrieve(u):
        scores = model.score_all(params, u, arrays)
        if model.cml_like:
            scores = -scores
        if filter_seen:
            rows = seen_rows[u]
            b = u.shape[0]
            mask = jnp.zeros((b, item_nums + 1), dtype=bool)
            mask = mask.at[jnp.arange(b)[:, None], rows].set(True)
            scores = jnp.where(mask[:, :item_nums], -jnp.inf, scores)
        top_scores, items = jax.lax.top_k(scores, k)
        return items, top_scores

    return retrieve


def export_retrieval(model, params, arrays, device_data, batch: int,
                     k: int = 10, filter_seen: bool = True) -> bytes:
    """Serialize the retrieval function to a portable StableHLO artifact."""
    from jax import export as jexport

    fn = build_retrieval_fn(model, params, arrays, device_data, k,
                            filter_seen)
    spec = jax.ShapeDtypeStruct((batch,), jnp.int32)
    exported = jexport.export(jax.jit(lambda u: fn(u)))(spec)
    return exported.serialize()


def load_retrieval(blob: bytes):
    """Deserialize an exported retrieval artifact; returns a callable."""
    from jax import export as jexport

    exported = jexport.deserialize(blob)
    return lambda u: exported.call(u)
