"""Serving: compiled top-K retrieval/re-ranking + portable export.

The reference has no serving story (training scripts only).  For
production deployment this module turns a trained model into:

- ``build_retrieval_fn``: a jitted ``retrieve(user_ids) -> (items,
  scores)`` closure over frozen params/aux with on-device seen-item
  filtering — the online-serving hot path.  Backends mirror the
  Evaluator's rankers (evalx.py): ``dense`` [B, I] scoring, ``fused``
  (Pallas score+bitmap-mask kernel for dot-decomposable models),
  ``stream`` (lax.scan over item chunks with a carried running top-K —
  O(B*chunk) memory for huge catalogs), and ``sharded`` (item-axis
  mesh sharding with per-shard top-K + all_gather merge).
- ``build_rerank_fn``: jitted ``rerank(user_ids, candidate_ids) ->
  (items, scores)`` over an externally retrieved candidate set — the
  second-stage scorer of a retrieve->rerank stack.
- ``export_retrieval`` / ``export_rerank`` / ``load_serialized``:
  serialized StableHLO artifacts (jax.export) that a serving binary
  can execute without the Python model code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Catalogs above this use the streaming backend by default: the dense
# path materializes [B, I] scores + a [B, I+1] bool mask per call.
_STREAM_THRESHOLD = 32768


def _pick_backend(model, device_data, filter_seen: bool) -> str:
    decomposable = hasattr(model, "dot_decomposition")
    if (decomposable and jax.default_backend() == "tpu"
            and (not filter_seen or device_data.seen.bits is not None)):
        return "fused"
    if model.meta.item_nums > _STREAM_THRESHOLD:
        return "stream"
    return "dense"


def build_retrieval_fn(model, params, arrays, device_data, k: int = 10,
                       filter_seen: bool = True, backend: str = "auto",
                       mesh=None, stream_chunk: int = 4096):
    """Compiled user -> top-k retrieval.

    Returns retrieve(user_ids [B]) -> (items [B, k], scores [B, k]);
    batch size is fixed at first call per shape (standard jit caching).
    Filtered-out / past-catalog slots come back as item id -1 with
    -inf score.  ``backend``: auto | dense | fused | stream | sharded.
    """
    item_nums = model.meta.item_nums
    cml = model.cml_like
    if backend == "auto":
        backend = _pick_backend(model, device_data, filter_seen)
    if backend == "sharded" and mesh is None:
        raise ValueError("backend='sharded' needs a mesh")
    if backend == "fused" and not hasattr(model, "dot_decomposition"):
        raise ValueError(f"{model.name}: no dot decomposition — "
                         "fused retrieval unavailable")

    seen_rows = jnp.asarray(device_data.seen.rows)

    def dense_scores(u):
        scores = model.score_all(params, u, arrays)
        if cml:
            scores = -scores
        if filter_seen:
            rows = seen_rows[u]
            b = u.shape[0]
            mask = jnp.zeros((b, item_nums + 1), dtype=bool)
            mask = mask.at[jnp.arange(b)[:, None], rows].set(True)
            scores = jnp.where(mask[:, :item_nums], -jnp.inf, scores)
        return scores

    if backend == "dense":
        def retrieve(u):
            v, items = jax.lax.top_k(dense_scores(u), k)
            return jnp.where(jnp.isfinite(v), items, -1), v

    elif backend == "fused":
        from cleverrec_tpu.ops.pallas_scores import fused_dot_topk_scores
        if filter_seen:
            bits_all = jnp.asarray(device_data.seen.bits)
        else:
            bits_all = jnp.zeros(
                (model.meta.user_nums, (item_nums + 31) // 32), jnp.uint32)
        interpret = jax.default_backend() != "tpu"

        def retrieve(u):
            u_vecs, table, bias = model.dot_decomposition(params, u, arrays)
            if cml:
                u_vecs = -u_vecs
                bias = None if bias is None else -bias
            scores, item_map = fused_dot_topk_scores(
                u_vecs, table, bits_all[u], interpret=interpret)
            if bias is not None:
                scores = scores + jnp.pad(
                    bias, (0, item_map.shape[0] - bias.shape[0])
                )[item_map][None, :]
            v, idx = jax.lax.top_k(scores, k)
            # Kernel masks with a finite -3e38 sentinel.
            return jnp.where(v > -1e37, item_map[idx], -1), v

    elif backend == "stream":
        from cleverrec_tpu.ops.topk import streaming_topk

        def retrieve(u):
            rows = seen_rows[u]

            def score_chunk(chunk_ids):
                cand = jnp.broadcast_to(chunk_ids[None, :],
                                        (u.shape[0], chunk_ids.shape[0]))
                s = model.score_candidates(params, u, cand, arrays)
                if cml:
                    s = -s
                if filter_seen:
                    idx = jax.vmap(jnp.searchsorted)(rows, cand)
                    idx_c = jnp.minimum(idx, rows.shape[1] - 1)
                    hit = jnp.take_along_axis(rows, idx_c, axis=1) == cand
                    s = jnp.where(hit, -jnp.inf, s)
                return s

            v, items = streaming_topk(score_chunk, item_nums, k,
                                      chunk=stream_chunk)
            return jnp.where(jnp.isfinite(v), items, -1), v

    elif backend == "sharded":
        from jax.sharding import NamedSharding, PartitionSpec as P
        from cleverrec_tpu.ops.topk import sharded_topk_scores
        n_shards = mesh.shape["model"]

        def retrieve(u):
            scores = dense_scores(u)
            pad = (-scores.shape[1]) % n_shards
            if pad:
                scores = jnp.pad(scores, ((0, 0), (0, pad)),
                                 constant_values=-jnp.inf)
            scores = jax.lax.with_sharding_constraint(
                scores, NamedSharding(mesh, P(None, "model")))
            v, items = sharded_topk_scores(scores, k, mesh)
            return jnp.where(jnp.isfinite(v), items, -1), v

    else:
        raise ValueError(f"unknown retrieval backend {backend!r}")

    return jax.jit(retrieve)


def build_rerank_fn(model, params, arrays, k: int = 10):
    """Compiled second-stage scorer: rerank(user_ids [B], cand [B, C])
    -> (items [B, k], scores [B, k]), the top-k of each user's provided
    candidate list (no seen filtering — the retriever already did it).
    Negative candidate ids are treated as padding and never surface."""

    @jax.jit
    def rerank(u, cand):
        valid = cand >= 0
        scores = model.score_candidates(params, u,
                                        jnp.where(valid, cand, 0), arrays)
        if model.cml_like:
            scores = -scores
        scores = jnp.where(valid, scores, -jnp.inf)
        kk = min(k, cand.shape[1])
        v, idx = jax.lax.top_k(scores, kk)
        items = jnp.take_along_axis(cand, idx, axis=1)
        return jnp.where(jnp.isfinite(v), items, -1), v

    return rerank


def export_retrieval(model, params, arrays, device_data, batch: int,
                     k: int = 10, filter_seen: bool = True,
                     backend: str = "auto") -> bytes:
    """Serialize the retrieval function to a portable StableHLO artifact.

    Note: the ``fused`` backend lowers to a TPU Mosaic custom call — a
    fused-backend artifact only runs on TPU serving binaries; ``dense``
    and ``stream`` artifacts are platform-portable."""
    from jax import export as jexport

    fn = build_retrieval_fn(model, params, arrays, device_data, k,
                            filter_seen, backend=backend)
    spec = jax.ShapeDtypeStruct((batch,), jnp.int32)
    exported = jexport.export(jax.jit(lambda u: fn(u)))(spec)
    return exported.serialize()


def export_rerank(model, params, arrays, batch: int, n_cand: int,
                  k: int = 10) -> bytes:
    """Serialize the rerank function for [batch, n_cand] candidate sets."""
    from jax import export as jexport

    fn = build_rerank_fn(model, params, arrays, k)
    u_spec = jax.ShapeDtypeStruct((batch,), jnp.int32)
    c_spec = jax.ShapeDtypeStruct((batch, n_cand), jnp.int32)
    exported = jexport.export(jax.jit(lambda u, c: fn(u, c)))(u_spec, c_spec)
    return exported.serialize()


def load_serialized(blob: bytes):
    """Deserialize an exported serving artifact; returns a callable."""
    from jax import export as jexport

    exported = jexport.deserialize(blob)
    return lambda *args: exported.call(*args)


# Back-compat alias (round-1 name).
load_retrieval = load_serialized


def export_bundle(model, params, arrays, device_data, out_dir: str,
                  batch: int = 256, n_cand: int = 128, k: int = 10,
                  filter_seen: bool = True, backend: str = "auto") -> dict:
    """Write a serving bundle: retrieval + rerank artifacts + meta.json.

    Returns the manifest dict.  Artifacts are raw serialized jax.export
    blobs; meta.json records shapes/backend so the serving side can load
    without guessing."""
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    resolved = (backend if backend != "auto"
                else _pick_backend(model, device_data, filter_seen))
    paths = {"retrieval": "retrieval.jaxexport",
             "rerank": "rerank.jaxexport"}
    with open(os.path.join(out_dir, paths["retrieval"]), "wb") as f:
        f.write(export_retrieval(model, params, arrays, device_data,
                                 batch, k, filter_seen, backend=resolved))
    with open(os.path.join(out_dir, paths["rerank"]), "wb") as f:
        f.write(export_rerank(model, params, arrays, batch, n_cand, k))
    manifest = {
        "model": model.name, "k": k, "batch": batch, "n_cand": n_cand,
        "backend": resolved, "filter_seen": filter_seen,
        "user_nums": int(model.meta.user_nums),
        "item_nums": int(model.meta.item_nums),
        "tpu_only": resolved == "fused",
        "artifacts": paths,
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest
