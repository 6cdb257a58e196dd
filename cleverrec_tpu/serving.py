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

from cleverrec_tpu import ranking

# Catalogs above this use the streaming backend by default: the dense
# AND fused paths materialize [B, I_pad] scores per call — at 131072
# items a 4096-user call holds a 2.1GB score matrix, comfortably within
# HBM; the fused kernel measured 1.57x the exact stream there
# (CATALOG_SCALE.jsonl serve_fused vs serve_stream).  Past-budget bigger
# catalogs can still pass backend="fused" explicitly when their batch
# size keeps B * I_pad * 4 in memory.
_STREAM_THRESHOLD = 131072


def _pick_backend(model, device_data, filter_seen: bool,
                  mesh=None) -> str:
    if mesh is not None:
        # Item-table shardings only stay resident if the scoring path
        # is sharded too (mirrors the Evaluator's mesh routing).
        return "sharded"
    decomposable = hasattr(model, "dot_decomposition")
    if (decomposable and jax.default_backend() == "tpu"
            and model.meta.item_nums <= _STREAM_THRESHOLD):
        # Past the global bitmap budget the fused path builds the
        # batch's bitmaps on device (rows_to_bits) per call.
        return "fused"
    if model.meta.item_nums > _STREAM_THRESHOLD:
        return "stream"
    return "dense"


def build_retrieval_fn(model, params, arrays, device_data, k: int = 10,
                       filter_seen: bool = True, backend: str = "auto",
                       mesh=None, stream_chunk: int | None = None,
                       approx: bool = False):
    """Compiled user -> top-k retrieval.

    Returns retrieve(user_ids [B]) -> (items [B, k], scores [B, k]);
    batch size is fixed at first call per shape (standard jit caching).
    Filtered-out / past-catalog slots come back as item id -1 with
    -inf score.  ``backend``: auto | dense | fused | stream | sharded.
    ``approx`` (stream backend): ScaNN-style approx_max_k chunk
    selection — TPU PartialReduce instead of the full sort that
    dominates exact streaming at large catalogs (~0.95 recall of the
    true top-k; ops/topk.streaming_topk).  (fused backend): bf16
    rescue-slab copy — candidate scores round to bf16 (~90% top-20 id
    agreement), halving the group-pruned path's slab gather; the
    measured end-to-end gain is small (319k items: ~4% at probe level,
    a wash at the serving harness, which is bitmap-build-bound), so
    exact is the right default.

    Score-value contract: rankings agree across backends, but the
    fused and stream backends score dot-DECOMPOSED logits — monotone
    transforms of the dense backend's model scores (GMF's sigmoid is
    dropped; cml_like models drop the per-user ||u||^2 offset).
    Compare scores across backends only for plain dot models.
    """
    item_nums = model.meta.item_nums
    if stream_chunk is None:
        # Wider chunks amortize the per-chunk top-k merge at very large
        # catalogs (the grouped_topk chunk reduce makes them cheap).
        stream_chunk = 16384 if item_nums > 262_144 else 4096
    if backend == "auto":
        backend = _pick_backend(model, device_data, filter_seen, mesh)
    if backend == "sharded" and mesh is None:
        raise ValueError("backend='sharded' needs a mesh")
    if backend == "fused" and not hasattr(model, "dot_decomposition"):
        raise ValueError(f"{model.name}: no dot decomposition — "
                         "fused retrieval unavailable")
    # Past the global bitmap budget (seen.bits is None) the batch's
    # bitmaps are built ON DEVICE from its sorted rows per call
    # (sampling.rows_to_bits) — both the fused kernel and the stream's
    # bitmap-sliced masking keep working at any catalog size.
    device_bits = (filter_seen and device_data.seen.bits is None
                   and backend in ("fused", "stream")
                   and (backend == "fused" or stream_chunk % 32 == 0))

    # Everything device-resident (params, aux, seen tables) is threaded
    # through the jitted function's ARGUMENTS, never closure-captured: a
    # captured array is embedded as an HLO constant — a 636MB bitmap
    # once blew the remote compiler's request limit (HTTP 413), and the
    # embedded copy doubles HBM besides.
    use_bits = not device_bits and (
        (backend == "fused" and filter_seen) or (
            backend == "stream" and filter_seen
            and device_data.seen.bits is not None
            and stream_chunk % 32 == 0))
    if use_bits:
        seen_tbl = jnp.asarray(device_data.seen.bits)
    elif (device_bits
          or (backend in ("dense", "stream", "sharded") and filter_seen)):
        # Only uploaded when the masking path actually reads it.
        seen_tbl = jnp.asarray(device_data.seen.rows)
    else:
        seen_tbl = jnp.zeros((1, 1), jnp.int32)

    def pad_ids(v, items):
        return jnp.where(jnp.isfinite(v), items, -1), v

    def rows_of(tbl, u):
        if backend in ("dense", "stream", "sharded") and filter_seen \
                and not use_bits and not device_bits:
            return tbl[u]
        return jnp.zeros((u.shape[0], 1), jnp.int32)

    def bits_of(tbl, u):
        """Per-call packed bitmaps: gathered rows of the global bitmap,
        or device-built from the batch's sorted rows past the budget."""
        if device_bits:
            from cleverrec_tpu.sampling import rows_to_bits
            return rows_to_bits(tbl[u], item_nums)
        return tbl[u]

    if backend == "dense":
        def impl(params, arrays, tbl, u):
            v, items = ranking.rank_dense(model, params, arrays, u,
                                          rows_of(tbl, u), k, filter_seen)
            return pad_ids(v, items)

    elif backend == "fused":
        interpret = jax.default_backend() != "tpu"

        def impl(params, arrays, tbl, u, pre):
            if filter_seen:
                bits = bits_of(tbl, u)
            else:
                # One zero row indexed for every user — NOT a [U, W]
                # zero table (that once planned a multi-GB dead
                # allocation).
                zero = jnp.zeros((1, (item_nums + 31) // 32), jnp.uint32)
                bits = zero[jnp.zeros_like(u)]
            v, items = ranking.rank_fused(model, params, arrays, u,
                                          bits, k, interpret=interpret,
                                          pre=pre)
            return pad_ids(v, items)

    elif backend == "stream":
        def impl(params, arrays, tbl, u):
            v, items = ranking.rank_stream(
                model, params, arrays, u, rows_of(tbl, u), item_nums, k,
                chunk=stream_chunk, filter_seen=filter_seen,
                seen_bits=(bits_of(tbl, u)
                           if use_bits or device_bits else None),
                approx=approx)
            return pad_ids(v, items)

    elif backend == "sharded":
        def impl(params, arrays, tbl, u):
            v, items = ranking.rank_sharded(model, params, arrays, u,
                                            rows_of(tbl, u), k, mesh,
                                            filter_seen)
            return pad_ids(v, items)

    else:
        raise ValueError(f"unknown retrieval backend {backend!r}")

    # Commit to device ONCE: host-numpy leaves passed as jit args would
    # re-transfer on every call.
    params = jax.tree_util.tree_map(jnp.asarray, params)
    arrays = jax.tree_util.tree_map(jnp.asarray, arrays)
    jitted = jax.jit(impl)

    if backend == "fused":
        # Batch-independent half of the fused path (the kernel-order
        # table permutation + original-order rescue copy): once per
        # retrieval fn, not per call.
        pre = ranking.fused_precompute(model, params, arrays,
                                       rescue_bf16=approx)

        def retrieve(u):
            return jitted(params, arrays, seen_tbl, u, pre)
    else:
        def retrieve(u):
            return jitted(params, arrays, seen_tbl, u)

    return retrieve


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
