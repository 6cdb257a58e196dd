"""Serving: retrieval closure + export/load round trip."""

import numpy as np
import jax.numpy as jnp

from cleverrec_tpu.data import load_ranking_data
from cleverrec_tpu.models import make_model
from cleverrec_tpu.models.base import DataMeta
from cleverrec_tpu.serving import (build_retrieval_fn, export_retrieval,
                                   load_retrieval)
from cleverrec_tpu.train import Trainer
from tests.conftest import base_config


def _trained(toy):
    cfg = base_config(toy, **{"data.split_way": "rs", "test.neg_samples": "0",
                              "epoches": "1", "batch_size": "64",
                              "embed_size": "8", "lr": "0.05",
                              "is_pairwise": "True", "loss_func": "bpr",
                              "reg": "0.01"})
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    tr = Trainer(model, data, cfg)
    params, opt = tr.init_state()
    params, _, _ = tr.train_epoch(params, opt)
    return model, params, tr


def test_retrieval_filters_seen(toy_dataset):
    model, params, tr = _trained(toy_dataset)
    fn = build_retrieval_fn(model, params, tr.arrays, tr.dd, k=5)
    u = jnp.asarray([0, 1, 2, 3], dtype=jnp.int32)
    items, scores = fn(u)
    assert items.shape == (4, 5) and scores.shape == (4, 5)
    for r, uu in enumerate(np.asarray(u)):
        seen = set(tr.data.ui_train.get(int(uu), []))
        assert not (set(np.asarray(items[r]).tolist()) & seen)
    # Scores descending.
    s = np.asarray(scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()


def test_export_round_trip(toy_dataset):
    model, params, tr = _trained(toy_dataset)
    fn = build_retrieval_fn(model, params, tr.arrays, tr.dd, k=5)
    u = jnp.asarray([0, 1, 2, 3], dtype=jnp.int32)
    want_items, want_scores = fn(u)
    blob = export_retrieval(model, params, tr.arrays, tr.dd, batch=4, k=5)
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 0
    served = load_retrieval(bytes(blob))
    got_items, got_scores = served(u)
    np.testing.assert_array_equal(np.asarray(got_items),
                                  np.asarray(want_items))
    np.testing.assert_allclose(np.asarray(got_scores),
                               np.asarray(want_scores), rtol=1e-6)


def test_backend_equivalence_dense_stream_fused(toy_dataset):
    """All retrieval backends rank identically (stream via chunked
    searchsorted masking, fused via the interpret-mode Pallas kernel)."""
    from cleverrec_tpu.serving import _pick_backend
    model, params, tr = _trained(toy_dataset)
    u = jnp.asarray(np.arange(8), dtype=jnp.int32)
    base_items, base_scores = build_retrieval_fn(
        model, params, tr.arrays, tr.dd, k=5, backend="dense")(u)
    # stream_chunk 7: sorted-rows searchsorted masking; 32: the
    # chunk-sliced bitmap masking path (incl. tail-word padding).
    for backend, kw in (("stream", {"stream_chunk": 7}),
                        ("stream", {"stream_chunk": 32}), ("fused", {})):
        items, scores = build_retrieval_fn(
            model, params, tr.arrays, tr.dd, k=5, backend=backend, **kw)(u)
        np.testing.assert_array_equal(np.asarray(items),
                                      np.asarray(base_items), err_msg=backend)
        np.testing.assert_allclose(np.asarray(scores),
                                   np.asarray(base_scores), rtol=1e-5,
                                   atol=1e-6, err_msg=backend)
    # Auto never picks fused off-TPU.
    assert _pick_backend(model, tr.dd, True) in ("dense", "stream")


def test_backend_device_bitmaps_past_budget(toy_dataset):
    """With the global bitmap stripped (past-budget catalogs), stream and
    fused retrieval build per-call bitmaps on device from sorted rows and
    still rank identically to dense."""
    import dataclasses
    model, params, tr = _trained(toy_dataset)
    u = jnp.asarray(np.arange(8), dtype=jnp.int32)
    base_items, base_scores = build_retrieval_fn(
        model, params, tr.arrays, tr.dd, k=5, backend="dense")(u)
    dd_nobits = dataclasses.replace(
        tr.dd, seen=tr.dd.seen._replace(bits=None, complement=None))
    for backend, kw in (("stream", {"stream_chunk": 32}), ("fused", {})):
        items, scores = build_retrieval_fn(
            model, params, tr.arrays, dd_nobits, k=5, backend=backend,
            **kw)(u)
        np.testing.assert_array_equal(np.asarray(items),
                                      np.asarray(base_items),
                                      err_msg=backend)
        np.testing.assert_allclose(np.asarray(scores),
                                   np.asarray(base_scores), rtol=1e-5,
                                   atol=1e-6, err_msg=backend)


def test_sharded_backend_under_mesh(toy_dataset):
    from cleverrec_tpu.parallel.mesh import make_mesh
    model, params, tr = _trained(toy_dataset)
    mesh = make_mesh(2, 4)
    u = jnp.asarray(np.arange(8), dtype=jnp.int32)
    base_items, base_scores = build_retrieval_fn(
        model, params, tr.arrays, tr.dd, k=5, backend="dense")(u)
    items, scores = build_retrieval_fn(
        model, params, tr.arrays, tr.dd, k=5, backend="sharded",
        mesh=mesh)(u)
    np.testing.assert_array_equal(np.asarray(items), np.asarray(base_items))
    np.testing.assert_allclose(np.asarray(scores), np.asarray(base_scores),
                               rtol=1e-5, atol=1e-6)


def test_rerank_scores_candidate_subset(toy_dataset):
    from cleverrec_tpu.serving import build_rerank_fn
    model, params, tr = _trained(toy_dataset)
    rng = np.random.default_rng(0)
    cand = rng.integers(0, tr.dd.item_nums, (4, 9)).astype(np.int32)
    cand[0, -2:] = -1                                    # padding slots
    fn = build_rerank_fn(model, params, tr.arrays, k=4)
    items, scores = fn(jnp.asarray([0, 1, 2, 3], jnp.int32),
                       jnp.asarray(cand))
    assert items.shape == (4, 4)
    s = np.asarray(scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()
    for r in range(4):
        got = [i for i in np.asarray(items[r]).tolist() if i >= 0]
        allowed = set(c for c in cand[r].tolist() if c >= 0)
        assert set(got) <= allowed
        # Top item really is the argmax over the candidate set.
        all_s = np.array(model.score_candidates(
            params, jnp.asarray([r], jnp.int32),
            jnp.asarray(np.where(cand[r] >= 0, cand[r], 0)[None, :]),
            tr.arrays))[0]
        if model.cml_like:
            all_s = -all_s
        all_s[cand[r] < 0] = -np.inf
        assert got[0] == cand[r][int(np.argmax(all_s))]


def test_export_bundle_manifest_and_rerank_roundtrip(toy_dataset, tmp_path):
    import json
    from cleverrec_tpu.serving import (build_rerank_fn, export_bundle,
                                       load_serialized)
    model, params, tr = _trained(toy_dataset)
    out = tmp_path / "bundle"
    manifest = export_bundle(model, params, tr.arrays, tr.dd, str(out),
                             batch=4, n_cand=6, k=3)
    assert (out / "meta.json").exists()
    assert json.loads((out / "meta.json").read_text()) == manifest
    assert manifest["backend"] in ("dense", "stream")
    u = jnp.asarray([0, 1, 2, 3], jnp.int32)
    cand = jnp.asarray(
        np.random.default_rng(1).integers(0, tr.dd.item_nums, (4, 6)),
        dtype=jnp.int32)
    served = load_serialized((out / manifest["artifacts"]["rerank"]).read_bytes())
    got_items, got_scores = served(u, cand)
    want_items, want_scores = build_rerank_fn(model, params, tr.arrays,
                                              k=3)(u, cand)
    np.testing.assert_array_equal(np.asarray(got_items),
                                  np.asarray(want_items))
    np.testing.assert_allclose(np.asarray(got_scores),
                               np.asarray(want_scores), rtol=1e-6)


def test_cml_retrieval_orders_by_ascending_distance(toy_dataset):
    """cml_like models retrieve by SMALLEST distance; backends agree."""
    cfg = base_config(toy_dataset, **{
        "data.split_way": "rs", "test.neg_samples": "0",
        "recommender": "CML", "epoches": "1", "batch_size": "64",
        "embed_size": "8", "lr": "0.05", "is_pairwise": "True",
        "loss_func": "hinge", "margin": "1.0", "reg": "0.1",
        "neg_ratio": "2"})
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    assert model.cml_like
    tr = Trainer(model, data, cfg)
    params, opt = tr.init_state()
    params, _, _ = tr.train_epoch(params, opt)
    u = jnp.asarray(np.arange(6), dtype=jnp.int32)
    items, scores = build_retrieval_fn(model, params, tr.arrays, tr.dd,
                                       k=5, backend="dense")(u)
    # Top-1 is the argmin distance over UNSEEN items.
    P, Q = np.asarray(params["P"]), np.asarray(params["Q"])
    for r in range(6):
        dist = ((P[r][None, :] - Q) ** 2).sum(axis=1)
        dist[list(tr.data.ui_train.get(r, []))] = np.inf
        assert int(items[r, 0]) == int(np.argmin(dist))
    s_items, s_scores = build_retrieval_fn(model, params, tr.arrays, tr.dd,
                                           k=5, backend="stream",
                                           stream_chunk=8)(u)
    np.testing.assert_array_equal(np.asarray(s_items), np.asarray(items))


def test_pick_backend_mesh_and_thresholds(toy_dataset):
    from cleverrec_tpu.parallel.mesh import make_mesh
    from cleverrec_tpu.serving import _pick_backend
    model, params, tr = _trained(toy_dataset)
    # mesh always routes to sharded (mirrors the Evaluator)
    assert _pick_backend(model, tr.dd, True, make_mesh(2, 4)) == "sharded"
    # off-TPU: dense for small catalogs
    assert _pick_backend(model, tr.dd, True) in ("dense", "stream")


def test_stream_approx_retrieval_ranks(toy_dataset):
    """approx=True (TPU approx_max_k chunk selection) returns a valid
    ranking; on the CPU backend approx_max_k reduces exactly, so it
    must equal the exact stream backend here."""
    model, params, tr = _trained(toy_dataset)
    u = jnp.asarray(np.arange(8), dtype=jnp.int32)
    exact_i, exact_v = build_retrieval_fn(
        model, params, tr.arrays, tr.dd, k=5, backend="stream",
        stream_chunk=32)(u)
    approx_i, approx_v = build_retrieval_fn(
        model, params, tr.arrays, tr.dd, k=5, backend="stream",
        stream_chunk=32, approx=True)(u)
    np.testing.assert_array_equal(np.asarray(approx_i),
                                  np.asarray(exact_i))
    np.testing.assert_allclose(np.asarray(approx_v),
                               np.asarray(exact_v), rtol=1e-6)


def test_fused_approx_backend_narrow_catalog_exact(toy_dataset):
    """approx=True on the FUSED backend builds a bf16 rescue copy
    (fused_precompute(rescue_bf16=True)); narrow catalogs never touch
    it (they rank the full score row), so the ranking must equal the
    exact fused backend bit-for-bit — this guards the plumbing, the
    wide-branch bf16 behavior is pinned in tests/test_ops.py."""
    model, params, tr = _trained(toy_dataset)
    u = jnp.asarray(np.arange(8), dtype=jnp.int32)
    exact_i, exact_v = build_retrieval_fn(
        model, params, tr.arrays, tr.dd, k=5, backend="fused")(u)
    approx_i, approx_v = build_retrieval_fn(
        model, params, tr.arrays, tr.dd, k=5, backend="fused",
        approx=True)(u)
    np.testing.assert_array_equal(np.asarray(approx_i),
                                  np.asarray(exact_i))
    np.testing.assert_array_equal(np.asarray(approx_v),
                                  np.asarray(exact_v))
