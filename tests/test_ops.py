"""Top-K retrieval ops + the Pallas fused scoring kernel (interpret mode
on CPU; the same kernel compiles natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cleverrec_tpu.ops import (fused_dot_scores, fused_dot_topk_scores,
                               merge_topk, sharded_topk_scores,
                               streaming_topk)


def test_merge_topk():
    v = jnp.asarray([[1.0, 5.0, 3.0, 2.0]])
    i = jnp.asarray([[10, 11, 12, 13]], dtype=jnp.int32)
    mv, mi = merge_topk(v, i, 2)
    assert mv.tolist() == [[5.0, 3.0]]
    assert mi.tolist() == [[11, 12]]


def test_streaming_topk_matches_dense():
    rng = np.random.default_rng(0)
    b, item_nums, k = 8, 1000, 12
    scores = jnp.asarray(rng.normal(size=(b, item_nums)).astype(np.float32))

    def chunk_fn(ids):
        return scores[:, ids]

    v, i = streaming_topk(chunk_fn, item_nums, k, chunk=128)
    dv, di = jax.lax.top_k(scores, k)
    np.testing.assert_allclose(np.asarray(v), np.asarray(dv), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(di))


def test_sharded_topk_matches_dense():
    from cleverrec_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(1, 8)
    rng = np.random.default_rng(1)
    scores = jnp.asarray(rng.normal(size=(4, 1024)).astype(np.float32))
    v, i = sharded_topk_scores(scores, 10, mesh)
    dv, di = jax.lax.top_k(scores, 10)
    np.testing.assert_allclose(np.asarray(v), np.asarray(dv), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(di))


def test_fused_dot_kernel_matches_reference():
    rng = np.random.default_rng(2)
    b, i, d = 16, 200, 32
    u = rng.normal(size=(b, d)).astype(np.float32)
    q = rng.normal(size=(i, d)).astype(np.float32)
    # Random seen sets -> packed bitmaps.
    words = -(-i // 32)
    bits = np.zeros((b, words), np.uint32)
    seen = np.zeros((b, i), bool)
    for r in range(b):
        s = rng.choice(i, size=20, replace=False)
        seen[r, s] = True
        np.bitwise_or.at(bits[r], s >> 5, np.uint32(1) << (s & 31))

    got_perm, gmax, item_map = fused_dot_topk_scores(
        jnp.asarray(u), jnp.asarray(q), jnp.asarray(bits), block_b=8,
        interpret=True)
    # Undo the kernel's column permutation, drop padded columns.
    imap = np.asarray(item_map)
    got = np.empty((b, imap.shape[0]), np.float32)
    got[:, imap] = np.asarray(got_perm)
    got = got[:, :i]
    want = u @ q.T
    want[seen] = -3.0e38
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # The free in-kernel group maxes: lane 128t + j (j < 32) == the max
    # of the PERMUTED 128-column group; pad lanes carry the sentinel.
    gm = np.asarray(gmax)
    g3 = np.asarray(got_perm).reshape(b, -1, 128).max(axis=2)
    np.testing.assert_allclose(gm[:, :32], g3[:, :32].reshape(b, -1),
                               rtol=1e-6)
    assert (gm[:, 32:] == -3.0e38).all()


def test_fused_dot_scores_matches_gmax_variant():
    """The scores-only kernel (narrow-catalog eval path, no gmax
    epilogue) returns the same masked scores and item_map as the
    gmax-emitting kernel, with and without bias."""
    rng = np.random.default_rng(12)
    b, i, d = 8, 4096 + 300, 16
    u = rng.normal(size=(b, d)).astype(np.float32)
    q = rng.normal(size=(i, d)).astype(np.float32)
    bias = rng.normal(size=(i,)).astype(np.float32)
    words = -(-i // 32)
    bits = np.zeros((b, words), np.uint32)
    for r in range(b):
        s = rng.choice(i, size=30, replace=False)
        np.bitwise_or.at(bits[r], s >> 5, np.uint32(1) << (s & 31))
    for bs in (None, jnp.asarray(bias)):
        want, _, want_map = fused_dot_topk_scores(
            jnp.asarray(u), jnp.asarray(q), jnp.asarray(bits), block_b=8,
            interpret=True, bias=bs)
        got, got_map = fused_dot_scores(
            jnp.asarray(u), jnp.asarray(q), jnp.asarray(bits), block_b=8,
            interpret=True, bias=bs)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        np.testing.assert_array_equal(np.asarray(got_map),
                                      np.asarray(want_map))


def test_fused_dot_scores_pre_permuted():
    """pre_permuted + item_nums contract of the scores-only kernel
    (the multi-batch eval path in ranking.rank_fused)."""
    from cleverrec_tpu.ops.pallas_scores import permute_item_table
    rng = np.random.default_rng(13)
    b, i, d = 4, 500, 8
    u = rng.normal(size=(b, d)).astype(np.float32)
    q = rng.normal(size=(i, d)).astype(np.float32)
    bits = np.zeros((b, -(-i // 32)), np.uint32)
    q_perm, item_map = permute_item_table(jnp.asarray(q))
    got, _ = fused_dot_scores(jnp.asarray(u), q_perm, jnp.asarray(bits),
                              block_b=4, interpret=True,
                              pre_permuted=True, item_nums=i)
    want, _ = fused_dot_scores(jnp.asarray(u), jnp.asarray(q),
                               jnp.asarray(bits), block_b=4,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_kernel_bias_and_group_max():
    """In-kernel bias addition (before masking) and per-128-column
    group maxes across multiple item tiles."""
    rng = np.random.default_rng(9)
    b, i, d = 8, 2 * 4096 + 100, 16     # 3 tiles after padding
    u = rng.normal(size=(b, d)).astype(np.float32)
    q = rng.normal(size=(i, d)).astype(np.float32)
    bias = rng.normal(size=(i,)).astype(np.float32)
    words = -(-i // 32)
    bits = np.zeros((b, words), np.uint32)
    seen = np.zeros((b, i), bool)
    for r in range(b):
        s = rng.choice(i, size=40, replace=False)
        seen[r, s] = True
        np.bitwise_or.at(bits[r], s >> 5, np.uint32(1) << (s & 31))
    got_perm, gmax, item_map = fused_dot_topk_scores(
        jnp.asarray(u), jnp.asarray(q), jnp.asarray(bits), block_b=8,
        interpret=True, bias=jnp.asarray(bias))
    imap = np.asarray(item_map)
    got = np.empty((b, imap.shape[0]), np.float32)
    got[:, imap] = np.asarray(got_perm)
    want = u @ q.T + bias[None, :]
    want[seen] = -3.0e38
    np.testing.assert_allclose(got[:, :i], want, rtol=2e-5, atol=2e-5)
    # gmax lane layout per tile t: lanes [128t, 128t+32) are the tile's
    # 32 group maxes; lanes [128t+32, 128(t+1)) are the NEG sentinel.
    gm = np.asarray(gmax).reshape(b, -1, 128)
    g3 = np.asarray(got_perm).reshape(b, -1, 32, 128).max(axis=3)
    np.testing.assert_allclose(gm[:, :, :32], g3, rtol=1e-6)
    assert (gm[:, :, 32:] == -3.0e38).all()


def test_rank_fused_group_pruned_path_exact():
    """The group-pruned rescue (the wide-catalog branch, n >= 8192)
    recovers exactly the dense top-k values with no seen leakage."""
    from cleverrec_tpu import ranking

    class DotModel:
        cml_like = False

        class meta:
            item_nums = 12000

        def dot_decomposition(self, params, u, aux):
            return params["P"][u], params["Q"], None

    rng = np.random.default_rng(4)
    b, i, d, k = 16, 12000, 16, 10
    params = {"P": jnp.asarray(rng.normal(size=(b, d)).astype(np.float32)),
              "Q": jnp.asarray(rng.normal(size=(i, d)).astype(np.float32))}
    words = -(-i // 32)
    bits = np.zeros((b, words), np.uint32)
    seen = np.zeros((b, i), bool)
    for r in range(b):
        s = rng.choice(i, size=500, replace=False)
        seen[r, s] = True
        np.bitwise_or.at(bits[r], s >> 5, np.uint32(1) << (s & 31))
    u = jnp.arange(b, dtype=jnp.int32)
    v, items = ranking.rank_fused(DotModel(), params, {}, u,
                                  jnp.asarray(bits), k, interpret=True)
    want = np.asarray(params["P"]) @ np.asarray(params["Q"]).T
    want[seen] = -np.inf
    wv = np.sort(want, axis=1)[:, ::-1][:, :k]
    np.testing.assert_allclose(np.asarray(v), wv, rtol=1e-5, atol=1e-5)
    got_items = np.asarray(items)
    for r in range(b):
        assert not (set(got_items[r].tolist())
                    & set(np.flatnonzero(seen[r]).tolist()))
        # Values at the returned items match the claimed values.
        np.testing.assert_allclose(want[r, got_items[r]],
                                   np.asarray(v)[r], rtol=1e-5, atol=1e-5)


def test_fused_kernel_topk_excludes_seen():
    rng = np.random.default_rng(3)
    b, i, d = 4, 96, 16
    u = rng.normal(size=(b, d)).astype(np.float32)
    q = rng.normal(size=(i, d)).astype(np.float32)
    words = -(-i // 32)
    bits = np.zeros((b, words), np.uint32)
    seen_sets = []
    for r in range(b):
        s = rng.choice(i, size=30, replace=False)
        seen_sets.append(set(int(x) for x in s))
        np.bitwise_or.at(bits[r], s >> 5, np.uint32(1) << (s & 31))
    scores, _, item_map = fused_dot_topk_scores(jnp.asarray(u),
                                                jnp.asarray(q),
                                                jnp.asarray(bits), block_b=4,
                                                interpret=True)
    _, idx = jax.lax.top_k(scores, 10)
    top = item_map[idx]
    for r in range(b):
        assert not (set(np.asarray(top[r]).tolist()) & seen_sets[r])


def test_fused_eval_matches_standard(tmp_path):
    """Full-catalog eval via the Pallas kernel == the XLA path."""
    import numpy as np
    from cleverrec_tpu.data import load_ranking_data
    from cleverrec_tpu.models import make_model
    from cleverrec_tpu.models.base import DataMeta
    from cleverrec_tpu.train import Trainer
    from tests.conftest import base_config, make_toy_interactions
    ds = tmp_path / "toy"
    ds.mkdir()
    make_toy_interactions(ds / "ratings.csv")
    ov = {"data.split_way": "rs", "test.neg_samples": "0", "epoches": "1",
          "batch_size": "64", "embed_size": "16", "lr": "0.05",
          "is_pairwise": "True", "loss_func": "bpr", "reg": "0.01"}
    toy = {"root": str(tmp_path), "name": "toy"}
    cfg_std = base_config(toy, **ov)
    cfg_fused = base_config(toy, **{**ov, "eval.fused_kernel": "True"})
    data = load_ranking_data(cfg_std)
    model = make_model(cfg_std, DataMeta(data.user_nums, data.item_nums))
    t_std = Trainer(model, data, cfg_std)
    t_fused = Trainer(model, data, cfg_fused)
    assert t_fused.evaluator._use_fused
    params, opt = t_std.init_state()
    params, opt, _ = t_std.train_epoch(params, opt)
    r_std = t_std.evaluate(params)
    r_fused = t_fused.evaluator.evaluate(params, t_std.arrays)
    for k in r_std:
        assert r_fused[k] == pytest.approx(r_std[k], abs=1e-9), k


@pytest.mark.parametrize("name,ov", [
    ("GMF", {"is_pairwise": "False", "loss_func": "cross_entropy",
             "reg": "0.01"}),
    ("WMF", {"is_pairwise": "False", "loss_func": "square", "reg": "0.001",
             "alpha": "5.0"}),
    ("LightGCN", {"is_pairwise": "True", "loss_func": "bpr",
                  "reg": "0.0001", "n_layers": "2"}),
    # cml family: distance decomposed as (-2u).q + ||q||^2 (the per-user
    # ||u||^2 term cancels in ranking).
    ("CML", {"is_pairwise": "True", "loss_func": "hinge", "margin": "0.5",
             "reg": "0.01"}),
    ("SML", {"is_pairwise": "True", "loss_func": "hinge", "reg": "0.01"}),
])
def test_fused_eval_matches_standard_other_models(tmp_path, name, ov):
    import numpy as np
    from cleverrec_tpu.data import load_ranking_data
    from cleverrec_tpu.models import make_model
    from cleverrec_tpu.models.base import DataMeta
    from cleverrec_tpu.train import Trainer
    from tests.conftest import base_config, make_toy_interactions
    ds = tmp_path / "toy"
    ds.mkdir()
    make_toy_interactions(ds / "ratings.csv")
    base = {"data.split_way": "rs", "test.neg_samples": "0", "epoches": "1",
            "batch_size": "64", "embed_size": "16", "lr": "0.05",
            "recommender": name}
    base.update(ov)
    toy = {"root": str(tmp_path), "name": "toy"}
    cfg_std = base_config(toy, **base)
    cfg_fused = base_config(toy, **{**base, "eval.fused_kernel": "True"})
    data = load_ranking_data(cfg_std)
    model = make_model(cfg_std, DataMeta(data.user_nums, data.item_nums))
    t_std = Trainer(model, data, cfg_std)
    t_fused = Trainer(model, data, cfg_fused)
    assert t_fused.evaluator._use_fused
    params, opt = t_std.init_state()
    params, opt, _ = t_std.train_epoch(params, opt)
    r_std = t_std.evaluate(params)
    r_fused = t_fused.evaluator.evaluate(params, t_std.arrays)
    for k in r_std:
        assert r_fused[k] == pytest.approx(r_std[k], abs=1e-9), (name, k)


def test_rows_to_bits_matches_host_bitmap():
    """Device-built per-batch bitmaps == the host bitmap builder rows."""
    from cleverrec_tpu.sampling import build_member_table, rows_to_bits
    rng = np.random.default_rng(0)
    n, id_range = 17, 100
    sets = {e: sorted(rng.choice(id_range, size=rng.integers(0, 20),
                                 replace=False).tolist())
            for e in range(n)}
    tbl = build_member_table(sets, n, id_range)
    got = np.asarray(rows_to_bits(jnp.asarray(tbl.rows), id_range))
    np.testing.assert_array_equal(got, np.asarray(tbl.bits))


def test_stream_eval_device_bitmaps_matches_full(tmp_path):
    """Past the global bitmap budget (seen.bits=None) the streaming
    evaluator builds each batch's bitmaps ON DEVICE from its sorted rows
    and must match the dense evaluator exactly (VERDICT round-2 task 4)."""
    import dataclasses

    from cleverrec_tpu.data import load_ranking_data
    from cleverrec_tpu.evalx import Evaluator
    from cleverrec_tpu.models import make_model
    from cleverrec_tpu.models.base import DataMeta
    from cleverrec_tpu.train import Trainer
    from tests.conftest import base_config, make_toy_interactions
    ds = tmp_path / "toy"
    ds.mkdir()
    make_toy_interactions(ds / "ratings.csv")
    toy = {"root": str(tmp_path), "name": "toy"}
    base = {"data.split_way": "rs", "test.neg_samples": "0",
            "epoches": "1", "batch_size": "64", "embed_size": "16",
            "lr": "0.05", "recommender": "BPR", "is_pairwise": "True",
            "loss_func": "bpr", "reg": "0.01",
            "eval.fused_kernel": "False"}
    cfg_full = base_config(toy, **base)
    data = load_ranking_data(cfg_full)
    model = make_model(cfg_full, DataMeta(data.user_nums, data.item_nums))
    t_full = Trainer(model, data, cfg_full)
    params, opt = t_full.init_state()
    params, opt, _ = t_full.train_epoch(params, opt)
    r_full = t_full.evaluate(params)
    # Simulate the past-budget regime: strip the global bitmap.
    dd_nobits = dataclasses.replace(
        t_full.dd, seen=t_full.dd.seen._replace(bits=None, complement=None))
    cfg_stream = base_config(toy, **{**base, "eval.stream": "True",
                                     "eval.stream_chunk": "32"})
    ev = Evaluator(model, dd_nobits, cfg_stream)
    assert ev.mode == "full_stream"
    assert ev._stream_device_bits and not ev._stream_bits
    r_stream = ev.evaluate(params, t_full.arrays)
    for k in r_full:
        assert r_stream[k] == pytest.approx(r_full[k], abs=1e-6), k


def test_streaming_eval_matches_full(tmp_path):
    """eval.stream=True (the huge-catalog path) == the dense full-catalog
    evaluator, including seen masking and cml ordering."""
    from cleverrec_tpu.data import load_ranking_data
    from cleverrec_tpu.models import make_model
    from cleverrec_tpu.models.base import DataMeta
    from cleverrec_tpu.train import Trainer
    from tests.conftest import base_config, make_toy_interactions
    ds = tmp_path / "toy"
    ds.mkdir()
    make_toy_interactions(ds / "ratings.csv")
    toy = {"root": str(tmp_path), "name": "toy"}
    for name, ov in [("BPR", {"is_pairwise": "True", "loss_func": "bpr",
                              "reg": "0.01"}),
                     ("CML", {"is_pairwise": "True", "loss_func": "hinge",
                              "margin": "0.5", "reg": "0.01"})]:
        base = {"data.split_way": "rs", "test.neg_samples": "0",
                "epoches": "1", "batch_size": "64", "embed_size": "16",
                "lr": "0.05", "recommender": name,
                "eval.fused_kernel": "False", **ov}
        cfg_full = base_config(toy, **base)
        data = load_ranking_data(cfg_full)
        model = make_model(cfg_full, DataMeta(data.user_nums,
                                              data.item_nums))
        t_full = Trainer(model, data, cfg_full)
        assert t_full.evaluator.mode == "full"
        params, opt = t_full.init_state()
        params, opt, _ = t_full.train_epoch(params, opt)
        r_full = t_full.evaluate(params)
        # chunk 16: sorted-rows binary-search masking (32 does not
        # divide it); chunk 32: the chunk-sliced bitmap masking path
        # including the tail-chunk word padding (60-item catalog).
        for chunk in ("16", "32"):
            cfg_stream = base_config(
                toy, **{**base, "eval.stream": "True",
                        "eval.stream_chunk": chunk})
            t_stream = Trainer(model, data, cfg_stream)
            assert t_stream.evaluator.mode == "full_stream"
            r_stream = t_stream.evaluator.evaluate(params, t_full.arrays)
            for k in r_full:
                assert r_stream[k] == pytest.approx(r_full[k], abs=1e-6), \
                    (name, chunk, k)


def test_recommend_topk_stream_bits(tmp_path):
    """recommend_topk through the full_stream mode, both bitmap regimes
    (host-gathered bits and device-built from rows) == the dense mode's
    lists."""
    import dataclasses

    from cleverrec_tpu.data import load_ranking_data
    from cleverrec_tpu.evalx import Evaluator
    from cleverrec_tpu.models import make_model
    from cleverrec_tpu.models.base import DataMeta
    from cleverrec_tpu.train import Trainer
    from tests.conftest import base_config, make_toy_interactions
    ds = tmp_path / "toy"
    ds.mkdir()
    make_toy_interactions(ds / "ratings.csv")
    toy = {"root": str(tmp_path), "name": "toy"}
    base = {"data.split_way": "rs", "test.neg_samples": "0",
            "epoches": "1", "batch_size": "64", "embed_size": "16",
            "lr": "0.05", "recommender": "BPR", "is_pairwise": "True",
            "loss_func": "bpr", "reg": "0.01",
            "eval.fused_kernel": "False"}
    cfg = base_config(toy, **base)
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    tr = Trainer(model, data, cfg)
    params, opt = tr.init_state()
    params, opt, _ = tr.train_epoch(params, opt)
    want = tr.evaluator.recommend_topk(params, tr.arrays)
    cfg_s = base_config(toy, **{**base, "eval.stream": "True",
                                "eval.stream_chunk": "32"})
    ev_bits = Evaluator(model, tr.dd, cfg_s)
    assert ev_bits.mode == "full_stream" and ev_bits._stream_bits
    np.testing.assert_array_equal(
        ev_bits.recommend_topk(params, tr.arrays), want)
    dd_nobits = dataclasses.replace(
        tr.dd, seen=tr.dd.seen._replace(bits=None, complement=None))
    ev_dev = Evaluator(model, dd_nobits, cfg_s)
    assert ev_dev._stream_device_bits
    np.testing.assert_array_equal(
        ev_dev.recommend_topk(params, tr.arrays), want)


def test_grouped_topk_matches_dense():
    """grouped_topk (group-max pruning) == lax.top_k exactly — values
    always, indices too when scores are tie-free."""
    from cleverrec_tpu.ops import grouped_topk
    rng = np.random.default_rng(3)
    scores = jnp.asarray(rng.normal(size=(5, 40000)).astype(np.float32))
    v, i = grouped_topk(scores, 17)
    dv, di = jax.lax.top_k(scores, 17)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(dv))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(di))


def test_grouped_topk_masked_rows():
    """-inf masked slots (and the kernels' -3e38 sentinel) survive the
    one-hot rescue as exactly -inf; a row with fewer than k unmasked
    items pads with -inf."""
    from cleverrec_tpu.ops import grouped_topk
    rng = np.random.default_rng(4)
    s = rng.normal(size=(3, 20000)).astype(np.float32)
    s[0, :] = -np.inf
    s[0, 7] = 1.0                       # one survivor
    s[1, ::2] = -np.inf                 # half masked
    s[2, :] = -3.0e38                   # all sentinel-masked
    v, i = grouped_topk(jnp.asarray(s), 9)
    dv, _ = jax.lax.top_k(jnp.where(jnp.isinf(jnp.asarray(s)),
                                    -jnp.inf, jnp.asarray(s)), 9)
    assert np.asarray(v)[0, 0] == 1.0 and np.asarray(i)[0, 0] == 7
    assert np.all(np.isneginf(np.asarray(v)[0, 1:]))
    assert np.all(np.isneginf(np.asarray(v)[2]))
    finite = np.isfinite(np.asarray(dv)[1])
    np.testing.assert_array_equal(np.asarray(v)[1][finite],
                                  np.asarray(dv)[1][finite])


def test_grouped_topk_ties_values_exact():
    """Heavily tied (quantized) scores: VALUES match lax.top_k exactly
    (tie ORDER — which equal-valued id surfaces — may differ)."""
    from cleverrec_tpu.ops import grouped_topk
    rng = np.random.default_rng(5)
    s = jnp.asarray(np.round(rng.normal(size=(4, 25000)) * 2)
                    .astype(np.float32))
    v, _ = grouped_topk(s, 15)
    dv, _ = jax.lax.top_k(s, 15)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(dv))


def test_grouped_topk_narrow_fallback():
    """Below min_cols (or when groups can't cover k) it IS lax.top_k."""
    from cleverrec_tpu.ops import grouped_topk
    rng = np.random.default_rng(6)
    s = jnp.asarray(rng.normal(size=(3, 1000)).astype(np.float32))
    v, i = grouped_topk(s, 10)
    dv, di = jax.lax.top_k(s, 10)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(dv))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(di))


def test_streaming_topk_grouped_chunks():
    """Wide chunks route through the grouped per-chunk reduce and still
    match the dense oracle."""
    rng = np.random.default_rng(7)
    b, item_nums, k = 4, 20000, 10
    scores = jnp.asarray(rng.normal(size=(b, item_nums)).astype(np.float32))

    def chunk_fn(ids):
        return scores[:, ids]

    v, i = streaming_topk(chunk_fn, item_nums, k, chunk=8192)
    dv, di = jax.lax.top_k(scores, k)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(dv))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(di))


def test_fused_eval_device_bitmaps_matches_full(tmp_path):
    """full_fused past the global bitmap budget (seen.bits=None): the
    TEST USERS' bitmaps are built on device ONCE at Evaluator init
    (training-invariant — round 4 hoisted the per-batch rows_to_bits
    out of the eval scan), and metrics match the dense evaluator
    exactly.  A zero test-bitmap budget falls back to per-batch
    building from rows."""
    import dataclasses

    from cleverrec_tpu.data import load_ranking_data
    from cleverrec_tpu.evalx import Evaluator
    from cleverrec_tpu.models import make_model
    from cleverrec_tpu.models.base import DataMeta
    from cleverrec_tpu.train import Trainer
    from tests.conftest import base_config, make_toy_interactions
    ds = tmp_path / "toy"
    ds.mkdir()
    make_toy_interactions(ds / "ratings.csv")
    toy = {"root": str(tmp_path), "name": "toy"}
    base = {"data.split_way": "rs", "test.neg_samples": "0",
            "epoches": "1", "batch_size": "64", "embed_size": "16",
            "lr": "0.05", "recommender": "BPR", "is_pairwise": "True",
            "loss_func": "bpr", "reg": "0.01"}
    cfg_full = base_config(toy, **{**base, "eval.fused_kernel": "False"})
    data = load_ranking_data(cfg_full)
    model = make_model(cfg_full, DataMeta(data.user_nums, data.item_nums))
    t_full = Trainer(model, data, cfg_full)
    params, opt = t_full.init_state()
    params, opt, _ = t_full.train_epoch(params, opt)
    r_full = t_full.evaluate(params)
    dd_nobits = dataclasses.replace(
        t_full.dd, seen=t_full.dd.seen._replace(bits=None, complement=None))
    cfg_fused = base_config(toy, **{**base, "eval.fused_kernel": "True"})
    ev = Evaluator(model, dd_nobits, cfg_fused)
    assert ev.mode == "full_fused"
    assert "bits" in ev._batches and "rows" not in ev._batches
    r_fused = ev.evaluate(params, t_full.arrays)
    for k in r_full:
        assert r_fused[k] == pytest.approx(r_full[k], abs=1e-6), k

    # Budget 0 -> the rows path with per-batch device bitmap building.
    cfg_rows = base_config(toy, **{**base, "eval.fused_kernel": "True",
                                   "eval.test_bitmap_budget_mb": "0"})
    ev_rows = Evaluator(model, dd_nobits, cfg_rows)
    assert ev_rows.mode == "full_fused"
    assert "rows" in ev_rows._batches and "bits" not in ev_rows._batches
    r_rows = ev_rows.evaluate(params, t_full.arrays)
    for k in r_full:
        assert r_rows[k] == pytest.approx(r_full[k], abs=1e-6), k


def test_rank_fused_tile_pruned_exact():
    """Multi-tile catalogs route through the tile-pruned selection
    (top-k over in-kernel tile maxes + contiguous tile rescue) and must
    match a dense masked top_k oracle exactly, bias included."""
    from cleverrec_tpu import ranking

    rng = np.random.default_rng(10)
    b, i, d, k = 4, 8 * 4096, 8, 3      # 8 tiles >= 2k -> pruned path
    params = {"U": jnp.asarray(rng.normal(size=(6, d)).astype(np.float32)),
              "Q": jnp.asarray(rng.normal(size=(i, d)).astype(np.float32)),
              "b": jnp.asarray(rng.normal(size=(i,)).astype(np.float32))}

    class Meta:
        item_nums = i

    class Stub:
        cml_like = False
        meta = Meta()

        def dot_decomposition(self, p, u, aux):
            return p["U"][u], p["Q"], p["b"]

    u = jnp.asarray([0, 2, 3, 5], jnp.int32)
    words = -(-i // 32)
    bits = np.zeros((b, words), np.uint32)
    seen = np.zeros((b, i), bool)
    for r in range(b):
        s = rng.choice(i, size=100, replace=False)
        seen[r, s] = True
        np.bitwise_or.at(bits[r], s >> 5, np.uint32(1) << (s & 31))
    model = Stub()
    v, items = ranking.rank_fused(model, params, None, u,
                                  jnp.asarray(bits), k, interpret=True)
    dense = np.asarray(params["U"])[np.asarray(u)] @ np.asarray(
        params["Q"]).T + np.asarray(params["b"])[None, :]
    dense[seen] = -np.inf
    wv, wi = jax.lax.top_k(jnp.asarray(dense), k)
    np.testing.assert_allclose(np.asarray(v), np.asarray(wv),
                               rtol=2e-5, atol=2e-5)
    # Scores are float-random: no ties, so the item sets match too.
    np.testing.assert_array_equal(np.sort(np.asarray(items), axis=1),
                                  np.sort(np.asarray(wi), axis=1))

    # The pre(computed) path must produce the identical ranking.
    pre = ranking.fused_precompute(model, params, None)
    v2, items2 = ranking.rank_fused(model, params, None, u,
                                    jnp.asarray(bits), k, interpret=True,
                                    pre=pre)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(items), np.asarray(items2))


def test_fused_dot_gmax_comb_layout():
    """The gmax-only kernel's COMB layout: output lane gid is the max
    masked score over ORIGINAL item ids [32*gid, 32*gid + 32) — i.e.
    comb group gid == packed seen-bitmap word gid (the round-5 rescue
    layout; pallas_scores._kernel_gmax_only)."""
    from cleverrec_tpu.ops.pallas_scores import (NEG, fused_dot_gmax,
                                                 permute_item_table)
    rng = np.random.default_rng(21)
    b, i, d = 8, 4096 + 700, 16          # 2 tiles after padding
    u = rng.normal(size=(b, d)).astype(np.float32)
    q = rng.normal(size=(i, d)).astype(np.float32)
    bias = rng.normal(size=(i,)).astype(np.float32)
    words = -(-i // 32)
    bits = np.zeros((b, words), np.uint32)
    seen = np.zeros((b, i), bool)
    for r in range(b):
        s = rng.choice(i, size=60, replace=False)
        seen[r, s] = True
        np.bitwise_or.at(bits[r], s >> 5, np.uint32(1) << (s & 31))
    q_perm, item_map = permute_item_table(jnp.asarray(q))
    bias_perm = jnp.pad(jnp.asarray(bias),
                        (0, item_map.shape[0] - i))[item_map]
    gmax = np.asarray(fused_dot_gmax(
        jnp.asarray(u), q_perm, jnp.asarray(bits), interpret=True,
        item_nums=i, bias_perm=bias_perm))
    dense = u @ q.T + bias[None, :]
    dense[seen] = NEG
    n = item_map.shape[0]
    dense_pad = np.full((b, n), NEG, np.float32)
    dense_pad[:, :i] = dense
    want = dense_pad.reshape(b, n // 32, 32).max(axis=2)
    np.testing.assert_allclose(gmax, want, rtol=1e-6)


def test_rank_fused_bf16_rescue_smoke():
    """fused_precompute(rescue_bf16=True) (the serving approx mode):
    returned ids are never seen, and the top-k heavily overlaps the
    exact ranking (bf16 rounds candidate scores, it does not corrupt
    the pruning)."""
    from cleverrec_tpu import ranking

    class DotModel:
        cml_like = False

        class meta:
            item_nums = 12000

        def dot_decomposition(self, params, u, aux):
            return params["P"][u], params["Q"], None

    rng = np.random.default_rng(22)
    b, i, d, k = 8, 12000, 16, 10
    params = {"P": jnp.asarray(rng.normal(size=(b, d)).astype(np.float32)),
              "Q": jnp.asarray(rng.normal(size=(i, d)).astype(np.float32))}
    words = -(-i // 32)
    bits = np.zeros((b, words), np.uint32)
    seen = np.zeros((b, i), bool)
    for r in range(b):
        s = rng.choice(i, size=400, replace=False)
        seen[r, s] = True
        np.bitwise_or.at(bits[r], s >> 5, np.uint32(1) << (s & 31))
    model = DotModel()
    u = jnp.arange(b, dtype=jnp.int32)
    pre_exact = ranking.fused_precompute(model, params, {})
    pre_bf16 = ranking.fused_precompute(model, params, {},
                                        rescue_bf16=True)
    assert pre_bf16[3].dtype == jnp.bfloat16
    v0, i0 = ranking.rank_fused(model, params, {}, u, jnp.asarray(bits),
                                k, interpret=True, pre=pre_exact)
    v1, i1 = ranking.rank_fused(model, params, {}, u, jnp.asarray(bits),
                                k, interpret=True, pre=pre_bf16)
    got = np.asarray(i1)
    for r in range(b):
        assert not (set(got[r].tolist())
                    & set(np.flatnonzero(seen[r]).tolist()))
    overlap = np.mean([len(set(np.asarray(i0)[r]) & set(got[r])) / k
                       for r in range(b)])
    assert overlap >= 0.7, overlap
    # bf16-rounded scores stay close to exact.
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                               rtol=0.02, atol=0.05)
