"""Fused Pallas epochs under a mesh (the trainer's mesh-DP tier).

Round-3 verdict item 1: a mesh must not forfeit the fused flagship path.
- A 1-device mesh runs the unmeshed fused program unchanged
  (bit-identical numerics — no shard_map wrapper at D == 1).
- A pure data-parallel mesh (D > 1, model axis 1) shards the epoch's
  step axis: each chip runs the whole-epoch kernel over steps/D steps
  against a full table replica, then parameter/moment deltas are
  AVERAGED (per-epoch local Adam).  Pinned here against a serial
  per-chunk oracle built from the same kernel.
- Row-sharded meshes (model axis > 1) still take the scan path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cleverrec_tpu.data import load_ranking_data
from cleverrec_tpu.models import make_model
from cleverrec_tpu.models.base import DataMeta
from cleverrec_tpu.parallel.mesh import make_mesh, single_device_mesh
from cleverrec_tpu.train import Trainer
from tests.conftest import base_config

BPR_OV = {"epoches": "2", "batch_size": "64", "embed_size": "16",
          "lr": "0.05", "neg_ratio": "2", "is_pairwise": "True",
          "loss_func": "bpr", "reg": "0.01",
          "train.fused_kernel": "True"}


def _trainer(toy, mesh=None, **ov):
    base = dict(BPR_OV)
    base.update(ov)
    cfg = base_config(toy, **base)
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    return Trainer(model, data, cfg, mesh=mesh)


def test_fused_eligible_under_dp_mesh(toy_dataset):
    """Pure-DP meshes keep the fused tier; model-sharded meshes do not."""
    assert _trainer(toy_dataset, mesh=make_mesh(8, 1))._fused_plan is not None
    assert _trainer(toy_dataset,
                    mesh=single_device_mesh())._fused_plan is not None
    t_mp = _trainer(toy_dataset, mesh=make_mesh(4, 2))
    assert not t_mp._fused_epoch_eligible()
    t_ex = _trainer(toy_dataset, mesh=make_mesh(8, 1),
                    **{"parallel.exchange": "explicit"})
    assert not t_ex._fused_epoch_eligible()


def test_fused_mesh11_bitwise_matches_unmeshed(toy_dataset):
    """mesh(1,1) runs the same fused program — identical numerics."""
    t_plain = _trainer(toy_dataset)
    t_mesh = _trainer(toy_dataset, mesh=single_device_mesh())
    assert t_mesh._fused_plan is not None
    p0, o0 = t_plain.init_state()
    p1, o1 = t_mesh.init_state()
    for _ in range(3):
        p0, o0, l0 = t_plain.train_epoch(p0, o0)
        p1, o1, l1 = t_mesh.train_epoch(p1, o1)
        assert l1 == pytest.approx(l0, rel=1e-6), (l0, l1)
    np.testing.assert_array_equal(np.asarray(p1["P"]), np.asarray(p0["P"]))
    np.testing.assert_array_equal(np.asarray(p1["Q"]), np.asarray(p0["Q"]))
    assert int(o1[0].count) == int(o0[0].count)


def test_fused_mesh_dp_matches_serial_chunk_oracle(toy_dataset):
    """D=8 meshed fused epoch == serial per-chunk kernel runs + delta
    averaging (the declared local-Adam semantics), same sampled epoch."""
    mesh = make_mesh(8, 1)
    D = 8
    tr = _trainer(toy_dataset, mesh=mesh)
    assert tr._fused_plan is not None
    sample_fn, apply_fn, correct = tr._fused_parts
    params, opt = tr.init_state()
    key = jax.random.PRNGKey(123)

    got_p, got_o, got_loss = jax.jit(tr._epoch_body)(
        params, opt, key, tr.arrays)

    tensors = jax.jit(sample_fn)(key, tr.arrays)
    steps = jax.tree_util.tree_leaves(tensors)[0].shape[0]
    assert steps % D == 0
    chunk = steps // D
    deltas_p, deltas_o, raw_total = [], [], 0.0
    for c in range(D):
        t_c = jax.tree_util.tree_map(
            lambda a: a[c * chunk:(c + 1) * chunk], tensors)
        p_c, o_c, raw = apply_fn(params, opt, t_c)
        deltas_p.append(jax.tree_util.tree_map(
            lambda n, o_: np.asarray(n) - np.asarray(o_), p_c, params))
        deltas_o.append((p_c, o_c))
        raw_total += float(raw)

    want_p = jax.tree_util.tree_map(
        lambda o_, *ds: np.asarray(o_) + np.mean(ds, axis=0),
        params, *deltas_p)
    for leaf_got, leaf_want in zip(jax.tree_util.tree_leaves(got_p),
                                   jax.tree_util.tree_leaves(want_p)):
        np.testing.assert_allclose(np.asarray(leaf_got), leaf_want,
                                   rtol=1e-5, atol=1e-6)
    # Moments averaged the same way; count advanced by steps/D.
    mus = [o_c[0].mu["P"] for _, o_c in deltas_o]
    want_mu_p = np.asarray(opt[0].mu["P"]) + np.mean(
        [np.asarray(m) - np.asarray(opt[0].mu["P"]) for m in mus], axis=0)
    np.testing.assert_allclose(np.asarray(got_o[0].mu["P"]), want_mu_p,
                               rtol=1e-5, atol=1e-7)
    assert int(got_o[0].count) == int(opt[0].count) + chunk
    assert float(got_loss) == pytest.approx(float(correct(raw_total)),
                                            rel=1e-5)


def test_fused_mesh_dp_trains_and_evaluates(toy_dataset):
    """End-to-end: D=8 meshed fused BPR reduces loss and evaluates."""
    tr = _trainer(toy_dataset, mesh=make_mesh(8, 1), epoches="4")
    params, opt = tr.init_state()
    losses = []
    for _ in range(4):
        params, opt, loss = tr.train_epoch(params, opt)
        losses.append(loss)
    assert losses[-1] < losses[0]
    res = tr.evaluate(params)
    assert all(np.isfinite(np.asarray(v)).all() for v in res.values())


def test_fused_mesh_dp_sync_every_k_matches_round_oracle(toy_dataset):
    """train.dp_sync_every=K on the fused mesh tier: the kernel runs
    per K-step round with a delta-combine between rounds.  Oracle:
    serial per-chip K-step apply_fn runs from the round-start state,
    combined with the configured (mean) rule."""
    D, K = 8, 2
    mesh = make_mesh(D, 1)
    tr = _trainer(toy_dataset, mesh=mesh,
                  **{"train.dp_sync_every": str(K),
                     "train.dp_delta_combine": "mean"})
    assert tr._fused_plan is not None
    sample_fn, apply_fn, correct = tr._fused_parts
    params, opt = tr.init_state()
    key = jax.random.PRNGKey(5)
    got_p, got_o, got_loss = jax.jit(tr._epoch_body)(
        params, opt, key, tr.arrays)

    tensors = jax.jit(sample_fn)(key, tr.arrays)
    steps = jax.tree_util.tree_leaves(tensors)[0].shape[0]
    assert steps % (D * K) == 0
    steps_loc = steps // D
    rounds = steps_loc // K
    p_cur, o_cur = params, opt
    raw = 0.0
    for r in range(rounds):
        deltas_p, deltas_o = [], []
        for c in range(D):
            lo = c * steps_loc + r * K
            t_c = jax.tree_util.tree_map(lambda a: a[lo:lo + K], tensors)
            p_c, o_c, raw_c = apply_fn(p_cur, o_cur, t_c)
            deltas_p.append(jax.tree_util.tree_map(
                lambda n, o_: np.asarray(n) - np.asarray(o_), p_c,
                p_cur))
            deltas_o.append(o_c)
            raw += float(raw_c)
        p_cur = jax.tree_util.tree_map(
            lambda o_, *ds: np.asarray(o_) + np.mean(ds, axis=0),
            p_cur, *deltas_p)
        o_new = deltas_o[0]
        o_cur = jax.tree_util.tree_map(
            lambda o_, *ns: (np.asarray(o_) + np.mean(
                [np.asarray(n) - np.asarray(o_) for n in ns], axis=0)
                if np.issubdtype(np.asarray(o_).dtype, np.floating)
                else np.asarray(ns[0])),
            o_cur, *deltas_o)
        del o_new
    for lg, lw in zip(jax.tree_util.tree_leaves(got_p),
                      jax.tree_util.tree_leaves(p_cur)):
        np.testing.assert_allclose(np.asarray(lg), np.asarray(lw),
                                   rtol=2e-4, atol=1e-5)
    assert int(got_o[0].count) == int(opt[0].count) + steps_loc
    assert float(got_loss) == pytest.approx(float(correct(raw)),
                                            rel=1e-4)


def test_grouped_mesh_dp_matches_chunk_oracle(toy_dataset):
    """GROUPED overflow tier under a pure-DP mesh (round-4 verdict item
    5): every chip runs the full block-coordinate group walk over its
    1/D chunk of each group's steps; float deltas averaged once per
    epoch.  Pinned against serial per-chunk runs of the same grouped
    program."""
    D = 8
    tr = _trainer(toy_dataset, mesh=make_mesh(D, 1),
                  **{"train.fused_groups": "2"})
    assert tr._fused_grouped_plan is not None
    epoch_local, steps_eq, mesh_dp = tr._grouped_parts
    assert mesh_dp == D and steps_eq % D == 0
    params, opt = tr.init_state()
    key = jax.random.PRNGKey(11)
    got_p, got_o, got_loss = jax.jit(tr._epoch_body)(
        params, opt, key, tr.arrays)

    deltas_p, loss_total = [], 0.0
    for c in range(D):
        p_c, o_c, mean_part = epoch_local(params, opt, key, tr.arrays,
                                          jnp.int32(c))
        deltas_p.append(jax.tree_util.tree_map(
            lambda n, o_: np.asarray(n) - np.asarray(o_), p_c, params))
        loss_total += float(mean_part)
    want_p = jax.tree_util.tree_map(
        lambda o_, *ds: np.asarray(o_) + np.mean(ds, axis=0),
        params, *deltas_p)
    for lg, lw in zip(jax.tree_util.tree_leaves(got_p),
                      jax.tree_util.tree_leaves(want_p)):
        np.testing.assert_allclose(np.asarray(lg), lw, rtol=1e-5,
                                   atol=1e-6)
    # Adam count advances by each chip's LOCAL steps (2 groups x
    # steps_eq/D each).
    assert int(got_o[0].count) == int(opt[0].count) + 2 * steps_eq // D
    assert float(got_loss) == pytest.approx(loss_total, rel=1e-5)


def test_grouped_mesh_dp_trains_and_evaluates(toy_dataset):
    """Grouped + DP mesh end-to-end for the pointwise protocol too."""
    tr = _trainer(toy_dataset, mesh=make_mesh(8, 1), recommender="GMF",
                  **{"is_pairwise": "False",
                     "loss_func": "cross_entropy",
                     "train.fused_groups": "2"})
    assert tr._fused_grouped_plan is not None
    params, opt = tr.init_state()
    losses = []
    for _ in range(3):
        params, opt, loss = tr.train_epoch(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    res = tr.evaluate(params)
    assert all(np.isfinite(np.asarray(v)).all() for v in res.values())


def test_fused_mesh_dp_gmf_and_cml(toy_dataset):
    """The pointwise (GMF) and cml protocols run under the DP mesh too."""
    for name, ov in (
        ("GMF", {"is_pairwise": "False", "loss_func": "cross_entropy",
                 "reg": "0.01"}),
        ("CML", {"is_pairwise": "True", "loss_func": "hinge",
                 "margin": "0.5", "reg": "0.1", "neg_ratio": "4",
                 "cml_like": "True"}),
    ):
        tr = _trainer(toy_dataset, mesh=make_mesh(8, 1),
                      recommender=name, **ov)
        assert tr._fused_plan is not None, name
        params, opt = tr.init_state()
        p, o, l0 = tr.train_epoch(params, opt)
        p, o, l1 = tr.train_epoch(p, o)
        assert np.isfinite(l0) and np.isfinite(l1), name
