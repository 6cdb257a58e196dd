"""Multi-device sharding on the 8-device virtual CPU mesh.

Validates the scaling tiers of SURVEY.md section 7.1 L8 without a pod:
data-parallel + row-sharded training produces the same numerics as the
unsharded program (same program, same RNG stream), and the explicit
embedding exchange matches the dense gather.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cleverrec_tpu.data import load_ranking_data
from cleverrec_tpu.models import make_model
from cleverrec_tpu.models.base import DataMeta
from cleverrec_tpu.parallel.mesh import make_mesh
from cleverrec_tpu.parallel.sharding import (pad_table_for_sharding,
                                             row_sharded_gather)
from cleverrec_tpu.train import Trainer
from tests.conftest import base_config


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(4, 2)


def _trainer(toy, mesh=None, **ov):
    base = {"epoches": "2", "batch_size": "64", "embed_size": "16",
            "lr": "0.05", "neg_ratio": "2", "is_pairwise": "True",
            "loss_func": "bpr", "reg": "0.01"}
    base.update(ov)
    cfg = base_config(toy, **base)
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    return Trainer(model, data, cfg, mesh=mesh)


def test_sharded_training_matches_single_device(toy_dataset, mesh):
    t_plain = _trainer(toy_dataset)
    t_mesh = _trainer(toy_dataset, mesh=mesh)
    p0, o0 = t_plain.init_state()
    p1, o1 = t_mesh.init_state()
    for _ in range(3):
        p0, o0, l0 = t_plain.train_epoch(p0, o0)
        p1, o1, l1 = t_mesh.train_epoch(p1, o1)
        assert l1 == pytest.approx(l0, rel=1e-4), (l0, l1)
    np.testing.assert_allclose(np.asarray(p0["P"]), np.asarray(p1["P"]),
                               rtol=1e-4, atol=1e-5)
    # Eval agrees too.
    r0 = t_plain.evaluate(p0)
    r1 = t_mesh.evaluate(p1)
    for k in r0:
        assert r1[k] == pytest.approx(r0[k], abs=1e-6)


def test_sharded_params_actually_sharded(toy_dataset, mesh):
    t = _trainer(toy_dataset, mesh=mesh)
    params, _ = t.init_state()
    sh = params["Q"].sharding
    spec = sh.spec
    assert spec[0] == "model", spec


# The models whose segment-sums / attention / dual-domain epochs are most
# likely to mis-shard (VERDICT round-1 item 6).  Each trains 2 epochs on
# the mesh and unsharded; numerics must agree (same program, same RNG).
HARD_MODELS = {
    "LightGCN": {"is_pairwise": "True", "loss_func": "bpr",
                 "reg": "0.0001", "n_layers": "2"},
    "SAMN": {"loss_func": "bpr", "reg1": "0.01", "reg2": "0.01",
             "mem_size": "4", "atten_size": "4", "social": True},
    "SoHRML": {"loss_func": "hinge", "margin": "0.5", "gamma": "0.1",
               "reg1": "0.01", "reg2": "0.001", "atten_size": "4",
               "att_type": "2", "mlp_type": "0", "gat_layer_nums": "2",
               "max_i": "0", "max_s": "0", "node_dropout": "0.0",
               "message_dropout": "0.0", "train_batches": "4",
               "adj_folds": "4", "cml_like": "True", "social": True},
    "RML_DGATs": {"loss_func": "hinge", "margin": "0.25", "gamma": "0.05",
                  "reg1": "0.01", "reg2": "0.001", "atten_size": "4",
                  "att_type": "2", "mlp_type": "0", "max_i": "5",
                  "max_s": "5", "train_batches": "4", "cml_like": "True",
                  "social": True},
}


@pytest.mark.parametrize("name", sorted(HARD_MODELS))
def test_sharded_hard_models_match_single_device(name, toy_dataset,
                                                 toy_social_dataset, mesh):
    """sharded == unsharded numerics for segment-sum graph models, SAMN's
    attention, and the dual-domain (item+social) epoch."""
    spec = dict(HARD_MODELS[name])
    social = spec.pop("social", False)
    ov = {"recommender": name, "epoches": "2", "batch_size": "64",
          "embed_size": "8", "lr": "0.05", "neg_ratio": "2",
          "test.neg_samples": "10", **spec}
    if social:
        ov["social_file"] = "trusts.csv"
    toy = toy_social_dataset if social else toy_dataset
    cfg = base_config(toy, **ov)
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    t_plain = Trainer(model, data, cfg)
    t_mesh = Trainer(model, data, cfg, mesh=mesh)
    p0, o0 = t_plain.init_state()
    p1, o1 = t_mesh.init_state()
    for _ in range(2):
        p0, o0, l0 = t_plain.train_epoch(p0, o0)
        p1, o1, l1 = t_mesh.train_epoch(p1, o1)
        assert l1 == pytest.approx(l0, rel=2e-4), (name, l0, l1)
    for leaf0, leaf1 in zip(jax.tree_util.tree_leaves(p0),
                            jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(leaf1), np.asarray(leaf0),
                                   rtol=2e-4, atol=2e-5)
    r0 = t_plain.evaluate(p0)
    r1 = t_mesh.evaluate(p1)
    for k in r0:
        assert r1[k] == pytest.approx(r0[k], abs=1e-5), (name, k)


def test_mesh_evaluator_shards_item_axis(toy_dataset, mesh, monkeypatch):
    """With a mesh, the Evaluator's full-catalog path must go through the
    item-axis-sharded top-K merge (not replicated scoring) and agree with
    the single-device result."""
    from cleverrec_tpu.ops import topk as topk_ops
    calls = {"n": 0}
    orig = topk_ops.sharded_topk_scores

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(topk_ops, "sharded_topk_scores", counting)
    ov = {"data.split_way": "rs", "test.neg_samples": "0",
          "eval.fused_kernel": "False"}
    t_plain = _trainer(toy_dataset, **ov)
    t_mesh = _trainer(toy_dataset, mesh=mesh, **ov)
    assert t_mesh.evaluator.mode == "full_sharded"
    assert t_plain.evaluator.mode == "full"
    p0, o0 = t_plain.init_state()
    p0, o0, _ = t_plain.train_epoch(p0, o0)
    r_plain = t_plain.evaluate(p0)
    r_mesh = t_mesh.evaluator.evaluate(p0, t_plain.arrays)
    assert calls["n"] >= 1, "sharded top-k merge never traced"
    for k in r_plain:
        assert r_mesh[k] == pytest.approx(r_plain[k], abs=1e-5)


# Wider model-sharding shapes (VERDICT round-2 task 8): every tier must
# hold at 2-, 4- and 8-way model sharding, not just the (4,2) default.
MESH_SHAPES = [(4, 2), (2, 4), (1, 8)]


@pytest.fixture(scope="module")
def meshes():
    return {s: make_mesh(*s) for s in MESH_SHAPES}


@pytest.mark.parametrize("shape", MESH_SHAPES)
def test_exchange_tiers_match(shape, toy_dataset, meshes):
    """parallel.exchange=explicit (shard_map gather+psum lookup) ==
    GSPMD tier == unsharded, at every mesh shape."""
    t0 = _trainer(toy_dataset)
    t1 = _trainer(toy_dataset, mesh=meshes[shape])
    t2 = _trainer(toy_dataset, mesh=meshes[shape],
                  **{"parallel.exchange": "explicit"})
    p0, o0 = t0.init_state()
    p1, o1 = t1.init_state()
    p2, o2 = t2.init_state()
    for _ in range(2):
        p0, o0, l0 = t0.train_epoch(p0, o0)
        p1, o1, l1 = t1.train_epoch(p1, o1)
        p2, o2, l2 = t2.train_epoch(p2, o2)
    assert l1 == pytest.approx(l0, rel=1e-4)
    assert l2 == pytest.approx(l0, rel=1e-4)
    np.testing.assert_allclose(np.asarray(p0["P"]), np.asarray(p2["P"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p0["Q"]), np.asarray(p2["Q"]),
                               rtol=1e-4, atol=1e-5)


def test_explicit_tier_full_table_fallback(toy_dataset, meshes):
    """CML's covariance regularizer reads the FULL tables (not a lookup):
    the ExchangeTable view must fall back transparently via __jax_array__
    and still match unsharded numerics."""
    ov = {"recommender": "CML", "margin": "1.0", "reg": "0.1",
          "loss_func": "hinge", "train.fused_kernel": "False"}
    t0 = _trainer(toy_dataset, **ov)
    t2 = _trainer(toy_dataset, mesh=meshes[(2, 4)],
                  **{"parallel.exchange": "explicit", **ov})
    p0, o0 = t0.init_state()
    p2, o2 = t2.init_state()
    p0, o0, l0 = t0.train_epoch(p0, o0)
    p2, o2, l2 = t2.train_epoch(p2, o2)
    assert l2 == pytest.approx(l0, rel=1e-4)
    np.testing.assert_allclose(np.asarray(p0["P"]), np.asarray(p2["P"]),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("shape", [(2, 4), (1, 8)])
def test_wider_mesh_dual_domain(shape, toy_social_dataset, meshes):
    """The dual-domain (item+social) epoch at 4- and 8-way model sharding
    (the (4,2) case is covered by HARD_MODELS above)."""
    spec = dict(HARD_MODELS["RML_DGATs"])
    spec.pop("social")
    ov = {"recommender": "RML_DGATs", "epoches": "1", "batch_size": "64",
          "embed_size": "8", "lr": "0.05", "neg_ratio": "2",
          "test.neg_samples": "10", "social_file": "trusts.csv", **spec}
    cfg = base_config(toy_social_dataset, **ov)
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    t_plain = Trainer(model, data, cfg)
    t_mesh = Trainer(model, data, cfg, mesh=meshes[shape])
    p0, o0 = t_plain.init_state()
    p1, o1 = t_mesh.init_state()
    p0, o0, l0 = t_plain.train_epoch(p0, o0)
    p1, o1, l1 = t_mesh.train_epoch(p1, o1)
    assert l1 == pytest.approx(l0, rel=2e-4)
    for leaf0, leaf1 in zip(jax.tree_util.tree_leaves(p0),
                            jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(leaf1), np.asarray(leaf0),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("shape", [(2, 4), (1, 8)])
def test_wider_mesh_fm(shape, tmp_path, meshes):
    """FM's rating pipeline at 4- and 8-way model sharding."""
    rng = np.random.default_rng(0)
    ds = tmp_path / "toyfm"
    ds.mkdir()

    def gen(n):
        lines = []
        for _ in range(n):
            u, i = rng.integers(8), rng.integers(16)
            lines.append(f"{3.0 + 0.1 * u - 0.05 * i:.3f},{u}:1,{8 + i}:1")
        return "\n".join(lines) + "\n"

    (ds / "toyfm.train.libfm").write_text(gen(512))
    (ds / "toyfm.test.libfm").write_text(gen(64))
    from cleverrec_tpu.config import Config
    from cleverrec_tpu.data.libfm import load_rating_data
    from cleverrec_tpu.rating import FM, FMTrainer
    cfg = Config({
        "recommender": "FM", "model_type": "rating",
        "data.root_dir": str(tmp_path), "data.dataset": "toyfm",
        "train": ".train.libfm", "test": ".test.libfm",
        "is_real_valued": "True", "epoches": "2", "batch_size": "128",
        "test.batch_size": "64", "embed_size": "4", "reg": "0.001",
        "lr": "0.05", "optimizer": "Adam", "loss_func": "square",
        "init_method": "normal", "stddev": "0.01", "seed": "3",
    })
    data = load_rating_data(cfg)
    m = FM(cfg, data.feature_nums)
    b0 = FMTrainer(m, data, cfg).run()
    b1 = FMTrainer(m, data, cfg, mesh=meshes[shape]).run()
    assert b1["rmse"] == pytest.approx(b0["rmse"], rel=1e-4)


def test_row_sharded_gather_matches_dense(mesh):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 64, 37), dtype=jnp.int32)
    with mesh:
        padded = pad_table_for_sharding(table, 2)
        got = row_sharded_gather(padded, ids, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(table[ids]),
                               rtol=1e-6)


def test_row_sharded_gather_gradient(mesh):
    """The exchange is differentiable: grads match the dense gather's."""
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(32, 8)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 32, 16), dtype=jnp.int32)
    cot = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))

    def f_sharded(t):
        return jnp.sum(row_sharded_gather(t, ids, mesh) * cot)

    def f_dense(t):
        return jnp.sum(t[ids] * cot)

    with mesh:
        g1 = jax.grad(f_sharded)(pad_table_for_sharding(table, 2))
    g2 = jax.grad(f_dense)(table)
    np.testing.assert_allclose(np.asarray(g1)[:32], np.asarray(g2),
                               rtol=1e-5, atol=1e-6)
