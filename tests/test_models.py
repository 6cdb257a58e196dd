"""Model zoo: every model trains (finite decreasing loss) and evaluates.

Per-model config overrides mirror the reference's conf/*.properties keys.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cleverrec_tpu.data import load_ranking_data
from cleverrec_tpu.models import available_models, make_model
from cleverrec_tpu.models.base import DataMeta
from cleverrec_tpu.train import Trainer
from tests.conftest import base_config

COMMON = {"epoches": "2", "batch_size": "64", "embed_size": "8",
          "lr": "0.05", "neg_ratio": "2", "test.neg_samples": "10"}

MODEL_OVERRIDES = {
    "BPR": {"is_pairwise": "True", "loss_func": "bpr", "reg": "0.01"},
    "GMF": {"is_pairwise": "False", "loss_func": "cross_entropy",
            "reg": "0.01"},
    "MLP": {"is_pairwise": "False", "loss_func": "cross_entropy",
            "reg": "0.01", "layers": "[16,8]"},
    "NeuMF": {"is_pairwise": "False", "loss_func": "cross_entropy",
              "layers": "[16,8]", "reg1": "0.01", "reg2": "0.01"},
    "CML": {"loss_func": "hinge", "margin": "1.0", "reg": "0.1",
            "neg_ratio": "5", "cml_like": "True"},
    "LRML": {"loss_func": "hinge", "margin": "0.2", "reg": "0.001",
             "mem_size": "6", "cml_like": "True"},
    "TransCF": {"loss_func": "hinge", "margin": "0.5", "reg1": "0.01",
                "reg2": "0.01", "cml_like": "True"},
    "FISM": {"is_pairwise": "True", "loss_func": "bpr", "reg": "0.001",
             "reg_bias": "0.001", "alpha": "0.4", "fism_like": "True"},
    "NAIS": {"is_pairwise": "False", "loss_func": "cross_entropy",
             "reg": "0.001", "atten_size": "4", "beta": "0.5",
             "atten_type": "prod"},
    "NAIS_single": {"is_pairwise": "False", "loss_func": "cross_entropy",
                    "reg": "0.001", "atten_size": "4", "beta": "0.5",
                    "atten_type": "concat"},
    "SBPR": {"loss_func": "bpr", "reg": "0.05", "social": True},
    "TBPR": {"loss_func": "bpr", "reg": "0.05", "strong_ratio": "0.5",
             "social": True},
    "CUNE_BPR": {"loss_func": "bpr", "reg": "0.01", "walk_count": "2",
                 "walk_length": "4", "walk_dim": "8", "window_size": "2",
                 "topk_f": "3"},
    "SAMN": {"loss_func": "bpr", "reg1": "0.01", "reg2": "0.01",
             "mem_size": "4", "atten_size": "4", "social": True},
    "SAMN_single": {"loss_func": "bpr", "reg1": "0.01", "reg2": "0.01",
                    "mem_size": "4", "atten_size": "4", "social": True},
    "RML_DGATs": {"loss_func": "hinge", "margin": "0.25", "gamma": "0.05",
                  "reg1": "0.01", "reg2": "0.001", "atten_size": "4",
                  "att_type": "2", "mlp_type": "0", "max_i": "5",
                  "max_s": "5", "train_batches": "4", "cml_like": "True",
                  "social": True},
    "LightGCN": {"is_pairwise": "True", "loss_func": "bpr", "reg": "0.0001",
                 "n_layers": "2"},
    "LR_GCCF": {"is_pairwise": "True", "loss_func": "bpr", "reg": "0.0001",
                "n_layers": "2"},
    "DiffNet": {"is_pairwise": "True", "loss_func": "bpr", "reg": "0.001",
                "n_layers": "2", "social": True},
    "DiffNetPlusPlus": {"is_pairwise": "True", "loss_func": "bpr",
                        "reg": "0.001", "n_layers": "2", "social": True},
    "WMF": {"is_pairwise": "False", "loss_func": "square", "reg": "0.001",
            "alpha": "5.0"},
    "DMF": {"is_pairwise": "False", "loss_func": "cross_entropy",
            "reg": "0.0001", "layers": "[8,8]"},
    "SML": {"is_pairwise": "True", "loss_func": "hinge", "reg": "0.01",
            "cml_like": "True"},
    "EATNN": {"is_pairwise": "True", "loss_func": "bpr", "reg": "0.001",
              "social_weight": "0.1", "social": True},
    "NGCF": {"is_pairwise": "True", "loss_func": "bpr", "reg": "0.0001",
             "n_layers": "2", "message_dropout": "0.1"},
    "SoHRML": {"loss_func": "hinge", "margin": "0.5", "gamma": "0.1",
               "reg1": "0.01", "reg2": "0.001", "atten_size": "4",
               "att_type": "2", "mlp_type": "0", "gat_layer_nums": "2",
               "max_i": "0", "max_s": "0", "node_dropout": "0.3",
               "message_dropout": "0.3", "train_batches": "4",
               "adj_folds": "4", "cml_like": "True", "social": True},
}


def _setup(name, toy, toy_social):
    ov = dict(COMMON)
    spec = dict(MODEL_OVERRIDES[name])
    needs_social = spec.pop("social", False)
    ov.update(spec)
    ov["recommender"] = name
    if needs_social:
        ov["social_file"] = "trusts.csv"
        toy = toy_social
    cfg = base_config(toy, **ov)
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    return cfg, data, model


@pytest.mark.parametrize("name", sorted(MODEL_OVERRIDES))
def test_model_trains_and_evaluates(name, toy_dataset, toy_social_dataset):
    cfg, data, model = _setup(name, toy_dataset, toy_social_dataset)
    trainer = Trainer(model, data, cfg)
    params, opt_state = trainer.init_state()
    losses = []
    for _ in range(3):
        params, opt_state, loss = trainer.train_epoch(params, opt_state)
        assert np.isfinite(loss), f"{name}: non-finite loss"
        losses.append(loss)
    assert losses[-1] < losses[0], f"{name}: loss not decreasing {losses}"
    results = trainer.evaluate(params)
    for k, (hr, mrr, ndcg) in results.items():
        assert 0.0 <= hr <= 1.0 and 0.0 <= ndcg <= 1.0, (name, k, hr, ndcg)


@pytest.mark.parametrize("name", ["NAIS", "SAMN"])
def test_score_candidates_matches_pairs(name, toy_dataset, toy_social_dataset):
    """Overridden fast candidate scorers must equal flattened pair scoring."""
    cfg, data, model = _setup(name, toy_dataset, toy_social_dataset)
    trainer = Trainer(model, data, cfg)
    params, _ = trainer.init_state()
    aux = trainer.arrays
    dd = trainer.dd
    u = jnp.asarray(dd.test_users[:8])
    cand = jnp.asarray(dd.cand[:8])
    fast = model.score_candidates(params, u, cand, aux)
    b, c = cand.shape
    slow = model.score_pairs(params, jnp.repeat(u, c), cand.reshape(-1),
                             aux).reshape(b, c)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               rtol=2e-4, atol=2e-5)


def test_cml_ranks_ascending(toy_dataset, toy_social_dataset):
    """cml_like models rank by ascending distance."""
    cfg, data, model = _setup("CML", toy_dataset, toy_social_dataset)
    assert model.cml_like
    trainer = Trainer(model, data, cfg)
    params, _ = trainer.init_state()
    ev = trainer.evaluator
    u = jnp.asarray(trainer.dd.test_users[:4])
    cand = jnp.asarray(trainer.dd.cand[:4])
    mask = jnp.asarray(trainer.dd.cand_mask[:4])
    items = np.asarray(ev._rank_fn(params, trainer.arrays, u, cand, mask))
    scores = np.asarray(model.score_candidates(params, u, cand,
                                               trainer.arrays))
    for r in range(4):
        valid = np.asarray(mask[r])
        c = np.asarray(cand[r])[valid]
        s = scores[r][valid]
        want = c[np.argsort(s, kind="stable")][: items.shape[1]]
        # Distances unique in practice; compare sets of top items.
        assert set(items[r].tolist()) == set(want.tolist())


def test_rml_dgats_score_candidates_matches_pairs(toy_dataset,
                                                  toy_social_dataset):
    cfg, data, model = _setup("RML_DGATs", toy_dataset, toy_social_dataset)
    trainer = Trainer(model, data, cfg)
    params, _ = trainer.init_state()
    dd = trainer.dd
    u = jnp.asarray(dd.test_users[:6])
    cand = jnp.asarray(dd.cand[:6])
    fast = model.score_candidates(params, u, cand, trainer.arrays)
    b, c = cand.shape
    slow = model.score_pairs(params, jnp.repeat(u, c), cand.reshape(-1),
                             trainer.arrays).reshape(b, c)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               rtol=3e-4, atol=3e-5)


def test_nais_bucketed_histories(toy_dataset):
    """NAIS trains via per-width bucketed epochs: buckets cover every
    pair exactly once, truncated tables keep full histories, and training
    still learns (loss decreases; eval comparable to unbucketed)."""
    ov = dict(COMMON)
    ov.update(MODEL_OVERRIDES["NAIS"])
    ov["recommender"] = "NAIS"
    cfg = base_config(toy_dataset, **ov)
    cfg_off = base_config(toy_dataset, **ov,
                          **{"train.bucketed_histories": "False"})
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    tr = Trainer(model, data, cfg)
    assert tr._bucket_plan, "bucketing not active"
    lens = np.asarray(tr.dd.seen.lens)
    n_pairs = sum(p["pairs"] for p in tr._bucket_plan)
    assert n_pairs == tr.n_pairs
    for p in tr._bucket_plan:
        pu = np.asarray(p["arrays"]["pos_u"])
        assert (lens[pu] <= p["width"]).all(), p["width"]
    params, opt = tr.init_state()
    losses = []
    for _ in range(3):
        params, opt, loss = tr.train_epoch(params, opt)
        assert np.isfinite(loss)
        losses.append(loss)
    assert losses[-1] < losses[0]
    r_b = tr.evaluate(params)

    tr0 = Trainer(model, data, cfg_off)
    assert not tr0._bucket_plan
    p0, o0 = tr0.init_state()
    for _ in range(3):
        p0, o0, _ = tr0.train_epoch(p0, o0)
    r0 = tr0.evaluate(p0)
    # Same ballpark (different shuffle stream -> not identical).
    for k in r_b:
        assert abs(r_b[k][0] - r0[k][0]) < 0.35, (k, r_b[k], r0[k])


def test_sohrml_mlp_type_eval_regression(toy_dataset, toy_social_dataset):
    """mlp_type >= 1 once crashed every eval call: _relation concatenated
    broadcastable-but-unequal shapes ([B,1,d] vs [B,C,d])."""
    spec = dict(MODEL_OVERRIDES["SoHRML"])
    spec.pop("social", None)
    spec["mlp_type"] = "1"
    o = dict(COMMON, **spec, recommender="SoHRML")
    o["social_file"] = "trusts.csv"
    cfg2 = base_config(toy_social_dataset, **o)
    data2 = load_ranking_data(cfg2)
    model2 = make_model(cfg2, DataMeta(data2.user_nums, data2.item_nums))
    tr = Trainer(model2, data2, cfg2)
    params, opt = tr.init_state()
    params, opt, loss = tr.train_epoch(params, opt)
    assert np.isfinite(loss)
    res = tr.evaluate(params)                 # crashed before the fix
    for k, (hr, mrr, ndcg) in res.items():
        assert 0.0 <= hr <= 1.0


def test_transcf_full_catalog_uses_clipped_users(toy_dataset,
                                                 toy_social_dataset):
    """Reference parity (TransCF.py:79-85): the full-catalog branch
    ranks ||clip(u) + u_nbr*i_nbr - Q||^2 (clipping reassigns u_embed
    before _predict); the candidate branch keeps raw u."""
    from cleverrec_tpu.common import clip_rows_by_norm
    cfg, data, model = _setup("TransCF", toy_dataset, toy_social_dataset)
    tr = Trainer(model, data, cfg)
    params, _ = tr.init_state()
    # Inflate P so clipping actually bites.
    params = dict(params, P=params["P"] * 50.0)
    aux = tr.arrays
    u = jnp.asarray(np.arange(6), jnp.int32)
    got = np.asarray(model.score_all(params, u, aux))
    u_nbr, i_nbr = model._nbr_tables(params, aux)
    ue = np.asarray(clip_rows_by_norm(params["P"][u]))
    r = np.asarray(u_nbr)[np.asarray(u)][:, None, :] * np.asarray(i_nbr)[None, :, :]
    want = ((ue[:, None, :] + r - np.asarray(params["Q"])[None, :, :]) ** 2
            ).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # Candidate scoring stays RAW (pre-clipping ui_dist).
    pair = np.asarray(model.score_pairs(params, u, jnp.zeros_like(u), aux))
    raw_u = np.asarray(params["P"][u])
    r0 = np.asarray(u_nbr)[np.asarray(u)] * np.asarray(i_nbr)[0][None, :]
    want_pair = ((raw_u + r0 - np.asarray(params["Q"])[0][None, :]) ** 2).sum(-1)
    np.testing.assert_allclose(pair, want_pair, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("name", ["LightGCN", "NGCF", "LR_GCCF"])
def test_gcn_dense_adjacency_matches_edges(name, toy_dataset,
                                           toy_social_dataset):
    """The dense-adjacency propagation fast path (one MXU matmul per
    layer, models/gcn.py _adj_apply) is numerically the same operator
    as the edge-list segment-sum path."""
    from cleverrec_tpu.models.gcn import _bipartite_edges

    cfg, data, model = _setup(name, toy_dataset, toy_social_dataset)
    trainer = Trainer(model, data, cfg)
    params, _ = trainer.init_state()
    aux = trainer.arrays
    assert "g_dense" in aux, "toy graph should fit the dense budget"
    rows, cols, w = _bipartite_edges(trainer.dd, data.user_nums,
                                     data.item_nums)
    aux2 = dict(aux)
    aux2.pop("g_dense")
    aux2.update({"g_row": jnp.asarray(rows), "g_col": jnp.asarray(cols),
                 "g_w": jnp.asarray(w)})
    u = jnp.arange(8, dtype=jnp.int32)
    s_dense = model.score_all(params, u, aux)
    s_edges = model.score_all(params, u, aux2)
    np.testing.assert_allclose(np.asarray(s_dense), np.asarray(s_edges),
                               rtol=2e-5, atol=2e-6)


def test_samn_grouped_loss_matches_flat(toy_dataset, toy_social_dataset):
    """SAMN's user-grouped pairwise loss == the flat loss on the same
    cells: build a grouped batch, flatten its valid cells into flat
    rows, and compare the two objectives exactly."""
    cfg, data, model = _setup("SAMN", toy_dataset, toy_social_dataset)
    trainer = Trainer(model, data, cfg)
    params, _ = trainer.init_state()
    aux = trainer.arrays
    rng = np.random.default_rng(3)
    G, T = 6, 8
    gu = rng.integers(0, data.user_nums, G).astype(np.int32)
    gi = rng.integers(0, data.item_nums, (G, T)).astype(np.int32)
    gj = rng.integers(0, data.item_nums, (G, T)).astype(np.int32)
    gw = (rng.random((G, T)) < 0.8).astype(np.float32)
    batch_g = {"gu": jnp.asarray(gu), "gi": jnp.asarray(gi),
               "gj": jnp.asarray(gj), "gw": jnp.asarray(gw)}
    lg = float(model.loss_grouped_pairwise(params, batch_g, aux))
    batch_f = {"u": jnp.asarray(np.repeat(gu, T)),
               "i": jnp.asarray(gi.reshape(-1)),
               "j": jnp.asarray(gj.reshape(-1)),
               "w": jnp.asarray(gw.reshape(-1))}
    lf = float(model.loss(params, batch_f, aux))
    # The flat loss counts the tower L2 (reg2) once per BATCH; both
    # sides here are one batch, so the objectives match exactly.
    assert lg == pytest.approx(lf, rel=1e-5)


def test_samn_grouped_epoch_trains(toy_dataset, toy_social_dataset):
    """The grouped pairwise epoch path is selected for SAMN, decreases
    the loss, and evaluates sanely."""
    cfg, data, model = _setup("SAMN", toy_dataset, toy_social_dataset)
    trainer = Trainer(model, data, cfg)
    assert "pg_user" in trainer.arrays      # grouped path active
    params, opt = trainer.init_state()
    losses = []
    for _ in range(3):
        params, opt, loss = trainer.train_epoch(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    res = trainer.evaluate(params)
    for k, (hr, mrr, ndcg) in res.items():
        assert 0.0 <= hr <= 1.0 and np.isfinite(ndcg)
