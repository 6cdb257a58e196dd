"""Numerical loss parity: model losses vs hand-computed numpy oracles.

SURVEY.md section 4's prescription: per-model loss on a fixed batch
against an independently hand-computed value (the reference's formulas,
written out with plain numpy here)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cleverrec_tpu.config import Config
from cleverrec_tpu.models import make_model
from cleverrec_tpu.models.base import DataMeta


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _cfg(name, **kw):
    base = {"recommender": name, "init_method": "normal", "stddev": "0.1",
            "optimizer": "Adam", "lr": "0.01", "batch_size": "4",
            "epoches": "1", "neg_ratio": "2", "test.neg_samples": "0",
            "is_pairwise": "True", "loss_func": "bpr"}
    base.update(kw)
    return Config(base)


@pytest.fixture
def rngs():
    return np.random.default_rng(0), jax.random.PRNGKey(0)


def test_bpr_loss_matches_hand_computed(rngs):
    nrng, key = rngs
    meta = DataMeta(6, 9)
    model = make_model(_cfg("BPR", reg="0.05", embed_size="4"), meta)
    params = model.init(key)
    P = np.asarray(params["P"])
    Q = np.asarray(params["Q"])
    u = np.array([0, 2, 5], np.int32)
    i = np.array([1, 3, 8], np.int32)
    j = np.array([2, 0, 4], np.int32)
    w = np.ones(3, np.float32)
    batch = {k: jnp.asarray(v) for k, v in
             {"u": u, "i": i, "j": j, "w": w}.items()}
    got = float(model.loss(params, batch, {}))
    # Reference math: sum -log sigmoid(x_ui - x_uj) + reg*(l2 of gathers).
    diff = np.sum(P[u] * Q[i], axis=1) - np.sum(P[u] * Q[j], axis=1)
    main = np.sum(-np.log(_sigmoid(diff)))
    l2 = 0.5 * (np.sum(P[u] ** 2) + np.sum(Q[i] ** 2) + np.sum(Q[j] ** 2))
    want = main + 0.05 * l2
    assert got == pytest.approx(want, rel=1e-5)


def test_gmf_loss_matches_hand_computed(rngs):
    nrng, key = rngs
    meta = DataMeta(5, 7)
    model = make_model(_cfg("GMF", reg="0.02", embed_size="3",
                            is_pairwise="False",
                            loss_func="cross_entropy"), meta)
    params = model.init(key)
    P, Q, h = (np.asarray(params[k]) for k in ("P", "Q", "h_gmf"))
    u = np.array([0, 1, 4], np.int32)
    i = np.array([2, 6, 0], np.int32)
    y = np.array([1.0, 0.0, 1.0], np.float32)
    batch = {"u": jnp.asarray(u), "i": jnp.asarray(i),
             "y": jnp.asarray(y), "w": jnp.ones(3)}
    got = float(model.loss(params, batch, {}))
    logits = np.sum(P[u] * Q[i] * h, axis=1)
    xent = np.sum(np.maximum(logits, 0) - logits * y
                  + np.log1p(np.exp(-np.abs(logits))))
    l2 = 0.5 * (np.sum(P[u] ** 2) + np.sum(Q[i] ** 2))
    assert got == pytest.approx(xent + 0.02 * l2, rel=1e-5)


def test_cml_loss_matches_hand_computed(rngs):
    nrng, key = rngs
    meta = DataMeta(4, 6)
    model = make_model(_cfg("CML", reg="0.1", embed_size="3", margin="0.5",
                            neg_ratio="2", loss_func="hinge",
                            cml_like="True"), meta)
    params = model.init(key)
    P, Q = np.asarray(params["P"]), np.asarray(params["Q"])
    u = np.array([0, 3], np.int32)
    i = np.array([1, 4], np.int32)
    negs = np.array([[2, 5], [0, 2]], np.int32)
    batch = {"u": jnp.asarray(u), "i": jnp.asarray(i),
             "negs": jnp.asarray(negs), "w": jnp.ones(2)}
    got = float(model.loss(params, batch, {}))
    # Reference: hinge on min-neg distance, WARP log-rank weight, cov reg.
    d_ui = np.sum((P[u] - Q[i]) ** 2, axis=1)
    d_un = np.sum((P[u][:, None, :] - Q[negs]) ** 2, axis=2)
    per = np.maximum(d_ui + 0.5 - d_un.min(axis=1), 0.0)
    imposters = (d_ui[:, None] + 0.5 - d_un) > 0
    rank = imposters.mean(axis=1) * 6 / 2
    main = np.sum(per * np.log(rank + 1.0))
    X = np.concatenate([Q, P], axis=0)
    Xc = X - X.mean(axis=0)
    cov = Xc.T @ Xc / X.shape[0]
    cov_loss = 0.1 * (cov.sum() - np.trace(cov))
    assert got == pytest.approx(main + cov_loss, rel=1e-4, abs=1e-6)


def test_fm_prediction_matches_hand_computed(rngs):
    nrng, key = rngs
    from cleverrec_tpu.rating import FM
    cfg = Config({"recommender": "FM", "embed_size": "3", "reg": "0.0",
                  "lr": "0.01", "optimizer": "Adam", "loss_func": "square",
                  "init_method": "normal", "stddev": "0.1",
                  "batch_size": "4", "epoches": "1"})
    model = FM(cfg, feature_nums=7)
    params = model.init(key)
    w0 = float(params["w0"])
    wi = np.asarray(params["wi"])
    v = np.asarray(params["vif"])
    x_idx = np.array([[0, 3], [2, 5]], np.int32)
    x_val = np.array([[1.0, 2.0], [1.0, 1.0]], np.float32)
    got = np.asarray(model.predict(params, jnp.asarray(x_idx),
                                   jnp.asarray(x_val)))
    for r in range(2):
        lin = w0 + np.sum(wi[x_idx[r]] * x_val[r])
        vx = v[x_idx[r]] * x_val[r][:, None]
        pair = 0.5 * np.sum(np.sum(vx, axis=0) ** 2 - np.sum(vx ** 2, axis=0))
        assert got[r] == pytest.approx(lin + pair, rel=1e-5)


def test_lrml_distance_matches_hand_computed(rngs):
    nrng, key = rngs
    meta = DataMeta(4, 5)
    model = make_model(_cfg("LRML", reg="0.0", embed_size="3", margin="0.2",
                            mem_size="2", loss_func="hinge",
                            cml_like="True"), meta)
    params = model.init(key)
    P, Q, K, M = (np.asarray(params[k]) for k in ("P", "Q", "K", "M"))
    u = np.array([1], np.int32)
    i = np.array([2], np.int32)
    got = np.asarray(model.score_pairs(params, jnp.asarray(u),
                                       jnp.asarray(i), {}))
    joint = P[u] * Q[i]
    att = np.exp(joint @ K)
    att = att / att.sum(axis=1, keepdims=True)
    r = att @ M
    want = np.sum((P[u] + r - Q[i]) ** 2, axis=1)
    assert got[0] == pytest.approx(want[0], rel=1e-5)


def test_tbpr_loss_matches_hand_computed(rngs):
    """TBPR 4-level chain: bpr(x_ui-x_us) + bpr(x_us-x_ut) +
    bpr(x_ut-x_uj) + reg*l2 with x = <P[u],Q[m]> + bias[m]."""
    nrng, key = rngs
    meta = DataMeta(6, 9)
    model = make_model(_cfg("TBPR", reg="0.03", embed_size="4"), meta)
    params = model.init(key)
    params["bias"] = jnp.asarray(
        nrng.normal(size=meta.item_nums + 1).astype(np.float32))
    P = np.asarray(params["P"])
    Q = np.asarray(params["Q"])
    bias = np.asarray(params["bias"])
    u = np.array([0, 2, 5], np.int32)
    i = np.array([1, 3, 8], np.int32)
    s = np.array([2, 4, 0], np.int32)
    t = np.array([5, 6, 2], np.int32)
    j = np.array([7, 0, 4], np.int32)
    w = np.ones(3, np.float32)
    batch = {k: jnp.asarray(v) for k, v in
             {"u": u, "i": i, "s": s, "t": t, "j": j, "w": w}.items()}
    got = float(model.loss(params, batch, {}))

    def x(uu, mm):
        return np.sum(P[uu] * Q[mm], axis=1) + bias[mm]

    main = (np.sum(-np.log(_sigmoid(x(u, i) - x(u, s))))
            + np.sum(-np.log(_sigmoid(x(u, s) - x(u, t))))
            + np.sum(-np.log(_sigmoid(x(u, t) - x(u, j)))))
    l2 = 0.5 * (np.sum(P[u] ** 2)
                + sum(np.sum(Q[m] ** 2) + np.sum(bias[m] ** 2)
                      for m in (i, s, t, j)))
    want = main + 0.03 * l2
    assert got == pytest.approx(want, rel=1e-5)


def test_tbpr_tie_partition():
    """Strong/weak partition invariants: disjoint, exclude own items,
    union == friends' items minus own."""
    from cleverrec_tpu.data.social import build_spu, build_tie_partitioned_spu
    rng = np.random.default_rng(3)
    ui = {u: sorted(set(rng.integers(0, 20, 6).tolist()))
          for u in range(12)}
    friends = {u: [v for v in rng.choice(12, 4, replace=False).tolist()
                   if v != u] for u in range(12)}
    strong, weak = build_tie_partitioned_spu(ui, friends, 0.5)
    spu, _ = build_spu(ui, friends)
    for u in set(strong) | set(weak):
        s = set(strong.get(u, []))
        w = set(weak.get(u, []))
        assert not (s & w)
        assert not (s | w) & set(ui.get(u, []))
        assert (s | w) == set(spu.get(u, []))
