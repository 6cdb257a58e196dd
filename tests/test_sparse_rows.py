"""Lazy row-Adam scan tier for rows protocols (trainer
_build_sparse_rows_epoch_fn + ops/sparse_adam) — round-4 verdict item 1.

Semantics under test: per step, the batch's plane gradients (duplicates
summed, exactly like a dense scatter-add) drive an Adam update of ONLY
the touched rows; untouched rows' moments do not decay (LazyAdam), with
the global step count for bias correction.  Pinned against a dense
numpy oracle that scatters row grads into full tables and lazily
updates the touched-row set.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cleverrec_tpu import sampling
from cleverrec_tpu.data import load_ranking_data
from cleverrec_tpu.models import make_model
from cleverrec_tpu.models.base import DataMeta
from cleverrec_tpu.train import Trainer
from tests.conftest import base_config

B1, B2, EPS = 0.9, 0.999, 1e-8


def _trainer(toy, **ov):
    base = {"epoches": "2", "batch_size": "32", "embed_size": "16",
            "lr": "0.05", "neg_ratio": "2", "is_pairwise": "True",
            "loss_func": "bpr", "reg": "0.05", "stddev": "0.1",
            "train.fused_kernel": "False",
            "train.sparse_rows_force": "True"}
    base.update(ov)
    cfg = base_config(toy, **base)
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    return Trainer(model, data, cfg)


def _lazy_update(tbl, m, v, g_dense, touched, count, lr):
    """Dense-scatter lazy-Adam oracle: update only the touched rows."""
    t = count + 1
    m[touched] = B1 * m[touched] + (1 - B1) * g_dense[touched]
    v[touched] = B2 * v[touched] + (1 - B2) * g_dense[touched] ** 2
    mhat = m[touched] / (1 - B1 ** t)
    vhat = v[touched] / (1 - B2 ** t)
    tbl[touched] = tbl[touched] - lr * mhat / (np.sqrt(vhat) + EPS)


def _oracle_epoch(tr, spec, batch_all, params, opt):
    """Dense-scatter lazy-Adam replay of one whole-epoch batch tensor:
    returns (P, QI, D, mP, count0, losses) after ``steps`` updates."""
    names = tuple(n for n, _ in spec["planes"])
    sides = tuple(sd for _, sd in spec["planes"])
    lr = tr.cfg.lr
    steps = tr.steps_per_epoch
    adam_st = opt[0]
    P, QI, D = [np.array(x) for x in spec["pack"](params)[:2]] + [
        [np.array(d) for d in spec["pack"](params)[2]]]
    mP, mQI, mD = [np.array(x) for x in spec["pack"](adam_st.mu)[:2]] + [
        [np.array(d) for d in spec["pack"](adam_st.mu)[2]]]
    vP, vQI, vD = [np.array(x) for x in spec["pack"](adam_st.nu)[:2]] + [
        [np.array(d) for d in spec["pack"](adam_st.nu)[2]]]
    count0 = int(adam_st.count)
    losses = []
    for t in range(steps):
        batch = {k: np.asarray(v[t]) for k, v in batch_all.items()}
        wv = jnp.asarray(batch["w"])[:, None]
        flts = tuple(jnp.asarray(batch[n], jnp.float32)[:, None]
                     for n in spec["floats"])
        ids = tuple(batch[n].astype(np.int32) for n in names)
        rows_g = tuple(jnp.asarray((P if sd == "u" else QI)[idx])
                       for idx, sd in zip(ids, sides))
        dn = tuple(jnp.asarray(d) for d in D)
        loss, (g_rows, g_dense) = jax.value_and_grad(
            lambda rg, d_: spec["row_loss"](rg, flts, d_, wv),
            argnums=(0, 1))(rows_g, dn)
        losses.append(float(loss))
        # Dense scatter-add of per-occurrence row grads, then lazy
        # update of the touched sets.
        gP = np.zeros_like(P)
        gQI = np.zeros_like(QI)
        for idx, sd, g in zip(ids, sides, g_rows):
            np.add.at(gP if sd == "u" else gQI, idx, np.asarray(g))
        u_touch = np.unique(np.concatenate(
            [idx for idx, sd in zip(ids, sides) if sd == "u"]))
        i_touch = np.unique(np.concatenate(
            [idx for idx, sd in zip(ids, sides) if sd == "i"]))
        cnt = count0 + t
        _lazy_update(P, mP, vP, gP, u_touch, cnt, lr)
        _lazy_update(QI, mQI, vQI, gQI, i_touch, cnt, lr)
        for k_ in range(len(D)):
            g_ = np.asarray(g_dense[k_])
            mD[k_] = B1 * mD[k_] + (1 - B1) * g_
            vD[k_] = B2 * vD[k_] + (1 - B2) * g_ ** 2
            D[k_] = D[k_] - lr * (mD[k_] / (1 - B1 ** (cnt + 1))) / (
                np.sqrt(vD[k_] / (1 - B2 ** (cnt + 1))) + EPS)
    return P, QI, D, mP, int(adam_st.count), losses


def _assert_matches_oracle(tr, spec, batch_all, params, opt,
                           got_p, got_o, got_loss):
    P, QI, D, mP, count0, losses = _oracle_epoch(
        tr, spec, batch_all, params, opt)
    # f32 trajectory tolerance: the tier sums duplicate grads in
    # sorted-segment order vs the oracle's sequential np.add.at, and
    # early Adam steps (tiny v_hat) amplify reordering — same tolerance
    # class as the fused==scan trainer pin.
    got_P, got_QI, got_D = spec["pack"](got_p)
    np.testing.assert_allclose(np.asarray(got_P), P, rtol=4e-3,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_QI), QI, rtol=4e-3,
                               atol=1e-5)
    for gd, d_ in zip(got_D, D):
        np.testing.assert_allclose(np.asarray(gd), d_, rtol=4e-3,
                                   atol=1e-5)
    got_mP = spec["pack"](got_o[0].mu)[0]
    np.testing.assert_allclose(np.asarray(got_mP), mP, rtol=4e-3,
                               atol=1e-6)
    assert int(got_o[0].count) == count0 + tr.steps_per_epoch
    assert float(got_loss) == pytest.approx(np.mean(losses), rel=1e-5)


@pytest.mark.parametrize("name", ["SBPR", "CUNE_BPR"])
def test_sparse_rows_matches_dense_scatter_oracle(name,
                                                  toy_social_dataset):
    ov = {"recommender": name, "social_file": "trusts.csv"}
    if name == "CUNE_BPR":
        ov.update({"walk_count": "2", "walk_length": "4", "walk_dim": "8",
                   "window_size": "2", "topk_f": "3", "reg": "0.01"})
    tr = _trainer(toy_social_dataset, **ov)
    assert getattr(tr, "_sparse_tier", False)
    spec = tr.model.fused_rows_spec()
    params, opt = tr.init_state()
    key = jax.random.PRNGKey(3)
    got_p, got_o, got_loss = jax.jit(tr._epoch_body)(
        params, opt, key, tr.arrays)

    # Oracle: replay the SAME whole-epoch sampled batches.
    steps, b = tr.steps_per_epoch, tr.batch_size
    pkey, _ = jax.random.split(key)
    batch_all = sampling.sbpr_epoch_tensors(
        pkey, tr.arrays["sbpr_static"], tr.arrays["social_neg"],
        tr.arrays["spu_csr"], tr.dd.item_nums, steps, b)
    _assert_matches_oracle(tr, spec, batch_all, params, opt,
                           got_p, got_o, got_loss)


def test_sparse_rows_bpr_matches_dense_scatter_oracle(toy_dataset):
    """The pairwise (BPR) extension of the tier: same lazy row-Adam
    semantics over the (u, i, j) planes with the whole-epoch pairwise
    sampling tensors (round-5 catalog-scale train work)."""
    tr = _trainer(toy_dataset, recommender="BPR")
    assert getattr(tr, "_sparse_tier", False)
    spec = tr.model.fused_rows_spec()
    params, opt = tr.init_state()
    key = jax.random.PRNGKey(3)
    got_p, got_o, got_loss = jax.jit(tr._epoch_body)(
        params, opt, key, tr.arrays)

    steps, b = tr.steps_per_epoch, tr.batch_size
    pkey, _ = jax.random.split(key)
    batch_all = sampling.pairwise_epoch_tensors(
        pkey, tr.arrays["pairwise_static"], tr.arrays["seen"],
        tr.dd.item_nums, steps, b)
    _assert_matches_oracle(tr, spec, batch_all, params, opt,
                           got_p, got_o, got_loss)


def test_sparse_rows_trains_and_evaluates(toy_social_dataset):
    tr = _trainer(toy_social_dataset, recommender="SBPR",
                  social_file="trusts.csv", epoches="4")
    assert getattr(tr, "_sparse_tier", False)
    params, opt = tr.init_state()
    losses = []
    for _ in range(4):
        params, opt, loss = tr.train_epoch(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    res = tr.evaluate(params)
    assert all(np.isfinite(np.asarray(v)).all() for v in res.values())


def test_sparse_rows_not_default_when_resident_fits(toy_social_dataset):
    """Without the force flag and with the resident plan fitting (toy
    shapes), the tier stays off — it is the rows-OVERFLOW fallback."""
    tr = _trainer(toy_social_dataset, recommender="SBPR",
                  social_file="trusts.csv",
                  **{"train.sparse_rows_force": "False"})
    assert not getattr(tr, "_sparse_tier", False)


def test_sparse_rows_adam_dedup():
    """dedup_rows sums duplicate ids' grads and pads unused slots out
    of range; sparse_rows_adam drops those slots."""
    from cleverrec_tpu.ops.sparse_adam import dedup_rows, sparse_rows_adam
    ids = jnp.asarray([3, 1, 3, 1, 1], jnp.int32)
    g = jnp.arange(10, dtype=jnp.float32).reshape(5, 2)
    rep, gsum = dedup_rows(ids, g, 6)
    rep = np.asarray(rep)
    gsum = np.asarray(gsum)
    d = {int(r): gsum[k] for k, r in enumerate(rep) if r < 6}
    np.testing.assert_allclose(d[3], g[0] + g[2])
    np.testing.assert_allclose(d[1], g[1] + g[3] + g[4])
    assert (rep >= 6).sum() == 3
    tbl = jnp.ones((6, 2))
    m = jnp.zeros((6, 2))
    v = jnp.zeros((6, 2))
    t2, m2, v2 = sparse_rows_adam(tbl, m, v, ids, g, jnp.int32(0), 0.1)
    # Untouched rows unchanged.
    for r in (0, 2, 4, 5):
        np.testing.assert_array_equal(np.asarray(t2[r]), np.ones(2))
        np.testing.assert_array_equal(np.asarray(m2[r]), np.zeros(2))
    # Touched rows: first Adam step moves by ~lr against the grad sign.
    assert (np.asarray(t2[1]) < 1.0).all() and (np.asarray(t2[3]) < 1.0).all()
