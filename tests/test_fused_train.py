"""VMEM-resident fused training epoch (ops/pallas_train.py): numerics
parity against the scan-based epoch, via interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cleverrec_tpu.data import load_ranking_data
from cleverrec_tpu.models import make_model
from cleverrec_tpu.models.base import DataMeta
from cleverrec_tpu.ops.pallas_train import (LOG2, fused_bpr_epoch,
                                            sentinel_dims)
from cleverrec_tpu.train import Trainer
from tests.conftest import base_config


def test_fused_epoch_matches_optax_oracle():
    """Kernel vs a literal optax.adam step loop on random data, including
    sentinel-encoded invalid rows."""
    rng = np.random.default_rng(0)
    u_n, i_n, d = 37, 53, 16
    steps, b = 4, 64
    lr, reg = 0.01, 0.02
    u_pad, i_pad = sentinel_dims(u_n, i_n)
    u = rng.integers(0, u_n, (steps, b)).astype(np.int32)
    i = rng.integers(0, i_n, (steps, b)).astype(np.int32)
    j = rng.integers(0, i_n, (steps, b)).astype(np.int32)
    invalid = rng.random((steps, b)) < 0.15
    u_s = np.where(invalid, u_pad - 1, u)
    i_s = np.where(invalid, i_pad - 1, i)
    j_s = np.where(invalid, i_pad - 1, j)
    p0 = rng.normal(size=(u_n, d)).astype(np.float32) * 0.1
    q0 = rng.normal(size=(i_n, d)).astype(np.float32) * 0.1

    opt = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    params = {"P": jnp.asarray(p0), "Q": jnp.asarray(q0)}
    state = opt.init(params)
    w = (~invalid).astype(np.float32)

    def loss_fn(params, ub, ib, jb, wb):
        ue = params["P"][ub] * wb[:, None]
        ie = params["Q"][ib] * wb[:, None]
        je = params["Q"][jb] * wb[:, None]
        diff = jnp.sum(ue * ie, 1) - jnp.sum(ue * je, 1)
        l2 = lambda x: 0.5 * jnp.sum(x * x)  # noqa: E731
        return (jnp.sum(-jax.nn.log_sigmoid(diff) * wb)
                + reg * (l2(ue) + l2(ie) + l2(je)))

    total = 0.0
    for s in range(steps):
        l, g = jax.value_and_grad(loss_fn)(params, u[s], i[s], j[s], w[s])
        upd, state = opt.update(g, state, params)
        params = optax.apply_updates(params, upd)
        total += float(l)

    zu = jnp.zeros((u_n, d), jnp.float32)
    zi = jnp.zeros((i_n, d), jnp.float32)
    outs = fused_bpr_epoch(jnp.asarray(p0), jnp.asarray(q0), zu, zu, zi, zi,
                           jnp.asarray(u_s), jnp.asarray(i_s),
                           jnp.asarray(j_s), jnp.asarray(0, jnp.int32),
                           lr=lr, reg=reg, blk=8, interpret=True)
    loss_corr = float(outs[6]) - int(invalid.sum()) * LOG2
    assert loss_corr == pytest.approx(total, rel=1e-5)
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(params["P"]),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(outs[1]), np.asarray(params["Q"]),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(outs[2]),
                               np.asarray(state[0].mu["P"]),
                               rtol=2e-4, atol=2e-7)


def test_fused_trainer_matches_scan_trainer(toy_dataset):
    """Trainer with train.fused_kernel=True reproduces the scan epoch's
    numerics (identical sampling key stream by construction)."""
    ov = {"epoches": "2", "batch_size": "64", "embed_size": "16",
          "lr": "0.05", "neg_ratio": "2", "is_pairwise": "True",
          "loss_func": "bpr", "reg": "0.01"}
    cfg_scan = base_config(toy_dataset, **ov,
                           **{"train.fused_kernel": "False"})
    cfg_fused = base_config(toy_dataset, **ov,
                            **{"train.fused_kernel": "True"})
    data = load_ranking_data(cfg_scan)
    model = make_model(cfg_scan, DataMeta(data.user_nums, data.item_nums))
    t_scan = Trainer(model, data, cfg_scan)
    t_fused = Trainer(model, data, cfg_fused)
    assert t_fused._epoch_fn is not t_scan._epoch_fn
    p0, o0 = t_scan.init_state()
    p1, o1 = t_fused.init_state()
    for _ in range(3):
        p0, o0, l0 = t_scan.train_epoch(p0, o0)
        p1, o1, l1 = t_fused.train_epoch(p1, o1)
        assert l1 == pytest.approx(l0, rel=1e-4), (l0, l1)
    np.testing.assert_allclose(np.asarray(p1["P"]), np.asarray(p0["P"]),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p1["Q"]), np.asarray(p0["Q"]),
                               rtol=1e-3, atol=1e-5)
    # Adam state advanced identically.
    assert int(o1[0].count) == int(o0[0].count)
    # Eval metrics agree.
    r0 = t_scan.evaluate(p0)
    r1 = t_fused.evaluate(p1)
    for k in r0:
        assert r1[k] == pytest.approx(r0[k], abs=2e-4)


def test_fused_trainer_multi_epoch_block(toy_dataset):
    """train_epochs (scan over epochs) works over the fused epoch body."""
    ov = {"epoches": "4", "batch_size": "64", "embed_size": "16",
          "lr": "0.05", "neg_ratio": "2", "is_pairwise": "True",
          "loss_func": "bpr", "reg": "0.01",
          "train.fused_kernel": "True"}
    cfg = base_config(toy_dataset, **ov)
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    tr = Trainer(model, data, cfg)
    params, opt = tr.init_state()
    params, opt, losses = tr.train_epochs(params, opt, 3)
    assert len(losses) == 3
    assert losses[-1] < losses[0]
    assert int(opt[0].count) == 3 * tr.steps_per_epoch


def test_fused_not_eligible_for_hinge_loss(toy_dataset):
    """The kernel hard-codes the bpr objective: loss_func=hinge must take
    the scan path even with train.fused_kernel=True (regression: it once
    silently trained log-sigmoid under a hinge config)."""
    ov = {"epoches": "1", "batch_size": "64", "embed_size": "16",
          "lr": "0.05", "is_pairwise": "True", "loss_func": "hinge",
          "margin": "0.5", "reg": "0.01", "train.fused_kernel": "True"}
    cfg = base_config(toy_dataset, **ov)
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    tr = Trainer(model, data, cfg)
    assert not tr._fused_epoch_eligible()
    p, o = tr.init_state()
    p, o, loss = tr.train_epoch(p, o)
    assert np.isfinite(loss)


def test_fused_gmf_epoch_matches_optax_oracle():
    """Pointwise (GMF) kernel vs a literal optax.adam step loop on random
    data, including sentinel-encoded invalid rows and the sign-encoded
    label stream."""
    from cleverrec_tpu.ops.pallas_train import fused_gmf_epoch
    rng = np.random.default_rng(1)
    u_n, i_n, d = 29, 41, 16
    steps, b = 4, 64
    lr, reg = 0.01, 0.02
    u_pad, i_pad = sentinel_dims(u_n, i_n)
    u = rng.integers(0, u_n, (steps, b)).astype(np.int32)
    i = rng.integers(0, i_n, (steps, b)).astype(np.int32)
    y = (rng.random((steps, b)) < 0.3).astype(np.float32)
    invalid = rng.random((steps, b)) < 0.15
    z = np.where(y > 0, 1, -1)
    uz = np.where(invalid, u_pad, (u + 1) * z).astype(np.int32)
    i_s = np.where(invalid, i_pad - 1, i).astype(np.int32)
    p0 = rng.normal(size=(u_n, d)).astype(np.float32) * 0.1
    q0 = rng.normal(size=(i_n, d)).astype(np.float32) * 0.1
    h0 = rng.normal(size=(d,)).astype(np.float32) * 0.5

    opt = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    params = {"P": jnp.asarray(p0), "Q": jnp.asarray(q0),
              "h_gmf": jnp.asarray(h0)}
    state = opt.init(params)
    w = (~invalid).astype(np.float32)

    def loss_fn(params, ub, ib, yb, wb):
        # models/ncf.py GMF.loss verbatim (no h regularization).
        ue = params["P"][ub] * wb[:, None]
        ie = params["Q"][ib] * wb[:, None]
        logits = jnp.sum(ue * ie * params["h_gmf"], axis=1)
        x, zl = logits, yb
        per_row = (jnp.maximum(x, 0.0) - x * zl
                   + jnp.log1p(jnp.exp(-jnp.abs(x)))) * wb
        l2 = lambda v: 0.5 * jnp.sum(v * v)  # noqa: E731
        return jnp.sum(per_row) + reg * (l2(ue) + l2(ie))

    total = 0.0
    for s in range(steps):
        l, g = jax.value_and_grad(loss_fn)(params, u[s], i[s], y[s], w[s])
        upd, state = opt.update(g, state, params)
        params = optax.apply_updates(params, upd)
        total += float(l)

    zu = jnp.zeros((u_n, d), jnp.float32)
    zi = jnp.zeros((i_n, d), jnp.float32)
    zh = jnp.zeros((d,), jnp.float32)
    outs = fused_gmf_epoch(jnp.asarray(p0), jnp.asarray(q0),
                           jnp.asarray(h0), zu, zu, zi, zi, zh, zh,
                           jnp.asarray(uz), jnp.asarray(i_s),
                           jnp.asarray(0, jnp.int32),
                           lr=lr, reg=reg, blk=8, interpret=True)
    loss_corr = float(outs[9]) - int(invalid.sum()) * LOG2
    assert loss_corr == pytest.approx(total, rel=1e-5)
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(params["P"]),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(outs[1]), np.asarray(params["Q"]),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(outs[2]),
                               np.asarray(params["h_gmf"]),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(outs[7]),
                               np.asarray(state[0].mu["h_gmf"]),
                               rtol=2e-4, atol=2e-7)


def test_fused_gmf_trainer_matches_scan_trainer(toy_dataset):
    """GMF Trainer with train.fused_kernel=True reproduces the scan
    epoch's numerics (identical pointwise sampling stream by
    construction)."""
    # stddev 0.1 (not the 0.01 default): at 0.01 every gradient is
    # ~|h|*|Q| ~ 1e-4 and near-cancelling scatter-adds leave ~ulp-scale
    # residuals whose ORDER differs between XLA's scatter and the
    # kernel's one-hot matmul; Adam's g/(|g|+eps) then amplifies those
    # into visible param drift.  The exact-math check is the optax
    # oracle test above; this test pins the trainer wiring (key stream,
    # sentinel mapping, state threading) in a healthy-gradient regime.
    ov = {"epoches": "2", "batch_size": "64", "embed_size": "16",
          "lr": "0.05", "neg_ratio": "2", "is_pairwise": "False",
          "loss_func": "cross_entropy", "reg": "0.01", "stddev": "0.1",
          "recommender": "GMF"}
    cfg_scan = base_config(toy_dataset, **ov,
                           **{"train.fused_kernel": "False"})
    cfg_fused = base_config(toy_dataset, **ov,
                            **{"train.fused_kernel": "True"})
    data = load_ranking_data(cfg_scan)
    model = make_model(cfg_scan, DataMeta(data.user_nums, data.item_nums))
    t_scan = Trainer(model, data, cfg_scan)
    t_fused = Trainer(model, data, cfg_fused)
    assert t_fused._epoch_fn is not t_scan._epoch_fn
    p0, o0 = t_scan.init_state()
    p1, o1 = t_fused.init_state()
    for _ in range(3):
        p0, o0, l0 = t_scan.train_epoch(p0, o0)
        p1, o1, l1 = t_fused.train_epoch(p1, o1)
        assert l1 == pytest.approx(l0, rel=1e-4), (l0, l1)
    np.testing.assert_allclose(np.asarray(p1["P"]), np.asarray(p0["P"]),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(p1["Q"]), np.asarray(p0["Q"]),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(p1["h_gmf"]),
                               np.asarray(p0["h_gmf"]),
                               rtol=1e-3, atol=1e-4)
    assert int(o1[0].count) == int(o0[0].count)
    r0 = t_scan.evaluate(p0)
    r1 = t_fused.evaluate(p1)
    for k in r0:
        assert r1[k] == pytest.approx(r0[k], abs=2e-4)


@pytest.mark.parametrize("i_n", [41, 2200, 2100])
def test_fused_cml_epoch_matches_optax_oracle(i_n):
    """CML kernel vs a literal optax.adam step loop replicating
    models/metric.py CML.loss (WARP-weighted min-negative hinge +
    full-table covariance regularizer) on random data, including
    sentinel-encoded invalid rows.  i_n=2200 pads to i_pad=2304 > 2048,
    exercising the MULTI-SLAB distance/mask walk (2 slabs of 1152);
    i_n=2100 pads to i_pad=2176=17*128 with NO usable slab divisor,
    exercising cml_table_pad's pad-to-3072 path (3 slabs of 1024)."""
    from cleverrec_tpu.ops.pallas_train import (cml_sentinel_bias,
                                                fused_cml_epoch)
    rng = np.random.default_rng(3)
    u_n, d, K = 29, 16, 4
    steps, b = 4, 64
    lr, reg, margin = 0.01, 0.05, 1.0
    u_pad, i_pad = sentinel_dims(u_n, i_n)
    u = rng.integers(0, u_n, (steps, b)).astype(np.int32)
    i = rng.integers(0, i_n, (steps, b)).astype(np.int32)
    negs = rng.integers(0, i_n, (steps, b, K)).astype(np.int32)
    invalid = rng.random((steps, b)) < 0.15
    u_s = np.where(invalid, u_pad - 1, u).astype(np.int32)
    i_s = np.where(invalid, i_pad - 1, i).astype(np.int32)
    n_s = np.where(invalid[..., None], i_pad - 1, negs).astype(np.int32)
    p0 = rng.normal(size=(u_n, d)).astype(np.float32) * 0.1
    q0 = rng.normal(size=(i_n, d)).astype(np.float32) * 0.1

    opt = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    params = {"P": jnp.asarray(p0), "Q": jnp.asarray(q0)}
    state = opt.init(params)
    w = (~invalid).astype(np.float32)

    def loss_fn(params, ub, ib, nb, wb):
        # models/metric.py CML.loss verbatim over this batch.
        ue = params["P"][ub]
        ie = params["Q"][ib]
        ne = params["Q"][nb]
        d_ui = jnp.sum(jnp.square(ue - ie), axis=1)
        d_un = jnp.sum(jnp.square(ue[:, None, :] - ne), axis=2)
        d_min = jnp.min(d_un, axis=1)
        per_pair = jnp.maximum(d_ui + margin - d_min, 0.0)
        imposters = (d_ui[:, None] + margin - d_un) > 0
        rank = (jnp.mean(imposters.astype(jnp.float32), axis=1)
                * i_n / K)
        per_pair = per_pair * jnp.log(rank + 1.0) * wb
        x = jnp.concatenate([params["Q"], params["P"]], axis=0)
        xc = x - jnp.mean(x, axis=0)
        cov = (xc.T @ xc) / x.shape[0]
        cov_loss = reg * (jnp.sum(cov) - jnp.trace(cov))
        return jnp.sum(per_pair) + cov_loss

    total = 0.0
    for s in range(steps):
        l, g = jax.value_and_grad(loss_fn)(params, u[s], i[s], negs[s],
                                           w[s])
        upd, state = opt.update(g, state, params)
        params = optax.apply_updates(params, upd)
        total += float(l)

    zu = jnp.zeros((u_n, d), jnp.float32)
    zi = jnp.zeros((i_n, d), jnp.float32)
    outs = fused_cml_epoch(jnp.asarray(p0), jnp.asarray(q0),
                           zu, zu, zi, zi,
                           jnp.asarray(u_s), jnp.asarray(i_s),
                           jnp.asarray(n_s), jnp.asarray(0, jnp.int32),
                           lr=lr, reg=reg, margin=margin, item_nums=i_n,
                           blk=8, interpret=True)
    loss_corr = (float(outs[6])
                 - int(invalid.sum()) * cml_sentinel_bias(margin, i_n, K))
    assert loss_corr == pytest.approx(total, rel=1e-5)
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(params["P"]),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(outs[1]), np.asarray(params["Q"]),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(outs[3]),
                               np.asarray(state[0].nu["P"]),
                               rtol=2e-4, atol=2e-9)


def test_fused_cml_trainer_matches_scan_trainer(toy_dataset):
    """CML Trainer with train.fused_kernel=True reproduces the scan
    epoch's numerics (identical cml sampling stream by construction)."""
    ov = {"epoches": "2", "batch_size": "64", "embed_size": "16",
          "lr": "0.05", "neg_ratio": "3", "is_pairwise": "True",
          "loss_func": "hinge", "margin": "1.0", "reg": "0.05",
          "stddev": "0.1", "recommender": "CML"}
    cfg_scan = base_config(toy_dataset, **ov,
                           **{"train.fused_kernel": "False"})
    cfg_fused = base_config(toy_dataset, **ov,
                            **{"train.fused_kernel": "True"})
    data = load_ranking_data(cfg_scan)
    model = make_model(cfg_scan, DataMeta(data.user_nums, data.item_nums))
    t_scan = Trainer(model, data, cfg_scan)
    t_fused = Trainer(model, data, cfg_fused)
    assert t_fused._epoch_fn is not t_scan._epoch_fn
    p0, o0 = t_scan.init_state()
    p1, o1 = t_fused.init_state()
    for _ in range(3):
        p0, o0, l0 = t_scan.train_epoch(p0, o0)
        p1, o1, l1 = t_fused.train_epoch(p1, o1)
        assert l1 == pytest.approx(l0, rel=1e-4), (l0, l1)
    np.testing.assert_allclose(np.asarray(p1["P"]), np.asarray(p0["P"]),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(p1["Q"]), np.asarray(p0["Q"]),
                               rtol=1e-3, atol=1e-4)
    assert int(o1[0].count) == int(o0[0].count)
    r0 = t_scan.evaluate(p0)
    r1 = t_fused.evaluate(p1)
    for k in r0:
        assert r1[k] == pytest.approx(r0[k], abs=2e-4)


def test_grouped_trainer_matches_blockwise_adam_oracle(tmp_path):
    """The GROUPED fused epoch (user-axis block-coordinate Adam for
    VMEM-overflow catalogs) vs an independent optax-based oracle that
    applies adam to {P-group-slice, Q} sub-params per group, replaying
    the identical per-group sampling streams."""
    import optax as _optax
    from cleverrec_tpu import sampling
    from tests.conftest import make_toy_interactions

    ds = tmp_path / "big"
    ds.mkdir()
    make_toy_interactions(ds / "ratings.csv", n_users=300, n_items=60,
                          n_rows=4000)
    toy = {"root": str(tmp_path), "name": "big"}
    ov = {"epoches": "1", "batch_size": "64", "embed_size": "8",
          "lr": "0.01", "neg_ratio": "2", "is_pairwise": "True",
          "loss_func": "bpr", "reg": "0.01", "stddev": "0.1",
          "recommender": "BPR", "train.fused_kernel": "True",
          "train.fused_groups": "2"}
    cfg = base_config(toy, **ov)
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    tr = Trainer(model, data, cfg)
    assert tr._fused_grouped_plan is not None
    G, rows, _ = tr._fused_grouped_plan
    assert G == 2
    p0, o0 = tr.init_state()
    key = jax.random.PRNGKey(123)
    p1, o1, loss1 = jax.tree_util.tree_map(
        np.asarray, tr._epoch_body(p0, o0, key, tr.arrays))

    # -- oracle ----------------------------------------------------------
    lr, reg = cfg.lr, model.reg
    b = cfg.batch_size
    statics = tr.arrays["grouped_static"]     # stacked [G, ...] planes
    steps_list = [statics["ord_u"].shape[1] // b] * G
    step_off = [sum(steps_list[:g]) for g in range(G)]
    item_nums = data.item_nums
    d = model.embed_size
    new_of_old, old_of_new = tr._grouped_perm
    P = np.pad(np.asarray(p0["P"]), ((0, 1), (0, 0)))[old_of_new]
    Q = np.asarray(p0["Q"])
    mP, vP = np.zeros_like(P), np.zeros_like(P)
    mQ, vQ = np.zeros_like(Q), np.zeros_like(Q)
    opt = _optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)

    def loss_fn(sub, ub, ib, jb, wb):
        pe = sub["P"][ub] * wb[:, None]
        qi = sub["Q"][ib] * wb[:, None]
        qj = sub["Q"][jb] * wb[:, None]
        diff = jnp.sum(pe * (qi - qj), axis=1)
        l2 = lambda v: 0.5 * jnp.sum(v * v)  # noqa: E731
        return (jnp.sum(-jax.nn.log_sigmoid(diff) * wb)
                + reg * (l2(pe) + l2(qi) + l2(qj)))

    total = 0.0
    gkeys = jax.random.split(key, G)
    for g in range(G):
        pkey, _ = jax.random.split(gkeys[g])
        batch = jax.tree_util.tree_map(np.asarray, sampling.pairwise_epoch_tensors(
            pkey, {k: v[g] for k, v in statics.items()},
            tr.arrays["grouped_seen"], item_nums, steps_list[g], b))
        g0 = g * rows
        sub = {"P": jnp.asarray(P[g0:g0 + rows]), "Q": jnp.asarray(Q)}
        st = (_optax.ScaleByAdamState(
            count=jnp.asarray(step_off[g], jnp.int32),
            mu={"P": jnp.asarray(mP[g0:g0 + rows]), "Q": jnp.asarray(mQ)},
            nu={"P": jnp.asarray(vP[g0:g0 + rows]), "Q": jnp.asarray(vQ)}),
            _optax.EmptyState())
        for s in range(steps_list[g]):
            w = batch["w"][s]
            u_loc = np.where(w > 0, batch["u"][s] - g0, 0)
            l, grads = jax.value_and_grad(loss_fn)(
                sub, u_loc, batch["i"][s], batch["j"][s],
                jnp.asarray(w))
            upd, st = opt.update(grads, st, sub)
            sub = _optax.apply_updates(sub, upd)
            total += float(l)
        P[g0:g0 + rows] = np.asarray(sub["P"])
        Q = np.asarray(sub["Q"])
        mP[g0:g0 + rows] = np.asarray(st[0].mu["P"])
        vP[g0:g0 + rows] = np.asarray(st[0].nu["P"])
        mQ, vQ = np.asarray(st[0].mu["Q"]), np.asarray(st[0].nu["Q"])

    assert float(loss1) == pytest.approx(total / sum(steps_list), rel=1e-4)
    np.testing.assert_allclose(p1["P"], P[new_of_old],
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(p1["Q"], Q, rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(o1[0].mu["P"]),
                               mP[new_of_old], rtol=2e-4, atol=1e-6)
    assert int(o1[0].count) == sum(steps_list)


def test_grouped_plan_on_vmem_overflow():
    """ml-1m-shaped state at embed 64 overflows the ungrouped VMEM
    budget; the grouped planner covers it with 4 user groups (2 groups
    would need a 17.3MB kernel — over the 16MB VMEM ceiling — with the
    physical >=128-lane one-hot footprint accounted)."""
    from cleverrec_tpu.ops.pallas_train import (plan_fused,
                                                plan_fused_grouped)
    assert plan_fused(6040, 3706, 64, 6144) is None
    plan = plan_fused_grouped(6040, 3706, 64, 6144)
    assert plan is not None
    g, rows, blk = plan
    assert g * rows >= 6040
    assert g == 4


def test_grouped_gmf_trainer_matches_blockwise_adam_oracle(tmp_path):
    """Pointwise (GMF) grouped fused epoch vs the optax block-coordinate
    oracle — pins the uz local-id sign encoding, h threading, and
    per-group pointwise statics."""
    import optax as _optax
    from cleverrec_tpu import sampling
    from tests.conftest import make_toy_interactions

    ds = tmp_path / "bigp"
    ds.mkdir()
    make_toy_interactions(ds / "ratings.csv", n_users=300, n_items=60,
                          n_rows=4000, seed=2)
    toy = {"root": str(tmp_path), "name": "bigp"}
    # lr=0.001: at lr=0.01 f32 reduction-order noise amplifies through
    # the h-product chain + Adam sqrt(v) to ~6e-4 drift (measured to
    # scale superlinearly down to ~5e-7 at lr=1e-3), which would force
    # a loose tolerance; the small lr keeps this an EXACT pin on the
    # permutation/sign-encoding logic.
    ov = {"epoches": "1", "batch_size": "64", "embed_size": "8",
          "lr": "0.001", "neg_ratio": "2", "is_pairwise": "False",
          "loss_func": "cross_entropy", "reg": "0.01", "stddev": "0.1",
          "recommender": "GMF", "train.fused_kernel": "True",
          "train.fused_groups": "2"}
    cfg = base_config(toy, **ov)
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    tr = Trainer(model, data, cfg)
    assert tr._fused_grouped_plan is not None
    G, rows, _ = tr._fused_grouped_plan
    p0, o0 = tr.init_state()
    key = jax.random.PRNGKey(321)
    p1, o1, loss1 = jax.tree_util.tree_map(
        np.asarray, tr._epoch_body(p0, o0, key, tr.arrays))

    lr, reg = cfg.lr, model.reg
    b = cfg.batch_size
    statics = tr.arrays["grouped_static"]     # stacked [G, ...] planes
    steps_list = [statics["ord_u"].shape[1] // b] * G
    step_off = [sum(steps_list[:g]) for g in range(G)]
    item_nums = data.item_nums
    new_of_old, old_of_new = tr._grouped_perm
    P = np.pad(np.asarray(p0["P"]), ((0, 1), (0, 0)))[old_of_new]
    Q = np.asarray(p0["Q"])
    h = np.asarray(p0["h_gmf"])
    mP, vP = np.zeros_like(P), np.zeros_like(P)
    mQ, vQ = np.zeros_like(Q), np.zeros_like(Q)
    mh, vh = np.zeros_like(h), np.zeros_like(h)
    opt = _optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)

    def loss_fn(sub, ub, ib, yb, wb):
        ue = sub["P"][ub] * wb[:, None]
        ie = sub["Q"][ib] * wb[:, None]
        x = jnp.sum(ue * ie * sub["h_gmf"], axis=1)
        per_row = (jnp.maximum(x, 0.0) - x * yb
                   + jnp.log1p(jnp.exp(-jnp.abs(x)))) * wb
        l2 = lambda v: 0.5 * jnp.sum(v * v)  # noqa: E731
        return jnp.sum(per_row) + reg * (l2(ue) + l2(ie))

    total = 0.0
    gkeys = jax.random.split(key, G)
    for g in range(G):
        pkey, _ = jax.random.split(gkeys[g])
        batch = jax.tree_util.tree_map(np.asarray, sampling.pointwise_epoch_tensors(
            pkey, {k: v[g] for k, v in statics.items()},
            tr.arrays["grouped_seen"], item_nums, steps_list[g], b))
        g0 = g * rows
        sub = {"P": jnp.asarray(P[g0:g0 + rows]), "Q": jnp.asarray(Q),
               "h_gmf": jnp.asarray(h)}
        st = (_optax.ScaleByAdamState(
            count=jnp.asarray(step_off[g], jnp.int32),
            mu={"P": jnp.asarray(mP[g0:g0 + rows]), "Q": jnp.asarray(mQ),
                "h_gmf": jnp.asarray(mh)},
            nu={"P": jnp.asarray(vP[g0:g0 + rows]), "Q": jnp.asarray(vQ),
                "h_gmf": jnp.asarray(vh)}),
            _optax.EmptyState())
        for s in range(steps_list[g]):
            w = batch["w"][s]
            u_loc = np.where(w > 0, batch["u"][s] - g0, 0)
            l, grads = jax.value_and_grad(loss_fn)(
                sub, u_loc, batch["i"][s], jnp.asarray(batch["y"][s]),
                jnp.asarray(w))
            upd, st = opt.update(grads, st, sub)
            sub = _optax.apply_updates(sub, upd)
            total += float(l)
        P[g0:g0 + rows] = np.asarray(sub["P"])
        Q = np.asarray(sub["Q"])
        h = np.asarray(sub["h_gmf"])
        mP[g0:g0 + rows] = np.asarray(st[0].mu["P"])
        vP[g0:g0 + rows] = np.asarray(st[0].nu["P"])
        mQ, vQ = np.asarray(st[0].mu["Q"]), np.asarray(st[0].nu["Q"])
        mh, vh = np.asarray(st[0].mu["h_gmf"]), np.asarray(st[0].nu["h_gmf"])

    assert float(loss1) == pytest.approx(total / sum(steps_list), rel=1e-4)
    np.testing.assert_allclose(p1["P"], P[new_of_old],
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(p1["Q"], Q, rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(p1["h_gmf"], h, rtol=2e-4, atol=2e-6)
    assert int(o1[0].count) == sum(steps_list)


def test_grouped_trainer_end_to_end_blocks(tmp_path):
    """Grouped path under the production surfaces: multi-epoch device
    blocks, evaluation, and the Adam step counter across blocks."""
    from tests.conftest import make_toy_interactions

    ds = tmp_path / "bige"
    ds.mkdir()
    make_toy_interactions(ds / "ratings.csv", n_users=300, n_items=60,
                          n_rows=4000, seed=3)
    toy = {"root": str(tmp_path), "name": "bige"}
    ov = {"epoches": "4", "batch_size": "64", "embed_size": "8",
          "lr": "0.05", "neg_ratio": "2", "is_pairwise": "True",
          "loss_func": "bpr", "reg": "0.01", "stddev": "0.1",
          "recommender": "BPR", "train.fused_kernel": "True",
          "train.fused_groups": "2"}
    cfg = base_config(toy, **ov)
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    tr = Trainer(model, data, cfg)
    assert tr._fused_grouped_plan is not None
    G, rows, _ = tr._fused_grouped_plan
    steps_total = G * (tr.arrays["grouped_static"]["ord_u"].shape[1]
                       // cfg.batch_size)
    params, opt = tr.init_state()
    params, opt, losses = tr.train_epochs(params, opt, 3)
    assert len(losses) == 3
    assert losses[-1] < losses[0]
    assert int(opt[0].count) == 3 * steps_total
    res = tr.evaluate(params)
    for k, (hr, mrr, ndcg) in res.items():
        assert 0.0 <= hr <= 1.0 and np.isfinite(ndcg)


def test_fused_mlp_epoch_matches_optax_oracle():
    """Generic pointwise kernel (in-kernel AD) vs a literal optax.adam
    loop over NeuMF.loss on random data, including invalid rows — pins
    both the kernel mechanics and NeuMF.fused_mlp_spec's row_loss
    against the scan objective."""
    from cleverrec_tpu.config import Config
    from cleverrec_tpu.ops.pallas_train import fused_mlp_epoch

    rng = np.random.default_rng(7)
    u_n, i_n = 23, 31
    steps, b = 3, 64
    lr = 0.01
    cfg = Config({"recommender": "NeuMF", "model_type": "ranking",
                  "embed_size": "8", "layers": "[16,8]", "reg1": "0.02",
                  "reg2": "0.03", "lr": str(lr), "epoches": "1",
                  "batch_size": str(b), "neg_ratio": "2",
                  "optimizer": "Adam", "is_pairwise": "False",
                  "loss_func": "cross_entropy", "init_method": "normal",
                  "stddev": "0.1", "topk": "[5]"})
    model = make_model(cfg, DataMeta(u_n, i_n))
    params0 = model.init(jax.random.PRNGKey(0))
    spec = model.fused_mlp_spec()
    u_pad, i_pad = sentinel_dims(u_n, i_n)

    u = rng.integers(0, u_n, (steps, b)).astype(np.int32)
    i = rng.integers(0, i_n, (steps, b)).astype(np.int32)
    y = (rng.random((steps, b)) < 0.4).astype(np.float32)
    invalid = rng.random((steps, b)) < 0.15
    w = (~invalid).astype(np.float32)
    z = np.where(y > 0, 1, -1)
    uz = np.where(invalid, u_pad, (u + 1) * z).astype(np.int32)
    i_s = np.where(invalid, i_pad - 1, i).astype(np.int32)

    opt = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    params = jax.tree.map(jnp.asarray, params0)
    state = opt.init(params)
    total = 0.0
    for s in range(steps):
        batch = {"u": u[s], "i": i[s], "y": y[s], "w": w[s]}
        l, g = jax.value_and_grad(
            lambda p: model.loss(p, batch, {}))(params)
        upd, state = opt.update(g, state, params)
        params = optax.apply_updates(params, upd)
        total += float(l)

    cat = lambda t, names: jnp.concatenate(  # noqa: E731
        [jnp.asarray(t[n]) for n in names], axis=1)
    dense_of = lambda t: tuple(jnp.asarray(t[n]) for n in spec["dense"])  # noqa: E731
    zeros = jax.tree.map(jnp.zeros_like, params0)
    outs = fused_mlp_epoch(
        cat(params0, spec["u"]), cat(params0, spec["i"]),
        dense_of(params0),
        cat(zeros, spec["u"]), cat(zeros, spec["i"]), dense_of(zeros),
        cat(zeros, spec["u"]), cat(zeros, spec["i"]), dense_of(zeros),
        jnp.asarray(uz), jnp.asarray(i_s), jnp.asarray(0, jnp.int32),
        row_loss=spec["row_loss"], lr=lr, blk=8, interpret=True)
    assert float(outs[9]) == pytest.approx(total, rel=1e-5)
    d = model.embed_size
    np.testing.assert_allclose(np.asarray(outs[0][:, :d]),
                               np.asarray(params["P_gmf"]),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(outs[0][:, d:]),
                               np.asarray(params["P_mlp"]),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(outs[1][:, :d]),
                               np.asarray(params["Q_gmf"]),
                               rtol=2e-4, atol=2e-6)
    for k, n in enumerate(spec["dense"]):
        np.testing.assert_allclose(np.asarray(outs[2][k]),
                                   np.asarray(params[n]),
                                   rtol=2e-4, atol=2e-6, err_msg=n)
    # Adam second moments round-trip (dense + item side).
    np.testing.assert_allclose(np.asarray(outs[7][:, :d]),
                               np.asarray(state[0].nu["Q_gmf"]),
                               rtol=2e-4, atol=2e-9)


@pytest.mark.parametrize("name", ["NeuMF", "MLP"])
def test_fused_mlp_trainer_matches_scan_trainer(name, toy_dataset):
    """NeuMF/MLP Trainer with train.fused_kernel=True reproduces the
    scan epoch's numerics (identical pointwise sampling stream by
    construction)."""
    ov = {"epoches": "2", "batch_size": "64", "embed_size": "16",
          "layers": "[32,16]", "lr": "0.05", "neg_ratio": "2",
          "is_pairwise": "False", "loss_func": "cross_entropy",
          "reg": "0.01", "reg1": "0.01", "reg2": "0.01", "stddev": "0.1",
          "recommender": name}
    cfg_scan = base_config(toy_dataset, **ov,
                           **{"train.fused_kernel": "False"})
    cfg_fused = base_config(toy_dataset, **ov,
                            **{"train.fused_kernel": "True"})
    data = load_ranking_data(cfg_scan)
    model = make_model(cfg_scan, DataMeta(data.user_nums, data.item_nums))
    t_scan = Trainer(model, data, cfg_scan)
    t_fused = Trainer(model, data, cfg_fused)
    assert t_fused._epoch_fn is not t_scan._epoch_fn
    assert t_fused._fused_plan is not None
    p0, o0 = t_scan.init_state()
    p1, o1 = t_fused.init_state()
    for _ in range(3):
        p0, o0, l0 = t_scan.train_epoch(p0, o0)
        p1, o1, l1 = t_fused.train_epoch(p1, o1)
        assert l1 == pytest.approx(l0, rel=1e-4), (l0, l1)
    for k in p0:
        np.testing.assert_allclose(np.asarray(p1[k]), np.asarray(p0[k]),
                                   rtol=1e-3, atol=1e-4, err_msg=k)
    assert int(o1[0].count) == int(o0[0].count)
    r0 = t_scan.evaluate(p0)
    r1 = t_fused.evaluate(p1)
    for k in r0:
        assert r1[k] == pytest.approx(r0[k], abs=2e-4)


def test_grouped_mlp_trainer_matches_blockwise_adam_oracle(tmp_path):
    """The GROUPED generic pointwise epoch (NeuMF, forced 2 groups) vs
    an optax oracle applying adam to {PU-group-slice, QI, dense tower}
    sub-params per group over NeuMF.loss, replaying the identical
    per-group sampling streams."""
    import optax as _optax
    from cleverrec_tpu import sampling
    from tests.conftest import make_toy_interactions

    ds = tmp_path / "bigm"
    ds.mkdir()
    make_toy_interactions(ds / "ratings.csv", n_users=300, n_items=60,
                          n_rows=4000)
    toy = {"root": str(tmp_path), "name": "bigm"}
    ov = {"epoches": "1", "batch_size": "64", "embed_size": "8",
          "layers": "[16,8]", "lr": "0.01", "neg_ratio": "2",
          "is_pairwise": "False", "loss_func": "cross_entropy",
          "reg1": "0.02", "reg2": "0.03", "stddev": "0.1",
          "recommender": "NeuMF", "train.fused_kernel": "True",
          "train.fused_groups": "2"}
    cfg = base_config(toy, **ov)
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    tr = Trainer(model, data, cfg)
    assert tr._fused_grouped_plan is not None
    G, rows, _ = tr._fused_grouped_plan
    assert G == 2
    p0, o0 = tr.init_state()
    key = jax.random.PRNGKey(321)
    p1, o1, loss1 = jax.tree_util.tree_map(
        np.asarray, tr._epoch_body(p0, o0, key, tr.arrays))

    # -- oracle ----------------------------------------------------------
    lr = cfg.lr
    b = cfg.batch_size
    statics = tr.arrays["grouped_static"]
    steps_eq = statics["ord_u"].shape[1] // b
    item_nums = data.item_nums
    new_of_old, old_of_new = tr._grouped_perm
    perm = lambda a: np.pad(np.asarray(a),  # noqa: E731
                            ((0, 1), (0, 0)))[old_of_new]
    P = {n: perm(p0[n]) for n in ("P_gmf", "P_mlp")}
    rest = {n: np.asarray(p0[n]) for n in p0
            if n not in ("P_gmf", "P_mlp")}
    mP = {n: np.zeros_like(P[n]) for n in P}
    vP = {n: np.zeros_like(P[n]) for n in P}
    m_rest = {n: np.zeros_like(rest[n]) for n in rest}
    v_rest = {n: np.zeros_like(rest[n]) for n in rest}
    opt = _optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)

    total = 0.0
    gkeys = jax.random.split(key, G)
    for g in range(G):
        pkey, _ = jax.random.split(gkeys[g])
        batch = jax.tree_util.tree_map(np.asarray, sampling.pointwise_epoch_tensors(
            pkey, {k: v[g] for k, v in statics.items()},
            tr.arrays["grouped_seen"], item_nums, steps_eq, b))
        g0 = g * rows
        sub = {**{n: jnp.asarray(P[n][g0:g0 + rows]) for n in P},
               **{n: jnp.asarray(rest[n]) for n in rest}}
        st = (_optax.ScaleByAdamState(
            count=jnp.asarray(g * steps_eq, jnp.int32),
            mu={**{n: jnp.asarray(mP[n][g0:g0 + rows]) for n in mP},
                **{n: jnp.asarray(m_rest[n]) for n in m_rest}},
            nu={**{n: jnp.asarray(vP[n][g0:g0 + rows]) for n in vP},
                **{n: jnp.asarray(v_rest[n]) for n in v_rest}}),
            _optax.EmptyState())
        for s in range(steps_eq):
            w = batch["w"][s]
            bs = {"u": np.where(w > 0, batch["u"][s] - g0, 0),
                  "i": batch["i"][s], "y": batch["y"][s],
                  "w": jnp.asarray(w)}
            l, grads = jax.value_and_grad(
                lambda p: model.loss(p, bs, {}))(sub)
            upd, st = opt.update(grads, st, sub)
            sub = _optax.apply_updates(sub, upd)
            total += float(l)
        for n in P:
            P[n][g0:g0 + rows] = np.asarray(sub[n])
            mP[n][g0:g0 + rows] = np.asarray(st[0].mu[n])
            vP[n][g0:g0 + rows] = np.asarray(st[0].nu[n])
        for n in rest:
            rest[n] = np.asarray(sub[n])
            m_rest[n] = np.asarray(st[0].mu[n])
            v_rest[n] = np.asarray(st[0].nu[n])

    assert float(loss1) == pytest.approx(total / (G * steps_eq), rel=1e-4)

    def assert_close_modulo_relu_flips(actual, desired, name):
        """Unlike the linear kernels (atol 2e-6), the tower's relu
        boundaries flip subgradients under f32 reduction-order
        differences, letting isolated (row, unit) trajectories diverge
        once Adam normalizes them — localized by construction, so pin
        a sub-1% outlier budget plus a hard cap instead of a uniform
        tolerance (an indexing/transposition bug corrupts whole rows)."""
        err = np.abs(actual - desired)
        bad = err > 5e-5 + 2e-4 * np.abs(desired)
        assert bad.mean() < 0.01, (name, bad.mean())
        assert err.max() < 2e-3, (name, err.max())

    for n in P:
        assert_close_modulo_relu_flips(p1[n], P[n][new_of_old], n)
    for n in rest:
        assert_close_modulo_relu_flips(p1[n], rest[n], n)
    np.testing.assert_allclose(np.asarray(o1[0].mu["P_mlp"]),
                               mP["P_mlp"][new_of_old],
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(o1[0].nu["W_0"]), v_rest["W_0"],
                               rtol=2e-4, atol=1e-9)
    assert int(o1[0].count) == G * steps_eq


@pytest.mark.parametrize("name", ["SBPR", "TBPR", "CUNE_BPR"])
def test_fused_rows_trainer_matches_scan_trainer(name, toy_social_dataset):
    """Social-triple Trainer with train.fused_kernel=True reproduces the
    scan epoch's numerics — the rows path vmaps the SAME per-step batch
    builder over the SAME step keys, so the sampling stream is identical
    by construction."""
    ov = {"epoches": "2", "batch_size": "64", "embed_size": "16",
          "lr": "0.05", "neg_ratio": "2", "is_pairwise": "True",
          "loss_func": "bpr", "reg": "0.05", "stddev": "0.1",
          "recommender": name, "social_file": "trusts.csv"}
    if name == "TBPR":
        ov["strong_ratio"] = "0.5"
    if name == "CUNE_BPR":
        ov.update({"walk_count": "2", "walk_length": "4", "walk_dim": "8",
                   "window_size": "2", "topk_f": "3", "reg": "0.01"})
    cfg_scan = base_config(toy_social_dataset, **ov,
                           **{"train.fused_kernel": "False"})
    cfg_fused = base_config(toy_social_dataset, **ov,
                            **{"train.fused_kernel": "True"})
    data = load_ranking_data(cfg_scan)
    model = make_model(cfg_scan, DataMeta(data.user_nums, data.item_nums))
    t_scan = Trainer(model, data, cfg_scan)
    t_fused = Trainer(model, data, cfg_fused)
    assert t_fused._epoch_fn is not t_scan._epoch_fn
    assert t_fused._fused_plan is not None
    p0, o0 = t_scan.init_state()
    p1, o1 = t_fused.init_state()
    for _ in range(3):
        p0, o0, l0 = t_scan.train_epoch(p0, o0)
        p1, o1, l1 = t_fused.train_epoch(p1, o1)
        assert l1 == pytest.approx(l0, rel=1e-4), (l0, l1)
    for k in p0:
        np.testing.assert_allclose(np.asarray(p1[k]), np.asarray(p0[k]),
                                   rtol=1e-3, atol=1e-4, err_msg=k)
    assert int(o1[0].count) == int(o0[0].count)
    r0 = t_scan.evaluate(p0)
    r1 = t_fused.evaluate(p1)
    for k in r0:
        assert r1[k] == pytest.approx(r0[k], abs=2e-4)


def test_grouped_cml_trainer_matches_blockwise_adam_oracle(tmp_path):
    """GROUPED CML (forced 2 groups): the covariance regularizer spans
    the FULL user population via frozen-row partial sums.  Oracle:
    optax.adam per group over {P-slice, Q} with the covariance computed
    over concat(Q, P_slice, P_frozen_real) — frozen rows enter the loss
    and the mean but receive no gradients — replaying the identical
    per-group sampling streams."""
    import optax as _optax
    from cleverrec_tpu import sampling
    from tests.conftest import make_toy_interactions

    ds = tmp_path / "bigc"
    ds.mkdir()
    make_toy_interactions(ds / "ratings.csv", n_users=300, n_items=60,
                          n_rows=4000)
    toy = {"root": str(tmp_path), "name": "bigc"}
    ov = {"epoches": "1", "batch_size": "64", "embed_size": "8",
          "lr": "0.01", "neg_ratio": "3", "is_pairwise": "True",
          "loss_func": "hinge", "margin": "1.0", "reg": "0.05",
          "stddev": "0.1", "recommender": "CML",
          "train.fused_kernel": "True", "train.fused_groups": "2"}
    cfg = base_config(toy, **ov)
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    tr = Trainer(model, data, cfg)
    assert tr._fused_grouped_plan is not None
    G, rows, _ = tr._fused_grouped_plan
    assert G == 2
    p0, o0 = tr.init_state()
    key = jax.random.PRNGKey(77)
    p1, o1, loss1 = jax.tree_util.tree_map(
        np.asarray, tr._epoch_body(p0, o0, key, tr.arrays))

    # -- oracle ----------------------------------------------------------
    lr, reg, margin = cfg.lr, model.reg, model.margin
    K = cfg.neg_ratio
    bsz = cfg.batch_size
    statics = tr.arrays["grouped_static"]
    steps_eq = statics["ord_u"].shape[1] // bsz
    item_nums = data.item_nums
    un = data.user_nums
    new_of_old, old_of_new = tr._grouped_perm
    real_row = old_of_new < un                    # [G*rows] filler mask
    P = np.pad(np.asarray(p0["P"]), ((0, 1), (0, 0)))[old_of_new]
    Q = np.asarray(p0["Q"])
    mP, vP = np.zeros_like(P), np.zeros_like(P)
    mQ, vQ = np.zeros_like(Q), np.zeros_like(Q)
    opt = _optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)

    def loss_fn(sub, frozen, ur_g, ub, ib, nb, wb):
        # models/metric.py CML.loss over this batch; covariance over the
        # REAL rows of (Q, resident slice, frozen rows).
        ue = sub["P"][ub]
        ie = sub["Q"][ib]
        ne = sub["Q"][nb]
        d_ui = jnp.sum(jnp.square(ue - ie), axis=1)
        d_un = jnp.sum(jnp.square(ue[:, None, :] - ne), axis=2)
        d_min = jnp.min(d_un, axis=1)
        per_pair = jnp.maximum(d_ui + margin - d_min, 0.0)
        imposters = (d_ui[:, None] + margin - d_un) > 0
        rank = (jnp.mean(imposters.astype(jnp.float32), axis=1)
                * item_nums / K)
        per_pair = per_pair * jnp.log(rank + 1.0) * wb
        x = jnp.concatenate([sub["Q"], sub["P"][:ur_g], frozen], axis=0)
        xc = x - jnp.mean(x, axis=0)
        cov = (xc.T @ xc) / x.shape[0]
        cov_loss = reg * (jnp.sum(cov) - jnp.trace(cov))
        return jnp.sum(per_pair) + cov_loss

    total = 0.0
    gkeys = jax.random.split(key, G)
    for g in range(G):
        pkey, _ = jax.random.split(gkeys[g])
        batch = jax.tree_util.tree_map(
            np.asarray, sampling.cml_epoch_tensors(
                pkey, {k: v[g] for k, v in statics.items()},
                tr.arrays["grouped_seen"], item_nums, steps_eq, bsz,
                neg_ratio=K))
        g0 = g * rows
        ur_g = int(real_row[g0: g0 + rows].sum())
        # Real rows of the slice are its leading ur_g slots.
        assert real_row[g0: g0 + ur_g].all()
        sub = {"P": jnp.asarray(P[g0: g0 + rows]), "Q": jnp.asarray(Q)}
        out_mask = real_row.copy()
        out_mask[g0: g0 + rows] = False
        frozen = jnp.asarray(P[out_mask])
        st = (_optax.ScaleByAdamState(
            count=jnp.asarray(g * steps_eq, jnp.int32),
            mu={"P": jnp.asarray(mP[g0: g0 + rows]), "Q": jnp.asarray(mQ)},
            nu={"P": jnp.asarray(vP[g0: g0 + rows]), "Q": jnp.asarray(vQ)}),
            _optax.EmptyState())
        for s in range(steps_eq):
            w = batch["w"][s]
            u_loc = np.where(w > 0, batch["u"][s] - g0, 0)
            i_b = np.where(w > 0, batch["i"][s], 0)
            n_b = np.where(w[:, None] > 0, batch["negs"][s], 0)
            l, grads = jax.value_and_grad(loss_fn)(
                sub, frozen, ur_g, u_loc, i_b, n_b, jnp.asarray(w))
            upd, st = opt.update(grads, st, sub)
            sub = _optax.apply_updates(sub, upd)
            total += float(l)
        P[g0: g0 + rows] = np.asarray(sub["P"])
        Q = np.asarray(sub["Q"])
        mP[g0: g0 + rows] = np.asarray(st[0].mu["P"])
        vP[g0: g0 + rows] = np.asarray(st[0].nu["P"])
        mQ, vQ = np.asarray(st[0].mu["Q"]), np.asarray(st[0].nu["Q"])

    assert float(loss1) == pytest.approx(total / (G * steps_eq), rel=1e-4)
    # atol 1e-5: the kernel's frozen-row partial-sum expansion
    # (sum_a2 - 2*ms*sum_a + n*ms^2) and the oracle's direct concat
    # covariance differ by f32 cancellation noise.
    np.testing.assert_allclose(p1["P"], P[new_of_old],
                               rtol=3e-4, atol=1e-5)
    np.testing.assert_allclose(p1["Q"], Q, rtol=3e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(o1[0].mu["P"]),
                               mP[new_of_old], rtol=3e-4, atol=1e-5)
    assert int(o1[0].count) == G * steps_eq


def test_rows_stream_kernel_matches_resident():
    """The Q/P-STREAMED rows kernel (no residency; slab-walked HBM
    state) == the resident fused_rows_epoch on identical inputs — an
    SBPR-shaped protocol with a float column and a dense param."""
    from cleverrec_tpu.ops.pallas_train import (fused_rows_epoch,
                                                fused_rows_epoch_stream,
                                                sentinel_dims)

    rng = np.random.default_rng(11)
    u_n, i_n, tw_u, tw_i = 150, 210, 8, 9
    steps, b = 3, 48
    u_pad, i_pad = sentinel_dims(u_n, i_n)
    sides = ("u", "i", "i", "i")

    def row_loss(rows, floats, dense, w):
        ue, ri, rk, rj = rows
        s_col, scale = floats[0], dense[0]
        x = lambda r: jnp.sum(ue * r[:, :tw_u], axis=1,  # noqa: E731
                              keepdims=True) + r[:, tw_u:tw_u + 1]
        suk = jnp.maximum(s_col, 1.0)
        main = (jnp.sum(-jax.nn.log_sigmoid(
            (x(ri) - x(rk)) / suk * scale[0, 0]) * w)
            + jnp.sum(-jax.nn.log_sigmoid(x(rk) - x(rj)) * w))
        return main + 0.01 * jnp.sum(jnp.square(ue) * w)

    pu = rng.normal(0, 0.1, (u_n, tw_u)).astype(np.float32)
    qi = rng.normal(0, 0.1, (i_n, tw_i)).astype(np.float32)
    dense = (np.asarray([[1.3]], np.float32),)
    zeros_u = np.zeros_like(pu)
    zeros_i = np.zeros_like(qi)
    zeros_d = (np.zeros_like(dense[0]),)
    invalid = rng.random((steps, b)) < 0.2
    u_ids = np.where(invalid, u_pad - 1,
                     rng.integers(0, u_n, (steps, b))).astype(np.int32)
    mk_i = lambda: np.where(  # noqa: E731
        invalid, i_pad - 1,
        rng.integers(0, i_n, (steps, b))).astype(np.int32)
    planes = (jnp.asarray(u_ids), jnp.asarray(mk_i()),
              jnp.asarray(mk_i()), jnp.asarray(mk_i()))
    floats = (jnp.asarray(
        rng.integers(1, 5, (steps, b)).astype(np.float32)),)

    args = ((jnp.asarray(pu), jnp.asarray(qi),
             tuple(jnp.asarray(x) for x in dense),
             jnp.asarray(zeros_u), jnp.asarray(zeros_i),
             tuple(jnp.asarray(x) for x in zeros_d),
             jnp.asarray(zeros_u), jnp.asarray(zeros_i),
             tuple(jnp.asarray(x) for x in zeros_d),
             planes, floats, jnp.asarray(0, jnp.int32)))
    kw = dict(sides=sides, row_loss=row_loss, lr=0.02, blk=16,
              interpret=True)
    res = fused_rows_epoch(*args, **kw)
    stream = fused_rows_epoch_stream(*args, **kw, slab_u=128, slab_i=128)
    names = ("pu", "qi", "dense", "mpu", "mqi", "mdense",
             "vpu", "vqi", "vdense", "loss")
    for n, a, bb in zip(names, res, stream):
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(bb)):
            np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                       rtol=2e-5, atol=2e-7, err_msg=n)


def test_rows_stream_trainer_matches_scan_trainer(toy_social_dataset):
    """SBPR Trainer with train.fused_stream=True (forced streamed rows
    kernel: HBM-resident tables, slab-walked) == the scan trainer —
    identical sampling stream by construction."""
    ov = {"epoches": "2", "batch_size": "64", "embed_size": "16",
          "lr": "0.05", "neg_ratio": "2", "is_pairwise": "True",
          "loss_func": "bpr", "reg": "0.05", "stddev": "0.1",
          "recommender": "SBPR", "social_file": "trusts.csv"}
    cfg_scan = base_config(toy_social_dataset, **ov,
                           **{"train.fused_kernel": "False"})
    cfg_stream = base_config(toy_social_dataset, **ov,
                             **{"train.fused_kernel": "True",
                                "train.fused_stream": "True"})
    data = load_ranking_data(cfg_scan)
    model = make_model(cfg_scan, DataMeta(data.user_nums, data.item_nums))
    t_scan = Trainer(model, data, cfg_scan)
    t_stream = Trainer(model, data, cfg_stream)
    assert t_stream._fused_stream_plan is not None
    p0, o0 = t_scan.init_state()
    p1, o1 = t_stream.init_state()
    for _ in range(2):
        p0, o0, l0 = t_scan.train_epoch(p0, o0)
        p1, o1, l1 = t_stream.train_epoch(p1, o1)
        assert l1 == pytest.approx(l0, rel=1e-4), (l0, l1)
    for k in p0:
        np.testing.assert_allclose(np.asarray(p1[k]), np.asarray(p0[k]),
                                   rtol=1e-3, atol=1e-4, err_msg=k)
    r0 = t_scan.evaluate(p0)
    r1 = t_stream.evaluate(p1)
    for k in r0:
        assert r1[k] == pytest.approx(r0[k], abs=2e-4)


@pytest.mark.parametrize("stream", [False, True])
def test_lrml_fused_rows_matches_scan(stream, toy_dataset):
    """LRML through the rows protocol (memory matrices as dense
    in-kernel-Adam params) == the scan trainer, resident and streamed."""
    ov = {"epoches": "2", "batch_size": "64", "embed_size": "16",
          "lr": "0.05", "neg_ratio": "2", "is_pairwise": "True",
          "loss_func": "hinge", "margin": "0.2", "reg": "0.01",
          "mem_size": "6", "stddev": "0.1", "recommender": "LRML"}
    cfg_scan = base_config(toy_dataset, **ov,
                           **{"train.fused_kernel": "False"})
    fused_ov = {"train.fused_kernel": "True"}
    if stream:
        fused_ov["train.fused_stream"] = "True"
    cfg_fused = base_config(toy_dataset, **ov, **fused_ov)
    data = load_ranking_data(cfg_scan)
    model = make_model(cfg_scan, DataMeta(data.user_nums, data.item_nums))
    t_scan = Trainer(model, data, cfg_scan)
    t_fused = Trainer(model, data, cfg_fused)
    if stream:
        assert t_fused._fused_stream_plan is not None
    else:
        assert t_fused._fused_plan is not None
    p0, o0 = t_scan.init_state()
    p1, o1 = t_fused.init_state()
    for _ in range(2):
        p0, o0, l0 = t_scan.train_epoch(p0, o0)
        p1, o1, l1 = t_fused.train_epoch(p1, o1)
        assert l1 == pytest.approx(l0, rel=1e-4), (l0, l1)
    for k in p0:
        np.testing.assert_allclose(np.asarray(p1[k]), np.asarray(p0[k]),
                                   rtol=1e-3, atol=1e-4, err_msg=k)
    r0 = t_scan.evaluate(p0)
    r1 = t_fused.evaluate(p1)
    for k in r0:
        assert r1[k] == pytest.approx(r0[k], abs=2e-4)


def test_fused_bpr_bf16_storage_close_to_f32():
    """table_dtype=bf16 stores state in bf16 (outputs bf16-representable)
    while tracking the f32 kernel closely on a short epoch."""
    rng = np.random.default_rng(5)
    u_n, i_n, d = 64, 96, 16
    steps, b = 6, 64
    from cleverrec_tpu.ops.pallas_train import sentinel_dims
    u_pad, i_pad = sentinel_dims(u_n, i_n)
    u = jnp.asarray(rng.integers(0, u_n, (steps, b)), jnp.int32)
    i = jnp.asarray(rng.integers(0, i_n, (steps, b)), jnp.int32)
    j = jnp.asarray(rng.integers(0, i_n, (steps, b)), jnp.int32)
    p0 = jnp.asarray(rng.normal(size=(u_n, d)).astype(np.float32) * 0.1)
    q0 = jnp.asarray(rng.normal(size=(i_n, d)).astype(np.float32) * 0.1)
    zu = jnp.zeros((u_n, d), jnp.float32)
    zi = jnp.zeros((i_n, d), jnp.float32)
    args = (p0, q0, zu, zu, zi, zi, u, i, j, jnp.asarray(0, jnp.int32))
    f32_out = fused_bpr_epoch(*args, lr=0.01, reg=0.01, blk=8,
                              interpret=True)
    bf_out = fused_bpr_epoch(*args, lr=0.01, reg=0.01, blk=8,
                             interpret=True, table_dtype=jnp.bfloat16)
    # Outputs are f32 arrays carrying bf16-rounded values.
    for x in bf_out[:6]:
        assert x.dtype == jnp.float32
        np.testing.assert_array_equal(
            np.asarray(x),
            np.asarray(x.astype(jnp.bfloat16).astype(jnp.float32)))
    # And they track the f32 epoch closely (worst per-element delta is
    # lr-scale: early Adam steps normalize by sqrt(v) with v itself
    # bf16-rounded, so a handful of elements move a full step apart).
    np.testing.assert_allclose(np.asarray(bf_out[0]),
                               np.asarray(f32_out[0]), atol=2e-2)
    np.testing.assert_allclose(np.asarray(bf_out[1]),
                               np.asarray(f32_out[1]), atol=2e-2)
    assert float(jnp.mean(jnp.abs(bf_out[0] - f32_out[0]))) < 1e-3
    assert float(bf_out[6]) == pytest.approx(float(f32_out[6]), rel=2e-2)


def test_fused_bf16_plan_extends_capacity():
    """bf16 planning accepts STATE-dominated shapes the f32 plan
    rejects (ml-100k @ embed 256 — grouped today; compile-calibrated
    on chip), and declines both digit-unaddressable tables (>= 32768
    rows) and one-hot-dominated shapes whose construction temporaries
    eat the savings (ml-1m @ 64 measured 20.6MB scoped — a real
    fail)."""
    from cleverrec_tpu.ops.pallas_train import plan_fused
    assert plan_fused(943, 1682, 256, 6144) is None
    assert plan_fused(943, 1682, 256, 6144, bf16=True) is not None
    assert plan_fused(6040, 3706, 64, 6144, bf16=True) is None
    assert plan_fused(20000, 1682, 256, 6144, bf16=True) is None


def test_fused_bf16_trainer_trains(toy_dataset):
    """train.fused_bf16: the trainer takes the bf16 fused path, loss
    falls, and metrics land near the f32 fused arm."""
    ov = {"epoches": "4", "batch_size": "64", "embed_size": "16",
          "lr": "0.05", "neg_ratio": "2", "is_pairwise": "True",
          "loss_func": "bpr", "reg": "0.01",
          "train.fused_kernel": "True"}
    cfg32 = base_config(toy_dataset, **ov)
    cfg16 = base_config(toy_dataset, **ov, **{"train.fused_bf16": "True"})
    data = load_ranking_data(cfg32)
    model = make_model(cfg32, DataMeta(data.user_nums, data.item_nums))
    t32 = Trainer(model, data, cfg32)
    t16 = Trainer(model, data, cfg16)
    assert not t32._fused_bf16 and t16._fused_bf16
    p0, o0 = t32.init_state()
    p1, o1 = t16.init_state()
    l32 = l16 = None
    for _ in range(4):
        p0, o0, l32 = t32.train_epoch(p0, o0)
        p1, o1, l16 = t16.train_epoch(p1, o1)
    assert l16 == pytest.approx(l32, rel=5e-2), (l32, l16)
    r32 = t32.evaluate(p0)
    r16 = t16.evaluate(p1)
    for k in r32:
        for a, b in zip(r32[k], r16[k]):
            assert b == pytest.approx(a, abs=0.08), (k, r32[k], r16[k])


def test_lrml_bf16_rows_trainer(toy_dataset):
    """train.fused_bf16 on the rows protocol (LRML): the bf16-resident
    epoch trains, loss tracks the f32 fused arm, and state stays
    bf16-representable.  Plan economics: the 3-plane rows protocol is
    one-hot-dominated, and bf16's digit-construction temporaries cost
    more than f32's plain one-hots — so bf16 plans only where the
    STATE term dominates (wide tables), and LRML's ml-1m dims decline
    in both dtypes (honest: ml-1m LRML stays scan)."""
    from cleverrec_tpu.ops.pallas_train import plan_fused_rows
    # LRML @ ml-1m dims: planes (u, i, j), tw 64, dense K/M (2*64*20).
    assert plan_fused_rows(6040, 3706, 64, 64, 2 * 64 * 20,
                           6144, 1, 2, 0) is None
    assert plan_fused_rows(6040, 3706, 64, 64, 2 * 64 * 20,
                           6144, 1, 2, 0, bf16=True) is None
    # A state-dominated rows shape still plans in bf16.
    assert plan_fused_rows(2500, 2000, 96, 96, 2 * 96 * 20,
                           6144, 1, 2, 0, bf16=True) is not None

    ov = {"epoches": "2", "batch_size": "64", "embed_size": "16",
          "lr": "0.05", "neg_ratio": "2", "is_pairwise": "True",
          "loss_func": "hinge", "margin": "0.2", "reg": "0.01",
          "mem_size": "6", "stddev": "0.1", "recommender": "LRML",
          "train.fused_kernel": "True"}
    cfg32 = base_config(toy_dataset, **ov)
    cfg16 = base_config(toy_dataset, **ov, **{"train.fused_bf16": "True"})
    data = load_ranking_data(cfg32)
    model = make_model(cfg32, DataMeta(data.user_nums, data.item_nums))
    t32 = Trainer(model, data, cfg32)
    t16 = Trainer(model, data, cfg16)
    assert not t32._fused_bf16 and t16._fused_bf16
    p0, o0 = t32.init_state()
    p1, o1 = t16.init_state()
    l32 = l16 = None
    for _ in range(2):
        p0, o0, l32 = t32.train_epoch(p0, o0)
        p1, o1, l16 = t16.train_epoch(p1, o1)
    assert l16 == pytest.approx(l32, rel=5e-2), (l32, l16)
    for k in p1:
        x = jnp.asarray(p1[k])
        np.testing.assert_array_equal(
            np.asarray(x),
            np.asarray(x.astype(jnp.bfloat16).astype(jnp.float32)),
            err_msg=k)
