"""Per-epoch local Adam for the SCAN tier under a pure-DP mesh
(train.dp_local_adam — round-4 verdict items 4/5 groundwork).

The scan tier's default mesh semantics stay per-step psum'd Adam; with
the flag, the step axis is sharded over 'data', each chip scans its
steps/D chunk against a full replica, and parameter/moment deltas are
averaged once per epoch — the exact optimizer schedule of the fused
mesh-DP tier (trainer.py _build_fused_epoch_fn), now available to every
sampler protocol (incl. the rows family the fused tier can't hold past
VMEM).  Pinned here against a serial per-chunk oracle built from the
same scan body.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cleverrec_tpu.data import load_ranking_data
from cleverrec_tpu.models import make_model
from cleverrec_tpu.models.base import DataMeta
from cleverrec_tpu.parallel.mesh import make_mesh
from cleverrec_tpu.train import Trainer
from tests.conftest import base_config


def _trainer(toy, mesh=None, **ov):
    # Oracle tests pin the per-epoch MEAN semantics explicitly; the
    # production defaults are combine=sum + sync every 2 steps (the
    # measured quality point, benchmarks/MESH_DP_CONVERGENCE.jsonl).
    base = {"epoches": "2", "batch_size": "16", "embed_size": "16",
            "lr": "0.05", "neg_ratio": "2", "is_pairwise": "True",
            "loss_func": "bpr", "reg": "0.01",
            "train.dp_delta_combine": "mean",
            "train.dp_sync_every": "0",
            "train.fused_kernel": "False"}
    base.update(ov)
    cfg = base_config(toy, **base)
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    return Trainer(model, data, cfg, mesh=mesh)


def _oracle(tr, params, opt, key):
    """Serial per-chunk scan runs + delta averaging — the declared
    local-Adam semantics over the SAME sampled epoch tensors."""
    build_xs, run_scan, steps, dp, sync_k = tr._scan_parts
    assert sync_k == 0
    assert dp > 1 and steps % dp == 0
    xs = jax.jit(build_xs)(key, tr.arrays)
    chunk = steps // dp
    ident = lambda b: b  # noqa: E731
    deltas_p, deltas_o, raw = [], [], 0.0
    for c in range(dp):
        xs_c = jax.tree_util.tree_map(
            lambda a: a[c * chunk:(c + 1) * chunk], xs)
        p_c, o_c, losses = run_scan(params, opt, xs_c, tr.arrays, ident)
        deltas_p.append(jax.tree_util.tree_map(
            lambda n, o_: np.asarray(n) - np.asarray(o_), p_c, params))
        deltas_o.append(o_c)
        raw += float(jnp.sum(losses))
    want_p = jax.tree_util.tree_map(
        lambda o_, *ds: np.asarray(o_) + np.mean(ds, axis=0),
        params, *deltas_p)
    return want_p, deltas_o, raw / tr.steps_per_epoch


@pytest.mark.parametrize("ov", [
    {},                                                     # pairwise BPR
    {"recommender": "GMF", "is_pairwise": "False",          # pointwise
     "loss_func": "cross_entropy"},
])
def test_scan_local_adam_matches_chunk_oracle(toy_dataset, ov):
    mesh = make_mesh(8, 1)
    tr = _trainer(toy_dataset, mesh=mesh,
                  **{"train.dp_local_adam": "True", **ov})
    assert tr._scan_parts[3] == 8
    params, opt = tr.init_state()
    key = jax.random.PRNGKey(42)
    got_p, got_o, got_loss = jax.jit(tr._epoch_body)(
        params, opt, key, tr.arrays)
    want_p, deltas_o, want_loss = _oracle(tr, params, opt, key)
    for lg, lw in zip(jax.tree_util.tree_leaves(got_p),
                      jax.tree_util.tree_leaves(want_p)):
        np.testing.assert_allclose(np.asarray(lg), lw, rtol=1e-5,
                                   atol=1e-6)
    # Adam count advances by steps/D (each chip ran steps/D updates).
    assert int(got_o[0].count) == int(opt[0].count) + tr._scan_parts[2] // 8
    # First-moment averaged like the params.
    mus = [np.asarray(o_c[0].mu["P"]) for o_c in deltas_o]
    want_mu = np.asarray(opt[0].mu["P"]) + np.mean(
        [m - np.asarray(opt[0].mu["P"]) for m in mus], axis=0)
    np.testing.assert_allclose(np.asarray(got_o[0].mu["P"]), want_mu,
                               rtol=1e-5, atol=1e-7)
    assert float(got_loss) == pytest.approx(want_loss, rel=1e-5)


def test_scan_local_adam_rows_protocol(toy_social_dataset):
    """The rows family (SBPR — custom batch structure, per-step sampling
    inside the scan) trains under the local-Adam DP tier and matches the
    chunk oracle."""
    mesh = make_mesh(8, 1)
    tr = _trainer(toy_social_dataset, mesh=mesh,
                  **{"recommender": "SBPR", "social_file": "trusts.csv",
                     "train.dp_local_adam": "True"})
    assert tr.model.sampler == "sbpr"
    assert tr._scan_parts[3] == 8
    params, opt = tr.init_state()
    key = jax.random.PRNGKey(7)
    got_p, _, got_loss = jax.jit(tr._epoch_body)(params, opt, key,
                                                 tr.arrays)
    want_p, _, want_loss = _oracle(tr, params, opt, key)
    for lg, lw in zip(jax.tree_util.tree_leaves(got_p),
                      jax.tree_util.tree_leaves(want_p)):
        np.testing.assert_allclose(np.asarray(lg), lw, rtol=1e-5,
                                   atol=1e-6)
    assert float(got_loss) == pytest.approx(want_loss, rel=1e-5)


def test_scan_local_adam_sync_every_k_matches_round_oracle(toy_dataset):
    """Production defaults (combine=sum, sync every K=2 local steps):
    each sync round runs K steps per chip from the synced state, then
    deltas are SUMMED across chips.  Oracle: serial per-chip K-step
    runs from the round-start state, delta-sum, repeated over rounds."""
    D, K = 8, 2
    mesh = make_mesh(D, 1)
    tr = _trainer(toy_dataset, mesh=mesh,
                  **{"train.dp_local_adam": "True",
                     "train.dp_delta_combine": "sum",
                     "train.dp_sync_every": str(K)})
    build_xs, run_scan, steps, dp, sync_k = tr._scan_parts
    assert dp == D and sync_k == K and steps % (D * K) == 0
    params, opt = tr.init_state()
    key = jax.random.PRNGKey(9)
    got_p, got_o, got_loss = jax.jit(tr._epoch_body)(
        params, opt, key, tr.arrays)

    xs = jax.jit(build_xs)(key, tr.arrays)
    steps_loc = steps // D
    rounds = steps_loc // K
    ident = lambda b: b  # noqa: E731
    p_cur, o_cur = params, opt
    raw = 0.0
    for r in range(rounds):
        deltas_p, deltas_o = [], []
        for c in range(D):
            lo = c * steps_loc + r * K
            xs_c = jax.tree_util.tree_map(lambda a: a[lo:lo + K], xs)
            p_c, o_c, losses = run_scan(p_cur, o_cur, xs_c, tr.arrays,
                                        ident)
            deltas_p.append(jax.tree_util.tree_map(
                lambda n, o_: np.asarray(n) - np.asarray(o_), p_c,
                p_cur))
            deltas_o.append(jax.tree_util.tree_map(
                lambda n, o_: (np.asarray(n) - np.asarray(o_)
                               if np.issubdtype(np.asarray(n).dtype,
                                                np.floating)
                               else np.asarray(n)), o_c, o_cur))
            raw += float(jnp.sum(losses))
        p_cur = jax.tree_util.tree_map(
            lambda o_, *ds: np.asarray(o_) + np.sum(ds, axis=0),
            p_cur, *deltas_p)
        o_cur = jax.tree_util.tree_map(
            lambda o_, *ds: (np.asarray(o_) + np.sum(ds, axis=0)
                             if np.issubdtype(np.asarray(o_).dtype,
                                              np.floating)
                             else ds[0]),
            o_cur, *deltas_o)
    for lg, lw in zip(jax.tree_util.tree_leaves(got_p),
                      jax.tree_util.tree_leaves(p_cur)):
        np.testing.assert_allclose(np.asarray(lg), np.asarray(lw),
                                   rtol=2e-4, atol=1e-5)
    assert int(got_o[0].count) == int(opt[0].count) + steps_loc
    assert float(got_loss) == pytest.approx(raw / tr.steps_per_epoch,
                                            rel=1e-5)


def test_scan_local_adam_default_off(toy_dataset):
    """Without the flag a DP mesh keeps the per-step psum semantics
    (local_adam_dp == 1 in the scan parts)."""
    tr = _trainer(toy_dataset, mesh=make_mesh(8, 1))
    assert tr._scan_parts[3] == 1


def test_scan_local_adam_trains_and_evaluates(toy_dataset):
    tr = _trainer(toy_dataset, mesh=make_mesh(8, 1), epoches="4",
                  **{"train.dp_local_adam": "True"})
    params, opt = tr.init_state()
    losses = []
    for _ in range(4):
        params, opt, loss = tr.train_epoch(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    res = tr.evaluate(params)
    assert all(np.isfinite(np.asarray(v)).all() for v in res.values())
