"""End-to-end smoke: BPR learns a planted preference structure."""

import numpy as np
import pytest

from cleverrec_tpu.data import load_ranking_data
from cleverrec_tpu.models import make_model
from cleverrec_tpu.models.base import DataMeta
from cleverrec_tpu.train import Trainer
from tests.conftest import base_config


def make_blocky_dataset(tmp_path, n_users=60, n_items=60, seed=0):
    """Two user groups strongly preferring two item blocks -> learnable."""
    r = np.random.default_rng(seed)
    lines = ["u_id,i_id,rating,time"]
    t = 0
    for u in range(n_users):
        block = 0 if u < n_users // 2 else 1
        lo, hi = (0, n_items // 2) if block == 0 else (n_items // 2, n_items)
        items = r.choice(np.arange(lo, hi), size=12, replace=False)
        for i in items:
            t += 1
            lines.append(f"{u},{i},5,{t}")
    ds = tmp_path / "blocky"
    ds.mkdir()
    (ds / "ratings.csv").write_text("\n".join(lines) + "\n")
    return {"root": str(tmp_path), "name": "blocky"}


@pytest.fixture
def blocky(tmp_path):
    return make_blocky_dataset(tmp_path)


def test_bpr_end_to_end_learns(blocky):
    cfg = base_config(blocky, **{
        "epoches": "8", "test.neg_samples": "20", "lr": "0.05",
        "embed_size": "16", "batch_size": "128", "neg_ratio": "2",
    })
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    trainer = Trainer(model, data, cfg)
    best = trainer.run()
    # 20 negatives + 1 truth; random HR@5 ~ 5/21 = 0.24. Learned >> random.
    hr5 = best["metrics"][5][0]
    assert hr5 > 0.5, f"BPR failed to learn, HR@5={hr5}"


def test_bpr_full_catalog_eval(blocky):
    cfg = base_config(blocky, **{
        "data.split_way": "rs", "test.neg_samples": "0",
        "epoches": "6", "lr": "0.05", "embed_size": "16",
        "batch_size": "128",
    })
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    trainer = Trainer(model, data, cfg)
    best = trainer.run()
    assert best["metrics"][5][2] > 0.1  # NDCG@5 well above random


def test_loss_decreases(blocky):
    cfg = base_config(blocky, **{"epoches": "1", "lr": "0.05",
                                 "batch_size": "128"})
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    trainer = Trainer(model, data, cfg)
    params, opt_state = trainer.init_state()
    losses = []
    for _ in range(5):
        params, opt_state, loss = trainer.train_epoch(params, opt_state)
        losses.append(loss)
    assert losses[-1] < losses[0]


def test_eval_no_leak_when_k_exceeds_candidates(blocky):
    """topk > candidate count must yield PAD, not arbitrary item ids."""
    cfg = base_config(blocky, **{
        "test.neg_samples": "3", "topk": "[10]", "epoches": "1",
        "batch_size": "64", "embed_size": "8", "lr": "0.05",
    })
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    trainer = Trainer(model, data, cfg)
    params, _ = trainer.init_state()
    import jax.numpy as jnp
    ev = trainer.evaluator
    u = jnp.asarray(trainer.dd.test_users[:4])
    items = np.asarray(ev._rank_fn(params, trainer.arrays, u,
                                   jnp.asarray(trainer.dd.cand[:4]),
                                   jnp.asarray(trainer.dd.cand_mask[:4])))
    # 4 candidates (3 neg + 1 truth), kmax=10 -> ranker truncates to
    # min(kmax, width) columns; every valid candidate must surface and any
    # PAD slots must sit at the tail.
    assert items.shape[1] == min(10, trainer.dd.cand.shape[1])
    for r in range(4):
        valid = set(np.asarray(trainer.dd.cand[r])[
            np.asarray(trainer.dd.cand_mask[r])].tolist())
        row = items[r].tolist()
        got = [x for x in row if x != -1]
        assert set(got) <= valid
        assert len(got) == min(items.shape[1], len(valid))
        # PAD (-1) only after the last real item.
        assert row[:len(got)] == got
    # Metrics still compute.
    res = trainer.evaluate(params)
    assert 0 <= res[10][0] <= 1


@pytest.mark.parametrize("ov", [
    {"data.split_way": "loo", "test.neg_samples": "5"},
    {"data.split_way": "rs", "test.neg_samples": "0"},
    {"data.split_way": "rs", "test.neg_samples": "0",
     "metrics.standard_mrr": "True"},
], ids=["candidate", "full", "full-stdmrr"])
def test_device_metrics_match_host(blocky, ov):
    """The on-device metric reduction (evalx._metric_sums) must agree with
    the numpy oracle (metrics.ranking_metrics) on both protocols."""
    cfg = base_config(blocky, **{"epoches": "1", "batch_size": "64",
                                 "embed_size": "8", "lr": "0.05",
                                 "test.batch_size": "13",  # force wrap-pad
                                 **ov})
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    trainer = Trainer(model, data, cfg)
    params, opt = trainer.init_state()
    params, opt, _ = trainer.train_epoch(params, opt)
    dev = trainer.evaluate(params)
    host = trainer.evaluator.evaluate_host(params, trainer.arrays)
    for k in dev:
        for got, want in zip(dev[k], host[k]):
            assert got == pytest.approx(want, rel=2e-5, abs=2e-6), (k, ov)


def test_trainer_aot_compile(blocky):
    """Trainer.compile() pre-compiles the hot programs; training and eval
    then run normally (and hit the persistent compilation cache)."""
    cfg = base_config(blocky, **{"epoches": "1", "batch_size": "64",
                                 "embed_size": "8", "lr": "0.05"})
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    trainer = Trainer(model, data, cfg)
    params, opt = trainer.compile()
    params, opt, loss = trainer.train_epoch(params, opt)
    assert np.isfinite(loss)
    res = trainer.evaluate(params)
    assert 0 <= res[10][0] <= 1


def test_eval_fused_explicit_beats_stream_default(toy_dataset):
    """An explicit eval.fused_kernel=true wins over the streaming
    DEFAULT; an explicit eval.stream=true still wins over both."""
    from cleverrec_tpu.evalx import Evaluator
    ov = {"data.split_way": "rs", "test.neg_samples": "0", "epoches": "1",
          "batch_size": "64", "embed_size": "8", "lr": "0.05",
          "is_pairwise": "True", "loss_func": "bpr", "reg": "0.01",
          "eval.stream_threshold": "1"}       # catalog > threshold
    cfg1 = base_config(toy_dataset, **ov, **{"eval.fused_kernel": "True"})
    cfg2 = base_config(toy_dataset, **ov)
    cfg3 = base_config(toy_dataset, **ov, **{"eval.fused_kernel": "True",
                                             "eval.stream": "True"})
    data = load_ranking_data(cfg1)
    model = make_model(cfg1, DataMeta(data.user_nums, data.item_nums))
    from cleverrec_tpu.data.arrays import build_device_data
    dd = build_device_data(data)
    assert Evaluator(model, dd, cfg1).mode == "full_fused"
    assert Evaluator(model, dd, cfg2).mode == "full_stream"
    assert Evaluator(model, dd, cfg3).mode == "full_stream"
