"""Golden-value tests for the reference's (nonstandard) metric formulas.

Expected values are hand-computed from the formulas documented in
BASELINE.md / SURVEY.md section 2.5 item 7 (reference: utils/metrics.py:9-29):
HR = hits/min(K, |real|); MRR = sum over hits of 1/(rank+1);
NDCG = sum 1/log2(rank+2) / IDCG(|real| slots).
"""

import numpy as np
import pytest

from cleverrec_tpu.metrics import PAD_ITEM, pad_lists, ranking_metrics, rmse_mae


def ref_metrics(real_items, rec_items, k):
    """Independent scalar oracle implementing the documented formulas."""
    rec_items = list(rec_items)[:k]
    hit, mrr, dcg, idcg = 0, 0.0, 0.0, 0.0
    for slot, item in enumerate(real_items):
        if item in rec_items:
            hit += 1
            rank = rec_items.index(item)
            mrr += 1.0 / (rank + 1)
            dcg += 1.0 / np.log2(rank + 2)
        idcg += 1.0 / np.log2(slot + 2)
    return hit / min(k, len(real_items)), mrr, dcg / idcg


def test_single_truth_hit_at_rank0():
    real = pad_lists([[7]])
    rec = pad_lists([[7, 3, 2, 1, 0]])
    hr, mrr, ndcg = ranking_metrics(real, rec, k=5)
    assert hr[0] == 1.0 and mrr[0] == 1.0 and ndcg[0] == 1.0


def test_single_truth_hit_at_rank2():
    real = pad_lists([[9]])
    rec = pad_lists([[3, 4, 9, 1, 0]])
    hr, mrr, ndcg = ranking_metrics(real, rec, k=5)
    assert hr[0] == 1.0
    assert mrr[0] == pytest.approx(1.0 / 3.0)
    assert ndcg[0] == pytest.approx(1.0 / np.log2(4))


def test_miss():
    real = pad_lists([[9]])
    rec = pad_lists([[3, 4, 5, 1, 0]])
    hr, mrr, ndcg = ranking_metrics(real, rec, k=5)
    assert hr[0] == 0.0 and mrr[0] == 0.0 and ndcg[0] == 0.0


def test_multi_truth_matches_oracle():
    rng = np.random.default_rng(3)
    for _ in range(50):
        n_real = rng.integers(1, 6)
        real = rng.choice(50, size=n_real, replace=False).tolist()
        rec = rng.choice(50, size=20, replace=False).tolist()
        for k in (5, 10, 20):
            want = ref_metrics(real, rec, k)
            got = ranking_metrics(pad_lists([real]), pad_lists([rec]), k)
            for w, g in zip(want, (got[0][0], got[1][0], got[2][0])):
                assert g == pytest.approx(w), (real, rec, k)


def test_batched_equals_per_user():
    rng = np.random.default_rng(4)
    reals = [rng.choice(30, size=rng.integers(1, 4), replace=False).tolist()
             for _ in range(17)]
    recs = [rng.choice(30, size=10, replace=False).tolist() for _ in range(17)]
    hr, mrr, ndcg = ranking_metrics(pad_lists(reals), pad_lists(recs), k=10)
    for b in range(17):
        w_hr, w_mrr, w_ndcg = ref_metrics(reals[b], recs[b], 10)
        assert hr[b] == pytest.approx(w_hr)
        assert mrr[b] == pytest.approx(w_mrr)
        assert ndcg[b] == pytest.approx(w_ndcg)


def test_hr_min_k_denominator():
    # 3 real items, K=2, 2 hits -> HR = 2/min(2,3) = 1.0 (reference formula).
    real = pad_lists([[1, 2, 3]])
    rec = pad_lists([[1, 2]])
    hr, _, _ = ranking_metrics(real, rec, k=2)
    assert hr[0] == 1.0


def test_standard_mrr_first_hit_only():
    real = pad_lists([[5, 6]])
    rec = pad_lists([[9, 5, 6, 0]])
    _, mrr_ref, _ = ranking_metrics(real, rec, k=4)
    _, mrr_std, _ = ranking_metrics(real, rec, k=4, standard_mrr=True)
    assert mrr_ref[0] == pytest.approx(1 / 2 + 1 / 3)
    assert mrr_std[0] == pytest.approx(1 / 2)


def test_rmse_mae():
    rmse, mae = rmse_mae([1.0, 2.0, 3.0], [1.5, 2.0, 2.0])
    assert mae == pytest.approx((0.5 + 0.0 + 1.0) / 3)
    assert rmse == pytest.approx(np.sqrt((0.25 + 0.0 + 1.0) / 3))


def test_standard_mrr_flag_through_evaluator(tmp_path):
    """metrics.standard_mrr switches the evaluator to first-hit MRR."""
    from cleverrec_tpu.data import load_ranking_data
    from cleverrec_tpu.models import make_model
    from cleverrec_tpu.models.base import DataMeta
    from cleverrec_tpu.train import Trainer
    from tests.conftest import base_config, make_toy_interactions
    ds = tmp_path / "toy"
    ds.mkdir()
    make_toy_interactions(ds / "ratings.csv")
    toy = {"root": str(tmp_path), "name": "toy"}
    ov = {"data.split_way": "rs", "test.neg_samples": "0", "epoches": "1",
          "batch_size": "64", "embed_size": "8", "lr": "0.05",
          "is_pairwise": "True", "loss_func": "bpr", "reg": "0.01"}
    cfg_ref = base_config(toy, **ov)
    cfg_std = base_config(toy, **{**ov, "metrics.standard_mrr": "True"})
    data = load_ranking_data(cfg_ref)
    model = make_model(cfg_ref, DataMeta(data.user_nums, data.item_nums))
    tr = Trainer(model, data, cfg_ref)
    params, opt = tr.init_state()
    params, _, _ = tr.train_epoch(params, opt)
    r_ref = tr.evaluate(params)
    tr_std = Trainer(model, data, cfg_std)
    r_std = tr_std.evaluator.evaluate(params, tr.arrays)
    # Same HR/NDCG; reference "MRR" (sum of reciprocal ranks over all test
    # items) >= standard first-hit MRR, strictly greater with multi-item
    # test sets.
    for k in r_ref:
        assert r_std[k][0] == pytest.approx(r_ref[k][0])
        assert r_std[k][2] == pytest.approx(r_ref[k][2])
        assert r_std[k][1] <= r_ref[k][1] + 1e-6
