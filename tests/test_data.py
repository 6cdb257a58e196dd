"""Data pipeline invariants (reference: model/RankingPreprocess.py)."""

import numpy as np
import pytest

from cleverrec_tpu.data import build_device_data, load_ranking_data
from tests.conftest import base_config


def test_loo_split_invariants(toy_dataset):
    cfg = base_config(toy_dataset, **{"test.neg_samples": "10"})
    data = load_ranking_data(cfg)
    # Each test user has exactly 1 ground-truth item appended last.
    for u, cand in data.ui_test.items():
        assert len(cand) == 10 + 1
        gt = cand[-1]
        # loo: ground truth is the user's LAST interaction, not in train.
        assert gt not in data.ui_train.get(u, [])
    # Users with <= 3 interactions stay fully in train: they have no test row.
    counts = {}
    for u, items in data.ui_train.items():
        counts[u] = len(items)
    for u in data.ui_test:
        assert counts[u] >= 3  # had > 3 total, kept >= 3 in train


def test_loo_negatives_unseen(toy_dataset):
    cfg = base_config(toy_dataset)
    data = load_ranking_data(cfg)
    for u, cand in data.ui_test.items():
        seen = set(data.ui_train.get(u, []))
        for j in cand[:-1]:
            assert j not in seen


def test_random_split_sizes(toy_dataset):
    cfg = base_config(toy_dataset, **{"data.split_way": "rs",
                                      "test.neg_samples": "0"})
    data = load_ranking_data(cfg)
    n_train = sum(len(v) for v in data.ui_train.values())
    n_test = sum(len(v) for v in data.ui_test.values())
    assert n_train == pytest.approx(0.7 * data.ratings_num, abs=2)
    assert n_test == pytest.approx(0.1 * data.ratings_num, abs=2)
    assert not data.candidate_eval


def test_reindex_dense(toy_dataset):
    cfg = base_config(toy_dataset)
    data = load_ranking_data(cfg)
    all_items = set()
    all_users = set()
    for u, items in data.ui_train.items():
        all_users.add(u)
        all_items.update(items)
    assert max(all_users) < data.user_nums
    assert max(all_items) < data.item_nums


def test_min_count_filter(toy_dataset):
    # No validation slice so train+test covers every surviving row.
    cfg = base_config(toy_dataset, **{"data.item_min": "5",
                                      "data.split_way": "rs",
                                      "data.split_ratio": "[0.9,0,0.1]",
                                      "test.neg_samples": "0"})
    data = load_ranking_data(cfg)
    counts = np.zeros(data.item_nums)
    for items in data.ui_train.values():
        for i in items:
            counts[i] += 1
    for items in data.ui_test.values():
        for i in items:
            counts[i] += 1
    assert counts.min() >= 5


def test_device_data_packing(toy_dataset):
    cfg = base_config(toy_dataset)
    data = load_ranking_data(cfg)
    dd = build_device_data(data)
    n = sum(len(v) for v in data.ui_train.values())
    assert dd.num_pairs == n
    # Seen table rows are sorted and sentinel-padded.
    for u in range(dd.user_nums):
        row = dd.seen.rows[u]
        ln = dd.seen.lens[u]
        assert (np.diff(row) >= 0).all()
        assert (row[ln:] == dd.item_nums).all()
        assert set(row[:ln].tolist()) == set(data.ui_train.get(u, []))
    # Candidate matrix: ground truth at tail, mask marks valid cols.
    for r, u in enumerate(dd.test_users):
        cand = data.ui_test[int(u)]
        assert dd.cand[r, : len(cand)].tolist() == cand
        assert dd.cand_mask[r, : len(cand)].all()
        assert not dd.cand_mask[r, len(cand):].any()


def test_social_max_friends_cap(toy_social_dataset):
    """social.max_friends caps the padded friend matrix width (heavy-tail
    graphs); full friend lists still drive SPu computation."""
    from tests.conftest import base_config
    from cleverrec_tpu.data import load_ranking_data
    cfg = base_config(toy_social_dataset, **{"social_file": "trusts.csv"})
    cfg_cap = base_config(toy_social_dataset,
                          **{"social_file": "trusts.csv",
                             "social.max_friends": "2"})
    d0 = load_ranking_data(cfg)
    d1 = load_ranking_data(cfg_cap)
    assert d1.friends_padded.shape[1] == 2
    assert d0.friends_padded.shape[1] >= 2
    # Capped rows are prefixes of the full rows.
    import numpy as np
    np.testing.assert_array_equal(d1.friends_padded,
                                  d0.friends_padded[:, :2])
    # SPu source (user_friends) unaffected by the cap.
    assert d1.user_friends == d0.user_friends
