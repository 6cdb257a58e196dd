"""Serving: retrieval closure + export/load round trip."""

import numpy as np
import jax.numpy as jnp

from cleverrec_tpu.data import load_ranking_data
from cleverrec_tpu.models import make_model
from cleverrec_tpu.models.base import DataMeta
from cleverrec_tpu.serving import (build_retrieval_fn, export_retrieval,
                                   load_retrieval)
from cleverrec_tpu.train import Trainer
from tests.conftest import base_config


def _trained(toy):
    cfg = base_config(toy, **{"data.split_way": "rs", "test.neg_samples": "0",
                              "epoches": "1", "batch_size": "64",
                              "embed_size": "8", "lr": "0.05",
                              "is_pairwise": "True", "loss_func": "bpr",
                              "reg": "0.01"})
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    tr = Trainer(model, data, cfg)
    params, opt = tr.init_state()
    params, _, _ = tr.train_epoch(params, opt)
    return model, params, tr


def test_retrieval_filters_seen(toy_dataset):
    model, params, tr = _trained(toy_dataset)
    fn = build_retrieval_fn(model, params, tr.arrays, tr.dd, k=5)
    u = jnp.asarray([0, 1, 2, 3], dtype=jnp.int32)
    items, scores = fn(u)
    assert items.shape == (4, 5) and scores.shape == (4, 5)
    for r, uu in enumerate(np.asarray(u)):
        seen = set(tr.data.ui_train.get(int(uu), []))
        assert not (set(np.asarray(items[r]).tolist()) & seen)
    # Scores descending.
    s = np.asarray(scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()


def test_export_round_trip(toy_dataset):
    model, params, tr = _trained(toy_dataset)
    fn = build_retrieval_fn(model, params, tr.arrays, tr.dd, k=5)
    u = jnp.asarray([0, 1, 2, 3], dtype=jnp.int32)
    want_items, want_scores = fn(u)
    blob = export_retrieval(model, params, tr.arrays, tr.dd, batch=4, k=5)
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 0
    served = load_retrieval(bytes(blob))
    got_items, got_scores = served(u)
    np.testing.assert_array_equal(np.asarray(got_items),
                                  np.asarray(want_items))
    np.testing.assert_allclose(np.asarray(got_scores),
                               np.asarray(want_scores), rtol=1e-6)
