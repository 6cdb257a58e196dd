"""Checkpointing + warm-start grafts + mid-train resume."""

import numpy as np
import pytest

from cleverrec_tpu.data import load_ranking_data
from cleverrec_tpu.models import make_model
from cleverrec_tpu.models.base import DataMeta
from cleverrec_tpu.train import Trainer
from cleverrec_tpu.train.checkpoint import (apply_warm_start, graft_neumf,
                                            load_params, save_checkpoint)
from tests.conftest import base_config


def _train(name, toy, tmp_path, extra=None, epochs=1):
    ov = {"recommender": name, "epoches": str(epochs), "batch_size": "64",
          "embed_size": "8", "lr": "0.05", "neg_ratio": "1"}
    ov.update(extra or {})
    cfg = base_config(toy, **ov)
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    trainer = Trainer(model, data, cfg)
    params, opt_state = trainer.init_state()
    params, opt_state, _ = trainer.train_epoch(params, opt_state)
    return cfg, trainer, params, opt_state


def test_save_load_roundtrip(toy_dataset, tmp_path):
    cfg, trainer, params, opt_state = _train(
        "BPR", toy_dataset, tmp_path,
        {"is_pairwise": "True", "loss_func": "bpr", "reg": "0.01"})
    path = save_checkpoint(str(tmp_path / "ck"), params, opt_state, epoch=1,
                           key=trainer._loop_key)
    got = load_params(path)
    np.testing.assert_allclose(np.asarray(got["P"]), np.asarray(params["P"]))
    np.testing.assert_allclose(np.asarray(got["Q"]), np.asarray(params["Q"]))


def test_neumf_warm_start_graft(toy_dataset, tmp_path):
    _, _, gmf_params, _ = _train(
        "GMF", toy_dataset, tmp_path,
        {"is_pairwise": "False", "loss_func": "cross_entropy", "reg": "0.01"})
    _, _, mlp_params, _ = _train(
        "MLP", toy_dataset, tmp_path,
        {"is_pairwise": "False", "loss_func": "cross_entropy",
         "reg": "0.01", "layers": "[16,8]"})
    gmf_path = save_checkpoint(str(tmp_path / "gmf"), gmf_params)
    mlp_path = save_checkpoint(str(tmp_path / "mlp"), mlp_params)

    cfg = base_config(toy_dataset, **{
        "recommender": "NeuMF", "is_pairwise": "False",
        "loss_func": "cross_entropy", "layers": "[16,8]", "reg1": "0.01",
        "reg2": "0.01", "epoches": "1", "batch_size": "64",
        "embed_size": "16", "gmf_pretrain": gmf_path,
        "mlp_pretrain": mlp_path})
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    trainer = Trainer(model, data, cfg)
    params, _ = trainer.init_state()
    np.testing.assert_allclose(np.asarray(params["P_gmf"]),
                               np.asarray(gmf_params["P"]))
    np.testing.assert_allclose(np.asarray(params["P_mlp"]),
                               np.asarray(mlp_params["P"]))
    want_h = 0.5 * np.concatenate([np.asarray(gmf_params["h_gmf"]),
                                   np.asarray(mlp_params["h_mlp"])])
    np.testing.assert_allclose(np.asarray(params["h_neumf"]), want_h)
    # And the grafted model still trains.
    params, opt_state = trainer.init_state()
    _, _, loss = trainer.train_epoch(params, opt_state)
    assert np.isfinite(loss)


def test_resume_roundtrip(toy_dataset, tmp_path):
    cfg, trainer, params, opt_state = _train(
        "BPR", toy_dataset, tmp_path,
        {"is_pairwise": "True", "loss_func": "bpr", "reg": "0.01"})
    path = save_checkpoint(str(tmp_path / "resume"), params, opt_state,
                           epoch=1, key=trainer._loop_key)
    p2, o2, done = trainer.resume(path)
    assert done == 1
    np.testing.assert_allclose(np.asarray(p2["P"]), np.asarray(params["P"]))
    p3, o3, loss = trainer.train_epoch(p2, o2)
    assert np.isfinite(loss)


def test_nais_warm_start_from_fism(toy_dataset, tmp_path):
    _, _, fism_params, _ = _train(
        "FISM", toy_dataset, tmp_path,
        {"is_pairwise": "True", "loss_func": "bpr", "reg": "0.001",
         "reg_bias": "0.001", "alpha": "0.4", "fism_like": "True"})
    path = save_checkpoint(str(tmp_path / "fism"), fism_params)
    cfg = base_config(toy_dataset, **{
        "recommender": "NAIS", "is_pairwise": "False",
        "loss_func": "cross_entropy", "reg": "0.001", "atten_size": "4",
        "beta": "0.5", "atten_type": "prod", "epoches": "1",
        "batch_size": "64", "embed_size": "8", "fism_pretrain": path})
    from cleverrec_tpu.data import load_ranking_data
    from cleverrec_tpu.models import make_model
    from cleverrec_tpu.models.base import DataMeta
    from cleverrec_tpu.train import Trainer
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    trainer = Trainer(model, data, cfg)
    params, opt_state = trainer.init_state()
    np.testing.assert_allclose(np.asarray(params["P"]),
                               np.asarray(fism_params["P"]))
    np.testing.assert_allclose(np.asarray(params["bias"]),
                               np.asarray(fism_params["b"]))
    _, _, loss = trainer.train_epoch(params, opt_state)
    assert np.isfinite(loss)
