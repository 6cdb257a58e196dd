"""Grid-search driver."""

from cleverrec_tpu.tuning import grid_from_config, run_grid
from tests.conftest import base_config
from cleverrec_tpu.config import Config


def test_grid_from_config():
    cfg = Config({"recommender": "BPR", "embed_size": "[8,16]",
                  "reg": "[0.1,0.01]", "neg_ratio": "2"})
    grid = grid_from_config(cfg)
    assert grid == {"embed_size": [8, 16], "reg": [0.1, 0.01]}


def test_run_grid(toy_dataset):
    cfg = base_config(toy_dataset, **{
        "epoches": "2", "batch_size": "64", "lr": "0.05",
        "is_pairwise": "True", "loss_func": "bpr", "reg": "0.01"})
    top, results = run_grid(cfg, grid={"embed_size": [4, 8]})
    assert len(results) == 2
    assert top in results
    assert {r["params"]["embed_size"] for r in results} == {4, 8}
