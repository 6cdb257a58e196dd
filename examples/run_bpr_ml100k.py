"""BPR on ml-100k: the canonical end-to-end run via the Python API."""

import os

from cleverrec_tpu.config import Config
from cleverrec_tpu.data import load_ranking_data
from cleverrec_tpu.models import make_model
from cleverrec_tpu.models.base import DataMeta
from cleverrec_tpu.train import Trainer
from cleverrec_tpu.utils import get_logger
from cleverrec_tpu.utils.logging import enable_compilation_cache

DATA_ROOT = os.environ.get("DATA_ROOT", "/root/reference/dataset")


def main():
    enable_compilation_cache()
    cfg = Config({
        "recommender": "BPR", "model_type": "ranking",
        "data.root_dir": DATA_ROOT, "data.dataset": "ml-100k",
        "data.file_name": "u.data", "data.sep": "\t", "data.format": "UIRT",
        "data.split_way": "loo", "data.split_by_time": "True",
        "test.neg_samples": "99", "test.batch_size": "1024",
        "test.interval": "1", "topk": "[10,20]",
        "epoches": "30", "batch_size": "6144", "embed_size": "64",
        "reg": "0.01", "lr": "0.001", "neg_ratio": "4", "optimizer": "Adam",
        "is_pairwise": "True", "loss_func": "bpr", "init_method": "normal",
        "stddev": "0.01", "seed": "42",
    })
    logger = get_logger(None, "BPR-example")
    data = load_ranking_data(cfg, logger=logger)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    best = Trainer(model, data, cfg, logger=logger).run()
    print("best:", best)


if __name__ == "__main__":
    main()
