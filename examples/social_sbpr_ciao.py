"""Social recommendation: SBPR on Ciao (ratings + trust graph)."""

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
        "recommender": "SBPR", "model_type": "ranking",
        "data.root_dir": DATA_ROOT, "data.dataset": "Ciao",
        "data.file_name": "ratings.csv", "data.sep": ",",
        "data.format": "UI", "data.split_way": "loo",
        "data.split_by_time": "False", "data.user_min": "0",
        "data.item_min": "5", "social_file": "trusts.csv",
        "test.neg_samples": "99", "test.batch_size": "1024",
        "test.interval": "1", "topk": "[10,20]",
        "epoches": "10", "batch_size": "6144", "embed_size": "64",
        "reg": "0.05", "lr": "0.001", "neg_ratio": "10",
        "optimizer": "Adam", "is_pairwise": "True", "loss_func": "bpr",
        "init_method": "normal", "stddev": "0.01", "seed": "7",
    })
    logger = get_logger(None, "SBPR-example")
    data = load_ranking_data(cfg, logger=logger)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    best = Trainer(model, data, cfg, logger=logger).run()
    print("best:", best)


if __name__ == "__main__":
    main()
