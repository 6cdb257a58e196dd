"""UIRT ratings -> libFM features -> FM rating prediction."""

import os
import shutil
import tempfile

from cleverrec_tpu.config import Config
from cleverrec_tpu.data.fm_convert import convert_dataset
from cleverrec_tpu.rating import run_rating
from cleverrec_tpu.utils import get_logger

DATA_ROOT = os.environ.get("DATA_ROOT", "/root/reference/dataset")


def main():
    work = tempfile.mkdtemp(prefix="fm_example_")
    os.makedirs(os.path.join(work, "ml100k"), exist_ok=True)
    shutil.copy(os.path.join(DATA_ROOT, "ml-100k/u.data"),
                os.path.join(work, "ml100k/u.data"))
    train, test = convert_dataset(work, "ml100k", "u.data", "\t",
                                  test_size=0.2, seed=0)
    print("wrote", train, "and", test)
    cfg = Config({
        "recommender": "FM", "model_type": "rating",
        "data.root_dir": work, "data.dataset": "ml100k",
        "train": ".train.libfm", "test": ".test.libfm",
        "is_real_valued": "True", "epoches": "15", "batch_size": "4096",
        "test.batch_size": "8192", "embed_size": "16", "reg": "0.001",
        "lr": "0.005", "optimizer": "Adam", "loss_func": "square",
        "init_method": "normal", "stddev": "0.01", "seed": "2",
    })
    best = run_rating(cfg, logger=get_logger(None, "FM-example"))
    print("best:", best)


if __name__ == "__main__":
    main()
