"""North-star benchmark runs on the reconstructed ml-1m (BASELINE.json):
BPR / NeuMF / CML metrics + throughput, 1000-negative candidate eval
(the reference's test.neg_samples=1000 mode, CleverRec.properties:37).

Data: data/ml-1m-recon (20% real ratings recovered from the reference's
surviving ml-1m.test.libfm + 80% marginal-matched synthetic; see
benchmarks/ml1m_reconstruct.py).  Regenerated automatically if absent.

Usage:
  python benchmarks/ml1m_runs.py BPR|NeuMF|CML [epochs] [neg]
  python benchmarks/ml1m_runs.py tf1 [epochs] [neg]   # TF1 BPR parity arm

Each run appends a JSON record to benchmarks/ML1M_RUNS.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cleverrec_tpu.config import Config  # noqa: E402
from cleverrec_tpu.utils.logging import enable_compilation_cache  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(ROOT, "data")
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "ML1M_RUNS.jsonl")

MODEL_OVERRIDES = {
    "BPR": {"is_pairwise": "True", "loss_func": "bpr", "reg": "0.01",
            "embed_size": "64", "lr": "0.001", "neg_ratio": "4"},
    "NeuMF": {"is_pairwise": "False", "loss_func": "cross_entropy",
              "layers": "[128,64,32]", "reg1": "0.0", "reg2": "0.0",
              "embed_size": "64", "lr": "0.001", "neg_ratio": "4"},
    "CML": {"is_pairwise": "True", "loss_func": "hinge", "margin": "1.0",
            "reg": "0.1", "embed_size": "64", "lr": "0.05",
            "neg_ratio": "10"},
    "GMF": {"is_pairwise": "False", "loss_func": "cross_entropy",
            "reg": "0.01", "embed_size": "64", "lr": "0.001",
            "neg_ratio": "4"},
}


def ensure_data():
    path = os.path.join(DATA, "ml-1m-recon", "ratings.csv")
    if not os.path.exists(path):
        from benchmarks import ml1m_reconstruct
        ml1m_reconstruct.main()
    return path


def base_cfg(name, epochs, neg, embed=None):
    ov = dict(MODEL_OVERRIDES.get(name, MODEL_OVERRIDES["BPR"]))
    if embed:
        ov["embed_size"] = str(embed)
    return Config({
        "recommender": name if name != "tf1" else "BPR",
        "model_type": "ranking",
        "data.root_dir": DATA, "data.dataset": "ml-1m-recon",
        "data.file_name": "ratings.csv", "data.sep": ",",
        "data.format": "UIRT", "data.split_way": "loo",
        "data.split_by_time": "True", "data.user_min": "0",
        "data.item_min": "0", "test.neg_samples": str(neg),
        "test.batch_size": "512", "test.interval": "5", "topk": "[10,20]",
        "epoches": str(epochs), "batch_size": "6144",
        "optimizer": "Adam", "init_method": "normal", "stddev": "0.01",
        "seed": "42", **ov,
    })


def record(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec, indent=2))


def run_ours(name, epochs, neg, embed=None):
    enable_compilation_cache()
    from cleverrec_tpu.data import load_ranking_data
    from cleverrec_tpu.models import make_model
    from cleverrec_tpu.models.base import DataMeta
    from cleverrec_tpu.train import Trainer
    import logging
    logging.basicConfig(level=logging.INFO, stream=sys.stdout,
                        format="%(message)s")
    cfg = base_cfg(name, epochs, neg, embed)
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    tr = Trainer(model, data, cfg, logger=logging.getLogger("ml1m"))
    t0 = time.time()
    best = tr.run()
    wall = time.time() - t0
    # Steady-state marginal throughput (post-compile): one more block.
    p, o = tr.params, tr.opt_state
    t0 = time.time()
    p, o, _ = tr.train_epochs(p, o, 1)
    t1 = time.time() - t0
    t0 = time.time()
    p, o, _ = tr.train_epochs(p, o, 5)
    t5 = time.time() - t0
    per_epoch = max((t5 - t1) / 4, 1e-9)
    record({
        "arm": "tpu", "model": name, "dataset": "ml-1m-recon",
        "epochs": epochs, "neg_samples": neg,
        "embed_size": cfg.int("embed_size"),
        "best_epoch": best["epoch"],
        "metrics": {str(k): list(v) for k, v in best["metrics"].items()},
        "wall_s": round(wall, 1),
        "epoch_ms": round(per_epoch * 1e3, 1),
        "examples_per_s": round(tr._epoch_rows / per_epoch, 1),
        "fused_path": hasattr(tr, "_epoch_body")
        and tr._fused_epoch_eligible(),
    })


def run_tf1(epochs, neg):
    from cleverrec_tpu.data import load_ranking_data
    # Import ONE module object (top-level `parity_bpr` and
    # `benchmarks.parity_bpr` would be distinct — overrides on one would
    # not reach the other).
    from benchmarks import parity_bpr as pb
    cfg = base_cfg("BPR", epochs, neg)
    pb.EMBED = int(MODEL_OVERRIDES["BPR"]["embed_size"])
    pb.NEG_RATIO = int(MODEL_OVERRIDES["BPR"]["neg_ratio"])
    data = load_ranking_data(cfg)
    t0 = time.time()
    best = pb.run_tf1(data, epochs)
    wall = time.time() - t0
    record({
        "arm": "tf1_cpu", "model": "BPR", "dataset": "ml-1m-recon",
        "epochs": epochs, "neg_samples": neg,
        "metrics": {str(k): list(v) for k, v in best.items()},
        "wall_s": round(wall, 1),
    })


def main():
    ensure_data()
    name = sys.argv[1]
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    neg = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    embed = int(sys.argv[4]) if len(sys.argv) > 4 else None
    if name == "tf1":
        run_tf1(epochs, neg)
    else:
        run_ours(name, epochs, neg, embed)


if __name__ == "__main__":
    main()
