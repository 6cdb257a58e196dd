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
    "LRML": {"is_pairwise": "True", "loss_func": "hinge",
             "margin": "0.2", "reg": "0.001", "mem_size": "20",
             "embed_size": "64", "lr": "0.001", "neg_ratio": "1"},
}

# hp dicts for the TF1-semantics arms (benchmarks/tf1_models.py), same
# recipes as MODEL_OVERRIDES so the two arms are directly comparable.
TF1_HP = {
    "GMF": {"embed": 64, "reg": 0.01, "lr": 0.001, "neg_ratio": 4,
            "stddev": 0.01},
    "NeuMF": {"embed": 64, "layers": [128, 64, 32], "reg1": 0.0,
              "reg2": 0.0, "lr": 0.001, "neg_ratio": 4, "stddev": 0.01},
    "CML": {"embed": 64, "margin": 1.0, "reg": 0.1, "lr": 0.05,
            "neg_ratio": 10, "stddev": 0.01},
    "LRML": {"embed": 64, "mem_size": 20, "margin": 0.2, "reg": 0.001,
             "lr": 0.001, "neg_ratio": 1, "stddev": 0.01},
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


def run_ours(name, epochs, neg, embed=None, seed=42, path="auto",
             interval=None):
    enable_compilation_cache()
    from cleverrec_tpu.data import load_ranking_data
    from cleverrec_tpu.models import make_model
    from cleverrec_tpu.models.base import DataMeta
    from cleverrec_tpu.train import Trainer
    import logging
    logging.basicConfig(level=logging.INFO, stream=sys.stdout,
                        format="%(message)s")
    cfg = base_cfg(name, epochs, neg, embed)
    cfg._v["seed"] = str(seed)
    if interval is not None:
        # Models that peak at epoch ~1 on the reconstruction (NeuMF)
        # need every-epoch eval for a fair best-metric comparison with
        # the TF1 arm (which always evals every epoch).
        cfg._v["test.interval"] = str(interval)
    if path == "scan":
        cfg._v["train.fused_kernel"] = "False"
    elif path == "bf16":
        # bf16 table storage opt-in.  NOTE: after the round-4 planner
        # recalibration (bf16's digit one-hots keep ~3 extra
        # table-height temporaries live; ml-1m @ 64 measures 20.6MB
        # scoped) this shape honestly DECLINES bf16-resident and runs
        # grouped either way — the recorded bf16 resident demo is
        # ml-100k @ embed 256 (benchmarks/bf16_fused.py).
        cfg._v["train.fused_bf16"] = "True"
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
        "epochs": epochs, "neg_samples": neg, "seed": seed, "path": path,
        "embed_size": cfg.int("embed_size"),
        "best_epoch": best["epoch"],
        "metrics": {str(k): list(v) for k, v in best["metrics"].items()},
        "wall_s": round(wall, 1),
        "epoch_ms": round(per_epoch * 1e3, 1),
        "examples_per_s": round(tr._epoch_rows / per_epoch, 1),
        "fused_path": hasattr(tr, "_epoch_body")
        and tr._fused_epoch_eligible(),
        # resident=True: the whole-epoch VMEM-resident kernel; False
        # with fused_path=True means the GROUPED overflow tier ran.
        "fused_resident": getattr(tr, "_fused_plan", None) is not None,
        "fused_bf16": bool(getattr(tr, "_fused_bf16", False)),
    })


def run_tf1_model(name, epochs, neg, seed=0):
    """TF1-semantics arm for GMF/NeuMF/CML/LRML (benchmarks/tf1_models.py),
    identical data + recipe as the `ours` arms."""
    from cleverrec_tpu.data import load_ranking_data
    from benchmarks import tf1_models
    cfg = base_cfg(name, epochs, neg)
    data = load_ranking_data(cfg)
    t0 = time.time()
    best, best_ep = tf1_models.run_tf1(name, data, TF1_HP[name], epochs,
                                       seed=seed)
    record({
        "arm": "tf1_cpu", "model": name, "dataset": "ml-1m-recon",
        "epochs": epochs, "neg_samples": neg, "seed": seed,
        "embed_size": TF1_HP[name]["embed"], "best_epoch": best_ep,
        "metrics": {str(k): list(v) for k, v in best.items()},
        "wall_s": round(time.time() - t0, 1),
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
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("model", help="BPR|NeuMF|CML|GMF|LRML, tf1 (BPR "
                    "tf1 arm), or tf1:<MODEL> for the other tf1 arms")
    ap.add_argument("epochs", nargs="?", type=int, default=30)
    ap.add_argument("neg", nargs="?", type=int, default=1000)
    ap.add_argument("embed", nargs="?", type=int, default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--path", choices=["auto", "scan", "bf16"],
                    default="auto")
    a = ap.parse_args()
    ensure_data()
    if a.model == "tf1":
        run_tf1(a.epochs, a.neg)
    elif a.model.startswith("tf1:"):
        run_tf1_model(a.model[4:], a.epochs, a.neg, seed=a.seed)
    else:
        run_ours(a.model, a.epochs, a.neg, a.embed, seed=a.seed,
                 path=a.path)


if __name__ == "__main__":
    main()
