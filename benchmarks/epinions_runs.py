"""Social models at Epinions scale (BASELINE.json config #5): SBPR /
TBPR / SAMN on data/epinions-synth (REAL 356k-edge trust graph, synthetic
ratings with planted homophily — see benchmarks/epinions_synth.py).

Usage: python benchmarks/epinions_runs.py SBPR|TBPR|SAMN [epochs]
Appends a JSON record to benchmarks/EPINIONS_RUNS.jsonl.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cleverrec_tpu.config import Config  # noqa: E402
from cleverrec_tpu.utils.logging import enable_compilation_cache  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "EPINIONS_RUNS.jsonl")

MODEL_OVERRIDES = {
    "SBPR": {"loss_func": "bpr", "reg": "0.01", "embed_size": "64",
             "lr": "0.001", "neg_ratio": "4"},
    "TBPR": {"loss_func": "bpr", "reg": "0.01", "embed_size": "64",
             "lr": "0.001", "neg_ratio": "4", "strong_ratio": "0.5"},
    "SAMN": {"loss_func": "bpr", "reg1": "0.01", "reg2": "0.01",
             "embed_size": "32", "mem_size": "8", "atten_size": "8",
             "lr": "0.001", "neg_ratio": "4",
             "social.max_friends": "64"},
}


def base_cfg(name, epochs):
    return Config({
        "recommender": name, "model_type": "ranking",
        "data.root_dir": os.path.join(ROOT, "data"),
        "data.dataset": "epinions-synth", "data.file_name": "ratings.csv",
        "data.sep": ",", "data.format": "UIRT", "data.split_way": "loo",
        "data.split_by_time": "True", "data.user_min": "0",
        "data.item_min": "0", "social_file": "trusts.csv",
        "test.neg_samples": "99", "test.batch_size": "1024",
        "test.interval": "1", "topk": "[10,20]", "epoches": str(epochs),
        "batch_size": "6144", "optimizer": "Adam",
        "is_pairwise": "True", "init_method": "normal", "stddev": "0.01",
        "seed": "42", **MODEL_OVERRIDES[name],
    })


def run_tf1_sbpr(epochs):
    """TF1-semantics SBPR arm (benchmarks/tf1_models.py) on the same
    synthetic-Epinions data + recipe as the `ours` arm — the social-family
    metric-parity anchor (VERDICT round 2, task 5)."""
    import time as _t
    from cleverrec_tpu.data import load_ranking_data
    from cleverrec_tpu.data.social import build_spu
    from benchmarks import tf1_models
    cfg = base_cfg("SBPR", epochs)
    data = load_ranking_data(cfg)
    spu, suk = build_spu(data.ui_train, data.user_friends)
    hp = {"embed": int(MODEL_OVERRIDES["SBPR"]["embed_size"]),
          "reg": float(MODEL_OVERRIDES["SBPR"]["reg"]),
          "lr": float(MODEL_OVERRIDES["SBPR"]["lr"]),
          "neg_ratio": int(MODEL_OVERRIDES["SBPR"]["neg_ratio"]),
          "stddev": 0.01}
    t0 = _t.time()
    best, best_ep = tf1_models.run_tf1("SBPR", data, hp, epochs,
                                       seed=0, spu=spu, suk=suk)
    rec = {
        "arm": "tf1_cpu", "model": "SBPR", "dataset": "epinions-synth",
        "users": data.user_nums, "items": data.item_nums,
        "epochs": epochs, "best_epoch": best_ep,
        "metrics": {str(k): list(v) for k, v in best.items()},
        "wall_s": round(_t.time() - t0, 1),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec, indent=2))


def main():
    name = sys.argv[1]
    path = "auto"
    if "--scan" in sys.argv:
        sys.argv.remove("--scan")
        path = "scan"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    if not os.path.exists(os.path.join(ROOT, "data", "epinions-synth",
                                       "ratings.csv")):
        from benchmarks import epinions_synth
        epinions_synth.main()
    if name == "tf1":
        run_tf1_sbpr(epochs)
        return
    enable_compilation_cache()
    from cleverrec_tpu.data import load_ranking_data
    from cleverrec_tpu.models import make_model
    from cleverrec_tpu.models.base import DataMeta
    from cleverrec_tpu.train import Trainer
    logging.basicConfig(level=logging.INFO, stream=sys.stdout,
                        format="%(message)s")
    cfg = base_cfg(name, epochs)
    if path == "scan":
        # True dense-Adam scan baseline: no fused kernel AND no lazy
        # row-Adam tier (which otherwise takes rows overflow shapes).
        cfg._v["train.fused_kernel"] = "False"
        cfg._v["train.sparse_rows"] = "False"
    t0 = time.time()
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    tr = Trainer(model, data, cfg, logger=logging.getLogger("epi"))
    setup_s = time.time() - t0
    t0 = time.time()
    best = tr.run()
    wall = time.time() - t0
    p, o = tr.params, tr.opt_state
    # Warm BOTH block programs before timing (interval=1 runs never
    # compile the multi-epoch scans during run()).
    p, o, _ = tr.train_epochs(p, o, 1)
    p, o, _ = tr.train_epochs(p, o, 4)
    t0 = time.time()
    p, o, _ = tr.train_epochs(p, o, 1)
    t1 = time.time() - t0
    t0 = time.time()
    p, o, _ = tr.train_epochs(p, o, 4)
    t4 = time.time() - t0
    per_epoch = max((t4 - t1) / 3, 1e-9)
    tier = ("fused" if tr._fused_plan is not None
            else "sparse_rows" if getattr(tr, "_sparse_tier", False)
            else "scan")
    rec = {
        "model": name, "dataset": "epinions-synth", "tier": tier,
        "users": data.user_nums, "items": data.item_nums,
        "epochs": epochs, "best_epoch": best["epoch"],
        "metrics": {str(k): list(v) for k, v in best["metrics"].items()},
        "setup_s": round(setup_s, 1), "wall_s": round(wall, 1),
        "epoch_ms": round(per_epoch * 1e3, 1),
        "examples_per_s": round(tr._epoch_rows / per_epoch, 1),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec, indent=2))


if __name__ == "__main__":
    main()
