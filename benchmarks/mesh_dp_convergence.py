"""Metric-level validation of the per-epoch local-Adam DP schedule
(round-4 verdict item 4): does averaging parameter/moment deltas once
per epoch (each chip running 1/D of the epoch's steps independently)
converge to the same quality as per-step psum'd Adam?

Runs on the 8-device virtual CPU mesh (the same local-Adam semantics
the fused mesh-DP tier uses on real chips — tests/test_fused_mesh.py
and tests/test_scan_local_adam.py pin the mechanics; this records the
metric outcome).  Three arms x 3 seeds x {BPR, GMF} on ml-100k
(loo/99-negative):

  unmeshed  — no mesh, scan tier (sequential per-step Adam)
  dp_psum   — mesh(8,1), scan tier (batch sharded over 'data', grads
              psum'd every step — the synchronous baseline)
  dp_local  — mesh(8,1), train.dp_local_adam=True (step axis sharded,
              ONE delta-average all-reduce per epoch)

Appends one JSON row per run to benchmarks/MESH_DP_CONVERGENCE.jsonl.
Usage: python benchmarks/mesh_dp_convergence.py [epochs]
"""

from __future__ import annotations

import json
import logging
import os
import sys

# Virtual 8-CPU mesh BEFORE jax initializes (same dance as conftest).
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from cleverrec_tpu.config import Config  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "MESH_DP_CONVERGENCE.jsonl")

MODEL_OV = {
    "BPR": {"is_pairwise": "True", "loss_func": "bpr", "reg": "0.01"},
    "GMF": {"is_pairwise": "False", "loss_func": "cross_entropy",
            "reg": "0.01"},
}


def run(name, arm, seed, epochs):
    import time

    from cleverrec_tpu.data import load_ranking_data
    from cleverrec_tpu.models import make_model
    from cleverrec_tpu.models.base import DataMeta
    from cleverrec_tpu.parallel.mesh import make_mesh
    from cleverrec_tpu.train import Trainer
    cfg = Config({
        "recommender": name, "model_type": "ranking",
        "data.root_dir": "/root/reference/dataset",
        "data.dataset": "ml-100k", "data.file_name": "u.data",
        "data.sep": "\t", "data.format": "UIRT", "data.split_way": "loo",
        "data.split_by_time": "True", "data.user_min": "0",
        "data.item_min": "0", "test.neg_samples": "99",
        "test.batch_size": "1024", "test.interval": "2", "topk": "[10]",
        "epoches": str(epochs), "batch_size": "6144", "embed_size": "64",
        "lr": "0.001", "neg_ratio": "4", "optimizer": "Adam",
        "init_method": "normal", "stddev": "0.01", "seed": str(seed),
        "train.fused_kernel": "False",
        **MODEL_OV[name],
    })
    mesh = None
    if arm != "unmeshed":
        mesh = make_mesh(8, 1)
    if arm.startswith("dp_local"):
        # Arm syntax: dp_local_<combine> or dp_local_<combine>_k<K>.
        cfg._v["train.dp_local_adam"] = "True"
        parts = arm.split("_")[2:]
        cfg._v["train.dp_delta_combine"] = parts[0]
        if len(parts) > 1 and parts[1].startswith("k"):
            cfg._v["train.dp_sync_every"] = parts[1][1:]
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    tr = Trainer(model, data, cfg, mesh=mesh,
                 logger=logging.getLogger("conv"))
    if arm == "dp_local":
        assert tr._scan_parts[3] == 8, "local-adam tier not engaged"
    t0 = time.time()
    best = tr.run()
    rec = {"model": name, "arm": arm, "seed": seed, "epochs": epochs,
           "best_epoch": best["epoch"],
           "hr10": round(best["metrics"][10][0], 4),
           "ndcg10": round(best["metrics"][10][2], 4),
           "wall_s": round(time.time() - t0, 1)}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    return rec


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    logging.basicConfig(level=logging.WARNING)
    arms = ("unmeshed", "dp_psum", "dp_local_mean", "dp_local_sum",
            "dp_local_count")
    if len(sys.argv) > 2:
        arms = tuple(sys.argv[2].split(","))
    rows = []
    for name in ("BPR", "GMF"):
        for arm in arms:
            for seed in (1, 2, 3):
                rows.append(run(name, arm, seed, epochs))
    # Summary table for PARITY.md.
    for name in ("BPR", "GMF"):
        for arm in arms:
            sel = [r for r in rows
                   if r["model"] == name and r["arm"] == arm]
            hrs = [r["hr10"] for r in sel]
            nds = [r["ndcg10"] for r in sel]
            print(f"{name:4s} {arm:9s} HR@10 {min(hrs):.4f}-{max(hrs):.4f}"
                  f" NDCG@10 {min(nds):.4f}-{max(nds):.4f}", flush=True)


if __name__ == "__main__":
    main()
