"""Measure the two sharded-embedding tiers (VERDICT round-2 task 3).

Modes:
  python benchmarks/sharding_tiers.py hlo    # virtual 8-dev CPU mesh:
      compile the BPR epoch program per tier per mesh shape, count the
      collectives XLA emitted (compiled-HLO collective counts are the
      measurable proxy for ICI traffic without a pod).
  python benchmarks/sharding_tiers.py chip   # real TPU: marginal epoch
      cost of no-mesh vs mesh(1,1) gspmd vs mesh(1,1) explicit — the
      sharding machinery's overhead at 1 chip.

Appends records to benchmarks/SHARDING_TIERS.jsonl.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "SHARDING_TIERS.jsonl")

COLLECTIVES = ("all-reduce", "all-gather", "all-to-all",
               "collective-permute", "reduce-scatter")


def record(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


def build_trainer(mesh=None, exchange="gspmd", dataset="ml-100k",
                  fused=False, embed=64):
    from cleverrec_tpu.config import Config
    from cleverrec_tpu.data import load_ranking_data
    from cleverrec_tpu.models import make_model
    from cleverrec_tpu.models.base import DataMeta
    from cleverrec_tpu.train import Trainer
    cfg = Config({
        "recommender": "BPR", "model_type": "ranking",
        "data.root_dir": "/root/reference/dataset",
        "data.dataset": dataset, "data.file_name": "u.data",
        "data.sep": "\t", "data.format": "UIRT", "data.split_way": "loo",
        "data.split_by_time": "True", "data.user_min": "0",
        "data.item_min": "0", "test.neg_samples": "99",
        "test.batch_size": "1024", "test.interval": "1", "topk": "[10,20]",
        "epoches": "2", "batch_size": "6144", "embed_size": str(embed),
        "reg": "0.01", "lr": "0.001", "neg_ratio": "4", "optimizer": "Adam",
        "is_pairwise": "True", "loss_func": "bpr", "init_method": "normal",
        "stddev": "0.01", "seed": "42",
        "parallel.exchange": exchange,
        # fused=False: compare the same scan program across tiers.
        # fused=True: the mesh-DP fused tier (round-3 verdict item 1) —
        # the flagship whole-epoch kernel must survive a mesh.
        "train.fused_kernel": str(fused),
    })
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    return Trainer(model, data, cfg, mesh=mesh)


def count_collectives(text: str) -> dict[str, int]:
    counts = {}
    for op in COLLECTIVES:
        # Instruction names like `%all-gather.3 = ...`; count definitions
        # (start/done pairs collapse to the async start).  TUPLE-shaped
        # defs (`= (f32[...], f32[...]) all-reduce(`) have spaces in the
        # type, so also match the op token directly before its paren.
        n = len(re.findall(rf"= \S* ?{op}(?:-start)?\(", text))
        if n == 0:
            n = len(re.findall(rf"{op}(?:-start)?\.\d+ =", text))
        if n == 0:
            n = len(re.findall(rf"\) {op}(?:-start)?\(", text))
        counts[op] = n
    return counts


def hlo_mode():
    import jax
    from cleverrec_tpu.parallel.mesh import make_mesh
    for shape in [(4, 2), (2, 4), (1, 8)]:
        mesh = make_mesh(*shape)
        for exchange in ("gspmd", "explicit"):
            tr = build_trainer(mesh=mesh, exchange=exchange)
            params, opt_state = tr.init_state()
            key = jax.random.PRNGKey(0)
            body = tr._epoch_body
            compiled = (jax.jit(body)
                        .lower(params, opt_state, key, tr.arrays)
                        .compile())
            text = compiled.as_text()
            counts = count_collectives(text)
            record({"mode": "hlo", "mesh": list(shape),
                    "exchange": exchange,
                    "collectives": counts,
                    "total_collectives": sum(counts.values()),
                    "hlo_instructions": text.count(" = ")})

    # Fused mesh-DP tier at (8,1): per-epoch local Adam should compile to
    # a constant handful of all-reduces (the delta averages + loss psum),
    # independent of step count — nothing per-step crosses chips.
    mesh = make_mesh(8, 1)
    tr = build_trainer(mesh=mesh, fused=True)
    assert tr._fused_plan is not None, "fused tier forfeited on (8,1)"
    params, opt_state = tr.init_state()
    key = jax.random.PRNGKey(0)
    compiled = (jax.jit(tr._epoch_body)
                .lower(params, opt_state, key, tr.arrays).compile())
    text = compiled.as_text()
    counts = count_collectives(text)
    record({"mode": "hlo-fused", "mesh": [8, 1], "exchange": "gspmd",
            "collectives": counts,
            "total_collectives": sum(counts.values()),
            "hlo_instructions": text.count(" = ")})


def chip_mode():
    from cleverrec_tpu.parallel.mesh import make_mesh

    def marginal_epoch(tr):
        p, o = tr.init_state()
        p, o, _ = tr.train_epochs(p, o, 1)
        p, o, _ = tr.train_epochs(p, o, 8)
        for _ in range(3):
            t0 = time.time()
            p, o, _ = tr.train_epochs(p, o, 1)
            t1 = time.time() - t0
            t0 = time.time()
            p, o, _ = tr.train_epochs(p, o, 8)
            t8 = time.time() - t0
            if t8 > t1:
                break
        return (t8 - t1) / 7 if t8 > t1 else t8 / 8

    arms = [("none", None, "gspmd"),
            ("mesh(1,1)", make_mesh(1, 1), "gspmd"),
            ("mesh(1,1)", make_mesh(1, 1), "explicit")]
    for name, mesh, exchange in arms:
        tr = build_trainer(mesh=mesh, exchange=exchange)
        per_epoch = marginal_epoch(tr)
        record({"mode": "chip", "mesh": name, "exchange": exchange,
                "epoch_ms": round(per_epoch * 1e3, 2),
                "examples_per_s": round(tr._epoch_rows / per_epoch, 1)})

    # The FUSED tier under a mesh (round-3 verdict item 1): a 1-device
    # mesh must not forfeit the flagship whole-epoch kernel — done =
    # mesh(1,1) fused within ~5% of the unmeshed fused epoch.
    for name, mesh in [("none", None), ("mesh(1,1)", make_mesh(1, 1))]:
        tr = build_trainer(mesh=mesh, fused=True)
        assert tr._fused_plan is not None, f"fused tier forfeited ({name})"
        per_epoch = marginal_epoch(tr)
        record({"mode": "chip-fused", "mesh": name, "exchange": "gspmd",
                "epoch_ms": round(per_epoch * 1e3, 2),
                "examples_per_s": round(tr._epoch_rows / per_epoch, 1)})


def chip_grouped():
    """GROUPED overflow tier under mesh(1,1) (round-4 verdict item 5):
    BPR ml-100k @ embed 256 — the f32 resident plan declines and the
    grouped block-coordinate epoch runs; a pure-DP mesh must no longer
    forfeit it (trainer's chunked per-group launch; a 1-device mesh's
    chunk is the whole group)."""
    from cleverrec_tpu.parallel.mesh import make_mesh

    def marginal_epoch(tr):
        p, o = tr.init_state()
        p, o, _ = tr.train_epochs(p, o, 1)
        p, o, _ = tr.train_epochs(p, o, 8)
        for _ in range(4):
            t0 = time.time()
            p, o, _ = tr.train_epochs(p, o, 1)
            t1 = time.time() - t0
            t0 = time.time()
            p, o, _ = tr.train_epochs(p, o, 8)
            t8 = time.time() - t0
            if t8 > t1:
                break
        return (t8 - t1) / 7 if t8 > t1 else t8 / 8

    for name, mesh in [("none", None), ("mesh(1,1)", make_mesh(1, 1))]:
        tr = build_trainer(mesh=mesh, fused=True, embed=256)
        assert tr._fused_grouped_plan is not None, (
            f"grouped tier forfeited ({name})")
        per_epoch = marginal_epoch(tr)
        record({"mode": "chip-grouped", "mesh": name, "embed_size": 256,
                "exchange": "gspmd",
                "epoch_ms": round(per_epoch * 1e3, 2),
                "examples_per_s": round(tr._epoch_rows / per_epoch, 1)})


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "hlo"
    if mode == "hlo":
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
        hlo_mode()
    elif mode == "chip-grouped":
        from cleverrec_tpu.utils.logging import enable_compilation_cache
        enable_compilation_cache()
        chip_grouped()
    else:
        from cleverrec_tpu.utils.logging import enable_compilation_cache
        enable_compilation_cache()
        chip_mode()


if __name__ == "__main__":
    main()
