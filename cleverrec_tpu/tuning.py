"""Hyperparameter grid search — the ``main_tuning.py`` equivalent.

The reference grid-searches embed_size x reg x neg_ratio with one
``tf.reset_default_graph()`` per combination, sharing the preprocessed
data across trials (main_tuning.py:33-66).  Here data is likewise loaded
once; each trial builds a fresh model + trainer (jit caches are keyed by
shapes, so repeated trials with equal shapes reuse compiled programs —
strictly better than the reference's per-trial graph rebuild).

Any list-valued config key becomes a grid axis: pass them via
``grid={"embed_size": [64, 128], "reg": [0.1, 0.01]}`` or let
``grid_from_config`` pull the reference's three axes.
"""

from __future__ import annotations

import itertools
from typing import Any, Mapping, Sequence

import numpy as np

from cleverrec_tpu.config import Config, _parse_list


def grid_from_config(cfg: Config) -> dict[str, list]:
    """The reference's grid axes: embed_size / reg / neg_ratio
    (main_tuning.py:39-46), read as list syntax [a,b,c]."""
    grid = {}
    for key, cast in (("embed_size", int), ("reg", float),
                      ("neg_ratio", int)):
        raw = cfg.get(key)
        if raw is None:
            continue
        s = str(raw)
        if "," in s or s.strip().startswith("["):
            grid[key] = _parse_list(raw, cast)
    return grid


def run_grid(cfg: Config, grid: Mapping[str, Sequence[Any]] | None = None,
             logger=None, mesh=None):
    """Run every grid combination; returns (best, all_results) — ranked
    by NDCG@topk[0] for ranking models (the reference's best-metric
    criterion) or by lowest RMSE for rating models (FM/FFM)."""
    grid = dict(grid) if grid else grid_from_config(cfg)
    if not grid:
        raise ValueError("no grid axes: pass grid= or list-valued config")
    log = logger.info if logger else (lambda *a: None)
    keys = sorted(grid)
    combos = list(itertools.product(*(grid[k] for k in keys)))

    results = []
    if cfg.model_type == "rating":
        from cleverrec_tpu.data.libfm import load_rating_data
        from cleverrec_tpu.rating import FMTrainer, make_rating_model
        data = load_rating_data(cfg)              # preprocess ONCE
        for combo in combos:
            overrides = {k: str(v) for k, v in zip(keys, combo)}
            trial_cfg = cfg.with_overrides(**overrides)
            log("== trial %s", overrides)
            model = make_rating_model(trial_cfg, data)
            best = FMTrainer(model, data, trial_cfg, logger=logger,
                             mesh=mesh).run()
            results.append({"params": dict(zip(keys, combo)),
                            "best": best})
        top = min(results, key=lambda r: r["best"]["rmse"])
        log("== best trial: %s -> RMSE=%.4f", top["params"],
            top["best"]["rmse"])
        return top, results

    from cleverrec_tpu.data import load_ranking_data
    from cleverrec_tpu.models import make_model
    from cleverrec_tpu.models.base import DataMeta
    from cleverrec_tpu.train import Trainer

    # Preprocess ONCE (main_tuning.py:33-36).
    base = cfg.with_overrides(**{k: str(v[0]) for k, v in grid.items()})
    rng = np.random.default_rng(cfg.seed)
    data = load_ranking_data(base, rng=rng, logger=logger)
    meta = DataMeta(data.user_nums, data.item_nums)

    for combo in combos:
        overrides = {k: str(v) for k, v in zip(keys, combo)}
        trial_cfg = cfg.with_overrides(**overrides)
        log("== trial %s", overrides)
        model = make_model(trial_cfg, meta)
        trainer = Trainer(model, data, trial_cfg, logger=logger, mesh=mesh)
        best = trainer.run()
        results.append({"params": dict(zip(keys, combo)), "best": best})
    top = max(results, key=lambda r: r["best"]["ndcg"])
    log("== best trial: %s -> NDCG=%.4f", top["params"],
        top["best"]["ndcg"])
    return top, results
