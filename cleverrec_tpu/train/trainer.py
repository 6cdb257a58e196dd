"""Epoch driver: jit-compiled scan over the whole training epoch.

The reference's runtime does one Python->TF round trip per mini-batch plus
an O(ratings x neg_ratio) Python sampling pass per epoch
(RankingRecommender.py:33-61).  Here one epoch is ONE device program:

    permutation -> lax.scan over steps:
        [device-side negative sampling -> forward -> grad -> optimizer]

with params/opt-state donated, so the entire epoch runs on-chip with no
host round trips.  Loss accounting matches the reference: per-batch summed
loss averaged over the number of batches (RankingRecommender.py:61).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cleverrec_tpu.common import cdiv, make_optimizer
from cleverrec_tpu.config import Config
from cleverrec_tpu.data.arrays import DeviceData, build_device_data
from cleverrec_tpu.data.dataset import RankingData
from cleverrec_tpu.evalx import Evaluator
from cleverrec_tpu.models.base import RecModel
from cleverrec_tpu import sampling


class Trainer:
    """Single-program trainer (1 chip or data-parallel under pjit).

    Owns: device tables, jitted epoch fn, evaluator, best-metric tracking
    (the analog of the reference's ``run_model`` loop,
    RankingRecommender.py:395-440).
    """

    def __init__(self, model: RecModel, data: RankingData, cfg: Config,
                 logger=None, mesh=None):
        self.model = model
        self.cfg = cfg
        self.logger = logger
        self.mesh = mesh  # jax.sharding.Mesh('data','model') or None
        self.dd: DeviceData = build_device_data(data)
        self.data = data

        # build_aux may restrict the epoch's positive pairs (SBPR family),
        # so it must run before epoch_pairs.
        model_aux = model.build_aux(self.dd, data)
        pos_u, pos_i = model.epoch_pairs(self.dd)
        self.n_pairs = int(len(pos_u))

        # One dict of device arrays shared by samplers, losses and eval.
        seen = self.dd.seen
        arrays: dict[str, Any] = {
            "pos_u": jnp.asarray(pos_u),
            "pos_i": jnp.asarray(pos_i),
            "seen": sampling.MemberTable(
                rows=jnp.asarray(seen.rows), lens=jnp.asarray(seen.lens),
                bits=None if seen.bits is None else jnp.asarray(seen.bits)),
        }
        if self.dd.friends_padded is not None:
            arrays["friends_padded"] = jnp.asarray(self.dd.friends_padded)
        for k, v in model_aux.items():
            arrays[k] = jax.tree_util.tree_map(jnp.asarray, v)
        self.arrays = arrays

        self.optimizer = make_optimizer(cfg.optimizer, cfg.lr)
        self.batch_size = cfg.batch_size
        self.neg_ratio = cfg.neg_ratio
        self._epoch_rows = self._rows_per_epoch()
        self.steps_per_epoch = cdiv(self._epoch_rows, self.batch_size)
        self._epoch_fn = self._build_epoch_fn()
        self.evaluator = Evaluator(model, self.dd, cfg)

    # -- epoch construction ----------------------------------------------
    def _rows_per_epoch(self) -> int:
        s = self.model.sampler
        if s in ("pairwise", "sbpr", "samn"):
            return self.n_pairs * self.neg_ratio
        if s == "pointwise":
            return self.n_pairs * (1 + self.neg_ratio)
        if s == "cml":
            return self.n_pairs
        raise NotImplementedError(f"sampler {s!r}")

    def _build_batch(self, key, rows, valid, arrays):
        s = self.model.sampler
        item_nums = self.dd.item_nums
        common = (key, rows, valid, arrays["pos_u"], arrays["pos_i"],
                  arrays["seen"], item_nums, self.neg_ratio)
        if s == "pairwise":
            return sampling.pairwise_batch(*common)
        if s == "pointwise":
            return sampling.pointwise_batch(*common)
        if s == "cml":
            return sampling.cml_batch(*common)
        if s == "sbpr":
            return sampling.sbpr_batch(*common, arrays["spu"],
                                       arrays["spu_suk"])
        if s == "samn":
            return sampling.samn_batch(*common, arrays["friends_padded"])
        raise NotImplementedError(f"sampler {s!r}")

    def _build_epoch_fn(self):
        steps = self.steps_per_epoch
        b = self.batch_size
        rows_total = self._epoch_rows
        padded = steps * b
        model = self.model
        optimizer = self.optimizer
        if self.mesh is not None:
            from cleverrec_tpu.parallel.sharding import shard_batch_spec
            constrain = shard_batch_spec(self.mesh)
        else:
            constrain = lambda batch: batch  # noqa: E731

        def epoch(params, opt_state, key, arrays):
            pkey, skey = jax.random.split(key)
            perm, valid = sampling.epoch_permutation(pkey, rows_total, padded)
            # Sample the ENTIRE epoch's batches in one vectorized pass —
            # one big bitmap-rejection kernel instead of per-step launches;
            # the scan body below is then pure fwd/bwd/update.
            batch_all = self._build_batch(skey, perm, valid, arrays)
            batches = jax.tree_util.tree_map(
                lambda x: x.reshape((steps, b) + x.shape[1:]), batch_all)

            def step(carry, batch):
                params, opt_state = carry
                batch = constrain(batch)
                loss, grads = jax.value_and_grad(model.loss)(params, batch,
                                                             arrays)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                params = model.postprocess(params)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), batches)
            return params, opt_state, jnp.mean(losses)

        return jax.jit(epoch, donate_argnums=(0, 1))

    # -- public API -------------------------------------------------------
    def init_state(self, seed: int | None = None):
        key = jax.random.PRNGKey(self.cfg.seed if seed is None else seed)
        ikey, self._loop_key = jax.random.split(key)
        params = self.model.init(ikey)
        if self.mesh is not None:
            from cleverrec_tpu.parallel.sharding import shard_params
            params = shard_params(params, self.model.meta, self.mesh)
        opt_state = self.optimizer.init(params)
        return params, opt_state

    def train_epoch(self, params, opt_state):
        self._loop_key, ekey = jax.random.split(self._loop_key)
        params, opt_state, loss = self._epoch_fn(params, opt_state, ekey,
                                                 self.arrays)
        return params, opt_state, float(loss)

    def evaluate(self, params):
        return self.evaluator.evaluate(params, self.arrays)

    def run(self, seed: int | None = None):
        """Full train/eval loop with best-NDCG@topk[0] tracking
        (RankingRecommender.py:400-440)."""
        log = self.logger.info if self.logger else (lambda *a: None)
        params, opt_state = self.init_state(seed)
        topk = self.cfg.topk
        best = {"epoch": 0, "ndcg": 0.0, "metrics": {}}
        interval = self.cfg.test_interval
        for epoch in range(1, self.cfg.epoches + 1):
            t1 = time.time()
            params, opt_state, loss = self.train_epoch(params, opt_state)
            log(" epoch %d\n  Training loss: %.4f, time: %.2fs",
                epoch, loss, time.time() - t1)
            if epoch % interval:
                continue
            t2 = time.time()
            results = self.evaluate(params)
            log("  Testing time: %.2fs", time.time() - t2)
            for k in topk:
                hr, mrr, ndcg = results[k]
                log("  (k=%d) HR=%.4f, MRR=%.4f, NDCG=%.4f", k, hr, mrr, ndcg)
            if results[topk[0]][2] > best["ndcg"]:
                best = {"epoch": epoch, "ndcg": results[topk[0]][2],
                        "metrics": results}
        log("best_epoch: %d", best["epoch"])
        for k in topk:
            if k in best["metrics"]:
                hr, mrr, ndcg = best["metrics"][k]
                log("  (k=%d) HR=%.4f, MRR=%.4f, NDCG=%.4f", k, hr, mrr, ndcg)
        self.params = params
        self.opt_state = opt_state
        return best
