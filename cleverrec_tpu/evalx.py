"""Evaluation engine: candidate-list and full-catalog top-K ranking.

Protocol parity with the reference evaluator (RankingRecommender.py:198-299):

- candidate protocol (loo or neg_samples>0): score each test user's
  candidate list (negatives first, ground truth appended last), rank the
  <= C candidates, map ranks back to item ids, metrics against
  candidates[neg_samples:] (:250-299),
- full-catalog protocol: score all items, then exclude the user's seen
  TRAIN items from the ranking (:231-240) — here done by on-device
  masking before top-k, which yields the identical top-K list as the
  reference's Python "skip seen while collecting" loop,
- ``cml_like`` distance models rank ascending (:222-225, :285-288).

Everything device-side is fixed-shape: test users are processed in padded
batches; one ``lax.top_k`` per batch replaces the reference's per-user
``np.argsort`` over the whole catalog.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from cleverrec_tpu.common import cdiv
from cleverrec_tpu.data.arrays import DeviceData
from cleverrec_tpu.metrics import PAD_ITEM, ranking_metrics_topks


class Evaluator:
    def __init__(self, model, device_data: DeviceData, cfg, jit_kwargs=None):
        self.model = model
        self.dd = device_data
        self.cfg = cfg
        self.topk = cfg.topk
        self.kmax = max(self.topk)
        self.batch_size_t = cfg.test_batch_size
        self.candidate_eval = device_data.cand is not None
        jk = jit_kwargs or {}
        # Fused Pallas full-catalog path: opt-in via eval.fused_kernel for
        # models exposing a (user_vecs, item_table, bias) decomposition,
        # when the per-user seen bitmaps exist.
        self._use_fused = (not self.candidate_eval
                           and cfg.bool("eval.fused_kernel", False)
                           and hasattr(model, "dot_decomposition")
                           and device_data.seen.bits is not None)
        if self.candidate_eval:
            self._rank_fn = jax.jit(self._rank_candidates, **jk)
        elif self._use_fused:
            self._rank_fn = jax.jit(self._rank_full_fused, **jk)
        else:
            self._rank_fn = jax.jit(self._rank_full, **jk)

    # -- device-side rankers ---------------------------------------------
    def _rank_candidates(self, params, aux, u, cand, mask):
        scores = self.model.score_candidates(params, u, cand, aux)
        if self.model.cml_like:
            scores = -scores          # ascending distance == descending score
        scores = jnp.where(mask, scores, -jnp.inf)
        k = min(self.kmax, cand.shape[1])
        v, idx = jax.lax.top_k(scores, k)
        items = jnp.take_along_axis(cand, idx, axis=1)
        # Slots beyond the valid candidates (k > |candidates|) must not
        # leak arbitrary ids into the metrics (PAD_ITEM is ignored there).
        return jnp.where(jnp.isfinite(v), items, PAD_ITEM)

    def _rank_full(self, params, aux, u, seen_rows):
        scores = self.model.score_all(params, u, aux)      # [B, I]
        if self.model.cml_like:
            scores = -scores
        b, item_nums = scores.shape
        # Exclude seen train items: scatter seen ids (sentinel == item_nums
        # lands in the spill column and is sliced off).
        seen = jnp.zeros((b, item_nums + 1), dtype=bool)
        seen = seen.at[jnp.arange(b)[:, None], seen_rows].set(True)[:, :item_nums]
        scores = jnp.where(seen, -jnp.inf, scores)
        v, items = jax.lax.top_k(scores, self.kmax)
        # A user with fewer than kmax unseen items must not surface seen
        # ones (the reference's rank-time skip can't either).
        return jnp.where(jnp.isfinite(v), items, PAD_ITEM)

    def _rank_full_fused(self, params, aux, u, seen_bits):
        """Pallas path for dot-decomposable models: one fused
        score+bitmap-mask kernel, then top_k."""
        from cleverrec_tpu.ops.pallas_scores import fused_dot_topk_scores
        u_vecs, table, bias = self.model.dot_decomposition(params, u, aux)
        if self.model.cml_like:
            # Negate INSIDE the dot (-u).q so the kernel's -3e38 seen mask
            # stays the worst score; never negate after masking.
            u_vecs = -u_vecs
            bias = None if bias is None else -bias
        interpret = jax.default_backend() != "tpu"
        scores, item_map = fused_dot_topk_scores(u_vecs, table, seen_bits,
                                                 interpret=interpret)
        if bias is not None:
            # Bias after masking keeps masked slots at -3e38 (bias is
            # bounded); ranking unaffected.  Scores are in the kernel's
            # permuted column order, so permute the bias to match.
            scores = scores + jnp.pad(bias, (0, item_map.shape[0]
                                             - bias.shape[0]))[item_map][None, :]
        v, idx = jax.lax.top_k(scores, self.kmax)
        items = item_map[idx]
        # Kernel masks with a finite -3e38 sentinel; same PAD guard.
        return jnp.where(v > -1e37, items, PAD_ITEM)

    # -- host driver ------------------------------------------------------
    def evaluate(self, params, aux) -> dict[int, tuple[float, float, float]]:
        """Returns {K: (mean HR, mean MRR, mean NDCG)} over all test users."""
        dd = self.dd
        t = len(dd.test_users)
        bt = self.batch_size_t
        n_batches = cdiv(t, bt)
        padded = n_batches * bt
        order = np.arange(padded) % t                      # pad wraps around
        rec_all = np.empty((padded, min(self.kmax,
                                        dd.cand.shape[1] if self.candidate_eval
                                        else self.kmax)), dtype=np.int32)
        for bidx in range(n_batches):
            sel = order[bidx * bt: (bidx + 1) * bt]
            u = jnp.asarray(dd.test_users[sel])
            if self.candidate_eval:
                items = self._rank_fn(params, aux, u,
                                      jnp.asarray(dd.cand[sel]),
                                      jnp.asarray(dd.cand_mask[sel]))
            elif self._use_fused:
                items = self._rank_fn(params, aux, u,
                                      jnp.asarray(dd.seen.bits[dd.test_users[sel]]))
            else:
                items = self._rank_fn(params, aux, u,
                                      jnp.asarray(dd.seen.rows[dd.test_users[sel]]))
            rec_all[bidx * bt: (bidx + 1) * bt] = np.asarray(items)
        rec_all = rec_all[:t]

        per_k = ranking_metrics_topks(dd.real_padded, rec_all, self.topk,
                                      standard_mrr=self.cfg.bool(
                                          "metrics.standard_mrr", False))
        return {k: (float(hr.mean()), float(mrr.mean()), float(ndcg.mean()))
                for k, (hr, mrr, ndcg) in per_k.items()}
