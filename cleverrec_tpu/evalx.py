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

TPU-native structure: the WHOLE evaluation is one jitted device program —
a ``lax.scan`` over padded user batches where each step ranks and reduces
straight to per-K metric sums (the reference's HR/MRR/NDCG formulas,
utils/metrics.py:9-19, re-derived in jnp).  The host receives one tiny
[n_K, 3] array per eval instead of per-batch score matrices.

Full-catalog backends, picked at construction:

- ``full_fused``: Pallas fused score+bitmap-mask kernel for models with a
  ``dot_decomposition`` (default ON on TPU; ``eval.fused_kernel`` forces),
- ``full_sharded``: item axis sharded over the mesh 'model' axis — each
  shard scores + top-Ks its item slice, one all_gather merges
  (ops/topk.sharded_topk_scores); used whenever a mesh is present,
- ``full``: plain XLA matmul + mask + top_k.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from cleverrec_tpu import ranking
from cleverrec_tpu.common import cdiv
from cleverrec_tpu.data.arrays import DeviceData
from cleverrec_tpu.metrics import PAD_ITEM, ranking_metrics_topks


class Evaluator:
    def __init__(self, model, device_data: DeviceData, cfg, jit_kwargs=None,
                 mesh=None):
        self.model = model
        self.dd = device_data
        self.cfg = cfg
        self.mesh = mesh
        self.topk = cfg.topk
        self.kmax = max(self.topk)
        self.batch_size_t = cfg.test_batch_size
        self.candidate_eval = device_data.cand is not None
        self.standard_mrr = cfg.bool("metrics.standard_mrr", False)
        self._jk = jit_kwargs or {}
        # Fused Pallas full-catalog path for models exposing a
        # (user_vecs, item_table, bias) decomposition: default ON on the
        # TPU backend (eval.fused_kernel overrides either way).
        # Past the global bitmap budget (seen.bits is None) the batch's
        # bitmaps are built ON DEVICE from its sorted rows, so the fused
        # kernel keeps working at any catalog below the score-matrix
        # budget (eval.stream_threshold).
        fused_ok = (not self.candidate_eval
                    and hasattr(model, "dot_decomposition")
                    and (device_data.seen.bits is not None
                         or cfg.bool("eval.device_bitmaps", True)))
        fused_default = jax.default_backend() == "tpu"
        self._use_fused = (fused_ok and mesh is None
                           and cfg.bool("eval.fused_kernel", fused_default))
        # Catalogs too large for a dense [B, I] score matrix stream item
        # chunks with a carried running top-K (ops/topk.streaming_topk).
        # An EXPLICIT eval.fused_kernel=true beats the streaming DEFAULT
        # (an explicit eval.stream=true still wins over everything).
        fused_forced = self._use_fused and "eval.fused_kernel" in cfg
        stream = (not self.candidate_eval and mesh is None
                  and cfg.bool("eval.stream", device_data.item_nums
                               > cfg.int("eval.stream_threshold", 500_000)
                               and not fused_forced))
        # Wider chunks amortize the per-chunk top-k merge at very large
        # catalogs (grouped_topk makes the wide sort cheap).
        self.stream_chunk = cfg.int(
            "eval.stream_chunk",
            16384 if device_data.item_nums > 262_144 else 4096)
        self._stream_bits = (device_data.seen.bits is not None
                             and self.stream_chunk % 32 == 0)
        # Past the global bitmap budget (seen.bits is None) the batch's
        # bitmaps are built ON DEVICE from its sorted rows each step, so
        # the stream keeps the cheap bitmap-sliced masking instead of
        # falling back to per-chunk binary search / post-filtering
        # (~55x slower at a 319k-item catalog).
        self._stream_device_bits = (device_data.seen.bits is None
                                    and self.stream_chunk % 32 == 0
                                    and cfg.bool("eval.device_bitmaps",
                                                 True))
        if self.candidate_eval:
            self.mode = "candidate"
        elif mesh is not None:
            self.mode = "full_sharded"
        elif stream:
            self.mode = "full_stream"
        elif self._use_fused:
            self.mode = "full_fused"
        else:
            self.mode = "full"
        self._rank_fn = jax.jit({
            "candidate": self._rank_candidates,
            "full": self._rank_full,
            "full_fused": self._rank_full_fused,
            "full_sharded": self._rank_full_sharded,
            "full_stream": self._rank_full_stream,
        }[self.mode], **self._jk)
        self._batches = self._build_batches()
        self._eval_fn = jax.jit(self._device_eval, **self._jk)

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

    # Full-catalog rankers: the shared backends (ranking.py) return
    # (values, items) with masked slots at -inf; the Evaluator converts
    # to PAD_ITEM id lists for the metric formulas.  A user with fewer
    # than kmax unseen items must not surface seen ones (the
    # reference's rank-time skip can't either).
    def _rank_full(self, params, aux, u, seen_rows):
        v, items = ranking.rank_dense(self.model, params, aux, u,
                                      seen_rows, self.kmax)
        return jnp.where(jnp.isfinite(v), items, PAD_ITEM)

    def _rank_full_sharded(self, params, aux, u, seen_rows):
        v, items = ranking.rank_sharded(self.model, params, aux, u,
                                        seen_rows, self.kmax, self.mesh)
        return jnp.where(jnp.isfinite(v), items, PAD_ITEM)

    def _rank_full_stream(self, params, aux, u, seen_rows, seen_bits=None):
        # Chunk-sliced bitmap masking when the batches carry packed
        # bitmaps (zero per-query gathers; _build_batches gathers the
        # TEST USERS' rows — never close over the full [U, W] table,
        # which would embed as a GB-scale HLO constant).  Past the global
        # bitmap budget, the batch's bitmaps are built on device from its
        # sorted rows (sampling.rows_to_bits); top-(k+W) post-filtering
        # against the sorted rows is the last-resort fallback.
        if (seen_bits is None and seen_rows is not None
                and self._stream_device_bits):
            from cleverrec_tpu.sampling import rows_to_bits
            seen_bits = rows_to_bits(seen_rows, self.dd.item_nums)
            seen_rows = None
        v, items = ranking.rank_stream(
            self.model, params, aux, u, seen_rows, self.dd.item_nums,
            self.kmax, chunk=self.stream_chunk, seen_bits=seen_bits)
        return jnp.where(jnp.isfinite(v), items, PAD_ITEM)

    def _rank_full_fused(self, params, aux, u, seen_bits=None,
                         seen_rows=None, pre=None):
        # Past-budget catalogs carry rows; build the batch's bitmaps on
        # device (sampling.rows_to_bits) — same trick as the stream.
        if seen_bits is None:
            from cleverrec_tpu.sampling import rows_to_bits
            seen_bits = rows_to_bits(seen_rows, self.dd.item_nums)
        v, items = ranking.rank_fused(
            self.model, params, aux, u, seen_bits, self.kmax,
            interpret=jax.default_backend() != "tpu", pre=pre)
        return jnp.where(jnp.isfinite(v), items, PAD_ITEM)

    # -- one-call device evaluation --------------------------------------
    def _build_batches(self):
        """Stack the whole test set into [n_batches, bt, ...] device arrays
        (built once; row_w zeroes the wrapped pad rows)."""
        dd = self.dd
        t = len(dd.test_users)
        bt = self.batch_size_t
        nb = cdiv(t, bt)
        padded = nb * bt
        order = np.arange(padded) % t                     # pad wraps around
        row_w = (np.arange(padded) < t).astype(np.float32)
        users = dd.test_users[order]
        out = {
            "u": jnp.asarray(users.reshape(nb, bt)),
            "row_w": jnp.asarray(row_w.reshape(nb, bt)),
            "real": jnp.asarray(dd.real_padded[order].reshape(
                nb, bt, dd.real_padded.shape[1])),
        }
        if self.candidate_eval:
            out["cand"] = jnp.asarray(dd.cand[order].reshape(
                nb, bt, dd.cand.shape[1]))
            out["mask"] = jnp.asarray(dd.cand_mask[order].reshape(
                nb, bt, dd.cand.shape[1]))
        elif (self.mode == "full_fused" and dd.seen.bits is not None) or (
                self.mode == "full_stream" and self._stream_bits):
            bits = np.asarray(dd.seen.bits)[users]
            out["bits"] = jnp.asarray(bits.reshape(nb, bt, bits.shape[1]))
        else:
            rows = np.asarray(dd.seen.rows)[users]
            out["rows"] = jnp.asarray(rows.reshape(nb, bt, rows.shape[1]))
            if (self.mode == "full_fused"
                    and self.cfg.bool("eval.device_bitmaps", True)):
                # Past the GLOBAL bitmap budget only the [U, W] table is
                # too big — the TEST USERS' bitmaps are training-
                # invariant and usually fit, so build them ONCE here
                # instead of per batch per eval inside the hot scan
                # (rows_to_bits on every eval step; round-4 breakdown).
                words = cdiv(dd.item_nums, 32)
                budget = self.cfg.int("eval.test_bitmap_budget_mb", 512)
                if padded * words * 4 <= budget * 2 ** 20:
                    from cleverrec_tpu.sampling import rows_to_bits
                    out["bits"] = jax.jit(jax.vmap(
                        lambda r: rows_to_bits(r, dd.item_nums)))(
                            out.pop("rows"))
        return out

    def _metric_sums(self, rec, real, row_w):
        """Per-K (HR, MRR, NDCG) sums over a batch — jnp re-derivation of
        metrics.ranking_metrics (reference utils/metrics.py:9-19)."""
        valid = real != PAD_ITEM                          # [b, T]
        n_real = valid.sum(axis=1)
        n_real_safe = jnp.maximum(n_real, 1)
        matches = ((real[:, :, None] == rec[:, None, :])
                   & valid[:, :, None]
                   & (rec != PAD_ITEM)[:, None, :])       # [b, T, kmax]
        found = matches.any(axis=2)
        rank = jnp.where(found, jnp.argmax(matches, axis=2), self.kmax)
        slot = jnp.arange(real.shape[1], dtype=jnp.float32)
        idcg = jnp.maximum(jnp.where(valid, 1.0 / jnp.log2(slot + 2.0),
                                     0.0).sum(axis=1), 1e-12)
        w = row_w * (n_real > 0)
        per_k = []
        for k in self.topk:
            hit_k = found & (rank < k)
            hits = hit_k.sum(axis=1).astype(jnp.float32)
            hr = hits / jnp.minimum(k, n_real_safe)
            if self.standard_mrr:
                best = jnp.where(hit_k, rank, self.kmax).min(axis=1)
                mrr = jnp.where(best < k, 1.0 / (best + 1.0), 0.0)
            else:
                mrr = jnp.where(hit_k, 1.0 / (rank + 1.0), 0.0).sum(axis=1)
            dcg = jnp.where(hit_k, 1.0 / jnp.log2(rank + 2.0),
                            0.0).sum(axis=1)
            ndcg = dcg / idcg
            per_k.append(jnp.stack([jnp.sum(hr * w), jnp.sum(mrr * w),
                                    jnp.sum(ndcg * w)]))
        return jnp.stack(per_k)                           # [n_K, 3]

    def _device_eval(self, params, aux, batches):
        # The fused path's table permutation is batch-independent —
        # compute it ONCE per eval, outside the scan (XLA does not
        # hoist the full-catalog gather out of the loop body itself).
        pre = (ranking.fused_precompute(self.model, params, aux)
               if self.mode == "full_fused" else None)

        def step(acc, b):
            if self.candidate_eval:
                rec = self._rank_candidates(params, aux, b["u"], b["cand"],
                                            b["mask"])
            elif self.mode == "full_fused":
                if "bits" in b:
                    rec = self._rank_full_fused(params, aux, b["u"],
                                                b["bits"], pre=pre)
                else:
                    rec = self._rank_full_fused(params, aux, b["u"],
                                                None, b["rows"], pre=pre)
            elif self.mode == "full_sharded":
                rec = self._rank_full_sharded(params, aux, b["u"], b["rows"])
            elif self.mode == "full_stream":
                if self._stream_bits:
                    rec = self._rank_full_stream(params, aux, b["u"],
                                                 None, b["bits"])
                else:
                    rec = self._rank_full_stream(params, aux, b["u"],
                                                 b["rows"])
            else:
                rec = self._rank_full(params, aux, b["u"], b["rows"])
            return acc + self._metric_sums(rec, b["real"], b["row_w"]), None

        init = jnp.zeros((len(self.topk), 3), jnp.float32)
        if batches["u"].shape[0] == 1:
            # Single batch: skip the scan wrapper entirely.
            sums, _ = step(init, {k: v[0] for k, v in batches.items()})
        else:
            sums, _ = jax.lax.scan(step, init, batches)
        return sums

    # -- host driver ------------------------------------------------------
    def recommend_topk(self, params, aux) -> np.ndarray:
        """Top-K item lists for all test users (host-side, in test-user
        order) — the ranker output the metrics consume; also the serving/
        inspection surface."""
        dd = self.dd
        t = len(dd.test_users)
        b = self._batches
        pre = (ranking.fused_precompute(self.model, params, aux)
               if self.mode == "full_fused" else None)
        outs = []
        for bidx in range(b["u"].shape[0]):
            if self.candidate_eval:
                items = self._rank_fn(params, aux, b["u"][bidx],
                                      b["cand"][bidx], b["mask"][bidx])
            elif self.mode == "full_fused":
                if "bits" in b:
                    items = self._rank_fn(params, aux, b["u"][bidx],
                                          b["bits"][bidx], pre=pre)
                else:
                    items = self._rank_fn(params, aux, b["u"][bidx],
                                          None, b["rows"][bidx], pre=pre)
            elif self.mode == "full_stream" and self._stream_bits:
                items = self._rank_fn(params, aux, b["u"][bidx],
                                      None, b["bits"][bidx])
            else:
                items = self._rank_fn(params, aux, b["u"][bidx],
                                      b["rows"][bidx])
            outs.append(np.asarray(items))
        return np.concatenate(outs, axis=0)[:t]

    def evaluate_host(self, params, aux):
        """Host-metrics path (numpy formulas) — the cross-check oracle for
        the on-device reduction; also used when eval.host_metrics is set."""
        dd = self.dd
        rec_all = self.recommend_topk(params, aux)
        per_k = ranking_metrics_topks(dd.real_padded, rec_all, self.topk,
                                      standard_mrr=self.standard_mrr)
        return {k: (float(hr.mean()), float(mrr.mean()), float(ndcg.mean()))
                for k, (hr, mrr, ndcg) in per_k.items()}

    def evaluate(self, params, aux) -> dict[int, tuple[float, float, float]]:
        """Returns {K: (mean HR, mean MRR, mean NDCG)} over all test users."""
        if self.cfg.bool("eval.host_metrics", False):
            return self.evaluate_host(params, aux)
        sums = np.asarray(self._eval_fn(params, aux, self._batches))
        t = len(self.dd.test_users)
        return {k: tuple(float(x) / t for x in sums[idx])
                for idx, k in enumerate(self.topk)}
