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

import functools
import math
import time
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


def _dp_delta_combine(mode: str):
    """Cross-chip combine for the local-Adam DP tiers' per-epoch
    parameter/moment deltas (round-4 verdict item 4 — measured in
    benchmarks/MESH_DP_CONVERGENCE.jsonl):

    - 'mean': classic parameter averaging.  WRONG for sparse embedding
      updates — chips touch mostly-disjoint rows, so the mean shrinks a
      row's delta by ~D and the epoch crawls (BPR ml-100k D=8: HR@10
      0.43 vs 0.61 for per-step psum at 20 epochs).
    - 'sum': first-order composition of the chips' trajectories
      (serial-exact for rows touched by one chip; for shared rows the
      D short Adam walks sum to about what one long walk moves).
    - 'count': occupancy-normalized sum — disjoint rows keep full
      magnitude, rows touched by c chips divide by c (guards hot dense
      rows against overshoot).

    Integer leaves (Adam count) advance identically per chip and pass
    through."""
    def combine(n, o):
        if not jnp.issubdtype(jnp.asarray(n).dtype, jnp.floating):
            return n
        d = n - o
        if mode == "mean":
            return o + jax.lax.pmean(d, "data")
        if mode == "sum":
            return o + jax.lax.psum(d, "data")
        if mode != "count":
            raise ValueError(f"train.dp_delta_combine={mode!r}")
        if d.ndim == 0:
            t = (jnp.abs(d) > 0).astype(d.dtype)
            return o + jax.lax.psum(d, "data") / jnp.maximum(
                jax.lax.psum(t, "data"), 1.0)
        axes = tuple(range(1, d.ndim))
        t = (jnp.sum(jnp.abs(d), axis=axes) > 0).astype(d.dtype)
        den = jnp.maximum(jax.lax.psum(t, "data"), 1.0)
        return o + jax.lax.psum(d, "data") / den.reshape(
            (-1,) + (1,) * (d.ndim - 1))

    return combine


def _mlp_unsplit(spec, ref_params, pu_c, qi_c, dense_t):
    """Invert the fused-epoch feature-axis concatenation: slice the
    [*, tw_u]/[*, tw_i] tables back into the spec's named params (widths
    read from ``ref_params``) and zip the dense tuple.  Shared by the
    plain and grouped pointwise_mlp epoch builders."""
    def offsets(names):
        offs = [0]
        for n in names:
            offs.append(offs[-1] + ref_params[n].shape[1])
        return offs

    offs_u, offs_i = offsets(spec["u"]), offsets(spec["i"])
    out = {n: pu_c[:, offs_u[k]:offs_u[k + 1]]
           for k, n in enumerate(spec["u"])}
    out.update({n: qi_c[:, offs_i[k]:offs_i[k + 1]]
                for k, n in enumerate(spec["i"])})
    out.update(dict(zip(spec["dense"], dense_t)))
    return out


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
        arrays: dict[str, Any] = {
            "pos_u": jnp.asarray(pos_u),
            "pos_i": jnp.asarray(pos_i),
            "seen": jax.tree_util.tree_map(jnp.asarray, self.dd.seen),
        }
        if self.dd.friends_padded is not None:
            arrays["friends_padded"] = jnp.asarray(self.dd.friends_padded)
        # Optional popularity-proportional negatives (neg_sampling config;
        # the reference is uniform-only).
        if cfg.str("neg_sampling", "uniform") == "popularity":
            if model.sampler in ("sbpr", "tbpr", "samn"):
                raise ValueError(
                    "neg_sampling=popularity is not supported for the "
                    f"{model.sampler!r} protocol (its negatives have "
                    "social-exclusion semantics); use uniform")
            deg = np.zeros(self.dd.item_nums, np.float64)
            np.add.at(deg, self.dd.pos_i, 1.0)
            arrays["pop_cdf"] = jnp.asarray(
                np.cumsum(deg) / max(deg.sum(), 1.0), dtype=jnp.float32)
        for k, v in model_aux.items():
            arrays[k] = jax.tree_util.tree_map(jnp.asarray, v)
        if model.sampler == "pairwise":
            # Static pair-order epoch layout (kills three per-epoch
            # gathers; see sampling.pairwise_epoch_static).
            padded = cdiv(self.n_pairs * cfg.neg_ratio,
                          cfg.batch_size) * cfg.batch_size
            arrays["pairwise_static"] = jax.tree_util.tree_map(
                jnp.asarray, sampling.pairwise_epoch_static(
                    pos_u, pos_i, self.dd.seen.lens, self.dd.item_nums,
                    padded, cfg.neg_ratio))
        elif model.sampler == "cml":
            # One row per pair (K negatives drawn per row), so the static
            # layout is the pairwise one at neg_ratio=1.
            padded = cdiv(self.n_pairs, cfg.batch_size) * cfg.batch_size
            arrays["cml_static"] = jax.tree_util.tree_map(
                jnp.asarray, sampling.pairwise_epoch_static(
                    pos_u, pos_i, self.dd.seen.lens, self.dd.item_nums,
                    padded, 1))
        elif (model.sampler == "sbpr"
              and cfg.bool("train.sbpr_epoch_tensors", True)):
            # Static pair-order layout + SPu draw geometry for the
            # whole-epoch SBPR sampler (sampling.sbpr_epoch_tensors) —
            # per-step sampling was 113.5ms of the 336.7ms Epinions
            # epoch (benchmarks/sbpr_profile.py round-5 breakdown).
            padded = cdiv(self.n_pairs * cfg.neg_ratio,
                          cfg.batch_size) * cfg.batch_size
            arrays["sbpr_static"] = jax.tree_util.tree_map(
                jnp.asarray, sampling.sbpr_epoch_static(
                    pos_u, pos_i,
                    np.asarray(model_aux["social_neg"].lens),
                    np.asarray(model_aux["spu"].lens),
                    np.asarray(model_aux["spu_csr"]["off"]),
                    self.dd.item_nums, padded, cfg.neg_ratio))
        elif (model.sampler == "tbpr"
              and cfg.bool("train.sbpr_epoch_tensors", True)):
            padded = cdiv(self.n_pairs * cfg.neg_ratio,
                          cfg.batch_size) * cfg.batch_size
            arrays["tbpr_static"] = jax.tree_util.tree_map(
                jnp.asarray, sampling.tbpr_epoch_static(
                    pos_u, pos_i,
                    np.asarray(model_aux["social_neg"].lens),
                    np.asarray(model_aux["tie_strong"].lens),
                    np.asarray(model_aux["ts_csr"]["off"]),
                    np.asarray(model_aux["tie_weak"].lens),
                    np.asarray(model_aux["tw_csr"]["off"]),
                    self.dd.item_nums, padded, cfg.neg_ratio))
        elif model.sampler == "pointwise" and not (
                getattr(model, "history_bucketing", False)
                and cfg.bool("train.bucketed_histories", True)):
            # Group-order analog for pointwise epochs (1 positive +
            # neg_ratio negatives per pair; sampling.pointwise_epoch_static).
            # Bucketed-history models build per-bucket statics instead
            # (_build_bucketed_epochs).
            padded = cdiv(self.n_pairs * (1 + cfg.neg_ratio),
                          cfg.batch_size) * cfg.batch_size
            arrays["pointwise_static"] = jax.tree_util.tree_map(
                jnp.asarray, sampling.pointwise_epoch_static(
                    pos_u, pos_i, self.dd.seen.lens, self.dd.item_nums,
                    padded, cfg.neg_ratio))
        self.arrays = arrays

        self.optimizer = make_optimizer(cfg.optimizer, cfg.lr)
        self.batch_size = cfg.batch_size
        self.neg_ratio = cfg.neg_ratio
        if model.sampler == "dual":
            # Dual-domain models split both domains into train_batches
            # slices per epoch (RankingRecommender.py:179-195).
            self.steps_per_epoch = model.train_batches
            self._epoch_rows = self.n_pairs * self.neg_ratio
            self._epoch_fn = self._build_dual_epoch_fn()
        else:
            self._epoch_rows = self._rows_per_epoch()
            self.steps_per_epoch = cdiv(self._epoch_rows, self.batch_size)
            self._bucket_plan = None
            if self._fused_epoch_eligible():
                self._epoch_fn = self._build_fused_epoch_fn()
            elif self._sparse_rows_eligible():
                self._epoch_fn = self._build_sparse_rows_epoch_fn()
            elif (getattr(model, "history_bucketing", False)
                  and model.sampler == "pointwise"
                  and cfg.bool("train.bucketed_histories", True)):
                self._bucket_plan = self._build_bucketed_epochs()
                self._epoch_fn = None
            elif (getattr(model, "pairwise_grouped", False)
                  and cfg.bool("train.grouped_pairs", True)):
                self._epoch_fn = self._build_pairwise_grouped_epoch()
            else:
                self._epoch_fn = self._build_epoch_fn()
        self._pre_epoch_fn = (jax.jit(model.pre_epoch)
                              if hasattr(model, "pre_epoch") else None)
        self._multi_epoch_fns: dict[int, Any] = {}
        self._profiled = False
        self.evaluator = Evaluator(model, self.dd, cfg, mesh=mesh)

    # -- epoch construction ----------------------------------------------
    def _rows_per_epoch(self) -> int:
        s = self.model.sampler
        if s in ("pairwise", "sbpr", "tbpr", "samn"):
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
        cdf = arrays.get("pop_cdf")
        if s == "pairwise":
            return sampling.pairwise_batch(*common, pop_cdf=cdf)
        if s == "pointwise":
            return sampling.pointwise_batch(*common, pop_cdf=cdf)
        if s == "cml":
            return sampling.cml_batch(*common, pop_cdf=cdf)
        if s == "sbpr":
            return sampling.sbpr_batch(*common, arrays["spu"],
                                       arrays["spu_csr"],
                                       social_neg=arrays.get("social_neg"))
        if s == "tbpr":
            return sampling.tbpr_batch(*common, arrays["tie_strong"],
                                       arrays["tie_weak"],
                                       arrays["ts_csr"], arrays["tw_csr"],
                                       social_neg=arrays.get("social_neg"))
        if s == "samn":
            return sampling.samn_batch(*common, arrays["friends_padded"])
        raise NotImplementedError(f"sampler {s!r}")

    def _fused_epoch_eligible(self) -> bool:
        """The VMEM-resident Pallas epochs apply to plain MF models with
        Adam and tables small enough to sit in VMEM alongside their Adam
        moments: ``fused_protocol`` 'pairwise_bpr' (BPR family) or
        'pointwise_bce' (GMF family).  ``train.fused_kernel`` overrides
        either way (default: on for the TPU backend).

        Meshes: a pure DATA-PARALLEL mesh (model axis size 1) keeps the
        fused tier.  Each chip holds a full table replica and runs the
        whole-epoch kernel over its 1/D share of the epoch's steps; the
        chips' parameter/moment deltas are averaged per epoch (local
        Adam — see ``_build_fused_epoch_fn``).  A 1-device mesh runs the
        unmeshed program unchanged (bit-identical numerics).  Row-sharded
        tables (model axis > 1) and the explicit-exchange tier need the
        scan path."""
        proto = getattr(self.model, "fused_protocol", None)
        self._sparse_rows_ok = False
        if proto is None:
            return False
        if self.cfg.optimizer != "Adam":
            return False
        mesh_dp = 1
        if self.mesh is not None and math.prod(self.mesh.shape.values()) > 1:
            if self.mesh.shape.get("model", 1) != 1:
                return False
            if self.cfg.str("parallel.exchange", "gspmd") == "explicit":
                return False
            if not self.cfg.bool("train.fused_mesh_dp", True):
                return False
            mesh_dp = self.mesh.shape.get("data", 1)
        self._fused_mesh_dp = mesh_dp
        # The pairwise kernel hard-codes the -log sigmoid BPR objective;
        # any other pairwise loss (e.g. hinge) must take the scan path.
        # (The pointwise kernel's sigmoid-xent is GMF's only objective;
        # the cml kernel hard-codes the WARP-weighted min-negative hinge.)
        if proto == "pairwise_bpr" and self.cfg.loss_func != "bpr":
            return False
        if proto == "cml_hinge" and self.cfg.loss_func != "hinge":
            return False
        on_tpu = jax.default_backend() == "tpu"
        if not self.cfg.bool("train.fused_kernel", on_tpu):
            return False
        if proto == "rows":
            # Generic multi-plane epoch (SBPR/CUNE/TBPR family): id
            # planes + float columns, per-row loss differentiated
            # in-kernel.  VMEM overflow falls back to scan by default:
            # the STREAMED variant (tables + moments stay in HBM,
            # slab-walked twice per step — fused_rows_epoch_stream) is
            # exact but its one-hot gather/scatter dots cost
            # O(B * table_height * d) FLOPs per plane per pass, which
            # at Epinions scale (18.6k-row tables) is ~28 TFLOP/epoch —
            # measured 690ms vs scan's 328ms (benchmarks/
            # EPINIONS_RUNS.jsonl).  XLA's native gather moves O(B * d)
            # bytes instead, so scan wins whenever tables overflow
            # VMEM; ``train.fused_stream=True`` opts back in.
            from cleverrec_tpu.ops.pallas_train import (
                plan_fused_rows, plan_fused_rows_stream)
            spec = self.model.fused_rows_spec()
            n_u = sum(1 for _, sd in spec["planes"] if sd == "u")
            n_i = len(spec["planes"]) - n_u
            dims = (self.dd.user_nums, self.dd.item_nums, spec["tw_u"],
                    spec["tw_i"], spec["dense_elems"], self.batch_size,
                    n_u, n_i, len(spec["floats"]))
            self._fused_grouped_plan = None
            self._fused_stream_plan = None
            self._fused_plan = None
            if self.cfg.bool("train.fused_stream", False) and mesh_dp == 1:
                # Opt-in streaming (testing/benchmark hook) — takes
                # precedence over the resident plan so its numerics can
                # be pinned at any catalog size.
                self._fused_stream_plan = plan_fused_rows_stream(*dims)
                if self._fused_stream_plan is not None:
                    if self.logger:
                        blk, su, si = self._fused_stream_plan
                        self.logger.info(
                            "fused epoch kernel: STREAMED epoch forced "
                            f"(slabs {su}/{si}, blk {blk}, state stays "
                            "in HBM)")
                    return True
            self._fused_bf16 = self.cfg.bool("train.fused_bf16", False)
            self._fused_plan = plan_fused_rows(*dims,
                                               bf16=self._fused_bf16)
            if self._fused_bf16 and self._fused_plan is None:
                self._fused_bf16 = False
                self._fused_plan = plan_fused_rows(*dims)
            if self._fused_plan is not None:
                if self._fused_bf16 and self.logger:
                    self.logger.info(
                        "fused epoch kernel: bf16 table storage "
                        "(f32 compute, train.fused_bf16)")
                return True
            # VMEM overflow: the lazy row-Adam scan tier takes these
            # shapes (_sparse_rows_eligible) unless opted out.
            self._sparse_rows_ok = True
            if self.logger:
                self.logger.info(
                    "fused epoch kernel skipped: params exceed the VMEM "
                    "budget; using the sparse-rows/scan path")
            return False
        if proto == "pointwise_mlp":
            # Generic in-kernel-AD pointwise epoch (NeuMF/MLP): the
            # model supplies table grouping + per-row loss.  VMEM
            # overflow falls back to the GROUPED variant (user-axis
            # block-coordinate Adam; dense tower params stay resident
            # and advance every step), then to the scan path.
            from cleverrec_tpu.ops.pallas_train import (
                plan_fused_mlp, plan_fused_mlp_grouped)
            spec = self.model.fused_mlp_spec()
            dims = (self.dd.user_nums, self.dd.item_nums, spec["tw_u"],
                    spec["tw_i"], spec["dense_elems"], self.batch_size,
                    spec["act_cols"])
            self._fused_grouped_plan = None
            self._fused_plan = plan_fused_mlp(*dims)
            force_g = self.cfg.int("train.fused_groups", 0)
            if force_g > 1:
                self._fused_grouped_plan = plan_fused_mlp_grouped(
                    *dims, force_g=force_g)
                if self._fused_grouped_plan is not None:
                    return True
            if self._fused_plan is not None:
                return True
            # Grouped overflow under a pure-DP mesh: each group's steps
            # shard over 'data' (chips run disjoint chunks locally, one
            # delta-average per epoch — see _build_grouped_epoch_fn).
            if self.cfg.bool("train.fused_grouped", on_tpu):
                self._fused_grouped_plan = plan_fused_mlp_grouped(*dims)
            if self._fused_grouped_plan is not None:
                if self.logger:
                    g, rows, _ = self._fused_grouped_plan
                    self.logger.info(
                        "fused epoch kernel: params exceed the VMEM "
                        f"budget; using the GROUPED epoch ({g} user "
                        f"groups x {rows} rows, block-coordinate Adam)")
                return True
            if self.logger:
                self.logger.info(
                    "fused epoch kernel skipped: params exceed the VMEM "
                    "budget; using the scan path")
            return False
        from cleverrec_tpu.ops.pallas_train import (plan_fused,
                                                    plan_fused_grouped)
        planes = {"pairwise_bpr": 3, "pointwise_bce": 2,
                  "cml_hinge": 2 + self.neg_ratio}[proto]
        # CML live-block charge: ~5 full-width [i_pad, blk] f32 blocks
        # on small catalogs (single-slab layout: distance matrix,
        # multiplicity mask, compare temps); past the single-slab bound
        # the kernel walks the item axis in <=1152-wide slabs and only
        # the item one-hot stays full-width, so charge 3 (one-hot +
        # slab working set as ~2 full-width equivalents, conservative).
        if proto == "cml_hinge":
            from cleverrec_tpu.ops.pallas_train import sentinel_dims
            i_pad = sentinel_dims(self.dd.user_nums, self.dd.item_nums)[1]
            oh = 5 if i_pad <= 1792 else 3
        else:
            oh = 2
        # Opt-in bf16 STORAGE for the BPR protocol: tables + moments +
        # one-hots bf16 (f32 arithmetic) — 2x the resident capacity, so
        # shapes that overflow the f32 plan (ml-1m @ embed 128) stay on
        # the fused tier instead of dropping to grouped/scan.  Falls
        # back to the f32 plan when bf16 itself declines (tables too
        # tall for i16 one-hot ids).
        self._fused_bf16 = (proto == "pairwise_bpr"
                            and self.cfg.bool("train.fused_bf16", False))
        self._fused_plan = plan_fused(self.dd.user_nums, self.dd.item_nums,
                                      self.model.embed_size,
                                      self.batch_size, idx_planes=planes,
                                      oh_items=oh, bf16=self._fused_bf16)
        if self._fused_bf16 and self._fused_plan is None:
            self._fused_bf16 = False
            self._fused_plan = plan_fused(
                self.dd.user_nums, self.dd.item_nums,
                self.model.embed_size, self.batch_size,
                idx_planes=planes, oh_items=oh)
        if self._fused_bf16 and self.logger:
            self.logger.info("fused epoch kernel: bf16 table storage "
                             "(f32 compute, train.fused_bf16)")
        self._fused_grouped_plan = None
        # train.fused_groups > 1 forces the grouped path (testing and
        # tuning hook); 0 = auto (grouped only on VMEM overflow).
        force_g = self.cfg.int("train.fused_groups", 0)
        if force_g > 1:
            self._fused_grouped_plan = plan_fused_grouped(
                self.dd.user_nums, self.dd.item_nums,
                self.model.embed_size, self.batch_size,
                idx_planes=planes, force_g=force_g, oh_items=oh)
            if self._fused_grouped_plan is not None:
                return True
            if self.logger:
                self.logger.info(
                    f"train.fused_groups={force_g} ignored: that "
                    "group size overflows VMEM; falling back to "
                    + ("the ungrouped fused epoch"
                       if self._fused_plan is not None
                       else "auto group planning"))
            # Fall through to the normal auto logic (ungrouped plan if
            # it fits, else auto-grouped) instead of dropping to scan.
        if self._fused_plan is not None:
            return True
        # VMEM overflow: fall back to the GROUPED epoch (user-axis
        # block-coordinate Adam — each P row's moments advance only
        # during its own group's steps; items stay fully resident and
        # dense; CML's covariance regularizer spans the frozen rows via
        # closed-form partial sums).  Opt-out via train.fused_grouped.
        # Under a pure-DP mesh the groups' steps shard over 'data'
        # (_build_grouped_epoch_fn's chunked launch).
        if self.cfg.bool("train.fused_grouped", on_tpu):
            self._fused_grouped_plan = plan_fused_grouped(
                self.dd.user_nums, self.dd.item_nums,
                self.model.embed_size, self.batch_size, idx_planes=planes,
                oh_items=oh)
        if self._fused_grouped_plan is not None:
            if self.logger:
                g, rows, blk = self._fused_grouped_plan
                self.logger.info(
                    "fused epoch kernel: tables exceed the VMEM budget; "
                    f"using the GROUPED epoch ({g} user groups x {rows} "
                    "rows, block-coordinate Adam)")
            return True
        # Both resident and grouped declined → scan.  The lazy row-Adam
        # tier also covers BPR's pairwise protocol (fused_rows_spec) but
        # stays OPT-IN there (train.sparse_rows_force): measured A/B at
        # catalog scale (benchmarks/bpr_sparse_probe.py, 319k items
        # x embed 64, batch 6144) the sparse tier LOST to scan (4635 vs
        # 4121 ms/epoch) — BPR's whole-epoch pairwise tensors already
        # removed the sampling cost, and the dedup sort + row scatters
        # outweigh the dense-Adam traversal they avoid.  (The rows
        # protocols keep it default-on — their win is recorded in
        # EPINIONS_RUNS.jsonl.)
        if self.logger:
            self.logger.info("fused epoch kernel skipped: tables exceed "
                             "the VMEM budget; using the scan path")
        return False

    def _build_fused_epoch_fn(self):
        """Whole-epoch Pallas program (ops/pallas_train.py): one vectorized
        XLA sampling pass reproducing the scan path's exact key stream,
        then the VMEM-resident kernel.  Same (params, opt_state, key,
        arrays) -> (params, opt_state, mean_loss) contract.

        Under a pure data-parallel mesh with D > 1 chips, the epoch's
        steps (padded to a multiple of D) are sampled globally, the step
        axis is sharded over the 'data' axis, and each chip runs the
        whole-epoch kernel over its steps/D chunk against a full table
        replica.  Parameter and moment deltas are then combined across
        chips (per-epoch local Adam; train.dp_delta_combine).  NOTE the
        measured convergence tradeoff: per-epoch sync at D=8 lands
        OUTSIDE seed variance on ml-100k regardless of combine rule
        (benchmarks/MESH_DP_CONVERGENCE.jsonl + PARITY.md round 5) —
        this is the THROUGHPUT tier; train.dp_sync_every=K combines
        every K local steps instead (K=2 with 'sum' was the measured
        quality point).  Mechanics pinned against a serial per-chunk
        oracle in tests/test_fused_mesh.py.  With
        D == 1 the shard_map wrapper is skipped entirely, so a meshed
        single-chip run is bit-identical to the unmeshed fused epoch."""
        if self._fused_grouped_plan is not None:
            return self._build_grouped_epoch_fn()
        from cleverrec_tpu.ops.pallas_train import (LOG2, cml_sentinel_bias,
                                                    fused_bpr_epoch,
                                                    fused_cml_epoch,
                                                    fused_gmf_epoch,
                                                    sentinel_dims)
        mesh_dp = getattr(self, "_fused_mesh_dp", 1)
        # train.dp_sync_every=K: delta-combine every K local steps
        # (kernel launched per K-step round) instead of once per epoch.
        # The fused tier DEFAULTS to per-epoch (0) — it is the
        # throughput tier; the measured convergence tradeoff is in
        # benchmarks/PARITY.md round-5 (mesh-DP local Adam table).
        sync_k = (self.cfg.int("train.dp_sync_every", 0)
                  if mesh_dp > 1 else 0)
        quantum = mesh_dp * max(sync_k, 1)
        steps = cdiv(self.steps_per_epoch, quantum) * quantum
        b = self.batch_size
        rows_total = self._epoch_rows
        padded = steps * b
        n_sent = padded - rows_total
        item_nums = self.dd.item_nums
        neg_ratio = self.neg_ratio
        u_pad, i_pad = sentinel_dims(self.dd.user_nums, item_nums)
        stream_plan = getattr(self, "_fused_stream_plan", None)
        plan_blk = (self._fused_plan if self._fused_plan is not None
                    else stream_plan[0])
        # The kernel wrappers pad B to a multiple of blk, so the plan's
        # VMEM-fitting block size is used as-is (capped by B itself).
        blk = min(plan_blk, max(b, 8))
        interpret = jax.default_backend() != "tpu"
        # pointwise_mlp models (NeuMF) regularize inside row_loss and
        # may have no single .reg attribute (reg1/reg2).
        lr, reg = self.cfg.lr, getattr(self.model, "reg", 0.0)
        proto = self.model.fused_protocol

        # D-padded step grids need D-padded static epoch layouts; store
        # them under a distinct key so the scan statics stay consistent.
        static_keys = {"pairwise_bpr": "pairwise_static",
                       "pointwise_bce": "pointwise_static",
                       "pointwise_mlp": "pointwise_static",
                       "cml_hinge": "cml_static"}
        static_key = static_keys.get(proto)
        if proto == "rows" and self.model.sampler == "pairwise":
            static_key = "pairwise_static"
        if (proto == "rows" and self.model.sampler == "sbpr"
                and "sbpr_static" in self.arrays):
            static_key = "sbpr_static"
        if (proto == "rows" and self.model.sampler == "tbpr"
                and "tbpr_static" in self.arrays):
            static_key = "tbpr_static"
        if steps != self.steps_per_epoch and static_key is not None:
            static_key = self._ensure_dp_static(static_key, padded)

        # Each protocol is a (sample, apply, correct) triple: ``sample``
        # draws the WHOLE padded epoch's kernel inputs (global, pure XLA —
        # GSPMD-shardable), ``apply`` runs the Pallas kernel over whatever
        # step chunk it is handed (per chip under a D>1 mesh), ``correct``
        # turns the summed raw loss into the logged per-step mean.

        def sample_pairwise(key, arrays):
            # Same key split as the scan path so both consume an identical
            # sampling stream (pinned by tests/test_fused_train.py).
            pkey, _ = jax.random.split(key)
            batch = sampling.pairwise_epoch_tensors(
                pkey, arrays[static_key], arrays["seen"], item_nums,
                steps, b, pop_cdf=arrays.get("pop_cdf"))
            inval = batch["w"] == 0.0
            u = jnp.where(inval, u_pad - 1, batch["u"]).astype(jnp.int32)
            i = jnp.where(inval, i_pad - 1, batch["i"]).astype(jnp.int32)
            j = jnp.where(inval, i_pad - 1, batch["j"]).astype(jnp.int32)
            return (u, i, j)

        table_dtype = (jnp.bfloat16 if getattr(self, "_fused_bf16", False)
                       else jnp.float32)

        def apply_pairwise(params, opt_state, tensors):
            u, i, j = tensors
            adam_st = opt_state[0]
            p_n, q_n, mp, vp, mq, vq, loss = fused_bpr_epoch(
                params["P"], params["Q"],
                adam_st.mu["P"], adam_st.nu["P"],
                adam_st.mu["Q"], adam_st.nu["Q"],
                u, i, j, adam_st.count,
                lr=lr, reg=reg, blk=blk, interpret=interpret,
                table_dtype=table_dtype)
            new_st = adam_st._replace(count=adam_st.count + u.shape[0],
                                      mu={"P": mp, "Q": mq},
                                      nu={"P": vp, "Q": vq})
            return ({"P": p_n, "Q": q_n}, (new_st,) + tuple(opt_state[1:]),
                    loss)

        def correct_sentinel(bias):
            return lambda loss: (loss - n_sent * bias) / steps

        def sample_pointwise(key, arrays):
            pkey, _ = jax.random.split(key)
            batch = sampling.pointwise_epoch_tensors(
                pkey, arrays[static_key], arrays["seen"], item_nums,
                steps, b, pop_cdf=arrays.get("pop_cdf"))
            inval = batch["w"] == 0.0
            # Sign-encoded user stream: (u+1) positives, -(u+1) negatives,
            # u_pad (= sentinel row + 1) for invalid slots.
            z = jnp.where(batch["y"] > 0, 1, -1)
            uz = jnp.where(inval, u_pad,
                           (batch["u"] + 1) * z).astype(jnp.int32)
            i = jnp.where(inval, i_pad - 1, batch["i"]).astype(jnp.int32)
            return (uz, i)

        def apply_pointwise(params, opt_state, tensors):
            uz, i = tensors
            adam_st = opt_state[0]
            (p_n, q_n, h_n, mp, vp, mq, vq, mh, vh, loss) = fused_gmf_epoch(
                params["P"], params["Q"], params["h_gmf"],
                adam_st.mu["P"], adam_st.nu["P"],
                adam_st.mu["Q"], adam_st.nu["Q"],
                adam_st.mu["h_gmf"], adam_st.nu["h_gmf"],
                uz, i, adam_st.count,
                lr=lr, reg=reg, blk=blk, interpret=interpret)
            new_st = adam_st._replace(
                count=adam_st.count + uz.shape[0],
                mu={"P": mp, "Q": mq, "h_gmf": mh},
                nu={"P": vp, "Q": vq, "h_gmf": vh})
            return ({"P": p_n, "Q": q_n, "h_gmf": h_n},
                    (new_st,) + tuple(opt_state[1:]), loss)

        def sample_cml(key, arrays):
            pkey, _ = jax.random.split(key)
            batch = sampling.cml_epoch_tensors(
                pkey, arrays[static_key], arrays["seen"], item_nums,
                steps, b, pop_cdf=arrays.get("pop_cdf"),
                neg_ratio=neg_ratio)
            inval = batch["w"] == 0.0
            u = jnp.where(inval, u_pad - 1, batch["u"]).astype(jnp.int32)
            i = jnp.where(inval, i_pad - 1, batch["i"]).astype(jnp.int32)
            negs = jnp.where(inval[..., None], i_pad - 1,
                             batch["negs"]).astype(jnp.int32)
            return (u, i, negs)

        def apply_cml(params, opt_state, tensors):
            u, i, negs = tensors
            adam_st = opt_state[0]
            p_n, q_n, mp, vp, mq, vq, loss = fused_cml_epoch(
                params["P"], params["Q"],
                adam_st.mu["P"], adam_st.nu["P"],
                adam_st.mu["Q"], adam_st.nu["Q"],
                u, i, negs, adam_st.count,
                lr=lr, reg=reg, margin=self.model.margin,
                item_nums=item_nums, blk=blk, interpret=interpret)
            new_st = adam_st._replace(count=adam_st.count + u.shape[0],
                                      mu={"P": mp, "Q": mq},
                                      nu={"P": vp, "Q": vq})
            return ({"P": p_n, "Q": q_n}, (new_st,) + tuple(opt_state[1:]),
                    loss)

        def apply_mlp(params, opt_state, tensors):
            from cleverrec_tpu.ops.pallas_train import fused_mlp_epoch
            spec = self.model.fused_mlp_spec()
            uz, i = tensors
            adam_st = opt_state[0]
            cat = lambda t, names: jnp.concatenate(  # noqa: E731
                [t[n] for n in names], axis=1)
            dense_of = lambda t: tuple(t[n] for n in spec["dense"])  # noqa: E731
            outs = fused_mlp_epoch(
                cat(params, spec["u"]), cat(params, spec["i"]),
                dense_of(params),
                cat(adam_st.mu, spec["u"]), cat(adam_st.mu, spec["i"]),
                dense_of(adam_st.mu),
                cat(adam_st.nu, spec["u"]), cat(adam_st.nu, spec["i"]),
                dense_of(adam_st.nu),
                uz, i, adam_st.count,
                row_loss=spec["row_loss"], lr=lr, blk=blk,
                interpret=interpret)

            split = functools.partial(_mlp_unsplit, spec, params)
            # Params outside the spec (NeuMF's vestigial h_gmf/h_mlp,
            # kept for the warm-start graft) pass through unchanged —
            # exactly what the scan path's optax does with zero grads
            # and zero moments.
            new_params = {**params, **split(*outs[0:3])}
            new_st = adam_st._replace(
                count=adam_st.count + uz.shape[0],
                mu={**adam_st.mu, **split(*outs[3:6])},
                nu={**adam_st.nu, **split(*outs[6:9])})
            # Explicit in-kernel masking: no sentinel loss correction.
            return (new_params, (new_st,) + tuple(opt_state[1:]), outs[9])

        def sample_rows(key, arrays):
            spec = self.model.fused_rows_spec()
            # Reproduce the scan path's sampling stream EXACTLY: the
            # same pkey/step-key split, the same epoch permutation, and
            # the same per-step batch builder — run under lax.scan
            # (NOT vmap: whole-epoch-width sampling tensors spill every
            # elementwise intermediate to HBM; measured 757ms vs the
            # scan arm's in-loop sampling on CUNE/ml-100k).
            pkey, skey = jax.random.split(key)
            if self.model.sampler == "pairwise":
                # Pairwise rows models (LRML) share the scan path's
                # static epoch-tensor sampling layout — same pkey, same
                # stream (tests pin fused == scan numerics).
                batch = sampling.pairwise_epoch_tensors(
                    pkey, arrays[static_key], arrays["seen"],
                    item_nums, steps, b, pop_cdf=arrays.get("pop_cdf"))
            elif static_key is not None and "sbpr" in static_key:
                # SBPR/CUNE share the scan path's whole-epoch sampler
                # (same pkey, same stream — the fused==scan pin holds).
                batch = sampling.sbpr_epoch_tensors(
                    pkey, arrays[static_key], arrays["social_neg"],
                    arrays["spu_csr"], item_nums, steps, b)
            elif static_key is not None and "tbpr" in static_key:
                batch = sampling.tbpr_epoch_tensors(
                    pkey, arrays[static_key], arrays["social_neg"],
                    arrays["ts_csr"], arrays["tw_csr"], item_nums,
                    steps, b)
            else:
                step_keys = jax.random.split(skey, steps)
                perm, valid = sampling.epoch_permutation(pkey, rows_total,
                                                         padded)

                def sample_step(_, xs):
                    k, r, v = xs
                    sk, _ = jax.random.split(k)
                    return None, self._build_batch(sk, r, v, arrays)

                _, batch = jax.lax.scan(
                    sample_step, None,
                    (step_keys, perm.reshape(steps, b),
                     valid.reshape(steps, b)))
            inval = batch["w"] == 0.0
            planes = tuple(
                jnp.where(inval,
                          (u_pad - 1) if sd == "u" else (i_pad - 1),
                          batch[name]).astype(jnp.int32)
                for name, sd in spec["planes"])
            flts = tuple(batch[n].astype(jnp.float32)
                         for n in spec["floats"])
            return (planes, flts)

        def apply_rows(params, opt_state, tensors):
            from cleverrec_tpu.ops.pallas_train import fused_rows_epoch
            spec = self.model.fused_rows_spec()
            planes, flts = tensors
            adam_st = opt_state[0]
            sides = tuple(sd for _, sd in spec["planes"])
            packs = [spec["pack"](t)
                     for t in (params, adam_st.mu, adam_st.nu)]
            if stream_plan is not None:
                from cleverrec_tpu.ops.pallas_train import (
                    fused_rows_epoch_stream)
                _, slab_u, slab_i = stream_plan
                kernel = functools.partial(fused_rows_epoch_stream,
                                           slab_u=slab_u, slab_i=slab_i)
            else:
                kernel = functools.partial(fused_rows_epoch,
                                           table_dtype=table_dtype)
            outs = kernel(
                packs[0][0], packs[0][1], packs[0][2],
                packs[1][0], packs[1][1], packs[1][2],
                packs[2][0], packs[2][1], packs[2][2],
                planes, flts, adam_st.count,
                sides=sides, row_loss=spec["row_loss"], lr=lr, blk=blk,
                interpret=interpret)
            unpack = spec["unpack"]
            new_params = {**params, **unpack(params, *outs[0:3])}
            new_st = adam_st._replace(
                count=adam_st.count + planes[0].shape[0],
                mu={**adam_st.mu, **unpack(adam_st.mu, *outs[3:6])},
                nu={**adam_st.nu, **unpack(adam_st.nu, *outs[6:9])})
            # In-kernel validity masking: no sentinel loss correction.
            return (new_params, (new_st,) + tuple(opt_state[1:]), outs[9])

        sample_fn, apply_fn, correct = {
            "pairwise_bpr": (sample_pairwise, apply_pairwise,
                             correct_sentinel(LOG2)),
            "pointwise_bce": (sample_pointwise, apply_pointwise,
                              correct_sentinel(LOG2)),
            "cml_hinge": (sample_cml, apply_cml,
                          correct_sentinel(cml_sentinel_bias(
                              getattr(self.model, "margin", 0.0),
                              item_nums, neg_ratio))),
            "pointwise_mlp": (sample_pointwise, apply_mlp,
                              lambda loss: loss / steps),
            "rows": (sample_rows, apply_rows, lambda loss: loss / steps),
        }[proto]

        if mesh_dp > 1:
            # Pure-DP mesh: shard the step axis, run the kernel per chip
            # against a full table replica, average the chips' parameter
            # and moment deltas (per-epoch local Adam).  Integer leaves
            # (Adam count) advance identically on every chip and pass
            # through.  raw loss is psum'd so ``correct`` sees the same
            # global total as the unmeshed program.
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            mesh = self.mesh

            combine = _dp_delta_combine(
                self.cfg.str("train.dp_delta_combine", "mean"))
            steps_loc = steps // mesh_dp

            def chip_fn(params, opt_state, tensors):
                if sync_k:
                    rounds = steps_loc // sync_k

                    def round_body(carry, t_k):
                        p, o = carry
                        p2, o2, raw_k = apply_fn(p, o, t_k)
                        p2 = jax.tree_util.tree_map(combine, p2, p)
                        o2 = jax.tree_util.tree_map(combine, o2, o)
                        return (p2, o2), raw_k

                    t_r = jax.tree_util.tree_map(
                        lambda a: a.reshape((rounds, sync_k)
                                            + a.shape[1:]), tensors)
                    (p2, o2), raws = jax.lax.scan(
                        round_body, (params, opt_state), t_r)
                    return p2, o2, jax.lax.psum(jnp.sum(raws), "data")
                p2, o2, raw = apply_fn(params, opt_state, tensors)
                raw = jax.lax.psum(raw, "data")

                p2 = jax.tree_util.tree_map(combine, p2, params)
                o2 = jax.tree_util.tree_map(combine, o2, opt_state)
                return p2, o2, raw

            chip = shard_map(chip_fn, mesh=mesh,
                             in_specs=(P(), P(), P("data")),
                             out_specs=(P(), P(), P()), check_vma=False)

            def epoch(params, opt_state, key, arrays):
                tensors = sample_fn(key, arrays)
                p2, o2, raw = chip(params, opt_state, tensors)
                return p2, o2, correct(raw)
        else:
            def epoch(params, opt_state, key, arrays):
                tensors = sample_fn(key, arrays)
                p2, o2, raw = apply_fn(params, opt_state, tensors)
                return p2, o2, correct(raw)

        self._epoch_body = epoch
        self._fused_parts = (sample_fn, apply_fn, correct)  # test hook
        return jax.jit(epoch, donate_argnums=(0, 1))

    def _build_grouped_epoch_fn(self):
        """GROUPED whole-epoch Pallas path for catalogs whose full user
        table + Adam moments overflow VMEM (ops/pallas_train.py
        plan_fused_grouped): users are split into G groups of
        ``group_rows``; each epoch runs G sequential launches of the
        SAME oracle-tested ``fused_bpr_epoch`` kernel, with only that
        group's P-slice (+ moments) resident alongside the full item
        state.

        Groups are BALANCED BY PAIR MASS via an explicit user
        permutation (snake assignment over users sorted by pair count):
        naive equal-ID-range groups padded every group to the densest
        group's step count, wasting up to ~G x sentinel work on skewed
        data.  The permuted id space is used END-TO-END inside the
        epoch — the sampling statics carry permuted ids and negatives
        draw from a row-permuted MemberTable copy — so the only
        permutation cost is one gather of the user state in (and one
        out) per epoch, ~sub-ms.

        Semantics: user-axis BLOCK-COORDINATE Adam — a P row's moments
        decay/advance only during its own group's steps (items stay
        dense every step).  This deviates from the scan path's dense
        optax.adam on the user axis; tests/test_fused_train.py pins the
        exact grouped semantics against a manual per-group Adam oracle,
        and the ml-1m benchmark records metric parity with the scan
        path.

        The cml_hinge protocol's dense per-step covariance regularizer
        (CML.py:63-70) spans the FULL user+item embedding matrix; the
        grouped launch carries the frozen (out-of-group) rows' partial
        sums into the kernel so the global mean and the loss are EXACT
        — only the frozen rows' own covariance gradients are deferred
        to their groups' launches (the same block-coordinate semantics
        every grouped parameter already has)."""
        from cleverrec_tpu.ops.pallas_train import (LOG2, fused_bpr_epoch,
                                                    fused_gmf_epoch,
                                                    sentinel_dims)
        proto = self.model.fused_protocol
        n_groups, group_rows, plan_blk = self._fused_grouped_plan
        b = self.batch_size
        neg_ratio = self.neg_ratio
        item_nums = self.dd.item_nums
        # Per-group slice width on the user axis: the embed size for the
        # BPR/GMF kernels, the concatenated table width for the generic
        # pointwise (NeuMF/MLP) kernel.
        mlp_spec = (self.model.fused_mlp_spec()
                    if proto == "pointwise_mlp" else None)
        d = (mlp_spec["tw_u"] if mlp_spec is not None
             else self.model.embed_size)
        un = self.dd.user_nums
        p_rows = n_groups * group_rows
        pos_u = np.asarray(self.arrays["pos_u"])
        pos_i = np.asarray(self.arrays["pos_i"])
        # -- balanced grouping permutation --------------------------------
        counts = np.bincount(pos_u, minlength=un)
        rank_of = np.argsort(-counts, kind="stable")    # heavy users first
        r = np.arange(un)
        rnd, pos = r // n_groups, r % n_groups
        g_of_rank = np.where(rnd % 2 == 0, pos, n_groups - 1 - pos)
        new_of_old = np.empty(un, np.int64)
        new_of_old[rank_of] = g_of_rank * group_rows + rnd  # slot == round
        old_of_new = np.full(p_rows, un, np.int64)      # filler -> pad row
        old_of_new[new_of_old] = r
        self._grouped_perm = (new_of_old, old_of_new)
        # Row-permuted sampling tables: permuted user ids flow through
        # the statics AND the negative draw unchanged.  Only the planes
        # the epoch sampler will actually read are materialized — the
        # complement path never touches rows/bits, and duplicating a
        # GB-class complement table on device would double its HBM cost.
        sn = self.dd.seen
        safe_old = np.where(old_of_new < un, old_of_new, 0)
        lens_perm = np.asarray(sn.lens)[safe_old]
        if sn.complement is not None and "pop_cdf" not in self.arrays:
            seen_perm = sampling.MemberTable(
                rows=np.zeros((1, 1), np.int32), lens=lens_perm,
                bits=None,
                # Row-permute ON DEVICE: the complement is GB-scale and
                # (since complement_from_bits) device-resident already.
                complement=jnp.asarray(sn.complement)[
                    jnp.asarray(safe_old)])
            # The UNpermuted complement is dead weight while the grouped
            # path owns training.  Since complement_from_bits it is a
            # DEVICE buffer reachable through BOTH self.arrays["seen"]
            # and self.dd.seen — drop both references or the GB-scale
            # buffer stays resident next to its permuted copy (nothing
            # after this point samples from the unpermuted table; eval
            # never draws negatives).
            self.arrays["seen"] = self.arrays["seen"]._replace(
                complement=None)
            self.dd.seen = self.dd.seen._replace(complement=None)
        else:
            seen_perm = sampling.MemberTable(
                rows=np.asarray(sn.rows)[safe_old], lens=lens_perm,
                bits=(None if sn.bits is None
                      else np.asarray(sn.bits)[safe_old]),
                complement=None)
        self.arrays["grouped_seen"] = jax.tree_util.tree_map(
            jnp.asarray, seen_perm)
        pos_up = new_of_old[pos_u]
        order = np.argsort(pos_up, kind="stable")
        pos_up, pos_i = pos_up[order].astype(np.int32), pos_i[order]
        bounds = np.searchsorted(pos_up, np.arange(n_groups + 1)
                                 * group_rows)
        # Rows per (u, i) pair: neg_ratio pairwise rows for BPR; ONE row
        # (carrying K negatives) for CML; 1 + neg_ratio pointwise rows
        # otherwise.  CML's static layout is the pairwise one at
        # neg_ratio=1 (mirrors __init__'s cml_static).
        rows_per_pair = {"pairwise_bpr": neg_ratio,
                         "cml_hinge": 1}.get(proto, 1 + neg_ratio)
        if proto in ("pairwise_bpr", "cml_hinge"):
            static_neg = neg_ratio if proto == "pairwise_bpr" else 1
            static_fn = sampling.pairwise_epoch_static
        else:
            static_neg = neg_ratio
            static_fn = sampling.pointwise_epoch_static
        # Mass balance makes one shared step count near-waste-free (and
        # one kernel shape = one Mosaic compile).
        steps_eq = max(1, max(
            int(cdiv((bounds[g + 1] - bounds[g]) * rows_per_pair, b))
            for g in range(n_groups)))
        # Pure-DP mesh: each group's steps shard over 'data' — every
        # chip samples the group's FULL tensors (same key, cheap XLA)
        # and runs the kernel over its steps_eq/D chunk; deltas are
        # averaged once per epoch (the fused-resident tier's local-Adam
        # schedule, applied inside the block-coordinate walk).
        mesh_dp = getattr(self, "_fused_mesh_dp", 1)
        steps_eq = cdiv(steps_eq, mesh_dp) * mesh_dp
        steps_loc = steps_eq // mesh_dp
        padded = steps_eq * b
        statics, n_sents = [], []
        for g in range(n_groups):
            sl = slice(bounds[g], bounds[g + 1])
            statics.append(static_fn(
                pos_up[sl], pos_i[sl], seen_perm.lens, item_nums,
                padded, static_neg))
            n_sents.append(padded - (bounds[g + 1] - bounds[g])
                           * rows_per_pair)
        # Stacked [G, ...] statics: the epoch runs groups under ONE
        # lax.scan body, so program size is independent of G (a Python
        # loop emitted G kernel+sampling subgraphs — a problem at the
        # planner's larger G rungs).
        self.arrays["grouped_static"] = jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *statics)
        # The ungrouped epoch statics built in __init__ are dead on this
        # path (same padded-epoch magnitude as grouped_static) — drop
        # them so their device copies free.
        self.arrays.pop("pairwise_static", None)
        self.arrays.pop("pointwise_static", None)
        self.arrays.pop("cml_static", None)
        # Per-chip sentinel correction: the group shuffle spreads
        # sentinel rows uniformly over chunks, so each chip subtracts
        # nsent/D — exact in the psum'd TOTAL (which is all we report).
        n_sents_arr = jnp.asarray(n_sents, jnp.float32) / mesh_dp
        # Real-user count per group (CML's covariance population needs
        # it; fillers are the tail slots of each group's range).
        grp_counts = jnp.asarray(
            np.bincount(g_of_rank, minlength=n_groups), jnp.float32)
        u_pad, i_pad = sentinel_dims(group_rows, item_nums)
        blk = min(plan_blk, max(b, 8))
        interpret = jax.default_backend() != "tpu"
        lr, reg = self.cfg.lr, getattr(self.model, "reg", 0.0)
        # Loss means divide by the GLOBAL step count (a chip's local
        # mean-part psums to the global mean); Adam counts advance by
        # the LOCAL steps each chip actually ran (identical on every
        # chip, so integer leaves pass delta-averaging through).
        steps_total = n_groups * steps_eq
        steps_total_loc = n_groups * steps_loc
        old_idx = jnp.asarray(old_of_new, jnp.int32)    # un == pad row
        new_idx = jnp.asarray(new_of_old, jnp.int32)

        # Shared grouped-epoch scaffolding: permute user state into
        # balanced-group order (one zero pad row at index un backs the
        # unused filler slots), scan the groups, un-permute at the end.
        # The per-protocol closures only provide the batch encoding and
        # kernel call.
        def perm_in(params, adam_st):
            pin = lambda a: jnp.pad(  # noqa: E731
                a, ((0, 1), (0, 0)))[old_idx]
            return (pin(params["P"]), pin(adam_st.mu["P"]),
                    pin(adam_st.nu["P"]))

        def slice_p(P, mP, vP, g0):
            slc = lambda a: jax.lax.dynamic_slice(  # noqa: E731
                a, (g0, 0), (group_rows, d))
            return slc(P), slc(mP), slc(vP)

        def update_p(P, mP, vP, p_g, mp_g, vp_g, g0):
            return (jax.lax.dynamic_update_slice(P, p_g, (g0, 0)),
                    jax.lax.dynamic_update_slice(mP, mp_g, (g0, 0)),
                    jax.lax.dynamic_update_slice(vP, vp_g, (g0, 0)))

        def scan_groups(group_body, carry, key, arrays):
            gkeys = jax.random.split(key, n_groups)
            carry, _ = jax.lax.scan(
                group_body, carry,
                (jnp.arange(n_groups, dtype=jnp.int32), gkeys,
                 arrays["grouped_static"], n_sents_arr))
            return carry

        def sentinel_ids(inval, ids):
            return jnp.where(inval, i_pad - 1, ids).astype(jnp.int32)

        def take_chunk(batch, chunk):
            """This chip's steps_loc-step slice of the group's sampled
            tensors (identity when unmeshed)."""
            if mesh_dp == 1:
                return batch
            return jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_slice_in_dim(
                    a, chunk * steps_loc, steps_loc, 0), batch)

        def epoch_pairwise(params, opt_state, key, arrays, chunk):
            adam_st = opt_state[0]
            P, mP, vP = perm_in(params, adam_st)
            Q, mQ, vQ = params["Q"], adam_st.mu["Q"], adam_st.nu["Q"]

            def group_body(carry, xs):
                P, mP, vP, Q, mQ, vQ, loss_total = carry
                g, gkey, static_g, nsent = xs
                pkey, _ = jax.random.split(gkey)
                batch = take_chunk(sampling.pairwise_epoch_tensors(
                    pkey, static_g, arrays["grouped_seen"],
                    item_nums, steps_eq, b,
                    pop_cdf=arrays.get("pop_cdf")), chunk)
                inval = batch["w"] == 0.0
                g0 = g * group_rows
                u = jnp.where(inval, u_pad - 1,
                              batch["u"] - g0).astype(jnp.int32)
                i = sentinel_ids(inval, batch["i"])
                j = sentinel_ids(inval, batch["j"])
                p_g, mp_g, vp_g = slice_p(P, mP, vP, g0)
                p_g, Q, mp_g, vp_g, mQ, vQ, loss = fused_bpr_epoch(
                    p_g, Q, mp_g, vp_g, mQ, vQ, u, i, j,
                    adam_st.count + g * steps_loc,
                    lr=lr, reg=reg, blk=blk, interpret=interpret)
                P, mP, vP = update_p(P, mP, vP, p_g, mp_g, vp_g, g0)
                return (P, mP, vP, Q, mQ, vQ,
                        loss_total + loss - nsent * LOG2), None

            P, mP, vP, Q, mQ, vQ, loss_total = scan_groups(
                group_body, (P, mP, vP, Q, mQ, vQ, 0.0), key, arrays)
            new_st = adam_st._replace(
                count=adam_st.count + steps_total_loc,
                mu={"P": mP[new_idx], "Q": mQ},
                nu={"P": vP[new_idx], "Q": vQ})
            return ({"P": P[new_idx], "Q": Q},
                    (new_st,) + tuple(opt_state[1:]),
                    loss_total / steps_total)

        def epoch_pointwise(params, opt_state, key, arrays, chunk):
            adam_st = opt_state[0]
            P, mP, vP = perm_in(params, adam_st)
            Q, mQ, vQ = params["Q"], adam_st.mu["Q"], adam_st.nu["Q"]
            h, mh, vh = (params["h_gmf"], adam_st.mu["h_gmf"],
                         adam_st.nu["h_gmf"])

            def group_body(carry, xs):
                P, mP, vP, Q, mQ, vQ, h, mh, vh, loss_total = carry
                g, gkey, static_g, nsent = xs
                pkey, _ = jax.random.split(gkey)
                batch = take_chunk(sampling.pointwise_epoch_tensors(
                    pkey, static_g, arrays["grouped_seen"],
                    item_nums, steps_eq, b,
                    pop_cdf=arrays.get("pop_cdf")), chunk)
                inval = batch["w"] == 0.0
                z = jnp.where(batch["y"] > 0, 1, -1)
                g0 = g * group_rows
                uz = jnp.where(
                    inval, u_pad,
                    (batch["u"] - g0 + 1) * z).astype(jnp.int32)
                i = sentinel_ids(inval, batch["i"])
                p_g, mp_g, vp_g = slice_p(P, mP, vP, g0)
                (p_g, Q, h, mp_g, vp_g, mQ, vQ, mh, vh,
                 loss) = fused_gmf_epoch(
                    p_g, Q, h, mp_g, vp_g, mQ, vQ, mh, vh,
                    uz, i, adam_st.count + g * steps_loc,
                    lr=lr, reg=reg, blk=blk, interpret=interpret)
                P, mP, vP = update_p(P, mP, vP, p_g, mp_g, vp_g, g0)
                return (P, mP, vP, Q, mQ, vQ, h, mh, vh,
                        loss_total + loss - nsent * LOG2), None

            (P, mP, vP, Q, mQ, vQ, h, mh, vh, loss_total) = scan_groups(
                group_body, (P, mP, vP, Q, mQ, vQ, h, mh, vh, 0.0),
                key, arrays)
            new_st = adam_st._replace(
                count=adam_st.count + steps_total_loc,
                mu={"P": mP[new_idx], "Q": mQ, "h_gmf": mh},
                nu={"P": vP[new_idx], "Q": vQ, "h_gmf": vh})
            return ({"P": P[new_idx], "Q": Q, "h_gmf": h},
                    (new_st,) + tuple(opt_state[1:]),
                    loss_total / steps_total)

        def epoch_mlp(params, opt_state, key, arrays, chunk):
            from cleverrec_tpu.ops.pallas_train import fused_mlp_epoch
            spec = mlp_spec
            adam_st = opt_state[0]
            cat = lambda t, names: jnp.concatenate(  # noqa: E731
                [t[n] for n in names], axis=1)
            pin = lambda a: jnp.pad(a, ((0, 1), (0, 0)))[old_idx]  # noqa: E731
            PU, mPU, vPU = (pin(cat(t, spec["u"]))
                            for t in (params, adam_st.mu, adam_st.nu))
            QI, mQI, vQI = (cat(t, spec["i"])
                            for t in (params, adam_st.mu, adam_st.nu))
            dense_of = lambda t: tuple(t[n] for n in spec["dense"])  # noqa: E731
            D, mD, vD = (dense_of(t)
                         for t in (params, adam_st.mu, adam_st.nu))

            def group_body(carry, xs):
                PU, mPU, vPU, QI, mQI, vQI, D, mD, vD, loss_total = carry
                g, gkey, static_g, nsent = xs
                pkey, _ = jax.random.split(gkey)
                batch = take_chunk(sampling.pointwise_epoch_tensors(
                    pkey, static_g, arrays["grouped_seen"],
                    item_nums, steps_eq, b,
                    pop_cdf=arrays.get("pop_cdf")), chunk)
                inval = batch["w"] == 0.0
                z = jnp.where(batch["y"] > 0, 1, -1)
                g0 = g * group_rows
                uz = jnp.where(
                    inval, u_pad,
                    (batch["u"] - g0 + 1) * z).astype(jnp.int32)
                i = sentinel_ids(inval, batch["i"])
                pu_g, mpu_g, vpu_g = slice_p(PU, mPU, vPU, g0)
                (pu_g, QI, D, mpu_g, mQI, mD, vpu_g, vQI, vD,
                 loss) = fused_mlp_epoch(
                    pu_g, QI, D, mpu_g, mQI, mD, vpu_g, vQI, vD, uz, i,
                    adam_st.count + g * steps_loc,
                    row_loss=spec["row_loss"], lr=lr, blk=blk,
                    interpret=interpret)
                PU, mPU, vPU = update_p(PU, mPU, vPU, pu_g, mpu_g,
                                        vpu_g, g0)
                # In-kernel validity masking: no sentinel correction.
                return (PU, mPU, vPU, QI, mQI, vQI, D, mD, vD,
                        loss_total + loss), None

            (PU, mPU, vPU, QI, mQI, vQI, D, mD, vD,
             loss_total) = scan_groups(
                group_body, (PU, mPU, vPU, QI, mQI, vQI, D, mD, vD, 0.0),
                key, arrays)

            split = functools.partial(_mlp_unsplit, spec, params)
            new_st = adam_st._replace(
                count=adam_st.count + steps_total_loc,
                mu={**adam_st.mu, **split(mPU[new_idx], mQI, mD)},
                nu={**adam_st.nu, **split(vPU[new_idx], vQI, vD)})
            return ({**params, **split(PU[new_idx], QI, D)},
                    (new_st,) + tuple(opt_state[1:]),
                    loss_total / steps_total)

        def epoch_cml(params, opt_state, key, arrays, chunk):
            from cleverrec_tpu.ops.pallas_train import (cml_sentinel_bias,
                                                        fused_cml_epoch)
            adam_st = opt_state[0]
            P, mP, vP = perm_in(params, adam_st)
            Q, mQ, vQ = params["Q"], adam_st.mu["Q"], adam_st.nu["Q"]
            bias = cml_sentinel_bias(self.model.margin, item_nums,
                                     neg_ratio)

            def p_stats(x):
                """(sum_a, sum_a2, sum_sq, col_sum) over rows of x
                (filler rows are zero everywhere, so unmasked sums
                equal real-row sums)."""
                row_a = jnp.sum(x, axis=1)
                return (jnp.sum(row_a), jnp.sum(row_a ** 2),
                        jnp.sum(x * x), jnp.sum(x, axis=0))

            # Running totals carried ACROSS groups (O(U*d) once, then
            # O(rows*d) per group — a per-group full-table reduction
            # was O(G*U*d) of pure scan-serialized overhead).
            tot = p_stats(P)

            def group_body(carry, xs):
                P, mP, vP, Q, mQ, vQ, tot, loss_total = carry
                g, gkey, static_g, nsent = xs
                pkey, _ = jax.random.split(gkey)
                batch = take_chunk(sampling.cml_epoch_tensors(
                    pkey, static_g, arrays["grouped_seen"],
                    item_nums, steps_eq, b,
                    pop_cdf=arrays.get("pop_cdf"), neg_ratio=neg_ratio),
                    chunk)
                inval = batch["w"] == 0.0
                g0 = g * group_rows
                u = jnp.where(inval, u_pad - 1,
                              batch["u"] - g0).astype(jnp.int32)
                i = sentinel_ids(inval, batch["i"])
                negs = jnp.where(inval[..., None], i_pad - 1,
                                 batch["negs"]).astype(jnp.int32)
                p_g, mp_g, vp_g = slice_p(P, mP, vP, g0)
                res = p_stats(p_g)
                fro = tuple(t - r for t, r in zip(tot, res))
                frozen = (grp_counts[g], float(un) - grp_counts[g]) + fro
                p_g, Q, mp_g, vp_g, mQ, vQ, loss = fused_cml_epoch(
                    p_g, Q, mp_g, vp_g, mQ, vQ, u, i, negs,
                    adam_st.count + g * steps_loc,
                    lr=lr, reg=reg, margin=self.model.margin,
                    item_nums=item_nums, blk=blk, interpret=interpret,
                    frozen=frozen)
                P, mP, vP = update_p(P, mP, vP, p_g, mp_g, vp_g, g0)
                tot = tuple(f + r for f, r in zip(fro, p_stats(p_g)))
                return (P, mP, vP, Q, mQ, vQ, tot,
                        loss_total + loss - nsent * bias), None

            P, mP, vP, Q, mQ, vQ, _, loss_total = scan_groups(
                group_body, (P, mP, vP, Q, mQ, vQ, tot, 0.0), key, arrays)
            new_st = adam_st._replace(
                count=adam_st.count + steps_total_loc,
                mu={"P": mP[new_idx], "Q": mQ},
                nu={"P": vP[new_idx], "Q": vQ})
            return ({"P": P[new_idx], "Q": Q},
                    (new_st,) + tuple(opt_state[1:]),
                    loss_total / steps_total)

        epoch_local = {"pairwise_bpr": epoch_pairwise,
                       "pointwise_bce": epoch_pointwise,
                       "pointwise_mlp": epoch_mlp,
                       "cml_hinge": epoch_cml}[proto]

        if mesh_dp > 1:
            # Every chip runs the full block-coordinate group walk over
            # its own chunk of every group's steps; float deltas are
            # averaged ONCE per epoch (the fused-resident tier's
            # local-Adam schedule).  Chips report local mean-parts that
            # psum to the global epoch mean.
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            mesh = self.mesh

            combine = _dp_delta_combine(
                self.cfg.str("train.dp_delta_combine", "mean"))

            def chip_fn(params, opt_state, key, arrays):
                chunk = jax.lax.axis_index("data")
                p2, o2, mean_part = epoch_local(params, opt_state, key,
                                                arrays, chunk)
                mean_loss = jax.lax.psum(mean_part, "data")

                p2 = jax.tree_util.tree_map(combine, p2, params)
                o2 = jax.tree_util.tree_map(combine, o2, opt_state)
                return p2, o2, mean_loss

            chip = shard_map(chip_fn, mesh=mesh,
                             in_specs=(P(), P(), P(), P()),
                             out_specs=(P(), P(), P()), check_vma=False)

            def epoch(params, opt_state, key, arrays):
                return chip(params, opt_state, key, arrays)
        else:
            def epoch(params, opt_state, key, arrays):
                return epoch_local(params, opt_state, key, arrays, 0)

        self._epoch_body = epoch
        self._grouped_parts = (epoch_local, steps_eq, mesh_dp)  # test hook
        return jax.jit(epoch, donate_argnums=(0, 1))

    def _sparse_rows_eligible(self) -> bool:
        """Lazy row-Adam scan tier for rows protocols past VMEM
        (round-4 verdict item 1): only the touched rows' params/moments
        move per step (ops/sparse_adam) — dense optax.adam's full-table
        traversal was 214.8 ms of the 336.7 ms Epinions SBPR epoch
        (benchmarks/sbpr_profile.py) while the Adam math itself was
        ~6 ms.  Applies when the resident fused plan declined (tables
        overflow VMEM).  Semantics: LazyAdam — pinned step-wise in
        tests/test_sparse_rows.py, metric-level in EPINIONS_RUNS.jsonl.
        Unmeshed only (meshes keep the scan path's GSPMD/dp tiers).
        Opt-out: train.sparse_rows=False; train.sparse_rows_force=True
        engages it even where the resident fused plan fits (test/bench
        hook)."""
        if (getattr(self.model, "fused_protocol", None)
                not in ("rows", "pairwise_bpr")
                or not hasattr(self.model, "fused_rows_spec")):
            return False
        if self.cfg.optimizer != "Adam":
            return False
        if (self.mesh is not None
                and math.prod(self.mesh.shape.values()) > 1):
            return False
        if self.cfg.bool("train.sparse_rows_force", False):
            return True
        return (getattr(self, "_sparse_rows_ok", False)
                and self.cfg.bool("train.sparse_rows", True))

    def _build_sparse_rows_epoch_fn(self):
        """Scan epoch for rows-protocol models with LazyAdam updates:
        per step, gather the batch's plane rows, differentiate the
        model's fused_rows_spec row_loss w.r.t. the GATHERED rows (the
        same per-row loss the fused kernel runs — fused==scan loss
        parity holds by construction), then update only the touched
        rows of each side's packed table (duplicates' grads summed,
        matching a dense scatter-add).  Dense spec params (e.g. CUNE's
        social scalar) take a plain Adam step each step."""
        from cleverrec_tpu.ops.sparse_adam import (dense_adam_leaf,
                                                   sparse_rows_adam)
        spec = self.model.fused_rows_spec()
        names = tuple(n for n, _ in spec["planes"])
        sides = tuple(sd for _, sd in spec["planes"])
        fnames = spec["floats"]
        steps, b = self.steps_per_epoch, self.batch_size
        rows_total = self._epoch_rows
        padded = steps * b
        item_nums = self.dd.item_nums
        lr = self.cfg.lr
        sampler = self.model.sampler
        sbpr_tensors = (sampler == "sbpr"
                        and "sbpr_static" in self.arrays)
        tbpr_tensors = (sampler == "tbpr"
                        and "tbpr_static" in self.arrays)
        pairwise_tensors = sampler == "pairwise"

        def epoch(params, opt_state, key, arrays):
            adam_st = opt_state[0]
            (P0, QI0, D0), (mP0, mQI0, mD0), (vP0, vQI0, vD0) = [
                spec["pack"](t) for t in (params, adam_st.mu, adam_st.nu)]
            pkey, skey = jax.random.split(key)
            step_keys = jax.random.split(skey, steps)
            if sbpr_tensors:
                xs = (sampling.sbpr_epoch_tensors(
                    pkey, arrays["sbpr_static"], arrays["social_neg"],
                    arrays["spu_csr"], item_nums, steps, b), step_keys)
            elif tbpr_tensors:
                xs = (sampling.tbpr_epoch_tensors(
                    pkey, arrays["tbpr_static"], arrays["social_neg"],
                    arrays["ts_csr"], arrays["tw_csr"], item_nums,
                    steps, b), step_keys)
            elif pairwise_tensors:
                xs = (sampling.pairwise_epoch_tensors(
                    pkey, arrays["pairwise_static"], arrays["seen"],
                    item_nums, steps, b,
                    pop_cdf=arrays.get("pop_cdf")), step_keys)
            else:
                perm, valid = sampling.epoch_permutation(
                    pkey, rows_total, padded)
                xs = ((perm.reshape(steps, b), valid.reshape(steps, b)),
                      step_keys)

            def step(carry, x):
                P, QI, Dn, mP, mQI, mD, vP, vQI, vD, count = carry
                payload, k = x
                sk, _ = jax.random.split(k)
                if sbpr_tensors or tbpr_tensors or pairwise_tensors:
                    batch = dict(payload)
                else:
                    rows, w = payload
                    batch = self._build_batch(sk, rows, w, arrays)
                # row_loss consumes w/floats as [B, 1] columns (the
                # fused kernel's per-block layout).
                wv = batch["w"][:, None]
                plane_ids = tuple(batch[n].astype(jnp.int32)
                                  for n in names)
                flts = tuple(batch[n].astype(jnp.float32)[:, None]
                             for n in fnames)
                tables = {"u": P, "i": QI}
                rows_g = tuple(tables[sd][ids]
                               for ids, sd in zip(plane_ids, sides))
                loss, (g_rows, g_dense) = jax.value_and_grad(
                    lambda rg, dn: spec["row_loss"](rg, flts, dn, wv),
                    argnums=(0, 1))(rows_g, Dn)
                u_ids = jnp.concatenate(
                    [ids for ids, sd in zip(plane_ids, sides)
                     if sd == "u"])
                u_g = jnp.concatenate(
                    [g for g, sd in zip(g_rows, sides) if sd == "u"],
                    axis=0)
                i_ids = jnp.concatenate(
                    [ids for ids, sd in zip(plane_ids, sides)
                     if sd == "i"])
                i_g = jnp.concatenate(
                    [g for g, sd in zip(g_rows, sides) if sd == "i"],
                    axis=0)
                P, mP, vP = sparse_rows_adam(P, mP, vP, u_ids, u_g,
                                             count, lr)
                QI, mQI, vQI = sparse_rows_adam(QI, mQI, vQI, i_ids,
                                                i_g, count, lr)
                if Dn:
                    upd = [dense_adam_leaf(p_, m_, v_, g_, count, lr)
                           for p_, m_, v_, g_
                           in zip(Dn, mD, vD, g_dense)]
                    Dn = tuple(u_[0] for u_ in upd)
                    mD = tuple(u_[1] for u_ in upd)
                    vD = tuple(u_[2] for u_ in upd)
                return (P, QI, Dn, mP, mQI, mD, vP, vQI, vD,
                        count + 1), loss

            carry0 = (P0, QI0, D0, mP0, mQI0, mD0, vP0, vQI0, vD0,
                      adam_st.count)
            carry, losses = jax.lax.scan(step, carry0, xs)
            P, QI, Dn, mP, mQI, mD, vP, vQI, vD, count = carry
            unpack = spec["unpack"]
            new_params = {**params, **unpack(params, P, QI, Dn)}
            new_st = adam_st._replace(
                count=count,
                mu={**adam_st.mu, **unpack(adam_st.mu, mP, mQI, mD)},
                nu={**adam_st.nu, **unpack(adam_st.nu, vP, vQI, vD)})
            return (new_params, (new_st,) + tuple(opt_state[1:]),
                    jnp.mean(losses))

        self._epoch_body = epoch
        self._sparse_tier = True
        return jax.jit(epoch, donate_argnums=(0, 1))

    def _build_epoch_fn(self, steps=None, rows_total=None,
                        register_body=True, batch_size=None):
        # Per-epoch delta-averaged local Adam for the SCAN tier under a
        # pure-DP mesh (train.dp_local_adam): the epoch's step axis is
        # sharded over 'data', each chip scans its steps/D chunk against
        # a full replica, and parameter/moment deltas are averaged once
        # per epoch — the same optimizer schedule as the fused mesh-DP
        # tier (_build_fused_epoch_fn), available to EVERY sampler
        # protocol.  Default off: the scan tier's standard semantics
        # (batch sharded over 'data', grads psum'd per step) stay.
        local_adam_dp = 1
        sync_k = 0
        if (steps is None and self.mesh is not None
                and self.mesh.shape.get("model", 1) == 1
                and self.mesh.shape.get("data", 1) > 1
                and self.cfg.str("parallel.exchange", "gspmd") != "explicit"
                and self.cfg.bool("train.dp_local_adam", False)):
            local_adam_dp = self.mesh.shape["data"]
            # train.dp_sync_every=K: delta-combine every K local steps
            # instead of once per epoch.  Per-epoch sync at D=8 lands
            # outside seed variance on ml-100k (MESH_DP_CONVERGENCE
            # table); small K restores sync-arm quality at 1/K the
            # collective count.
            sync_k = self.cfg.int("train.dp_sync_every", 2)
        steps = self.steps_per_epoch if steps is None else steps
        quantum = local_adam_dp * max(sync_k, 1)
        steps = cdiv(steps, quantum) * quantum
        rows_total = self._epoch_rows if rows_total is None else rows_total
        b = self.batch_size if batch_size is None else batch_size
        padded = steps * b
        model = self.model
        optimizer = self.optimizer
        if self.mesh is not None:
            from cleverrec_tpu.parallel.sharding import (
                shard_batch_spec, wrap_explicit_exchange)
            constrain = shard_batch_spec(self.mesh)
            # parallel.exchange=explicit: route every table lookup through
            # the shard_map gather+psum exchange (perf tier) instead of
            # leaving the resharding decision to GSPMD.  Same numerics
            # (tests/test_parallel.py pins explicit == gspmd == unsharded).
            if self.cfg.str("parallel.exchange", "gspmd") == "explicit":
                mesh, meta = self.mesh, self.model.meta
                view = lambda p: wrap_explicit_exchange(  # noqa: E731
                    p, meta, mesh, data_axis="data")
            else:
                view = lambda p: p  # noqa: E731
        else:
            constrain = lambda batch: batch  # noqa: E731
            view = lambda p: p  # noqa: E731

        tensors_fn = {"pairwise": sampling.pairwise_epoch_tensors,
                      "pointwise": sampling.pointwise_epoch_tensors,
                      "cml": functools.partial(
                          sampling.cml_epoch_tensors,
                          neg_ratio=self.neg_ratio),
                      }.get(self.model.sampler)
        static_key = f"{self.model.sampler}_static"
        sbpr_tensors = (self.model.sampler == "sbpr"
                        and "sbpr_static" in self.arrays)
        tbpr_tensors = (self.model.sampler == "tbpr"
                        and "tbpr_static" in self.arrays)
        if ((tensors_fn is not None or sbpr_tensors or tbpr_tensors)
                and local_adam_dp > 1 and steps != self.steps_per_epoch):
            # D-padded step grids need D-padded static epoch layouts
            # (same rebuild the fused mesh-DP tier does).
            static_key = self._ensure_dp_static(static_key, padded)

        def build_xs(key, arrays):
            # Pairwise/pointwise epochs pre-materialize the whole epoch's
            # sampled tensors in pair/group order (near-sequential
            # complement gathers, one sort-shuffle — see
            # sampling.*_epoch_tensors); other protocols sample per step
            # inside the scan.
            pkey, skey = jax.random.split(key)
            step_keys = jax.random.split(skey, steps)
            if tensors_fn is not None:
                epoch_batch = tensors_fn(
                    pkey, arrays[static_key], arrays["seen"],
                    self.dd.item_nums, steps, b,
                    pop_cdf=arrays.get("pop_cdf"))
                return (epoch_batch, step_keys)
            if sbpr_tensors:
                epoch_batch = sampling.sbpr_epoch_tensors(
                    pkey, arrays[static_key], arrays["social_neg"],
                    arrays["spu_csr"], self.dd.item_nums, steps, b)
                return (epoch_batch, step_keys)
            if tbpr_tensors:
                epoch_batch = sampling.tbpr_epoch_tensors(
                    pkey, arrays[static_key], arrays["social_neg"],
                    arrays["ts_csr"], arrays["tw_csr"],
                    self.dd.item_nums, steps, b)
                return (epoch_batch, step_keys)
            perm, valid = sampling.epoch_permutation(pkey, rows_total,
                                                     padded)
            return ((perm.reshape(steps, b), valid.reshape(steps, b)),
                    step_keys)

        def run_scan(params, opt_state, xs, arrays, constrain_b):
            def step(carry, xs):
                params, opt_state = carry
                payload, k = xs
                sk, dk = jax.random.split(k)
                if tensors_fn is not None or sbpr_tensors or tbpr_tensors:
                    batch = dict(payload)
                else:
                    rows, w = payload
                    batch = self._build_batch(sk, rows, w, arrays)
                batch = constrain_b(batch)
                batch["dropout_key"] = dk
                loss, grads = jax.value_and_grad(
                    lambda p: model.loss(view(p), batch, arrays))(params)
                updates, opt_state = optimizer.update(grads, opt_state,
                                                      params)
                params = optax.apply_updates(params, updates)
                params = model.postprocess(params)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), xs)
            return params, opt_state, losses

        if local_adam_dp > 1:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            mesh = self.mesh
            ident = lambda batch: batch  # noqa: E731
            real_steps = self.steps_per_epoch

            combine = _dp_delta_combine(
                self.cfg.str("train.dp_delta_combine", "sum"))

            steps_loc = steps // local_adam_dp

            def chip_fn(params, opt_state, xs, arrays):
                # Padded steps are fully invalid (w == 0 -> loss 0), so
                # the psum'd TOTAL over padded steps equals the total
                # over real steps; divide by the real count to match the
                # unmeshed mean.
                if sync_k:
                    rounds = steps_loc // sync_k
                    xs_r = jax.tree_util.tree_map(
                        lambda a: a.reshape((rounds, sync_k)
                                            + a.shape[1:]), xs)

                    def round_body(carry, xs_k):
                        p, o = carry
                        p2, o2, losses = run_scan(p, o, xs_k, arrays,
                                                  ident)
                        p2 = jax.tree_util.tree_map(combine, p2, p)
                        o2 = jax.tree_util.tree_map(combine, o2, o)
                        return (p2, o2), jnp.sum(losses)

                    (p2, o2), raws = jax.lax.scan(
                        round_body, (params, opt_state), xs_r)
                    return p2, o2, jax.lax.psum(jnp.sum(raws), "data")
                p2, o2, losses = run_scan(params, opt_state, xs, arrays,
                                          ident)
                raw = jax.lax.psum(jnp.sum(losses), "data")
                p2 = jax.tree_util.tree_map(combine, p2, params)
                o2 = jax.tree_util.tree_map(combine, o2, opt_state)
                return p2, o2, raw

            chip = shard_map(chip_fn, mesh=mesh,
                             in_specs=(P(), P(), P("data"), P()),
                             out_specs=(P(), P(), P()), check_vma=False)

            def epoch(params, opt_state, key, arrays):
                xs = build_xs(key, arrays)
                p2, o2, raw = chip(params, opt_state, xs, arrays)
                return p2, o2, raw / real_steps
        else:
            def epoch(params, opt_state, key, arrays):
                xs = build_xs(key, arrays)
                params, opt_state, losses = run_scan(
                    params, opt_state, xs, arrays, constrain)
                return params, opt_state, jnp.mean(losses)

        if register_body:
            self._epoch_body = epoch
            self._scan_parts = (build_xs, run_scan, steps,
                                local_adam_dp, sync_k)  # test hook
        return jax.jit(epoch, donate_argnums=(0, 1))

    def _ensure_dp_static(self, static_key: str, padded: int) -> str:
        """Build (once) the D-padded static epoch layout for a padded
        step grid and return its arrays key (``<static_key>_dp`` — the
        same key/content the fused mesh-DP tier builds)."""
        dp_key = static_key + "_dp"
        if dp_key in self.arrays:
            return dp_key
        pos_u = np.asarray(self.arrays["pos_u"])
        pos_i = np.asarray(self.arrays["pos_i"])
        lens = self.dd.seen.lens
        item_nums = self.dd.item_nums
        if static_key == "pointwise_static":
            st = sampling.pointwise_epoch_static(
                pos_u, pos_i, lens, item_nums, padded, self.neg_ratio)
        elif static_key == "cml_static":
            st = sampling.pairwise_epoch_static(
                pos_u, pos_i, lens, item_nums, padded, 1)
        elif static_key == "sbpr_static":
            st = sampling.sbpr_epoch_static(
                pos_u, pos_i, np.asarray(self.arrays["social_neg"].lens),
                np.asarray(self.arrays["spu"].lens),
                np.asarray(self.arrays["spu_csr"]["off"]),
                item_nums, padded, self.neg_ratio)
        elif static_key == "tbpr_static":
            st = sampling.tbpr_epoch_static(
                pos_u, pos_i, np.asarray(self.arrays["social_neg"].lens),
                np.asarray(self.arrays["tie_strong"].lens),
                np.asarray(self.arrays["ts_csr"]["off"]),
                np.asarray(self.arrays["tie_weak"].lens),
                np.asarray(self.arrays["tw_csr"]["off"]),
                item_nums, padded, self.neg_ratio)
        else:
            st = sampling.pairwise_epoch_static(
                pos_u, pos_i, lens, item_nums, padded, self.neg_ratio)
        self.arrays[dp_key] = jax.tree_util.tree_map(jnp.asarray, st)
        return dp_key

    def _build_bucketed_epochs(self):
        """History-length bucketing for attention-over-history models
        (NAIS family): users are partitioned into power-of-two history
        WIDTH buckets and each bucket trains with its own compiled scan
        over a truncated seen-rows table, so short-history users stop
        paying max-width attention cost (the reference's per-user batches,
        RankingRecommender.py:64-87, have the same effect — one user's
        rows per step — at the price of 1-user batches).  Shuffling is
        within-bucket, matching the reference's user-at-a-time ordering
        semantics more closely than a global row shuffle.
        """
        seen = self.dd.seen
        h_max = seen.rows.shape[1]
        lens = np.asarray(seen.lens)
        pos_u = np.asarray(self.arrays["pos_u"])
        pos_i = np.asarray(self.arrays["pos_i"])
        widths = [w for w in (32, 64, 128, 256, 512, 1024, 2048, 4096)
                  if w < h_max]
        widths.append(h_max)
        deg_pair = lens[pos_u]
        bidx = np.searchsorted(np.asarray(widths), deg_pair, side="left")
        grouped = hasattr(self.model, "loss_grouped")
        grp = 1 + self.neg_ratio
        plan = []
        for k, w in enumerate(widths):
            sel = bidx == k
            n_sel = int(sel.sum())
            if n_sel == 0:
                continue
            arrays_k = dict(self.arrays)
            arrays_k["seen"] = self.arrays["seen"]._replace(
                rows=self.arrays["seen"].rows[:, :w])
            if grouped:
                users_k = np.unique(pos_u[sel])
                fn, steps_k = self._build_grouped_bucket_fn(users_k, w,
                                                            arrays_k)
            else:
                arrays_k["pos_u"] = jnp.asarray(pos_u[sel])
                arrays_k["pos_i"] = jnp.asarray(pos_i[sel])
                rows_k = n_sel * grp
                # Per-bucket batch size: no point padding a 500-row
                # bucket to a 6144-row batch.
                b_k = min(self.batch_size, max(256, -(-rows_k // 256) * 256))
                steps_k = cdiv(rows_k, b_k)
                arrays_k["pointwise_static"] = jax.tree_util.tree_map(
                    jnp.asarray, sampling.pointwise_epoch_static(
                        pos_u[sel], pos_i[sel], lens, self.dd.item_nums,
                        steps_k * b_k, self.neg_ratio))
                fn = self._build_epoch_fn(steps=steps_k, rows_total=rows_k,
                                          register_body=False,
                                          batch_size=b_k)
            plan.append({"fn": fn, "arrays": arrays_k, "steps": steps_k,
                         "width": w, "pairs": n_sel})
        if self.logger:
            self.logger.info(
                "history buckets (%s): %s",
                "grouped" if grouped else "row",
                ", ".join(f"w={p['width']}:{p['pairs']}p/{p['steps']}s"
                          for p in plan))
        return plan

    def _build_grouped_bucket_fn(self, users_k, width, arrays_k):
        """One bucket's epoch in the GROUPED layout: scan steps process G
        (user, target-chunk) groups; per-user static target grids (first
        deg cells = positives, next neg_ratio*deg = negatives, rest pad)
        are built once per run, negatives redrawn per epoch in one pass.
        The model consumes groups via ``loss_grouped``.
        """
        model = self.model
        optimizer = self.optimizer
        tc = model.TARGET_CHUNK
        item_nums = self.dd.item_nums
        lens = np.asarray(self.dd.seen.lens)
        rows_tbl = np.asarray(self.dd.seen.rows)
        grp = 1 + self.neg_ratio

        deg = lens[users_k]
        n_groups_u = -(-(grp * deg) // tc)
        gu = np.repeat(users_k, n_groups_u).astype(np.int32)
        g_total = len(gu)
        g_per_step = max(self.batch_size // tc, 1)
        steps = cdiv(g_total, g_per_step)
        g_pad = steps * g_per_step

        g_pos = np.full((g_pad, tc), item_nums, np.int32)
        g_y = np.zeros((g_pad, tc), np.float32)
        g_w = np.zeros((g_pad, tc), np.float32)
        ofs = 0
        for u, d, ng in zip(users_k, deg, n_groups_u):
            slots = ng * tc
            flat_pos = np.full(slots, item_nums, np.int32)
            flat_pos[:d] = rows_tbl[u, :d]
            flat_y = np.zeros(slots, np.float32)
            flat_y[:d] = 1.0
            flat_w = np.zeros(slots, np.float32)
            flat_w[: grp * d] = 1.0
            g_pos[ofs: ofs + ng] = flat_pos.reshape(ng, tc)
            g_y[ofs: ofs + ng] = flat_y.reshape(ng, tc)
            g_w[ofs: ofs + ng] = flat_w.reshape(ng, tc)
            ofs += ng
        gu_pad = np.zeros(g_pad, np.int32)
        gu_pad[:g_total] = gu
        g_nun = np.maximum(item_nums - lens[gu_pad], 1).astype(np.int32)

        arrays_k["g_user"] = jnp.asarray(gu_pad)
        arrays_k["g_pos"] = jnp.asarray(g_pos)
        arrays_k["g_y"] = jnp.asarray(g_y)
        arrays_k["g_w"] = jnp.asarray(g_w)
        arrays_k["g_nun"] = jnp.asarray(g_nun)
        # Thread the FULL-width seen table through the arrays ARGUMENT
        # (arrays_k["seen"] is width-truncated for this bucket) — a
        # closure-captured table is embedded as an HLO constant, and a
        # GB-scale complement then rides the whole compile.
        arrays_k["seen_full"] = self.arrays["seen"]
        pop_cdf = self.arrays.get("pop_cdf")
        has_complement = self.arrays["seen"].complement is not None

        def epoch(params, opt_state, key, arrays):
            jkey, pkey, dkey = jax.random.split(key, 3)
            gus = arrays["g_user"]
            seen_full = arrays["seen_full"]
            if has_complement and pop_cdf is None:
                r = jax.random.randint(jkey, (g_pad, tc), 0,
                                       jnp.iinfo(jnp.int32).max,
                                       dtype=jnp.int32)
                idx = r % arrays["g_nun"][:, None]
                flat = seen_full.complement.reshape(-1)
                j = flat[gus[:, None] * seen_full.complement.shape[1] + idx]
            else:
                j = sampling._draw_negatives(jkey, seen_full, gus,
                                             item_nums, (g_pad, tc),
                                             pop_cdf)
            gt_all = jnp.where(arrays["g_y"] > 0, arrays["g_pos"], j)
            gt_all = jnp.where(arrays["g_w"] > 0, gt_all, item_nums)
            perm = jax.random.permutation(pkey, g_pad).reshape(steps,
                                                              g_per_step)
            dkeys = jax.random.split(dkey, steps)

            def step(carry, xs):
                params, opt_state = carry
                sel, dk = xs
                batch = {"gu": gus[sel], "gt": gt_all[sel],
                         "gy": arrays["g_y"][sel],
                         "gw": arrays["g_w"][sel], "dropout_key": dk}
                loss, grads = jax.value_and_grad(model.loss_grouped)(
                    params, batch, arrays)
                updates, opt_state = optimizer.update(grads, opt_state,
                                                      params)
                params = optax.apply_updates(params, updates)
                params = model.postprocess(params)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), (perm, dkeys))
            return params, opt_state, jnp.mean(losses)

        return jax.jit(epoch, donate_argnums=(0, 1)), steps

    def _build_pairwise_grouped_epoch(self):
        """User-GROUPED pairwise epoch for models whose per-row user
        representation is expensive and item-independent (SAMN's
        memory-attended friend vector): scan steps process G
        (user, pair-cell-chunk) groups — ``gu`` [G] users, ``gi``/``gj``
        [G, T] positives/negatives, ``gw`` [G, T] validity — so the user
        vector is computed (and its friend gradients scattered) ONCE per
        group instead of once per pair row.  Cell (g, t) is exactly one
        flat pairwise row: per-user positives are repeated neg_ratio
        times and a fresh negative is drawn per cell each epoch, the
        same totals as the flat protocol.  The model consumes groups via
        ``loss_grouped_pairwise``."""
        model = self.model
        optimizer = self.optimizer
        tc = model.TARGET_CHUNK
        item_nums = self.dd.item_nums
        lens = np.asarray(self.dd.seen.lens)
        nr = self.neg_ratio
        pos_u = np.asarray(self.arrays["pos_u"])
        pos_i = np.asarray(self.arrays["pos_i"])
        order = np.argsort(pos_u, kind="stable")
        su, si = pos_u[order], pos_i[order]
        users, starts = np.unique(su, return_index=True)
        bounds = np.append(starts, len(su))

        deg = np.diff(bounds)
        n_groups_u = -(-(deg * nr) // tc)
        g_total = int(n_groups_u.sum())
        g_per_step = max(self.batch_size // tc, 1)
        steps = cdiv(g_total, g_per_step)
        g_pad = steps * g_per_step

        # Vectorized grid fill (a per-user python loop cost ~65s at
        # Epinions scale): pair-cell i of user k lands at flat slot
        # group_slot_offset[k] + (i - cell_offset[k]).
        cells = deg * nr
        c_off = np.concatenate([[0], np.cumsum(cells)])
        slot_off = np.concatenate([[0], np.cumsum(n_groups_u * tc)])
        k_of_cell = np.repeat(np.arange(len(users)), cells)
        dest = (slot_off[k_of_cell]
                + (np.arange(int(cells.sum())) - c_off[k_of_cell]))
        flat_pos = np.full(g_pad * tc, item_nums, np.int32)
        flat_pos[dest] = np.repeat(si, nr)
        g_pos = flat_pos.reshape(g_pad, tc)
        flat_w = np.zeros(g_pad * tc, np.float32)
        flat_w[dest] = 1.0
        g_w = flat_w.reshape(g_pad, tc)
        gu_pad = np.zeros(g_pad, np.int32)
        gu_pad[:g_total] = np.repeat(users, n_groups_u)
        g_nun = np.maximum(item_nums - lens[gu_pad], 1).astype(np.int32)
        self.arrays["pg_user"] = jnp.asarray(gu_pad)
        self.arrays["pg_pos"] = jnp.asarray(g_pos)
        self.arrays["pg_w"] = jnp.asarray(g_w)
        self.arrays["pg_nun"] = jnp.asarray(g_nun)
        # Read the seen table through the arrays ARGUMENT, never a
        # closure capture: captured tables embed as HLO constants and a
        # GB-scale complement then rides the whole (remote) compile.
        pop_cdf = self.arrays.get("pop_cdf")
        has_complement = self.arrays["seen"].complement is not None
        if self.logger:
            self.logger.info(
                "grouped pairwise epoch: %d groups x %d cells, %d steps",
                g_total, tc, steps)

        def epoch(params, opt_state, key, arrays):
            jkey, pkey, dkey = jax.random.split(key, 3)
            gus = arrays["pg_user"]
            seen_full = arrays["seen"]
            if has_complement and pop_cdf is None:
                r = jax.random.randint(jkey, (g_pad, tc), 0,
                                       jnp.iinfo(jnp.int32).max,
                                       dtype=jnp.int32)
                idx = r % arrays["pg_nun"][:, None]
                flat = seen_full.complement.reshape(-1)
                j = flat[gus[:, None] * seen_full.complement.shape[1] + idx]
            else:
                j = sampling._draw_negatives(jkey, seen_full, gus,
                                             item_nums, (g_pad, tc),
                                             pop_cdf)
            j = jnp.where(arrays["pg_w"] > 0, j, item_nums)
            perm = jax.random.permutation(pkey, g_pad).reshape(steps,
                                                               g_per_step)
            dkeys = jax.random.split(dkey, steps)

            def step(carry, xs):
                params, opt_state = carry
                sel, dk = xs
                batch = {"gu": gus[sel], "gi": arrays["pg_pos"][sel],
                         "gj": j[sel], "gw": arrays["pg_w"][sel],
                         "dropout_key": dk}
                loss, grads = jax.value_and_grad(
                    model.loss_grouped_pairwise)(params, batch, arrays)
                updates, opt_state = optimizer.update(grads, opt_state,
                                                      params)
                params = optax.apply_updates(params, updates)
                params = model.postprocess(params)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), (perm, dkeys))
            return params, opt_state, jnp.mean(losses)

        self._epoch_body = epoch
        return jax.jit(epoch, donate_argnums=(0, 1))

    def _bucketed_epoch(self, params, opt_state, key):
        total = jnp.zeros(())
        steps_sum = 0
        for plan, bk in zip(self._bucket_plan,
                            jax.random.split(key, len(self._bucket_plan))):
            params, opt_state, loss = plan["fn"](params, opt_state, bk,
                                                 plan["arrays"])
            total = total + loss * plan["steps"]
            steps_sum += plan["steps"]
        return params, opt_state, total / steps_sum

    def _build_dual_epoch_fn(self):
        """Epoch over item-domain (u,i,j) AND social-domain (u,v,w) triples,
        both split into ``train_batches`` slices and consumed together."""
        steps = self.steps_per_epoch
        neg_ratio = self.neg_ratio
        item_nums = self.dd.item_nums
        user_nums = self.dd.user_nums
        model = self.model
        optimizer = self.optimizer
        m_i = self.n_pairs * neg_ratio
        n_social = int(len(self.arrays["sf_u"]))
        m_s = max(n_social * neg_ratio, 1)
        b_i = cdiv(m_i, steps)
        b_s = cdiv(m_s, steps)

        def epoch(params, opt_state, key, arrays):
            ki, ks, kbi, kbs, kd = jax.random.split(key, 5)
            perm_i, valid_i = sampling.epoch_permutation(ki, m_i, steps * b_i)
            perm_s, valid_s = sampling.epoch_permutation(ks, m_s, steps * b_s)
            batch_i = sampling.pairwise_batch(
                kbi, perm_i, valid_i, arrays["pos_u"], arrays["pos_i"],
                arrays["seen"], item_nums, neg_ratio,
                pop_cdf=arrays.get("pop_cdf"))
            batch_s = sampling.social_pairwise_batch(
                kbs, perm_s, valid_s, arrays["sf_u"], arrays["sf_v"],
                arrays["friends_tbl"], user_nums, neg_ratio)
            batch_all = {**batch_i, **batch_s}
            batches = jax.tree_util.tree_map(
                lambda x: x.reshape((steps, -1) + x.shape[1:]), batch_all)
            step_keys = jax.random.split(kd, steps)

            def step(carry, xs):
                params, opt_state = carry
                batch, dkey = xs
                batch = dict(batch)
                batch["dropout_key"] = dkey
                loss, grads = jax.value_and_grad(model.loss)(params, batch,
                                                             arrays)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), (batches, step_keys))
            return params, opt_state, jnp.mean(losses)

        return jax.jit(epoch, donate_argnums=(0, 1))

    # -- public API -------------------------------------------------------
    def init_state(self, seed: int | None = None):
        key = jax.random.PRNGKey(self.cfg.seed if seed is None else seed)
        ikey, self._loop_key = jax.random.split(key)
        params = self.model.init(ikey)
        # Warm start (NeuMF <- GMF/MLP, NAIS <- FISM) when configured.
        from cleverrec_tpu.train.checkpoint import apply_warm_start
        params = apply_warm_start(self.model.name, params, self.cfg)
        if self.mesh is not None:
            from cleverrec_tpu.parallel.sharding import shard_params
            params = shard_params(params, self.model.meta, self.mesh)
        opt_state = self.optimizer.init(params)
        return params, opt_state

    def compile(self, params=None, opt_state=None):
        """AOT-compile the hot programs (epoch fn + evaluator) before the
        first step — jit(...).lower(...).compile() so a run's compile cost
        is paid up-front (and hits the persistent compilation cache)
        instead of surprising the first epoch.  Returns (params,
        opt_state) (freshly initialized when not supplied)."""
        if params is None:
            params, opt_state = self.init_state()
        key = jax.random.PRNGKey(0)
        if getattr(self, "_bucket_plan", None):
            for plan in self._bucket_plan:
                plan["fn"].lower(params, opt_state, key,
                                 plan["arrays"]).compile()
        elif self._epoch_fn is not None:
            self._epoch_fn.lower(params, opt_state, key,
                                 self.arrays).compile()
        ev = self.evaluator
        ev._eval_fn.lower(params, self.arrays, ev._batches).compile()
        return params, opt_state

    def resume(self, path: str):
        """Resume a run from a full train-state checkpoint."""
        from cleverrec_tpu.train.checkpoint import load_checkpoint
        params = self.model.init(jax.random.PRNGKey(0))
        if self.mesh is not None:
            from cleverrec_tpu.parallel.sharding import shard_params
            params = shard_params(params, self.model.meta, self.mesh)
        opt_state = self.optimizer.init(params)
        template = {"params": params, "opt_state": opt_state,
                    "epoch": jnp.asarray(0),
                    "key": jax.random.PRNGKey(0)}
        state = load_checkpoint(path, template)
        self._loop_key = state["key"]
        return state["params"], state["opt_state"], int(state["epoch"])

    def train_epoch(self, params, opt_state):
        if self._pre_epoch_fn is not None:
            # e.g. SoHRML's attentive-adjacency refresh
            # (RankingRecommender.py:157-176, :403-405).
            self.arrays.update(self._pre_epoch_fn(params, self.arrays))
        self._loop_key, ekey = jax.random.split(self._loop_key)
        if getattr(self, "_bucket_plan", None):
            params, opt_state, loss = self._bucketed_epoch(params, opt_state,
                                                           ekey)
        else:
            params, opt_state, loss = self._epoch_fn(params, opt_state, ekey,
                                                     self.arrays)
        return params, opt_state, float(loss)

    def train_epochs(self, params, opt_state, n_epochs: int):
        """Run n epochs in device-side blocks (scan over epochs) —
        amortizes the per-dispatch latency when eval runs every
        test.interval > 1 epochs.  Blocks are split into POWER-OF-TWO
        sizes (<= 32) so the set of compiled multi-epoch programs is
        bounded regardless of irregular intervals/resume points (each
        whole-epoch-scan compile costs minutes on a cold cache).  Not
        available for models with a host-side pre-epoch hook.
        Returns (params, opt_state, losses[n]).
        """
        if self._pre_epoch_fn is not None or not hasattr(self, "_epoch_body"):
            losses = []
            for _ in range(n_epochs):
                params, opt_state, loss = self.train_epoch(params, opt_state)
                losses.append(loss)
            return params, opt_state, losses
        # train.max_epoch_block caps the scan-over-epochs program size;
        # 1 disables multi-epoch blocks entirely.  Escape hatch for
        # backends/catalogs where large scanned programs fault the TPU
        # worker (observed on the axon backend at a ~100k-item catalog:
        # 1-epoch programs run, a 2-epoch scan of the same body crashes
        # the worker process — benchmarks/catalog_scale.py).
        cap = self.cfg.int("train.max_epoch_block", 32)
        losses: list[float] = []
        remaining = n_epochs
        while remaining > 0:
            block = min(1 << (remaining.bit_length() - 1), max(cap, 1))
            params, opt_state, block_losses = self._train_block(
                params, opt_state, block)
            losses.extend(block_losses)
            remaining -= block
        return params, opt_state, losses

    def _train_block(self, params, opt_state, n_epochs: int):
        fn = self._multi_epoch_fns.get(n_epochs)
        if fn is None:
            body = self._epoch_body

            def multi(params, opt_state, key, arrays):
                keys = jax.random.split(key, n_epochs)

                def one(carry, k):
                    p, o = carry
                    p, o, loss = body(p, o, k, arrays)
                    return (p, o), loss

                (params, opt_state), losses = jax.lax.scan(
                    one, (params, opt_state), keys)
                return params, opt_state, losses

            fn = jax.jit(multi, donate_argnums=(0, 1))
            self._multi_epoch_fns[n_epochs] = fn
        self._loop_key, ekey = jax.random.split(self._loop_key)
        params, opt_state, losses = fn(params, opt_state, ekey, self.arrays)
        # ONE device->host fetch for the whole block (a per-element float()
        # loop costs a full transfer round trip PER epoch on tunneled
        # backends).
        return params, opt_state, np.asarray(losses).tolist()

    def evaluate(self, params):
        return self.evaluator.evaluate(params, self.arrays)

    def run(self, seed: int | None = None, resume_from: str | None = None):
        """Full train/eval loop with best-NDCG@topk[0] tracking
        (RankingRecommender.py:400-440).  With ``save.best=True`` the best
        epoch's train state is checkpointed under saved_dir/<model> (the
        reference's disabled save path, RankingRecommender.py:432-433,
        made functional)."""
        log = self.logger.info if self.logger else (lambda *a: None)
        start_epoch = 1
        if resume_from:
            params, opt_state, done = self.resume(resume_from)
            start_epoch = done + 1
            log("resumed from %s at epoch %d", resume_from, done)
        else:
            params, opt_state = self.init_state(seed)
        save_best = self.cfg.bool("save.best", False)
        save_dir = None
        if save_best:
            import os
            save_dir = os.path.join(self.cfg.str("saved_dir", "./saved_model"),
                                    self.model.name)
        topk = self.cfg.topk
        best = {"epoch": 0, "ndcg": 0.0, "metrics": {}}
        interval = self.cfg.test_interval
        epoch = start_epoch - 1
        while epoch < self.cfg.epoches:
            # Advance to the next eval point in ONE device call when the
            # model allows it (amortizes dispatch for test.interval > 1).
            next_eval = min(((epoch // interval) + 1) * interval,
                            self.cfg.epoches)
            block = next_eval - epoch
            t1 = time.time()
            # Optional profiler capture (SURVEY.md section 5.1 rebuild item):
            # set profile.dir to trace the SECOND block (first is compile).
            profile_dir = self.cfg.get("profile.dir")
            do_trace = profile_dir and epoch > 0 and not self._profiled
            if do_trace:
                import jax.profiler
                ctx = jax.profiler.trace(str(profile_dir))
                self._profiled = True
            else:
                ctx = None
            try:
                if ctx is not None:
                    ctx.__enter__()
                if block > 1:
                    params, opt_state, losses = self.train_epochs(
                        params, opt_state, block)
                    loss = losses[-1]
                else:
                    params, opt_state, loss = self.train_epoch(params,
                                                               opt_state)
            finally:
                if ctx is not None:
                    ctx.__exit__(None, None, None)
                    log("  profiler trace written to %s", profile_dir)
            epoch = next_eval
            log(" epoch %d\n  Training loss: %.4f, time: %.2fs (%d epochs)",
                epoch, loss, time.time() - t1, block)
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
                if save_dir:
                    from cleverrec_tpu.train.checkpoint import save_checkpoint
                    save_checkpoint(save_dir, params, opt_state, epoch,
                                    self._loop_key)
        log("best_epoch: %d", best["epoch"])
        for k in topk:
            if k in best["metrics"]:
                hr, mrr, ndcg = best["metrics"][k]
                log("  (k=%d) HR=%.4f, MRR=%.4f, NDCG=%.4f", k, hr, mrr, ndcg)
        self.params = params
        self.opt_state = opt_state
        return best
