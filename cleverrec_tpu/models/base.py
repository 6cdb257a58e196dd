"""Functional model interface.

The reference's model↔trainer contract is attribute-naming convention on a
TF1 graph (SURVEY.md section 1, L3).  Here a model is a small *stateless*
object exposing pure functions over an explicit params pytree:

- ``init(key) -> params``
- ``loss(params, batch, aux) -> scalar``        (summed, weight-masked)
- ``score_pairs(params, u, i, aux) -> [B]``     (candidate-protocol unit)
- ``score_all(params, u, aux) -> [B, I]``       (full-catalog protocol)
- ``score_candidates(params, u, cand, aux)``    (default: flattened pairs)
- ``postprocess(params) -> params``             (e.g. CML unit clipping)

``aux`` is a dict of device arrays built once per run from the dataset
(neighbor tables, friend pads, sparse-graph indices); it is passed through
jit as runtime arrays, never baked into the HLO.

``sampler`` names the batch protocol the trainer drives (the analog of the
reference's per-model ``train_model_*`` loops, RankingRecommender.py:33-195).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from cleverrec_tpu.common import make_initializer
from cleverrec_tpu.config import Config

Array = jax.Array
Params = Dict[str, Any]
Aux = Dict[str, Array]

NEG_INF = jnp.asarray(-1e30, dtype=jnp.float32)


@dataclass(frozen=True)
class DataMeta:
    user_nums: int
    item_nums: int


class RecModel:
    """Base ranking model. Subclasses set ``sampler`` / ``cml_like`` and
    implement init/loss/score."""

    name: str = "base"
    sampler: str = "pairwise"      # pairwise|pointwise|cml|sbpr|samn|dual
    cml_like: bool = False         # distance model: lower score = better

    def __init__(self, cfg: Config, meta: DataMeta):
        self.cfg = cfg
        self.meta = meta
        self.loss_func = cfg.loss_func
        self.initializer = make_initializer(cfg.init_method, cfg.stddev)

    # -- to implement ----------------------------------------------------
    def init(self, key: Array) -> Params:
        raise NotImplementedError

    def loss(self, params: Params, batch: Dict[str, Array], aux: Aux) -> Array:
        raise NotImplementedError

    def score_pairs(self, params: Params, u: Array, i: Array, aux: Aux) -> Array:
        raise NotImplementedError

    # -- optional overrides ----------------------------------------------
    def build_aux(self, device_data, data) -> dict[str, np.ndarray]:
        """Static per-run device arrays (neighbor tables etc.)."""
        return {}

    def epoch_pairs(self, device_data) -> tuple[np.ndarray, np.ndarray]:
        """The (u, i) positive pairs that define one epoch.  SBPR-family
        models restrict this to users with social positives."""
        return device_data.pos_u, device_data.pos_i

    def postprocess(self, params: Params) -> Params:
        return params

    def score_candidates(self, params: Params, u: Array, cand: Array,
                         aux: Aux) -> Array:
        """[B, C] scores for per-user candidate lists.  Default flattens to
        pair scoring; models with an expensive user tower override this."""
        b, c = cand.shape
        u_flat = jnp.repeat(u, c)
        s = self.score_pairs(params, u_flat, cand.reshape(-1), aux)
        return s.reshape(b, c)

    # Catalog chunk width for the default score_all; models whose pair
    # scorer is memory-hungry (history attention) shrink this.
    SCORE_ALL_CHUNK = 2048

    def score_all(self, params: Params, u: Array, aux: Aux) -> Array:
        """[B, I] full-catalog scores.  Default: chunked candidate scoring
        (models with a matmul-friendly form override with an MXU path)."""
        item_nums = self.meta.item_nums
        chunk = self.SCORE_ALL_CHUNK
        n_chunks = -(-item_nums // chunk)
        padded = n_chunks * chunk
        items = jnp.arange(padded, dtype=jnp.int32) % item_nums
        items = items.reshape(n_chunks, chunk)

        def one(chunk_items):
            cand = jnp.broadcast_to(chunk_items[None, :], (u.shape[0], chunk))
            return self.score_candidates(params, u, cand, aux)

        scores = jax.lax.map(one, items)                 # [n_chunks, B, chunk]
        scores = jnp.moveaxis(scores, 0, 1).reshape(u.shape[0], padded)
        return scores[:, :item_nums]

    # -- shared helpers --------------------------------------------------
    def _embed_tables(self, key: Array, *shapes) -> list[Array]:
        keys = jax.random.split(key, len(shapes))
        from cleverrec_tpu.common import init_param
        return [init_param(k, self.initializer, s) for k, s in zip(keys, shapes)]
