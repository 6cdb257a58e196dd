"""Rating-prediction pipeline: the FM model and its trainer.

Math parity with the reference:
- FM (model/rating/FM.py:26-56): y_pre = w0 + sum_i w_i x_i +
  0.5 * sum_f [(sum_i x_i v_if)^2 - sum_i (x_i v_if)^2]; square loss
  (summed) + reg * (l2(wi) + l2(vif)) over the FULL tables; padded
  feature slots contribute zero via x_val = 0.
- Trainer (model/RatingRecommender.py:26-105): shuffle + batch epochs,
  training RMSE computed from the predictions gathered DURING the epoch
  (parameters moving — reproduced), per-epoch test RMSE/MAE, best-RMSE
  tracking.  On TPU one epoch is a single scanned program.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cleverrec_tpu.common import cdiv, init_param, l2_loss, make_initializer, make_optimizer
from cleverrec_tpu.config import Config
from cleverrec_tpu.data.libfm import RatingData, load_rating_data
from cleverrec_tpu.metrics import rmse_mae


class FM:
    name = "FM"

    def __init__(self, cfg: Config, feature_nums: int):
        cfg.require("embed_size", "reg")
        self.cfg = cfg
        self.embed_size = cfg.int("embed_size")
        self.reg = cfg.float("reg")
        self.feature_nums = feature_nums
        self.initializer = make_initializer(cfg.init_method, cfg.stddev)

    def _table_rows(self) -> int:
        """feature_nums + 1 pad row, rounded up to a multiple of 8 so the
        tables row-shard over small mesh 'model' axes; extra rows are
        zero and never addressed (x_idx <= feature_nums)."""
        f = self.feature_nums + 1
        return ((f + 7) // 8) * 8

    def init(self, key):
        k1, k2 = jax.random.split(key)
        f = self._table_rows()
        live = self.feature_nums + 1
        wi = init_param(k1, self.initializer, (f,)).at[live:].set(0.0)
        vif = init_param(k2, self.initializer,
                         (f, self.embed_size)).at[live:].set(0.0)
        return {"w0": jnp.zeros(()), "wi": wi, "vif": vif}

    def predict(self, params, x_idx, x_val):
        wi = params["wi"][x_idx] * x_val                     # [B, F]
        v = params["vif"][x_idx] * x_val[:, :, None]         # [B, F, d]
        sum_sq = jnp.square(jnp.sum(v, axis=1))              # [B, d]
        sq_sum = jnp.sum(jnp.square(v), axis=1)              # [B, d]
        y2 = jnp.sum(sum_sq - sq_sum, axis=1)
        return params["w0"] + jnp.sum(wi, axis=1) + 0.5 * y2

    def loss(self, params, x_idx, x_val, y, w):
        y_pre = self.predict(params, x_idx, x_val)
        main = jnp.sum(jnp.square(y - y_pre) * w)
        return (main + self.reg * (l2_loss(params["wi"])
                                   + l2_loss(params["vif"])), y_pre)


class FFM(FM):
    """Field-aware Factorization Machine (Juan et al., RecSys'16).

    The reference's FFM.py is truncated after its parameter block and
    never defines inference or training (SURVEY.md section 2.2) — this is
    the working model its name promises.  Each feature owns one latent
    vector PER FIELD; with libFM input the field of a column is its
    position: y = w0 + sum_i w_i x_i +
    sum_{a<b} <v[x_a, field_b], v[x_b, field_a]> x_a x_b.
    """

    name = "FFM"

    def __init__(self, cfg: Config, feature_nums: int, n_fields: int):
        super().__init__(cfg, feature_nums)
        self.n_fields = n_fields

    def init(self, key):
        k1, k2 = jax.random.split(key)
        f = self._table_rows()
        live = self.feature_nums + 1
        wi = init_param(k1, self.initializer, (f,)).at[live:].set(0.0)
        vif = self.initializer(
            k2, (f, self.n_fields * self.embed_size)).reshape(
                f, self.n_fields, self.embed_size).at[live:].set(0.0)
        return {"w0": jnp.zeros(()), "wi": wi, "vif": vif}

    def predict(self, params, x_idx, x_val):
        wi = params["wi"][x_idx] * x_val                   # [B, F]
        out = params["w0"] + jnp.sum(wi, axis=1)
        nf_pos = x_idx.shape[1]
        # Each feature's vectors scaled by its value once; pair terms then
        # carry x_a * x_b automatically.
        v = params["vif"][x_idx] * x_val[:, :, None, None]  # [B,F,fields,d]
        # libFM input: a column's field is its position, clamped to the
        # last field.  Grouping positions by field with a static one-hot
        # turns the O(F^2) Python pair loop into one MXU contraction:
        #   sum_{a<b} <v_a[f(b)], v_b[f(a)]>
        #     = (sum_{g,h} <T[g,h], T[h,g]> - sum_a |v_a[f(a)]|^2) / 2
        # where T[g,h] = sum_{a: f(a)=g} v_a[h].  HLO cost grows O(F),
        # not O(F^2) (tests/test_rating.py pins this against the pair
        # loop on a toy batch).
        f_pos = np.minimum(np.arange(nf_pos), self.n_fields - 1)
        onehot = jnp.asarray(np.eye(self.n_fields, dtype=np.float32)[f_pos])
        t = jnp.einsum("ag,bahd->bghd", onehot, v)
        full = jnp.einsum("bghd,bhgd->b", t, t)
        v_diag = v[:, jnp.arange(nf_pos), jnp.asarray(f_pos), :]  # [B,F,d]
        diag = jnp.sum(v_diag * v_diag, axis=(1, 2))
        return out + 0.5 * (full - diag)


_RATING_MODELS = {"FM": FM, "FFM": FFM}


class FMTrainer:
    def __init__(self, model: FM, data: RatingData, cfg: Config, logger=None,
                 mesh=None):
        self.model = model
        self.data = data
        self.cfg = cfg
        self.logger = logger
        self.mesh = mesh  # ('data','model') Mesh: dp batches + row-sharded
        self.optimizer = make_optimizer(cfg.optimizer, cfg.lr)
        self.batch_size = cfg.batch_size
        n = len(data.y_tr)
        self.steps = cdiv(n, self.batch_size)
        self._n = n
        self._xi = jnp.asarray(data.x_idx_tr)
        self._xv = jnp.asarray(data.x_val_tr)
        self._y = jnp.asarray(data.y_tr)
        self._epoch = self._build_epoch()
        self._predict = jax.jit(model.predict)

    def _build_epoch(self):
        b = self.batch_size
        steps = self.steps
        n = self._n
        padded = steps * b
        model = self.model
        optimizer = self.optimizer
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            def constrain(x):
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(self.mesh,
                                     P(*(("data",) + (None,) * (x.ndim - 1)))))
        else:
            constrain = lambda x: x  # noqa: E731

        def epoch(params, opt_state, key, xi, xv, y):
            perm = jax.random.permutation(key, padded)
            valid = (perm < n).astype(jnp.float32)   # padding rows weight 0
            rows_all = jnp.minimum(perm, n - 1)
            order = rows_all.reshape(steps, b)
            w = valid.reshape(steps, b)

            def step(carry, xs):
                params, opt_state = carry
                rows, wt = xs
                xib = constrain(xi[rows])
                xvb = constrain(xv[rows])
                yb = constrain(y[rows])
                (loss, y_pre), grads = jax.value_and_grad(
                    lambda p: model.loss(p, xib, xvb, yb, wt),
                    has_aux=True)(params)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), (loss, y_pre)

            (params, opt_state), (losses, y_pres) = jax.lax.scan(
                step, (params, opt_state), (order, w))
            return params, opt_state, jnp.mean(losses), order, w, y_pres

        return jax.jit(epoch, donate_argnums=(0, 1))

    def run(self, seed: int | None = None):
        log = self.logger.info if self.logger else (lambda *a: None)
        key = jax.random.PRNGKey(self.cfg.seed if seed is None else seed)
        ikey, loop_key = jax.random.split(key)
        params = self.model.init(ikey)
        if self.mesh is not None:
            # Feature tables row-sharded over 'model' (when divisible),
            # scalars replicated — same GSPMD tier as the ranking Trainer.
            from jax.sharding import NamedSharding, PartitionSpec as P
            n_model = self.mesh.shape["model"]

            def place(x):
                if x.ndim >= 1 and x.shape[0] % n_model == 0:
                    spec = P(*(("model",) + (None,) * (x.ndim - 1)))
                else:
                    spec = P()
                return jax.device_put(x, NamedSharding(self.mesh, spec))

            params = jax.tree_util.tree_map(place, params)
        opt_state = self.optimizer.init(params)
        best = {"rmse": float("inf"), "mae": None, "epoch": 0}
        for epoch in range(1, self.cfg.epoches + 1):
            t1 = time.time()
            loop_key, ekey = jax.random.split(loop_key)
            params, opt_state, loss, order, w, y_pres = self._epoch(
                params, opt_state, ekey, self._xi, self._xv, self._y)
            # Training RMSE from in-flight predictions (reference quirk,
            # RatingRecommender.py:47-54).
            order_np = np.asarray(order).reshape(-1)
            keep = np.asarray(w).reshape(-1) > 0
            y_pre_np = np.asarray(y_pres).reshape(-1)[keep]
            y_np = self.data.y_tr[order_np[keep]]
            rmse_tr, mae_tr = rmse_mae(y_np, y_pre_np)
            log(" Training epoch %d\n time=%.2fs, RMSE=%.4f, MAE=%.4f",
                epoch, time.time() - t1, rmse_tr, mae_tr)
            rmse_t, mae_t = self.test(params)
            log("  Testing RMSE=%.4f, MAE=%.4f", rmse_t, mae_t)
            if rmse_t < best["rmse"]:
                best = {"rmse": rmse_t, "mae": mae_t, "epoch": epoch}
        log("best_epoch=%d, best_rmse=%.4f, best_mae=%.4f",
            best["epoch"], best["rmse"], best["mae"])
        self.params = params
        return best

    def test(self, params):
        bt = self.cfg.test_batch_size
        preds = []
        n = len(self.data.y_t)
        for s in range(0, n, bt):
            xi = jnp.asarray(self.data.x_idx_t[s: s + bt])
            xv = jnp.asarray(self.data.x_val_t[s: s + bt])
            preds.append(np.asarray(self._predict(params, xi, xv)))
        y_pre = np.concatenate(preds) if preds else np.zeros(0)
        return rmse_mae(self.data.y_t, y_pre)


def make_rating_model(cfg: Config, data):
    """Build the configured rating model from the registry (FFM needs
    the field count from the loaded data)."""
    name = cfg.recommender
    if name not in _RATING_MODELS:
        raise KeyError(f"unknown rating model {name!r}; "
                       f"available: {sorted(_RATING_MODELS)}")
    cls = _RATING_MODELS[name]
    if name == "FFM":
        return cls(cfg, data.feature_nums, n_fields=data.x_idx_tr.shape[1])
    return cls(cfg, data.feature_nums)


def run_rating(cfg: Config, logger=None, mesh=None):
    data = load_rating_data(cfg)
    model = make_rating_model(cfg, data)
    trainer = FMTrainer(model, data, cfg, logger=logger, mesh=mesh)
    return trainer.run()
