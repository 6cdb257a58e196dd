"""Shared numerics: losses, initializers, optimizers, regularizers.

Behavioral parity targets (reference: utils/tools.py:51-87):
- losses are *sums* over the batch (the reference uses ``reduce_sum``),
- ``l2_loss(x) = 0.5 * sum(x**2)`` like ``tf.nn.l2_loss``,
- initializer/optimizer factories accept the same names.

All loss helpers take an optional per-row ``weight`` so padded rows in our
fixed-shape device batches contribute exactly zero loss and gradient (the
reference's variable-size final batch needs no padding because each batch is
a fresh ``sess.run``; on TPU we keep shapes static instead).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

Array = jax.Array


# -- losses ---------------------------------------------------------------

def l2_loss(x: Array) -> Array:
    """0.5 * sum(x^2) — matches tf.nn.l2_loss used throughout the reference."""
    return 0.5 * jnp.sum(jnp.square(x))


def bpr_loss(diff: Array, weight: Array | None = None) -> Array:
    """sum(-log sigmoid(diff)); reference 'bpr' (utils/tools.py:71-72)."""
    per_row = -jax.nn.log_sigmoid(diff)
    if weight is not None:
        per_row = per_row * weight
    return jnp.sum(per_row)


def hinge_loss(diff: Array, margin: float, weight: Array | None = None) -> Array:
    """sum(max(diff + margin, 0)); reference 'hinge' (utils/tools.py:73-74)."""
    per_row = jnp.maximum(diff + margin, 0.0)
    if weight is not None:
        per_row = per_row * weight
    return jnp.sum(per_row)


def sigmoid_xent_loss(labels: Array, logits: Array,
                      weight: Array | None = None) -> Array:
    """sum of sigmoid cross-entropy; reference 'cross_entropy'
    (utils/tools.py:69-70).  Uses the numerically-stable form
    max(x,0) - x*z + log1p(exp(-|x|)), identical to
    tf.nn.sigmoid_cross_entropy_with_logits."""
    x, z = logits, labels
    per_row = jnp.maximum(x, 0.0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))
    if weight is not None:
        per_row = per_row * weight
    return jnp.sum(per_row)


def square_loss(labels: Array, logits: Array,
                weight: Array | None = None) -> Array:
    """sum((y - y_pre)^2); reference 'square' (utils/tools.py:75-76)."""
    per_row = jnp.square(labels - logits)
    if weight is not None:
        per_row = per_row * weight
    return jnp.sum(per_row)


def pairwise_loss(loss_func: str, diff: Array, *, margin: float = 0.0,
                  weight: Array | None = None) -> Array:
    """Dispatch for pairwise losses applied to a score difference."""
    if loss_func == "bpr":
        return bpr_loss(diff, weight)
    if loss_func == "hinge":
        return hinge_loss(diff, margin, weight)
    raise ValueError(f"unsupported pairwise loss {loss_func!r}")


# -- initializers ---------------------------------------------------------

def make_initializer(init_method: str, stddev: float) -> Callable:
    """Name-compatible with the reference factory (utils/tools.py:51-63),
    plus 'he' for the alias table.  Returns f(key, shape) -> Array."""
    if init_method == "normal":
        return lambda key, shape: stddev * jax.random.normal(key, shape)
    if init_method == "tnormal":
        return lambda key, shape: stddev * jax.random.truncated_normal(
            key, -2.0, 2.0, shape)
    if init_method == "uniform":
        return lambda key, shape: jax.random.uniform(
            key, shape, minval=-stddev, maxval=stddev)
    if init_method == "xavier":
        return jax.nn.initializers.glorot_uniform()
    if init_method == "xavier_normal":
        return jax.nn.initializers.glorot_normal()
    if init_method == "he":
        return jax.nn.initializers.he_uniform()
    raise ValueError(f"unknown init_method {init_method!r}")


def init_param(key, init, shape, dtype=jnp.float32) -> Array:
    """Apply an initializer; glorot-style inits need >=2D shapes, so 1D
    params (bias/output vectors, used widely by the reference) are
    initialized via a (1, n) draw."""
    if len(shape) == 1:
        return init(key, (1, shape[0])).reshape(shape).astype(dtype)
    return init(key, shape).astype(dtype)


# -- optimizers -----------------------------------------------------------

def make_optimizer(name: str, lr: float) -> optax.GradientTransformation:
    """SGD / Adam / Adagrad with TF1-default hyperparameters
    (reference factory: utils/tools.py:79-87)."""
    if name == "SGD":
        return optax.sgd(lr)
    if name == "Adam":
        return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    if name == "Adagrad":
        # tf.train.AdagradOptimizer's initial_accumulator_value default is 0.1.
        return optax.adagrad(lr, initial_accumulator_value=0.1)
    raise ValueError(f"unknown optimizer {name!r}")


# -- misc -----------------------------------------------------------------

def clip_rows_by_norm(x: Array, max_norm: float = 1.0) -> Array:
    """Row-wise norm clipping, matching tf.clip_by_norm(..., axes=[1]) used
    by the metric-learning models (CML.py:72-78)."""
    norms = jnp.linalg.norm(x, axis=-1, keepdims=True)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norms, 1e-12))
    return x * scale


def cdiv(a: int, b: int) -> int:
    return -(-a // b)
