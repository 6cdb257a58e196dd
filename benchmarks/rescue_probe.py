"""On-chip A/B for the comb-group rescue of the group-pruned eval path
(ranking.rank_fused) at the 319k-catalog shape: exact f32 rescue slabs
vs the bf16 rescue copy (fused_precompute(rescue_bf16=True) — the
serving approx mode).

HISTORY (round 5, this probe's pre-integration run — chained protocol,
[1024 x 319271] d=64 k=20, v5e):

  128-wide permuted-column groups, f32 slabs (then-production): 4.89 ms
  128-wide groups, bf16 slabs:                    5.87 ms (SLOWER, and
     inexact: the [B, k, 128, d] bf16 gather lowers worse)
  32-item COMB groups, f32 slabs:                 3.57 ms  (1.37x)
  32-item COMB groups, bf16 slabs:                1.75 ms  (2.8x, bf16
     -rounded scores: ~90% top-20 id agreement)

The comb f32 form became production (pallas_scores._kernel_gmax_only +
ranking.rank_fused); the comb bf16 form is the opt-in serving approx
mode this probe now measures against it.

Usage: python benchmarks/rescue_probe.py [items] [batch]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cleverrec_tpu.utils.logging import enable_compilation_cache  # noqa: E402


class _Stub:
    cml_like = False

    def __init__(self, i_real):
        self.meta = type("M", (), {"item_nums": i_real})()

    def dot_decomposition(self, params, u, aux):
        return params["uv"][u], params["Q"], params["bias"]


def main():
    enable_compilation_cache()
    i_real = int(sys.argv[1]) if len(sys.argv) > 1 else 319271
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    d, k, un = 64, 20, 49152
    key = jax.random.PRNGKey(0)
    ku, kq, kb, ks = jax.random.split(key, 4)
    params = {"uv": jax.random.normal(ku, (un, d), jnp.float32),
              "Q": jax.random.normal(kq, (i_real, d), jnp.float32),
              "bias": jax.random.normal(kb, (i_real,)) * 0.01}
    words = (i_real + 31) // 32
    # real (sparse, ~50 seen items/user) bitmaps for the exactness arm
    seen_items = jax.random.randint(ks, (b, 50), 0, i_real)
    bits_np = np.zeros((b, words), np.uint32)
    si = np.asarray(seen_items)
    np.bitwise_or.at(bits_np, (np.arange(b)[:, None], si // 32),
                     np.uint32(1) << (si % 32).astype(np.uint32))
    bits_real = jnp.asarray(bits_np)
    bits0 = jnp.zeros((b, words), jnp.uint32)
    model = _Stub(i_real)

    from cleverrec_tpu import ranking
    pre = jax.jit(ranking.fused_precompute, static_argnames=("model",))(
        model=model, params=params, aux={})
    pre_bf16 = jax.jit(ranking.fused_precompute,
                       static_argnames=("model", "rescue_bf16"))(
        model=model, params=params, aux={}, rescue_bf16=True)
    u_small = jnp.arange(256, dtype=jnp.int32)

    # ---- bf16 agreement vs the exact path on REAL seen bits
    rf = jax.jit(functools.partial(ranking.rank_fused, model, k=k))
    v0, i0 = rf(params, {}, u_small, bits_real[:256], pre=pre)
    v1, i1 = rf(params, {}, u_small, bits_real[:256], pre=pre_bf16)
    ex = {"ids_match": round(float(jnp.mean((i1 == i0).astype(
              jnp.float32))), 6),
          "max_val_diff": round(float(jnp.max(jnp.abs(jnp.nan_to_num(
              v1 - v0, posinf=0.0, neginf=0.0)))), 6)}

    # ---- chained timings (zero bits — matches eval_stage_bench shapes)
    def bench(step):
        f = jax.jit(step)
        u0 = jnp.arange(b, dtype=jnp.int32)
        jax.block_until_ready(f(f(u0)))

        def chain(nn):
            u = u0 + 3
            t0 = time.perf_counter()
            for _ in range(nn):
                u = f(u)
            np.asarray(u[:1])
            return time.perf_counter() - t0

        t1 = min(chain(1) for _ in range(3))
        t9 = min(chain(9) for _ in range(3))
        return (t9 - t1) / 8 * 1e3

    def exact_fn(u):
        _, ids = ranking.rank_fused(model, params, {}, u, bits0, k,
                                    pre=pre)
        return (u + ids[:, 0] % 3 + 1) % un

    def bf16_fn(u):
        _, ids = ranking.rank_fused(model, params, {}, u, bits0, k,
                                    pre=pre_bf16)
        return (u + ids[:, 0] % 3 + 1) % un

    rec = {"items": i_real, "batch": b, "d": d, "k": k,
           "protocol": "chained", "bf16_vs_exact": ex,
           "exact_ms": round(bench(exact_fn), 2),
           "bf16_ms": round(bench(bf16_fn), 2)}
    for name in ("exact", "bf16"):
        rec[f"{name}_users_per_s"] = round(b / rec[f"{name}_ms"] * 1e3, 1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
