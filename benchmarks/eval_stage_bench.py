"""On-chip stage-marginal breakdown of the group-pruned fused eval path
(ranking.rank_fused) at the 319k-catalog shape — synthetic tables, no
dataset needed.

MEASUREMENT PROTOCOL (round 5): every stage is timed as a CHAINED
computation — each iteration's input derives from the previous
iteration's output — because the experimental axon runtime (a) MEMOIZES
identical executions (a same-args loop once reported the 4 ms kernel as
0.04 ms) and (b) overlaps independent dispatches (even distinct-input
loops under-report).  Chains measure true serialized device time.

Usage: python benchmarks/eval_stage_bench.py [items] [batch]
"""

from __future__ import annotations

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
    ku, kq, kb = jax.random.split(key, 3)
    params = {"uv": jax.random.normal(ku, (un, d), jnp.float32),
              "Q": jax.random.normal(kq, (i_real, d), jnp.float32),
              "bias": jax.random.normal(kb, (i_real,)) * 0.01}
    words = (i_real + 31) // 32
    bits = jnp.zeros((b, words), jnp.uint32)
    model = _Stub(i_real)

    import functools

    from cleverrec_tpu import ranking
    from cleverrec_tpu.ops.pallas_scores import COMB_I, fused_dot_gmax
    from cleverrec_tpu.ops.topk import grouped_topk

    pre = jax.jit(ranking.fused_precompute, static_argnames=("model",))(
        model=model, params=params, aux={})
    q_perm, bias_perm, item_map, q_pad, bias_pad = pre
    UV = params["uv"]

    def bench(step):
        """step(u [b]) -> next u (chained); returns marginal ms/call."""
        f = jax.jit(step)
        u0 = jnp.arange(b, dtype=jnp.int32)
        jax.block_until_ready(f(f(u0)))

        def chain(n):
            u = u0 + 3
            t0 = time.perf_counter()
            for _ in range(n):
                u = f(u)
            np.asarray(u[:1])
            return time.perf_counter() - t0

        t1 = min(chain(1) for _ in range(3))
        t9 = min(chain(9) for _ in range(3))
        return (t9 - t1) / 8 * 1e3

    def kern(u):
        uv = UV[u]
        g = fused_dot_gmax(uv, q_perm, bits, item_nums=i_real,
                           bias_perm=bias_perm)
        return (u + g[:, 0].astype(jnp.int32) % 3 + 1) % un

    def plus_topk(u):
        uv = UV[u]
        g = fused_dot_gmax(uv, q_perm, bits, item_nums=i_real,
                           bias_perm=bias_perm)
        _, gi = grouped_topk(g, k, min_cols=4096)
        return (u + gi[:, 0] % 3 + 1) % un

    g_total = item_map.shape[0] // COMB_I

    def plus_rescue(u):
        uv = UV[u]
        g = fused_dot_gmax(uv, q_perm, bits, item_nums=i_real,
                           bias_perm=bias_perm)
        _, gi = grouped_topk(g, k, min_cols=4096)
        qc = q_pad.reshape(g_total, COMB_I, d)[gi]
        cand = jax.lax.dot_general(qc, uv, (((3,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32)
        return (u + cand[:, 0, 0].astype(jnp.int32) % 3 + 1) % un

    full = jax.jit(functools.partial(ranking.rank_fused, model, k=k))

    def full_fn(u):
        v, ids = ranking.rank_fused(model, params, {}, u, bits, k,
                                    pre=pre)
        return (u + ids[:, 0] % 3 + 1) % un

    s1 = bench(kern)
    s2 = bench(plus_topk)
    s3 = bench(plus_rescue)
    s4 = bench(full_fn)
    rec = {"items": i_real, "batch": b, "d": d, "k": k,
           "protocol": "chained",
           "gmax_kernel_ms": round(s1, 2),
           "plus_group_topk_ms": round(s2, 2),
           "plus_slab_rescue_ms": round(s3, 2),
           "full_rank_fused_ms": round(s4, 2),
           "users_per_s": round(b / s4 * 1e3, 1)}
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
