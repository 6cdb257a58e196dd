"""On-chip stage-marginal breakdown of the group-pruned fused eval path
(ranking.rank_fused) at the 319k-catalog shape — synthetic tables, no
dataset needed.  Times each pipeline stage cumulatively so the marginal
cost of every stage is visible.

Usage: python benchmarks/eval_stage_bench.py [items] [batch]
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

from cleverrec_tpu.utils.logging import enable_compilation_cache  # noqa: E402


def timed(fn, *a, n=10):
    """fn(uv, ...) is re-invoked with a slightly nudged first arg each
    iteration: the experimental axon runtime MEMOIZES identical
    executions, so a same-args loop can time cache hits (this script
    once reported a 4 ms kernel as 0.04 ms).  The nudge is numerically
    invisible; timings remain marginal device+dispatch costs."""
    uv, rest = a[0], a[1:]
    out = fn(uv, *rest)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(uv + (i + 1) * 1e-12, *rest)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


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
    u = jnp.arange(b, dtype=jnp.int32)
    words = (i_real + 31) // 32
    bits = jnp.zeros((b, words), jnp.uint32)
    model = _Stub(i_real)

    from cleverrec_tpu import ranking
    from cleverrec_tpu.ops.pallas_scores import GROUP_I, fused_dot_gmax
    from cleverrec_tpu.ops.topk import grouped_topk

    pre = jax.jit(ranking.fused_precompute, static_argnames=("model",))(
        model=model, params=params, aux={})
    q_perm, bias_perm, item_map = pre

    uv = params["uv"][:b]

    full = jax.jit(functools.partial(ranking.rank_fused, model, k=k),
                   static_argnames=())

    def full_once(uv_nudge, *_):
        # Isolate the pure 1e-12-scale nudge (uv_nudge = uv + i*1e-12).
        p2 = {**params, "uv": params["uv"] + (uv_nudge[0, 0] - uv[0, 0])}
        return full(p2, {}, u, bits, pre=pre)

    full_ms = timed(full_once, uv)

    s1 = jax.jit(lambda uv, q, sb, bp: fused_dot_gmax(
        uv, q, sb, item_nums=i_real, bias_perm=bp))
    s1_ms = timed(s1, uv, q_perm, bits, bias_perm)

    s2 = jax.jit(lambda uv, q, sb, bp: grouped_topk(
        fused_dot_gmax(uv, q, sb, item_nums=i_real, bias_perm=bp),
        k, min_cols=4096)[1])
    s2_ms = timed(s2, uv, q_perm, bits, bias_perm)

    def to_cols(gi):
        gflat = (gi // 128) * 32 + jnp.minimum(gi % 128, 31)
        return (gflat[:, :, None] * GROUP_I
                + jax.lax.broadcasted_iota(jnp.int32, (b, k, GROUP_I), 2))

    s3 = jax.jit(lambda uv, q, sb, bp: q_perm[to_cols(grouped_topk(
        fused_dot_gmax(uv, q, sb, item_nums=i_real, bias_perm=bp),
        k, min_cols=4096)[1])].sum())
    s3_ms = timed(s3, uv, q_perm, bits, bias_perm)

    def through_cand(uv, q, sb, bp):
        gi = grouped_topk(fused_dot_gmax(uv, q, sb, item_nums=i_real,
                                         bias_perm=bp), k,
                          min_cols=4096)[1]
        cols = to_cols(gi)
        qc = q[cols]
        cand = jax.lax.dot_general(
            qc, uv, (((3,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return cand.sum()

    s4_ms = timed(jax.jit(through_cand), uv, q_perm, bits, bias_perm)

    rec = {"items": i_real, "batch": b, "d": d, "k": k,
           "full_ms": round(full_ms, 2),
           "gmax_kernel_ms": round(s1_ms, 2),
           "plus_group_topk_ms": round(s2_ms, 2),
           "plus_col_gather_ms": round(s3_ms, 2),
           "plus_cand_dot_ms": round(s4_ms, 2),
           "users_per_s": round(b / full_ms * 1e3, 1)}
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
