"""Micro A/B of the comb rescue's gather+dot lowering at the 319k
shape (chained protocol).  The production form gathers (1, 32, d)
slices of a [G, 32, d] view; candidates:

  nested : q.reshape(G, 32, d)[gi]               (production round 5)
  flat   : q.reshape(G, 32*d)[gi] -> reshape     (one 8KB row per slab)
  flatvpu: flat gather, dot as multiply+sum      (VPU, no batched matvec)

Usage: python benchmarks/slab_form_probe.py [items] [batch]
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


def main():
    enable_compilation_cache()
    i_real = int(sys.argv[1]) if len(sys.argv) > 1 else 319271
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    d, k = 64, 20
    n = i_real + ((-i_real) % 4096)
    g = n // 32
    key = jax.random.PRNGKey(0)
    kq, ku = jax.random.split(key)
    q_pad = jax.random.normal(kq, (n, d), jnp.float32)
    uv = jax.random.normal(ku, (b, d), jnp.float32)
    q3 = q_pad.reshape(g, 32, d)
    q2 = q_pad.reshape(g, 32 * d)

    def bench(step):
        f = jax.jit(step)
        g0 = (jnp.arange(b * k, dtype=jnp.int32) % g).reshape(b, k)
        jax.block_until_ready(f(f(g0)))

        def chain(nn):
            x = (g0 + 7) % g
            t0 = time.perf_counter()
            for _ in range(nn):
                x = f(x)
            np.asarray(x[:1, :1])
            return time.perf_counter() - t0

        t1 = min(chain(1) for _ in range(3))
        t9 = min(chain(9) for _ in range(3))
        return (t9 - t1) / 8 * 1e3

    def nested(gi):
        qc = q3[gi]                                        # [B, k, 32, d]
        cand = jax.lax.dot_general(
            qc, uv, (((3,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        m = jnp.max(cand.reshape(b, k * 32), axis=1)
        return (gi + m.astype(jnp.int32)[:, None] % 3 + 1) % g

    def flat(gi):
        qc = q2[gi].reshape(b, k, 32, d)
        cand = jax.lax.dot_general(
            qc, uv, (((3,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        m = jnp.max(cand.reshape(b, k * 32), axis=1)
        return (gi + m.astype(jnp.int32)[:, None] % 3 + 1) % g

    def flatvpu(gi):
        qc = q2[gi].reshape(b, k, 32, d)
        cand = jnp.sum(qc * uv[:, None, None, :], axis=3)
        m = jnp.max(cand.reshape(b, k * 32), axis=1)
        return (gi + m.astype(jnp.int32)[:, None] % 3 + 1) % g

    # correctness: all forms agree
    g0 = (jnp.arange(b * k, dtype=jnp.int32) * 37 % g).reshape(b, k)
    a = q3[g0]
    bb_ = q2[g0].reshape(b, k, 32, d)
    assert bool(jnp.all(a == bb_))

    rec = {"items": i_real, "batch": b, "d": d, "k": k,
           "protocol": "chained",
           "nested_ms": round(bench(nested), 2),
           "flat_ms": round(bench(flat), 2),
           "flatvpu_ms": round(bench(flatvpu), 2)}
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
