#!/usr/bin/env python
"""Is lax.while_loop per-iteration more expensive than fori/scan here?"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def measure(fn):
    out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best


def diff(name, build, k1, k2):
    t1 = measure(jax.jit(build(k1)))
    t2 = measure(jax.jit(build(k2)))
    per = (t2 - t1) / (k2 - k1)
    print(f"{name:44s} {per*1e3:9.4f} ms/iter  (t{k1}={t1*1e3:.1f} "
          f"t{k2}={t2*1e3:.1f})")


def main():
    print(f"platform={jax.devices()[0].platform}")
    arr = jnp.ones((225, 128), jnp.float32)

    def fori(k):
        def run():
            def body(i, v):
                return v * 1.0000001 + 1e-9
            return jax.lax.fori_loop(0, k, body, arr)[0, 0]
        return run

    diff("fori_loop tiny body", fori, 100, 1100)

    def wl(k):
        def run():
            def cond(c):
                v, i = c
                return (i < k) & (v[0, 0] > 0)  # data-dependent

            def body(c):
                v, i = c
                return (v * 1.0000001 + 1e-9, i + 1)

            v, _ = jax.lax.while_loop(cond, body, (arr, 0))
            return v[0, 0]
        return run

    diff("while_loop tiny body (data-dep cond)", wl, 100, 1100)

    def wl_red(k):
        def run():
            def cond(c):
                v, i, acc = c
                return (i < k) & (acc < jnp.inf)

            def body(c):
                v, i, acc = c
                return (v, i + 1, acc + jnp.sum(v))

            _, _, acc = jax.lax.while_loop(cond, body, (arr, 0,
                                                        jnp.float32(0)))
            return acc
        return run

    diff("while_loop w/ reduction in cond path", wl_red, 100, 1100)

    # nested: outer while containing inner while (the ICP shape)
    def nested(k):
        def run():
            def ocond(c):
                v, i = c
                return (i < k) & (v[0, 0] > 0)

            def obody(c):
                v, i = c

                def icond(d):
                    w, j = d
                    return (j < 2) & (w[0, 0] > 0)

                def ibody(d):
                    w, j = d
                    return (w * 1.0000001, j + 1)

                v2, _ = jax.lax.while_loop(icond, ibody, (v, 0))
                return (v2 + 1e-9, i + 1)

            v, _ = jax.lax.while_loop(ocond, obody, (arr, 0))
            return v[0, 0]
        return run

    diff("nested while (outer k, inner 2)", nested, 50, 550)


if __name__ == "__main__":
    main()
