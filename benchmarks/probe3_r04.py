"""Round-4 probe 3: lax.sort cost structure on the real chip -- stability,
key multiplicity, operand count, length -- to pick the bucket design."""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/tmp/jaxcache") + "-dev")
    except Exception:
        pass

    def t(f, *a, k=8):
        def sync(out):
            leaf = jax.tree_util.tree_leaves(out)[0]
            _ = np.asarray(leaf.ravel()[:8])

        def run_n(nrun):
            t0 = time.perf_counter()
            out = None
            for _ in range(nrun):
                out = f(*a)
            sync(out)
            return time.perf_counter() - t0

        run_n(1)
        t1 = min(run_n(1) for _ in range(2))
        tk = run_n(k)
        return round(max(tk - t1, 0.0) / (k - 1) * 1e3, 2)

    j = jax.jit
    rng = np.random.default_rng(0)

    for n in (500_000, 1_500_000):
        lab = jnp.asarray(rng.integers(0, 1025, n).astype(np.int32))
        uniq = jnp.asarray(rng.permutation(n).astype(np.int32))
        cols = tuple(jnp.asarray(rng.standard_normal(n).astype(np.float32))
                     for _ in range(4))
        iota = jnp.arange(n, dtype=jnp.int32)

        f1 = j(lambda l, *c: jax.lax.sort((l, *c), num_keys=1,
                                          is_stable=True))
        emit(probe=f"sort.stable_dup5_{n}", ms=t(f1, lab, *cols))
        f2 = j(lambda l, *c: jax.lax.sort((l, *c), num_keys=1,
                                          is_stable=False))
        emit(probe=f"sort.unstable_dup5_{n}", ms=t(f2, lab, *cols))
        f3 = j(lambda u, *c: jax.lax.sort((u, *c), num_keys=1,
                                          is_stable=False))
        emit(probe=f"sort.unstable_uniq5_{n}", ms=t(f3, uniq, *cols))
        f4 = j(lambda l, i, *c: jax.lax.sort((l, i, *c), num_keys=2,
                                             is_stable=False))
        emit(probe=f"sort.twokey6_{n}", ms=t(f4, lab, iota, *cols))
        f5 = j(lambda u, *c: jax.lax.sort((u,) + c[:1], num_keys=1,
                                          is_stable=False))
        emit(probe=f"sort.unstable_uniq2_{n}", ms=t(f5, uniq, *cols))


if __name__ == "__main__":
    main()
