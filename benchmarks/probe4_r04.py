"""Round-4 probe 4: apportion the batched shapes stage (hull vs MEC vs
rect at the [2048, 1024] bench shape) and race chunking variants."""
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
    from vtkcloudpoint_tpu.ops.geometry import (
        convex_hull, min_enclosing_circle, min_area_rect, cluster_shapes)

    K, cap, H = 2048, 1024, 32
    rng = np.random.default_rng(0)
    # bench-like clusters: dense Gaussian blobs with variable counts
    counts = rng.integers(200, cap, K)
    pts = 0.0008 * rng.standard_normal((K, cap, 2)).astype(np.float32)
    val = np.arange(cap)[None, :] < counts[:, None]
    pts = jnp.asarray(np.where(val[..., None], pts, 0.0))
    val = jnp.asarray(val)
    cnt = jnp.asarray(counts.astype(np.int32))

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
    f_h = j(lambda p, v: jax.vmap(lambda a, b: convex_hull(a, b, H))(p, v))
    emit(probe="s4.hull_2048", ms=t(f_h, pts, val))
    hp, hv = f_h(pts, val)
    f_m = j(lambda p, v: jax.vmap(
        lambda a, b: min_enclosing_circle(a, b, 512))(p, v))
    emit(probe="s4.mec_2048_c512", ms=t(f_m, hp, hv))
    f_m2 = j(lambda p, v: jax.vmap(
        lambda a, b: min_enclosing_circle(a, b, 4960))(p, v))
    emit(probe="s4.mec_2048_c4960", ms=t(f_m2, hp, hv))
    f_r = j(lambda p, v: jax.vmap(min_area_rect)(p, v))
    emit(probe="s4.rect_2048", ms=t(f_r, hp, hv))

    for ck, tc in ((2048, 512), (512, 512), (512, 4960), (256, 4960),
                   (2048, 2480)):
        f = j(lambda p, v, c, ck=ck, tc=tc: cluster_shapes(
            p, v, c, max_hull=H, chunk_k=ck, tri_chunk=tc))
        emit(probe=f"s4.full_ck{ck}_tc{tc}", ms=t(f, pts, val, cnt))


if __name__ == "__main__":
    main()
