"""Round-5 probe: XLA row-gather rate vs table size / dtype / index
locality on the real TPU.

Motivation: the 100k trace shows every (rows, 480) gather — mirror dxg
and xg alike — running at ~14.9 ns/row from GB-scale tables, while the
10k xg gather from a 19.6 MB table runs at ~3.4 ns/row. If the rate is
table-size-bound (not index-locality-bound), the ring backward can
pre-slice its span-window into a small contiguous table and gather
locally.

Usage: python scripts_dev/r5_gather_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

ROWS = 1 << 19            # gathered rows per pass (512k)
D = 480                   # row width (the mid-layer dim_x)
REPS = 8
import sys as _s
def _p(m): print(m, file=_s.stderr, flush=True)


def timed(fn, *args):
    # run inside a scan to amortize the axon dispatch floor
    def body(c, _):
        return c, jax.lax.optimization_barrier(fn(*args).sum())

    f = jax.jit(lambda: jax.lax.scan(body, 0, None, length=REPS)[1].sum())
    float(f())  # compile+warm
    t0 = time.perf_counter()
    float(f())
    return (time.perf_counter() - t0) / REPS


def main():
    rng = np.random.default_rng(0)
    print(f"# device={jax.devices()[0]}  rows/pass={ROWS}  D={D}")
    for n_rows_tab in (1 << 14, 1 << 15, 1 << 17, 1 << 19, 1 << 20):
        for dt in (jnp.float32, jnp.bfloat16):
            tab = jnp.asarray(
                rng.normal(size=(n_rows_tab, D)).astype(np.float32)
            ).astype(dt)
            mb = n_rows_tab * D * tab.dtype.itemsize / 1e6
            # random global indices
            idx_g = jnp.asarray(
                rng.integers(0, n_rows_tab, size=ROWS).astype(np.int32))
            # window-local indices (within a 16k-row window at a random base)
            w = min(1 << 14, n_rows_tab)
            base = int(rng.integers(0, n_rows_tab - w + 1))
            idx_l = jnp.asarray(
                (base + rng.integers(0, w, size=ROWS)).astype(np.int32))

            _p(f"timing table {mb:.0f}MB {np.dtype(dt).name}...")
            t_g = timed(lambda t=tab, i=idx_g: t[i].astype(jnp.float32))
            t_l = timed(lambda t=tab, i=idx_l: t[i].astype(jnp.float32))
            # gather + K-fold (the mirror reduction shape): rows as (R/K, K)
            K = 64
            idx2 = idx_g.reshape(-1, K)
            t_f = timed(
                lambda t=tab, i=idx2: t[i.reshape(-1)]
                .astype(jnp.float32)
                .reshape(-1, K, D)
                .sum(axis=1)
            )
            print(
                f"table {mb:8.1f} MB {np.dtype(dt).name:8s} "
                f"rand {t_g / ROWS * 1e9:6.2f} ns/row  "
                f"local {t_l / ROWS * 1e9:6.2f} ns/row  "
                f"gather+fold {t_f / ROWS * 1e9:6.2f} ns/row",
                flush=True,
            )


if __name__ == "__main__":
    main()
