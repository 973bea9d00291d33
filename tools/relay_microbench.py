"""Microbenchmark of the axon relay's fixed costs: per-device_put, per-exec,
per-device_get, and transfer bandwidth. Informs the per-frame RPC budget."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def t(fn, n=10):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return 1e3 * (time.perf_counter() - t0) / n


def main():
    dev = jax.devices()[0]
    print(dev)

    tiny = np.zeros(8, np.float32)
    img_f32 = np.zeros((2, 480, 640), np.float32)
    img_u8 = np.zeros((2, 480, 640), np.uint8)

    @jax.jit
    def trivial(x):
        return x + 1.0

    @jax.jit
    def reduce_img(x):
        return jnp.float32(x).sum()

    xd = jax.device_put(tiny)
    r = trivial(xd); _ = jax.device_get(r)

    # blocking get of a tiny result (1 round trip)
    print(f"get tiny            {t(lambda: jax.device_get(trivial(xd))):7.1f} ms")
    # put without sync (async enqueue cost only)
    print(f"put tiny (async)    {t(lambda: jax.device_put(tiny)):7.1f} ms")
    print(f"put f32 img (async) {t(lambda: jax.device_put(img_f32)):7.1f} ms")
    print(f"put u8 img (async)  {t(lambda: jax.device_put(img_u8)):7.1f} ms")

    # put + use + get: full chain latency for both dtypes
    def chain(im):
        d = jax.device_put(im)
        return jax.device_get(reduce_img(d))
    print(f"chain f32 img       {t(lambda: chain(img_f32)):7.1f} ms")
    print(f"chain u8 img        {t(lambda: chain(img_u8)):7.1f} ms")

    # exec-only marginal cost: 1 vs 4 chained trivial programs before a get
    @jax.jit
    def triv2(x):
        return x * 1.0001

    def nexec(k):
        y = xd
        for _ in range(k):
            y = triv2(y) if k % 2 else trivial(y)
        return jax.device_get(y)
    print(f"1 exec + get        {t(lambda: nexec(1)):7.1f} ms")
    print(f"4 execs + get       {t(lambda: nexec(4)):7.1f} ms")
    print(f"8 execs + get       {t(lambda: nexec(8)):7.1f} ms")

    # get size scaling
    big = jax.device_put(np.zeros((1 << 20,), np.float32))  # 4 MB
    _ = jax.device_get(trivial(big))
    print(f"get 4MB             {t(lambda: jax.device_get(trivial(big))):7.1f} ms")


if __name__ == "__main__":
    main()
