"""Gather-strategy microbench for RoIAlign on TPU."""
import json
import time

import numpy as np


def bench(fn, *args, n=20):
    import jax
    out = fn(*args)
    jax.device_get(np.asarray(out).ravel()[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(np.asarray(out).ravel()[0])
    return (time.time() - t0) / n * 1000


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    m, c = 90000, 256          # ~stride4 level flattened
    k = 512 * 7 * 7 * 4        # samples for 512 rois
    table = jnp.asarray(rng.randn(m, c).astype(np.float32))
    idx5 = jnp.asarray(rng.randint(0, m, (512, 7, 7, 2, 2)), jnp.int32)
    idx1 = idx5.reshape(-1)

    ms = bench(jax.jit(lambda t, i: t[i]), table, idx5)
    print(json.dumps({"gather": "fancy_5d", "ms": round(ms, 2)}), flush=True)

    ms = bench(jax.jit(lambda t, i: jnp.take(t, i, axis=0)), table, idx1)
    print(json.dumps({"gather": "take_flat_1d", "ms": round(ms, 2)}),
          flush=True)

    ms = bench(jax.jit(
        lambda t, i: jnp.take(t, i, axis=0, indices_are_sorted=False,
                              unique_indices=False)), table, idx1)
    print(json.dumps({"gather": "take_flat_kw", "ms": round(ms, 2)}),
          flush=True)

    # one-hot matmul gather (MXU): only viable if m small; here it's huge,
    # but measure a segmented variant: gather via dynamic_slice loop is
    # omitted; measure the current 4-gather bilinear end to end instead.
    from simpledet_tpu.kernels.roi_align import multilevel_roi_align
    h, w = 800, 1333
    feats = [jnp.asarray(rng.randn(-(-h // s), -(-w // s), 256)
                         .astype(np.float32)) for s in (4, 8, 16, 32)]
    rois = jnp.asarray(rng.uniform(0, 700, (512, 4)).astype(np.float32))
    rois = rois.at[:, 2:].add(rois[:, :2])
    ms = bench(jax.jit(lambda fs, r: multilevel_roi_align(
        fs, r, (4, 8, 16, 32), out_size=7)), feats, rois, n=10)
    print(json.dumps({"gather": "multilevel_roi_align_now",
                      "ms": round(ms, 2)}), flush=True)

    # gradient wrt features of a plain flat take (scatter-add cost)
    def g(t, i):
        return jax.grad(lambda tt: jnp.sum(jnp.take(tt, i, axis=0) ** 2))(t)
    ms = bench(jax.jit(g), table, idx1)
    print(json.dumps({"gather": "take_flat_grad_scatter",
                      "ms": round(ms, 2)}), flush=True)


if __name__ == "__main__":
    main()
