"""RoIAlign implementation shootout on the real chip at flagship shapes:
512 rois/image x batch 2, 256-ch P2..P6 pyramid of an 800x1333 input.
One JSON line per (impl, direction). Also checks fwd parity crop vs
pallas on-device (those two share the long-side-aware FPN level clamp;
the gather oracle keeps the reference's pure area rule, so gather-vs-
pallas differs BY DESIGN on extreme-aspect rois — see
kernels/roi_align.py::_batched_crop_roi_align)."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import numpy as np


def bench(fn, *args, n=20):
    import jax
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    return (time.time() - t0) / n * 1000


def main():
    import jax
    import jax.numpy as jnp
    from simpledet_tpu.kernels.roi_align import batched_multilevel_roi_align

    dtype = jnp.bfloat16 if "bf16" in sys.argv else jnp.float32
    rng = np.random.RandomState(0)
    h, w, c, b, r = 800, 1333, 256, 2, 512
    strides = (4, 8, 16, 32, 64)
    feats = [jnp.asarray(rng.randn(b, -(-h // s), -(-w // s), c)
                         .astype(np.float32), dtype) for s in strides]
    xy = rng.uniform(0, 1000, (b, r, 2)).astype(np.float32)
    wh = np.exp(rng.uniform(np.log(16), np.log(500), (b, r, 2))).astype(
        np.float32)
    rois = jnp.asarray(np.concatenate(
        [xy, np.minimum(xy + wh, [1300, 790])], -1))

    fns = {}
    for impl in ("gather", "crop", "pallas"):
        fwd = jax.jit(lambda fs, ro, impl=impl: batched_multilevel_roi_align(
            fs, ro, strides, out_size=7, impl=impl))
        fb = jax.jit(jax.grad(
            lambda fs, ro, impl=impl: jnp.sum(batched_multilevel_roi_align(
                fs, ro, strides, out_size=7, impl=impl)
                .astype(jnp.float32) ** 2)))
        fns[impl] = (fwd, fb)
        print(json.dumps({"impl": impl, "dtype": str(dtype.__name__),
                          "fwd_ms": round(bench(fwd, feats, rois), 3),
                          "fwdbwd_ms": round(bench(fb, feats, rois), 3)}),
              flush=True)

    a = np.asarray(fns["crop"][0](feats, rois), np.float32)
    p = np.asarray(fns["pallas"][0](feats, rois), np.float32)
    err = np.max(np.abs(a - p)) / max(np.max(np.abs(a)), 1e-6)
    print(json.dumps({"fwd_rel_err_crop_vs_pallas": float(err)}),
          flush=True)
    assert err < 1e-2, "pallas kernel diverges from the crop-path oracle"


if __name__ == "__main__":
    main()
