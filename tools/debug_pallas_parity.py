"""On-device gather-vs-pallas RoIAlign parity probe: well-formed rois,
per-roi error breakdown, fwd and bwd."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from simpledet_tpu.kernels.roi_align import batched_multilevel_roi_align

    rng = np.random.RandomState(0)
    h, w, c, b, r = 800, 1333, 256, 2, 64
    strides = (4, 8, 16, 32, 64)
    feats = [jnp.asarray(rng.randn(b, -(-h // s), -(-w // s), c)
                         .astype(np.float32)) for s in strides]
    x1 = rng.uniform(0, 1200, (b, r, 1)).astype(np.float32)
    y1 = rng.uniform(0, 700, (b, r, 1)).astype(np.float32)
    ww = np.exp(rng.uniform(np.log(16), np.log(400), (b, r, 1))).astype(np.float32)
    hh = np.exp(rng.uniform(np.log(16), np.log(400), (b, r, 1))).astype(np.float32)
    rois = jnp.asarray(np.concatenate(
        [x1, y1, np.minimum(x1 + ww, 1332), np.minimum(y1 + hh, 799)], -1))

    outs = {}
    for impl in ("crop", "pallas"):
        fwd = jax.jit(lambda fs, ro, impl=impl: batched_multilevel_roi_align(
            fs, ro, strides, out_size=7, impl=impl))
        outs[impl] = np.asarray(fwd(feats, rois), np.float32)
    a, p = outs["crop"], outs["pallas"]
    diff = np.abs(a - p).reshape(b, r, -1).max(-1)
    scale = np.abs(a).reshape(b, r, -1).max(-1) + 1e-6
    rel = diff / scale
    bad = np.argwhere(rel > 1e-3)
    print("max rel err:", rel.max())
    print("n bad rois:", len(bad), "/", b * r)
    for bi, ri in bad[:10]:
        print(f"  roi ({bi},{ri}) rel={rel[bi, ri]:.4f} "
              f"box={np.asarray(rois)[bi, ri]}")

    # bwd
    for impl in ("crop", "pallas"):
        fb = jax.jit(jax.grad(
            lambda fs, ro, impl=impl: jnp.sum(batched_multilevel_roi_align(
                fs, ro, strides, out_size=7, impl=impl)
                .astype(jnp.float32) ** 2)))
        outs[impl] = [np.asarray(g, np.float32) for g in fb(feats, rois)]
    for i, (ga, gp) in enumerate(zip(outs["crop"], outs["pallas"])):
        d = np.abs(ga - gp).max()
        s = np.abs(ga).max() + 1e-6
        print(f"bwd level {i}: max abs grad crop={np.abs(ga).max():.4f} "
              f"rel err={d / s:.6f}")


if __name__ == "__main__":
    main()
