

def test_fixpoint_nms_matches_serial_scan():
    """The vectorized fixpoint NMS (ops/nms.py nms_keep_sorted_fixpoint) is
    exactly greedy: same keep set as the sequential scan on random clouds,
    long suppression chains, and all-identical boxes."""
    import numpy as np
    import jax.numpy as jnp
    from simpledet_tpu.ops.nms import (nms_keep_sorted,
                                       nms_keep_sorted_fixpoint)

    rng = np.random.RandomState(7)

    def check(boxes, valid, thr):
        b = jnp.asarray(boxes, jnp.float32)
        v = jnp.asarray(valid)
        a = np.asarray(nms_keep_sorted(b, v, thr))
        c = np.asarray(nms_keep_sorted_fixpoint(b, v, thr))
        assert (a == c).all()

    for _ in range(10):
        n = int(rng.choice([1, 2, 17, 100]))
        ctr = rng.uniform(0, 200, (n, 2))
        wh = rng.uniform(5, 80, (n, 2))
        boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1)
        check(boxes, rng.rand(n) > 0.1, float(rng.choice([0.3, 0.5, 0.7])))
    n = 200
    xs = np.arange(n, dtype=np.float32) * 4.0
    chain = np.stack([xs, np.zeros(n), xs + 10, np.full(n, 10.0)], 1)
    check(chain, np.ones(n, bool), 0.3)
    check(np.tile([[0, 0, 10, 10]], (64, 1)).astype(np.float32),
          np.ones(64, bool), 0.5)
