"""Top-k selection tuned for TPU.

Dense detection selects k winners out of very large score vectors (pre-NMS
top-2000 of ~200k anchors per FPN level; RetinaNet test decode picks top-1000
of millions of (anchor, class) scores). `jax.lax.top_k` lowers to a full
sort for large k — expensive on TPU. `jax.lax.approx_max_k` uses the TPU's
partial-reduction hardware path (ApproxTopK) at a configurable recall.

fast_top_k uses the approximate path on TPU (recall_target 0.98 — missing a
candidate in the pre-NMS pool at this recall is mAP-neutral: the reference
itself truncates pools arbitrarily per level) and the exact path elsewhere,
so CPU tests stay bit-deterministic.
"""
import jax
import jax.numpy as jnp


def fast_top_k(x, k, recall_target=0.98):
    """x [..., N] -> (values [..., k], indices [..., k])."""
    if k >= x.shape[-1]:
        return jax.lax.top_k(x, k)
    from simpledet_tpu.utils.platform import is_tpu
    if is_tpu():
        return jax.lax.approx_max_k(x, k, recall_target=recall_target)
    return jax.lax.top_k(x, k)
