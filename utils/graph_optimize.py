"""BN fusion + memory optimization — TPU equivalents of the reference
utils/graph_optimize.py + utils/memonger_v2.py.

merge_bn (reference :34-108): the reference rewrote the symbolic graph to
fold frozen BN into convs, saving up to 50% memory. Here frozen BN is
already a per-channel (scale, bias) affine (models/norm.py FrozenBN) that
XLA fuses into the adjacent conv during compilation — the graph rewrite is
subsumed. What remains is the CHECKPOINT-side fold: converting external
(gamma, beta, moving_mean, moving_var) BN statistics into FrozenBN's
(scale, bias), provided by `fold_bn_stats`.

memonger (reference memonger_v2.py): gradient checkpointing. The TPU
equivalent is jax.checkpoint/remat, wired via ModelParam.memonger in
detection_train (core/train.py make_train_step(remat=...)).
"""
import numpy as np


def fold_bn_stats(tree, eps=1e-5):
    """Recursively fold {gamma/beta/moving_mean/moving_var} (or
    {scale/bias/mean/var}) dicts into FrozenBN {scale, bias}.

    scale = gamma / sqrt(var + eps); bias = beta - mean * scale.
    Non-BN subtrees pass through unchanged.
    """
    if not isinstance(tree, dict):
        return tree
    keys = set(tree.keys())
    for g, b, m, v in (("gamma", "beta", "moving_mean", "moving_var"),
                       ("gamma", "beta", "mean", "var"),
                       ("weight", "bias", "running_mean", "running_var")):
        if {g, b, m, v} <= keys:
            scale = np.asarray(tree[g]) / np.sqrt(np.asarray(tree[v]) + eps)
            bias = np.asarray(tree[b]) - np.asarray(tree[m]) * scale
            return {"scale": scale.astype(np.float32),
                    "bias": bias.astype(np.float32)}
    return {k: fold_bn_stats(v, eps) for k, v in tree.items()}


def merge_bn(params, eps=1e-5):
    """Checkpoint-side analog of the reference merge_bn graph rewrite."""
    return fold_bn_stats(params, eps)
