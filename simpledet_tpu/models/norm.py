"""Normalizer factory — the TPU analog of mxnext normalizer_factory.

The reference picks BN flavor per-config (fixbn / syncbn / gn / dummy,
config/faster_r50v1_fpn_1x.py:27-28). Here:

  * fixbn  -> FrozenBN: per-channel affine with folded running stats. The
    scale/bias are non-trainable (stop_gradient); at checkpoint-load time
    gamma/beta/mean/var fold into (scale, bias), which subsumes the
    reference's merge_bn graph rewrite (utils/graph_optimize.py:34-108) —
    XLA fuses the resulting scale-bias into the adjacent conv for free.
  * syncbn -> flax BatchNorm with batch stats computed over the GLOBAL
    (mesh-sharded) batch: under pjit a mean over the batch axis already
    spans all devices, which strictly generalizes the reference's
    single-process SyncBatchNorm (operator_cxx/contrib/sync_batch_norm).
  * gn     -> GroupNorm (replaces operator_cxx/contrib/group_norm).
"""
import flax.linen as nn
import jax
import jax.numpy as jnp


class FrozenBN(nn.Module):
    """y = x * scale + bias with constant (non-trainable) scale/bias.

    scale = gamma / sqrt(var + eps), bias = beta - mean * scale are produced
    by the checkpoint converter; fresh init is identity.
    """
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        scale = jax.lax.stop_gradient(scale)
        bias = jax.lax.stop_gradient(bias)
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


class SyncBN(nn.Module):
    """Batch norm with statistics computed on the fly over (batch, H, W).

    Under pjit the batch axis is sharded over the whole mesh, so this mean
    IS the cross-device synchronized statistic (strictly more general than
    the reference's single-process SyncBatchNorm barrier,
    operator_cxx/contrib/sync_batch_norm-inl.h:88-221).

    Running statistics (the reference keeps moving mean/var usable at test,
    sync_batch_norm-inl.h:55-73) live in the mutable ``batch_stats``
    collection, EMA-updated whenever that collection is mutable (i.e. inside
    the train step). At inference — collection present but immutable — the
    running stats are used, which is what makes batch-1 eval of a
    syncbn-trained model faithful. With no ``batch_stats`` provided (legacy
    checkpoints), falls back to on-the-fly batch statistics.
    """
    epsilon: float = 1e-5
    momentum: float = 0.9

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (c,), jnp.float32)
        xf = x.astype(jnp.float32)

        updating = self.is_mutable_collection("batch_stats")
        has_stats = self.has_variable("batch_stats", "mean")
        if updating or has_stats:
            ra_mean = self.variable("batch_stats", "mean",
                                    lambda: jnp.zeros((c,), jnp.float32))
            ra_var = self.variable("batch_stats", "var",
                                   lambda: jnp.ones((c,), jnp.float32))

        if has_stats and not updating:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean((xf - mean) ** 2, axis=axes)
            if updating:
                m = self.momentum
                ra_mean.value = jax.lax.stop_gradient(
                    m * ra_mean.value + (1.0 - m) * mean)
                ra_var.value = jax.lax.stop_gradient(
                    m * ra_var.value + (1.0 - m) * var)

        scale = gamma / jnp.sqrt(var + self.epsilon)
        return (xf * scale + (beta - mean * scale)).astype(x.dtype)


def normalizer_factory(type="fixbn", ndev=None, eps=1e-5, group=32):
    """Returns a callable (name -> norm module). type in
    {fixbn, fix, syncbn, localbn, gn, dummy}."""
    def make(name=None, momentum=0.9):
        if type in ("fixbn", "fix"):
            return FrozenBN(epsilon=eps, name=name)
        if type in ("syncbn", "localbn"):
            return SyncBN(epsilon=eps, name=name)
        if type == "gn":
            return nn.GroupNorm(num_groups=group, epsilon=eps, name=name)
        if type == "dummy":
            return lambda x: x
        raise NotImplementedError(f"normalizer {type}")
    make.type = type
    return make
