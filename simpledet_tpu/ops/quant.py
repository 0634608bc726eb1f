"""INT8 quantization-aware training — fake-quant with straight-through grads.

TPU rewrite of the reference INT8 path (operator_cxx/contrib/
quantization_int8* + utils/graph_optimize.py:111-212 attach_quantize_node):
the reference walked the symbolic graph wrapping Convolution/FC inputs and
weights in Quantization_int8 fake-quant nodes with EMA minmax aux state.
Here fake-quant is a function with a straight-through custom VJP, and
QuantConv / QuantDense are drop-in flax layers that quantize (input, weight)
per tensor — the module-level analog of the graph rewrite. EMA minmax state
is unnecessary under jit: the minmax reduces on device each step (the
"power2" rounding option is preserved).
"""
from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fake_quant(x, num_bits=8, power2=False):
    qmax = 2.0 ** (num_bits - 1) - 1
    amax = jnp.maximum(jnp.max(jnp.abs(x)), 1e-8)
    if power2:
        amax = 2.0 ** jnp.ceil(jnp.log2(amax))
    scale = amax / qmax
    return jnp.round(x / scale) * scale


def _fq_fwd(x, num_bits, power2):
    return fake_quant(x, num_bits, power2), None


def _fq_bwd(num_bits, power2, res, g):
    return (g,)   # straight-through


fake_quant.defvjp(_fq_fwd, _fq_bwd)


def quantize_params(params, num_bits=8, power2=False):
    """Fake-quant every conv/dense kernel leaf — the weight half of the
    reference's attach_quantize_node rewrite (utils/graph_optimize.py:111-212
    wraps the weight input of Convolution/FullyConnected/Deconvolution).
    Gradients flow straight-through to the raw params."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    for path, v in flat.items():
        if path[-1] == "kernel" and getattr(v, "ndim", 0) >= 2:
            q = fake_quant(jnp.asarray(v, jnp.float32), num_bits, power2)
            out[path] = q.astype(v.dtype)
        else:
            out[path] = v
    return flax.traverse_util.unflatten_dict(out)


def quantize_apply(apply_fn, num_bits=8, power2=False):
    """QAT wrapper over a flax apply: fake-quants (a) every conv/dense
    kernel via quantize_params and (b) every nn.Conv / nn.Dense input via a
    method interceptor. Together these are the module-tree analog of the
    reference graph rewrite (utils/graph_optimize.py:111-212, driven by
    pModel.QuantizeTrainingParam in detection_train.py:145-152)."""

    def interceptor(next_fun, args, kwargs, context):
        if (isinstance(context.module, (nn.Conv, nn.Dense))
                and context.method_name == "__call__" and args):
            x = args[0]
            xq = fake_quant(jnp.asarray(x, jnp.float32), num_bits, power2)
            return next_fun(xq.astype(x.dtype), *args[1:], **kwargs)
        return next_fun(*args, **kwargs)

    def wrapped(variables, *args, **kwargs):
        variables = dict(variables)
        variables["params"] = quantize_params(variables["params"],
                                              num_bits, power2)
        with nn.intercept_methods(interceptor):
            return apply_fn(variables, *args, **kwargs)

    return wrapped


class QuantConv(nn.Module):
    """Conv with fake-quantized input + weight (QAT)."""
    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    use_bias: bool = True
    num_bits: int = 8
    power2: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, x.shape[-1], self.features),
                            jnp.float32)
        xq = fake_quant(x.astype(jnp.float32), self.num_bits, self.power2)
        wq = fake_quant(kernel, self.num_bits, self.power2)
        y = jax.lax.conv_general_dilated(
            xq, wq, window_strides=self.strides,
            padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)
        return y.astype(self.dtype)


class QuantDense(nn.Module):
    features: int
    use_bias: bool = True
    num_bits: int = 8
    power2: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features), jnp.float32)
        xq = fake_quant(x.astype(jnp.float32), self.num_bits, self.power2)
        wq = fake_quant(kernel, self.num_bits, self.power2)
        y = xq @ wq
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)
        return y.astype(self.dtype)
