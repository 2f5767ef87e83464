"""Core NN building blocks (reference: sbmc/modules.py:34-320).

Flax implementations designed for TPU: convolutions run in NHWC (channels on
the 128-lane axis so the feature contraction feeds the MXU), weight
normalization matches the reference's parameterization
(``w = g * v / ||v||`` with the norm taken per output channel, the torch
``weight_norm`` default), and initializations reproduce torch's
``xavier_uniform_`` with ``calculate_gain``.
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["ConvChain", "Autoencoder"]


def _gain(nonlinearity):
    """torch.nn.init.calculate_gain equivalents."""
    if nonlinearity in ("linear", "sigmoid", "softplus"):
        return 1.0
    if nonlinearity == "tanh":
        return 5.0 / 3.0
    if nonlinearity == "relu":
        return 2.0 ** 0.5
    if nonlinearity == "leaky_relu":
        slope = 0.01
        return (2.0 / (1.0 + slope ** 2)) ** 0.5
    if nonlinearity == "elu":
        # The reference initializes elu layers with the relu gain
        # (sbmc/modules.py:89-91, 183-185).
        return 2.0 ** 0.5
    raise ValueError(f"no gain for nonlinearity {nonlinearity!r}")


def _xavier_uniform(gain):
    """torch xavier_uniform_: U(-a, a), a = gain * sqrt(6 / (fan_in+fan_out))
    with fan_in = cin*kh*kw, fan_out = cout*kh*kw."""
    def init(key, shape, dtype=jnp.float32):
        kh, kw, cin, cout = shape
        fan_in = cin * kh * kw
        fan_out = cout * kh * kw
        a = gain * (6.0 / (fan_in + fan_out)) ** 0.5
        return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)
    return init


def _activation(name):
    if name == "relu":
        return nn.relu
    if name == "leaky_relu":
        return lambda x: nn.leaky_relu(x, negative_slope=0.01)
    if name == "tanh":
        return jnp.tanh
    if name == "elu":
        return nn.elu
    if name == "sigmoid":
        return nn.sigmoid
    if name == "softplus":
        return nn.softplus
    raise ValueError(f"unknown activation {name!r}")


class WNConv2D(nn.Module):
    """2D convolution with optional weight normalization.

    Matches torch ``nn.utils.weight_norm(nn.Conv2d(...))`` semantics: the
    direction tensor ``v`` carries the Xavier init and the scale ``g`` is
    initialized to ``||v||`` so the initial function equals the plain conv.
    Input/output are NHWC. Parameters are float32; with ``dtype=bfloat16``
    the convolution itself runs in bf16 (MXU-native) and the result is
    cast back.
    """
    features: int
    ksize: int
    stride: int = 1
    pad: bool = True
    weight_norm: bool = True
    init_gain_nonlinearity: str = "linear"
    dtype: Optional[jnp.dtype] = None
    #: "NHWC" (default) or "NCHW": output layout of the convolution. NCHW
    #: lets a consumer that wants spatial-last data (the splat ops) receive
    #: it directly from the conv epilogue instead of via an extra
    #: full-tensor transpose pass.
    out_layout: str = "NHWC"

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        shape = (self.ksize, self.ksize, cin, self.features)
        v = self.param("v", _xavier_uniform(_gain(self.init_gain_nonlinearity)),
                       shape)
        if self.weight_norm:
            g = self.param(
                "g",
                lambda rng: jnp.sqrt(
                    jnp.sum(v.reshape(-1, self.features) ** 2, axis=0)),
            )
            norm = jnp.sqrt(
                jnp.sum(v.reshape(-1, self.features) ** 2, axis=0)) + 1e-12
            kernel = v * (g / norm)
        else:
            kernel = v
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        padding = "SAME" if self.pad else "VALID"
        # With a compute dtype set, activations stay in that dtype across
        # the whole chain (casting back to f32 per layer would double the
        # HBM traffic on the inter-layer tensors, which is the conv stack's
        # actual bottleneck at inference scale); accumulation is f32 via
        # preferred_element_type either way.
        out_dtype = self.dtype if self.dtype is not None else x.dtype
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        if self.ksize == 1 and self.stride == 1:
            # 1x1 convolutions lower ~20-25% faster as explicit channel
            # matmuls than through conv_general_dilated (measured on v5e
            # at 4x1216x768: 15.3 vs 19.4 ms for the embedding chain), and
            # the NCHW epilogue falls out of the dot's natural result
            # layout ([cout, n, hw]) instead of a separate transposed
            # conv output (measured 14.1 -> 5.2 ms for the k^2=441
            # kernel-regressor prediction layer).
            km = kernel.reshape(cin, self.features)
            n, hh, ww = x.shape[0], x.shape[1], x.shape[2]
            bias = bias.astype(out_dtype)
            if self.out_layout == "NCHW":
                y = jax.lax.dot_general(
                    km.T, x.reshape(n, hh * ww, cin),
                    (((1,), (2,)), ((), ())),
                    preferred_element_type=jnp.float32)
                y = y.transpose(1, 0, 2).reshape(
                    n, self.features, hh, ww)
                return y.astype(out_dtype) + bias[:, None, None]
            y = jax.lax.dot_general(
                x.reshape(n * hh * ww, cin), km, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return y.reshape(n, hh, ww, self.features).astype(out_dtype) \
                + bias
        # preferred_element_type=f32 on a bf16 conv breaks the TRANSPOSE
        # rule (the f32 cotangent meets the bf16 kernel inside the
        # transposed conv -> trace-time TypeError), which made bf16
        # TRAINING impossible until 2026-08-19. With plain bf16 in/out the
        # TPU conv still accumulates f32 on the MXU internally; only the
        # rounding point of the output moves. f32 inputs keep the explicit
        # f32 request (a no-op numerically).
        pet = None if self.dtype == jnp.bfloat16 else jnp.float32
        y = jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=(self.stride, self.stride),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", self.out_layout),
            preferred_element_type=pet,
        )
        bias = bias.astype(out_dtype)
        if self.out_layout == "NCHW":
            return y.astype(out_dtype) + bias[:, None, None]
        return y.astype(out_dtype) + bias


class ConvChain(nn.Module):
    """A stack of conv+activation layers (reference: sbmc/modules.py:34-192).

    ``depth - 1`` conv+activation blocks at ``width`` channels followed by a
    final prediction conv to ``noutputs`` channels with ``output_type``
    applied (if not linear). All layers share ``ksize``/``stride``/padding.

    Operates on NHWC tensors.
    """
    noutputs: int
    ksize: int = 3
    width: int = 64
    depth: int = 3
    stride: int = 1
    pad: bool = True
    output_type: str = "linear"
    activation: str = "relu"
    weight_norm: bool = True
    dtype: Optional[jnp.dtype] = None
    #: output layout of the *prediction* layer ("NHWC" or "NCHW").
    out_layout: str = "NHWC"

    @nn.compact
    def __call__(self, x):
        if self.depth <= 0:
            raise ValueError("negative network depth.")
        if self.activation not in ("relu", "leaky_relu", "tanh", "elu"):
            raise ValueError("activation should be one of: "
                             "relu, leaky_relu, tanh, elu")
        act = _activation(self.activation)
        for d in range(self.depth - 1):
            x = WNConv2D(self.width, self.ksize, stride=self.stride,
                         pad=self.pad, weight_norm=self.weight_norm,
                         init_gain_nonlinearity=self.activation,
                         dtype=self.dtype, name=f"layer_{d}")(x)
            x = act(x)
        out_gain = "relu" if self.output_type in ("elu", "softplus") \
            else self.output_type
        x = WNConv2D(self.noutputs, self.ksize, stride=self.stride,
                     pad=self.pad, weight_norm=self.weight_norm,
                     init_gain_nonlinearity=out_gain,
                     dtype=self.dtype, out_layout=self.out_layout,
                     name="prediction")(x)
        if self.output_type != "linear":
            x = _activation(self.output_type)(x)
        return x


class Autoencoder(nn.Module):
    """U-net style autoencoder (reference: sbmc/modules.py:195-320).

    ``num_levels`` scales; each level runs a left ``ConvChain``, downsamples
    by 2, recurses, bilinearly upsamples the coarse result back, concatenates
    the skip and runs a right ``ConvChain``. Channel width grows by
    ``increase_factor`` per scale, capped at ``max_width``. NHWC.
    """
    noutputs: int
    ksize: int = 3
    width: int = 64
    num_levels: int = 3
    num_convs: int = 2
    max_width: int = 512
    increase_factor: float = 1.0
    output_type: str = "linear"
    activation: str = "relu"
    pooling: str = "max"
    dtype: Optional[jnp.dtype] = None

    def _width(self, lvl):
        return min(int(self.width * self.increase_factor ** lvl),
                   self.max_width)

    def _downsample(self, x, w):
        if self.pooling == "max":
            return nn.max_pool(x, (2, 2), strides=(2, 2))
        if self.pooling == "average":
            return nn.avg_pool(x, (2, 2), strides=(2, 2))
        if self.pooling == "conv":
            return nn.Conv(w, (2, 2), strides=(2, 2), name=f"pool_{w}")(x)
        raise ValueError(f"unknown pooling '{self.pooling}'")

    @nn.compact
    def __call__(self, x):
        skips = []
        # Down path (finest = level 0).
        for lvl in range(self.num_levels):
            w = self._width(lvl)
            is_coarsest = lvl == self.num_levels - 1
            is_finest = lvl == 0
            n_out = self.noutputs if (is_coarsest and is_finest) else w
            o_type = self.output_type if (is_coarsest and is_finest) \
                else self.activation
            x = ConvChain(noutputs=n_out, ksize=self.ksize, width=w,
                          depth=self.num_convs, pad=True,
                          output_type=o_type, activation=self.activation,
                          dtype=self.dtype, name=f"left_{lvl}")(x)
            if not is_coarsest:
                skips.append(x)
                x = self._downsample(x, w)
        # Up path.
        for lvl in range(self.num_levels - 2, -1, -1):
            w = self._width(lvl)
            left = skips[lvl]
            # NOTE: measured on v5e (2026-08-17): jax.image.resize looks
            # expensive standalone (18.6 ms at [1,608,384,256]->2x vs 4.9
            # for a shift+interleave reimplementation) but in context XLA
            # fuses the resize gather into the consumer concat+conv, and
            # swapping in the "faster" materializing version regressed the
            # full model 263 -> 293 ms/tile. Keep jax.image.resize here.
            us = jax.image.resize(
                x, left.shape[:-1] + (x.shape[-1],), method="bilinear")
            x = jnp.concatenate([us, left], axis=-1)
            n_out = self.noutputs if lvl == 0 else w
            o_type = self.output_type if lvl == 0 else self.activation
            x = ConvChain(noutputs=n_out, ksize=self.ksize, width=w,
                          depth=self.num_convs, pad=True,
                          output_type=o_type, activation=self.activation,
                          dtype=self.dtype, name=f"right_{lvl}")(x)
        return x
