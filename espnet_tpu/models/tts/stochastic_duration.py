"""Stochastic duration predictor (flow-based) for VITS.

Behavioral contract: espnet2/gan_tts/vits/duration_predictor.py:25
(StochasticDurationPredictor) + espnet2/gan_tts/vits/transform.py
(piecewise rational-quadratic spline) + flow.py (DDSConv, ConvFlow,
ElementwiseAffineFlow, LogFlow, FlipFlow):

- training: variational dequantization of the integer durations d via a
  posterior flow q(u, nu | d, h_text); the dequantized pair
  z = [d - u, nu] flows (Log -> ElementwiseAffine -> 4 x ConvFlow/Flip)
  to a standard normal; the loss is the negative ELBO (NLL - log q),
  summed over valid positions.
- inference: sample (B, T, 2) noise, invert the flows conditioned on
  h_text, take channel 0 as log-duration.

TPU-first notes: everything is channels-last (B, T, C) with static
shapes; the spline bin search is a vectorized comparison-sum (K is
small) instead of a searchsorted scan; masks are applied multiplicatively
so padded positions contribute exactly zero to the ELBO.
"""

from __future__ import annotations

import math

import flax.linen as nn

from espnet_tpu.nn.convolution import DepthwiseConv1d
import jax
import jax.numpy as jnp

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


def rational_quadratic_spline(
    x: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    unnormalized_derivatives: jnp.ndarray,
    *,
    inverse: bool = False,
    tail_bound: float = 5.0,
):
    """Unconstrained piecewise rational-quadratic transform.

    x: (...,); unnormalized_widths/heights: (..., K);
    unnormalized_derivatives: (..., K-1) — boundary derivatives are
    pinned so the transform is the identity outside [-B, B]
    (transform.py:52-79 'linear' tails).

    Returns (y, logabsdet) elementwise.
    """
    K = unnormalized_widths.shape[-1]
    min_w = DEFAULT_MIN_BIN_WIDTH
    min_h = DEFAULT_MIN_BIN_HEIGHT
    min_d = DEFAULT_MIN_DERIVATIVE

    inside = (x >= -tail_bound) & (x <= tail_bound)
    # identity tails: clamp x into range for the spline math, then
    # select the identity outside
    x_in = jnp.clip(x, -tail_bound, tail_bound)

    widths = jax.nn.softmax(unnormalized_widths, axis=-1)
    widths = min_w + (1 - min_w * K) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.concatenate(
        [jnp.zeros_like(cumwidths[..., :1]), cumwidths], axis=-1)
    cumwidths = (2 * tail_bound) * cumwidths - tail_bound
    cumwidths = cumwidths.at[..., 0].set(-tail_bound)
    cumwidths = cumwidths.at[..., -1].set(tail_bound)
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    # boundary derivative = 1 (identity tails), transform.py:74-76
    const = math.log(math.exp(1.0 - min_d) - 1.0)
    derivs = jnp.concatenate(
        [jnp.full_like(unnormalized_derivatives[..., :1], const),
         unnormalized_derivatives,
         jnp.full_like(unnormalized_derivatives[..., :1], const)], axis=-1)
    derivatives = min_d + jax.nn.softplus(derivs)  # (..., K+1)

    heights = jax.nn.softmax(unnormalized_heights, axis=-1)
    heights = min_h + (1 - min_h * K) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.concatenate(
        [jnp.zeros_like(cumheights[..., :1]), cumheights], axis=-1)
    cumheights = (2 * tail_bound) * cumheights - tail_bound
    cumheights = cumheights.at[..., 0].set(-tail_bound)
    cumheights = cumheights.at[..., -1].set(tail_bound)
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    # bin index: count of interior knots <= x (K is small: one reduce)
    knots = cumheights if inverse else cumwidths
    idx = jnp.sum((x_in[..., None] >= knots[..., 1:-1]),
                  axis=-1).astype(jnp.int32)  # in [0, K-1]

    def take(t):
        return jnp.take_along_axis(t, idx[..., None], axis=-1)[..., 0]

    in_cumw = take(cumwidths[..., :-1])
    in_w = take(widths)
    in_cumh = take(cumheights[..., :-1])
    in_h = take(heights)
    delta = in_h / in_w
    d_k = take(derivatives[..., :-1])
    d_k1 = take(derivatives[..., 1:])

    if inverse:
        a = (x_in - in_cumh) * (d_k + d_k1 - 2 * delta) + in_h * (
            delta - d_k)
        b = in_h * d_k - (x_in - in_cumh) * (d_k + d_k1 - 2 * delta)
        c = -delta * (x_in - in_cumh)
        disc = b ** 2 - 4 * a * c
        disc = jnp.maximum(disc, 0.0)
        root = (2 * c) / (-b - jnp.sqrt(disc))
        y = root * in_w + in_cumw
        theta_1m = root * (1 - root)
        denom = delta + (d_k + d_k1 - 2 * delta) * theta_1m
        dnum = delta ** 2 * (
            d_k1 * root ** 2 + 2 * delta * theta_1m + d_k * (1 - root) ** 2)
        logabsdet = -(jnp.log(dnum) - 2 * jnp.log(denom))
    else:
        theta = (x_in - in_cumw) / in_w
        theta_1m = theta * (1 - theta)
        denom = delta + (d_k + d_k1 - 2 * delta) * theta_1m
        num = in_h * (delta * theta ** 2 + d_k * theta_1m)
        y = in_cumh + num / denom
        dnum = delta ** 2 * (
            d_k1 * theta ** 2 + 2 * delta * theta_1m
            + d_k * (1 - theta) ** 2)
        logabsdet = jnp.log(dnum) - 2 * jnp.log(denom)

    y = jnp.where(inside, y, x)
    logabsdet = jnp.where(inside, logabsdet, 0.0)
    return y, logabsdet


class DDSConv(nn.Module):
    """Dilated depth-separable conv stack (flow.py DilatedDepthSeparableConv)."""

    channels: int
    kernel_size: int = 3
    layers: int = 3
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, mask, g=None, *, deterministic=True):
        """x (B, T, C), mask (B, T) bool, g optional (B, T, C)."""
        m = mask[..., None].astype(x.dtype)
        if g is not None:
            x = x + g
        for i in range(self.layers):
            h = DepthwiseConv1d(self.channels, self.kernel_size,
                                kernel_dilation=self.kernel_size ** i,
                                name=f"sep{i}")(x * m)
            h = nn.LayerNorm(name=f"norm1_{i}")(h)
            h = nn.gelu(h)
            h = nn.Conv(self.channels, (1,), name=f"pw{i}")(h)
            h = nn.LayerNorm(name=f"norm2_{i}")(h)
            h = nn.gelu(h)
            h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
            x = x + h
        return x * m


class ConvFlow(nn.Module):
    """Spline coupling over 2 channels conditioned by DDSConv
    (flow.py ConvFlow)."""

    filter_channels: int
    kernel_size: int = 3
    layers: int = 3
    bins: int = 10
    tail_bound: float = 5.0

    @nn.compact
    def __call__(self, x, mask, g=None, *, reverse: bool = False):
        """x (B, T, 2) -> (y, logdet (B,)) fwd, y only in reverse."""
        x0, x1 = x[..., :1], x[..., 1:]
        h = nn.Conv(self.filter_channels, (1,), name="pre")(x0)
        h = DDSConv(self.filter_channels, self.kernel_size, self.layers,
                    name="convs")(h, mask, g=g)
        # 3K-1 spline params for the single transformed channel
        p = nn.Conv(self.bins * 3 - 1, (1,),
                    kernel_init=nn.initializers.zeros, name="proj")(h)
        denom = math.sqrt(self.filter_channels)
        uw = p[..., :self.bins] / denom
        uh = p[..., self.bins:2 * self.bins] / denom
        ud = p[..., 2 * self.bins:]
        y1, logabsdet = rational_quadratic_spline(
            x1[..., 0], uw, uh, ud, inverse=reverse,
            tail_bound=self.tail_bound)
        y = jnp.concatenate([x0, y1[..., None]], axis=-1)
        y = jnp.where(mask[..., None], y, 0.0)
        logdet = jnp.sum(jnp.where(mask, logabsdet, 0.0), axis=-1)
        if reverse:
            return y
        return y, logdet


class ElementwiseAffine(nn.Module):
    """Per-channel affine flow (flow.py ElementwiseAffineFlow)."""

    channels: int = 2

    @nn.compact
    def __call__(self, x, mask, g=None, *, reverse: bool = False):
        m = self.param("m", nn.initializers.zeros, (self.channels,))
        logs = self.param("logs", nn.initializers.zeros, (self.channels,))
        msk = mask[..., None]
        if reverse:
            return jnp.where(msk, (x - m) * jnp.exp(-logs), 0.0)
        y = jnp.where(msk, m + jnp.exp(logs) * x, 0.0)
        logdet = jnp.sum(logs) * jnp.sum(mask, axis=-1)
        return y, logdet


def log_flow(x, mask, *, reverse=False, eps=1e-5):
    """y = log(x) over channel 0 only is NOT the reference semantics —
    LogFlow (flow.py) maps ALL channels; the SDP applies it to the z0
    (dequantized-duration) channel alone by calling it on (B, T, 1)."""
    msk = mask[..., None]
    if reverse:
        return jnp.where(msk, jnp.exp(x), 0.0)
    y = jnp.where(msk, jnp.log(jnp.maximum(x, eps)), 0.0)
    logdet = jnp.sum(jnp.where(mask, -y[..., 0], 0.0), axis=-1) \
        if x.shape[-1] == 1 else jnp.sum(
            jnp.where(msk, -y, 0.0), axis=(-2, -1))
    return y, logdet


class StochasticDurationPredictor(nn.Module):
    """Flow-based duration model (duration_predictor.py:25).

    __call__(h, mask, w=None, rng, reverse, noise_scale):
      - training (reverse=False): returns per-utterance negative ELBO
        (B,) of the integer durations w (B, T).
      - inference (reverse=True): returns log-durations (B, T).
    """

    channels: int = 192
    filter_channels: int = 192
    kernel_size: int = 3
    dropout_rate: float = 0.5
    flows: int = 4
    bins: int = 10

    def setup(self):
        self.pre = nn.Conv(self.filter_channels, (1,))
        self.convs = DDSConv(self.filter_channels, self.kernel_size, 3,
                             self.dropout_rate)
        self.proj = nn.Conv(self.filter_channels, (1,))
        self.aff = ElementwiseAffine(2)
        self.conv_flows = [
            ConvFlow(self.filter_channels, self.kernel_size,
                     name=f"flow{i}") for i in range(self.flows)]
        # posterior (dequantization) branch
        self.post_pre = nn.Conv(self.filter_channels, (1,))
        self.post_convs = DDSConv(self.filter_channels, self.kernel_size, 3,
                                  self.dropout_rate)
        self.post_proj = nn.Conv(self.filter_channels, (1,))
        self.post_aff = ElementwiseAffine(2)
        self.post_conv_flows = [
            ConvFlow(self.filter_channels, self.kernel_size,
                     name=f"post_flow{i}") for i in range(self.flows)]

    def __call__(self, h, mask, w=None, rng=None, *, reverse: bool = False,
                 noise_scale: float = 1.0, deterministic: bool = True):
        h = jax.lax.stop_gradient(h)
        h = self.pre(h)
        h = self.convs(h, mask, deterministic=deterministic)
        h = self.proj(h) * mask[..., None]
        if rng is None:
            rng = jax.random.PRNGKey(0)

        if reverse:
            z = jax.random.normal(
                rng, (h.shape[0], h.shape[1], 2)) * noise_scale
            # inverse of (aff -> [flow, flip] x n): reference drops the
            # final flip (duration_predictor.py flows = flows[:-2] +
            # [flows[-1]])
            for i, flow in enumerate(reversed(self.conv_flows)):
                if i > 0:
                    z = z[..., ::-1]  # unflip between couplings
                z = flow(z, mask, g=h, reverse=True)
            z = self.aff(z, mask, reverse=True)
            logw = z[..., 0]
            return jnp.where(mask, logw, 0.0)

        assert w is not None, "training path needs durations"
        w = w.astype(h.dtype)[..., None] * mask[..., None]  # (B, T, 1)
        r_eq, r_flows = jax.random.split(rng)

        # posterior: q(u, nu | d, h)
        hw = self.post_pre(w)
        hw = self.post_convs(hw, mask, deterministic=deterministic)
        hw = self.post_proj(hw) * mask[..., None]
        e_q = jax.random.normal(
            r_eq, (w.shape[0], w.shape[1], 2)) * mask[..., None]
        z_q = e_q
        logdet_q = jnp.zeros((w.shape[0],))
        z_q, ld = self.post_aff(z_q, mask)
        logdet_q += ld
        for flow in self.post_conv_flows:
            z_q, ld = flow(z_q, mask, g=h + hw)
            logdet_q += ld
            z_q = z_q[..., ::-1]
        z_u, z1 = z_q[..., :1], z_q[..., 1:]
        u = jax.nn.sigmoid(z_u) * mask[..., None]
        z0 = (w - u) * mask[..., None]
        # logdet of u = sigmoid(z_u): log sig(z) + log sig(-z)
        logdet_q += jnp.sum(jnp.where(
            mask[..., None],
            jax.nn.log_sigmoid(z_u) + jax.nn.log_sigmoid(-z_u),
            0.0), axis=(1, 2))
        logq = jnp.sum(jnp.where(
            mask[..., None], -0.5 * (math.log(2 * math.pi) + e_q ** 2),
            0.0), axis=(1, 2)) - logdet_q

        # main flows on z = [log z0, z1]
        logdet_tot = jnp.zeros((w.shape[0],))
        z0, ld = log_flow(z0, mask)
        logdet_tot += ld
        z = jnp.concatenate([z0, z1], axis=-1)
        z, ld = self.aff(z, mask)
        logdet_tot += ld
        for i, flow in enumerate(self.conv_flows):
            z, ld = flow(z, mask, g=h)
            logdet_tot += ld
            if i < self.flows - 1:
                z = z[..., ::-1]
        nll = jnp.sum(jnp.where(
            mask[..., None], 0.5 * (math.log(2 * math.pi) + z ** 2),
            0.0), axis=(1, 2)) - logdet_tot
        return nll + logq  # (B,)
