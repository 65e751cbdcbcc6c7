"""Diffusion Policy for visuomotor control (pipeline stage 5).

The reference pipeline trains a Diffusion Policy on the simulated data
(`/root/reference/README.md:30,87-88` — code unreleased upstream;
SURVEY.md §0). This is a TPU-native implementation of the standard
receding-horizon action-diffusion recipe: a vision+proprioception
encoder conditions a noise-prediction network over an action-sequence
horizon; training is DDPM epsilon-prediction; inference runs the
reverse process (DDPM or DDIM) from Gaussian noise.

Design choices for TPU: the observation encoder is a strided CNN in
NHWC (XLA-native convs on MXU), the denoiser is a residual MLP over the
flattened action horizon with FiLM conditioning on (obs embedding,
diffusion timestep) — large batched matmuls, static shapes everywhere;
the full K-step sampling loop is one `lax.scan` under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DiffusionPolicyConfig:
    action_dim: int = 7
    horizon: int = 16                 # predicted action steps
    obs_horizon: int = 2              # stacked observation frames
    image_size: Tuple[int, int] = (96, 96)
    state_dim: int = 7                # proprioception
    embed_dim: int = 256
    hidden_dim: int = 512
    n_blocks: int = 4
    diffusion_steps: int = 100
    beta_start: float = 1e-4
    beta_end: float = 0.02
    # spatial-softmax visual head (the real Diffusion Policy's choice:
    # ResNet + spatial softmax): per-channel soft-argmax keypoints
    # instead of global average pooling. GAP dilutes the object signal
    # under scene clutter (r2: cluttered frames scored 2-3/8); keypoints
    # let the encoder LOCATE the object instead of averaging over it.
    spatial_softmax: bool = False


def cosine_time_embedding(t: jax.Array, dim: int) -> jax.Array:
    """Sinusoidal timestep embedding (t in [0, T))."""
    half = dim // 2
    freqs = jnp.exp(-np.log(10000.0) * jnp.arange(half) / half)
    ang = t.astype(jnp.float32)[..., None] * freqs
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], -1)


class ObsEncoder(nn.Module):
    """Strided CNN over stacked camera frames + proprioception MLP."""

    cfg: DiffusionPolicyConfig

    @nn.compact
    def __call__(self, images: jax.Array, state: jax.Array) -> jax.Array:
        # images: (B, obs_horizon, H, W, 3); state: (B, obs_horizon, state_dim)
        b = images.shape[0]
        x = images.reshape(b, *images.shape[2:4], -1)  # stack frames in channels
        for feat in (32, 64, 128, 256):
            x = nn.Conv(feat, (3, 3), strides=(2, 2))(x)
            x = nn.gelu(x)
        if self.cfg.spatial_softmax:
            # per-channel soft-argmax keypoints: (B, H', W', C) ->
            # (B, 2C) expected (x, y) under a per-channel spatial
            # softmax with a learned temperature
            bh, hh, wh, ch = x.shape
            logit_temp = self.param("ss_log_temp", nn.initializers.zeros,
                                    (1,))
            flat = x.reshape(bh, hh * wh, ch) * jnp.exp(logit_temp)
            att = jax.nn.softmax(flat, axis=1)
            ys, xs = jnp.meshgrid(jnp.linspace(-1, 1, hh),
                                  jnp.linspace(-1, 1, wh), indexing="ij")
            pos = jnp.stack([xs.reshape(-1), ys.reshape(-1)], 1)  # (HW, 2)
            kp = jnp.einsum("bpc,pk->bck", att, pos)              # (B, C, 2)
            x = kp.reshape(bh, 2 * ch)
        else:
            x = jnp.mean(x, axis=(1, 2))               # global average pool
        s = nn.Dense(self.cfg.embed_dim)(state.reshape(b, -1))
        x = jnp.concatenate([x, nn.gelu(s)], -1)
        return nn.Dense(self.cfg.embed_dim)(x)


class FiLMBlock(nn.Module):
    hidden_dim: int

    @nn.compact
    def __call__(self, x: jax.Array, cond: jax.Array) -> jax.Array:
        h = nn.Dense(self.hidden_dim)(x)
        scale = nn.Dense(self.hidden_dim)(cond)
        shift = nn.Dense(self.hidden_dim)(cond)
        h = nn.gelu(nn.LayerNorm()(h) * (1 + scale) + shift)
        h = nn.Dense(x.shape[-1])(h)
        return x + h


class Denoiser(nn.Module):
    """Residual FiLM-MLP epsilon-predictor over the action horizon."""

    cfg: DiffusionPolicyConfig

    @nn.compact
    def __call__(self, noisy_actions: jax.Array, t: jax.Array,
                 obs_embed: jax.Array) -> jax.Array:
        cfg = self.cfg
        b = noisy_actions.shape[0]
        t_emb = nn.Dense(cfg.embed_dim)(cosine_time_embedding(t, cfg.embed_dim))
        cond = jnp.concatenate([obs_embed, nn.gelu(t_emb)], -1)
        cond = nn.gelu(nn.Dense(cfg.embed_dim)(cond))
        x = nn.Dense(cfg.hidden_dim)(noisy_actions.reshape(b, -1))
        for _ in range(cfg.n_blocks):
            x = FiLMBlock(cfg.hidden_dim)(x, cond)
        out = nn.Dense(cfg.horizon * cfg.action_dim)(x)
        return out.reshape(b, cfg.horizon, cfg.action_dim)


class DiffusionPolicy(nn.Module):
    cfg: DiffusionPolicyConfig

    def setup(self):
        self.encoder = ObsEncoder(self.cfg)
        self.denoiser = Denoiser(self.cfg)

    def __call__(self, images, state, noisy_actions, t):
        return self.denoiser(noisy_actions, t, self.encoder(images, state))

    def encode(self, images, state):
        return self.encoder(images, state)

    def denoise(self, noisy_actions, t, obs_embed):
        return self.denoiser(noisy_actions, t, obs_embed)


@dataclasses.dataclass
class NoiseSchedule:
    """DDPM linear-beta schedule with precomputed alphas."""

    betas: jax.Array
    alphas_cumprod: jax.Array

    @staticmethod
    def make(cfg: DiffusionPolicyConfig) -> "NoiseSchedule":
        betas = jnp.linspace(cfg.beta_start, cfg.beta_end, cfg.diffusion_steps)
        return NoiseSchedule(betas=betas,
                             alphas_cumprod=jnp.cumprod(1.0 - betas))

    def add_noise(self, actions, noise, t):
        ac = self.alphas_cumprod[t][..., None, None]
        return jnp.sqrt(ac) * actions + jnp.sqrt(1.0 - ac) * noise


def sample_actions(model: DiffusionPolicy, params, schedule: NoiseSchedule,
                   images, state, key: jax.Array,
                   n_steps: Optional[int] = None) -> jax.Array:
    """Reverse diffusion from Gaussian noise: (B, horizon, action_dim).

    The full loop is a lax.scan (one compile); n_steps < T runs the
    strided DDIM-style schedule.
    """
    cfg = model.cfg
    T = cfg.diffusion_steps
    n_steps = n_steps or T
    ts = jnp.linspace(T - 1, 0, n_steps).round().astype(jnp.int32)
    obs_embed = model.apply(params, images, state, method=DiffusionPolicy.encode)
    b = images.shape[0]
    key, sub = jax.random.split(key)
    x = jax.random.normal(sub, (b, cfg.horizon, cfg.action_dim))

    alphas = 1.0 - schedule.betas
    ac = schedule.alphas_cumprod

    def step(carry, idx):
        x, key = carry
        t = ts[idx]
        t_next = jnp.where(idx + 1 < n_steps, ts[jnp.minimum(idx + 1, n_steps - 1)], -1)
        eps = model.apply(params, x, jnp.full((b,), t), obs_embed,
                          method=DiffusionPolicy.denoise)
        ac_t = ac[t]
        x0 = (x - jnp.sqrt(1 - ac_t) * eps) / jnp.sqrt(ac_t)
        # clip to the normalized action range (actions are min-max
        # scaled to [-1, 1]): the diffusion_policy convention. A looser
        # clip lets per-step x0 estimates drift outside the data range
        # and systematically undershoots boundary actions (e.g. a
        # saturating joint limit at exactly +1).
        x0 = jnp.clip(x0, -1.0, 1.0)
        ac_next = jnp.where(t_next >= 0, ac[jnp.maximum(t_next, 0)], 1.0)
        # DDIM deterministic update toward t_next
        x_new = jnp.sqrt(ac_next) * x0 + jnp.sqrt(1 - ac_next) * eps
        return (x_new, key), None

    (x, _), _ = jax.lax.scan(step, (x, key), jnp.arange(n_steps))
    return x
