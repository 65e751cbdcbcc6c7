"""Diffusion-policy training on rendered rollout data.

DDPM epsilon-prediction training (stage 5 of the reference pipeline,
`/root/reference/README.md:87-88`): sample a diffusion timestep, noise
the ground-truth action sequence, regress the noise conditioned on the
(images, proprioception) observation window. Data-parallel over the
'data' mesh axis via sharded batches (GSPMD all-reduces the grads).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from robosimgs_tpu.policy.diffusion import (DiffusionPolicy,
                                            DiffusionPolicyConfig,
                                            NoiseSchedule, sample_actions)


@dataclasses.dataclass(frozen=True)
class PolicyTrainConfig:
    policy: DiffusionPolicyConfig = DiffusionPolicyConfig()
    lr: float = 1e-4
    weight_decay: float = 1e-6
    warmup_steps: int = 500
    total_steps: int = 50_000
    batch_size: int = 64
    ema_decay: float = 0.995
    # train-time image augmentation (clutter/domain-randomization
    # robustness): per-sample random shift (wrap-roll, +-shift_px) and
    # brightness/contrast jitter, applied identically to every frame of
    # an observation window inside the jitted step. Eval stays clean.
    augment: bool = False
    aug_shift_px: int = 4
    aug_color: float = 0.2


@dataclasses.dataclass
class RolloutDataset:
    """In-memory (images, states, actions) episodes with window sampling.

    images:  (N, H, W, 3) float32   — frames of all episodes concatenated
    states:  (N, state_dim)
    actions: (N, action_dim)
    episode_ends: indices where episodes end (windows never cross them).
    """

    images: np.ndarray
    states: np.ndarray
    actions: np.ndarray
    episode_ends: List[int]

    def normalization(self) -> Dict[str, np.ndarray]:
        return {
            "action_min": self.actions.min(0),
            "action_max": self.actions.max(0),
            "state_mean": self.states.mean(0),
            "state_std": self.states.std(0) + 1e-6,
        }

    def windows(self, obs_horizon: int, horizon: int) -> np.ndarray:
        """Valid window start indices."""
        starts = []
        begin = 0
        for end in self.episode_ends:
            last = end - (obs_horizon + horizon) + 1
            if last > begin:
                starts.extend(range(begin, last))
            begin = end
        return np.asarray(starts, np.int64)

    def batch(self, rng: np.random.Generator, idx: np.ndarray,
              obs_horizon: int, horizon: int, norm: Dict) -> Tuple:
        obs_i = idx[:, None] + np.arange(obs_horizon)[None, :]
        act_i = idx[:, None] + obs_horizon - 1 + np.arange(horizon)[None, :]
        images = self.images[obs_i]
        states = (self.states[obs_i] - norm["state_mean"]) / norm["state_std"]
        span = np.maximum(norm["action_max"] - norm["action_min"], 1e-6)
        actions = (self.actions[act_i] - norm["action_min"]) / span * 2 - 1
        return images, states.astype(np.float32), actions.astype(np.float32)


class PolicyTrainer:
    def __init__(self, cfg: PolicyTrainConfig, dataset: RolloutDataset,
                 seed: int = 0):
        self.cfg = cfg
        self.dataset = dataset
        self.norm = dataset.normalization()
        self.model = DiffusionPolicy(cfg.policy)
        self.schedule = NoiseSchedule.make(cfg.policy)
        key = jax.random.PRNGKey(seed)
        pc = cfg.policy
        dummy_img = jnp.zeros((1, pc.obs_horizon, *pc.image_size, 3))
        dummy_state = jnp.zeros((1, pc.obs_horizon, pc.state_dim))
        dummy_act = jnp.zeros((1, pc.horizon, pc.action_dim))
        self.params = self.model.init(key, dummy_img, dummy_state, dummy_act,
                                      jnp.zeros((1,), jnp.int32))
        sched = optax.warmup_cosine_decay_schedule(
            0.0, cfg.lr, cfg.warmup_steps, max(cfg.total_steps, cfg.warmup_steps + 1))
        self.optimizer = optax.adamw(sched, weight_decay=cfg.weight_decay)
        self.opt_state = self.optimizer.init(self.params)
        # distinct buffers: params and ema are both donated by the step
        self.ema_params = jax.tree_util.tree_map(jnp.copy, self.params)
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed + 1)
        self.history: List[Dict] = []
        self._step = self._make_step()

    def _make_step(self):
        model, schedule, cfg = self.model, self.schedule, self.cfg

        def augment(key, images):
            b = images.shape[0]
            k1, k2, k3 = jax.random.split(key, 3)
            sp = cfg.aug_shift_px
            shifts = jax.random.randint(k1, (b, 2), -sp, sp + 1)
            # same shift/color for every frame of a window (temporal
            # consistency keeps state-action alignment intact)
            imgs = jax.vmap(
                lambda im, s: jnp.roll(im, (s[0], s[1]), axis=(1, 2))
            )(images, shifts)
            bright = 1.0 + cfg.aug_color * jax.random.uniform(
                k2, (b, 1, 1, 1, 1), minval=-1.0, maxval=1.0)
            contr = 1.0 + cfg.aug_color * jax.random.uniform(
                k3, (b, 1, 1, 1, 1), minval=-1.0, maxval=1.0)
            mean = jnp.mean(imgs, axis=(2, 3), keepdims=True)
            return jnp.clip((imgs - mean) * contr + mean * bright, 0.0, 1.0)

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def step(params, opt_state, ema, key, images, states, actions):
            key, k1, k2, k3 = jax.random.split(key, 4)
            if cfg.augment:
                images = augment(k3, images)
            b = actions.shape[0]
            t = jax.random.randint(k1, (b,), 0, cfg.policy.diffusion_steps)
            noise = jax.random.normal(k2, actions.shape)
            noisy = schedule.add_noise(actions, noise, t)

            def loss_fn(p):
                pred = model.apply(p, images, states, noisy, t)
                return jnp.mean((pred - noise) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            ema = jax.tree_util.tree_map(
                lambda e, p: cfg.ema_decay * e + (1 - cfg.ema_decay) * p,
                ema, params)
            return params, opt_state, ema, key, loss

        return step

    def run(self, steps: int, log_every: int = 100, progress: bool = True):
        pc = self.cfg.policy
        starts = self.dataset.windows(pc.obs_horizon, pc.horizon)
        t0 = time.time()
        for i in range(steps):
            idx = self.rng.choice(starts, size=self.cfg.batch_size)
            images, states, actions = self.dataset.batch(
                self.rng, idx, pc.obs_horizon, pc.horizon, self.norm)
            self.params, self.opt_state, self.ema_params, self.key, loss = \
                self._step(self.params, self.opt_state, self.ema_params,
                           self.key, jnp.asarray(images), jnp.asarray(states),
                           jnp.asarray(actions))
            if i % log_every == 0:
                row = {"step": i, "loss": float(loss),
                       "elapsed": time.time() - t0}
                self.history.append(row)
                if progress:
                    print(f"[{i:6d}] loss={row['loss']:.4f} "
                          f"({row['elapsed']:.1f}s)")

    def predict(self, images: np.ndarray, states: np.ndarray,
                n_steps: Optional[int] = 16) -> np.ndarray:
        """Sample an action sequence and denormalize to action units."""
        s = ((states - self.norm["state_mean"]) / self.norm["state_std"]
             ).astype(np.float32)
        self.key, sub = jax.random.split(self.key)
        acts = sample_actions(self.model, self.ema_params, self.schedule,
                              jnp.asarray(images), jnp.asarray(s), sub,
                              n_steps=n_steps)
        span = np.maximum(self.norm["action_max"] - self.norm["action_min"], 1e-6)
        return (np.asarray(acts) + 1) / 2 * span + self.norm["action_min"]
