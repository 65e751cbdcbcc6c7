import jax
import jax.numpy as jnp
import numpy as np

from robosimgs_tpu.policy.diffusion import (DiffusionPolicy,
                                            DiffusionPolicyConfig,
                                            NoiseSchedule,
                                            cosine_time_embedding,
                                            sample_actions)
from robosimgs_tpu.policy.trainer import (PolicyTrainConfig, PolicyTrainer,
                                          RolloutDataset)

SMALL = DiffusionPolicyConfig(action_dim=2, horizon=4, obs_horizon=1,
                              image_size=(24, 24), state_dim=2,
                              embed_dim=32, hidden_dim=64, n_blocks=2,
                              diffusion_steps=20)


def toy_dataset(n_eps=6, ep_len=24, seed=0):
    """Actions deterministically encode the observation (a colored square
    whose position/brightness equals the state); learnable mapping."""
    rng = np.random.default_rng(seed)
    images, states, actions, ends = [], [], [], []
    count = 0
    for _ in range(n_eps):
        phase = rng.uniform(0, 2 * np.pi)
        for t in range(ep_len):
            s = np.array([np.sin(0.3 * t + phase), np.cos(0.3 * t + phase)],
                         np.float32)
            img = np.zeros((24, 24, 3), np.float32)
            cx = int((s[0] + 1) / 2 * 20) + 2
            cy = int((s[1] + 1) / 2 * 20) + 2
            img[cy - 2:cy + 2, cx - 2:cx + 2] = 1.0
            images.append(img)
            states.append(s)
            actions.append(0.8 * s)      # action = scaled state
        count += ep_len
        ends.append(count)
    return RolloutDataset(images=np.stack(images), states=np.stack(states),
                          actions=np.stack(actions), episode_ends=ends)


def test_time_embedding_shape():
    e = cosine_time_embedding(jnp.arange(5), 16)
    assert e.shape == (5, 16)
    assert np.isfinite(np.asarray(e)).all()


def test_noise_schedule_endpoints():
    s = NoiseSchedule.make(SMALL)
    ac = np.asarray(s.alphas_cumprod)
    assert 0 < ac[-1] < ac[0] < 1.0
    # t=0 barely noises; t=T-1 mostly noise
    x = jnp.ones((1, 4, 2))
    n = jnp.zeros((1, 4, 2))
    near = np.asarray(s.add_noise(x, n, jnp.array([0])))
    np.testing.assert_allclose(near, np.sqrt(ac[0]) * np.ones_like(near), atol=1e-6)


def test_model_forward_shapes():
    model = DiffusionPolicy(SMALL)
    key = jax.random.PRNGKey(0)
    img = jnp.zeros((3, 1, 24, 24, 3))
    st = jnp.zeros((3, 1, 2))
    act = jnp.zeros((3, 4, 2))
    params = model.init(key, img, st, act, jnp.zeros((3,), jnp.int32))
    out = model.apply(params, img, st, act, jnp.zeros((3,), jnp.int32))
    assert out.shape == (3, 4, 2)


def test_sampling_shapes_and_determinism():
    model = DiffusionPolicy(SMALL)
    key = jax.random.PRNGKey(0)
    img = jnp.zeros((2, 1, 24, 24, 3))
    st = jnp.zeros((2, 1, 2))
    params = model.init(key, img, st, jnp.zeros((2, 4, 2)),
                        jnp.zeros((2,), jnp.int32))
    s = NoiseSchedule.make(SMALL)
    a1 = sample_actions(model, params, s, img, st, jax.random.PRNGKey(7),
                        n_steps=5)
    a2 = sample_actions(model, params, s, img, st, jax.random.PRNGKey(7),
                        n_steps=5)
    assert a1.shape == (2, 4, 2)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-6)


def test_dataset_windows_respect_episodes():
    ds = toy_dataset(n_eps=2, ep_len=10)
    w = ds.windows(obs_horizon=2, horizon=4)
    # each episode of 10 allows starts 0..4 (2+4=6 consumed)
    assert len(w) == 2 * 5
    assert (w < 20).all()
    assert not ((w > 4) & (w < 10)).any()  # no window crosses the boundary


def test_policy_learns_toy_task():
    """DDPM training on the toy task must beat the untrained policy by a
    wide margin at predicting the (state-determined) actions."""
    ds = toy_dataset()
    cfg = PolicyTrainConfig(policy=SMALL, lr=3e-3, warmup_steps=10,
                            total_steps=300, batch_size=32, ema_decay=0.9)
    tr = PolicyTrainer(cfg, ds, seed=0)

    obs_img = ds.images[:4][:, None]
    obs_state = ds.states[:4][:, None]
    target = 0.8 * ds.states[:4]

    before = tr.predict(obs_img, obs_state, n_steps=10)
    err_before = np.abs(before[:, 0] - target).mean()
    tr.run(steps=300, log_every=100, progress=False)
    after = tr.predict(obs_img, obs_state, n_steps=10)
    err_after = np.abs(after[:, 0] - target).mean()
    assert err_after < err_before * 0.5, (err_before, err_after)
    assert err_after < 0.25, err_after
    assert tr.history[-1]["loss"] < tr.history[0]["loss"]


def test_closed_loop_eval(tmp_path):
    """A scripted 'policy' opens the box lid in the renderer loop."""
    from robosimgs_tpu.core.camera import Camera
    from robosimgs_tpu.core.types import Gaussians
    from robosimgs_tpu.policy.rollout_eval import run_closed_loop
    from robosimgs_tpu.render.config import RenderConfig
    from robosimgs_tpu.scenegen.rollout import ArticulatedObject
    from robosimgs_tpu.utils.meshio import Mesh, save_mesh
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_scenegen import BOX_URDF, box_mesh

    save_mesh(str(tmp_path / "body.glb"), box_mesh())
    save_mesh(str(tmp_path / "lid.glb"), box_mesh((0.5, 0.5, 0.05)))
    (tmp_path / "robot.urdf").write_text(BOX_URDF)
    obj = ArticulatedObject.from_urdf(str(tmp_path / "robot.urdf"))
    bg = Gaussians.random(jax.random.PRNGKey(0), 20, sh_degree=1, extent=2.0)
    cams = [Camera.look_at([3, 0.5, 1.5], [0, 0, 0], [0, 0, 1], 60.0, 32, 32)]

    def policy(images, states):
        # scripted: always command +0.2 rad increments toward open
        q = states[0, -1]
        return np.tile(q + 0.2, (1, 4, 1))

    res = run_closed_loop(policy, bg, obj, cams, steps=6,
                          obs_horizon=2, actions_per_step=2,
                          target_q=np.array([1.2]),
                          cfg=RenderConfig(tile_capacity=128))
    assert res.joint_history.shape == (7, 1)
    # lid opened monotonically and clamped at the limit
    assert (np.diff(res.joint_history[:, 0]) >= -1e-6).all()
    assert res.joint_history[-1, 0] <= 1.57 + 1e-6
    assert res.frames.shape[0] == 6
    assert res.final_error is not None

    # chunker-driven execution (temporal ensembling) reaches the target
    # through the same renderer loop
    from robosimgs_tpu.policy.inference import ActionChunker

    H = 8

    def chunk_policy(images, states):
        q = states[0, -1]
        ks = 0.2 * (1 + np.arange(H, dtype=np.float32))[:, None]
        return (q[None] + ks)[None]

    ch = ActionChunker(chunk_policy, obs_horizon=2, horizon=H,
                       ensemble=True, ensemble_alpha=0.3)
    res2 = run_closed_loop(chunk_policy, bg, obj, cams, steps=6,
                           obs_horizon=2, actions_per_step=2,
                           target_q=np.array([1.2]),
                           cfg=RenderConfig(tile_capacity=128), chunker=ch)
    assert res2.joint_history.shape == (7, 1)
    assert (np.diff(res2.joint_history[:, 0]) >= -1e-6).all()
    assert ch.n_inferences == 6
    assert res2.final_error < 1e-5


def test_action_chunker_receding_horizon():
    from robosimgs_tpu.policy.inference import ActionChunker

    calls = {"n": 0}
    horizon, dof = 8, 2

    def policy_fn(images, states):
        # encode the newest state into the chunk so replan points are
        # observable: action[k] = newest_state + k
        calls["n"] += 1
        base = states[0, -1]
        ks = np.arange(horizon, dtype=np.float32)[:, None]
        return (base[None] + ks)[None]

    ch = ActionChunker(policy_fn, obs_horizon=2, horizon=horizon,
                       replan_every=3)
    img = np.zeros((4, 4, 3), np.float32)
    acts = [ch.step(img, np.full((dof,), float(t))) for t in range(7)]
    # replans at t=0 (state 0), t=3 (state 3), t=6 (state 6)
    assert calls["n"] == 3 and ch.n_inferences == 3
    expect = [0, 1, 2, 3 + 0, 3 + 1, 3 + 2, 6 + 0]
    np.testing.assert_allclose(np.stack(acts)[:, 0], expect)
    ch.reset()
    assert ch.step(img, np.full((dof,), 5.0))[0] == 5.0


def test_action_chunker_temporal_ensemble():
    from robosimgs_tpu.policy.inference import ActionChunker

    horizon, dof = 4, 1

    def policy_fn(images, states):
        # chunk born at state s predicts constant s — ensembling at step
        # t must average over the live chunks' birth states
        base = states[0, -1]
        return np.tile(base[None], (horizon, 1))[None]

    ch = ActionChunker(policy_fn, obs_horizon=1, horizon=horizon,
                       ensemble=True, ensemble_alpha=0.5)
    img = np.zeros((2, 2, 3), np.float32)
    a0 = ch.step(img, np.array([0.0]))
    np.testing.assert_allclose(a0, [0.0])
    a1 = ch.step(img, np.array([1.0]))
    # chunks alive at t=1: born at 0 (age 1, w=e^-0.5) and 1 (age 0, w=1)
    w_old, w_new = np.exp(-0.5), 1.0
    np.testing.assert_allclose(
        a1, [(0.0 * w_old + 1.0 * w_new) / (w_old + w_new)], rtol=1e-6)
    assert ch.n_inferences == 2
    # after horizon steps the t=0 chunk must have expired (_t is
    # post-incremented, so the last executed step is _t - 1)
    for t in range(2, horizon + 1):
        ch.step(img, np.array([float(t)]))
    last_t = ch._t - 1
    assert all(last_t - s < horizon for s, _ in ch._chunks)
    assert min(s for s, _ in ch._chunks) > 0
