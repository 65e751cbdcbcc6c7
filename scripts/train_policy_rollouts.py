"""Stage-5 at scale: diffusion policy trained on RENDERED rollouts.

End-to-end run of the reference pipeline's policy stage on data that
actually comes from this framework's renderer (the reference trains
Diffusion Policy on sim renders of the articulated object,
`/root/reference/README.md:87-92`):

  1. articulate the reference's openbox parts with OUR pipeline
     (HingeDetector + ArticulationPipeline -> URDF), as the golden
     parity test does;
  2. render a dataset of lid-opening episodes (randomized start angle,
     speed, camera jitter) with the tiled rasterizer + mesh z-buffer
     compositor — thousands of frames, not a toy grid;
  3. train DiffusionPolicy on (image, joint-state) windows -> action
     chunks;
  4. closed-loop eval: the trained policy drives the lid inside the
     renderer via run_closed_loop from randomized starts; success =
     final angle within tolerance of the open target.

Writes dataset/eval stats to <out>/results.json and sample frames.

Run: bash scripts/tpu_run.sh scripts/train_policy_rollouts.py [out_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from wedgeguard import start_wedge_guard  # noqa: E402

_pet = start_wedge_guard()   # no-op on JAX_PLATFORMS=cpu
OPENBOX = "/root/reference/Articulation/openbox_output"


def build_openbox(out_dir):
    """Articulate the reference's shipped parts with our pipeline."""
    from robosimgs_tpu.artic.pipeline import ArticulationPipeline, URDFParams
    from robosimgs_tpu.utils.meshio import load_mesh

    body = load_mesh(os.path.join(OPENBOX, "parts", "body.glb"))
    lid = load_mesh(os.path.join(OPENBOX, "parts", "lid.glb"))
    params = URDFParams(object_type="box", lower=0.0, upper=1.57)
    pipe = ArticulationPipeline(lid, body)
    meta = pipe.generate(out_dir, params=params, movable_name="lid",
                        base_name="body")
    return meta["urdf_path"]


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    t0 = time.time()
    jax.jit(lambda x: (x * 3).sum())(jnp.ones((32, 32))).block_until_ready()
    print(f"probe {time.time()-t0:.1f}s backend={jax.default_backend()}",
          flush=True)

    from robosimgs_tpu.core.camera import Camera
    from robosimgs_tpu.core.types import Gaussians
    from robosimgs_tpu.policy.diffusion import DiffusionPolicyConfig
    from robosimgs_tpu.policy.rollout_eval import run_closed_loop
    from robosimgs_tpu.policy.trainer import (PolicyTrainConfig,
                                              PolicyTrainer, RolloutDataset)
    from robosimgs_tpu.render.config import RenderConfig
    from robosimgs_tpu.scenegen.rollout import (ArticulatedObject,
                                                render_rollout)

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/policy_rollouts"
    os.makedirs(out, exist_ok=True)

    urdf = build_openbox(out)
    obj = ArticulatedObject.from_urdf(urdf)
    print(f"articulated openbox -> {urdf} (dof={obj.model.dof})", flush=True)
    q_open = 1.57

    # background scene: structured gaussian clutter around the object
    # fold the retry attempt into a static shape: wedges are
    # program-keyed (CLAUDE.md) and a retry must not resubmit the
    # poisoned program
    _att = int(os.environ.get("TPU_RUN_ATTEMPT", "0") or 0)
    cfg = RenderConfig(tile_capacity=256, max_tiles_per_gaussian=8 + _att)

    # frame the camera from the posed object's bounds (parts are
    # hinge-recentered by the pipeline; scan scale is arbitrary)
    verts = np.concatenate([np.asarray(v) for v, _, _ in obj.posed_meshes(
        np.array([0.8], np.float32))])
    center = 0.5 * (verts.min(0) + verts.max(0))
    radius = float(np.linalg.norm(verts - center, axis=1).max())
    base_eye = center + radius * np.array([1.1, 0.7, 0.8])
    print(f"object center {center.round(3)} radius {radius:.3f}", flush=True)

    # POLICY_CLUTTER=1 (VERDICT r4 item 5): clutter is NOT pushed out of
    # the object zone and is RESAMPLED per episode (fresh layouts at
    # eval too) — the configuration that scored 2-3/8 in r2. The
    # matching robustness levers (spatial-softmax encoder + train-time
    # shift/color augmentation) are switched on below in this mode.
    clutter = os.environ.get("POLICY_CLUTTER", "0") == "1"

    def make_bg(seed: int):
        bg = Gaussians.random(jax.random.PRNGKey(seed), 2500, sh_degree=1,
                              extent=3.0 * radius)
        m = np.asarray(bg.means)
        if clutter:
            # centered on the scene, no clear zone: splats can sit
            # between camera and object and partially veil it
            return bg.replace(means=jnp.asarray(m + center, jnp.float32))
        d = np.linalg.norm(m, axis=1, keepdims=True)
        push = np.maximum(1.6 * radius, d) / np.maximum(d, 1e-6)
        return bg.replace(means=jnp.asarray(m * push + center, jnp.float32))

    bg = make_bg(3)

    # POLICY_RES=96 runs the policy at its native observation size
    # (VERDICT r2 #8); default keeps the CPU-friendly 64
    RES = int(os.environ.get("POLICY_RES", 64))
    n_eps = int(os.environ.get("POLICY_EPS", 64))
    ep_len = 40
    rng = np.random.default_rng(0)
    cache = os.path.join(out, "dataset_clutter.npz" if clutter
                         else "dataset.npz")
    if os.path.exists(cache):
        # resume: reuse the rendered dataset (rendering dominates CPU
        # wall-clock; training/eval tweaks shouldn't pay for it again)
        z = np.load(cache)
        ds = RolloutDataset(images=z["images"], states=z["states"],
                            actions=z["actions"],
                            episode_ends=list(z["ends"]))
        t_render = 0.0
        print(f"loaded cached dataset {cache}: "
              f"{ds.images.shape[0]} frames", flush=True)
    images, states, actions, ends = [], [], [], []
    t_render0 = time.time()
    count = 0
    for e in range(n_eps if not os.path.exists(cache) else 0):
        _pet()
        q0 = rng.uniform(0.0, 0.5)
        speed = rng.uniform(0.03, 0.08)
        eye = base_eye + rng.normal(0, 0.05 * radius, 3)
        cam = Camera.look_at(eye, center, [0, 0, 1], 55.0, RES, RES)
        # scripted expert: saturating ramp toward open + small noise
        qs = [q0]
        for t in range(ep_len):
            step = speed + rng.normal(0, 0.004)
            qs.append(min(q_open, qs[-1] + max(step, 0.0)))
        traj = np.asarray(qs, np.float32)[:, None]          # (T+1, 1)
        ep_bg = make_bg(100 + e) if clutter else bg
        frames = render_rollout(ep_bg, [obj], traj[:-1], [cam], cfg=cfg,
                                impl="tiled" if jax.default_backend() == "tpu"
                                else "reference")
        frames = np.asarray(frames[:, 0], np.float32)       # (T, H, W, 3)
        if frames.dtype == np.uint8:
            frames = frames.astype(np.float32) / 255.0
        elif frames.max() > 1.5:
            frames = frames / 255.0
        images.append(frames)
        states.append(traj[:-1])
        actions.append(traj[1:])                            # next target q
        count += ep_len
        ends.append(count)
        if e == 0:
            from PIL import Image
            for t in (0, ep_len // 2, ep_len - 1):
                Image.fromarray(
                    (np.clip(frames[t], 0, 1) * 255).astype(np.uint8)
                ).save(os.path.join(out, f"ep0_t{t:02d}.png"))
        if (e + 1) % 8 == 0:
            print(f"  rendered episode {e+1}/{n_eps} "
                  f"({time.time()-t_render0:.1f}s)", flush=True)
    if not os.path.exists(cache):
        t_render = time.time() - t_render0
        ds = RolloutDataset(images=np.concatenate(images),
                            states=np.concatenate(states).astype(np.float32),
                            actions=np.concatenate(actions).astype(np.float32),
                            episode_ends=ends)
        np.savez_compressed(cache, images=ds.images, states=ds.states,
                            actions=ds.actions,
                            ends=np.asarray(ds.episode_ends))
    n_frames = ds.images.shape[0]
    fps = n_frames / t_render if t_render > 0 else float("inf")
    print(f"dataset: {n_frames} frames ({n_eps} eps x {ep_len}) "
          f"@{RES}x{RES} in {t_render:.1f}s ({fps:.1f} frames/s)",
          flush=True)

    pc = DiffusionPolicyConfig(action_dim=1, horizon=8, obs_horizon=2,
                               image_size=(RES, RES), state_dim=1,
                               embed_dim=64, hidden_dim=128, n_blocks=3,
                               diffusion_steps=50, spatial_softmax=clutter)
    tcfg = PolicyTrainConfig(policy=pc, lr=1e-3, warmup_steps=100,
                             total_steps=int(os.environ.get(
                                 "POLICY_STEPS", 8000)), batch_size=64,
                             ema_decay=0.995, augment=clutter)
    tr = PolicyTrainer(tcfg, ds, seed=0)
    _pet()
    t_train0 = time.time()
    for chunk in range(0, tcfg.total_steps, 500):
        tr.run(steps=min(500, tcfg.total_steps - chunk), log_every=100,
               progress=True)
        _pet()
    t_train = time.time() - t_train0
    loss0 = tr.history[0]["loss"]
    loss1 = tr.history[-1]["loss"]
    sps = tcfg.total_steps / t_train
    print(f"trained {tcfg.total_steps} steps in {t_train:.1f}s "
          f"({sps:.1f} steps/s), loss {loss0:.4f} -> {loss1:.4f}",
          flush=True)

    # save the trained policy (flax bytes + normalization stats)
    import flax.serialization
    with open(os.path.join(out, "policy.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(tr.ema_params))
    np.savez(os.path.join(out, "policy_norm.npz"), **tr.norm)

    # closed-loop eval from randomized starts: receding-horizon AND
    # ACT temporal-ensembling execution (policy/inference.ActionChunker),
    # full 50-step DDPM sampling at eval time
    from robosimgs_tpu.policy.inference import ActionChunker
    policy50 = lambda im, s: tr.predict(im, s, n_steps=50)
    n_eval, steps = 8, 40
    modes = {}
    t_eval0 = time.time()
    for mode in ("receding", "ensemble"):
        succ, finals = 0, []
        for i in range(n_eval):
            _pet()
            q0 = np.array([rng.uniform(0.0, 0.4)], np.float32)
            cam = Camera.look_at(base_eye, center, [0, 0, 1], 55.0,
                                 RES, RES)
            chunker = (ActionChunker(policy50, pc.obs_horizon, pc.horizon,
                                     ensemble=True, ensemble_alpha=0.3)
                       if mode == "ensemble" else None)
            # clutter mode: FRESH layouts at eval — the transfer test
            eval_bg = make_bg(1000 + i) if clutter else bg
            res = run_closed_loop(policy50, eval_bg, obj, [cam], steps=steps,
                                  obs_horizon=pc.obs_horizon,
                                  actions_per_step=4, q0=q0,
                                  target_q=np.array([q_open]), cfg=cfg,
                                  chunker=chunker)
            qf = float(res.joint_history[-1, 0])
            finals.append(qf)
            ok = abs(qf - q_open) < 0.15
            succ += ok
            print(f"  eval[{mode}] {i}: q0={float(q0[0]):.2f} -> "
                  f"q_final={qf:.3f} {'OK' if ok else 'MISS'}", flush=True)
        modes[mode] = {"success": succ,
                       "final_angles": [round(f, 3) for f in finals]}
    t_eval = time.time() - t_eval0

    results = {
        "clutter": clutter,
        "encoder": "spatial_softmax" if pc.spatial_softmax else "gap",
        "augment": tcfg.augment,
        "dataset": {"episodes": n_eps, "ep_len": ep_len, "res": RES,
                    "frames": int(n_frames), "render_s": round(t_render, 1),
                    "frames_per_s": round(n_frames / t_render, 1)
                    if t_render > 0 else None},
        "training": {"steps": tcfg.total_steps, "batch": tcfg.batch_size,
                     "seconds": round(t_train, 1),
                     "steps_per_s": round(sps, 2),
                     "loss_first": round(loss0, 4),
                     "loss_last": round(loss1, 4)},
        "closed_loop": {"episodes": n_eval, "steps": steps,
                        "target": q_open, "modes": modes,
                        "eval_s": round(t_eval, 1)},
    }
    with open(os.path.join(out, "results.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
