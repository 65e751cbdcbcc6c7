"""Multi-DOF policy generality: a 2-joint object through the same
rendered-rollout pipeline as scripts/train_policy_rollouts.py.

Object: a box BODY with a LID hinged at the back (+x axis) and a FLAP
hinged at the front (-x axis) — two independent revolute joints. The
scripted expert opens both at different randomized speeds; the
diffusion policy must predict a 2-dim action chunk from (image, 2-dof
state) windows, and closed-loop success requires BOTH joints within
tolerance of their targets.

Writes <out>/results.json. Run (CPU ok, TPU via scripts/tpu_run.sh):
    python scripts/train_policy_multidof.py [out_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from wedgeguard import start_wedge_guard  # noqa: E402

_pet = start_wedge_guard()   # no-op on JAX_PLATFORMS=cpu

URDF = """<?xml version="1.0"?>
<robot name="twojoint">
  <link name="body">
    <visual><geometry><mesh filename="body.glb" scale="1 1 1"/></geometry>
      <material name="m"><color rgba="0.75 0.65 0.45 1.0"/></material></visual>
    <inertial><mass value="0.5"/>
      <inertia ixx="0.01" ixy="0" ixz="0" iyy="0.01" iyz="0" izz="0.01"/>
    </inertial>
  </link>
  <link name="lid">
    <visual><geometry><mesh filename="lid.glb" scale="1 1 1"/></geometry>
      <material name="m2"><color rgba="0.35 0.75 0.4 1.0"/></material></visual>
    <inertial><mass value="0.2"/>
      <inertia ixx="0.01" ixy="0" ixz="0" iyy="0.01" iyz="0" izz="0.01"/>
    </inertial>
  </link>
  <link name="flap">
    <visual><geometry><mesh filename="flap.glb" scale="1 1 1"/></geometry>
      <material name="m3"><color rgba="0.4 0.45 0.85 1.0"/></material></visual>
    <inertial><mass value="0.1"/>
      <inertia ixx="0.01" ixy="0" ixz="0" iyy="0.01" iyz="0" izz="0.01"/>
    </inertial>
  </link>
  <joint name="lid_hinge" type="revolute">
    <parent link="body"/><child link="lid"/>
    <origin xyz="0 0.5 0.2" rpy="0 0 0"/>
    <axis xyz="1 0 0"/>
    <limit lower="0.0" upper="1.57" effort="5" velocity="2"/>
    <dynamics friction="0.5" damping="0.2"/>
  </joint>
  <joint name="flap_hinge" type="revolute">
    <parent link="body"/><child link="flap"/>
    <origin xyz="0 -0.5 0.2" rpy="0 0 0"/>
    <axis xyz="-1 0 0"/>
    <limit lower="0.0" upper="1.2" effort="5" velocity="2"/>
    <dynamics friction="0.5" damping="0.2"/>
  </joint>
</robot>"""


def box_mesh(size):
    import numpy as np

    from robosimgs_tpu.utils.meshio import Mesh
    sx, sy, sz = size
    v = np.array([[x, y, z] for x in (-sx, sx) for y in (-sy, sy)
                  for z in (-sz, sz)], np.float32)
    f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                  [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                  [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
    return Mesh(vertices=v, faces=f)


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
    from robosimgs_tpu.utils.meshio import save_mesh

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/policy_multidof"
    os.makedirs(out, exist_ok=True)
    save_mesh(os.path.join(out, "body.glb"), box_mesh((0.55, 0.5, 0.2)))
    # lid covers the back half of the top, flap the front half (no
    # overlap — coplanar overlap z-fights); each offset from its joint
    # frame so rotation is visible
    save_mesh(os.path.join(out, "lid.glb"),
              box_mesh((0.5, 0.28, 0.04)).translated([0, -0.28, 0.0]))
    save_mesh(os.path.join(out, "flap.glb"),
              box_mesh((0.5, 0.2, 0.04)).translated([0, 0.2, 0.0]))
    with open(os.path.join(out, "robot.urdf"), "w") as fh:
        fh.write(URDF)
    obj = ArticulatedObject.from_urdf(os.path.join(out, "robot.urdf"))
    dof = obj.model.dof
    assert dof == 2, dof
    targets_q = np.array([1.57, 1.2], np.float32)
    print(f"2-dof object: joints {[j.name for j in obj.model.movable]}",
          flush=True)

    center = np.array([0.0, 0.0, 0.3], np.float32)
    radius = 1.3
    base_eye = center + np.array([1.3, 0.3, 0.55], np.float32)
    bg = Gaussians.random(jax.random.PRNGKey(3), 2000, sh_degree=1,
                          extent=3.0 * radius)
    m = np.asarray(bg.means)
    d = np.linalg.norm(m, axis=1, keepdims=True)
    push = np.maximum(1.7 * radius, d) / np.maximum(d, 1e-6)
    bg = bg.replace(means=jnp.asarray(m * push + center, jnp.float32))

    cfg = RenderConfig(tile_capacity=256, max_tiles_per_gaussian=8)
    RES = 64
    n_eps, ep_len = 56, 36
    rng = np.random.default_rng(0)
    cache = os.path.join(out, "dataset.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        ds = RolloutDataset(images=z["images"], states=z["states"],
                            actions=z["actions"],
                            episode_ends=list(z["ends"]))
        print(f"loaded cached dataset: {ds.images.shape[0]} frames",
              flush=True)
    else:
        images, states, actions, ends = [], [], [], []
        t_render0 = time.time()
        count = 0
        for e in range(n_eps):
            _pet()
            q0 = rng.uniform(0.0, 0.4, 2).astype(np.float32)
            speed = rng.uniform(0.03, 0.09, 2)
            eye = base_eye + rng.normal(0, 0.04 * radius, 3)
            cam = Camera.look_at(eye, center, [0, 0, 1], 55.0, RES, RES)
            qs = [q0]
            for t in range(ep_len):
                step = speed + rng.normal(0, 0.004, 2)
                qs.append(np.minimum(targets_q,
                                     qs[-1] + np.maximum(step, 0.0)
                                     ).astype(np.float32))
            traj = np.stack(qs)                              # (T+1, 2)
            frames = render_rollout(
                bg, [obj], traj[:-1], [cam], cfg=cfg,
                impl="tiled" if jax.default_backend() == "tpu"
                else "reference")
            frames = np.asarray(frames[:, 0], np.float32)
            images.append(frames)
            states.append(traj[:-1])
            actions.append(traj[1:])
            count += ep_len
            ends.append(count)
            if e == 0:
                from PIL import Image
                for t in (0, ep_len - 1):
                    Image.fromarray((np.clip(frames[t], 0, 1) * 255
                                     ).astype(np.uint8)).save(
                        os.path.join(out, f"ep0_t{t:02d}.png"))
            if (e + 1) % 8 == 0:
                print(f"  rendered {e+1}/{n_eps} "
                      f"({time.time()-t_render0:.1f}s)", flush=True)
        ds = RolloutDataset(images=np.concatenate(images),
                            states=np.concatenate(states).astype(np.float32),
                            actions=np.concatenate(actions).astype(np.float32),
                            episode_ends=ends)
        np.savez_compressed(cache, images=ds.images, states=ds.states,
                            actions=ds.actions,
                            ends=np.asarray(ds.episode_ends))

    pc = DiffusionPolicyConfig(action_dim=2, horizon=8, obs_horizon=2,
                               image_size=(RES, RES), state_dim=2,
                               embed_dim=64, hidden_dim=128, n_blocks=3,
                               diffusion_steps=50)
    tcfg = PolicyTrainConfig(policy=pc, lr=1e-3, warmup_steps=100,
                             total_steps=7000, batch_size=64,
                             ema_decay=0.995)
    tr = PolicyTrainer(tcfg, ds, seed=0)
    _pet()
    t_train0 = time.time()
    for chunk in range(0, tcfg.total_steps, 500):
        tr.run(steps=min(500, tcfg.total_steps - chunk), log_every=250,
               progress=True)
        _pet()
    t_train = time.time() - t_train0
    print(f"trained {tcfg.total_steps} steps in {t_train:.1f}s, "
          f"loss {tr.history[0]['loss']:.4f} -> "
          f"{tr.history[-1]['loss']:.4f}", flush=True)

    policy50 = lambda im, s: tr.predict(im, s, n_steps=50)
    n_eval, steps = 8, 36
    succ, finals = 0, []
    t_eval0 = time.time()
    for i in range(n_eval):
        _pet()
        q0 = rng.uniform(0.0, 0.4, 2).astype(np.float32)
        cam = Camera.look_at(base_eye, center, [0, 0, 1], 55.0, RES, RES)
        res = run_closed_loop(policy50, bg, obj, [cam], steps=steps,
                              obs_horizon=pc.obs_horizon, actions_per_step=4,
                              q0=q0, target_q=targets_q, cfg=cfg)
        qf = res.joint_history[-1]
        finals.append([round(float(v), 3) for v in qf])
        ok = bool(np.all(np.abs(qf - targets_q) < 0.15))
        succ += ok
        print(f"  eval {i}: q0={q0.round(2).tolist()} -> "
              f"{qf.round(3).tolist()} {'OK' if ok else 'MISS'}", flush=True)

    results = {
        "object": {"dof": 2, "targets": targets_q.tolist()},
        "dataset": {"episodes": n_eps, "ep_len": ep_len, "res": RES},
        "training": {"steps": tcfg.total_steps,
                     "loss_first": round(tr.history[0]["loss"], 4),
                     "loss_last": round(tr.history[-1]["loss"], 4)},
        "closed_loop": {"episodes": n_eval, "steps": steps,
                        "success": succ, "final_angles": finals,
                        "eval_s": round(time.time() - t_eval0, 1)},
    }
    with open(os.path.join(out, "results.json"), "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
