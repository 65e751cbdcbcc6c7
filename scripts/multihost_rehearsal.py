"""Multi-host (DCN) rehearsal: 2 CPU processes, one DP train step.

The reference stack inherits NCCL/torch.distributed via Nerfstudio
(SURVEY.md §2.2); our replacement is `parallel/mesh.py::
initialize_multihost` (jax.distributed over the XLA runtime). Until
round 5 that wrapper had never executed anywhere. This script rehearses
the full multi-host path on localhost with 2 CPU processes x 4 virtual
devices each (VERDICT r4 item 4):

  * process 0 = coordinator, process 1 = worker, DCN = localhost TCP
  * global mesh (data=2, tile=4): 'data' spans the two PROCESSES
    (the DCN axis outermost, per the pod-slice recipe), 'tile' is
    process-local (the ICI stand-in)
  * one `make_dp_train_step` step over 4 cameras: camera/target inputs
    are process-local shards lifted to global arrays
    (jax.make_array_from_callback), gradients pmean across BOTH axes —
    i.e. the gradient all-reduce crosses the process boundary
  * both processes must report the SAME loss, matching the
    single-process ground truth (computed by the driver in-process)

Run:  env PYTHONPATH= JAX_PLATFORMS=cpu python scripts/multihost_rehearsal.py
Exit 0 = all three losses agree; artifacts to stdout.
"""

import json
import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)

N_PROC = 2
LOCAL_DEVS = 4
STEPS = 2


def build_problem():
    """Deterministic tiny scene, identical in every process."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from robosimgs_tpu.core.types import Gaussians
    from robosimgs_tpu.render.config import RenderConfig
    from robosimgs_tpu.render.rasterize import rasterize
    from robosimgs_tpu.train.data import synthetic_scene
    from robosimgs_tpu.train.densify import DensifyState
    from robosimgs_tpu.train.optim import float_params, make_optimizer
    from robosimgs_tpu.train.trainer import TrainConfig, TrainState

    cfg = TrainConfig(render=RenderConfig(tile_capacity=128,
                                          ref_gaussian_chunk=64),
                      scene_extent=1.0, impl="reference")
    gt, frames = synthetic_scene(seed=0, n_gaussians=40, n_cameras=4,
                                 width=32, height=32, sh_degree=1)
    targets = np.stack([
        np.asarray(rasterize(gt, f.camera, cfg.render,
                             impl="reference")["rgb"]) for f in frames])
    init = Gaussians.random(jax.random.PRNGKey(7), 40, sh_degree=1)
    optimizer = make_optimizer(cfg.optim, cfg.scene_extent)
    state = TrainState(
        gaussians=init, opt_state=optimizer.init(float_params(init)),
        densify_state=DensifyState.zero(init.capacity),
        step=jnp.asarray(0, jnp.int32), key=jax.random.PRNGKey(0))
    return cfg, frames, targets, state


def run_steps(cfg, frames, targets_np, state, mesh):
    """STEPS DP steps over the mesh; returns the last loss (float)."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from robosimgs_tpu.parallel.distributed import (make_dp_train_step,
                                                    stack_cameras)

    step_fn = make_dp_train_step(cfg, mesh, impl="reference")
    cam_batch = stack_cameras([f.camera for f in frames])

    def to_global(x, spec):
        """Lift a full (host-replicated) numpy value to a global jax
        Array with the given sharding — each process materializes only
        its addressable shards (the multi-host data-loading contract)."""
        x = np.asarray(x)
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(x.shape, sh,
                                            lambda idx: x[idx])

    batched = lambda leaf: (hasattr(leaf, "ndim") and leaf.ndim >= 1
                            and leaf.shape[0] == len(frames))
    cam_batch = jax.tree_util.tree_map(
        lambda leaf: to_global(leaf, P("data")) if batched(leaf)
        else to_global(leaf, P()), cam_batch)
    targets = to_global(targets_np, P("data"))
    state = jax.tree_util.tree_map(
        lambda leaf: to_global(leaf, P()), state,
        is_leaf=lambda x: isinstance(x, jax.Array))

    loss = None
    for _ in range(STEPS):
        state, metrics = step_fn(state, cam_batch, targets)
        loss = metrics["loss"]
    # replicated output: every process holds an addressable copy
    return float(jax.device_get(
        list(loss.addressable_shards)[0].data
        if hasattr(loss, "addressable_shards") else loss))


def worker(pid: int, port: int):
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVS} "
        + os.environ.get("XLA_FLAGS", ""))
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from robosimgs_tpu.parallel.mesh import initialize_multihost, make_mesh
    initialize_multihost(coordinator=f"localhost:{port}",
                         num_processes=N_PROC, process_id=pid)
    assert jax.process_count() == N_PROC, jax.process_count()
    n_glob = len(jax.devices())
    assert n_glob == N_PROC * LOCAL_DEVS, n_glob
    # 'data' axis outermost spans the two processes (device ids are
    # process-major), 'tile' stays process-local
    mesh = make_mesh(n_data=N_PROC, n_tile=LOCAL_DEVS)
    local_on_row = [d.process_index for d in mesh.devices[pid]]
    assert local_on_row == [pid] * LOCAL_DEVS, (
        f"data row {pid} not process-local: {local_on_row}")

    cfg, frames, targets, state = build_problem()
    loss = run_steps(cfg, frames, targets, state, mesh)
    print(f"MULTIHOST_LOSS pid={pid} procs={jax.process_count()} "
          f"devices={n_glob} loss={loss:.8f}", flush=True)


def driver():
    import socket
    with socket.socket() as s:            # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = ""                # sitecustomize (axon) off
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, "-u", os.path.abspath(__file__),
         "--process-id", str(i), "--port", str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(N_PROC)]
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        if p.returncode != 0:
            print(f"--- process {i} failed (rc={p.returncode}) ---\n{out}")
            sys.exit(1)
    losses = {}
    for i, out in enumerate(outs):
        for line in out.splitlines():
            if line.startswith("MULTIHOST_LOSS"):
                losses[i] = float(line.rsplit("loss=", 1)[1])
                print(line)
    assert len(losses) == N_PROC, f"missing loss lines: {outs}"
    assert abs(losses[0] - losses[1]) < 1e-12, losses

    # single-process ground truth on an 8-device (2, 4) mesh
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={N_PROC * LOCAL_DEVS} "
        + os.environ.get("XLA_FLAGS", ""))
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from robosimgs_tpu.parallel.mesh import make_mesh
    cfg, frames, targets, state = build_problem()
    ref = run_steps(cfg, frames, targets, state,
                    make_mesh(n_data=N_PROC, n_tile=LOCAL_DEVS))
    print(f"single-process reference loss={ref:.8f}")
    ok = abs(losses[0] - ref) < 1e-5 * max(1.0, abs(ref))
    print("RESULT " + json.dumps({
        "multihost_loss": losses[0], "single_process_loss": ref,
        "processes": N_PROC, "local_devices": LOCAL_DEVS,
        "steps": STEPS, "match": ok}))
    sys.exit(0 if ok else 2)


if __name__ == "__main__":
    if "--process-id" in sys.argv:
        pid = int(sys.argv[sys.argv.index("--process-id") + 1])
        port = int(sys.argv[sys.argv.index("--port") + 1])
        worker(pid, port)
    else:
        driver()
