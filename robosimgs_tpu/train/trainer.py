"""3DGS training loop (the role of `ns-train splatfacto` in the
reference pipeline, `/root/reference/README.md:73-75`).

Functional core: one jitted train_step (render -> L1+SSIM -> backward ->
Adam) with a screen-space gradient probe feeding the densification
statistics; a jitted densification round every `densify_interval` steps;
periodic opacity reset; SH band warm-up via traced coefficient masking
(no recompiles); orbax checkpointing for preemption-safe resume.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from robosimgs_tpu.core.camera import Camera
from robosimgs_tpu.core.types import Gaussians
from robosimgs_tpu.render.config import RenderConfig
from robosimgs_tpu.render.project import project
from robosimgs_tpu.render.rasterize import rasterize
from robosimgs_tpu.render.reference import composite_reference
from robosimgs_tpu.render.tiled import composite_tiled
from robosimgs_tpu.train.bilagrid import (apply_bilagrid, identity_bilagrid,
                                          tv_loss as bilagrid_tv_loss)
from robosimgs_tpu.train.data import Frame
from robosimgs_tpu.train.densify import (DensifyConfig, DensifyState,
                                         compact_and_resize,
                                         densify_and_prune, reset_opacities,
                                         update_stats)
from robosimgs_tpu.train.losses import (normals_from_depth,
                                        photometric_loss, psnr)
from robosimgs_tpu.train.optim import (FLOAT_FIELDS, OptimConfig,
                                       float_params, make_optimizer,
                                       reset_slots_in_opt_state)

import optax

_SH_BANDS = np.array([1] * 3 + [2] * 5 + [3] * 7, np.int32)  # band of each rest coeff


def _zero_opacity_moments(opt_state):
    """Zero the Adam moments of the opacity group after an opacity reset
    (official 3DGS resets the optimizer state there too — stale momentum
    would instantly undo the clamp)."""
    import optax

    def zero_group(tree):
        return jax.tree_util.tree_map(jnp.zeros_like, tree)

    inner = dict(opt_state.inner_states)
    st = inner["logit_opacities"]
    inner["logit_opacities"] = st._replace(inner_state=zero_group(st.inner_state))
    return opt_state._replace(inner_states=inner)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    iterations: int = 7000
    ssim_lambda: float = 0.2
    sh_warmup_every: int = 1000
    scene_extent: float = 1.0
    render: RenderConfig = RenderConfig()
    optim: OptimConfig = OptimConfig()
    densify: DensifyConfig = DensifyConfig()
    densify_from: int = 500
    densify_until: int = 15_000
    densify_interval: int = 100
    opacity_reset_interval: int = 3000
    impl: str = "auto"          # rasterize impl for training
    background: tuple = (0.0, 0.0, 0.0)
    log_every: int = 100
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 2000
    # dynamic pool (alive-prefix compaction, SURVEY.md hard part #4):
    # at densify boundaries the pool is compacted and resized to
    # round_up(alive * (1 + pool_headroom), pool_bucket) — capped at the
    # initially allocated capacity — so Adam/projection work scales with
    # the alive count instead of the worst-case pool. Each distinct
    # capacity compiles its own train step; the bucket bounds retraces.
    dynamic_pool: bool = True
    pool_bucket: int = 8192
    pool_headroom: float = 1.0
    # splatfacto-parity quality features (all off by default):
    # scale regularizer — penalizes needle gaussians whose max/min scale
    # ratio exceeds scale_reg_max_ratio (splatfacto
    # use_scale_regularization; nerfstudio splatfacto.py)
    scale_reg_lambda: float = 0.0
    scale_reg_max_ratio: float = 10.0
    # per-frame affine exposure/appearance correction (3x4 color affine,
    # identity-initialized, optimized jointly — the role of splatfacto's
    # appearance embedding for captures with auto-exposure drift).
    # Training PSNR is reported post-correction; eval_psnr stays raw.
    exposure: bool = False
    exposure_lr: float = 1.0e-3
    # bilateral-grid color correction (splatfacto use_bilateral_grid) —
    # a per-frame (gh, gw, gl, 12) grid of 3x4 color affines sampled at
    # (y, x, luminance): the spatially-VARYING generalization of
    # `exposure` for vignetting / local white-balance drift. Applied
    # after the per-frame affine when both are on; a total-variation
    # penalty keeps unobserved grid cells smooth. See train/bilagrid.py
    # for the gather-free TPU evaluation. Training PSNR is reported
    # post-correction; eval_psnr stays raw (same policy as exposure).
    bilateral_grid: bool = False
    bilagrid_shape: tuple = (8, 8, 4)
    bilagrid_lr: float = 2.0e-3
    bilagrid_tv_lambda: float = 10.0
    # depth supervision — L1 between the alpha-normalized expected splat
    # depth and a metric target depth map (Frame.depth /
    # transforms.json depth_file_path), on pixels where the target is
    # valid (>0) AND the splats actually cover the pixel (alpha gate —
    # free space would otherwise drag means toward the background).
    # The role of splatfacto's depth regularizer / the reference
    # pipeline's depth data (nerf2physic depth maps, SURVEY.md §2.1 #14).
    depth_lambda: float = 0.0
    depth_alpha_gate: float = 0.25
    # normal-consistency regularizer (2DGS-style): 1 - dot between the
    # rendered splat-normal map (RenderConfig.render_normals, enabled
    # automatically) and normals derived from the rendered depth map's
    # central differences, on covered pixels — aligns each splat's flat
    # axis with the local surface (better geometry for mesh extraction
    # / part splitting). Tiled/Pallas impl only.
    normal_lambda: float = 0.0
    normal_alpha_gate: float = 0.5
    # multi-step fused dispatch: run this many train steps per device
    # call via lax.scan (0/1 = one step per call). Through a remote or
    # tunneled runtime the per-call dispatch latency dominates real
    # training (measured ~170 ms/iter overhead at 512^2 on the axon
    # tunnel vs ~tens of ms of compute); fusing F steps amortizes it F
    # times. Chunks never cross host-event boundaries (densify, pool
    # resize, opacity reset, checkpoint), so results are step-for-step
    # identical to the unfused loop; per-step metrics come back stacked.
    # Requires uniform frame resolution and device-resident targets
    # (ignored in host-streaming mode).
    fused_steps: int = 0
    # target residency: None = auto (host-resident when the target set
    # exceeds host_data_threshold bytes, else all uploaded once).
    # Host-resident mode streams each step's target with an async
    # device_put issued one step AHEAD, so the upload overlaps the
    # previous step's compute — HBM holds two frames instead of the
    # whole dataset (a few hundred 1080p frames would otherwise evict
    # the gaussian pool).
    host_data: Optional[bool] = None
    host_data_threshold: int = 1 << 30


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    gaussians: Gaussians
    opt_state: object
    densify_state: DensifyState
    step: jax.Array
    key: jax.Array
    # (n_frames, 3, 4) per-frame affine color correction, or None when
    # TrainConfig.exposure is off
    exposure: Optional[jax.Array] = None
    # (n_frames, gh, gw, gl, 12) per-frame bilateral grids, or None
    # when TrainConfig.bilateral_grid is off
    bilagrid: Optional[jax.Array] = None


def identity_exposure(n_frames: int) -> jax.Array:
    """Identity 3x4 color affines for every frame."""
    e = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    return jnp.tile(e[None], (n_frames, 1, 1))


def _sh_mask(step: jax.Array, warmup_every: int, n_rest: int) -> jax.Array:
    """(n_rest, 1) per-coefficient mask: band b activates at step b*warmup."""
    active_band = step // warmup_every
    bands = jnp.asarray(_SH_BANDS[:n_rest])
    return (bands <= active_band).astype(jnp.float32)[:, None]


def _render_for_training(g: Gaussians, camera: Camera, cfg: TrainConfig,
                         offset: jax.Array, impl: str,
                         abs_probe: Optional[jax.Array] = None):
    bg = jnp.asarray(cfg.background, jnp.float32)
    proj = project(g, camera, cfg.render, means2d_offset=offset,
                   abs_probe=abs_probe)
    if impl == "reference":
        out = composite_reference(proj, camera.width, camera.height, cfg.render, bg)
        out["overflow"] = jnp.int32(0)
    else:
        out = composite_tiled(proj, camera.width, camera.height, cfg.render, bg,
                              return_stats=True)
        # truncation silently degrades quality AND gradients — surface it
        out["overflow"] = (out["stats"].overflowed_tiles
                           + out["stats"].truncated_gaussians)
    return out, proj


def _make_step_body(cfg: TrainConfig, impl: str) -> Callable:
    """The un-jitted single-step body shared by make_train_step (one
    step per device call) and make_fused_train_steps (lax.scan)."""
    if cfg.render.absgrad and impl == "reference":
        raise ValueError("absgrad needs the tiled/Pallas impl (the "
                         "reference compositor's autodiff cannot observe "
                         "per-pixel absolute gradients)")
    if cfg.normal_lambda > 0.0:
        if impl == "reference":
            raise ValueError("normal_lambda needs the tiled/Pallas impl "
                             "(only it renders the splat-normal map)")
        if not cfg.render.render_normals:
            cfg = dataclasses.replace(
                cfg, render=dataclasses.replace(cfg.render,
                                                render_normals=True))
    optimizer = make_optimizer(cfg.optim, cfg.scene_extent,
                               exposure_lr=cfg.exposure_lr if cfg.exposure
                               else None,
                               bilagrid_lr=cfg.bilagrid_lr
                               if cfg.bilateral_grid else None)

    def train_step(state: TrainState, camera: Camera, target: jax.Array,
                   frame_idx: jax.Array = jnp.int32(0),
                   target_depth: Optional[jax.Array] = None):
        g = state.gaussians
        mask = _sh_mask(state.step, cfg.sh_warmup_every, g.sh_rest.shape[1])
        offset = jnp.zeros((g.capacity, 2), jnp.float32)
        absgrad = cfg.render.absgrad
        absp = jnp.zeros((g.capacity, 2), jnp.float32) if absgrad else None

        def loss_fn(params: dict, offset, absp):
            p = g.replace(**{**{k: params[k] for k in FLOAT_FIELDS},
                             "sh_rest": params["sh_rest"] * mask})
            out, proj = _render_for_training(p, camera, cfg, offset, impl,
                                             abs_probe=absp)
            rgb = out["rgb"]
            if cfg.exposure:
                e = params["exposure"][frame_idx]            # (3, 4)
                rgb = jnp.clip(rgb @ e[:, :3].T + e[:, 3], 0.0, None)
            if cfg.bilateral_grid:
                rgb = apply_bilagrid(params["bilagrid"][frame_idx], rgb)
            loss = photometric_loss(rgb, target, cfg.ssim_lambda)
            if cfg.bilateral_grid:
                loss = loss + cfg.bilagrid_tv_lambda * \
                    bilagrid_tv_loss(params["bilagrid"])
            if cfg.depth_lambda > 0.0:
                if target_depth is None:
                    raise ValueError("depth_lambda > 0 needs per-frame "
                                     "target depth (Frame.depth or "
                                     "transforms.json depth_file_path)")
                a = out["alpha"]
                d = out["depth"] / jnp.maximum(a, 1e-6)
                dv = ((target_depth > 0.0)
                      & (jax.lax.stop_gradient(a) > cfg.depth_alpha_gate))
                n_dv = jnp.maximum(jnp.sum(dv), 1)
                loss = loss + cfg.depth_lambda * jnp.sum(
                    jnp.where(dv, jnp.abs(d - target_depth), 0.0)) / n_dv
            if cfg.normal_lambda > 0.0:
                a = out["alpha"]
                d = out["depth"] / jnp.maximum(a, 1e-6)
                nd, nd_valid = normals_from_depth(
                    d, camera.fx, camera.fy, camera.cx, camera.cy)
                # erode the alpha gate by the central-difference stencil
                # radius: normals_from_depth reads the 4 rolled neighbors'
                # alpha-normalized depth, so a covered pixel next to an
                # uncovered one (silhouette, d ~ 0 there) would otherwise
                # get a garbage depth-normal target that passes the gate
                ag = jax.lax.stop_gradient(a) > cfg.normal_alpha_gate
                gate = nd_valid & ag
                for ax in (0, 1):
                    for sh in (1, -1):
                        gate = gate & jnp.roll(ag, sh, axis=ax)
                n_g = jnp.maximum(jnp.sum(gate), 1)
                dots = jnp.sum(out["normal"] * nd, -1)
                loss = loss + cfg.normal_lambda * jnp.sum(
                    jnp.where(gate, 1.0 - dots, 0.0)) / n_g
            if cfg.scale_reg_lambda > 0.0:
                ls = params["log_scales"]
                ratio = jnp.exp(jnp.max(ls, -1) - jnp.min(ls, -1))
                pen = jnp.maximum(ratio, cfg.scale_reg_max_ratio) \
                    - cfg.scale_reg_max_ratio
                n_alive = jnp.maximum(jnp.sum(g.alive), 1)
                loss = loss + cfg.scale_reg_lambda * \
                    jnp.sum(jnp.where(g.alive, pen, 0.0)) / n_alive
            return loss, (rgb, proj.radii, proj.valid, out["overflow"])

        params = float_params(g)
        if cfg.exposure:
            params["exposure"] = state.exposure
        if cfg.bilateral_grid:
            params["bilagrid"] = state.bilagrid
        argnums = (0, 1, 2) if absgrad else (0, 1)
        (loss, (rgb, radii, valid, overflow)), grads = jax.value_and_grad(
            loss_fn, argnums=argnums, has_aux=True)(params, offset, absp)
        p_grads, offset_grad = grads[0], grads[1]
        # densification signal: absgrad (per-pixel |grad| sums, no sign
        # cancellation) when enabled, else the signed screen gradient
        densify_grad = grads[2] if absgrad else offset_grad

        dstate = update_stats(state.densify_state, densify_grad, radii, valid,
                              camera.width, camera.height)

        updates, opt_state = optimizer.update(p_grads, state.opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_g = g.replace(**{k: new_params[k] for k in FLOAT_FIELDS})
        metrics = {"loss": loss, "psnr": psnr(rgb, target),
                   "n_alive": g.num_alive, "overflow": overflow}
        return TrainState(gaussians=new_g, opt_state=opt_state,
                          densify_state=dstate, step=state.step + 1,
                          key=state.key,
                          exposure=new_params.get("exposure",
                                                  state.exposure),
                          bilagrid=new_params.get("bilagrid",
                                                  state.bilagrid)), metrics

    return train_step


def make_train_step(cfg: TrainConfig, impl: str) -> Callable:
    return functools.partial(jax.jit, donate_argnums=(0,))(
        _make_step_body(cfg, impl))


def make_fused_train_steps(cfg: TrainConfig, impl: str) -> Callable:
    """F train steps per device call: lax.scan of the single-step body
    over per-step (camera, target, frame_idx[, depth]) stacks. Exactly
    the unfused loop's math — the scan carries TrainState through and
    returns the per-step metrics stacked (F,)."""
    body = _make_step_body(cfg, impl)
    with_depth = cfg.depth_lambda > 0.0

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_steps(state: TrainState, cameras: Camera, targets: jax.Array,
                    frame_idxs: jax.Array,
                    target_depths: Optional[jax.Array] = None):
        def scan_body(st, xs):
            if with_depth:
                cam, tgt, fi, td = xs
            else:
                cam, tgt, fi = xs
                td = None
            return body(st, cam, tgt, fi, td)

        xs = (cameras, targets, frame_idxs)
        if with_depth:
            xs = xs + (target_depths,)
        return jax.lax.scan(scan_body, state, xs)

    return train_steps


def make_densify_step(cfg: TrainConfig) -> Callable:
    optimizer = make_optimizer(cfg.optim, cfg.scene_extent)  # noqa: F841 (state shape)

    @functools.partial(jax.jit, static_argnums=(1,))
    def densify_step(state: TrainState, enable_scale_prune: bool = True):
        key, sub = jax.random.split(state.key)
        g, dstate, spawn = densify_and_prune(
            state.gaussians, state.densify_state, sub, cfg.densify,
            cfg.scene_extent, enable_scale_prune=enable_scale_prune)
        opt_state = reset_slots_in_opt_state(state.opt_state, spawn)
        return TrainState(gaussians=g, opt_state=opt_state, densify_state=dstate,
                          step=state.step, key=key, exposure=state.exposure,
                          bilagrid=state.bilagrid)

    return densify_step


class Trainer:
    def __init__(self, cfg: TrainConfig, gaussians: Gaussians,
                 frames: List[Frame], eval_frames: Optional[List[Frame]] = None):
        self.cfg = cfg
        self.frames = frames
        self.eval_frames = eval_frames or []
        impl = cfg.impl
        if impl == "auto":
            impl = "tiled" if jax.default_backend() == "tpu" else "reference"
        self.impl = impl
        optimizer = make_optimizer(cfg.optim, cfg.scene_extent,
                                   exposure_lr=cfg.exposure_lr if cfg.exposure
                                   else None,
                                   bilagrid_lr=cfg.bilagrid_lr
                                   if cfg.bilateral_grid else None)
        # own our buffers: the jitted train step donates the state, so
        # aliasing the caller's arrays would delete their Gaussians
        # after the first step (bit a second Trainer built on the same
        # init object)
        gaussians = jax.tree_util.tree_map(jnp.copy, gaussians)
        params0 = float_params(gaussians)
        exposure0 = None
        if cfg.exposure:
            exposure0 = identity_exposure(len(frames))
            params0 = {**params0, "exposure": exposure0}
        bilagrid0 = None
        if cfg.bilateral_grid:
            bilagrid0 = identity_bilagrid(len(frames), cfg.bilagrid_shape)
            params0 = {**params0, "bilagrid": bilagrid0}
        self.state = TrainState(
            gaussians=gaussians,
            opt_state=optimizer.init(params0),
            densify_state=DensifyState.zero(gaussians.capacity),
            step=jnp.asarray(0, jnp.int32),
            key=jax.random.PRNGKey(0),
            exposure=exposure0,
            bilagrid=bilagrid0,
        )
        self._train_step = make_train_step(cfg, impl)
        self._fused_steps_fn = None
        if cfg.fused_steps > 1 and len(
                {(f.camera.width, f.camera.height) for f in frames}) == 1:
            self._fused_steps_fn = make_fused_train_steps(cfg, impl)
        self._densify_step = make_densify_step(cfg)
        self._compact = jax.jit(compact_and_resize, static_argnums=(3,))
        self._pool_max = gaussians.capacity
        self.history: List[Dict] = []

    def _maybe_resize_pool(self, step: int):
        """Compact live Gaussians to a prefix and resize the pool to the
        alive count (+ spawn headroom during densification), bounded by
        the initially allocated capacity. Runs at densify-interval
        boundaries — the one place a device sync (int(num_alive)) and a
        possible retrace are acceptable."""
        cfg = self.cfg
        n_alive = int(self.state.gaussians.num_alive)
        in_densify = cfg.densify_from <= step < cfg.densify_until
        headroom = cfg.pool_headroom if in_densify else 0.02
        want = int(n_alive * (1.0 + headroom)) + 1
        want = -(-want // cfg.pool_bucket) * cfg.pool_bucket
        want = min(want, self._pool_max)
        if want != self.state.gaussians.capacity and want >= n_alive:
            g, opt, d = self._compact(self.state.gaussians,
                                      self.state.opt_state,
                                      self.state.densify_state, want)
            self.state = dataclasses.replace(
                self.state, gaussians=g, opt_state=opt, densify_state=d)

    def targets(self):
        return [np.asarray(f.load(self.cfg.background)) for f in self.frames]

    def run(self, iterations: Optional[int] = None, progress: bool = True,
            on_log=None):
        """on_log: optional callable(metrics_dict) invoked at every log
        interval — long TPU jobs use it to pet the wedge watchdog
        (scripts/wedgeguard.py) and stream progress."""
        cfg = self.cfg
        iters = iterations or cfg.iterations
        # track the step python-side — forcing int(state.step) would
        # sync the device every iteration
        targets_np = self.targets()
        depths_np = None
        if cfg.depth_lambda > 0.0:
            depths_np = [f.load_depth() for f in self.frames]
            if any(d is None for d in depths_np):
                raise ValueError("depth_lambda > 0 but some frames carry "
                                 "no depth (Frame.depth / depth_path)")
            depths_np = [np.asarray(d) for d in depths_np]
        total_bytes = sum(t.nbytes for t in targets_np)
        host = (cfg.host_data if cfg.host_data is not None
                else total_bytes > cfg.host_data_threshold)

        def frame_data(i):
            return (targets_np[i], None if depths_np is None
                    else depths_np[i])

        n = len(self.frames)
        # fused multi-step chunks need device-resident per-frame stacks
        fused = int(cfg.fused_steps or 0)
        if host or self._fused_steps_fn is None:
            fused = 0
        cam_all = targets_all = depths_all = None
        if fused > 1:
            cams = [f.camera for f in self.frames]
            cam_all = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *cams)
            targets_all = jax.device_put(np.stack(targets_np))
            if depths_np is not None:
                depths_all = jax.device_put(np.stack(depths_np))

        if host:
            targets = None
            # one-step-ahead async upload pipeline
            step0 = int(self.state.step)
            pending = jax.device_put(frame_data(step0 % n))
        elif fused <= 1:
            targets = [jax.device_put(frame_data(i)) for i in range(n)]

        def host_event(s: int) -> bool:
            """Anything the python loop does BETWEEN step s and s+1
            (pool resize / densify / opacity reset / checkpoint) —
            fused chunks must not run past one."""
            if s <= 0:
                return False
            if (s % cfg.densify_interval == 0
                    and ((cfg.dynamic_pool and s >= cfg.densify_from)
                         or cfg.densify_from <= s < cfg.densify_until)):
                return True
            if s % cfg.opacity_reset_interval == 0:
                return True
            return bool(cfg.checkpoint_dir) and s % cfg.checkpoint_every == 0

        def log(m, step):
            m["step"] = step
            m["elapsed"] = time.time() - t0
            self.history.append(m)
            if on_log is not None:
                on_log(m)
            if progress:
                extra = (f" OVERFLOW={int(m['overflow'])}"
                         if m.get("overflow") else "")
                print(f"[{step:6d}] loss={m['loss']:.4f} psnr={m['psnr']:.2f} "
                      f"alive={int(m['n_alive'])}{extra} ({m['elapsed']:.1f}s)")

        step0 = int(self.state.step)
        t0 = time.time()
        i = 0
        while i < iters:
            step = step0 + i
            if (fused > 1 and i + fused <= iters
                    and not any(host_event(step + j)
                                for j in range(fused - 1))):
                # a host event may land on the chunk's LAST step only
                # (it runs after the chunk — same position as unfused)
                idxs = jnp.asarray([(step + j) % n for j in range(fused)],
                                   jnp.int32)
                cam_f = jax.tree_util.tree_map(
                    lambda a: jnp.take(a, idxs, axis=0), cam_all)
                args = [self.state, cam_f, jnp.take(targets_all, idxs, 0),
                        idxs]
                if depths_all is not None:
                    args.append(jnp.take(depths_all, idxs, 0))
                self.state, mstack = self._fused_steps_fn(*args)
                log_js = [j for j in range(fused)
                          if (step + j) % cfg.log_every == 0]
                if log_js:
                    mhost = {k: np.asarray(v) for k, v in mstack.items()}
                    for j in log_js:
                        log({k: float(v[j]) for k, v in mhost.items()},
                            step + j)
                i += fused
                step = step0 + i - 1      # last executed step, for events
            else:
                idx = step % n
                cam = self.frames[idx].camera
                if host:
                    target, tdepth = pending
                    pending = jax.device_put(frame_data((step + 1) % n))
                elif fused > 1:
                    target = targets_all[idx]
                    tdepth = None if depths_all is None else depths_all[idx]
                else:
                    target, tdepth = targets[idx]
                self.state, metrics = self._train_step(
                    self.state, cam, target, jnp.int32(idx), tdepth)
                if step % cfg.log_every == 0:
                    log({k: float(v) for k, v in metrics.items()}, step)
                i += 1

            if (cfg.dynamic_pool and step > 0
                    and step % cfg.densify_interval == 0
                    and step >= cfg.densify_from):
                self._maybe_resize_pool(step)
            if (cfg.densify_from <= step < cfg.densify_until
                    and step > 0 and step % cfg.densify_interval == 0):
                self.state = self._densify_step(
                    self.state, step >= cfg.densify.prune_scale3d_after)
            if step > 0 and step % cfg.opacity_reset_interval == 0:
                self.state = dataclasses.replace(
                    self.state,
                    gaussians=reset_opacities(self.state.gaussians,
                                              cfg.densify.reset_opacity_value),
                    opt_state=_zero_opacity_moments(self.state.opt_state))
            if cfg.checkpoint_dir and step > 0 and step % cfg.checkpoint_every == 0:
                self.save_checkpoint()
        return self.state

    def eval_psnr(self) -> float:
        return self.eval_metrics()["psnr"]

    def eval_metrics(self) -> dict:
        """Held-out PSNR + SSIM (the splatfacto evaluation pair),
        averaged over eval frames (train frames when none held out)."""
        from robosimgs_tpu.train.losses import ssim
        psnrs, ssims = [], []
        for f in (self.eval_frames or self.frames):
            out = rasterize(self.state.gaussians, f.camera, self.cfg.render,
                            background=jnp.asarray(self.cfg.background), impl=self.impl
                            if self.impl != "tiled" else "tiled")
            tgt = jnp.asarray(f.load(self.cfg.background))
            psnrs.append(float(psnr(out["rgb"], tgt)))
            ssims.append(float(ssim(jnp.clip(out["rgb"], 0.0, 1.0), tgt)))
        return {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims))}

    # -- checkpointing ----------------------------------------------------

    def save_checkpoint(self, path: Optional[str] = None):
        import os

        import orbax.checkpoint as ocp

        # orbax requires absolute paths; a relative --output must not
        # crash the run at its first checkpoint save (ADVICE.md r1)
        path = os.path.abspath(path or self.cfg.checkpoint_dir)
        ckpt = ocp.StandardCheckpointer()
        ckpt.save(f"{path}/step_{int(self.state.step)}", self.state, force=True)
        ckpt.wait_until_finished()

    def restore_checkpoint(self, path: str):
        import os

        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        path = os.path.abspath(path)
        # dynamic_pool runs change capacity over training; resize the
        # template to the checkpoint's saved capacity before restoring
        try:
            meta = ckpt.metadata(path)
            cap = meta.item_metadata.tree["gaussians"]["means"].shape[0]
        except Exception:
            cap = self.state.gaussians.capacity
        if cap != self.state.gaussians.capacity:
            g, opt, d = self._compact(self.state.gaussians,
                                      self.state.opt_state,
                                      self.state.densify_state, cap)
            self.state = dataclasses.replace(
                self.state, gaussians=g, opt_state=opt, densify_state=d)
        self.state = ckpt.restore(path, self.state)

    def resume_latest(self) -> bool:
        """Preemption recovery: restore the newest checkpoint in
        cfg.checkpoint_dir if any (the elastic-restart mechanism of
        SURVEY.md §5 — deterministic camera order makes the resumed run
        continue the exact data schedule). Returns True if restored."""
        import os

        d = self.cfg.checkpoint_dir
        if not d or not os.path.isdir(d):
            return False
        steps = []
        for name in os.listdir(d):
            if name.startswith("step_"):
                try:
                    steps.append((int(name.split("_", 1)[1]), name))
                except ValueError:
                    continue
        if not steps:
            return False
        _, latest = max(steps)
        self.restore_checkpoint(os.path.join(d, latest))
        return True
