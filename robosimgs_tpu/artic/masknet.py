"""Learned point-prompted part segmentation (SAM's role, executed).

The reference's mask candidates come from SAM ViT-H automatic mask
generation (`interactive_segmenter.py:140-151`): a grid of point
prompts, one mask per prompt, IoU-deduplicated. This module is a real
learned model filling the same contract end-to-end on TPU: a small
flax U-Net takes an RGB render plus a prompt-point heatmap and predicts
the mask of the part under the prompt; `MaskNetGenerator.generate`
reproduces SAM's automatic mode (grid prompts -> batched forward ->
threshold -> IoU NMS) behind the package's `MaskGenerator` protocol.

It is trained entirely on this framework's own synthetic renders
(random multi-part assemblies rendered by `render/mesh_raster`, the
same rasterizer + headlight shading the Segmenter feeds it at
inference) — no external weights, which is what this environment
offers; swap in any stronger backbone via the same protocol.

TPU notes: the forward is all 3x3 convs + GroupNorm at a static
input size, so XLA maps it onto the MXU directly; automatic mask
generation batches every grid prompt into ONE forward (B = grid^2),
and training batches (image, prompt) pairs the same way.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_WEIGHTS = os.path.join(os.path.dirname(__file__), "weights",
                               "masknet.msgpack")


class MaskUNet(nn.Module):
    """Small U-Net: (B, S, S, 4) RGB+prompt-heatmap -> (B, S, S) logits."""

    base: int = 16
    levels: int = 4

    @nn.compact
    def __call__(self, x):
        def block(h, ch):
            h = nn.Conv(ch, (3, 3))(h)
            h = nn.GroupNorm(num_groups=min(8, ch))(h)
            return nn.silu(h)

        skips = []
        h = block(x, self.base)
        for i in range(self.levels):
            skips.append(h)
            ch = self.base * (2 ** min(i + 1, 3))
            h = nn.Conv(ch, (3, 3), strides=(2, 2))(h)
            h = nn.GroupNorm(num_groups=8)(h)
            h = nn.silu(h)
            h = block(h, ch)
        for i in reversed(range(self.levels)):
            ch = skips[i].shape[-1]
            B, H, W, _ = h.shape
            h = jax.image.resize(h, (B, H * 2, W * 2, h.shape[-1]),
                                 "nearest")
            h = block(h, ch)
            h = jnp.concatenate([h, skips[i]], axis=-1)
            h = block(h, ch)
        return nn.Conv(1, (1, 1))(h)[..., 0]


# -- synthetic training scenes ---------------------------------------------


def _box(rng: np.random.Generator):
    s = rng.uniform(0.15, 0.6, 3)
    v = np.array([[x, y, z] for x in (-s[0], s[0]) for y in (-s[1], s[1])
                  for z in (-s[2], s[2])], np.float32)
    f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                  [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                  [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
    return v, f


def _ellipsoid(rng: np.random.Generator, sub: int = 2):
    # octahedron subdivided on the unit sphere, then scaled
    v = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                  [0, 0, 1], [0, 0, -1]], np.float32)
    f = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                  [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.int32)
    for _ in range(sub):
        mid: Dict[Tuple[int, int], int] = {}
        verts = list(v)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in mid:
                m = verts[a] + verts[b]
                m = m / np.linalg.norm(m)
                mid[key] = len(verts)
                verts.append(m)
            return mid[key]

        nf = []
        for a, b, c in f:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            nf += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
        v = np.asarray(verts, np.float32)
        f = np.asarray(nf, np.int32)
    return (v * rng.uniform(0.15, 0.5, 3)).astype(np.float32), f


def _box_at(s) -> Tuple[np.ndarray, np.ndarray]:
    """Axis-aligned box with half-extents s, centered at the origin."""
    v = np.array([[x, y, z] for x in (-s[0], s[0]) for y in (-s[1], s[1])
                  for z in (-s[2], s[2])], np.float32)
    f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                  [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                  [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
    return v, f


def _flap_assembly(rng: np.random.Generator):
    """Open-box-with-hinged-flap pair — the articulated-scan geometry
    (a thin lid attached at one edge of a box, opened at a random
    angle) the openbox capture exemplifies; the default box/ellipsoid
    assemblies never produce THIN parts, which is exactly where the v3
    model under-segmented. Returns [(verts, faces), ...] with 2 parts
    (body walls = part 0, flap = part 1)."""
    # body: 4 thin walls + floor (an OPEN box, so the flap is visible
    # against the interior like a real opened container)
    sx, sy, sz = rng.uniform(0.3, 0.6), rng.uniform(0.35, 0.7), \
        rng.uniform(0.12, 0.3)
    t = rng.uniform(0.015, 0.05)          # wall thickness
    walls = []
    for cx, hx, cy, hy in ((-sx, t, 0, sy), (sx, t, 0, sy),
                           (0, sx, -sy, t), (0, sx, sy, t)):
        v, f = _box_at(np.array([hx, hy, sz]))
        walls.append((v + np.array([cx, cy, 0], np.float32), f))
    floor_v, floor_f = _box_at(np.array([sx, sy, t]))
    walls.append((floor_v + np.array([0, 0, -sz], np.float32), floor_f))
    bv = np.concatenate([w[0] for w in walls])
    bf = np.concatenate([w[1] + 8 * i for i, w in enumerate(walls)])
    # flap: thin plate hinged at the +x top edge, opened by a random
    # angle about that edge (0.2 rad = nearly closed .. 2.8 = flat open)
    fl = rng.uniform(0.7, 1.4) * sx       # flap length
    fw = sy * rng.uniform(0.9, 1.1)
    ft = rng.uniform(0.01, 0.035)
    pv, pf = _box_at(np.array([fl / 2, fw, ft]))
    pv = pv + np.array([fl / 2, 0, 0], np.float32)   # hinge edge at x=0
    ang = rng.uniform(0.2, 2.8)
    ca, sa = np.cos(ang), np.sin(ang)
    R = np.array([[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]], np.float32)
    pv = pv @ R.T + np.array([sx, 0, sz], np.float32)
    normal = R @ np.array([0, 0, 1], np.float32)  # flap plate normal
    return [(bv, bf), (pv, pf)], normal


def make_scene(seed: int, size: int, max_parts: int = 3,
               scan_like: bool = False, flap: bool = False):
    """Random multi-part assembly rendered with the Segmenter's own
    rasterizer+shading. Returns (image (S,S,3) f32, part_id (S,S) int32
    with -1 = background).

    scan_like=True draws all part albedos from a narrow light palette
    (real scans like the reference's openbox are near-uniform white-ish
    — the net must segment from shading/silhouette edges, not color).
    flap=True generates an open-box-with-hinged-thin-flap pair instead
    of free-floating primitives (the articulated-scan geometry)."""
    from robosimgs_tpu.artic.render_views import shade, view_camera
    from robosimgs_tpu.render.mesh_raster import (MeshRasterConfig,
                                                  rasterize_mesh)
    from robosimgs_tpu.utils.meshio import Mesh, concatenate

    rng = np.random.default_rng(seed)
    parts, face_part = [], []
    view_bias = None

    def color(rng):
        if scan_like:
            base = rng.uniform(0.55, 0.85)
            return np.clip(base + rng.uniform(-0.08, 0.08, 3),
                           0.0, 1.0).astype(np.float32)
        return rng.uniform(0.15, 0.95, 3).astype(np.float32)

    if flap:
        geo, normal = _flap_assembly(rng)
        # one rigid rotation of the WHOLE assembly (the hinge contact
        # must survive), random viewpoint handles the rest
        R = np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32)
        geo = [(v @ R.T, f, color(rng)) for v, f in geo]
        # bias the camera toward the flap's face (a thin plate is a
        # useless 1-px label edge-on; real captures look AT the lid)
        view_bias = (R @ normal) * float(rng.choice([-1.0, 1.0]))
    else:
        # rng draw ORDER here is load-bearing: it reproduces the scene
        # stream the checked-in weights were trained/evaluated on
        n_parts = int(rng.integers(2, max_parts + 1))
        geo = []
        for p in range(n_parts):
            v, f = _box(rng) if rng.random() < 0.6 else _ellipsoid(rng)
            # random rotation (QR of a Gaussian) + offset so parts touch
            R = np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32)
            v = v @ R.T + rng.uniform(-0.5, 0.5, 3).astype(np.float32)
            geo.append((v, f, color(rng)))
    for p, (v, f, col) in enumerate(geo):
        parts.append(Mesh(vertices=v.astype(np.float32), faces=f,
                          vertex_colors=np.tile(col, (len(v), 1))))
        face_part.append(np.full((len(f),), p, np.int32))
    mesh = concatenate(parts)
    face_part = np.concatenate(face_part)

    direction = rng.normal(size=3)
    if view_bias is not None:
        direction = view_bias + 0.45 * direction
    direction /= np.linalg.norm(direction)
    cam = view_camera(mesh, direction, size,
                      fov_deg=float(rng.uniform(40, 60)),
                      distance_factor=float(rng.uniform(1.6, 2.4)))
    out = rasterize_mesh(jnp.asarray(mesh.vertices), jnp.asarray(mesh.faces),
                         cam, face_colors=jnp.asarray(shade(mesh, cam)),
                         cfg=MeshRasterConfig(tile_capacity=1024))
    fid = np.asarray(out["face_id"])
    mask = np.asarray(out["mask"])
    img = np.where(mask[..., None], np.asarray(out["rgb"]), 1.0)
    part_id = np.where(mask, face_part[np.clip(fid, 0, len(face_part) - 1)],
                       -1).astype(np.int32)
    return img.astype(np.float32), part_id


def prompt_heatmap(size: int, u: float, v: float, sigma: float = 4.0):
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    return np.exp(-((xx - u) ** 2 + (yy - v) ** 2) / (2 * sigma**2))


def sample_example(rng: np.random.Generator, img: np.ndarray,
                   part_id: np.ndarray, crop_aug: bool = False):
    """(image, part_id) -> (input (S,S,4), target (S,S) f32).

    crop_aug: with probability 1/2, train on a random square crop
    centered near the prompt point and resized back to S — the
    distribution MaskNetGenerator's multi-scale prompted inference
    actually feeds the net."""
    size = img.shape[0]
    present = np.unique(part_id[part_id >= 0])
    p = int(rng.choice(present))
    ys, xs = np.nonzero(part_id == p)
    i = int(rng.integers(len(ys)))
    u, v = float(xs[i]), float(ys[i])
    tgt = (part_id == p).astype(np.float32)
    if crop_aug and rng.random() < 0.5:
        side = int(size * rng.uniform(0.3, 0.8))
        x0 = int(np.clip(u - side / 2 + rng.uniform(-side / 4, side / 4),
                         0, size - side))
        y0 = int(np.clip(v - side / 2 + rng.uniform(-side / 4, side / 4),
                         0, size - side))
        img = np.asarray(jax.image.resize(
            jnp.asarray(img[y0:y0 + side, x0:x0 + side], jnp.float32),
            (size, size, 3), "linear"))
        tgt = np.asarray(jax.image.resize(
            jnp.asarray(tgt[y0:y0 + side, x0:x0 + side]),
            (size, size), "nearest"))
        u = np.clip((u - x0) * size / side, 0, size - 1)
        v = np.clip((v - y0) * size / side, 0, size - 1)
    heat = prompt_heatmap(size, u, v)
    x = np.concatenate([img, heat[..., None]], axis=-1).astype(np.float32)
    return x, tgt


# -- training ---------------------------------------------------------------


@dataclasses.dataclass
class MaskNetTrainResult:
    params: dict
    holdout_iou: float
    losses: List[float]


def train_masknet(
    steps: int = 600,
    size: int = 96,
    batch: int = 16,
    n_scenes: int = 120,
    lr: float = 2e-3,
    seed: int = 0,
    log_every: int = 0,
    progress: Optional[Callable[[int], None]] = None,
    init_params: Optional[dict] = None,
    flap_frac: float = 0.0,
    crop_aug: bool = False,
) -> MaskNetTrainResult:
    """Train MaskUNet on synthetic assemblies; returns params + held-out
    prompt-mask IoU (scenes unseen during training).

    init_params: warm-start weights (fine-tuning). flap_frac: fraction
    of open-box-with-hinged-flap scenes (the articulated-scan geometry,
    see _flap_assembly); crop_aug: random prompt-centered crop
    augmentation matching multi-scale prompted inference."""
    import optax

    rng = np.random.default_rng(seed)

    def mk(base, s):
        # 1/3 scan-like low-contrast scenes (real scans segment on
        # shading); flap scenes lean scan-like even harder (2/3)
        is_flap = (s % 100) < int(flap_frac * 100)
        scan = (s % 3 != 0) if is_flap else (s % 3 == 2)
        return make_scene(base + s, size, scan_like=scan, flap=is_flap)

    scenes = [mk(1000, s) for s in range(n_scenes)]
    holdout = [mk(999_000, s) for s in range(12)]

    model = MaskUNet()
    key = jax.random.PRNGKey(seed)
    params = (init_params if init_params is not None
              else model.init(key, jnp.zeros((1, size, size, 4))))
    tx = optax.adamw(optax.cosine_decay_schedule(lr, steps))
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply(p, x)
            bce = optax.sigmoid_binary_cross_entropy(logits, y).mean()
            prob = jax.nn.sigmoid(logits)
            inter = (prob * y).sum((1, 2))
            dice = 1.0 - (2 * inter + 1.0) / (prob.sum((1, 2))
                                              + y.sum((1, 2)) + 1.0)
            return bce + dice.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for step in range(steps):
        xs, ys = [], []
        for _ in range(batch):
            img, pid = scenes[int(rng.integers(len(scenes)))]
            x, y = sample_example(rng, img, pid, crop_aug=crop_aug)
            xs.append(x)
            ys.append(y)
        params, opt_state, loss = train_step(
            params, opt_state, jnp.asarray(np.stack(xs)),
            jnp.asarray(np.stack(ys)))
        losses.append(float(loss))
        if log_every and step % log_every == 0:
            print(f"masknet step {step}: loss {float(loss):.4f}", flush=True)
        if progress is not None:
            progress(step)

    @jax.jit
    def infer(params, x):
        return jax.nn.sigmoid(model.apply(params, x))

    ious = []
    for img, pid in holdout:
        x, y = sample_example(np.random.default_rng(7), img, pid)
        prob = np.asarray(infer(params, jnp.asarray(x[None])))[0]
        pred = prob > 0.5
        inter = (pred & (y > 0.5)).sum()
        union = (pred | (y > 0.5)).sum()
        ious.append(inter / max(union, 1))
    return MaskNetTrainResult(params=params, holdout_iou=float(np.mean(ious)),
                              losses=losses)


def save_params(params: dict, path: str = DEFAULT_WEIGHTS) -> None:
    import flax.serialization

    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(flax.serialization.to_bytes(params))


def load_params(path: str = DEFAULT_WEIGHTS, size: int = 96) -> dict:
    import flax.serialization

    template = MaskUNet().init(jax.random.PRNGKey(0),
                               jnp.zeros((1, size, size, 4)))
    with open(path, "rb") as fh:
        return flax.serialization.from_bytes(template, fh.read())


# -- automatic mask generation (the MaskGenerator protocol) ------------------


class MaskNetGenerator:
    """SAM-style automatic mask generation from the learned prompt net:
    a grid of point prompts over the (non-background) image, one batched
    forward, threshold, greedy IoU NMS. Satisfies
    `robosimgs_tpu.artic.mllm.MaskGenerator`."""

    def __init__(self, params: Optional[dict] = None, size: int = 96,
                 grid: int = 6, threshold: float = 0.5,
                 nms_iou: float = 0.75, min_area_px: int = 16):
        if params is None:
            params = load_params(size=size)
        self.params = params
        self.size = size
        self.grid = grid
        self.threshold = threshold
        self.nms_iou = nms_iou
        self.min_area_px = min_area_px
        model = MaskUNet()
        self._apply = jax.jit(
            lambda x: jax.nn.sigmoid(model.apply(self.params, x)))

    def generate(self, image: np.ndarray,
                 point: Optional[Tuple[float, float]] = None
                 ) -> List[np.ndarray]:
        """Automatic grid candidates; with `point` (full-res (u, v)),
        point-prompted candidates at multiple crop scales around it come
        FIRST — SAM's interactive mode, which the reference segmenter
        drives with the user's click (`interactive_segmenter.py`). The
        crops recover thin parts (an open lid seen at a shallow angle)
        that vanish at the 96^2 full-frame working size."""
        out = self._prompted(image, point) if point is not None else []
        out.extend(self._automatic(image))
        return out

    def _prompted(self, image: np.ndarray,
                  point: Tuple[float, float]) -> List[np.ndarray]:
        H, W = image.shape[:2]
        S = self.size
        u0, v0 = float(point[0]), float(point[1])
        cands: List[np.ndarray] = []
        for scale in (1.0, 0.5, 0.25):
            side = max(int(round(scale * max(H, W))), S // 2)
            x0 = int(np.clip(round(u0 - side / 2), 0, max(W - side, 0)))
            y0 = int(np.clip(round(v0 - side / 2), 0, max(H - side, 0)))
            x1, y1 = min(x0 + side, W), min(y0 + side, H)
            crop = image[y0:y1, x0:x1]
            ch, cw = crop.shape[:2]
            small = np.asarray(jax.image.resize(
                jnp.asarray(crop, jnp.float32), (S, S, 3), "linear"))
            pu = (u0 - x0) * S / cw
            pv = (v0 - y0) * S / ch
            x = np.concatenate([small, prompt_heatmap(S, pu, pv)[..., None]],
                               -1)[None]
            prob = np.asarray(self._apply(jnp.asarray(x)))[0]
            m = prob > self.threshold
            if m.sum() < self.min_area_px:
                continue
            back = np.asarray(jax.image.resize(
                jnp.asarray(m.astype(np.float32)), (ch, cw),
                "nearest")) > 0.5
            full = np.zeros((H, W), bool)
            full[y0:y1, x0:x1] = back
            cands.append(full)
        # dedup across scales (keep the sharpest = smallest-crop first)
        keep: List[np.ndarray] = []
        for m in reversed(cands):
            if not any((m & k).sum() / max((m | k).sum(), 1) > self.nms_iou
                       for k in keep):
                keep.append(m)
        return keep

    def _automatic(self, image: np.ndarray) -> List[np.ndarray]:
        H, W = image.shape[:2]
        S = self.size
        small = np.asarray(jax.image.resize(
            jnp.asarray(image, jnp.float32), (S, S, 3), "linear"))
        # grid prompts, skipping (near-)background points
        coords = np.linspace(S * 0.08, S * 0.92, self.grid)
        prompts = [(u, v) for v in coords for u in coords
                   if np.abs(small[int(v), int(u)] - 1.0).sum() > 0.08]
        if not prompts:
            prompts = [(S / 2, S / 2)]
        xs = np.stack([np.concatenate(
            [small, prompt_heatmap(S, u, v)[..., None]], -1)
            for u, v in prompts])
        probs = np.asarray(self._apply(jnp.asarray(xs)))    # (B, S, S)
        masks, quals = [], []
        for b in range(probs.shape[0]):
            m = probs[b] > self.threshold
            if m.sum() < self.min_area_px:
                continue
            masks.append(m)
            quals.append(float(probs[b][m].mean()))
        # greedy NMS by predicted quality
        keep: List[np.ndarray] = []
        for i in np.argsort(quals)[::-1]:
            m = masks[i]
            dup = any((m & k).sum() / max((m | k).sum(), 1) > self.nms_iou
                      for k in keep)
            if not dup:
                keep.append(m)
        # upsample to full resolution (nearest)
        out = []
        for m in keep:
            big = np.asarray(jax.image.resize(
                jnp.asarray(m.astype(np.float32)), (H, W), "nearest")) > 0.5
            out.append(big)
        return out
