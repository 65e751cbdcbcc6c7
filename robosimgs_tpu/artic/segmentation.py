"""Part segmentation: 2D masks -> split part meshes.

Re-design of the reference's interactive segmentation core
(`/root/reference/Articulation/segmentation/interactive_segmenter.py`):
the same stage structure (point selection -> multi-view rendering ->
view choice -> part naming -> mask generation+ranking -> face-centroid
projection split) but headless, scriptable, and with every model call
behind an interface (artic/mllm.py). The O(faces) pure-Python
per-face assignment loop (reference HOT LOOP #3,
`interactive_segmenter.py:1401-1414`) is a single vectorized gather
here. Artifact contract preserved (selected_points.json,
clip_prompts.json, mask_{COLOR}_{view}.npy, part_{COLOR}.glb,
camera_params.json) so outputs are drop-in comparable with
`openbox_output/` (SURVEY.md §7).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple  # noqa: F401

import cv2
import jax.numpy as jnp
import numpy as np

from robosimgs_tpu.artic.mllm import (ImageTextScorer, MaskGenerator,
                                      MLLMClient, extract_json, with_retry)
from robosimgs_tpu.artic.render_views import (MARKER_COLORS,
                                              render_canonical_views)
from robosimgs_tpu.core.camera import Camera
from robosimgs_tpu.utils.meshio import Mesh, save_mesh


def nearest_vertex(mesh: Mesh, point: np.ndarray) -> int:
    """Snap a 3D point to the nearest mesh vertex (the non-GUI
    replacement for the reference's Open3D picking)."""
    d2 = ((mesh.vertices - np.asarray(point, np.float32)) ** 2).sum(1)
    return int(d2.argmin())


def dilate_mask(mask: np.ndarray, px: int) -> np.ndarray:
    """Binary dilation by `px` pixels (reference default 10)."""
    if px <= 0:
        return mask
    kernel = np.ones((px, px), np.uint8)
    return cv2.dilate(mask.astype(np.uint8), kernel, iterations=1) > 0


def project_points(points: np.ndarray, camera: Camera) -> Tuple[np.ndarray, np.ndarray]:
    """World points -> (u, v) pixel coords + in-front mask."""
    w2c = np.asarray(camera.w2c)
    p = points @ w2c[:3, :3].T + w2c[:3, 3]
    z = p[:, 2]
    in_front = z > 1e-6
    zs = np.where(in_front, z, 1.0)
    u = float(camera.fx) * p[:, 0] / zs + float(camera.cx) - 0.5
    v = float(camera.fy) * p[:, 1] / zs + float(camera.cy) - 0.5
    return np.stack([u, v], -1), in_front


def split_mesh_by_mask(mesh: Mesh, mask: np.ndarray, camera: Camera
                       ) -> Tuple[Mesh, Mesh, np.ndarray]:
    """Split by projecting face centroids into a (H, W) bool mask.

    Faces whose centroid lands inside the mask go to part A; everything
    else (including out-of-view faces) to part B — the reference's
    assignment rule, vectorized. Returns (part_a, part_b, face_in_a).
    """
    H, W = mask.shape
    uv, in_front = project_points(mesh.face_centroids(), camera)
    ui = np.round(uv[:, 0]).astype(np.int64)
    vi = np.round(uv[:, 1]).astype(np.int64)
    in_bounds = (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H) & in_front
    hit = np.zeros(mesh.faces.shape[0], bool)
    hit[in_bounds] = mask[vi[in_bounds], ui[in_bounds]]
    return mesh.submesh(hit), mesh.submesh(~hit), hit


def split_mesh_by_points(mesh: Mesh, points: np.ndarray
                         ) -> Tuple[Mesh, Mesh, np.ndarray]:
    """Geometric fallback split: assign each face to the nearest of two
    3D seed points (no mask/model needed). Returns (part_a, part_b,
    face_in_a) with part_a = faces nearest points[0]."""
    c = mesh.face_centroids()
    d0 = ((c - np.asarray(points[0], np.float32)) ** 2).sum(1)
    d1 = ((c - np.asarray(points[1], np.float32)) ** 2).sum(1)
    hit = d0 <= d1
    return mesh.submesh(hit), mesh.submesh(~hit), hit


def mask_from_part(part: Mesh, camera: Camera) -> np.ndarray:
    """Render a part's silhouette into a (H, W) bool mask (used to keep
    the mask_{COLOR}_{view}.npy artifact contract when the split came
    from 3D geometry rather than a 2D mask)."""
    import jax.numpy as jnp

    from robosimgs_tpu.render.mesh_raster import rasterize_mesh

    if part.faces.shape[0] == 0:
        return np.zeros((camera.height, camera.width), bool)
    out = rasterize_mesh(jnp.asarray(part.vertices), jnp.asarray(part.faces),
                         camera)
    return np.asarray(out["mask"])


@dataclasses.dataclass
class SegmentationResult:
    parts: Dict[str, Mesh]               # color name -> mesh
    prompts: Dict[str, str]              # color name -> part name
    best_view: str
    masks: Dict[str, np.ndarray]         # color name -> (H, W) bool


class Segmenter:
    """Headless part segmenter with pluggable model backends.

    All decisions (best view, part names, candidate mask choice) can be
    supplied directly (scripted mode), or delegated to an MLLM client;
    mask candidates come from a MaskGenerator (SAM's role), ranked by an
    ImageTextScorer (CLIP's role).
    """

    def __init__(
        self,
        mesh: Mesh,
        out_dir: Optional[str] = None,
        mask_generator: Optional[MaskGenerator] = None,
        scorer: Optional[ImageTextScorer] = None,
        mllm: Optional[MLLMClient] = None,
        resolution: int = 800,
        mask_dilate_px: int = 10,
        min_mask_area: float = 0.0,
        max_mask_area: float = 0.7,
        view_names: Optional[Sequence[str]] = None,
        visual_prompt: str = "blur",
    ):
        self.mesh = mesh
        self.out_dir = out_dir
        self.mask_generator = mask_generator
        self.scorer = scorer
        self.mllm = mllm
        self.resolution = resolution
        self.mask_dilate_px = mask_dilate_px
        self.min_mask_area = min_mask_area
        self.max_mask_area = max_mask_area
        # "blur" = FGVP blur-mask prompt before scorer ranking (the
        # reference's default when FGVP is installed,
        # interactive_segmenter.py:155-165); "white" = plain
        # white-background mask crop.
        self.visual_prompt = visual_prompt
        # None = the six axis-aligned views; the reference's
        # SimpleSegmenter style uses ("top_oblique", "bottom_oblique")
        self.view_names = view_names

    # -- stage 1: point selection ----------------------------------------

    def select_points(self, points: Sequence, snap: bool = True) -> List[Dict]:
        """points: 3D coords or vertex indices. Writes selected_points.json."""
        out = []
        for p in points:
            if np.isscalar(p) or isinstance(p, (int, np.integer)):
                idx = int(p)
            else:
                idx = nearest_vertex(self.mesh, np.asarray(p)) if snap else -1
            coord = self.mesh.vertices[idx] if idx >= 0 else np.asarray(p)
            out.append({"vertex_index": idx, "position": np.asarray(coord).tolist()})
        if self.out_dir:
            with open(os.path.join(self.out_dir, "selected_points.json"), "w") as fh:
                json.dump(out, fh, indent=2)
        return out

    # -- stage 2: multi-view rendering -----------------------------------

    def render_views(self, selected: Sequence[Dict]) -> Dict[str, Dict]:
        markers = [(np.asarray(s["position"]), MARKER_COLORS[i % len(MARKER_COLORS)][1])
                   for i, s in enumerate(selected)]
        return render_canonical_views(self.mesh, out_dir=self.out_dir,
                                      resolution=self.resolution, markers=markers,
                                      view_names=self.view_names)

    # -- stage 3: best-view choice ---------------------------------------

    def choose_best_view(self, views: Dict[str, Dict],
                         best_view: Optional[str] = None) -> str:
        if best_view is not None:
            return best_view
        if self.mllm is None:
            return "top"
        names = list(views)
        prompt = (
            "You see renders of one object from these viewpoints: "
            f"{', '.join(names)}. Pick the single viewpoint where the marked "
            "colored dots on distinct parts are most clearly visible and "
            "separated. Answer as JSON: {\"view\": \"<name>\"}."
        )
        imgs = [views[n]["marked"] for n in names]
        resp = with_retry(lambda seed: self.mllm.chat(prompt, imgs, seed=seed))
        view = extract_json(resp)["view"].lower()
        return view if view in views else names[0]

    # -- stage 4: part naming --------------------------------------------

    def name_parts(self, views: Dict[str, Dict], best_view: str,
                   names: Optional[Sequence[str]] = None,
                   n_parts: int = 2) -> Dict[str, str]:
        colors = [c for c, _ in MARKER_COLORS[:n_parts]]
        if names is not None:
            prompts = dict(zip(colors, names))
        elif self.mllm is not None:
            prompt = (
                "The image shows an articulated object with colored dots "
                f"marking {n_parts} parts ({', '.join(colors)}). Name each "
                "part with a short noun phrase. Answer as JSON: "
                '{"RED": "<part name>", "GREEN": "<part name>"}.'
            )
            resp = with_retry(lambda seed: self.mllm.chat(
                prompt, [views[best_view]["marked"]], seed=seed))
            parsed = extract_json(resp)
            prompts = {c: str(parsed.get(c, f"part {i}"))
                       for i, c in enumerate(colors)}
        else:
            prompts = {c: f"part {i}" for i, c in enumerate(colors)}
        if self.out_dir:
            with open(os.path.join(self.out_dir, "clip_prompts.json"), "w") as fh:
                json.dump(prompts, fh, indent=2)
        return prompts

    # -- stage 5: mask generation + selection ----------------------------

    def segment_part(self, image: np.ndarray, prompt: str,
                     marker_uv: Optional[Tuple[float, float]] = None,
                     chosen_index: Optional[int] = None) -> np.ndarray:
        """Generate candidate masks, rank, pick (scripted index, marker
        containment, scorer rank, or MLLM), dilate.

        With no mask_generator configured, the checked-in learned model
        (artic/masknet) is loaded on first use — the counterpart of the
        reference segmenter shipping with SAM by default
        (interactive_segmenter.py:140-151)."""
        if self.mask_generator is None:
            import os

            from robosimgs_tpu.artic.masknet import (DEFAULT_WEIGHTS,
                                                     MaskNetGenerator)
            if not os.path.exists(DEFAULT_WEIGHTS):
                raise ValueError(
                    "no mask generator backend configured and no masknet "
                    "weights found — pass mask_generator= or run "
                    "scripts/train_masknet.py")
            self.mask_generator = MaskNetGenerator()
        candidates = self.mask_generator.generate(image)
        hw = image.shape[0] * image.shape[1]
        candidates = [m for m in candidates
                      if self.min_mask_area * hw <= m.sum() <= self.max_mask_area * hw]
        if not candidates:
            raise ValueError("no candidate masks within area bounds")
        if self.out_dir:
            self._dump_candidate_grid(image, candidates, prompt)
        if chosen_index is not None:
            best = candidates[chosen_index]
        elif marker_uv is not None:
            u, v = int(round(marker_uv[0])), int(round(marker_uv[1]))
            containing = [m for m in candidates
                          if 0 <= v < m.shape[0] and 0 <= u < m.shape[1] and m[v, u]]
            pool = containing or candidates
            best = min(pool, key=lambda m: m.sum())  # tightest containing mask
        elif self.scorer is not None:
            # rank by scoring each visually-prompted candidate against
            # the part name. Default prompt = FGVP blur-mask (sharp
            # inside the mask, heavy blur outside — the reference runs
            # this before CLIP ranking); the blurred base image is
            # computed once and reused across candidates.
            if self.visual_prompt == "blur":
                from robosimgs_tpu.artic.visual_prompt import gaussian_blur
                h = image.shape[0]
                blurred = np.asarray(gaussian_blur(
                    jnp.asarray(image, jnp.float32),
                    max(1.0, 100.0 * h / 800)))
                prompted = [np.where(m[..., None], image, blurred)
                            for m in candidates]
            else:
                prompted = [np.where(m[..., None], image, 1.0)
                            for m in candidates]
            scores = [float(self.scorer.score(im, [prompt, "background"])[0])
                      for im in prompted]
            best = candidates[int(np.argmax(scores))]
        else:
            best = max(candidates, key=lambda m: m.sum())
        return dilate_mask(best, self.mask_dilate_px)

    # -- stage 6: split + export -----------------------------------------

    def split_and_export(self, mask: np.ndarray, camera: Camera,
                         prompts: Dict[str, str], view_name: str
                         ) -> Dict[str, Mesh]:
        colors = list(prompts)
        part_a, part_b, _ = split_mesh_by_mask(self.mesh, mask, camera)
        if part_a.faces.shape[0] == 0 or part_b.faces.shape[0] == 0:
            raise ValueError(
                "degenerate split: one part has no faces — the mask covers "
                "all (or none) of the projected face centroids; reduce "
                "mask_dilate_px or pick a different view")
        parts = {colors[0]: part_a, colors[1]: part_b}
        if self.out_dir:
            np.save(os.path.join(self.out_dir, f"mask_{colors[0]}_{view_name}.npy"),
                    mask)
            inv = ~mask
            np.save(os.path.join(self.out_dir, f"mask_{colors[1]}_{view_name}.npy"),
                    inv)
            for color, mesh in parts.items():
                save_mesh(os.path.join(self.out_dir, f"part_{color}.glb"), mesh)
        return parts

    def _dump_candidate_grid(self, image: np.ndarray, candidates, prompt: str):
        """Candidate-mask debug grid (the reference's observability-as-
        testing artifact dumps, SURVEY.md §4 item 3)."""
        from PIL import Image as PILImage

        debug_dir = os.path.join(self.out_dir, "debug")
        os.makedirs(debug_dir, exist_ok=True)
        tiles = []
        for m in candidates[:16]:
            overlay = image.copy()
            overlay[m] = 0.5 * overlay[m] + 0.5 * np.asarray([1.0, 0.2, 0.2])
            tiles.append(overlay)
        cols = min(4, len(tiles))
        rows = -(-len(tiles) // cols)
        H, W = image.shape[:2]
        grid = np.ones((rows * H, cols * W, 3), np.float32)
        for i, t in enumerate(tiles):
            r, c = divmod(i, cols)
            grid[r * H:(r + 1) * H, c * W:(c + 1) * W] = t
        safe = "".join(ch if ch.isalnum() else "_" for ch in prompt)[:40]
        PILImage.fromarray((np.clip(grid, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(debug_dir, f"candidates_{safe}.png"))

    def load_cached(self) -> Optional[Dict]:
        """Resume support: load prior selected_points/clip_prompts/mask
        artifacts from out_dir (the reference's disk-cache resume,
        `interactive_segmenter.py:1495-1534`)."""
        if not self.out_dir:
            return None
        sp = os.path.join(self.out_dir, "selected_points.json")
        cp = os.path.join(self.out_dir, "clip_prompts.json")
        if not (os.path.exists(sp) and os.path.exists(cp)):
            return None
        cached = {"selected": json.load(open(sp)),
                  "prompts": json.load(open(cp)), "masks": {}}
        for f in os.listdir(self.out_dir):
            if f.startswith("mask_") and f.endswith(".npy"):
                color_view = f[len("mask_"):-len(".npy")]
                color, view = color_view.split("_", 1)
                cached["masks"][(color, view)] = np.load(
                    os.path.join(self.out_dir, f))
        return cached

    # -- full pipeline ----------------------------------------------------

    def run(
        self,
        points: Sequence,
        part_names: Optional[Sequence[str]] = None,
        best_view: Optional[str] = None,
        mask_index: Optional[int] = None,
        resume: bool = False,
    ) -> SegmentationResult:
        if resume:
            cached = self.load_cached()
            if cached and cached["masks"]:
                prompts = cached["prompts"]
                (color0, view), mask = next(iter(
                    ((cv, m) for cv, m in cached["masks"].items()
                     if cv[0] == list(prompts)[0])), ((None, None), None))
                if mask is not None:
                    cam = render_canonical_views(
                        self.mesh, resolution=self.resolution,
                        view_names=[view])[view]["camera"]
                    parts = self.split_and_export(mask.astype(bool), cam,
                                                  prompts, view)
                    colors = list(prompts)
                    return SegmentationResult(
                        parts=parts, prompts=prompts, best_view=view,
                        masks={colors[0]: mask.astype(bool),
                               colors[1]: ~mask.astype(bool)})
        selected = self.select_points(points)
        views = self.render_views(selected)
        view = self.choose_best_view(views, best_view)
        prompts = self.name_parts(views, view, part_names,
                                  n_parts=max(len(selected), 2))
        cam = views[view]["camera"]
        uv, _ = project_points(
            np.asarray([selected[0]["position"]], np.float32), cam)
        mask = self.segment_part(views[view]["clean"], list(prompts.values())[0],
                                 marker_uv=tuple(uv[0]), chosen_index=mask_index)
        parts = self.split_and_export(mask, cam, prompts, view)
        colors = list(prompts)
        return SegmentationResult(
            parts=parts, prompts=prompts, best_view=view,
            masks={colors[0]: mask, colors[1]: ~mask})
