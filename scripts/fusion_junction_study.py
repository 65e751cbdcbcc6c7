"""Fusion junction-accuracy study (r5): openbox golden + thin laptop.

Re-measures the r4 cross-object A/B (docs/evidence/fusion_trim_ab_r4.json,
then ad-hoc; committed as a harness this round) after the
distance-to-mask-edge vote weighting landed in fuse_multiview_labels:

  * openbox (the reference's real scan): masknet-driven 3-view fused
    split -> lid face count vs the golden 8393, trimmed-hinge axis
    cos / confidence vs the reference metadata (r4: +266 faces over)
  * synthetic thin-screen laptop: same pipeline against exact GT labels
    (r4: fusion under-claimed 570 -> 257 of 768; the thin-part
    regression that kept fusion off by default)

Run: env PYTHONPATH= JAX_PLATFORMS=cpu python scripts/fusion_junction_study.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OPENBOX = "/root/reference/Articulation/openbox_output"


def study_openbox():
    import numpy as np

    from robosimgs_tpu.artic.hinge import HingeDetector
    from robosimgs_tpu.artic.segmentation import Segmenter
    from robosimgs_tpu.utils.meshio import concatenate, load_mesh

    red = load_mesh(os.path.join(OPENBOX, "segmentation", "part_RED.glb"))
    green = load_mesh(os.path.join(OPENBOX, "segmentation",
                                   "part_GREEN.glb"))
    mesh = concatenate([red, green])
    pts = json.load(open(os.path.join(OPENBOX, "segmentation",
                                      "selected_points.json")))
    golden = json.loads(open(os.path.join(OPENBOX, "urdf",
                                          "metadata.json")).read())
    rows = {}
    for fv in (1, 3):
        seg = Segmenter(mesh, resolution=800, mask_dilate_px=10,
                        fusion_views=fv)
        res = seg.run(points=[pts["points"][0]["position"],
                              pts["points"][1]["position"]],
                      part_names=["lid", "box body"])
        n_red = int(res.parts["RED"].faces.shape[0])
        for trim in ((0, 8) if fv == 1 else (8,)):
            h = HingeDetector(res.parts["RED"], res.parts["GREEN"],
                              trim=trim).detect()
            cos = abs(float(np.dot(h.axis,
                                   np.asarray(golden["hinge"]["axis"]))))
            rows[f"fv{fv}_trim{trim}"] = {
                "lid_faces": n_red,
                "over_golden": n_red - int(red.faces.shape[0]),
                "axis_cos": round(cos, 4),
                "conf": round(float(h.confidence), 3)}
            print(f"openbox fv{fv} trim{trim}: lid={n_red} "
                  f"(+{n_red - red.faces.shape[0]}) cos={cos:.4f} "
                  f"conf={h.confidence:.3f}", flush=True)
    rows["golden_lid_faces"] = int(red.faces.shape[0])
    return rows


def build_laptop():
    """Thin-screen laptop: base slab + screen slab hinged at the back
    edge, opened ~110 deg. Returns (mesh, gt_screen_faces bool)."""
    import numpy as np

    from robosimgs_tpu.utils.bake import subdivide_mesh
    from robosimgs_tpu.utils.meshio import Mesh, concatenate

    def box(size, offset):
        sx, sy, sz = size
        v = np.array([[x, y, z] for x in (0, sx) for y in (0, sy)
                      for z in (0, sz)], np.float32) + np.asarray(
            offset, np.float32)
        f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                      [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                      [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]],
                     np.int32)
        return Mesh(vertices=v, faces=f)

    base = subdivide_mesh(box((0.5, 0.35, 0.02), (0, 0, 0)), 3)
    screen = subdivide_mesh(box((0.5, 0.02, 0.35), (0, 0, 0)), 3)
    # hinge at the back edge (y = 0.35, z = 0.02): rotate the screen
    # back by ~20 deg past vertical (open ~110 deg)
    th = np.radians(110.0)
    c, s = np.cos(th - np.pi / 2), np.sin(th - np.pi / 2)
    R = np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)
    sv = screen.vertices @ R.T + np.asarray([0.0, 0.35, 0.02], np.float32)
    screen = Mesh(vertices=sv.astype(np.float32), faces=screen.faces)
    mesh = concatenate([screen, base])
    gt = np.zeros(mesh.faces.shape[0], bool)
    gt[: screen.faces.shape[0]] = True
    return mesh, gt, screen, base


def study_laptop():
    import numpy as np

    from robosimgs_tpu.artic.hinge import HingeDetector
    from robosimgs_tpu.artic.segmentation import Segmenter

    mesh, gt, screen, base = build_laptop()
    p_screen = screen.vertices[np.argmax(screen.vertices[:, 2])]
    p_base = base.face_centroids()[np.argmax(
        base.face_centroids()[:, 1] * 0 + base.face_centroids()[:, 0])]
    gt_axis = np.array([1.0, 0.0, 0.0])
    rows = {"gt_screen_faces": int(gt.sum())}
    for fv in (1, 3):
        seg = Segmenter(mesh, resolution=800, mask_dilate_px=10,
                        fusion_views=fv)
        res = seg.run(points=[p_screen.tolist(), p_base.tolist()],
                      part_names=["laptop screen", "laptop base"])
        n_scr = int(res.parts["RED"].faces.shape[0])
        for trim in ((0, 8) if fv == 1 else (8,)):
            h = HingeDetector(res.parts["RED"], res.parts["GREEN"],
                              trim=trim).detect()
            cos = abs(float(np.dot(h.axis, gt_axis)))
            rows[f"fv{fv}_trim{trim}"] = {
                "screen_faces": n_scr, "axis_cos": round(cos, 4),
                "conf": round(float(h.confidence), 3)}
            print(f"laptop fv{fv} trim{trim}: screen={n_scr}/"
                  f"{int(gt.sum())} cos={cos:.4f} "
                  f"conf={h.confidence:.3f}", flush=True)
    return rows


def main():
    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    out = {"measured": "round 5, after distance-to-mask-edge vote "
                       "weighting in fuse_multiview_labels",
           "openbox": study_openbox(),
           "laptop_synthetic": study_laptop()}
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "evidence", "fusion_junction_r5.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
