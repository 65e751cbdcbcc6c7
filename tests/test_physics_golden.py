"""Golden end-to-end physics artifact (VERDICT r4 item 9).

Drives `cli/estimate_physics` over an openbox image RENDERED by this
framework's own mesh rasterizer (the reference's shipped body+lid scan,
`openbox_output/parts/*.glb`), with scripted model fakes, and compares
the FULL output JSON against a committed golden fixture — the same
golden-artifact discipline the articulation path has. Schema semantics:
the Genesis material constructor contracts the reference's
physics_estimation.py:133-175 feeds (MPM = density/youngs_modulus/
poisson_ratio; PBD adds frictions + stretch_compliance).
"""

import json
import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "openbox_physics.json")
PARTS = "/root/reference/Articulation/openbox_output/parts"

SPEC = {
    "caption": "a cardboard box with an open lid on a white background",
    "responses": [
        ["list the 3 most likely materials",
         '{"1": "rigid: plant fiber", "2": "rigid: wood", '
         '"3": "deformable: leather"}'],
        ["Refine them",
         '{"density": 680, "youngs_modulus": 2.4, "poisson_ratio": 0.25}'],
    ],
    "preferences": {"a photo of plant fiber material": 2.0,
                    "a photo of wood material": 1.0},
}


@pytest.fixture(scope="module")
def openbox_image(tmp_path_factory):
    """Render the real openbox scan headless with the mesh rasterizer."""
    import jax.numpy as jnp

    from robosimgs_tpu.core.camera import Camera
    from robosimgs_tpu.render.mesh_raster import (MeshRasterConfig,
                                                  rasterize_mesh)
    from robosimgs_tpu.utils.meshio import concatenate, load_mesh

    mesh = concatenate([load_mesh(os.path.join(PARTS, "body.glb")),
                        load_mesh(os.path.join(PARTS, "lid.glb"))])
    center = mesh.center
    size = float(np.linalg.norm(mesh.vertices - center, axis=1).max())
    eye = center + size * np.asarray([2.2, 1.4, 1.6])
    cam = Camera.look_at(eye, center, [0, 0, 1], 45.0, 224, 224)
    out = rasterize_mesh(jnp.asarray(mesh.vertices),
                         jnp.asarray(mesh.faces), cam,
                         vertex_colors=jnp.asarray(mesh.vertex_colors)
                         if mesh.vertex_colors is not None else None,
                         cfg=MeshRasterConfig(tile_capacity=4096,
                                              max_tiles_per_tri=196))
    st = out["stats"]
    assert int(st.truncated_gaussians) == 0 and int(st.overflowed_tiles) == 0
    img = np.where(np.asarray(out["mask"])[..., None],
                   np.asarray(out["rgb"]), 1.0)
    assert float(np.asarray(out["mask"]).mean()) > 0.1  # object in frame
    path = tmp_path_factory.mktemp("physics") / "openbox.png"
    from PIL import Image
    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(path)
    return str(path)


def test_cli_estimate_physics_matches_golden(openbox_image, tmp_path):
    from robosimgs_tpu.cli.estimate_physics import main

    spec_path = tmp_path / "spec.json"
    spec_path.write_text(json.dumps(SPEC))
    out_path = tmp_path / "physics.json"
    main([openbox_image, "--scripted", str(spec_path),
          "--output", str(out_path)])

    got = json.loads(out_path.read_text())
    golden = json.loads(open(GOLDEN).read())

    assert set(got) == set(golden), (got.keys(), golden.keys())
    for k in ("method", "material", "caption", "candidates", "refined"):
        assert got[k] == golden[k], k
    for mat, score in golden["scores"].items():
        assert got["scores"][mat] == pytest.approx(score, abs=1e-6)
    # Genesis MPM constructor contract: exactly these keys
    assert set(got["params"]) == {"density", "youngs_modulus",
                                  "poisson_ratio"}
    for k, v in golden["params"].items():
        assert got["params"][k] == pytest.approx(v)


def test_cli_material_override_pbd_contract(openbox_image, tmp_path):
    """--material short-circuit: PBD params carry the full Genesis PBD
    schema straight from the table."""
    from robosimgs_tpu.cli.estimate_physics import main

    out_path = tmp_path / "pbd.json"
    main([openbox_image, "--material", "rubber", "--method", "pbd",
          "--output", str(out_path)])
    got = json.loads(out_path.read_text())
    assert got["method"] == "pbd" and got["material"] == "rubber"
    assert set(got["params"]) == {"density", "static_friction",
                                  "kinetic_friction", "stretch_compliance"}
