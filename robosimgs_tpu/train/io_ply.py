"""PLY import/export in the standard 3DGS layout.

Binary little-endian PLY with vertex properties
x y z nx ny nz f_dc_0..2 f_rest_0..(3K-4) opacity scale_0..2 rot_0..3 —
the interchange format of reference-trained scenes (`README.md:75`
"export .ply"; parsed by every 3DGS viewer). f_rest is stored
channel-major (all R coeffs, then G, then B), matching the reference
export convention.
"""

from __future__ import annotations

import io
from typing import Optional

import numpy as np

from robosimgs_tpu.core.types import Gaussians


def save_ply(path: str, g: Gaussians) -> None:
    import jax
    gg = jax.device_get(g)
    alive = np.asarray(gg.alive, bool)
    means = np.asarray(gg.means)[alive]
    n = means.shape[0]
    k = 1 + gg.sh_rest.shape[1]
    sh_dc = np.asarray(gg.sh_dc)[alive]
    sh_rest = np.asarray(gg.sh_rest)[alive]          # (n, k-1, 3)
    rest_cm = sh_rest.transpose(0, 2, 1).reshape(n, -1)  # channel-major
    opac = np.asarray(gg.logit_opacities)[alive]
    log_scales = np.asarray(gg.log_scales)[alive]
    quats = np.asarray(gg.quats)[alive]

    names = (["x", "y", "z", "nx", "ny", "nz"]
             + [f"f_dc_{i}" for i in range(3)]
             + [f"f_rest_{i}" for i in range(3 * (k - 1))]
             + ["opacity"]
             + [f"scale_{i}" for i in range(3)]
             + [f"rot_{i}" for i in range(4)])
    data = np.concatenate(
        [means, np.zeros((n, 3), np.float32), sh_dc, rest_cm,
         opac[:, None], log_scales, quats], axis=1).astype("<f4")

    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
    header += [f"property float {nm}" for nm in names]
    header += ["end_header"]
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(data.tobytes())


def load_ply(path: str, capacity: Optional[int] = None) -> Gaussians:
    import jax.numpy as jnp

    with open(path, "rb") as f:
        raw = f.read()
    head_end = raw.index(b"end_header\n") + len(b"end_header\n")
    header = raw[:head_end].decode("ascii").splitlines()
    n = None
    names = []
    fmt = None
    in_vertex = False   # properties are tracked per element; only the
    for line in header:  # vertex element's list defines the row schema
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            in_vertex = parts[1] == "vertex"
            if in_vertex:
                n = int(parts[2])
        elif parts[0] == "property" and in_vertex:
            if parts[1] != "float":
                raise ValueError(f"unsupported property type {parts[1]}")
            names.append(parts[2])
    if n is None:
        raise ValueError("PLY has no vertex element")
    if fmt != "binary_little_endian":
        raise ValueError(f"unsupported PLY format {fmt}")
    arr = np.frombuffer(raw[head_end:], dtype="<f4", count=n * len(names))
    arr = arr.reshape(n, len(names))
    col = {nm: i for i, nm in enumerate(names)}

    means = arr[:, [col["x"], col["y"], col["z"]]]
    sh_dc = arr[:, [col["f_dc_0"], col["f_dc_1"], col["f_dc_2"]]]
    n_rest = sum(1 for nm in names if nm.startswith("f_rest_"))
    if n_rest:
        rest = arr[:, [col[f"f_rest_{i}"] for i in range(n_rest)]]
        sh_rest = rest.reshape(n, 3, n_rest // 3).transpose(0, 2, 1)
    else:
        sh_rest = np.zeros((n, 0, 3), np.float32)
    opac = arr[:, col["opacity"]]
    log_scales = arr[:, [col["scale_0"], col["scale_1"], col["scale_2"]]]
    quats = arr[:, [col["rot_0"], col["rot_1"], col["rot_2"], col["rot_3"]]]

    cap = capacity or n
    if cap < n:
        raise ValueError(f"capacity {cap} < {n} gaussians in file")

    def pad(x, fill=0.0):
        out = np.full((cap,) + x.shape[1:], fill, np.float32)
        out[:n] = x
        return jnp.asarray(out)

    alive = np.zeros((cap,), bool)
    alive[:n] = True
    quats_pad = np.zeros((cap, 4), np.float32)
    quats_pad[:, 0] = 1.0
    quats_pad[:n] = quats
    return Gaussians(
        means=pad(means), quats=jnp.asarray(quats_pad),
        log_scales=pad(log_scales, fill=-10.0),
        logit_opacities=pad(opac, fill=-10.0),
        sh_dc=pad(sh_dc), sh_rest=pad(sh_rest),
        alive=jnp.asarray(alive),
    )
