"""Hinge detection between two part meshes (contact region + PCA axis).

Re-designed from the reference's HingeDetector
(`/root/reference/Articulation/urdf_generation/hinge_detector.py:10-110`):
contact region = vertices of each part within (min inter-part distance +
1 cm) of the other part; hinge position = mean of the two contact
centroids; axis = principal eigenvector of the contact point covariance;
confidence = dominant-eigenvalue ratio with an X-axis fallback below
0.5. The KD-tree nearest-neighbor queries become tiled matmul-style
distance minima in jnp (TPU-friendly; exact), chunked to bound memory.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from robosimgs_tpu.utils.meshio import Mesh


@dataclasses.dataclass
class HingeResult:
    position: np.ndarray        # (3,)
    axis: np.ndarray            # (3,) unit
    confidence: float
    contact_count_a: int
    contact_count_b: int


def _min_dists(a: jnp.ndarray, b: jnp.ndarray, chunk: int = 2048) -> jnp.ndarray:
    """For each point in a: distance to nearest point in b.

    ||a-b||^2 = |a|^2 + |b|^2 - 2 a.b — the inner term is a matmul, so
    the whole query runs on the MXU instead of a KD-tree.
    """
    b2 = jnp.sum(b * b, axis=1)

    def one(ac):
        a2 = jnp.sum(ac * ac, axis=1, keepdims=True)
        d2 = a2 + b2[None, :] - 2.0 * ac @ b.T
        return jnp.min(jnp.maximum(d2, 0.0), axis=1)

    n = a.shape[0]
    pad = (-n) % chunk
    a_pad = jnp.pad(a, ((0, pad), (0, 0)))
    d2 = jax.lax.map(one, a_pad.reshape(-1, chunk, 3)).reshape(-1)[:n]
    return jnp.sqrt(d2)


class HingeDetector:
    def __init__(self, part_a: Mesh, part_b: Mesh,
                 contact_margin: float = 0.01, trim: int = 0):
        """contact_margin: added to the min inter-part distance (meters).

        trim: robust contact-PCA iterations — after each axis fit, drop
        contact points whose perpendicular distance to the fitted hinge
        LINE exceeds 2x the median, then refit. A mask-driven split
        that mislabels a band of faces along the junction produces fake
        contact pairs off the true hinge line; trimming recovers the
        line (no-op on clean geometric splits, where every contact
        point already lies on it). 0 = exact reference semantics
        (hinge_detector.py:27-95)."""
        self.a = part_a
        self.b = part_b
        self.margin = contact_margin
        self.trim = trim

    def detect(self) -> HingeResult:
        va = jnp.asarray(self.a.vertices)
        vb = jnp.asarray(self.b.vertices)
        da = np.asarray(_min_dists(va, vb))   # per-a-vertex dist to b
        db = np.asarray(_min_dists(vb, va))
        thresh = min(da.min(), db.min()) + self.margin
        ca = self.a.vertices[da <= thresh]
        cb = self.b.vertices[db <= thresh]
        if len(ca) == 0 or len(cb) == 0:
            # parts far apart: fall back to midpoint of nearest pair
            ia, ib = int(da.argmin()), int(db.argmin())
            pos = (self.a.vertices[ia] + self.b.vertices[ib]) / 2.0
            return HingeResult(position=pos.astype(np.float32),
                               axis=np.array([1, 0, 0], np.float32),
                               confidence=0.0, contact_count_a=0,
                               contact_count_b=0)

        contact = np.concatenate([ca, cb], 0)
        from_a = np.zeros(len(contact), bool)
        from_a[: len(ca)] = True

        def fit(points):
            centered = points - points.mean(0)
            cov = centered.T @ centered / max(len(points) - 1, 1)
            eigvals, eigvecs = np.linalg.eigh(cov)   # ascending
            return eigvals, eigvecs[:, -1], centered

        eigvals, axis, centered = fit(contact)
        for _ in range(self.trim):
            perp = np.linalg.norm(
                centered - np.outer(centered @ axis, axis), axis=1)
            ok = perp <= max(2.0 * np.median(perp), 1e-9)
            if ok.all() or ok.sum() < 8 or not (from_a[ok].any()
                                                and (~from_a)[ok].any()):
                break
            contact, from_a = contact[ok], from_a[ok]
            eigvals, axis, centered = fit(contact)
        ca_t, cb_t = contact[from_a], contact[~from_a]
        pos = (ca_t.mean(0) + cb_t.mean(0)) / 2.0
        total = eigvals.sum()
        confidence = float(eigvals[-1] / total) if total > 1e-12 else 0.0
        if confidence < 0.5:
            axis = np.array([1.0, 0.0, 0.0])
        axis = axis / np.linalg.norm(axis)
        return HingeResult(
            position=pos.astype(np.float32),
            axis=axis.astype(np.float32),
            confidence=confidence,
            contact_count_a=int(len(ca)),
            contact_count_b=int(len(cb)),
        )

    @staticmethod
    def translation_to_origin(hinge: HingeResult) -> np.ndarray:
        """Translation that moves the hinge position to the origin."""
        return (-hinge.position).astype(np.float32)
