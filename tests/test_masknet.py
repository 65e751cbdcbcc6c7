"""Learned point-prompted mask model (SAM's role) — training +
automatic-mask-generation + Segmenter integration."""

import numpy as np
import pytest

from robosimgs_tpu.artic.masknet import (MaskNetGenerator, make_scene,
                                         sample_example, train_masknet)


@pytest.fixture(scope="module")
def trained():
    # short CPU training run: enough to learn prompt->part association
    # on the synthetic assembly distribution
    return train_masknet(steps=150, size=64, batch=8, n_scenes=24, seed=0)


def test_masknet_learns(trained):
    assert trained.losses[-1] < trained.losses[0] * 0.5, (
        trained.losses[0], trained.losses[-1])
    assert trained.holdout_iou > 0.45, trained.holdout_iou


def test_masknet_automatic_generation(trained):
    gen = MaskNetGenerator(trained.params, size=64, grid=5)
    img, pid = make_scene(555_000, 64)
    masks = gen.generate(img)
    assert len(masks) >= 1
    for m in masks:
        assert m.shape == img.shape[:2] and m.dtype == bool
    # at least one mask overlaps a true part decently
    best = 0.0
    for p in np.unique(pid[pid >= 0]):
        gt = pid == p
        for m in masks:
            iou = (m & gt).sum() / max((m | gt).sum(), 1)
            best = max(best, iou)
    assert best > 0.4, best
    # upsampling path: full-res input
    img_big = np.asarray(
        np.kron(img, np.ones((2, 2, 1), np.float32)), np.float32)
    masks_big = gen.generate(img_big)
    assert masks_big and masks_big[0].shape == img_big.shape[:2]


def test_masknet_segmenter_integration(trained):
    """The learned model drives Segmenter.segment_part end-to-end
    (marker-containment selection, the scripted pipeline mode)."""
    from robosimgs_tpu.artic.segmentation import Segmenter
    from robosimgs_tpu.utils.meshio import Mesh

    img, pid = make_scene(777_000, 64)
    present, counts = np.unique(pid[pid >= 0], return_counts=True)
    p = int(present[np.argmax(counts)])      # largest visible part
    ys, xs = np.nonzero(pid == p)
    cy, cx = int(np.median(ys)), int(np.median(xs))

    dummy = Mesh(vertices=np.zeros((3, 3), np.float32),
                 faces=np.array([[0, 1, 2]], np.int32))
    seg = Segmenter(dummy, mask_generator=MaskNetGenerator(
        trained.params, size=64, grid=5), mask_dilate_px=0,
        min_mask_area=0.01)
    mask = seg.segment_part(img, "part", marker_uv=(cx, cy))
    assert mask.dtype == bool and mask.shape == img.shape[:2]
    gt = pid == p
    iou = (mask & gt).sum() / max((mask | gt).sum(), 1)
    # the fixture net is deliberately under-trained (150 steps); the
    # bar here is "the learned model picks out the prompted part", not
    # checkpoint quality (scripts/train_masknet.py measures that)
    assert iou > 0.2, iou


def test_masknet_save_load(trained, tmp_path):
    import jax.numpy as jnp

    from robosimgs_tpu.artic.masknet import (MaskUNet, load_params,
                                             save_params)

    path = str(tmp_path / "w.msgpack")
    save_params(trained.params, path)
    loaded = load_params(path, size=64)
    x = jnp.asarray(np.random.default_rng(0).uniform(
        size=(1, 64, 64, 4)).astype(np.float32))
    m = MaskUNet()
    np.testing.assert_allclose(np.asarray(m.apply(trained.params, x)),
                               np.asarray(m.apply(loaded, x)), atol=0)
