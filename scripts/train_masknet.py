"""Train the learned point-prompted mask model (SAM's role) and save
the checked-in weights.

Trains `artic/masknet.MaskUNet` on synthetic multi-part assemblies
rendered by this framework's own mesh rasterizer (the Segmenter's input
distribution), reports held-out prompt-mask IoU, and writes
`robosimgs_tpu/artic/weights/masknet.msgpack` so `MaskNetGenerator()`
works out of the box.

Run: python scripts/train_masknet.py [steps] [size]
(CPU-friendly; on TPU use scripts/tpu_run.sh for the wedge protocol.)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 96

    import jax

    from robosimgs_tpu.artic.masknet import (DEFAULT_WEIGHTS,
                                             MaskNetGenerator, load_params,
                                             make_scene, save_params,
                                             train_masknet)

    # MASKNET_FINETUNE=1: warm-start from the checked-in weights and
    # train on the v4 mix (40% open-box hinged-flap scenes = the
    # articulated-scan geometry, prompt-centered crop augmentation
    # matching multi-scale prompted inference), lower lr
    finetune = bool(int(os.environ.get("MASKNET_FINETUNE", "0")))
    init = load_params(size=size) if finetune else None

    print(f"backend={jax.default_backend()} steps={steps} size={size} "
          f"finetune={finetune}", flush=True)
    t0 = time.time()
    res = train_masknet(steps=steps, size=size, batch=16,
                        n_scenes=int(os.environ.get("MASKNET_SCENES", 160)),
                        log_every=50, seed=int(os.environ.get(
                            "MASKNET_SEED", 0)),
                        init_params=init,
                        lr=5e-4 if finetune else 2e-3,
                        flap_frac=0.4 if finetune else 0.0,
                        crop_aug=finetune)
    print(f"trained in {time.time()-t0:.0f}s; holdout prompt-mask IoU "
          f"{res.holdout_iou:.3f}", flush=True)

    save_params(res.params, DEFAULT_WEIGHTS)
    print(f"saved {DEFAULT_WEIGHTS} "
          f"({os.path.getsize(DEFAULT_WEIGHTS)/1e6:.1f} MB)")

    # automatic-generation sanity on fresh scenes
    gen = MaskNetGenerator(res.params, size=size)
    import numpy as np
    best_ious = []
    for s in range(6):
        img, pid = make_scene(777_100 + s, size)
        masks = gen.generate(img)
        best = 0.0
        for p in np.unique(pid[pid >= 0]):
            gt = pid == p
            for m in masks:
                best = max(best, (m & gt).sum() / max((m | gt).sum(), 1))
        best_ious.append(best)
        print(f"scene {s}: {len(masks)} masks, best part IoU {best:.3f}",
              flush=True)
    print(f"mean best-IoU over fresh scenes: {np.mean(best_ious):.3f}")


if __name__ == "__main__":
    main()
