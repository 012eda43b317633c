"""Feature frontend: detect + describe in one jittable call.

The TPU-shaped equivalent of the reference's ``detect_features``
(VO_utility.cpp:91-126): one call yields a fixed-K keypoint set and aligned
descriptors.  All four of the reference's dispatch branches are implemented
natively — AKAZE (M-LDB binary), ORB (steered BRIEF binary), SIFT, and SURF
(the configured default for both mono and stereo —
mono_VO_parameters.yaml:15, stereo_VO_parameters.yaml:21).  An unknown name
raises, mirroring the reference's error path (VO_utility.cpp:120-124).
"""

from __future__ import annotations

import jax

from ergo_uvo_tpu.config import AkazeConfig, SurfConfig
from ergo_uvo_tpu.features.descriptor import describe_surf
from ergo_uvo_tpu.features.detector import Keypoints, detect_surf


def detect_and_describe(
    img: jax.Array,
    surf: SurfConfig = SurfConfig(),
    max_keypoints: int = 512,
    feature_detector: str = "SURF",
    orb_threshold: float = 20.0,
    sift_contrast_threshold: float = 0.03,
    sift_edge_threshold: float = 10.0,
    akaze: AkazeConfig = AkazeConfig(),
) -> tuple[Keypoints, jax.Array]:
    """(Keypoints, descriptors) for a preprocessed gray frame.

    Dispatches on `feature_detector` like the reference's ``detect_features``
    (VO_utility.cpp:91-126): SURF (64/128-d float), SIFT (128-d float), ORB
    (256-bit) and AKAZE (486->512-bit M-LDB) — the binary two return {0,1}
    float bit vectors; match with ``binary=True``.
    """
    name = feature_detector.upper()
    if name == "ORB":
        from ergo_uvo_tpu.features.orb import describe_orb, detect_orb

        kpts = detect_orb(img, max_keypoints=max_keypoints, threshold=orb_threshold)
        kpts = jax.lax.optimization_barrier(kpts)
        desc = describe_orb(img, kpts)
        return kpts, desc
    if name == "AKAZE":
        from ergo_uvo_tpu.features.akaze import detect_and_describe_akaze

        return detect_and_describe_akaze(
            img,
            max_keypoints=max_keypoints,
            threshold=akaze.threshold,
            n_octaves=akaze.n_octaves,
            n_sublevels=akaze.n_sublevels,
            upright=akaze.upright,
        )
    if name == "SIFT":
        from ergo_uvo_tpu.features.sift import detect_and_describe_sift

        return detect_and_describe_sift(
            img,
            max_keypoints=max_keypoints,
            contrast_thresh=sift_contrast_threshold,
            edge_thresh=sift_edge_threshold,
        )
    if name != "SURF":
        raise NotImplementedError(
            f"feature_detector={feature_detector!r}: the reference dispatch "
            "implements AKAZE, ORB, SIFT and SURF (VO_utility.cpp:91-126)"
        )
    kpts = detect_surf(
        img,
        max_keypoints=max_keypoints,
        min_hessian=surf.min_hessian,
        n_octaves=surf.n_octaves,
        n_layers=surf.n_octave_layers,
    )
    # Stage boundary: keep XLA from fusing the detector's response pipeline
    # into the descriptor's per-sample gathers (producer recompute blow-up).
    kpts = jax.lax.optimization_barrier(kpts)
    desc = describe_surf(
        img, kpts, extended=surf.extended, upright=surf.upright
    )
    return kpts, desc
