"""Feature frontend: detect + describe in one jittable call.

The TPU-shaped equivalent of the reference's ``detect_features``
(VO_utility.cpp:91-126): one call yields a fixed-K keypoint set and aligned
descriptors.  Only the SURF family is implemented natively (it is the
reference's configured default for both mono and stereo —
mono_VO_parameters.yaml:15, stereo_VO_parameters.yaml:21); requesting another
detector raises, mirroring the reference's unknown-detector error path
(VO_utility.cpp:120-124).
"""

from __future__ import annotations

import jax

from ergo_uvo_tpu.config import SurfConfig
from ergo_uvo_tpu.features.descriptor import describe_upright_surf
from ergo_uvo_tpu.features.detector import Keypoints, detect_surf


def detect_and_describe(
    img: jax.Array,
    surf: SurfConfig = SurfConfig(),
    max_keypoints: int = 512,
    feature_detector: str = "SURF",
) -> tuple[Keypoints, jax.Array]:
    """(Keypoints, (K, 64|128) descriptors) for a preprocessed gray frame."""
    if feature_detector.upper() != "SURF":
        raise NotImplementedError(
            f"feature_detector={feature_detector!r}: only the SURF family is "
            "implemented natively (the reference's configured default)"
        )
    if not surf.upright:
        raise NotImplementedError(
            "oriented SURF not implemented; the reference configs use "
            "upright=true (mono_VO_parameters.yaml:49)"
        )
    kpts = detect_surf(
        img,
        max_keypoints=max_keypoints,
        min_hessian=surf.min_hessian,
        n_octaves=surf.n_octaves,
        n_layers=surf.n_octave_layers,
    )
    desc = describe_upright_surf(img, kpts, extended=surf.extended)
    return kpts, desc
