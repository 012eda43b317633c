"""Feature detection, description and matching — the reference's hot path.

TPU-native replacement for OpenCV's ``detect_features`` (SURF et al.,
VO_utility.cpp:91-126) and ``match_features`` (BF kNN + Lowe ratio,
VO_utility.cpp:515-573), redesigned per SURVEY.md §2.1:

  * fixed ``MAX_KPTS`` keypoint budget with validity masks,
  * integral-image box-filter Hessian pyramid (SURF structure) built from
    static slice arithmetic — no gathers in the dense part,
  * top-K selection + batched sub-pixel refinement,
  * upright SURF-64 descriptors from a nearest/bilinear-sampled patch grid,
  * matmul distance matrix + top-2 + Lowe ratio as one fused computation
    (Pallas kernel on TPU, XLA reference path everywhere).
"""

from ergo_uvo_tpu.features.integral import integral_image  # noqa: F401
from ergo_uvo_tpu.features.detector import (  # noqa: F401
    Keypoints,
    detect_surf,
)
from ergo_uvo_tpu.features.descriptor import (  # noqa: F401
    describe_surf,
    describe_upright_surf,
    surf_orientations,
)
from ergo_uvo_tpu.features.matcher import (  # noqa: F401
    Matches,
    match_descriptors,
    match_and_gather,
)
from ergo_uvo_tpu.features.frontend import detect_and_describe  # noqa: F401
from ergo_uvo_tpu.features.akaze import (  # noqa: F401
    detect_akaze,
    describe_akaze,
    detect_and_describe_akaze,
)
