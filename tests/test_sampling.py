"""Gather-free sampling (features/sampling.py) vs direct bilinear gathers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ergo_uvo_tpu.features.sampling import (
    conv2d_same,
    extract_patches,
    hat_matrix,
    sample_patch,
)

pytestmark = pytest.mark.fast

RNG = np.random.default_rng(3)


def _bilinear_ref(img, ys, xs):
    """Direct gather bilinear, ZERO outside (matching hat semantics)."""
    h, w = img.shape
    out = np.zeros(ys.shape, np.float64)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    for dy in (0, 1):
        for dx in (0, 1):
            yi, xi = y0 + dy, x0 + dx
            wgt = (1 - np.abs(ys - yi)) * (1 - np.abs(xs - xi))
            ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w) & (wgt > 0)
            out += np.where(ok, wgt * img[np.clip(yi, 0, h - 1),
                                          np.clip(xi, 0, w - 1)], 0.0)
    return out


def test_hat_matrix_is_bilinear_weights():
    m = np.asarray(hat_matrix(jnp.asarray([1.25, 0.0, -0.5, 4.2]), 5))
    np.testing.assert_allclose(m[0], [0, 0.75, 0.25, 0, 0], atol=1e-6)
    np.testing.assert_allclose(m[1], [1, 0, 0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(m[2], [0.5, 0, 0, 0, 0], atol=1e-6)  # clipped
    np.testing.assert_allclose(m[3], [0, 0, 0, 0, 0.8], atol=1e-6)  # 4.2: 0.8 on grid 4, partner 5 is out of range


def test_extract_patches_matches_direct_bilinear():
    img = RNG.uniform(0, 255, (40, 56)).astype(np.float32)
    K, P = 7, 9
    cx = RNG.uniform(6, 48, K).astype(np.float32)
    cy = RNG.uniform(6, 32, K).astype(np.float32)
    sp = RNG.uniform(0.5, 2.0, K).astype(np.float32)
    got = np.asarray(extract_patches(jnp.asarray(img), jnp.asarray(cx),
                                     jnp.asarray(cy), jnp.asarray(sp), P))
    off = np.arange(P) - (P - 1) / 2
    for k in range(K):
        ys = cy[k] + off[:, None] * sp[k] + 0 * off[None]
        xs = cx[k] + 0 * off[:, None] + off[None] * sp[k]
        ref = _bilinear_ref(img, np.broadcast_to(ys, (P, P)),
                            np.broadcast_to(xs, (P, P)))
        np.testing.assert_allclose(got[k], ref, rtol=1e-4, atol=1e-3)


def test_sample_patch_matches_direct_bilinear():
    K, P, S = 5, 11, 17
    patches = RNG.uniform(0, 1, (K, P, P)).astype(np.float32)
    u = RNG.uniform(-1, P, (K, S)).astype(np.float32)  # incl out-of-range
    v = RNG.uniform(-1, P, (K, S)).astype(np.float32)
    got = np.asarray(sample_patch(jnp.asarray(patches), jnp.asarray(u),
                                  jnp.asarray(v)))
    for k in range(K):
        ref = _bilinear_ref(patches[k], u[k], v[k])
        np.testing.assert_allclose(got[k], ref, rtol=1e-4, atol=1e-5)


def test_conv2d_same_matches_scipy():
    from scipy.signal import correlate2d

    img = RNG.uniform(0, 1, (24, 30)).astype(np.float32)
    ker = RNG.uniform(-1, 1, (5, 5)).astype(np.float32)
    got = np.asarray(conv2d_same(jnp.asarray(img), jnp.asarray(ker)))
    ref = correlate2d(img, ker, mode="same")
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.fast
def test_resize_bilinear_matches_jax_image_resize():
    """Matmul resize == jax.image.resize linear in both antialias modes
    (the ORB pyramid + preprocess fallback rely on this equivalence; it is
    also the axon scan-fault workaround, features/sampling.py)."""
    from ergo_uvo_tpu.features.sampling import resize_bilinear

    rng = np.random.default_rng(0)
    for (h, w, oh, ow) in [(100, 80, 83, 67), (64, 64, 128, 128),
                           (48, 48, 40, 40)]:
        img = jnp.asarray(rng.random((h, w)).astype(np.float32))
        for aa in (False, True):
            a = resize_bilinear(img, oh, ow, antialias=aa)
            b = jax.image.resize(img, (oh, ow), method="linear", antialias=aa)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=0)
