"""Feature frontend tests: FAST vs OpenCV oracle, ORB descriptor invariances,
Hamming matcher exactness and matching quality on warped images."""

import jax
import jax.numpy as jnp
import numpy as np

from monocular_slam_tpu.ops import fast, features, matching, orb


def squares_image(h=120, w=160, sq=10, step=24):
    """Isolated bright squares on black: each square corner is an L-junction
    with a ~12-pixel dark arc — ideal FAST-9 corners. (A perfect checkerboard
    X-junction has two 8-arcs and is invisible to FAST-9 by design.)"""
    img = np.zeros((h, w), np.float32)
    for y0 in range(8, h - sq - 8, step):
        for x0 in range(8, w - sq - 8, step):
            img[y0 : y0 + sq, x0 : x0 + sq] = 255.0
    return img


def textured_image(key, h=240, w=320):
    """Smooth random texture with strong corners (random blobs)."""
    img = jax.random.uniform(key, (h // 8, w // 8)) * 255.0
    img = jax.image.resize(img, (h, w), "cubic")
    return jnp.clip(img, 0, 255).astype(jnp.float32)


class TestFAST:
    def test_detects_square_corners(self):
        img = jnp.asarray(squares_image())
        c = fast.detect(img, 128, threshold=20.0)
        n = int(jnp.sum(c.valid))
        # 4x5 squares x 4 corners = 80 true corners (NMS may merge a few)
        assert n >= 40
        # Every detection is within 2px of a true square corner
        corners = []
        for y0 in range(8, 120 - 10 - 8, 24):
            for x0 in range(8, 160 - 10 - 8, 24):
                corners += [(y0, x0), (y0, x0 + 9), (y0 + 9, x0), (y0 + 9, x0 + 9)]
        corners = np.array(corners, np.float64)
        yx = np.asarray(c.yx)[np.asarray(c.valid)]
        d = np.linalg.norm(yx[:, None] - corners[None], axis=-1).min(axis=1)
        assert d.max() <= 2.5

    def test_blank_image_no_corners(self):
        img = jnp.full((64, 64), 128.0)
        c = fast.detect(img, 32)
        assert int(jnp.sum(c.valid)) == 0

    def test_against_opencv_oracle(self):
        import cv2

        img = np.asarray(textured_image(jax.random.PRNGKey(0)))
        img_u8 = img.astype(np.uint8)
        det = cv2.FastFeatureDetector_create(threshold=25, nonmaxSuppression=True)
        kps_cv = det.detect(img_u8)
        cv_pts = np.array([k.pt[::-1] for k in kps_cv])  # (y, x)

        # Uncapped budget: with the top-K cap lifted, our detector reproduces
        # OpenCV's FAST-9 detections essentially exactly (recall@1px = 1.0).
        ours = fast.detect(jnp.asarray(img_u8.astype(np.float32)), 2000, threshold=25.0)
        our_pts = np.asarray(ours.yx)[np.asarray(ours.valid)]
        assert len(cv_pts) > 10 and len(our_pts) > 10
        d = np.linalg.norm(cv_pts[:, None] - our_pts[None], axis=-1).min(axis=1)
        assert (d <= 1.0).mean() > 0.95, f"only {(d <= 1.0).mean():.2f} matched"

    def test_score_threshold_semantics(self):
        img = jnp.asarray(squares_image())
        s = fast.corner_score(img, threshold=20.0)
        # scores are the max threshold at which the pixel stays a corner
        assert float(jnp.max(s)) <= 255.0
        c_hi = fast.detect(img, 64, threshold=200.0)
        c_lo = fast.detect(img, 64, threshold=20.0)
        assert int(c_hi.valid.sum()) <= int(c_lo.valid.sum())


class TestORB:
    def test_orientation_rotates_with_image(self):
        # Gradient patch: orientation should follow a 90deg rotation.
        img = jnp.asarray(np.tile(np.arange(64, dtype=np.float32) * 4, (64, 1)))
        yx = jnp.array([[32.0, 32.0]])
        a0 = float(orb.orientations(img, yx)[0])
        a90 = float(orb.orientations(jnp.rot90(img), yx)[0])
        diff = (a90 - a0) % (2 * np.pi)
        assert abs(diff - np.pi / 2) < 0.1 or abs(diff - 3 * np.pi / 2) < 0.1

    def test_descriptor_rotation_quasi_invariance(self):
        key = jax.random.PRNGKey(1)
        img = textured_image(key)
        f = features.extract(img, n_features=200, n_levels=1)
        ok = np.asarray(f.valid)
        # Rotate image 30deg around center with cv2, re-extract, match.
        import cv2

        M = cv2.getRotationMatrix2D((160, 120), 30, 1.0)
        img_r = cv2.warpAffine(np.asarray(img), M, (320, 240))
        f2 = features.extract(jnp.asarray(img_r), n_features=200, n_levels=1)
        m = matching.match(f.desc_pm1, f2.desc_pm1, f.valid, f2.valid, ratio=0.9)
        # matched pairs should be geometrically consistent with the rotation
        idx = np.asarray(m.idx)[np.asarray(m.ok)]
        src = np.asarray(f.uv)[np.asarray(m.ok)]
        dst = np.asarray(f2.uv)[idx]
        pred = (M[:, :2] @ src.T).T + M[:, 2]
        err = np.linalg.norm(pred - dst, axis=-1)
        assert int(m.n_matches) > 20
        assert np.median(err) < 3.0

    def test_packed_and_pm1_consistent(self):
        key = jax.random.PRNGKey(2)
        img = textured_image(key)
        f = features.extract(img, n_features=100, n_levels=1)
        pm1 = orb.unpack_pm1(f.desc)
        np.testing.assert_array_equal(np.asarray(pm1), np.asarray(f.desc_pm1))

    def test_popcount_swar(self):
        rng = np.random.RandomState(0)
        x = rng.randint(0, 2**32, size=1000, dtype=np.uint64).astype(np.uint32)
        ours = np.asarray(orb.popcount_u32(jnp.asarray(x)))
        ref = np.array([bin(v).count("1") for v in x])
        np.testing.assert_array_equal(ours, ref)


class TestMatching:
    def test_hamming_matmul_equals_popcount(self):
        rng = np.random.RandomState(3)
        a = rng.randint(0, 2**32, size=(50, 8), dtype=np.uint64).astype(np.uint32)
        b = rng.randint(0, 2**32, size=(60, 8), dtype=np.uint64).astype(np.uint32)
        D_mm = np.asarray(
            matching.hamming_matrix(orb.unpack_pm1(jnp.asarray(a)), orb.unpack_pm1(jnp.asarray(b)))
        )
        D_pc = np.asarray(
            orb.hamming_packed(jnp.asarray(a)[:, None, :], jnp.asarray(b)[None, :, :])
        )
        np.testing.assert_array_equal(D_mm, D_pc)

    def test_self_match_is_identity(self):
        key = jax.random.PRNGKey(4)
        img = textured_image(key)
        f = features.extract(img, n_features=150, n_levels=1)
        m = matching.match(f.desc_pm1, f.desc_pm1, f.valid, f.valid, ratio=1.1, cross_check=False)
        ok = np.asarray(f.valid)
        np.testing.assert_array_equal(np.asarray(m.idx)[ok], np.arange(150)[ok])
        assert np.all(np.asarray(m.dist)[ok] == 0)

    def test_ratio_test_rejects_ambiguous(self):
        # Duplicate descriptors -> second-best == best -> ratio test kills it.
        a = jnp.ones((4, 256), dtype=jnp.int8)
        b = jnp.concatenate([jnp.ones((2, 256), dtype=jnp.int8), -jnp.ones((1, 256), dtype=jnp.int8)])
        valid_a = jnp.ones(4, bool)
        valid_b = jnp.ones(3, bool)
        m = matching.match(a, b, valid_a, valid_b, ratio=0.8, cross_check=False)
        assert int(m.n_matches) == 0

    def test_invalid_masked_out(self):
        rng = np.random.RandomState(5)
        a = jnp.asarray(rng.choice([-1, 1], size=(10, 256)).astype(np.int8))
        b = jnp.asarray(rng.choice([-1, 1], size=(12, 256)).astype(np.int8))
        valid_a = jnp.ones(10, bool).at[3].set(False)
        valid_b = jnp.ones(12, bool)
        m = matching.match(a, b, valid_a, valid_b, ratio=1.0, cross_check=False)
        assert not bool(m.ok[3])


def test_extract_jits_and_is_deterministic():
    key = jax.random.PRNGKey(6)
    img = textured_image(key)
    f1 = jax.jit(lambda im: features.extract(im, n_features=100, n_levels=2))(img)
    f2 = jax.jit(lambda im: features.extract(im, n_features=100, n_levels=2))(img)
    np.testing.assert_array_equal(np.asarray(f1.desc), np.asarray(f2.desc))
    assert f1.uv.shape == (100, 2)


class TestSubpixelFromRaw:
    def test_matches_per_keypoint_recompute(self):
        """subpixel_from_raw == subpixel_offsets for interior keypoints (the
        map path replaces 17 element-granular gathers; identical parabola)."""
        img = textured_image(jax.random.PRNGKey(4))
        c = fast.detect(img, 128, threshold=20.0)
        raw = fast.corner_score_raw(img)
        a = np.asarray(fast.subpixel_offsets(img, c.yx, 20.0))
        b = np.asarray(fast.subpixel_from_raw(raw, c.yx, 20.0))
        v = np.asarray(c.valid)
        np.testing.assert_allclose(a[v], b[v], atol=1e-5)


class TestBinnedDescriptors:
    def test_pm1_matches_packed(self):
        img = textured_image(jax.random.PRNGKey(5))
        c = fast.detect(img, 64, threshold=20.0)
        ang = orb.orientations(img, c.yx)
        packed, pm1 = orb.descriptors_and_pm1(img, c.yx, ang)
        np.testing.assert_array_equal(
            np.asarray(orb.unpack_pm1(packed)), np.asarray(pm1)
        )

    def test_zero_angle_equals_unrotated_pattern(self):
        """At bin 0 the LUT is the raw pattern (rounded, radius-clipped):
        each bit is exactly img[p1] < img[p2]."""
        img = textured_image(jax.random.PRNGKey(6))
        c = fast.detect(img, 32, threshold=20.0)
        K = int(c.yx.shape[0])
        packed, _ = orb.descriptors_and_pm1(img, c.yx, jnp.zeros(K))
        pat = np.asarray(orb.PATTERN, np.int32)
        yx = np.asarray(c.yx).astype(int)
        im = np.asarray(img)
        H, W = im.shape
        v = np.asarray(c.valid)
        for k in range(K):
            if not v[k]:
                continue
            for b in range(16):  # spot-check 16 bits per keypoint
                y1, x1, y2, x2 = pat[b]
                p1 = im[np.clip(yx[k, 0] + y1, 0, H - 1), np.clip(yx[k, 1] + x1, 0, W - 1)]
                p2 = im[np.clip(yx[k, 0] + y2, 0, H - 1), np.clip(yx[k, 1] + x2, 0, W - 1)]
                want = p1 < p2
                got = bool((int(packed[k, b // 32]) >> (b % 32)) & 1)
                # bf16 patch quantization can flip near-equal comparisons
                if abs(float(p1) - float(p2)) > 2.0:
                    assert got == bool(want), (k, b)
