import jax.numpy as jnp
import numpy as np

from pytorch_object_detection_tpu.ops.targets import generate_level_targets, generate_targets


def _single_gt_setup():
    # stride 8, 4x4 map over a 32x32 image; one GT box (4,4,28,28), label 3
    gt = jnp.array([[[4.0, 4.0, 28.0, 28.0]]])  # [1,1,4]
    labels = jnp.array([[3]], dtype=jnp.int32)
    return gt, labels


def test_single_gt_positives_and_centerness():
    gt, labels = _single_gt_setup()
    t = generate_level_targets((4, 4), 8, (-1.0, 9999.0), gt, labels)
    cls = np.asarray(t.cls)[0, :, 0].reshape(4, 4)
    cnt = np.asarray(t.cnt)[0, :, 0].reshape(4, 4)
    reg = np.asarray(t.reg)[0].reshape(4, 4, 4)

    # coords x,y in {4,12,20,28}; strictly-inside locations are (12,12),(20,12),(12,20),(20,20)
    expected_pos = np.zeros((4, 4), bool)
    expected_pos[1:3, 1:3] = True
    assert (cls == 3).sum() == 4
    np.testing.assert_array_equal(cls == 3, expected_pos)
    np.testing.assert_array_equal(cls != 3, ~expected_pos)
    assert (cls[~expected_pos] == 0).all()

    # centerness of every positive is sqrt((8*8)/(16*16)) = 0.5
    np.testing.assert_allclose(cnt[expected_pos], 0.5, rtol=1e-5)
    np.testing.assert_allclose(cnt[~expected_pos], -1.0)

    # reg at (12,12): l=t=8, r=b=16
    np.testing.assert_allclose(reg[1, 1], [8, 8, 16, 16])
    np.testing.assert_allclose(reg[2, 2], [16, 16, 8, 8])
    np.testing.assert_allclose(reg[0, 0], [-1, -1, -1, -1])


def test_level_range_excludes_large_boxes():
    gt, labels = _single_gt_setup()
    # max offset of interior locations is 16 -> range (-1, 10] excludes all
    t = generate_level_targets((4, 4), 8, (-1.0, 10.0), gt, labels)
    assert (np.asarray(t.cnt) == -1).all()
    assert (np.asarray(t.cls) == 0).all()


def test_center_sampling_radius():
    # huge GT: without center sampling every cell is positive; radius limits to
    # cells within stride*1.5 = 12 of the GT center (16,16) in Chebyshev dist
    gt = jnp.array([[[-100.0, -100.0, 130.0, 130.0]]])
    labels = jnp.array([[5]], dtype=jnp.int32)
    t = generate_level_targets((4, 4), 8, (-1.0, 99999.0), gt, labels)
    cls = np.asarray(t.cls)[0, :, 0].reshape(4, 4)
    # GT center = (15, 15); coords 4,12,20,28 -> |c-15| = 11,3,5,13
    expected = np.zeros((4, 4), bool)
    expected[np.ix_([0, 1, 2], [0, 1, 2])] = True  # dist<12 for coords 4,12,20
    np.testing.assert_array_equal(cls == 5, expected)


def test_min_area_assignment_on_overlap():
    # small box nested in big box, same center: every positive cell is inside
    # both and center-sampled for both -> min-area rule must pick the small one
    gt = jnp.array([[[0.0, 0.0, 32.0, 32.0], [8.0, 8.0, 24.0, 24.0]]])
    labels = jnp.array([[1, 2]], dtype=jnp.int32)
    t = generate_level_targets((4, 4), 8, (-1.0, 99999.0), gt, labels)
    cls = np.asarray(t.cls)[0, :, 0].reshape(4, 4)
    assert cls[1, 1] == 2
    assert cls[2, 2] == 2
    # no location may resolve to the big box (label 1) here
    assert not (cls == 1).any()
    # corner cell (coords (4,4)): inside big box but outside the center-sampling
    # radius of its center (Chebyshev dist 12 is not < 12) -> negative
    assert cls[0, 0] == 0


def test_padded_gts_ignored():
    gt = jnp.array([[[4.0, 4.0, 28.0, 28.0], [-1.0, -1.0, -1.0, -1.0]]])
    labels = jnp.array([[3, -1]], dtype=jnp.int32)
    t = generate_level_targets((4, 4), 8, (-1.0, 9999.0), gt, labels)
    cls = np.asarray(t.cls)[0, :, 0]
    assert set(np.unique(cls)) <= {0, 3}


def test_no_gt_image_all_negative():
    gt = -jnp.ones((1, 3, 4))
    labels = -jnp.ones((1, 3), dtype=jnp.int32)
    t = generate_level_targets((4, 4), 8, (-1.0, 9999.0), gt, labels)
    assert (np.asarray(t.cls) == 0).all()
    assert (np.asarray(t.cnt) == -1).all()
    assert (np.asarray(t.reg) == -1).all()


def test_multi_level_concat_shapes():
    gt, labels = _single_gt_setup()
    shapes = [(8, 8), (4, 4), (2, 2)]
    t = generate_targets(shapes, [4, 8, 16], [(-1, 16), (16, 32), (32, 999)], gt, labels)
    n = sum(h * w for h, w in shapes)
    assert t.cls.shape == (1, n, 1)
    assert t.cnt.shape == (1, n, 1)
    assert t.reg.shape == (1, n, 4)
