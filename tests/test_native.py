"""Native C++ runtime ops: build, bind, and match the numpy references."""
import numpy as np
import pytest

from pytorch_object_detection_tpu.native.lib import (
    coco_match_native,
    native_available,
    nms_cpu_native,
    voc_match_native,
)

pytestmark = pytest.mark.skipif(not native_available(), reason="g++ build unavailable")


def _rand_boxes(rng, n, span=300.0):
    xy = rng.uniform(0, span, (n, 2)).astype(np.float32)
    wh = rng.uniform(5, 80, (n, 2)).astype(np.float32)
    return np.concatenate([xy, xy + wh], -1)


def test_voc_match_equals_numpy():
    from pytorch_object_detection_tpu.eval.voc_map import _iou_matrix

    rng = np.random.default_rng(0)
    for _ in range(10):
        gt = _rand_boxes(rng, rng.integers(0, 8))
        preds = _rand_boxes(rng, rng.integers(0, 30))
        got = voc_match_native(gt, preds, 0.5)
        # numpy reference
        assigned = np.zeros(len(gt), bool)
        want = np.zeros(len(preds), bool)
        if len(gt) and len(preds):
            iou = _iou_matrix(gt, preds)
            for j in range(len(preds)):
                best = int(np.argmax(iou[:, j]))
                if iou[best, j] >= 0.5 and not assigned[best]:
                    assigned[best] = True
                    want[j] = True
        np.testing.assert_array_equal(got, want)


def test_nms_cpu_equals_xla_reference():
    import jax.numpy as jnp

    from pytorch_object_detection_tpu.ops.nms import nms_keep_mask

    rng = np.random.default_rng(3)
    boxes = _rand_boxes(rng, 64)
    valid = rng.uniform(size=64) > 0.2
    got = nms_cpu_native(boxes, valid, 0.5)
    want = np.asarray(nms_keep_mask(jnp.asarray(boxes), jnp.asarray(valid), 0.5))
    np.testing.assert_array_equal(got, want)


def test_coco_match_native_vs_python():
    """The full evaluator must produce identical stats with and without the
    native matcher."""
    from pytorch_object_detection_tpu.eval import coco_map

    rng = np.random.default_rng(5)

    def build_eval():
        ev = coco_map.COCOEvaluator(num_classes=3)
        for img in range(4):
            n_gt = int(rng.integers(1, 6))
            gt = _rand_boxes(rng, n_gt)
            gl = rng.integers(1, 4, n_gt)
            n_det = int(rng.integers(0, 12))
            det = _rand_boxes(rng, n_det)
            dl = rng.integers(1, 4, n_det)
            ds = rng.uniform(size=n_det).astype(np.float32)
            ig = rng.uniform(size=n_gt) < 0.2
            ev.add_image(img, gt, gl, det, dl, ds, gt_ignore=ig)
        return ev

    state = rng.bit_generator.state
    ev_native = build_eval()
    stats_native = ev_native.summarize()

    rng.bit_generator.state = state
    ev_py = build_eval()
    import pytorch_object_detection_tpu.native.lib as nl

    orig = nl.native_available
    nl.native_available = lambda: False
    try:
        stats_py = ev_py.summarize()
    finally:
        nl.native_available = orig
    for k in stats_native:
        np.testing.assert_allclose(stats_native[k], stats_py[k], atol=1e-9, err_msg=k)


# ---------------------------------------------------------------------------
# native JPEG loader (jpeg_loader.cpp)
# ---------------------------------------------------------------------------
def _make_jpeg(tmp_path, name, h, w, mode="RGB", quality=90):
    from PIL import Image

    rng = np.random.default_rng(hash(name) % 2**31)
    base = rng.integers(0, 256, (max(h // 8, 1), max(w // 8, 1), 3)).astype(np.uint8)
    img = Image.fromarray(base).convert(mode).resize((w, h))
    p = str(tmp_path / f"{name}.jpg")
    img.save(p, quality=quality)
    return p


def test_jpeg_decode_matches_pil(tmp_path):
    """Native decode is bit-exact vs PIL (both libjpeg-turbo) for baseline
    RGB and grayscale JPEGs."""
    from PIL import Image

    from pytorch_object_detection_tpu.native.lib import jpeg_decode_native

    for name, mode in [("rgb", "RGB"), ("gray", "L")]:
        p = _make_jpeg(tmp_path, name, 243, 317, mode=mode)
        ref = np.asarray(Image.open(p).convert("RGB"))
        got = jpeg_decode_native(p)
        assert got is not None and got.shape == ref.shape
        np.testing.assert_array_equal(got, ref, err_msg=name)


def test_jpeg_decode_tile_matches_decode_to_tile(tmp_path):
    """Direct-to-tile decode reproduces decode_to_tile exactly: content
    top-left, one replicated edge row/col, oversize content cropped."""
    from pytorch_object_detection_tpu.data.pipeline import decode_to_tile
    from pytorch_object_detection_tpu.native.lib import (
        jpeg_decode_native,
        jpeg_decode_tile_native,
    )

    p = _make_jpeg(tmp_path, "t", 200, 300)
    full = jpeg_decode_native(p)
    for tile_hw in [(256, 320), (200, 300), (150, 220), (256, 256)]:
        want_tile, want_hw = decode_to_tile(full, tile_hw)
        got = jpeg_decode_tile_native(p, tile_hw)
        assert got is not None
        got_tile, got_hw = got
        assert got_hw == want_hw, tile_hw
        np.testing.assert_array_equal(got_tile, want_tile, err_msg=str(tile_hw))


def test_jpeg_decode_batch_matches_single(tmp_path):
    from pytorch_object_detection_tpu.native.lib import (
        jpeg_decode_batch_native,
        jpeg_decode_tile_native,
    )

    paths = [
        _make_jpeg(tmp_path, f"b{i}", 100 + 13 * i, 160 + 7 * i) for i in range(6)
    ]
    tiles, hw, ok = jpeg_decode_batch_native(paths, (256, 256), n_threads=3)
    assert ok.all()
    for i, p in enumerate(paths):
        t, (h, w) = jpeg_decode_tile_native(p, (256, 256))
        assert (hw[i] == [h, w]).all()
        np.testing.assert_array_equal(tiles[i], t)


def test_jpeg_decode_declines_then_pil_fallback(tmp_path):
    """Corrupt/CMYK streams return None from the native path; decode_image
    still succeeds through PIL for anything PIL can read (PNG here)."""
    from PIL import Image

    from pytorch_object_detection_tpu.data.decode import decode_image
    from pytorch_object_detection_tpu.native.lib import jpeg_decode_native

    assert jpeg_decode_native(b"\xff\xd8\xff\x00not a jpeg") is None

    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, (40, 50, 3)).astype(np.uint8)
    p = str(tmp_path / "img.png")
    Image.fromarray(arr).save(p)
    np.testing.assert_array_equal(decode_image(p), arr)


def test_voc_raw_tiles_uses_native_fast_path(tmp_path):
    """VOCDataset(raw_tiles=True) end-to-end over the native decode: the
    sample equals the PIL+decode_to_tile construction."""
    from PIL import Image

    from pytorch_object_detection_tpu.data.pipeline import decode_to_tile
    from pytorch_object_detection_tpu.data.voc import VOCDataset

    root = tmp_path / "VOC"
    for sub in ["JPEGImages", "Annotations", "ImageSets/Main"]:
        (root / sub).mkdir(parents=True)
    _make_jpeg(root / "JPEGImages", "000001", 180, 240)
    (root / "Annotations" / "000001.xml").write_text(
        "<annotation><object><name>dog</name><difficult>0</difficult>"
        "<bndbox><xmin>10</xmin><ymin>20</ymin><xmax>110</xmax><ymax>120</ymax></bndbox>"
        "</object></annotation>"
    )
    (root / "ImageSets" / "Main" / "val.txt").write_text("000001\n")

    ds = VOCDataset([str(root)], split="val", canvas_hw=(256, 256), raw_tiles=True)
    s = ds[0]
    ref = np.asarray(Image.open(root / "JPEGImages" / "000001.jpg").convert("RGB"))
    want_tile, (h, w) = decode_to_tile(ref, (256, 256))
    assert s.content_hw == (h, w) == (180, 240)
    np.testing.assert_array_equal(s.image, want_tile)
    scale = min(256 / 180, 256 / 240)
    np.testing.assert_allclose(s.boxes, np.array([[9, 19, 109, 119]]) * scale, rtol=1e-6)
