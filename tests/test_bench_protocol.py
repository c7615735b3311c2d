"""Golden for the real-image benchmark leg's preprocessing.

The reference latency protocol (tools/benchmark/dataset.py:46-83) preprocesses
with torchvision ``Resize(size=639, max_size=640)`` followed by pad-to-640
right/bottom with fill 114 and [0,1] scaling. torchvision is absent in this
environment, so the referee below independently transcribes torchvision's
``_compute_resized_output_size`` (torchvision/transforms/functional.py):

    short, long = min(w, h), max(w, h)
    new_short, new_long = size, int(size * long / short)
    if max_size is not None and new_long > max_size:
        new_short, new_long = int(max_size * new_short / new_long), max_size

and PIL is the shared bilinear backend (torchvision's PIL path calls
``img.resize(..., BILINEAR)`` directly), so geometry agreement implies pixel
agreement. The battery includes truncation-sensitive aspect ratios where
``int()`` vs ``round()`` would diverge.
"""
import numpy as np

from PIL import Image

from detrpose_tpu.tools.benchmark import _preprocess_image


def _torchvision_resize_output_size(w, h, size=639, max_size=640):
    # Independent transcription of torchvision _compute_resized_output_size.
    short, long = (w, h) if w <= h else (h, w)
    new_short, new_long = size, int(size * long / short)
    if new_long > max_size:
        new_short, new_long = int(max_size * new_short / new_long), max_size
    return (new_short, new_long) if w <= h else (new_long, new_short)


def test_preprocess_matches_reference_resize639_protocol():
    rng = np.random.default_rng(0)
    for (w, h) in [(640, 480), (480, 640), (639, 639), (1000, 200),
                   (320, 320), (641, 641), (123, 777), (640, 640),
                   (999, 998), (97, 640)]:
        img = Image.fromarray(
            rng.integers(0, 255, (h, w, 3), np.uint8), "RGB")
        rw, rh = _torchvision_resize_output_size(w, h)
        assert max(rw, rh) <= 640 and min(rw, rh) <= 639
        ref = np.asarray(img.resize((rw, rh), Image.BILINEAR))
        canvas, (ow, oh) = _preprocess_image(img)
        assert (ow, oh) == (w, h)
        assert canvas.shape == (640, 640, 3) and canvas.dtype == np.float32
        got_u8 = np.rint(canvas * 255.0).astype(np.uint8)
        # image region: geometry + pixels vs the transcribed protocol
        np.testing.assert_array_equal(got_u8[:rh, :rw], ref)
        # padding region: fill 114 (reference dataset.py pad fill)
        if rh < 640:
            assert (got_u8[rh:, :] == 114).all()
        if rw < 640:
            assert (got_u8[:, rw:] == 114).all()
