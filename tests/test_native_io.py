"""Native host runtime: image codec + threaded prefetch loader.

Builds ``native/libsemslam_native.so`` on demand (skips if the toolchain or
image libraries are unavailable) and checks the C++ decode paths against
PIL-encoded ground truth: 8-bit RGB PNG, 16-bit grayscale PNG (the TUM depth
format, reference ``examples/rgbd_tum.cpp:79-80`` + DepthMapFactor scaling),
JPEG, and the in-order multi-threaded loader over two aligned streams.
"""

import os
import subprocess

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture(scope="module")
def native_lib():
    so = os.path.join(REPO, "native", "libsemslam_native.so")
    if not os.path.exists(so):
        r = subprocess.run(["make", "-C", os.path.join(REPO, "native")],
                           capture_output=True)
        if r.returncode != 0:
            pytest.skip("native build failed: " + r.stderr.decode()[-200:])
    from semantic_slam_tpu.io import native
    if not native.available():
        pytest.skip("native library not loadable")
    return native


def _write_png_pil(path, arr):
    from PIL import Image
    Image.fromarray(arr).save(path)


def test_decode_rgb_png(native_lib, tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (37, 53, 3), np.uint8)
    p = str(tmp_path / "rgb.png")
    _write_png_pil(p, img)
    out = native_lib.imread(p)
    assert out.dtype == np.uint8 and out.shape == (37, 53, 3)
    np.testing.assert_array_equal(out, img)


def test_decode_depth16_png(native_lib, tmp_path):
    rng = np.random.default_rng(1)
    depth = rng.integers(0, 65536, (31, 41), np.uint16)
    p = str(tmp_path / "depth.png")
    _write_png_pil(p, depth)
    out = native_lib.imread(p)
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, depth)


def test_decode_gray8_png(native_lib, tmp_path):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (16, 24), np.uint8)
    p = str(tmp_path / "gray.png")
    _write_png_pil(p, img)
    np.testing.assert_array_equal(native_lib.imread(p), img)


def test_decode_rgba_strips_alpha(native_lib, tmp_path):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (9, 11, 4), np.uint8)
    p = str(tmp_path / "rgba.png")
    _write_png_pil(p, img)
    out = native_lib.imread(p)
    assert out.shape == (9, 11, 3)
    np.testing.assert_array_equal(out, img[..., :3])


def test_decode_jpeg(native_lib, tmp_path):
    from PIL import Image
    rng = np.random.default_rng(4)
    # smooth gradient so JPEG loss is small
    x = np.linspace(0, 255, 64, dtype=np.float32)
    img = np.stack(np.broadcast_arrays(x[None, :], x[:, None],
                                       np.full((64, 64), 128.0)),
                   -1).astype(np.uint8)
    p = str(tmp_path / "im.jpg")
    Image.fromarray(img).save(p, quality=95)
    out = native_lib.imread(p)
    assert out.shape == img.shape
    # decoded-by-PIL (also libjpeg) vs our decoder: identical bits
    ref = np.asarray(Image.open(p))
    np.testing.assert_array_equal(out, ref)


def test_write_png_roundtrip(native_lib, tmp_path):
    from PIL import Image
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (20, 30, 3), np.uint8)
    p = str(tmp_path / "out.png")
    assert native_lib.write_png(p, img)
    np.testing.assert_array_equal(np.asarray(Image.open(p)), img)
    depth = rng.integers(0, 65536, (20, 30), np.uint16)
    p16 = str(tmp_path / "out16.png")
    assert native_lib.write_png(p16, depth)
    np.testing.assert_array_equal(np.asarray(Image.open(p16)), depth)


def test_frame_loader_two_streams_in_order(native_lib, tmp_path):
    """12 frames, 3 decode threads, prefetch 4 — contents must arrive in
    order and match per-frame ground truth, depth scaled by 1/5000."""
    rng = np.random.default_rng(6)
    n = 12
    rgbs, depths, pa, pb = [], [], [], []
    for i in range(n):
        rgb = rng.integers(0, 256, (24, 32, 3), np.uint8)
        dep = rng.integers(0, 30000, (24, 32), np.uint16)
        a = str(tmp_path / f"rgb{i}.png")
        b = str(tmp_path / f"d{i}.png")
        _write_png_pil(a, rgb)
        _write_png_pil(b, dep)
        rgbs.append(rgb)
        depths.append(dep)
        pa.append(a)
        pb.append(b)
    with native_lib.FrameLoader(pa, pb, mode_a=native_lib.MODE_RGB_U8,
                                mode_b=native_lib.MODE_SCALED_F32,
                                scale_b=1.0 / 5000.0, n_threads=3,
                                prefetch=4) as loader:
        assert len(loader) == n and loader.shape == (24, 32)
        got = list(loader)
    assert len(got) == n
    for i, (rgb, dep) in enumerate(got):
        np.testing.assert_array_equal(rgb, rgbs[i])
        np.testing.assert_allclose(dep, depths[i].astype(np.float32) / 5000.0,
                                   rtol=1e-6)


def test_frame_loader_gray_f32_luma(native_lib, tmp_path):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (18, 22, 3), np.uint8)
    p = str(tmp_path / "g.png")
    _write_png_pil(p, img)
    with native_lib.FrameLoader([p], mode_a=native_lib.MODE_GRAY_F32) as ld:
        out = ld.next()
        assert ld.next() is None
    want = (0.299 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2]).astype(np.float32)
    np.testing.assert_allclose(out, want, atol=1e-3)


def test_frame_loader_single_stream_many_threads(native_lib, tmp_path):
    """More threads than frames + tiny prefetch: exercises the window wait."""
    rng = np.random.default_rng(8)
    imgs, paths = [], []
    for i in range(5):
        im = rng.integers(0, 256, (8, 8), np.uint8)
        p = str(tmp_path / f"s{i}.png")
        _write_png_pil(p, im)
        imgs.append(im)
        paths.append(p)
    with native_lib.FrameLoader(paths, mode_a=native_lib.MODE_GRAY_U8,
                                n_threads=8, prefetch=2) as ld:
        for i, out in enumerate(ld):
            np.testing.assert_array_equal(out, imgs[i])
        assert i == 4


def test_frame_loader_decode_error(native_lib, tmp_path):
    good = str(tmp_path / "ok.png")
    _write_png_pil(good, np.zeros((4, 4), np.uint8))
    bad = str(tmp_path / "bad.png")
    with open(bad, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\nnot really a png")
    with native_lib.FrameLoader([good, bad, good],
                                mode_a=native_lib.MODE_GRAY_U8) as ld:
        assert ld.next() is not None
        with pytest.raises(RuntimeError):
            ld.next()
        assert ld.next() is not None  # stream recovers past the bad frame


def test_tum_dataset_stream_uses_loader(native_lib, tmp_path):
    """TumRgbdDataset.stream yields the same frames as __getitem__."""
    from semantic_slam_tpu.io.datasets import TumRgbdDataset

    rng = np.random.default_rng(9)
    (tmp_path / "rgb").mkdir()
    (tmp_path / "depth").mkdir()
    lines = []
    for i in range(4):
        rgb = rng.integers(0, 256, (12, 16, 3), np.uint8)
        dep = rng.integers(0, 20000, (12, 16), np.uint16)
        _write_png_pil(str(tmp_path / "rgb" / f"{i}.png"), rgb)
        _write_png_pil(str(tmp_path / "depth" / f"{i}.png"), dep)
        lines.append(f"{i}.0 rgb/{i}.png {i}.0 depth/{i}.png")
    assoc = tmp_path / "associations.txt"
    assoc.write_text("\n".join(lines) + "\n")
    ds = TumRgbdDataset(str(tmp_path))
    streamed = list(ds.stream(n_threads=2, prefetch=3))
    assert len(streamed) == 4
    for i, (t, rgb, dep) in enumerate(streamed):
        t0, rgb0, dep0 = ds[i]
        assert t == t0
        np.testing.assert_array_equal(rgb, rgb0)
        np.testing.assert_allclose(dep, dep0, rtol=1e-6)


def test_velodyne_range_image_matches_numpy(native_lib, tmp_path):
    from semantic_slam_tpu.io.datasets import velodyne_to_range_image

    rng = np.random.default_rng(10)
    scan = np.zeros((500, 4), np.float32)
    scan[:, 0] = rng.uniform(2.0, 30.0, 500)     # forward (velodyne x)
    scan[:, 1] = rng.uniform(-8.0, 8.0, 500)
    scan[:, 2] = rng.uniform(-2.0, 1.0, 500)
    p = str(tmp_path / "scan.bin")
    scan.tofile(p)
    # velodyne->cam: x_cam = -y_v, y_cam = -z_v, z_cam = x_v
    Tr = np.array([[0, -1, 0, 0.05],
                   [0, 0, -1, -0.03],
                   [1, 0, 0, 0.1]], np.float32)
    K = np.array([[700.0, 0, 600], [0, 700.0, 180], [0, 0, 1]], np.float32)
    W, H = 1242, 375
    ref = velodyne_to_range_image(scan, Tr, K, width=W, height=H)
    got = native_lib.velodyne_range_image(p, Tr, K, W, H)
    assert got is not None
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
