"""Native C++ IO runtime tests (skipped when the toolchain is missing)."""

import glob

import numpy as np
import pytest

from radnerf_tpu.data import native
from radnerf_tpu.data.color_utils import read_image, read_images

from .fixtures import make_nsvf_dataset


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    return make_nsvf_dataset(str(tmp_path_factory.mktemp("nat")), wh=(48, 40))


needs_native = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


@needs_native
class TestNativeLoader:
    def test_exact_match_no_resize(self, scene):
        paths = sorted(glob.glob(scene + "/rgb/0_*.png"))
        out = native.load_images(paths, (48, 40))
        ref = np.stack([read_image(p, (48, 40)) for p in paths])
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_resize_close_to_cv2(self, scene):
        paths = sorted(glob.glob(scene + "/rgb/0_*.png"))
        out = native.load_images(paths, (24, 20))
        ref = np.stack([read_image(p, (24, 20)) for p in paths])
        # bilinear kernels differ slightly from cv2's INTER_LINEAR
        assert np.abs(out - ref).mean() < 0.01

    def test_batch_helper_uses_native(self, scene):
        paths = sorted(glob.glob(scene + "/rgb/1_*.png"))
        out = read_images(paths, (48, 40))
        assert out.shape == (len(paths), 48 * 40, 3)
        assert out.dtype == np.float32

    def test_morton_matches_jax(self):
        import jax.numpy as jnp

        from radnerf_tpu.ops.morton import morton3d

        rng = np.random.default_rng(0)
        c = rng.integers(0, 1024, (256, 3)).astype(np.int32)
        np.testing.assert_array_equal(
            native.morton3d_cpu(c), np.asarray(morton3d(jnp.asarray(c)))
        )


def test_python_fallback(scene, monkeypatch):
    """read_images must work when the native lib is unavailable."""
    paths = sorted(glob.glob(scene + "/rgb/2_*.png"))
    monkeypatch.setattr(native, "load_images", lambda *a, **k: None)
    out = read_images(paths, (48, 40))
    ref = np.stack([read_image(p, (48, 40)) for p in paths])
    np.testing.assert_allclose(out, ref, atol=1e-6)
