"""Golden tests: confild_tpu.utils.resizer vs the torch reference Resizer
(``ConditionalDiffusionGeneration/src/util/resizer.py``)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from confild_tpu.utils.resizer import Resizer

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference/ConditionalDiffusionGeneration")
from src.util.resizer import Resizer as TorchResizer  # noqa: E402


def _compare(in_shape, seed=0, atol=1e-5, **kw):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(in_shape).astype(np.float32)
    ours = np.asarray(Resizer(in_shape, **kw)(jnp.asarray(x)))
    ref = TorchResizer(in_shape, **kw)(torch.from_numpy(x)).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=atol, rtol=1e-5)


@pytest.mark.parametrize("kernel", [None, "cubic", "lanczos2", "lanczos3",
                                    "box", "linear"])
def test_downscale_2d_kernels(kernel):
    _compare((16, 16), scale_factor=0.5, kernel=kernel)


@pytest.mark.parametrize("kernel", [None, "lanczos3", "linear"])
def test_upscale_2d_kernels(kernel):
    _compare((8, 12), scale_factor=2, kernel=kernel)


def test_scalar_scale_duplicates_to_2d_on_trailing_dims():
    # scalar scale => [s, s], left-padded with 1s to the input rank
    _compare((3, 16, 16), scale_factor=0.25)


def test_mixed_up_down_scales():
    _compare((12, 12), scale_factor=[0.5, 2.0])


def test_non_integer_scale():
    _compare((15, 15), scale_factor=2 / 3)


def test_output_shape_only():
    _compare((16, 16), output_shape=[10, 6])


def test_output_shape_partial_trailing():
    # output_shape shorter than rank: untouched dims keep reference
    # semantics (input_shape[len(output_shape):] prepended). NOT compared
    # against torch here: with in_shape (2,16,16) the reference's
    # ``np.squeeze`` in ``contributions`` collapses a dim whose filter has a
    # single nonzero tap (degenerate 2->16 antialiased upscale), silently
    # dropping the axis — a reference bug we deliberately do not reproduce.
    out = Resizer((2, 16, 16), output_shape=[8, 8])(jnp.ones((2, 16, 16)))
    assert out.shape == (16, 8, 8)
    assert np.all(np.isfinite(np.asarray(out)))


def test_no_antialiasing():
    _compare((16, 16), scale_factor=0.5, antialiasing=False)


def test_differentiable_and_jittable():
    rz = Resizer((8, 8), scale_factor=0.5)
    f = jax.jit(lambda x: jnp.sum(rz(x) ** 2))
    g = jax.grad(f)(jnp.ones((8, 8)))
    assert g.shape == (8, 8)
    assert np.all(np.isfinite(np.asarray(g)))


def test_unknown_kernel_raises():
    with pytest.raises(ValueError):
        Resizer((8, 8), scale_factor=0.5, kernel="nope")
