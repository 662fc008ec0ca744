"""Cross-validate conv/deconv semantics against torch (CPU) — an
implementation independent of both TF and our JAX code.

tf.nn.conv2d_transpose(SAME, stride 2, k 5) with filter [k,k,out,in]
equals torch.nn.functional.conv_transpose2d with padding=2,
output_padding=1 (for even input sizes) and weight [in,out,k,k]
(torch's transposed-conv weight layout, spatially unflipped — both
frameworks define transposed conv as the adjoint of correlation).
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax.numpy as jnp  # noqa: E402

from edgegan_tpu.ops import conv2d, deconv2d  # noqa: E402


def test_conv2d_same_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 3).astype(np.float32)
    w = rng.randn(4, 4, 3, 16).astype(np.float32)  # HWIO
    ours = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), stride=2))
    # torch: NCHW, OIHW weights; SAME pad for k=4,s=2,in=8: pad_total=2
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    wt = torch.from_numpy(w.transpose(3, 2, 0, 1))
    xt = torch.nn.functional.pad(xt, (1, 1, 1, 1))
    got = torch.nn.functional.conv2d(xt, wt, stride=2)
    theirs = got.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_deconv2d_matches_torch_conv_transpose():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 4, 4, 6).astype(np.float32)
    w = rng.randn(5, 5, 10, 6).astype(np.float32)  # [k,k,out,in] TF layout
    ours = np.asarray(deconv2d(jnp.asarray(x), jnp.asarray(w), (8, 8),
                               stride=2))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    # torch conv_transpose2d weight: [in, out, k, k]
    wt = torch.from_numpy(w.transpose(3, 2, 0, 1))
    # TF SAME for the forward conv (in 8, k 5, s 2) pads (lo 1, hi 2) —
    # asymmetric. Build the full (uncropped) transposed output in torch
    # and crop [lo : lo+8] to match TF's gradient placement.
    full = torch.nn.functional.conv_transpose2d(xt, wt, stride=2)  # 11x11
    got = full[:, :, 1:9, 1:9]
    theirs = got.numpy().transpose(0, 2, 3, 1)
    assert theirs.shape == ours.shape == (2, 8, 8, 10)
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_deconv2d_stride1_1x1_matches_torch():
    # the deresidual2 shortcut case: k=1, s=1 SAME
    rng = np.random.RandomState(2)
    x = rng.randn(1, 6, 6, 4).astype(np.float32)
    w = rng.randn(1, 1, 8, 4).astype(np.float32)
    ours = np.asarray(deconv2d(jnp.asarray(x), jnp.asarray(w), (6, 6),
                               stride=1))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    wt = torch.from_numpy(w.transpose(3, 2, 0, 1))
    got = torch.nn.functional.conv_transpose2d(xt, wt, stride=1, padding=0)
    theirs = got.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
