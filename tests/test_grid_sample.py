"""grid_sample parity vs torch.nn.functional.grid_sample (CPU oracle).

pvd_tpu uses channels-minor layouts ([H, W, C] etc.) for row-gather
efficiency on TPU; the torch oracle runs on channel-major tensors and the
comparison transposes.
"""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from pvd_tpu.ops import grid_sample_1d, grid_sample_2d, grid_sample_3d


def test_grid_sample_2d_matches_torch():
    rng = np.random.default_rng(0)
    C, H, W, N = 5, 17, 23, 400
    plane = rng.normal(size=(H, W, C)).astype(np.float32)
    # include out-of-range points to exercise zero padding
    pts = rng.uniform(-1.3, 1.3, size=(N, 2)).astype(np.float32)

    ours = np.asarray(grid_sample_2d(jnp.asarray(plane), jnp.asarray(pts)))

    t_out = F.grid_sample(
        torch.from_numpy(plane.transpose(2, 0, 1))[None],
        torch.from_numpy(pts).view(1, N, 1, 2),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=True,
    ).view(C, N)
    np.testing.assert_allclose(ours, t_out.numpy().T, atol=1e-5)


def test_grid_sample_1d_matches_torch_fake2d():
    """The reference samples lines as [1,C,L,1] with fake 2d coords (x=0)."""
    rng = np.random.default_rng(1)
    C, L, N = 4, 31, 300
    line = rng.normal(size=(L, C)).astype(np.float32)
    z = rng.uniform(-1.2, 1.2, size=(N,)).astype(np.float32)

    ours = np.asarray(grid_sample_1d(jnp.asarray(line), jnp.asarray(z)))

    coords = np.stack([np.zeros_like(z), z], axis=-1)  # (x=0, y=z)
    t_out = F.grid_sample(
        torch.from_numpy(line.T.copy()).view(1, C, L, 1),
        torch.from_numpy(coords).view(1, N, 1, 2),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=True,
    ).view(C, N)
    np.testing.assert_allclose(ours, t_out.numpy().T, atol=1e-5)


def test_grid_sample_3d_matches_torch():
    rng = np.random.default_rng(2)
    C, D, H, W, N = 6, 9, 11, 13, 500
    vol = rng.normal(size=(D, H, W, C)).astype(np.float32)
    pts = rng.uniform(-1.2, 1.2, size=(N, 3)).astype(np.float32)

    ours = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(pts)))

    t_out = F.grid_sample(
        torch.from_numpy(vol.transpose(3, 0, 1, 2))[None],
        torch.from_numpy(pts).view(1, 1, N, 1, 3),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=True,
    ).view(C, N)
    np.testing.assert_allclose(ours, t_out.numpy().T, atol=1e-5)
