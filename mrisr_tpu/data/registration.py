"""Rigid registration / resampling for LR->HR alignment.

The reference uses SimpleITK's C++ Mattes-MI rigid registration as a
one-time offline preprocessing step (``src/datasets/mri_datasets.py:54-105``;
SURVEY.md §7 keeps it off the hot path).  SimpleITK is not available in this
image, so this module provides:

* :func:`register_rigid` — gated SimpleITK path (used when the wheel exists).
* :func:`register_rigid_jax` — a TPU/CPU-native alternative: differentiable
  rigid (3-angle + 3-translation) registration by gradient descent on a
  smoothed NMI-surrogate (negative normalised cross-correlation of intensity
  windows), with trilinear resampling in JAX.  Good enough for the
  brain-pair alignment this dataset needs; documented deviation from ITK's
  Mattes-MI optimizer.
* :func:`resample_to_grid` — plain trilinear resample of ``moving`` onto the
  fixed grid given a 4x4 voxel->voxel transform (the registration fallback
  at mri_datasets.py:241 with the identity transform).
"""
from __future__ import annotations

import numpy as np


def _has_sitk() -> bool:
    try:
        import SimpleITK  # noqa: F401

        return True
    except ImportError:
        return False


def register_rigid(fixed: np.ndarray, moving: np.ndarray, **kw) -> np.ndarray:
    """Best-available rigid registration of ``moving`` onto ``fixed``'s grid."""
    if _has_sitk():
        return _register_sitk(fixed, moving, **kw)
    return np.asarray(register_rigid_jax(fixed, moving, **kw))


def _register_sitk(fixed: np.ndarray, moving: np.ndarray, iterations: int = 200, **_):
    import SimpleITK as sitk

    f = sitk.GetImageFromArray(fixed.astype(np.float32))
    m = sitk.GetImageFromArray(moving.astype(np.float32))
    init = sitk.CenteredTransformInitializer(
        f, m, sitk.Euler3DTransform(), sitk.CenteredTransformInitializerFilter.GEOMETRY
    )
    reg = sitk.ImageRegistrationMethod()
    reg.SetMetricAsMattesMutualInformation(numberOfHistogramBins=50)
    reg.SetMetricSamplingStrategy(reg.RANDOM)
    reg.SetMetricSamplingPercentage(0.05)
    reg.SetInterpolator(sitk.sitkLinear)
    reg.SetOptimizerAsRegularStepGradientDescent(
        learningRate=2.0, minStep=1e-4, numberOfIterations=iterations
    )
    reg.SetOptimizerScalesFromPhysicalShift()
    reg.SetInitialTransform(init, inPlace=True)
    reg.Execute(f, m)
    out = sitk.Resample(m, f, init, sitk.sitkLinear, 0.0, m.GetPixelID())
    return sitk.GetArrayFromImage(out)


# ---------------------------------------------------------------------------
# JAX-native rigid registration
# ---------------------------------------------------------------------------

def _euler_matrix(angles):
    import jax.numpy as jnp

    ax, ay, az = angles
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rz @ ry @ rx


def _trilinear_sample(vol, coords):
    """Sample ``vol`` [D,H,W] at continuous ``coords`` [3, N] (edge clamp)."""
    import jax.numpy as jnp

    shape = jnp.array(vol.shape)
    c = jnp.clip(coords, 0.0, (shape - 1)[:, None].astype(coords.dtype))
    c0 = jnp.floor(c).astype(jnp.int32)
    c1 = jnp.minimum(c0 + 1, (shape - 1)[:, None])
    f = c - c0

    def gather(z, y, x):
        return vol[z, y, x]

    out = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                zz = jnp.where(dz, c1[0], c0[0])
                yy = jnp.where(dy, c1[1], c0[1])
                xx = jnp.where(dx, c1[2], c0[2])
                w = (
                    jnp.where(dz, f[0], 1 - f[0])
                    * jnp.where(dy, f[1], 1 - f[1])
                    * jnp.where(dx, f[2], 1 - f[2])
                )
                out = out + w * gather(zz, yy, xx)
    return out


def _transform_and_sample(moving, params, out_shape):
    import jax.numpy as jnp

    angles, trans = params[:3], params[3:]
    R = _euler_matrix(angles)
    center = (jnp.array(out_shape, jnp.float32) - 1) / 2.0
    idx = jnp.stack(
        jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32) for s in out_shape], indexing="ij"),
        axis=0,
    ).reshape(3, -1)
    src = R @ (idx - center[:, None]) + center[:, None] + trans[:, None]
    return _trilinear_sample(moving, src).reshape(out_shape)


def register_rigid_jax(
    fixed: np.ndarray,
    moving: np.ndarray,
    iterations: int = 150,
    lr: float = 0.05,
    downsample: int = 4,
    **_,
) -> np.ndarray:
    """Gradient-based rigid registration with an NCC objective.

    Optimises at a coarse grid for speed, applies the found transform at
    full resolution.  Fully jit-compiled; runs on whatever backend is active.
    """
    import jax
    import jax.numpy as jnp
    import optax

    f = jnp.asarray(fixed, jnp.float32)
    m = jnp.asarray(moving, jnp.float32)
    # normalise intensities for the metric
    f_n = (f - f.mean()) / (f.std() + 1e-6)
    m_n = (m - m.mean()) / (m.std() + 1e-6)
    small = tuple(max(8, s // downsample) for s in fixed.shape)
    f_small = jax.image.resize(f_n, small, "linear")
    m_small = jax.image.resize(m_n, small, "linear")

    def loss_fn(params):
        warped = _transform_and_sample(m_small, params, small)
        wn = (warped - warped.mean()) / (warped.std() + 1e-6)
        return -jnp.mean(wn * f_small)  # negative NCC

    params = jnp.zeros((6,), jnp.float32)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        g = jax.grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state

    for _ in range(iterations):
        params, opt_state = step(params, opt_state)

    # Apply at full resolution (translation scales with the downsample factor)
    scale = jnp.array(
        [fs / ss for fs, ss in zip(fixed.shape, small)], jnp.float32
    )
    full_params = jnp.concatenate([params[:3], params[3:] * scale])
    return np.asarray(_transform_and_sample(m, full_params, fixed.shape))


def resample_to_grid(moving: np.ndarray, out_shape: tuple[int, int, int]) -> np.ndarray:
    """Identity-transform trilinear resample onto a target grid."""
    import jax
    import jax.numpy as jnp

    return np.asarray(
        jax.image.resize(jnp.asarray(moving, jnp.float32), out_shape, "linear")
    )
