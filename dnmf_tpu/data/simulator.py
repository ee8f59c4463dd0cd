"""Ground-truthed synthetic video simulator (JAX PRNG, deterministic).

Rebuild of the reference fixture generator
(``/root/reference/WUtils/Simulator.py``): videos of moving Gaussian
neurons with known positions and activity traces, used as the oracle for
every end-to-end test (SURVEY.md §4).

Deliberate fixes over the reference (SURVEY.md §2.4 #5):

* ``generate_video`` dispatched on ``'qs'`` while its docstring and the
  demo advertised ``'sq'`` — both names select the sequential-quadratic
  model here.
* The reference passed ``motion_par['means']`` into
  ``simulate_quadratic_trajectory``'s ``snr`` argument; here arguments are
  keyword-only and wired correctly.

Statistical notes (behavior preserved, mechanism re-derived for JAX):

* GP motion: the reference samples an *unfitted*
  ``sklearn.GaussianProcessRegressor`` prior at the neuron anchor
  coordinates — per axis ``d``, T i.i.d. draws from
  ``N(0, sigma_d * RBF(ls_d))`` evaluated at the K anchor values
  (``/root/reference/WUtils/Simulator.py:362-391``).  Motion is therefore
  spatially smooth across neurons but temporally white.  Implemented as an
  explicit kernel Cholesky draw; parity with sklearn is statistical
  (mean/cov), not bitwise.
* Cell rendering: the reference evaluates a multivariate-normal pdf with
  covariance ``shape_std * I`` scaled so the peak is 1
  (``Simulator.py:197-212``), i.e. ``exp(-||x - mu||^2 / (2*shape_std))``.
  Note this differs from the *model's* footprint
  ``exp(-||x - p||^2 / shape_std^2)`` — a quirk of the reference that is
  preserved so difficulty is comparable.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from dnmf_tpu.config import SimulatorConfig
from dnmf_tpu.ops.basis import quadratic_basis_points


def _rbf_kernel(x: jnp.ndarray, amplitude: float,
                length_scale: float) -> jnp.ndarray:
    """``amplitude * exp(-(x_i - x_j)^2 / (2 ls^2))`` over scalar inputs."""
    d = x[:, None] - x[None, :]
    return amplitude * jnp.exp(-0.5 * (d / length_scale) ** 2)


def _sample_anchors(
    key: jax.Array,
    num_neurons: int,
    size,
    min_separation: float = 0.0,
    margin: float = 0.0,
) -> jnp.ndarray:
    """Uniform anchors, optionally with a separation/margin constraint.

    ``min_separation=0, margin=0`` reproduces the reference's plain
    ``rand(K,3) * size`` (``Simulator.py:378``).  With constraints, a
    candidate pool is greedily thinned so no two anchors are closer than
    ``min_separation`` (a fixture-quality upgrade: the reference can place
    neurons ~1 px apart, which no demixer separates).
    """
    import numpy as np

    # Clamp the margin per axis: a margin wider than half the axis (e.g.
    # z in thin volumes) would invert the bounds and place anchors
    # outside the volume entirely.
    sz = jnp.asarray(size, dtype=jnp.float32)
    eff = jnp.minimum(jnp.full((3,), margin, dtype=jnp.float32),
                      (sz - 1.0) / 2.0)
    lo = eff
    hi = sz - eff
    if min_separation <= 0.0:
        u = jax.random.uniform(key, (num_neurons, 3))
        return lo + u * (hi - lo)
    pool = np.asarray(
        lo + jax.random.uniform(key, (num_neurons * 50, 3)) * (hi - lo)
    )
    chosen = [pool[0]]
    for cand in pool[1:]:
        if len(chosen) == num_neurons:
            break
        if min(np.linalg.norm(cand - c) for c in chosen) >= min_separation:
            chosen.append(cand)
    if len(chosen) < num_neurons:
        raise ValueError(
            f"could not place {num_neurons} anchors with separation "
            f"{min_separation} in volume {size} (margin {margin})"
        )
    return jnp.asarray(np.stack(chosen))


def gp_motion(
    key: jax.Array,
    num_neurons: int,
    num_frames: int,
    sigma=(10.0, 10.0, 10.0),
    length_scale=(10.0, 10.0, 10.0),
    size=(10, 10, 1),
    min_separation: float = 0.0,
    margin: float = 0.0,
) -> jnp.ndarray:
    """Gaussian-process motion trajectories.

    Returns positions ``[K, 3, T]`` — anchors uniform in the volume plus
    per-frame GP offsets (see module docstring for the reference's exact
    sampling scheme).
    """
    k_anchor, k_eps = jax.random.split(key)
    anchors = _sample_anchors(k_anchor, num_neurons, size,
                              min_separation=min_separation, margin=margin)

    eps = jax.random.normal(k_eps, (3, num_neurons, num_frames))

    def per_axis(d):
        cov = _rbf_kernel(anchors[:, d], sigma[d], length_scale[d])
        # RBF kernels are numerically rank-deficient; a Cholesky in float32
        # NaNs.  Use a symmetric eigendecomposition with clamped
        # eigenvalues — the same Gaussian up to an orthogonal rotation of
        # the white noise.  Factor on host: the matrix is tiny and TPU
        # eigh compiles for minutes through remote-compile setups.
        import numpy as np

        evals, evecs = np.linalg.eigh(np.asarray(cov, dtype=np.float64))
        factor = jnp.asarray(
            (evecs * np.sqrt(np.maximum(evals, 0.0))[None, :]).astype(
                np.float32
            )
        )
        return anchors[:, d][:, None] + factor @ eps[d]

    pos = jnp.stack([per_axis(d) for d in range(3)], axis=1)  # [K, 3, T]
    return pos


def gp_time_motion(
    key: jax.Array,
    num_neurons: int,
    num_frames: int,
    sigma=(2.0, 2.0, 0.1),
    length_scale: float = 10.0,
    size=(10, 10, 1),
    min_separation: float = 0.0,
    margin: float = 0.0,
) -> jnp.ndarray:
    """Temporally-smooth GP motion (capability upgrade over the
    reference's ``'gp'`` model, which draws i.i.d. per-frame offsets —
    see the module docstring).  Each neuron/axis trajectory is a draw
    from ``N(0, sigma_d * RBF(length_scale))`` over *time*.

    Returns positions ``[K, 3, T]``.
    """
    k_anchor, k_eps = jax.random.split(key)
    anchors = _sample_anchors(k_anchor, num_neurons, size,
                              min_separation=min_separation, margin=margin)
    import numpy as np

    t = jnp.arange(num_frames, dtype=jnp.float32)
    evals_list = []
    evecs_list = []
    for d in range(3):
        # Host eigh: tiny matrix, avoids minutes-long TPU eigh compiles.
        cov = np.asarray(_rbf_kernel(t, sigma[d], length_scale),
                         dtype=np.float64)
        evals, evecs = np.linalg.eigh(cov)
        evals_list.append(
            jnp.asarray(np.sqrt(np.maximum(evals, 0.0)).astype(np.float32))
        )
        evecs_list.append(jnp.asarray(evecs.astype(np.float32)))
    eps = jax.random.normal(k_eps, (3, num_neurons, num_frames))
    offsets = jnp.stack(
        [
            (evecs_list[d] * evals_list[d][None, :]) @ eps[d].T
            for d in range(3)
        ],
        axis=0,
    )  # [3, T, K]
    return anchors[:, :, None] + jnp.transpose(offsets, (2, 0, 1))


def _identity_affine_beta(means) -> jnp.ndarray:
    """``[10, 3]`` identity affine with constant offsets ``means``."""
    b = jnp.zeros((10, 3), dtype=jnp.float32)
    b = b.at[0, :].set(jnp.asarray(means, dtype=jnp.float32))
    return b.at[1, 0].set(1.0).at[2, 1].set(1.0).at[3, 2].set(1.0)


def _motion_noise_std(snr_db, size) -> jnp.ndarray:
    """Per-axis noise std ``sqrt(10^(snr/10)) * size`` (reference
    ``Simulator.py:122,156``)."""
    snr = jnp.asarray(snr_db, dtype=jnp.float32)
    sz = jnp.asarray(size, dtype=jnp.float32)
    return jnp.sqrt(10.0 ** (snr / 10.0)) * sz


def quadratic_sequential_trajectory(
    key: jax.Array,
    num_neurons: int,
    num_frames: int,
    means=(0.0, 0.0, 0.0),
    snr_db=(-2.0, -2.0, -2.0),
    size=(20, 20, 1),
) -> jnp.ndarray:
    """Frame-to-frame quadratic motion (reference ``'qs'``/``'sq'`` model,
    ``Simulator.py:96-137``): each frame's positions are a noisy quadratic
    transform of the previous frame's.

    Returns ``[K, 3, T]``.
    """
    k_beta, k_init = jax.random.split(key)
    std = _motion_noise_std(snr_db, size)  # [3]
    noise = jax.random.normal(k_beta, (num_frames, 10, 3)) * std[None, None, :]
    betas = _identity_affine_beta(means)[None] + noise  # [T, 10, 3]

    sz = jnp.asarray(size, dtype=jnp.float32)
    init = ((sz - 1.0) / 2.0) * jax.random.uniform(
        k_init, (num_neurons, 3)
    ) + (sz - 1.0) / 4.0

    def step(prev, beta_t):
        nxt = quadratic_basis_points(prev) @ beta_t
        return nxt, nxt

    # Frame 0 keeps the initial positions (reference :131-135).
    _, rest = jax.lax.scan(step, init, betas[1:])
    pos = jnp.concatenate([init[None], rest], axis=0)  # [T, K, 3]
    return jnp.transpose(pos, (1, 2, 0))


def quadratic_trajectory(
    key: jax.Array,
    num_neurons: int,
    num_frames: int,
    snr_db=(-2.0, -2.0, -2.0),
    size=(20, 20, 1),
) -> jnp.ndarray:
    """Cumulative-noise quadratic motion from frame 0 (reference ``'q'``
    model, ``Simulator.py:139-171``).  Returns ``[K, 3, T]``."""
    k_beta, k_init = jax.random.split(key)
    std = _motion_noise_std(snr_db, size)
    noise = jnp.cumsum(jax.random.normal(k_beta, (num_frames, 10, 3)), axis=0)
    betas = _identity_affine_beta((0.0, 0.0, 0.0))[None] + noise * std[
        None, None, :
    ]

    sz = jnp.asarray(size, dtype=jnp.float32)
    init = (sz - 1.0) * jax.random.uniform(k_init, (num_neurons, 3))
    init = init.at[:, :2].add(4.0)
    phi = quadratic_basis_points(init)  # [K, 10]
    pos = jnp.einsum("kb,tbd->tkd", phi, betas)  # [T, K, 3]
    return jnp.transpose(pos, (1, 2, 0))


def exponential_traces(
    key: jax.Array,
    num_neurons: int,
    num_frames: int,
    density: float = 0.1,
    baseline: float = 1.0,
) -> jnp.ndarray:
    """Sparse spikes convolved with an exponential kernel.

    Reference ``simulate_exponential_traces`` (``Simulator.py:174-195``):
    kernel ``exp(0:-0.3:-3)`` (10 taps), exactly
    ``int(density * (T + 9))`` unit spikes per neuron at distinct times,
    plus baseline.  Returns ``[K, T]``.
    """
    kernel = jnp.exp(jnp.arange(0.0, -3.0, -0.3))
    n = num_frames + kernel.shape[0] - 1
    nnz = int(round(density * n))  # scipy.sparse.rand's nnz rule

    def one(k):
        perm = jax.random.permutation(k, n)
        spikes = jnp.zeros((n,)).at[perm[:nnz]].set(1.0)
        return jnp.convolve(spikes, kernel, mode="valid")

    keys = jax.random.split(key, num_neurons)
    return baseline + jax.vmap(one)(keys)


def render_video(
    positions: jnp.ndarray,
    traces: jnp.ndarray,
    size,
    shape_std: float = 3.0,
) -> jnp.ndarray:
    """Render moving Gaussian cells: ``video[t] = sum_k c[k,t] g_k,t``.

    ``g`` has peak 1 and squared-width ``2*shape_std`` (the reference's
    pdf-with-peak-normalization, see module docstring).  Streams over
    frames with ``lax.scan`` so only one ``[P, K]`` block is live.

    Args:
      positions: ``[K, 3, T]``; traces: ``[K, T]``; size: ``(M, N, Z)``.

    Returns:
      ``[T, M, N, Z]`` clean video (no noise / normalization).
    """
    from dnmf_tpu.ops.basis import voxel_grid
    from dnmf_tpu.ops.footprints import gaussian_footprints

    grid = voxel_grid(size)
    k = positions.shape[0]
    sigma_eff = jnp.full((k,), jnp.sqrt(2.0 * shape_std))
    pos_t = jnp.transpose(positions, (2, 0, 1))  # [T, K, 3]
    c_t = traces.T  # [T, K]

    def frame(_, inputs):
        p, c = inputs
        a = gaussian_footprints(grid, p, sigma_eff)
        return None, a @ c

    _, frames = jax.lax.scan(frame, None, (pos_t, c_t))
    m, n, z = (int(s) for s in size)
    return frames.reshape(-1, m, n, z)


def generate_video(
    config: SimulatorConfig,
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full fixture: video + ground-truth positions and traces.

    Mirrors ``generate_video`` (``Simulator.py:20-77``): render, normalize
    to unit power, add Gaussian background noise at ``bg_snr_db``, rescale
    by the max.

    Returns:
      ``(video[T, M, N, Z], positions[K, 3, T], traces[K, T])`` — video is
      time-major (reference is ``[M, N, Z, T]``; transpose at the boundary
      if needed).
    """
    if key is None:
        key = jax.random.PRNGKey(config.seed)
    k_motion, k_traces, k_noise = jax.random.split(key, 3)

    motion = config.motion
    if motion in ("sq", "qs"):
        positions = quadratic_sequential_trajectory(
            k_motion, config.num_neurons, config.num_frames,
            means=config.motion_means, snr_db=config.motion_snr_db,
            size=config.size,
        )
    elif motion == "q":
        positions = quadratic_trajectory(
            k_motion, config.num_neurons, config.num_frames,
            snr_db=config.motion_snr_db, size=config.size,
        )
    elif motion == "gp":
        positions = gp_motion(
            k_motion, config.num_neurons, config.num_frames,
            sigma=config.gp_sigma, length_scale=config.gp_length_scale,
            size=config.size, min_separation=config.min_separation,
            margin=config.margin,
        )
    elif motion == "gpt":
        positions = gp_time_motion(
            k_motion, config.num_neurons, config.num_frames,
            sigma=config.gp_sigma,
            length_scale=config.gp_length_scale[0],
            size=config.size, min_separation=config.min_separation,
            margin=config.margin,
        )
    else:
        raise ValueError(f"unknown motion model: {motion!r}")

    if config.traces == "exp":
        traces = exponential_traces(
            k_traces, config.num_neurons, config.num_frames,
            density=config.density,
        )
    else:
        raise ValueError(f"unknown trace model: {config.traces!r}")

    video = render_video(positions, traces, config.size, config.shape_std)
    video = video / jnp.sum(video**2)
    bg_std = math.sqrt(10.0 ** (config.bg_snr_db / 10.0))
    video = video + bg_std * jax.random.normal(k_noise, video.shape)
    video = video / jnp.max(video)
    return video, positions, traces


def roi_signals(
    video: jnp.ndarray,
    positions: jnp.ndarray,
    window=(3, 3, 0),
) -> jnp.ndarray:
    """Cube-mean baseline trace extractor.

    Equivalent of ``get_roi_signals`` (``Simulator.py:230-240``): mean of
    the ``(2w+1)``-cube around each rounded tracked position, with
    out-of-volume voxels excluded from the mean.

    Args:
      video: ``[T, M, N, Z]``; positions: ``[K, 3, T]``.

    Returns:
      ``[K, T]`` signals.
    """
    t_frames, m, n, z = video.shape
    wx, wy, wz = (int(w) for w in window)
    offs = jnp.stack(
        jnp.meshgrid(
            jnp.arange(-wx, wx + 1),
            jnp.arange(-wy, wy + 1),
            jnp.arange(-wz, wz + 1),
            indexing="ij",
        ),
        axis=-1,
    ).reshape(-1, 3)  # [W, 3]

    dims = jnp.asarray([m, n, z])
    centers = jnp.round(jnp.transpose(positions, (2, 0, 1))).astype(
        jnp.int32
    )  # [T, K, 3]
    coords = centers[:, :, None, :] + offs[None, None, :, :]  # [T, K, W, 3]
    valid = jnp.all((coords >= 0) & (coords < dims), axis=-1)
    cc = jnp.clip(coords, 0, dims - 1)
    flat_idx = (cc[..., 0] * n + cc[..., 1]) * z + cc[..., 2]  # [T, K, W]
    flat_video = video.reshape(t_frames, -1)
    vals = jnp.take_along_axis(
        flat_video[:, None, :], flat_idx.reshape(t_frames, -1)[:, None, :],
        axis=2,
    ).reshape(coords.shape[:-1])
    # The reference zero-pads out-of-volume voxels and includes them in
    # the mean (subcube pads with 0; nanmean counts zeros —
    # /root/reference/WUtils/Utils.py:48-50, Simulator.py:238), so divide
    # by the full window size.
    s = jnp.sum(jnp.where(valid, vals, 0.0), axis=-1)
    return (s / offs.shape[0]).T  # [K, T]


# ----------------------------------------------------------------------
# Auxiliary fixture generators & SNR calculators
# (host-side NumPy; parity with WUtils/Simulator.py:197-360)
# ----------------------------------------------------------------------
def simulate_cell(size4, mean, cov, color, noise_mean, noise_std,
                  trunc_percentile=0.0, seed=None):
    """Render one multi-channel cell volume with peak-normalized
    multivariate-Gaussian intensity (reference ``simulate_cell``,
    ``/root/reference/WUtils/Simulator.py:197-212``).

    Args:
      size4: ``(M, N, Z, C)``; mean: ``[3]``; cov: ``[3, 3]``;
      color/noise_mean/noise_std: per-channel scalars ``[C]``;
      trunc_percentile: zero out intensities below this percentile.
    """
    import numpy as np

    m, n, z, c = (int(s) for s in size4)
    grid = np.stack(
        np.meshgrid(np.arange(m), np.arange(n), np.arange(z),
                    indexing="ij"),
        axis=-1,
    ).reshape(-1, 3).astype(np.float64)
    diff = grid - np.asarray(mean, dtype=np.float64)
    prec = np.linalg.inv(np.asarray(cov, dtype=np.float64))
    expo = -0.5 * np.einsum("pi,ij,pj->p", diff, prec, diff)
    p = np.exp(expo)  # peak-normalized (the reference rescales the pdf
    # by (2 pi)^{3/2} |cov|^{1/2}, i.e. exactly this)
    if p.size > 1 and trunc_percentile > 0:
        p[p < np.percentile(p, trunc_percentile)] = 0.0
    prob = p.reshape(m, n, z)
    out = np.zeros((m, n, z, c))
    rng = np.random.default_rng(seed)  # None -> fresh entropy per call
    for ch in range(c):
        out[..., ch] = (color[ch] * prob + noise_mean[ch]
                        + noise_std[ch] * rng.standard_normal((m, n, z)))
    return out


def unit_vector(data, axis=None):
    """Normalize by Euclidean norm along ``axis`` (same contract as the
    reference's vendored transformations helper,
    ``/root/reference/WUtils/Simulator.py:340-360``, minus the in-place
    ``out=`` plumbing, which nothing in either codebase uses)."""
    import numpy as np

    data = np.asarray(data, dtype=np.float64)
    if axis is None and data.ndim == 1:
        return data / np.sqrt(np.dot(data, data))
    length = np.sqrt(np.sum(data * data, axis=axis, keepdims=True))
    return data / length


def rotation_matrix(angle, direction):
    """4x4 rotation about an axis direction (fresh implementation of the
    standard Rodrigues form; same contract as the reference's vendored
    helper, ``Simulator.py:318-338``)."""
    import numpy as np

    d = unit_vector(np.asarray(direction[:3], dtype=np.float64))
    s, c = np.sin(angle), np.cos(angle)
    rot = c * np.eye(3) + (1 - c) * np.outer(d, d) + s * np.array(
        [[0, -d[2], d[1]], [d[2], 0, -d[0]], [-d[1], d[0], 0]]
    )
    out = np.eye(4)
    out[:3, :3] = rot
    return out


def generate_random_video(
    cellnum=10, rnd_pos=True, rnd_rot=True, trunc=60.0,
    size=(64, 64, 1, 3, 32), cell_size=(15, 15, 1, 3),
    cov=((7, 0, 0), (0, 2, 0), (0, 0, 1e-6)), noise_std=1.0, seed=0,
):
    """Rotating-cell fixture video (reference ``generate_random_video``,
    ``Simulator.py:244-285``): random-walking, rotating anisotropic cells
    composited into a noisy multi-channel volume sequence.

    Returns ``(video [M,N,Z,C,T], trajectory [T,cellnum,3],
    rotations [T,cellnum,3], colors [cellnum,C])``.
    """
    import numpy as np

    from dnmf_tpu.utils.volume import placement

    rng = np.random.default_rng(seed)
    size = np.asarray(size)
    cell_size = np.asarray(cell_size)
    cov = np.asarray(cov, dtype=np.float64)
    border = np.maximum(size[:3] - cell_size[:3], 0)
    centers = (cell_size[:3] - 1) / 2.0 + rng.random(
        (cellnum, 3)
    ) * border

    t_frames = int(size[4])
    if rnd_pos:
        steps = rng.multivariate_normal(
            np.zeros(3), [[3.0, 0.3, 0], [0.3, 1.4, 0], [0, 0, 1e-6]],
            size=(t_frames, cellnum),
        )
        trajectory = (np.cumsum(steps, axis=0)
                      + centers[None]).astype(int)
    else:
        trajectory = np.tile(centers.astype(int), (t_frames, 1, 1))
    trajectory[trajectory < 0] = 0

    colors = rng.random((cellnum, int(size[3])))
    colors = colors / colors.sum()
    video = noise_std * rng.random(tuple(size))
    center = (cell_size[:3] / 2).astype(int)

    if rnd_rot:
        rot = np.cumsum(
            rng.multivariate_normal(np.zeros(3), 0.01 * np.eye(3),
                                    size=(t_frames, cellnum)),
            axis=0,
        )
    else:
        rot = np.tile(
            rng.multivariate_normal(np.zeros(3), np.eye(3),
                                    size=(1, cellnum)),
            (t_frames, 1, 1),
        )

    for k in range(cellnum):
        for t in range(t_frames):
            rt = rotation_matrix(rot[t, k, 0], [0, 0, 1])[:3, :3]
            rcov = rt.T @ cov @ rt
            cell = simulate_cell(
                tuple(cell_size), center, rcov, colors[k],
                np.zeros(int(size[3])), np.zeros(int(size[3])), trunc,
            )
            video[:, :, :, :, t] += placement(
                tuple(size[:3]), trajectory[t, k], cell
            )
    video = video / video.max()
    return video, trajectory, rot, colors


def compute_snr_intensity(density, cov=None, num_frames=20,
                          bg_std=1e-4, seed=0):
    """Cell-activity SNR from trace/footprint peaks vs noise std
    (reference ``compute_snr_intensity``, ``Simulator.py:287-298``)."""
    import numpy as np

    if cov is None:
        cov = 2 * np.eye(3)
    cov = np.asarray(cov, dtype=np.float64)
    keys = jax.random.split(jax.random.PRNGKey(seed), 10)
    max_c = float(np.mean([
        float(jnp.max(exponential_traces(k, 1, num_frames, density)))
        for k in keys
    ]))
    center = (np.sqrt(np.linalg.eigvals(cov).real) * 3).astype(int)
    sz4 = tuple(center * 2) + (1,)
    max_a = simulate_cell(sz4, center.tolist(), cov, [1.0], [0.0],
                          [0.0]).max()
    return 2 * (np.log10(max_c) + np.log10(max_a) - np.log10(bg_std))


def compute_snr_motion(stds=(1e-3, 1e-3, 1e-5)):
    """Motion SNR of the quadratic coefficients vs identity (reference
    ``compute_snr_motion``, ``Simulator.py:300-309``)."""
    import numpy as np

    b0 = np.zeros((3, 10))
    b0[0, 1] = b0[1, 2] = b0[2, 3] = 1.0
    noise_power = sum(s**2 for s in stds) * b0.size / 3
    return float(np.log((b0**2).sum()) - np.log(noise_power))


def compute_snr_positions(positions):
    """Position SNR: frame-0 energy vs mean drift energy (reference
    ``compute_snr_positions``, ``Simulator.py:311-316``)."""
    import numpy as np

    p = np.asarray(positions)
    num = (p[:, :, 0] ** 2).sum()
    drift = np.mean([
        ((p[:, :, t] - p[:, :, 0]) ** 2).sum()
        for t in range(1, p.shape[2])
    ])
    return float(np.log(num) - np.log(drift))


def simulate_trajectory(num_frames, num_objects, mean, cov, seed=0):
    """Random-walk trajectories: cumulative multivariate-normal steps plus
    per-object mean offsets (reference ``simulate_trajectory``,
    ``Simulator.py:215-227``).

    Returns ``[T, num_objects, 3]``.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    steps = rng.multivariate_normal(
        np.zeros(3), np.asarray(cov, dtype=np.float64),
        size=(num_frames, num_objects),
    )
    traj = np.cumsum(steps, axis=0)
    return traj + np.asarray(mean, dtype=np.float64)[None, :, :]
