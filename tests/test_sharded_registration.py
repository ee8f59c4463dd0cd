"""Mesh-sharded registration == single-device chunked registration.

The reference's only parallelism is its chunked registration map
(``/root/reference/Demix/MotionCorrect.py:2088-2117``); the mesh path
makes each time shard one chunk.  With splits == n_shards the two paths
compute identical chunk templates, so shifts and templates must agree.
"""

import jax.numpy as jnp
import numpy as np
from scipy.ndimage import gaussian_filter

from dnmf_tpu.config import RegistrationConfig
from dnmf_tpu.parallel import (
    make_mesh,
    sharded_register_pwrigid,
    sharded_register_rigid,
)
from dnmf_tpu.registration.motion_correct import (
    _batch_pwrigid,
    _batch_rigid,
)


def _video(rng, shape=(48, 48), t=16):
    tmpl = gaussian_filter(rng.normal(size=shape), 2.0).astype(np.float32)
    shifts = [(i % 5 - 2, (i + 2) % 5 - 2) for i in range(t)]
    video = np.stack([
        np.roll(tmpl, s, axis=(0, 1)) for s in shifts
    ]).astype(np.float32)
    return tmpl, shifts, video


def test_sharded_rigid_matches_batch(rng):
    tmpl, true, video = _video(rng)
    mesh = make_mesh(num_time=8, num_batch=1)
    cfg = RegistrationConfig(max_shifts=(5, 5), niter_rig=2, splits=8,
                             border_nan=False, frame_block=1)

    templ_s, corrected_s, shifts_s = sharded_register_rigid(
        jnp.asarray(video), cfg, mesh, template=jnp.asarray(tmpl)
    )
    templ_b, _, shifts_b, mc_b = _batch_rigid(
        video, cfg, template=jnp.asarray(tmpl)
    )
    np.testing.assert_allclose(np.asarray(shifts_s), shifts_b, atol=1e-4)
    np.testing.assert_allclose(np.asarray(templ_s), np.asarray(templ_b),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(corrected_s), mc_b, atol=1e-3)
    # And the shifts are actually right.
    np.testing.assert_allclose(np.asarray(shifts_s),
                               -np.asarray(true, float), atol=0.3)


def test_sharded_pwrigid_matches_batch(rng):
    tmpl, true, video = _video(rng)
    mesh = make_mesh(num_time=8, num_batch=1)
    cfg = RegistrationConfig(
        max_shifts=(5, 5), niter_rig=1, splits=8, border_nan=False,
        pw_rigid=True, strides=(28, 28), overlaps=(10, 10),
        frame_block=2,
    )
    templ_s, corrected_s, shifts_s = sharded_register_pwrigid(
        jnp.asarray(video), cfg, mesh, template=jnp.asarray(tmpl)
    )
    (templ_b, _, xs, ys, _, _, mc_b) = _batch_pwrigid(
        video, cfg, template=jnp.asarray(tmpl)
    )
    np.testing.assert_allclose(np.asarray(shifts_s[:, :, 0]),
                               np.asarray(xs), atol=1e-4)
    np.testing.assert_allclose(np.asarray(shifts_s[:, :, 1]),
                               np.asarray(ys), atol=1e-4)
    np.testing.assert_allclose(np.asarray(templ_s), np.asarray(templ_b),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(corrected_s), mc_b, atol=1e-3)
