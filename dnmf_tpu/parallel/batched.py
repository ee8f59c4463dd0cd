"""Multi-recording batched demixing (BASELINE.md config 5).

The reference processes recordings serially (``for video_cur in
self.video``, ``/root/reference/Demix/MotionCorrect.py:235,300``).  Here a
batch of recordings demixes as one program: states and videos carry a
leading recordings axis and every update step is ``vmap``-ed — on a mesh
with a ``"batch"`` axis the recordings dimension shards across devices.

All recordings must share (size, K, T).  With ``use_pallas=True`` the
fused Pallas kernels run under ``vmap`` — pallas_call's batching rule
prepends the recordings axis as an outer grid dimension, which measured
bit-exact vs per-recording dispatches and ~1.7x serial-Pallas
throughput at R=4 (BASELINE.md config 5).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from dnmf_tpu.config import ModelConfig
from dnmf_tpu.models import dnmf as model_lib


def stack_states(states) -> model_lib.DNMFState:
    """Stack per-recording states into one batched state pytree."""
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *states
    )


def unstack_states(batched: model_lib.DNMFState):
    """Split a batched state back into per-recording states."""
    n = batched.beta.shape[0]
    return [
        jax.tree_util.tree_map(lambda leaf: leaf[i], batched)
        for i in range(n)
    ]


@functools.partial(
    jax.jit,
    static_argnames=("model", "optimizer", "gamma", "mu_iters",
                     "mu_gamma", "frame_block", "use_pallas",
                     "pallas_interpret", "gram_mode", "gram_window"),
)
def batched_round(
    states: model_lib.DNMFState,
    videos: jnp.ndarray,
    model: ModelConfig,
    optimizer: optax.GradientTransformation,
    gamma: float,
    mu_iters: int,
    mu_gamma: float = 0.0,
    frame_block: int = 8,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
    gram_mode: str = "exact",
    gram_window=None,
) -> Tuple[model_lib.DNMFState, dict]:
    """One alternation round over a batch of recordings.

    Args:
      states: batched state (leading recordings axis on every leaf).
      videos: ``[R, T, P]`` flattened frames.

    Returns:
      Updated batched state + per-recording metrics.
    """

    def one(state, video):
        state, metrics = model_lib.motion_epoch_parallel(
            state, video, model, optimizer, gamma,
            frame_block=frame_block, use_pallas=use_pallas,
            pallas_interpret=pallas_interpret,
        )
        grams, c1 = model_lib.compute_grams(
            state, video, model, frame_block=frame_block,
            use_pallas=use_pallas, pallas_interpret=pallas_interpret,
            gram_mode=gram_mode, gram_window=gram_window,
        )
        state = model_lib.footprint_update(
            state, grams, c1, iters=mu_iters, gamma=mu_gamma
        )
        return state, metrics

    return jax.vmap(one)(states, videos)
