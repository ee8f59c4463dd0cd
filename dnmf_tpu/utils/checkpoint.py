"""Checkpoint / resume of the full optimization state.

The reference has no persistence at all (SURVEY.md §5); here the complete
``DNMFState`` pytree (factors + Adam moments) round-trips through orbax so
an alternation run can resume mid-schedule deterministically.
"""

from __future__ import annotations

import os
from typing import Any

import jax


def save_state(path: str, state: Any) -> None:
    """Write a pytree checkpoint (orbax, overwriting)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, state, force=True)


def load_state(path: str, template: Any) -> Any:
    """Restore a pytree checkpoint with structure/dtypes from ``template``.

    Sharding follows the *template*, not the checkpoint: a state saved on
    one topology restores directly onto whatever mesh (or single device)
    the template's leaves live on — save on an 8-way time mesh, resume on
    a single chip or a differently-shaped mesh without a gather step.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()

    def _restore_arg(x):
        sharding = getattr(x, "sharding", None)
        return ocp.ArrayRestoreArgs(dtype=x.dtype, sharding=sharding)

    restore_args = jax.tree_util.tree_map(_restore_arg, template)
    return ckptr.restore(
        path, args=ocp.args.PyTreeRestore(
            item=template,
            restore_args=restore_args,
        ),
    )
