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
    """Restore a pytree checkpoint with structure/dtypes from ``template``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    restore_args = jax.tree_util.tree_map(
        lambda x: ocp.ArrayRestoreArgs(dtype=x.dtype), template
    )
    return ckptr.restore(
        path, args=ocp.args.PyTreeRestore(
            item=template,
            restore_args=restore_args,
        ),
    )
