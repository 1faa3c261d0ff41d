"""Step-indexed checkpoint / resume (params + optimizer state + schedule).

Upgrades the reference's best-model-only `torch.save(net.state_dict())`
with hardcoded resume epoch (code/train_dual.py:77-78,157-159,274-278):
checkpoints carry params, optimizer state, epoch, best-error and plateau
state, so resume is exact."""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np


def save_checkpoint(path: str, params, opt_state=None, **scalars) -> None:
    state = {
        "params": jax.tree.map(np.asarray, params),
        "opt_state": None if opt_state is None else jax.tree.map(np.asarray, opt_state),
        "scalars": scalars,
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(state, f)
    os.replace(tmp, path)


def load_checkpoint(path: str, params_like=None, opt_state_like=None):
    with open(path, "rb") as f:
        state = pickle.load(f)
    params = state["params"]
    opt_state = state["opt_state"]
    if params_like is not None:  # re-impose the reference pytree structure
        params = jax.tree.unflatten(
            jax.tree.structure(params_like), jax.tree.leaves(params)
        )
    if opt_state_like is not None and opt_state is not None:
        opt_state = jax.tree.unflatten(
            jax.tree.structure(opt_state_like), jax.tree.leaves(opt_state)
        )
    return params, opt_state, state["scalars"]
