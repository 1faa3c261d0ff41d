"""Step-indexed checkpoint / resume (params + optimizer state + schedule).

Upgrades the reference's best-model-only `torch.save(net.state_dict())`
with hardcoded resume epoch (code/train_dual.py:77-78,157-159,274-278):
checkpoints carry params, optimizer state, epoch, best-error and plateau
state, so resume is exact.

Format: a msgpack-framed file written via flax.serialization — pure data,
no arbitrary-code-execution on load (the round-1 pickle format is still
READ for back-compat, but never written).  Writes are atomic
(tmp + os.replace), so a preemption mid-save never corrupts the
resume point."""

from __future__ import annotations

import json
import os
import struct

import jax
import numpy as np

_MAGIC = b"GBNCKPT1"


def save_checkpoint(path: str, params, opt_state=None, **scalars) -> None:
    from flax import serialization

    p_bytes = serialization.to_bytes(jax.tree.map(np.asarray, params))
    o_bytes = (
        b"" if opt_state is None
        else serialization.to_bytes(jax.tree.map(np.asarray, opt_state))
    )
    s_bytes = json.dumps(scalars, default=float).encode()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        for blob in (p_bytes, o_bytes, s_bytes):
            f.write(struct.pack("<Q", len(blob)))
            f.write(blob)
    os.replace(tmp, path)


def _load_new(f, params_like, opt_state_like):
    from flax import serialization

    sizes = []
    blobs = []
    for _ in range(3):
        (sz,) = struct.unpack("<Q", f.read(8))
        sizes.append(sz)
        blobs.append(f.read(sz))
    p_bytes, o_bytes, s_bytes = blobs
    if params_like is not None:
        params = serialization.from_bytes(
            jax.tree.map(np.asarray, params_like), p_bytes
        )
    else:  # no template: state-dict restore into nested dicts
        params = serialization.msgpack_restore(p_bytes)
    opt_state = None
    if o_bytes:
        if opt_state_like is not None:
            opt_state = serialization.from_bytes(
                jax.tree.map(np.asarray, opt_state_like), o_bytes
            )
        else:
            opt_state = serialization.msgpack_restore(o_bytes)
    scalars = json.loads(s_bytes.decode())
    return params, opt_state, scalars


def load_checkpoint(path: str, params_like=None, opt_state_like=None):
    with open(path, "rb") as f:
        head = f.read(len(_MAGIC))
        if head == _MAGIC:
            return _load_new(f, params_like, opt_state_like)
        # round-1 pickle back-compat (read-only path)
        f.seek(0)
        import pickle

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
