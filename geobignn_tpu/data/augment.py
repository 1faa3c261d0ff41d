"""Data augmentation — device-side random SO(3) rotation.

Capability parity target: RandomRotate (code/dataset.py:39-69) — a joint
rotation of positions, normals, targets and depth rays of BOTH graphs.
Runs inside the jitted train step (host stays free; edge weights and the
pooling hierarchy are rotation-invariant so only features rotate)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from geobignn_tpu.structs import DualSample


def random_rotation_matrix(key: jax.Array, z_only: bool = False) -> jax.Array:
    """Random rotation from three uniform Euler angles (Rz or Rz@Ry@Rx —
    the reference's parameterization, not Haar-uniform; kept for parity)."""
    a = jax.random.uniform(key, (3,), minval=0.0, maxval=2.0 * jnp.pi)
    ca, sa = jnp.cos(a), jnp.sin(a)
    rx = jnp.array([[1, 0, 0], [0, ca[0], -sa[0]], [0, sa[0], ca[0]]])
    ry = jnp.array([[ca[1], 0, sa[1]], [0, 1, 0], [-sa[1], 0, ca[1]]])
    rz = jnp.array([[ca[2], -sa[2], 0], [sa[2], ca[2], 0], [0, 0, 1]])
    return rz if z_only else rz @ ry @ rx


def rotate_sample(sample: DualSample, rot: jax.Array) -> DualSample:
    r3 = lambda m: None if m is None else m @ rot

    def rot_x(x):
        return jnp.concatenate([x[:, :3] @ rot, x[:, 3:6] @ rot], axis=1)

    v = sample.v.replace(
        x=rot_x(sample.v.x),
        y=r3(sample.v.y),
        depth_direction=r3(sample.v.depth_direction),
    )
    f = sample.f.replace(x=rot_x(sample.f.x), y=r3(sample.f.y))
    return sample.replace(v=v, f=f)


def random_rotate(sample: DualSample, key: jax.Array, z_only: bool = False) -> DualSample:
    return rotate_sample(sample, random_rotation_matrix(key, z_only))
