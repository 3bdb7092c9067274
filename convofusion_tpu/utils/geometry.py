"""Rotation representations and forward kinematics (JAX).

Covers the conversions the reference datamodule exposes (reference:
convofusion/data/beat_dnd/utils/motion_rep_utils.py:241-315 and
convofusion/data/BEAT_DnD.py:39-60): euler(XYZ, degrees) <-> 6D <-> matrix,
plus FK over a kinematic tree.  The FK walks chains with a ``lax``-free
python loop over a *static* tree, so it jit-compiles to pure MXU matmuls.
"""
from __future__ import annotations

import jax.numpy as jnp


def euler_to_matrix_xyz(euler_rad):
    """Euler angles (radians, XYZ intrinsic order, torch convention) -> (*, 3, 3).

    Matches pytorch3d ``euler_angles_to_matrix(e, 'XYZ')`` = Rx @ Ry @ Rz.
    """
    x, y, z = euler_rad[..., 0], euler_rad[..., 1], euler_rad[..., 2]
    cx, sx = jnp.cos(x), jnp.sin(x)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    rx = jnp.stack(
        [one, zero, zero, zero, cx, -sx, zero, sx, cx], axis=-1
    ).reshape(x.shape + (3, 3))
    ry = jnp.stack(
        [cy, zero, sy, zero, one, zero, -sy, zero, cy], axis=-1
    ).reshape(y.shape + (3, 3))
    rz = jnp.stack(
        [cz, -sz, zero, sz, cz, zero, zero, zero, one], axis=-1
    ).reshape(z.shape + (3, 3))
    return rx @ ry @ rz


def matrix_to_euler_xyz(matrix):
    """(*, 3, 3) -> euler angles (radians, XYZ order), pytorch3d convention."""
    # For R = Rx @ Ry @ Rz: R[0,2] = sin(y)
    y = jnp.arcsin(jnp.clip(matrix[..., 0, 2], -1.0, 1.0))
    x = jnp.arctan2(-matrix[..., 1, 2], matrix[..., 2, 2])
    z = jnp.arctan2(-matrix[..., 0, 1], matrix[..., 0, 0])
    return jnp.stack([x, y, z], axis=-1)


def matrix_to_rotation_6d(matrix):
    """(*, 3, 3) -> (*, 6): first two rows flattened (Zhou et al. 2019)."""
    return matrix[..., :2, :].reshape(matrix.shape[:-2] + (6,))


def rotation_6d_to_matrix(d6):
    """(*, 6) -> (*, 3, 3) via Gram-Schmidt on the two encoded rows."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True)
    b2 = a2 - (b1 * a2).sum(-1, keepdims=True) * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def euler_deg_to_6d(eulers, n_joints: int):
    """(frames, J*3) degrees -> (frames, J*6)."""
    e = jnp.deg2rad(eulers.reshape(-1, n_joints, 3))
    return matrix_to_rotation_6d(euler_to_matrix_xyz(e)).reshape(-1, n_joints * 6)


def rep6d_to_euler_deg(rep6d, n_joints: int):
    """(frames, J*6) -> (frames, J*3) degrees."""
    m = rotation_6d_to_matrix(rep6d.reshape(-1, n_joints, 6))
    return jnp.rad2deg(matrix_to_euler_xyz(m)).reshape(-1, n_joints * 3)


def _fk(local_rots, root_pos, offsets, kinematic_tree, do_root_R=True,
        compose_left=False):
    """Shared FK walk. local_rots: (B, J, 3, 3); offsets: (J, 3)."""
    b = local_rots.shape[0]
    joints = [None] * local_rots.shape[1]
    joints[0] = root_pos
    eye = jnp.broadcast_to(jnp.eye(3, dtype=local_rots.dtype), (b, 3, 3))
    for chain in kinematic_tree:
        # every chain starts from the root rotation in the reference
        # (motion_rep_utils.py:286-288, :306-308)
        mat_r = local_rots[:, 0] if do_root_R else eye
        for i in range(1, len(chain)):
            if compose_left:
                # cont6d variant: child @ accumulated (reference
                # forward_kinematics_cont6d, motion_rep_utils.py:278-295)
                mat_r = local_rots[:, chain[i]] @ mat_r
            else:
                # euler variant: accumulated @ child (motion_rep_utils.py:300-315)
                mat_r = mat_r @ local_rots[:, chain[i]]
            off = offsets[None, chain[i], :, None]
            joints[chain[i]] = (mat_r @ off)[..., 0] + joints[chain[i - 1]]
    return jnp.stack(joints, axis=1)


def forward_kinematics_euler(eulers_rad, root_pos, offsets, kinematic_tree,
                             do_root_R=True):
    """eulers_rad: (B, J, 3) radians; root_pos: (B, 3); offsets: (J, 3)."""
    return _fk(euler_to_matrix_xyz(eulers_rad), root_pos, offsets,
               kinematic_tree, do_root_R, compose_left=False)


def forward_kinematics_cont6d(cont6d, root_pos, offsets, kinematic_tree,
                              do_root_R=True):
    """cont6d: (B, J, 6); root_pos: (B, 3); offsets: (J, 3)."""
    return _fk(rotation_6d_to_matrix(cont6d), root_pos, offsets,
               kinematic_tree, do_root_R, compose_left=True)
