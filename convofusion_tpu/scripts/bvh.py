"""BVH motion-capture parsing + world-position forward kinematics.

Reference: scripts/beat_getjoints.py converts BEAT BVH files to joint
positions through PyMO's ``MocapParameterizer('position')``.  PyMO is not
available here; this module implements the equivalent natively: a BVH
hierarchy/motion parser and a vectorized FK that composes each joint's
channel rotations in file order (world = parent_world @ T(offset+pos) @ R).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclass
class BvhJoint:
    name: str
    parent: Optional[int]
    offset: np.ndarray
    channels: List[str] = field(default_factory=list)
    channel_start: int = 0


@dataclass
class BvhData:
    joints: List[BvhJoint]
    frames: np.ndarray          # (T, total_channels)
    frame_time: float

    @property
    def joint_names(self):
        return [j.name for j in self.joints]

    @property
    def fps(self) -> float:
        return 1.0 / self.frame_time


def parse_bvh(path: str) -> BvhData:
    with open(path) as f:
        tokens = f.read().split()
    pos = 0

    joints: List[BvhJoint] = []
    stack: List[int] = []
    channel_count = 0

    def expect(word):
        nonlocal pos
        assert tokens[pos].upper() == word, (tokens[pos], word)
        pos += 1

    assert tokens[pos].upper() == "HIERARCHY"
    pos += 1
    while tokens[pos].upper() != "MOTION":
        tok = tokens[pos].upper()
        if tok in ("ROOT", "JOINT"):
            name = tokens[pos + 1]
            pos += 2
            parent = stack[-1] if stack else None
            joints.append(BvhJoint(name, parent, np.zeros(3)))
            stack.append(len(joints) - 1)
            expect("{")
        elif tok == "END":  # End Site
            name = joints[stack[-1]].name + "End"
            pos += 2  # 'End' 'Site'
            joints.append(BvhJoint(name, stack[-1], np.zeros(3)))
            stack.append(len(joints) - 1)
            expect("{")
        elif tok == "OFFSET":
            joints[stack[-1]].offset = np.array(
                [float(tokens[pos + 1]), float(tokens[pos + 2]),
                 float(tokens[pos + 3])])
            pos += 4
        elif tok == "CHANNELS":
            n = int(tokens[pos + 1])
            ch = tokens[pos + 2:pos + 2 + n]
            joints[stack[-1]].channels = ch
            joints[stack[-1]].channel_start = channel_count
            channel_count += n
            pos += 2 + n
        elif tok == "}":
            stack.pop()
            pos += 1
        else:
            raise ValueError(f"unexpected BVH token {tokens[pos]}")

    expect("MOTION")
    assert tokens[pos].lower() == "frames:"
    n_frames = int(tokens[pos + 1])
    pos += 2
    # "Frame Time: <x>"
    assert tokens[pos].lower() == "frame" and \
        tokens[pos + 1].lower() == "time:"
    frame_time = float(tokens[pos + 2])
    pos += 3
    values = np.asarray(tokens[pos:pos + n_frames * channel_count],
                        dtype=np.float64)
    frames = values.reshape(n_frames, channel_count)
    return BvhData(joints, frames, frame_time)


def _rot_single_axis(axis: str, deg: np.ndarray) -> np.ndarray:
    """(T,) degrees -> (T, 3, 3)."""
    r = np.deg2rad(deg)
    c, s = np.cos(r), np.sin(r)
    t = len(r)
    m = np.tile(np.eye(3), (t, 1, 1))
    if axis == "X":
        m[:, 1, 1], m[:, 1, 2] = c, -s
        m[:, 2, 1], m[:, 2, 2] = s, c
    elif axis == "Y":
        m[:, 0, 0], m[:, 0, 2] = c, s
        m[:, 2, 0], m[:, 2, 2] = -s, c
    elif axis == "Z":
        m[:, 0, 0], m[:, 0, 1] = c, -s
        m[:, 1, 0], m[:, 1, 1] = s, c
    else:
        raise ValueError(axis)
    return m


def world_positions(data: BvhData) -> Tuple[np.ndarray, List[str]]:
    """(T, J, 3) world joint positions + joint name list.

    Rotations compose in channel file order (BVH convention); offsets and
    root translation channels included.
    """
    t = data.frames.shape[0]
    n = len(data.joints)
    world_rot = np.zeros((n, t, 3, 3))
    world_pos = np.zeros((n, t, 3))

    for ji, joint in enumerate(data.joints):
        local_trans = np.tile(joint.offset, (t, 1))
        local_rot = np.tile(np.eye(3), (t, 1, 1))
        for ci, ch in enumerate(joint.channels):
            col = data.frames[:, joint.channel_start + ci]
            chl = ch.lower()
            if chl == "xposition":
                local_trans[:, 0] += col
            elif chl == "yposition":
                local_trans[:, 1] += col
            elif chl == "zposition":
                local_trans[:, 2] += col
            elif chl.endswith("rotation"):
                local_rot = local_rot @ _rot_single_axis(
                    ch[0].upper(), col)
            else:
                raise ValueError(ch)
        if joint.parent is None:
            world_rot[ji] = local_rot
            world_pos[ji] = local_trans
        else:
            pr = world_rot[joint.parent]
            world_rot[ji] = pr @ local_rot
            world_pos[ji] = world_pos[joint.parent] + np.einsum(
                "tij,tj->ti", pr, local_trans)
    return world_pos.transpose(1, 0, 2), data.joint_names


def positions_by_name(data: BvhData) -> Dict[str, np.ndarray]:
    pos, names = world_positions(data)
    out: Dict[str, np.ndarray] = {}
    for i, name in enumerate(names):
        # later duplicates (e.g. multiple 'End' sites) keep first occurrence
        out.setdefault(name, pos[:, i, :])
    return out
