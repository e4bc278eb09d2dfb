"""Per-object T-LESS symmetry rectification.

Behavioral counterpart of reference lib/datasets/tless/symmetry_utils.py and
the `choose_gt` partial-symmetry rule of lib/datasets/tless/
tless_to_coco.py:45-68: symmetric object poses are canonicalized so that
views related by the object's symmetry group share one training target
(rectification per arXiv:1908.07640 Proposition 1).

Three rectifier families, per object id:
  * discrete rotation groups (e.g. 60°/90°/180° about the object z axis,
    180° about y) — pick the group element whose removal leaves the rotation
    closest to identity (ref symmetry_utils.py:6-18);
  * continuous z-axis symmetry (cylinders, obj 3/13) — drop the z-rotation
    euler angle (ref :20-22);
  * elevation-conditional rules for objects 14/15/16/17/30 whose symmetry
    changes with the viewing elevation (ref :60-97). NOTE: with the euler
    convention the reference uses (transforms3d 'szyz', second angle in
    [0, π] so its degrees are never negative), the negative thresholds make
    one branch dominant; this implementation reproduces that *effective*
    behavior exactly, keeping the same thresholds for line-by-line parity.

Everything is plain numpy (host-side data prep, offline like the
reference's).
"""

from __future__ import annotations

import numpy as np


def _rot(axis: int, deg: float) -> np.ndarray:
    a = np.deg2rad(deg)
    c, s = np.cos(a), np.sin(a)
    m = np.eye(3)
    i, j = [(1, 2), (0, 2), (0, 1)][axis]
    m[i, i] = c
    m[j, j] = c
    # sign chosen to match the right-handed rotation about `axis`
    m[i, j] = -s if axis != 1 else s
    m[j, i] = s if axis != 1 else -s
    return m


def axis_group(step_deg: int, axis: int = 2) -> np.ndarray:
    """Finite rotation group about one axis: identity + rotations every
    `step_deg` degrees (ref symmetry_utils.gen_axis_group :99-106)."""
    angles = list(range(0, 360, step_deg))
    return np.stack([np.eye(3)] + [_rot(axis, a) for a in angles], 0)


def rectify_discrete(R: np.ndarray, groups: np.ndarray) -> np.ndarray:
    """R @ g*ᵀ for the group element g* minimizing ‖R gᵀ − I‖_F
    (ref symmetry_utils.rectify_symmetric_rotation :6-18)."""
    diff = R[None] @ np.transpose(groups, (0, 2, 1)) - np.eye(3)
    idx = int(np.argmin(np.linalg.norm(diff.reshape(len(groups), 9), axis=1)))
    return R @ groups[idx].T


def rectify_z_continuous(R: np.ndarray) -> np.ndarray:
    """Remove the free rotation about the object z axis: decompose
    R = Rx(ak)·Ry(aj)·Rz(ai) (static 'szyx') and drop ai
    (ref symmetry_utils.rectify_z_axis_symmetric_rotation :20-22).
    Views R·Rz(θ) for any θ map to the same canonical rotation."""
    # M = Rx(ak) @ Ry(aj) @ Rz(ai):  M[0] = [c2c1, -c2s1, s2]
    ai = np.arctan2(-R[0, 1], R[0, 0])
    c, s = np.cos(-ai), np.sin(-ai)
    Rz_inv = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    return R @ Rz_inv


# T-LESS rotation-group table (ref symmetry_utils.TLESS_rotation_groups
# :25-57). axis 2 = object z, axis 1 = object y.
_GROUPS: dict[int, np.ndarray] = {
    1: axis_group(60, 2),
    2: axis_group(60, 2),
    8: axis_group(180, 2),
    9: axis_group(180, 2),
    19: axis_group(180, 1),
    20: axis_group(180, 1),
    24: axis_group(180, 2),
    27: axis_group(90, 2),
    28: axis_group(180, 2),
    29: axis_group(180, 2),
}

# continuous z-symmetric cylinders (ref symmetry_utils.TLESS_rectify :101-104)
_Z_CONTINUOUS = (3, 13)

# elevation-conditional objects (ref :60-97). With the reference's euler
# convention (elevation ∈ [0°, 180°], see module docstring) the dominant
# branches are: 14 → 180°-group, 15 → identity, 16 → 180°-group,
# 17 → identity, 30 → 180°-group.
_ELEV_RULES: dict[int, np.ndarray | None] = {
    14: axis_group(180, 2),
    15: None,
    16: axis_group(180, 2),
    17: None,
    30: axis_group(180, 2),
}


def tless_rectify(obj_id: int, R: np.ndarray) -> np.ndarray:
    """Canonicalize a T-LESS rotation per object symmetry
    (ref symmetry_utils.TLESS_rectify :108-118)."""
    R = np.asarray(R, np.float64)
    if obj_id in _GROUPS:
        return rectify_discrete(R, _GROUPS[obj_id])
    if obj_id in _Z_CONTINUOUS:
        return rectify_z_continuous(R)
    if obj_id in _ELEV_RULES:
        g = _ELEV_RULES[obj_id]
        return R if g is None else rectify_discrete(R, g)
    return R


# Per-object partial-symmetry rule for the REAL primesense training images
# (ref tless_to_coco.choose_gt :45-68): some objects are only symmetric over
# part of the view sphere; the elevation-ordered capture indices below the
# cut use one convention and the rest the other.
_NON_SYM = frozenset((4, 5, 6, 7, 10, 11, 12, 13, 18, 19, 20, 21, 22, 23,
                      25, 26))
_PARTIAL_SYM = {1: 360, 2: 360, 3: 360, 8: 1080, 9: 215, 24: 215}


def use_rectified_gt(obj_id: int, ind: int) -> bool:
    """Whether real-train image `ind` of `obj_id` should use the
    symmetry-rectified pose (ref choose_gt :45-68)."""
    if obj_id in _NON_SYM:
        return False
    if obj_id not in _PARTIAL_SYM:
        return True
    rng = _PARTIAL_SYM[obj_id]
    if obj_id in (9, 24):
        return ind < rng
    return ind >= rng
