"""Dotted-path access into nested dict pytrees.

``Phase.trainable`` historically selected a top-level composite key
('uv' | 'dist' | 'part'); these helpers extend it to dotted paths into the
sub-network ("uv.mlp" trains the Fourier net's MLP tail while freezing the
jointly-trained frequency matrix ``uv.B``).  Motivation: at full scale both
line-search engines wedge on the Fourier arms (docs/STATUS_r4.md, semi at
~2.5e-3) and the prime suspect is the B matrix's gradient/curvature scale —
freezing it is the cheap discriminating experiment, and per-path freezing is
the general mechanism (the reference's var_list freezing,
/root/reference/PlateHoleQuarter/train/train.py:219-247, only reaches whole
sub-networks).
"""

from __future__ import annotations


def path_get(tree, path: str):
    """Return the subtree at a dotted ``path`` ("uv.mlp") of nested dicts."""
    for p in path.split("."):
        tree = tree[p]
    return tree


def path_set(tree, path: str, value):
    """Return a copy of ``tree`` with the subtree at ``path`` replaced.

    Only the dicts along the path are copied; all other branches are shared
    with the input (cheap, and safe because params trees are treated as
    immutable throughout).
    """
    parts = path.split(".")

    def rec(t, ps):
        if not ps:
            return value
        out = dict(t)
        out[ps[0]] = rec(t[ps[0]], ps[1:])
        return out

    return rec(tree, parts)
