"""Marching tetrahedra with the reference call signature.

API-parity wrapper over :mod:`tropical.utils.isosurface` for reference
tropical/utils/mtet.py (kaolin-derived; syntactically corrupt in the
reference snapshot — see SURVEY §2.5 — and reimplemented here from the
16-case sign-pattern derivation rather than the kaolin tables).
"""

from __future__ import annotations

from tropical.utils.isosurface import marching_tetrahedra


def marching_tetrahedras(vertices, tets, sdf, level: float = 0.0):
    """(vertices [P,3], tets [T,4], sdf [P]) -> (verts, faces)."""
    import numpy as np

    v = np.asarray(vertices)
    s = np.asarray(sdf) - level
    return marching_tetrahedra(v, np.asarray(tets), s)
