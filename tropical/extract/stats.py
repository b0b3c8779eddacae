"""Funnel statistics of the most recent extraction.

The reference communicates its extraction funnel only through the printed
``# of vertices and edges = A/B => C/D, F faces`` line (reference
subpoly.py:71-84); tooling (the golden-log regression harness,
scripts/golden_regression.py) needs the same numbers programmatically, so
both engines record them here after every ``subpoly`` call.
"""

from __future__ import annotations

# pre_v/pre_e: vertices/edges after the final insertion, before the |sdf|<eps
# skeleton filter; post_v/post_e: after; n_faces: polygon (region) count.
LAST: dict = {}


def record(pre_v: int, pre_e: int, post_v: int, post_e: int,
           n_faces: int | None = None) -> None:
    LAST.clear()
    LAST.update(pre_v=int(pre_v), pre_e=int(pre_e),
                post_v=int(post_v), post_e=int(post_e))
    if n_faces is not None:
        LAST["n_faces"] = int(n_faces)
