from tropical.extract.subdivide import subpoly, subpoly_

__all__ = ["subpoly", "subpoly_"]
