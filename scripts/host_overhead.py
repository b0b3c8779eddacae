"""Break down the warm wall-clock of the fused large extraction into
device-program time vs host-side pulls/dispatch.

The HLO trace accounts for ~1.6 s of device-op self-time while the bench
wall-clock is ~2.2 s; this script times each boundary separately so the
perf attack knows whether the missing time is d2h transfer (mesh pull over
the ~40 MB/s tunnel), per-call dispatch, or untraced device gaps.

    python scripts/host_overhead.py [small|medium|large]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def force1(x):
    np.asarray(x.ravel()[:1])


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "large"

    from scripts.profile_device import get_net
    from tropical.extract.device import _EXTRACT_CACHE, subpoly_device

    net = get_net(size)
    t0 = time.time()
    subpoly_device(net, verbose=False, force=True)
    print(f"cold {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    _f, verts, tris = subpoly_device(net, verbose=False, force=True)
    wall = time.time() - t0
    print(f"warm subpoly_device wall {wall:.3f}s "
          f"({verts.shape[0]} verts, {tris.shape[0]} tris)", flush=True)

    fused = [fn for key, fn in _EXTRACT_CACHE.items()
             if isinstance(key, tuple) and key and key[-1] == "fused"
             and key[0] == net.spec]
    fn = fused[-1]

    # device program alone (1-element force pull)
    for tag in ("a", "b"):
        t0 = time.time()
        V, OUT, E, trs, meta = fn(net.params, net.marks)
        force1(meta)
        print(f"device program + 1-elem force ({tag}): "
              f"{time.time() - t0:.3f}s", flush=True)

    t0 = time.time()
    m = np.asarray(meta)
    t_meta = time.time() - t0
    nV, nE, ovf, nV_pre, nE_live, n_tris = (int(x) for x in m[:6])
    t0 = time.time()
    vertices = np.asarray(V[:nV])
    t_v = time.time() - t0
    t0 = time.time()
    tri_idx = np.asarray(trs[:n_tris])
    t_t = time.time() - t0
    print(f"pull meta {t_meta * 1e3:.0f}ms, vertices[{nV}] "
          f"{t_v * 1e3:.0f}ms ({vertices.nbytes / 1e6:.1f} MB), "
          f"tris[{n_tris}] {t_t * 1e3:.0f}ms "
          f"({tri_idx.nbytes / 1e6:.1f} MB)", flush=True)


if __name__ == "__main__":
    main()
