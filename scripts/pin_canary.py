"""Pin the device-health canary reference value for the current backend.

Run on a KNOWN-HEALTHY device (e.g. right after confirming extraction
times match the committed BENCH numbers).  Writes
tropical/utils/canary_reference.json, which bench.py compares against.

    python scripts/pin_canary.py          # pin for the default backend
"""

import sys

sys.path.insert(0, ".")

from tropical.utils import canary  # noqa: E402


def main():
    import jax

    platform = jax.devices()[0].platform
    print(f"platform: {platform}")
    val = canary.measure_canary(warmups=3, runs=7)
    print(f"canary best-of-7: {val*1e3:.2f} ms")
    prev = canary.load_reference().get(platform)
    if prev is not None:
        print(f"previous reference: {prev*1e3:.2f} ms ({val/prev:.3f}x)")
    canary.pin_reference(val, platform)
    print(f"pinned {val:.5f} s for '{platform}' in "
          "tropical/utils/canary_reference.json")


if __name__ == "__main__":
    main()
