"""Unit tests for the measured-roofline helper (utils/roofline.py)."""

import numpy as np


def test_parse_hlo_buffers_shapes_and_operands():
    from tropical.utils.roofline import parse_hlo_buffers

    hlo = """
HloModule m
ENTRY e {
  %p0 = f32[128,64]{1,0} parameter(0)
  %p1 = f32[64,32]{1,0} parameter(1)
  %dot.1 = f32[128,32]{1,0} dot(f32[128,64]{1,0} %p0, f32[64,32]{1,0} %p1), metadata={op_name="jit(f)/dot" source_file="x.py" source_line=3}
  ROOT %fusion.2 = f32[128]{0} fusion(%dot.1), kind=kLoop, calls=%fc
}
"""
    info = parse_hlo_buffers(hlo)
    out_b, in_b, opcode, src, op_name = info["dot.1"]
    assert out_b == 128 * 32 * 4
    assert in_b == 128 * 64 * 4 + 64 * 32 * 4   # inline operand shapes
    assert opcode == "dot" and src == "x.py:3" and "jit(f)" in op_name
    # bare %name operand resolves through the producer's output shape,
    # and the trailing kind=/calls= kwargs are not charged
    out_b2, in_b2, opcode2, _, _ = info["fusion.2"]
    assert out_b2 == 128 * 4
    assert in_b2 == 128 * 32 * 4
    assert opcode2 == "fusion"


def test_measure_smoke_bounded_bandwidth():
    """measure() on a tiny jitted program returns coherent, bounded numbers."""
    import jax
    import jax.numpy as jnp

    from tropical.utils import roofline as rl

    @jax.jit
    def f(a, b):
        return jnp.tanh(a @ b).sum(axis=1)

    a = jnp.ones((256, 256), jnp.float32)
    b = jnp.ones((256, 256), jnp.float32)
    r = rl.measure(f, a, b)
    assert r["device_time_s"] > 0
    assert r["hbm_bytes"] > 3 * 256 * 256 * 4 * 0.9   # at least the dot's io
    assert len(r["top_ops"]) >= 1
    # traffic-derived bandwidth is a finite, physical number
    assert np.isfinite(r["hbm_gbps"]) and r["hbm_gbps"] >= 0
