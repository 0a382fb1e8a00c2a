"""Fused multi-pass CC propagate kernel vs the XLA reduce_window form."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skoots_tpu.kernels.propagate import propagate_eligible, propagate_pallas


def _xla_propagate(lab, fg, connectivity=26):
    if connectivity == 26:
        out = lab
        for ax in range(3):
            win = [1, 1, 1]
            win[ax] = 3
            pads = tuple((1, 1) if w == 3 else (0, 0) for w in win)
            out = jax.lax.reduce_window(out, jnp.int32(0), jax.lax.max,
                                        tuple(win), (1, 1, 1), pads)
    else:
        out = lab
        for ax in range(3):
            for shift in (-1, 1):
                rolled = jnp.roll(lab, shift, axis=ax)
                idx = jax.lax.broadcasted_iota(jnp.int32, lab.shape, ax)
                edge = idx == (0 if shift == 1 else lab.shape[ax] - 1)
                out = jnp.maximum(out, jnp.where(edge, 0, rolled))
    return jnp.where(fg > 0, out, 0)


@pytest.mark.parametrize("connectivity", [26, 6])
@pytest.mark.parametrize("passes", [1, 3])
def test_matches_xla(rng, connectivity, passes):
    shape = (16, 16, 128)
    fg = jnp.asarray((rng.random(shape) > 0.5).astype(np.uint8))
    lab = jnp.where(
        fg > 0,
        jnp.arange(np.prod(shape), dtype=jnp.int32).reshape(shape) + 1,
        0,
    )
    want = lab
    for _ in range(passes):
        want = _xla_propagate(want, fg, connectivity)
    got = propagate_pallas(lab, fg, passes=passes, connectivity=connectivity,
                           block_x=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_eligibility():
    assert propagate_eligible((512, 512, 512))
    assert not propagate_eligible((513, 512, 512))   # x % block
    assert not propagate_eligible((512, 512, 100))   # z % 128
    assert not propagate_eligible((512, 512, 4096))  # slab beyond VMEM


def test_stepped_cc_pallas_impl_matches(rng):
    """make_label_components_stepped(propagate_impl='pallas') partitions
    identically to the XLA implementation (interpret mode on CPU)."""
    from skoots_tpu.ops.flood_fill import make_label_components_stepped

    shape = (16, 16, 128)
    x = (rng.random(shape) > 0.7).astype(np.int32)
    ref = np.asarray(
        make_label_components_stepped(shape, propagates_per_round=4,
                                      jumps_per_round=1)(jnp.asarray(x))
    )
    got = np.asarray(
        make_label_components_stepped(shape, propagates_per_round=4,
                                      jumps_per_round=1,
                                      propagate_impl="pallas")(jnp.asarray(x))
    )
    np.testing.assert_array_equal(ref, got)
