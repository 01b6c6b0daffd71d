"""Window partition/reverse invariants and parity with einops semantics."""

import einops
import jax.numpy as jnp
import numpy as np

from vptr_tpu.ops.window import (
    pad_to_window,
    temporal_window_partition,
    temporal_window_reverse,
    unpad_from_window,
    window_partition,
    window_reverse,
)


def test_partition_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 8, 8, 5)))
    w = window_partition(x, 4)
    assert w.shape == (3 * 4, 16, 5)
    back = window_reverse(w, 4, (8, 8))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_partition_matches_einops_reference_order():
    """Same grouping as the reference's LocalPermuteModule rearrange
    (reference: VidHRFormer_modules.py:503-512), modulo batch-major layout."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    ours = np.asarray(window_partition(jnp.asarray(x), 4))  # (2*4, 16, 3)
    ref = einops.rearrange(
        x, "n (qh ph) (qw pw) c -> (ph pw) (n qh qw) c", ph=4, pw=4)
    # ref layout: (tokens, n*qh*qw, c); ours: (n*qh*qw, tokens, c)
    np.testing.assert_allclose(ours, ref.transpose(1, 0, 2))


def test_temporal_partition_matches_einops_reference_order():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 3, 8, 8, 4)).astype(np.float32)
    ours = np.asarray(temporal_window_partition(jnp.asarray(x), 4))
    ref = einops.rearrange(
        x, "n t (qh ph) (qw pw) c -> (t ph pw) (n qh qw) c", ph=4, pw=4)
    np.testing.assert_allclose(ours, ref.transpose(1, 0, 2))
    back = temporal_window_reverse(jnp.asarray(ours), 4, 3, (8, 8))
    np.testing.assert_allclose(np.asarray(back), x)


def test_center_padding():
    """Center-pad semantics match PadBlock (reference:
    VidHRFormer_modules.py:538-561): pad_h//2 on top, remainder at bottom."""
    x = jnp.ones((1, 6, 7, 2))
    padded, offs = pad_to_window(x, 4)
    assert padded.shape == (1, 8, 8, 2)
    assert offs == (1, 0)  # pad_h=2 -> top 1; pad_w=1 -> left 0, right 1
    back = unpad_from_window(padded, (6, 7), offs)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
