"""utils.misc: seeding, param counting, flops estimators, loss meters."""

import jax
import numpy as np

from vptr_tpu.utils.misc import (
    AverageMeters,
    count_params,
    set_seed,
    transformer_step_flops,
    window_attention_flops,
)


def test_set_seed_reproducible():
    k1 = set_seed(7)
    a = np.random.rand(3)
    k2 = set_seed(7)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(np.asarray(jax.random.key_data(k1)),
                                  np.asarray(jax.random.key_data(k2)))


def test_count_params():
    tree = {"a": np.zeros((2, 3)), "b": {"c": np.zeros((4,))}}
    assert count_params(tree) == 10


def test_window_attention_flops_formula():
    """Parity with the reference's estimator
    (reference: VidHRFormer_modules.py:362-373)."""
    nt, dim, heads = 16, 528, 8
    hd = dim // heads
    want = (nt * dim * 3 * dim            # qkv
            + heads * nt * hd * nt        # q k^T
            + heads * nt * nt * hd        # attn v
            + nt * dim * dim)             # out proj
    assert window_attention_flops(nt, dim, heads) == want


def test_transformer_step_flops_scales():
    base = transformer_step_flops(10, 19, 8, 8, 528, 8, 12, 4)
    assert transformer_step_flops(20, 19, 8, 8, 528, 8, 12, 4) == 2 * base
    assert transformer_step_flops(10, 19, 8, 8, 528, 8, 24, 4) == 2 * base
    fwd = transformer_step_flops(10, 19, 8, 8, 528, 8, 12, 4, backward=False)
    assert base == 3 * fwd


def test_average_meters():
    m = AverageMeters()
    m.update({"loss": 1.0, "acc": 0.5})
    m.update({"loss": 3.0, "acc": 0.5})
    assert m.averages() == {"loss": 2.0, "acc": 0.5}
    assert m["loss"] == 2.0


def test_nar_step_flops_sanity():
    from vptr_tpu.utils.misc import nar_step_flops, transformer_step_flops

    fwd = nar_step_flops(2, 4, 4, 8, 8, 64, 4, 2, 2, 4, backward=False)
    assert fwd > 0
    # backward triples
    assert nar_step_flops(2, 4, 4, 8, 8, 64, 4, 2, 2, 4) == 3 * fwd
    # a decoder layer costs more than an encoder layer at the same t
    # (extra enc-dec attention + second conv FFN), so the NAR stack at
    # (enc=N, dec=N) must exceed an encoder-only stack of 2N layers ... at
    # least when tp == tf
    enc_only = transformer_step_flops(2, 4, 8, 8, 64, 4, 4, 4,
                                      backward=False)
    assert fwd > enc_only
