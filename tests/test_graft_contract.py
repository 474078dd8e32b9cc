"""Driver-contract guards: entry() shape-checks and stays jittable."""

import jax
import jax.numpy as jnp


def test_entry_contract():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)
    logits, bboxes, conf, l_part = out
    assert logits.shape == (2, 128, 128, 2)
    assert bboxes.shape == (2, 4)
    assert conf.shape == (2, 1)
    assert l_part.shape == (2,)
